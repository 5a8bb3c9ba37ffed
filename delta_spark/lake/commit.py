"""CommitProtocol: the atomic version-claim seam under every metadata
commit (table manifests AND catalog documents).

The engine's exactly-once story ultimately rests on ONE primitive:
"atomically claim version N+1, failing if another writer claimed it
first" (Iceberg's optimistic-concurrency commit). This module isolates
that primitive behind an interface so the storage substrate is a
deployment choice, not a correctness assumption:

* ``PosixLinkCommit`` — tmp + fsync + ``os.link`` (link() is atomic and
  fails with EEXIST when a concurrent writer won). Correct on any
  POSIX filesystem, including the NFS/Lustre mounts a Spark cluster
  typically shares. This is the implementation used here.

* Object stores (s3://, gs://, abfs://) have NO atomic link/rename —
  the same contract must come from a conditional put or an external
  arbiter. The documented contract for a future adapter
  (``ObjectStoreCommit``):
    - S3:  PutObject with ``If-None-Match: *`` (supported since 2024)
      on the version key, or a DynamoDB lock table (what Delta Lake's
      S3DynamoDBLogStore does) when the bucket predates it.
    - GCS: upload with ``x-goog-if-generation-match: 0``.
    - Azure: Put Blob with ``If-None-Match: *``.
  Everything else in the engine is already object-store-safe: data and
  manifest files are written once under unique names and never
  modified, so only THIS claim needs the stronger primitive.

Reference analog: the reference delegates its commit arbitration to a
transactional SQL offset store (delta-app/.../DBReplicationOffsetStore
.java:92-99); this seam is the same boundary.
"""

from __future__ import annotations

import json
import os
import uuid

_OBJECT_SCHEMES = ("s3://", "s3a://", "gs://", "abfs://", "abfss://", "wasb://")


class CommitConflict(Exception):
    """Another writer committed the next metadata version first."""


class CommitProtocol:
    def claim(self, directory: str, filename: str, payload: dict) -> None:
        """Atomically publish ``payload`` as ``directory/filename``;
        raise CommitConflict if the name already exists. Durable on
        return (crash leaves either no file or a complete one)."""
        raise NotImplementedError


class PosixLinkCommit(CommitProtocol):
    def claim(self, directory: str, filename: str, payload: dict) -> None:
        target = os.path.join(directory, filename)
        tmp = os.path.join(directory, f".{filename}-{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError as e:
            raise CommitConflict(f"{filename} already committed") from e
        finally:
            os.unlink(tmp)


class ObjectStoreCommit(CommitProtocol):
    """Placeholder adapter: carries the conditional-put contract above.
    Instantiating it is an explicit, early, actionable failure — never
    a silent fallback to non-atomic semantics."""

    def __init__(self, scheme: str):
        self.scheme = scheme

    def claim(self, directory: str, filename: str, payload: dict) -> None:
        raise NotImplementedError(
            f"object-store commit for {self.scheme} is not implemented in "
            "this build: the metadata version claim needs a conditional "
            "put (S3 If-None-Match:*, GCS if-generation-match:0, Azure "
            "If-None-Match:*) or an external lock table — see "
            "delta_spark/lake/commit.py for the contract. Run against a "
            "POSIX path (local disk / NFS) instead."
        )


def protocol_for(path: str) -> CommitProtocol:
    """Pick the commit protocol for a table/catalog root. Object-store
    URIs fail fast HERE — before any data is written — rather than
    corrupting exactly-once guarantees with a non-atomic fallback."""
    for scheme in _OBJECT_SCHEMES:
        if path.startswith(scheme):
            return ObjectStoreCommit(scheme.rstrip(":/"))
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"unsupported storage scheme in {path!r}: the commit protocol "
            "needs an atomic claim primitive (see delta_spark/lake/commit.py)"
        )
    return PosixLinkCommit()
