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
  the same contract comes from a conditional put. ``ObjectStoreCommit``
  implements it over any ``ConditionalPutStore``; the shipped
  ``HttpConditionalPut`` speaks the S3 flavor (PUT with
  ``If-None-Match: *`` → 412 when another writer won; AWS S3 supports
  the header natively since 2024, MinIO too; GCS uses
  ``x-goog-if-generation-match: 0`` and Azure Put Blob the same
  If-None-Match — both pluggable via headers/conflict codes). Buckets
  predating conditional puts need an external arbiter instead (what
  Delta Lake's S3DynamoDBLogStore does) — plug one in as a
  ConditionalPutStore. Everything else in the engine is already
  object-store-safe: data and manifest files are written once under
  unique names and never modified, so only THIS claim needs the
  stronger primitive. Both implementations pass one shared contract
  test suite (tests/test_object_commit.py): single winner under
  concurrent claimers, conflict on re-claim, payload durability.

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


class ConditionalPutStore:
    """The one primitive an object store must supply: create-if-absent.

    ``put_if_absent(key, body)`` → True when the key was created by
    THIS call, False when the key already existed (someone else won).
    Must be atomic and durable-on-True — exactly the semantics of S3
    ``PutObject`` + ``If-None-Match: *`` (412 on existing), GCS
    ``x-goog-if-generation-match: 0``, and Azure Put Blob +
    ``If-None-Match: *``."""

    def put_if_absent(self, key: str, body: bytes) -> bool:
        raise NotImplementedError


class HttpConditionalPut(ConditionalPutStore):
    """Conditional put over plain HTTP against an S3-compatible
    endpoint: ``PUT {endpoint}/{key}`` with ``If-None-Match: *``.
    A 2xx means this writer created the object; 412 (AWS, Azure) or
    409 (GCS precondition flavor) means another writer won.

    ``headers`` lets deployments layer auth (a SigV4 signer, a
    presigned-URL gateway, MinIO credentials) without this module
    depending on any cloud SDK; ``extra_conflict_codes`` accommodates
    stores that report the lost race differently. Retries are the
    caller's job (the engine's commit loop already refresh-retries on
    CommitConflict)."""

    def __init__(
        self,
        endpoint: str,
        headers=None,
        timeout: float = 10.0,
        conflict_codes: tuple = (409, 412),
    ):
        self.endpoint = endpoint.rstrip("/")
        self.headers = headers or {}
        self.timeout = timeout
        self.conflict_codes = tuple(conflict_codes)

    def put_if_absent(self, key: str, body: bytes) -> bool:
        import urllib.error
        import urllib.request

        headers = {
            "If-None-Match": "*",
            "Content-Type": "application/json",
            **(self.headers() if callable(self.headers) else self.headers),
        }
        req = urllib.request.Request(
            f"{self.endpoint}/{key.lstrip('/')}",
            data=body,
            method="PUT",
            headers=headers,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return 200 <= resp.status < 300
        except urllib.error.HTTPError as e:
            if e.code in self.conflict_codes:
                return False
            raise


class Boto3ConditionalPut(ConditionalPutStore):
    """Conditional put via the AWS SDK — the production path on real
    S3 (SigV4 signing, credential chain, VPC endpoints) and on any
    S3-compatible store reachable through ``endpoint_url`` (MinIO,
    moto). Keys are bucket-qualified (``bucket/prefix/file``, exactly
    what ``ObjectStoreCommit._key`` produces from an ``s3://`` root);
    the first path segment is the bucket.

    Two S3 answers mean "another writer may have won":

    * 412 ``PreconditionFailed`` — the key exists; the race is lost.
    * 409 ``ConditionalRequestConflict`` — a concurrent conditional
      write on the same key was in flight and S3 refused to arbitrate;
      the outcome is UNKNOWN (the other writer may yet fail). AWS
      documents retrying as the correct response, so the put is
      re-issued (bounded) until it converges to created-by-us (2xx)
      or lost (412). Raising CommitConflict on an undecided 409 would
      be wrong: the engine's refresh-retry would find no committed
      version and re-claim anyway — spinning here is the same loop
      without re-reading table metadata.

    Tested against moto's real S3 HTTP server (SigV4-signed, 412 on
    conflict) in tests/test_object_commit.py — the same shared
    contract suite the POSIX protocol passes."""

    def __init__(self, client=None, endpoint_url=None, max_conflict_retries=16):
        if client is None:
            import boto3

            client = boto3.client("s3", endpoint_url=endpoint_url)
        self.client = client
        self.max_conflict_retries = max_conflict_retries

    def put_if_absent(self, key: str, body: bytes) -> bool:
        from botocore.exceptions import ClientError

        bucket, _, obj = key.lstrip("/").partition("/")
        if not bucket or not obj:
            raise ValueError(f"bucket-qualified key required, got {key!r}")
        attempts = 0
        while True:
            try:
                self.client.put_object(
                    Bucket=bucket, Key=obj, Body=body, IfNoneMatch="*"
                )
                return True
            except ClientError as e:
                code = e.response.get("Error", {}).get("Code")
                if code == "PreconditionFailed":
                    return False
                if code == "ConditionalRequestConflict":
                    attempts += 1
                    if attempts > self.max_conflict_retries:
                        raise
                    continue
                raise


class ObjectStoreCommit(CommitProtocol):
    """Version claim over a conditional-put object store. With no
    ``store`` configured, instantiating-then-claiming is an explicit,
    early, actionable failure — never a silent fallback to non-atomic
    semantics. The claim key is the directory/filename path with the
    URI scheme stripped (bucket-relative, path-style)."""

    def __init__(self, scheme: str, store: ConditionalPutStore | None = None):
        self.scheme = scheme
        self.store = store

    @staticmethod
    def _key(directory: str, filename: str) -> str:
        d = directory
        if "://" in d:
            d = d.split("://", 1)[1]
        return f"{d.rstrip('/')}/{filename}"

    def claim(self, directory: str, filename: str, payload: dict) -> None:
        if self.store is None:
            raise NotImplementedError(
                f"object-store commit for {self.scheme} needs a conditional"
                "-put endpoint: set DELTA_SPARK_OBJECT_STORE_ENDPOINT (any "
                "S3-compatible store honoring PUT + If-None-Match:*; AWS "
                "S3 supports it natively, MinIO too) or construct "
                "ObjectStoreCommit(scheme, HttpConditionalPut(endpoint)) "
                "with your own auth headers — see delta_spark/lake/"
                "commit.py for the contract. Without one, run against a "
                "POSIX path (local disk / NFS) instead."
            )
        body = json.dumps(payload).encode("utf-8")
        if not self.store.put_if_absent(self._key(directory, filename), body):
            raise CommitConflict(f"{filename} already committed")


def protocol_for(path: str) -> CommitProtocol:
    """Pick the commit protocol for a table/catalog root. Object-store
    URIs get the conditional-put protocol when an endpoint is
    configured (DELTA_SPARK_OBJECT_STORE_ENDPOINT), else fail fast
    HERE — before any data is written — rather than corrupting
    exactly-once guarantees with a non-atomic fallback."""
    for scheme in _OBJECT_SCHEMES:
        if path.startswith(scheme):
            endpoint = os.environ.get("DELTA_SPARK_OBJECT_STORE_ENDPOINT")
            sdk = os.environ.get("DELTA_SPARK_OBJECT_STORE_SDK")
            if sdk == "boto3":
                store: ConditionalPutStore | None = Boto3ConditionalPut(
                    endpoint_url=endpoint or None
                )
            elif sdk:
                raise ValueError(
                    f"unknown DELTA_SPARK_OBJECT_STORE_SDK={sdk!r} "
                    "(supported: boto3)"
                )
            else:
                store = HttpConditionalPut(endpoint) if endpoint else None
            return ObjectStoreCommit(scheme.rstrip(":/"), store)
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"unsupported storage scheme in {path!r}: the commit protocol "
            "needs an atomic claim primitive (see delta_spark/lake/commit.py)"
        )
    return PosixLinkCommit()
