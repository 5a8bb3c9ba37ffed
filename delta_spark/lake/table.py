"""LakeTable: snapshot-isolated, hash-bucketed Parquet table with
copy-on-write MERGE, schema evolution, and idempotent commit markers.

Reference semantics rebuilt here (Spark-first, not a port):
  * idempotent applyDML / applyDDL contract —
    /root/reference/delta-api/src/main/java/io/cdap/delta/api/
    EventConsumer.java:39-76
  * offset+sequence commit records —
    delta-api/.../OffsetAndSequence.java:26-41 (here: snapshot summary
    ``writer-id`` / ``batch-id`` / ``max-seq`` markers)
  * generation fencing — DeltaWorker.java:140-150 (here: the writer-id
    embeds a generation; a fresh generation never matches old markers)

Scale design (100 TB / 1000 executors):
  * data is hash-bucketed on the bucket key (``conv_id``): a MERGE
    reads and rewrites ONLY buckets containing batch keys, and both
    sides of the anti-join arrive bucket-partitioned, so the join
    shuffles only the (small) batch, never the whole table.
  * two MERGE modes (Iceberg's copy-on-write vs merge-on-read):
      - ``cow``: union(affected target buckets, batch) → argmax-by-seq
        → rewrite those buckets. Right for backfills where the batch
        is comparable to the table.
      - ``mor``: append the batch as per-bucket DELTA files without
        touching the target at all; reads fold base+delta with the
        same argmax-by-seq; ``compact()`` absorbs deltas into base.
        Right for a streaming trickle — a 1-row update costs one tiny
        file, not a bucket rewrite (at 100 TB / 4096 buckets a CoW
        trickle would rewrite ~25 GB per touched bucket per batch).
      - ``auto``: cow while the table is empty (snapshot load), mor
        after.
  * SPLIT MANIFESTS (Iceberg's manifest lists): a snapshot stores
    manifest-file refs, the MoR hot path appends ONE manifest of just
    the batch's files — per-commit metadata is O(batch), not O(table).
  * BUCKET-SPEC EVOLUTION (Iceberg partition-spec evolution):
    ``rebucket()`` changes the bucket count as a metadata-only commit;
    old files are row-filtered on the recomputed hash until merges and
    ``compact()`` migrate them — a table that outgrows its bucket
    count never pays a stop-the-world rewrite.
  * snapshots are immutable: readers pin the manifest they loaded, so
    concurrent MERGE commits never tear a read (snapshot isolation).
"""

from __future__ import annotations

import base64
import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .._obs import observe_get
from ..dedup import lww_collapse
from ..schema import can_widen
from .commit import CommitConflict, protocol_for

_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
}


def _type_of(name: str) -> T.DataType:
    try:
        return _TYPES[name]
    except KeyError:
        return T.StructType.fromDDL(f"x {name}")[0].dataType


# parquet schema-inference cache for scan construction: data files are
# IMMUTABLE (content-addressed under unique snap tags; a path is never
# rewritten), so the inferred schema of an exact file set can be reused
# for the lifetime of the process. Repeated reads of the same snapshot
# (change-feed sides, matview advance re-reads, a bench's best-of-N)
# otherwise pay ~50-80 ms of driver-side footer inference per reader
# construction. Keyed on the EXACT path tuple — never shared across
# different file sets — and bounded (reset, not LRU: correctness never
# depends on a hit).
_SCHEMA_CACHE: dict[tuple[str, ...], T.StructType] = {}


def _read_parquet(spark: SparkSession, paths: list[str]) -> DataFrame:
    key = tuple(paths)
    sch = _SCHEMA_CACHE.get(key)
    if sch is not None:
        return spark.read.schema(sch).parquet(*paths)
    df = spark.read.parquet(*paths)
    if len(_SCHEMA_CACHE) >= 4096:
        _SCHEMA_CACHE.clear()
    _SCHEMA_CACHE[key] = df.schema
    return df


# manifest column-bounds stats: shared Spark-free helpers (the DuckDB
# interop reader plans file skips from the same functions)
from .stats import SKETCH_TYPES  # noqa: E402
from .stats import normalize_ranges as _normalize_ranges  # noqa: E402
from .stats import prune_files as _prune_files  # noqa: E402
from .stats import stat_encode as _stat_encode  # noqa: E402


def _footer_stats(md, idx: dict, stat_fields: list[tuple]) -> dict:
    """Per-file column bounds from an open parquet footer: min/max of
    each stats column across row groups, encoded into the manifest
    stats domain (lake/stats.py). A column with any unbounded row group
    is omitted — a missing stat only disables skipping."""
    stats: dict[str, list] = {}
    for fid, name, typ in stat_fields:
        if name not in idx:
            continue
        mn = mx = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[name]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = _stat_encode(typ, st.min)
            hi = _stat_encode(typ, st.max)
            if lo is None or hi is None:
                ok = False
                break
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        if ok and mn is not None:
            stats[fid] = [mn, mx]
    return stats


class LakeTable:
    def __init__(self, spark: SparkSession, path: str, metadata: dict):
        self.spark = spark
        self.path = path
        self.metadata = metadata
        # mutable-ref binding: None = main; set via for_branch() —
        # reads and commits on a bound handle address the branch head
        self._branch: str | None = None

    # ------------------------------------------------------ lifecycle

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        bucket_col: str | None = None,
        num_buckets: int = 16,
        stats_cols: list[str] | None = None,
    ) -> "LakeTable":
        os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        fields = [
            {"id": i + 1, "name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
            for i, f in enumerate(schema.fields)
        ]
        name_to_id = {f["name"]: f["id"] for f in fields}
        key_ids = [name_to_id[c] for c in key_cols]
        stat_ids = list(key_ids)
        for c in stats_cols or ():
            if name_to_id[c] not in stat_ids:
                stat_ids.append(name_to_id[c])
        meta = {
            "format_version": 1,
            "table_uuid": str(uuid.uuid4()),
            "version": 0,
            "num_buckets": num_buckets,
            "key_ids": key_ids,
            "stats_ids": stat_ids,
            "bucket_id": name_to_id[bucket_col or key_cols[0]],
            "schema_version": 0,
            "schemas": {"0": fields},
            "current_snapshot_id": None,
            "snapshots": [],
        }
        t = LakeTable(spark, path, meta)
        t._write_metadata(meta, expected_version=None)
        return t

    @staticmethod
    def load(spark: SparkSession, path: str) -> "LakeTable":
        return LakeTable(spark, path, LakeTable._read_metadata(path))

    @staticmethod
    def exists(path: str) -> bool:
        return bool(glob.glob(os.path.join(path, "metadata", "v*.json")))

    @staticmethod
    def _read_metadata(path: str) -> dict:
        versions = glob.glob(os.path.join(path, "metadata", "v*.json"))
        if not versions:
            raise FileNotFoundError(f"no lake table at {path}")
        # newest first; tolerate a trailing unparseable version file
        # (cannot happen under the link()-atomic commit below, but a
        # pre-crash writer or torn copy must never brick the table)
        versions.sort(key=lambda p: int(os.path.basename(p)[1:-5]), reverse=True)
        for i, p in enumerate(versions):
            try:
                with open(p) as f:
                    return json.load(f)
            except (json.JSONDecodeError, OSError):
                if i == 0:
                    continue
                raise
        raise FileNotFoundError(f"no readable metadata at {path}")

    def refresh(self) -> "LakeTable":
        self.metadata = self._read_metadata(self.path)
        return self

    def _write_metadata(self, meta: dict, expected_version: int | None) -> None:
        """Optimistic-concurrency atomic commit: CLAIM the next version
        through the CommitProtocol seam (POSIX: tmp + fsync + os.link,
        atomic, fails when a concurrent writer won → CommitConflict →
        refresh + retry — Iceberg's protocol; object stores: the
        conditional-put contract in lake/commit.py). A crash anywhere
        leaves either no v-file or a complete one, never a truncated
        latest version (temp names don't match the v*.json glob)."""
        new_version = 0 if expected_version is None else expected_version + 1
        meta = dict(meta, version=new_version)
        protocol_for(self.path).claim(
            os.path.join(self.path, "metadata"), f"v{new_version}.json", meta
        )
        self.metadata = meta

    # ------------------------------------------------------ schema

    @property
    def fields(self) -> list[dict]:
        m = self.metadata
        return m["schemas"][str(m["schema_version"])]

    @property
    def schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f["name"], _type_of(f["type"]), f["nullable"]) for f in self.fields]
        )

    @property
    def key_cols(self) -> list[str]:
        by_id = {f["id"]: f["name"] for f in self.fields}
        return [by_id[i] for i in self.metadata["key_ids"]]

    @property
    def bucket_col(self) -> str:
        by_id = {f["id"]: f["name"] for f in self.fields}
        return by_id[self.metadata["bucket_id"]]

    @property
    def num_buckets(self) -> int:
        return self.metadata["num_buckets"]

    # --------------------------------------------- bucket-spec evolution
    #
    # Iceberg's partition-spec evolution, rebuilt for hash buckets: a
    # table that outgrows its bucket count (4096 buckets × 25 GB is fine
    # at 100 TB; the same table at 1 PB wants 32k) calls ``rebucket`` —
    # a METADATA-ONLY commit. Files keep the spec they were written
    # under (manifest entries carry ``spec``); new writes use the new
    # spec. Readers stay exact: current-spec files prune at file level
    # as always, foreign-spec files are scanned and row-filtered by the
    # recomputed current-spec hash (the documented transitional cost —
    # Iceberg's old-spec files stop pruning the same way). CoW merges
    # prune foreign-spec files under THEIR OWN modulus and migrate the
    # ones they touch; ``compact()`` absorbs every foreign-spec file,
    # restoring pure file-level pruning.

    @property
    def bucket_spec_id(self) -> int:
        return self.metadata.get("bucket_spec_id", 0)

    @property
    def bucket_specs(self) -> dict[int, int]:
        """spec id → modulus for every spec the table has ever had."""
        raw = self.metadata.get("bucket_specs")
        if raw is None:
            return {0: self.metadata["num_buckets"]}
        return {int(k): int(v) for k, v in raw.items()}

    def rebucket(self, num_buckets: int) -> bool:
        """Change the bucket count for FUTURE writes (metadata-only —
        no data is rewritten). Returns True if the spec changed."""
        if num_buckets == self.num_buckets:
            return False
        if num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
        meta = dict(self.metadata)
        specs = {str(k): v for k, v in self.bucket_specs.items()}
        new_id = max(int(k) for k in specs) + 1
        specs[str(new_id)] = num_buckets
        meta["bucket_specs"] = specs
        meta["bucket_spec_id"] = new_id
        meta["num_buckets"] = num_buckets  # legacy/current-spec mirror
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return True

    def _entry_spec(self, f: dict) -> int:
        return int(f.get("spec", 0))

    def _bucket_name_in(self, fields: list[dict]) -> str:
        """The bucket column's name under a given schema field list
        (renames move the name; the column id is stable)."""
        return next(
            f["name"] for f in fields if f["id"] == self.metadata["bucket_id"]
        )

    def original_to_current_names(self, from_schema_version: int = 0) -> dict[str, str]:
        """Map column names as of ``from_schema_version`` to current
        names (by column id). Used to rewrite event payloads that still
        address renamed columns (reference analog: rename bookkeeping,
        delta-app/.../transformation/DefaultMutableRowSchema.java:85-130)."""
        old = {f["id"]: f["name"] for f in self.metadata["schemas"][str(from_schema_version)]}
        return {old[f["id"]]: f["name"] for f in self.fields if f["id"] in old}

    def bucket_expr(self, col: str | None = None):
        return F.pmod(F.xxhash64(F.col(col or self.bucket_col)), F.lit(self.num_buckets))

    # ------------------------------------------------------ tags
    #
    # Iceberg table refs (tags): named, expiry-pinned snapshot pointers.
    # A tag is how a 100 TB pipeline names the exact table state a
    # training run / audit / experiment consumed — retention can then
    # run aggressively (metadata stays O(keep_last)) without losing the
    # states someone still depends on, and a reader asks for
    # ``read(tag="v1-train")`` instead of a raw snapshot id.

    @property
    def tags(self) -> dict[str, int]:
        return {k: int(v) for k, v in self.metadata.get("tags", {}).items()}

    def tag(self, name: str, snapshot_id: int | None = None,
            replace: bool = False) -> int:
        """Pin ``name`` to a snapshot (default: current). Tagged
        snapshots survive ``expire_snapshots``. Idempotent: re-tagging
        to the same id is a no-op; moving an existing tag requires
        ``replace=True`` (a tag names an immutable state — silently
        repointing it is the bug class tags exist to prevent)."""
        sid = snapshot_id if snapshot_id is not None else self._head_id()
        if sid is None:
            raise ValueError("cannot tag an empty table")
        self._raw_snapshot(sid)  # raises if expired / never existed
        cur = self.metadata.get("tags", {}).get(name)
        if cur is not None:
            if int(cur) == sid:
                return sid
            if not replace:
                raise ValueError(
                    f"tag {name!r} already pins snapshot {cur}; pass "
                    f"replace=True to move it"
                )
        meta = dict(self.metadata)
        meta["tags"] = {**meta.get("tags", {}), name: sid}
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return sid

    def drop_tag(self, name: str) -> bool:
        """Remove a tag (the snapshot becomes expirable again).
        Returns False if the tag did not exist (idempotent)."""
        tags = dict(self.metadata.get("tags", {}))
        if name not in tags:
            return False
        del tags[name]
        meta = dict(self.metadata, tags=tags)
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return True

    # ------------------------------------------------------ branches
    #
    # Iceberg mutable refs (branches), rebuilt for the WAP
    # (write-audit-publish) pattern a 100 TB CDC deployment uses to
    # stage risky loads: commit a batch to a branch, run audit queries
    # against the branch head while main serves readers the last good
    # state, then FAST-FORWARD main to the branch head — an O(1)
    # metadata pointer move, never a data rewrite. Branch commits are
    # real snapshots in the shared snapshot list (shared manifests,
    # shared exactly-once markers — a batch staged on a branch and
    # published can never re-apply), and the schema is TABLE-level
    # exactly as in Iceberg: branches stage DATA, not DDL.
    # Reference analog: the worker applies to the target only after the
    # consumer's idempotency contract holds (EventConsumer.java:39-76);
    # WAP adds the audit gate in front of publication.

    @staticmethod
    def _ref(v) -> tuple[int, int | None]:
        """(head, fork) of a stored branch ref. The FORK POINT is the
        main-line snapshot the staging round started from — recorded so
        divergence checks survive expiry of the branch's intermediate
        snapshots (the parent-chain walk alone would break). Legacy
        int-shaped refs (pre-fork metadata) have an unknown fork."""
        if isinstance(v, dict):
            return int(v["head"]), int(v["fork"])
        return int(v), None

    @property
    def branches(self) -> dict[str, int]:
        """Branch name → head snapshot id."""
        return {
            k: self._ref(v)[0]
            for k, v in self.metadata.get("branches", {}).items()
        }

    def _head_id(self) -> int | None:
        """Snapshot id this handle's commits parent on and reads from:
        main's current snapshot, or the bound branch's head."""
        if self._branch is None:
            return self.metadata["current_snapshot_id"]
        br = self.metadata.get("branches", {})
        if self._branch not in br:
            raise ValueError(
                f"branch {self._branch!r} no longer exists "
                f"(have {sorted(br)})"
            )
        return self._ref(br[self._branch])[0]

    def create_branch(self, name: str, snapshot_id: int | None = None) -> int:
        """Create a branch pointing at ``snapshot_id`` (default: the
        current main head); that snapshot is also recorded as the
        branch's FORK POINT. The branch head is pinned against
        ``expire_snapshots`` like a tag. Errors if the name exists
        (a branch is a line of development — silently resetting one is
        the bug class refs exist to prevent)."""
        sid = (
            snapshot_id
            if snapshot_id is not None
            else self.metadata["current_snapshot_id"]
        )
        if sid is None:
            raise ValueError("cannot branch an empty table")
        self._raw_snapshot(sid)  # raises if expired / never existed
        if name in self.metadata.get("branches", {}):
            raise ValueError(f"branch {name!r} already exists")
        meta = dict(self.metadata)
        meta["branches"] = {
            **meta.get("branches", {}),
            name: {"head": sid, "fork": sid},
        }
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return sid

    def ensure_branch(self, name: str) -> "LakeTable":
        """Concurrent-safe bootstrap + bind: create ``name`` at the
        current head if absent (seeding an empty snapshot on a virgin
        table — a ref cannot be null) and return a handle bound to it.
        Safe for N instances racing at startup: a lost create (the
        branch appeared, or the optimistic version race failed) is
        retried/absorbed rather than raised — every racer ends bound
        to the same branch. This is THE entry point pipelines use;
        ``create_branch`` stays strict for operators."""
        from .commit import CommitConflict

        for _ in range(10):
            if name in self.metadata.get("branches", {}):
                return self.for_branch(name)
            try:
                if self.metadata["current_snapshot_id"] is None:
                    self._commit_snapshot(
                        added=[], summary={"operation": "seed-branch"}
                    )
                self.create_branch(name)
            except CommitConflict:
                self.refresh()  # someone else committed — re-check
            except ValueError as e:
                if "already exists" not in str(e):
                    raise
                # lost the create race — the branch is there now
            self.refresh()
        raise CommitConflict(
            f"ensure_branch({name!r}) lost 10 straight races at {self.path}"
        )

    def drop_branch(self, name: str) -> bool:
        """Remove a branch ref (its unpublished snapshots become
        expirable). Returns False if absent (idempotent)."""
        br = dict(self.metadata.get("branches", {}))
        if name not in br:
            return False
        del br[name]
        meta = dict(self.metadata, branches=br)
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return True

    def for_branch(self, name: str) -> "LakeTable":
        """A handle bound to ``name``: its ``read()`` sees the branch
        head and its ``merge``/``overwrite``/``compact`` commits move
        the branch pointer, leaving main untouched. The handle is an
        independent writer (same optimistic-concurrency rules as any
        second handle on the table): ``refresh()`` this table to see
        the branch's commits."""
        if name not in self.metadata.get("branches", {}):
            raise ValueError(
                f"no branch {name!r} (have "
                f"{sorted(self.metadata.get('branches', {}))})"
            )
        import copy

        h = copy.copy(self)
        h._branch = name
        return h

    def _is_ancestor(self, ancestor: int | None, sid: int | None) -> bool:
        """True when ``ancestor`` is on ``sid``'s parent chain (or equal).
        Walks only RETAINED snapshots: a chain broken by expiry is
        conservatively not an ancestor."""
        if ancestor is None:
            return True
        by_id = {s["id"]: s for s in self.metadata["snapshots"]}
        while sid is not None:
            if sid == ancestor:
                return True
            s = by_id.get(sid)
            if s is None:
                return False
            sid = s.get("parent")
        return False

    def _publishable(self, name: str) -> tuple[int, int | None]:
        """(head, main) if publishing ``name`` is safe; raises when
        main diverged. Divergence test: main still equals the branch's
        recorded fork point (exact, survives expiry of the branch's
        intermediate snapshots), falling back to the retained-parent
        walk for legacy refs without one."""
        br = self.metadata.get("branches", {})
        if name not in br:
            raise ValueError(f"no branch {name!r} (have {sorted(br)})")
        head, fork = self._ref(br[name])
        main = self.metadata["current_snapshot_id"]
        if head == main:
            return head, main
        if main != fork and not self._is_ancestor(main, head):
            raise ValueError(
                f"cannot publish: main head {main} is not an "
                f"ancestor of branch {name!r} head {head} (main "
                f"advanced independently — rebase the branch or "
                f"replay onto a fresh one)"
            )
        return head, main

    def fast_forward(self, name: str) -> int:
        """Publish a branch: move main's head to the branch head — the
        WAP publication step, O(1) metadata. Requires main's current
        head to be the branch's fork point or an ancestor of its head
        (same rule as Iceberg's fast_forward): if main advanced
        independently the publish is refused rather than silently
        dropping main's commits. The branch ref survives with its fork
        point advanced to the published head, so the next staging
        round continues on the same branch."""
        head, main = self._publishable(name)
        if head == main:
            return head
        meta = dict(self.metadata)
        meta["current_snapshot_id"] = head
        meta["branches"] = {
            **meta["branches"], name: {"head": head, "fork": head},
        }
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return head

    def audit_diff(self, name: str) -> DataFrame:
        """The auditor's primary tool: exactly what publishing branch
        ``name`` would change on main, as a change feed (insert /
        update / delete rows keyed like ``read_changes``) between
        main's head and the branch head. Driver-side manifest diff +
        bucket-pruned reads — cost scales with the staged commits'
        touched buckets, not table size, so auditing a small staged
        batch on a 100 TB table is cheap. Refuses a diverged branch
        (the same fork-point rule ``fast_forward`` enforces — a diff
        against a non-ancestor main would conflate the two lines)."""
        head, main = self._publishable(name)
        return self.read_changes(main, head)

    def expire_branches(self, older_than_ms: int) -> list[str]:
        """Branch retention (Iceberg ``max-ref-age-ms``): drop branch
        refs whose HEAD was committed before the cutoff — an abandoned
        staging round must not pin its snapshots (and their data
        files) against ``expire_snapshots`` forever. Published-and-idle
        branches age out the same way (main keeps the data; only the
        ref goes). Returns the dropped names. Disabled-by-default at
        call sites: dropping staged work is a retention POLICY, never
        an implicit side effect."""
        by_id = {s["id"]: s for s in self.metadata["snapshots"]}
        dropped = [
            name
            for name, v in self.metadata.get("branches", {}).items()
            if by_id.get(self._ref(v)[0], {}).get("timestamp_ms", 0)
            < older_than_ms
        ]
        if not dropped:
            return []
        br = dict(self.metadata.get("branches", {}))
        for name in dropped:
            del br[name]
        meta = dict(self.metadata, branches=br)
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return dropped

    def snapshot_as_of(self, ts_ms: int) -> int | None:
        """Largest snapshot on THIS handle's ref lineage (main, or the
        bound branch) committed at or before ``ts_ms`` (Iceberg
        TIMESTAMP AS OF resolves via the branch's snapshot log, never
        across refs — a reader asking for "the state as of noon" must
        get the last PUBLISHED state, not an unaudited WAP staging
        commit that happens to be newer). None when nothing that old
        remains on the lineage."""
        by_id = {s["id"]: s for s in self.metadata["snapshots"]}
        lineage: set[int] = set()
        sid = self._head_id()
        while sid is not None and sid in by_id:
            lineage.add(sid)
            sid = by_id[sid].get("parent")
        ids = [
            s["id"]
            for s in self.metadata["snapshots"]
            if s["id"] in lineage and s["timestamp_ms"] <= ts_ms
        ]
        return max(ids) if ids else None

    @property
    def cluster_cols(self) -> list[str]:
        """Sort-order columns set by ``cluster_by`` (current names, by
        field id — rename-proof); empty when the table is unclustered."""
        by_id = {f["id"]: f["name"] for f in self.fields}
        return [
            by_id[i]
            for i in self.metadata.get("cluster_by_ids", ())
            if i in by_id
        ]

    @property
    def stats_ids(self) -> list[int]:
        """Field ids whose per-file min/max go into manifest entries
        (Iceberg column bounds analog; keyed by id so stats survive
        renames). Pre-stats tables default to the key columns."""
        return self.metadata.get("stats_ids", self.metadata["key_ids"])

    # ------------------------------------------------------ snapshots
    #
    # Split manifests (Iceberg's manifest lists, rebuilt): a snapshot
    # entry stores MANIFEST FILE references, not the inline file list —
    # the hot-path MoR commit appends ONE new manifest (just the added
    # delta files) and inherits the parent's refs, so per-commit
    # metadata writes are O(batch), not O(table files + history).
    # CoW merge / compact / overwrite rewrite a single full manifest
    # (they already rewrite the data, so O(files) there is honest).
    # Manifests are immutable and content-cached; legacy snapshots with
    # inline ``files`` keep working (resolved transparently). Reference
    # analog: offsets/state in a store, not a monolith
    # (DBReplicationOffsetStore.java:92-99).

    def _write_manifest(self, entries: list[dict]) -> str:
        d = os.path.join(self.path, "metadata", "manifests")
        os.makedirs(d, exist_ok=True)
        rel = os.path.join("metadata", "manifests", f"m-{uuid.uuid4().hex[:16]}.json")
        tmp = os.path.join(self.path, rel + ".tmp")
        with open(tmp, "w") as f:
            json.dump(entries, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, rel))
        self._manifest_cache[rel] = entries
        return rel

    def _load_manifest(self, rel: str) -> list[dict]:
        got = self._manifest_cache.get(rel)
        if got is None:
            with open(os.path.join(self.path, rel)) as f:
                got = json.load(f)
            self._manifest_cache[rel] = got
        return got

    @property
    def _manifest_cache(self) -> dict:
        c = self.__dict__.get("_mcache")
        if c is None:
            c = self.__dict__["_mcache"] = {}
        return c

    def _resolve_files(self, snap: dict) -> list[dict]:
        if "files" in snap:  # legacy inline manifest
            return snap["files"]
        out: list[dict] = []
        for rel in snap.get("manifests", ()):
            out.extend(self._load_manifest(rel))
        return out

    def _raw_snapshot(self, sid: int | None = None) -> dict | None:
        sid = self._head_id() if sid is None else sid
        if sid is None:
            return None
        snap = next(
            (s for s in self.metadata["snapshots"] if s["id"] == sid), None
        )
        if snap is None:
            raise ValueError(
                f"snapshot {sid} not found (expired or never existed); "
                f"retained: {[s['id'] for s in self.metadata['snapshots']]}"
            )
        return snap

    @property
    def current_snapshot(self) -> dict | None:
        """The current snapshot with ``files`` RESOLVED (a copy — the
        stored entry keeps only manifest refs)."""
        raw = self._raw_snapshot()
        if raw is None:
            return None
        return {**raw, "files": self._resolve_files(raw)}

    def snapshot_summaries(self) -> list[dict]:
        return [s["summary"] for s in self.metadata["snapshots"]]

    def is_applied(self, writer_id: str, batch_id: str) -> bool:
        """Exactly-once check: has (writer-id, batch-id) committed?
        Markers of expired snapshots live on in ``applied_markers``
        (production would prune markers older than the streaming
        checkpoint horizon — a replay can never reach further back)."""
        if str(batch_id) in self.metadata.get("applied_markers", {}).get(writer_id, []):
            return True
        # rolled-back snapshots are NOT applied: their batches must be
        # re-appliable after rollback_to, or replay loses them forever
        return any(
            s["summary"].get("writer-id") == writer_id
            and s["summary"].get("batch-id") == str(batch_id)
            and not s.get("rolled_back")
            for s in self.metadata["snapshots"]
        )

    def last_committed_seq(self, writer_id: str | None = None) -> int:
        seqs = [
            int(s["summary"]["max-seq"])
            for s in self.metadata["snapshots"]
            if "max-seq" in s["summary"]
            and not s.get("rolled_back")
            and (writer_id is None or s["summary"].get("writer-id") == writer_id)
        ]
        return max(seqs, default=-1)

    # ------------------------------------------------------ read

    def _schema_with_system(self) -> T.StructType:
        return T.StructType(
            [
                *self.schema.fields,
                T.StructField("_seq", T.LongType(), True),
                T.StructField("_sort", T.LongType(), True),
                T.StructField("_deleted", T.BooleanType(), True),
            ]
        )

    @staticmethod
    def _sort_expr(df: DataFrame, sort_col):
        """UN_ORDERED-source tiebreak (reference: SortKey is a typed
        LIST, SortKey.java:26-41): a single key persists as one long
        (timestamps become epoch-micros; null sort keys lose to any
        present one) — the codegen-friendly common case. A COMPOSITE
        key (tuple/list, e.g. (ts, lsn, txn_id)) persists as
        array<bigint>, one packed long per key; arrays compare
        lexicographically inside the argmax struct, so the composite
        resolves in key order. A table's sort shape is fixed by its
        pipeline config (don't switch mid-table)."""
        if sort_col is None:
            return F.lit(0).cast("long")
        if isinstance(sort_col, (tuple, list)):
            if len(sort_col) == 0:
                return F.lit(0).cast("long")
            if len(sort_col) == 1:
                sort_col = sort_col[0]
            else:
                return F.array(
                    *[LakeTable._sort_expr(df, c) for c in sort_col]
                )
        dt = {f.name: f.dataType.simpleString() for f in df.schema.fields}.get(
            sort_col, ""
        )
        c = F.col(sort_col)
        v = F.unix_micros(c.cast("timestamp")) if dt.startswith("timestamp") else c.cast("long")
        return F.coalesce(v, F.lit(-(1 << 62)))

    def read(
        self,
        buckets: list[int] | None = None,
        include_system: bool = False,
        snapshot_id: int | None = None,
        ranges: dict[str, tuple] | None = None,
        tag: str | None = None,
        as_of=None,
        branch: str | None = None,
        _align_schema_version: int | None = None,
    ) -> DataFrame:
        """Read the current snapshot (optionally pruned to buckets),
        aligned to the current schema. Files written under older schema
        versions are aligned by column id: renamed columns re-aliased,
        widened columns cast, added columns filled with NULL.

        ``ranges`` maps column name → (lo, hi) inclusive bounds (either
        side None = open): rows outside every range are excluded, and —
        the scale point — files whose manifest min/max stats exclude the
        range are SKIPPED driver-side without being opened (Iceberg
        column-bounds pruning). Key-column ranges also push into the
        parquet scan pre-fold (row-group skipping inside kept files,
        tight after a sorted ``compact``). Non-key ranges are applied
        AFTER the MoR fold — an updated row is judged by its LATEST
        value — so their file-skip is only taken on delta-free
        snapshots, where one file row = one live row.

        System columns ``_seq`` (version guard) and ``_deleted``
        (tombstone) are stored in every data file; default reads hide
        tombstoned rows and drop the system columns (the MoR-style
        read of an Iceberg equality-delete table).

        ``snapshot_id`` time-travels to an earlier (unexpired)
        snapshot — data files are immutable, so any retained snapshot
        is fully reconstructable, and rows align to the SCHEMA IN
        EFFECT AT THAT SNAPSHOT (Iceberg VERSION AS OF: each snapshot
        records its schema id; pre-rename history reads under the old
        names).

        ``tag`` time-travels to a named, expiry-pinned snapshot
        (Iceberg ref); ``as_of`` (datetime or epoch-ms) to the last
        snapshot committed at or before that instant (TIMESTAMP AS
        OF); ``branch`` to a mutable ref's current head (WAP audit
        reads). All resolve to ``snapshot_id`` — pass at most one."""
        if sum(x is not None for x in (snapshot_id, tag, as_of, branch)) > 1:
            raise ValueError(
                "pass at most one of snapshot_id / tag / as_of / branch"
            )
        if branch is not None:
            br = self.metadata.get("branches", {})
            if branch not in br:
                raise ValueError(f"no branch {branch!r} (have {sorted(br)})")
            snapshot_id = self._ref(br[branch])[0]
        elif tag is not None:
            snapshot_id = self.tags.get(tag)
            if snapshot_id is None:
                raise ValueError(f"no tag {tag!r} (have {sorted(self.tags)})")
        elif as_of is not None:
            ts_ms = (
                int(as_of.timestamp() * 1000)
                if hasattr(as_of, "timestamp")
                else int(as_of)
            )
            snapshot_id = self.snapshot_as_of(ts_ms)
            if snapshot_id is None:
                raise ValueError(
                    f"no retained snapshot at or before {as_of!r}"
                )
        if snapshot_id is not None:
            raw = self._raw_snapshot(snapshot_id)
            snap = {**raw, "files": self._resolve_files(raw)}
            cur = self.metadata["schemas"][
                str(snap.get("schema_version", self.metadata["schema_version"]))
            ]
        else:
            snap = self.current_snapshot
            cur = self.fields
        if _align_schema_version is not None:
            # internal (read_changes): align an OLD snapshot's rows to a
            # NEWER schema so two states diff column-by-column — the
            # column-id machinery below maps any file to any schema
            cur = self.metadata["schemas"][str(_align_schema_version)]
        if snap is None or not snap["files"]:
            empty = self._schema_with_system() if include_system else self.schema
            return self.spark.createDataFrame([], empty)
        files = snap["files"]
        bset: set[int] | None = None
        if buckets is not None:
            # ``buckets`` are ids under the CURRENT bucket spec; the
            # pruned read is a pure KEY predicate — hash(key) % n ∈ bset
            # — however the rows are physically laid out:
            #   * current-spec per-bucket files prune at FILE level
            #   * spanning deltas (bucket == -1) are scanned and their
            #     rows filtered (stored _bucket for current-spec files;
            #     without this a pruned read would leak foreign-bucket
            #     rows into CoW rewrites)
            #   * foreign-spec files (written before a rebucket) can't
            #     prune by file — scanned, rows filtered on the
            #     RECOMPUTED current-spec hash (transitional cost until
            #     compact() migrates them)
            bset = set(buckets)
        return self._scan_entries(
            files, cur, bset=bset, include_system=include_system, ranges=ranges
        )

    def lookup(self, values: list, snapshot_id: int | None = None) -> DataFrame:
        """Point lookup by bucket-column value(s): bucket-hash file
        pruning + manifest-stats file skipping + exact row filter — the
        touched file count is O(len(values)), independent of table
        size (a 100 TB table answers a conv_id lookup from a handful of
        files, planned entirely driver-side from the manifest).
        ``snapshot_id`` pins the read (incremental consumers re-reading
        the keys an epoch touched must not see racing later commits)."""
        if not values:
            return self.spark.createDataFrame([], self.schema)
        values = list(values)
        bcol = self.bucket_col
        btype = next(f["type"] for f in self.fields if f["name"] == bcol)
        # The driver-side XXH64 path is gated on the COLUMN's declared
        # type, not the Python value types: an int value against a
        # string column (or vice versa) must error, never hash wrong
        # (the silent-miss bug class — a mismatched hash prunes to the
        # wrong buckets and returns missing rows).
        py_type = {"string": str, "bigint": int, "int": int}.get(btype)
        if py_type is not None and not all(
            isinstance(v, py_type) and not isinstance(v, bool) for v in values
        ):
            raise TypeError(
                f"lookup values must all be {py_type.__name__} to match "
                f"bucket column {bcol!r} ({btype}); got "
                f"{sorted({type(v).__name__ for v in values})}"
            )
        if py_type is not None:
            # Spark-equal XXH64 in Python (lake/xxh.py), dispatched by
            # the DECLARED column type (int columns use Spark's 4-byte
            # hashInt path): plan the buckets driver-side with NO job
            from .xxh import bucket_of

            buckets = sorted(
                {bucket_of(v, self.num_buckets, coltype=btype) for v in values}
            )
        else:  # exotic bucket-col type: one tiny job computes the hashes
            vdf = self.spark.createDataFrame(
                [(v,) for v in values],
                T.StructType([T.StructField(bcol, _type_of(btype))]),
            )
            buckets = [
                r[0]
                for r in vdf.select(self.bucket_expr().alias("b")).distinct().collect()
            ]
        # per-value interval union: a 2-value lookup spanning the key
        # domain still stats-skips every file holding neither value (a
        # single (min, max) envelope would degenerate to a full scan)
        out = self.read(
            buckets=buckets,
            ranges={bcol: [(v, v) for v in set(values)]},
            snapshot_id=snapshot_id,
        )
        return out.filter(F.col(bcol).isin(values))

    def _scan_entries(
        self,
        files: list[dict],
        cur: list[dict],
        bset: set[int] | None = None,
        include_system: bool = False,
        exclude_foreign: bool = False,
        ranges: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Scan manifest entries aligned to the ``cur`` field list,
        applying the key-predicate row filters ``read`` documents.
        ``exclude_foreign`` drops foreign-spec per-bucket files from the
        scan entirely (the CoW merge reads those separately, WHOLE —
        they are being replaced, so row-filtering them would lose rows).
        ``ranges`` prunes as ``read`` documents: manifest-stats file
        skip (key columns always — every version of a key shares its
        value, so dropping out-of-range files drops only out-of-range
        keys; non-key columns only when the snapshot holds no delta
        files, since a base row may be superseded by a delta row whose
        value re-enters the range), key-range row filters pre-fold,
        non-key row filters post-fold."""
        cur_spec = self.bucket_spec_id
        cur_n = self.num_buckets
        bname = self._bucket_name_in(cur)
        if exclude_foreign:
            files = [
                f
                for f in files
                if f["bucket"] == -1 or self._entry_spec(f) == cur_spec
            ]
        if bset is not None:
            # file-level pruning for current-spec per-bucket files;
            # spanning and foreign-spec files are kept and row-filtered
            files = [
                f
                for f in files
                if f["bucket"] == -1
                or self._entry_spec(f) != cur_spec
                or f["bucket"] in bset
            ]
        pre_filters = []
        post_filters = []
        if ranges:
            by_name = {f["name"]: f for f in cur}
            key_ids = set(self.metadata["key_ids"])
            files = _prune_files(files, cur, key_ids, ranges)
            for colname, ivals in _normalize_ranges(ranges).items():
                c = F.col(colname)
                ors = []
                for lo, hi in ivals:
                    cond = None
                    if lo is not None:
                        cond = c >= F.lit(lo)
                    if hi is not None:
                        cond = (c <= F.lit(hi)) if cond is None else cond & (c <= F.lit(hi))
                    if cond is None:  # fully open interval: no filter
                        ors = []
                        break
                    ors.append(cond)
                if ors:
                    cond = ors[0]
                    for o in ors[1:]:
                        cond = cond | o
                    is_key = by_name[colname]["id"] in key_ids
                    (pre_filters if is_key else post_filters).append(cond)
        # group by (schema_version, spanning?, spec) — spanning files
        # carry a physical _bucket column used for row-level pruning
        by_sv: dict[tuple[int, bool, int], list[str]] = {}
        has_delta = False
        for f in files:
            has_delta = has_delta or f.get("kind") == "delta"
            key = (f["schema_version"], f["bucket"] == -1, self._entry_spec(f))
            by_sv.setdefault(key, []).append(os.path.join(self.path, f["path"]))
        if not by_sv:
            empty = self._schema_with_system() if include_system else self.schema
            return self.spark.createDataFrame([], empty)
        parts = []
        for (sv, spanning, spec), paths in by_sv.items():
            old_fields = {f["id"]: f for f in self.metadata["schemas"][str(sv)]}
            df = _read_parquet(self.spark, paths)
            if spanning and bset is not None and spec == cur_spec:
                df = df.filter(F.col("_bucket").isin([int(b) for b in bset]))
            cols = []
            for f in cur:
                t = _type_of(f["type"])
                if f["id"] in old_fields:
                    cols.append(F.col(old_fields[f["id"]]["name"]).cast(t).alias(f["name"]))
                else:
                    cols.append(F.lit(None).cast(t).alias(f["name"]))
            cols.append(F.col("_seq"))
            # pre-sort-column files read as _sort=0 (format evolution)
            cols.append(
                F.col("_sort") if "_sort" in df.columns else F.lit(0).cast("long").alias("_sort")
            )
            cols.append(F.col("_deleted"))
            part = df.select(*cols)
            if bset is not None and spec != cur_spec:
                # foreign-spec rows: recompute the current-spec hash
                part = part.filter(
                    F.pmod(F.xxhash64(F.col(bname)), F.lit(cur_n)).isin(
                        [int(b) for b in bset]
                    )
                )
            for cond in pre_filters:  # key ranges: exact pre-fold
                part = part.filter(cond)
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if has_delta:
            # merge-on-read fold: delta files may carry several
            # versions of a key (and duplicates of base rows) — one
            # argmax-by-_seq aggregation restores one-row-per-key.
            # Base-only reads skip this entirely (CoW invariant).
            by_id = {f["id"]: f["name"] for f in cur}
            keys = [by_id[i] for i in self.metadata["key_ids"]]
            out = lww_collapse(out, keys, "_seq", sort_cols=("_sort",))
        for cond in post_filters:  # non-key ranges: judge the LATEST value
            out = out.filter(cond)
        if not include_system:
            out = out.filter(~F.col("_deleted")).drop("_seq", "_sort", "_deleted")
        return out

    def read_changes(
        self,
        from_snapshot_id: int | None = None,
        to_snapshot_id: int | None = None,
        include_pre_images: bool = False,
    ) -> DataFrame:
        """Incremental change feed between two snapshots — the engine
        as a CDC *source* (Iceberg incremental/changelog scan, Delta
        Change Data Feed analog; the reference's targets are consumed
        the same way by downstream replicators). Emits one row per key
        whose latest state changed in ``(from, to]``:

          * ``_change_type`` ∈ insert / update / delete
          * payload columns aligned to the TO snapshot's schema
            (post-rename names; deletes carry the last-known payload)
          * ``_seq`` — the winning sequence number

        ``include_pre_images=True`` switches to the Delta-CDF row
        shape incremental view maintenance needs: every update emits
        TWO rows — ``update_pre`` (the replaced payload, its seq) and
        ``update_post`` (the new payload) — so a consumer can RETRACT
        the old contribution and add the new one without reading the
        FROM state itself. Inserts/deletes are unchanged, and the
        pre-image payload speaks the TO schema like every other row.
        Same cost shape: the from-side rows are already in the diff
        join, so pre-images add no extra scan. (Plain mode stays the
        compact one-row-per-key feed ``interop.changes_sql`` mirrors.)

        ``from_snapshot_id=None`` reads from the beginning (every live
        row is an insert). Cost scales with the buckets TOUCHED by
        commits in the range, not table size: the split-manifest file
        diff names the changed buckets driver-side (O(metadata)), both
        states are bucket-pruned reads, and the diff is one key-join
        shuffle over those buckets only. Compaction/no-op commits in
        range add scanned buckets but emit nothing (seq-equal rows
        drop out)."""
        to_raw = self._raw_snapshot(to_snapshot_id)
        if from_snapshot_id is not None:
            self._raw_snapshot(from_snapshot_id)  # raises if expired/unknown
            if to_raw is not None and from_snapshot_id > to_raw["id"]:
                raise ValueError(
                    f"read_changes range reversed: from {from_snapshot_id} > "
                    f"to {to_raw['id']}"
                )
        # TO side speaks the schema a reader of that state sees: an
        # explicit snapshot pins its recorded schema; "current" means
        # the CURRENT table schema (not the last snapshot's — a DDL
        # with no data commit yet must still rename the feed's columns,
        # matching read() and interop.changes_sql exactly)
        to_sv = (
            self.metadata["schema_version"]
            if to_snapshot_id is None or to_raw is None
            else to_raw.get("schema_version", self.metadata["schema_version"])
        )
        fields_to = self.metadata["schemas"][str(to_sv)]
        by_id = {f["id"]: f["name"] for f in fields_to}
        keys = [by_id[i] for i in self.metadata["key_ids"]]
        payload = [f["name"] for f in fields_to if f["name"] not in keys]

        def _empty() -> DataFrame:
            sch = T.StructType(
                [
                    *[
                        T.StructField(f["name"], _type_of(f["type"]), True)
                        for f in fields_to
                    ],
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_seq", T.LongType(), True),
                ]
            )
            return self.spark.createDataFrame([], sch)

        if to_raw is None:
            return _empty()
        from_files: list[dict] = []
        from_paths: set[str] = set()
        if from_snapshot_id is not None:
            from_files = self._resolve_files(self._raw_snapshot(from_snapshot_id))
            from_paths = {f["path"] for f in from_files}
        to_files = self._resolve_files(to_raw)
        to_paths = {f["path"] for f in to_files}
        added = [f for f in to_files if f["path"] not in from_paths]
        # REMOVED files matter too: a commit that only drops files
        # (truncate, an overwrite shrinking the key set) still deletes
        # every key those files held — deriving the touched buckets
        # from added files alone would emit NO delete events for it
        removed = [f for f in from_files if f["path"] not in to_paths]
        if not added and not removed:
            return _empty()
        touched = added + removed
        cur_spec = self.bucket_spec_id
        cur_n = self.num_buckets
        bset = {
            int(f["bucket"])
            for f in touched
            if f["bucket"] != -1 and self._entry_spec(f) == cur_spec
        }
        span_cur = [
            f for f in touched if f["bucket"] == -1 and self._entry_spec(f) == cur_spec
        ]
        if span_cur:  # spanning MoR deltas: read THEIR buckets only
            sp = self.spark.read.parquet(
                *[os.path.join(self.path, f["path"]) for f in span_cur]
            )
            bset |= {
                int(r[0])
                for r in sp.select("_bucket").distinct().collect()
                # control-plane: ≤ num_buckets ints
            }
        # files added under a FOREIGN spec (the range crosses a
        # rebucket): their current-spec buckets come from recomputing
        # the hash over just the bucket column (name per file schema)
        rec = [f for f in touched if self._entry_spec(f) != cur_spec]
        by_sv: dict[int, list[str]] = {}
        for f in rec:
            by_sv.setdefault(f["schema_version"], []).append(
                os.path.join(self.path, f["path"])
            )
        for sv, paths in by_sv.items():
            bname = self._bucket_name_in(self.metadata["schemas"][str(sv)])
            sp = self.spark.read.parquet(*paths)
            bset |= {
                int(r[0])
                for r in sp.select(
                    F.pmod(F.xxhash64(F.col(bname)), F.lit(cur_n)).alias("b")
                )
                .distinct()
                .collect()
            }
        blist = sorted(bset)

        def _side(sid: int | None, tag: str, time_travel: bool) -> DataFrame:
            df = self.read(
                buckets=blist,
                include_system=True,
                snapshot_id=sid if time_travel else None,
                _align_schema_version=to_sv,
            )
            return df.select(
                *keys,
                *[F.col(c).alias(f"__{tag}_{c}") for c in payload],
                F.col("_seq").alias(f"__{tag}_seq"),
                F.col("_sort").alias(f"__{tag}_sort"),
                F.col("_deleted").alias(f"__{tag}_del"),
            )

        t = _side(to_snapshot_id, "t", to_snapshot_id is not None)
        alive_t = F.col("__t_seq").isNotNull() & ~F.coalesce(
            F.col("__t_del"), F.lit(False)
        )
        if from_snapshot_id is None:
            j = t
            alive_f = F.lit(False)
            changed = F.lit(True)
        else:
            f_side = _side(from_snapshot_id, "f", True)
            j = t.join(f_side, on=keys, how="full_outer")
            alive_f = F.col("__f_seq").isNotNull() & ~F.coalesce(
                F.col("__f_del"), F.lit(False)
            )
            changed = (F.col("__t_seq") != F.col("__f_seq")) | ~F.col(
                "__t_sort"
            ).eqNullSafe(F.col("__f_sort"))
        change = (
            F.when(alive_t & ~alive_f, F.lit("insert"))
            .when(alive_t & alive_f & changed, F.lit("update"))
            .when(~alive_t & alive_f, F.lit("delete"))
        )
        is_del = change == F.lit("delete")
        f_or = (
            (lambda c: F.when(is_del, F.col(f"__f_{c}")).otherwise(F.col(f"__t_{c}")))
            if from_snapshot_id is not None
            else (lambda c: F.col(f"__t_{c}"))
        )
        f_seq = (
            F.when(is_del, F.col("__f_seq")).otherwise(F.col("__t_seq"))
            if from_snapshot_id is not None
            else F.col("__t_seq")
        )
        rows = j.filter(change.isNotNull())
        payload_cols = [
            F.col(f["name"])
            if f["name"] in keys
            else f_or(f["name"]).alias(f["name"])
            for f in fields_to
        ]
        if not include_pre_images or from_snapshot_id is None:
            return rows.select(
                *payload_cols,
                change.alias("_change_type"),
                f_seq.alias("_seq"),
            )
        # CDF shape: updates split into update_pre (before payload,
        # before seq) + update_post; the before row is ALREADY in the
        # diff join's __f_* columns — no extra scan
        post = rows.select(
            *payload_cols,
            F.when(change == F.lit("update"), F.lit("update_post"))
            .otherwise(change)
            .alias("_change_type"),
            f_seq.alias("_seq"),
        )
        pre = rows.filter(change == F.lit("update")).select(
            *[
                F.col(f["name"])
                if f["name"] in keys
                else F.col(f"__f_{f['name']}").alias(f["name"])
                for f in fields_to
            ],
            F.lit("update_pre").alias("_change_type"),
            F.col("__f_seq").alias("_seq"),
        )
        return post.unionByName(pre)

    # ------------------------------------------------------ write

    def _commit_snapshot(
        self,
        files: list[dict] | None = None,
        summary: dict | None = None,
        added: list[dict] | None = None,
        meta_updates: dict | None = None,
    ) -> None:
        """Commit a new snapshot. Two shapes:

        * ``files=[...]`` — FULL rewrite: one new manifest holding the
          complete list (CoW merge / compact / overwrite / truncate).
        * ``added=[...]`` — APPEND: inherit the parent's manifest refs
          and add one new manifest with just these entries — the MoR
          hot path; metadata written per commit is O(batch).

        Concurrent-writer behavior: losing the optimistic version race
        is RETRIED (refresh + rebase) as long as the refreshed state
        shows this handle's own ref (main or its branch) unmoved — the
        written data files were computed against that head, so a race
        with a ref-disjoint commit (a tag, another branch's epoch, a
        state write, fast-forward of a different branch) is harmless
        and must not fail a micro-batch. If the ref itself moved, the
        staged files are stale and the conflict is re-raised — the
        caller owns true same-ref conflicts (one writer per ref, the
        reference's per-instance table ownership)."""
        expected_parent = self._head_id()
        for _ in range(10):
            meta = dict(self.metadata)
            if meta_updates:
                # re-applied on every rebase attempt: a ref-disjoint
                # race must not drop the caller's metadata change
                # (e.g. cluster_by's stats_ids/cluster_by_ids)
                meta.update(meta_updates)
            # ids are globally unique across main AND branches:
            # interleaved branch/main commits must never collide
            # (expiry keeps heads pinned, so the max over retained
            # snapshots + live refs is the true high-water mark)
            sid = 1 + max(
                [
                    meta["current_snapshot_id"] or 0,
                    *(self._ref(v)[0] for v in meta.get("branches", {}).values()),
                    *(s["id"] for s in meta["snapshots"]),
                ]
            )
            if added is not None:
                parent = self._raw_snapshot()
                if parent is None:
                    refs: list[str] = []
                elif "files" in parent:  # legacy inline parent → split once
                    refs = [self._write_manifest(parent["files"])]
                else:
                    refs = list(parent.get("manifests", ()))
                if added:
                    refs.append(self._write_manifest(added))
            else:
                refs = [self._write_manifest(files)] if files else []
            snap = {
                "id": sid,
                "parent": expected_parent,
                "timestamp_ms": int(time.time() * 1000),
                "schema_version": meta["schema_version"],
                "summary": summary,
                "manifests": refs,
            }
            meta["snapshots"] = [*meta["snapshots"], snap]
            if self._branch is None:
                meta["current_snapshot_id"] = sid
            else:
                if self._branch not in meta.get("branches", {}):
                    raise ValueError(
                        f"branch {self._branch!r} was dropped mid-write"
                    )
                _, fork = self._ref(meta["branches"][self._branch])
                meta["branches"] = {
                    **meta["branches"],
                    self._branch: {
                        "head": sid,
                        # legacy int refs: adopt the commit's own parent
                        # as the fork point going forward
                        "fork": fork if fork is not None else expected_parent,
                    },
                }
            try:
                self._write_metadata(
                    meta, expected_version=self.metadata["version"]
                )
                return
            except CommitConflict:
                self.refresh()
                if self._head_id() != expected_parent:
                    raise  # true conflict: OUR ref moved under us
                # ref-disjoint race (loser's manifest files are
                # unreferenced; remove_orphans reclaims them) — rebase
        raise CommitConflict(
            f"_commit_snapshot lost 10 straight ref-disjoint races at "
            f"{self.path}"
        )

    def _stat_fields(self) -> list[tuple]:
        """(field_id_str, current_name, type) for the stats columns."""
        sv_fields = {f["id"]: f for f in self.fields}
        return [
            (str(i), sv_fields[i]["name"], sv_fields[i]["type"])
            for i in self.stats_ids
            if i in sv_fields
        ]

    def _write_data(
        self, df: DataFrame, snap_tag: str, kind: str = "base",
        read_footers: bool | None = None, sort_by: list[str] | None = None,
        range_by: list[str] | None = None,
    ) -> list[dict]:
        """Write df (which must carry ``_bucket``) as one parquet
        directory per bucket under data/<snap_tag>/; returns manifest
        entries. repartition by _bucket keeps each output file inside a
        single bucket; partitionBy splits hash-colliding buckets.
        ``sort_by`` additionally orders rows inside each file (after the
        bucket repartition — no extra shuffle): sorted files get tight
        parquet row-group statistics, so key-predicate reads skip row
        groups inside the files the manifest stats couldn't skip.

        ``range_by`` instead RANGE-partitions the whole batch on those
        columns (Iceberg sort-order write): each task holds one slice
        of the sort-key domain across all buckets, and partitionBy then
        splits it bucket-pure — so every output file covers one bucket
        × one narrow key slice, and the manifest min/max bounds on the
        sort columns become disjoint across files. That is what turns
        ``read(ranges=...)`` from row filtering into driver-side FILE
        skipping. Same shuffle count as the hash path (one exchange).

        ``read_footers`` controls the per-file stats (row count +
        min/max of the ``stats_ids`` columns — Iceberg column bounds).
        Defaults on for base files, OFF for delta files — the streaming
        hot path must not pay a serial driver-side file open per bucket
        per micro-batch (on a real cluster these come from task commit
        messages)."""
        out_dir = os.path.join(self.path, "data", snap_tag)
        n_parts = max(1, df.sparkSession.sparkContext.defaultParallelism)
        if range_by:
            part = df.repartitionByRange(n_parts, *range_by)
            part = part.sortWithinPartitions(*range_by, *(sort_by or ()))
        else:
            part = df.repartition(n_parts, "_bucket")
            if sort_by:
                part = part.sortWithinPartitions("_bucket", *sort_by)
        part.write.mode("errorifexists").partitionBy("_bucket").parquet(out_dir)
        if read_footers is None:
            read_footers = kind == "base"
        paths = sorted(glob.glob(os.path.join(out_dir, "_bucket=*", "*.parquet")))
        rows_of: dict[str, int | None] = dict.fromkeys(paths)
        stats_of: dict[str, dict] = {p: {} for p in paths}
        if read_footers and paths:
            from concurrent.futures import ThreadPoolExecutor

            import pyarrow.parquet as pq

            stat_fields = self._stat_fields()

            def _rows(p):
                try:
                    md = pq.ParquetFile(p).metadata
                    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                    return p, md.num_rows, _footer_stats(md, idx, stat_fields)
                except Exception:
                    return p, None, {}

            with ThreadPoolExecutor(min(16, len(paths))) as ex:
                for p, rows, stats in ex.map(_rows, paths):
                    rows_of[p] = rows
                    stats_of[p] = stats
        sv = self.metadata["schema_version"]
        spec = self.bucket_spec_id
        entries = []
        for p in paths:
            bucket = int(p.split("_bucket=")[1].split(os.sep)[0])
            entries.append(
                {
                    "path": os.path.relpath(p, self.path),
                    "bucket": bucket,
                    "schema_version": sv,
                    "rows": rows_of[p],
                    "kind": kind,
                    **({"spec": spec} if spec else {}),
                    **({"stats": stats_of[p]} if stats_of[p] else {}),
                }
            )
        return entries

    def _write_data_spanning(self, df: DataFrame, snap_tag: str) -> list[dict]:
        """Shuffle-free delta write for the streaming hot path: the
        batch is written AS PARTITIONED BY THE SOURCE (no repartition,
        no per-bucket split — a micro-batch costs one narrow write of
        ~its input partition count in files). The ``_bucket`` column is
        STORED so compaction can find the touched buckets by scanning
        one column; the manifest marks these files ``bucket = -1``
        (spanning), and every bucket-pruned read includes them until
        compact() folds their rows into per-bucket base files.

        File count is throttled to ~1/4 of the input partitions (narrow
        coalesce — no shuffle): spanning files pressure EVERY bucket
        read, and the compaction cadence is pressure ÷ files-per-epoch,
        so fewer, bigger delta files amortize the fold across many
        micro-batches while keeping write parallelism for big batches."""
        out_dir = os.path.join(self.path, "data", snap_tag)
        n_in = df.rdd.getNumPartitions()
        if n_in > 1:
            df = df.coalesce(max(1, n_in // 4))
        df.write.mode("errorifexists").parquet(out_dir)
        return self._spanning_entries(
            sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
        )

    def _spanning_entries(self, paths: list[str]) -> list[dict]:
        """Manifest entries for spanning delta files: row count and
        max(_seq) read from the parquet footers (threaded, local —
        on a real cluster these come from task commit messages; the
        _seq stat makes the commit summary recoverable even if the
        Observation times out). Empty part files (an input partition
        with no rows) are DELETED so they never inflate the manifest
        or the compaction pressure."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        stat_fields = self._stat_fields()

        def _rows(p):
            try:
                md = pq.ParquetFile(p).metadata
                max_seq = None
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                if "_seq" in idx:
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx["_seq"]).statistics
                        if st is not None and st.has_min_max:
                            max_seq = st.max if max_seq is None else max(max_seq, st.max)
                # column bounds for delta files too — the footer is
                # already open, so this is free, and it lets lookups /
                # key-range reads skip delta files whose key ranges miss
                # (safe: every version of a key carries the same key
                # value; non-key bounds are ignored by the planner while
                # any delta file exists)
                return p, md.num_rows, max_seq, _footer_stats(md, idx, stat_fields)
            except Exception:
                return p, None, None, {}

        sv = self.metadata["schema_version"]
        spec = self.bucket_spec_id
        entries = []
        with ThreadPoolExecutor(min(16, max(1, len(paths)))) as ex:
            for p, rows, max_seq, stats in ex.map(_rows, paths):
                if rows == 0:
                    os.unlink(p)
                    continue
                entries.append(
                    {
                        "path": os.path.relpath(p, self.path),
                        "bucket": -1,
                        "schema_version": sv,
                        "rows": rows,
                        "max_seq": max_seq,
                        "kind": "delta",
                        **({"spec": spec} if spec else {}),
                        **({"stats": stats} if stats else {}),
                    }
                )
        return entries

    def adopt_spanning_files(
        self,
        src_paths: list[str],
        writer_id: str,
        batch_id: str,
        summary: dict | None = None,
    ) -> dict | None:
        """Commit externally-staged spanning delta files (payload +
        ``_seq``/``_sort``/``_deleted``/``_bucket`` columns, this
        table's CURRENT schema) as one MoR snapshot. The files are
        hard-linked into the table's data dir — no copy, no Spark job.
        This is the per-table commit half of the fused multi-table
        write: ONE Spark job demuxes a whole micro-batch into staging
        (partitioned by table), then each table adopts its slice
        driver-side. Idempotent by (writer-id, batch-id) like merge()."""
        if self.is_applied(writer_id, batch_id):
            return None
        tag = f"delta-{uuid.uuid4().hex[:12]}"
        dst_dir = os.path.join(self.path, "data", tag)
        os.makedirs(dst_dir, exist_ok=True)
        linked = []
        for i, src in enumerate(sorted(src_paths)):
            dst = os.path.join(dst_dir, f"part-{i:05d}.parquet")
            try:
                os.link(src, dst)
            except OSError:
                import shutil

                shutil.copy2(src, dst)  # cross-device staging
            linked.append(dst)
        entries = self._spanning_entries(linked)
        if not entries:
            self._discard_uncommitted(tag)
            return {"buckets": [], "files": 0, "upserts": 0, "deletes": 0}
        n = sum(f["rows"] or 0 for f in entries)
        seqs = [f["max_seq"] for f in entries if f.get("max_seq") is not None]
        max_seq = int(max(seqs)) if seqs else -1
        self._commit_snapshot(
            added=entries,
            summary={
                "operation": "merge-mor",
                "writer-id": writer_id,
                "batch-id": str(batch_id),
                "upserts": n,
                "deletes": 0,
                "delta-files": len(entries),
                "max-seq": max_seq,
                **(summary or {}),
            },
        )
        return {
            "buckets": sorted({f["bucket"] for f in entries}),
            "files": len(entries),
            "upserts": n,
            "deletes": 0,
            "max_seq": max_seq,
        }

    def overwrite(self, df: DataFrame, writer_id: str, batch_id: str, summary: dict | None = None) -> bool:
        """Replace the table contents (snapshot-style full load)."""
        if self.is_applied(writer_id, batch_id):
            return False
        cols = set(df.columns)
        if "_seq" not in cols:
            df = df.withColumn("_seq", F.lit(0).cast("long"))
        if "_sort" not in cols:
            df = df.withColumn("_sort", F.lit(0).cast("long"))
        if "_deleted" not in cols:
            df = df.withColumn("_deleted", F.lit(False))
        tagged = df.withColumn("_bucket", self.bucket_expr())
        files = self._write_data(tagged, f"snap-{uuid.uuid4().hex[:12]}")
        self._commit_snapshot(
            files,
            {
                "operation": "overwrite",
                "writer-id": writer_id,
                "batch-id": str(batch_id),
                **(summary or {}),
            },
        )
        return True

    def merge(
        self,
        batch: DataFrame,
        writer_id: str,
        batch_id: str,
        op_col: str = "op",
        seq_col: str = "seq",
        delete_op: str = "DELETE",
        summary: dict | None = None,
        mode: str = "cow",
        precommit=None,
        sort_col=None,  # str | tuple — composite sortKeys pack to array<bigint>
        fanout: bool = False,  # MoR only: per-bucket delta files (see _merge_mor)
    ) -> dict | None:
        """Copy-on-write MERGE keyed on ``key_cols``, guarded by seq.

        ``batch`` carries the current-schema payload columns plus
        ``op_col`` and ``seq_col``; it does NOT need to be
        pre-collapsed — the merge's own argmax-by-seq collapses
        duplicate keys, duplicate-seq replays, and target rows in one
        aggregation (one shuffle). Semantics = Iceberg/SQL MERGE
        with a version guard (the standard CDC-upsert shape):
          WHEN MATCHED AND src.seq > tgt._seq AND op=DELETE → DELETE
          WHEN MATCHED AND src.seq > tgt._seq              → UPDATE *
          WHEN NOT MATCHED AND op<>DELETE                  → INSERT *

        The guard makes apply correct for UNORDERED delivery across
        micro-batches (reference: UN_ORDERED sources resolved by sort
        keys at the target, SourceProperties.java:29-32): an event
        routed into a later batch than a newer event for the same key
        can never regress the row. DELETEs persist as tombstones
        (``_deleted``) so a late stale UPDATE cannot resurrect a
        deleted key.

        Physical plan: union(target-of-affected-buckets, batch) →
        algebraic LWW collapse (partial-agg map-side combine) →
        rewrite ONLY affected buckets. The big unaffected remainder of
        the table is untouched metadata; the shuffle is bounded by the
        affected buckets + batch. Batch-side counts and max-seq are
        collected with ``observe`` DURING the write job — the whole
        merge is ONE pass over the batch when the table is empty, two
        (distinct-buckets probe + write) when it isn't. Returns commit
        stats, or None if (writer-id, batch-id) was already applied
        (idempotent replay — reference contract EventConsumer.java:39-76).
        """
        from pyspark.sql import Observation

        if self.is_applied(writer_id, batch_id):
            return None
        payload = [f["name"] for f in self.fields]
        keys = self.key_cols
        batch = batch.withColumn("_bucket", self.bucket_expr())
        cur = self.current_snapshot
        has_files = bool(cur and cur["files"])
        if mode == "auto":
            mode = "mor" if has_files else "cow"
        if mode == "mor":
            return self._merge_mor(
                batch, writer_id, batch_id, payload, op_col, seq_col, delete_op,
                summary, precommit, sort_col, fanout=fanout,
            )
        if has_files:
            cur_spec = self.bucket_spec_id
            foreign = [
                f
                for f in cur["files"]
                if f["bucket"] != -1 and self._entry_spec(f) != cur_spec
            ]
            specs = sorted({self._entry_spec(f) for f in foreign})
            # cheap probe: ONE agg job over just the bucket-key column
            # (column pruning) yields the affected buckets under the
            # current spec AND under every live foreign spec (a
            # foreign-spec file can only hold a batch key if its
            # OWN-modulus bucket id matches — per-spec pruning keeps a
            # post-rebucket merge proportional, never a full rewrite)
            probe = batch.agg(
                F.collect_set("_bucket").alias("cur"),
                *[
                    F.collect_set(
                        F.pmod(
                            F.xxhash64(F.col(self.bucket_col)),
                            F.lit(self.bucket_specs[s]),
                        )
                    ).alias(f"s{s}")
                    for s in specs
                ],
            ).collect()[0]
            affected = sorted(probe["cur"])
            if not affected:
                return {"buckets": [], "files": 0, "upserts": 0, "deletes": 0}
            bset_by_spec = {s: set(probe[f"s{s}"]) for s in specs}
            replaced_foreign = [
                f for f in foreign if f["bucket"] in bset_by_spec[self._entry_spec(f)]
            ]
            # target = (current-spec affected buckets + spanning rows in
            # them) ∪ (replaced foreign-spec files read WHOLE — they are
            # dropped below, so every row must enter the rewrite; this
            # is also how a rebucketed table migrates incrementally)
            target = self._scan_entries(
                cur["files"],
                self.fields,
                bset=set(affected),
                include_system=True,
                exclude_foreign=True,
            )
            if replaced_foreign:
                target = target.unionByName(
                    self._scan_entries(
                        replaced_foreign, self.fields, include_system=True
                    )
                )
            target = target.withColumn("_bucket", self.bucket_expr())
            dropped = {f["path"] for f in replaced_foreign}
            kept = [
                f
                for f in cur["files"]
                if f["path"] not in dropped
                and (
                    f["bucket"] == -1
                    or self._entry_spec(f) != cur_spec
                    or f["bucket"] not in set(affected)
                )
            ]
        else:
            affected = None  # derived from written files post-hoc
            target = None
            kept = list(cur["files"]) if cur else []

        obs = Observation()
        batch_sys = batch.select(
            *payload,
            F.col(seq_col).cast("long").alias("_seq"),
            self._sort_expr(batch, sort_col).alias("_sort"),
            (F.col(op_col) == delete_op).alias("_deleted"),
            F.col("_bucket"),
        ).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("_deleted")).alias("dels"),
            F.max("_seq").alias("max_seq"),
        )
        combined = target.unionByName(batch_sys) if target is not None else batch_sys
        # argmax-by-(_seq, _sort) per key in ONE aggregation (map-side
        # partial combine collapses hot keys before the shuffle)
        new_data = lww_collapse(combined, keys, "_seq", sort_cols=("_sort",))
        snap_tag = f"snap-{uuid.uuid4().hex[:12]}"
        files_new = self._write_data(new_data, snap_tag)
        if precommit is not None and not precommit():
            self._discard_uncommitted(snap_tag)
            return {"aborted": True}
        m = observe_get(obs) or {"n": 0, "dels": 0, "max_seq": None}
        n_batch, n_del = m["n"], m["dels"] or 0
        if affected is None:
            affected = sorted({f["bucket"] for f in files_new})
        if n_batch == 0 and not files_new:
            return {"buckets": [], "files": 0, "upserts": 0, "deletes": 0}
        self._commit_snapshot(
            kept + files_new,
            {
                "operation": "merge",
                "writer-id": writer_id,
                "batch-id": str(batch_id),
                "upserts": n_batch - n_del,
                "deletes": n_del,
                "rewritten-buckets": len(affected),
                "max-seq": int(m["max_seq"]) if m["max_seq"] is not None else -1,
                **(summary or {}),
            },
        )
        return {
            "buckets": affected,
            "files": len(files_new),
            "upserts": n_batch - n_del,
            "deletes": n_del,
            "max_seq": int(m["max_seq"]) if m["max_seq"] is not None else -1,
        }

    def _discard_uncommitted(self, snap_tag: str) -> None:
        """Remove data files written for a commit that was aborted
        before the metadata claim — nothing references them."""
        import shutil

        shutil.rmtree(os.path.join(self.path, "data", snap_tag), ignore_errors=True)

    def _merge_mor(
        self, batch, writer_id, batch_id, payload, op_col, seq_col, delete_op,
        summary, precommit=None, sort_col=None, fanout=False,
    ) -> dict:
        """Merge-on-read apply: append the batch's rows (with ``_seq``
        version guard + ``_deleted`` tombstones) as delta files. The
        target is never read or rewritten — a micro-batch costs
        O(batch), not O(touched buckets of table). Two write shapes:

        * default (``fanout=False``): SPANNING delta files — one
          narrow shuffle-free job writing the batch as partitioned by
          the source. Cheapest per-epoch cost for a TRICKLE, but every
          spanning file taxes every bucket read until ``compact()``
          absorbs it, and absorption is O(table) — at a steady high
          rate the amortized compaction cost grows with the table.
        * ``fanout=True``: per-BUCKET delta files (Iceberg's fanout
          writer) — one repartition of the BATCH on ``_bucket``, then
          bucket-pure files marked with their real bucket id. Costs a
          (batch-sized, cheap) shuffle and more files per epoch, buys
          parquet-encode parallelism = cluster width, bucket-pruned
          delta reads (no spanning tax), and per-bucket compaction
          pressure — buckets compact independently and proportionally
          to their churn, which is the shape that stays bounded at
          100 TB. Pick fanout for sustained throughput, spanning for
          low-rate trickles (``PipelineConfig.mor_fanout``).

        Read-time argmax-by-_seq folds deltas against base (same
        semantics as the CoW path — out-of-order events across
        micro-batches can never regress a row, DELETEs tombstone);
        ``compact()`` absorbs deltas into base. This is Iceberg's
        merge-on-read with equality deletes, rebuilt on the same
        manifest machinery (idempotency contract unchanged:
        EventConsumer.java:39-76)."""
        from pyspark.sql import Observation

        obs = Observation()
        batch_sys = batch.select(
            *payload,
            F.col(seq_col).cast("long").alias("_seq"),
            self._sort_expr(batch, sort_col).alias("_sort"),
            (F.col(op_col) == delete_op).alias("_deleted"),
            F.col("_bucket"),
        ).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("_deleted")).alias("dels"),
            F.max("_seq").alias("max_seq"),
        )
        snap_tag = f"delta-{uuid.uuid4().hex[:12]}"
        if fanout:
            # read_footers=True: per-file row counts are part of the
            # manifest contract every other producer honors (service
            # delta-row gauges, interop consumers) — same threaded
            # local footer pass the spanning writer does; on a real
            # cluster these come from task commit messages
            files_new = self._write_data(
                batch_sys, snap_tag, kind="delta", read_footers=True
            )
        else:
            files_new = self._write_data_spanning(batch_sys, snap_tag)
        if precommit is not None and not precommit():
            self._discard_uncommitted(snap_tag)
            return {"aborted": True}
        # emptiness test is files_new, NOT the observation: zero-row
        # part files were already pruned, so files_new==[] ⟺ empty
        # batch. An Observation timeout must read as metrics-unknown —
        # discarding proven-nonempty files on a slow listener bus would
        # silently drop the batch while the checkpoint advances
        # (exactly-once violation; the files are the ground truth).
        if not files_new:
            self._discard_uncommitted(snap_tag)
            return {"buckets": [], "files": 0, "upserts": 0, "deletes": 0}
        m = observe_get(obs)
        if m is not None:
            n_batch, n_del = m["n"], m["dels"] or 0
            max_seq = int(m["max_seq"]) if m["max_seq"] is not None else -1
        else:
            # metrics recovered from the parquet footers read at write
            # time (rows exact, max_seq from row-group stats; the
            # delete count is unobservable here → reported as 0 with
            # a degraded marker, never affects correctness). Fanout
            # entries carry rows but not max_seq — open their footers
            # ONLY on this rare Observation-timeout fallback.
            if any(
                f["rows"] is None or f.get("max_seq") is None
                for f in files_new
            ):
                import pyarrow.parquet as pq

                for f in files_new:
                    if f["rows"] is not None and f.get("max_seq") is not None:
                        continue
                    md = pq.ParquetFile(
                        os.path.join(self.path, f["path"])
                    ).metadata
                    f["rows"] = md.num_rows
                    idx = {
                        md.schema.column(i).name: i
                        for i in range(md.num_columns)
                    }
                    if "_seq" in idx:
                        mx = None
                        for rg in range(md.num_row_groups):
                            st = md.row_group(rg).column(idx["_seq"]).statistics
                            if st is not None and st.has_min_max:
                                mx = st.max if mx is None else max(mx, st.max)
                        if mx is not None:
                            f["max_seq"] = mx
            n_batch = sum(f["rows"] or 0 for f in files_new)
            n_del = 0
            seqs = [f["max_seq"] for f in files_new if f.get("max_seq") is not None]
            max_seq = int(max(seqs)) if seqs else -1
        affected = sorted({f["bucket"] for f in files_new})
        # append commit: inherits the parent's manifests and writes ONE
        # new manifest of just this batch's delta files — per-commit
        # metadata cost is O(batch), never O(table)
        self._commit_snapshot(
            added=files_new,
            summary={
                "operation": "merge-mor",
                "writer-id": writer_id,
                "batch-id": str(batch_id),
                "upserts": n_batch - n_del,
                "deletes": n_del,
                "delta-files": len(files_new),
                "max-seq": max_seq,
                **({"metrics-degraded": True} if m is None else {}),
                **(summary or {}),
            },
        )
        return {
            "buckets": affected,
            "files": len(files_new),
            "upserts": n_batch - n_del,
            "deletes": n_del,
            "max_seq": max_seq,
        }

    def delta_file_pressure(self) -> int:
        """Delta-file read-amplification bound in the current snapshot:
        max per-bucket delta count plus the spanning-file count (a
        spanning file weighs on EVERY bucket read). The pipeline's
        cheap (in-memory) compaction trigger."""
        cur = self.current_snapshot
        if not cur:
            return 0
        counts: dict[int, int] = {}
        spanning = 0
        for f in cur["files"]:
            if f.get("kind") == "delta":
                if f["bucket"] == -1:
                    spanning += 1
                else:
                    counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
        return max(counts.values(), default=0) + spanning

    # ------------------------------------------------------ DDL

    def apply_ddl(self, ddl: dict) -> bool:
        """Idempotent metadata-only schema evolution (reference:
        applyDDL contract, EventConsumer.java:39-55; CREATE/ALTER as
        Iceberg UpdateSchema). Returns True if the schema changed."""
        op = ddl["op"]
        fields = [dict(f) for f in self.fields]
        names = {f["name"] for f in fields}
        if op == "ADD_COLUMN":
            if ddl["column"] in names:
                return False  # replayed — already applied
            fields.append(
                {
                    # fresh id over EVERY schema version ever: a column
                    # re-added after DROP_COLUMN must not inherit the
                    # dropped id, or old files' data would resurrect
                    "id": max(
                        f["id"]
                        for sv in self.metadata["schemas"].values()
                        for f in sv
                    )
                    + 1,
                    "name": ddl["column"],
                    "type": ddl["new_type"],
                    "nullable": True,
                }
            )
        elif op == "RENAME_COLUMN":
            if ddl["column"] not in names:
                if ddl["new_name"] in names:
                    return False  # replayed
                raise ValueError(f"rename: no column {ddl['column']}")
            for f in fields:
                if f["name"] == ddl["column"]:
                    f["name"] = ddl["new_name"]
        elif op == "DROP_COLUMN":
            if ddl["column"] not in names:
                return False  # replayed — already dropped
            target = next(f for f in fields if f["name"] == ddl["column"])
            protected = set(self.metadata["key_ids"]) | {self.metadata["bucket_id"]}
            if target["id"] in protected:
                raise ValueError(
                    f"cannot drop key/bucket column {ddl['column']}"
                )
            # drop by removing the field from the NEW schema version
            # only: the column id stays in older schema versions, so
            # time travel still reads it and old files still align; a
            # re-ADD later gets a FRESH id (Iceberg drop semantics — no
            # accidental data resurrection)
            fields = [f for f in fields if f["id"] != target["id"]]
        elif op == "WIDEN_COLUMN":
            fld = next((f for f in fields if f["name"] == ddl["column"]), None)
            if fld is None:
                raise ValueError(f"widen: no column {ddl['column']}")
            if fld["type"] == ddl["new_type"]:
                return False  # replayed
            if not can_widen(fld["type"], ddl["new_type"]):
                raise ValueError(f"illegal widen {fld['type']} -> {ddl['new_type']}")
            fld["type"] = ddl["new_type"]
        else:
            raise ValueError(f"unknown DDL op {op}")
        meta = dict(self.metadata)
        sv = meta["schema_version"] + 1
        meta["schema_version"] = sv
        meta["schemas"] = {**meta["schemas"], str(sv): fields}
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return True

    # ------------------------------------------------ maintenance

    def _rollback_plan(
        self, snapshot_id: int | None, tag: str | None
    ) -> tuple[int, list[int]]:
        """Shared validation + abandoned-chain walk for rollback_to and
        rollback_preview (one implementation, so the preview can never
        drift from what the commit actually does). Returns (target sid,
        chain of snapshot ids head→target exclusive, head first);
        an empty chain means already at the target — including when
        the head IS the idempotent rollback commit to that target."""
        if self._branch is not None:
            raise ValueError(
                "rollback_to operates on main; rewind a branch by "
                "drop_branch/create_branch at the desired snapshot"
            )
        if (snapshot_id is None) == (tag is None):
            raise ValueError("pass exactly one of snapshot_id or tag")
        if tag is not None:
            if tag not in self.tags:
                raise ValueError(f"unknown tag {tag!r}")
            snapshot_id = self.tags[tag]
        sid = int(snapshot_id)
        head = self.metadata["current_snapshot_id"]
        if head is None:
            raise ValueError("cannot roll back an empty table")
        if sid == head:
            return sid, []
        head_snap = self._raw_snapshot(head)
        if (
            head_snap["summary"].get("operation") == "rollback"
            and head_snap["summary"].get("rolled-back-to") == str(sid)
        ):
            return sid, []  # idempotent: head already IS this rollback
        if not self._is_ancestor(sid, head):
            raise ValueError(
                f"snapshot {sid} is not an ancestor of the current head "
                f"{head} (expired, on a branch, or never existed)"
            )
        by_id = {s["id"]: s for s in self.metadata["snapshots"]}
        chain: list[int] = []
        cur: int | None = head
        while cur is not None and cur != sid:
            chain.append(cur)
            cur = by_id[cur].get("parent")
        return sid, chain

    def rollback_preview(
        self, snapshot_id: int | None = None, *, tag: str | None = None
    ) -> dict:
        """Blast-radius preview of ``rollback_to`` without committing:
        what the drill would revoke and where each affected writer's
        seq high-water mark would fall back to. Snapshots a PREVIOUS
        rollback already revoked are not re-reported (their markers
        are already open), so re-previewing an applied drill returns
        an empty plan — exactly matching rollback_to returning 0."""
        sid, chain = self._rollback_plan(snapshot_id, tag)
        by_id = {s["id"]: s for s in self.metadata["snapshots"]}
        fresh = [c for c in chain if not by_id[c].get("rolled_back")]
        markers = [
            [by_id[c]["summary"]["writer-id"], by_id[c]["summary"]["batch-id"]]
            for c in fresh
            if by_id[c]["summary"].get("writer-id")
            and by_id[c]["summary"].get("batch-id")
        ]
        cut = set(chain)
        writers = {w for w, _ in markers}
        return {
            "target_snapshot_id": sid,
            "already_at_target": not chain,
            "revoked_snapshots": fresh,
            "reopened_batches": markers,
            "seq_hwm_after": {
                w: max(
                    (
                        int(s["summary"]["max-seq"])
                        for s in self.metadata["snapshots"]
                        if s["id"] not in cut
                        and not s.get("rolled_back")
                        and "max-seq" in s["summary"]
                        and s["summary"].get("writer-id") == w
                    ),
                    default=-1,
                )
                for w in sorted(writers)
            },
        }

    def rollback_to(self, snapshot_id: int | None = None, *, tag: str | None = None) -> int:
        """Roll main back to an ancestor snapshot (Iceberg
        ``rollback_to_snapshot`` procedure analog) with CDC-correct
        exactly-once semantics: a metadata-only commit whose manifests
        are the target's (no data file moves), while every snapshot on
        the abandoned lineage is flagged ``rolled_back`` so

        * ``is_applied`` forgets its (writer-id, batch-id) markers —
          re-running the pipeline RE-APPLIES the rolled-back batches
          instead of exactly-once-skipping them into data loss,
        * ``last_committed_seq`` drops back to the target lineage —
          the seq-dedup guard re-admits the rolled-back events, and
        * ``expire_snapshots`` never folds their markers into
          ``applied_markers``.

        Data only: the table keeps its CURRENT schema (reads map old
        layouts by field id), matching Iceberg where rollback moves
        the snapshot pointer but not table metadata. The abandoned
        snapshots stay time-travelable by id until expiry retires
        them (their files are reclaimed then). The rollback commit
        parents on the abandoned head, so ``read_changes`` across it
        emits the retractions a change-feed consumer needs to undo
        the bad batches downstream. Returns the number of snapshots
        FRESHLY revoked (matching ``rollback_preview``'s plan — a
        chain crossing an earlier drill's already-revoked snapshots
        does not recount them); 0 when already at the target.
        Reference analog:
        replication targets must be rewindable to a consistent
        offset for replay (CDCOffsetStore contract — resume is
        always from the last COMMITTED offset, never a poisoned
        one)."""
        sid, chain = self._rollback_plan(snapshot_id, tag)
        if not chain:
            return 0  # already at the target (or its rollback commit)
        target = self._raw_snapshot(sid)
        head = self.metadata["current_snapshot_id"]
        revoked: set[int] = set(chain)
        # count (and summarize) only FRESHLY revoked snapshots: a
        # second rollback whose abandoned lineage crosses an earlier
        # drill must report the same blast radius rollback_preview
        # showed (those markers are already open — re-flagging them
        # below is idempotent, re-counting them would overstate)
        by_id = {s["id"]: s for s in self.metadata["snapshots"]}
        fresh = [c for c in chain if not by_id[c].get("rolled_back")]
        if "files" in target:  # legacy inline manifest → split once
            refs = [self._write_manifest(target["files"])]
        else:
            refs = list(target.get("manifests", ()))
        meta = dict(self.metadata)
        new_sid = 1 + max(
            [
                meta["current_snapshot_id"] or 0,
                *(self._ref(v)[0] for v in meta.get("branches", {}).values()),
                *(s["id"] for s in meta["snapshots"]),
            ]
        )
        snap = {
            "id": new_sid,
            "parent": head,
            "timestamp_ms": int(time.time() * 1000),
            "schema_version": meta["schema_version"],
            "summary": {
                "operation": "rollback",
                "rolled-back-to": str(sid),
                "revoked-snapshots": str(len(fresh)),
            },
            "manifests": refs,
        }
        meta["snapshots"] = [
            {**s, "rolled_back": True} if s["id"] in revoked else s
            for s in meta["snapshots"]
        ] + [snap]
        meta["current_snapshot_id"] = new_sid
        self._write_metadata(meta, expected_version=self.metadata["version"])
        return len(fresh)

    def expire_snapshots(
        self,
        keep_last: int = 5,
        delete_files: bool = True,
        keep_markers: int = 1024,
    ) -> int:
        """Expire all but the newest ``keep_last`` snapshots and delete
        data files no retained snapshot references (Iceberg
        expire_snapshots). Exactly-once markers of expired snapshots
        are folded into ``applied_markers`` so replay detection
        survives expiry. A per-micro-batch streaming sink MUST run this
        periodically or metadata grows without bound.

        ``keep_markers`` bounds the folded marker list PER WRITER (the
        lists are in commit order; the oldest fall off): without a cap
        the metadata document grows one batch-id string per micro-batch
        forever. Retention a replay can actually reach is tiny — a
        Spark checkpoint re-runs at most the newest uncommitted epoch,
        and the reference keeps only the single LAST (offset, seq) per
        writer (DBReplicationOffsetStore.java:92-99) — so the default
        keeps three orders of magnitude more history than either needs
        while pinning metadata size ~flat over an unbounded run."""
        snaps = self.metadata["snapshots"]
        if len(snaps) <= keep_last:
            return 0
        snaps_sorted = sorted(snaps, key=lambda s: s["id"])
        # tagged snapshots, branch heads, and main's head are pinned
        # (Iceberg refs): retention prunes around them, so a ref
        # outlives any keep_last policy (and a burst of branch commits
        # can never expire main's serving state out from under readers)
        pinned = set(self.tags.values()) | set(self.branches.values())
        # fork points pin too: audit_diff/fast_forward file-diff against
        # the fork when main sits there (branches created from an older
        # snapshot would otherwise lose it)
        for v in self.metadata.get("branches", {}).values():
            _, fork = self._ref(v)
            if fork is not None:
                pinned.add(fork)
        if self.metadata["current_snapshot_id"] is not None:
            pinned.add(self.metadata["current_snapshot_id"])
        tail = {s["id"] for s in snaps_sorted[-keep_last:]}
        retained = [s for s in snaps_sorted if s["id"] in tail or s["id"] in pinned]
        expired = [s for s in snaps_sorted if s["id"] not in tail and s["id"] not in pinned]
        if not expired:
            return 0
        markers = {k: list(v) for k, v in self.metadata.get("applied_markers", {}).items()}
        for s in expired:
            if s.get("rolled_back"):
                continue  # revoked markers must not survive expiry
            w, b = s["summary"].get("writer-id"), s["summary"].get("batch-id")
            if w and b:
                markers.setdefault(w, [])
                if b not in markers[w]:
                    markers[w].append(b)
        if keep_markers:
            markers = {w: v[-keep_markers:] for w, v in markers.items()}
        live = {f["path"] for s in retained for f in self._resolve_files(s)}
        dead = {
            f["path"]
            for s in expired
            for f in self._resolve_files(s)
            if f["path"] not in live
        }
        # manifest GC: delete manifest files no retained snapshot
        # references (manifests are immutable and shared via refs)
        live_m = {m for s in retained for m in s.get("manifests", ())}
        dead_m = {
            m for s in expired for m in s.get("manifests", ()) if m not in live_m
        }
        meta = dict(self.metadata)
        meta["snapshots"] = retained
        meta["applied_markers"] = markers
        self._write_metadata(meta, expected_version=self.metadata["version"])
        if delete_files:
            for rel in dead | dead_m:
                try:
                    os.remove(os.path.join(self.path, rel))
                except FileNotFoundError:
                    pass
            for rel in dead_m:
                self._manifest_cache.pop(rel, None)
        return len(expired)

    def migrate_inline_manifests(self) -> int:
        """One-shot metadata migration: rewrite every retained snapshot
        still storing a legacy inline ``files`` list (the
        pre-split-manifest format) to immutable manifest refs, so an
        idle table's metadata document stops carrying O(files ×
        snapshots) inline state. The commit path already splits a
        legacy PARENT lazily on the next append, but a table nobody
        writes to again would stay monolithic forever — this is the
        explicit upgrade. Reference analog: the one-shot HCFS→SQL state
        migration, StateStoreMigrator.java:52-106 (old layout readable
        until migrated, migration idempotent).

        Returns the number of snapshots migrated (0 = nothing legacy).
        Concurrent-writer-safe: retries on CommitConflict; manifests
        written by a losing attempt are unreferenced and reclaimed by
        ``remove_orphans``. Readers never notice — ``_resolve_files``
        accepts both shapes before, during, and after."""
        from .commit import CommitConflict

        for _ in range(10):
            meta = dict(self.metadata)
            migrated, n = [], 0
            for s in meta["snapshots"]:
                if "files" in s:
                    s2 = {k: v for k, v in s.items() if k != "files"}
                    s2["manifests"] = (
                        [self._write_manifest(list(s["files"]))]
                        if s["files"]
                        else []
                    )
                    migrated.append(s2)
                    n += 1
                else:
                    migrated.append(s)
            if n == 0:
                return 0
            meta["snapshots"] = migrated
            try:
                self._write_metadata(meta, expected_version=self.metadata["version"])
                return n
            except CommitConflict:
                self.refresh()
        raise CommitConflict(
            f"migrate_inline_manifests lost 10 straight races at {self.path}"
        )

    def remove_orphans(
        self, older_than_s: float = 3600.0, dry_run: bool = False
    ) -> list[str]:
        """Delete on-disk files that NO retained snapshot references
        (Iceberg remove_orphan_files). Crash-leaked files are the
        target: a writer that died after ``_write_data`` but before its
        commit leaves parquet under data/ forever — on POSIX and object
        stores alike — and ``_discard_uncommitted`` only runs when the
        writer survives to see the failure. The ``older_than_s`` age
        guard keeps in-flight writers' fresh files safe (pick it above
        the longest plausible write+commit latency). Returns the
        removed (or, with ``dry_run``, would-be-removed) relative
        paths. Idempotent and safe to run concurrently with readers:
        only unreferenced files are touched, and references are
        resolved from the CURRENT metadata (refresh first)."""
        import glob as _glob

        # reload metadata NOW: a long-lived handle's in-memory snapshot
        # list may predate other writers' commits, and any file they
        # committed since would look unreferenced — deleting live data
        self.refresh()
        now = time.time()
        referenced: set[str] = set()
        for s in self.metadata["snapshots"]:
            referenced |= {f["path"] for f in self._resolve_files(s)}
            referenced |= set(s.get("manifests", ()))
        orphans: list[str] = []
        roots = (
            os.path.join(self.path, "data"),
            os.path.join(self.path, "metadata", "manifests"),
        )
        for root in roots:
            for p in _glob.glob(os.path.join(root, "**", "*"), recursive=True):
                if not os.path.isfile(p):
                    continue
                rel = os.path.relpath(p, self.path)
                if rel in referenced:
                    continue
                if now - os.path.getmtime(p) < older_than_s:
                    continue
                orphans.append(rel)
        if not dry_run:
            for rel in orphans:
                try:
                    os.remove(os.path.join(self.path, rel))
                except FileNotFoundError:
                    pass
            for root in roots:  # prune now-empty snapshot-tag dirs
                for p in sorted(
                    _glob.glob(os.path.join(root, "**", ""), recursive=True),
                    key=len,
                    reverse=True,
                ):
                    if os.path.normpath(p) == os.path.normpath(root):
                        continue
                    try:
                        os.rmdir(p)
                    except OSError:
                        pass
        return sorted(orphans)

    def compact(self, max_files_per_bucket: int = 4) -> int:
        """Rewrite crowded buckets into one file set and ABSORB spanning
        delta files (their touched buckets found by scanning just the
        stored ``_bucket`` column — a cheap columnar read). Data is
        unchanged; the commit carries no writer/batch marker
        (maintenance, not apply). Small delta files accumulate per
        micro-batch in a streaming sink — compaction keeps read
        amplification flat."""
        cur = self.current_snapshot
        if cur is None:
            return 0
        cur_spec = self.bucket_spec_id
        cur_n = self.num_buckets
        spanning = [f for f in cur["files"] if f["bucket"] == -1]
        # foreign-spec files (pre-rebucket) are ALWAYS absorbed: they
        # tax every pruned read with a row-filtered scan until they are
        # rewritten under the current spec — compaction is the migration
        foreign = [
            f
            for f in cur["files"]
            if f["bucket"] != -1 and self._entry_spec(f) != cur_spec
        ]
        by_bucket: dict[int, int] = {}
        for f in cur["files"]:
            if f["bucket"] != -1 and self._entry_spec(f) == cur_spec:
                by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + 1
        crowded = {b for b, n in by_bucket.items() if n > max_files_per_bucket}
        # buckets touched by spanning/foreign files, under the CURRENT
        # spec (control-plane: a columnar read of one column, distinct
        # to ≤ num_buckets ints). Stored _bucket is only trusted for
        # current-spec files; foreign rows recompute the hash.
        recompute = foreign + [f for f in spanning if self._entry_spec(f) != cur_spec]
        for group, use_stored in (
            ([f for f in spanning if self._entry_spec(f) == cur_spec], True),
            (recompute, False),
        ):
            if not group:
                continue
            if use_stored:
                sp = self.spark.read.parquet(
                    *[os.path.join(self.path, f["path"]) for f in group]
                )
                crowded |= {r[0] for r in sp.select("_bucket").distinct().collect()}
            else:
                # column NAME varies with each file's schema version
                by_sv: dict[int, list[str]] = {}
                for f in group:
                    by_sv.setdefault(f["schema_version"], []).append(
                        os.path.join(self.path, f["path"])
                    )
                for sv, paths in by_sv.items():
                    bname = self._bucket_name_in(self.metadata["schemas"][str(sv)])
                    sp = self.spark.read.parquet(*paths)
                    crowded |= {
                        r[0]
                        for r in sp.select(
                            F.pmod(F.xxhash64(F.col(bname)), F.lit(cur_n)).alias("b")
                        )
                        .distinct()
                        .collect()
                    }
        if not crowded:
            return 0
        crowded = sorted(crowded)
        # key-predicate read: crowded current-spec buckets file-pruned,
        # spanning + foreign rows row-filtered — and since ``crowded``
        # covers every bucket those files touch, ALL their rows fold in
        data = self.read(buckets=crowded, include_system=True).withColumn(
            "_bucket", self.bucket_expr()
        )
        # clustered tables keep their sort order through maintenance
        # (range-disjoint files on the cluster columns); otherwise sort
        # within files by key: tight parquet row-group stats, so
        # key-range reads skip row groups (Iceberg sort-order rewrite)
        rng = self.cluster_cols
        files_new = self._write_data(
            data,
            f"compact-{uuid.uuid4().hex[:12]}",
            sort_by=self.key_cols if not rng else None,
            range_by=rng or None,
        )
        kept = [
            f for f in cur["files"]
            if f["bucket"] != -1
            and self._entry_spec(f) == cur_spec
            and f["bucket"] not in set(crowded)
        ]
        self._commit_snapshot(
            kept + files_new,
            {"operation": "compact", "compacted-buckets": len(crowded)},
        )
        return len(crowded)

    def cluster_by(self, cols: list[str]) -> int:
        """Sort-order rewrite (Iceberg ``rewrite_data_files`` with a
        sort order / Delta ``OPTIMIZE ZORDER`` analog): rewrite the
        current state so data files are RANGE-DISJOINT on ``cols``.
        Rows are range-partitioned on the sort key across the table,
        then split bucket-pure inside each slice — every output file
        covers one bucket × one narrow slice of the sort-key domain.
        ``cols`` join the manifest stats set, so from this commit on
        ``read(ranges={col: ...})`` plans down to O(matching slices ×
        buckets) files entirely driver-side, instead of row-filtering
        every file (hash buckets alone spread every key range over ALL
        files). Key/bucket semantics are untouched: files stay
        bucket-pure, so hash pruning, ``lookup`` and MERGE see the
        layout contract they always had, and ``compact`` preserves the
        clustering on later maintenance.

        A full CoW rewrite: MoR deltas are folded in and tombstones
        purged (no older file remains for them to guard), leaving a
        delta-free snapshot — exactly the state where non-key stats
        skipping is sound. Maintenance, not apply: no writer markers;
        snapshot isolation keeps concurrent readers consistent. At
        100 TB the same call runs per bucket-range or incrementally —
        clustering cost amortizes against every selective scan after.

        Returns the number of files written. The sort order is
        recorded by FIELD ID (rename-proof) and visible as
        ``cluster_cols``."""
        cur = self.current_snapshot
        if cur is None or not cur["files"]:
            return 0
        name_to_id = {f["name"]: f["id"] for f in self.fields}
        missing = [c for c in cols if c not in name_to_id]
        if missing:
            raise ValueError(f"unknown cluster column(s) {missing}")
        if not cols:
            raise ValueError("cluster_by needs at least one column")
        # stats for the sort columns are what makes the layout prunable
        # — added to the SAME metadata commit as the rewritten files
        stat_ids = list(self.stats_ids)
        for c in cols:
            if name_to_id[c] not in stat_ids:
                stat_ids.append(name_to_id[c])
        updates = {
            "stats_ids": stat_ids,
            "cluster_by_ids": [name_to_id[c] for c in cols],
        }
        original = self.metadata
        # _write_data reads _stat_fields from self.metadata, so the
        # updates apply in-memory for the write — restored on ANY
        # failure (a phantom cluster claim must never leak into a later
        # commit), and passed to _commit_snapshot so a ref-disjoint
        # rebase re-applies them instead of dropping them on refresh()
        self.metadata = {**original, **updates}
        try:
            data = self.read(include_system=True).filter(~F.col("_deleted"))
            data = data.withColumn("_bucket", self.bucket_expr())
            files_new = self._write_data(
                data, f"cluster-{uuid.uuid4().hex[:12]}", range_by=cols
            )
            self._commit_snapshot(
                files_new,
                {"operation": "cluster", "cluster-by": ",".join(cols)},
                meta_updates=updates,
            )
        except BaseException:
            if self.metadata.get("cluster_by_ids") == updates["cluster_by_ids"] and (
                self.metadata.get("version") == original.get("version")
            ):
                self.metadata = original  # commit never landed
            raise
        return len(files_new)

    def compute_sketches(
        self,
        cols: list[str],
        bits: int = 4096,
        num_hashes: int = 5,
        recompute: bool = False,
    ) -> int:
        """Per-file membership sketches (Iceberg ``compute_table_stats``
        puffin blob / parquet bloom filter analog): ONE distributed
        Spark job hashes every value of ``cols`` in every current data
        file (``xxhash64``, Kirsch–Mitzenmacher double hashing — the
        exact arithmetic lake/stats.py ``sketch_hash`` reproduces
        driver-side through the pinned pure-Python XXH64), folds the
        bit positions per file with a bounded ``collect_set``
        (≤ ``bits`` entries), and stores a ``bits``-wide bloom bitmap
        per (file, column) in the manifest entries — a metadata-only
        commit; no data file is rewritten or moved.

        From then on point intervals — ``read(ranges={col: [(v, v),
        ...]})``, ``lookup()`` — skip in-bounds but sketch-negative
        files driver-side, which is the payoff min/max bounds can't
        give on columns whose per-file value range spans the probe
        (hash-bucketed keys, high-churn attributes). False positives
        only cost a read; false negatives are impossible for the
        sketched files, and files written AFTER this call simply carry
        no sketch (never skipped on membership) until the next
        maintenance run — ``recompute=False`` makes that incremental:
        only files missing a sketch for some requested column (or
        sketched under different parameters) are scanned.

        Values are hashed after a cast to the column's CURRENT type,
        so files written before a widen (int → bigint) still match
        probes hashed under the current type. Columns must be of a
        SKETCH_TYPES type (string/int/bigint families, timestamp,
        date) — the ones a Spark-free probe can hash identically.

        Scale shape: the scan is executor-side and embarrassingly
        parallel; the driver holds O(files × bits/8) bytes — the same
        order as the manifest entries it already plans from. Reference
        analog: target-side readers must answer point membership
        without opening every file (EventConsumer.java:39-76 consumers
        query applied state selectively)."""
        from urllib.parse import unquote, urlparse

        if not cols:
            raise ValueError("compute_sketches needs at least one column")
        if bits < 64 or bits % 8 or num_hashes < 1:
            raise ValueError("bits must be a multiple of 8 (≥ 64), num_hashes ≥ 1")
        by_name = {f["name"]: f for f in self.fields}
        missing = [c for c in cols if c not in by_name]
        if missing:
            raise ValueError(f"unknown sketch column(s) {missing}")
        bad = [c for c in cols if by_name[c]["type"].lower() not in SKETCH_TYPES]
        if bad:
            raise ValueError(
                f"column(s) {bad} have types a Spark-free probe cannot "
                f"hash exactly (supported: {sorted(SKETCH_TYPES)})"
            )
        cur = self.current_snapshot
        if cur is None or not cur["files"]:
            return 0
        entries = [dict(f) for f in cur["files"]]
        fids = [(j, str(by_name[c]["id"]), by_name[c]) for j, c in enumerate(cols)]

        def _needs(f: dict) -> bool:
            sk = f.get("sketch", {})
            return recompute or any(
                fid not in sk
                or sk[fid].get("m") != bits
                or sk[fid].get("k") != num_hashes
                # hashed under a pre-widen type: the probe side refuses
                # such sketches (stats.py), so rebuild under the current
                # type to restore pruning
                or sk[fid].get("t") != fld["type"].lower()
                for _, fid, fld in fids
            )

        targets = [f for f in entries if _needs(f)]
        if not targets:
            return 0
        abspath_of = {
            os.path.abspath(os.path.join(self.path, f["path"])): f for f in targets
        }
        by_sv: dict[int, list[str]] = {}
        for f in targets:
            by_sv.setdefault(f["schema_version"], []).append(
                os.path.abspath(os.path.join(self.path, f["path"]))
            )
        empty_arr = F.expr("CAST(array() AS array<bigint>)")
        tag_sets: dict[str, set] = {}
        for sv, paths in by_sv.items():
            old_fields = {f["id"]: f for f in self.metadata["schemas"][str(sv)]}
            arrs = []
            for j, _fid, fld in fids:
                phys = old_fields.get(fld["id"], {}).get("name")
                if phys is None:
                    continue  # column absent in this layout: no values
                expr = F.col(phys).cast(_type_of(fld["type"]))
                h = F.xxhash64(expr)
                lo = h.bitwiseAND(F.lit(4294967295))
                step = F.shiftrightunsigned(h, 32).bitwiseOR(F.lit(1))
                poss = [
                    F.pmod(lo + F.lit(int(i)) * step, F.lit(int(bits)))
                    + F.lit(int(j * bits))
                    for i in range(num_hashes)
                ]
                arrs.append(
                    F.when(expr.isNotNull(), F.array(*poss)).otherwise(empty_arr)
                )
            if not arrs:
                continue  # whole layout predates every sketch column
            tags = arrs[0] if len(arrs) == 1 else F.concat(*arrs)
            # explode_outer (not explode): a file whose every row has
            # zero non-null sketch values still surfaces in the result
            # (null tag, which collect_set drops → empty set), so every
            # scanned file is attributable below. An all-zero sketch
            # means "definitely absent for every probe" — committing
            # one for a file we merely failed to match (e.g. an object
            # -store URI whose path does not round-trip through
            # urlparse) would silently prune live rows from every
            # point read, so an unattributable file is a hard error,
            # never a default.
            got = (
                self.spark.read.parquet(*paths)
                .select(
                    F.input_file_name().alias("_f"),
                    F.explode_outer(tags).alias("_tag"),
                )
                .groupBy("_f")
                .agg(F.collect_set("_tag").alias("_tags"))
                .collect()
            )
            for row in got:
                p = os.path.abspath(unquote(urlparse(row["_f"]).path))
                if p not in abspath_of:
                    raise ValueError(
                        f"compute_sketches cannot attribute scanned file "
                        f"{row['_f']!r} to a manifest entry; refusing to "
                        f"commit sketches that could zero-fill a live file"
                    )
                tag_sets[p] = set(row["_tags"])
        for p, f in abspath_of.items():
            # absent from tag_sets = the file was never scanned: a
            # zero-ROW file, or a layout predating every sketch column
            # — both genuinely hold no values, so all-zero is exact
            seen = tag_sets.get(p, set())
            sk = dict(f.get("sketch", {}))
            for j, fid, _fld in fids:
                bm = bytearray(bits // 8)
                for tag in seen:
                    if j * bits <= tag < (j + 1) * bits:
                        pos = int(tag - j * bits)
                        bm[pos >> 3] |= 1 << (pos & 7)
                sk[fid] = {
                    "m": bits,
                    "k": num_hashes,
                    # the type the values were hashed under: a later
                    # widen changes the hash encoding, and a probe must
                    # never consult a sketch built under another type
                    "t": _fld["type"].lower(),
                    "b": base64.b64encode(bytes(bm)).decode("ascii"),
                }
            f["sketch"] = sk
        self._commit_snapshot(
            entries,
            {
                "operation": "compute-sketches",
                "columns": ",".join(cols),
                "sketched-files": str(len(targets)),
            },
        )
        return len(targets)
