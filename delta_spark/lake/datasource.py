"""``deltaspark`` — the lake as a FIRST-CLASS Spark data source.

Any Spark session can scan a lake table or tail its change feed with
nothing but the format name — no ``LakeTable`` import, no engine API:

    spark.dataSource.register(LakeDataSource)       # or register(spark)

    # table state (optionally time-traveled)
    spark.read.format("deltaspark").option("path", root).load()
    ... .option("snapshot_id", 7) / .option("tag", "v1")
    ... .option("branch", "audit")                  # WAP staging read

    # batch change feed between two snapshots (Delta CDF / Iceberg
    # changelog-scan analog): rows + _change_type + _seq
    spark.read.format("deltaspark").option("path", root)
        .option("feed", "changes").option("from_snapshot_id", 3).load()

    # STREAMING: tail the change feed, exactly-once, resumable
    spark.readStream.format("deltaspark").option("path", root)
        .option("feed", "changes").option("starting", "earliest").load()

Architecture (PySpark 4 Python DataSource API): all PLANNING is
driver-side over O(metadata) — resolve the snapshot once (the scan is
pinned: commits landing mid-query cannot tear it), name the bucket ids
to read, emit one ``InputPartition`` per bucket. All DATA movement is
executor-side: each task runs the Spark-free DuckDB reader
(``lake/interop.py``) for ITS bucket and streams Arrow record batches
straight back to Spark — per-key state is bucket-local by the lake's
layout invariant, so the per-bucket MoR fold / change diff needs no
shuffle and the union over buckets is exact. At 100 TB the scan
parallelism is the bucket count (the same fan-out the engine's own
reads use), the driver never touches data, and a 1-commit streaming
micro-batch plans O(touched buckets) tasks from the manifest diff.

Filter pushdown (``pushFilters``): equality/IN on the bucket column
prunes partitions via the Spark-equal XXH64 (a point lookup plans
exactly one task); comparisons on stats-tracked columns become
manifest min/max ``ranges`` so each task opens only intersecting
files. Every filter is also RETURNED to Spark for re-application —
pruning here is an optimization, never the correctness boundary.

Streaming offsets are snapshot ids — the lake's own commit points —
so a checkpointed restart replays exactly the committed range
deterministically (same manifest diff → same rows). An offset that
has been expired by ``expire_snapshots`` fails loudly at planning,
the same resync contract as jobs/consume_changes.py — or, with
``expired_offset="rebootstrap"``, re-emits the full current state as
inserts and continues (see LakeChangesStreamReader).

Reference analog: the reference exposes its target tables to ANY
downstream consumer through the EventConsumer contract
(delta-api/.../EventConsumer.java:39-76) and its change stream
through EventReader.start(Offset) (delta-api/.../EventReader.java:
22-51, offset = resumable position). This module is that surface
rebuilt Spark-native: the table is a format, the offset is a
snapshot id, the consumer is any Spark query.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

logger = logging.getLogger(__name__)

FORMAT_NAME = "deltaspark"

_CHANGE_COLS = (("_change_type", "string"), ("_seq", "bigint"))


def register(spark) -> None:
    """Register the ``deltaspark`` format on a session (idempotent)."""
    spark.dataSource.register(LakeDataSource)


def _meta(path: str) -> dict:
    from .interop import read_metadata

    return read_metadata(os.path.abspath(path))


def _spark_type(simple: str):
    """Lake field type (Spark ``simpleString``) → DataType, without a
    live session (``DataType.fromDDL`` needs one; ``schema()`` runs in
    a sessionless planning worker). The lake's column type surface is
    the reference's end-to-end type list (SURVEY §1.2) — primitives
    only; anything else is a loud error, not a guess."""
    from pyspark.sql import types as T

    m = {
        "string": T.StringType(),
        "int": T.IntegerType(),
        "integer": T.IntegerType(),
        "bigint": T.LongType(),
        "long": T.LongType(),
        "smallint": T.ShortType(),
        "tinyint": T.ByteType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "boolean": T.BooleanType(),
        "timestamp": T.TimestampType(),
        "binary": T.BinaryType(),
        "date": T.DateType(),
    }
    t = simple.strip().lower()
    if t not in m:
        raise ValueError(f"deltaspark: unsupported lake column type {simple!r}")
    return m[t]


def _resolve_pin(meta: dict, path: str, opts: dict) -> int | None:
    """Driver-side: pin the snapshot a batch scan reads — explicit
    snapshot_id / tag / branch head, else current main head."""
    picked = [k for k in ("snapshot_id", "tag", "branch") if opts.get(k)]
    if len(picked) > 1:
        raise ValueError(f"pass at most one of snapshot_id/tag/branch, got {picked}")
    if opts.get("snapshot_id"):
        return int(opts["snapshot_id"])
    if opts.get("tag"):
        tags = meta.get("tags", {})
        if opts["tag"] not in tags:
            raise ValueError(f"unknown tag {opts['tag']!r} (have {sorted(tags)})")
        return int(tags[opts["tag"]])
    if opts.get("branch"):
        from .interop import branch_ref

        return branch_ref(meta, opts["branch"])[0]
    return meta["current_snapshot_id"]


def _fields_at(
    meta: dict, path: str, sid: int | None, explicit: bool = False
) -> list[dict]:
    """Fields a read of ``sid`` speaks. EXPLICIT time travel always
    uses the snapshot's recorded schema version — even when the id
    equals the current head, which may predate a metadata-only rename
    (engine ``read(snapshot_id=)`` semantics); a default head read
    speaks current names."""
    from .interop import resolve_snapshot

    sv = meta["schema_version"]
    if sid is not None and explicit:
        snap = resolve_snapshot(meta, os.path.abspath(path), sid)
        if snap is not None:
            sv = snap.get("schema_version", sv)
    return meta["schemas"][str(sv)]


def _candidate_buckets(meta: dict, snap: dict | None) -> list[int]:
    """Bucket ids that may hold rows of ``snap``: the current-spec ids
    its files carry, widened to the full domain when spanning (-1) or
    foreign-spec files exist (their rows' current-spec ids are only
    known row-side; each task row-filters them to its own id)."""
    if snap is None or not snap["files"]:
        return []
    cur_spec = int(meta.get("bucket_spec_id", 0))
    n = int(meta["num_buckets"])
    ids: set[int] = set()
    for f in snap["files"]:
        if int(f.get("spec", 0)) != cur_spec or int(f["bucket"]) == -1:
            return list(range(n))
        ids.add(int(f["bucket"]))
    return sorted(ids)


def _cast_batches(rel, spark_schema: StructType, rows_per_batch: int):
    """Stream a DuckDB relation back as Arrow record batches cast to
    the exact Arrow schema Spark expects for ``spark_schema``."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    # cast target is all-nullable: DuckDB's Arrow output flags every
    # field nullable, and Spark trusts the DECLARED source schema for
    # nullability — only names/types/units must line up here
    target = pa.schema(
        [f.with_nullable(True) for f in to_arrow_schema(spark_schema)]
    )
    reader = rel.fetch_arrow_reader(rows_per_batch)
    for batch in reader:
        tbl = pa.Table.from_batches([batch])
        missing = set(target.names) - set(tbl.schema.names)
        if missing:
            # a rename landed after this scan/stream pinned its output
            # schema (Spark pins source schemas at query start): the
            # feed now speaks the new names. Fail with the remedy —
            # a restarted stream re-pins from current metadata and the
            # whole range re-emits under the new names.
            raise RuntimeError(
                f"deltaspark: columns {sorted(missing)} are gone from "
                f"the table (renamed after this query pinned its "
                f"schema; the scan now yields {tbl.schema.names}). "
                f"Restart the query — it resumes from the checkpoint "
                f"and re-reads under the current names."
            )
        tbl = tbl.select(target.names).cast(target)
        yield from tbl.to_batches()


@dataclass
class _BucketPart(InputPartition):
    # list of bucket ids to read; [] = planned-empty no-op task;
    # None = unsliced whole read (unprunable fallback)
    buckets: list | None
    # bucket spec the ids were planned under (None = skip the check):
    # a rebucket committing between planning and execution would make
    # executor-side pruning reinterpret the ids under the NEW spec and
    # silently drop rows — each task re-checks and fails loudly instead
    spec: int | None = None
    nb: int | None = None


def _validated_meta(path: str, partition) -> dict:
    """Executor-side: ONE metadata read, validated against the spec
    the partition's bucket ids were planned under, and returned so the
    SQL generation runs from the SAME document (atomic — a rebucket
    committing after this read cannot reinterpret the planned ids,
    because the generated SQL never re-reads metadata)."""
    meta = _meta(path)
    if (
        getattr(partition, "spec", None) is not None
        and partition.buckets not in ([], None)
        and (
            int(meta.get("bucket_spec_id", 0)) != partition.spec
            or int(meta["num_buckets"]) != partition.nb
        )
    ):
        raise RuntimeError(
            "deltaspark: the table was rebucketed between query "
            "planning and task execution — the planned bucket slices "
            "no longer mean the same rows. Rerun the query."
        )
    return meta


def _group_buckets(cand: list, max_tasks: int | None) -> list:
    """One partition per bucket by default; with ``max_tasks`` set,
    round-robin buckets into at most that many partitions (a
    4096-bucket table does not need 4096 Python worker spin-ups when
    32 slots exist — each task then folds K buckets sequentially,
    still shuffle-free)."""
    if not cand:
        return []
    if not max_tasks or max_tasks >= len(cand):
        return [_BucketPart([b]) for b in cand]
    groups: list[list] = [[] for _ in range(max_tasks)]
    for i, b in enumerate(cand):
        groups[i % max_tasks].append(b)
    return [_BucketPart(g) for g in groups if g]


class LakeDataSource(DataSource):
    """``format("deltaspark")`` — options:

    path                 lake table root (reachable from executors,
                         like any Spark path) — or address by name:
    catalog + table      catalog root + table name (resolved from the
                         catalog document, Spark-free)
    feed                 "state" (default) | "changes"
    snapshot_id/tag/branch   batch time travel (state feed)
    from_snapshot_id/to_snapshot_id   batch change-feed range
                         (from omitted → full TO state as inserts)
    starting             streaming start: "latest" (default),
                         "earliest", or a snapshot id
    rows_per_batch       Arrow batch size (default 65536)
    max_tasks            cap read partitions: round-robin buckets into
                         at most this many tasks (default: one task
                         per bucket)
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _path(self) -> str:
        p = self.options.get("path")
        cat = self.options.get("catalog")
        name = self.options.get("table")
        if p and (cat or name):
            raise ValueError("pass either path OR catalog+table, not both")
        if cat or name:
            if not (cat and name):
                raise ValueError(
                    "catalog reads need BOTH .option('catalog', <root>) "
                    "and .option('table', <name>)"
                )
            from ..catalog import Catalog

            meta = Catalog._read_meta(os.path.abspath(cat))
            if name not in meta["tables"]:
                raise ValueError(
                    f"no table {name!r} in catalog {cat} "
                    f"(have {sorted(meta['tables'])})"
                )
            return os.path.abspath(
                os.path.join(cat, meta["tables"][name]["dir"])
            )
        if not p:
            raise ValueError(
                "deltaspark requires .option('path', <table root>) or "
                ".option('catalog', <root>).option('table', <name>)"
            )
        return os.path.abspath(p)

    def _feed(self) -> str:
        feed = (self.options.get("feed") or "state").lower()
        if feed not in ("state", "changes"):
            raise ValueError(f"feed must be 'state' or 'changes', got {feed!r}")
        return feed

    def schema(self) -> StructType:
        from pyspark.sql.types import StructField

        path = self._path()
        meta = _meta(path)
        if self._feed() == "changes":
            to = self.options.get("to_snapshot_id")
            fields = _fields_at(
                meta, path, int(to) if to else None, explicit=bool(to)
            )
            cols = [(f["name"], f["type"]) for f in fields] + list(_CHANGE_COLS)
        else:
            sid = _resolve_pin(meta, path, self.options)
            explicit = any(
                self.options.get(k) for k in ("snapshot_id", "tag", "branch")
            )
            fields = _fields_at(meta, path, sid, explicit=explicit)
            cols = [(f["name"], f["type"]) for f in fields]
        # all-nullable, matching LakeTable.read() (a parquet scan):
        # the metadata's not-null flags are WRITE constraints; readers
        # of either surface see the same schema
        return StructType([StructField(n, _spark_type(t), True) for n, t in cols])

    def reader(self, schema: StructType) -> DataSourceReader:
        if self._feed() == "changes":
            return LakeChangesBatchReader(self._path(), self.options, schema)
        # Decide from OPTIONS, not from the session: reader() executes in
        # PySpark's sessionless planner worker where getActiveSession() is
        # None, so a conf probe here always saw "off" and silently returned
        # the no-pushdown reader — bucket/stats pruning was dead end-to-end
        # even for sessions that enabled it (round-4 ADVICE, medium).
        # Default = the pushdown reader; a session that has not enabled
        # spark.sql.python.filterPushdown.enabled then fails LOUDLY with
        # Spark's DATA_SOURCE_PUSHDOWN_DISABLED error naming the conf,
        # instead of quietly scanning every bucket. Escape hatch for
        # sessions that cannot flip the conf: .option("pushdown", "false").
        if str(self.options.get("pushdown", "true")).lower() == "false":
            return _LakeBatchReaderNoPushdown(self._path(), self.options, schema)
        return LakeBatchReader(self._path(), self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self._feed() != "changes":
            raise ValueError(
                "streaming reads tail the change feed: add "
                ".option('feed', 'changes') (a stream of table STATE "
                "has no incremental meaning)"
            )
        return LakeChangesStreamReader(self._path(), self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "deltaspark writes are CDC delta batches (MoR upserts/"
                "deletes keyed by the table's key columns) — use "
                "mode('append'); to rebuild a table wholesale, use the "
                "engine API (LakeTable.overwrite)"
            )
        return LakeDeltaWriter(self._path(), self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return LakeDeltaStreamWriter(self._path(), self.options, schema)


class _LakeBatchReaderBase(DataSourceReader):
    """Table-state scan: one task per candidate bucket, each folding
    its bucket's base+delta files locally (keys never span buckets)."""

    def __init__(self, path: str, options: dict, schema: StructType):
        self.path = path
        self.schema = schema
        self.rows_per_batch = int(options.get("rows_per_batch") or 65536)
        self.max_tasks = int(options.get("max_tasks") or 0) or None
        meta = _meta(path)
        self.sid = _resolve_pin(meta, path, options)
        # a head read speaks CURRENT column names even when the head
        # snapshot predates a metadata-only rename (LakeTable.read()
        # semantics); explicit time travel keeps its snapshot's names
        explicit = any(options.get(k) for k in ("snapshot_id", "tag", "branch"))
        self.align_sv = None if explicit else meta["schema_version"]
        # pushdown planning state (driver-only; cheap to pickle anyway)
        fields = _fields_at(meta, path, self.sid, explicit=explicit)
        by_id = {f["id"]: f for f in fields}
        self._bucket_field = by_id.get(meta["bucket_id"], {})
        self._stats_names = {
            by_id[i]["name"] for i in meta.get("stats_ids", []) if i in by_id
        }
        self._num_buckets = int(meta["num_buckets"])
        self._init_spec = int(meta.get("bucket_spec_id", 0))
        self._pruned_buckets: list[int] | None = None
        self._ranges: dict[str, tuple] = {}

    # -- planning (driver) -------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        from .interop import resolve_snapshot

        meta = _meta(self.path)
        if self._pruned_buckets is not None and (
            int(meta.get("bucket_spec_id", 0)) != self._init_spec
            or int(meta["num_buckets"]) != self._num_buckets
        ):
            # the pushed-filter bucket ids were hashed under the spec
            # seen at reader construction; planning them against a
            # rebucketed table would silently miss rows
            raise RuntimeError(
                "deltaspark: the table was rebucketed while this query "
                "was being planned (pushed filters were hashed under "
                "the old bucket spec). Rerun the query."
            )
        snap = resolve_snapshot(meta, self.path, self.sid)
        cand = _candidate_buckets(meta, snap)
        if self._pruned_buckets is not None:
            cand = sorted(set(cand) & set(self._pruned_buckets))
        if not cand:
            # nothing to read (empty snapshot, or every bucket pruned
            # away): ONE planned-empty task — never an unsliced scan
            return [_BucketPart([])]
        parts = _group_buckets(cand, self.max_tasks)
        for part in parts:
            part.spec = int(meta.get("bucket_spec_id", 0))
            part.nb = int(meta["num_buckets"])
        return parts

    # -- execution (executor) ----------------------------------------
    def read(self, partition: _BucketPart) -> Iterator:
        import duckdb

        from .interop import read_duckdb

        if partition.buckets == [] or (
            partition.buckets is None and self.sid is None
        ):
            return
        meta = _validated_meta(self.path, partition)
        con = duckdb.connect()
        rel = read_duckdb(
            self.path,
            con=con,
            buckets=partition.buckets,
            snapshot_id=self.sid,
            ranges=self._ranges or None,
            align_schema_version=self.align_sv,
            meta=meta,
        )
        yield from _cast_batches(rel, self.schema, self.rows_per_batch)


_LakeBatchReaderNoPushdown = _LakeBatchReaderBase


class LakeBatchReader(_LakeBatchReaderBase):
    """The state reader plus filter pushdown (bucket pruning via the
    Spark-equal XXH64, manifest min/max ranges via lake/stats.py)."""

    def pushFilters(self, filters):
        from .xxh import bucket_of

        bname = self._bucket_field.get("name")
        btype = self._bucket_field.get("type")
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr is None or len(attr) != 1:
                continue
            col = attr[0]
            vals = None
            if isinstance(f, EqualTo):
                vals = [f.value]
            elif isinstance(f, In):
                vals = list(f.value)
            if (
                vals is not None
                and col == bname
                and all(
                    isinstance(v, (str, int)) and not isinstance(v, bool)
                    for v in vals
                )
                and None not in vals
            ):
                try:
                    ids = sorted(
                        {bucket_of(v, self._num_buckets, coltype=btype) for v in vals}
                    )
                except TypeError:
                    ids = None  # unsupported bucket type: no pruning
                if ids is not None:
                    cur = (
                        set(ids)
                        if self._pruned_buckets is None
                        else set(self._pruned_buckets) & set(ids)
                    )
                    self._pruned_buckets = sorted(cur)
            if (
                col in self._stats_names
                and isinstance(getattr(f, "value", None), (str, int, float))
                and not isinstance(getattr(f, "value", None), bool)
            ):
                lo, hi = self._ranges.get(col, (None, None))
                v = f.value
                if isinstance(f, EqualTo):
                    lo = v if lo is None else max(lo, v)
                    hi = v if hi is None else min(hi, v)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo = v if lo is None else max(lo, v)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    hi = v if hi is None else min(hi, v)
                if lo is not None or hi is not None:
                    self._ranges[col] = (lo, hi)
        # every filter is re-applied by Spark: bucket/stats pruning is
        # conservative (may keep extra rows), never load-bearing. The
        # strict >/< bounds stay inclusive in the range plan for the
        # same reason.
        return filters


class LakeChangesBatchReader(DataSourceReader):
    """Batch change feed ``(from, to]`` — one task per TOUCHED bucket
    (driver-side manifest diff), each running its slice of the
    Spark-free diff SQL."""

    def __init__(self, path: str, options: dict, schema: StructType):
        self.path = path
        self.schema = schema
        self.rows_per_batch = int(options.get("rows_per_batch") or 65536)
        frm = options.get("from_snapshot_id")
        to = options.get("to_snapshot_id")
        self.frm = int(frm) if frm else None
        self.max_tasks = int(options.get("max_tasks") or 0) or None
        meta = _meta(path)
        self.to = int(to) if to else meta["current_snapshot_id"]
        # `to` omitted = a HEAD feed read: speak CURRENT column names
        # even when the head snapshot predates a metadata-only rename
        # (matches schema() and the engine's read_changes); explicit
        # `to` keeps its snapshot's names (time-travel semantics)
        self.align_sv = None if to else meta["schema_version"]

    def partitions(self) -> Sequence[InputPartition]:
        return _change_partitions(self.path, self.frm, self.to, self.max_tasks)

    def read(self, partition: _BucketPart) -> Iterator:
        yield from _read_changes_part(
            self.path,
            self.frm,
            self.to,
            partition,
            self.schema,
            self.rows_per_batch,
            align_sv=self.align_sv,
        )


def _change_partitions(
    path: str, frm: int | None, to: int | None, max_tasks: int | None = None
):
    from .interop import resolve_snapshot, touched_buckets

    if to is None:
        return [_BucketPart(None)]
    meta = _meta(path)
    if frm is None:
        cand = _candidate_buckets(meta, resolve_snapshot(meta, path, to))
    else:
        cand = touched_buckets(path, frm, to)
        if cand is None:
            # Unprunable (range crosses a rebucket and the bucket-column
            # type has no DuckDB hash UDF): plan the FULL bucket domain,
            # not the TO snapshot's buckets — if TO is file-empty while
            # FROM held rows, planning from TO alone would emit zero
            # partitions and silently drop the delete events; full-domain
            # tasks instead fail loudly on the unsupported hash, matching
            # the other unprunable paths (round-4 ADVICE).
            cand = list(range(int(meta["num_buckets"])))
    if not cand:
        return [_BucketPart([])]  # planned-empty: DDL-only/no-op range
    parts = _group_buckets(cand, max_tasks)
    for part in parts:
        part.spec = int(meta.get("bucket_spec_id", 0))
        part.nb = int(meta["num_buckets"])
    return parts


def _read_changes_part(
    path: str,
    frm: int | None,
    to: int | None,
    partition: _BucketPart,
    schema: StructType,
    rows_per_batch: int,
    align_sv: int | None = None,
):
    import duckdb

    from .interop import changes_duckdb

    if partition.buckets == [] or (partition.buckets is None and to is None):
        return
    meta = _validated_meta(path, partition)
    con = duckdb.connect()
    rel = changes_duckdb(
        path,
        con=con,
        from_snapshot_id=frm,
        to_snapshot_id=to,
        buckets=partition.buckets,
        align_schema_version=align_sv,
        meta=meta,
    )
    yield from _cast_batches(rel, schema, rows_per_batch)


@dataclass
class _ChangeRangePart(InputPartition):
    frm: int | None
    to: int
    buckets: list | None
    spec: int | None = None
    nb: int | None = None


class LakeChangesStreamReader(DataSourceStreamReader):
    """Structured Streaming source over the change feed. Offsets ARE
    snapshot ids (-1 = before any snapshot), so progress is pinned to
    the lake's own commit points: ``partitions(start, end)`` plans the
    manifest diff ``(start, end]`` driver-side — O(touched buckets)
    tasks — and a checkpointed replay of the same range is
    deterministic by construction. DDL-only / compaction-only commits
    yield a no-op micro-batch (the diff is empty, as read_changes
    promises). The output schema is pinned at query start, like every
    Spark streaming source.

    ``expired_offset`` controls what happens when the checkpointed
    offset's snapshot has been expired by retention (a deterministic
    replay of the lost diff is impossible — the data is gone):

    - ``"fail"`` (default): planning raises, naming the resync
      contract — the operator decides (the consume_changes default).
    - ``"rebootstrap"``: the batch re-emits the FULL current state as
      inserts pinned at the end snapshot (exactly what a
      ``starting="earliest"`` initial batch emits) and the stream
      continues incrementally from there. Deletes that happened inside
      the lost window emit no tombstones — an upsert-only sink keeps
      those keys until it reconciles against the re-emitted full set,
      the same caveat consume_changes documents (it drops its feed
      before rebootstrapping; an arbitrary streaming sink cannot be
      dropped from here, so the wider emission is explicitly opt-in)."""

    def __init__(self, path: str, options: dict, schema: StructType):
        self.path = path
        self.schema = schema
        self.rows_per_batch = int(options.get("rows_per_batch") or 65536)
        self.max_tasks = int(options.get("max_tasks") or 0) or None
        self.expired_offset = str(
            options.get("expired_offset") or "fail"
        ).lower()
        if self.expired_offset not in ("fail", "rebootstrap"):
            raise ValueError(
                "deltaspark: expired_offset must be 'fail' or "
                f"'rebootstrap', got {self.expired_offset!r}"
            )
        starting = str(options.get("starting") or "latest").lower()
        meta0 = _meta(path)
        head = meta0["current_snapshot_id"]
        # the output schema is pinned at query start (like every Spark
        # source); pin the NAMING epoch with it so a metadata-only
        # rename mid-stream keeps the feed speaking the pinned names
        # (columns are mapped by field id underneath) — a restart
        # re-pins from current metadata and switches to the new names
        self.align_sv = int(meta0["schema_version"])
        if starting == "latest":
            self._initial = -1 if head is None else int(head)
        elif starting == "earliest":
            self._initial = -1
        else:
            self._initial = int(starting)

    def initialOffset(self) -> dict:
        return {"snapshot_id": self._initial}

    def latestOffset(self) -> dict:
        head = _meta(self.path)["current_snapshot_id"]
        return {"snapshot_id": -1 if head is None else int(head)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from .interop import (
            ExpiredSnapshotError,
            resolve_snapshot,
            snapshot_was_expired,
        )

        s, e = int(start["snapshot_id"]), int(end["snapshot_id"])
        if e == -1 or s == e:
            return [_ChangeRangePart(None, -1, None)]  # no-op batch
        frm = None if s == -1 else s
        try:
            return [
                _ChangeRangePart(frm, e, p.buckets, p.spec, p.nb)
                for p in _change_partitions(self.path, frm, e, self.max_tasks)
            ]
        except ExpiredSnapshotError:
            if self.expired_offset != "rebootstrap" or frm is None:
                raise
            meta = _meta(self.path)
            # Which id actually failed to resolve? The initial error may
            # have come from `e`, not `frm` (e.g. frm pinned by a tag
            # while the WAL'd end offset expired) — re-resolve each so
            # the diagnosis names the right one (round-4 ADVICE: the old
            # handler blamed frm unconditionally).
            frm_ok = True
            try:
                resolve_snapshot(meta, self.path, frm)
            except ExpiredSnapshotError:
                frm_ok = False
            if frm_ok:
                raise ExpiredSnapshotError(
                    f"deltaspark stream at {self.path}: the in-flight "
                    f"batch's end offset ({e}) has been expired by "
                    f"retention while the resume offset ({frm}) still "
                    f"resolves — the committed batch's content can no "
                    f"longer be reproduced, so automatic rebootstrap "
                    f"cannot replay it. Delete the checkpoint and "
                    f"restart the stream."
                ) from None
            if not snapshot_was_expired(meta, frm):
                # the id can never have been a committed snapshot (a
                # typo'd `starting`, a checkpoint replayed against the
                # wrong table, a rolled-back head) — a configuration
                # error a silent full-state emission would mask
                raise
            # the replayed batch's WAL'd END offset must itself still
            # resolve, or the retry below would crash AFTER promising
            # a rebootstrap — name that state instead
            try:
                resolve_snapshot(meta, self.path, e)
            except ExpiredSnapshotError:
                raise ExpiredSnapshotError(
                    f"deltaspark stream at {self.path}: both the resume "
                    f"offset ({frm}) and the in-flight batch's end "
                    f"offset ({e}) have been expired by retention — "
                    f"automatic rebootstrap cannot replay this batch. "
                    f"Delete the checkpoint and restart the stream."
                ) from None
            # checkpointed offset expired: re-emit the full state at
            # `e` as the bootstrap batch (content still deterministic
            # for this offset range — pinned at `e`) and continue
            logger.warning(
                "deltaspark stream at %s: offset snapshot %d expired "
                "by retention — rebootstrapping (full state at %d "
                "re-emitted as inserts; in-window deletes carry no "
                "tombstones)", self.path, frm, e,
            )
            return [
                _ChangeRangePart(None, e, p.buckets, p.spec, p.nb)
                for p in _change_partitions(self.path, None, e, self.max_tasks)
            ]

    def read(self, partition: _ChangeRangePart) -> Iterator:
        if partition.to == -1:
            return
        yield from _read_changes_part(
            self.path,
            partition.frm,
            partition.to,
            _BucketPart(partition.buckets, partition.spec, partition.nb),
            self.schema,
            self.rows_per_batch,
            align_sv=self.align_sv,
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to release: snapshots are retained by expiry policy


@dataclass
class _StagedMsg(WriterCommitMessage):
    staged: dict | None  # stage_delta_duckdb result (None = empty task)


class LakeDeltaWriter(DataSourceArrowWriter):
    """``df.write.format("deltaspark").mode("append")`` — one CDC
    delta batch committed exactly-once as a single snapshot.

    Input rows are change events: the table's current payload columns
    plus ``op`` (op_col option; rows equal to delete_op become
    tombstones) and ``seq`` (seq_col; the LWW sequence). Each Spark
    task stages ITS partition as one spanning MoR delta file via the
    Spark-free stager (Arrow handed to DuckDB zero-copy, system
    columns + Spark-equal bucket hash stamped there); the driver then
    commits every staged file in ONE atomic snapshot carrying the
    mandatory (writer_id, batch_id) marker — all-or-nothing across
    tasks, idempotent on replay (a re-run of an applied batch removes
    its freshly staged files and commits nothing), conflict-and-retry
    beside concurrent writers, CommitConflict if the schema or bucket
    spec moved while staging. ``branch`` stages on a WAP branch.
    Failed jobs leave only orphan data files (never metadata) for
    remove_orphans — the same crash contract as every engine writer.

    Reference analog: EventConsumer.applyDML's idempotent-upsert
    contract (delta-api/.../EventConsumer.java:58-76) exposed as a
    Spark write format.
    """

    def __init__(
        self,
        path: str,
        options: dict,
        schema: StructType,
        _need_batch_id: bool = True,
    ):
        self.path = path
        self.writer_id = options.get("writer_id")
        self.batch_id = options.get("batch_id")
        if not self.writer_id or (_need_batch_id and not self.batch_id):
            raise ValueError(
                "deltaspark writes are exactly-once and need their "
                "identity: .option('writer_id', ...) and "
                + (
                    ".option('batch_id', ...) (a replay of the same pair "
                    "is a no-op)"
                    if _need_batch_id
                    else "for streams the micro-batch epoch is the batch id"
                )
            )
        self.op_col = options.get("op_col") or "op"
        self.seq_col = options.get("seq_col") or "seq"
        self.delete_op = options.get("delete_op") or "DELETE"
        self.sort_col = options.get("sort_col") or None
        self.branch = options.get("branch") or None
        meta = _meta(path)
        self.expected_spec = int(meta.get("bucket_spec_id", 0))
        self.expected_num_buckets = int(meta["num_buckets"])
        # fail fast on the driver: every payload column + the CDC
        # columns must be present in the incoming frame
        cur = {f["name"] for f in meta["schemas"][str(meta["schema_version"])]}
        have = set(schema.fieldNames())
        missing = sorted((cur | {self.op_col, self.seq_col}) - have)
        if missing:
            raise ValueError(
                f"deltaspark write is missing columns {missing}: a delta "
                f"batch carries the table's payload columns plus "
                f"'{self.op_col}'/'{self.seq_col}'"
            )

    def write(self, iterator) -> _StagedMsg:
        import duckdb
        import pyarrow as pa

        from .interop import stage_delta_duckdb

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _StagedMsg(None)
        con = duckdb.connect()
        con.register("_delta_batch", pa.Table.from_batches(batches))
        staged = stage_delta_duckdb(
            self.path,
            con,
            "SELECT * FROM _delta_batch",
            op_col=self.op_col,
            seq_col=self.seq_col,
            delete_op=self.delete_op,
            sort_col=self.sort_col,
        )
        return _StagedMsg(staged)

    def commit(self, messages) -> None:
        from .interop import commit_delta_staged

        commit_delta_staged(
            self.path,
            [m.staged for m in messages if m is not None],
            writer_id=self.writer_id,
            batch_id=str(self.batch_id),
            expected_spec=self.expected_spec,
            expected_num_buckets=self.expected_num_buckets,
            branch=self.branch,
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is None or m.staged is None:
                continue
            p = os.path.join(self.path, m.staged["entry"]["path"])
            try:
                os.unlink(p)
                os.rmdir(os.path.dirname(p))
            except OSError:
                pass


class LakeDeltaStreamWriter(LakeDeltaWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("deltaspark")`` — the streaming sink
    face of the same delta writer: every micro-batch commits as one
    exactly-once snapshot whose batch id IS the stream epoch
    (``{batch_id_prefix|'stream'}-{batchId}``), so a checkpointed
    restart that replays an epoch hits the (writer-id, batch-id)
    marker and commits nothing — the engine's idempotent-consumer
    contract, straight from the format API. ``writer_id`` is required
    (name the stream!); ``batch_id`` must NOT be set (the epoch is
    the identity). Inherits staging/validation/abort from the batch
    writer."""

    def __init__(self, path: str, options: dict, schema: StructType):
        if options.get("batch_id"):
            raise ValueError(
                "streaming deltaspark writes derive batch_id from the "
                "micro-batch epoch — set batch_id_prefix instead"
            )
        super().__init__(path, options, schema, _need_batch_id=False)
        self.prefix = options.get("batch_id_prefix") or "stream"

    def commit(self, messages, batchId: int) -> None:
        from .interop import commit_delta_staged

        commit_delta_staged(
            self.path,
            [m.staged for m in messages if m is not None],
            writer_id=self.writer_id,
            batch_id=f"{self.prefix}-{int(batchId)}",
            expected_spec=self.expected_spec,
            expected_num_buckets=self.expected_num_buckets,
            branch=self.branch,
        )

    def abort(self, messages, batchId: int) -> None:
        super().abort(messages)
