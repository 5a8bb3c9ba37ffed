"""Multi-table pipelines: one changelog carrying a ``tbl`` column is
demuxed through table→instance routing into per-table LakeTables, with
table-level DDL applied in sequence order.

Reference semantics rebuilt (Spark-first, not a port):
  * a pipeline replicates a SET of tables, assigned to worker instances
    round-robin or explicitly — DeltaWorker.assignTables,
    /root/reference/delta-app/src/main/java/io/cdap/delta/app/
    DeltaWorker.java:594-620; E2E analog testMultipleInstances,
    delta-app/src/test/java/io/cdap/delta/app/
    DeltaPipelineStateStoreBaseTest.java:399-474
  * events for unconfigured tables are dropped; blacklists are
    global ∪ per-table with CREATE_TABLE force-removed —
    QueueingEventEmitter.shouldIgnore:96-125, DeltaWorker.java:217-236
  * table-level DDL (CREATE/DROP/TRUNCATE/RENAME TABLE) and
    database-level DDL (CREATE/DROP DATABASE, cascading over the
    namespace) apply strictly between the DML segments they bound, in
    global seq order — DDLOperation.java:30-38. A database's tables
    should be routed to one instance (explicit_assignment) so a
    DROP_DATABASE never races another instance's in-flight segments.

Exactly-once: every (instance, table, segment) gets its own idempotent
batch-id marker in that table's snapshot summaries; table-level DDL is
marked per (writer, seq) in the catalog; a recreated table's
``create_seq`` fences replayed pre-drop DML segments out of the new
incarnation.
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apply import ApplyStats, _apply_whitelist, _rewrite_to_current, apply_batch, write_lineage
from .catalog import Catalog
from .routing import assign_tables
from .schema import (
    ALL_DDL_OPS,
    CONTROL_DDL_OPS,
    DATABASE_DDL_OPS,
    DDL_CREATE_TABLE,
    DML_DELETE,
    DML_OPS,
)


def expand_blacklist(
    global_bl: tuple = (), per_table: dict | None = None, table: str | None = None
) -> tuple:
    """Effective blacklist for one table: global ∪ per-table, with
    CREATE_TABLE force-removed — a blacklisted CREATE_TABLE would
    permanently wedge replication of that table
    (reference: DeltaWorker.java:219,231)."""
    bl = set(global_bl) | set((per_table or {}).get(table, ()))
    bl.discard(DDL_CREATE_TABLE)
    return tuple(sorted(bl))


def _branched(h, branch: str | None):
    """Bind a table handle to the WAP staging branch (created
    concurrent-safely, seeded when empty — LakeTable.ensure_branch).
    No-op without a branch; used by BOTH multi-table apply paths so
    every epoch stages identically."""
    return h if branch is None else h.ensure_branch(branch)


def _fused_mor_apply(
    catalog: Catalog,
    batch: DataFrame,
    writer_id: str,
    batch_id: str,
    mine: list[str],
    table_col: str,
    op_blacklist: tuple,
    per_table_blacklists: dict | None,
    per_table_columns: dict | None,
    sort_key_col,
    lineage: bool = True,
    per_table_transforms: dict | None = None,
    branch: str | None = None,
) -> dict[str, list[ApplyStats]] | None:
    """Single-pass multi-table demux — the steady-state streaming fast
    path. Jobs per epoch are INDEPENDENT of table count: ONE fused
    write job appends every table's rows as spanning MoR delta files
    into a staging dir partitioned by table, plus ONE aggregation job
    for per-table metrics; each table then adopts its slice with a
    driver-side hard-link + metadata commit (no Spark job). The
    per-table loop is O(tables) driver-sequenced jobs per micro-batch —
    at the reference's "hundreds of tables per instance"
    (DeltaWorker.java:594-620) that serializes the epoch; this path
    keeps it two jobs.

    Preconditions (caller falls back to the per-table loop otherwise):
    no table/database DDL rows for these tables in the batch and every
    table already has data (merge-on-read steady state). Column-level
    DDL is guarded optimistically INSIDE the fused job via observe,
    mirroring apply_batch's fast path. Tables whose aligned schemas
    differ are grouped by schema signature — one write job per group
    (one group in the common homogeneous-shard case).

    Per-table transforms fuse too: each table's slice is transformed
    declaratively inside the SAME write job (Catalyst unions the
    transformed slices), so 20 tables with 20 different transform
    chains still cost one write + one metrics job per epoch. Transforms
    must be column maps in the reference's Transformation contract
    (mutate values/names, never cardinality —
    delta-api/.../transformation/Transformation.java:27-58); a
    cardinality-changing transform cannot corrupt the snapshot summary
    regardless, because written/deleted counts are observed inside the
    write job itself, not inferred from the pre-transform admit counts.

    Exactly-once: per-table batch ids match the per-table loop's
    (``{batch_id}.{t}``), so a crash between adopts replays cleanly
    through EITHER path. Returns None to request fallback."""
    import shutil
    import uuid as _uuid

    from pyspark.sql import Observation

    from ._obs import observe_get

    handles = {}
    for t in mine:
        if not catalog.has_table(t):
            return None  # pending CREATE_TABLE — let the loop handle it
        h = _branched(catalog.table(t), branch)
        cur = h.current_snapshot
        if cur is None or not cur["files"]:
            return None  # snapshot-load epoch — CoW path is right
        handles[t] = h

    todo = [t for t in mine if not handles[t].is_applied(writer_id, f"{batch_id}.{t}")]
    out: dict[str, list[ApplyStats]] = {t: [] for t in mine}
    if not todo:
        return out

    # group tables by aligned payload signature — one fused write per
    # distinct shape (heterogeneous tables still fuse within groups)
    groups: dict[tuple, list[str]] = {}
    for t in todo:
        sig = tuple((f["name"], f["type"]) for f in handles[t].fields)
        groups.setdefault(sig, []).append(t)

    has_ddl_col = "ddl" in batch.columns
    obs = Observation() if has_ddl_col else None
    guard_src = batch
    if obs is not None:
        guard_src = batch.observe(
            obs,
            F.count_if(
                F.col("op").isin(list(ALL_DDL_OPS))
                & F.col(table_col).isin(list(todo))
            ).alias("n_ddl"),
        )

    # per-table admission predicate, shared by the staged WRITE and the
    # metrics aggregation so the two can never disagree (a create_seq
    # fence or per-table blacklist that drops rows from the write must
    # drop them from the counts too)
    fences = {t: max(-(1 << 62), catalog.create_seq(t)) for t in todo}
    allowed_ops = {
        t: [
            o
            for o in DML_OPS
            if o not in expand_blacklist(op_blacklist, per_table_blacklists, t)
        ]
        for t in todo
    }

    def _admit(t):
        return (
            (F.col(table_col) == t)
            & (F.col("seq") > fences[t])
            & F.col("op").isin(allowed_ops[t])
        )

    staging_root = os.path.join(
        catalog.root, "_staging", f"{writer_id}-{batch_id}-{_uuid.uuid4().hex[:8]}"
    )
    t0 = time.time()
    n_in = batch.rdd.getNumPartitions()  # loop-invariant: one plan walk
    try:
        staged: dict[str, list[str]] = {}
        written: dict[str, tuple[int, int]] = {}
        first_group = True
        for gi, (_, tables) in enumerate(sorted(groups.items())):
            parts = []
            for t in tables:
                h = handles[t]
                src = guard_src if first_group else batch
                sub = src.filter(_admit(t)).drop(table_col)
                tfm = (per_table_transforms or {}).get(t)
                if tfm:  # same point in the chain as apply_batch's
                    sub = tfm(sub)
                sub = _apply_whitelist(
                    sub, h, (per_table_columns or {}).get(t), sort_key_col
                )
                from .apply import _sort_key_tuple

                keep = _sort_key_tuple(sort_key_col)
                aligned = _rewrite_to_current(sub, h, keep=keep)
                payload = [f["name"] for f in h.fields]
                parts.append(
                    aligned.select(
                        *payload,
                        F.col("seq").cast("long").alias("_seq"),
                        h._sort_expr(aligned, sort_key_col).alias("_sort"),
                        (F.col("op") == DML_DELETE).alias("_deleted"),
                        h.bucket_expr().alias("_bucket"),
                        F.lit(t).alias("__tbl"),
                    )
                )
            fused = parts[0]
            for p in parts[1:]:
                fused = fused.unionByName(p)
            # written/deleted counts observed in the write job itself:
            # with transforms in the slice chain these are the ground
            # truth for the snapshot summary (the raw-batch metrics job
            # measures pre-transform admits)
            gobs = Observation()
            fused = fused.observe(
                gobs,
                *[
                    F.count_if(F.col("__tbl") == t).alias(f"n_{j}")
                    for j, t in enumerate(tables)
                ],
                *[
                    F.count_if(
                        (F.col("__tbl") == t) & F.col("_deleted")
                    ).alias(f"d_{j}")
                    for j, t in enumerate(tables)
                ],
            )
            if n_in > 1:
                # same spanning-file throttle as _write_data_spanning:
                # fewer, bigger delta files amortize the read-time fold
                fused = fused.coalesce(max(1, n_in // 4))
            gdir = os.path.join(staging_root, f"g{gi}")
            fused.write.partitionBy("__tbl").mode("errorifexists").parquet(gdir)
            if first_group and obs is not None:
                m = observe_get(obs)
                if m is None or (m["n_ddl"] or 0) > 0:
                    return None  # DDL present (or unobservable) → loop path
                first_group = False
            gm = observe_get(gobs)
            if gm is not None:
                for j, t in enumerate(tables):
                    written[t] = (gm[f"n_{j}"] or 0, gm[f"d_{j}"] or 0)
            from urllib.parse import unquote

            for d in glob.glob(os.path.join(gdir, "__tbl=*")):
                staged[unquote(os.path.basename(d)[len("__tbl="):])] = sorted(
                    glob.glob(os.path.join(d, "*.parquet"))
                )

        # per-table metrics in ONE aggregation job over the cached
        # batch, admitted by the SAME per-table predicate as the write
        import functools
        import operator as _op

        mdf = (
            batch.filter(
                functools.reduce(_op.or_, [_admit(t) for t in todo])
            )
            .groupBy(table_col)
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.count_if(F.col("op") == op).alias(op) for op in DML_OPS],
                F.max("seq").alias("max_seq"),
                *(
                    [
                        F.min(
                            F.unix_timestamp(F.col("ingest_ts").cast("timestamp"))
                        ).alias("oldest")
                    ]
                    if "ingest_ts" in batch.columns
                    else []
                ),
            )
        )
        metrics = {r[table_col]: r.asDict() for r in mdf.collect()}

        for t in todo:
            h = handles[t]
            m = metrics.get(t)
            if t in written:  # ground truth from the write job's observe
                n, dels = written[t]
            else:
                dels = (m or {}).get(DML_DELETE) or 0
                n = (m or {}).get("n") or 0
            res = h.adopt_spanning_files(
                staged.get(t, []),
                writer_id,
                f"{batch_id}.{t}",
                summary={"upserts": n - dels, "deletes": dels},
            )
            st = ApplyStats(writer_id=writer_id, batch_id=f"{batch_id}.{t}")
            st.applied = True
            st.sub_batches = 1
            if res is not None:
                st.buckets = res["buckets"]
            if m is not None and res is not None and res["files"] > 0:
                st.rows_in = n
                st.upserts = n - dels
                st.deletes = dels
                st.op_counts = {
                    op: m[op] for op in DML_OPS if m.get(op)
                }
                st.max_seq = m["max_seq"] if m["max_seq"] is not None else -1
                if m.get("oldest") is not None:
                    st.latency_s = max(0.0, time.time() - m["oldest"])
            st.wall_ms = int((time.time() - t0) * 1000)
            if lineage:
                write_lineage(h, st)
            out[t].append(st)
        return out
    finally:
        shutil.rmtree(staging_root, ignore_errors=True)


def apply_multi_batch(
    catalog: Catalog,
    batch: DataFrame,
    writer_id: str,
    batch_id: str | int,
    my_tables: list[str],
    table_col: str = "tbl",
    op_blacklist: tuple = (),
    per_table_blacklists: dict | None = None,
    per_table_columns: dict | None = None,
    per_table_transforms: dict | None = None,
    branch: str | None = None,
    **apply_kw,
) -> dict[str, list[ApplyStats]]:
    """Apply one micro-batch of a multi-table changelog: table- and
    database-level DDL boundaries split each table's events into
    segments applied in seq order; each segment goes through the
    single-table ``apply_batch`` (which handles column-level DDL
    internally). Boundaries are processed in GLOBAL seq order so a
    cross-table op (DROP_DATABASE cascades over every table in the
    namespace) fires only after all affected tables applied their
    pre-op segments. Safe to replay with the same (writer_id,
    batch_id) after a crash anywhere."""
    batch_id = str(batch_id)
    mine = sorted(set(my_tables))
    my_dbs = {Catalog.database_of(t) for t in mine}

    # control (table/database DDL) rows are rare; dedup by seq
    # (at-least-once delivery) and keep only ops touching my tables
    ctrl: list[tuple[int, dict]] = []
    if "ddl" in batch.columns:
        rows = {
            r["seq"]: json.loads(r["ddl"])
            for r in batch.filter(F.col("op").isin(list(CONTROL_DDL_OPS)))
            .select("seq", "ddl")
            .collect()
        }
        for s, d in sorted(rows.items()):
            if d["op"] in DATABASE_DDL_OPS:
                # database ops span tables, whose per-table blacklists
                # may disagree — they respect only the global list
                if d.get("database") in my_dbs and d["op"] not in set(op_blacklist):
                    ctrl.append((s, d))
            elif d.get("table") in mine:
                bl = expand_blacklist(op_blacklist, per_table_blacklists, d["table"])
                if d["op"] == DDL_CREATE_TABLE or d["op"] not in bl:
                    ctrl.append((s, d))

    def affected(d: dict) -> list[str]:
        if d["op"] in DATABASE_DDL_OPS:
            return [t for t in mine if Catalog.database_of(t) == d.get("database")]
        return [d["table"]]

    n_segs = {t: 1 + sum(1 for _, d in ctrl if t in affected(d)) for t in mine}
    lo = {t: -(1 << 62) for t in mine}
    seg_i = {t: 0 for t in mine}
    out: dict[str, list[ApplyStats]] = {t: [] for t in mine}
    HI = 1 << 62

    def apply_segment(t: str, s_hi: int) -> None:
        i, seg_i[t] = seg_i[t], seg_i[t] + 1
        # events for a nonexistent table are dropped (reference:
        # unconfigured/unknown tables ignored)
        if not catalog.refresh().has_table(t):
            return
        # create_seq fence: a replayed pre-drop segment can never land
        # in the recreated incarnation
        fence = max(lo[t], catalog.create_seq(t))
        bl = expand_blacklist(op_blacklist, per_table_blacklists, t)
        sub = batch.filter(F.col(table_col) == t).drop(table_col)
        sub_id = f"{batch_id}.{t}" if n_segs[t] == 1 else f"{batch_id}.{t}.s{i}"
        st = apply_batch(
            _branched(catalog.table(t), branch),
            sub.filter((F.col("seq") > fence) & (F.col("seq") < s_hi)),
            writer_id=writer_id,
            batch_id=sub_id,
            op_blacklist=tuple(o for o in bl if o in DML_OPS),
            column_whitelist=(per_table_columns or {}).get(t),
            transforms=(per_table_transforms or {}).get(t),
            **apply_kw,
        )
        out[t].append(st)

    cached = len(mine) > 1
    if cached:
        batch = batch.persist()
    try:
        # steady-state fast path: no table/database DDL for my tables,
        # merge-on-read → ONE fused write job + ONE metrics job
        # regardless of table count, per-table transforms included
        # (falls back to the per-table loop below when preconditions
        # don't hold or the batch turns out to carry column-level DDL)
        merge_mode = apply_kw.get("merge_mode", "cow")
        if not ctrl and len(mine) > 1 and merge_mode in ("auto", "mor"):
            fused = _fused_mor_apply(
                catalog.refresh(), batch, writer_id, batch_id, mine, table_col,
                op_blacklist, per_table_blacklists, per_table_columns,
                apply_kw.get("sort_key_col"),
                lineage=apply_kw.get("lineage", True),
                per_table_transforms=per_table_transforms,
                branch=branch,
            )
            if fused is not None:
                return fused
        for s, d in ctrl:
            for t in affected(d):
                apply_segment(t, s)
                lo[t] = s
            catalog.apply_table_ddl(d, writer_id, s)
        for t in mine:
            apply_segment(t, HI)
    finally:
        if cached:
            batch.unpersist()
    return out


@dataclass
class MultiPipelineConfig:
    changelog_path: str
    catalog_root: str
    checkpoint_dir: str
    tables: tuple = ()                      # configured table set (reference:
    # SourceTable list); events for unlisted tables are dropped
    pipeline_name: str = "multi"
    generation: int | None = None
    instance_id: int = 0
    num_instances: int = 1
    explicit_assignment: list | None = None  # per-instance table lists
    table_col: str = "tbl"
    op_blacklist: tuple = ()
    per_table_blacklists: dict = field(default_factory=dict)
    per_table_columns: dict = field(default_factory=dict)  # name -> tuple
    # of selected columns (reference: SourceTable.getColumns); absent
    # table -> all columns
    per_table_transforms: dict = field(default_factory=dict)  # name ->
    # Callable[[DataFrame], DataFrame] (reference: per-column
    # transformation directives, Transformation.java:27-58)
    max_files_per_trigger: int | None = None
    max_bytes_per_trigger: str | None = None
    merge_mode: str = "auto"
    sort_key_col: object = None            # str | tuple of columns
    changelog_schema: object = None        # StructType; None → transcript
    # changelog + tbl column (the default payload shape)
    branch: str | None = None              # write-audit-publish across the
    # WHOLE table set: every table's epochs stage on this branch (both
    # the fused and per-table paths); an auditor validates and
    # Catalog.fast_forward_all() publishes the fleet
    publish_iceberg_dests: dict = field(default_factory=dict)  # table ->
    # Iceberg v2 dest dir (lake/iceberg.py publish_iceberg): each routed
    # table with an entry gets one incremental Iceberg snapshot per
    # published epoch — the single-table publish_iceberg_dest, fleet-wide
    publish_every: int = 1                  # publish every N micro-batches
    matview_specs: dict = field(default_factory=dict)  # table -> spec
    # dict {dest, group_cols, sums[, mins, maxs]} OR a list of them:
    # materialized
    # aggregates maintained in lockstep per routed table; N views over
    # one table share a single pre-image change-feed scan (advance_all)
    matview_every: int = 1                  # advance every N micro-batches

    def __post_init__(self):
        if self.generation is None:
            self.generation = int(time.time() * 1000)

    @property
    def writer_id(self) -> str:
        return f"{self.pipeline_name}-g{self.generation}-i{self.instance_id}"

    @property
    def checkpoint_location(self) -> str:
        return os.path.join(
            self.checkpoint_dir, f"g{self.generation}-i{self.instance_id}"
        )


# "downstream hook has never run for this table" — distinct from a
# table whose main head is legitimately None (never committed)
_NEVER = object()


class MultiTablePipeline:
    """One worker instance of a multi-table pipeline: applies only the
    tables routed to it; other instances run independently with their
    own writer-id + checkpoint (the reference's per-instance containers,
    DeltaWorker.java:157-168)."""

    def __init__(self, spark: SparkSession, cfg: MultiPipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.catalog = Catalog.load_or_create(spark, cfg.catalog_root)
        self.stats: list[dict[str, list[ApplyStats]]] = []
        # per-table main head as of the last downstream hook that ran
        # against it: epochs that leave main untouched (WAP staging,
        # a table with no routed events) skip the per-table
        # publish/matview no-op machinery entirely. A never-committed
        # table's head is None, which dict.get would also return for
        # "never ran" — the sentinel keeps the FIRST publish/advance
        # (of an empty table) from being mistaken for a no-op.
        self._downstream_head: dict[tuple[str, str], int | None] = {}

    @property
    def my_tables(self) -> list[str]:
        groups = assign_tables(
            sorted(self.cfg.tables),
            self.cfg.num_instances,
            explicit=self.cfg.explicit_assignment,
        )
        if self.cfg.instance_id >= len(groups):
            return []
        return groups[self.cfg.instance_id]

    def _read_schema(self):
        if self.cfg.changelog_schema is not None:
            return self.cfg.changelog_schema
        from pyspark.sql import types as T

        from .schema import CHANGELOG_SCHEMA

        return T.StructType(
            [T.StructField(self.cfg.table_col, T.StringType(), True),
             *CHANGELOG_SCHEMA.fields]
        )

    def _apply(self, df: DataFrame, batch_id: str, epoch_id: int = 0) -> dict:
        res = apply_multi_batch(
            self.catalog,
            df,
            writer_id=self.cfg.writer_id,
            batch_id=batch_id,
            my_tables=self.my_tables,
            table_col=self.cfg.table_col,
            op_blacklist=self.cfg.op_blacklist,
            per_table_blacklists=self.cfg.per_table_blacklists,
            per_table_columns=self.cfg.per_table_columns,
            per_table_transforms=self.cfg.per_table_transforms,
            branch=self.cfg.branch,
            merge_mode=self.cfg.merge_mode,
            sort_key_col=self.cfg.sort_key_col,
        )
        self.stats.append(res)
        self._downstream(epoch_id)
        return res

    def _downstream(self, epoch_id: int) -> None:
        """Per-table downstream maintenance after an epoch lands —
        Iceberg publishing and materialized-view advances, the fleet
        analog of the single-table sink hooks (pipeline.py). Reads MAIN
        only: under WAP staging (cfg.branch) main is frozen until an
        auditor fast_forwards, so unaudited staged rows can never leak
        into published artifacts or views — these become no-ops while
        staging and the first post-publish epoch catches downstream up."""
        mine = set(self.my_tables)
        pubs = {
            t: d for t, d in (self.cfg.publish_iceberg_dests or {}).items()
            if t in mine
        }
        mvs = {
            t: s for t, s in (self.cfg.matview_specs or {}).items() if t in mine
        }
        if not pubs and not mvs:
            return
        cat = self.catalog.refresh()
        if pubs and epoch_id % max(1, self.cfg.publish_every) == 0:
            from .lake.iceberg import publish_iceberg

            for t, dest in sorted(pubs.items()):
                if not cat.has_table(t):
                    continue
                tbl = cat.table(t)
                head = tbl.metadata["current_snapshot_id"]
                if self._downstream_head.get(("pub", t), _NEVER) == head:
                    continue  # main unmoved since the last publish
                publish_iceberg(tbl, dest)
                self._downstream_head[("pub", t)] = head
        if mvs and epoch_id % max(1, self.cfg.matview_every) == 0:
            from .lake.materialized import MaterializedAggregate, advance_all

            for t, spec in sorted(mvs.items()):
                if not cat.has_table(t):
                    continue
                specs = spec if isinstance(spec, (list, tuple)) else [spec]
                base = cat.table(t)
                head = base.metadata["current_snapshot_id"]
                if self._downstream_head.get(("mv", t), _NEVER) == head:
                    continue  # nothing new on main for any of t's views
                advance_all([
                    MaterializedAggregate(
                        self.spark,
                        base,
                        s["dest"],
                        list(s["group_cols"]),
                        dict(s.get("sums") or {}),
                        mins=dict(s.get("mins") or {}),
                        maxs=dict(s.get("maxs") or {}),
                    )
                    for s in specs
                ])
                self._downstream_head[("mv", t)] = head

    def run_batch(self, batch_id: str = "batch-0") -> dict:
        df = self.spark.read.schema(self._read_schema()).parquet(
            self.cfg.changelog_path
        )
        return self._apply(df, batch_id)

    def run_stream(self, available_now: bool = True):
        reader = self.spark.readStream.schema(self._read_schema()).option(
            "latestFirst", "false"
        )
        if self.cfg.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.cfg.max_files_per_trigger)
        if self.cfg.max_bytes_per_trigger:
            reader = reader.option("maxBytesPerTrigger", self.cfg.max_bytes_per_trigger)
        stream = reader.parquet(self.cfg.changelog_path)
        writer = (
            stream.writeStream.foreachBatch(
                lambda df, eid: self._apply(df, f"epoch-{eid}", eid)
            )
            .option("checkpointLocation", self.cfg.checkpoint_location)
            .queryName(self.cfg.writer_id)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_stream_to_completion(self, timeout: int = 600):
        q = self.run_stream(available_now=True)
        q.awaitTermination(timeout)
        return q
