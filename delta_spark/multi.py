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
  * table-level DDL (CREATE/DROP/TRUNCATE/RENAME) applies strictly
    before later-sequenced events — DDLOperation.java:30-38

Exactly-once: every (instance, table, segment) gets its own idempotent
batch-id marker in that table's snapshot summaries; table-level DDL is
marked per (writer, seq) in the catalog; a recreated table's
``create_seq`` fences replayed pre-drop DML segments out of the new
incarnation.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apply import ApplyStats, apply_batch
from .catalog import Catalog
from .routing import assign_tables
from .schema import DDL_CREATE_TABLE, DML_OPS, TABLE_DDL_OPS


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
    **apply_kw,
) -> dict[str, list[ApplyStats]]:
    """Apply one micro-batch of a multi-table changelog: table-level
    DDL boundaries split each table's events into segments applied in
    order; each segment goes through the single-table ``apply_batch``
    (which handles column-level DDL internally). Safe to replay with
    the same (writer_id, batch_id) after a crash anywhere."""
    batch_id = str(batch_id)
    mine = set(my_tables)

    # table-level DDL rows are rare control events; dedup by seq
    # (at-least-once delivery) and keep only my tables' targets
    tddl: list[tuple[int, dict]] = []
    if "ddl" in batch.columns:
        rows = {
            r["seq"]: json.loads(r["ddl"])
            for r in batch.filter(F.col("op").isin(list(TABLE_DDL_OPS)))
            .select("seq", "ddl")
            .collect()
        }
        tddl = sorted(
            (s, d) for s, d in rows.items() if d.get("table") in mine
        )

    cached = len(mine) > 1
    if cached:
        batch = batch.persist()
    out: dict[str, list[ApplyStats]] = {}
    try:
        for t in sorted(mine):
            bl = expand_blacklist(op_blacklist, per_table_blacklists, t)
            dml_bl = tuple(o for o in bl if o in DML_OPS)
            bounds = [
                (s, d) for s, d in tddl
                if d["table"] == t and not (d["op"] != DDL_CREATE_TABLE and d["op"] in bl)
            ]
            segments: list[tuple[int, int, tuple | None]] = []
            lo = -(1 << 62)
            for s, d in bounds:
                segments.append((lo, s, (s, d)))
                lo = s
            segments.append((lo, 1 << 62, None))

            sub = batch.filter(F.col(table_col) == t).drop(table_col)
            stats: list[ApplyStats] = []
            for i, (s_lo, s_hi, ddl_after) in enumerate(segments):
                if catalog.refresh().has_table(t):
                    # create_seq fence: a replayed pre-drop segment can
                    # never land in the recreated incarnation
                    fence = max(s_lo, catalog.create_seq(t))
                    sub_id = (
                        f"{batch_id}.{t}" if len(segments) == 1 else f"{batch_id}.{t}.s{i}"
                    )
                    st = apply_batch(
                        catalog.table(t),
                        sub.filter((F.col("seq") > fence) & (F.col("seq") < s_hi)),
                        writer_id=writer_id,
                        batch_id=sub_id,
                        op_blacklist=dml_bl,
                        column_whitelist=(per_table_columns or {}).get(t),
                        transforms=(per_table_transforms or {}).get(t),
                        **apply_kw,
                    )
                    stats.append(st)
                # events for a nonexistent table are dropped (reference:
                # unconfigured/unknown tables ignored)
                if ddl_after is not None:
                    catalog.apply_table_ddl(ddl_after[1], writer_id, ddl_after[0])
            out[t] = stats
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
    sort_key_col: str | None = None
    changelog_schema: object = None        # StructType; None → transcript
    # changelog + tbl column (the default payload shape)

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

    def _apply(self, df: DataFrame, batch_id: str) -> dict:
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
            merge_mode=self.cfg.merge_mode,
            sort_key_col=self.cfg.sort_key_col,
        )
        self.stats.append(res)
        return res

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
                lambda df, eid: self._apply(df, f"epoch-{eid}")
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
