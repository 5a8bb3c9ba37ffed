"""Pipeline wiring: batch replay + Structured Streaming tail with
checkpointed resume.

Reference lifecycle being rebuilt (/root/reference/delta-app/src/main/
java/io/cdap/delta/app/DeltaWorker.java):
  configure (:136-168)  -> PipelineConfig dataclass + generation id
  initialize (:170-244) -> ensure_table() + checkpoint dir
  run loop (:297-449)   -> one StreamingQuery with foreachBatch
  startFromLastCommit (:566-592) -> checkpoint + snapshot max-seq marker

Backpressure: the reference bounds its in-memory queue by count+bytes
(CapacityBoundedEventQueue.java:35-122); Spark's pull-based micro-batch
admission (``maxFilesPerTrigger``) is the built-in equivalent.

Generation fencing: a redeployed pipeline gets a fresh ``generation``
(reference: DeltaWorker.configure:140-150); writer_id embeds it, so
markers from an old generation never satisfy the new one, and the
checkpoint dir is per-generation.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .apply import ApplyStats, apply_batch
from .lake import LakeTable
from .schema import CHANGELOG_SCHEMA, KEY_COLS, TRANSCRIPT_SCHEMA
from .state import StateStore


class DeltaFailureException(Exception):
    """Unretryable failure: raising this inside the apply path kills
    the supervised run immediately instead of backoff-retrying
    (reference: DeltaFailureException short-circuits the Failsafe
    policy, DeltaWorker.java:320-323).

    The message is stamped with a unique sentinel token: inside
    foreachBatch the Python exception surfaces only as TEXT embedded
    in the Java StreamingQueryException message, and matching the bare
    class name would mispromote any error whose traceback merely
    echoes the words (e.g. a log line in a Py4J dump)."""

    SENTINEL = "[delta-unretryable-8c4f]"

    def __init__(self, msg: str = ""):
        super().__init__(f"{self.SENTINEL} {msg}".strip())


def is_unretryable(e: BaseException) -> bool:
    """True when ``e`` is (or wraps, across the Py4J text boundary) a
    DeltaFailureException — exact sentinel match, never a class-name
    substring."""
    return isinstance(e, DeltaFailureException) or (
        DeltaFailureException.SENTINEL in str(e)
    )


@dataclass
class RetryConfig:
    """Reference: delta-proto/.../RetryConfig.java:24-38 (unbounded
    attempts within max_duration, default delay) + the worker's inner
    1→120 s exponential recovery backoff (DeltaWorker.java:380-392)."""

    first_delay_seconds: float = 1.0
    max_delay_seconds: float = 120.0
    backoff: float = 2.0
    max_duration_seconds: float | None = None  # None = retry forever


@dataclass
class PipelineConfig:
    changelog_path: str
    table_path: str
    checkpoint_dir: str
    pipeline_name: str = "transcripts"
    generation: int | None = None          # None -> fresh generation
    instance_id: int = 0
    num_buckets: int = 32
    salt_buckets: int = 0                  # >0 enables two-phase LWW
    op_blacklist: tuple = ()               # e.g. ("DELETE",)
    max_files_per_trigger: int | None = None
    max_bytes_per_trigger: str | None = None  # e.g. "64m" — size micro-
    # batches by BYTES so throughput doesn't depend on source file sizing
    merge_mode: str = "auto"               # cow | mor | auto (cow while
    # empty — snapshot load — then merge-on-read for the streaming trickle)
    mor_fanout: bool = False               # MoR delta shape: False =
    # spanning files (shuffle-free narrow write, cheapest trickle);
    # True = per-bucket delta files (Iceberg fanout writer: one
    # batch-sized shuffle buys full encode parallelism, bucket-pruned
    # delta reads, and per-bucket compaction pressure — the sustained-
    # throughput shape; see LakeTable._merge_mor)
    sort_key_col: object = None            # UN_ORDERED-source tiebreak (str |
    # tuple — composite SortKey list, reference SortKey.java:26-41):
    # equal-seq events resolve by this column (e.g. "ingest_ts" — the
    # reference's sourceTimestampMillis/sortKeys, SortKey.java:26-41)
    column_whitelist: tuple | None = None  # per-table column selection
    # (reference: SourceTable.getColumns); None = all columns
    compact_pressure: int = 8              # max delta files per bucket
    # before the sink folds them into base (0 disables auto-compaction)
    expire_every: int = 50                 # snapshots; 0 disables
    expire_keep_last: int = 10
    transforms: object = None              # Callable[[DataFrame], DataFrame]
    stats_cols: tuple = ("ts",)            # extra manifest column-bounds
    # stats beyond the key columns (lake/stats.py) — ts by default so
    # time-range reads of the applied table plan from the manifest
    publish_iceberg_dest: str | None = None  # keep a standard Iceberg v2
    # table in lockstep with the sink (lake/iceberg.py publish_iceberg):
    # one incremental Iceberg snapshot per published micro-batch
    publish_every: int = 1                 # publish every N micro-batches
    # (must stay well under expire_every or the publish cursor expires)
    matview_dest: str | None = None        # maintain a MaterializedAggregate
    # (lake/materialized.py) in lockstep with the sink: the view folds
    # each micro-batch's pre-image change feed at O(changed keys +
    # touched groups) — the per-domain/per-role summary tables a 100 TB
    # corpus cannot afford to recompute by rescanning the base
    matview_group_cols: tuple = ("role",)
    matview_sums: object = None            # dict: out col -> SQL expr
    matview_mins: object = None            # dict: out col -> SQL expr —
    matview_maxs: object = None            # half-maintainable extrema
    # (lake/materialized.py: O(1) insert fold, extremal retraction →
    # targeted group recompute)
    matview_every: int = 1                 # advance every N micro-batches
    matview_specs: tuple = ()              # ADDITIONAL views over the same
    # sink, each a dict {dest, group_cols, sums[, mins, maxs]} — all
    # views (including
    # the matview_dest one) advance through lake.materialized.advance_all,
    # which shares ONE pre-image change-feed scan across the set instead
    # of N identical scans per micro-batch
    curation_root: str | None = None       # maintain a CurationIndexer
    # (functions/curation_incremental.py) in lockstep with the sink:
    # per-turn curation verdicts (scrub fingerprint, quality gate,
    # split, pack weight) re-computed for each micro-batch's changed
    # keys only — curated_layout() then derives the packed training
    # layout from slim status rows whenever a consumer asks
    curation_text_col: str = "text"
    curation_top_cap: float = 0.5          # dialogue-shaped rows repeat
    # their role/markers by construction; the prose cap (0.25) would
    # reject them — see curation.repetition_stats
    curation_budget: int = 512             # layout token budget
    curation_n_shards: int = 8             # layout shard count
    curation_every: int = 1                # advance every N micro-batches
    # (keep well under expire_every, same constraint as publish_every)
    conv_curation_root: str | None = None  # maintain a
    # ConversationCurationIndexer in lockstep with the sink: the
    # CONVERSATION-level curated corpus (one packed document per conv,
    # verdicts re-computed only for conversations a micro-batch
    # touched). Column names follow the transcript schema; top_cap /
    # budget / shards share the curation_* knobs above.
    vocab_root: str | None = None          # maintain a VocabIndexer
    # (functions/curation_incremental.py) in lockstep with the sink:
    # per-token corpus counts + row frequency retraction-folded from
    # each micro-batch's Delta-CDF pre-images — the head vocabulary
    # oov_rate/tfidf serve from without a corpus scan
    vocab_text_col: str = "text"
    vocab_every: int = 1                   # advance every N micro-batches
    # (like publish_every: must stay well under expire_every or the
    # vocab cursor's snapshot expires and every advance degrades to an
    # O(corpus) rebootstrap)
    branch: str | None = None              # write-audit-publish: commit
    # every epoch to this branch (created at the table's current head on
    # first use) instead of main — an auditor validates read(branch=...)
    # and fast_forward()s main, so readers only ever see audited states

    def __post_init__(self):
        if self.generation is None:
            self.generation = int(time.time() * 1000)

    @property
    def writer_id(self) -> str:
        # (namespace, app, generation, instance) key of the reference's
        # offset store (DBReplicationOffsetStore.java:52-61)
        return f"{self.pipeline_name}-g{self.generation}-i{self.instance_id}"

    @property
    def checkpoint_location(self) -> str:
        return os.path.join(self.checkpoint_dir, f"g{self.generation}")


class Pipeline:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig, transforms=None):
        self.spark = spark
        self.cfg = cfg
        self.transforms = transforms if transforms is not None else cfg.transforms
        self.stats: list[ApplyStats] = []
        self.state = StateStore(cfg.table_path, cfg.pipeline_name)

    # ---------------------------------------------------- lifecycle

    def ensure_table(self) -> LakeTable:
        if LakeTable.exists(self.cfg.table_path):
            return self._bind_branch(
                LakeTable.load(self.spark, self.cfg.table_path)
            )
        return self._bind_branch(LakeTable.create(
            self.spark,
            self.cfg.table_path,
            TRANSCRIPT_SCHEMA,
            key_cols=KEY_COLS,
            bucket_col="conv_id",
            num_buckets=self.cfg.num_buckets,
            stats_cols=list(self.cfg.stats_cols),
        ))

    def _bind_branch(self, table: LakeTable) -> LakeTable:
        """WAP staging: bind the sink to ``cfg.branch`` (created
        concurrent-safely at the table's current head on first use), so
        every epoch this pipeline commits is unpublished until an
        auditor ``fast_forward``s main. No-op without a branch."""
        if self.cfg.branch is None:
            return table
        return table.ensure_branch(self.cfg.branch)

    # ---------------------------------------------------- batch mode

    def run_batch(self, batch_id: str = "batch-0") -> ApplyStats:
        """Replay the whole changelog as one batch (backfill /
        Trigger.AvailableNow analog for the initial snapshot load —
        reference: snapshot phase, ChangeEvent.isSnapshot)."""
        table = self.ensure_table()
        df = self.spark.read.schema(CHANGELOG_SCHEMA).parquet(self.cfg.changelog_path)
        st = apply_batch(
            table,
            df,
            writer_id=self.cfg.writer_id,
            batch_id=batch_id,
            op_blacklist=self.cfg.op_blacklist,
            salt_buckets=self.cfg.salt_buckets,
            transforms=self.transforms,
            merge_mode=self.cfg.merge_mode,
            sort_key_col=self.cfg.sort_key_col,
            column_whitelist=self.cfg.column_whitelist,
            mor_fanout=self.cfg.mor_fanout,
        )
        self.stats.append(st)
        return st

    # ---------------------------------------------------- streaming

    def _index_hygiene(self, root: str, table_dir: str) -> None:
        """A stream-maintained derived-state table (curation status,
        vocab) is a lake table like any other: without this, a
        per-micro-batch sink accumulates its snapshots and MoR delta
        files without bound. Applies the MAIN table's own policy
        (compact_pressure / expire_every / expire_keep_last); expiry
        folds exactly-once markers into applied_markers, so marker-
        derived cursors survive it."""
        path = os.path.join(root, table_dir)
        if not LakeTable.exists(path):
            return
        t = LakeTable.load(self.spark, path)
        if (
            self.cfg.compact_pressure
            and t.delta_file_pressure() >= self.cfg.compact_pressure
        ):
            t.compact(max_files_per_bucket=1)
        if (
            self.cfg.expire_every
            and len(t.metadata["snapshots"]) > self.cfg.expire_every
        ):
            t.expire_snapshots(keep_last=self.cfg.expire_keep_last)

    def _foreach_batch(self, table: LakeTable):
        name = self.cfg.pipeline_name

        def _fn(batch_df: DataFrame, epoch_id: int):
            # reference: table SNAPSHOTTING until the initial load lands,
            # then REPLICATING (DeltaTargetContext.setTableSnapshotting /
            # setTableReplicating, DeltaTargetContext.java:94-112)
            if table.refresh().current_snapshot is None:
                self.state.set_snapshotting(name)
            try:
                st = apply_batch(
                    table,
                    batch_df,
                    writer_id=self.cfg.writer_id,
                    batch_id=f"epoch-{epoch_id}",
                    op_blacklist=self.cfg.op_blacklist,
                    salt_buckets=self.cfg.salt_buckets,
                    transforms=self.transforms,
                    merge_mode=self.cfg.merge_mode,
                    sort_key_col=self.cfg.sort_key_col,
                    column_whitelist=self.cfg.column_whitelist,
                    mor_fanout=self.cfg.mor_fanout,
                )
            except Exception as e:
                self.state.set_table_failing(name)
                self.state.set_failing(repr(e))
                raise
            self.stats.append(st)
            self.state.set_replicating(name)
            self.state.set_ok()
            # merge-on-read maintenance: fold delta files into base
            # when any bucket's delta count crosses the threshold
            # (keeps read amplification flat under a steady trickle)
            if (
                self.cfg.compact_pressure
                and table.delta_file_pressure() >= self.cfg.compact_pressure
            ):
                table.compact(max_files_per_bucket=1)
            # downstream maintenance reads MAIN, never the staging
            # branch: under WAP (cfg.branch) unaudited staged rows must
            # not leak into the published Iceberg copy or the matview —
            # main is frozen while staging, so these become no-ops and
            # the first run after fast_forward catches downstream up
            main_view = table if self.cfg.branch is None else (
                LakeTable.load(self.spark, self.cfg.table_path)
            )
            # continuous Iceberg publishing: one incremental Iceberg
            # snapshot per published micro-batch, O(changed rows) each
            # — BEFORE expiry so the publish cursor stays readable
            if self.cfg.publish_iceberg_dest and (
                epoch_id % max(1, self.cfg.publish_every) == 0
            ):
                from .lake.iceberg import publish_iceberg

                publish_iceberg(
                    main_view.refresh(), self.cfg.publish_iceberg_dest
                )
            # continuous materialized-view maintenance: fold this
            # micro-batch's change feed into the aggregate view —
            # BEFORE expiry so the view cursor stays readable (an
            # expired cursor still recovers via rebootstrap, but that
            # costs O(base) instead of O(batch))
            if (self.cfg.matview_dest or self.cfg.matview_specs) and (
                epoch_id % max(1, self.cfg.matview_every) == 0
            ):
                from .lake.materialized import (
                    MaterializedAggregate,
                    advance_all,
                )

                specs = list(self.cfg.matview_specs)
                if self.cfg.matview_dest:
                    specs.insert(0, {
                        "dest": self.cfg.matview_dest,
                        "group_cols": self.cfg.matview_group_cols,
                        "sums": self.cfg.matview_sums,
                        "mins": self.cfg.matview_mins,
                        "maxs": self.cfg.matview_maxs,
                    })
                base = main_view.refresh()
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
            # continuous curation maintenance: re-scrub/gate ONLY this
            # micro-batch's changed keys into the status table (the
            # composite-key mode synthesizes the row identity from the
            # table's own key columns)
            if self.cfg.curation_root and (
                epoch_id % max(1, self.cfg.curation_every) == 0
            ):
                from .functions.curation_incremental import CurationIndexer

                base = main_view.refresh()
                CurationIndexer(
                    self.spark,
                    base,
                    self.cfg.curation_root,
                    id_col=tuple(base.key_cols),
                    text_col=self.cfg.curation_text_col,
                    top_cap=self.cfg.curation_top_cap,
                    budget=self.cfg.curation_budget,
                    n_shards=self.cfg.curation_n_shards,
                ).advance()
                self._index_hygiene(self.cfg.curation_root, "status")
            # continuous CONVERSATION-level curation: a micro-batch's
            # touched conversations re-assemble from a pinned pruned
            # read and re-gate; everything else stands
            if self.cfg.conv_curation_root and (
                epoch_id % max(1, self.cfg.curation_every) == 0
            ):
                from .functions.curation_incremental import (
                    ConversationCurationIndexer,
                )

                base = main_view.refresh()
                ConversationCurationIndexer(
                    self.spark,
                    base,
                    self.cfg.conv_curation_root,
                    text_col=self.cfg.curation_text_col,
                    top_cap=self.cfg.curation_top_cap,
                    budget=self.cfg.curation_budget,
                    n_shards=self.cfg.curation_n_shards,
                ).advance()
                self._index_hygiene(self.cfg.conv_curation_root, "status")
            # continuous vocabulary maintenance: retraction-fold this
            # micro-batch's pre-image change feed into the token stats
            # — same placement rationale as the matview (before expiry)
            if self.cfg.vocab_root and (
                epoch_id % max(1, self.cfg.vocab_every) == 0
            ):
                from .functions.curation_incremental import VocabIndexer

                base = main_view.refresh()
                VocabIndexer(
                    self.spark,
                    base,
                    self.cfg.vocab_root,
                    id_col=tuple(base.key_cols),
                    text_col=self.cfg.vocab_text_col,
                ).advance()
                self._index_hygiene(self.cfg.vocab_root, "vocab")
            # periodic metadata maintenance: a per-micro-batch sink
            # accumulates snapshots without bound otherwise
            if (
                self.cfg.expire_every
                and len(table.metadata["snapshots"]) > self.cfg.expire_every
            ):
                table.expire_snapshots(keep_last=self.cfg.expire_keep_last)

        return _fn

    def run_stream(self, available_now: bool = True):
        """Tail the changelog directory as a file-source stream.

        Checkpointed: a restarted query resumes from the last committed
        source offsets; a replayed epoch hits the (writer-id, batch-id)
        snapshot markers and is skipped — exactly-once end to end
        (reference: replay from committed (offset, seq),
        DeltaWorker.java:566-592).
        """
        table = self.ensure_table()
        reader = (
            self.spark.readStream.schema(CHANGELOG_SCHEMA)
            .option("latestFirst", "false")
        )
        if self.cfg.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.cfg.max_files_per_trigger)
        if self.cfg.max_bytes_per_trigger:
            reader = reader.option("maxBytesPerTrigger", self.cfg.max_bytes_per_trigger)
        stream = reader.parquet(self.cfg.changelog_path)
        writer = (
            stream.writeStream.foreachBatch(self._foreach_batch(table))
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

    def run_supervised(
        self, retry: RetryConfig | None = None, attempt_timeout: int = 600
    ) -> int:
        """Supervised streaming run: on failure, restart the query from
        its checkpoint with exponential backoff until it completes, the
        retry budget is exhausted, or the failure is a
        DeltaFailureException (immediate fail) — the reference's
        rollback-replay retry loop (DeltaWorker.java:297-403) rebuilt
        on checkpoint resume + idempotent apply. Returns the number of
        attempts. Exactly-once is unaffected: every restart replays the
        failed epoch, whose committed sub-batches hit their markers."""
        retry = retry or RetryConfig()
        t0 = time.time()
        delay = retry.first_delay_seconds
        attempts = 0
        while True:
            attempts += 1
            try:
                q = self.run_stream(available_now=True)
                q.awaitTermination(attempt_timeout)
                return attempts
            except Exception as e:
                # the Python exception surfaces embedded in the Java
                # StreamingQueryException MESSAGE (str, not repr) —
                # matched by sentinel token, not class name
                if is_unretryable(e):
                    raise
                elapsed = time.time() - t0
                if (
                    retry.max_duration_seconds is not None
                    and elapsed + delay > retry.max_duration_seconds
                ):
                    raise
                self.state.set_failing(str(e)[:500])
                time.sleep(delay)
                delay = min(delay * retry.backoff, retry.max_delay_seconds)
