"""Micro-batch apply: filter → dedup → DDL-ordered sub-batches →
LWW collapse → MERGE → lineage + metrics.

This is the engine's equivalent of the reference's worker apply loop
(/root/reference/delta-app/src/main/java/io/cdap/delta/app/
DeltaWorker.java:405-493): where the reference applies one
``Sequenced<ChangeEvent>`` at a time in strict order, we apply a whole
micro-batch set-at-a-time, preserving the same semantics:

  * events at or below the committed sequence are replays → dropped
    (startFromLastCommit, DeltaWorker.java:576-578)
  * a DDL event takes effect before any later-sequenced DML
    (strict in-order apply, DeltaWorker.java:481-493) → the batch is
    split at DDL boundaries and sub-batches commit in order
  * per-key last writer wins; DELETE removes
  * metrics are flushed with the commit and never double-counted on
    replay (DeltaContext.java:121-125,274-276) → the lineage record is
    written idempotently keyed (writer-id, batch-id)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ._obs import observe_get
from .dedup import drop_seen, lww_collapse_salted
from .lake import LakeTable
from .schema import DDL_OPS, DML_OPS


@dataclass
class ApplyStats:
    writer_id: str
    batch_id: str
    applied: bool = False
    sub_batches: int = 0
    ddls_applied: int = 0
    rows_in: int = 0
    upserts: int = 0
    deletes: int = 0
    buckets: list = field(default_factory=list)
    op_counts: dict = field(default_factory=dict)
    bytes_in: int = 0
    max_seq: int = -1
    latency_s: float | None = None
    wall_ms: int = 0
    late_events: int = 0  # delivered at/below the writer's committed
    # high-water mark: replays (dropped/tied) or cross-batch reorders
    # (resolved by the seq-guarded merge) — the silent exactly-once
    # machinery surfaced as a metric (streaming analog per key:
    # stateful.stale_event_audit)


def _rewrite_to_current(
    batch: DataFrame,
    table: LakeTable,
    keep: tuple[str, ...] = (),
    wire_schema_version: int | None = None,
) -> DataFrame:
    """Remap event payload columns to current table names by column id
    and align types/additions — the rename-map rewrite (reference
    analog: rename bookkeeping in DefaultMutableRowSchema.java:85-130
    + PK remap in TransformationUtil.java:121-132). Renamed keys remap
    for free since key_cols are resolved by id.

    A real CDC source emits the NEW column name after a RENAME DDL,
    while replay fixtures may keep addressing original (v0) names —
    both must land. When ``wire_schema_version`` is known (the
    DDL-boundary segment split pins each segment's schema epoch), the
    mapping is exact by column id. Otherwise the batch is sniffed ONCE,
    globally: if its columns address renamed fields by original names
    the v0 map applies, if by current names the identity map applies
    (a per-column guess would mis-map chained/swapped renames)."""
    cur_to_orig = {
        v: k for k, v in table.original_to_current_names(0).items()
    }
    if wire_schema_version is not None:
        wire_by_id = {
            f["id"]: f["name"]
            for f in table.metadata["schemas"][str(wire_schema_version)]
        }
        src_of = {f["name"]: wire_by_id.get(f["id"], f["name"]) for f in table.fields}
    else:
        # sniff by COVERAGE, not by any-hit: with chained renames one
        # field's current name can equal another field's ORIGINAL name
        # (v0 (a,b); b→c then a→b: batch {b,c} is pure current-epoch,
        # yet 'b' also hits the v0 map), so count how many addressed
        # columns each epoch's map explains and take the better one;
        # ties go to CURRENT names (what a real CDC source emits after
        # honoring the DDL). wire_schema_version remains the exact
        # answer when the segment's epoch is known.
        batch_names = set(batch.columns)
        names_cur = {f["name"] for f in table.fields}
        names_v0 = set(cur_to_orig.values())
        cov_cur = len(batch_names & names_cur)
        cov_v0 = len(batch_names & names_v0)
        if cov_cur >= cov_v0:
            src_of = {f["name"]: f["name"] for f in table.fields}
        else:
            src_of = {
                f["name"]: cur_to_orig.get(f["name"], f["name"])
                for f in table.fields
            }
    cols = [F.col("seq"), F.col("op")]
    batch_cols = set(batch.columns)
    table_names = {f["name"] for f in table.fields}
    orig_is_free = {
        f["name"]: cur_to_orig.get(f["name"], f["name"]) not in table_names
        for f in table.fields
    }
    cols += [F.col(c) for c in keep if c in batch_cols and c not in table_names]
    for f in table.fields:
        t = f["type"]
        src = src_of[f["name"]]
        if src not in batch_cols and f["name"] in batch_cols:
            src = f["name"]  # mixed batch: fall through to current name
        if (
            src not in batch_cols
            and orig_is_free[f["name"]]
            and cur_to_orig.get(f["name"], f["name"]) in batch_cols
        ):
            # mixed batch, other direction: the original name appears
            # and is not shadowed by any CURRENT column name
            src = cur_to_orig[f["name"]]
        if src in batch_cols:
            cols.append(F.col(src).cast(t).alias(f["name"]))
        else:
            cols.append(F.lit(None).cast(t).alias(f["name"]))
    return batch.select(*cols)


def _sort_key_tuple(sort_key_col) -> tuple[str, ...]:
    """Normalize a sort-key spec (None | str | tuple/list) to a tuple —
    the reference's SortKey is a typed LIST (SortKey.java:26-41), so a
    composite tiebreak like (ts, lsn, txn_id) is first-class."""
    if not sort_key_col:
        return ()
    if isinstance(sort_key_col, (tuple, list)):
        return tuple(sort_key_col)
    return (sort_key_col,)


def _apply_whitelist(
    batch: DataFrame,
    table: LakeTable,
    column_whitelist: tuple[str, ...] | None,
    sort_key_col=None,
) -> DataFrame:
    """F3: per-table column whitelist (reference: SourceTable.getColumns,
    SourceTable.java:66-72 — empty/None selects all). Key columns and
    control columns always pass; unselected payload columns are DROPPED
    here so they reach the target as NULL and the scan never reads them
    (column pruning reaches the source)."""
    if column_whitelist is None:
        return batch
    keep_always = {"seq", "op", "ddl", "is_snapshot", "ingest_ts"}
    keep_always.update(table.key_cols)
    # events may still address keys by their ORIGINAL (pre-rename)
    # names — keep those too (id-based remap happens later)
    cur_to_orig = {v: k for k, v in table.original_to_current_names(0).items()}
    keep_always.update(cur_to_orig.get(k, k) for k in table.key_cols)
    if sort_key_col:
        keep_always.update(_sort_key_tuple(sort_key_col))
    allowed = keep_always | set(column_whitelist)
    return batch.select(*[c for c in batch.columns if c in allowed])


def apply_batch(
    table: LakeTable,
    batch: DataFrame,
    writer_id: str,
    batch_id: str | int,
    op_blacklist: tuple[str, ...] = (),
    salt_buckets: int = 0,
    transforms=None,
    lineage: bool = True,
    assume_ordered: bool = False,
    merge_mode: str = "cow",
    sort_key_col=None,  # str | tuple — composite sortKeys supported
    column_whitelist: tuple[str, ...] | None = None,
    mor_fanout: bool = False,
) -> ApplyStats:
    """Apply one micro-batch of changelog rows to ``table``.

    Safe to call again with the same (writer_id, batch_id) after a
    crash anywhere in the middle: sub-batches and DDLs that already
    committed are recognized and skipped, the rest complete — the
    at-least-once replay / idempotent-apply ⇒ exactly-once protocol
    (reference: DeltaWorker.java:297-440 + EventConsumer.java:39-76).
    """
    t0 = time.time()
    batch_id = str(batch_id)
    stats = ApplyStats(writer_id=writer_id, batch_id=batch_id)

    # F1: op blacklist (reference: QueueingEventEmitter.shouldIgnore,
    # QueueingEventEmitter.java:96-125)
    if op_blacklist:
        batch = batch.filter(~F.col("op").isin(list(op_blacklist)))

    # Replay guard. Only valid when the source delivers in seq order
    # ACROSS micro-batches (reference: Ordering.ORDERED,
    # SourceProperties.java:29-32); with reordered delivery an event
    # below the committed max-seq may be new, so correctness then
    # rests on the seq-guarded MERGE, not on dropping.
    committed_hwm = table.last_committed_seq(writer_id)
    if assume_ordered:
        batch = drop_seen(batch, committed_hwm)
    # duplicate-seq replays need no explicit dedup pass: they tie in
    # the merge's argmax-by-seq with identical payloads (one shuffle
    # saved; lineage rows_in counts raw delivered rows)

    if transforms:
        batch = transforms(batch)

    batch = _apply_whitelist(batch, table, column_whitelist, sort_key_col)

    # The salted two-phase pre-collapse remains as an opt-in for
    # pathologically hot keys (one key overwhelming a reducer even
    # after map-side combine); otherwise the merge's single
    # argmax-by-seq aggregation handles duplicate keys, duplicate-seq
    # replays, and the target in one shuffle.
    _sort_cols = _sort_key_tuple(sort_key_col)
    pre = (
        (
            lambda df: lww_collapse_salted(
                df, table.key_cols, "seq", salt_buckets, sort_cols=_sort_cols
            )
        )
        if salt_buckets
        else (lambda df: df)
    )

    def apply_segment(dml, s_lo, s_hi, sub_id, precommit=None, wire_sv=None):
        """Observe-metered merge of the DML events in (s_lo, s_hi).
        ``wire_sv`` pins the segment's wire schema epoch for the exact
        by-id column remap (known on the DDL-segmented slow path; the
        fast path has no boundary information and sniffs). Returns the
        merge result: None when (writer, sub_id) already committed,
        {'aborted': True} when ``precommit`` vetoed."""
        if table.is_applied(writer_id, sub_id):
            return None
        obs = Observation()
        # bytes/latency metrics only when the batch carries the
        # columns (a transform may rename `text`, and the engine
        # API accepts any table shape — guard, don't assume)
        have = set(dml.columns)
        metrics = [
            F.count(F.lit(1)).alias("n"),
            *[F.count_if(F.col("op") == op).alias(op) for op in DML_OPS],
            F.max("seq").alias("max_seq"),
            # events at/below the committed high-water mark (0 when
            # assume_ordered already dropped them pre-observe)
            F.count_if(F.col("seq") <= F.lit(committed_hwm)).alias("late"),
        ]
        byte_cols = [
            f.name
            for f in dml.schema.fields
            if f.name in have
            and f.name not in ("op",)
            and f.dataType.simpleString() in ("string", "binary")
            and f.name in {fl["name"] for fl in table.fields}
        ]
        if byte_cols:
            metrics.append(
                F.sum(
                    sum(
                        (F.coalesce(F.octet_length(c), F.lit(0)) for c in byte_cols),
                        F.lit(0),
                    )
                ).alias("bytes")
            )
        if "ingest_ts" in have:
            metrics.append(
                F.min(F.unix_timestamp(F.col("ingest_ts").cast("timestamp"))).alias(
                    "oldest"
                )
            )
        sub = dml.filter((F.col("seq") > s_lo) & (F.col("seq") < s_hi)).observe(
            obs, *metrics
        )
        keep = _sort_key_tuple(sort_key_col)
        res = table.merge(
            pre(
                _rewrite_to_current(
                    sub, table, keep=keep, wire_schema_version=wire_sv
                )
            ),
            writer_id,
            sub_id,
            mode=merge_mode,
            precommit=precommit,
            sort_col=sort_key_col,
            fanout=mor_fanout,
        )
        if res is not None and not res.get("aborted"):
            stats.upserts += res["upserts"]
            stats.deletes += res["deletes"]
            stats.buckets = sorted(set(stats.buckets) | set(res["buckets"]))
            m = observe_get(obs)
            if m is not None:
                stats.rows_in += m["n"]
                for op in DML_OPS:
                    if m[op]:
                        stats.op_counts[op] = stats.op_counts.get(op, 0) + m[op]
                stats.bytes_in += m.get("bytes") or 0
                stats.late_events += m.get("late") or 0
                stats.max_seq = max(stats.max_seq, m["max_seq"] or -1)
                if m.get("oldest") is not None:
                    stats.latency_s = max(0.0, time.time() - m["oldest"])
        return res

    def finish():
        stats.applied = True
        stats.wall_ms = int((time.time() - t0) * 1000)
        if lineage:
            write_lineage(table, stats)
        return stats

    LO, HI = -(1 << 62), 1 << 62
    has_ddl_col = "ddl" in batch.columns

    # FAST PATH — one Spark job per micro-batch. DDL rows are rare
    # control events, so apply the whole batch optimistically as a
    # single segment and verify "no DDL" via observe() inside the SAME
    # job; abort pre-commit and fall back to the segmented path only
    # when DDL rows actually exist. This is what makes the streaming
    # trickle cheap: no separate driver-side DDL probe pass.
    if has_ddl_col:
        obs_ddl = Observation()
        probed = batch.observe(
            obs_ddl, F.count_if(F.col("op").isin(list(DDL_OPS))).alias("n_ddl")
        )

        def no_ddl() -> bool:
            m = observe_get(obs_ddl)
            # unreadable observation (e.g. statically-empty plan) →
            # conservatively take the slow path
            return m is not None and (m["n_ddl"] or 0) == 0

        res = apply_segment(
            probed.filter(F.col("op").isin(list(DML_OPS))), LO, HI, batch_id,
            precommit=no_ddl,
        )
        if res is None or not res.get("aborted"):
            stats.sub_batches = 1
            return finish()
        stats.op_counts.clear()  # aborted fast path recorded nothing
    else:
        apply_segment(batch.filter(F.col("op").isin(list(DML_OPS))), LO, HI, batch_id)
        stats.sub_batches = 1
        return finish()

    # SLOW PATH — the batch interleaves DDL. Collect the (rare) DDL
    # boundary rows to the driver — the Spark analog of the reference's
    # in-order single-event DDL apply (DeltaWorker.java:481-487);
    # column pruning makes this scan read only (op, seq, ddl). Dedup by
    # seq: at-least-once delivery replays DDL rows too, and a duplicated
    # boundary would create a degenerate empty segment.
    ddl_rows = sorted(
        {
            r["seq"]: r
            for r in batch.filter(F.col("op").isin(list(DDL_OPS)))
            .select("seq", "ddl")
            .collect()
        }.values(),
        key=lambda r: r["seq"],
    )
    dml = batch.filter(F.col("op").isin(list(DML_OPS)))

    segments: list[tuple[int, int, dict | None]] = []
    lo = LO
    for r in ddl_rows:
        segments.append((lo, r["seq"], json.loads(r["ddl"])))
        lo = r["seq"]
    segments.append((lo, HI, None))
    for d in ddl_rows:
        op = json.loads(d["ddl"])["op"]
        stats.op_counts[op] = stats.op_counts.get(op, 0) + 1

    for i, (s_lo, s_hi, ddl_after) in enumerate(segments):
        sub_id = f"{batch_id}.{i}" if len(segments) > 1 else batch_id
        # the segment's wire epoch IS the table schema in effect right
        # now: DDL boundaries below s_lo were applied on earlier loop
        # iterations (or in the crashed run — apply_ddl is idempotent
        # and already-applied segments short-circuit on is_applied), so
        # a source that honors its own DDLs addresses exactly these
        # names. The exact by-id map replaces the global sniff — a
        # batch that physically carries BOTH a column's pre- and
        # post-rename names (values split by segment) lands each
        # segment from its own epoch's column. Reference:
        # DefaultMutableRowSchema.java:85-130 (exact, never heuristic).
        apply_segment(
            dml, s_lo, s_hi, sub_id,
            wire_sv=table.metadata["schema_version"],
        )
        stats.sub_batches += 1
        if ddl_after is not None:
            if table.apply_ddl(ddl_after):
                stats.ddls_applied += 1

    return finish()


def write_lineage(table: LakeTable, stats: ApplyStats) -> None:
    """Per-batch lineage + metrics record, idempotent by file name
    (writer-id, batch-id) — commit-coupled metric flush, never
    double-counted on replay (reference: MetricsHandler flush-on-commit,
    delta-app/.../metrics/MetricsHandler.java:97-119 +
    DeltaContext.clearMetrics:274-276)."""
    d = os.path.join(table.path, "metadata", "lineage")
    os.makedirs(d, exist_ok=True)
    safe = stats.batch_id.replace("/", "_")
    path = os.path.join(d, f"{stats.writer_id}-{safe}.json")
    if os.path.exists(path):
        return
    rec = {
        "writer_id": stats.writer_id,
        "batch_id": stats.batch_id,
        "rows_in": stats.rows_in,
        "op_counts": stats.op_counts,
        "bytes_in": stats.bytes_in,
        "upserts": stats.upserts,
        "deletes": stats.deletes,
        "buckets": stats.buckets,
        "sub_batches": stats.sub_batches,
        "ddls_applied": stats.ddls_applied,
        "max_seq": stats.max_seq,
        "late_events": stats.late_events,
        "latency_s": stats.latency_s,
        "wall_ms": stats.wall_ms,
        "committed_at_ms": int(time.time() * 1000),
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, path)


def read_lineage(spark, table: LakeTable) -> DataFrame:
    d = os.path.join(table.path, "metadata", "lineage")
    return spark.read.json(d)
