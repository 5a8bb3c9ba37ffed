"""Structured Streaming replay: end-to-end, kill/resume from
checkpoint, failure injection with proceed-file.

Reference analogs:
  * testRestartFromOffset — resume applies only remaining events
    (/root/reference/delta-app/src/test/java/io/cdap/delta/app/
    DeltaPipelineStateStoreBaseTest.java:175-232)
  * testFailureRetries — sink raises until a proceed file exists; no
    double-counting (:307-397; FailureTarget.java:101-111)
"""

import os

import pytest

from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply
from delta_spark.lake import LakeTable
from delta_spark.pipeline import Pipeline, PipelineConfig

from conftest import assert_pdf_equal


def _mk(spark, tmp_path, spec, **kw):
    log_dir = str(tmp_path / "changelog")
    raw = generate_and_write(log_dir, spec)
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        generation=1,
        **kw,
    )
    return raw, cfg


def test_stream_replay_full(spark, tmp_path):
    spec = ChangelogSpec(n_events=2500, n_convs=40, seed=21, n_files=6)
    raw, cfg = _mk(spark, tmp_path, spec, max_files_per_trigger=3)
    p = Pipeline(spark, cfg)
    p.run_stream_to_completion()
    assert len(p.stats) >= 2  # multiple micro-batches
    table = LakeTable.load(spark, cfg.table_path)
    assert_pdf_equal(table.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"])


def test_stream_kill_resume(spark, tmp_path):
    """Stop after the first micro-batch; restart; final state exact,
    replayed prefix not double-applied."""
    spec = ChangelogSpec(n_events=2500, n_convs=40, seed=22, n_files=8)
    raw, cfg = _mk(spark, tmp_path, spec, max_files_per_trigger=2)

    p1 = Pipeline(spark, cfg)
    table = p1.ensure_table()
    q = p1.run_stream(available_now=True)
    # kill after the first progress (mid-stream)
    while not p1.stats:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)
    applied_before = len(p1.stats)
    assert applied_before < 4  # genuinely mid-stream

    p2 = Pipeline(spark, cfg)  # same generation -> same checkpoint+writer
    p2.run_stream_to_completion()
    table = LakeTable.load(spark, cfg.table_path)
    assert_pdf_equal(table.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"])
    # replays of already-committed epochs were skipped, not re-merged
    summaries = table.snapshot_summaries()
    batch_ids = [s["batch-id"] for s in summaries if "batch-id" in s]
    assert len(batch_ids) == len(set(batch_ids))


def test_stream_failure_injection_then_proceed(spark, tmp_path):
    """Chaos: the apply path raises until a proceed-file exists. The
    IN-ENGINE supervisor (run_supervised — reference: the Failsafe
    retry loop, DeltaWorker.java:297-403) restarts from checkpoint with
    backoff until the proceed file appears; no external scheduler, no
    manual second pipeline. Everything lands exactly once."""
    import threading

    from delta_spark.pipeline import RetryConfig

    spec = ChangelogSpec(n_events=1500, n_convs=30, seed=23, n_files=4)
    raw, cfg = _mk(spark, tmp_path, spec, max_files_per_trigger=2)
    proceed = tmp_path / "proceed"

    class ChaosPipeline(Pipeline):
        def _foreach_batch(self, table):
            inner = super()._foreach_batch(table)

            def _fn(df, epoch_id):
                if epoch_id >= 1 and not os.path.exists(proceed):
                    raise RuntimeError("injected failure (no proceed file)")
                inner(df, epoch_id)

            return _fn

    p1 = ChaosPipeline(spark, cfg)
    timer = threading.Timer(8.0, proceed.touch)
    timer.start()
    try:
        attempts = p1.run_supervised(
            RetryConfig(first_delay_seconds=1.0, backoff=2.0)
        )
    finally:
        timer.cancel()
    assert attempts >= 2  # it really failed and retried in-engine
    table = LakeTable.load(spark, cfg.table_path)
    assert_pdf_equal(table.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"])
    # metrics not double-counted: lineage rows_in totals match distinct events
    lineage_dir = os.path.join(cfg.table_path, "metadata", "lineage")
    import json

    total = sum(
        json.load(open(os.path.join(lineage_dir, f)))["rows_in"]
        for f in os.listdir(lineage_dir)
    )
    # each distinct event counted once per batch it lands in; duplicate
    # seqs are deduped within a batch but may recur across batches
    assert raw["seq"].nunique() <= total <= len(raw)


def test_generation_fencing(spark, tmp_path):
    """A new generation (redeploy) gets a fresh writer-id + checkpoint:
    it replays from scratch but idempotent MERGE keeps state correct
    (reference: DeltaWorker.configure generation, :140-150)."""
    spec = ChangelogSpec(n_events=800, n_convs=20, seed=24, n_files=2)
    raw, cfg = _mk(spark, tmp_path, spec)
    Pipeline(spark, cfg).run_batch()
    cfg2 = PipelineConfig(
        changelog_path=cfg.changelog_path,
        table_path=cfg.table_path,
        checkpoint_dir=cfg.checkpoint_dir,
        generation=2,
    )
    assert cfg2.writer_id != cfg.writer_id
    Pipeline(spark, cfg2).run_batch()
    table = LakeTable.load(spark, cfg.table_path)
    assert_pdf_equal(table.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"])


def test_watermark_dedup_state_is_bounded(spark, tmp_path):
    """dropDuplicatesWithinWatermark must EVICT dedup state as event
    time advances past the watermark — state stays ~one window wide,
    it does not grow with every distinct key seen (the scale-killer
    the north rule's 'sequence-number watermarking' must avoid at
    10^10 events). Asserted via stateOperators numRowsTotal across
    micro-batches."""
    import json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "wm_src"
    src.mkdir()
    rows_per_file, n_files = 500, 6
    base = pd.Timestamp("2025-01-01 00:00:00")
    arrow_schema = pa.schema(
        [pa.field("event_id", pa.int64()), pa.field("ts", pa.timestamp("us"))]
    )
    for i in range(n_files):
        ids = range(i * rows_per_file, (i + 1) * rows_per_file)
        df = pd.DataFrame(
            {
                "event_id": list(ids) + list(ids)[:50],  # in-file dups
                "ts": [base + pd.Timedelta(hours=i)] * (rows_per_file + 50),
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, schema=arrow_schema, preserve_index=False),
            src / f"part-{i:03d}.parquet",
        )

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("event_id long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_bound")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # exactly-once: every distinct id landed once
    assert spark.table("wm_bound").count() == rows_per_file * n_files
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (json.loads(x.json) for x in q.recentProgress)
        if p.get("stateOperators")
    ]
    assert len(totals) >= n_files - 1
    # bounded: state holds ~one watermark window (one file's keys), not
    # the cumulative key set; give 3x slack for trigger overlap
    assert max(totals) <= 3 * (rows_per_file + 50), totals
    assert max(totals) < rows_per_file * n_files / 2


def test_supervisor_immediate_fail_and_budget(spark, tmp_path):
    """DeltaFailureException kills a supervised run on the FIRST
    attempt (reference: DeltaWorker.java:320-323); an ordinary failure
    gives up once the retry budget is exhausted."""
    import time as _time

    from delta_spark.pipeline import DeltaFailureException, RetryConfig

    spec = ChangelogSpec(n_events=300, n_convs=10, seed=25, n_files=2)
    raw, cfg = _mk(spark, tmp_path, spec)

    class FatalPipeline(Pipeline):
        def _foreach_batch(self, table):
            def _fn(df, epoch_id):
                raise DeltaFailureException("unretryable")

            return _fn

    with pytest.raises(Exception, match="DeltaFailureException"):
        FatalPipeline(spark, cfg).run_supervised(RetryConfig())

    class AlwaysFailing(Pipeline):
        def _foreach_batch(self, table):
            def _fn(df, epoch_id):
                raise RuntimeError("transient-looking but persistent")

            return _fn

    cfg2 = PipelineConfig(
        changelog_path=cfg.changelog_path,
        table_path=str(tmp_path / "t2"),
        checkpoint_dir=str(tmp_path / "ck2"),
        generation=3,
    )
    t0 = _time.time()
    with pytest.raises(Exception):
        AlwaysFailing(spark, cfg2).run_supervised(
            RetryConfig(first_delay_seconds=0.5, max_duration_seconds=6.0)
        )
    assert _time.time() - t0 < 60  # gave up on budget, not hung


def test_progress_logger_persists_stats(spark, tmp_path):
    """M3: the ongoing diagnostics listener persists one progress record
    per micro-batch, queryable as a DataFrame (reference: periodic
    stats logging, MetricsHandler.java:76-83)."""
    from delta_spark.progress import attach_progress_logger, read_progress

    stats_dir = str(tmp_path / "stats")
    lst = attach_progress_logger(spark, stats_dir=stats_dir)
    try:
        spec = ChangelogSpec(n_events=1200, n_convs=20, seed=26, n_files=4)
        raw, cfg = _mk(spark, tmp_path, spec, max_files_per_trigger=2)
        p = Pipeline(spark, cfg)
        p.run_stream_to_completion()
        import time as _t

        # listener delivery is async — wait for EVERY epoch's progress
        # event, not just the first file (waiting on existence alone
        # raced epoch 1's event and flaked)
        deadline = _t.time() + 60
        rows = []
        while _t.time() < deadline:
            if os.path.isdir(stats_dir) and any(os.scandir(stats_dir)):
                rows = (
                    read_progress(spark, stats_dir)
                    .select("batchId", "numInputRows")
                    .collect()
                )
                if len(rows) >= len(p.stats):
                    break
            _t.sleep(0.5)
        assert len(rows) >= len(p.stats)
        assert sum(r["numInputRows"] for r in rows) >= len(raw)
    finally:
        spark.streams.removeListener(lst)


def test_stream_kill_rebucket_resume(spark, tmp_path):
    """Kill mid-stream, REBUCKET while down (4 → 16, metadata-only),
    resume from the same checkpoint: replayed epochs hit their markers,
    the tail lands under the new spec, the final state is exact, and a
    follow-up compact migrates every pre-rebucket file without changing
    the data."""
    spec = ChangelogSpec(n_events=2500, n_convs=40, seed=29, n_files=8)
    raw, cfg = _mk(spark, tmp_path, spec, max_files_per_trigger=2, num_buckets=4)

    p1 = Pipeline(spark, cfg)
    q = p1.run_stream(available_now=True)
    while not p1.stats:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)
    assert len(p1.stats) < 4  # genuinely mid-stream

    t = LakeTable.load(spark, cfg.table_path)
    assert t.rebucket(16) is True

    p2 = Pipeline(spark, cfg)  # same generation -> same checkpoint+writer
    p2.run_stream_to_completion()
    t = LakeTable.load(spark, cfg.table_path)
    want = oracle_apply(raw)
    assert_pdf_equal(t.read().toPandas(), want, ["conv_id", "turn_idx"])
    # no double-applied epoch
    batch_ids = [s["batch-id"] for s in t.snapshot_summaries() if "batch-id" in s]
    assert len(batch_ids) == len(set(batch_ids))
    # both specs present (old base + new-spec tail), then compact migrates
    specs = {t._entry_spec(f) for f in t.current_snapshot["files"]}
    assert specs == {0, 1}
    t.compact(max_files_per_bucket=1)
    assert {t._entry_spec(f) for f in t.current_snapshot["files"]} == {1}
    assert_pdf_equal(t.read().toPandas(), want, ["conv_id", "turn_idx"])


def test_stream_publishes_iceberg_per_microbatch(spark, tmp_path):
    """publish_iceberg_dest keeps a standard Iceberg v2 table in
    lockstep with the streaming sink: one incremental Iceberg snapshot
    per micro-batch, final Iceberg read == engine read == oracle."""
    import json

    from delta_spark.lake.iceberg import read_iceberg_duckdb

    spec = ChangelogSpec(n_events=2000, n_convs=30, seed=31, n_files=6)
    raw, cfg = _mk(
        spark,
        tmp_path,
        spec,
        max_files_per_trigger=2,
        publish_iceberg_dest=str(tmp_path / "ice"),
    )
    p = Pipeline(spark, cfg)
    p.run_stream_to_completion()
    assert len(p.stats) >= 2  # multiple micro-batches → multiple publishes

    meta_dir = str(tmp_path / "ice" / "metadata")
    versions = sorted(
        f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")
    )
    assert len(versions) >= 2, versions  # bootstrap + ≥1 incremental
    mp = os.path.join(meta_dir, versions[-1])
    with open(mp) as f:
        md = json.load(f)
    assert len(md["snapshot-log"]) == len(versions)

    table = LakeTable.load(spark, cfg.table_path)
    want = table.read().toPandas()
    got = read_iceberg_duckdb(mp).df()
    assert_pdf_equal(want, got, ["conv_id", "turn_idx"])
    assert_pdf_equal(want, oracle_apply(raw), ["conv_id", "turn_idx"])
