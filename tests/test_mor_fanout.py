"""Fanout MoR write shape (LakeTable.merge(mode='mor', fanout=True)):
per-BUCKET delta files instead of spanning ones — Iceberg's fanout
writer. One batch-sized shuffle buys parquet-encode parallelism,
bucket-pruned delta reads (no spanning tax on every bucket), and
per-bucket compaction pressure that stays proportional to each
bucket's churn at scale. Semantics must be IDENTICAL to the spanning
shape: these tests pin read equality, pruning, compaction, the change
feed, the Spark-free DuckDB reader, and the streaming pipeline golden
over the new physical layout."""

import os

import pytest
from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _mk(spark, path):
    t = LakeTable.create(
        spark, str(path), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 8
    )
    rows = [
        (f"c{i % 10}", i, "user", f"v0 {i}", "", None, "INSERT", i + 1)
        for i in range(60)
    ]
    t.merge(spark.createDataFrame(rows, DDL), "w", "b0")  # CoW base
    return t


def _ops(spark):
    """A mixed epoch: updates, deletes, inserts across several keys."""
    return spark.createDataFrame(
        [
            ("c1", 1, "user", "upd-1", "", None, "UPDATE", 1001),
            ("c2", 2, None, None, None, None, "DELETE", 1002),
            ("c3", 3, "user", "upd-3", "", None, "UPDATE", 1003),
            ("c99", 0, "user", "new", "", None, "INSERT", 1004),
        ],
        DDL,
    )


def test_fanout_entries_are_bucketed_and_read_equal(spark, tmp_path):
    tf = _mk(spark, tmp_path / "fan")
    ts = _mk(spark, tmp_path / "span")
    tf.merge(_ops(spark), "w", "b1", mode="mor", fanout=True)
    ts.merge(_ops(spark), "w", "b1", mode="mor")
    deltas = [
        f for f in tf.current_snapshot["files"] if f.get("kind") == "delta"
    ]
    assert deltas and all(f["bucket"] >= 0 for f in deltas)
    sdeltas = [
        f for f in ts.current_snapshot["files"] if f.get("kind") == "delta"
    ]
    assert sdeltas and all(f["bucket"] == -1 for f in sdeltas)
    a = {tuple(r) for r in tf.read().collect()}
    b = {tuple(r) for r in ts.read().collect()}
    assert a == b and len(a) == 60  # 60 base - 1 delete + 1 insert

    # double-apply replay is still a no-op (idempotency marker)
    assert tf.merge(_ops(spark), "w", "b1", mode="mor", fanout=True) is None


def test_fanout_pruned_read_skips_other_buckets(spark, tmp_path):
    """The fanout payoff on the read side: a point lookup reads ONLY
    its bucket's base+delta files — spanning deltas would be read (and
    row-filtered) by EVERY bucket."""
    from delta_spark.lake.xxh import bucket_of

    t = _mk(spark, tmp_path / "t")
    t.merge(_ops(spark), "w", "b1", mode="mor", fanout=True)
    b1 = bucket_of("c1", 8, coltype="string")
    got = t.read(buckets=[b1])
    for p in got.inputFiles():
        rel = os.path.relpath(p.replace("file:", ""), t.path)
        entry = next(
            f for f in t.current_snapshot["files"] if f["path"] == rel
        )
        assert entry["bucket"] == b1, (rel, entry)
    assert got.filter("conv_id = 'c1' and turn_idx = 1").collect()[0][
        "text"
    ] == "upd-1"


def test_fanout_pressure_is_per_bucket(spark, tmp_path):
    """Spanning files weigh on every bucket; fanout files only on
    their own — pressure (the compaction trigger) must reflect that."""
    t = _mk(spark, tmp_path / "t")
    one_key = spark.createDataFrame(
        [("c1", 1, "user", "u", "", None, "UPDATE", 2000)], DDL
    )
    for i in range(3):
        t.merge(
            one_key.withColumn("seq", F.lit(2000 + i).cast("long")),
            "w", f"p{i}", mode="mor", fanout=True,
        )
    # 3 delta files, all in c1's bucket: pressure = 3 (not 3 × buckets)
    assert t.delta_file_pressure() == 3


def test_fanout_compact_absorbs(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for i, df in enumerate([_ops(spark)] * 3):
        t.merge(
            df.withColumn("seq", (F.col("seq") + i * 10).cast("long")),
            "w", f"b{i + 1}", mode="mor", fanout=True,
        )
    before = {tuple(r) for r in t.read().collect()}
    t.compact(max_files_per_bucket=1)
    t = LakeTable.load(spark, t.path)
    assert {tuple(r) for r in t.read().collect()} == before
    assert t.delta_file_pressure() == 0


def test_fanout_change_feed_classifies(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    s0 = t.metadata["current_snapshot_id"]
    t.merge(_ops(spark), "w", "b1", mode="mor", fanout=True)
    ch = {r["conv_id"]: r["_change_type"] for r in t.read_changes(s0).collect()}
    assert ch == {
        "c1": "update", "c2": "delete", "c3": "update", "c99": "insert",
    }


def test_fanout_duckdb_reader_parity(spark, tmp_path):
    """The Spark-free interop reader folds the fanout layout
    bit-for-bit like the engine."""
    import duckdb

    from delta_spark.lake.interop import read_duckdb

    t = _mk(spark, tmp_path / "t")
    t.merge(_ops(spark), "w", "b1", mode="mor", fanout=True)
    con = duckdb.connect()
    got = read_duckdb(t.path, con=con).df()
    want = t.read().toPandas()
    cols = ["conv_id", "turn_idx"]
    got = got.sort_values(cols).reset_index(drop=True)[want.columns]
    want = want.sort_values(cols).reset_index(drop=True)
    assert got["text"].tolist() == want["text"].tolist()
    assert len(got) == len(want)


def test_fanout_streaming_pipeline_golden(spark, tmp_path):
    """Full pipeline with mor_fanout=True: multi-batch streaming replay
    lands exactly on the tie-aware pandas oracle — the exactly-once
    and LWW guarantees are layout-independent."""
    from delta_spark.changelog import (
        ChangelogSpec,
        generate_and_write,
        oracle_apply,
    )
    from delta_spark.pipeline import Pipeline, PipelineConfig
    from tests.conftest import assert_pdf_equal

    spec = ChangelogSpec(n_events=3000, n_convs=40, seed=77, n_files=6)
    generate_and_write(str(tmp_path / "log"), spec)
    raw = spark.read.parquet(str(tmp_path / "log")).toPandas()
    cfg = PipelineConfig(
        changelog_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        max_files_per_trigger=2,
        mor_fanout=True,
    )
    p = Pipeline(spark, cfg)
    p.run_stream_to_completion()
    assert len(p.stats) >= 2
    t = LakeTable.load(spark, cfg.table_path)
    assert_pdf_equal(
        t.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"]
    )


def test_fanout_stream_kill_resume(spark, tmp_path):
    """Exactly-once under the fanout shape: stop mid-stream after the
    first micro-batch, restart from the checkpoint, land exactly on the
    oracle with no double-applied epoch — the (writer-id, batch-id)
    markers are delta-shape-independent."""
    from delta_spark.changelog import (
        ChangelogSpec,
        generate_and_write,
        oracle_apply,
    )
    from delta_spark.pipeline import Pipeline, PipelineConfig
    from tests.conftest import assert_pdf_equal

    spec = ChangelogSpec(n_events=2500, n_convs=40, seed=24, n_files=8)
    log_dir = str(tmp_path / "log")
    raw = generate_and_write(log_dir, spec)
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        max_files_per_trigger=2,
        mor_fanout=True,
    )
    p1 = Pipeline(spark, cfg)
    q = p1.run_stream(available_now=True)
    while not p1.stats:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)
    assert len(p1.stats) < 4  # genuinely mid-stream

    Pipeline(spark, cfg).run_stream_to_completion()
    t = LakeTable.load(spark, cfg.table_path)
    assert_pdf_equal(
        t.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"]
    )
    summaries = t.snapshot_summaries()
    batch_ids = [s["batch-id"] for s in summaries if "batch-id" in s]
    assert len(batch_ids) == len(set(batch_ids))
    # and the epochs after the CoW bootstrap really used the fanout
    # shape: per-bucket delta entries exist (or were already compacted)
    kinds = {
        (f.get("kind"), f["bucket"] == -1)
        for f in t.current_snapshot["files"]
    }
    assert ("delta", True) not in kinds  # no spanning files anywhere
