"""Physical-plan audits: the optimizations we claim must show up in
the executed plan (pushdown, broadcast, partial aggregation, pruning).
These guard the 100 TB story, not just local correctness."""

import pytest
from pyspark.sql import functions as F

from delta_spark import queries as Q

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_scan_filter_pushdown(spark):
    df = Q.changelog_scan_filter(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters" in plan
    # both predicates reach the parquet reader
    assert "IsNotNull(event_type)" in plan or "Not(EqualTo(event_type,error))" in plan
    assert "GreaterThan(value,100.0)" in plan
    # projection pruned: props column never read
    assert "props" not in plan.split("ReadSchema")[1][:400]


def test_star_join_broadcasts_dims(spark):
    plan = _plan(Q.region_customer_rollup(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no shuffle of customer for dims


def test_lww_is_partial_aggregate_no_window(spark):
    plan = _plan(Q.lww_latest_state(spark, SF_DIR))
    assert "Window" not in plan
    # two-phase aggregate = map-side partial combine BEFORE the exchange
    # (struct buffers plan as SortAggregate; the partial_max below the
    # Exchange is what matters for hot keys)
    assert "partial_max" in plan
    assert plan.index("partial_max") > plan.index("Exchange")  # partial is the child


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    """Bucket pruning: an incremental merge's write job must scan only
    the affected buckets' files, not the whole table."""
    from delta_spark.lake import LakeTable
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 16,
    )
    rows = [
        (f"c{i}", j, "user", f"t{i}.{j}", "", None, "INSERT", i * 100 + j + 1)
        for i in range(50)
        for j in range(5)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    t.merge(df, "w", "b0")
    files_total = len(t.current_snapshot["files"])
    inc = spark.createDataFrame(
        [("c1", 0, "user", "patched", "", None, "UPDATE", 10**6)],
        df.schema.simpleString().replace("struct<", "").rstrip(">").replace(":", " "),
    )
    res = t.merge(inc, "w", "b1")
    assert len(res["buckets"]) == 1
    # unaffected files survived untouched in the new snapshot
    kept = [f for f in t.current_snapshot["files"] if f["bucket"] not in res["buckets"]]
    old_paths = {
        f["path"] for f in t._resolve_files(t.metadata["snapshots"][0])
    }
    assert all(f["path"] in old_paths for f in kept)
    assert len(kept) == files_total - 1


def test_minhash_single_shuffle(spark):
    """MinHash signatures: one explode + ONE aggregation (all seeds as
    columns of the same groupBy), not a pass per seed."""
    plan = _plan(Q.minhash_signatures(spark, SF_DIR))
    assert plan.count("Exchange") <= 2  # partial->final agg exchange only
    assert "Generate explode" in plan or "Generate" in plan


def test_ann_topk_is_takeordered(spark):
    """Top-k must plan as TakeOrderedAndProject (no full global sort)."""
    from delta_spark.functions import similarity

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in e.head()["embedding"]]
    plan = _plan(similarity.brute_force_topk(e, q, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_changelog_ddl_probe_prunes_columns(spark, tmp_path):
    """The DDL-boundary probe reads only (op, seq, ddl) — not text."""
    from delta_spark.changelog import ChangelogSpec, generate_and_write
    from delta_spark.schema import CHANGELOG_SCHEMA, DDL_OPS

    generate_and_write(
        str(tmp_path / "log"), ChangelogSpec(n_events=500, n_convs=10, seed=1)
    )
    df = (
        spark.read.schema(CHANGELOG_SCHEMA)
        .parquet(str(tmp_path / "log"))
        .filter(F.col("op").isin(list(DDL_OPS)))
        .select("seq", "ddl")
    )
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "text" not in read_schema and "prev_text" not in read_schema


def test_mor_read_fold_only_when_deltas_present(spark, tmp_path):
    """Merge-on-read cost model: a base-only read has NO aggregation
    (CoW invariant — one row per key already); once delta files exist
    the read plans exactly one argmax fold; after compaction the fold
    disappears again."""
    from delta_spark.lake import LakeTable
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 8,
    )
    ddl = (
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long"
    )
    base = spark.createDataFrame(
        [(f"c{i}", 0, "user", f"r{i}", "", None, "INSERT", i + 1) for i in range(20)],
        ddl,
    )
    t.merge(base, "w", "b0")  # CoW base
    assert "Aggregate" not in _optimized(t.read())
    t.merge(
        spark.createDataFrame([("c1", 0, "user", "upd", "", None, "UPDATE", 100)], ddl),
        "w", "b1", mode="mor",
    )
    folded = _optimized(t.read())
    assert "Aggregate" in folded  # exactly the argmax fold
    t.compact(max_files_per_bucket=1)
    assert "Aggregate" not in _optimized(t.read())


def test_mor_merge_never_scans_target(spark, tmp_path):
    """The MoR apply is O(batch): its write job reads ONLY the batch —
    no target files appear in the scan (the CoW path reads affected
    buckets; the MoR path reads none)."""
    from delta_spark.lake import LakeTable
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 8,
    )
    ddl = (
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long"
    )
    big = spark.createDataFrame(
        [(f"c{i}", j, "user", f"r{i}", "", None, "INSERT", i * 10 + j + 1)
         for i in range(30) for j in range(3)],
        ddl,
    )
    t.merge(big, "w", "b0")
    files_before = {f["path"] for f in t.current_snapshot["files"]}
    res = t.merge(
        spark.createDataFrame([("c1", 0, "user", "upd", "", None, "UPDATE", 10**6)], ddl),
        "w", "b1", mode="mor",
    )
    # every pre-existing file still referenced, exactly new delta files added
    after = {f["path"] for f in t.current_snapshot["files"]}
    assert files_before <= after
    assert len(after - files_before) == res["files"] == 1
