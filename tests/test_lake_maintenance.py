"""Lake maintenance: time travel, snapshot expiry (markers survive),
small-file compaction."""

from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA


def _mk_table(spark, path, n_batches=6, rows_per=50):
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 8)
    for b in range(n_batches):
        rows = [
            (f"c{i % 10}", b * rows_per + i, "user", f"b{b} r{i}", "", None, "INSERT", b * rows_per + i + 1)
            for i in range(rows_per)
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, "
            "ts timestamp, op string, seq long",
        )
        t.merge(df, "w1", f"b{b}")
    return t


def test_time_travel(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=3)
    snaps = [s["id"] for s in t.metadata["snapshots"]]
    first = t.read(snapshot_id=snaps[0]).count()
    last = t.read().count()
    assert first == 50 and last == 150


def test_expire_keeps_markers_and_data(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=6)
    before = t.read().count()
    n = t.expire_snapshots(keep_last=2)
    assert n == 4
    assert t.read().count() == before  # current data intact
    # exactly-once markers survive expiry
    assert t.is_applied("w1", "b0") and t.is_applied("w1", "b5")
    assert not t.is_applied("w1", "b99")
    # re-merge of an expired batch id is still skipped
    df = spark.createDataFrame(
        [("cX", 1, "user", "dup", "", None, "INSERT", 99999)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    assert t.merge(df, "w1", "b0") is None
    assert t.read().count() == before


def test_merge_is_self_compacting(spark, tmp_path):
    """Copy-on-write merge rewrites whole buckets: file count stays
    bounded by num_buckets no matter how many batches commit."""
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=6)
    per_bucket = {}
    for f in t.current_snapshot["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert max(per_bucket.values()) == 1
    assert len(t.current_snapshot["files"]) <= t.num_buckets
    assert t.compact(max_files_per_bucket=1) == 0  # nothing to do


def test_compact_reduces_files(spark, tmp_path):
    """When multi-file buckets DO exist (e.g. a differently-written
    import), compact() rewrites them down (Iceberg rewrite_data_files)."""
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=2)
    cur = t.current_snapshot
    # construct a crowded bucket: re-register the same data twice
    extra = t._write_data(
        t.read(include_system=True).withColumn("_bucket", t.bucket_expr()),
        "dup-import",
    )
    rows_before = t.read().count()
    t._commit_snapshot(cur["files"] + extra, {"operation": "append-import"})
    assert t.read().count() == 2 * rows_before  # duplicated on purpose
    n = t.compact(max_files_per_bucket=1)
    assert n > 0
    per_bucket = {}
    for f in t.current_snapshot["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert max(per_bucket.values()) == 1
    assert t.current_snapshot["summary"]["operation"] == "compact"
    assert t.read().count() == 2 * rows_before  # compaction keeps data
    # and a subsequent merge still works
    df = spark.createDataFrame(
        [("c1", 999999, "user", "post-compact", "", None, "INSERT", 10**6)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    assert t.merge(df, "w1", "post") is not None
    assert t.read().filter("text = 'post-compact'").count() == 1
