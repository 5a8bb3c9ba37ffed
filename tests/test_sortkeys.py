"""Composite (multi-key) sortKeys: the reference's SortKey is a typed
LIST (delta-api/.../SortKey.java:26-41) — equal-seq events from an
UN_ORDERED source resolve by (ts, lsn, ...) lexicographically. The
engine packs a composite key as array<bigint> in the persisted _sort
column; the SQL-oracle-checked core is the ``lww_sortkey_tiebreak``
driver query (lww_collapse with sort_cols tuple) — these tests pin the
TABLE/pipeline plumbing end to end."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("lsn", T.LongType(), True),
    ]
)

T1 = datetime.datetime(2025, 1, 1, 0, 0, 0)
T2 = datetime.datetime(2025, 1, 1, 0, 1, 0)


def _mk(spark, path, num_buckets=4):
    return LakeTable.create(
        spark, path, SCHEMA, ["conv_id", "turn_idx"], "conv_id", num_buckets
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, text string, ts timestamp, lsn long, "
        "op string, seq long",
    )


def test_composite_sortkey_tiebreak_cow(spark, tmp_path):
    """Equal seq, equal ts → the SECOND key (lsn) decides; unequal
    ts → the FIRST key dominates regardless of lsn."""
    t = _mk(spark, str(tmp_path / "t"))
    rows = [
        # key A: same seq, same ts, lsn decides → "a-lsn9"
        ("c1", 1, "a-lsn3", T1, 3, "INSERT", 5),
        ("c1", 1, "a-lsn9", T1, 9, "INSERT", 5),
        # key B: same seq, ts dominates lsn → "b-late"
        ("c1", 2, "b-late", T2, 1, "INSERT", 5),
        ("c1", 2, "b-early", T1, 99, "INSERT", 5),
        # key C: higher seq beats any sort key → "c-seq6"
        ("c2", 1, "c-seq5", T2, 99, "INSERT", 5),
        ("c2", 1, "c-seq6", T1, 1, "INSERT", 6),
    ]
    t.merge(_batch(spark, rows), "w1", "b0", sort_col=("ts", "lsn"))
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    assert got == {("c1", 1): "a-lsn9", ("c1", 2): "b-late", ("c2", 1): "c-seq6"}


def test_composite_sortkey_across_mor_batches(spark, tmp_path):
    """The array<bigint> _sort persists into delta files and the
    read-time argmax fold resolves composite ties ACROSS micro-batches
    (a later-delivered equal-seq event with a lower composite key can
    never regress the row)."""
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(
        _batch(spark, [("c1", 1, "first", T2, 5, "INSERT", 7)]),
        "w1", "b0", sort_col=("ts", "lsn"),
    )
    # late arrival: same seq, same ts, LOWER lsn → must lose
    t.merge(
        _batch(spark, [("c1", 1, "late-lower", T2, 2, "INSERT", 7)]),
        "w1", "b1", mode="mor", sort_col=("ts", "lsn"),
    )
    # late arrival: same seq, same ts, HIGHER lsn → must win
    t.merge(
        _batch(spark, [("c1", 1, "late-higher", T2, 8, "INSERT", 7)]),
        "w1", "b2", mode="mor", sort_col=("ts", "lsn"),
    )
    got = {r["turn_idx"]: r["text"] for r in t.read().collect()}
    assert got == {1: "late-higher"}
    # persisted _sort really is the packed composite array
    sys_rows = t.read(include_system=True).select("_sort").head()
    assert isinstance(sys_rows["_sort"], list) and len(sys_rows["_sort"]) == 2


def test_composite_sortkey_null_loses(spark, tmp_path):
    """A null sort-key component loses to any present one (packed as
    -2^62), per the reference's null-last ordering."""
    t = _mk(spark, str(tmp_path / "t"))
    rows = [
        ("c1", 1, "null-ts", None, 9, "INSERT", 5),
        ("c1", 1, "has-ts", T1, 1, "INSERT", 5),
    ]
    t.merge(_batch(spark, rows), "w1", "b0", sort_col=("ts", "lsn"))
    got = {r["turn_idx"]: r["text"] for r in t.read().collect()}
    assert got == {1: "has-ts"}


def test_apply_batch_accepts_sortkey_tuple(spark, tmp_path):
    """The apply path (whitelist keep-set, salted pre-collapse, merge)
    plumbs a tuple sort key through unchanged."""
    from delta_spark.apply import apply_batch

    t = _mk(spark, str(tmp_path / "t"))
    rows = [
        ("c1", 1, "lo", T1, 1, "INSERT", 5),
        ("c1", 1, "hi", T1, 7, "INSERT", 5),
    ]
    st = apply_batch(
        t, _batch(spark, rows), "w1", "b0",
        sort_key_col=("ts", "lsn"), salt_buckets=4,
        column_whitelist=("text", "ts", "lsn"),
    )
    assert st.applied
    got = {r["turn_idx"]: r["text"] for r in t.read().collect()}
    assert got == {1: "hi"}
