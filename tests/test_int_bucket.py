"""Int-bucketed tables + NULL bucket keys + per-value lookup pruning.

Spark's ``xxhash64`` hashes an IntegerType column through the 4-byte
hashInt path but a LongType column through 8-byte hashLong — the same
Python int has two different buckets depending on the column's
DECLARED type. Every engine-external hash site (pure-Python planner,
DuckDB reader/writer UDF) must dispatch on the column type, and DuckDB
UDFs must be registered with special NULL handling (Spark's
``xxhash64(NULL)`` is the seed, so NULL keys live in bucket
``pmod(42, n)``, never a NULL bucket). Round-3 advisory regressions."""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_spark.lake import LakeTable
from delta_spark.lake.interop import read_duckdb, write_delta_duckdb
from delta_spark.lake.stats import prune_files
from delta_spark.lake.xxh import bucket_of

TS = datetime.datetime(2026, 4, 1)

# bucket col = turn_idx (int, NULLABLE, non-key) so NULL keys are legal
SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)
DDL = "conv_id string, turn_idx int, text string, op string, seq long"


def _mk_int_bucketed(spark, path, n_buckets=8):
    t = LakeTable.create(
        spark, path, SCHEMA, ["conv_id"], "turn_idx", n_buckets
    )
    rows = [
        (f"c{i}", None if i == 17 else i * 31 - 200, f"v1 {i}", "INSERT", i + 1)
        for i in range(20)
    ]
    t.merge(spark.createDataFrame(rows, DDL), "w", "b0")
    return t


def test_python_hash_matches_spark_on_int_column(spark):
    vals = [0, 1, -1, 5, 42, -200, 2**31 - 1, -(2**31), 417]
    got = spark.createDataFrame([(v,) for v in vals], "v int").select(
        "v",
        F.xxhash64("v").alias("h"),
        F.pmod(F.xxhash64("v"), F.lit(8)).alias("b"),
    )
    from delta_spark.lake.xxh import spark_xxhash64

    for r in got.collect():
        assert spark_xxhash64(r["v"], coltype="int") == r["h"], r["v"]
        assert bucket_of(r["v"], 8, coltype="int") == r["b"], r["v"]
    # the 8-byte (bigint) hash of the same value is DIFFERENT — the
    # round-3 advisory repro: int 5 buckets to 8, not the long 5's 5
    assert bucket_of(5, 16, coltype="int") == 8
    assert bucket_of(5, 16, coltype="bigint") == 5


def test_lookup_on_int_bucket_column_finds_rows(spark, tmp_path):
    t = _mk_int_bucketed(spark, str(tmp_path / "t"))
    want = sorted(
        t.read().filter(F.col("turn_idx").isin([-200, 389])).collect()
    )
    got = t.lookup([-200, 389])
    assert sorted(got.collect()) == want and len(want) == 2
    # and the driver-side plan touched fewer files than a full read
    assert 0 < len(got.inputFiles()) < len(t.read().inputFiles())


def test_lookup_validates_value_types_against_column(spark, tmp_path):
    t = _mk_int_bucketed(spark, str(tmp_path / "t"))
    with pytest.raises(TypeError):
        t.lookup(["-200"])  # str values against an int column
    with pytest.raises(TypeError):
        t.lookup([-200, "389"])  # mixed
    with pytest.raises(TypeError):
        t.lookup([True])  # bool is not an int key


def test_duck_writer_int_buckets_and_null_keys_match_spark(spark, tmp_path):
    t = _mk_int_bucketed(spark, str(tmp_path / "t"))
    con = duckdb.connect()
    batch = """
        SELECT * FROM (VALUES
            ('c1', CAST(-169 AS INTEGER), 'v2 duck', 'UPDATE', 1000),
            ('n1', CAST(NULL AS INTEGER), 'null-key duck', 'INSERT', 1001),
            ('c9', CAST(79 AS INTEGER), 'v2 duck 9', 'UPDATE', 1002)
        ) AS v(conv_id, turn_idx, text, op, seq)
    """
    assert write_delta_duckdb(t.path, con, batch, "duck-w", "d0") is not None
    t = t.refresh()
    # every duck-stamped _bucket equals Spark's own bucket expression —
    # including the NULL key (pmod(42, 8), never NULL)
    got = t.read(include_system=True)
    mismatch = got.withColumn(
        "_expect",
        F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(8)).cast("long"),
    ).filter(
        F.col("_bucket").isNotNull() & (F.col("_bucket") != F.col("_expect"))
        if "_bucket" in got.columns
        else F.lit(False)
    )
    # _bucket only exists on spanning delta rows; read the delta file raw
    import glob as _g

    delta_paths = [
        f["path"] for f in t.current_snapshot["files"] if f.get("kind") == "delta"
    ]
    assert delta_paths
    raw = spark.read.parquet(*[f"{t.path}/{p}" for p in delta_paths])
    bad = raw.withColumn(
        "_expect", F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(8)).cast("long")
    ).filter(
        (F.col("_bucket").isNull())
        | (F.col("_expect").isNull())
        | (F.col("_bucket") != F.col("_expect"))
    )
    assert bad.count() == 0
    # pruned Spark read by the NULL bucket returns the NULL-key row
    nb = bucket_of(None, 8)
    got = t.read(buckets=[nb]).filter(F.col("conv_id") == "n1").collect()
    assert len(got) == 1 and got[0]["text"] == "null-key duck"
    # pruned DuckDB read agrees bucket-by-bucket with the Spark read
    for b in range(8):
        sp = sorted(
            tuple(r) for r in t.read(buckets=[b]).collect()
        )
        du = sorted(tuple(r) for r in read_duckdb(t.path, con=con, buckets=[b]).fetchall())
        assert du == sp, f"bucket {b}"


def test_duck_pruned_read_across_rebucket_on_int_column(spark, tmp_path):
    """Bucket-spec evolution forces the hash-UDF path in read_duckdb;
    on an int column it must use hashInt (silently-missing-rows bug)."""
    t = _mk_int_bucketed(spark, str(tmp_path / "t"), n_buckets=4)
    assert t.rebucket(8)
    t = t.refresh()
    upd = spark.createDataFrame(
        [("c2", -138, "post-rebucket", "UPDATE", 2000)], DDL
    )
    t.merge(upd, "w", "b1", mode="mor")
    t = t.refresh()
    con = duckdb.connect()
    for b in range(8):
        sp = sorted(tuple(r) for r in t.read(buckets=[b]).collect())
        du = sorted(
            tuple(r) for r in read_duckdb(t.path, con=con, buckets=[b]).fetchall()
        )
        assert du == sp, f"bucket {b}"


def test_unsupported_bucket_type_raises_not_wrong(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("d", T.DoubleType(), True),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["k"], "d", 4)
    t.merge(
        spark.createDataFrame(
            [("a", 1.5, "INSERT", 1)], "k string, d double, op string, seq long"
        ),
        "w",
        "b0",
    )
    con = duckdb.connect()
    with pytest.raises(NotImplementedError):
        write_delta_duckdb(
            t.path,
            con,
            "SELECT 'b' AS k, 2.5 AS d, 'INSERT' AS op, 2 AS seq",
            "duck-w",
            "d0",
        )


def test_per_value_range_union_prunes_tighter_than_envelope():
    """A 2-value lookup spanning the key domain skips every file whose
    bounds straddle neither value; the old single (min, max) envelope
    would have kept them all."""
    fields = [{"id": 1, "name": "k", "type": "string", "nullable": False}]
    files = [
        {"path": f"f{i}", "bucket": 0, "schema_version": 0, "stats": {"1": b}}
        for i, b in enumerate([["a0", "a9"], ["m0", "m9"], ["z0", "z9"]])
    ]
    env = prune_files(files, fields, [1], {"k": ("a5", "z5")})
    assert len(env) == 3  # envelope keeps the middle file
    union = prune_files(files, fields, [1], {"k": [("a5", "a5"), ("z5", "z5")]})
    assert [f["path"] for f in union] == ["f0", "f2"]


def test_lookup_plans_per_value_intervals_end_to_end(spark, tmp_path):
    """MoR deltas whose key ranges are disjoint: a 2-value lookup that
    spans the whole key domain must still skip the middle delta file."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id"], "conv_id", 1
    )
    for tag, batch in enumerate(("a", "m", "z")):
        rows = [(f"{batch}{i}", i, f"{batch}{i}", "INSERT", tag * 100 + i + 1) for i in range(5)]
        t.merge(
            spark.createDataFrame(rows, DDL), "w", f"b{tag}",
            mode="cow" if tag == 0 else "mor",
        )
    t = t.refresh()
    got = t.lookup(["a0", "z0"])
    rows = sorted(r["conv_id"] for r in got.collect())
    assert rows == ["a0", "z0"]
    n_full = len(t.read().inputFiles())
    n_lookup = len(got.inputFiles())
    assert n_lookup < n_full, (n_lookup, n_full)
