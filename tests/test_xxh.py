"""Pure-Python xxhash64 pinned bit-for-bit against Spark's expression
(the bucket function must agree across engines or pruning corrupts)."""

import random

from pyspark.sql import functions as F

from delta_spark.lake.xxh import bucket_of, spark_xxhash64


def test_matches_spark_on_strings_and_longs(spark):
    rng = random.Random(7)
    strs = [
        "", "a", "conv-0001", "c" * 31, "d" * 32, "e" * 100,
        "naïve-ünïcode-✓", "tab\tnl\n", "0", "-17",
        *[f"conv-{rng.randrange(10**9)}" for _ in range(40)],
    ]
    longs = [
        0, 1, -1, 42, -42, 2**31, -(2**31), 2**62, -(2**63), 2**63 - 1,
        *[rng.randrange(-(2**63), 2**63) for _ in range(40)],
    ]
    sdf = spark.createDataFrame([(s,) for s in strs], "v string").select(
        "v", F.xxhash64("v").alias("h"), F.pmod(F.xxhash64("v"), F.lit(32)).alias("b")
    )
    for r in sdf.collect():
        assert spark_xxhash64(r["v"]) == r["h"], r["v"]
        assert bucket_of(r["v"], 32) == r["b"], r["v"]
    ldf = spark.createDataFrame([(x,) for x in longs], "v long").select(
        "v", F.xxhash64("v").alias("h")
    )
    for r in ldf.collect():
        assert spark_xxhash64(r["v"]) == r["h"], r["v"]
