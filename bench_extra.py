#!/usr/bin/env python
"""Side benchmark for optimization work (guide §1.4/§1.5): times an
arbitrary subset of the operator queries through the noop sink with
job labels, without touching the frozen bench.py. Also prints the
in-session CPU control so a degraded host window is visible in any
number quoted from here.

Usage: python bench_extra.py [query ...]   (default: the hot set)
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HOT = [
    "minhash_lsh_pairs",
    "media_features",
    "matview_minmax",
    "matview_rollup",
    "conversation_curated",
    "conversation_corpus",
    "corpus_curation_e2e",
    "ann_lsh_topk",
    "lang_id",
    "pii_scrub",
    "tfidf_keywords",
    "clustered_scan",
    "sketch_pruned_scan",
    "stats_pruned_scan",
    "order_priority_revenue",
    "q1_pricing_summary",
]


def main() -> None:
    names = sys.argv[1:] or HOT
    from delta_spark.session import build_session

    spark = build_session(cpus=CPUS, app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from delta_spark import queries as _q
    from delta_spark.queries import ALL_QUERIES

    # warmup: parquet footers + python workers + codegen
    for t in ("events", "documents", "embeddings", "lineitem"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    df = spark.range(1000).toDF("x")
    df.mapInPandas(lambda it: it, "x long").count()
    df.groupBy((F.col("x") % 10)).agg(F.max(F.struct("x"))).count()

    def control() -> float:
        t0 = time.time()
        spark.range(2 * 10**9, numPartitions=CPUS * 4).select(
            F.sum(F.hash(F.col("id")).cast("double"))
        ).collect()
        return round(time.time() - t0, 3)

    c0 = control()
    out: dict[str, float] = {}
    for name in names:
        fn = ALL_QUERIES.get(name) or getattr(_q, name)
        best = None
        for i in range(2):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{i}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}", file=sys.stderr, flush=True)
    c1 = control()
    print(json.dumps({"queries": out, "cpu_control_sec": [c0, c1], "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
