#!/usr/bin/env python
"""spark-submit entry point for incremental near-dup index maintenance
— the scheduled companion of jobs/maintain_table.py for the dedup
state a training-data pipeline keeps beside its corpus:

    spark-submit --py-files delta_spark.zip jobs/maintain_neardup.py \
        --docs /mnt/shared/documents --root /mnt/shared/documents_nd

Advances the ``NearDupIndexer`` at ``--root`` to the docs table's
current snapshot (signing only the docs changed since the last run and
emitting the pair-delta feed epoch), then bounds the INDEX table's own
metadata (compact + expire — it is a lake table like any other). Safe
to run on any schedule: a caught-up index is a no-op, a crash replays
idempotently (feed epoch dirs overwrite, the index merge carries
(writer-id, batch-id) markers, the cursor moves last), and an expired
cursor triggers the documented full rebootstrap instead of failing.
Prints one JSON line of what it did.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def maintain_neardup(
    spark,
    docs_path: str,
    root: str,
    num_hashes: int = 4,
    band_size: int = 2,
    k: int = 3,
    threshold: float = 0.4,
    compact_pressure: int = 4,
    expire_keep_last: int = 10,
) -> dict:
    from delta_spark.functions.neardup_incremental import NearDupIndexer
    from delta_spark.lake import LakeTable
    from pyspark.sql import functions as F

    docs = LakeTable.load(spark, docs_path)
    ix = NearDupIndexer(
        spark, docs, root,
        num_hashes=num_hashes, band_size=band_size, k=k, threshold=threshold,
    )
    frm = ix._cursor()
    delta = ix.advance()
    by_op = {
        r["op"]: r["n"]
        for r in delta.groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    out: dict = {
        "docs": docs_path,
        "root": root,
        "from_snapshot": frm,
        "to_snapshot": ix._cursor(),
        "adds": by_op.get("add", 0),
        "retracts": by_op.get("retract_doc", 0),
    }
    # the index is a lake table: the same metadata/file hygiene applies
    if compact_pressure >= 0:
        out["index_compacted_buckets"] = ix.index.compact(
            max_files_per_bucket=compact_pressure
        )
    if expire_keep_last > 0:
        out["index_expired_snapshots"] = ix.index.expire_snapshots(
            keep_last=expire_keep_last
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents lake table path")
    ap.add_argument("--root", required=True, help="index + feed root dir")
    ap.add_argument("--num-hashes", type=int, default=4)
    ap.add_argument("--band-size", type=int, default=2)
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--compact-pressure", type=int, default=4,
                    help="index-table files per bucket before a rewrite "
                    "(-1 skips)")
    ap.add_argument("--expire-keep-last", type=int, default=10,
                    help="index-table snapshots to retain (0 skips)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("delta_spark-neardup")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    print(
        json.dumps(
            maintain_neardup(
                spark,
                args.docs,
                args.root,
                num_hashes=args.num_hashes,
                band_size=args.band_size,
                k=args.shingle_k,
                threshold=args.threshold,
                compact_pressure=args.compact_pressure,
                expire_keep_last=args.expire_keep_last,
            )
        )
    )


if __name__ == "__main__":
    main()
