#!/usr/bin/env python
"""spark-submit entry point for lake-table maintenance — the
Iceberg-procedures surface (rewrite_data_files / expire_snapshots /
remove_orphan_files) as one scheduled job:

    spark-submit --py-files delta_spark.zip jobs/maintain_table.py \
        --table /mnt/shared/transcripts \
        --compact-pressure 4 --expire-keep-last 10 --orphan-age-s 3600

Runs, in order:
  1. ``migrate_inline_manifests`` — one-shot legacy-metadata upgrade
     (no-op on current-format tables);
  2. ``compact`` — folds merge-on-read delta files into per-bucket
     base files (sorted by key: tight row-group stats for range
     reads) and migrates pre-rebucket files to the current spec;
  3. ``expire_snapshots`` — bounds metadata history (exactly-once
     markers survive);
  4. ``remove_orphans`` — deletes crash-leaked data files older than
     the age guard.

Each step is independently safe and idempotent (maintenance commits
carry no writer/batch markers), so the job can run beside a live
streaming writer — a lost CommitConflict race simply means the writer
advanced; rerun on the next schedule. Prints one JSON line of what it
did. Pass --dry-run to only report (orphans listed, nothing deleted,
no compaction/expiry commits).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def maintain(
    spark,
    table_path: str,
    compact_pressure: int = 4,
    expire_keep_last: int = 10,
    orphan_age_s: float = 3600.0,
    dry_run: bool = False,
    publish_iceberg_dest: str | None = None,
    branch_age_s: float | None = None,
    sketch_cols: list[str] | None = None,
) -> dict:
    from delta_spark.lake import LakeTable

    t = LakeTable.load(spark, table_path)
    out: dict = {"table": table_path, "dry_run": dry_run}
    if dry_run:
        cur = t.current_snapshot
        files = cur["files"] if cur else []
        out["files"] = len(files)
        out["delta_files"] = sum(1 for f in files if f.get("kind") == "delta")
        out["snapshots"] = len(t.metadata["snapshots"])
        out["orphans"] = len(t.remove_orphans(orphan_age_s, dry_run=True))
        return out
    out["migrated_manifests"] = t.migrate_inline_manifests()
    # publish BEFORE compaction/expiry: the incremental publisher's
    # cursor (the last published lake snapshot) must still be readable,
    # and publishing first keeps the downstream Iceberg view caught up
    # before snapshots are retired
    if publish_iceberg_dest:
        from delta_spark.lake.iceberg import expire_iceberg, publish_iceberg

        out["published_iceberg_metadata"] = publish_iceberg(
            t.refresh(), publish_iceberg_dest
        )
        # destination lifecycle: retire old metadata versions and sweep
        # crashed-publish leftovers (same knobs as the lake's own expiry)
        out["iceberg_expire"] = expire_iceberg(
            publish_iceberg_dest,
            keep_last_versions=max(1, expire_keep_last),
            orphan_age_s=orphan_age_s,
        )
    if compact_pressure >= 0:
        out["compacted_buckets"] = t.compact(max_files_per_bucket=compact_pressure)
    # branch retention BEFORE snapshot expiry, so an abandoned staging
    # branch stops pinning its snapshots in the same run (opt-in: a
    # retention policy, never an implicit side effect)
    if branch_age_s is not None:
        import time as _time

        out["expired_branches"] = t.expire_branches(
            int((_time.time() - branch_age_s) * 1000)
        )
    if expire_keep_last > 0:
        out["expired_snapshots"] = t.expire_snapshots(keep_last=expire_keep_last)
    out["orphans_removed"] = len(t.remove_orphans(orphan_age_s))
    # sketch refresh LAST: compaction above rewrote files (which drop
    # their membership sketches), so the incremental recompute here
    # re-covers exactly the rewritten/new files — the Iceberg
    # compute_table_stats procedure slot in the maintenance bundle
    if sketch_cols:
        out["sketched_files"] = t.refresh().compute_sketches(list(sketch_cols))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--compact-pressure", type=int, default=4,
                    help="max files per bucket before a rewrite (-1 skips compaction)")
    ap.add_argument("--expire-keep-last", type=int, default=10,
                    help="snapshots to retain (0 skips expiry)")
    ap.add_argument("--orphan-age-s", type=float, default=3600.0,
                    help="only delete unreferenced files older than this")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--publish-iceberg", default=None, metavar="DEST",
                    help="incrementally publish the table as a standard "
                    "Iceberg v2 table at DEST (runs before expiry so the "
                    "publish cursor stays readable)")
    ap.add_argument("--branch-age-s", type=float, default=None,
                    help="drop branch refs whose head is older than this "
                    "(Iceberg max-ref-age): abandoned staging rounds stop "
                    "pinning snapshots; off unless set")
    ap.add_argument("--sketch-cols", default=None, metavar="COL[,COL...]",
                    help="incrementally refresh per-file membership "
                    "sketches on these columns after compaction (Iceberg "
                    "compute_table_stats analog); only files missing a "
                    "current sketch are scanned")
    args = ap.parse_args()

    from delta_spark.lake.commit import ObjectStoreCommit, protocol_for

    try:
        proto = protocol_for(args.table)
    except ValueError as e:
        sys.exit(f"error: --table {args.table}: {e}")
    if isinstance(proto, ObjectStoreCommit) and proto.store is None:
        sys.exit(
            f"error: --table {args.table}: metadata commits on {proto.scheme} "
            "need a conditional-put endpoint — set "
            "DELTA_SPARK_OBJECT_STORE_ENDPOINT (contract in "
            "delta_spark/lake/commit.py)"
        )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("delta_spark-maintain")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    print(
        json.dumps(
            maintain(
                spark,
                args.table,
                compact_pressure=args.compact_pressure,
                expire_keep_last=args.expire_keep_last,
                orphan_age_s=args.orphan_age_s,
                dry_run=args.dry_run,
                publish_iceberg_dest=args.publish_iceberg,
                branch_age_s=args.branch_age_s,
                sketch_cols=(
                    [c.strip() for c in args.sketch_cols.split(",") if c.strip()]
                    if args.sketch_cols
                    else None
                ),
            )
        )
    )


if __name__ == "__main__":
    main()
