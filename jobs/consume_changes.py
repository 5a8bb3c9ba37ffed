#!/usr/bin/env python
"""spark-submit entry point for a DOWNSTREAM consumer of a replicated
table: poll the lake table's snapshots and process each increment
exactly once via ``LakeTable.read_changes`` — the CDC-out half of the
pipeline (the reference's targets are consumed the same way by the
next replicator; Iceberg incremental scan / Delta CDF consumption
pattern).

The consumer's position is ONE integer — the last processed snapshot
id — persisted to a JSON offset file next to the output. Crash-safe
ordering: the increment is written to the sink FIRST (append-only
parquet, partitioned by the snapshot id so a replayed increment
overwrites itself), the offset advances AFTER — a crash between the
two replays one increment into the same partition, never duplicating
rows downstream (idempotent by construction).

Cluster usage:

    spark-submit --py-files delta_spark.zip jobs/consume_changes.py \
        --table /mnt/shared/transcripts --out /mnt/shared/transcripts_cdc \
        --poll-interval 30

One-shot local smoke (process whatever is new, then exit):

    python jobs/consume_changes.py --table /tmp/tbl --out /tmp/cdc --once
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_offset(path: str) -> int | None:
    try:
        with open(path) as f:
            return json.load(f)["last_snapshot_id"]
    except FileNotFoundError:
        return None


def _write_offset(path: str, sid: int) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump({"last_snapshot_id": sid, "updated_ms": int(time.time() * 1000)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _drop_stale_partials(out_dir: str, last: int | None) -> None:
    """Remove sink partitions ABOVE the committed offset: a crash after
    a partial write but before the offset advanced leaves a torn
    ``to_snapshot=N`` dir; the retried increment may target a NEWER
    snapshot id (the table moved on), which covers the same range —
    the torn dir would otherwise double-expose those keys downstream."""
    import shutil

    for d in glob.glob(os.path.join(out_dir, "to_snapshot=*")):
        try:
            sid = int(os.path.basename(d).split("=", 1)[1])
        except ValueError:
            continue
        if last is None or sid > last:
            shutil.rmtree(d, ignore_errors=True)


def consume_once(spark, table_path: str, out_dir: str, offset_file: str) -> int:
    """Process one increment; returns rows written (0 = caught up)."""
    from delta_spark.lake import LakeTable

    t = LakeTable.load(spark, table_path)
    cur = t.metadata["current_snapshot_id"]
    last = _read_offset(offset_file)
    if cur is None or cur == last:
        return 0
    _drop_stale_partials(out_dir, last)
    try:
        changes = t.read_changes(last, cur)
    except ValueError:
        # offset expired: a from-the-beginning read emits only INSERTS
        # (no tombstones for keys deleted since the lost offset), so
        # appending it after the old partitions would leave those keys
        # live downstream forever — a resync must REBOOTSTRAP: drop the
        # whole feed and restart it from the current full state
        _drop_stale_partials(out_dir, None)
        changes = t.read_changes(None, cur)
    n = changes.count()
    if n:
        # sink first, offset after; partition dir keyed by the TO
        # snapshot makes a crash-replay overwrite itself (exactly-once)
        (
            changes.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"to_snapshot={cur}"))
        )
    _write_offset(offset_file, cur)
    return n


def consume_iceberg_once(spark, dest: str, out_dir: str, offset_file: str) -> int:
    """Same exactly-once consumer against a PUBLISHED Iceberg
    destination — the consumer needs NO access to the lake table, only
    the standard Iceberg artifacts. Offset = last consumed metadata
    version. A squash (REPLACE) snapshot inside the range makes the
    file diff meaningless, so the consumer REBOOTSTRAPS: drops the
    feed and restarts from the full state at the current version
    (all-upserts bootstrap partition), exactly like an expired lake
    offset above."""
    from delta_spark.lake.iceberg import (
        read_iceberg_changes_spark,
        read_iceberg_spark,
    )

    with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
        cur = int(f.read().strip())
    last = _read_offset(offset_file)
    if cur == last:
        return 0
    _drop_stale_partials(out_dir, last)
    changes = None
    if last is not None and last < cur:
        try:
            changes = read_iceberg_changes_spark(dest, last, spark, cur)
        except NotImplementedError:
            changes = None  # squash in range → rebootstrap below
        except FileNotFoundError:
            changes = None  # offset version expired → rebootstrap below
    if changes is None:
        from pyspark.sql import functions as F

        _drop_stale_partials(out_dir, None)
        mp = os.path.join(dest, "metadata", f"v{cur}.metadata.json")
        changes = read_iceberg_spark(mp, spark).withColumn(
            "_change_type", F.lit("upsert")
        )
    n = changes.count()
    if n:
        (
            changes.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"to_snapshot={cur}"))
        )
    _write_offset(offset_file, cur)
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=False, default=None,
                    help="lake table root (lake-side feed)")
    ap.add_argument("--iceberg", required=False, default=None, metavar="DEST",
                    help="published Iceberg destination (artifact-only "
                    "feed; no lake access needed)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--offset-file", default=None)
    ap.add_argument("--poll-interval", type=float, default=30.0)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()
    if bool(args.table) == bool(args.iceberg):
        ap.error("exactly one of --table / --iceberg is required")

    from delta_spark.session import build_session

    spark = build_session(app_name="consume_changes")
    os.makedirs(args.out, exist_ok=True)
    offset_file = args.offset_file or os.path.join(args.out, "_consumer_offset.json")
    while True:
        if args.iceberg:
            n = consume_iceberg_once(spark, args.iceberg, args.out, offset_file)
        else:
            n = consume_once(spark, args.table, args.out, offset_file)
        if n:
            print(f"processed {n} change rows -> {args.out}")
        if args.once:
            break
        time.sleep(args.poll_interval)


if __name__ == "__main__":
    main()
