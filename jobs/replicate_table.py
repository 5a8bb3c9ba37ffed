#!/usr/bin/env python
"""spark-submit entry point: continuous lake→lake replication through
the ``deltaspark`` format ALONE — the change-feed streaming source
piped into the exactly-once streaming sink. No engine API touches the
data path; this is the reference's replicator loop (EventReader →
EventConsumer, delta-api/.../EventReader.java:22-51 /
EventConsumer.java:39-76) expressed as one Structured Streaming query
over a registered Spark data source.

Offsets are the SOURCE table's snapshot ids held in the Spark
checkpoint; each micro-batch commits into the destination as one
snapshot whose batch id is the stream epoch — a restart replays no
epoch twice (the sink's (writer-id, batch-id) markers), and a
destination created with different bucketing replicates fine
(replication is logical, the sink re-buckets).

Cluster usage (the north rule's deployment shape). NOTE the
``PYTHONPATH`` export: Spark's driver-side STREAMING planning worker
(python_streaming_source_runner) receives no ``--py-files`` includes
from the JVM, so the streaming source additionally needs the zip on
the inherited PYTHONPATH (on YARN: ``spark.yarn.appMasterEnv
.PYTHONPATH``; on k8s: ``spark.kubernetes.driverEnv.PYTHONPATH``).
Batch format reads/writes need only ``--py-files``:

    PYTHONPATH=delta_spark.zip \
    spark-submit --py-files delta_spark.zip jobs/replicate_table.py \
        --source /mnt/shared/transcripts --dest /mnt/replica/transcripts \
        --checkpoint /mnt/replica/_ck --writer-id replica-east

One-shot local smoke (drain whatever is new, then exit):

    python jobs/replicate_table.py --source /tmp/src --dest /tmp/dst \
        --checkpoint /tmp/ck --once
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def checkpointed_offset(ck: str) -> int | None:
    """The SOURCE offset a restarted stream resumes FROM (None = no
    committed batch / unreadable): the end offset of the last
    COMMITTED batch — an in-flight batch in ``<ck>/offsets`` with no
    matching ``<ck>/commits`` entry replays starting from exactly this
    value, so it (not the newest offsets file) is what source
    retention must still cover. Spark's offset log is text files named
    by batch id: a version header line, one stream-metadata line, then
    one line per source carrying its JSON offset — ours is
    ``{"snapshot_id": N}``."""
    committed = [
        int(os.path.basename(f))
        for f in glob.glob(os.path.join(ck, "commits", "*"))
        if os.path.basename(f).isdigit()
    ]
    if not committed:
        return None
    try:
        with open(os.path.join(ck, "offsets", str(max(committed)))) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        return int(json.loads(lines[-1])["snapshot_id"])
    except (OSError, ValueError, KeyError, IndexError):
        return None


def rebuild_if_offset_expired(source: str, dest: str, ck: str) -> bool:
    """Full-resync preflight (``--on-expired-offset rebuild``): if the
    checkpointed source offset's snapshot has been expired by
    retention, the incremental diff the stream would need is gone —
    and the stream-source ``expired_offset=rebootstrap`` option is NOT
    enough for a replica (re-emitted full state carries no tombstones,
    so keys deleted inside the lost window would live in the replica
    forever). The honest resync is the consume_changes contract: drop
    the derived state — replica AND checkpoint — and rebuild from the
    source's full current state. Returns True if a rebuild happened.

    Only an id the source certainly committed-then-expired triggers
    the rebuild (``snapshot_was_expired``): a checkpoint replayed
    against the WRONG source, or a rolled-back head, must fail loudly
    in the stream rather than silently destroy the replica."""
    from delta_spark.lake.interop import read_metadata, snapshot_was_expired

    sid = checkpointed_offset(ck)
    if sid is None or sid == -1:
        return False
    try:
        meta = read_metadata(os.path.abspath(source))
    except FileNotFoundError:
        return False
    if any(s["id"] == sid for s in meta["snapshots"]):
        return False
    if not snapshot_was_expired(meta, sid):
        return False
    print(
        f"replicate_table: checkpointed offset snapshot {sid} expired "
        f"by retention at {source} — rebuilding the replica from the "
        f"full current state (dest + checkpoint dropped)",
        file=sys.stderr,
    )
    # rmtree must RAISE on partial failure: proceeding with a
    # half-deleted replica (metadata intact, data gone) would let the
    # bootstrap skip table creation and append into a torn state
    for p in (dest, ck):
        if os.path.exists(p):
            shutil.rmtree(p)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="source lake table root")
    ap.add_argument("--dest", required=True, help="destination lake table root")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--writer-id", default="replicator")
    ap.add_argument(
        "--starting",
        default="earliest",
        help="earliest | latest | <snapshot id> (first run only; "
        "afterwards the checkpoint wins)",
    )
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--once",
        action="store_true",
        help="drain available changes (Trigger.AvailableNow) and exit",
    )
    ap.add_argument(
        "--on-expired-offset",
        choices=["fail", "rebuild"],
        default="fail",
        help="checkpointed offset expired by source retention: 'fail' "
        "(default) stops loudly; 'rebuild' DROPS the replica and the "
        "checkpoint and re-replicates from the source's full current "
        "state (the only resync that also clears in-window deletes)",
    )
    args = ap.parse_args()

    if args.on_expired_offset == "rebuild":
        if rebuild_if_offset_expired(args.source, args.dest, args.checkpoint):
            # the checkpoint is gone, so --starting applies again —
            # anything but "earliest" here would leave the rebuilt
            # replica missing the full state the rebuild promised
            # (latest → permanently empty; a pinned id → expired too)
            args.starting = "earliest"

    from pyspark.sql import functions as F

    from delta_spark.lake import LakeTable
    from delta_spark.lake.datasource import register
    from delta_spark.session import build_session

    spark = build_session(cpus=args.cpus, app_name="deltaspark-replicate")
    register(spark)

    if not LakeTable.exists(args.dest):
        # bootstrap the replica with the SOURCE's logical schema/keys
        # (bucketing is the replica's own physical choice — kept equal
        # to the source's here for symmetric scan parallelism)
        src = LakeTable.load(spark, args.source)
        LakeTable.create(
            spark,
            args.dest,
            src.schema,
            key_cols=src.key_cols,
            bucket_col=src.bucket_col,
            num_buckets=src.num_buckets,
        )

    dst_cols = [f.name for f in LakeTable.load(spark, args.dest).schema.fields]
    feed = (
        spark.readStream.format("deltaspark")
        .option("path", args.source)
        .option("feed", "changes")
        .option("starting", args.starting)
        .load()
    )
    # a feed DELETE carries the retracted row's own _seq (its
    # last-known identity), so in the replica the tombstone TIES the
    # live row on _seq — order them explicitly: deletes sort after
    # upserts at equal seq (sort_col below), making the fold
    # deterministic in every reader (engine, format, DuckDB)
    piped = feed.select(
        *dst_cols,
        F.when(F.col("_change_type") == "delete", "DELETE")
        .otherwise("UPSERT")
        .alias("op"),
        F.col("_seq").alias("seq"),
        F.when(F.col("_change_type") == "delete", F.lit(1))
        .otherwise(F.lit(0))
        .alias("_ord"),
    )
    w = (
        piped.writeStream.format("deltaspark")
        .option("path", args.dest)
        .option("writer_id", args.writer_id)
        .option("sort_col", "_ord")
        .option("checkpointLocation", args.checkpoint)
    )
    if args.once:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = w.start()
        q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
