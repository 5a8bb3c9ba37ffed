#!/usr/bin/env python
"""spark-submit entry point for the bad-deploy drill — snapshot
rollback (Iceberg ``rollback_to_snapshot`` procedure) with the
exactly-once bookkeeping a CDC sink needs:

    spark-submit --py-files delta_spark.zip jobs/rollback_table.py \
        --table /mnt/shared/transcripts --to-tag pre-deploy

Rolls main back to an ancestor snapshot (by id or by tag) as a
METADATA-ONLY commit — no data file is moved — and revokes the
abandoned lineage's (writer-id, batch-id) markers and seq high-water
marks, so re-running the (fixed) pipeline re-applies the rolled-back
batches instead of exactly-once-skipping the repair. Downstream
copies converge through their ordinary cadence (the change feed
across the rollback commit is a state diff that emits retractions);
pass ``--publish-iceberg DEST`` to converge a continuously-published
Iceberg destination in the same run instead of waiting for the next
maintenance tick.

``--dry-run`` previews the blast radius without committing: which
snapshots would be revoked, which (writer, batch) markers re-open,
and where each writer's seq high-water mark would fall back to.
``--catalog ROOT --to-tag T`` runs the FLEET drill instead: every
table in the catalog carrying tag T rolls back to it
(``Catalog.rollback_all``; stamp the checkpoint beforehand with
``Catalog.tag_all`` in the release process).

Checkpoint caveat: the table-side markers are revoked, but a
Structured-Streaming re-run must use a FRESH ``--checkpoint-dir`` (or
batch mode) so the SOURCE re-delivers the rolled-back files — Spark's
own checkpoint remembers which source files each micro-batch already
read, and that ledger is not this table's to rewind. The table-side
exactly-once guard makes the overlap safe either way.

Prints one JSON line either way. Reference analog: resume is always
from the last COMMITTED offset, never a poisoned one
(DBReplicationOffsetStore.java:92-99).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rollback(
    spark,
    table_path: str,
    to_snapshot: int | None = None,
    to_tag: str | None = None,
    dry_run: bool = False,
    publish_iceberg_dest: str | None = None,
) -> dict:
    from delta_spark.lake import LakeTable

    t = LakeTable.load(spark, table_path)
    out: dict = {"table": table_path, "dry_run": dry_run}
    # blast-radius preview shared by dry-run and the real report —
    # the ENGINE's preview (LakeTable.rollback_preview), so the report
    # can never drift from what rollback_to actually revokes (a
    # re-run of an applied drill previews empty and commits nothing)
    out.update(t.rollback_preview(to_snapshot, tag=to_tag))
    if dry_run:
        return out

    out["rolled_back"] = t.rollback_to(to_snapshot, tag=to_tag)
    if publish_iceberg_dest:
        from delta_spark.lake.iceberg import publish_iceberg

        out["published_iceberg_metadata"] = publish_iceberg(
            t.refresh(), publish_iceberg_dest
        )
    return out


def rollback_fleet(spark, catalog_root: str, to_tag: str) -> dict:
    from delta_spark.catalog import Catalog

    cat = Catalog.load_or_create(spark, catalog_root)
    return {
        "catalog": catalog_root,
        "tag": to_tag,
        "rolled_back": cat.rollback_all(to_tag),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    tgt = ap.add_mutually_exclusive_group(required=True)
    tgt.add_argument("--table", default=None)
    tgt.add_argument("--catalog", default=None, metavar="ROOT",
                     help="fleet drill: roll back EVERY catalog table "
                     "carrying --to-tag (Catalog.rollback_all)")
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--to-snapshot", type=int, default=None,
                   help="ancestor snapshot id to roll main back to")
    g.add_argument("--to-tag", default=None,
                   help="tag naming the rollback target (e.g. the "
                   "pre-deploy tag the release process stamped)")
    ap.add_argument("--dry-run", action="store_true",
                    help="preview revoked snapshots / reopened batches "
                    "without committing")
    ap.add_argument("--publish-iceberg", default=None, metavar="DEST",
                    help="after rolling back, immediately converge the "
                    "continuously-published Iceberg copy at DEST (the "
                    "publish is an ordinary incremental snapshot carrying "
                    "the retractions)")
    args = ap.parse_args()
    if args.catalog is not None and args.to_tag is None:
        ap.error("--catalog requires --to-tag (a fleet drill rewinds "
                 "to the tag_all checkpoint, never to one snapshot id)")
    if args.catalog is not None and (args.dry_run or args.publish_iceberg):
        ap.error("--dry-run / --publish-iceberg apply to --table mode; "
                 "preview fleet tables one at a time")

    from delta_spark.lake.commit import ObjectStoreCommit, protocol_for

    root = args.table if args.table is not None else args.catalog
    try:
        proto = protocol_for(root)
    except ValueError as e:
        sys.exit(f"error: {root}: {e}")
    if isinstance(proto, ObjectStoreCommit) and proto.store is None:
        sys.exit(
            f"error: {root}: metadata commits on {proto.scheme} "
            "need a conditional-put endpoint — set "
            "DELTA_SPARK_OBJECT_STORE_ENDPOINT (contract in "
            "delta_spark/lake/commit.py)"
        )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("delta_spark-rollback")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.catalog is not None:
        out = rollback_fleet(spark, args.catalog, args.to_tag)
    else:
        out = rollback(
            spark,
            args.table,
            to_snapshot=args.to_snapshot,
            to_tag=args.to_tag,
            dry_run=args.dry_run,
            publish_iceberg_dest=args.publish_iceberg,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
