#!/usr/bin/env python
"""spark-submit entry point for one instance of a MULTI-TABLE CDC
pipeline — the fleet analog of jobs/run_pipeline.py.

    zip -r delta_spark.zip delta_spark
    spark-submit --py-files delta_spark.zip jobs/run_fleet.py \
        --changelog /mnt/shared/changelog --catalog /mnt/shared/cat \
        --checkpoint /mnt/shared/ck \
        --tables db1.users,db1.orders,db1.events \
        --instance-id 0 --num-instances 4 --mode stream

Each instance applies only the tables routed to it (round-robin, or an
explicit per-instance assignment via --assignment) with its own writer
id and checkpoint — the reference's per-instance worker containers
(delta-app/.../DeltaWorker.java:157-168, assignTables :594-620). Other
instances run the same command with their own --instance-id.

Downstream hooks mirror the single-table job: --publish-iceberg-root
keeps one standard Iceberg v2 table per routed table in lockstep
(DEST = ROOT/<table>), --matview-specs maintains materialized
aggregates per table, and --branch stages the WHOLE fleet's epochs on
a write-audit-publish branch — with --publish-on-clean-audit, a clean
per-table audit fast-forwards every table atomically-per-table
(Catalog.fast_forward_all); any dirty table leaves ALL mains
untouched, marks the pipeline FAILING, and exits 3. Run the audit
step from ONE instance (e.g. instance 0) after the fleet's epochs
have landed: the publishing instance audits EVERY branch-carrying
table in the catalog (not just its routed subset), since
fast_forward_all publishes fleet-wide.

Storage contract: like run_pipeline.py, the catalog/checkpoint roots
must live on a POSIX filesystem until the object-store conditional-put
adapter is configured (delta_spark/lake/commit.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changelog", required=True)
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--tables", required=True,
                    help="comma-separated configured table set (events "
                    "for unlisted tables are dropped)")
    ap.add_argument("--mode", choices=["batch", "stream"], default="stream")
    ap.add_argument("--pipeline-name", default="multi")
    ap.add_argument("--generation", type=int, default=None)
    ap.add_argument("--instance-id", type=int, default=0)
    ap.add_argument("--num-instances", type=int, default=1)
    ap.add_argument("--assignment", default=None,
                    help="explicit per-instance assignment as JSON "
                    'list-of-lists, e.g. \'[["db1.a"],["db1.b","db1.c"]]\' '
                    "(default: round-robin)")
    ap.add_argument("--table-col", default="tbl")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--create-tables", action="store_true",
                    help="bootstrap missing tables in the catalog with "
                    "the transcript schema (otherwise tables appear via "
                    "CREATE_TABLE events or pre-provisioning)")
    ap.add_argument("--blacklist", default="", help="comma-separated ops")
    ap.add_argument("--sort-key-col", default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--max-bytes-per-trigger", default=None)
    ap.add_argument("--stream-timeout", type=int, default=24 * 3600)
    ap.add_argument("--retry-max-duration", type=float, default=None,
                    help="stream mode: supervised-retry budget in "
                    "seconds (default: forever); checkpoint resume + "
                    "idempotent apply keep exactly-once across restarts")
    ap.add_argument("--publish-iceberg-root", default=None, metavar="ROOT",
                    help="publish every routed table incrementally as a "
                    "standard Iceberg v2 table at ROOT/<table>")
    ap.add_argument("--matview-specs", default="",
                    help="JSON dict: table -> {dest, group_cols, sums} "
                    "or a list of such specs (N views over one table "
                    "share a single change-feed scan)")
    ap.add_argument("--branch", default=None, metavar="NAME",
                    help="write-audit-publish: stage every table's "
                    "epochs on this branch instead of main")
    ap.add_argument("--publish-on-clean-audit", action="store_true",
                    help="with --branch: audit each staged table (key "
                    "uniqueness, non-null keys) and fast-forward the "
                    "whole fleet when every table is clean; any dirty "
                    "table exits 3 with mains untouched")
    ap.add_argument("--skip-self-audit", action="store_true",
                    help="with --branch and WITHOUT "
                    "--publish-on-clean-audit: skip the per-instance "
                    "observability audit of the routed tables (a "
                    "separate publisher instance will audit the whole "
                    "fleet before fast-forwarding — staging instances "
                    "then exit as soon as their epochs land)")
    args = ap.parse_args()

    from delta_spark.lake.commit import ObjectStoreCommit, protocol_for

    for flag, p in (("--catalog", args.catalog), ("--checkpoint", args.checkpoint)):
        try:
            proto = protocol_for(p)
        except ValueError as e:
            sys.exit(f"error: {flag} {p}: {e}")
        if isinstance(proto, ObjectStoreCommit) and proto.store is None:
            sys.exit(
                f"error: {flag} {p}: metadata commits on {proto.scheme} "
                "need a conditional-put endpoint (contract in "
                "delta_spark/lake/commit.py) or a POSIX path"
            )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(
            f"delta_spark-{args.pipeline_name}-i{args.instance_id}"
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from delta_spark.catalog import Catalog
    from delta_spark.multi import MultiPipelineConfig, MultiTablePipeline

    tables = tuple(x for x in args.tables.split(",") if x)
    mv_specs = json.loads(args.matview_specs) if args.matview_specs else {}
    pub_dests = (
        {t: os.path.join(args.publish_iceberg_root, t) for t in tables}
        if args.publish_iceberg_root
        else {}
    )
    cfg = MultiPipelineConfig(
        changelog_path=args.changelog,
        catalog_root=args.catalog,
        checkpoint_dir=args.checkpoint,
        tables=tables,
        pipeline_name=args.pipeline_name,
        generation=args.generation,
        instance_id=args.instance_id,
        num_instances=args.num_instances,
        explicit_assignment=(
            json.loads(args.assignment) if args.assignment else None
        ),
        table_col=args.table_col,
        op_blacklist=tuple(x for x in args.blacklist.split(",") if x),
        max_files_per_trigger=args.max_files_per_trigger,
        max_bytes_per_trigger=args.max_bytes_per_trigger,
        sort_key_col=args.sort_key_col,
        branch=args.branch,
        publish_iceberg_dests=pub_dests,
        matview_specs=mv_specs,
    )
    if args.create_tables:
        from delta_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA

        cat = Catalog.load_or_create(spark, args.catalog)
        for t in tables:
            if not cat.refresh().has_table(t):
                cat.create_table(
                    t, TRANSCRIPT_SCHEMA, KEY_COLS, "conv_id", args.buckets
                )

    p = MultiTablePipeline(spark, cfg)
    if args.mode == "batch":
        res = p.run_batch()
    else:
        # supervised stream: restart from the checkpoint with backoff
        # (reference retry semantics, same loop run_pipeline uses);
        # replayed epochs hit their per-table markers — exactly-once
        import time as _time

        from delta_spark.pipeline import RetryConfig, is_unretryable

        retry = RetryConfig(max_duration_seconds=args.retry_max_duration)
        t0, delay = _time.time(), retry.first_delay_seconds
        while True:
            try:
                p.run_stream_to_completion(timeout=args.stream_timeout)
                break
            except Exception as e:
                if is_unretryable(e):
                    raise
                if (
                    retry.max_duration_seconds is not None
                    and _time.time() - t0 + delay > retry.max_duration_seconds
                ):
                    raise
                _time.sleep(delay)
                delay = min(delay * retry.backoff, retry.max_delay_seconds)
        res = {}
        for d in p.stats:
            for t, sts in d.items():
                res.setdefault(t, []).extend(sts)
    print(json.dumps({
        "instance": args.instance_id,
        "my_tables": p.my_tables,
        "epochs": len(p.stats),
        "rows_in": {
            t: sum(s.rows_in for s in sts) for t, sts in res.items()
        },
    }))

    if args.branch and not (args.skip_self_audit and not args.publish_on_clean_audit):
        cat = p.catalog.refresh()
        audits = {}
        # the publish gate must cover everything fast_forward_all will
        # publish: with --publish-on-clean-audit, audit EVERY catalog
        # table carrying the branch (another instance's dirty staging
        # must hold the whole fleet back — the all-mains-untouched
        # contract); a non-publishing instance only inspects its own
        audit_tables = (
            sorted(cat.list_tables())
            if args.publish_on_clean_audit
            else list(p.my_tables)
        )
        for t in audit_tables:
            h = cat.table(t)
            if args.branch not in h.branches:
                continue
            staged = h.read(branch=args.branch)
            dups = (
                staged.groupBy(*h.key_cols).count().filter("count > 1").count()
            )
            nulls = staged.filter(
                " OR ".join(f"{k} IS NULL" for k in h.key_cols)
            ).count()
            audits[t] = {
                "staged_rows": staged.count(),
                "dup_keys": dups,
                "null_keys": nulls,
            }
        dirty = {t: a for t, a in audits.items()
                 if a["dup_keys"] or a["null_keys"]}
        if dirty:
            from delta_spark.state import StateStore

            StateStore(args.catalog, args.pipeline_name).set_failing(
                f"fleet WAP audit failed: {dirty}"
            )
            print(json.dumps({"audit": audits, "published": False}))
            sys.exit(3)
        published = None
        if args.publish_on_clean_audit:
            published = cat.fast_forward_all(args.branch)
            # downstream reads MAIN: now that main moved, catch the
            # Iceberg copies and matviews up in the same run
            p._downstream(0)
        print(json.dumps({
            "audit": audits,
            "published": published,
        }))


if __name__ == "__main__":
    main()
