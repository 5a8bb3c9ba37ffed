#!/usr/bin/env python
"""spark-submit entry point for the CDC pipeline.

Cluster usage (the north-rule deployment shape):

    zip -r delta_spark.zip delta_spark
    spark-submit --py-files delta_spark.zip jobs/run_pipeline.py \
        --changelog /mnt/shared/changelog --table /mnt/shared/transcripts \
        --checkpoint /mnt/shared/ck --mode stream --buckets 4096

The table/checkpoint roots must live on a POSIX filesystem the driver
can reach (local disk, NFS, Lustre): metadata commits rely on an
atomic version claim (os.link). Object-store roots (s3://, gs://, …)
are REFUSED at startup until the conditional-put adapter exists — the
contract is documented in delta_spark/lake/commit.py.

Local smoke:

    python jobs/run_pipeline.py --changelog /dev/shm/log \
        --table /tmp/tbl --checkpoint /tmp/ck --mode batch

The session is created WITHOUT a hardcoded master so spark-submit's
--master/--deploy-mode and executor conf apply; local runs fall back to
local[*].
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
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", choices=["batch", "stream", "stream-continuous"], default="stream")
    ap.add_argument("--pipeline-name", default="transcripts")
    ap.add_argument("--generation", type=int, default=None)
    ap.add_argument("--instance-id", type=int, default=0)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--salt-buckets", type=int, default=0)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--max-bytes-per-trigger", default=None, help='e.g. "128m"')
    ap.add_argument("--mor-fanout", action="store_true",
                    help="streaming MoR deltas as per-bucket files "
                    "(Iceberg fanout writer: full encode parallelism, "
                    "bucket-pruned delta reads, per-bucket compaction "
                    "pressure — the sustained-throughput shape); "
                    "default = spanning files (cheapest trickle)")
    ap.add_argument("--blacklist", default="", help="comma-separated ops to drop")
    ap.add_argument("--sort-key-col", default=None,
                    help="UN_ORDERED-source tiebreak column (e.g. ingest_ts)")
    ap.add_argument("--columns", default="",
                    help="comma-separated column whitelist (empty = all)")
    ap.add_argument("--retry-max-duration", type=float, default=None,
                    help="supervised-retry budget in seconds (default: forever)")
    ap.add_argument("--stats-dir", default=None,
                    help="persist per-micro-batch progress JSONL here")
    ap.add_argument("--publish-iceberg", default=None, metavar="DEST",
                    help="after the run (and each stream-continuous "
                    "attempt), publish the applied table incrementally "
                    "as a standard Iceberg v2 table at DEST")
    ap.add_argument("--matview", default=None, metavar="DEST",
                    help="maintain a materialized GROUP BY aggregate at "
                    "DEST in lockstep with the sink (per micro-batch in "
                    "stream modes, once after a batch run): folds each "
                    "commit's pre-image change feed at O(changed keys)")
    ap.add_argument("--matview-group-cols", default="role",
                    help="comma-separated view group columns")
    ap.add_argument("--matview-sums", default="",
                    help='JSON dict of measure -> SQL expr, e.g. '
                    '\'{"sum_chars": "length(text)"}\' (count(*) is '
                    "always maintained)")
    ap.add_argument("--matview-mins", default="",
                    help="JSON dict of measure -> SQL expr maintained "
                    "as MIN (extremal retraction recomputes only the "
                    "affected groups)")
    ap.add_argument("--matview-maxs", default="",
                    help="JSON dict of measure -> SQL expr maintained "
                    "as MAX")
    ap.add_argument("--branch", default=None, metavar="NAME",
                    help="write-audit-publish: stage every epoch on this "
                    "branch instead of main; after the run the built-in "
                    "audit (key uniqueness, non-null keys) runs against "
                    "the staged head and its verdict is printed")
    ap.add_argument("--publish-on-clean-audit", action="store_true",
                    help="with --branch: fast-forward main when the "
                    "audit passes (a failed audit leaves main untouched, "
                    "marks the pipeline FAILING, and exits 3)")
    ap.add_argument("--curation-root", default=None, metavar="ROOT",
                    help="maintain turn-level curation verdicts (scrub "
                    "fingerprint, quality gate, split, pack weight) at "
                    "ROOT in lockstep with the sink — per micro-batch in "
                    "stream modes, batch catch-up otherwise; the packed "
                    "training layout derives from the status rows")
    ap.add_argument("--curation-top-cap", type=float, default=0.5,
                    help="quality-gate top-token cap for the curation "
                    "index (0.5 default: dialogue rows repeat role "
                    "markers by construction)")
    ap.add_argument("--conv-curation-root", default=None, metavar="ROOT",
                    help="maintain the CONVERSATION-level curated corpus "
                    "at ROOT (one packed document per conversation; "
                    "touched conversations re-assemble from a pinned "
                    "pruned read) — per micro-batch in stream modes, "
                    "batch catch-up otherwise")
    ap.add_argument("--vocab-root", default=None, metavar="ROOT",
                    help="maintain a corpus vocabulary index (per-token "
                    "count + row frequency, retraction-folded from each "
                    "micro-batch's pre-image change feed) at ROOT — in "
                    "stream modes per micro-batch, in batch mode as a "
                    "catch-up after the run")
    ap.add_argument("--scrub-cols", default="", metavar="COLS",
                    help="comma-separated text columns to PII-scrub at "
                    "ingest (emails/phones/IPs/SSNs redacted by the "
                    "curation library's regexp chain INSIDE the "
                    "transform stage — whole-stage codegen, no UDF — "
                    "so sensitive spans never land in the lake)")
    ap.add_argument("--tag-before-run", default=None, metavar="TAG",
                    help="stamp TAG at the table's current head before "
                    "applying anything — the pre-deploy checkpoint "
                    "jobs/rollback_table.py rewinds to if this run turns "
                    "out to be the bad deploy (re-running the same "
                    "generation moves the tag forward)")
    args = ap.parse_args()

    # fail FAST on storage schemes the commit protocol can't make
    # atomic (object stores need the conditional-put adapter documented
    # in delta_spark/lake/commit.py) — never degrade exactly-once
    # silently; data/manifest writes are already object-store-safe,
    # only the version claim needs the stronger primitive
    from delta_spark.lake.commit import ObjectStoreCommit, protocol_for

    for flag, p in (("--table", args.table), ("--checkpoint", args.checkpoint)):
        try:
            proto = protocol_for(p)
        except ValueError as e:
            sys.exit(f"error: {flag} {p}: {e}")
        if isinstance(proto, ObjectStoreCommit) and proto.store is None:
            sys.exit(
                f"error: {flag} {p}: metadata commits on {proto.scheme} need "
                "a conditional-put endpoint — set "
                "DELTA_SPARK_OBJECT_STORE_ENDPOINT to an S3-compatible "
                "store honoring PUT + If-None-Match:* (contract in "
                "delta_spark/lake/commit.py), or point the table at a "
                "POSIX path (local disk or a shared NFS mount)"
            )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"delta_spark-{args.pipeline_name}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from delta_spark.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(
        changelog_path=args.changelog,
        table_path=args.table,
        checkpoint_dir=args.checkpoint,
        pipeline_name=args.pipeline_name,
        generation=args.generation,
        instance_id=args.instance_id,
        num_buckets=args.buckets,
        salt_buckets=args.salt_buckets,
        op_blacklist=tuple(x for x in args.blacklist.split(",") if x),
        max_files_per_trigger=args.max_files_per_trigger,
        max_bytes_per_trigger=args.max_bytes_per_trigger,
        mor_fanout=args.mor_fanout,
        sort_key_col=args.sort_key_col,
        column_whitelist=tuple(x for x in args.columns.split(",") if x) or None,
        branch=args.branch,
        matview_dest=args.matview,
        matview_group_cols=tuple(
            x for x in args.matview_group_cols.split(",") if x
        ),
        matview_sums=json.loads(args.matview_sums) if args.matview_sums else None,
        matview_mins=json.loads(args.matview_mins) if args.matview_mins else None,
        matview_maxs=json.loads(args.matview_maxs) if args.matview_maxs else None,
        vocab_root=args.vocab_root,
        curation_root=args.curation_root,
        curation_top_cap=args.curation_top_cap,
        conv_curation_root=args.conv_curation_root,
    )
    if args.stats_dir:
        from delta_spark.progress import attach_progress_logger

        attach_progress_logger(spark, stats_dir=args.stats_dir)
    def _audit_publish() -> None:
        """WAP gate: audit the staged branch head; publish only when
        clean (and asked to). Main is never touched by a failed audit —
        readers keep the last good state, the pipeline is marked
        FAILING, and the exit code tells the scheduler."""
        if not args.branch:
            return
        from delta_spark.lake import LakeTable

        t = LakeTable.load(spark, args.table)
        staged = t.read(branch=args.branch)
        dups = (
            staged.groupBy(*t.key_cols).count().filter("count > 1").count()
        )
        nulls = staged.filter(
            " OR ".join(f"{k} IS NULL" for k in t.key_cols)
        ).count()
        audit = {
            "branch": args.branch,
            "staged_rows": staged.count(),
            "dup_keys": dups,
            "null_keys": nulls,
        }
        if dups or nulls:
            from delta_spark.state import StateStore

            StateStore(args.table, args.pipeline_name).set_failing(
                f"WAP audit failed: {audit}"
            )
            print(json.dumps({"audit": audit, "published": False}))
            sys.exit(3)
        if args.publish_on_clean_audit:
            audit["published_snapshot"] = t.fast_forward(args.branch)
        print(json.dumps(
            {"audit": audit, "published": args.publish_on_clean_audit}
        ))

    def _publish() -> None:
        if not args.publish_iceberg:
            return
        from delta_spark.lake import LakeTable
        from delta_spark.lake.iceberg import publish_iceberg

        mp = publish_iceberg(
            LakeTable.load(spark, args.table), args.publish_iceberg
        )
        print(json.dumps({"published_iceberg_metadata": mp}))

    def _matview() -> None:
        """Batch mode has no sink hook, so the view advances here; in
        stream modes the per-micro-batch hook already folded every
        epoch and this is an idempotent no-op catch-up."""
        if not args.matview:
            return
        from delta_spark.lake import LakeTable, MaterializedAggregate

        epoch = MaterializedAggregate(
            spark,
            LakeTable.load(spark, args.table),
            args.matview,
            list(cfg.matview_group_cols),
            dict(cfg.matview_sums or {}),
            mins=dict(cfg.matview_mins or {}),
            maxs=dict(cfg.matview_maxs or {}),
        ).advance()
        print(json.dumps({"matview": args.matview, "matview_epoch": epoch}))

    def _curation() -> None:
        """Batch-mode catch-up for --curation-root (stream modes fold
        per micro-batch)."""
        if not args.curation_root:
            return
        from delta_spark.functions.curation_incremental import (
            CurationIndexer,
        )
        from delta_spark.lake import LakeTable

        t = LakeTable.load(spark, args.table)
        adv = CurationIndexer(
            spark, t, args.curation_root,
            id_col=tuple(t.key_cols), top_cap=args.curation_top_cap,
        ).advance()
        print(json.dumps({"curation_root": args.curation_root,
                          "curation_processed": adv.get("processed"),
                          "curation_deleted": adv.get("deleted")}))

    def _conv_curation() -> None:
        """Batch-mode catch-up for --conv-curation-root."""
        if not args.conv_curation_root:
            return
        from delta_spark.functions.curation_incremental import (
            ConversationCurationIndexer,
        )
        from delta_spark.lake import LakeTable

        t = LakeTable.load(spark, args.table)
        adv = ConversationCurationIndexer(
            spark, t, args.conv_curation_root,
            top_cap=args.curation_top_cap,
        ).advance()
        print(json.dumps({"conv_curation_root": args.conv_curation_root,
                          "conv_curation_convs": adv.get("convs"),
                          "conv_curation_deleted": adv.get("deleted")}))

    def _vocab() -> None:
        """Same contract as _matview: batch mode catches the vocabulary
        up here; stream modes already folded it per micro-batch."""
        if not args.vocab_root:
            return
        from delta_spark.functions.curation_incremental import VocabIndexer
        from delta_spark.lake import LakeTable

        t = LakeTable.load(spark, args.table)
        adv = VocabIndexer(
            spark, t, args.vocab_root, id_col=tuple(t.key_cols)
        ).advance()
        print(json.dumps({"vocab_root": args.vocab_root,
                          "vocab_tokens_touched": adv.get("tokens_touched")}))

    if args.tag_before_run:
        from delta_spark.lake import LakeTable

        # first run bootstraps the table — nothing to pin yet
        if LakeTable.exists(args.table):
            t0 = LakeTable.load(spark, args.table)
            if t0.metadata["current_snapshot_id"] is not None:
                sid = t0.tag(args.tag_before_run, replace=True)
                print(json.dumps({"tagged": args.tag_before_run,
                                  "snapshot_id": sid}))

    transforms = None
    if args.scrub_cols:
        from delta_spark.transform import ScrubPII, chain

        transforms = chain(
            [ScrubPII(c.strip()) for c in args.scrub_cols.split(",")
             if c.strip()]
        )
    p = Pipeline(spark, cfg, transforms=transforms)
    if args.mode == "batch":
        st = p.run_batch()
        print(json.dumps({"rows_in": st.rows_in, "upserts": st.upserts,
                          "deletes": st.deletes, "ddls": st.ddls_applied,
                          "wall_ms": st.wall_ms}))
        _audit_publish()
        _publish()
        _matview()
        _vocab()
        _curation()
        _conv_curation()
    elif args.mode == "stream":
        # in-engine supervised retry (reference RetryConfig semantics:
        # backoff 1->120 s, optional max duration, DeltaFailureException
        # fails immediately) — no external scheduler needed
        from delta_spark.pipeline import RetryConfig

        attempts = p.run_supervised(
            RetryConfig(max_duration_seconds=args.retry_max_duration),
            attempt_timeout=24 * 3600,
        )
        print(json.dumps({"batches": len(p.stats), "attempts": attempts,
                          "rows_in": sum(s.rows_in for s in p.stats)}))
        _audit_publish()
        _publish()
        _matview()
        _vocab()
        _curation()
        _conv_curation()
    else:  # stream-continuous: tail forever under the same supervisor
        from delta_spark.pipeline import RetryConfig, is_unretryable

        retry = RetryConfig(max_duration_seconds=args.retry_max_duration)
        import time as _time

        t0, delay = _time.time(), retry.first_delay_seconds
        while True:
            try:
                q = p.run_stream(available_now=False)
                q.awaitTermination()
                _audit_publish()
                _publish()
                _matview()
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


if __name__ == "__main__":
    main()
