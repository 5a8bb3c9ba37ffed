#!/usr/bin/env python
"""spark-submit entry point for incremental curation maintenance —
the scheduled companion of jobs/maintain_neardup.py for the corpus
verdicts a training-data pipeline keeps beside its documents table:

    spark-submit --py-files delta_spark.zip jobs/maintain_curation.py \
        --docs /mnt/shared/documents --root /mnt/shared/documents_cur

Advances the ``CurationIndexer`` at ``--root`` to the docs table's
current snapshot (re-scrubbing/gating ONLY the docs changed since the
last run into the exactly-once status table), optionally materializes
the curated packed layout, then bounds the STATUS table's own metadata
(compact + expire — it is a lake table like any other). Safe to run on
any schedule: a caught-up index is a no-op, a crash replays
idempotently (the status merge carries (writer-id, batch-id) markers,
the cursor moves last), and an expired cursor triggers the documented
full rebootstrap instead of failing. Prints one JSON line of what it
did.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def maintain_curation(
    spark,
    docs_path: str,
    root: str,
    top_cap: float = 0.25,
    budget: int = 512,
    n_shards: int = 8,
    layout_dest: str | None = None,
    vocab_root: str | None = None,
    compact_pressure: int = 4,
    expire_keep_last: int = 10,
) -> dict:
    from delta_spark.functions.curation_incremental import (
        CurationIndexer,
        VocabIndexer,
    )
    from delta_spark.lake import LakeTable

    docs = LakeTable.load(spark, docs_path)
    # an existing index's sidecar is the source of truth for the
    # verdict-shaping parameters (id columns, text column, top_cap):
    # a scheduled run must adopt them rather than re-assert CLI
    # defaults against, say, a composite-key index the streaming sink
    # bootstrapped — the sidecar freeze would (correctly) refuse that
    sidecar = os.path.join(root, "curation.json")
    id_col = "doc_id"
    text_col = "text"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            rec = json.load(f)
        rid = rec.get("id_col", "doc_id")
        id_col = rid if isinstance(rid, str) else tuple(rid)
        text_col = rec.get("text_col", "text")
        top_cap = rec.get("top_cap", top_cap)
    ix = CurationIndexer(
        spark, docs, root,
        id_col=id_col, text_col=text_col,
        top_cap=top_cap, budget=budget, n_shards=n_shards,
    )
    frm = ix._cursor()
    adv = ix.advance()
    out: dict = {
        "docs": docs_path,
        "root": root,
        "from_snapshot": frm,
        "to_snapshot": ix._cursor(),
        "status_upserts": adv.get("processed"),
        "status_deletes": adv.get("deleted"),
    }
    if layout_dest:
        # the packed layout is the cheap slim-row pass (no text read);
        # one parquet overwrite per run keeps consumers pointed at a
        # consistent snapshot of it
        layout = ix.curated_layout()
        layout.write.mode("overwrite").parquet(layout_dest)
        out["layout_dest"] = layout_dest
        out["layout_rows"] = spark.read.parquet(layout_dest).count()
    if vocab_root:
        # the vocabulary index advances against the same docs table in
        # the same scheduled run (own cursor, own exactly-once markers);
        # an existing sidecar's id/text definition is adopted, same as
        # the curation index above
        vdef = os.path.join(vocab_root, "vocab.json")
        vid, vtext = "doc_id", "text"
        if os.path.exists(vdef):
            with open(vdef) as f:
                vrec = json.load(f)
            vid = tuple(vrec.get("id_cols", ["doc_id"]))
            vtext = vrec.get("text_col", "text")
        vx = VocabIndexer(spark, docs, vocab_root, id_col=vid,
                          text_col=vtext)
        vadv = vx.advance()
        out["vocab_root"] = vocab_root
        out["vocab_tokens_touched"] = vadv.get("tokens_touched")
        if compact_pressure >= 0:
            out["vocab_compacted_buckets"] = vx.vocab.compact(
                max_files_per_bucket=compact_pressure
            )
        if expire_keep_last > 0:
            out["vocab_expired_snapshots"] = vx.vocab.expire_snapshots(
                keep_last=expire_keep_last
            )
    # the status table is a lake table: the same hygiene applies
    if compact_pressure >= 0:
        out["status_compacted_buckets"] = ix.status.compact(
            max_files_per_bucket=compact_pressure
        )
    if expire_keep_last > 0:
        out["status_expired_snapshots"] = ix.status.expire_snapshots(
            keep_last=expire_keep_last
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents lake table path")
    ap.add_argument("--root", required=True, help="status + cursor root dir")
    ap.add_argument("--top-cap", type=float, default=0.25,
                    help="quality-gate top-token-fraction cap (0.5 for "
                    "dialogue-shaped text)")
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--layout-dest", default=None,
                    help="if set, materialize the curated packed layout "
                    "parquet here each run")
    ap.add_argument("--vocab-root", default=None,
                    help="if set, also advance a VocabIndexer (corpus "
                    "token count + doc frequency) at this root against "
                    "the same docs table")
    ap.add_argument("--compact-pressure", type=int, default=4,
                    help="status-table files per bucket before a rewrite "
                    "(-1 skips)")
    ap.add_argument("--expire-keep-last", type=int, default=10,
                    help="status-table snapshots to retain (0 skips)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("delta_spark-curation")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    print(
        json.dumps(
            maintain_curation(
                spark,
                args.docs,
                args.root,
                top_cap=args.top_cap,
                budget=args.budget,
                n_shards=args.shards,
                layout_dest=args.layout_dest,
                vocab_root=args.vocab_root,
                compact_pressure=args.compact_pressure,
                expire_keep_last=args.expire_keep_last,
            )
        )
    )


if __name__ == "__main__":
    main()
