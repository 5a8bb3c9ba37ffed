"""Incrementally-maintained near-duplicate index over a CDC-maintained
documents table.

This is where the CDC engine and the training-data dedup stack meet: a
100 TB corpus is not deduplicated once — it is *maintained*. Documents
arrive, get revised, get deleted through the CDC apply path
(reference's target-table contract, EventConsumer.java:39-76), and the
near-dup state must follow WITHOUT rescanning the corpus. The batch
operators in ``neardup.py`` answer "what are the duplicate pairs of
this corpus"; this module answers "what *changed* about the duplicate
pairs since the last commit" at cost O(changed docs), never O(corpus²)
and never a full re-signature.

Design (all DataFrame ops; per-epoch cost scales with the delta):

  * the SIGNATURE INDEX is itself a lake table (keys ``sig_id`` =
    ``doc_id:band``), maintained by the engine's own exactly-once
    seq-guarded MERGE — a crash mid-epoch replays idempotently through
    the same (writer-id, batch-id) markers every other writer uses.
  * each ``advance()`` consumes ``LakeTable.read_changes`` (the CDC-out
    feed, bucket-pruned driver-side), signatures ONLY the changed docs,
    merges the index, and finds new candidates with ONE equi-join of
    the (small) delta signatures against the index on (band, bh) —
    broadcast-able delta side, never all-pairs, never a corpus scan of
    texts (the Jaccard verifier prunes both shingle sides to candidate
    members via semi-joins).
  * the output is a PAIR-DELTA FEED with two ops:
      - ``retract_doc`` — every updated/deleted doc d: all previously
        emitted pairs touching d are dead as of this epoch
      - ``add``         — every verified pair (a, b, jaccard) where a
        or b changed this epoch, scored against the epoch's corpus
    Folding the feed (``live_pairs``) reproduces the batch
    ``ngram_jaccard_dups`` result on the final corpus EXACTLY — the
    invariant the tests and the driver-contract oracle pin.

Why the fold is exact: let t be the last epoch at which either endpoint
of a pair changed. At t both texts equal their final values, the
changed endpoint is in the delta, the partner's final signatures are in
the index, so the pair is (re-)emitted at t iff it is an LSH candidate
AND Jaccard-verified on final texts — the batch condition. Any earlier
add is killed by the endpoint's ``retract_doc`` at t; deletions retract
without re-adding. Feed writes are sink-first/offset-after with
per-epoch overwrite (same crash contract as jobs/consume_changes.py).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake import LakeTable
from .neardup import lsh_candidate_pairs, minhash_signatures, ngram_jaccard_pairs

FEED_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # add | retract_doc
        T.StructField("id_a", T.LongType(), True),
        T.StructField("id_b", T.LongType(), True),
        T.StructField("jaccard", T.DoubleType(), True),
        T.StructField("epoch", T.LongType(), False),  # to-snapshot id
    ]
)

_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("sig_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bh", T.StringType(), False),
    ]
)


class NearDupIndexer:
    """Maintains a MinHash-LSH signature index beside a documents lake
    table and emits the per-commit duplicate-pair delta feed."""

    def __init__(
        self,
        spark: SparkSession,
        docs: LakeTable,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 4,
        band_size: int = 2,
        k: int = 3,
        threshold: float = 0.4,
        num_buckets: int = 16,
        max_bucket_rows: int | None = 1024,
    ):
        self.spark = spark
        self.docs = docs
        self.root = root
        self.id_col, self.text_col = id_col, text_col
        self.num_hashes, self.band_size, self.k = num_hashes, band_size, k
        self.threshold = threshold
        self.max_bucket_rows = max_bucket_rows
        self.n_bands = num_hashes // band_size
        self.index_path = os.path.join(root, "index")
        self.feed_path = os.path.join(root, "feed")
        self.cursor_path = os.path.join(root, "_cursor.json")
        if LakeTable.exists(self.index_path):
            self.index = LakeTable.load(spark, self.index_path)
        else:
            self.index = LakeTable.create(
                spark,
                self.index_path,
                _INDEX_SCHEMA,
                key_cols=["sig_id"],
                num_buckets=num_buckets,
            )

    # ------------------------------------------------------- cursor

    def _cursor(self) -> int | None:
        try:
            with open(self.cursor_path) as f:
                return json.load(f)["last_snapshot"]
        except FileNotFoundError:
            return None

    def _commit_cursor(self, snap_id: int) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_snapshot": snap_id}, f)
        os.replace(tmp, self.cursor_path)

    # ------------------------------------------------------ banding

    def _band_rows(self, docs_df: DataFrame) -> DataFrame:
        """(doc_id, band, bh) rows for every doc in ``docs_df`` — the
        same banding ``lsh_candidate_pairs`` uses, reified so it can be
        PERSISTED as index rows and equi-joined incrementally."""
        sigs = minhash_signatures(
            docs_df, self.id_col, self.text_col,
            num_hashes=self.num_hashes, k=self.k,
        )
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        ":",
                        *[
                            F.col(f"mh{b * self.band_size + j}")
                            for j in range(self.band_size)
                        ],
                    ).alias("bh"),
                )
                for b in range(self.n_bands)
            ]
        )
        return sigs.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            F.explode(bands).alias("b"),
        ).select(
            "doc_id",
            F.col("b.band").cast("int").alias("band"),
            F.col("b.bh").alias("bh"),
        )

    # ------------------------------------------------------ advance

    def advance(self, to_snapshot_id: int | None = None) -> DataFrame:
        """Process the docs-table commits in (cursor, to] and return
        this epoch's feed delta. Crash-safe: the index merge is
        idempotent by (writer-id, batch-id), the feed epoch dir is
        overwritten whole on replay, and the cursor moves LAST."""
        cur = self.docs.current_snapshot
        to_id = cur["id"] if to_snapshot_id is None and cur else to_snapshot_id
        frm = self._cursor()
        if to_id is None or (frm is not None and to_id <= frm):
            return self.spark.createDataFrame([], FEED_SCHEMA)

        try:
            ch = self.docs.read_changes(frm, to_id)
            bcast_delta = True
            changed = ch.filter(
                F.col("_change_type").isin("insert", "update")
            ).select(
                F.col(self.id_col).cast("long").alias(self.id_col),
                self.text_col,
            )
            deleted = ch.filter(F.col("_change_type") == "delete").select(
                F.col(self.id_col).cast("long").alias("doc_id")
            )
        except ValueError:
            # cursor snapshot EXPIRED (the docs table's retention ran
            # ahead of the index — same failure mode as an expired
            # consumer offset, jobs/consume_changes.py): REBOOTSTRAP by
            # treating every live doc as changed and every indexed doc
            # that is no longer live as deleted. Retractions for that
            # union kill every previously emitted pair, the re-adds
            # restore the current ones — the fold invariant survives
            # the resync. O(corpus) once, by construction.
            import logging

            logging.getLogger("delta_spark.neardup").warning(
                "neardup index cursor %s expired on %s — rebootstrapping",
                frm, self.docs.path,
            )
            bcast_delta = False  # the "delta" IS the corpus: no b'cast
            state0 = self.docs.read(snapshot_id=to_id)
            changed = state0.select(
                F.col(self.id_col).cast("long").alias(self.id_col),
                self.text_col,
            )
            deleted = (
                self.index.read()
                .select("doc_id")
                .distinct()
                .join(
                    changed.select(
                        F.col(self.id_col).cast("long").alias("doc_id")
                    ),
                    "doc_id",
                    "left_anti",
                )
            )

        # pre-merge index snapshot, resolved DETERMINISTICALLY so a
        # crash replay sees the same pre/post diff (the hot-bucket
        # lifecycle repair below depends on it): if this epoch's index
        # merge already committed (crash between merge and feed/cursor
        # — the documented window), the live head already CONTAINS it
        # and a head-vs-head diff would silently skip the repair. The
        # applying snapshot is found by its exactly-once marker and its
        # PARENT is the pre state; a folded marker whose snapshot was
        # expired meanwhile yields "unknown", which the repair treats
        # as "repair every hot bucket" (bounded, conservative).
        index_bid = f"{frm}->{to_id}"
        applied_snap = next(
            (
                s
                for s in self.index.metadata.get("snapshots", [])
                if s.get("summary", {}).get("writer-id") == "neardup-index"
                and s.get("summary", {}).get("batch-id") == index_bid
                and not s.get("rolled_back")
            ),
            None,
        )
        if applied_snap is not None:
            pre_sid, pre_unknown = applied_snap.get("parent"), False
        elif self.index.is_applied("neardup-index", index_bid):
            pre_sid, pre_unknown = None, True  # marker outlived snapshot
        else:
            pre_cur = self.index.current_snapshot
            pre_sid, pre_unknown = (
                pre_cur["id"] if pre_cur else None
            ), False

        # 1) index maintenance — O(changed docs): upsert changed docs'
        #    band rows, tombstone deleted docs' (every band enumerated
        #    declaratively, no driver-side id list)
        delta_sigs = self._band_rows(changed)
        band_lits = F.array(*[F.lit(b) for b in range(self.n_bands)])
        ups = delta_sigs.select(
            F.concat_ws(":", "doc_id", "band").alias("sig_id"),
            "doc_id", "band", "bh",
            F.lit("UPSERT").alias("op"),
        )
        # a changed doc whose new text yields NO shingles (nulled /
        # emptied by an update) produces no upsert rows — its stale
        # signatures must be tombstoned like a delete's
        unsigned = changed.select(
            F.col(self.id_col).cast("long").alias("doc_id")
        ).join(delta_sigs.select("doc_id").distinct(), "doc_id", "left_anti")
        dels = (
            deleted.unionByName(unsigned)
            .select("doc_id", F.explode(band_lits).alias("band"))
            .select(
                F.concat_ws(":", "doc_id", "band").alias("sig_id"),
                "doc_id",
                F.col("band").cast("int").alias("band"),
                F.lit(None).cast("string").alias("bh"),
                F.lit("DELETE").alias("op"),
            )
        )
        self.index.merge(
            ups.unionByName(dels).withColumn("seq", F.lit(to_id).cast("long")),
            writer_id="neardup-index",
            batch_id=f"{frm}->{to_id}",
            mode="auto",
        )

        # 2) candidate pairs touching the delta: small delta side vs
        #    the index — one equi-join on (band, bh), a<b normalized.
        #    The index read is the epoch's big scan (O(live docs ×
        #    bands) rows of a few bytes); the join output is bounded by
        #    LSH collisions, never |corpus|².
        #    Hot-band cap (mirrors lsh_candidate_pairs): an index
        #    bucket over ``max_bucket_rows`` would fan every delta doc
        #    out to the whole bucket (quadratic in degenerate
        #    boilerplate mass), so over-cap buckets collapse to their
        #    min-doc_id representative — a delta doc joins the rep, the
        #    verifier checks (delta, rep), and connectivity through the
        #    rep keeps clustering semantics. Bucket sizes are O(buckets)
        #    rows, broadcast back, so the candidate join never shuffles
        #    the index (the small/reps split costs extra scans of the
        #    slim index table; the revive semi-join below may shuffle
        #    it on a repair epoch).
        #
        #    Lifecycle repair: a star is only equal to the batch answer
        #    while its center is stable, so any bucket whose HOT status
        #    flipped (crossed the cap either way) or whose rep (min
        #    doc_id) changed this epoch — center deleted, smaller id
        #    arrived, mass deletion shrank it under the cap — gets its
        #    CURRENT members fully REVIVED: retracted and re-verified
        #    through the same capped candidate join, O(bucket) once per
        #    transition, never per epoch. With that, fold == batch
        #    (same cap) holds across the whole lifecycle for
        #    single-signature degenerate mass; mixed-signature over-cap
        #    buckets keep bounded connectivity-preserving candidates on
        #    both sides but not pairwise equality (the persisted index
        #    carries no full signatures to split them by).
        idx = self.index.read()
        revived_ids = None
        if self.max_bucket_rows:
            cap = self.max_bucket_rows
            idx_full = idx
            stats = idx_full.groupBy("band", "bh").agg(
                F.count("*").alias("n_post"), F.min("doc_id").alias("rep_post")
            )
            hot = F.broadcast(
                stats.filter(F.col("n_post") > cap).select("band", "bh")
            )
            idx_small = idx_full.join(hot, ["band", "bh"], "left_anti")
            idx_reps = (
                idx_full.join(hot, ["band", "bh"], "left_semi")
                .groupBy("band", "bh")
                .agg(F.min("doc_id").alias("doc_id"))
            )
            idx = idx_small.select("doc_id", "band", "bh").unionByName(
                idx_reps.select("doc_id", "band", "bh")
            )
            if not pre_unknown and pre_sid is not None:
                try:
                    pre = self.index.read(snapshot_id=pre_sid)
                except ValueError:
                    pre, pre_unknown = None, True  # parent expired
            else:
                pre = None
            if pre_unknown:
                # no reproducible pre state: conservatively re-center
                # every hot bucket (bounded by the hot mass; only
                # reachable on a crash replay whose applying snapshot
                # was ALSO expired before the retry)
                repair = stats.filter(F.col("n_post") > cap).select(
                    "band", "bh"
                )
            else:
                if pre is not None:
                    pre_stats = pre.groupBy("band", "bh").agg(
                        F.count("*").alias("n_pre"),
                        F.min("doc_id").alias("rep_pre"),
                    )
                    j = stats.join(
                        pre_stats, ["band", "bh"], "full_outer"
                    ).fillna({"n_post": 0, "n_pre": 0})
                else:
                    j = stats.withColumn("n_pre", F.lit(0)).withColumn(
                        "rep_pre", F.lit(None).cast("long")
                    )
                was_hot, is_hot = F.col("n_pre") > cap, F.col("n_post") > cap
                repair = j.filter(
                    (was_hot != is_hot)
                    | (
                        is_hot
                        & (
                            F.col("rep_pre").isNull()
                            | (F.col("rep_pre") != F.col("rep_post"))
                        )
                    )
                ).select("band", "bh")
            revived_ids = (
                idx_full.join(F.broadcast(repair), ["band", "bh"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            revive_bands = idx_full.join(
                revived_ids, "doc_id", "left_semi"
            ).select("doc_id", "band", "bh")
            delta_sigs = (
                delta_sigs.select("doc_id", "band", "bh")
                .unionByName(revive_bands)
                .distinct()
            )
        d = delta_sigs.alias("d")
        if bcast_delta and self.max_bucket_rows is None:
            # only FORCE the broadcast when no repair can widen the
            # delta: a lifecycle-repair epoch unions the revived hot
            # bucket's band rows into d (O(bucket x bands)), and a
            # forced broadcast of a degenerate million-doc bucket is
            # exactly the OOM the cap exists to avoid. With the cap on,
            # AQE still broadcasts small deltas by measured size.
            d = F.broadcast(d)
        cand = (
            d.join(
                idx.alias("i"),
                (F.col("d.band") == F.col("i.band"))
                & (F.col("d.bh") == F.col("i.bh"))
                & (F.col("d.doc_id") != F.col("i.doc_id")),
            )
            .select(
                F.least("d.doc_id", "i.doc_id").alias("id_a"),
                F.greatest("d.doc_id", "i.doc_id").alias("id_b"),
            )
            .distinct()
        )

        # 3) exact verification on this epoch's corpus state (the
        #    verifier semi-join-prunes both shingle sides to candidate
        #    members — the corpus text scan never shingles unrelated
        #    docs)
        state = self.docs.read(snapshot_id=to_id)
        verified = ngram_jaccard_pairs(
            state, self.id_col, self.text_col,
            k=self.k, threshold=self.threshold, candidates=cand,
        )

        # 4) the feed delta: retract everything touching changed or
        #    deleted docs, then (re-)add the verified current pairs
        touched = changed.select(
            F.col(self.id_col).cast("long").alias("id_a")
        ).unionByName(deleted.select(F.col("doc_id").alias("id_a")))
        if revived_ids is not None:
            # hot-bucket lifecycle repair: revived docs are retracted and
            # re-added in the same epoch (the fold keeps same-epoch adds)
            touched = touched.unionByName(
                revived_ids.select(F.col("doc_id").alias("id_a"))
            )
        retracts = touched.distinct().select(
            F.lit("retract_doc").alias("op"),
            "id_a",
            F.lit(None).cast("long").alias("id_b"),
            F.lit(None).cast("double").alias("jaccard"),
            F.lit(to_id).cast("long").alias("epoch"),
        )
        adds = verified.select(
            F.lit("add").alias("op"),
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.col("jaccard").cast("double"),
            F.lit(to_id).cast("long").alias("epoch"),
        )
        delta = retracts.unionByName(adds)

        # 5) sink-first, cursor-after; replays overwrite their own
        #    epoch dir (jobs/consume_changes.py crash contract)
        # dir name deliberately NOT key=value shaped: the epoch column
        # is stored in the data, and partition-style dirs would make
        # Spark infer a duplicate partition column on multi-dir reads
        epoch_dir = os.path.join(self.feed_path, f"epoch-{to_id}")
        if os.path.exists(epoch_dir):
            shutil.rmtree(epoch_dir)
        delta.write.mode("overwrite").parquet(epoch_dir)
        self._commit_cursor(to_id)
        return self.spark.read.schema(FEED_SCHEMA).parquet(epoch_dir)

    # --------------------------------------------------------- fold

    def feed(self) -> DataFrame:
        dirs = [
            os.path.join(self.feed_path, d)
            for d in sorted(os.listdir(self.feed_path))
            if d.startswith("epoch-")
        ] if os.path.isdir(self.feed_path) else []
        if not dirs:
            return self.spark.createDataFrame([], FEED_SCHEMA)
        return self.spark.read.schema(FEED_SCHEMA).parquet(*dirs)

    def live_pairs(self) -> DataFrame:
        """Fold the feed: an ``add`` at epoch e is live iff neither
        endpoint has a ``retract_doc`` at an epoch > e. Two joins
        against the (tiny) retract set — the fold never touches
        document text. Equals batch ``ngram_jaccard_pairs`` on the
        current corpus (the invariant tests pin)."""
        f = self.feed()
        adds = f.filter(F.col("op") == "add").select(
            "id_a", "id_b", "jaccard", "epoch"
        )
        retr = (
            f.filter(F.col("op") == "retract_doc")
            .groupBy(F.col("id_a").alias("rid"))
            .agg(F.max("epoch").alias("r_epoch"))
        )
        ra = retr.select(F.col("rid").alias("id_a"), F.col("r_epoch").alias("ra"))
        rb = retr.select(F.col("rid").alias("id_b"), F.col("r_epoch").alias("rb"))
        return (
            adds.join(ra, "id_a", "left")
            .join(rb, "id_b", "left")
            .filter(
                (F.coalesce(F.col("ra"), F.lit(-1)) <= F.col("epoch"))
                & (F.coalesce(F.col("rb"), F.lit(-1)) <= F.col("epoch"))
            )
            .select("id_a", "id_b", "jaccard")
            .distinct()
        )
