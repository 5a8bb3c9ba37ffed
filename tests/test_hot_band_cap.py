"""Hot-band cap in LSH candidate generation (round-4 VERDICT "what's
wrong" #1): a degenerate (band, hash) bucket — mass-identical
boilerplate/empty texts — must never cross-join quadratically. Over-cap
buckets collapse to stars (per-signature, then per-bucket) that keep
the connected components identical to the clique's, and the
incremental indexer repairs star centers across the bucket lifecycle
(center deletion, smaller-id arrival, cap transitions) so the
fold-equals-batch invariant survives in degenerate corpora too."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_spark.functions.neardup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from delta_spark.functions.neardup_incremental import NearDupIndexer
from delta_spark.lake import LakeTable

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

CAP = 8


def _pairs_set(df):
    p = df.toPandas()
    return {(int(a), int(b)) for a, b in zip(p["id_a"], p["id_b"])}


def test_cap_no_op_on_healthy_corpus(spark):
    """Buckets at/under the cap keep the exact unguarded semantics —
    the DuckDB driver oracle's contract."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=4)
    capped = lsh_candidate_pairs(sigs, "doc_id", num_hashes=4, band_size=2)
    raw = lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=4, band_size=2, max_bucket_rows=None
    )
    assert _pairs_set(capped) == _pairs_set(raw)


def test_identical_mass_collapses_to_star(spark):
    """50 identical short docs (every band bucket = 50 > cap): the
    output is the min-id star — 49 pairs, O(G) not O(G²) — and the
    star clusters identically to the clique."""
    rows = [(i, "the same short boilerplate text repeated") for i in range(50)]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=4)
    pairs = lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=4, band_size=2, max_bucket_rows=CAP
    )
    got = _pairs_set(pairs)
    assert got == {(0, i) for i in range(1, 50)}
    verified = ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.4, candidates=pairs
    )
    vp = verified.toPandas()
    assert len(vp) == 49 and (vp["jaccard"] == 1.0).all()
    comp = connected_components(verified).toPandas()
    assert comp["cluster_id"].nunique() == 1 and len(comp) == 50


def test_mixed_sig_hot_bucket_bounded(spark):
    """Synthetic signatures: 6 distinct sigs × 3 copies share band 0
    (18 rows > cap) but split on band 1. Within-sig pairs come from the
    small band-1 cliques ∪ band-0 stars; cross-sig pairs collapse to
    the per-sig representatives (6 ≤ cap → rep clique). Exact count
    pinned: no quadratic 18×18 group anywhere."""
    rows = [
        (s * 10 + c, 7, 7, 100 + s, 200 + s)
        for s in range(6)
        for c in range(3)
    ]
    sigs = spark.createDataFrame(
        rows, "doc_id long, mh0 long, mh1 long, mh2 long, mh3 long"
    )
    pairs = lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=4, band_size=2, max_bucket_rows=CAP
    )
    got = _pairs_set(pairs)
    within = {
        (s * 10 + a, s * 10 + b)
        for s in range(6)
        for a in range(3)
        for b in range(a + 1, 3)
    }
    reps = {(s * 10, t * 10) for s in range(6) for t in range(s + 1, 6)}
    assert got == within | reps


def test_unsplittable_rep_mass_stars_around_bucket_min(spark):
    """12 distinct signatures (one doc each) share band 0 with cap 8:
    the rep layer itself is over cap and collapses to a star around the
    bucket min — nothing dropped, output linear."""
    rows = [(i, 7, 7, 100 + i, 200 + i) for i in range(12)]
    sigs = spark.createDataFrame(
        rows, "doc_id long, mh0 long, mh1 long, mh2 long, mh3 long"
    )
    pairs = lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=4, band_size=2, max_bucket_rows=CAP
    )
    assert _pairs_set(pairs) == {(0, i) for i in range(1, 12)}


# ---------------------------------------------------------------- incremental


def _mk_world(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "docs"), DOCS_SCHEMA, key_cols=["doc_id"]
    )
    ix = NearDupIndexer(
        spark, tbl, str(tmp_path / "nd"), max_bucket_rows=CAP
    )
    return tbl, ix


def _commit(tbl, spark, rows, op, seq, bid):
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    tbl.merge(
        df.withColumn("op", F.lit(op)).withColumn("seq", F.lit(seq).cast("long")),
        writer_id="w",
        batch_id=bid,
    )


def _batch(tbl):
    df = tbl.read()
    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=4, k=3)
    cand = lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=4, band_size=2, max_bucket_rows=CAP
    )
    return ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.4, candidates=cand
    )


TXT = "the same short boilerplate text repeated"


def test_incremental_hot_bucket_fold_equals_batch(spark, tmp_path):
    """Degenerate mass through the indexer: inserts, growth, center
    deletion, and shrink-below-cap all keep fold == capped batch."""
    tbl, ix = _mk_world(spark, tmp_path)

    # epoch 1: 30 identical docs — bucket goes hot immediately
    _commit(tbl, spark, [(i, TXT) for i in range(30)], "INSERT", 1, "b1")
    ix.advance()
    assert _pairs_set(ix.live_pairs()) == _pairs_set(_batch(tbl))

    # epoch 2: 5 more identical docs with HIGHER ids (star grows).
    # NB: commits go through the ORIGINAL handle — ix.docs holds it, and
    # a parallel reloaded handle would leave ix.docs' metadata stale.
    _commit(tbl, spark, [(100 + i, TXT) for i in range(5)], "INSERT", 2, "b2")
    ix.advance()
    assert _pairs_set(ix.live_pairs()) == _pairs_set(_batch(LakeTable.load(spark, tbl.path)))
    assert _pairs_set(ix.live_pairs()) == {(0, i) for i in range(1, 30)} | {
        (0, 100 + i) for i in range(5)
    }

    # epoch 3: delete the star CENTER (doc 0) — the repair must
    # re-center the star on the new min, not orphan the bucket
    _commit(tbl, spark, [(0, None)], "DELETE", 3, "b3")
    ix.advance()
    assert _pairs_set(ix.live_pairs()) == _pairs_set(_batch(LakeTable.load(spark, tbl.path)))
    assert _pairs_set(ix.live_pairs()) == {(1, i) for i in range(2, 30)} | {
        (1, 100 + i) for i in range(5)
    }

    # epoch 4: a SMALLER id arrives — star re-centers again
    _commit(tbl, spark, [(0, TXT)], "INSERT", 4, "b4")
    ix.advance()
    assert _pairs_set(ix.live_pairs()) == _pairs_set(_batch(LakeTable.load(spark, tbl.path)))

    # epoch 5: mass deletion shrinks the bucket under the cap — the
    # full clique must re-emerge (hot → small transition)
    _commit(
        tbl, spark, [(i, None) for i in range(2, 30)], "DELETE", 5, "b5"
    )
    _commit(tbl, spark, [(101, None), (102, None)], "DELETE", 6, "b5x")
    ix.advance()
    live = _pairs_set(ix.live_pairs())
    assert live == _pairs_set(_batch(LakeTable.load(spark, tbl.path)))
    # 5 docs left: 0, 1, 100, 103, 104 → full clique of 10 pairs
    ids = [0, 1, 100, 103, 104]
    assert live == {
        (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
    }


def test_incremental_repair_survives_crash_replay(spark, tmp_path):
    """The documented crash window — index merge committed, feed epoch
    and cursor not yet written — must not lose the lifecycle repair on
    replay: the pre state is resolved from the merge's own exactly-once
    marker (parent snapshot), not from the live head (which already
    contains the merge and would diff to 'nothing changed')."""
    import os
    import shutil

    tbl, ix = _mk_world(spark, tmp_path)
    _commit(tbl, spark, [(i, TXT) for i in range(30)], "INSERT", 1, "b1")
    ix.advance()
    cur1 = ix._cursor()

    # epoch 2: delete the star CENTER, advance fully...
    _commit(tbl, spark, [(0, None)], "DELETE", 2, "b2")
    ix.advance()
    to_id = ix._cursor()
    # ...then rewind to the crash window: feed epoch + cursor rolled
    # back, the index merge (already committed) stays
    shutil.rmtree(os.path.join(ix.feed_path, f"epoch-{to_id}"))
    ix._commit_cursor(cur1)

    # replay: must re-emit the repair (star re-centered on doc 1)
    ix.advance()
    live = _pairs_set(ix.live_pairs())
    assert live == _pairs_set(_batch(LakeTable.load(spark, tbl.path)))
    assert live == {(1, i) for i in range(2, 30)}
