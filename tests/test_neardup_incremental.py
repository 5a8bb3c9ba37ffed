"""Incremental near-dup index maintenance over the CDC change feed:
the folded pair-delta feed must EQUAL the batch LSH+Jaccard result on
the final corpus, across inserts, revisions, and deletions — and every
advance must be crash-replayable."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_spark.functions.neardup import (
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from delta_spark.functions.neardup_incremental import NearDupIndexer
from delta_spark.lake import LakeTable

SF = "/root/testdata/sf0.001"

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _src(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _mk_docs(spark, path) -> LakeTable:
    return LakeTable.create(spark, str(path), DOCS_SCHEMA, key_cols=["doc_id"])


def _commit(tbl, df, op, seq, bid):
    tbl.merge(
        df.withColumn("op", F.lit(op)).withColumn("seq", F.lit(seq).cast("long")),
        writer_id="w",
        batch_id=bid,
    )


def _batch_pairs(df):
    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=4, k=3)
    cand = lsh_candidate_pairs(sigs, "doc_id", num_hashes=4, band_size=2)
    return ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.4, candidates=cand
    )


def _key(pdf):
    return {(int(a), int(b), float(j)) for a, b, j in
            zip(pdf["id_a"], pdf["id_b"], pdf["jaccard"])}


@pytest.fixture
def world(spark, tmp_path):
    """Docs table + indexer advanced through 3 epochs: full insert,
    %7 revisions, %13 deletions (disjoint from the revisions)."""
    src = _src(spark)
    tbl = _mk_docs(spark, tmp_path / "docs")
    ix = NearDupIndexer(spark, tbl, str(tmp_path / "nd"))

    _commit(tbl, src, "INSERT", 1, "b1")
    ix.advance()

    upd = src.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.concat("text", F.lit(" revision two")).alias("text")
    )
    _commit(tbl, upd, "UPDATE", 2, "b2")
    ix.advance()

    dele = src.filter(
        (F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 7 != 0)
    ).select("doc_id", F.lit(None).cast("string").alias("text"))
    _commit(tbl, dele, "DELETE", 3, "b3")
    ix.advance()
    return tbl, ix


def test_incremental_fold_equals_batch(spark, world):
    """The invariant: folding the per-epoch pair deltas reproduces the
    batch dedup result on the final corpus exactly — adds for pairs
    born of revisions, retracts for pairs killed by them or by
    deletions."""
    tbl, ix = world
    live = ix.live_pairs().toPandas()
    batch = _batch_pairs(tbl.read()).toPandas()
    assert _key(live) == _key(batch)
    # and the feed genuinely worked incrementally: epochs 2 and 3 only
    # touched the changed docs (retracts name them; adds touch them)
    feed = ix.feed().toPandas()
    for epoch, mod in ((2, 7), (3, 13)):
        e = feed[(feed["epoch"] == epoch) & (feed["op"] == "retract_doc")]
        assert len(e) > 0
        assert (e["id_a"] % mod == 0).all()


def test_revision_births_and_kills_pairs(spark, world):
    """Sanity on the semantics, not just the fold: a revised doc's old
    pairs die unless re-verified, and pairs between two %7 docs that
    both gained ' revision two' can newly appear."""
    tbl, ix = world
    feed = ix.feed().toPandas()
    adds2 = feed[(feed["op"] == "add") & (feed["epoch"] == 2)]
    # every epoch-2 add touches a revised doc
    assert ((adds2["id_a"] % 7 == 0) | (adds2["id_b"] % 7 == 0)).all()
    # deletions never add
    adds3 = feed[(feed["op"] == "add") & (feed["epoch"] == 3)]
    if len(adds3):
        raise AssertionError("a pure-deletion epoch must not add pairs")
    # no live pair touches a deleted doc
    live = ix.live_pairs().toPandas()
    for col in ("id_a", "id_b"):
        assert not ((live[col] % 13 == 0) & (live[col] % 7 != 0)).any()


def test_advance_crash_replay_idempotent(spark, world, tmp_path):
    """Crash AFTER the feed write but BEFORE the cursor commit: the
    replayed advance overwrites its own epoch dir and the index merge
    is skipped by its (writer-id, batch-id) marker — the fold is
    unchanged (exactly-once downstream)."""
    tbl, ix = world
    before = _key(ix.live_pairs().toPandas())
    # simulate the torn state: cursor regressed to the previous epoch
    os.remove(ix.cursor_path)
    ix._commit_cursor(tbl.current_snapshot["id"] - 1)
    ix.advance()  # replay of the last epoch
    assert _key(ix.live_pairs().toPandas()) == before
    # feed has exactly one dir per epoch (the replay overwrote, not
    # appended)
    dirs = [d for d in os.listdir(ix.feed_path) if d.startswith("epoch-")]
    assert len(dirs) == len(set(dirs)) == 3


def test_advance_noop_when_caught_up(spark, world):
    tbl, ix = world
    assert ix.advance().count() == 0


def test_fresh_indexer_resumes_from_disk(spark, world, tmp_path):
    """A NEW indexer over the same root (process restart) sees the
    persisted index + cursor and continues incrementally."""
    tbl, ix = world
    before = _key(ix.live_pairs().toPandas())
    ix2 = NearDupIndexer(spark, tbl, ix.root)
    assert ix2.advance().count() == 0  # caught up — no recompute
    src = _src(spark)
    upd = src.filter(F.col("doc_id") == 0).select(
        "doc_id", F.lit("totally unique replacement text zz").alias("text")
    )
    _commit(tbl, upd, "UPDATE", 4, "b4")
    delta = ix2.advance().toPandas()
    assert set(delta[delta["op"] == "retract_doc"]["id_a"]) == {0}
    assert _key(ix2.live_pairs().toPandas()) == _key(
        _batch_pairs(tbl.read()).toPandas()
    )
    assert before is not None


def test_cursor_expired_rebootstrap(spark, world):
    """Docs-table retention running ahead of the index (expired cursor
    snapshot) triggers a full resync — retract everything ever indexed,
    re-add the current pairs — and the fold invariant survives."""
    tbl, ix = world
    src = _src(spark)
    upd = src.filter(F.col("doc_id") == 3).select(
        "doc_id", F.lit("another unique replacement xyzzy").alias("text")
    )
    _commit(tbl, upd, "UPDATE", 4, "b4")
    tbl.expire_snapshots(keep_last=1)  # cursor snapshot now gone
    delta = ix.advance().toPandas()
    # full resync: every live doc retracted (plus any stale index ids)
    assert (delta["op"] == "retract_doc").sum() >= tbl.read().count()
    assert _key(ix.live_pairs().toPandas()) == _key(
        _batch_pairs(tbl.read()).toPandas()
    )


def test_maintain_neardup_job(spark, world):
    """The scheduled job surface: advance to current, report the delta,
    bound the index table's own metadata."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "maintain_neardup",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "maintain_neardup.py"),
    )
    mj = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mj)

    tbl, ix = world
    src = _src(spark)
    upd = src.filter(F.col("doc_id") == 1).select(
        "doc_id", F.lit("job replacement text qq").alias("text")
    )
    _commit(tbl, upd, "UPDATE", 4, "b4")
    out = mj.maintain_neardup(spark, tbl.path, ix.root)
    assert out["retracts"] == 1
    assert out["to_snapshot"] == tbl.current_snapshot["id"]
    assert "index_expired_snapshots" in out
    assert _key(NearDupIndexer(spark, tbl, ix.root).live_pairs().toPandas()) == _key(
        _batch_pairs(tbl.read()).toPandas()
    )
    # caught up: a second run is a no-op
    out2 = mj.maintain_neardup(spark, tbl.path, ix.root)
    assert out2["adds"] == 0 and out2["retracts"] == 0
