"""Incrementally-maintained curation over the CDC change feed: the
layout derived from the per-doc status table must EQUAL batch
curate_corpus on the final corpus, across inserts, revisions, and
deletions — and every advance must be crash-replayable."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_spark.functions import curation as cur
from delta_spark.functions.curation_incremental import CurationIndexer
from delta_spark.lake import LakeTable

SF = "/root/testdata/sf0.001"

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _src(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def _mk_docs(spark, path) -> LakeTable:
    return LakeTable.create(spark, str(path), DOCS_SCHEMA, key_cols=["doc_id"])


def _commit(tbl, df, op, seq, bid):
    tbl.merge(
        df.withColumn("op", F.lit(op)).withColumn(
            "seq", F.lit(seq).cast("long")
        ),
        writer_id="w",
        batch_id=bid,
    )


def _key(pdf):
    return {
        tuple(int(r[c]) for c in ("doc_id", "n_tokens", "shard",
                                  "bin_start", "bin"))
        for _, r in pdf.iterrows()
    }


@pytest.fixture
def world(spark, tmp_path):
    """Docs table + indexer advanced through 3 epochs: full insert,
    %7 revisions, %13 deletions (disjoint from the revisions)."""
    src = _src(spark)
    tbl = _mk_docs(spark, tmp_path / "docs")
    ix = CurationIndexer(spark, tbl, str(tmp_path / "cur"))

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


def test_incremental_layout_equals_batch(spark, world):
    """The invariant: the layout derived from incrementally-maintained
    status rows reproduces batch curate_corpus on the final corpus,
    row for row (ids, token counts, shards, bin offsets, bins)."""
    tbl, ix = world
    inc = ix.curated_layout().toPandas()
    batch = cur.curate_corpus(tbl.read(), "doc_id", "text").toPandas()
    assert _key(inc) == _key(batch)
    assert len(inc) > 0  # non-trivial: survivors exist


def test_status_maintained_incrementally(spark, world):
    """Epochs 2 and 3 must have merged only the changed docs' status
    rows (the engine records per-batch lineage via its exactly-once
    markers; assert via the status table's own change feed)."""
    tbl, ix = world
    snaps = [s["id"] for s in ix.status.metadata["snapshots"]]
    assert len(snaps) >= 3
    # epoch 2 (the %7 revision wave): status changes touch only %7 ids
    ch2 = ix.status.read_changes(snaps[-3], snaps[-2]).toPandas()
    assert len(ch2) > 0
    assert (ch2["doc_id"] % 7 == 0).all()
    # epoch 3 (%13 deletions): only deletions of %13-not-%7 ids
    ch3 = ix.status.read_changes(snaps[-2], snaps[-1]).toPandas()
    dels = ch3[ch3["_change_type"] == "delete"]
    assert len(dels) > 0
    assert ((dels["doc_id"] % 13 == 0) & (dels["doc_id"] % 7 != 0)).all()


def test_advance_crash_replay_idempotent(spark, world):
    """Re-running the last advance (cursor rolled back, as after a
    crash between merge and cursor commit) lands on the same layout —
    the status merge replays through its exactly-once markers."""
    tbl, ix = world
    before = _key(ix.curated_layout().toPandas())
    with open(ix.cursor_path) as f:
        cur_state = json.load(f)
    snaps = [s["id"] for s in tbl.metadata["snapshots"]]
    with open(ix.cursor_path, "w") as f:
        json.dump({"last_snapshot": snaps[-2]}, f)
    ix.advance()  # replay of the last epoch
    assert _key(ix.curated_layout().toPandas()) == before
    with open(ix.cursor_path) as f:
        assert json.load(f) == cur_state


def test_advance_noop_when_caught_up(spark, world):
    tbl, ix = world
    out = ix.advance()
    assert out["processed"] == 0


def test_cursor_expired_rebootstrap(spark, world):
    """Docs-table retention running ahead of the index triggers a full
    rebootstrap, after which the layout invariant still holds."""
    tbl, ix = world
    extra = spark.createDataFrame(
        [(10_001, "a fresh document with plenty of distinct medium "
                  "words arriving after retention ran ahead of us")],
        DOCS_SCHEMA,
    )
    _commit(tbl, extra, "INSERT", 4, "b4")
    tbl.expire_snapshots(keep_last=1)  # cursor snapshot now gone
    ix.advance()
    inc = ix.curated_layout().toPandas()
    batch = cur.curate_corpus(tbl.read(), "doc_id", "text").toPandas()
    assert _key(inc) == _key(batch)


def test_maintain_curation_job(spark, world, tmp_path):
    """The scheduled job surface: advance to current, materialize the
    layout, bound the status table's metadata, report one dict — and a
    caught-up rerun is a no-op."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from maintain_curation import maintain_curation

    tbl, ix = world
    extra = spark.createDataFrame(
        [(20_001, "another fresh document with plenty of distinct "
                  "medium words to pass the quality gate cleanly")],
        DOCS_SCHEMA,
    )
    _commit(tbl, extra, "INSERT", 4, "b4")
    dest = str(tmp_path / "layout")
    out = maintain_curation(
        spark, tbl.path, ix.root, layout_dest=dest,
        vocab_root=str(tmp_path / "vocab"),
    )
    assert out["to_snapshot"] == tbl.current_snapshot["id"]
    assert out["status_upserts"] >= 1
    assert "status_expired_snapshots" in out
    assert out["vocab_tokens_touched"] > 0  # bootstrap folds the corpus
    got_v = _vkey(
        LakeTable.load(spark, str(tmp_path / "vocab") + "/vocab")
        .read().toPandas()
    )
    assert got_v == _vkey(_batch_vocab(tbl.read()).toPandas())
    got = spark.read.parquet(dest).toPandas()
    batch = cur.curate_corpus(tbl.read(), "doc_id", "text").toPandas()
    assert _key(got) == _key(batch)
    out2 = maintain_curation(spark, tbl.path, ix.root, layout_dest=dest)
    assert out2["status_upserts"] == 0


def test_curation_status_endpoint(spark, world):
    """GET /v1/curation?root=… answers the operator questions about an
    incremental curation index from on-disk metadata alone: which docs
    table it tracks (curation.json sidecar), where its marker-derived
    cursor sits, how many docs commits it lags, the expired-cursor
    rebootstrap signal, and the verdict-state size."""
    import urllib.parse
    import urllib.request

    from delta_spark.service import DiagnosticsService

    tbl, ix = world
    svc = DiagnosticsService(tables={"docs": tbl.path})
    _, port = svc.start()
    try:
        url = (f"http://127.0.0.1:{port}/v1/curation?root="
               + urllib.parse.quote(ix.root))
        with urllib.request.urlopen(url) as r:
            body = json.loads(r.read())
        assert body["in_sync"] and body["lag_commits"] == 0
        assert body["cursor"] == tbl.current_snapshot["id"]
        assert body["params"]["budget"] == 512
        assert not body["cursor_expired"]
        assert body["status_base_rows"] + body["status_delta_rows"] > 0

        # one more docs commit: the index lags by exactly one
        _commit(
            tbl,
            spark.createDataFrame([(30_001, "late doc")], DOCS_SCHEMA),
            "INSERT", 5, "b5",
        )
        with urllib.request.urlopen(url) as r:
            body = json.loads(r.read())
        assert not body["in_sync"] and body["lag_commits"] == 1
    finally:
        svc.stop()


def test_reopen_with_different_top_cap_refused(spark, world, tmp_path):
    """Reopening an existing index under a different verdict-shaping
    parameter is refused loudly (stored keep verdicts would silently
    mix rules); layout-only params (budget) may change freely."""
    tbl, ix = world
    with pytest.raises(ValueError, match="top_cap"):
        CurationIndexer(spark, tbl, ix.root, top_cap=0.5)
    ix2 = CurationIndexer(spark, tbl, ix.root, budget=1024)  # legal
    assert ix2.budget == 1024
    assert json.load(open(ix2.cursor_path))  # same index, same cursor


def test_service_cursor_survives_noop_docs_commit(spark, world):
    """A docs commit that nets to zero changes for the index (e.g.
    compaction) advances the file cursor without a new status marker;
    /v1/curation must still report in_sync via max(marker, file)."""
    import urllib.parse
    import urllib.request

    from delta_spark.service import DiagnosticsService

    tbl, ix = world
    tbl.compact(max_files_per_bucket=1)  # new snapshot, zero row change
    out = ix.advance()
    assert out["processed"] == 0 and out["deleted"] == 0
    assert json.load(open(ix.cursor_path))["last_snapshot"] == (
        tbl.current_snapshot["id"]
    )
    svc = DiagnosticsService(tables={"docs": tbl.path})
    _, port = svc.start()
    try:
        url = (f"http://127.0.0.1:{port}/v1/curation?root="
               + urllib.parse.quote(ix.root))
        with urllib.request.urlopen(url) as r:
            body = json.loads(r.read())
        assert body["in_sync"] and body["lag_commits"] == 0
        assert not body["cursor_expired"]
    finally:
        svc.stop()


def _batch_vocab(df):
    from delta_spark.functions.text import tokens as _tokens

    tok = df.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(_tokens("text")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("doc_id").cast("long").alias("df_docs"),
        )
    )


def _vkey(pdf):
    return {
        (r["token"], int(r["n_tokens"]), int(r["df_docs"]))
        for _, r in pdf.iterrows()
    }


def test_vocab_fold_equals_batch(spark, tmp_path):
    """VocabIndexer advanced through insert/revise/delete epochs equals
    the batch GROUP BY token of the live corpus after every advance —
    the retraction fold over Delta-CDF pre-images is exact."""
    from delta_spark.functions.curation_incremental import VocabIndexer

    src = _src(spark)
    tbl = _mk_docs(spark, tmp_path / "docs")
    ix = VocabIndexer(spark, tbl, str(tmp_path / "vocab"))

    def check():
        got = _vkey(ix.vocab.read().toPandas())
        want = _vkey(_batch_vocab(tbl.read()).toPandas())
        assert got == want

    _commit(tbl, src, "INSERT", 1, "b1")
    ix.advance(); check()

    upd = src.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.concat("text", F.lit(" revision two")).alias("text")
    )
    _commit(tbl, upd, "UPDATE", 2, "b2")
    ix.advance(); check()

    dele = src.filter(
        (F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 7 != 0)
    ).select("doc_id", F.lit(None).cast("string").alias("text"))
    _commit(tbl, dele, "DELETE", 3, "b3")
    ix.advance(); check()

    # replay safety: additive folds are not idempotent, so the marker
    # must block a replayed epoch (crash between merge and cursor)
    # re-fold the last epoch explicitly (as a crashed run that lost no
    # marker would): the merge marker must block the double-count
    snaps = [s["id"] for s in tbl.metadata["snapshots"]]
    ix.advance(to_snapshot_id=snaps[-1])
    check()

    # head vocabulary served from maintained state, same total order
    top = ix.top_k(5).toPandas()
    want_top = (
        _batch_vocab(tbl.read())
        .orderBy(F.col("n_tokens").desc(), F.col("token").asc())
        .limit(5)
        .toPandas()
    )
    assert list(top["token"]) == list(want_top["token"])


def test_vocab_cursor_expired_rebootstrap(spark, tmp_path):
    from delta_spark.functions.curation_incremental import VocabIndexer

    src = _src(spark).limit(40)
    tbl = _mk_docs(spark, tmp_path / "docs")
    ix = VocabIndexer(spark, tbl, str(tmp_path / "vocab"))
    _commit(tbl, src, "INSERT", 1, "b1")
    ix.advance()
    _commit(
        tbl,
        src.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", F.lit(None).cast("string").alias("text")
        ),
        "DELETE", 2, "b2",
    )
    _commit(
        tbl,
        spark.createDataFrame([(90_001, "brand new words here")],
                              DOCS_SCHEMA),
        "INSERT", 3, "b3",
    )
    tbl.expire_snapshots(keep_last=1)
    ix.advance()  # cursor gone → rebootstrap diff
    got = _vkey(ix.vocab.read().toPandas())
    want = _vkey(_batch_vocab(tbl.read()).toPandas())
    assert got == want


def test_oov_served_from_maintained_vocab(spark, tmp_path):
    """oov_stats(vocab=VocabIndexer.top_k(k)) equals the in-query
    vocabulary path verdict-for-verdict — the maintained head vocab
    cuts by the same total order."""
    from delta_spark.functions.curation_incremental import VocabIndexer

    src = _src(spark).limit(60)
    tbl = _mk_docs(spark, tmp_path / "docs")
    _commit(tbl, src, "INSERT", 1, "b1")
    ix = VocabIndexer(spark, tbl, str(tmp_path / "vocab"))
    ix.advance()

    fresh = cur.oov_stats(tbl.read(), "doc_id", "text", vocab_k=20)
    served = cur.oov_stats(
        tbl.read(), "doc_id", "text",
        vocab=ix.top_k(20).select("token"),
    )
    a = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
         for r in fresh.collect()}
    b = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
         for r in served.collect()}
    assert a == b


def test_tfidf_served_from_maintained_vocab(spark, tmp_path):
    """tfidf_topk(dfreq=ix.doc_frequency(), n_docs=ix.doc_count())
    equals the in-query document-frequency path bit-for-bit for a
    caught-up index — the corpus-wide (doc, token) aggregation leaves
    the plan, the scores do not move."""
    from delta_spark.functions.curation_incremental import VocabIndexer

    src = _src(spark).limit(60)
    tbl = _mk_docs(spark, tmp_path / "docs")
    _commit(tbl, src, "INSERT", 1, "b1")
    ix = VocabIndexer(spark, tbl, str(tmp_path / "vocab"))
    ix.advance()

    def _k(df):
        return {
            (int(r["doc_id"]), int(r["rank"]), r["token"], int(r["tf"]),
             int(r["df_docs"]), float(r["score"]))
            for r in df.collect()
        }

    fresh = _k(cur.tfidf_topk(tbl.read(), "doc_id", "text", k=3))
    served = _k(
        cur.tfidf_topk(
            tbl.read(), "doc_id", "text", k=3,
            dfreq=ix.doc_frequency(), n_docs=ix.doc_count(),
        )
    )
    assert fresh == served and len(fresh) > 0

    # maintained dfreq without its epoch's N is refused, not guessed
    with pytest.raises(ValueError, match="doc count"):
        cur.tfidf_topk(
            tbl.read(), "doc_id", "text", k=3, dfreq=ix.doc_frequency()
        )

    # a document newer than the index cursor still scores: unseen
    # tokens fall back to df=1 (first observed occurrence), never drop
    novel = spark.createDataFrame(
        [(999_001, "zzznovel zzznovel qqqunseen")], DOCS_SCHEMA
    )
    out = cur.tfidf_topk(
        novel, "doc_id", "text", k=3,
        dfreq=ix.doc_frequency(), n_docs=ix.doc_count(),
    ).collect()
    by_tok = {r["token"]: r for r in out}
    assert set(by_tok) == {"zzznovel", "qqqunseen"}
    assert all(int(r["df_docs"]) == 1 for r in out)


def test_vocab_streaming_sink_hook(spark, tmp_path):
    """cfg.vocab_root maintains the vocabulary in lockstep with the
    streaming sink: after the stream drains, the vocab table equals
    the batch GROUP BY token of the final transcript state (df counted
    per turn — the table's composite key)."""
    from delta_spark.changelog import ChangelogSpec, generate_and_write
    from delta_spark.functions.text import tokens as _tokens
    from delta_spark.pipeline import Pipeline, PipelineConfig

    log = str(tmp_path / "log")
    generate_and_write(log, ChangelogSpec(n_events=1200, n_convs=20, seed=9))
    cfg = PipelineConfig(
        changelog_path=log,
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        num_buckets=8,
        max_files_per_trigger=1,  # several micro-batches
        vocab_root=str(tmp_path / "vocab"),
    )
    Pipeline(spark, cfg).run_stream_to_completion()
    t = LakeTable.load(spark, cfg.table_path)
    got = _vkey(
        LakeTable.load(spark, str(tmp_path / "vocab") + "/vocab")
        .read().toPandas()
    )
    tok = t.read().filter(F.col("text").isNotNull()).select(
        F.concat_ws("|", F.col("conv_id"),
                    F.col("turn_idx").cast("string")).alias("_rid"),
        F.explode(_tokens("text")).alias("token"),
    )
    want = _vkey(
        tok.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("_rid").cast("long").alias("df_docs"),
        )
        .toPandas()
    )
    assert got == want and len(got) > 0


def test_vocab_status_endpoint(spark, tmp_path):
    """GET /v1/vocab?root=… reports the marker-derived cursor, lag vs
    the docs head, and vocab size from on-disk metadata alone."""
    import urllib.parse
    import urllib.request

    from delta_spark.functions.curation_incremental import VocabIndexer
    from delta_spark.service import DiagnosticsService

    src = _src(spark).limit(30)
    tbl = _mk_docs(spark, tmp_path / "docs")
    _commit(tbl, src, "INSERT", 1, "b1")
    ix = VocabIndexer(spark, tbl, str(tmp_path / "vocab"))
    ix.advance()
    svc = DiagnosticsService(tables={"docs": tbl.path})
    _, port = svc.start()
    try:
        url = (f"http://127.0.0.1:{port}/v1/vocab?root="
               + urllib.parse.quote(ix.root))
        with urllib.request.urlopen(url) as r:
            body = json.loads(r.read())
        assert body["in_sync"] and body["lag_commits"] == 0
        assert body["cursor"] == tbl.current_snapshot["id"]
        assert body["id_cols"] == ["doc_id"]
        assert body["vocab_base_rows"] + body["vocab_delta_rows"] > 0

        _commit(
            tbl,
            spark.createDataFrame([(40_001, "late words arrive")],
                                  DOCS_SCHEMA),
            "INSERT", 2, "b2",
        )
        with urllib.request.urlopen(url) as r:
            body = json.loads(r.read())
        assert not body["in_sync"] and body["lag_commits"] == 1
    finally:
        svc.stop()


def test_composite_key_curation_over_transcripts(spark, tmp_path):
    """CurationIndexer over a composite-keyed table (the transcripts
    shape, key (conv_id, turn_idx)): the layout equals batch
    curate_corpus over the final state with the same synthesized
    string identity — turn-level curation directly on the CDC target."""
    import datetime

    from delta_spark.functions.curation_incremental import CurationIndexer
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    ix = CurationIndexer(
        spark, tbl, str(tmp_path / "cur"),
        id_col=("conv_id", "turn_idx"), top_cap=0.5,
    )
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, op string, seq long")
    ts = datetime.datetime(2026, 1, 1)
    body = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima")
    rows1 = [
        (f"c{i}", j, "user", f"{body} c{i} t{j}", "", ts, "UPDATE",
         i * 10 + j)
        for i in range(6) for j in range(3)
    ]
    tbl.merge(spark.createDataFrame(rows1, ddl), "w", "b1")
    ix.advance()
    # revise one turn, delete another, add a gate-failing short turn
    rows2 = [
        ("c1", 1, "user", f"{body} revised tail", "", ts, "UPDATE", 900),
        ("c2", 2, "user", None, "", ts, "DELETE", 901),
        ("c9", 0, "user", "hi", "", ts, "UPDATE", 902),
    ]
    tbl.merge(spark.createDataFrame(rows2, ddl), "w", "b2")
    ix.advance()

    from delta_spark.functions.curation_incremental import ID_SEP

    synth = F.concat_ws(
        ID_SEP, F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("string"),
    )
    batch = cur.curate_corpus(
        tbl.read().select(synth.alias("doc_id"), "text"),
        "doc_id", "text", budget=512, n_shards=8, top_cap=0.5,
    ).toPandas()
    inc = ix.curated_layout().toPandas()
    key = lambda p: {
        (r["doc_id"], int(r["n_tokens"]), int(r["shard"]),
         int(r["bin_start"]), int(r["bin"])) for _, r in p.iterrows()
    }
    assert key(inc) == key(batch) and len(inc) > 0
    # the short turn failed the gate; the deleted turn is gone
    ids = set(inc["doc_id"])
    assert f"c9{ID_SEP}0" not in ids and f"c2{ID_SEP}2" not in ids


def test_curation_streaming_sink_hook(spark, tmp_path):
    """cfg.curation_root maintains turn-level curation verdicts in
    lockstep with the streaming sink: after the stream drains, the
    derived layout equals batch curate_corpus over the final transcript
    state under the synthesized (conv_id#turn_idx) identity."""
    from delta_spark.changelog import ChangelogSpec, generate_and_write
    from delta_spark.functions.curation_incremental import CurationIndexer
    from delta_spark.pipeline import Pipeline, PipelineConfig

    log = str(tmp_path / "log")
    generate_and_write(log, ChangelogSpec(n_events=1200, n_convs=20, seed=3))
    cfg = PipelineConfig(
        changelog_path=log,
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        num_buckets=8,
        max_files_per_trigger=1,
        curation_root=str(tmp_path / "cur"),
    )
    Pipeline(spark, cfg).run_stream_to_completion()
    t = LakeTable.load(spark, cfg.table_path)
    ix = CurationIndexer(
        spark, t, cfg.curation_root,
        id_col=("conv_id", "turn_idx"), top_cap=0.5,
    )
    from delta_spark.functions.curation_incremental import ID_SEP

    synth = F.concat_ws(
        ID_SEP, F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("string"),
    )
    batch = cur.curate_corpus(
        t.read().select(synth.alias("doc_id"), "text"),
        "doc_id", "text", budget=512, n_shards=8, top_cap=0.5,
    ).toPandas()
    inc = ix.curated_layout().toPandas()
    key = lambda p: {
        (r["doc_id"], int(r["n_tokens"]), int(r["shard"]),
         int(r["bin_start"]), int(r["bin"])) for _, r in p.iterrows()
    }
    assert key(inc) == key(batch) and len(inc) > 0


def test_single_key_tuple_normalizes_to_bigint_mode(spark, tmp_path):
    """A 1-tuple naming a bigint key (what the sink hook passes for a
    single-key table) normalizes to the plain bigint identity, so the
    hook and the scheduled job (default 'doc_id') share one index."""
    from delta_spark.functions.curation_incremental import CurationIndexer

    src = _src(spark).limit(20)
    tbl = _mk_docs(spark, tmp_path / "docs")
    _commit(tbl, src, "INSERT", 1, "b1")
    ix1 = CurationIndexer(spark, tbl, str(tmp_path / "cur"),
                          id_col=("doc_id",))
    assert ix1.id_col == "doc_id" and not ix1._composite
    ix1.advance()
    # reopening with the string default must NOT refuse
    ix2 = CurationIndexer(spark, tbl, str(tmp_path / "cur"))
    assert {f.name: f.dataType.simpleString()
            for f in ix2.status.read().schema}["doc_id"] == "bigint"


def test_sidecar_survives_key_rename(spark, tmp_path):
    """Renaming a frozen column via the table's schema evolution must
    not brick the index: the sidecar freeze compares FIELD IDS, so the
    reopened indexer (new names from key_cols) is accepted and the
    sidecar rewrites its recorded names."""
    import datetime

    from delta_spark.functions.curation_incremental import CurationIndexer
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    ix = CurationIndexer(
        spark, tbl, str(tmp_path / "cur"),
        id_col=("conv_id", "turn_idx"), top_cap=0.5,
    )
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, op string, seq long")
    ts = datetime.datetime(2026, 1, 1)
    tbl.merge(
        spark.createDataFrame(
            [("c0", 0, "user", "alpha bravo charlie delta echo foxtrot "
              "golf hotel india juliet kilo lima", "", ts, "UPDATE", 1)],
            ddl,
        ),
        "w", "b1",
    )
    ix.advance()
    tbl.apply_ddl({"op": "RENAME_COLUMN", "column": "conv_id",
                   "new_name": "conversation_id"})
    tbl = LakeTable.load(spark, tbl.path)
    # reopen with the POST-rename key names (what the sink hook passes)
    ix2 = CurationIndexer(
        spark, tbl, str(tmp_path / "cur"),
        id_col=tuple(tbl.key_cols), top_cap=0.5,
    )
    assert tuple(ix2.id_cols) == ("conversation_id", "turn_idx")
    # and a DIFFERENT frozen param still refuses
    with pytest.raises(ValueError, match="top_cap"):
        CurationIndexer(spark, tbl, str(tmp_path / "cur"),
                        id_col=tuple(tbl.key_cols), top_cap=0.25)


def _assemble_batch(t):
    line = F.concat(F.col("role"), F.lit(": "),
                    F.coalesce(F.col("text"), F.lit("")))
    structs = F.collect_list(F.struct(F.col("turn_idx"), line.alias("_l")))
    return t.read().groupBy(
        F.col("conv_id").cast("string").alias("doc_id")
    ).agg(F.array_join(
        F.transform(F.array_sort(structs), lambda x: x["_l"]), "\n"
    ).alias("text"))


def test_conversation_level_incremental_curation(spark, tmp_path):
    """A changed TURN invalidates only its conversation: the indexer
    re-assembles touched convs from a pinned bucket-pruned read and the
    layout equals batch curate_corpus over the assembled final corpus
    after every advance — including whole-conversation deletion."""
    import datetime

    from delta_spark.functions.curation_incremental import (
        ConversationCurationIndexer,
    )
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    ix = ConversationCurationIndexer(
        spark, tbl, str(tmp_path / "cc"), top_cap=0.5, n_shards=8,
    )
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, op string, seq long")
    ts = datetime.datetime(2026, 1, 1)
    body = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima")

    def check():
        batch = cur.curate_corpus(
            _assemble_batch(tbl).withColumnRenamed("doc_id", "conv_id"),
            "conv_id", "text", budget=512, n_shards=8, top_cap=0.5,
        ).toPandas()
        inc = ix.curated_layout().toPandas()
        key = lambda p: {
            (r["conv_id"], int(r["n_tokens"]), int(r["shard"]),
             int(r["bin_start"]), int(r["bin"])) for _, r in p.iterrows()
        }
        assert key(inc) == key(batch)
        return len(inc)

    rows1 = [
        (f"c{i}", j, "user", f"{body} c{i} t{j}", "", ts, "UPDATE",
         i * 10 + j)
        for i in range(8) for j in range(3)
    ]
    tbl.merge(spark.createDataFrame(rows1, ddl), "w", "b1")
    ix.advance()
    n1 = check()
    assert n1 > 0

    # revise one turn (invalidates only c1), delete ALL of c2's turns,
    # delete one turn of c3 (conv survives with 2 turns)
    rows2 = (
        [("c1", 1, "user", f"{body} revised tail", "", ts, "UPDATE", 900)]
        + [("c2", j, "user", None, "", ts, "DELETE", 910 + j)
           for j in range(3)]
        + [("c3", 0, "user", None, "", ts, "DELETE", 920)]
    )
    tbl.merge(spark.createDataFrame(rows2, ddl), "w", "b2")
    ix.advance()
    check()
    ids = set(ix.curated_layout().toPandas()["conv_id"])
    assert "c2" not in ids  # fully-deleted conversation is gone

    # idempotent catch-up
    out = ix.advance()
    assert out["convs"] == 0


def test_conversation_curation_fallback_scan_equal(spark, tmp_path):
    """Forcing the over-cap fallback (pinned semi-joined scan) lands on
    the same verdicts as the pruned lookup path."""
    import datetime

    from delta_spark.functions.curation_incremental import (
        ConversationCurationIndexer,
    )
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, op string, seq long")
    ts = datetime.datetime(2026, 1, 1)
    body = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima")
    rows = [
        (f"c{i}", j, "user", f"{body} c{i} t{j}", "", ts, "UPDATE",
         i * 10 + j)
        for i in range(5) for j in range(2)
    ]
    outs = []
    for cap in (100_000, 0):  # pruned path, then forced fallback
        tbl = LakeTable.create(
            spark, str(tmp_path / f"t{cap}"), TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], num_buckets=8,
        )
        tbl.merge(spark.createDataFrame(rows, ddl), "w", "b1")
        ix = ConversationCurationIndexer(
            spark, tbl, str(tmp_path / f"cc{cap}"),
            max_lookup_convs=cap,
        )
        ix.advance()
        outs.append({
            (r["conv_id"], r["n_tokens"], r["shard"], r["bin_start"],
             r["bin"])
            for r in ix.curated_layout().collect()
        })
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_conv_curation_streaming_sink_hook(spark, tmp_path):
    """cfg.conv_curation_root maintains the conversation-level curated
    corpus in lockstep with the streaming sink: after the stream
    drains, the layout equals batch curate_corpus over the assembled
    final dialogues — with survivors (varied text passes the gate) AND
    casualties (a templated conversation fails it)."""
    import datetime

    from delta_spark.functions.curation_incremental import (
        ConversationCurationIndexer,
    )
    from delta_spark.pipeline import Pipeline, PipelineConfig
    from delta_spark.schema import CHANGELOG_SCHEMA

    ts = datetime.datetime(2026, 1, 1)

    def ev(seq, conv, turn, text, op="UPDATE"):
        return (seq, op, conv, turn, "user", text, "", ts, None, False,
                ts, None)

    # varied vocabulary per turn → gate passes; conv 'spam' fails it
    rows = []
    seq = 0
    for i in range(6):
        for j in range(3):
            seq += 1
            words = " ".join(f"t{i}{j}w{k}" for k in range(15))
            rows.append(ev(seq, f"c{i}", j, words))
    seq += 1
    rows.append(ev(seq, "spam", 0, "lorem " * 60))
    # a late revision and a deletion land in the second half
    seq += 1
    rows.append(ev(seq, "c1", 1, " ".join(
        f"rev{k}t{k}" for k in range(14))))
    seq += 1
    rows.append(ev(seq, "c2", 0, None, op="DELETE"))

    log = str(tmp_path / "log")
    # several part files in ONE dir → several micro-batches under
    # max_files_per_trigger=1 (order across files is irrelevant: the
    # apply is seq-guarded)
    spark.createDataFrame(rows, CHANGELOG_SCHEMA).repartition(
        3).write.parquet(log)

    cfg = PipelineConfig(
        changelog_path=log,
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        num_buckets=8,
        max_files_per_trigger=1,
        conv_curation_root=str(tmp_path / "cc"),
    )
    Pipeline(spark, cfg).run_stream_to_completion()
    t = LakeTable.load(spark, cfg.table_path)
    ix = ConversationCurationIndexer(spark, t, cfg.conv_curation_root)
    batch = cur.curate_corpus(
        _assemble_batch(t).withColumnRenamed("doc_id", "conv_id"),
        "conv_id", "text", budget=512, n_shards=8, top_cap=0.5,
    ).toPandas()
    inc = ix.curated_layout().toPandas()
    key = lambda p: {
        (r["conv_id"], int(r["n_tokens"]), int(r["shard"]),
         int(r["bin_start"]), int(r["bin"])) for _, r in p.iterrows()
    }
    assert key(inc) == key(batch) and len(inc) > 0
    assert "spam" not in set(inc["conv_id"])  # gate bit in-stream


def test_conv_curation_status_endpoint(spark, tmp_path):
    """GET /v1/conv_curation?root=… mirrors /v1/curation for the
    conversation-level index."""
    import datetime
    import urllib.parse
    import urllib.request

    from delta_spark.functions.curation_incremental import (
        ConversationCurationIndexer,
    )
    from delta_spark.schema import TRANSCRIPT_SCHEMA
    from delta_spark.service import DiagnosticsService

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, op string, seq long")
    ts = datetime.datetime(2026, 1, 1)
    tbl.merge(
        spark.createDataFrame(
            [("c0", j, "user",
              " ".join(f"w{j}x{k}" for k in range(12)), "", ts,
              "UPDATE", j + 1) for j in range(3)],
            ddl,
        ),
        "w", "b1",
    )
    ix = ConversationCurationIndexer(spark, tbl, str(tmp_path / "cc"))
    ix.advance()
    svc = DiagnosticsService(tables={"t": tbl.path})
    _, port = svc.start()
    try:
        url = (f"http://127.0.0.1:{port}/v1/conv_curation?root="
               + urllib.parse.quote(ix.root))
        with urllib.request.urlopen(url) as r:
            body = json.loads(r.read())
        assert body["in_sync"] and body["cursor"] == (
            tbl.current_snapshot["id"]
        )
        assert body["cols"] == ["conv_id", "turn_idx", "role", "text"]
        assert body["status_base_rows"] + body["status_delta_rows"] >= 1
    finally:
        svc.stop()


def test_conv_curation_noop_epoch_short_circuits(spark, tmp_path):
    """A commit range netting zero changed keys (compaction) moves the
    cursor without assembling anything — never a corpus rescan."""
    import datetime

    from delta_spark.functions.curation_incremental import (
        ConversationCurationIndexer,
    )
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, op string, seq long")
    ts = datetime.datetime(2026, 1, 1)
    tbl.merge(
        spark.createDataFrame(
            [("c0", j, "user", " ".join(f"w{j}x{k}" for k in range(12)),
              "", ts, "UPDATE", j + 1) for j in range(3)],
            ddl,
        ),
        "w", "b1",
    )
    ix = ConversationCurationIndexer(spark, tbl, str(tmp_path / "cc"))
    ix.advance()
    before = {tuple(r) for r in ix.curated_layout().collect()}
    tbl.compact(max_files_per_bucket=1)  # head moves, zero row change
    out = ix.advance()
    assert out["convs"] == 0 and out["deleted"] == 0
    assert json.load(open(ix.cursor_path))["last_snapshot"] == (
        tbl.current_snapshot["id"]
    )
    assert {tuple(r) for r in ix.curated_layout().collect()} == before


def test_conv_curation_cursor_expired_rebootstrap(spark, tmp_path):
    """Docs retention running ahead of the conversation index triggers
    the full-assembly rebootstrap; the layout invariant holds and a
    conversation deleted while the index was behind loses its row."""
    import datetime

    from delta_spark.functions.curation_incremental import (
        ConversationCurationIndexer,
    )
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, op string, seq long")
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (f"c{i}", j, "user", " ".join(f"q{i}{j}w{k}" for k in range(12)),
         "", ts, "UPDATE", i * 10 + j + 1)
        for i in range(4) for j in range(2)
    ]
    tbl.merge(spark.createDataFrame(rows, ddl), "w", "b1")
    ix = ConversationCurationIndexer(spark, tbl, str(tmp_path / "cc"))
    ix.advance()
    # while the index sleeps: delete all of c0, add c9, expire history
    tbl.merge(
        spark.createDataFrame(
            [("c0", j, "user", None, "", ts, "DELETE", 100 + j)
             for j in range(2)], ddl),
        "w", "b2",
    )
    tbl.merge(
        spark.createDataFrame(
            [("c9", 0, "user",
              " ".join(f"z9w{k}" for k in range(12)), "", ts,
              "UPDATE", 200)], ddl),
        "w", "b3",
    )
    tbl.expire_snapshots(keep_last=1)  # cursor snapshot now gone
    ix.advance()  # ValueError path → full re-assembly + stale deletes
    batch = cur.curate_corpus(
        _assemble_batch(tbl).withColumnRenamed("doc_id", "conv_id"),
        "conv_id", "text", budget=512, n_shards=8, top_cap=0.5,
    ).toPandas()
    inc = ix.curated_layout().toPandas()
    key = lambda p: {
        (r["conv_id"], int(r["n_tokens"]), int(r["shard"]),
         int(r["bin_start"]), int(r["bin"])) for _, r in p.iterrows()
    }
    assert key(inc) == key(batch)
    assert "c0" not in set(inc["conv_id"])
