"""Unit tests for functions/curation.py: deterministic splitting,
Gopher-style repetition gates, n-gram decontamination (including the
broadcast-plan assertion that keeps the 100 TB shape honest), and
capped domain-mix weights."""

from pyspark.sql import functions as F

from delta_spark.functions import curation as cur


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_split_deterministic_and_growth_stable(spark):
    """A document's split never changes across reruns or corpus
    growth, and the three splits roughly hit 12/2/2 sixteenths."""
    small = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), cur.split_assign("doc_id").alias("s")
    )
    big = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), cur.split_assign("doc_id").alias("s")
    )
    sm = {r["doc_id"]: r["s"] for r in small.collect()}
    bg = {r["doc_id"]: r["s"] for r in big.collect()}
    assert all(bg[k] == v for k, v in sm.items())  # growth never reassigns
    from collections import Counter

    frac = Counter(bg.values())
    assert 0.70 <= frac["train"] / 2000 <= 0.80
    assert 0.08 <= frac["valid"] / 2000 <= 0.17
    assert 0.08 <= frac["test"] / 2000 <= 0.17


def test_repetition_stats_hand_checked(spark):
    d = _docs(
        spark,
        [
            # 12 tokens, 'spam' 9 times: dup = 1 - 4/12, top = 9/12
            (1, "spam spam spam spam spam spam spam spam spam egg ham toast"),
            # 12 distinct medium words: keeps
            (2, "alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima"),
            (3, "hi"),  # 1 token: too short, dropped
        ],
    )
    out = {r["doc_id"]: r for r in cur.repetition_stats(d, "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 12
    assert out[1]["dup_token_frac"] == round(1 - 4 / 12, 4)
    assert out[1]["top_token_frac"] == 0.75
    assert out[1]["keep"] is False  # top-token cap fires
    assert out[2]["keep"] is True
    assert out[3]["keep"] is False  # n_tokens < 10


def test_word_ngrams_short_doc_guard(spark):
    d = _docs(spark, [(1, "a b c d"), (2, "a b")])
    out = {
        r["doc_id"]: r["g"]
        for r in d.select(
            "doc_id", cur.word_ngrams("text", 3).alias("g")
        ).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # shorter than n: empty, never sequence-down


def test_decontaminate_counts_and_broadcast_plan(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely clean document with no benchmark overlap here"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps high")])
    out = cur.decontaminate(corpus, bench, "doc_id", "text", n=3)
    rows = {r["doc_id"]: r["n_overlap"] for r in out.collect()}
    # shared 3-grams: 'quick brown fox', 'brown fox jumps'
    assert rows == {1: 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark side must broadcast


def test_domain_mix_cap_bites(spark):
    d = spark.createDataFrame(
        [("big", 85), ("small_a", 10), ("small_b", 5)],
        "domain string, toks int",
    )
    out = {
        r["domain"]: r
        for r in cur.domain_mix_weights(d, ["domain"], "toks", cap=0.15).collect()
    }
    assert out["big"]["token_share"] == 0.85
    assert out["big"]["capped_share"] == 0.15
    assert out["small_a"]["capped_share"] == 0.1
    assert out["small_b"]["n_docs"] == 1


def test_pack_bins_semantics_hand_checked(spark):
    """Within a shard, bins fill greedily in id order: a bin is cut at
    the first doc boundary at/past the budget (overflow bounded by one
    document's tail), and an over-budget doc occupies its own slots."""
    rows = [(i, " ".join(["w"] * n)) for i, n in
            [(1, 60), (2, 60), (3, 60), (4, 350), (5, 10)]]
    out = cur.pack_bins(_docs(spark, rows), "doc_id", "text",
                        budget=100, n_shards=1).collect()
    got = {r["doc_id"]: (r["bin_start"], r["bin"]) for r in out}
    # offsets: 0, 60, 120, 180, 530 → bins 0, 0, 1, 1, 5
    assert got == {1: (0, 0), 2: (60, 0), 3: (120, 1),
                   4: (180, 1), 5: (530, 5)}
    # every bin's overflow is bounded by its last doc's tail
    assert all(r["shard"] == 0 for r in out)


def test_pack_bins_shard_parallel_and_deterministic(spark):
    """Sharding keeps the layout per-shard (no cross-shard offsets)
    and the assignment is identical across repartitionings."""
    rows = [(i, " ".join(["tok"] * (5 + i % 7))) for i in range(200)]
    df = _docs(spark, rows)
    a = {r["doc_id"]: (r["shard"], r["bin"]) for r in
         cur.pack_bins(df, "doc_id", "text", 64, 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["bin"]) for r in
         cur.pack_bins(df.repartition(13), "doc_id", "text", 64, 8).collect()}
    assert a == b
    assert len({s for s, _ in a.values()}) == 8


def test_temperature_sample_rates_and_floor_domain(spark):
    """The rarest domain keeps everything (rate 1.0); a domain with k×
    its token mass keeps ~sqrt(1/k); verdicts are deterministic."""
    rows = (
        [(i, "rare", "one two three") for i in range(10)]
        + [(1000 + i, "big", "one two three") for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, domain string, text string")
    out = cur.temperature_sample(df, "doc_id", "domain", "text", tau=0.5)
    rates = {r["domain"]: r["keep_rate"] for r in
             out.select("domain", "keep_rate").distinct().collect()}
    assert rates["rare"] == 1.0
    assert abs(rates["big"] - (1 / 100) ** 0.5) < 1e-12
    kept = out.filter("domain = 'big' and keep").count()
    # md5 coin ≈ uniform: expect ~100 of 1000 at rate 0.1
    assert 60 <= kept <= 140
    assert out.filter("domain = 'rare' and not keep").count() == 0
    # rerun → identical verdicts
    again = cur.temperature_sample(df, "doc_id", "domain", "text", tau=0.5)
    assert sorted(out.collect()) == sorted(again.collect())


def test_pack_concat_materializes_in_layout_order(spark):
    """pack_concat joins text back and concatenates in id order with
    the EOD separator; bin stats match the planned layout."""
    # pure-alpha words: one token each under the BPE-ish pattern
    rows = [(i, " ".join(["w" + "a" * i] * 50)) for i in range(1, 6)]
    out = cur.pack_concat(_docs(spark, rows), "doc_id", "text",
                          budget=100, n_shards=1, sep="<EOD>").collect()
    by_bin = {r["bin"]: r for r in out}
    # offsets 0,50,100,... → bins {0: docs 1,2}, {1: docs 3,4}, {2: doc 5}
    assert by_bin[0]["n_docs"] == 2 and by_bin[0]["n_tokens"] == 100
    assert by_bin[0]["text"] == " ".join(["wa"] * 50) + "<EOD>" + " ".join(["waa"] * 50)
    assert by_bin[2]["n_docs"] == 1
    # two exchanges total: the packing window + the bin agg
    plan = cur.pack_concat(
        _docs(spark, rows), "doc_id", "text", 100, 1
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # window + agg, no join-back


def test_oov_stats_hand_checked_and_broadcast_plan(spark):
    """OOV rate against the corpus's own top-K vocabulary: hand-checked
    counts, the exactly-one-divide oov_frac, and the broadcast of the
    O(vocab_k) head vocabulary into the per-document pass."""
    d = _docs(
        spark,
        [
            (1, "the the the cat"),       # 'the' x3 dominates the vocab
            (2, "the cat sat"),
            (3, "zzz qqq"),               # entirely OOV under k=2
        ],
    )
    out = cur.oov_stats(d, "doc_id", "text", vocab_k=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    # corpus counts: the=4, cat=2, sat=1, zzz=1, qqq=1 → vocab {the, cat}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_oov"] == 0
    assert rows[2]["n_tokens"] == 3 and rows[2]["n_oov"] == 1
    assert rows[2]["oov_frac"] == 1 / 3  # one IEEE divide, exact
    assert rows[3]["n_oov"] == 2 and rows[3]["oov_frac"] == 1.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # vocab side must broadcast


def test_oov_vocab_tiebreak_total(spark):
    """Equal-count tokens rank by token asc — the vocabulary cut is a
    total order, so the same corpus yields the same vocab on any
    partitioning."""
    d = _docs(spark, [(1, "bb aa"), (2, "aa bb"), (3, "cc aa bb")])
    # counts: aa=3, bb=3, cc=1; k=1 must pick 'aa' (count tie → token asc)
    out = {r["doc_id"]: r["n_oov"] for r in
           cur.oov_stats(d, "doc_id", "text", vocab_k=1).collect()}
    assert out == {1: 1, 2: 1, 3: 2}  # only 'aa' in-vocab everywhere
    repart = {r["doc_id"]: r["n_oov"] for r in
              cur.oov_stats(d.repartition(7), "doc_id", "text",
                            vocab_k=1).collect()}
    assert repart == out


def test_tfidf_topk_hand_checked(spark):
    """tf * N / df with deterministic (score desc, token asc) ties:
    hand-checked scores on a 3-doc corpus."""
    d = _docs(
        spark,
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
    )
    out = cur.tfidf_topk(d, "doc_id", "text", k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["token"], r["score"]) for r in out}
    # doc 1: apple tf=2 df=1 → 2*3/1=6; banana tf=1 df=2 → 1.5
    assert got[(1, 1)] == ("apple", 6.0)
    assert got[(1, 2)] == ("banana", 1.5)
    # doc 2: banana 1*3/2=1.5, cherry 1*3/2=1.5 → tie broken token asc
    assert got[(2, 1)] == ("banana", 1.5)
    assert got[(2, 2)] == ("cherry", 1.5)
    # doc 3: cherry 3*3/2=4.5 beats durian 1*3/1=3
    assert got[(3, 1)] == ("cherry", 4.5)
    assert got[(3, 2)] == ("durian", 3.0)
    # k bounds output per doc
    assert max(r["rank"] for r in out) <= 2


def test_curate_corpus_every_stage_bites(spark):
    """One composed plan: each stage provably eliminates its target —
    scrub redacts, the quality gate drops short/spammy docs, dedup
    keeps the min-id copy, the split filter drops non-train ids, and
    survivors get packed."""
    good = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa")
    rows = [
        (1, good + " mail me at a.b@example.com today"),   # survives, scrubbed
        (2, good + " mail me at a.b@example.com today"),   # exact dup of 1 → dropped
        (3, "hi"),                                          # quality gate drops
        (4, "spam " * 40),                                  # repetition gate drops
        (5, good + " entirely different tail of words here"),
    ]
    out = cur.curate_corpus(_docs(spark, rows), "doc_id", "text",
                            budget=512, n_shards=2)
    got = {r["doc_id"]: r for r in out.collect()}
    # split: md5 nibble of 1,5 → train? compute what the op computes
    from hashlib import md5 as _m
    expect_ids = {i for i in (1, 5)
                  if _m(str(i).encode()).hexdigest()[0] not in "cdef"}
    assert set(got) == expect_ids
    for r in got.values():
        assert r["bin"] == 0 and r["n_tokens"] > 0
    # the scrub ran BEFORE fingerprinting: docs 1 and 2 dedup'd even
    # though the redaction rewrote their shared PII span
    assert 2 not in got


def test_curation_edge_empty_and_small(spark):
    """Empty corpus curates to an empty packed layout (no crash at any
    stage); vocab_k larger than the whole vocabulary means nothing is
    OOV."""
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert cur.curate_corpus(empty, "doc_id", "text").count() == 0
    assert cur.tfidf_topk(empty, "doc_id", "text").count() == 0
    d = _docs(spark, [(1, "only two tokens appear here")])
    out = cur.oov_stats(d, "doc_id", "text", vocab_k=10_000).collect()
    assert out[0]["n_oov"] == 0 and out[0]["oov_frac"] == 0.0
