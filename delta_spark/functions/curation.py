"""Corpus-curation operators for training-data pipelines:
deterministic train/valid/test splitting, Gopher-style repetition
statistics, benchmark n-gram decontamination, and capped domain-mix
sampling weights.

Everything is pure ``pyspark.sql.functions`` column algebra (JVM-side,
whole-stage codegen) — no Python UDFs — and every expression stays in
the md5/regex subset DuckDB reproduces bit-for-bit, so each operator
is oracle-checkable by the driver.

Scale notes (100 TB): the split is a stateless hash of the document id
(no shuffle, no global coordination — any executor assigns any row,
and the assignment is stable across reruns and cluster sizes);
repetition stats are two hash aggregations with map-side combine;
decontamination broadcasts the benchmark's n-gram set (benchmark
corpora are small by construction) so the contamination check is a
map-side semi-join over the full corpus; domain-mix weights aggregate
the corpus down to O(domains) rows before any window runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import md5_long, token_count, tokens

# first hex nibble of md5(id): 0-9ab → train (12/16), cd → valid
# (2/16), ef → test (2/16). Stable under corpus growth: a document's
# split never depends on the rest of the corpus.
_VALID_NIBBLES = ("c", "d")
_TEST_NIBBLES = ("e", "f")


def split_assign(id_col: str | Column) -> Column:
    """Deterministic 75/12.5/12.5 train/valid/test assignment from the
    md5 of the document id. Hash-based (not random): reproducible
    across runs, engines, and partitionings, and adding documents never
    reassigns existing ones — the property a 100 TB training corpus
    needs from its split."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    nib = F.substring(F.md5(c.cast("string")), 1, 1)
    return (
        F.when(nib.isin(*_VALID_NIBBLES), F.lit("valid"))
        .when(nib.isin(*_TEST_NIBBLES), F.lit("test"))
        .otherwise(F.lit("train"))
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, top_cap: float = 0.25
) -> DataFrame:
    """Gopher-style per-document repetition/quality statistics over
    whitespace tokens: token count, duplicate-token fraction,
    top-token fraction, mean token length, and a keep/drop verdict.

    ``top_cap`` bounds the top-token fraction in the verdict (0.25,
    the prose default); dialogue-shaped text whose role markers repeat
    by construction legitimately needs a looser cap.

    Two hash aggregations (doc×token, then doc), both map-side
    combined — the 100 TB plan is two exchanges keyed by doc id with
    no skew beyond document length. Reference analog: quality gates
    run per-event in the reference's transform stage; here they are
    set-level corpus curation ops the reference lacks.
    """
    ex = df.select(id_col, F.explode(tokens(text_col)).alias("_tok"))
    per_tok = ex.groupBy(id_col, "_tok").agg(F.count("*").alias("_c"))
    st = per_tok.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.max("_c").alias("_top"),
        F.count("*").alias("_distinct"),
        F.sum(F.col("_c") * F.length("_tok")).alias("_chars"),
    )
    dup = F.round(F.lit(1.0) - F.col("_distinct") / F.col("n_tokens"), 4)
    top = F.round(F.col("_top") / F.col("n_tokens"), 4)
    mwl = F.round(F.col("_chars") / F.col("n_tokens"), 4)
    return st.select(
        id_col,
        "n_tokens",
        dup.alias("dup_token_frac"),
        top.alias("top_token_frac"),
        mwl.alias("mean_token_len"),
        # thresholds follow the Gopher rules' shape (token-count
        # window, mean-word-length window, repetition caps), applied
        # to the ROUNDED values so the verdict is engine-agnostic
        (
            (F.col("n_tokens") >= 10)
            & (F.col("n_tokens") <= 100000)
            & (mwl >= 2.0)
            & (mwl <= 10.0)
            & (dup < 0.93)
            & (top < top_cap)
        ).alias("keep"),
    )


def word_ngrams(text_col: str | Column, n: int) -> Column:
    """Array of word ``n``-grams (space-joined) over whitespace tokens;
    empty when the document is shorter than ``n`` tokens. Pure column
    expression (sequence + slice under ``transform``)."""
    c = text_col if isinstance(text_col, str) else text_col
    w = tokens(c)
    # Spark's sequence(1, 0) counts DOWN — guard short docs explicitly
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct word ``n``-grams it shares with ANY benchmark document
    (0 rows for clean docs — callers drop or flag the returned ids).

    The benchmark n-gram set is deduped and broadcast (eval/benchmark
    corpora are small by construction), so at 100 TB this is a single
    map-side semi-join over the corpus scan — no shuffle of corpus
    text, no all-pairs comparison.
    """
    grams = corpus.select(
        id_col, F.explode(word_ngrams(text_col, n)).alias("_g")
    ).distinct()
    bench_g = (
        benchmark.select(F.explode(word_ngrams(text_col, n)).alias("_g"))
        .distinct()
    )
    return (
        grams.join(F.broadcast(bench_g), "_g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )


def domain_mix_weights(
    df: DataFrame,
    domain_cols: list[str],
    weight_col: str | Column,
    cap: float = 0.15,
) -> DataFrame:
    """Per-domain corpus composition with a capped sampling share:
    document and token counts per domain, each domain's raw token
    share, and the share clipped at ``cap`` (the standard guard
    against one crawl domain dominating a training mix).

    The corpus-sized work is ONE aggregation (map-side combined) down
    to O(domains) rows; the total is a scalar broadcast back over that
    tiny frame — nothing global touches row-level data, so the plan is
    unchanged at 1000 executors.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    per = df.groupBy(*domain_cols).agg(
        F.count("*").alias("n_docs"), F.sum(w).alias("n_tokens")
    )
    total = per.agg(F.sum("n_tokens").alias("_t"))
    share = F.col("n_tokens") / F.col("_t")
    return per.crossJoin(F.broadcast(total)).select(
        *domain_cols,
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(F.least(share, F.lit(cap)), 6).alias("capped_share"),
    )


def dialogue_expr(
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> Column:
    """THE dialogue-assembly aggregate: ``role: text`` lines joined by
    newline in turn order (structs sort by the turn column — a key
    column, so the order is total). One definition shared by the batch
    corpus query, the conversation-level incremental indexer, and the
    tests, because the assembly shapes fingerprints, the quality gate,
    and pack weights exactly like the gate thresholds do — two copies
    would let the pinned incremental==batch invariant drift
    undetected."""
    line = F.concat(
        F.col(role_col), F.lit(": "),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    structs = F.collect_list(F.struct(F.col(turn_col), line.alias("_l")))
    return F.array_join(
        F.transform(F.array_sort(structs), lambda x: x["_l"]), "\n"
    )


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 512,
    n_shards: int = 8,
    top_cap: float = 0.25,
) -> DataFrame:
    """The full curation pipeline as ONE composed plan: PII scrub →
    Gopher-style quality gate → exact near-identical dedup (min-id
    winner per normalized-text fingerprint) → deterministic train
    split → sequence packing. Returns the packed training layout
    (id, token count, shard, bin offset, bin) of the documents that
    survive every stage — what actually ships to the tokenizer.

    Each stage is the already-tested operator; composing them in one
    DataFrame lets Catalyst plan the whole thing (one scan feeds the
    scrub; the split filter is stateless and costs nothing). Scale
    (100 TB): the quality gate is two map-side-combined aggregations
    plus one join back keyed by doc id; dedup is a single window over
    the fingerprint (text rides through — no second join); the split
    is a stateless hash filter; packing is the one bounded-state
    window from :func:`pack_bins`. No stage collects, no stage
    all-pairs, and every verdict is engine- and cluster-size-exact,
    so the same corpus curates identically anywhere.
    """
    from .text import fingerprint, pii_scrub

    clean = df.select(F.col(id_col), pii_scrub(text_col).alias(text_col))
    keep_ids = (
        repetition_stats(clean, id_col, text_col, top_cap=top_cap)
        .filter(F.col("keep"))
        .select(id_col)
    )
    kept = clean.join(keep_ids, id_col)
    wf = Window.partitionBy(fingerprint(text_col))
    uniq = (
        kept.withColumn("_keep_id", F.min(id_col).over(wf))
        .filter(F.col(id_col) == F.col("_keep_id"))
        .drop("_keep_id")
    )
    train = uniq.filter(split_assign(id_col) == "train")
    return pack_bins(train, id_col, text_col, budget=budget, n_shards=n_shards)


def oov_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_k: int = 100,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_k`` token vocabulary — the standard gibberish /
    wrong-language / boilerplate screen a tokenizer-bound corpus runs
    before training (a document whose tokens are mostly outside the
    corpus head vocabulary is noise, markup, or the wrong language).

    Returns one row per document: token count, OOV token count, and
    ``oov_frac`` = n_oov / n_tokens — a single exactly-rounded IEEE
    divide over two bigints, so any engine reproduces the double
    bit-for-bit (no transcendental ops anywhere).

    Scale (100 TB): the vocabulary is ONE map-side-combined token
    aggregation followed by a distributed top-K (TakeOrdered — no
    global sort materializes); the per-document pass is one explode +
    one (doc, token) aggregation with the O(vocab_k) head vocabulary
    BROADCAST into a map-side join. Nothing shuffles document text;
    the tie-break (count desc, token asc) is total, so the vocabulary
    — and every verdict downstream of it — is identical on any
    cluster size. Reference analog: none — corpus-curation layer over
    the CDC targets.

    ``vocab`` (a DataFrame whose first column is the token) serves the
    head vocabulary from MAINTAINED state instead — pass
    ``VocabIndexer.top_k(k).select("token")`` and the corpus-wide
    token aggregation disappears from the plan (one scan instead of
    two); with the default ``None`` the vocabulary is computed
    in-query. Both paths cut by the same (count desc, token asc) total
    order, so the verdicts are identical.
    """
    ex = df.select(id_col, F.explode(tokens(text_col)).alias("_tok"))
    if vocab is None:
        vocab = (
            ex.groupBy("_tok")
            .agg(F.count("*").alias("_c"))
            .orderBy(F.col("_c").desc(), F.col("_tok").asc())
            .limit(vocab_k)
            .select("_tok", F.lit(True).alias("_in_vocab"))
        )
    else:
        first = vocab.columns[0]
        vocab = vocab.select(
            F.col(first).alias("_tok"), F.lit(True).alias("_in_vocab")
        )
    per = ex.groupBy(id_col, "_tok").agg(F.count("*").alias("_c"))
    flagged = per.join(F.broadcast(vocab), "_tok", "left")
    oov = F.when(F.col("_in_vocab").isNull(), F.col("_c")).otherwise(F.lit(0))
    st = flagged.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.sum(oov).cast("long").alias("n_oov"),
    )
    return st.select(
        id_col,
        "n_tokens",
        "n_oov",
        (F.col("n_oov") / F.col("n_tokens")).alias("oov_frac"),
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    dfreq: DataFrame | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Deterministic per-document keyword extraction: the top-``k``
    tokens by a TF-IDF-shaped score, ``score = tf * N / df`` (term
    count in the document, times total documents over documents
    containing the term). The raw-ratio IDF deliberately avoids the
    logarithm: ``tf * N`` is exact bigint arithmetic and the single
    divide is exactly rounded under IEEE 754, so the score — and the
    (score desc, token asc) ranking built on it — is bit-identical in
    any engine, making the op oracle-checkable where ln-based IDF
    would drift in the last ulp.

    Scale (100 TB): one explode + one (doc, token) aggregation; the
    document-frequency side aggregates to O(vocabulary) rows and joins
    back keyed on token (broadcastable while the vocabulary fits,
    shuffle-join otherwise — either way no document text moves); the
    top-k is a row_number window partitioned by document id, state
    bounded by each document's distinct-token count. N is an
    O(1)-row aggregate broadcast, never a driver-side collect.

    ``dfreq``/``n_docs`` serve the IDF side from MAINTAINED state: pass
    ``VocabIndexer.doc_frequency()`` (any DataFrame whose first two
    columns are token → containing-doc count) plus the corpus doc
    count at the same epoch (``VocabIndexer.doc_count()``) and the
    corpus-wide (doc, token) aggregation disappears from the plan —
    only the documents being SCORED are scanned, while their IDF stays
    corpus-exact. That is the real serving win: keywords for a fresh
    batch of documents no longer rescan 100 TB of corpus for document
    frequencies. A scored token absent from the maintained state (a
    document newer than the index cursor) falls back to df=1 — its
    first observed occurrence — via a LEFT join, never silently
    dropped. For a caught-up index over the same corpus both paths are
    bit-identical (same bigints, same single divide).
    """
    ex = df.select(id_col, F.explode(tokens(text_col)).alias("token"))
    per = ex.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    if dfreq is None:
        dfreq = per.groupBy("token").agg(F.count("*").alias("df_docs"))
        ndocs = df.agg(F.count("*").alias("_n"))
    else:
        if n_docs is None:
            raise ValueError(
                "maintained dfreq needs the corpus doc count from the "
                "same epoch (VocabIndexer.doc_count()) — computing N "
                "from the scored subset would skew every score"
            )
        c0, c1 = dfreq.columns[:2]
        dfreq = dfreq.select(
            F.col(c0).alias("token"), F.col(c1).cast("long").alias("df_docs")
        )
        ndocs = df.sparkSession.range(1).select(
            F.lit(int(n_docs)).cast("long").alias("_n")
        )
    scored = (
        per.join(dfreq, "token", "left")
        .withColumn("df_docs", F.coalesce("df_docs", F.lit(1)))
        .crossJoin(F.broadcast(ndocs))
        .select(
            id_col,
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df_docs").cast("long").alias("df_docs"),
            ((F.col("tf") * F.col("_n")) / F.col("df_docs")).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tf", "df_docs", "score")
    )


def pack_bins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """Sequence packing at document granularity: assign documents to
    fixed-token-budget training bins. Documents are never split
    (``chunk_spans`` handles intra-document cuts); the discipline is
    greedy boundary packing — within a shard, documents are laid out
    in id order and a bin is cut at the first document boundary at or
    past the budget, so a bin overflows by at most one document's
    tail. Deterministic: the same corpus packs identically across
    runs, engines, and cluster sizes.

    Returns the doc-level assignment: id, token count, ``shard``,
    ``bin_start`` (the document's token offset inside its shard's
    layout), and ``bin`` = bin_start // budget — monotone within a
    shard; an over-budget document occupies several budget slots, so
    the indices after it skip accordingly.

    Scale (100 TB): ONE shuffle — the window partitions by the md5
    shard of the id (``n_shards`` bounds the window state per task and
    is the parallelism knob; 64 here, tens of thousands at full
    scale), and the running sum inside a shard is streamed by the
    window operator, never materialized. No global coordination, no
    driver-side state. Reference analog: none — this is the
    training-data layer the reference's CDC targets feed.
    """
    toks = token_count(text_col).cast("long")
    shard = F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards))
    base = df.select(
        F.col(id_col), toks.alias("n_tokens"), shard.alias("shard")
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("bin_start")
    return base.select(
        id_col,
        "n_tokens",
        "shard",
        off,
    ).withColumn("bin", F.floor(F.col("bin_start") / F.lit(budget)))


def temperature_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    text_col: str,
    tau: float = 0.5,
) -> DataFrame:
    """Deterministic temperature resampling of a multi-domain corpus
    (the multilingual-sampling standard: keep-rate ∝ share^(τ−1),
    τ<1 flattens the domain distribution toward uniform). The rarest
    domain keeps everything (rate 1); a domain with k× its token mass
    keeps a k^(τ−1) fraction, decided per document by a stable md5
    coin — reruns, engines, and corpus growth never flip a kept
    document to dropped.

    Returns one row per document: domain, token count, the domain's
    ``keep_rate``, and the ``keep`` verdict.

    τ=0.5 (the default) computes rates as sqrt(min_tokens/tokens) —
    division and square root are both exactly rounded under IEEE 754,
    so the rate is BIT-IDENTICAL in any engine and the op is
    oracle-checkable; other τ go through pow (correct, but only
    ULP-reproducible). Scale (100 TB): one map-side-combined
    aggregation to O(domains) rows, broadcast back over the corpus
    scan — the keep decision is stateless per row, no shuffle of
    document text, the same plan at 1000 executors.
    """
    per = df.groupBy(domain_col).agg(
        F.sum(token_count(text_col).cast("long")).alias("_dom_tokens")
    )
    floor_t = per.agg(F.min("_dom_tokens").alias("_min_tokens"))
    if tau == 0.5:
        rate = F.sqrt(F.col("_min_tokens") / F.col("_dom_tokens"))
    else:
        rate = F.pow(
            F.col("_dom_tokens") / F.col("_min_tokens"), F.lit(tau - 1.0)
        )
    rates = per.crossJoin(F.broadcast(floor_t)).select(
        domain_col, rate.alias("keep_rate")
    )
    # 60-bit md5 uniform in [0, 1): exact-rounded double division
    u = md5_long(F.col(id_col).cast("string")) / F.lit(float(1 << 60))
    return (
        df.select(id_col, domain_col, token_count(text_col).alias("n_tokens"))
        .join(F.broadcast(rates), domain_col)
        .withColumn("keep", u < F.col("keep_rate"))
    )


def pack_concat(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 2048,
    n_shards: int = 64,
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize the packed dataset: one row per training bin from
    :func:`pack_bins` — documents concatenated in layout order with
    ``sep`` (the EOD separator a trainer splits on), plus bin-level
    stats (doc count, token total). This is what actually ships to a
    tokenizer: pack_bins plans, pack_concat builds.

    Scale (100 TB): TWO exchanges total — the text rides through the
    packing window (no join back to the corpus), then one aggregation
    keyed by (shard, bin), map-side combined, each group bounded by
    ~budget tokens so no reducer ever sees more than one bin's text.
    Order inside a bin is recovered by sorting the collected
    (id, text) structs — bins hold a handful of docs, so the per-group
    sort is O(bin) — with no driver-side state anywhere.
    """
    toks = token_count(text_col).cast("long")
    shard = F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards))
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        toks.alias("n_tokens"),
        shard.alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    laid = base.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)),
    )
    structs = F.collect_list(F.struct(F.col(id_col), F.col("_text")))
    return laid.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.array_join(
            F.transform(F.array_sort(structs), lambda s: s["_text"]), sep
        ).alias("text"),
    )
