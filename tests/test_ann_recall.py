"""Quantitative checks for the approximate-ANN queries: recall@10 vs
the exact brute-force top-k (the measurable bar the rows-only driver
check can't provide). The sf0.01 embeddings are RANDOM — the
adversarial case for LSH/IVF — so these floors are conservative;
clustered real embeddings only do better."""

from pyspark.sql import functions as F

from delta_spark.functions import similarity as S

SF = "/root/testdata/sf0.01"


def _setup(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).head()["embedding"]]
    base = e.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in S.brute_force_topk(base, qv, k=10).collect()}
    return base, qv, exact


def test_lsh_topk_recall_and_prunes(spark):
    base, qv, exact = _setup(spark)
    n = base.count()
    got = {r["vec_id"] for r in S.lsh_topk(base, qv, k=10).collect()}
    assert len(got & exact) / 10 >= 0.7  # measured 0.8 on this data
    # it actually prunes: the candidate scan is a strict subset
    dim = len(qv)
    cond = None
    for t in range(8):
        sig = F.lit(0)
        qsig = 0
        for i in range(4):
            p = S._pseudo_plane(dim, t * 100 + i, 7)
            pl = F.array(*[F.lit(x) for x in p])
            sig = sig + F.when(S.dot(F.col("embedding"), pl) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            if sum(a * b for a, b in zip(qv, p)) >= 0:
                qsig |= 1 << i
        m = sig == F.lit(qsig)
        cond = m if cond is None else (cond | m)
    scanned = base.filter(cond).count()
    assert scanned < 0.6 * n, (scanned, n)


def test_ivf_topk_recall_and_prunes(spark):
    base, qv, exact = _setup(spark)
    got = {r["vec_id"] for r in S.ivf_topk(base, qv, "label", k=10, n_probe=4).collect()}
    assert len(got & exact) / 10 >= 0.6  # measured 0.7 on this data
    # n_probe=4 of 10 label cells → scans well under half the table
    cells = base.select("label").distinct().count()
    assert 4 < cells


def test_ngram_jaccard_requires_candidates(spark):
    """The quadratic shingle self-join must be opt-in."""
    import pytest

    from delta_spark.functions import neardup

    d = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    with pytest.raises(ValueError, match="candidates"):
        neardup.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.4)
    # explicit opt-in still works for small/pre-blocked inputs
    out = neardup.ngram_jaccard_pairs(
        d, "doc_id", "text", k=3, threshold=0.4, allow_full_scan=True
    )
    out.count()


def test_pairwise_cell_cap_excludes_oversized(spark):
    from delta_spark.functions.similarity import pairwise_topk_within

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    sizes = {r["label"]: r["count"] for r in e.groupBy("label").count().collect()}
    cap = sorted(sizes.values())[len(sizes) // 2]  # median: some cells excluded
    capped = pairwise_topk_within(e, "label", threshold=0.25, max_cell_rows=cap)
    uncapped = pairwise_topk_within(e, "label", threshold=0.25)
    big = {lbl for lbl, n in sizes.items() if n > cap}
    got_labels = {r["label"] for r in capped.select("label").distinct().collect()}
    assert not (got_labels & big)  # oversized cells excluded
    assert capped.count() < uncapped.count()


def test_embedding_neardup_query_path_is_capped(spark, monkeypatch):
    """The driver-contract query must route through the capped cell
    join (not re-implement it inline) so the production path never
    has an unbounded within-cell quadratic."""
    from delta_spark import queries
    from delta_spark.functions import similarity as sim

    seen = {}
    real = sim.pairwise_topk_within

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(sim, "pairwise_topk_within", spy)
    out = queries.embedding_neardup_pairs(spark, SF)
    assert seen.get("max_cell_rows") is not None
    assert out.columns == ["label", "id_a", "id_b", "sim"]
    assert out.count() > 0
