"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (JVM-side
``zip_with``/``aggregate`` — no Python in the loop). The scale path is
LSH-bucketed search: random-hyperplane signs computed from md5-derived
deterministic pseudo-planes bucket the vectors, and only same-bucket
pairs are scored — an equi-join, never O(n^2). An IVF variant uses a
coarse partitioner (any categorical column or kmeans-ish assignment)
to prune the search to the query's cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector. The scan is
    embarrassingly parallel; the top-k is a TakeOrdered (no full
    sort). Ties broken by id for determinism."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), round_digits).alias("sim")
    )
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def pairwise_topk_within(
    df: DataFrame,
    partition_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    round_digits: int = 4,
    max_cell_rows: int | None = None,
    sim_expr=None,
) -> DataFrame:
    """Embedding near-duplicate pairs within a coarse partition
    (label/IVF cell): equi-join on the partition column bounds the
    quadratic blow-up to cell size.

    ``max_cell_rows`` caps that bound at scale: cells larger than the
    cap are EXCLUDED from pairing (a 10M-row cell is 10^14 pairs — it
    needs sub-blocking, e.g. LSH within the cell, not brute force).
    Excluded cells are logged, never silently dropped.

    ``sim_expr`` overrides the similarity expression (two array
    columns → score column) — e.g. a decimal-math cosine whose
    rounding is bit-exact against a SQL oracle."""
    if max_cell_rows is not None:
        sizes = df.groupBy(partition_col).count()
        big = sizes.filter(F.col("count") > max_cell_rows)
        n_big = big.count()
        if n_big:
            import logging

            logging.getLogger("delta_spark.similarity").warning(
                "pairwise_topk_within: %d cell(s) exceed max_cell_rows=%d "
                "and are excluded from pairing (sub-block them instead)",
                n_big, max_cell_rows,
            )
        df = df.join(
            sizes.filter(F.col("count") <= max_cell_rows).select(partition_col),
            partition_col,
            "left_semi",
        )
    a = df.select(
        F.col(partition_col).alias("p"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = df.select(
        F.col(partition_col).alias("p"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    sim = (
        sim_expr(F.col("va"), F.col("vb"))
        if sim_expr is not None
        else F.round(cosine(F.col("va"), F.col("vb")), round_digits)
    )
    return (
        a.join(b, ["p"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select(F.col("p").alias(partition_col), "id_a", "id_b", "sim")
    )


def _pseudo_plane(dim: int, plane_idx: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random hyperplane from a hash — no RNG
    state, so executors and oracles agree."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}|{plane_idx}|{j}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def lsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) per vector:
    the sign pattern of <v, plane_i>. Same-bucket vectors are cosine-
    close with high probability — search visits one bucket, not the
    table."""
    sig = F.lit(0)
    for i in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _pseudo_plane(dim, i, seed)])
        sig = sig + F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return df.withColumn("lsh_bucket", sig.cast("int"))


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 7,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH: L
    independent tables of m planes each; a vector is a candidate when
    its sign signature matches the query's in ANY table (the standard
    L-of-m construction — one near-miss plane no longer loses the
    neighbor, it only loses one table). Expressed as a single scan with
    an OR-of-equalities filter — no union, no shuffle before the top-k.
    At scale the table is written bucket-partitioned per table so the
    probe reads L partitions instead of everything.

    Measured on the synthetic sf0.01 embeddings (random — the
    adversarial case for LSH): recall@10 = 0.8 scanning ~42% vs
    single-table Hamming-1 probing's 0.1 at ~11%
    (tests/test_ann_recall.py pins the floor)."""
    dim = len(query_vec)
    cond = None
    for t in range(n_tables):
        sig = F.lit(0)
        qsig = 0
        for i in range(n_planes):
            plane = _pseudo_plane(dim, t * 100 + i, seed)
            pl = F.array(*[F.lit(x) for x in plane])
            sig = sig + F.when(
                dot(F.col(vec_col), pl) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            if sum(float(a) * b for a, b in zip(query_vec, plane)) >= 0:
                qsig |= 1 << i
        match = sig == F.lit(qsig)
        cond = match if cond is None else (cond | match)
    cand = df.filter(cond)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), round_digits).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_centroids(df: DataFrame, cell_col: str, vec_col: str, dim: int) -> DataFrame:
    """Per-cell centroid (element-wise mean) — the IVF coarse index.
    posexplode + groupBy(cell, pos) + avg + array rebuild: all built-in."""
    e = df.select(F.col(cell_col), F.posexplode(F.col(vec_col)).alias("pos", "x"))
    means = e.groupBy(cell_col, "pos").agg(F.avg("x").alias("m"))
    return (
        means.groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col(cell_col),
            F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid"),
        )
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 1,
    round_digits: int = 4,
) -> DataFrame:
    """IVF search: rank cells by centroid cosine, scan the best
    ``n_probe`` cells only. Cell assignment can be any categorical
    column (label here) or a previous kmeans pass."""
    dim = len(query_vec)
    cents = ivf_centroids(df, cell_col, vec_col, dim)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    best = [
        r[0]
        for r in cents.select(
            F.col(cell_col), cosine(F.col("centroid"), q).alias("s")
        )
        .orderBy(F.desc("s"))
        .limit(n_probe)
        .collect()
    ]
    cand = df.filter(F.col(cell_col).isin(best))
    return (
        cand.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), round_digits).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
