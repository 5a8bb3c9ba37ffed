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


def _table_signatures(
    vec_col: str, dim: int, n_planes: int, n_tables: int, seed: int
) -> Column:
    """array of ``n_tables`` independent random-hyperplane sign
    signatures (each ``n_planes`` bits) for one vector — the
    multi-table LSH construction ``lsh_topk`` documents, reused for
    within-cell sub-blocking."""
    sigs = []
    for t in range(n_tables):
        sig = F.lit(0)
        for i in range(n_planes):
            plane = F.array(
                *[F.lit(x) for x in _pseudo_plane(dim, t * 1000 + i, seed)]
            )
            sig = sig + F.when(
                dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        # long, not int: recursive refinement appends bits per level
        sigs.append(sig.cast("long"))
    return F.array(*sigs)


def pairwise_topk_within(
    df: DataFrame,
    partition_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    round_digits: int = 4,
    max_cell_rows: int | None = None,
    sim_expr=None,
    subblock_tables: int = 8,
    subblock_seed: int = 7,
) -> DataFrame:
    """Embedding near-duplicate pairs within a coarse partition
    (label/IVF cell): equi-join on the partition column bounds the
    quadratic blow-up to cell size.

    ``max_cell_rows`` caps that bound at scale. Cells within the cap
    pair EXACTLY (the oracle-checked path). Cells over the cap are
    SUB-BLOCKED instead of brute-forced (a 10M-row cell is 10^14
    pairs): ``subblock_tables`` independent random-hyperplane LSH
    signatures split each oversized cell into sub-buckets sized below
    the cap, pairs are scored within (cell, table, sub-bucket) — one
    posexplode + ONE self-join, never all-pairs — and deduped across
    tables. Near-identical pairs (the ≥0.99-cosine regime this
    operator targets) land in the same sub-bucket in at least one
    table with probability ≈ 1-(1-p^m)^L, p = 1-θ/π — miss rate
    ~1e-3 at θ≈0.14 rad with the defaults — so the oversized path is
    high-recall approximate, not silently empty. A sub-bucket that
    STILL exceeds the cap (a mass of bit-identical vectors that no
    hyperplane can split — run exact dedup first) is excluded loudly.

    ``sim_expr`` overrides the similarity expression (two array
    columns → score column) — e.g. a decimal-math cosine whose
    rounding is bit-exact against a SQL oracle."""
    sim_of = (
        sim_expr
        if sim_expr is not None
        else lambda va, vb: F.round(cosine(va, vb), round_digits)
    )

    def _pairs(d: DataFrame, keys: list[str]) -> DataFrame:
        a = d.select(
            *keys, F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        )
        b = d.select(
            *keys, F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        )
        return (
            a.join(b, keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("sim", sim_of(F.col("va"), F.col("vb")))
            .filter(F.col("sim") >= threshold)
            .select(partition_col, "id_a", "id_b", "sim")
        )

    if max_cell_rows is None:
        return _pairs(df, [partition_col])

    sizes = df.groupBy(partition_col).count()
    stat = sizes.agg(
        F.max(F.when(F.col("count") > max_cell_rows, F.col("count"))).alias("mx"),
        F.sum(
            F.when(F.col("count") > max_cell_rows, 1).otherwise(0)
        ).alias("nbig"),
    ).first()
    small = df.join(
        sizes.filter(F.col("count") <= max_cell_rows).select(partition_col),
        partition_col,
        "left_semi",
    )
    out = _pairs(small, [partition_col])
    if not stat["nbig"]:
        return out

    import logging
    import math

    # enough planes that an expected random sub-bucket lands under the
    # cap with 2x headroom; driver-side scalars only (O(cells) agg)
    n_planes = max(1, math.ceil(math.log2(stat["mx"] / max_cell_rows)) + 1)
    logging.getLogger("delta_spark.similarity").info(
        "pairwise_topk_within: sub-blocking %d oversized cell(s) "
        "(max %d rows > cap %d) with %d LSH tables x %d planes",
        stat["nbig"], stat["mx"], max_cell_rows, subblock_tables, n_planes,
    )
    big = df.join(
        sizes.filter(F.col("count") > max_cell_rows).select(partition_col),
        partition_col,
        "left_semi",
    )
    bigx = _subblock(
        big, partition_col, id_col, vec_col, max_cell_rows,
        n_planes=n_planes, n_tables=subblock_tables, seed=subblock_seed,
    )
    # sim is deterministic per pair, so distinct over all 4 columns
    # dedups the cross-table repeats without a second aggregation
    big_pairs = _pairs(bigx, [partition_col, "__sb_tbl", "__sb"]).distinct()
    return out.unionByName(big_pairs)


def _subblock(
    big: DataFrame,
    partition_col: str,
    id_col: str,
    vec_col: str,
    max_cell_rows: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    max_depth: int = 3,
) -> DataFrame:
    """LSH sub-blocking for oversized cells, RECURSIVE: rows get a
    per-table sign signature ``__sb``; any (cell, table, sub-bucket)
    group still over the cap is re-split with ``n_planes`` FRESH
    hyperplanes appended to its signature (seed offset per level), up
    to ``max_depth`` refinements. Groups that survive every level
    (bit-identical vector mass no hyperplane can split — run exact
    dedup first) are excluded LOUDLY. Each level costs one O(rows)
    aggregation; the group-size check is the same grouping the pair
    join uses, so a bound proven here bounds the join itself."""
    import logging

    dim = big.select(F.size(vec_col)).first()[0]
    keys = [partition_col, "__sb_tbl", "__sb"]
    bigx = big.select(
        partition_col,
        id_col,
        vec_col,
        F.posexplode(
            _table_signatures(vec_col, dim, n_planes, n_tables, seed)
        ).alias("__sb_tbl", "__sb"),
    )
    for depth in range(1, max_depth + 1):
        sub_sizes = bigx.groupBy(*keys).count()
        stuck = sub_sizes.filter(F.col("count") > max_cell_rows)
        n_stuck = stuck.count()
        if not n_stuck:
            return bigx
        logging.getLogger("delta_spark.similarity").info(
            "pairwise_topk_within: %d sub-bucket(s) over cap %d at "
            "level %d — re-splitting with %d fresh planes",
            n_stuck, max_cell_rows, depth, n_planes,
        )
        ok = bigx.join(
            sub_sizes.filter(F.col("count") <= max_cell_rows).select(*keys),
            keys, "left_semi",
        )
        redo = bigx.join(stuck.select(*keys), keys, "left_semi")
        extra = F.element_at(
            _table_signatures(
                vec_col, dim, n_planes, n_tables, seed + depth * 7919
            ),
            F.col("__sb_tbl") + 1,
        )
        redo = redo.withColumn(
            "__sb",
            F.shiftleft(F.col("__sb"), n_planes) + extra,
        )
        bigx = ok.unionByName(redo).localCheckpoint(eager=False)
    sub_sizes = bigx.groupBy(*keys).count()
    n_stuck = sub_sizes.filter(F.col("count") > max_cell_rows).count()
    if n_stuck:
        logging.getLogger("delta_spark.similarity").warning(
            "pairwise_topk_within: %d sub-bucket(s) still exceed "
            "max_cell_rows=%d after %d LSH refinement levels "
            "(unsplittable duplicate mass — run exact dedup first); "
            "excluded",
            n_stuck, max_cell_rows, max_depth,
        )
        bigx = bigx.join(
            sub_sizes.filter(F.col("count") <= max_cell_rows).select(*keys),
            keys, "left_semi",
        )
    return bigx


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
    (tests/test_ann_recall.py pins the floor).

    Plan shape: the candidate test is L·m interpreted higher-order
    dot products per row — by far the heaviest part of the probe — and
    it lives in a FILTER, which the optimizer will happily push below
    any upstream exchange back onto the raw scan (where a single-file
    input means a single task does all of it). The projected source is
    therefore lineage-barriered (``localCheckpoint``) so the predicate
    provably executes on the distributed partitions, and the whole
    condition is assembled as ONE SQL string — one parse instead of
    thousands of per-literal driver round trips (the expression-build
    cost itself was ~2 s measured at 8 tables x 4 planes x 64 dims).
    The arithmetic is byte-identical to the Column form: same
    zip_with/aggregate fold, same cast order, same plane constants."""
    dim = len(query_vec)
    src = df.select(id_col, vec_col).localCheckpoint(eager=False)
    conds = []
    for t in range(n_tables):
        bits = []
        for i in range(n_planes):
            plane = _pseudo_plane(dim, t * 100 + i, seed)
            qbit = sum(float(a) * b for a, b in zip(query_vec, plane)) >= 0
            arr = ", ".join(repr(float(x)) for x in plane)
            dot_sql = (
                f"aggregate(zip_with(`{vec_col}`, array({arr}), "
                "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            bits.append(
                f"(({dot_sql}) >= 0) = {'true' if qbit else 'false'}"
            )
        conds.append("(" + " AND ".join(bits) + ")")
    cand = src.filter(F.expr(" OR ".join(conds)))
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
