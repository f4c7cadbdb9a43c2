"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path. Dot products/norms run through
built-in higher-order functions (``zip_with`` + ``aggregate``) — JVM
expression evaluation, bit-exact with DuckDB's list_dot_product (the
fold order is identical), no Python in the loop.

Scale shape: norms are precomputed per row (narrow); the query side is
small and broadcast, so brute-force top-k is a broadcast nested-loop +
per-partition partial top-k — no O(n²) shuffle. The LSH variant turns
that into an equi-join on bucket signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"


def with_norm2(df: DataFrame, vec_col: str = "embedding", out: str = "v") -> DataFrame:
    """Project the float vector to double + attach its squared L2 norm."""
    return df.withColumn(out, F.expr(f"transform({vec_col}, x -> cast(x as double))")).withColumn(
        f"{out}_n2", F.expr(DOT.format(a=out, b=out))
    )


def cosine_col(a: str, b: str, a_n2: str, b_n2: str) -> Column:
    return F.expr(DOT.format(a=a, b=b)) / F.sqrt(F.col(a_n2) * F.col(b_n2))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_q: str = "qid",
    id_c: str = "vec_id",
    widen_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × candidates, windowed rank.

    queries must have columns (qid, qv, qv_n2); candidates (vec_id, v, v_n2).

    The broadcast join preserves the candidate side's partitioning, and
    a small/filtered parquet scan often yields 1-2 partitions — which
    would serialize the O(|q|·|c|) scoring onto 1-2 cores (measured
    8× at sf1: the sampled knn-graph scorer ran 2-wide on a 32-core
    rig). ``widen_to`` opts into repartitioning the candidate side up
    to that width BEFORE the join when the scan under-partitions
    (pass ``sparkContext.defaultParallelism`` for local compute-bound
    scoring); the default None touches neither the plan nor the RDD
    layer, so library callers keep their partitioning and the operator
    stays Spark-Connect-clean (ADVICE r13). On a real cluster a large
    candidate table already carries enough partitions — the widen is
    skipped whenever the scan is at least ``widen_to`` wide."""
    if widen_to is not None and candidates.rdd.getNumPartitions() < widen_to:
        candidates = candidates.repartition(widen_to)
    j = candidates.join(F.broadcast(queries), F.col(id_q) != F.col(id_c))
    j = j.withColumn("cos", cosine_col("qv", "v", "qv_n2", "v_n2"))
    w = Window.partitionBy(id_q).orderBy(F.desc("cos"), F.asc(id_c))
    return (
        j.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select(
            F.col(id_q),
            F.col(id_c).alias("cid"),
            F.round("cos", 4).alias("cos_r"),
            "rn",
        )
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH.

    Prefix-stable: numpy fills ``randn(n, dim)`` row-major from one
    stream, so ``hyperplanes(d, p)`` == the first ``p`` rows of
    ``hyperplanes(d, P)`` for any P ≥ p. adaptive_planes() relies on
    this — an oracle can embed the P=MAX constant matrix and gate each
    bit on ``i < p`` while Spark generates only the p rows it uses."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


# Sizing-rule clamp bounds shared by adaptive_planes() and the SQL CASE
# chain oracles mirror (PERF.md r8: planes ≈ log2(n/target_bucket)).
ADAPTIVE_PLANES_LO = 4
ADAPTIVE_PLANES_HI = 16


def adaptive_planes(n: int, target_bucket: int = 32) -> int:
    """Corpus-sized LSH plane count: the smallest ``p`` with
    ``target_bucket * 2**p >= n``, clamped to [LO, HI].

    This is the PERF.md r8 sizing rule (planes ≈ log2(n/target_bucket))
    made INTEGER-EXACT: bucket occupancy is n/2**p and every in-bucket
    join is quadratic in occupancy, so p must grow with the corpus —
    holding p fixed cost 17.7× wall at 10× data (VERDICT r9 #2). Pure
    integer arithmetic (ceil-div + bit_length, no floating log2) so the
    SQL CASE-chain twin ``adaptive_planes_case_sql`` agrees on every
    borderline count."""
    if n <= target_bucket:
        p = 0
    else:
        p = (-(-n // target_bucket) - 1).bit_length()
    return max(ADAPTIVE_PLANES_LO, min(ADAPTIVE_PLANES_HI, p))


def adaptive_planes_case_sql(n_expr: str, target_bucket: int = 32) -> str:
    """SQL twin of adaptive_planes(): an integer-threshold CASE chain
    (``n <= target*2^p → p``), branch-for-branch equal to the Python
    rule, so a DuckDB oracle can derive the SAME plane count from
    ``count(*)`` that the Spark plan derived driver-side."""
    branches = "\n  ".join(
        f"WHEN {n_expr} <= {target_bucket * (1 << p)} THEN {p}"
        for p in range(ADAPTIVE_PLANES_LO, ADAPTIVE_PLANES_HI)
    )
    return f"(CASE {branches}\n  ELSE {ADAPTIVE_PLANES_HI} END)"


def lsh_bucket_col(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-bucket id: bit i = 1 iff v · plane_i > 0 (pure SQL exprs)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = f"array({','.join(f'cast({x} as double)' for x in plane)})"
        dot = F.expr(DOT.format(a=vec_col, b=arr))
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def kmeans_centroids(
    emb: DataFrame, k: int = 8, iters: int = 5, id_col: str = "vec_id", vec: str = "v"
) -> list[list[float]]:
    """Tiny k-means coarse quantizer for IVF, as an iterative DataFrame
    computation: assignment is a broadcast argmin over centroids
    (narrow), the update is one groupBy over (cluster, dim). Only the
    k×dim centroid matrix ever reaches the driver — at 100 TB the data
    side stays distributed and each iteration is one shuffle of
    k×dim partial sums per partition.

    Deterministic: initialized from the k lowest ids.
    """
    first = (
        emb.orderBy(id_col).limit(k).select(vec).collect()
    )
    centroids = [list(r[vec]) for r in first]
    for _ in range(iters):
        assigned = emb.withColumn("cluster", _nearest_centroid_col(vec, centroids))
        dims = assigned.select(
            "cluster", F.posexplode(F.col(vec)).alias("dim", "val")
        )
        rows = (
            dims.groupBy("cluster", "dim")
            .agg(F.avg("val").alias("c"))
            .collect()
        )
        new = {c: list(cent) for c, cent in enumerate(centroids)}
        for r in rows:
            new.setdefault(r.cluster, list(centroids[r.cluster]))[r.dim] = r.c
        centroids = [new[c] for c in sorted(new)]
    return centroids


# Above this k, the literal-expression argmin is replaced by the
# vectorized Arrow path: the expression embeds k×dim literal doubles in
# the PLAN, so with the SemDeDup sizing rule k ∝ n the plan itself
# grows with the corpus (measured: k=81 over 64-dim = ~5k literal
# nodes, re-analyzed per k-means iteration — 13× wall blow-up at 10×).
_EXPR_ARGMIN_MAX_K = 16


def _nearest_centroid_col(vec: str, centroids: list[list[float]]) -> Column:
    """argmin over squared distance to each centroid.

    Two shapes, picked by k:

    * k ≤ 16 — pure JVM exprs. A ``when(d_i < best)`` chain embeds the
      running best TWICE per step (condition + otherwise), so the
      expression tree doubles per centroid — with 8 centroids × 64-dim
      distance lambdas that was a 2^8-node interpreted tree per row.
      ``array_min`` over ``struct(d, i)`` is linear-size and keeps
      identical tie semantics (lexicographic struct order = min
      distance, then lowest index — the same earliest-index-wins the
      strict-< chain had, and the same ordering the nprobe ranking
      uses via array_sort).
    * k > 16 — vectorized Arrow pandas UDF: one BLAS matmul per batch
      (argmin of c² − 2x·c; x² is constant per row), centroid matrix
      shipped once per task via closure. Plan size is O(1) regardless
      of k, so the SemDeDup rule k ∝ n no longer grows the plan.
      np.argmin also breaks ties at the lowest index. This is the
      documented UDF exception: per-row work is O(k·dim) arithmetic,
      and batched BLAS beats a k×dim-literal codegen expression well
      before k=100.
    """
    if len(centroids) <= _EXPR_ARGMIN_MAX_K:
        ds = []
        for i, cent in enumerate(centroids):
            arr = f"array({','.join(f'cast({x} as double)' for x in cent)})"
            d = F.expr(
                f"aggregate(zip_with({vec}, {arr}, (x, y) -> (x - y) * (x - y)), "
                "cast(0 as double), (acc, x) -> acc + x)"
            )
            ds.append(F.struct(d.alias("d"), F.lit(i).alias("cell")))
        return F.array_min(F.array(*ds))["cell"].cast("int")
    return _nearest_centroid_vectorized(vec, centroids)


def _nearest_centroid_vectorized(vec: str, centroids: list[list[float]]) -> Column:
    cent = np.asarray(centroids, dtype=np.float64)  # k×dim
    cent_t = cent.T.copy()
    c_n2 = (cent * cent).sum(axis=1)

    @F.pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(row, dtype=np.float64) for row in v])
        if x.size == 0:
            return pd.Series([], dtype="int32")
        d = c_n2[None, :] - 2.0 * (x @ cent_t)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return _cell(F.col(vec))


def ann_topk_ivf(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 2,
    iters: int = 3,
) -> DataFrame:
    """IVF approximate top-k: assign vectors to k-means cells; each
    query probes only its ``nprobe`` nearest cells. At scale, the cell
    id becomes the table's bucketing key (classic IVF layout): candidate
    generation is an equi-join on cell, touching nprobe/n_clusters of
    the data. (A persist() of the normed corpus across the k-means
    iterations was measured and rejected — recomputing the narrow
    projection was never the cost; the argmin expression shape was,
    see _nearest_centroid_col.)"""
    base = with_norm2(emb)
    centroids = kmeans_centroids(base, k=n_clusters, iters=iters)
    cell = _nearest_centroid_col("v", centroids)
    data = base.withColumn("cell", cell)
    # nprobe nearest cells per query: rank cells by distance
    dists = []
    for i, cent in enumerate(centroids):
        arr = f"array({','.join(f'cast({x} as double)' for x in cent)})"
        dists.append(
            F.struct(
                F.expr(
                    f"aggregate(zip_with(v, {arr}, (x, y) -> (x - y) * (x - y)), "
                    "cast(0 as double), (acc, x) -> acc + x)"
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
        )
    probe_cells = F.slice(F.array_sort(F.array(*dists)), 1, nprobe)
    q = (
        data.where(query_pred)
        .withColumn("probe", F.explode(probe_cells))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("v_n2").alias("qv_n2"),
            F.col("probe.cell").alias("qcell"),
        )
    )
    j = data.join(
        F.broadcast(q), (F.col("cell") == F.col("qcell")) & (F.col("qid") != F.col("vec_id"))
    )
    j = j.withColumn("cos", cosine_col("qv", "v", "qv_n2", "v_n2"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        j.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select("qid", F.col("vec_id").alias("cid"), F.round("cos", 4).alias("cos_r"), "rn")
    )


def ann_topk_lsh(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_planes: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Recall is tunable via n_planes (fewer planes → bigger buckets).
    At scale, bucket id becomes the shuffle/bucketing key — candidate
    generation is an equi-join instead of a cross product.

    SIZING RULE (measured, tools/scale_smoke.py): bucket occupancy is
    n/2^n_planes and any in-bucket join is quadratic in occupancy, so
    n_planes must grow with the corpus — the default (n_planes=None)
    derives it from a count-star via adaptive_planes(), the integer
    form of n_planes ≈ log2(n / target_bucket_size). Holding n_planes
    fixed while the corpus grows 10× costs ~100× in the bucket join;
    re-deriving it per corpus keeps per-row cost flat (same knob as
    MinHash bands / ER blocking keys).
    """
    if n_planes is None:
        n_planes = adaptive_planes(emb.count())
    planes = hyperplanes(dim, n_planes)
    base = with_norm2(emb).withColumn("bucket", lsh_bucket_col("v", planes))
    q = base.where(query_pred).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("v_n2").alias("qv_n2"),
        F.col("bucket").alias("qbucket"),
    )
    j = base.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col("qid") != F.col("vec_id")))
    j = j.withColumn("cos", cosine_col("qv", "v", "qv_n2", "v_n2"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        j.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select("qid", F.col("vec_id").alias("cid"), F.round("cos", 4).alias("cos_r"), "rn")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — round 8


def pq_train_codebooks(
    base: DataFrame, m: int = 8, ksub: int = 16, iters: int = 3, dim: int = 64
) -> list[list[list[float]]]:
    """Train per-subspace k-means codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", public): split the
    dim-vector into ``m`` subvectors and cluster each subspace into
    ``ksub`` centroids. Returns ``codebooks[j][c] = centroid`` —
    m × ksub × (dim/m) floats, the ONLY state that reaches the driver.

    Scale note: production PQ trains on a bounded sample (codebooks
    converge on ~100k vectors regardless of corpus size); pass a
    ``.sample()``d frame for that. Each subspace reuses the distributed
    k-means (broadcast argmin + one groupBy per iteration)."""
    dsub = dim // m
    codebooks = []
    for j in range(m):
        sub = base.select(
            "vec_id", F.expr(f"slice(v, {j * dsub + 1}, {dsub})").alias("v")
        )
        codebooks.append(kmeans_centroids(sub, k=ksub, iters=iters))
    return codebooks


def pq_codes_col(vec: str, codebooks: list[list[list[float]]]) -> Column:
    """array<int> column of per-subspace centroid assignments — the
    m-byte PQ code (32× compression of a 64-dim float vector). Pure JVM
    expressions; at 100 TB this is the column you materialize next to
    doc ids while the raw embeddings stay cold."""
    dsub = len(codebooks[0][0])
    parts = []
    for j, book in enumerate(codebooks):
        sub = f"slice({vec}, {j * dsub + 1}, {dsub})"
        ds = []
        for c, cent in enumerate(book):
            arr = f"array({','.join(f'cast({x} as double)' for x in cent)})"
            d = F.expr(
                f"aggregate(zip_with({sub}, {arr}, (x, y) -> (x - y) * (x - y)), "
                "cast(0 as double), (acc, x) -> acc + x)"
            )
            ds.append(F.struct(d.alias("d"), F.lit(c).alias("c")))
        parts.append(F.array_min(F.array(*ds))["c"].cast("int"))
    return F.array(*parts)


def _pq_query_table_col(vec: str, codebooks: list[list[list[float]]]) -> Column:
    """array<array<double>> ADC lookup table for a query vector:
    tab[j][c] = ||q_j − codebook[j][c]||². m × ksub doubles per query —
    tiny, and the query side is broadcast."""
    dsub = len(codebooks[0][0])
    rows = []
    for j, book in enumerate(codebooks):
        sub = f"slice({vec}, {j * dsub + 1}, {dsub})"
        cells = []
        for cent in book:
            arr = f"array({','.join(f'cast({x} as double)' for x in cent)})"
            cells.append(
                F.expr(
                    f"aggregate(zip_with({sub}, {arr}, (x, y) -> (x - y) * (x - y)), "
                    "cast(0 as double), (acc, x) -> acc + x)"
                )
            )
        rows.append(F.array(*cells))
    return F.array(*rows)


def ann_topk_pq(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    dim: int = 64,
    rerank_shortlist: int | None = None,
) -> DataFrame:
    """PQ asymmetric-distance ANN: corpus vectors are m-byte codes;
    queries stay exact and rank candidates by ADC = Σ_j tab[j][code_j]
    (a table lookup per subspace instead of a dim-length dot product).

    ``rerank_shortlist`` enables the standard production two-stage
    shape: ADC ranks a shortlist of that size from codes alone, then
    ONLY the shortlist rows fetch their raw vectors for an exact-L2
    rerank to top-k. Measured on the fixture (random-ish embeddings,
    the hard case for PQ — distances concentrate): raw ADC top-5
    recall vs exact L2 is 0.26, shortlist-100 + rerank lifts it to
    0.84 while still scanning only the 8-byte codes.

    Scale shape: the scan side touches ONLY the code column (m bytes/
    row — the raw vectors never leave cold storage; the rerank fetch
    is a shortlist-sized semi-join), queries broadcast with their
    m×ksub-double lookup tables, and the per-row work is m array
    lookups. The classic 100 TB layout composes this with IVF (probe
    cells, then ADC within the cell); cells are orthogonal here and
    covered by ann_topk_ivf. An exact duplicate of a query quantizes
    to the argmin cell in every subspace, so its ADC equals the global
    minimum Σ_j min_c tab[j][c] and survives any shortlist; after
    rerank its exact distance is 0 → rank 1 — the planted-recall
    contract q_sim_ann_pq pins."""
    base = with_norm2(emb)
    codebooks = pq_train_codebooks(base, m=m, ksub=ksub, iters=iters, dim=dim)
    data = base.select("vec_id", pq_codes_col("v", codebooks).alias("codes"))
    q = base.where(query_pred).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        _pq_query_table_col("v", codebooks).alias("qtab"),
    )
    j = data.join(F.broadcast(q.select("qid", "qtab")), F.col("qid") != F.col("vec_id"))
    adc = F.expr(
        "aggregate(zip_with(codes, qtab, (c, t) -> element_at(t, c + 1)), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("vec_id"))
    shortlist = j.withColumn("adc", adc).withColumn(
        "rn", F.row_number().over(w).cast("long")
    )
    if rerank_shortlist is None:
        return shortlist.where(F.col("rn") <= k).select(
            "qid", F.col("vec_id").alias("cid"), F.round("adc", 4).alias("adc_r"), "rn"
        )
    cands = shortlist.where(F.col("rn") <= rerank_shortlist).select("qid", "vec_id")
    # fetch raw vectors for shortlist rows only; exact L2 rerank
    fetched = cands.join(base.select("vec_id", "v"), "vec_id").join(
        F.broadcast(q.select("qid", "qv")), "qid"
    )
    l2 = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )
    w2 = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("vec_id"))
    return (
        fetched.withColumn("d", l2)
        .withColumn("rn", F.row_number().over(w2).cast("long"))
        .where(F.col("rn") <= k)
        .select("qid", F.col("vec_id").alias("cid"), F.round("d", 4).alias("adc_r"), "rn")
    )


def knn_graph(nodes: DataFrame, k: int = 5, widen_to: int | None = None) -> DataFrame:
    """Mutual k-NN graph over a node set (vec_id, embedding): an
    undirected edge (id_a < id_b, cos_r) exists iff each endpoint is in
    the other's exact cosine top-k. The mutual filter is the standard
    symmetrization for clustering/SemDeDup-style pipelines — one-sided
    kNN edges from hub nodes (near-everything's neighbor) vanish unless
    the hub reciprocates, so cluster boundaries stay crisp.

    Shape: exact top-k via brute_force_topk (broadcast the node set,
    per-partition window rank — the node set is a designated sample, so
    the broadcast side is bounded by construction); the mutual filter
    is a self EQUI-join of the directed top-k list on the reversed key
    pair, O(n·k) rows, never O(n²). For full-corpus graphs swap the
    candidate generator for ann_topk_ivf/ann_topk_lsh — the
    symmetrization is identical.
    """
    base = with_norm2(nodes)
    q = base.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("v_n2").alias("qv_n2"),
    )
    directed = brute_force_topk(q, base, k=k, widen_to=widen_to).select(
        "qid", "cid", "cos_r"
    )
    rev = directed.select(
        F.col("cid").alias("qid"), F.col("qid").alias("cid")
    )
    return (
        directed.join(rev, ["qid", "cid"])
        .where(F.col("qid") < F.col("cid"))
        .select(
            F.col("qid").alias("id_a"), F.col("cid").alias("id_b"), "cos_r"
        )
    )
