"""Distributed connected components over candidate-pair edge lists.

The last stage of every real near-dup pipeline: pair finders (exact
hash, MinHash-LSH banding, SimHash pigeonholes — `operators/dedup.py`)
emit EDGES, but the keep/drop decision needs CLUSTERS — a doc that is
a near-dup of A under one band and of B under another must transitively
collapse A, B and itself into one group with a single canonical
survivor. The reference connector has no graph stage (it is a CDC
source); this operator exists for the training-data-pipeline surface
(SURVEY.md §2.3 north star), where multi-key blocking + union-find is
the standard entity-resolution / dedup-clustering shape.

Algorithm: synchronized min-label propagation with pointer jumping
(label(v) ← label(label(v)) each round), the classic Shiloach-Vishkin
style PRAM scheme that MapReduce/Spark CC implementations (e.g. the
"large-star/small-star" family, Kiveris et al., and GraphFrames'
default) build on. Everything is hash-partitioned joins and partial
aggregates:

- per round, ONE shuffle of the (symmetrized) edge list joined to the
  current labels, a map-side-combined `min` per dst, and a self-join
  for the pointer jump — no driver-side graph state, no collect;
- pointer jumping makes the round count O(log diameter), so a chain of
  10^6 docs converges in ~20 rounds, not 10^6;
- lineage is truncated every round with `localCheckpoint` (iterative
  join plans otherwise grow exponentially and re-execute from the
  source each action). On a real cluster prefer
  `spark.sparkContext.setCheckpointDir` + `.checkpoint()` so the
  cut survives executor loss; localCheckpoint is the single-JVM
  equivalent and keeps this testable on local[n].

At 100 TB the edge list — not the corpus — is the working set: pair
finders emit (id, id) longs, so the per-round shuffle is
O(|edges| × 16 bytes), independent of document payload size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return ``(id, component)`` where component = min node id reachable
    from ``id`` over the undirected edge set.

    ``nodes`` supplies the full vertex set (isolated vertices become
    singleton components); ``edges`` is directed input and is
    symmetrized here. Converges when a full round changes no label —
    with pointer jumping that is O(log diameter) rounds, each round
    costing one edge-shuffle + one label self-join. Raises if
    ``max_iter`` rounds pass without convergence (a correctness error,
    never silently-partial labels).
    """
    sym = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    sym = sym.unionAll(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # The edge list is re-scanned every round: materialize it once.
    sym = sym.localCheckpoint()

    labels = nodes.select(F.col(id_col).alias("id")).distinct().withColumn(
        "lab", F.col("id")
    )
    labels = labels.localCheckpoint()

    for _ in range(max_iter):
        # min label over in-neighbors; map-side combine keeps the
        # shuffle at one (dst, partial-min) row per partition per dst.
        nbr = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lab").alias("nlab"))
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.col("lab").alias("prev"),
            F.least("lab", F.coalesce("nlab", "lab")).alias("lab"),
        )
        # Pointer jump: lab ← lab(lab). Every label IS a node id, so the
        # inner self-join is total; this is what collapses chains in
        # O(log) rounds instead of O(diameter).
        jumped = stepped.alias("a").join(
            stepped.select(
                F.col("id").alias("_jid"), F.col("lab").alias("_jlab")
            ).alias("b"),
            F.col("a.lab") == F.col("b._jid"),
        ).select("a.id", "a.prev", F.col("b._jlab").alias("lab"))
        jumped = jumped.localCheckpoint()  # eager: one pass computes the round
        labels = jumped.select("id", "lab")
        if jumped.where(F.col("lab") != F.col("prev")).limit(1).count() == 0:
            return labels.select("id", F.col("lab").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
