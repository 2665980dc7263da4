"""Graph analytics: PageRank over an edge list (fixed-iteration,
deterministic). Complements the iterative connected components in
operators/dedup.py:266.

Determinism: per-edge contributions r(u)/deg(u) are doubles computed
identically on any engine; the per-node SUM casts each contribution
to DECIMAL first (a binary double never lands on a decimal rounding
boundary, so the cast is engine- and order-independent) and divides/
damps once in double after. With that, a fixed iteration count gives
bit-stable ranks under any partitioning — replayable in plain SQL.

At scale: ranks live in a node-keyed frame, edges shuffle once per
iteration on src then dst (the classic Pregel-on-DataFrames shape);
the node frame is localCheckpoint'ed per round so lineage stays flat.
Teleport handles nodes with no in-edges via a left join, not a union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAMPING = 0.85


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 3, damping: float = DAMPING,
             undirected: bool = True) -> DataFrame:
    """Fixed-`iters` PageRank. Returns (node, rank) for every node —
    including, in the directed case, sink nodes (no out-edges), which
    earlier versions silently dropped from the node set. Sinks use
    the simplified dangling treatment (their mass is not
    redistributed), the common fixed-iteration variant.

    `undirected=True` mirrors each edge. Parallel edges should be
    deduped by the caller if they shouldn't weight the walk.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if undirected:
        e = e.union(edges.select(F.col(dst).alias("s"),
                                 F.col(src).alias("d")))
    # materialize the edge list once — it is re-read every iteration
    # (and for deg/nodes); without this the upstream plan (often an
    # expensive self-join) re-executes per round.
    e = e.distinct().localCheckpoint()
    nodes = (e.select(F.col("s").alias("node"))
             .union(e.select(F.col("d").alias("node"))).distinct())
    n = nodes.count()  # scalar cardinality only — O(1) driver state
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (e.join(ranks, e.s == ranks.node)
                   .join(deg, "s")
                   .select("d", (F.col("rank") / F.col("deg"))
                           .alias("c")))
        summed = (contrib.groupBy("d")
                  .agg(F.sum(F.col("c").cast("decimal(28,15)"))
                       .cast("double").alias("in_sum")))
        ranks = (nodes.join(summed, nodes.node == summed.d, "left")
                 .select("node",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping)
                          * F.coalesce(F.col("in_sum"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint())
    return ranks


def triangles(edges: DataFrame, src: str = "src",
              dst: str = "dst") -> DataFrame:
    """Exact triangle enumeration via DEGREE-ORDERED ORIENTATION — the
    standard distributed-triangle trick: direct every undirected edge
    from its lower-(degree, id) endpoint to the higher one, so each
    node's out-degree is bounded (a hub with degree d keeps at most
    the edges to even-bigger hubs) and the wedge self-join is
    Σ out-deg(u)² instead of Σ deg(u)² — on power-law graphs the
    difference between feasible and not. Each triangle has exactly
    one node with two out-edges under an acyclic total order, so
    every triangle is produced exactly once, then closed by one
    semi-ish join back to the oriented edge set. Three shuffles
    total (degree, wedge join, closure join).

    Input: one row per undirected edge. Output: (a, b, c) with
    a < b < c — canonical, order-insensitively comparable.
    """
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    e = (sym
         .join(deg.withColumnRenamed("deg", "du"), "u")
         .join(deg.select(F.col("u").alias("v"),
                          F.col("deg").alias("dv")), "v")
         .where((F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv"))
                   & (F.col("u") < F.col("v"))))
         .select("u", "v"))
    wedges = (e.join(e.select("u", F.col("v").alias("w")), "u")
              .where(F.col("v") != F.col("w")))
    closed = wedges.join(
        e.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"])
    tri = F.array_sort(F.array("u", "v", "w"))
    return closed.select(tri[0].alias("a"), tri[1].alias("b"),
                         tri[2].alias("c"))


def personalized_pagerank(edges: DataFrame, seeds: list[int],
                          src: str = "src", dst: str = "dst",
                          iters: int = 3,
                          damping: float = DAMPING) -> DataFrame:
    """Personalized PageRank: the teleport mass returns to the SEED
    set instead of spreading uniformly — the similar-items /
    recommendation primitive ("parts related to THESE parts"). Same
    fixed-iteration shape as :func:`pagerank` (decimal-summed
    contributions, one checkpointed edge list), differing only in
    the restart vector: (1−d)·1/|seeds| on seed nodes, 0 elsewhere,
    and rank seeds at 1/|seeds|. Rounds are the scale currency;
    per-round cost is one edge join + one key shuffle."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = e.union(edges.select(F.col(dst).alias("s"),
                             F.col(src).alias("d")))
    e = e.distinct().localCheckpoint()
    nodes = e.select(F.col("s").alias("node")).distinct()
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    is_seed = F.col("node").isin([int(x) for x in seeds])
    base = F.when(is_seed, F.lit(1.0 / len(seeds))).otherwise(F.lit(0.0))
    ranks = nodes.withColumn("rank", base)
    restart = F.when(is_seed,
                     F.lit((1.0 - damping) / len(seeds))) \
        .otherwise(F.lit(0.0))
    for _ in range(iters):
        contrib = (e.join(ranks, e.s == ranks.node)
                   .join(deg, "s")
                   .select("d", (F.col("rank") / F.col("deg"))
                           .alias("c")))
        summed = (contrib.groupBy("d")
                  .agg(F.sum(F.col("c").cast("decimal(28,15)"))
                       .cast("double").alias("in_sum")))
        ranks = (nodes.join(summed, nodes.node == summed.d, "left")
                 .select("node",
                         (restart + F.lit(damping)
                          * F.coalesce(F.col("in_sum"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint())
    return ranks
