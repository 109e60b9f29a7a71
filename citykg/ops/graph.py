"""Graph algorithms over the triple table (reference agents G1-G4):
PageRank, unweighted shortest paths, plus the connected components in
citykg.canon. All iterative DataFrame joins — no GraphFrames dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triples_to_edges(triples: DataFrame) -> DataFrame:
    """s-p-o triples with IRI objects -> (src, dst) edge list
    (PageRankTask builds the JUNG graph the same way, PageRankTask.java:66-77)."""
    return (
        triples.where(F.col("obj_type") == "iri")
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    alpha: float = 0.3,
    max_iter: int = 15,
    tol: float = 1e-6,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank with jump probability alpha (the reference runs JUNG's
    PageRank with alpha=0.3, PageRankTask.java:78-80). Returns (id, rank),
    sum(rank) == 1. Dangling mass is redistributed uniformly.

    Each iteration: one join (rank -> out-edges) + one sum-aggregate; both
    map-side combinable. persist + localCheckpoint keeps lineage flat.
    """
    # materialize the static sides ONCE — every iteration re-reading the
    # upstream lineage (e.g. a full extraction plan) turns O(iters) into
    # O(iters x extract); at 100 TB the edge list is a checkpointed table
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(eager=True)
    has_out = deg.select(F.col("src").alias("id"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for i in range(max_iter):
        ranks = ranks.localCheckpoint(eager=True)
        contrib = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling nodes (no out-edges) leak their rank: redistribute
        dangling = (
            ranks.join(has_out, "id", "left_anti").agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        base = alpha / n + (1 - alpha) * dangling / n
        new_ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(1 - alpha) * F.coalesce("inflow", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.withColumnRenamed("rank", "nr")
            .join(ranks, "id")
            .agg(F.sum(F.abs(F.col("nr") - F.col("rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks


def shortest_paths(edges: DataFrame, source: str, max_hops: int = 15) -> DataFrame:
    """Unweighted BFS distances from `source`
    (UnweightedShortestPathTask.java:80 analog). Returns (id, dist)."""
    sym = edges.select("src", "dst").union(edges.select(F.col("dst"), F.col("src"))).distinct()
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(source, 0)], "id string, dist int")
    visited = frontier

    for hop in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited
