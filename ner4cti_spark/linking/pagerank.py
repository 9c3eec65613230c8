"""PageRank over the entity co-occurrence graph — DataFrame power
iteration (the GraphFrames-free analog, like components.py).

Each iteration is one join + one aggregation; ranks and the (static)
out-degree edge table stay partitioned on the same key, so iterations
reuse the exchange. Dangling mass is redistributed uniformly, matching
the standard formulation; deterministic for a fixed iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85, n_iter: int = 15,
             n_partitions: int = 8) -> DataFrame:
    """edges(src long, dst long) directed → (node long, rank double),
    ranks summing to ~1. Undirected graphs: pass both directions."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(n_partitions, "node")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    contrib_edges = (
        edges.join(out_deg, "src")
        .select("src", "dst", (1.0 / F.col("deg")).alias("w"))
        .repartition(n_partitions, "src")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        ).persist()
        # dangling mass = rank held by nodes with no outgoing edges. Ranks
        # sum to exactly 1 each iteration (n·base + d·(inflow+dangling) =
        # (1−d) + d·1), so dangling = 1 − Σ inflow — computed INSIDE the
        # plan as a broadcast 1-row aggregate instead of a per-iteration
        # driver collect (the old left-anti + collect serialized 15 small
        # blocking jobs into the pipeline tail).
        total_in = F.broadcast(
            contrib.agg(F.coalesce(F.sum("inflow"), F.lit(0.0)).alias("_total_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(total_in)
            .select(
                "node",
                (
                    F.lit(base)
                    + damping * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + (1.0 - F.col("_total_in")) / n
                    )
                ).alias("rank"),
            )
            .repartition(n_partitions, "node")
            .localCheckpoint(eager=True)
        )
        contrib.unpersist(blocking=False)
    return ranks


def entity_pagerank(triples: DataFrame, **kw) -> DataFrame:
    """Rank canonical entities by co-occurrence centrality: the
    co_occurs_with triples as an undirected graph, node ids hashed."""
    cooc = triples.filter(F.col("pred") == "co_occurs_with").select(
        F.xxhash64("subj").alias("src"), F.xxhash64("obj").alias("dst"),
        F.col("subj").alias("s_name"), F.col("obj").alias("o_name"),
    )
    edges = (
        cooc.select("src", "dst")
        .union(cooc.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    names = (
        cooc.select(F.col("src").alias("node"), F.col("s_name").alias("entity"))
        .union(cooc.select(F.col("dst").alias("node"), F.col("o_name").alias("entity")))
        .distinct()
    )
    ranks = pagerank(edges, **kw)
    return (
        ranks.join(names, "node")
        .select("entity", (F.floor(F.col("rank") * 1e8 + 0.5) / 1e8).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("entity"))
    )
