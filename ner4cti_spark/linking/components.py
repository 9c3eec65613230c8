"""Connected components as a DataFrame fixpoint (no GraphFrames here).

Alternating min-label propagation: each node's label becomes the min of
its own and its neighbors' labels, iterated to fixpoint. Alias clusters
have tiny diameter (≤ ~4), so convergence is a handful of rounds; each
round is one shuffle (groupBy node). `localCheckpoint` truncates the
iterative lineage so plans stay bounded — the same loop runs unchanged
on a real cluster (checkpoint dir instead of local).

SURVEY §4.2: "GraphFrames if available; else a small iterative DataFrame
label-propagation loop (join+min-agg until fixpoint)".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges(src long, dst long) undirected → (node long, component long)
    where component = min node id reachable. Deterministic."""
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # neighbor labels: join edges with current labels on src
        nbr = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonicalize(mentions: DataFrame, pairs: DataFrame) -> DataFrame:
    """mentions(etype, surface, ...) + linked pairs → alias table
    (entity_id, canonical, etype, alias).

    Node ids are deterministic dense ranks over (etype, surface); the
    canonical surface of a component is its most frequent alias
    (mention count desc, surface asc tiebreak). Singleton surfaces form
    their own entity."""
    from pyspark.sql import Window as W

    surf = (
        mentions.groupBy("etype", "surface")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # node id = xxhash64(etype, surface): deterministic AND shuffle-free to
    # assign (a global row_number would funnel through one partition at scale)
    ids = surf.withColumn("node", F.xxhash64("etype", "surface"))
    a = ids.select("etype", F.col("surface").alias("surface_a"), F.col("node").alias("src"))
    b = ids.select("etype", F.col("surface").alias("surface_b"), F.col("node").alias("dst"))
    edges = pairs.join(a, ["etype", "surface_a"]).join(b, ["etype", "surface_b"]).select("src", "dst")
    comp = connected_components(edges)
    labeled = (
        ids.join(comp, ids.node == comp.node, "left")
        .select(
            "etype", "surface", "freq", ids.node.alias("node"),
            F.coalesce(comp.component, ids.node).alias("component"),
        )
    )
    pick = W.partitionBy("component").orderBy(F.desc("freq"), F.asc("surface"))
    canon = labeled.withColumn("canonical", F.first("surface").over(pick))
    return canon.select(
        F.col("component").alias("entity_id"), "canonical", "etype",
        F.col("surface").alias("alias"),
    )
