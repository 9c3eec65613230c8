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


DRIVER_THRESHOLD = 2_000_000


def connected_components(edges: DataFrame, max_iter: int = 20,
                         n_partitions: int = 8,
                         driver_threshold: int = DRIVER_THRESHOLD,
                         probe_rows: list | None = None) -> DataFrame:
    """edges(src long, dst long) undirected → (node long, component long),
    component = min reachable node id. Deterministic.

    Physical strategy is size-adaptive, like AQE picking a broadcast
    join: alias graphs are vocabulary-sized (distinct linked surfaces),
    orders of magnitude below corpus scale, so up to `driver_threshold`
    edges they are collected and solved with driver union-find in
    milliseconds — ~10 distributed rounds of shuffle latency buy nothing
    there. Above the threshold the distributed min-label fixpoint with
    pointer jumping runs (O(log diameter) rounds).

    `probe_rows`: pre-collected `edges.limit(driver_threshold + 1)` rows
    — callers that already ran a probe job (canonicalize piggybacks the
    surface count on it) pass them in so no second job runs here."""
    # single probe job: collect up to threshold+1 edges; only if the graph
    # exceeds the threshold does the distributed fixpoint run (and the
    # collected prefix is discarded)
    rows = probe_rows if probe_rows is not None else (
        edges.select("src", "dst").limit(driver_threshold + 1).collect()
    )
    if len(rows) <= driver_threshold:
        return _driver_union_find(edges, rows)
    return _distributed_cc(edges, max_iter, n_partitions)


def _driver_union_find(edges: DataFrame, rows=None) -> DataFrame:
    if rows is None:
        rows = edges.select("src", "dst").collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = find(int(r["src"])), find(int(r["dst"]))
        if a != b:
            if a < b:
                parent[b] = a
            else:
                parent[a] = b
    nodes = {int(r["src"]) for r in rows} | {int(r["dst"]) for r in rows}
    out = [(n, find(n)) for n in sorted(nodes)]
    spark = edges.sparkSession
    if not out:
        return spark.createDataFrame([], "node long, component long")
    # pandas → Arrow createDataFrame path (r6): the list-of-tuples form
    # pickles row by row through the JVM gateway; Arrow ships the whole
    # column batch at once (guide §6 driver-transfer note)
    import pandas as pd

    pdf = pd.DataFrame(out, columns=["node", "component"]).astype("int64")
    return spark.createDataFrame(pdf, "node long, component long")


def _distributed_cc(edges: DataFrame, max_iter: int, n_partitions: int) -> DataFrame:
    """edges(src long, dst long) undirected → (node long, component long)
    where component = min node id reachable. Deterministic.

    Min-label propagation accelerated with pointer jumping
    (component ← component-of-component each round), so convergence is
    O(log diameter) rounds instead of O(diameter). The graph here is
    vocabulary-sized (distinct surfaces), so every round is pinned to a
    small fixed partition count — per-round latency, not data volume,
    is the cost driver, and running it at corpus-wide parallelism only
    adds scheduling overhead."""
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(n_partitions, "src")
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    labels = labels.coalesce(n_partitions).localCheckpoint(eager=True)
    for _ in range(max_iter):
        # 1) neighbor min: smallest label among each node's neighbors
        nbr = (
            sym.join(labels, sym.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("component"))
        )
        merged = (
            labels.select("node", "component")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # 2) pointer jump: follow component → its component (path halving)
        jump = merged.select(
            F.col("node").alias("jnode"), F.col("component").alias("jcomp")
        )
        new_labels = (
            merged.join(jump, merged.component == jump.jnode, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("jcomp", F.col("component"))
                ).alias("component"),
            )
            .coalesce(n_partitions)
            .localCheckpoint(eager=True)
        )
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


def canonicalize(surfaces: DataFrame, pairs: DataFrame,
                 stats: dict | None = None) -> DataFrame:
    """surfaces(etype, surface, freq) + linked pairs → alias table
    (entity_id, canonical, etype, alias).

    `surfaces` is the distinct surface vocabulary (pre-aggregated once by
    the caller and cached — every downstream action here would otherwise
    re-shuffle the corpus-scale mention table). The canonical surface of
    a component is its most frequent alias (freq desc, surface asc
    tiebreak). Singleton surfaces form their own entity.

    With a `stats` dict, the probe job that sizes the CC strategy ALSO
    counts the surface vocabulary (stats["n_surfaces"] = alias-table row
    count — the output here is exactly one row per surfaces row), so the
    caller's downstream broadcast-vs-shuffle decision costs no extra
    blocking job. At local[N] the pipeline tail is bounded by serialized
    job COUNT, not data volume (NOTES_r2), so every fused probe matters."""
    from pyspark.sql import Window as W

    from ..linking.minhash_lsh import normalize_surface

    surf = surfaces.select("etype", "surface", "freq")
    # node id = xxhash64(etype, NORMALIZED surface): deterministic,
    # shuffle-free to assign (no global row_number funnel), AND it folds
    # exact-normalization linking into the id itself — 'APT 28'/'APT-28'/
    # 'apt28' share a node with no edge generation at all. Only fuzzy
    # LSH pairs need explicit edges.
    ids = surf.withColumn("node", F.xxhash64("etype", normalize_surface(F.col("surface"))))
    a = ids.select("etype", F.col("surface").alias("surface_a"), F.col("node").alias("src"))
    b = ids.select("etype", F.col("surface").alias("surface_b"), F.col("node").alias("dst"))
    edges = (
        pairs.join(a, ["etype", "surface_a"]).join(b, ["etype", "surface_b"])
        .select("src", "dst")
        .persist()
    )
    probe_rows = None
    if stats is not None:
        # one job: up to threshold+1 edges plus a 1-row surface count
        probe = (
            edges.select("src", "dst", F.lit(0).alias("marker"))
            .limit(DRIVER_THRESHOLD + 1)
            .unionByName(
                surfaces.agg(F.count(F.lit(1)).alias("src"))
                .select("src", F.lit(0).cast("long").alias("dst"),
                        F.lit(1).alias("marker"))
            )
            .collect()
        )
        probe_rows = [r for r in probe if r["marker"] == 0]
        stats["n_surfaces"] = int(
            next(r["src"] for r in probe if r["marker"] == 1)
        )
    comp = connected_components(edges, probe_rows=probe_rows)
    edges.unpersist(blocking=False)
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
