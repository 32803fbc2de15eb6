"""Connected components over near-dup pair graphs — iterative min-label
propagation (the missing piece between pairwise dedup candidates and
dedup *clusters*: pairs (a,b),(b,c) must collapse to one cluster {a,b,c}
with a single representative).

Algorithm: large-/small-star-style min-id propagation. Each node starts
labeled with itself; every iteration joins labels across edges and takes
the min; converged when no label changes. Iterations are O(diameter) —
near-dup graphs are shallow (dup clusters are cliques or near-cliques),
so 3–5 rounds close almost everything; the loop is capped and each round
is one shuffle on node id.

Scale notes: edges are the (small) candidate-pair output of LSH, not the
corpus; labels frame is checkpointed every round to cut lineage growth
(iterative plans otherwise replan the whole history each action).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 40,
) -> DataFrame:
    """(id_a, id_b) edge list → (node, component) with component =
    min node id of the cluster."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges.persist()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iterations):
        # candidate label for each node: min over neighbors' labels
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("neighbor_min"))
            .withColumnRenamed("src", "node")
        )
        stepped = (
            labels.join(neighbor_labels, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("neighbor_min", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jumping: label ← label(label) — collapses chains in
        # O(log diameter) rounds instead of O(diameter)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = (
            stepped.join(parent, stepped["component"] == parent["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("p_comp", F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            labels.withColumnRenamed("component", "old")
            .join(new_labels, "node")
            .filter(F.col("old") != F.col("component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels


def sql_dedup_clusters(pairs_select: str) -> str:
    """DuckDB oracle twin of ``dedup_clusters``: connected components
    via a recursive reachability CTE over the same (id_a, id_b) pair
    list (``pairs_select``: a SELECT yielding id_a, id_b), component =
    min reachable node. UNION (not UNION ALL) dedups rows, so the
    recursion terminates on any graph."""
    return (
        f"WITH RECURSIVE pairs AS ({pairs_select}), "
        "edges AS (SELECT id_a AS s, id_b AS d FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs), "
        "reach(n, m) AS (SELECT s, s FROM edges "
        "UNION SELECT e.s, r.m FROM edges e JOIN reach r ON e.d = r.n) "
        "SELECT component, count(*) AS n_members, min(node) AS keep_id FROM ("
        "SELECT n AS node, min(m) AS component FROM reach GROUP BY n) "
        "GROUP BY component"
    )


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-dup clusters: (component, n_members, keep_id) — keep_id is
    the min member (the representative every other member collapses to)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.min("node").alias("keep_id"),
    )
