"""Consolidation clustering: connected components by min-label
propagation (reference A5, query/lifecycle.rs:199-398).

The reference greedily single-links episodic memories sharing ≥1 tag
and summarizes each cluster into one Semantic record. The general
relational form is connected components over a pair graph (tag
co-occurrence, near-duplicate pairs, relation edges — any source of
(id_a, id_b) edges), then one groupBy(cluster) aggregation builds the
consolidated rollup.

Spark-first CC: iterative min-label propagation — each round every
node adopts the smallest label among itself and its neighbors; the
round count needed equals the graph diameter (near-dup clusters are
tiny cliques, so 2-4 rounds converge; the loop checks a convergence
count so it stops early). Each round is one join + one groupBy —
shuffle on id, no driver-side graph state. For planet-scale graphs
with long chains, swap in the large-star/small-star variant; the
interface is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(node, cluster) for every node in the pair graph; cluster =
    min node id reachable. Deterministic for any edge order."""
    # materialize the edge list ONCE — the pair graph upstream (e.g.
    # a shingle-join) is the expensive part and must not re-execute
    # every round
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("cluster").alias("nb_cluster"))
        )
        # carry the change flag through the update projection: the
        # convergence probe then reads the already-materialized frame
        # instead of re-joining updated against the previous labels
        # (one fewer shuffle per round)
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nb_cluster"), F.col("cluster"))
                ).alias("new_cluster"),
                (F.coalesce(F.col("nb_cluster"), F.col("cluster")) < F.col("cluster"))
                .alias("_chg"),
            )
            .localCheckpoint(eager=True)  # materialize before the probe
        )
        changed = updated.filter(F.col("_chg")).limit(1).count()
        labels = updated.select("node", F.col("new_cluster").alias("cluster"))
        if changed == 0:
            break
    return labels


def consolidate_clusters(
    members: DataFrame,
    cluster_col: str = "cluster",
    min_size: int = 2,
) -> DataFrame:
    """Cluster rollup (the Semantic summary record per cluster):
    member count + id list; clusters under min_size are left alone
    (the reference's min_cluster_size gate)."""
    return (
        members.groupBy(cluster_col)
        .agg(
            F.count("*").alias("n_members"),
            F.sort_array(F.collect_list("node")).alias("member_ids"),
        )
        .filter(F.col("n_members") >= min_size)
    )
