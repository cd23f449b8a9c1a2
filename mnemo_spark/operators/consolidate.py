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
    method: str = "label",
) -> DataFrame:
    """(node, cluster) for every node in the pair graph; cluster =
    min node id reachable. Deterministic for any edge order.

    method='label' (default): min-label propagation — rounds = graph
    diameter; the right choice for near-dup clusters (tiny cliques,
    2-4 rounds). method='star': the large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds regardless of diameter; the planet-scale choice
    for long-chain graphs.
    """
    if method == "star":
        return _connected_components_star(pairs, id_a, id_b, max_iter)
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


def _connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Large-star/small-star connected components.

    Each round: large-star hangs every neighbor larger than u onto
    u's minimum neighborhood label; small-star re-points each node's
    smaller neighbors (and itself) at the neighborhood minimum. The
    edge set contracts toward a forest of stars rooted at component
    minima in O(log n) rounds (vs diameter rounds for label
    propagation). Every step is explode-free relational: one groupBy
    per star + one equi-join — MapReduce-shaped by construction.
    """
    all_nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .unionByName(pairs.select(F.col(id_b).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # large-star over both orientations
        bi = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mmin = bi.groupBy("u").agg(F.min("v").alias("_nmin"))
        m = mmin.select(
            "u", F.least(F.col("u"), F.col("_nmin")).alias("_m")
        )
        e1 = (
            bi.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .distinct()
        )
        # small-star over edges directed larger→smaller
        d = e1.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        smin = d.groupBy("u").agg(F.min("v").alias("_m"))
        e2 = (
            d.join(smin, "u")
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .unionByName(smin.select("u", F.col("_m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        converged = (
            e2.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(e2).limit(1).count() == 0
        )
        e = e2
        if converged:
            break
    # converged edge set is a forest of depth-1 stars (node → component
    # min); everything without an outgoing edge labels itself — that
    # covers star roots AND nodes that only appeared in self-pairs
    non_roots = e.select(F.col("u").alias("node"), F.col("v").alias("cluster"))
    self_labeled = (
        all_nodes.join(non_roots.select("node"), "node", "left_anti")
        .withColumn("cluster", F.col("node"))
    )
    return non_roots.unionByName(self_labeled)


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
