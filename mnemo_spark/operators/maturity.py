"""Cluster maturity gate (reference A7, query/maturity.rs:52-230):
feedback-driven consolidation trigger — four [0,1] components combined
as a weight-normalised sum, gating consolidation at a threshold plus a
hard cluster-size floor.

Components (maturity.rs:236-320), each ONE per-cluster aggregation:
- recency    : mean exp(-ln2/half_life * access_age_hours)
- hit_success: mean ln(1+access_count) / ln(1+hit_saturation), clamped
- edge_degree: mean relation degree / degree_saturation, clamped
- redundancy : mean pairwise cosine of member embeddings (neutral 0.5
               when fewer than two members have embeddings)

Scale: recency/hit/degree are map-side-combinable aggregations — one
shuffle on cluster id. Redundancy reuses the grouped pairwise-cosine
path (numpy matmul per cluster via applyInPandas), bounded by the
largest cluster, the same bound the reference's in-memory loop has.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# maturity.rs balanced() / MaturitySaturation::default()
WEIGHTS = {"recency": 0.25, "hit_success": 0.30, "edge_degree": 0.20, "redundancy": 0.25}
RECENCY_HALF_LIFE_HOURS = 72.0
HIT_SATURATION = 8.0
DEGREE_SATURATION = 6.0
THRESHOLD = 0.55
MIN_CLUSTER_SIZE = 2
ROUND_DP = 6


def cluster_maturity(
    members: DataFrame,
    now,
    cluster_col: str = "cluster",
    id_col: str = "id",
    accessed_col: str = "last_accessed_at",
    access_count_col: str = "access_count",
    degree_col: str | None = None,
    vec_col: str | None = "embedding",
    weights: dict[str, float] | None = None,
    half_life_hours: float = RECENCY_HALF_LIFE_HOURS,
    hit_saturation: float = HIT_SATURATION,
    degree_saturation: float = DEGREE_SATURATION,
) -> DataFrame:
    """→ (cluster, n_members, recency, hit_success, edge_degree,
    redundancy, combined), every component rounded to 6dp.

    degree_col None (no relations table) contributes 0 — identical to
    the reference when a record has no relations.
    """
    w = {k: max(0.0, min(1.0, v)) for k, v in {**WEIGHTS, **(weights or {})}.items()}
    total_w = sum(w.values())
    now_c = F.lit(now).cast("timestamp")
    lam = math.log(2.0) / max(half_life_hours, 1e-9)
    age_h = (
        (F.unix_micros(now_c) - F.unix_micros(F.col(accessed_col))).cast("double")
        / 1.0e6
    ) / 3600.0
    hit_denom = math.log(1.0 + max(hit_saturation, 1.0))

    base = members.groupBy(cluster_col).agg(
        F.count("*").alias("n_members"),
        F.round(F.avg(F.exp(-F.lit(lam) * age_h)), ROUND_DP).alias("recency"),
        F.round(
            F.least(
                F.avg(F.log1p(F.col(access_count_col).cast("double"))) / hit_denom,
                F.lit(1.0),
            ),
            ROUND_DP,
        ).alias("hit_success"),
        (
            F.round(
                F.least(
                    F.avg(F.col(degree_col).cast("double"))
                    / max(degree_saturation, 1.0),
                    F.lit(1.0),
                ),
                ROUND_DP,
            )
            if degree_col is not None
            else F.lit(0.0)
        ).alias("edge_degree"),
    )

    if vec_col is not None:
        from mnemo_spark.operators.vector import cosine_pairs

        sims = cosine_pairs(
            members.filter(F.col(vec_col).isNotNull()).select(
                cluster_col, F.col(id_col), F.col(vec_col)
            ),
            -1.0,  # keep every pair; the mean is the signal
            id_col=id_col,
            vec_col=vec_col,
            group_col=cluster_col,
        )
        red = sims.groupBy(cluster_col).agg(
            F.round(
                F.least(F.greatest(F.avg("cos_sim"), F.lit(0.0)), F.lit(1.0)),
                ROUND_DP,
            ).alias("redundancy")
        )
        base = base.join(red, cluster_col, "left")
    else:
        base = base.withColumn("redundancy", F.lit(None).cast("double"))
    # neutral 0.5 when unmeasurable (maturity.rs:292)
    base = base.withColumn("redundancy", F.coalesce(F.col("redundancy"), F.lit(0.5)))

    combined = (
        F.lit(w["recency"]) * F.col("recency")
        + F.lit(w["hit_success"]) * F.col("hit_success")
        + F.lit(w["edge_degree"]) * F.col("edge_degree")
        + F.lit(w["redundancy"]) * F.col("redundancy")
    ) / F.lit(total_w if total_w > 1e-9 else 1.0)
    if total_w <= 1e-9:
        combined = F.lit(0.0)
    return base.withColumn(
        "combined",
        F.round(F.least(F.greatest(combined, F.lit(0.0)), F.lit(1.0)), ROUND_DP),
    )


def mature_clusters(
    scores: DataFrame,
    threshold: float = THRESHOLD,
    min_cluster_size: int = MIN_CLUSTER_SIZE,
) -> DataFrame:
    """Gate: consolidation fires iff combined >= threshold AND the
    cluster clears the hard size floor (maturity.rs:128-147)."""
    return scores.filter(
        (F.col("combined") >= threshold) & (F.col("n_members") >= min_cluster_size)
    )
