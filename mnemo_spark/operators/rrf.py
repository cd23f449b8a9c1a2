"""Weighted Reciprocal Rank Fusion (reference A1, query/retrieval.rs:7-29).

The reference fuses ranked lanes (vector / bm25 / recency / graph) as
  score(id) = Σ_lanes  w_lane / (rrf_k + rank_lane(id))
with 1-based ranks (the Rust code enumerates 0-based and adds 1).

Spark-first: each lane is a (id, lane_score) DataFrame; rank each lane
with a row_number window, union the lanes (cheap — ranked lanes are
already candidate-sized, not corpus-sized), and a single groupBy(id)
sums the reciprocal-rank contributions. One shuffle on id over
candidate rows only.

Determinism contract: every lane ranks by (round(score,6) desc,
id asc) so rank assignment — and therefore fused scores — are
bit-identical with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mnemo_spark.operators.window_ops import _GPART, _const_partition, top_k_ranked

ROUND_DP = 6
DEFAULT_RRF_K = 60


def rank_lane(
    lane: DataFrame, id_col: str, score_col: str, k: int | None = None
) -> DataFrame:
    """Assign deterministic 1-based ranks within one lane. With k set
    (the lane over-fetch), ranks come from a parallel partial top-k
    (TakeOrderedAndProject) instead of a single-partition window."""
    order = [F.desc(F.round(F.col(score_col), ROUND_DP)), F.asc(id_col)]
    if k is not None:
        ranked = top_k_ranked(lane, order, k, rank_col="_rank")
    else:
        # full-lane ranking (explain surface): deliberate single
        # partition over candidate-sized input
        w = Window.partitionBy(_GPART).orderBy(*order)
        ranked = _const_partition(lane).withColumn("_rank", F.row_number().over(w))
    return ranked.select(F.col(id_col).alias("_id"), "_rank")


def rrf_fuse(
    lanes: dict[str, DataFrame],
    weights: dict[str, float] | None = None,
    rrf_k: int = DEFAULT_RRF_K,
    id_col: str = "doc_id",
    score_col: str = "score",
    limit: int | None = None,
    lane_limit: int | None = None,
) -> DataFrame:
    """Fuse ranked lanes → (id, rrf_score, rank).

    lanes: name → DataFrame with (id_col, score_col). Missing weights
    default to 1.0 (the reference's equal-weight `auto` mode).
    lane_limit = the reference's candidate over-fetch (`limit*3` per
    lane, recall.rs:397): only each lane's top-N feed fusion — at
    corpus scale the fusion input is O(lanes·N), not O(corpus).
    """
    weights = weights or {}
    contribs = []
    for name, lane in lanes.items():
        w_val = float(weights.get(name, 1.0))
        ranked = rank_lane(lane, id_col, score_col, k=lane_limit)
        contribs.append(
            ranked.select(
                "_id",
                (F.lit(w_val) / (F.lit(float(rrf_k)) + F.col("_rank"))).alias("_contrib"),
            )
        )
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = unioned.groupBy("_id").agg(
        F.round(F.sum("_contrib"), ROUND_DP).alias("rrf_score")
    )
    order = [F.desc("rrf_score"), F.asc("_id")]
    if limit is not None:
        out = top_k_ranked(fused, order, limit)
    else:
        w_final = Window.partitionBy(_GPART).orderBy(*order)
        out = _const_partition(fused).withColumn("rank", F.row_number().over(w_final))
    return out.select(F.col("_id").alias(id_col), "rrf_score", "rank")


def max_fuse(
    lanes: dict[str, DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    limit: int | None = None,
) -> DataFrame:
    """Max-score fusion → (id, max_score, rank) (reference AMP router,
    mnemo-amp/src/router.rs `max_fuse`).

    fused(id) = max over lanes of the lane score. Shipped next to RRF
    because the AMP cross-adapter conformance suite uses the pair to
    demonstrate RRF's robustness to a single adversarial rank-0
    injection that max-fusion is fooled by (router.rs:10-13) — one
    poisoned lane saturates max_fuse but shifts an RRF sum by at most
    one reciprocal term. Same single candidate-sized shuffle as
    rrf_fuse.
    """
    unioned = None
    for lane in lanes.values():
        c = lane.select(
            F.col(id_col).alias("_id"),
            F.round(F.col(score_col), ROUND_DP).alias("_s"),
        )
        unioned = c if unioned is None else unioned.unionByName(c)
    fused = unioned.groupBy("_id").agg(F.max("_s").alias("max_score"))
    order = [F.desc("max_score"), F.asc("_id")]
    if limit is not None:
        out = top_k_ranked(fused, order, limit)
    else:
        w_final = Window.partitionBy(_GPART).orderBy(*order)
        out = _const_partition(fused).withColumn("rank", F.row_number().over(w_final))
    return out.select(F.col("_id").alias(id_col), "max_score", "rank")
