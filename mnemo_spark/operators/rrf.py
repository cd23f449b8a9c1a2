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

ROUND_DP = 6
DEFAULT_RRF_K = 60


def rank_lane(lane: DataFrame, id_col: str, score_col: str) -> DataFrame:
    """Assign deterministic 1-based ranks within one lane."""
    w = Window.orderBy(F.desc(F.round(F.col(score_col), ROUND_DP)), F.asc(id_col))
    return lane.select(
        F.col(id_col).alias("_id"),
        F.row_number().over(w).alias("_rank"),
    )


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
        ranked = rank_lane(lane, id_col, score_col)
        if lane_limit is not None:
            ranked = ranked.filter(F.col("_rank") <= lane_limit)
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
    w_final = Window.orderBy(F.desc("rrf_score"), F.asc("_id"))
    out = fused.withColumn("rank", F.row_number().over(w_final))
    if limit is not None:
        out = out.filter(F.col("rank") <= limit)
    return out.select(F.col("_id").alias(id_col), "rrf_score", "rank")
