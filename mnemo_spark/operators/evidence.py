"""Pluggable evidence scorers (reference U2, query/evidence.rs:158-260;
engine hook query/mod.rs:108-116).

The evidence budget (W8, operators/window_ops.evidence_budget_prefix)
consumes a `sufficiency` column; these scorers produce it:

- `cosine_scorer` (the reference default): cosine of candidate vs
  query embedding, falling back to the fused retrieval score when an
  embedding is missing or degenerate (all-zero under a no-op
  embedder) so the budget stays usable without a real provider.
- `delta_novelty_scores` (the reference's DeltaScorer stub): marginal
  novelty — the fraction of a candidate's whitespace tokens not seen
  in any HIGHER-RANKED candidate, scaled by its retrieval score, so
  the budget exhibits the diminishing-returns shape an answer-impact
  signal should. Prefix semantics mirror the greedy selection order.
  Custom answer-impact closures plug in the same way: a per-batch
  callable over the ranked pandas frame.

Scale: cosine is pure column arithmetic. Novelty is inherently
sequential in rank; it runs per query group via applyInPandas over
the ALREADY top-k frame (k rows by construction) — parallel across
queries, sequential within, the same shape as chain assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mnemo_spark.operators.window_ops import _GPART, _const_partition


def cosine_scorer(
    vec_col: Column, qvec: Column, fallback_score: Column
) -> Column:
    """CosineScorer (evidence.rs:174-200): clamped cosine, retrieval-
    score fallback on missing/degenerate embeddings."""
    a = vec_col.cast("array<double>")
    b = qvec.cast("array<double>")
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    sim = dot / (na * nb)
    ok = (
        vec_col.isNotNull()
        & qvec.isNotNull()
        & (F.size(vec_col) == F.size(qvec))
        & (na > 0)
        & (nb > 0)
        & (sim > 0)
    )
    clamped = F.least(F.greatest(sim, F.lit(0.0)), F.lit(1.0))
    fb = F.least(F.greatest(fallback_score, F.lit(0.0)), F.lit(1.0))
    return F.when(ok, clamped).otherwise(fb)


def delta_novelty_scores(
    ranked: DataFrame,
    content_col: str = "content",
    score_col: str = "score",
    rank_col: str = "rank",
    part_cols: list[str] | None = None,
    out_col: str = "sufficiency",
) -> DataFrame:
    """DeltaScorer::stub (evidence.rs:224-246) as a batch operator:
    novelty(candidate) = |tokens not in any higher-ranked candidate| /
    |tokens|, times the clamped retrieval score."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    part_cols = list(part_cols or [])
    if not part_cols:
        ranked = _const_partition(ranked)
        part_cols = [_GPART]
    out_schema = StructType(
        list(ranked.schema.fields) + [StructField(out_col, DoubleType(), True)]
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(rank_col).reset_index(drop=True)
        seen: set[str] = set()
        vals = []
        for _, row in pdf.iterrows():
            toks = set((row[content_col] or "").split())
            if not toks:
                vals.append(0.0)
                continue
            novel = len(toks - seen) / len(toks)
            rs = min(max(float(row[score_col]), 0.0), 1.0)
            vals.append(min(max(novel * rs, 0.0), 1.0))
            seen |= toks
        pdf[out_col] = vals
        return pdf

    return (
        ranked.groupBy(*part_cols)
        .applyInPandas(score_group, out_schema)
        .drop(_GPART)
    )
