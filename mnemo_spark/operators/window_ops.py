"""Window / ranking / prefix-budget operators (reference §2.5 W1-W9).

All pure Window-function programs; each has an exact SQL twin for the
oracle. Partition keys are the natural scale-out axis — every window
here partitions by a business key (query, user, fact, group), never a
global unpartitioned window except final top-k truncation over
already-candidate-sized data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
) -> DataFrame:
    """W2/W10: rank within group, keep k. order_cols must end with a
    unique tiebreak column for deterministic results."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def current_fact_resolver(
    df: DataFrame,
    fact_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """W3 (query/current_fact_resolver.rs:1-320): group rows by fact
    key, keep the most-recent write per group; others are the
    superseded chain. Adds `is_current` + `superseded_rank`
    (0 = current, n = n-th most recent superseded revision)."""
    w = Window.partitionBy(*fact_cols).orderBy(
        F.desc(order_col), F.asc(tiebreak_col)
    )
    rn = F.row_number().over(w)
    return df.withColumn("superseded_rank", rn - 1).withColumn(
        "is_current", rn == 1
    )


def evidence_budget_prefix(
    ranked: DataFrame,
    sufficiency_col: str,
    bar: float,
    max_evidence: int,
    rank_col: str = "rank",
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """W8 (query/evidence.rs): smallest ranked prefix whose cumulative
    sufficiency reaches `bar`, capped at max_evidence — NEVER reorders
    (the reference's documented invariant). A row is kept iff the
    cumulative sufficiency BEFORE it is still under the bar."""
    w = (
        Window.partitionBy(*part_cols).orderBy(F.asc(rank_col))
        if part_cols
        else Window.orderBy(F.asc(rank_col))
    )
    cum_before = F.coalesce(
        F.sum(sufficiency_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0.0),
    )
    return (
        ranked.withColumn("_cum_before", cum_before)
        .filter((F.col("_cum_before") < bar) & (F.col(rank_col) <= max_evidence))
        .drop("_cum_before")
    )


def token_budget_pack(
    ranked: DataFrame,
    cost_col: str,
    budget: float,
    rank_col: str = "rank",
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """W9 (query/retained.rs): keep the ranked prefix whose cumulative
    token cost stays within budget (prefix semantics — selection is a
    truncation of the ranking, mirroring the evidence invariant)."""
    w = (
        Window.partitionBy(*part_cols).orderBy(F.asc(rank_col))
        if part_cols
        else Window.orderBy(F.asc(rank_col))
    )
    cum = F.sum(cost_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return ranked.withColumn("_cum", cum).filter(F.col("_cum") <= budget).drop("_cum")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Sessionization: a new session starts when the gap from the
    previous event exceeds the threshold. Adds `session_id` (1-based
    per user). Batch analog of streaming session_window (§2.7)."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col))
    # integer epoch-µs gaps: exact, and bit-identical to the DuckDB
    # oracle's epoch_us — no float boundary flakiness at the threshold
    us = F.unix_micros(F.col(ts_col))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > int(gap_minutes * 60.0 * 1e6)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
