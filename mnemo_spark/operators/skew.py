"""Skew-resistant aggregation: two-phase salted groupBy.

At 100 TB a single hot key (one dominant agent_id, one viral doc)
turns a groupBy into a straggler task. AQE's skew-join splitting
covers joins; for AGGREGATIONS over algebraic functions the classic
fix is salting: shuffle on (key, salt) first so the hot key spreads
over `salt_buckets` tasks, then combine the partials with a second,
tiny shuffle on the key alone.

Only algebraic aggregates compose this way (sum/count/min/max — and
avg via sum+count); holistic ones (exact median) don't. The helper
takes the decomposition explicitly so misuse is impossible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation:

    phase 1 groups by (keys..., salt) computing `partial_aggs`
    (name → agg over input columns); phase 2 groups by keys combining
    with `final_aggs` (name → agg over the phase-1 columns).

    Example — skew-proof count + sum + avg:
        salted_agg(df, ["user_id"],
                   {"c": F.count("*"), "s": F.sum("value")},
                   {"n": F.sum("c"), "total": F.sum("s")})
        → avg = total / n downstream.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )
