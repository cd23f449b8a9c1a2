"""Recency / decay scoring curves (reference W5/W6/F8).

- recency_score: 2^(-age_hours / half_life), default half-life 168h
  (query/retrieval.rs:34-46)
- ebbinghaus: 0.5^(age/half_life) + log2(1+access_count)*0.05,
  clamped to [floor, 1] (score/decay.rs:30-102)
- effective_importance: importance × decay_curve(age) + access boost,
  four curve families exponential | linear | step:<h> | power_law:<a>
  (query/lifecycle.rs:15-74)

All pure Column arithmetic — identical formulas run in the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_HALF_LIFE_HOURS = 168.0


def age_hours(ts: Column, now: Column) -> Column:
    """Age in fractional hours.

    Computed from integer epoch-microseconds (exact in both engines)
    with a fixed op order — (Δµs / 1e6) / 3600 — so the DuckDB oracle
    (epoch_us) reproduces it bit-for-bit.
    """
    return (
        (F.unix_micros(now) - F.unix_micros(ts)).cast("double") / F.lit(1.0e6)
    ) / F.lit(3600.0)


def recency_score(ts: Column, now: Column, half_life_hours: float = DEFAULT_HALF_LIFE_HOURS) -> Column:
    return F.pow(F.lit(2.0), -age_hours(ts, now) / F.lit(half_life_hours))


def ebbinghaus_score(
    ts: Column,
    now: Column,
    access_count: Column,
    half_life_hours: float = DEFAULT_HALF_LIFE_HOURS,
    floor: float = 0.0,
) -> Column:
    base = F.pow(F.lit(0.5), age_hours(ts, now) / F.lit(half_life_hours))
    boost = F.log2(F.lit(1.0) + access_count.cast("double")) * F.lit(0.05)
    return F.least(F.greatest(base + boost, F.lit(float(floor))), F.lit(1.0))


def effective_importance(
    importance: Column,
    ts: Column,
    now: Column,
    access_count: Column,
    decay_rate: Column,
    decay_function: Column,
) -> Column:
    """Dispatch over the four decay families (lifecycle.rs:44-74).

    step:<h>   → 1.0 until h hours, then 0.5
    power_law:<a> → (1+age)^(-a)
    linear     → max(0, 1 - rate*age)
    exponential (default) → exp(-rate*age)
    plus the access boost 0.05*ln(1+access_count), clamped to [0,1].
    """
    age = age_hours(ts, now)
    rate = F.coalesce(decay_rate.cast("double"), F.lit(0.01))
    fn = F.coalesce(decay_function, F.lit("exponential"))
    step_h = F.when(
        fn.startswith("step:"), F.split(fn, ":").getItem(1).cast("double")
    ).otherwise(F.lit(24.0))
    power_a = F.when(
        fn.startswith("power_law:"), F.split(fn, ":").getItem(1).cast("double")
    ).otherwise(F.lit(1.0))

    curve = (
        F.when(fn == "linear", F.greatest(F.lit(0.0), F.lit(1.0) - rate * age))
        .when(fn.startswith("step:"), F.when(age < step_h, F.lit(1.0)).otherwise(F.lit(0.5)))
        .when(fn.startswith("power_law:"), F.pow(F.lit(1.0) + age, -power_a))
        .otherwise(F.exp(-rate * age))
    )
    boost = F.lit(0.05) * F.log1p(access_count.cast("double"))
    return F.least(F.greatest(importance * curve + boost, F.lit(0.0)), F.lit(1.0))
