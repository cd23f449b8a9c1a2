"""Lifecycle batch jobs (reference query/lifecycle.rs).

- decay pass (lifecycle.rs:108-155 / run_decay_pass): effective
  importance = importance · curve(age) + usage boost (the 4-curve
  dispatch lives in functions.decay.effective_importance), then state
  transitions: below θ_archive → archived, below θ_forget →
  forgotten.
- TTL sweep (lifecycle.rs:403-553, duckdb.rs:742): rows whose
  expires_at has passed are swept (hard-delete + MemoryExpired event
  in the reference; here the sweep SELECTS the doomed rows — the
  delete is a Delta MERGE in production).

Scale: both jobs are single-pass column expressions + one filter —
no shuffle at all until the output write; they run as wide scans over
the partitioned store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mnemo_spark.functions.decay import effective_importance

ROUND_DP = 6


def decay_pass(
    df: DataFrame,
    importance: Column,
    ts: Column,
    now: Column,
    access_count: Column,
    decay_rate: Column,
    decay_function: Column,
    archive_below: float = 0.3,
    forget_below: float = 0.1,
) -> DataFrame:
    """Append (eff_importance, new_state) columns: the reference's
    run_decay_pass as one projection — archived below θ₁, forgotten
    below θ₂, active otherwise (lifecycle.rs:108-155)."""
    eff = F.round(
        effective_importance(importance, ts, now, access_count, decay_rate, decay_function),
        ROUND_DP,
    )
    state = (
        F.when(eff < forget_below, "forgotten")
        .when(eff < archive_below, "archived")
        .otherwise("active")
    )
    return df.withColumn("eff_importance", eff).withColumn("new_state", state)


def ttl_sweep(
    df: DataFrame, expires_at: Column, now: Column, id_cols: list[str]
) -> DataFrame:
    """Rows due for hard delete: expires_at ≤ now (reference T2/P6).

    Returns the doomed rows (id columns + expiry) — production pipes
    this into a Delta MERGE DELETE plus MemoryExpired audit events.
    """
    return df.filter(expires_at.isNotNull() & (expires_at <= now)).select(
        *id_cols, expires_at.alias("expired_at")
    )
