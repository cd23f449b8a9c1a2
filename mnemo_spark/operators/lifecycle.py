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
from mnemo_spark.io import fold_partitions

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


def ewma_by_key(
    df: DataFrame,
    alpha: float,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    round_dp: int = 6,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the recursive
    fold s_i = α·v_i + (1−α)·s_{i−1} (s_1 = v_1), the standard
    smoothing for per-agent health/latency series.

    Arrow-batched applyInPandas per key (the same physical shape as
    chain assignment): sequential within a key, parallel across keys,
    one shuffle on the key. The recursion is the scale-safe form
    (closed-form power sums overflow/underflow on long series). The
    carried state is QUANTIZED to round_dp each step: a raw float
    fold drifts by 1 ulp between engines on long series (FMA
    contraction), so the quantized fold is the portable contract.
    → input key/order cols + ewma."""
    import pandas as pd

    out_fields = key_cols + order_cols + [value_col, "ewma"]

    import math

    q = float(10 ** round_dp)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        s, out = None, []
        for v in pdf[value_col]:
            s = float(v) if s is None else alpha * float(v) + (1.0 - alpha) * s
            # floor(x·10^dp + 0.5)/10^dp, NOT round(): python rounds
            # half-even on the exact double, most engines round the
            # scaled double half-away — on a quantized fold the scaled
            # values land on .5 constantly and the two diverge. The
            # explicit floor form is the same float ops everywhere.
            s = math.floor(s * q + 0.5) / q
            out.append(s)
        pdf = pdf[key_cols + order_cols + [value_col]].copy()
        pdf["ewma"] = out
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in set(out_fields)
    ) + ", ewma double"
    # one Arrow stream per partition, not per key (r13 — the
    # assign_chain per-group-IPC finding; exchange stays pinned at
    # full reduce parallelism inside fold_partitions)
    return fold_partitions(
        df.select(*key_cols, *order_cols, value_col),
        key_cols,
        order_cols,
        fold,
        schema,
    )
