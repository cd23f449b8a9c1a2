"""Upsert + sync primitives (reference S5 upsert, T4 sync engine with
watermarks and LWW conflict surfacing).

Without Delta in this environment, MERGE is emulated relationally:
union current ∪ updates, keep the newest version per key (one window
— deterministic LWW with an id tiebreak). On a Delta-backed
deployment `merge_upsert` is replaced 1:1 by `MERGE INTO`; the
conflict surface and watermark logic are unchanged.

Scale: the union shuffles once on the key; updates are typically a
small fraction of current, so AQE broadcasts them into the window
partition where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Last-writer-wins upsert: newest version per key survives;
    ties break toward the update side (matching MERGE semantics)."""
    tagged = current.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def changes_since(df: DataFrame, updated_col: str, watermark) -> DataFrame:
    """Incremental pull feed (S8/T4 `list_memories_since`): rows
    updated after the watermark — the predicate prunes at the scan."""
    return df.filter(F.col(updated_col) > F.lit(watermark).cast("timestamp"))


def sync_conflicts(
    local: DataFrame,
    remote: DataFrame,
    key_cols: list[str],
    version_col: str,
    payload_col: str,
) -> DataFrame:
    """LWW conflict surfacing (sync/engine.rs): keys where both sides
    changed with DIFFERENT payloads → (key, local/remote versions +
    payloads, winner side)."""
    l = local.select(
        *key_cols,
        F.col(version_col).alias("local_version"),
        F.col(payload_col).alias("local_payload"),
    )
    r = remote.select(
        *key_cols,
        F.col(version_col).alias("remote_version"),
        F.col(payload_col).alias("remote_payload"),
    )
    return (
        l.join(r, key_cols)
        .filter(F.col("local_payload") != F.col("remote_payload"))
        .withColumn(
            "winner",
            F.when(F.col("remote_version") > F.col("local_version"), "remote")
            .when(F.col("remote_version") < F.col("local_version"), "local")
            .otherwise("tie"),
        )
    )
