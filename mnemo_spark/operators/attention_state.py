"""Attention-state memory substrate (reference
crates/mnemo-attention-state).

The reference (anchored on the Context-Memorization paper,
lib.rs:1-12) ships a typed lookup store for precomputed
attention-state blobs keyed by (agent_id, prefix_hash): `put`
upserts and stamps id / blob sha256 / created_at, `get` returns the
most-recent record for a key, `delete_for_agent` honours
subject-erasure across the substrate (lib.rs:133-161). Blobs are
opaque bytes — no runtime integration is claimed upstream either
(lib.rs:24-31: "this crate stores opaque bytes").

Spark-first mapping: the store is one DataFrame with the
AttentionStateRecord schema (lib.rs:88-114); `put` is a batch of
rows flowing through the engine's LWW merge (operators/upsert.py —
the same MERGE a Delta table would run), `get` is a key-pruned point
lookup, TTL expiry reuses the lifecycle sweep. A batch engine treats
puts as micro-batches, so `put_states`/`get_state` operate on
DataFrames; `AttentionStateStore` wraps them in the reference's
verb-per-call shape for engine/test use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mnemo_spark.functions.ids import uuidv7
from mnemo_spark.operators.upsert import merge_upsert

STATE_SCHEMA = T.StructType(
    [
        T.StructField("agent_id", T.StringType(), False),
        T.StructField("prefix_hash", T.StringType(), False),
        T.StructField("model", T.StringType(), True),
        T.StructField("state_blob", T.BinaryType(), True),
        T.StructField("ttl_seconds", T.LongType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)


def stamp_states(puts: DataFrame) -> DataFrame:
    """Fill the store-assigned fields of incoming put rows
    (lib.rs:139-146: the store assigns id, blob_sha256_hex,
    created_at — created_at arrives on the batch row here, since a
    deterministic engine takes the clock as input).

    → STATE_SCHEMA columns + id (UUIDv7 over created_at ‖ key) +
    blob_sha256_hex.
    """
    return puts.select(
        uuidv7(
            F.col("created_at"),
            F.concat_ws("|", "agent_id", "prefix_hash"),
        ).alias("id"),
        "agent_id",
        "prefix_hash",
        "model",
        "state_blob",
        F.sha2(F.coalesce(F.col("state_blob"), F.lit(b"")), 256).alias(
            "blob_sha256_hex"
        ),
        "ttl_seconds",
        "created_at",
    )


def apply_puts(current: DataFrame | None, puts: DataFrame) -> DataFrame:
    """Insert-or-replace under (agent_id, prefix_hash) (lib.rs:135-138)
    — newest created_at wins, ties to the incoming batch (MERGE
    semantics, shared merge_upsert)."""
    stamped = stamp_states(puts)
    if current is None:
        # first batch: LWW within the batch itself
        return merge_upsert(
            stamped.limit(0), stamped, ["agent_id", "prefix_hash"], "created_at"
        )
    return merge_upsert(current, stamped, ["agent_id", "prefix_hash"], "created_at")


def get_state(store: DataFrame, agent_id: str, prefix_hash: str) -> DataFrame:
    """Most-recent record for the key, or no rows (lib.rs:148-155).
    The equality predicates push to the scan (partition/file pruning
    on a persisted store)."""
    return (
        store.filter(
            (F.col("agent_id") == agent_id) & (F.col("prefix_hash") == prefix_hash)
        )
        .orderBy(F.desc("created_at"), F.desc("id"))
        .limit(1)
    )


def delete_for_agent(store: DataFrame, agent_id: str) -> tuple[DataFrame, DataFrame]:
    """Subject-erasure over the substrate (lib.rs:157-161): returns
    (surviving rows, removed rows) so the caller can count removals
    and append the audit event, mirroring forget_subject."""
    removed = store.filter(F.col("agent_id") == agent_id)
    kept = store.filter(F.col("agent_id") != agent_id)
    return kept, removed


def sweep_expired(store: DataFrame, now) -> DataFrame:
    """Engine-layer TTL honouring (lib.rs:108-111 leaves expiry to the
    operator): drop rows whose created_at + ttl_seconds ≤ now; NULL
    ttl never expires."""
    now_c = F.lit(now).cast("timestamp")
    expired = F.col("ttl_seconds").isNotNull() & (
        F.timestamp_add("SECOND", F.col("ttl_seconds").cast("int"), F.col("created_at"))
        <= now_c
    )
    return store.filter(~expired)


class AttentionStateStore:
    """Reference-shaped verb surface over the relational store
    (lib.rs:133-161 trait). Holds the current snapshot DataFrame;
    production would point this at a Delta/parquet table and run
    apply_puts as a MERGE."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._df: DataFrame | None = None

    def put_batch(self, rows: list[dict]) -> None:
        puts = self._spark.createDataFrame(
            [
                (
                    r["agent_id"],
                    r["prefix_hash"],
                    r.get("model"),
                    r["state_blob"],
                    r.get("ttl_seconds"),
                    r["created_at"],
                )
                for r in rows
            ],
            STATE_SCHEMA,
        )
        self._df = apply_puts(self._df, puts)

    def get(self, agent_id: str, prefix_hash: str):
        if self._df is None:
            return None
        rows = get_state(self._df, agent_id, prefix_hash).collect()
        return rows[0] if rows else None

    def delete_for_agent(self, agent_id: str) -> int:
        if self._df is None:
            return 0
        kept, removed = delete_for_agent(self._df, agent_id)
        n = removed.count()
        self._df = kept
        return n

    def sweep(self, now) -> None:
        if self._df is not None:
            self._df = sweep_expired(self._df, now)
