"""Agent-on-agent deal ledger (reference crates/mnemo-deal).

The reference keeps a chained-HMAC log of DealEnvelopes — one signed
contract row per agent-to-agent task — and ships three pieces this
module re-expresses relationally:

- `sign_deals` — envelope.rs:38-68 `DealEnvelope::sign`: the HMAC
  covers the canonical concatenation id|buyer|seller|terms|signed_at|
  prev_hash, and each envelope chains off sha256(canonical ‖ hmac) of
  its predecessor (envelope.rs:93-108 `next_prev_hash`). Signing is
  inherently sequential WITHIN a ledger; applyInPandas per ledger key
  keeps it parallel across ledgers — the same concurrency contract as
  `assign_chain` (operators/chain.py).
- `verify_deal_chain` — dispute.rs:24-43 `verify_chain`: walk each
  ledger and report the FIRST offset where prev_hash diverges from
  the running head or the HMAC fails, as a DisputeReport row.
- `reputation` — reputation.rs:54-103 `compute_reputation`: advisory
  per-agent score with a 90-day half-life decay and a 10%-per-dispute
  penalty, clamped to [0,1]; empty/fully-decayed history falls back
  to the neutral 0.5. Pure relational aggregation (one shuffle on
  agent).

Hashes are lowercase hex strings (house style, chain.py); the genesis
head is 64 zeros, mirroring the reference's [0u8; 32].

Scale: ledgers shard by their key (a marketplace has many independent
buyer/seller ledgers); reputation is a map-side-combinable aggregate.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mnemo_spark.io import fold_partitions

GENESIS = "0" * 64
HALF_LIFE_SECS = 90.0 * 24.0 * 3600.0  # reputation.rs:41


def _canonical(deal_id: str, buyer: str, seller: str, terms: str,
               signed_at: str, prev_hash: str) -> bytes:
    # envelope.rs:110-137 canonical_bytes — '|'-separated field
    # concatenation; terms are already a canonical JSON/text string.
    return f"{deal_id}|{buyer}|{seller}|{terms}|{signed_at}|{prev_hash}".encode()


def _hmac_hex(key: bytes, canonical: bytes) -> str:
    return _hmac.new(key, canonical, hashlib.sha256).hexdigest()


def _next_head(canonical: bytes, hmac_hex: str) -> str:
    # envelope.rs:93-108: next prev_hash = sha256(canonical ‖ hmac)
    return hashlib.sha256(canonical + hmac_hex.encode()).hexdigest()


def sign_deals(
    deals: DataFrame,
    key: bytes,
    ledger_cols: Sequence[str],
    order_cols: Sequence[str],
    id_col: str = "deal_id",
    buyer_col: str = "buyer",
    seller_col: str = "seller",
    terms_col: str = "terms",
    signed_at_col: str = "signed_at",
) -> DataFrame:
    """Assign prev_hash + hmac to every deal row, per ledger.

    Input columns must be strings (format timestamps upstream so the
    canonical bytes are unambiguous). → input columns + prev_hash,
    hmac.
    """
    if len(key) < 32:
        raise ValueError(f"HMAC key must be at least 32 bytes (got {len(key)})")
    ledger_cols = list(ledger_cols)
    order_cols = list(order_cols)
    schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in deals.schema.fields)
        + ", prev_hash string, hmac string"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        head = GENESIS
        prevs, macs = [], []
        for r in pdf.itertuples(index=False):
            row = r._asdict()
            canonical = _canonical(
                str(row[id_col]), row[buyer_col], row[seller_col],
                row[terms_col], row[signed_at_col], head,
            )
            mac = _hmac_hex(key, canonical)
            prevs.append(head)
            macs.append(mac)
            head = _next_head(canonical, mac)
        pdf["prev_hash"] = prevs
        pdf["hmac"] = macs
        return pdf

    # one Arrow stream per partition, not per ledger (r13 — the
    # assign_chain per-group-IPC finding; exchange stays pinned at
    # full reduce parallelism inside fold_partitions)
    return fold_partitions(deals, ledger_cols, order_cols, fold, schema)


def verify_deal_chain(
    signed: DataFrame,
    key: bytes,
    ledger_cols: Sequence[str],
    order_cols: Sequence[str],
    id_col: str = "deal_id",
    buyer_col: str = "buyer",
    seller_col: str = "seller",
    terms_col: str = "terms",
    signed_at_col: str = "signed_at",
) -> DataFrame:
    """Per-ledger DisputeReport (dispute.rs:24-43).

    → ledger_cols + (n_deals, ok, divergent_offset, expected_hash,
    actual_hash, reason). A pristine ledger has ok=true and NULL
    report fields; a broken one pinpoints the first offset where
    either the prev_hash diverges from the running head
    (reason='prev_hash_mismatch') or the HMAC fails under `key`
    (reason='hmac_mismatch') — prev_hash checked first, like the
    reference.
    """
    if len(key) < 32:
        raise ValueError(f"HMAC key must be at least 32 bytes (got {len(key)})")
    ledger_cols = list(ledger_cols)
    order_cols = list(order_cols)
    lt = {f.name: f.dataType.simpleString() for f in signed.schema.fields}
    schema = (
        ", ".join(f"`{c}` {lt[c]}" for c in ledger_cols)
        + ", n_deals bigint, ok boolean, divergent_offset bigint,"
        + " expected_hash string, actual_hash string, reason string"
    )

    def walk(pdf):
        keys = [pdf[c].iloc[0] for c in ledger_cols]
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        head = GENESIS
        report = (None, None, None, None)
        for i, r in enumerate(pdf.itertuples(index=False)):
            row = r._asdict()
            if row["prev_hash"] != head:
                report = (i, head, row["prev_hash"], "prev_hash_mismatch")
                break
            canonical = _canonical(
                str(row[id_col]), row[buyer_col], row[seller_col],
                row[terms_col], row[signed_at_col], row["prev_hash"],
            )
            mac = _hmac_hex(key, canonical)
            if mac != row["hmac"]:
                report = (i, row["hmac"], mac, "hmac_mismatch")
                break
            head = _next_head(canonical, mac)
        off, exp, act, why = report
        return pd.DataFrame(
            {
                **{c: [k] for c, k in zip(ledger_cols, keys)},
                "n_deals": [len(pdf)],
                "ok": [off is None],
                "divergent_offset": pd.array([off], dtype="Int64"),
                "expected_hash": [exp],
                "actual_hash": [act],
                "reason": [why],
            }
        )

    # one Arrow stream per partition, not per ledger (r13)
    return fold_partitions(signed, ledger_cols, order_cols, walk, schema)


def reputation(
    deals: DataFrame,
    disputes: DataFrame,
    now_ts,
    id_col: str = "deal_id",
    buyer_col: str = "buyer",
    seller_col: str = "seller",
    signed_at_col: str = "signed_at",
    agent_col: str = "agent",
    half_life_secs: float = HALF_LIFE_SECS,
) -> DataFrame:
    """Advisory per-agent reputation (reputation.rs:54-103).

    deals: one row per completed envelope (signed_at is a timestamp
    column); disputes: one row per verified DisputeReport filed
    against `agent_col`. now_ts: an explicit Column/literal — the
    reference reads SystemTime::now(); a deterministic engine takes
    the clock as input.

    → (agent, completed, disputed, mean_settlement_ms, weighted_total,
    score). score = clamp((wc − 0.1·disputed·wc) / wt, 0, 1) with the
    fully-decayed (wt < 1e-6) fallback to neutral 0.5;
    mean_settlement_ms uses the reference's integer division.
    Agents appear once per envelope they bought OR sold (an envelope
    never counts twice for one agent).
    """
    now = F.lit(now_ts).cast("timestamp") if not isinstance(now_ts, F.Column) else now_ts
    roles = (
        deals.select(F.col(buyer_col).alias("agent"), id_col, signed_at_col)
        .unionByName(
            deals.select(F.col(seller_col).alias("agent"), id_col, signed_at_col)
        )
        .dropDuplicates(["agent", id_col])
    )
    age_s = F.greatest(
        F.lit(0).cast("long"),
        F.unix_timestamp(now) - F.unix_timestamp(F.col(signed_at_col)),
    )
    w = F.pow(F.lit(0.5), age_s.cast("double") / F.lit(half_life_secs))
    hist = roles.groupBy("agent").agg(
        F.count("*").alias("completed"),
        F.sum(w).alias("_wt"),
        F.sum(age_s * 1000).alias("_settle_ms"),
    )
    disp = disputes.groupBy(F.col(agent_col).alias("agent")).agg(
        F.count("*").alias("disputed")
    )
    j = hist.join(disp, "agent", "left").withColumn(
        "disputed", F.coalesce(F.col("disputed"), F.lit(0).cast("long"))
    )
    # wc == wt here (every envelope in history is completed); keep the
    # reference's formula shape so a future partial-completion column
    # slots in unchanged.
    score = F.when(F.col("_wt") < 1e-6, F.lit(0.5)).otherwise(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                (F.col("_wt") - F.col("disputed") * 0.1 * F.col("_wt")) / F.col("_wt"),
            ),
        )
    )
    return j.select(
        "agent",
        "completed",
        "disputed",
        F.floor(F.col("_settle_ms").cast("double") / F.col("completed"))
        .cast("long")
        .alias("mean_settlement_ms"),
        F.round(F.col("_wt"), 6).alias("weighted_total"),
        F.round(score, 6).alias("score"),
    )
