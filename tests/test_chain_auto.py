"""assign_chain_auto (VERDICT r9 #6): ONE code path that picks the
single per-chain fold below the measured epoch-fold crossover and the
epoch-sharded form above it — byte-identical output on both sides.

The derived epoch (equal-width buckets of the leading order column)
must satisfy assign_chain_epochs' monotone/non-NULL contract by
construction; degenerate inputs (NULL order values, a non-temporal
leading column) fall back to the single fold rather than guessing.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from mnemo_spark.operators.chain import assign_chain, assign_chain_auto

T0 = dt.datetime(2024, 1, 1)


def _events(spark, n=150, agents=("giant",), null_ts_ids=()):
    rows = []
    for a in agents:
        for i in range(n):
            ts = None if f"{a}-{i}" in null_ts_ids else T0 + dt.timedelta(minutes=i)
            rows.append(
                (f"{a}-{i}", a, ts, i // 50,
                 hashlib.sha256(f"{a}:{i}".encode()).hexdigest())
            )
    return spark.createDataFrame(
        rows,
        "id string, agent_id string, ts timestamp, epoch int, "
        "content_hash string",
    )


def _chains(df):
    return {
        r["id"]: (r["prev_hash"], r["chain_hash"])
        for r in df.select("id", "prev_hash", "chain_hash").collect()
    }


def test_auto_below_crossover_is_single_fold_output(spark):
    df = _events(spark, n=60, agents=("a", "b"))
    auto = assign_chain_auto(
        df, ["agent_id"], ["ts", "id"], "content_hash", crossover_rows=1000
    )
    base = assign_chain(df, ["agent_id"], ["ts", "id"], "content_hash")
    assert _chains(auto) == _chains(base)
    assert sorted(auto.columns) == sorted(base.columns)


def test_auto_above_crossover_byte_identical(spark):
    """Force the epoch path with a tiny crossover: derived equal-width
    ts buckets must reproduce the single fold byte for byte."""
    df = _events(spark, n=150)
    auto = assign_chain_auto(
        df, ["agent_id"], ["ts", "id"], "content_hash", crossover_rows=100
    )
    base = assign_chain(df, ["agent_id"], ["ts", "id"], "content_hash")
    assert _chains(auto) == _chains(base)
    assert "_auto_epoch" not in auto.columns


def test_auto_with_seq_and_explicit_epoch(spark):
    df = _events(spark, n=150)
    auto = assign_chain_auto(
        df, ["agent_id"], ["ts", "id"], "content_hash",
        seq_col="seq", epoch_col="epoch", crossover_rows=100,
    )
    base = assign_chain(
        df, ["agent_id"], ["ts", "id"], "content_hash", seq_col="seq"
    )
    a = {r["id"]: (r["prev_hash"], r["chain_hash"], r["seq"]) for r in auto.collect()}
    b = {r["id"]: (r["prev_hash"], r["chain_hash"], r["seq"]) for r in base.collect()}
    assert a == b
    assert "epoch" in auto.columns  # caller's data column survives


def test_null_leading_order_falls_back_to_single_fold(spark):
    """A NULL ts row would make any derived epoch NULL (contract
    violation) — auto must take the single fold instead of raising."""
    df = _events(spark, n=120, null_ts_ids=("giant-7",))
    auto = assign_chain_auto(
        df, ["agent_id"], ["ts", "id"], "content_hash", crossover_rows=50
    )
    base = assign_chain(df, ["agent_id"], ["ts", "id"], "content_hash")
    assert _chains(auto) == _chains(base)


def test_string_leading_order_falls_back(spark):
    """Epoch derivation needs a numeric/temporal leading column; a
    string order key big enough to shard still runs the single fold."""
    df = _events(spark, n=120).withColumn("skey", F.col("id"))
    auto = assign_chain_auto(
        df, ["agent_id"], ["skey"], "content_hash", crossover_rows=50
    )
    base = assign_chain(df, ["agent_id"], ["skey"], "content_hash")
    assert _chains(auto) == _chains(base)


def test_prev_head_carry_through_auto_epoch_path(spark):
    """Cross-batch carry: the derived-epoch path must start from the
    stored head exactly like the single fold does."""
    df = _events(spark, n=150)
    heads = spark.createDataFrame(
        [("giant", hashlib.sha256(b"prior").hexdigest(), 7)],
        "agent_id string, chain_head string, head_seq long",
    )
    auto = assign_chain_auto(
        df, ["agent_id"], ["ts", "id"], "content_hash",
        prev_head=heads, seq_col="seq", crossover_rows=100,
    )
    base = assign_chain(
        df, ["agent_id"], ["ts", "id"], "content_hash",
        prev_head=heads, seq_col="seq",
    )
    a = {r["id"]: (r["prev_hash"], r["chain_hash"], r["seq"]) for r in auto.collect()}
    b = {r["id"]: (r["prev_hash"], r["chain_hash"], r["seq"]) for r in base.collect()}
    assert a == b
