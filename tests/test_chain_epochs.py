"""Epoch-sharded chain assignment (the one-giant-agent mitigation,
VERDICT r7 #3): assign_chain_epochs must be byte-identical to the
single-fold assign_chain on the same total order — heads, per-row
prev/chain hashes, and sequence numbers — while bounding each Arrow
fold to one epoch (reference remember.rs:104-111 serializes writers
per chain; sharding the sequential semantics into carried epochs is
the scale form)."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from mnemo_spark.operators.chain import assign_chain, assign_chain_epochs

T0 = dt.datetime(2024, 1, 1)


def _events(spark, n=120, agents=("giant",), extra_agents=0):
    rows = []
    for a in agents:
        for i in range(n):
            rows.append(
                (f"{a}-{i}", a, T0 + dt.timedelta(minutes=i), i // 40,
                 hashlib.sha256(f"{a}:{i}".encode()).hexdigest())
            )
    for j in range(extra_agents):
        rows.append(
            (f"x{j}-0", f"x{j}", T0, 0,
             hashlib.sha256(f"x{j}".encode()).hexdigest())
        )
    return spark.createDataFrame(
        rows,
        "id string, agent_id string, ts timestamp, epoch int, "
        "content_hash string",
    )


def _collect(df):
    return {
        r["id"]: (r["prev_hash"], r["chain_hash"], r["seq"])
        for r in df.collect()
    }


def test_epoch_sharded_equals_single_fold(spark):
    """One giant agent, 120 rows over 3 epochs + a few one-row agents:
    every row's prev/chain hash and sequence match the single fold."""
    ev = _events(spark, n=120, extra_agents=3)
    single = _collect(
        assign_chain(ev, ["agent_id"], ["ts", "id"], "content_hash",
                     seq_col="seq")
    )
    sharded = _collect(
        assign_chain_epochs(ev, ["agent_id"], ["ts", "id"], "content_hash",
                            epoch_col="epoch", seq_col="seq")
    )
    assert sharded == single


def test_epoch_sharded_with_carried_prev_head(spark):
    """Cross-batch continuation: both forms continue from the same
    stored heads frame and stay identical."""
    ev = _events(spark, n=60)
    prev = spark.createDataFrame(
        [("giant", hashlib.sha256(b"carried").hexdigest(), 7)],
        "agent_id string, chain_head string, head_seq long",
    )
    single = _collect(
        assign_chain(ev, ["agent_id"], ["ts", "id"], "content_hash",
                     prev_head=prev, seq_col="seq")
    )
    sharded = _collect(
        assign_chain_epochs(ev, ["agent_id"], ["ts", "id"], "content_hash",
                            epoch_col="epoch", prev_head=prev, seq_col="seq")
    )
    assert sharded == single
    # the carried head seeds row 1 and the sequence continues at 8
    first = min(single.values(), key=lambda v: v[2])
    assert first[0] == hashlib.sha256(b"carried").hexdigest()
    assert first[2] == 8


def test_epoch_fold_parallelism_shape(spark):
    """The assign pass groups by (chain, epoch): with E epochs the
    giant chain's rows arrive in E separate Arrow folds (bounded
    memory), verified by distinct (agent, epoch) group count in the
    plan input — and the head pass stitched them into ONE unbroken
    chain (verify: recomputing the full chain sequentially matches)."""
    ev = _events(spark, n=90)
    out = assign_chain_epochs(
        ev, ["agent_id"], ["ts", "id"], "content_hash",
        epoch_col="epoch", seq_col="seq",
    )
    rows = sorted(out.collect(), key=lambda r: r["seq"])
    prev = ""
    for r in rows:
        assert r["prev_hash"] == prev
        link = hashlib.sha256(
            (r["content_hash"] + prev).encode()
        ).hexdigest()
        assert r["chain_hash"] == link
        prev = link
    assert ev.select("agent_id", "epoch").distinct().count() == 3


def test_null_epoch_fails_loud(spark):
    """ADVICE r8: a NULL epoch must raise a diagnostic error, never a
    bare TypeError (old driver-side sorted()) or a corrupt chain."""
    ev = _events(spark, n=12).withColumn(
        "epoch", F.when(F.col("id") == "giant-5", F.lit(None)).otherwise(
            F.col("epoch")
        )
    )
    out = assign_chain_epochs(
        ev, ["agent_id"], ["ts", "id"], "content_hash",
        epoch_col="epoch", seq_col="seq",
    )
    with pytest.raises(Exception, match="NULL value in epoch column"):
        out.collect()


def test_non_monotone_epoch_fails_loud(spark):
    """ADVICE r8: an epoch that decreases along order_cols within a
    chain violates the documented precondition — must surface as an
    error, not a silently mis-ordered chain."""
    ev = _events(spark, n=90).withColumn(
        "epoch", F.when(F.col("id") == "giant-85", F.lit(0)).otherwise(
            F.col("epoch")
        )
    )
    out = assign_chain_epochs(
        ev, ["agent_id"], ["ts", "id"], "content_hash",
        epoch_col="epoch", seq_col="seq",
    )
    with pytest.raises(Exception, match="not.*monotone"):
        out.collect()


def test_single_epoch_degenerates_to_plain_fold(spark):
    ev = _events(spark, n=20).withColumn("epoch", F.lit(0))
    single = _collect(
        assign_chain(ev, ["agent_id"], ["ts", "id"], "content_hash",
                     seq_col="seq")
    )
    sharded = _collect(
        assign_chain_epochs(ev, ["agent_id"], ["ts", "id"], "content_hash",
                            epoch_col="epoch", seq_col="seq")
    )
    assert sharded == single
