"""MemFail per-operation fault isolation (reference
mnemo_core::eval::memfail, v0.4.11): decompose an end-to-end recall
failure into the three seams the engine exposes — remember (store),
run_consolidation (summarize), recall (retrieve) — with the canonical
stale-context fixture attributing a stale recall to the RETRIEVE seam
once store and summarize check out."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine

T0 = dt.datetime(2024, 6, 1, 10, 0, 0)

SCHEMA = (
    "id string, agent_id string, content string, memory_type string, "
    "scope string, importance float, tags array<string>, created_at timestamp"
)


def _remember(spark, rows):
    # materialized (r14): each test runs several read verbs over this
    # store; truncate the write-path lineage once (same assertions)
    return MnemoSparkEngine(spark).remember_batch(
        spark.createDataFrame(rows, SCHEMA)
    ).materialized()


def test_store_seam_roundtrip(spark):
    """STORE probe: a remembered record must exist, carry its hashes,
    and surface through exact recall — a failure here is a store
    fault regardless of what retrieval does later."""
    eng = _remember(
        spark,
        [("s1", "probe", "the sky is blue today", "semantic", "private",
          0.8, ["memfail"], T0)],
    )
    row = eng.memories.filter(F.col("id") == "s1").collect()
    assert len(row) == 1 and row[0]["content_hash"] and row[0]["chain_hash"]
    # exact strategy = exact content equality (the point-lookup form)
    exact = eng.recall(
        "the sky is blue today", principal="probe", strategy="exact", k=3
    )
    assert "s1" in [r["id"] for r in exact.collect()]
    # and the ranked lexical path finds it from a partial query
    lex = eng.recall("sky blue", principal="probe", strategy="lexical", k=3)
    assert "s1" in [r["id"] for r in lex.collect()]


def test_summarize_seam_keeps_cluster_retrievable(spark):
    """SUMMARIZE probe: consolidating a near-duplicate cluster must
    not lose the information — at least one member stays recallable
    (the representative), the rest are marked, never deleted."""
    dup = "the deploy runbook lives in the ops wiki"
    eng = _remember(
        spark,
        [
            ("c1", "probe", dup, "semantic", "private", 0.9, ["memfail"], T0),
            ("c2", "probe", dup, "semantic", "private", 0.6, ["memfail"],
             T0 + dt.timedelta(minutes=1)),
            ("c3", "probe", "unrelated note about lunch", "semantic",
             "private", 0.5, ["memfail"], T0),
        ],
    )
    cons = eng.run_consolidation(similarity_threshold=0.95).materialized()
    states = {
        r["id"]: r["consolidation_state"] for r in cons.memories.collect()
    }
    assert "consolidated" in (states["c1"], states["c2"])
    assert states["c3"] == "active"
    # no member was destroyed...
    assert cons.memories.count() == 3
    # ...and the runbook fact is still retrievable end-to-end
    hits = cons.recall("deploy runbook wiki", principal="probe", k=3)
    assert {r["id"] for r in hits.collect()} & {"c1", "c2"}


def test_retrieve_seam_stale_context_fixture(spark):
    """RETRIEVE probe (the canonical stale-context fixture): fact v2
    supersedes v1; store holds BOTH (correct — history is the store's
    job) and summarize is not involved, so surfacing v1 as current is
    attributable to the retrieve seam. Two retrieve-side contracts
    must hold: (1) the current-fact resolver marks exactly v2 current
    over the recall hits, and (2) recency-weighted recall ranks v2
    first."""
    from mnemo_spark.operators.window_ops import current_fact_resolver

    eng = _remember(
        spark,
        [
            ("v1", "probe", "the database endpoint is db-old.internal",
             "semantic", "private", 0.8, ["memfail"], T0),
            ("v2", "probe", "the database endpoint is db-new.internal",
             "semantic", "private", 0.8, ["memfail"],
             T0 + dt.timedelta(days=30)),
        ],
    )
    # store seam check first — both versions present and hashed
    assert eng.memories.filter(F.col("content_hash").isNotNull()).count() == 2

    # (1) resolver over the hits: fact key = agent (both rows are the
    # same fact in this fixture); only v2 may be current
    hits = eng.recall(
        "database endpoint", principal="probe", k=2,
        now=T0 + dt.timedelta(days=31),
    )
    resolved = current_fact_resolver(
        hits.join(eng.memories.select("id", "created_at"), "id"),
        ["agent_id"],
        "created_at",
        "id",
    ).collect()
    current = [r["id"] for r in resolved if r["is_current"]]
    assert current == ["v2"], (
        f"stale current fact: {current} — store+summarize verified, "
        "failure attributes to RETRIEVE"
    )
    # (2) recency-weighted recall ranks the fresh fact first
    ranked = [
        r["id"]
        for r in eng.recall(
            "database endpoint", principal="probe", k=2,
            now=T0 + dt.timedelta(days=31),
            weights={"semantic": 1.0, "lexical": 1.0, "recency": 6.0},
        ).collect()
    ]
    assert ranked[0] == "v2", f"stale recall under recency weights: {ranked}"
