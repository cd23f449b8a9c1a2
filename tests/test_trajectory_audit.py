"""GEM trajectory-correctness audit (reference
mnemo-compliance/src/trajectory.rs): the four signals, their
severity ladders, and the per-agent report shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine

T0 = dt.datetime(2024, 5, 1, 8, 0, 0)

SCHEMA = (
    "id string, agent_id string, content string, memory_type string, "
    "scope string, importance float, tags array<string>, created_at timestamp"
)


def _rows(agent, n, prefix):
    return [
        (f"{prefix}{i}", agent, f"{prefix} fact number {i}", "semantic",
         "private", 0.5, ["t"], T0 + dt.timedelta(minutes=i))
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def eng(spark):
    # module-scoped + materialized (r14): five tests read this state
    # (trajectory_audit/doctor are read verbs); one truncated build
    # replaces a per-test write+forget replay
    e = MnemoSparkEngine(spark).remember_batch(
        spark.createDataFrame(_rows("alice", 6, "a") + _rows("bob", 2, "b"), SCHEMA)
    )
    # alice retires two memories (labelled strategies)
    return e.forget(
        ["a0", "a1"], strategy="soft", now=T0 + dt.timedelta(hours=1)
    ).materialized()


def test_growth_signal_and_severities(eng):
    # ceiling 4: alice's sizes run 1..6 then 5,4 after the deletes —
    # three events sit above the ceiling (5, 6, 5; the reference
    # counts removal events' post-sizes too); peak 6 <= 2*4 → warn.
    # bob peaked at 2 (ok)
    rep = {r["agent_id"]: r for r in eng.trajectory_audit(4).collect()}
    assert rep["alice"]["peak_active_size"] == 6
    assert rep["alice"]["growth_breaches"] == 3
    assert rep["alice"]["growth_severity"] == "warn"
    assert rep["bob"]["growth_severity"] == "ok"
    assert not rep["alice"]["trajectory_ok"] and rep["bob"]["trajectory_ok"]
    # ceiling 2: alice's peak 6 > 2*2 → fail
    rep2 = {r["agent_id"]: r for r in eng.trajectory_audit(2).collect()}
    assert rep2["alice"]["growth_severity"] == "fail"


def test_unlabelled_forgetting_signal(eng, spark):
    # a foreign event log with a removal type outside the named set
    foreign = spark.createDataFrame(
        [("x1", "alice", "MemoryPurge", "a5", T0, 99, None, None, None)],
        eng.events.schema,
    )
    audited = MnemoSparkEngine(
        spark, memories=eng.memories, events=eng.events.unionByName(foreign)
    )
    # MemoryPurge is not a removal type the audit recognizes at all —
    # it must not count; but a recognized type excluded from `named`
    # must flag
    rep = {
        r["agent_id"]: r
        for r in audited.trajectory_audit(
            100, named_removal_types=("MemoryRedact",)
        ).collect()
    }
    assert rep["alice"]["unlabelled_forgets"] == 2  # the two soft deletes
    assert rep["alice"]["forgetting_severity"] == "warn"
    labelled = {r["agent_id"]: r for r in eng.trajectory_audit(100).collect()}
    assert labelled["alice"]["forgetting_severity"] == "ok"


def test_missing_revision_signal(eng, spark):
    # a2 and a3 record the same fact; neither was retired → 1 stale
    facts = spark.createDataFrame(
        [("a2", "capital"), ("a3", "capital"), ("a4", "other")],
        "memory_id string, fact_id string",
    )
    rep = {
        r["agent_id"]: r for r in eng.trajectory_audit(100, facts=facts).collect()
    }
    assert rep["alice"]["stale_facts"] == 1
    assert rep["alice"]["revision_severity"] == "warn"
    # retiring the stale write clears the signal
    cleaned = eng.forget(["a2"], strategy="redact", now=T0 + dt.timedelta(hours=2))
    rep2 = {
        r["agent_id"]: r
        for r in cleaned.trajectory_audit(100, facts=facts).collect()
    }
    assert rep2["alice"]["stale_facts"] == 0
    assert rep2["alice"]["revision_severity"] == "ok"


def test_read_only_retrieval_signal(eng, spark):
    reads = spark.createDataFrame(
        [("alice",), ("carol",)], "agent_id string"
    )
    rep = {
        r["agent_id"]: r for r in eng.trajectory_audit(100, reads=reads).collect()
    }
    # alice reads AND writes → not read-only; carol never wrote, but
    # carol has no event rows so she is absent from the per-agent
    # report (the reference scopes the report to logged agents too)
    assert rep["alice"]["read_only"] is False
    # signals not provided default to NULL and do not veto trajectory_ok
    assert rep["bob"]["read_only"] is False or rep["bob"]["read_only"] is None


def test_doctor_report_checks(eng, spark):
    import datetime as dt

    rep = {r["check"]: r for r in eng.doctor(now=T0).collect()}
    assert set(rep) == {
        "memory_chain", "audit_chain", "embedder", "embedding_coverage",
        "ttl_backlog", "soft_delete_backlog",
    }
    assert rep["memory_chain"]["status"] == "ok"
    assert rep["audit_chain"]["status"] == "ok"
    assert rep["embedder"]["status"] == "ok"
    # the fixture soft-deleted two memories → backlog warns with count
    assert rep["soft_delete_backlog"]["status"] == "warn"
    assert rep["soft_delete_backlog"]["affected"] == 2
    assert "vacuum" in rep["soft_delete_backlog"]["recommendation"]

    # an unconfigured embedder flips the embedder check to warn
    from mnemo_spark.functions.embed_batch import NoopEmbedder

    bare = MnemoSparkEngine(
        spark, memories=eng.memories, events=eng.events,
        embedder=NoopEmbedder(256),
    )
    rep2 = {r["check"]: r for r in bare.doctor(now=T0).collect()}
    assert rep2["embedder"]["status"] == "warn"
