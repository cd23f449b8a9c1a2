"""AMP adapter tests (reference crates/mnemo-amp): envelope
validation, op dispatch against the engine, the HITL approval gate,
and the router's RRF-vs-max fusion robustness demonstration
(router.rs:10-13)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine
from mnemo_spark.functions.amp import (
    AmpError,
    AmpStore,
    WriteDiff,
    validate_envelope,
)
from mnemo_spark.operators.rrf import max_fuse, rrf_fuse

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _store(spark, hook=None):
    # materialize after each op (r14): these tests walk sequences of
    # dispatches and assert on collected state after each; without
    # truncation every assertion re-executes the whole op history and
    # Catalyst re-analysis grows super-linearly (engine.materialized()
    # rationale). Dispatch semantics and all assertions are unchanged.
    class _MaterializingStore(AmpStore):
        def dispatch(self, env, now=None):
            out = super().dispatch(env, now=now)
            self.engine = self.engine.materialized()
            return out

    return _MaterializingStore(MnemoSparkEngine(spark), default_agent="agent-a",
                               approval_hook=hook)


def test_envelope_validation():
    ok = validate_envelope(
        {"op": "recall", "memory_type": "episodic", "query": "q"}
    )
    assert ok["top_k"] == 5 and ok["amp_version"] == "amp/1"
    for env, msg in [
        ({"op": "evict", "memory_type": "episodic"}, "op must"),
        ({"op": "remember", "memory_type": "eternal"}, "memory_type"),
        ({"op": "remember", "memory_type": "episodic"}, "content"),
        ({"op": "recall", "memory_type": "episodic"}, "query"),
        ({"op": "forget", "memory_type": "episodic"}, "memory_ids"),
        ({"op": "merge", "memory_type": "semantic", "memory_ids": ["a"]}, "at least 2"),
        ({"op": "recall", "memory_type": "episodic", "query": "q",
          "amp_version": "mcp/9"}, "amp_version"),
    ]:
        with pytest.raises(AmpError, match=msg):
            validate_envelope(env)


def test_remember_recall_forget_roundtrip(spark):
    s = _store(spark)
    r1 = s.dispatch(
        {"op": "remember", "memory_type": "episodic",
         "content": "the sky is blue today", "tags": ["weather"]},
        now=T0,
    )
    s.dispatch(
        {"op": "remember", "memory_type": "episodic",
         "content": "compilers fold constants"},
        now=T0 + dt.timedelta(seconds=1),
    )
    hits = s.dispatch(
        {"op": "recall", "memory_type": "episodic", "query": "blue sky",
         "top_k": 2},
    )
    assert hits["ok"] and hits["hits"][0]["id"] == r1["ids"][0]
    s.dispatch(
        {"op": "forget", "memory_type": "episodic", "memory_ids": r1["ids"]},
        now=T0 + dt.timedelta(seconds=2),
    )
    hits2 = s.dispatch(
        {"op": "recall", "memory_type": "episodic", "query": "blue sky", "top_k": 2}
    )
    assert r1["ids"][0] not in {h["id"] for h in hits2["hits"]}


def test_merge_consolidates_and_forgets_sources(spark):
    s = _store(spark)
    ids = []
    for i, c in enumerate(["fact one", "fact two"]):
        ids += s.dispatch(
            {"op": "remember", "memory_type": "semantic", "content": c},
            now=T0 + dt.timedelta(seconds=i),
        )["ids"]
    out = s.dispatch(
        {"op": "merge", "memory_type": "semantic", "memory_ids": ids},
        now=T0 + dt.timedelta(seconds=10),
    )
    mem = s.engine.memories
    merged = mem.filter(F.col("id") == out["ids"][0]).collect()[0]
    assert "fact one" in merged["content"] and "fact two" in merged["content"]
    assert ids[0] in merged["metadata"] and ids[1] in merged["metadata"]
    # sources soft-forgotten
    gone = mem.filter(F.col("id").isin(ids)).filter(
        F.col("deleted_at").isNotNull()
    )
    assert gone.count() == 2


def test_expire_composition(spark):
    s = _store(spark)
    rid = s.dispatch(
        {"op": "remember", "memory_type": "working", "content": "scratch"},
        now=T0,
    )["ids"]
    s.dispatch(
        {"op": "expire", "memory_type": "working", "memory_ids": rid},
        now=T0 + dt.timedelta(seconds=5),
    )
    assert s.engine.memories.filter(F.col("id").isin(rid)).count() == 0
    ev = s.engine.events.filter(
        (F.col("event_type") == "MemoryExpired") & F.col("memory_id").isin(rid)
    )
    assert ev.count() == 1
    # non-zero TTL defers removal past the sweep at `now`
    rid2 = s.dispatch(
        {"op": "remember", "memory_type": "working", "content": "keep a while"},
        now=T0,
    )["ids"]
    s.dispatch(
        {"op": "expire", "memory_type": "working", "memory_ids": rid2,
         "ttl_seconds": 3600},
        now=T0 + dt.timedelta(seconds=6),
    )
    assert s.engine.memories.filter(F.col("id").isin(rid2)).count() == 1


def test_approval_gate_long_term_writes(spark):
    decisions = []

    def hook(diff: WriteDiff):
        decisions.append(diff)
        return ("TODO" not in diff.after, "todo content refused")

    s = _store(spark, hook=hook)
    # episodic bypasses the hook entirely (approval.rs:12-14)
    s.dispatch({"op": "remember", "memory_type": "episodic",
                "content": "TODO scratch"}, now=T0)
    assert decisions == []
    # semantic write approved → stored + DecisionApprove audit row
    ok = s.dispatch({"op": "remember", "memory_type": "semantic",
                     "content": "the API key lives in vault"}, now=T0)
    assert len(decisions) == 1 and decisions[0].render().startswith("[semantic]")
    assert s.engine.events.filter(F.col("event_type") == "DecisionApprove").count() == 1
    assert s.engine.memories.filter(F.col("id").isin(ok["ids"])).count() == 1
    # rejected write never lands, but the rejection is audited
    with pytest.raises(AmpError, match="rejected"):
        s.dispatch({"op": "remember", "memory_type": "procedural",
                    "content": "TODO write this down"}, now=T0)
    assert s.engine.events.filter(F.col("event_type") == "DecisionReject").count() == 1
    assert s.engine.memories.filter(
        F.col("content").contains("TODO write")
    ).count() == 0


def test_rrf_robust_to_rank0_injection_max_is_fooled(spark):
    """router.rs:10-13: the conformance demonstration — one poisoned
    lane saturates max-fusion but shifts an RRF sum by at most one
    reciprocal term."""
    honest1 = spark.createDataFrame(
        [("good", 0.9), ("ok", 0.7), ("poison", 0.01)], "doc_id string, score double"
    )
    honest2 = spark.createDataFrame(
        [("good", 0.8), ("ok", 0.6), ("poison", 0.02)], "doc_id string, score double"
    )
    adversarial = spark.createDataFrame(
        [("poison", 999.0), ("good", 0.5)], "doc_id string, score double"
    )
    lanes = {"a": honest1, "b": honest2, "adv": adversarial}
    top_max = max_fuse(lanes, limit=1).collect()[0]["doc_id"]
    top_rrf = rrf_fuse(lanes, limit=1).collect()[0]["doc_id"]
    assert top_max == "poison"  # fooled
    assert top_rrf == "good"  # robust


def test_letta_agent_lifecycle(spark):
    """Letta state mapping (reference mnemo-letta/src/handlers.rs):
    create with blocks → message persists episodic + replies from
    recall → core memory returns the newest block per label."""
    from mnemo_spark.functions.letta import core_memory, create_agent, send_message

    eng = MnemoSparkEngine(spark)
    eng, aid = create_agent(
        eng, T0, persona="terse and helpful", human="prefers bullet lists"
    )
    eng = eng.materialized()
    assert aid.startswith("letta-")
    blocks = {r["block"]: r["content"] for r in core_memory(eng, aid).collect()}
    assert blocks == {
        "persona": "terse and helpful",
        "human": "prefers bullet lists",
    }
    # first message starts fresh-ish (blocks are semantic, recallable)
    eng, reply = send_message(
        eng, aid, "remember that the deploy window is friday",
        T0 + dt.timedelta(seconds=1),
    )
    eng = eng.materialized()
    assert reply.startswith("Recalled") or "starting fresh" in reply
    eng, reply2 = send_message(
        eng, aid, "when is the deploy window?", T0 + dt.timedelta(seconds=2)
    )
    eng = eng.materialized()
    assert "deploy window is friday" in reply2
    # updating a block supersedes, never duplicates (current-fact)
    from mnemo_spark.functions.letta import _store_block

    eng = _store_block(eng, aid, "persona", "now verbose",
                       T0 + dt.timedelta(seconds=3)).materialized()
    blocks2 = {r["block"]: r["content"] for r in core_memory(eng, aid).collect()}
    assert blocks2["persona"] == "now verbose" and len(blocks2) == 2
    with pytest.raises(ValueError, match="content is required"):
        send_message(eng, aid, "   ", T0)
