"""Append-only contract for the agent-events log (reference
storage/mod.rs:156-166 `events_are_append_only`: DuckDB exposes no
DELETE/UPDATE on agent_events and PostgreSQL enforces a
prevent_event_modification trigger; integration_test.rs:2684 proves
GDPR redact preserves the chain).

The Spark engine's equivalent invariant: EVERY mutating verb routes
event rows through `_append_events`, and the resulting events frame is
a strict superset of the previous one — existing (event_id, chain_hash)
rows are never rewritten or dropped, even by erasure verbs. At the
storage layer the DESIGN.md mapping is a Delta table with
`delta.appendOnly=true`; this test pins the engine-level contract that
makes that mapping sufficient.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine
from tests.test_engine import T0, _mk_rows


def _event_set(engine) -> set[tuple]:
    return {
        (r.event_id, r.agent_id, r.event_type, r.memory_id, r.prev_hash, r.chain_hash)
        for r in engine.events.collect()
    }


@pytest.fixture(scope="module")
def base(spark):
    # module-scoped + materialized (r14): every test reads this state,
    # never mutates it (verbs return NEW engines), and materializing
    # once stops each test's collects from replaying the write path —
    # the un-truncated 5-verb chain below measured 517 s of Catalyst
    # re-analysis + re-execution vs ~8 s materialized, identical
    # assertions (guide §7.3: plan growth; engine.materialized()).
    rows = _mk_rows(
        spark,
        [
            ("a1", "alice", "paris note with pii: alice@example.com",
             "semantic", "private", 0.9, ["geo"], T0),
            ("a2", "alice", "another alice fact", "episodic", "private", 0.5,
             ["x"], T0 + dt.timedelta(hours=1)),
            ("b1", "bob", "bob fact", "semantic", "private", 0.7, ["y"], T0),
        ],
    )
    return MnemoSparkEngine(spark).remember_batch(rows).materialized()


def test_every_verb_strictly_appends(base):
    """Soft/hard/redact forget, criteria forget, TTL sweep: each step's
    event log contains the previous one unchanged, plus new rows."""
    now = T0 + dt.timedelta(days=2)
    steps = [
        lambda e: e.forget(["a2"], strategy="soft", now=now),
        lambda e: e.forget(["b1"], strategy="hard", now=now),
        lambda e: e.forget_subject("alice@example", strategy="redact", now=now),
        lambda e: e.forget_by_criteria(
            agent_id="alice", strategy="archive", min_importance_below=2.0, now=now
        ),
        lambda e: e.run_ttl_sweep(now=now),
    ]
    engine = base
    prev = _event_set(engine)
    assert prev  # remember itself audited
    for step in steps:
        # materialize each verb's output before asserting on it — the
        # delta engine's analog of the verb committing its table; the
        # assertions are identical, the O(steps²) lazy re-execution
        # (and super-linear Catalyst re-analysis) is not paid
        engine = step(engine).materialized()
        cur = _event_set(engine)
        assert prev <= cur, "an existing event row was rewritten or dropped"
        prev = cur
    # the log still verifies end-to-end after the whole verb sequence
    assert (
        engine.verify_event_integrity().filter(F.col("n_breaks") > 0).count() == 0
    )


def test_hard_delete_removes_memory_but_never_events(base):
    now = T0 + dt.timedelta(days=2)
    before = _event_set(base)
    after = base.forget(["b1"], strategy="hard", now=now)
    # the memory row is gone...
    assert after.memories.filter(F.col("id") == "b1").count() == 0
    # ...but its write-audit row survives, plus a delete-audit row
    assert before <= _event_set(after)
    assert (
        after.events.filter(
            (F.col("memory_id") == "b1") & (F.col("event_type") == "MemoryDelete")
        ).count()
        == 1
    )


def test_gdpr_redact_preserves_chain(base):
    """integration_test.rs:2684: redact blanks content but preserves
    content_hash/chain_hash, so both the memory chain and the event
    chain verify after erasure."""
    now = T0 + dt.timedelta(days=2)
    before = {r.id: r for r in base.memories.collect()}
    after = base.forget_subject("alice@example", strategy="redact", now=now)
    got = {r.id: r for r in after.memories.collect()}
    assert got["a1"].content == "[REDACTED]"
    assert got["a1"].embedding is None
    # hashes preserved byte-for-byte — the chain is erasure-proof
    for mid in before:
        assert got[mid].content_hash == before[mid].content_hash
        assert got[mid].chain_hash == before[mid].chain_hash
        assert got[mid].prev_hash == before[mid].prev_hash
    assert (
        after.verify_event_integrity().filter(F.col("n_breaks") > 0).count() == 0
    )
