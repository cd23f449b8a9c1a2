"""Agent-memory lifecycle walkthrough: remember → recall → share →
forget(redact) → verify → durable save/load — the reference's README
scenario run against the batch engine, ending with chain verification
over a transaction-log roundtrip.

Run: python examples/agent_memory_demo.py
Prints one JSON line of stage outcomes.
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mnemo_spark.engine import MnemoSparkEngine  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)

ROWS = [
    ("m1", "alice", "the deploy key rotates on fridays", "semantic",
     "private", 0.9, ["ops"], T0),
    ("m2", "alice", "staging db password is hunter2", "semantic",
     "private", 0.8, ["ops", "secret"], T0),
    ("m3", "alice", "the standup moved to 9:30", "episodic",
     "private", 0.4, ["calendar"], T0),
    ("m4", "bob", "alice owns the deploy pipeline", "semantic",
     "public", 0.6, ["ops"], T0),
]

SCHEMA = (
    "id string, agent_id string, content string, memory_type string, "
    "scope string, importance float, tags array<string>, "
    "created_at timestamp"
)


def main() -> None:
    spark = get_spark("memory_demo")
    out: dict = {}

    # remember: validate → hash → chain → append (audit log grows)
    eng = MnemoSparkEngine(spark).remember_batch(
        spark.createDataFrame(ROWS, SCHEMA)
    ).materialized()  # commit the write before the read verbs walk it
    out["remembered"] = eng.memories.count()

    # recall: hybrid retrieval scoped to what alice may see
    hits = eng.recall("deploy pipeline key", principal="alice", k=3)
    out["recall_top"] = [r["id"] for r in hits.collect()]

    # bob must NOT see alice's private memories
    bob_hits = eng.recall("staging password", principal="bob", k=5)
    out["bob_sees_secret"] = any(
        r["id"] == "m2" for r in bob_hits.collect()
    )

    # forget with redaction: content is destroyed, the chain survives
    eng2 = eng.forget(["m2"], strategy="redact").materialized()
    redacted = eng2.memories.filter(F.col("id") == "m2").collect()[0]
    out["redacted_content_gone"] = "hunter2" not in (redacted["content"] or "")
    out["chain_intact_after_redact"] = (
        eng2.verify_integrity().filter(F.col("n_breaks") > 0).count() == 0
    )

    # durable save → load → verify again over the roundtrip
    store = tempfile.mkdtemp(prefix="memdemo_")
    v = eng2.save(store)
    back = MnemoSparkEngine.load(spark, store)
    out["saved_version"] = v
    out["loaded_memories"] = back.memories.count()
    out["chain_intact_after_roundtrip"] = (
        back.verify_integrity().filter(F.col("n_breaks") > 0).count() == 0
    )
    out["audit_log_intact"] = (
        back.verify_event_integrity().filter(F.col("n_breaks") > 0).count() == 0
    )

    # poisoning defense: quarantine hides from recall but stays
    # replayable; the review verb lists it for the operator
    q = back.quarantine(["m1"], reason="suspicious provenance", now=T0).materialized()
    out["quarantined_hidden"] = not any(
        r["id"] == "m1"
        for r in q.recall("deploy pipeline key", principal="alice", k=5).collect()
    )
    out["quarantine_review"] = [
        (r["id"], r["reason"])
        for r in q.replay_quarantine(agent_id="alice").collect()
    ]

    # active reconstruction: deterministic belief-state node returned
    # ALONGSIDE the raw hits (v0.5.1 reconstruct strategy)
    _, belief = back.recall_reconstruct("deploy pipeline key", "alice", k=2)
    out["belief_head"] = belief["summary"].splitlines()[0]
    out["belief_sources"] = belief["source_ids"]

    # recall-shaped load: the manifest stats save recorded prune the
    # read to alice's files only
    alice_only = MnemoSparkEngine.load(
        spark, store, mem_where=("agent_id", "alice", "alice")
    )
    out["pruned_load_agents"] = sorted(
        r["agent_id"]
        for r in alice_only.memories.select("agent_id").distinct().collect()
    )

    assert out["remembered"] == 4
    assert not out["bob_sees_secret"]
    assert out["redacted_content_gone"]
    assert out["chain_intact_after_roundtrip"] and out["audit_log_intact"]
    assert out["quarantined_hidden"]
    assert out["quarantine_review"] == [("m1", "suspicious provenance")]
    assert out["belief_head"].startswith('Reconstructed belief for cue')
    assert out["belief_sources"]
    assert out["pruned_load_agents"] == ["alice"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
