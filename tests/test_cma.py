"""CMA compat-shim tests (reference crates/mnemo-cma): audit-bridge
determinism (audit_bridge.rs tests), stable import summaries, the
export→import digest round trip (migrate.rs round-trip test), and
engine ingestion through the shared md_sync parse path."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine
from mnemo_spark.sources.cma import (
    GENESIS,
    bridge_event,
    export_to_tree,
    import_cma_tree,
    ingest_cma_tree,
    tree_digest,
)


def test_bridge_deterministic_and_path_sensitive():
    a = bridge_event("cma_beta", "notes/x.md", "write", 42, GENESIS)
    b = bridge_event("cma_beta", "notes/x.md", "write", 42, GENESIS)
    assert a == b  # audit_bridge.rs bridge_is_deterministic
    c = bridge_event("cma_beta", "notes/y.md", "write", 42, GENESIS)
    assert a.bridge_hash != c.bridge_hash  # bridge_changes_with_path
    with pytest.raises(ValueError, match="CmaSource"):
        bridge_event("native", "x.md", "write", 1, GENESIS)


def test_import_summary_stable_and_counts_md(tmp_path):
    root = str(tmp_path / ".memory")
    export_to_tree(root, [
        ("persona.md", "---\ntags: [core]\n---\nI am helpful."),
        ("notes/a.md", "note a"),
        ("notes/b.txt", "not a memory"),
    ])
    s1, ev1 = import_cma_tree(root)
    s2, _ = import_cma_tree(root)
    assert s1 == s2  # same tree → same head (migrate.rs:20-21)
    assert s1["files"] == 3 and s1["memories"] == 2
    assert s1["audit_events_bridged"] == 3
    # chain links
    assert ev1[0].prev_hash == GENESIS
    for p, c in zip(ev1, ev1[1:]):
        assert c.prev_hash == p.bridge_hash
    assert s1["hmac_chain_head"] == ev1[-1].bridge_hash.hex()
    # empty/missing tree: zero summary, genesis head
    s0, ev0 = import_cma_tree(str(tmp_path / "nope"))
    assert s0["files"] == 0 and s0["hmac_chain_head"] == GENESIS.hex() and ev0 == []


def test_export_import_digest_roundtrip(tmp_path):
    files = [("a.md", "alpha"), ("sub/b.md", "beta")]
    r1, r2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    export_to_tree(r1, files)
    export_to_tree(r2, files)
    assert tree_digest(r1) == tree_digest(r2)
    export_to_tree(r2, [("a.md", "alphaX")])
    assert tree_digest(r1) != tree_digest(r2)


def test_ingest_modes(spark, tmp_path):
    root = str(tmp_path / ".memory")
    export_to_tree(root, [
        ("persona.md", "core persona: be helpful and terse"),
        ("human.md", "the human prefers short answers"),
    ])
    t0 = dt.datetime(2026, 1, 1)
    eng = MnemoSparkEngine(spark)
    # read_through never persists (tree.rs:9-12)
    same, rows, summary = ingest_cma_tree(eng, spark, root, "cma-agent", t0,
                                          mode="read_through")
    assert same is eng and rows.count() == 2 and summary["memories"] == 2
    # write_through lands both memories + audit rows
    eng2, _, _ = ingest_cma_tree(eng, spark, root, "cma-agent", t0,
                                 mode="write_through")
    assert eng2.memories.count() == 2
    assert eng2.events.filter(F.col("event_type") == "MemoryWrite").count() == 2
    hits = eng2.recall("short answers", "cma-agent", k=1).collect()
    assert hits and "short answers" in hits[0]["content"]
    with pytest.raises(ValueError, match="SyncMode"):
        ingest_cma_tree(eng, spark, root, "cma-agent", t0, mode="push")
