"""IVF partitioned-layout tests: the on-disk inverted list
(ivf_write_partitioned / ivf_probe_partitioned, operators/vector.py)
must (a) prune the scan to the probed partition directories — the
100-TB contract — and (b) return results identical to ivf_topk over
the full corpus. Admin verbs (quarantine / unquarantine / stats,
reference mnemo-admin/src/handlers.rs) ride along here."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine
from mnemo_spark.operators.vector import (
    ivf_probe_partitioned,
    ivf_topk,
    ivf_write_partitioned,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    rows = [(f"v{i:03d}", [float(x) for x in rng.normal(size=8)]) for i in range(120)]
    return spark.createDataFrame(rows, "vec_id string, embedding array<float>")


@pytest.fixture(scope="module")
def cents(spark):
    rng = np.random.default_rng(11)
    rows = [(f"c{i}", [float(x) for x in rng.normal(size=8)]) for i in range(6)]
    return spark.createDataFrame(rows, "cent_id string, cent_vec array<float>")


@pytest.fixture(scope="module")
def queries(spark):
    rng = np.random.default_rng(13)
    rows = [(f"q{i}", [float(x) for x in rng.normal(size=8)]) for i in range(3)]
    return spark.createDataFrame(rows, "query_id string, query_vec array<float>")


def test_partitioned_probe_matches_full_ivf(spark, vecs, cents, queries, tmp_path):
    path = str(tmp_path / "ivf")
    ivf_write_partitioned(vecs, cents, path)
    got = ivf_probe_partitioned(spark, path, queries, cents, nprobe=2, k=5)
    want = ivf_topk(vecs, queries, cents, nprobe=2, k=5)
    g = sorted(map(tuple, got.select("query_id", "vec_id", "rank").collect()))
    w = sorted(map(tuple, want.select("query_id", "vec_id", "rank").collect()))
    assert g == w and len(g) == 15


def test_probe_scan_is_partition_pruned(spark, vecs, cents, queries, tmp_path):
    path = str(tmp_path / "ivf2")
    ivf_write_partitioned(vecs, cents, path)
    # the cell predicate must reach the FileScan as a PartitionFilter,
    # not survive as a post-scan Filter over all 6 directories
    pruned = spark.read.parquet(path).filter(F.col("cent_id").isin(["c0", "c1"]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cent_id" in plan.split("PartitionFilters")[1][:200]
    # and the pruned read really touches only the probed cells
    assert set(r["cent_id"] for r in pruned.select("cent_id").distinct().collect()) <= {
        "c0", "c1"
    }


def test_quarantine_hides_from_recall_and_is_reversible(spark):
    t0 = dt.datetime(2026, 1, 1)
    eng = MnemoSparkEngine(spark)
    rows = spark.createDataFrame(
        [("m1", "a1", "the blue sky fact", "semantic", "private", 0.5, [], t0),
         ("m2", "a1", "another plain fact", "semantic", "private", 0.5, [], t0)],
        "id string, agent_id string, content string, memory_type string,"
        " scope string, importance float, tags array<string>, created_at timestamp",
    )
    eng = eng.remember_batch(rows).materialized()
    assert {r["id"] for r in eng.recall("blue sky", "a1", k=5).collect()} >= {"m1"}
    q = eng.quarantine(["m1"], reason="poisoning suspected", now=t0).materialized()
    # invisible to recall, but never deleted (replayable)
    assert "m1" not in {r["id"] for r in q.recall("blue sky", "a1", k=5).collect()}
    kept = q.memories.filter(F.col("id") == "m1").collect()[0]
    assert kept["quarantined"] == "poisoning suspected" and kept["deleted_at"] is None
    assert q.events.filter(F.col("event_type") == "MemoryQuarantine").count() == 1
    # release restores visibility (handlers.rs:324-344)
    u = q.unquarantine(["m1"], now=t0)
    assert "m1" in {r["id"] for r in u.recall("blue sky", "a1", k=5).collect()}
    assert u.events.filter(F.col("event_type") == "MemoryUnquarantine").count() == 1


def test_replay_quarantine_ordering_cutoff_and_deleted_visibility(spark):
    """Reference integration_test.rs:2923-2967
    test_replay_quarantine_ordering_and_cutoff: every quarantined
    record for the agent, sorted by created_at, filtered by `since` —
    plus the poisoning.rs:277-280 contract that soft-DELETED
    quarantined rows stay visible to the review (include_deleted)."""
    t0 = dt.datetime(2026, 1, 1)
    eng = MnemoSparkEngine(spark)
    rows = spark.createDataFrame(
        [(f"m{i}", "q-agent", f"suspect record {i}", "semantic", "private",
          0.5, [], t0 + dt.timedelta(hours=i)) for i in range(4)]
        + [("other", "b-agent", "unrelated", "semantic", "private", 0.5, [], t0)],
        "id string, agent_id string, content string, memory_type string,"
        " scope string, importance float, tags array<string>, created_at timestamp",
    )
    eng = eng.remember_batch(rows).materialized()
    q = eng.quarantine(["m1", "m3", "other"], reason="test-trigger", now=t0).materialized()

    listed = q.replay_quarantine(agent_id="q-agent").collect()
    assert [r["id"] for r in listed] == ["m1", "m3"]  # created_at order
    assert all(r["reason"] == "test-trigger" for r in listed)
    assert listed[0]["created_at"] <= listed[1]["created_at"]

    # `since` cutoff keeps only records created at/after the cutoff
    later = q.replay_quarantine(
        agent_id="q-agent", since=t0 + dt.timedelta(hours=2)
    ).collect()
    assert [r["id"] for r in later] == ["m3"]

    # soft-deleted quarantined rows remain visible (include_deleted)
    qd = q.forget(["m1"], strategy="soft", now=t0)
    still = qd.replay_quarantine(agent_id="q-agent").collect()
    assert [r["id"] for r in still] == ["m1", "m3"]
    assert still[0]["deleted_at"] is not None

    # agent scoping; None reviews every agent (batch stance)
    assert [r["id"] for r in q.replay_quarantine(agent_id="b-agent").collect()] == ["other"]
    assert q.replay_quarantine().count() == 3


def test_admin_stats_exact_counts(spark):
    t0 = dt.datetime(2026, 1, 1)
    eng = MnemoSparkEngine(spark)
    rows = spark.createDataFrame(
        [(f"m{i}", f"a{i % 3}", f"fact {i}", "episodic", "private", 0.5, [], t0)
         for i in range(7)],
        "id string, agent_id string, content string, memory_type string,"
        " scope string, importance float, tags array<string>, created_at timestamp",
    )
    eng = eng.remember_batch(rows).materialized()
    stats = eng.admin_stats()
    assert stats["memory_count"] == 7
    assert stats["agent_ids"] == ["a0", "a1", "a2"]
    assert stats["event_count"] == 7  # one MemoryWrite per row
