"""VersionedEngine tests: checkpoint lineage, branch visibility,
point-in-time replay, and the three merge strategies (reference
checkpoint/branch/merge/replay verbs; SURVEY J8/T5)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import VersionedEngine

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
T1 = T0 + dt.timedelta(hours=1)
T2 = T0 + dt.timedelta(hours=2)

_ROW_SCHEMA = (
    "id string, agent_id string, content string, memory_type string, "
    "scope string, importance float, tags array<string>, created_at timestamp"
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, _ROW_SCHEMA)


@pytest.fixture(scope="module")
def versioned(spark):
    eng = VersionedEngine(spark).remember_on(
        _rows(
            spark,
            [
                ("m1", "alice", "base fact one", "semantic", "private", 0.9, [], T0),
                ("m2", "alice", "base fact two", "semantic", "private", 0.8, ["x"], T0),
            ],
        ),
        branch="main",
    ).materialized()
    eng = eng.checkpoint("thread-1", "main", T1)
    cp1 = eng.latest_checkpoints().collect()[0]["checkpoint_id"]
    eng = eng.branch(cp1, "feature")
    eng = eng.remember_on(
        _rows(
            spark,
            [
                ("m3", "alice", "feature-only fact", "episodic", "private", 0.5, [], T2),
                ("m4", "alice", "another feature fact", "episodic", "private", 0.4, ["y"], T2),
            ],
        ),
        branch="feature",
    ).materialized()
    return eng, cp1


def test_checkpoint_lineage(versioned):
    eng, cp1 = versioned
    latest = {r["branch"]: r for r in eng.latest_checkpoints().collect()}
    assert set(latest) == {"main", "feature"}
    assert latest["feature"]["parent_id"] == cp1
    assert eng.ancestry("feature") == ["feature", "main"]
    assert eng.ancestry("main") == ["main"]


def test_branch_visibility(versioned):
    eng, _ = versioned
    feat_ids = {r["id"] for r in eng.visible_on_branch("feature").collect()}
    assert feat_ids == {"m1", "m2", "m3", "m4"}  # inherits main via fork
    main_ids = {r["id"] for r in eng.visible_on_branch("main").collect()}
    assert main_ids == {"m1", "m2"}  # feature writes stay off main


def test_replay_is_point_in_time(versioned):
    eng, cp1 = versioned
    ids = {r["id"] for r in eng.replay(cp1).collect()}
    assert ids == {"m1", "m2"}  # m3/m4 created after the checkpoint
    with pytest.raises(ValueError):
        eng.replay("nope")


def test_merge_full(versioned):
    eng, _ = versioned
    merged = eng.merge("feature", "main", strategy="full")
    main_ids = {r["id"] for r in merged.visible_on_branch("main").collect()}
    assert main_ids == {"m1", "m2", "m3", "m4"}


def test_merge_cherry_pick(versioned):
    eng, _ = versioned
    merged = eng.merge("feature", "main", strategy="cherry_pick", ids=["m3"])
    main_ids = {r["id"] for r in merged.visible_on_branch("main").collect()}
    assert main_ids == {"m1", "m2", "m3"}
    with pytest.raises(ValueError):
        eng.merge("feature", "main", strategy="cherry_pick")


def test_merge_squash(versioned):
    eng, _ = versioned
    merged = eng.merge("feature", "main", strategy="squash", now=T2 + dt.timedelta(hours=1))
    sq = merged.memories.filter(F.col("id").startswith("squash-")).collect()
    assert len(sq) == 1
    assert sq[0]["branch"] == "main"
    assert sq[0]["memory_type"] == "semantic"
    # deterministic created_at-ordered concatenation
    assert sq[0]["content"] == "feature-only fact\nanother feature fact"
    assert sorted(sq[0]["tags"]) == ["y"]
    # originals marked consolidated, still on feature
    states = {
        r["id"]: r["consolidation_state"]
        for r in merged.memories.filter(F.col("branch") == "feature").collect()
    }
    assert states == {"m3": "consolidated", "m4": "consolidated"}


def test_inherited_verbs_preserve_version_state(spark):
    """remember_batch/forget/share/run_ttl_sweep inherited from the
    base class must return a VersionedEngine with checkpoints (and the
    audit log) intact — previously they degraded to MnemoSparkEngine,
    so replay/branch/merge after any mutation raised AttributeError."""
    eng = VersionedEngine(spark).remember_on(
        _rows(spark, [("v1", "a1", "fact one", "semantic", "private", 0.5, [], T0)]),
        branch="main",
    )
    eng = eng.checkpoint("t1", "main", T1)
    n_cp = eng.checkpoints.count()
    assert n_cp == 1

    # every inherited mutating verb must keep class + checkpoints
    eng2 = eng.forget(["v1"], strategy="soft", now=T2)
    assert isinstance(eng2, VersionedEngine)
    assert eng2.checkpoints.count() == n_cp
    assert "branch" in eng2.memories.columns

    eng3 = eng2.share(["v1"], "bob")
    assert isinstance(eng3, VersionedEngine)
    assert eng3.checkpoints.count() == n_cp

    eng4 = eng3.run_ttl_sweep(now=T2)
    assert isinstance(eng4, VersionedEngine)
    assert eng4.checkpoints.count() == n_cp
    # audit events survived the whole verb chain
    assert eng4.events.filter(F.col("event_type") == "MemoryDelete").count() == 1
    # and version verbs still work after mutations
    assert eng4.replay(eng4.checkpoints.first()["checkpoint_id"]).count() >= 0


def test_cold_tier_on_versioned_engine(spark, tmp_path):
    """ADVICE r2: tier_in on a VersionedEngine (memories carry
    `branch`) must not throw on the union, and restored rows default
    to branch 'main'; a re-archive cycle must not duplicate ids
    inside the cold tier on restore."""
    cold = str(tmp_path / "vcold")
    eng = VersionedEngine(spark).remember_on(
        _rows(
            spark,
            [
                ("h1", "a1", "hot row", "semantic", "private", 0.9, [], T0),
                ("c1", "a1", "cold row", "episodic", "private", 0.1, [], T0),
            ],
        ),
        branch="main",
    )
    eng = eng.forget(["c1"], strategy="archive", now=T0)
    out = eng.tier_out(cold, now=T0)
    back = out.tier_in(cold)
    got = {r.id: r.branch for r in back.memories.collect()}
    assert got == {"h1": "main", "c1": "main"}
    # archive the same id again -> cold parquet now holds c1 twice;
    # restore must bring back exactly one copy
    again = back.forget(["c1"], strategy="archive", now=T1).tier_out(cold, now=T1)
    restored = again.tier_in(cold)
    assert restored.memories.filter(F.col("id") == "c1").count() == 1
