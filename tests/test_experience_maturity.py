"""P5 experience-plan tier (query/experience.rs) and A7 cluster
maturity gate (query/maturity.rs:52-230)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import EXPERIENCE_PLAN_TAG, MnemoSparkEngine

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)

_ROW_SCHEMA = (
    "id string, agent_id string, content string, memory_type string, "
    "scope string, importance float, tags array<string>, created_at timestamp"
)


def test_plan_verbs_gated_behind_mode(spark):
    eng = MnemoSparkEngine(spark)
    with pytest.raises(ValueError, match="experience memory mode is disabled"):
        eng.remember_plan("p1", "a1", "how to deploy spark", ["s1"], ["c1"], 0.9, T0)
    # disabled recall_plan always misses (not an error)
    assert eng.recall_plan("how to deploy spark", "a1").count() == 0


def test_remember_plan_success_threshold_and_payload(spark):
    eng = MnemoSparkEngine(spark).with_experience_memory()
    # failure outcome: never cached
    same, stored = eng.remember_plan(
        "p0", "a1", "failed query plan", ["s"], ["c"], 0.2, T0
    )
    assert stored is False and same.memories.count() == 0
    # success outcome: cached via the ordinary write path
    eng2, stored = eng.remember_plan(
        "p1", "a1", "How to Deploy the Spark Job?", ["retrieve", "rank"],
        ["chunk-9"], 0.9, T0,
    )
    assert stored is True
    row = eng2.memories.collect()[0]
    assert row.memory_type == "procedural"
    assert EXPERIENCE_PLAN_TAG in list(row.tags)
    assert row.content_hash and row.chain_hash  # normal write path ran
    import json

    payload = json.loads(row.metadata)
    # signature: >=3-char alnum tokens, lowercased, sorted, deduped
    assert payload["signature_tokens"] == ["deploy", "how", "job", "spark", "the"]
    assert payload["steps"] == ["retrieve", "rank"]


def test_recall_plan_jaccard_match_and_ordinary_recall_exclusion(spark):
    eng = MnemoSparkEngine(spark).with_experience_memory()
    eng, _ = eng.remember_plan(
        "p1", "a1", "deploy the spark job", ["s1"], ["c1"], 0.9, T0
    )
    eng, _ = eng.remember_plan(
        "p2", "a1", "bake a chocolate cake", ["s2"], ["c2"], 0.8,
        T0 + dt.timedelta(hours=1),
    )
    # structurally-similar query replays the matching plan
    hit = eng.recall_plan("how do i deploy the spark job", "a1").collect()
    assert len(hit) == 1 and hit[0].id == "p1"
    # sig query = {deploy,how,job,spark,the}; plan = {deploy,job,spark,the}
    assert abs(hit[0].similarity - 4 / 5) < 1e-6
    # dissimilar query misses
    assert eng.recall_plan("quantum entanglement basics", "a1").count() == 0
    # P5 exclusion: ordinary recall never surfaces plan rows
    ordinary = eng.recall("deploy the spark job", "a1", strategy="lexical").collect()
    assert all(not r.id.startswith("p") for r in ordinary)
    assert len(ordinary) == 0


def test_cluster_maturity_components(spark):
    from mnemo_spark.operators.maturity import cluster_maturity, mature_clusters

    now = T0 + dt.timedelta(hours=72)  # exactly one half-life after T0
    members = spark.createDataFrame(
        [
            # hot cluster: accessed at now (age 0), high hit counts,
            # identical embeddings (redundancy 1.0)
            ("hot", "h1", now, 8, [1.0, 0.0]),
            ("hot", "h2", now, 8, [1.0, 0.0]),
            # cold cluster: one half-life old, never hit, orthogonal
            ("cold", "c1", T0, 0, [1.0, 0.0]),
            ("cold", "c2", T0, 0, [0.0, 1.0]),
            # singleton: too small for the floor
            ("solo", "s1", now, 9, [1.0, 0.0]),
        ],
        "cluster string, id string, last_accessed_at timestamp, "
        "access_count long, embedding array<double>",
    )
    scores = {r.cluster: r for r in cluster_maturity(members, now).collect()}

    hot = scores["hot"]
    assert abs(hot.recency - 1.0) < 1e-6  # age 0
    # ln(1+8)/ln(1+8) = 1.0 at the saturation point
    assert abs(hot.hit_success - 1.0) < 1e-6
    assert hot.edge_degree == 0.0  # no relations table
    assert abs(hot.redundancy - 1.0) < 1e-6
    # combined = (.25*1 + .30*1 + .20*0 + .25*1) / 1.0 = 0.80
    assert abs(hot.combined - 0.80) < 1e-5

    cold = scores["cold"]
    assert abs(cold.recency - 0.5) < 1e-4  # exactly one half-life
    assert cold.hit_success == 0.0
    assert abs(cold.redundancy - 0.0) < 1e-6  # orthogonal pair
    # combined = (.25*.5)/1.0 = 0.125
    assert abs(cold.combined - 0.125) < 1e-4

    gated = {r.cluster for r in mature_clusters(cluster_maturity(members, now)).collect()}
    assert gated == {"hot"}  # cold under threshold, solo under size floor


def test_run_consolidation_policies(spark):
    rows = spark.createDataFrame(
        [
            ("d1", "a1", "identical duplicate memory text", "semantic", "private",
             0.5, [], T0),
            ("d2", "a1", "identical duplicate memory text", "semantic", "private",
             0.5, [], T0 + dt.timedelta(minutes=5)),
            ("d3", "a1", "something else entirely different", "semantic", "private",
             0.5, [], T0),
        ],
        _ROW_SCHEMA,
    )
    eng = MnemoSparkEngine(spark).remember_batch(rows)
    # fixed policy: the duplicate pair consolidates unconditionally
    fixed = eng.run_consolidation(policy="fixed", now=T0 + dt.timedelta(hours=1))
    states = {r.id: r.consolidation_state for r in fixed.memories.collect()}
    assert states == {"d1": "consolidated", "d2": "consolidated", "d3": "active"}
    assert fixed.events.filter(F.col("event_type") == "MemoryConsolidate").count() == 2

    # maturity policy one half-life later: recency 0.5, hits 0,
    # redundancy 1.0 -> combined = (.25*.5 + .25*1)/1.0 = 0.375 < 0.55
    mat = eng.run_consolidation(policy="maturity", now=T0 + dt.timedelta(hours=72))
    states2 = {r.id: r.consolidation_state for r in mat.memories.collect()}
    assert states2 == {"d1": "active", "d2": "active", "d3": "active"}
    # fresh memories (recency ~1.0, redundancy 1.0, zero hits):
    # combined ~0.5 — clears a lowered gate, showing the gate actually
    # discriminates on the score rather than the pair structure
    mat2 = eng.run_consolidation(
        policy="maturity", maturity_threshold=0.45, now=T0 + dt.timedelta(minutes=10)
    )
    states3 = {r.id: r.consolidation_state for r in mat2.memories.collect()}
    assert states3["d1"] == "consolidated" and states3["d2"] == "consolidated"
