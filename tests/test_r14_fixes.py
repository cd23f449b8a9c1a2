"""Round-14 regression gates: the fold kernel's giant-group posture,
the write path's known-empty elision, materialized() state identity,
and the routed-recall exact short-circuit."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_fold_partitions_giant_group_byte_identity(spark):
    """§5 skew posture (VERDICT r13 #6): fold_partitions streams
    whole-partition Arrow batches and carries a group across batch
    edges — a single group FAR larger than one Arrow batch (here
    1M rows vs a forced 4,096-row batch, ~250 carried edges) must
    fold byte-identically to the per-group applyInPandas form.

    Disclosed max-group-size posture: an order-sensitive per-group
    fold inherently holds ONE complete group in worker memory before
    folding it (identical to groupBy().applyInPandas — the carried
    slices are the same rows applyInPandas would ship as one group),
    so the bound is the largest single chain, not the partition. At
    the 100 TB design point chains shard per agent; a single chain
    that outgrows worker memory needs the epoch-sharded fold
    (assign_chain_auto's crossover), which caps per-fold rows."""
    import pandas as pd

    from mnemo_spark.io import fold_partitions

    conf = spark.conf
    old_batch = conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    try:
        n_big = 1_000_000
        df = (
            spark.range(n_big + 40)
            .select(
                # one giant key 'g', two 20-row keys to fold around it
                F.when(F.col("id") < n_big, F.lit("g"))
                .when(F.col("id") < n_big + 20, F.lit("a"))
                .otherwise(F.lit("z"))
                .alias("k"),
                F.col("id").alias("o"),
                (F.col("id") % 97).cast("double").alias("v"),
            )
        )

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            # order-sensitive per-group fold: running sum + row index
            pdf = pdf.sort_values(["o"], kind="mergesort").reset_index(drop=True)
            pdf["cum"] = pdf["v"].cumsum()
            pdf["seq"] = range(1, len(pdf) + 1)
            return pdf

        schema = "k string, o bigint, v double, cum double, seq bigint"
        got = fold_partitions(df, ["k"], ["o"], fold, schema)
        ref = df.groupBy("k").applyInPandas(fold, schema)
        g = {(r["k"], r["o"]): (r["cum"], r["seq"]) for r in got.collect()}
        r = {(r["k"], r["o"]): (r["cum"], r["seq"]) for r in ref.collect()}
        assert len(g) == n_big + 40
        assert g == r, "giant-group fold diverged from the per-group form"
    finally:
        conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)


def test_fresh_store_elision_is_byte_identical(spark):
    """The r14 known-empty write-path elision must be a pure plan
    shrink: a fresh-store remember_batch with the flags forced OFF
    (the old plan shape, aggregating over the RDD-backed empty
    defaults) produces byte-identical memories AND events."""
    from mnemo_spark.engine import MnemoSparkEngine

    rows = spark.createDataFrame(
        [
            ("a1", "alice", "paris note", "semantic", "private", 0.9, ["geo"], T0),
            ("a2", "alice", "later fact", "episodic", "private", 0.5, ["x"],
             T0 + dt.timedelta(hours=1)),
            ("b1", "bob", "bob fact", "semantic", "private", 0.7, ["y"], T0),
        ],
        "id string, agent_id string, content string, memory_type string, "
        "scope string, importance float, tags array<string>, created_at timestamp",
    )
    new = MnemoSparkEngine(spark)
    assert new._memories_known_empty and new._events_known_empty
    old = MnemoSparkEngine(spark)
    old._memories_known_empty = False
    old._events_known_empty = False
    e_new, e_old = new.remember_batch(rows), old.remember_batch(rows)
    assert sorted(map(tuple, e_new.memories.collect())) == sorted(
        map(tuple, e_old.memories.collect())
    )
    assert sorted(map(tuple, e_new.events.collect())) == sorted(
        map(tuple, e_old.events.collect())
    )
    # a SECOND batch (flags now cleared) continues chains identically
    more = spark.createDataFrame(
        [("a3", "alice", "third", "semantic", "private", 0.4, [],
          T0 + dt.timedelta(hours=2))],
        rows.schema,
    )
    assert not e_new._memories_known_empty and not e_new._events_known_empty
    assert sorted(map(tuple, e_new.remember_batch(more).memories.collect())) == sorted(
        map(tuple, e_old.remember_batch(more).memories.collect())
    )


def test_materialized_preserves_state_and_flags(spark):
    from mnemo_spark.engine import MnemoSparkEngine

    rows = spark.createDataFrame(
        [("m1", "a1", "hello", "semantic", "private", 0.5, [], T0)],
        "id string, agent_id string, content string, memory_type string, "
        "scope string, importance float, tags array<string>, created_at timestamp",
    )
    eng = MnemoSparkEngine(spark).remember_batch(rows)
    mat = eng.materialized()
    assert sorted(map(tuple, mat.memories.collect())) == sorted(
        map(tuple, eng.memories.collect())
    )
    assert sorted(map(tuple, mat.events.collect())) == sorted(
        map(tuple, eng.events.collect())
    )
    # flags carry through truncation (emptiness is preserved exactly)
    fresh = MnemoSparkEngine(spark).materialized()
    assert fresh._memories_known_empty and fresh._events_known_empty
    assert not mat._memories_known_empty and not mat._events_known_empty
    # and a verb on the materialized engine still verifies end-to-end
    after = mat.forget(["m1"], strategy="soft", now=T0 + dt.timedelta(days=1))
    assert after.verify_event_integrity().filter(F.col("n_breaks") > 0).count() == 0


def test_full_probe_short_circuits_to_exact(spark):
    """nprobe >= n_cells probes every cell — routed is definitionally
    exact, so _ann_route must return None (exact lane) and the emitted
    recall rows must equal the exact lane's (VERDICT r13 #3). A
    sub-full nprobe still routes (the machinery stays exercised)."""
    import numpy as np

    from mnemo_spark.engine import MnemoSparkEngine

    rows = spark.createDataFrame(
        [
            (f"m{i:03d}", "a1", f"term{i % 13} body text {i}", "semantic",
             "public", 0.5, [], T0)
            for i in range(120)
        ],
        "id string, agent_id string, content string, memory_type string, "
        "scope string, importance float, tags array<string>, created_at timestamp",
    )
    eng = MnemoSparkEngine(spark, embedding_dim=64).remember_batch(rows).materialized()
    qs = spark.createDataFrame(
        [("q1", "term3 body"), ("q2", "term7 text")],
        "query_id string, query string",
    )
    exact = sorted(
        map(tuple, eng.recall_batch(qs, "a1", strategy="semantic", k=10,
                                    ann="exact").collect())
    )
    full_probe = sorted(
        map(tuple, eng.recall_batch(qs, "a1", strategy="semantic", k=10,
                                    ann="ivf", ann_nprobe=1 << 20).collect())
    )
    assert full_probe == exact
    # the routing memo was still built, and the short-circuit returned
    # the exact mode (None) rather than a probe map
    Q = np.ones((1, 64), dtype=np.float64) / 8.0
    assert eng._ann_route(Q, "ivf", ann_nprobe=1 << 20) is None
    routed = eng._ann_route(Q, "ivf")  # default nprobe 32 < 64 cells
    assert routed is not None and len(routed[0]) >= 64
