"""Operator-level unit tests (reference test model: SURVEY.md §5 —
RRF math, decay monotonicity, chain verification catching mutations,
deterministic tiebreaks)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mnemo_spark.functions.similarity import cosine
from mnemo_spark.functions.text import shingles, token_estimate, tokens
from mnemo_spark.operators.chain import assign_chain, chain_heads, verify_chain
from mnemo_spark.operators.rrf import rrf_fuse
from mnemo_spark.operators.window_ops import (
    evidence_budget_prefix,
    sessionize,
    token_budget_pack,
)


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("Hello, World! 42 foo bar",)], ["text"])
    row = df.select(
        tokens("text").alias("t"), shingles(tokens("text"), 3).alias("s")
    ).first()
    assert row["t"] == ["hello", "world", "42", "foo", "bar"]
    assert row["s"] == ["hello world 42", "world 42 foo", "42 foo bar"]
    short = spark.createDataFrame([("one two",)], ["text"])
    assert short.select(shingles(tokens("text"), 3).alias("s")).first()["s"] == []


def test_token_estimate(spark):
    df = spark.createDataFrame([("abcde",), ("",)], ["text"])
    vals = [r[0] for r in df.select(token_estimate("text")).collect()]
    assert vals == [2, 0]


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"]
    )
    vals = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert vals[0] == pytest.approx(1.0)
    assert vals[1] == pytest.approx(0.0)


def test_rrf_fusion_math(spark):
    """RRF: doc ranked 1st in both lanes scores 2/(k+1) (reference
    query/retrieval.rs:48-132 unit tests)."""
    lane1 = spark.createDataFrame([(1, 10.0), (2, 5.0)], ["doc_id", "score"])
    lane2 = spark.createDataFrame([(1, 3.0), (3, 2.0)], ["doc_id", "score"])
    out = rrf_fuse({"a": lane1, "b": lane2}, rrf_k=60).collect()
    by_id = {r["doc_id"]: r["rrf_score"] for r in out}
    assert by_id[1] == pytest.approx(2 / 61, abs=1e-6)
    assert by_id[2] == pytest.approx(1 / 62, abs=1e-6)
    assert out[0]["doc_id"] == 1  # best fused rank


def test_rrf_weighted(spark):
    lane1 = spark.createDataFrame([(1, 10.0)], ["doc_id", "score"])
    lane2 = spark.createDataFrame([(2, 10.0)], ["doc_id", "score"])
    out = rrf_fuse({"a": lane1, "b": lane2}, weights={"a": 6.0, "b": 1.0}, rrf_k=30)
    rows = {r["doc_id"]: r["rrf_score"] for r in out.collect()}
    assert rows[1] == pytest.approx(6 / 31, abs=1e-6)
    assert rows[2] == pytest.approx(1 / 31, abs=1e-6)


def _chain_df(spark):
    rows = [
        ("a", 1, "h1"),
        ("a", 2, "h2"),
        ("a", 3, "h3"),
        ("b", 1, "x1"),
    ]
    return spark.createDataFrame(rows, ["agent", "seq", "h"])


def test_assign_chain_sequential_fold(spark):
    out = assign_chain(_chain_df(spark), ["agent"], ["seq"], "h")
    rows = {(r["agent"], r["seq"]): r for r in out.collect()}
    assert rows[("a", 1)]["prev_hash"] == ""
    link1 = hashlib.sha256(b"h1").hexdigest()
    assert rows[("a", 1)]["chain_hash"] == link1
    assert rows[("a", 2)]["prev_hash"] == link1
    link2 = hashlib.sha256(("h2" + link1).encode()).hexdigest()
    assert rows[("a", 2)]["chain_hash"] == link2
    assert rows[("b", 1)]["chain_hash"] == hashlib.sha256(b"x1").hexdigest()


def test_chain_heads_matches_assign_chain(spark):
    """The aggregate fold and the sequential fold agree on the head."""
    assigned = assign_chain(_chain_df(spark), ["agent"], ["seq"], "h")
    last = assigned.filter((F.col("agent") == "a") & (F.col("seq") == 3)).first()
    heads = {r["agent"]: r["chain_head"] for r in
             chain_heads(_chain_df(spark), ["agent"], ["seq"], "h").collect()}
    assert heads["a"] == last["chain_hash"]
    assert heads["b"] == hashlib.sha256(b"x1").hexdigest()


def test_verify_chain_detects_tamper(spark):
    """Audit-tamper conformance (reference: 100% single-byte mutation
    detection, bench/audit_tamper)."""
    assigned = assign_chain(_chain_df(spark), ["agent"], ["seq"], "h")
    clean = verify_chain(
        assigned.withColumnRenamed("h", "content_hash"),
        ["agent"],
        ["seq"],
    )
    assert all(r["n_breaks"] == 0 for r in clean.collect())

    tampered = assigned.withColumn(
        "h", F.when((F.col("agent") == "a") & (F.col("seq") == 2), "EVIL").otherwise(F.col("h"))
    )
    bad = verify_chain(
        tampered.withColumnRenamed("h", "content_hash"), ["agent"], ["seq"]
    ).filter(F.col("agent") == "a").first()
    assert bad["n_breaks"] >= 1
    assert bad["first_break_at"]["seq"] == 2


def test_evidence_budget_is_prefix(spark):
    """W8 invariant: selection is a prefix of the ranking, never a
    reorder (reference query/evidence.rs property test)."""
    rows = [(i, 0.5) for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["rank", "suff"])
    out = evidence_budget_prefix(df, "suff", bar=1.5, max_evidence=10)
    kept = sorted(r["rank"] for r in out.collect())
    assert kept == [1, 2, 3]  # cum_before: 0, .5, 1.0 < 1.5; rank4 has 1.5

    capped = evidence_budget_prefix(df, "suff", bar=100.0, max_evidence=4)
    assert sorted(r["rank"] for r in capped.collect()) == [1, 2, 3, 4]


def test_token_budget_pack_prefix(spark):
    df = spark.createDataFrame([(1, 100), (2, 200), (3, 150)], ["rank", "cost"])
    out = token_budget_pack(df, "cost", budget=320)
    assert sorted(r["rank"] for r in out.collect()) == [1, 2]


def test_sessionize_gap(spark):
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 0)),
        (1, datetime(2024, 1, 1, 0, 10)),
        (1, datetime(2024, 1, 1, 2, 0)),
        (2, datetime(2024, 1, 1, 0, 0)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, "user_id", "ts", gap_minutes=30)
    sess = {(r["user_id"], r["ts"].minute, r["ts"].hour): r["session_id"] for r in out.collect()}
    assert sess[(1, 0, 0)] == 1
    assert sess[(1, 10, 0)] == 1
    assert sess[(1, 0, 2)] == 2
    assert sess[(2, 0, 0)] == 1


def test_evidence_scorers_cosine_and_delta(spark):
    """U2 pluggable evidence scorers (query/evidence.rs:158-260):
    cosine default with retrieval-score fallback; delta novelty stub
    gives redundant candidates ~0 so the budget shows diminishing
    returns."""
    from mnemo_spark.operators.evidence import cosine_scorer, delta_novelty_scores
    from mnemo_spark.operators.window_ops import evidence_budget_prefix
    from pyspark.sql import functions as F

    ranked = spark.createDataFrame(
        [
            (1, 1, "alpha beta gamma delta", [1.0, 0.0], 0.9),
            (2, 2, "alpha beta gamma delta", [0.6, 0.8], 0.8),  # redundant
            (3, 3, "epsilon zeta fresh words", [0.0, 1.0], 0.7),
            (4, 4, "", None, 0.6),  # degenerate embedding
        ],
        "id int, rank int, content string, embedding array<double>, score double",
    )
    qvec = F.array(F.lit(1.0), F.lit(0.0))
    scored = ranked.withColumn(
        "cos_suff", cosine_scorer(F.col("embedding"), qvec, F.col("score"))
    )
    got = {r.id: round(r.cos_suff, 4) for r in scored.collect()}
    assert got[1] == 1.0  # aligned
    assert got[2] == 0.6  # cosine 0.6
    assert got[4] == 0.6  # NULL embedding -> retrieval-score fallback
    assert got[3] == 0.7  # orthogonal (sim 0 not > 0) -> fallback

    delta = delta_novelty_scores(ranked)
    dv = {r.id: round(r.sufficiency, 4) for r in delta.collect()}
    assert dv[1] == 0.9  # all tokens novel * 0.9
    assert dv[2] == 0.0  # fully redundant
    assert dv[3] == 0.7  # fresh again
    assert dv[4] == 0.0  # empty content

    # the budget consumes either scorer's column: with delta scores
    # and bar 1.0, the redundant candidate passes through (cum before
    # it is 0.9 < 1.0) but contributes nothing to the cumulative sum,
    # so candidate 3 still enters before the bar trips
    kept = evidence_budget_prefix(delta, "sufficiency", 1.0, 10)
    assert {r.id for r in kept.collect()} == {1, 2, 3}


def test_connected_components_star_matches_label(spark):
    """Star CC and label-propagation CC agree on a mixed graph
    (two cliques, a path, a self-pair, an isolated pair)."""
    from mnemo_spark.operators.consolidate import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (1, 3),          # clique {1,2,3}
            (10, 11), (11, 12),              # path {10,11,12}
            (20, 20),                        # self-pair
            (30, 31),                        # isolated pair
        ],
        "id_a int, id_b int",
    )
    expected = {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10, 12: 10,
        20: 20,
        30: 30, 31: 30,
    }
    for method in ("label", "star"):
        got = {
            r.node: r.cluster
            for r in connected_components(pairs, method=method).collect()
        }
        assert got == expected, method


def test_connected_components_star_long_chain_olog_rounds(spark):
    """A chain of diameter 63 converges for the star variant well
    inside O(log n) rounds (label propagation would need 63)."""
    from mnemo_spark.operators.consolidate import _connected_components_star

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a int, id_b int"
    )
    # 2·log2(64) + slack = 14 rounds is plenty; label-prop would need 63
    labels = _connected_components_star(pairs, max_iter=14)
    got = {r.node: r.cluster for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_pq_matches_independent_reference(spark, sf_dir):
    """pq_encode/pq_topk against a from-scratch numpy reimplementation
    (normalize → per-subspace argmin → ADC table gather) — independent
    of the operator's own einsum formulation, so a formula slip in
    either shows up as a mismatch."""
    import numpy as np
    from pyspark.sql import functions as F

    from mnemo_spark import params as P
    from mnemo_spark.io import load_table
    from mnemo_spark.operators.pq import pq_encode, pq_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=P.PQ_M, ksub=P.PQ_KSUB)

    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    V = np.asarray([list(r.embedding) for r in rows], dtype=np.float64)
    ids = np.asarray([r.vec_id for r in rows])
    norms = np.sqrt((V * V).sum(axis=1, keepdims=True))
    U = np.where(norms > 0, V / np.where(norms == 0, 1, norms), 0.0)
    m, ksub, dsub = books.shape

    # reference encode: explicit per-row, per-subspace argmin
    def ref_code(u):
        return [
            int(
                np.argmin(
                    [((u[i * dsub:(i + 1) * dsub] - books[i, c]) ** 2).sum()
                     for c in range(ksub)]
                )
            )
            for i in range(m)
        ]

    ref_codes = {int(i): ref_code(u) for i, u in zip(ids, U)}
    got_codes = {
        r.vec_id: r.codes for r in pq_encode(emb, books).collect()
    }
    assert got_codes == ref_codes

    # reference ADC top-k for one query
    qid = P.VECTOR_QUERY_IDS[0]
    q = U[ids == qid][0]
    T = np.array(
        [[((q[i * dsub:(i + 1) * dsub] - books[i, c]) ** 2).sum()
          for c in range(ksub)] for i in range(m)]
    )
    scored = sorted(
        (round(sum(T[i, c] for i, c in enumerate(ref_codes[int(v)])), 6), int(v))
        for v in ids[(norms[:, 0] > 0)]
    )[: P.VECTOR_TOPK]
    queries = emb.filter(F.col("vec_id") == qid).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = [
        (r.adc_dist, r.vec_id)
        for r in pq_topk(emb, queries, books, k=P.VECTOR_TOPK)
        .orderBy("rank")
        .collect()
    ]
    assert [(round(d, 6), v) for d, v in scored] == got


def test_trace_causality_both_direction(spark):
    """TraceDirection::Both (causality.rs:12-18): union of the up and
    down walks, deduplicated by event id at min depth."""
    from mnemo_spark.operators.graph import trace_causality

    events = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 3), (5, None)],
        "id long, parent_event_id long",
    )
    roots = spark.createDataFrame([(3,)], "id long")
    got = {
        r["id"]: r["depth"]
        for r in trace_causality(events, roots, max_depth=3,
                                 direction="both").collect()
    }
    assert got == {3: 0, 2: 1, 1: 2, 4: 1}


def test_global_cumsum_matches_single_partition_window(spark):
    """global_cumsum (the distributed prefix sum) must equal the
    naive single-partition running sum on the same total order —
    including cross-partition offset handoff (forced 4-way range
    partitioning over 40 rows) and the grand-total carry."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from mnemo_spark.operators.window_ops import global_cumsum

    rows = [(i, float((i * 37) % 100) + 0.25) for i in range(40)]
    df = spark.createDataFrame(rows, "k int, v double")
    got = {
        r["k"]: (r["cum"], r["tot"])
        for r in global_cumsum(
            df, [F.desc("v"), F.asc("k")], "v", "cum",
            total_col="tot", num_partitions=4,
        ).collect()
    }
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.desc("v"), F.asc("k"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["k"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    total = sum(v for _, v in rows)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k][0] - want[k]) < 1e-9, k
        assert abs(got[k][1] - total) < 1e-9, k


def test_global_cumsum_single_row_and_empty(spark):
    import pyspark.sql.functions as F

    from mnemo_spark.operators.window_ops import global_cumsum

    one = spark.createDataFrame([(1, 5.0)], "k int, v double")
    r = global_cumsum(one, [F.asc("k")], "v", "cum", total_col="tot",
                      num_partitions=4).collect()
    assert [(x["cum"], x["tot"]) for x in r] == [(5.0, 5.0)]
    empty = spark.createDataFrame([], "k int, v double")
    assert global_cumsum(empty, [F.asc("k")], "v", "cum",
                         num_partitions=4).count() == 0


def test_global_cumsum_ntile_serving_pin_is_tracked_and_released(spark):
    """ADVICE r7 leak posture, CORRECTED in r8: the range pin must
    stay alive for the plan's whole lifetime (the sf1x sweep proved an
    early release lets the re-executed range exchange assign rows to
    different slices than their offsets — wrong cumsums at scale). So
    the leak fix is scoping, not early release: in serving/bench mode
    the pin goes through the TRACKED cache and cache.clear() frees
    it; in one-shot mode CacheManager dedups the persist by plan, so
    retention is bounded by distinct inputs."""
    import os

    import pyspark.sql.functions as F

    from mnemo_spark import cache
    from mnemo_spark.operators.window_ops import global_cumsum, global_ntile

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(50)], "k int, v double"
    )
    os.environ["MNEMO_CACHE_TABLES"] = "1"
    try:
        n_before = len(cache._CACHE)
        out = global_cumsum(df, [F.asc("k")], "v", "cum", num_partitions=4)
        out = global_ntile(out, [F.desc("cum"), F.asc("k")], 3, "t",
                           num_partitions=4)
        assert out.count() == 50
        # both pins registered in the tracked cache...
        assert len(cache._CACHE) >= n_before + 2
    finally:
        os.environ.pop("MNEMO_CACHE_TABLES", None)
        cache.clear()
    # ...and clear() released them
    assert len(cache._CACHE) == 0


def test_global_ntile_matches_builtin_ntile(spark):
    """global_ntile's closed-form tile rule must equal the built-in
    single-partition ntile for sizes that do and don't divide evenly,
    across forced multi-partition range slices."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from mnemo_spark.operators.window_ops import global_ntile

    for n_rows in (10, 11, 23, 40):
        rows = [(i, float((i * 13) % 37)) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "k int, v double")
        got = {
            r["k"]: r["t"]
            for r in global_ntile(
                df, [F.desc("v"), F.asc("k")], 5, "t", num_partitions=4
            ).collect()
        }
        w = Window.partitionBy(F.lit(0)).orderBy(F.desc("v"), F.asc("k"))
        want = {
            r["k"]: r["t"]
            for r in df.withColumn("t", F.ntile(5).over(w)).collect()
        }
        assert got == want, n_rows
