"""Round-12 hardening gates — the r11 ADVICE defects.

- batch_bm25's wide-form dispatch on an EMPTY docs frame returns the
  empty-schema result instead of raising TypeError on float(None)
  (ADVICE r11 medium — reachable via recall_batch lexical/hybrid
  lanes on an empty memory store with a ≤4-query batch).
- expand(out_degree_1=True) with hops < 1 returns seeds only, byte-
  equivalent to the naive walk at the hops=0 boundary (ADVICE r11).
- _expand_lifted's one-shot level pins release as soon as the final
  reach relation materializes; the final pin is clear()-reclaimable
  (ADVICE r11 — log2(hops) frames accumulated per call before).
- the EWMA alpha edge cases live in tests/test_baseline.py
  (test_ewma_alpha_edge_cases) and the overflow fix in
  test_ewma_chunked_survives_10k_windows.
- the recall_routed_docs oracle tie contract (rank on round(raw, 6))
  is held by the oracle sweep itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mnemo_spark import cache


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_batch_bm25_wide_empty_corpus(spark):
    from mnemo_spark.operators.bm25 import batch_bm25, batch_bm25_wide

    out = batch_bm25_wide(_empty_docs(spark), [("q1", ["spark", "join"])])
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "bm25"]
    # and through the auto-dispatch (the ADVICE repro: small batch on
    # an empty corpus routes to the wide form)
    q = spark.createDataFrame(
        [("q1", ["spark", "join"])], "query_id string, terms array<string>"
    )
    out2 = batch_bm25(_empty_docs(spark), q)
    assert out2.count() == 0
    assert out2.columns == ["query_id", "doc_id", "bm25"]


def test_batch_bm25_wide_empty_corpus_matches_join_form(spark):
    """The lazy join form returned an empty frame on an empty corpus;
    the wide form must agree (same schema, zero rows)."""
    from mnemo_spark.operators.bm25 import batch_bm25

    # 33 queries forces the join form (> WIDE_MAX_QUERIES)
    q = spark.createDataFrame(
        [(f"q{i}", ["spark"]) for i in range(33)],
        "query_id string, terms array<string>",
    )
    join_form = batch_bm25(_empty_docs(spark), q)
    assert join_form.count() == 0
    assert join_form.columns == ["query_id", "doc_id", "bm25"]


def _chain_edges(spark, n=10):
    # parent-pointer chain 0 <- 1 <- ... <- n-1 (out-degree 1)
    return spark.createDataFrame(
        [(i, i - 1) for i in range(1, n)], "src long, dst long"
    )


def test_expand_lifted_hops0_returns_seeds_only(spark):
    from mnemo_spark.operators.graph import expand

    edges = _chain_edges(spark)
    seeds = spark.createDataFrame([(5,), (9,)], "id long")
    for hops in (0, -1):
        naive = expand(edges, seeds, hops=hops).collect()
        lifted = expand(edges, seeds, hops=hops, out_degree_1=True).collect()
        key = lambda r: r["id"]  # noqa: E731
        assert sorted(naive, key=key) == sorted(lifted, key=key), hops
        assert {r["id"] for r in lifted} == {5, 9}
        assert all(r["hop"] == 0 and r["score"] == 1.0 for r in lifted)


def test_expand_lifted_releases_level_pins(spark):
    from mnemo_spark.operators.graph import expand

    # fresh, unambiguous edge plan so its pins are attributable
    edges = _chain_edges(spark, 64).withColumn("salt", F.lit("r12-pin-test"))
    seeds = spark.createDataFrame([(63,),], "id long")
    def pinned_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    before = pinned_ids()
    out = expand(
        edges.select("src", "dst"), seeds, hops=8, out_degree_1=True
    )
    out.collect()
    mid = pinned_ids()
    # 8 hops = 3 doubling levels; only the FINAL reach pin may remain
    assert len(mid - before) <= 1, (before, mid)
    cache.clear()
    after = pinned_ids()
    assert after - before == set(), (before, after)


def test_track_pin_reclaimed_by_clear(spark):
    df = spark.range(100).withColumn("salt", F.lit("r12-track-pin"))
    pinned = cache.track_pin(df)
    pinned.count()
    assert pinned.storageLevel.useMemory or pinned.storageLevel.useDisk
    cache.clear()
    assert not (pinned.storageLevel.useMemory or pinned.storageLevel.useDisk)
