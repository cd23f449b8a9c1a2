"""Training-data pipeline operators (operators/pipeline.py):
decontamination, hash split, sequence packing, quality sampling.

Each test pins an invariant the oracle query can't express directly:
determinism across runs, assignment stability under corpus growth,
packing geometry, and the broadcast shape of the decontamination join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mnemo_spark.operators.pipeline import (
    decontaminate,
    hash_split,
    pack_sequences,
    quality_bernoulli_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


BENCH_TEXT = "the quick brown fox jumps over the lazy dog again and again"


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(
        spark,
        [
            (1, BENCH_TEXT, "en"),  # verbatim benchmark copy
            (2, BENCH_TEXT + " with a small novel suffix appended here", "en"),
            (3, "completely unrelated text about spark query planning", "en"),
            (4, "short", "en"),  # < k tokens -> no shingles
        ],
    )


@pytest.fixture(scope="module")
def bench_docs(spark):
    return _docs(spark, [(100, BENCH_TEXT, "en")])


class TestDecontaminate:
    def test_verbatim_copy_fully_contaminated(self, corpus, bench_docs):
        out = {
            r["doc_id"]: r
            for r in decontaminate(corpus, bench_docs).collect()
        }
        assert out[1]["contamination"] == 1.0
        assert 0.0 < out[2]["contamination"] < 1.0
        # clean and shingle-less docs are absent, not zero-rows
        assert 3 not in out and 4 not in out

    def test_benchmark_side_is_broadcast(self, corpus, bench_docs):
        plan = decontaminate(corpus, bench_docs)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestHashSplit:
    def test_deterministic_and_stable_under_growth(self, spark):
        base = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
        a = {r["doc_id"]: r["split"] for r in hash_split(base, 0.2).collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(base, 0.2).collect()}
        assert a == b
        # growing the corpus must not reassign existing ids
        grown = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
        g = {r["doc_id"]: r["split"] for r in hash_split(grown, 0.2).collect()}
        assert all(g[i] == a[i] for i in a)

    def test_fraction_close_to_target(self, spark):
        base = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
        out = hash_split(base, 0.2)
        frac = out.filter(F.col("split") == "test").count() / 5000
        assert 0.17 < frac < 0.23

    def test_salt_changes_assignment(self, spark):
        base = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        a = {r["doc_id"]: r["split"] for r in hash_split(base, 0.5, salt="a").collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(base, 0.5, salt="b").collect()}
        assert a != b


class TestPackSequences:
    def test_packing_geometry(self, spark):
        docs = _docs(
            spark,
            [(i, "word " * (40 * (i % 3 + 1)), "en") for i in range(1, 30)]
            + [(i, "wort " * 30, "de") for i in range(100, 110)],
        )
        rows = pack_sequences(docs, 64, group_col="lang").collect()
        by_grp: dict[str, list] = {}
        for r in rows:
            by_grp.setdefault(r["lang"], []).append(r)
        for grp_rows in by_grp.values():
            grp_rows.sort(key=lambda r: r["doc_id"])
            off = 0
            for r in grp_rows:
                # contiguous concat layout, no gaps or overlaps
                assert r["start_off"] == off
                off += r["n_tokens"]
                assert r["seq_first"] == r["start_off"] // 64
                assert r["seq_last"] == (r["start_off"] + r["n_tokens"] - 1) // 64
                assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1

    def test_global_packing_refused(self, spark):
        docs = _docs(spark, [(1, "a b c", "en")])
        with pytest.raises(ValueError, match="group_col"):
            pack_sequences(docs, 64, group_col="")


class TestQualitySample:
    def test_subset_deterministic_and_certain_keeps(self, spark):
        scored = spark.createDataFrame(
            [(i, 1.0 if i % 10 == 0 else 0.4) for i in range(1000)],
            "doc_id long, quality double",
        )
        a = sorted(r["doc_id"] for r in quality_bernoulli_sample(scored).collect())
        b = sorted(r["doc_id"] for r in quality_bernoulli_sample(scored).collect())
        assert a == b
        kept = set(a)
        # probability-1 docs are always kept (u01 < 1 strictly)
        assert all(i in kept for i in range(0, 1000, 10))
        # thinning actually happened on the 0.4 stratum
        frac = sum(1 for i in kept if i % 10 != 0) / 900
        assert 0.3 < frac < 0.5


class TestIncrementalDedup:
    def test_planted_duplicate_found_and_corpus_never_self_pairs(self, spark):
        from mnemo_spark.operators.dedup import incremental_band_dedup

        corpus = _docs(
            spark,
            [(i, f"unique corpus document number {i} about topic {i % 7} "
                  "with enough tokens to shingle properly", "en")
             for i in range(1, 20)],
        )
        new = _docs(
            spark,
            [
                # verbatim copy of corpus doc 5
                (100, "unique corpus document number 5 about topic 5 "
                      "with enough tokens to shingle properly", "en"),
                (101, "entirely novel content that matches nothing else "
                      "in the existing collection at all", "en"),
            ],
        )
        out = {r["doc_id"]: r for r in incremental_band_dedup(new, corpus).collect()}
        assert 100 in out and out[100]["n_corpus_candidates"] >= 1
        assert 101 not in out
        # output only ever contains NEW ids: corpus-vs-corpus pairs
        # are never produced, which is the whole point of the shape
        assert set(out) <= {100, 101}
