"""Retrieval-quality eval: recall@k / MRR on a self-referential eval
set — the BASELINE.md parity axis (the reference publishes recall@1/
5/10 + MRR per strategy on LongMemEval_M; no such labeled set ships
with the driver tables, so the eval set is synthesized the way the
reference's hash-embedder reproduction is: query = a distinctive
token slice of a document, expected = that document).

Strategies evaluated (mirror the reference's): lexical (BM25),
semantic (hash-bag cosine), hybrid (weighted RRF of both). All
queries run as ONE batch DataFrame program each — the engine's
design point.

Usage: python tools/eval_quality.py [sf_dir] [n_queries]
Prints one JSON line {strategy: {recall@1, recall@5, recall@10, mrr}}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mnemo_spark import params as P
from mnemo_spark.functions.embedder import hash_bag_embedding, token_bucket
from mnemo_spark.functions.text import tokens
from mnemo_spark.io import load_table
from mnemo_spark.operators.bm25 import batch_bm25
from mnemo_spark.session import get_spark

K_EVAL = (1, 5, 10)


def eval_set(docs: DataFrame, n_queries: int) -> DataFrame:
    """(query_id=doc_id, terms, expected=doc_id): an 8-token slice
    from the MIDDLE of each sampled doc (heads repeat across the
    synthetic corpus; middles are more distinctive)."""
    toks = tokens("text")
    return (
        docs.filter(F.col("doc_id") % 5 == 0)
        .limit(n_queries)
        .select(
            F.col("doc_id").alias("query_id"),
            F.slice(toks, 8, 8).alias("terms"),
            F.col("doc_id").alias("expected"),
        )
        .filter(F.size("terms") >= 4)
    )


def ranks_of_expected(scored: DataFrame, qid: str, did: str, score: str) -> DataFrame:
    w = Window.partitionBy(qid).orderBy(F.desc(score), F.asc(did))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col(did) == F.col("expected"))
        .select(qid, "rank")
    )


def metrics(rank_df: DataFrame, n_total: int) -> dict:
    rows = {r[0]: r["rank"] for r in rank_df.collect()}
    out = {}
    for k in K_EVAL:
        out[f"recall@{k}"] = round(
            sum(1 for r in rows.values() if r <= k) / n_total, 4
        )
    out["mrr"] = round(sum(1.0 / r for r in rows.values()) / n_total, 4)
    return out


def evaluate(spark, sf_dir: str, n_q: int = 100) -> dict:
    """recall@k/MRR per strategy — importable so the pytest regression
    gate (tests/test_quality_gate.py) runs the identical program the
    CLI publishes."""
    docs = load_table(spark, sf_dir, "documents")
    qs = eval_set(docs, n_q).localCheckpoint(eager=True)
    n_total = qs.count()
    expected = qs.select("query_id", "expected")

    results = {}

    # lexical: batch BM25
    lex = batch_bm25(docs, qs).join(expected, "query_id")
    results["lexical"] = metrics(
        ranks_of_expected(lex, "query_id", "doc_id", "bm25"), n_total
    )

    # semantic: sparse hash-bag cosine, all queries at once (join on
    # bucket — the batch form of the J6 lane)
    dvec = hash_bag_embedding(docs, P.HASHBAG_DIM, "doc_id", "text")
    qdocs = qs.select("query_id", F.array_join("terms", " ").alias("text"))
    qvec = hash_bag_embedding(qdocs, P.HASHBAG_DIM, "query_id", "text").select(
        F.col("query_id"), F.col("bucket"), F.col("weight").alias("qw")
    )
    sem = (
        dvec.join(qvec, "bucket")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("weight") * F.col("qw")), 6).alias("cos"))
        .join(expected, "query_id")
    )
    results["semantic"] = metrics(
        ranks_of_expected(sem, "query_id", "doc_id", "cos"), n_total
    )

    # hybrid: weighted RRF of the two lanes, per query
    def lane_rank(df, score):
        w = Window.partitionBy("query_id").orderBy(F.desc(score), F.asc("doc_id"))
        return df.select("query_id", "doc_id", F.row_number().over(w).alias("r"))

    wl, ws = P.RECALL_WEIGHTS["bm25"], P.RECALL_WEIGHTS["embed"]
    contribs = (
        lane_rank(lex, "bm25").withColumn("c", F.lit(wl) / (P.RRF_K + F.col("r")))
    ).unionByName(
        lane_rank(sem, "cos").withColumn("c", F.lit(ws) / (P.RRF_K + F.col("r")))
    )
    fused = (
        contribs.groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("c"), 6).alias("rrf"))
        .join(expected, "query_id")
    )
    results["hybrid"] = metrics(
        ranks_of_expected(fused, "query_id", "doc_id", "rrf"), n_total
    )

    # token efficiency (BASELINE.md axis: the reference reports 88.7%
    # reduction, full history ~893 → top-5 slice ~100.6 tokens/query):
    # tokens the caller would inject per query with naive
    # whole-corpus stuffing vs the hybrid top-5 slice, ceil(chars/4)
    full_tokens = docs.agg(
        F.sum(F.ceil(F.length("text") / 4.0)).alias("t")
    ).collect()[0]["t"]
    w5 = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    top5 = (
        fused.withColumn("r", F.row_number().over(w5))
        .filter(F.col("r") <= 5)
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    slice_tokens = (
        top5.groupBy("query_id")
        .agg(F.sum(F.ceil(F.length("text") / 4.0)).alias("t"))
        .agg(F.avg("t"))
        .collect()[0][0]
    )
    token_eff = {
        "full_corpus_tokens": int(full_tokens),
        "top5_slice_tokens_per_query": round(float(slice_tokens), 1),
        "reduction_pct": round(
            100.0 * (1.0 - float(slice_tokens) / float(full_tokens)), 1
        ),
    }
    return {
        "n_queries": n_total,
        "sf_dir": sf_dir,
        "strategies": results,
        "token_efficiency": token_eff,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("quality_eval")
    print(json.dumps(evaluate(spark, sf_dir, n_q)))


if __name__ == "__main__":
    main()
