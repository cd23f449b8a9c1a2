"""Embedding-backend selection bench + SLA-aware recommender
(reference bench/embeddings, v0.4.9): measure every CONFIGURED
backend for retrieval quality (nDCG@10, recall@10 on a labeled
self-referential fixture) and embed latency (p50/p95 single-text,
throughput at batch 1/8/32), then recommend the highest-nDCG backend
whose p95 ≤ the SLO, reporting the explicit nDCG gap vs the absolute
best — quality/latency as a measured trade, not a reputation call.

Backends here: HashBag always (the deterministic offline provider);
Noop is listed as refused (it is the fail-loud gate, not a backend);
ONNX/HTTP appear automatically when their environment is configured
(absent in this sandbox — the recommender prints them as
unconfigured, mirroring the reference's "configured backends only").

Usage: python tools/eval_backends.py [sf_dir] [slo_ms]
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from mnemo_spark.functions.embed_batch import HashBagEmbedder  # noqa: E402
from mnemo_spark.io import load_table  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402

N_DOCS = 50
N_QUERIES = 10
K = 10


def fixture(spark, sf_dir):
    """50-doc / 10-query labeled fixture (reference bench shape):
    query = the middle 8-token slice of every 5th doc; label = that
    doc."""
    rows = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(N_DOCS)
        .collect()
    )
    docs = [(r["doc_id"], r["text"]) for r in rows]
    queries = []
    for did, text in docs[:: N_DOCS // N_QUERIES][:N_QUERIES]:
        toks = text.split()
        mid = max(0, len(toks) // 2 - 4)
        queries.append((did, " ".join(toks[mid : mid + 8])))
    return docs, queries


def quality(backend, docs, queries):
    """nDCG@10 / recall@10 with a single relevant doc per query (the
    fixture's labels), brute-force cosine."""
    D = backend.embed([t for _, t in docs])
    Q = backend.embed([q for _, q in queries])
    dn = np.linalg.norm(D, axis=1, keepdims=True)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    sims = (Q / np.where(qn == 0, 1, qn)) @ (D / np.where(dn == 0, 1, dn)).T
    ids = np.asarray([d for d, _ in docs])
    ndcg = recall = 0.0
    for qi, (label, _) in enumerate(queries):
        order = ids[np.argsort(-sims[qi], kind="stable")][:K]
        if label in order:
            recall += 1.0
            rank = int(np.where(order == label)[0][0]) + 1
            ndcg += 1.0 / math.log2(rank + 1)  # single-label nDCG
    return round(ndcg / len(queries), 4), round(recall / len(queries), 4)


def latency(backend, texts):
    singles = []
    for t in texts[:N_QUERIES]:
        t0 = time.perf_counter()
        backend.embed([t])
        singles.append((time.perf_counter() - t0) * 1e3)
    singles.sort()
    p50 = singles[len(singles) // 2]
    p95 = singles[min(len(singles) - 1, int(len(singles) * 0.95))]
    thru = {}
    for bs in (1, 8, 32):
        batch = (texts * ((bs // len(texts)) + 1))[:bs]
        t0 = time.perf_counter()
        backend.embed(batch)
        dt = time.perf_counter() - t0
        thru[str(bs)] = round(bs / dt, 1)
    return round(p50, 3), round(p95, 3), thru


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    slo_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    spark = get_spark("eval_backends")
    docs, queries = fixture(spark, sf_dir)
    texts = [t for _, t in docs]

    backends = {"hashbag-64": HashBagEmbedder(64), "hashbag-256": HashBagEmbedder(256)}
    report: dict = {"slo_ms": slo_ms, "backends": {}, "unconfigured": []}
    for absent, env in (("onnx", "MNEMO_ONNX_MODEL_PATH"), ("http", "MNEMO_EMBED_URL")):
        import os

        if not os.environ.get(env):
            report["unconfigured"].append(f"{absent} ({env} unset)")

    for name, be in backends.items():
        ndcg, rec = quality(be, docs, queries)
        p50, p95, thru = latency(be, texts)
        report["backends"][name] = {
            "ndcg_at_10": ndcg,
            "recall_at_10": rec,
            "p50_ms": p50,
            "p95_ms": p95,
            "throughput_per_s": thru,
        }

    best_quality = max(
        report["backends"].items(), key=lambda kv: kv[1]["ndcg_at_10"]
    )
    within = [
        (n, b) for n, b in report["backends"].items() if b["p95_ms"] <= slo_ms
    ]
    if within:
        pick = max(within, key=lambda kv: kv[1]["ndcg_at_10"])
        report["recommendation"] = {
            "backend": pick[0],
            "ndcg_gap_vs_best": round(
                best_quality[1]["ndcg_at_10"] - pick[1]["ndcg_at_10"], 4
            ),
        }
    else:
        report["recommendation"] = {
            "backend": None,
            "reason": f"no configured backend meets p95 <= {slo_ms}ms",
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
