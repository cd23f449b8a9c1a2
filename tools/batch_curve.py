"""recall_batch serving-posture curve (VERDICT r8 #8): per-query
marginal cost as BOTH the corpus and the batch grow.

Builds a resident store from a sf dir's documents table (write once,
save, load — the serving posture engine_probe.py times), then inside
ONE `engine.serving()` session times recall_batch at batch sizes
32 / 128 / 512. Warm protocol: untimed warmup at batch 32 (fills the
tracked caches: postings, per-doc stats, table scans), then min-of-2
per point. Prints one JSON line:

    {"<sf_dir>": {"n_docs": N, "batch32": s, "batch128": s,
                  "batch512": s, "per_query_marginal_ms": ...}}

per_query_marginal_ms = 1000*(t512-t32)/480 — the slope, which is the
number that must stay flat at 100 TB (the corpus passes amortize; each
extra query adds one broadcast join + a WindowGroupLimit rank).

Usage: python tools/batch_curve.py sf_dir [sf_dir ...]
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mnemo_spark.engine import MnemoSparkEngine  # noqa: E402
from mnemo_spark.io import load_table  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402

T0 = dt.datetime(2024, 1, 1)
BATCHES = (32, 128, 512)


def rows_from_docs(spark, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("id"),
        F.concat(F.lit("agent_"), (F.col("doc_id") % 8).cast("string")).alias(
            "agent_id"
        ),
        F.col("text").alias("content"),
        F.lit("semantic").alias("memory_type"),
        F.lit("public").alias("scope"),
        F.lit(0.5).cast("float").alias("importance"),
        F.array().cast("array<string>").alias("tags"),
        (
            F.lit(T0).cast("timestamp")
            + F.make_interval(mins=F.col("doc_id").cast("int") % 100000)
        ).alias("created_at"),
    )


def main() -> int:
    sf_dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/root/testdata/sf0.01"
    ]
    spark = get_spark("batch_curve", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf in sf_dirs:
        store = tempfile.mkdtemp(prefix="batch_curve_")
        eng0 = MnemoSparkEngine(spark).remember_batch(rows_from_docs(spark, sf))
        eng0.save(store, layout_files=32)
        eng = MnemoSparkEngine.load(spark, store)
        n_docs = eng.memories.count()
        res = {"n_docs": n_docs}
        qdf_by_b = {
            b: spark.createDataFrame(
                [
                    (f"q{i}", f"spark join window query {i} shuffle partition")
                    for i in range(b)
                ],
                "query_id string, query string",
            )
            for b in BATCHES
        }
        ann_mode = "--ann" in sys.argv[1:]
        with eng.serving():
            eng.recall_batch(qdf_by_b[32], "agent_0", k=10).count()  # warm
            for b in BATCHES:
                best = float("inf")
                for _ in range(2):
                    t0 = time.monotonic()
                    eng.recall_batch(qdf_by_b[b], "agent_0", k=10).count()
                    best = min(best, time.monotonic() - t0)
                res[f"batch{b}"] = round(best, 3)
            if ann_mode:
                # dense-lane-only curve, exact vs routed (VERDICT r9
                # #3 gate): the routed slope is the sub-O(corpus)
                # claim — each extra query scores nprobe cells, not
                # the corpus
                for lbl in ("exact", "ivf"):
                    eng.recall_batch(
                        qdf_by_b[32], "agent_0", strategy="semantic",
                        k=10, ann=lbl,
                    ).count()  # warm (index artifacts on first ivf)
                    for b in BATCHES:
                        best = float("inf")
                        for _ in range(2):
                            t0 = time.monotonic()
                            eng.recall_batch(
                                qdf_by_b[b], "agent_0",
                                strategy="semantic", k=10, ann=lbl,
                            ).count()
                            best = min(best, time.monotonic() - t0)
                        res[f"{lbl}_batch{b}"] = round(best, 3)
                    res[f"{lbl}_per_query_marginal_ms"] = round(
                        1000.0
                        * (res[f"{lbl}_batch512"] - res[f"{lbl}_batch32"])
                        / (512 - 32),
                        2,
                    )
        res["per_query_marginal_ms"] = round(
            1000.0 * (res["batch512"] - res["batch32"]) / (512 - 32), 2
        )
        out[sf] = res
        print(json.dumps({sf: res}), file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
