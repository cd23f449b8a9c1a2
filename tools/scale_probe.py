"""Scaling-curve probe: time the heavy dedup/similarity operators on
1x / 2x / 4x multiples of the documents corpus and report the runtime
growth factor per doubling.

The 100-TB argument everywhere in SURVEY.md is that the heavy
operators are built from single-shuffle, map-side-combinable,
equi-join shapes — i.e. near-LINEAR in corpus size (growth factor per
doubling ≈ 2, not 4). A quadratic-shaped operator (all-pairs join)
would show factor ≈ 4 per doubling and is exactly what this probe
exists to catch. Multiplied corpora are derived (doc_id offset +
shuffled source tags), used ONLY for timing — correctness stays the
oracle gate's job on the driver's own testdata.

Usage: python tools/scale_probe.py [sf_dir] [multipliers...]
Prints one JSON line:
  {"op": {"1": sec, "2": sec, "4": sec, "factor_per_doubling": f}}
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mnemo_spark.io import load_table  # noqa: E402
from mnemo_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_band_pairs,
    simhash,
)
from mnemo_spark.operators.vector import topk_cosine  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402


def multiplied(docs, m: int):
    """m derived copies: doc_id offset per copy, text perturbed with a
    copy tag so near-dup structure scales instead of collapsing into
    exact duplicates."""
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(m):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                F.when(F.lit(i) == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(f" copytag{i}")))
                .alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def multiplied_vectors(emb, m: int):
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(x) for x in sys.argv[2:]] or [1, 2, 4]
    spark = get_spark("scale_probe")
    base = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    ops = {
        "exact_dedup": lambda d: exact_dedup(d).count(),
        "minhash_lsh": lambda d: minhash_band_pairs(d).count(),
        "simhash": lambda d: simhash(d).count(),
    }
    vec_ops = {
        "topk_cosine": lambda v: topk_cosine(v, qs, 10).count(),
    }

    # warm-up: codegen/JIT for every op once, untimed — without this
    # the first multiplier absorbs compilation and the curve bends
    # BELOW linear, which is flattering but wrong
    warm = multiplied(base, 1).localCheckpoint()
    for fn in ops.values():
        fn(warm)
    warm.unpersist()
    warm_v = multiplied_vectors(emb, 1).localCheckpoint()
    for fn in vec_ops.values():
        fn(warm_v)
    warm_v.unpersist()

    results: dict[str, dict] = {}
    for name, fn in list(ops.items()) + list(vec_ops.items()):
        mult_fn = multiplied_vectors if name in vec_ops else multiplied
        src_df = emb if name in vec_ops else base
        row: dict[str, float] = {}
        for m in mults:
            d = mult_fn(src_df, m).localCheckpoint()  # isolate input build
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(d)
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            row[str(m)] = round(best, 3)
            d.unpersist()
        lo, hi = str(mults[0]), str(mults[-1])
        doublings = math.log2(mults[-1] / mults[0])
        if doublings > 0 and row[lo] > 0:
            row["factor_per_doubling"] = round(
                (row[hi] / row[lo]) ** (1.0 / doublings), 2
            )
        results[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
