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

Usage: python tools/scale_probe.py [sf_dir] [multipliers...] [--ops=a,b]
Prints one JSON line:
  {"op": {"1": sec, "2": sec, "4": sec, "factor_per_doubling": f}}

--ops restricts to named families (the single-agent chain probe is
excluded from the default set: it exists to DOCUMENT the sequential
floor, and its 16x point is minutes of single-task fold by design).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mnemo_spark.io import load_table  # noqa: E402
from mnemo_spark.operators.chain import assign_chain  # noqa: E402
from mnemo_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_band_pairs,
    simhash,
)
from mnemo_spark.operators.graph import expand  # noqa: E402
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


def multiplied_events(ev, m: int, skew: bool = False, one_agent: bool = False):
    """m derived copies of the events table, event_id offset per copy.

    skew=False offsets user_id per copy too — m× more chains of the
    SAME depth (the parallel case). skew=True keeps every copy on the
    ORIGINAL user ids — every chain m× deeper, parallelism across
    agents preserved. one_agent=True collapses EVERYTHING onto one
    user — a single chain of m×|events| links, the true worst case
    for the sequential per-chain fold: wall-clock is bounded below by
    the longest chain regardless of cluster size (the reference's
    per-agent hash chain has the identical floor — chains are
    sequential by definition; the fix at 100 TB is chain SHARDING by
    epoch, not parallelism)."""
    n = ev.agg(F.max("event_id")).collect()[0][0] + 1
    nu = ev.agg(F.max("user_id")).collect()[0][0] + 1
    parts = []
    for i in range(m):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * n)).alias("event_id"),
                "ts",
                (
                    F.lit(0).cast("long")
                    if one_agent
                    else F.col("user_id")
                    if skew
                    else (F.col("user_id") + F.lit(i * nu))
                ).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def multiplied_lineitem(li, m: int):
    """m derived copies with l_orderkey offset (more baskets of the
    same size — pair volume grows linearly with orders)."""
    n = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * n)).alias("l_orderkey"),
            "l_partkey",
        )
        for i in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _chain_op(ev) -> int:
    """assign_chain over a derived content hash — the sequential
    per-agent fold (operators/chain.py:59)."""
    d = ev.withColumn(
        "h", F.md5(F.concat_ws("|", "event_id", "event_type", "props"))
    )
    return assign_chain(d, ["user_id"], ["ts", "event_id"], "h").count()


def _chain_epochs_op(ev) -> int:
    """assign_chain_epochs over the same derived hash, epochs = 16
    equal ts-range buckets (monotone along the chain order, as
    required; the head pass is sequential in the EPOCH COUNT, so it
    stays fixed as data grows). The sharded form's wall time should
    scale with cores up to the largest epoch (VERDICT r7 #3), unlike
    the single fold whose floor is the whole chain."""
    from mnemo_spark.operators.chain import assign_chain_epochs

    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    width = max(1, (hi - lo) // 16 + 1)
    d = ev.withColumn(
        "h", F.md5(F.concat_ws("|", "event_id", "event_type", "props"))
    ).withColumn(
        "epoch", ((F.unix_micros("ts") - F.lit(lo)) / F.lit(width)).cast("int")
    )
    return assign_chain_epochs(
        d, ["user_id"], ["ts", "event_id"], "h", epoch_col="epoch"
    ).count()


def _graph_op(ev) -> int:
    """3-hop BFS along per-user parent pointers from each user's
    latest event (operators/graph.py expand) — seeds scale with the
    corpus, depth stays fixed."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("_prev", F.lag("event_id").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(F.col("event_id").alias("src"), F.col("_prev").alias("dst"))
    )
    seeds = ev.groupBy("user_id").agg(F.max("event_id").alias("id")).select("id")
    return expand(edges, seeds, hops=3, dedup_per_hop=False).count()


def _copurchase_op(li) -> int:
    """Basket pair counting — the queries_analytics.copurchase_part_
    pairs shape (sorted basket aggregation + generator combination
    expansion + pair groupBy), minus the marginal lift joins."""
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("_parts")
    )
    e1 = baskets.select("_parts", F.posexplode("_parts").alias("_i", "part_a"))
    e2 = e1.select(
        "part_a",
        F.explode(
            F.slice("_parts", F.col("_i") + 2, F.size("_parts") - F.col("_i") - 1)
        ).alias("part_b"),
    )
    return (
        e2.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
        .count()
    )


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--ops="):
            only = set(a.split("=", 1)[1].split(","))
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"
    mults = [int(x) for x in pos[1:]] or [1, 2, 4]
    spark = get_spark("scale_probe")
    base = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    # op name -> (input builder(m) -> DataFrame, runner(df) -> rowcount)
    families: dict[str, tuple] = {
        "exact_dedup": (lambda m: multiplied(base, m), lambda d: exact_dedup(d).count()),
        "minhash_lsh": (
            lambda m: multiplied(base, m),
            lambda d: minhash_band_pairs(d).count(),
        ),
        "simhash": (lambda m: multiplied(base, m), lambda d: simhash(d).count()),
        "topk_cosine": (
            lambda m: multiplied_vectors(emb, m),
            lambda v: topk_cosine(v, qs, 10).count(),
        ),
        "assign_chain": (lambda m: multiplied_events(ev, m), _chain_op),
        "assign_chain_skew": (
            lambda m: multiplied_events(ev, m, skew=True),
            _chain_op,
        ),
        # not in the default set (see module docstring): the one-giant-
        # agent chain is sequential BY SEMANTICS — run explicitly with
        # --ops=assign_chain_1agent to document the floor
        "assign_chain_1agent": (
            lambda m: multiplied_events(ev, m, one_agent=True),
            _chain_op,
        ),
        # the sharded mitigation for the same worst case: epochs carry
        # heads, folds parallelize (VERDICT r7 #3) — run with
        # --ops=assign_chain_1agent_epochs next to the floor above
        "assign_chain_1agent_epochs": (
            lambda m: multiplied_events(ev, m, one_agent=True),
            _chain_epochs_op,
        ),
        "graph_expand": (lambda m: multiplied_events(ev, m), _graph_op),
        "copurchase_pairs": (lambda m: multiplied_lineitem(li, m), _copurchase_op),
    }

    if only is None:
        families.pop("assign_chain_1agent")
        families.pop("assign_chain_1agent_epochs")
    else:
        families = {k: v for k, v in families.items() if k in only}

    # warm-up: codegen/JIT for every op once, untimed — without this
    # the first multiplier absorbs compilation and the curve bends
    # BELOW linear, which is flattering but wrong
    for name, (build, fn) in families.items():
        warm = build(1).localCheckpoint()
        fn(warm)
        warm.unpersist()

    results: dict[str, dict] = {}
    for name, (build, fn) in families.items():
        row: dict[str, float] = {}
        for m in mults:
            d = build(m).localCheckpoint()  # isolate input build
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
