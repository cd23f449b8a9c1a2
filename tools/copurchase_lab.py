"""Variant lab for copurchase_part_pairs (VERDICT r9 next-round #2):
time the registry plan against candidate pair-aggregation rewrites at
sf0.1 under the warm bench protocol, plus the DuckDB twin, so the
winner is measured rather than guessed.

Variants:
  current  — chained posexplode/explode generators → groupBy(a,b)
  packed   — same generators but pack (a,b) into ONE bigint key
             (shiftleft(a,32)|b) so the hash-agg + exchange carry a
             single word per pair; decode after the HAVING filter
  salted   — two-level aggregation: partial count on (a,b,salt) then
             merge on (a,b) — the VERDICT's suggested shape (tests
             whether the exchange, not the hash-agg, is the cost)

Usage: python tools/copurchase_lab.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mnemo_spark.io import TABLES, load_table, table_path  # noqa: E402
from mnemo_spark.registry import ORACLE, QUERIES  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402


def pairs_current(baskets):
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
    )


def pairs_packed(baskets):
    e1 = baskets.select("_parts", F.posexplode("_parts").alias("_i", "part_a"))
    e2 = e1.select(
        F.explode(
            F.transform(
                F.slice(
                    "_parts", F.col("_i") + 2, F.size("_parts") - F.col("_i") - 1
                ),
                lambda b: F.shiftleft(F.col("part_a").cast("long"), 32)
                + b.cast("long"),
            )
        ).alias("_pk")
    )
    agg = e2.groupBy("_pk").agg(F.count("*").alias("n_ab")).filter(
        F.col("n_ab") >= 2
    )
    return agg.select(
        F.shiftright("_pk", 32).cast("int").alias("part_a"),
        (F.col("_pk") % F.lit(1 << 32)).cast("int").alias("part_b"),
        "n_ab",
    )


def pairs_packed2(baskets):
    # pack inside the second generator WITHOUT a lambda (transform is
    # interpreted): explode the slice, then pack in codegen
    e1 = baskets.select("_parts", F.posexplode("_parts").alias("_i", "part_a"))
    e2 = e1.select(
        "part_a",
        F.explode(
            F.slice("_parts", F.col("_i") + 2, F.size("_parts") - F.col("_i") - 1)
        ).alias("part_b"),
    ).select(
        (
            F.shiftleft(F.col("part_a").cast("long"), 32)
            + F.col("part_b").cast("long")
        ).alias("_pk")
    )
    agg = e2.groupBy("_pk").agg(F.count("*").alias("n_ab")).filter(
        F.col("n_ab") >= 2
    )
    return agg.select(
        F.shiftright("_pk", 32).cast("int").alias("part_a"),
        (F.col("_pk") % F.lit(1 << 32)).cast("int").alias("part_b"),
        "n_ab",
    )


def pairs_salted(baskets):
    e1 = baskets.select("_parts", F.posexplode("_parts").alias("_i", "part_a"))
    e2 = e1.select(
        "part_a",
        F.explode(
            F.slice("_parts", F.col("_i") + 2, F.size("_parts") - F.col("_i") - 1)
        ).alias("part_b"),
    ).withColumn("_salt", F.spark_partition_id() % 4)
    lvl1 = e2.groupBy("part_a", "part_b", "_salt").agg(
        F.count("*").alias("c")
    )
    return (
        lvl1.groupBy("part_a", "part_b")
        .agg(F.sum("c").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import os

    os.environ.setdefault("MNEMO_CACHE_TABLES", "1")
    spark = get_spark("copurchase_lab")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(1).count()
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    from mnemo_spark.cache import cached_persist

    l = load_table(spark, sf_dir, "lineitem")
    baskets = cached_persist(
        l.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("_parts")
        ),
        "copurchase_baskets",
    )
    baskets.count()  # warm the serving artifact, same as registry warm path

    variants = {
        "registry": lambda: QUERIES["copurchase_part_pairs"](spark, sf_dir),
        "pairs_current": lambda: pairs_current(baskets),
        "pairs_packed": lambda: pairs_packed(baskets),
        "pairs_packed2": lambda: pairs_packed2(baskets),
        "pairs_salted": lambda: pairs_salted(baskets),
    }
    out = {}
    for name, build in variants.items():
        times = []
        for _ in range(3):
            t0 = time.time()
            n = build().count()
            times.append(time.time() - t0)
        out[name] = {"sec": round(min(times), 3), "rows": n}

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    sql = ORACLE["copurchase_part_pairs"]
    times = []
    for _ in range(3):
        t0 = time.time()
        rows = len(con.execute(sql).fetchall())
        times.append(time.time() - t0)
    out["duckdb_twin"] = {"sec": round(min(times), 3), "rows": rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
