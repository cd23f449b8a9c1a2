"""SQL-surface breadth: statistical aggregates, CUBE grouping sets,
INTERSECT/EXCEPT set operations, array-function pipelines — the OLAP
surface a full engine owes its users beyond the reference's verb set
(SURVEY §3.3: this engine supersedes the 6-production pgwire subset
with full Spark SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mnemo_spark.functions.text import tokens
from mnemo_spark.io import local_frame
from mnemo_spark.registry import _t, query


@query(
    "stats_agg_lineitem",
    """
    -- + 0.0 collapses IEEE negative zero (engines disagree on -0.0
    -- after rounding tiny negatives)
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_covar,
           round(stddev_samp(l_discount), 4) + 0.0                 AS discount_stddev,
           round(skewness(l_quantity), 4) + 0.0                    AS qty_skew,
           round(kurtosis(l_quantity), 4) + 0.0                    AS qty_kurtosis
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (corr/covar/stddev/skewness/
    kurtosis) — all single-pass algebraic aggregates, map-side
    combinable. 4dp rounding: the higher moments accumulate in
    engine-specific order and drift in the 6th decimal per group."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        # + 0.0 collapses IEEE negative zero after rounding
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + 0.0).alias(
            "qty_price_corr"
        ),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + 0.0).alias(
            "qty_price_covar"
        ),
        (F.round(F.stddev_samp("l_discount"), 4) + 0.0).alias("discount_stddev"),
        (F.round(F.skewness("l_quantity"), 4) + 0.0).alias("qty_skew"),
        (F.round(F.kurtosis("l_quantity"), 4) + 0.0).alias("qty_kurtosis"),
    )


@query(
    "cube_order_counts",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of two dimensions) —
    the full-lattice complement of rollup_revenue's hierarchy."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "setops_customer_years",
    """
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
         y00 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00')
    SELECT
      (SELECT count(*) FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y00)) AS both_years,
      (SELECT count(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y00))    AS only_1996,
      (SELECT count(*) FROM (SELECT * FROM y00 EXCEPT SELECT * FROM y96))    AS only_2000
    """,
)
def setops_customer_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (SURVEY W11 notes them as
    available-but-unused in the reference): cohort overlap between
    two order years."""
    o = _t(spark, sf_dir, "orders")

    def in_year(y):
        return (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp")) & (
            F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp")
        )

    # ONE grouped pass (r13, guide §2.3/§2.4): the intersect/except
    # formulation paid two distinct exchanges plus three set-operation
    # joins and three aggregations over the SAME per-customer
    # membership facts (12 Spark jobs measured). A single
    # groupBy(custkey) computes both year-membership flags — map-side
    # combined — and one closing aggregation counts the three disjoint
    # regions. Identical semantics: intersect/except are distinct-set
    # ops, and max(flag) per customer is exactly set membership.
    flags = (
        o.filter(in_year(1996) | in_year(2000))
        .groupBy("o_custkey")
        .agg(
            F.max(in_year(1996).cast("int")).alias("_y96"),
            F.max(in_year(2000).cast("int")).alias("_y00"),
        )
    )
    return flags.agg(
        F.count_if((F.col("_y96") == 1) & (F.col("_y00") == 1)).alias("both_years"),
        F.count_if((F.col("_y96") == 1) & (F.col("_y00") == 0)).alias("only_1996"),
        F.count_if((F.col("_y96") == 0) & (F.col("_y00") == 1)).alias("only_2000"),
    )


@query(
    "array_funcs_docs",
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)
    SELECT doc_id,
           len(list_distinct(toks)) AS n_distinct,
           array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), ',')
             AS first3_sorted,
           list_contains(toks, 'spark') AS has_spark,
           len(list_filter(toks, x -> len(x) > 5)) AS n_long_tokens
    FROM t
    """,
)
def array_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function pipeline (distinct/sort/slice/contains/filter)
    over the token array — the collection-type surface."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens("text")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), ","
        ).alias("first3_sorted"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long_tokens"),
    )


@query(
    "approx_distinct_events",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS valid
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per event_type — THE
    cardinality primitive at 100 TB, where exact countDistinct pays a
    full shuffle of every key and the sketch pays a constant few KB
    per partition. Cross-engine sketch VALUES are not a contract
    (DuckDB's estimator differs), so the full-oracle form exposes the
    exact count plus a tolerance-band flag: `valid` asserts the HLL++
    estimate landed within 5x its configured rsd=2% of the exact
    count (the guarantee a planner relies on when swapping it in).
    The oracle expects `valid` uniformly TRUE, so a sketch outside
    its error bound is a hash mismatch, not a silent pass."""
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.col("exact_users") * 0.1, F.lit(2.0))
        ).alias("valid"),
    )


_WINDOWS = [
    # (win_id, day, start_hour, end_hour) — maintenance-window shapes
    (1, "2024-01-10", 2, 8),
    (2, "2024-01-25", 6, 18),
    (3, "2024-02-07", 0, 12),
    (4, "2024-02-20", 12, 24),
]
_WIN_SQL = ", ".join(
    f"({w}, DATE '{d}', TIMESTAMP '{d} 00:00:00' + INTERVAL {a} HOUR,"
    f" TIMESTAMP '{d} 00:00:00' + INTERVAL {b} HOUR)"
    for w, d, a, b in _WINDOWS
)


@query(
    "interval_join_events",
    f"""
    WITH w(win_id, day, w_start, w_end) AS (VALUES {_WIN_SQL})
    SELECT w.win_id, e.event_type,
           CAST(count(*) AS BIGINT) AS n, round(sum(e.value), 2) AS total
    FROM events e
    JOIN w ON CAST(e.ts AS DATE) = w.day
          AND e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.win_id, e.event_type
    """,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join (the range-join shape asof_join
    doesn't cover): events against literal maintenance windows. The
    range predicate alone would force a nested-loop plan; carrying
    the window's DAY as an equi-key turns it into a broadcast hash
    join with a range residual — the same day/hour time-bucketing
    that co-partitions interval joins at 100 TB."""
    e = _t(spark, sf_dir, "events")
    # local_frame, not createDataFrame(list): the window fixture feeds
    # a broadcast build that re-executes per call, and a pickled-slice
    # frame schedules 32 near-empty Python tasks per execution (r13,
    # guide §4 — measured 0.35 s/scan vs 0.04 s for the Arrow local
    # frame)
    w = local_frame(
        spark,
        [(w, d, f"{d} 00:00:00", a, b) for w, d, a, b in _WINDOWS],
        "win_id int, day string, midnight string, a int, b int",
    ).select(
        "win_id",
        F.to_date("day").alias("day"),
        (F.to_timestamp("midnight") + F.col("a") * F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        (F.to_timestamp("midnight") + F.col("b") * F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    joined = e.join(
        F.broadcast(w),
        (F.to_date("ts") == F.col("day"))
        & (F.col("ts") >= F.col("w_start"))
        & (F.col("ts") < F.col("w_end")),
    )
    return joined.groupBy("win_id", "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@query(
    "approx_quantiles_lineitem",
    """
    SELECT l_returnflag,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)
             AS exact_p50_cents,
           TRUE AS valid
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Spark's Greenwald-Khanna
    percentile_approx) per return flag — the other sketch a planner
    reaches for at 100 TB, where exact percentile sorts every
    partition. Sketch estimates differ across engines, so the
    full-oracle form exposes the EXACT interpolated median (Spark
    `percentile` ≡ DuckDB `quantile_cont`, both linear interpolation
    at (n-1)p) plus `valid`: the sketch value bracketed by the exact
    p±2% neighbors (rank error ≤ 1/accuracy at accuracy 10000). The
    oracle expects `valid` uniformly TRUE, so a sketch outside its
    rank-error bound is a hash mismatch, not a silent pass.

    The median is emitted in integer CENTS (r12): prices are 2-dp
    money, so medians over DOLLARS are routinely exact half-cents —
    the decimal-grid rounding boundary where the two engines' 1-ulp
    interpolation differences legitimately round(…, 2) to different
    cents (caught by a full sf0.001 sweep: 52724.245 split
    .24 vs .25). Interpolating INTEGER cents yields exactly n or
    n + 0.5 — both exactly representable, byte-identical in both
    engines, no final rounding step at all."""
    e = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    agg = e.select("l_returnflag", cents.alias("_cents")).groupBy(
        "l_returnflag"
    ).agg(
        F.percentile_approx("_cents", 0.5, 10000).alias("approx_p50"),
        F.expr("percentile(_cents, 0.5)").alias("exact_p50_cents"),
        F.expr("percentile(_cents, 0.48)").alias("lo"),
        F.expr("percentile(_cents, 0.52)").alias("hi"),
    )
    return agg.select(
        "l_returnflag",
        "exact_p50_cents",
        (
            (F.col("approx_p50") >= F.col("lo"))
            & (F.col("approx_p50") <= F.col("hi"))
        ).alias("valid"),
    )


@query(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping() flags — the remaining member of
    the multi-level aggregation family next to rollup and cube;
    Catalyst expands the sets into one Expand + single aggregation
    (one shuffle, not one per set)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )
