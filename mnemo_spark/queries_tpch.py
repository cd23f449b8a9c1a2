"""TPC-H-shaped relational breadth queries (adapted to the driver's
trimmed star schema — no partsupp, no commit/receipt dates, synthetic
nation names NATION_n).

These widen the relational operator surface beyond the reference's
memory-engine shapes (SURVEY §2.9 supersedes its 6-production pgwire
SQL subset): correlated scalar subqueries, disjunctive multi-column
predicates, left-outer distribution counts, semi-join EXISTS with a
correlated date condition, ratio-of-sums, and multi-join market-share
cubes. Each has an exact DuckDB oracle twin.

Scale notes: every query keeps dimensions broadcast (region/nation/
customer/supplier/part at TPC-H proportions are < 2% of lineitem) and
shuffles only on the fact-table join/group keys; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mnemo_spark.io import broadcast_if_small
from mnemo_spark.registry import _t, query

# q7/q8 nation pair — names exist in the synthetic data (NATION_n)
_N1, _N2 = "NATION_1", "NATION_2"
_Q8_NATION = "NATION_5"


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over lineitem with a correlated date
    predicate (late-shipped orders per priority).

    r13 (guide §3.1 — broadcast the side that FITS): the naive
    left-semi put lineitem on the build side, broadcasting the whole
    fact table (600k rows at sf0.1, fatal at 100 TB). Reversed: the
    3-month order slice is the small side — broadcast it into
    lineitem, and EXISTS becomes countDistinct(o_orderkey), which
    plans as map-side partial dedup over only the MATCHED rows. The
    scan also gets the derivable bound l_shipdate > min(o_orderdate)
    + 90d pushed into the parquet reader (guide §2.3/§6)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").filter(
        # implied by o_orderdate >= 1996-01-01 and the +90d condition:
        # pushes into the scan, pruning lineitem before the join
        F.col("l_shipdate") > F.lit("1996-03-31").cast("timestamp")
    )
    late = l.join(
        broadcast_if_small(o),
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAY")),
        "inner",
    )
    return late.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderkey").alias("order_count")
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side conjunction + single agg — the
    predicate-pushdown showcase (all three filters reach the parquet
    scan; no shuffle at all, one partial-agg exchange of 1 row)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = '{_N1}' AND n2.n_name = '{_N2}')
         OR (n1.n_name = '{_N2}' AND n2.n_name = '{_N1}'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by year —
    disjunctive join filter over two broadcast copies of nation."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # r13 (guide §2.3/§3.2): the disjunction only ever keeps the two
    # named nations on EITHER side, so that restriction pushes into
    # both dimension legs BEFORE the one wide shuffle — each side of
    # the lineitem⋈orders exchange shrinks to the ~2/25-nation slice
    # instead of filtering after the join. The final disjunctive
    # filter still drops the same-nation pairs, so the result is
    # unchanged (oracle-gated).
    n1 = n1.filter(F.col("supp_nation").isin(_N1, _N2))
    n2 = n2.filter(F.col("cust_nation").isin(_N1, _N2))
    j = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
                F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            ((F.col("supp_nation") == _N1) & (F.col("cust_nation") == _N2))
            | ((F.col("supp_nation") == _N2) & (F.col("cust_nation") == _N1))
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           round(sum(CASE WHEN nation = '{_Q8_NATION}' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue inside a
    region, per year — conditional-sum ratio over a 7-way join (all
    dims broadcast; the one big shuffle is lineitem⋈orders)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # r13 (guide §2.3/§3): the selective dimension joins (PROMO parts,
    # ASIA-region customers) sit on their own side of the one wide
    # lineitem⋈orders exchange — applied BEFORE it, each side shuffles
    # only the surviving slice instead of filtering after the join.
    # All joins are inner, so the reorder is semantics-preserving
    # (oracle-gated).
    lp = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    oc = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
    )
    j = lp.join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == _Q8_NATION, vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    """
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  - 0.4 * p.p_retailprice * l.l_quantity AS DECIMAL(18,4)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%')
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in this schema: supply cost proxied
    as 0.4·retailprice·qty): profit per supplier-nation per year for
    'widget' parts — LIKE-filtered broadcast dim + big fact join."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    # exact decimal sum: double sums land on round-half boundaries
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    # r13 (guide §2.3): the widget-part filter is the selective leg —
    # joined below the lineitem⋈orders exchange so the fact side
    # shuffles only the surviving slice (inner-join reorder,
    # oracle-gated)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name
    FROM (
      SELECT c.c_custkey, c.c_name,
             CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
             c.c_acctbal, n.n_name
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name)
    QUALIFY row_number() OVER (ORDER BY revenue DESC, c_custkey) <= 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a
    quarter — fact join + agg + deterministic ranked truncate."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            # exact decimal sum: a double sum lands on round-half
            # boundaries (…595) where engines disagree at 2dp
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        agg.orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "q12_late_shipments",
    """
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                THEN 'late' ELSE 'ontime' END AS ship_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no shipmode column: classed by ship latency
    instead): priority mix of late vs on-time lineitems."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_class",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                "late",
            ).otherwise("ontime"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count distribution over a filtered LEFT OUTER
    join (customers with zero qualifying orders count as c_count=0).

    r13 (guide §2.3 — aggregate before you shuffle): counting per
    customer BEFORE the join shrinks the joined side from |orders|
    rows to |customers-with-orders| via a map-side-combinable
    aggregation, and the left join then attaches one pre-counted row
    per customer instead of fanning out per order. count(o_orderkey)
    over the old left join equals coalesce(cnt, 0) because o_orderkey
    is never NULL in orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    cnt = o.groupBy("o_custkey").agg(F.count("*").alias("_n"))
    per_cust = c.join(cnt, c.c_custkey == cnt.o_custkey, "left").select(
        F.coalesce(F.col("_n"), F.lit(0)).alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo share of one month's revenue — conditional
    ratio with part broadcast."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
          FROM lineitem GROUP BY l_partkey) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.half_avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + self-join — the
    rewrite Catalyst would do for the EXISTS form, written explicitly
    so the per-part aggregate is computed once."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # r13 (guide §2.3): only Brand#1 partkeys ever survive the join
    # below, and the per-partkey average is computed from ALL lineitem
    # rows of a partkey either way — semi-joining the brand's partkeys
    # first shrinks the aggregation's exchange to the brand slice
    # without changing any surviving group's value (oracle-gated)
    avg_qty = (
        l.join(
            F.broadcast(p.select("p_partkey")),
            l.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM (
      SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
             sum(l.l_quantity) AS sum_qty
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
      HAVING sum(l.l_quantity) > 300)
    QUALIFY row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) <= 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold
    (group-HAVING over the fact join) + deterministic top-100.

    Shape (r5): the per-order quantity sum is independent of the
    order/customer attributes, so aggregate lineitem FIRST on the
    narrow (orderkey, qty) projection and broadcast the tiny
    survivor set into orders — the textbook Q18 rewrite that removes
    the fact-fact shuffle join Catalyst cannot derive itself (the
    original GROUP BY carries order/customer columns)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    agg = (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )
    return (
        agg.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three-way disjunction of conjunctive brand/size/qty
    predicates spanning both join sides — the planner must keep the
    OR above the join but can still push the per-side prefixes."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def arm(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(arm("Brand#1", 1, 15, 1, 20) | arm("Brand#2", 10, 30, 10, 30) | arm("Brand#3", 20, 50, 20, 40))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q22_idle_customers",
    """
    WITH threshold AS (
      SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey, count(*) AS numcust, round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c CROSS JOIN threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey for phone prefix; lapsed instead of
    never-ordered — every synthetic customer has old orders): rich
    customers with no recent orders — global scalar aggregate
    broadcast + date-filtered anti-join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "json_props_metadata",
    """
    SELECT CAST(props->>'$.k' AS INT) // 10 AS k_bucket,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def json_props_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON metadata access (SURVEY F11, retrieval.rs:184-205 — the
    reference's metadata[k] reads): extract a typed key from the JSON
    props column and aggregate by derived bucket."""
    from mnemo_spark.io import spread_table

    # per-row JSON path extraction over the single-split cached events
    # table — read via the core-count-partitioned cached twin so the
    # parse runs on every core (r13, guide §2.5; identity at scale)
    e = spread_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k_bucket", (k / 10).cast("int"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "q15_top_suppliers",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey),
    mx AS (SELECT max(total_revenue) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    CROSS JOIN mx WHERE r.total_revenue = mx.m
    """,
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + global-max scalar subquery (the
    reference's 'latest per branch' W4 shape applied to revenue)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_brand_supplier_counts",
    """
    SELECT p.p_brand, p.p_type,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 10, 15, 20)
    GROUP BY p.p_brand, p.p_type
    """,
)
def q16_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: DISTINCT-count aggregation with NOT-equal +
    IN-list dimension predicates (partsupp stood in by lineitem)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name, count(*) AS numwait
    FROM li l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped >90d after order date): the
    sole late supplier on multi-supplier finished orders — EXISTS +
    NOT-EXISTS self-joins on the same derived relation."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    li = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias(
                "late"
            ),
        )
        .localCheckpoint(eager=True)  # reused three times below
    )
    l1 = li.filter(F.col("late"))
    others = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"), F.col("late").alias("late2")
    )
    has_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    no_other_late = has_other.join(
        others.filter(F.col("late2")),
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_anti",
    )
    return (
        no_other_late.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "quantile_stats_lineitem",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantile_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregation (median/p90) — Spark `percentile`
    and DuckDB `quantile_cont` share linear interpolation, so results
    are bit-comparable. (The approx path at 100 TB is
    percentile_approx/t-digest; exact is the oracle-able form.)"""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90_price"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
           round(c.supply_cost, 6) AS supply_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN eu s ON s.s_suppkey = c.l_suppkey
    WHERE p.p_size <= 15 AND p.p_type = 'SMALL'
      AND c.supply_cost = (SELECT min(c2.supply_cost)
                           FROM cost c2 JOIN eu s2 ON s2.s_suppkey = c2.l_suppkey
                           WHERE c2.l_partkey = p.p_partkey)
    ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp stood in by lineitem unit prices):
    correlated min-subquery — the cheapest qualified supplier per
    part within one region.

    Spark-first: the correlated scalar subquery becomes a window min
    over the regional cost frame partitioned by part (no re-scan,
    one shuffle), then an equality filter. BOTH dimension filters —
    the selective part filter (p_size/p_type) AND the EU supplier
    semi-join — broadcast-join BELOW the (l_partkey, l_suppkey)
    aggregation, not just below the window (r12, VERDICT r11 #4: the
    pair-agg over the full lineitem was 0.57 s of the query's
    0.76 s): each filter is a function of a grouping key, so
    restricting the rows first cannot change any surviving group's
    min, and the only wide shuffle in the plan (the pair aggregation)
    shrinks by the joint part x region selectivity — at 100 TB that
    is the difference between aggregating all of partsupp and ~1 %
    of it. `supply_cost` is min(price/qty) — min of identical IEEE
    divisions, so the cross-engine equality filter is exact, no FP
    drift. Ranking is orderBy+limit → TakeOrderedAndProject
    (parallel partial top-k).
    """
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    lines = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).join(
        F.broadcast(eu), l.l_suppkey == eu.s_suppkey
    )
    # the dimension columns ride the groupBy keys (functionally
    # dependent on l_partkey / l_suppkey) — no re-join after the agg
    regional = lines.groupBy(
        "l_partkey",
        "l_suppkey",
        "s_name",
        "s_acctbal",
        "n_name",
        "p_partkey",
        "p_name",
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = regional.withColumn("min_cost", F.min("supply_cost").over(w)).filter(
        F.col("supply_cost") == F.col("min_cost")
    )
    return (
        best.select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("supply_cost", 6).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_value",
    """
    WITH nsup AS (
      SELECT s_suppkey FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'),
    val AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS value
      FROM lineitem JOIN nsup ON l_suppkey = s_suppkey
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey,
           CAST(round(value, 2) AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(sum(value) AS DOUBLE) * 0.05
                  / (SELECT count(*) FROM supplier)
           FROM val)
    """,
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp stood in by shipped value): per-part
    value from one nation's suppliers, kept only when above a
    fraction of the global total — the HAVING-vs-global-scalar-
    subquery shape.

    Spark-first: the scalar subquery is a 1-row aggregate
    cross-joined (broadcast, 1 row) onto the per-part frame — the
    `val` frame computes once and feeds both sides of the compare
    via a cheap re-aggregation, not a cached collect.

    The value-share fraction scales inversely with supplier count —
    TPC-H's own Q11 rule (fraction = 0.0001/SF): a fixed share is
    degenerate under data growth (every part's share shrinks as 1/SF,
    so a constant threshold empties the result — exactly what the r8
    sf1x sweep caught). 0.05/|supplier| reproduces the old 0.0005 at
    the sf0.01 gate (100 suppliers) and stays non-vacuous at sf0.1 /
    sf1x.
    """
    supplier = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nsup = supplier.join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    ).select("s_suppkey")
    l = _t(spark, sf_dir, "lineitem")
    val = (
        l.join(F.broadcast(nsup), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            # exact decimal sum: a double sum's last ulp varies with
            # partial-aggregation order and flips the 2-dp rounding
            # (and threshold-membership) on boundary values
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("value")
        )
    )
    n_supp = supplier.agg(F.count("*").alias("_ns"))
    total = (
        val.agg(F.sum("value").cast("double").alias("_tot"))
        .crossJoin(F.broadcast(n_supp))
        .select((F.col("_tot") * F.lit(0.05) / F.col("_ns")).alias("threshold"))
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).cast("double").alias("part_value"),
        )
    )


@query(
    "q20_part_promotion",
    """
    WITH qty AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 50)
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_13'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qty)
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries — suppliers of one
    nation who moved serious volume of 'red' parts in a window
    (partsupp availability stood in by shipped quantity).

    Spark-first: inner IN → broadcast left-semi on the part id list;
    outer IN → left-semi against the grouped-HAVING frame. Both
    semi-joins prune before any wide join; the date filter pushes to
    the lineitem scan.
    """
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qty = (
        l.join(F.broadcast(red), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    # NATION_13 has qualifying suppliers at every gated SF (NATION_1
    # was vacuous at sf0.1+ — r9 de-vacuation, VERDICT r8 #3)
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_13")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    )
    return s.join(qty, s.s_suppkey == qty.l_suppkey, "left_semi").select(
        "s_name", F.round("s_acctbal", 2).alias("s_acctbal")
    )
