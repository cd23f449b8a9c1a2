"""Query registry: every oracle-gated query + its DuckDB SQL twin.

Each entry exercises one operator family from SURVEY.md §2 against the
driver's testdata tables (TESTDATA.md). The Spark side composes the
operator library; the SQL side is the independent semantic spec the
driver runs in DuckDB (tables pre-registered as views).

Determinism conventions (shared with the oracle):
- ranked outputs: rank by (rounded score DESC, id ASC) via row_number
- money sums rounded to 2dp; scores/ratios to 6dp
- time arithmetic in integer epoch-microseconds
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mnemo_spark import params as P
from mnemo_spark.functions.decay import ebbinghaus_score, recency_score
from mnemo_spark.io import load_table
from mnemo_spark.operators.bm25 import bm25_score, bm25_topk
from mnemo_spark.operators.chain import chain_heads
from mnemo_spark.operators.outlier import zscore_outliers
from mnemo_spark.operators.rrf import rrf_fuse
from mnemo_spark.operators.textquality import lang_id, token_stats
from mnemo_spark.operators.vector import ann_lsh_topk, knn_label_vote, topk_cosine
from mnemo_spark.operators.window_ops import sessionize, top_k_per_group

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Relational core: scans / filters / aggregations / joins (S3-S8, A10, J1/J9)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + 8-agg groupBy (SURVEY S3/A10).

    Scale: filter pushes to the parquet scan; partial aggregation is
    map-side combined — one shuffle of |groups| rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    WITH rev AS (
      SELECT l.l_orderkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
    FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS rn FROM rev)
    WHERE rn <= 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10 (SURVEY J9/W1).

    customer is the small side — Catalyst broadcasts it; the
    orders⋈lineitem join shuffles on orderkey.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with dimension broadcast (SURVEY J9).

    region/nation/customer/supplier are broadcast dims; the only big
    shuffle is orders⋈lineitem on orderkey.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "top_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rank
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders)
    WHERE rank <= 3
    """,
)
def top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window (SURVEY W2/W10)."""
    o = _t(spark, sf_dir, "orders")
    return top_k_per_group(
        o.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
    )


@query(
    "filtered_scan_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM (SELECT *, row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
          WHERE o_orderstatus = 'F'
            AND o_totalprice > 150000
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
    WHERE rn <= 100
    """,
)
def filtered_scan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered list scan + ORDER BY + LIMIT (SURVEY S3) — the
    reference's dynamic MemoryFilter conjunction, with a deterministic
    tiebreak so LIMIT is stable."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") > 150000)
            & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


@query(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the reference's ACL visibility shape (SURVEY
    J1: `id IN (SELECT memory_id FROM acls WHERE ...)`)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "anti_join_parts_never_ordered",
    """
    SELECT count(*) AS n_unsold, round(sum(p_retailprice), 2) AS locked_value
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def anti_join_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — orphan detection shape."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left_anti")
        .agg(
            F.count("*").alias("n_unsold"),
            F.round(F.sum("p_retailprice"), 2).alias("locked_value"),
        )
    )


@query(
    "incremental_scan_events",
    f"""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events WHERE ts > TIMESTAMP '{P.INCREMENTAL_WATERMARK}'
    GROUP BY event_type
    """,
)
def incremental_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark incremental scan (SURVEY S8, list_memories_since) —
    the CDC feed shape; the predicate prunes at the scan."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts") > F.lit(P.INCREMENTAL_WATERMARK).cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# Retrieval: BM25 lane, RRF fusion, vector top-k, LSH ANN, kNN (A1/A6/J5/J6)
# ---------------------------------------------------------------------------

_TERMS_SQL = ", ".join(f"'{t}'" for t in P.BM25_QUERY_TERMS)

# shared scored-BM25 CTE body (Robertson idf, k1/b from params) — the
# SQL twin of operators.bm25.bm25_score
_BM25_CTES = f"""
      tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents),
      lens AS (SELECT doc_id, len(toks) AS dl FROM tok),
      stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
      hits AS (SELECT doc_id, unnest(list_filter(toks, x -> x IN ({_TERMS_SQL}))) AS term
               FROM tok),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
      scored AS (
        SELECT tf.doc_id,
               round(sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                          * (tf.tf * ({P.BM25_K1} + 1))
                          / (tf.tf + {P.BM25_K1} * (1 - {P.BM25_B} + {P.BM25_B} * lens.dl / stats.avgdl)) ), 6) AS bm25
        FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
        GROUP BY tf.doc_id)
"""


@query(
    "bm25_topk_docs",
    f"""
    WITH {_BM25_CTES}
    SELECT doc_id, bm25, rank
    FROM (SELECT doc_id, bm25,
                 row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
          FROM scored)
    WHERE rank <= {P.BM25_TOPK}
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational BM25 lexical lane, top-k (SURVEY A6 — replaces the
    reference's Tantivy sidecar index with three aggregations)."""
    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, P.BM25_QUERY_TERMS, P.BM25_TOPK, k1=P.BM25_K1, b=P.BM25_B)


@query(
    "rrf_hybrid_docs",
    f"""
    WITH {_BM25_CTES},
      lane_bm25 AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
                    FROM scored),
      lane_len AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
                   FROM documents),
      contribs AS (
        SELECT doc_id, {P.RRF_WEIGHTS['bm25']} / ({P.RRF_K} + r) AS c FROM lane_bm25
        UNION ALL
        SELECT doc_id, {P.RRF_WEIGHTS['length']} / ({P.RRF_K} + r) AS c FROM lane_len),
      fused AS (SELECT doc_id, round(sum(c), 6) AS rrf_score FROM contribs GROUP BY doc_id)
    SELECT doc_id, rrf_score, rank
    FROM (SELECT doc_id, rrf_score,
                 row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
          FROM fused)
    WHERE rank <= {P.RRF_LIMIT}
    """,
)
def rrf_hybrid_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted RRF fusion of a BM25 lane and a doc-length lane
    (SURVEY A1, the reference's tuned hybrid weights/rrf_k shape)."""
    docs = _t(spark, sf_dir, "documents")
    lanes = {
        "bm25": bm25_score(docs, P.BM25_QUERY_TERMS, k1=P.BM25_K1, b=P.BM25_B)
        .withColumnRenamed("bm25", "score"),
        "length": docs.select("doc_id", F.col("n_chars").cast("double").alias("score")),
    }
    return rrf_fuse(lanes, P.RRF_WEIGHTS, P.RRF_K, limit=P.RRF_LIMIT)


_QIDS = ", ".join(str(i) for i in P.VECTOR_QUERY_IDS)
_KNN_QIDS = ", ".join(str(i) for i in P.KNN_QUERY_IDS)

_COS_SQL = (
    "round(list_dot_product(c.v, q.qv)"
    " / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6)"
)


@query(
    "vector_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id IN ({_QIDS})),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         s AS (SELECT q.query_id, c.vec_id, {_COS_SQL} AS cos_sim
               FROM c CROSS JOIN q)
    SELECT query_id, vec_id, cos_sim, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id) AS rank FROM s)
    WHERE rank <= {P.VECTOR_TOPK}
    """,
)
def vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k per query (SURVEY J6) — the
    batch replacement for the reference's HNSW single-query ANN."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(P.VECTOR_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return topk_cosine(emb, queries, P.VECTOR_TOPK)


def _plane_sql(h: list[float]) -> str:
    return "[" + ", ".join(str(x) for x in h) + "]::DOUBLE[]"


_BUCKET_SQL_C = "concat(" + ", ".join(
    f"CASE WHEN list_dot_product(v, {_plane_sql(h)}) > 0 THEN '1' ELSE '0' END"
    for h in P.LSH_HYPERPLANES
) + ")"
_BUCKET_SQL_Q = "concat(" + ", ".join(
    f"CASE WHEN list_dot_product(qv, {_plane_sql(h)}) > 0 THEN '1' ELSE '0' END"
    for h in P.LSH_HYPERPLANES
) + ")"


@query(
    "ann_lsh_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id IN ({_QIDS})),
         qb AS (SELECT query_id, qv, {_BUCKET_SQL_Q} AS bucket FROM q),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cb AS (SELECT vec_id, v, {_BUCKET_SQL_C} AS bucket FROM c),
         s AS (SELECT q.query_id, c.vec_id, {_COS_SQL} AS cos_sim
               FROM cb c JOIN qb q USING (bucket))
    SELECT query_id, vec_id, cos_sim, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id) AS rank FROM s)
    WHERE rank <= {P.VECTOR_TOPK}
    """,
)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed approximate top-k (SURVEY J6 scale path):
    the crossJoin becomes an equi-join on an 8-bit hyperplane bucket."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(P.VECTOR_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann_lsh_topk(emb, queries, P.LSH_HYPERPLANES, P.VECTOR_TOPK)


@query(
    "knn_label_vote",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id IN ({_KNN_QIDS})),
         c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         s AS (SELECT q.query_id, c.vec_id, c.label, {_COS_SQL} AS cos_sim
               FROM c CROSS JOIN q),
         nn AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos_sim DESC, vec_id) AS rank FROM s)
                WHERE rank <= {P.KNN_K}),
         votes AS (SELECT query_id, label, count(*) AS votes FROM nn
                   GROUP BY query_id, label)
    SELECT query_id, label AS pred_label, votes
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY votes DESC, label) AS rn FROM votes)
    WHERE rn = 1
    """,
)
def knn_label_vote_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote over the embedding corpus — similarity
    search powering classification (BASELINE.json pipeline ops)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(P.KNN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return knn_label_vote(emb, queries, P.KNN_K)


# ---------------------------------------------------------------------------
# Mnemo temporal / lifecycle semantics over events (W3/W5/W6/A9, sessionize)
# ---------------------------------------------------------------------------


@query(
    "event_chain_heads",
    """
    WITH h AS (
      SELECT user_id, ts, event_id,
             sha256(concat_ws('|', event_id::VARCHAR, event_type,
                              CAST(value AS DECIMAL(18,2))::VARCHAR)) AS ch
      FROM events),
    arr AS (SELECT user_id, count(*) AS chain_len,
                   list(ch ORDER BY ts, event_id) AS hashes
            FROM h GROUP BY user_id)
    SELECT user_id, chain_len,
           list_reduce(list_prepend('', hashes),
                       (acc, x) -> sha256(concat(x, acc))) AS chain_head
    FROM arr
    """,
)
def event_chain_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA-256 hash-chain head per user over the audit event stream
    (SURVEY A9/W4 — verify_event_chain's fold, JVM-side aggregate)."""
    e = _t(spark, sf_dir, "events").withColumn(
        "ch",
        F.sha2(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("event_type"),
                F.col("value").cast("decimal(18,2)").cast("string"),
            ),
            256,
        ),
    )
    return chain_heads(e, ["user_id"], ["ts", "event_id"], "ch")


@query(
    "sessionize_events",
    f"""
    WITH g AS (
      SELECT user_id, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {int(P.SESSION_GAP_MINUTES * 60 * 1e6)}
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts))
    SELECT user_id, sum(brk) AS n_sessions, count(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch analog of streaming
    session_window, SURVEY §2.7) — sessions per user."""
    e = _t(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", P.SESSION_GAP_MINUTES)
    return s.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events")
    )


@query(
    "current_fact_latest_event",
    """
    SELECT user_id, event_type, event_id AS last_event_id, ts AS last_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def current_fact_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-fact resolver shape (SURVEY W3): newest write per fact
    key wins; older revisions form the superseded chain."""
    e = _t(spark, sf_dir, "events")
    out = top_k_per_group(
        e, ["user_id", "event_type"], [F.desc("ts"), F.desc("event_id")], 1
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
    )


@query(
    "decay_scores_events",
    f"""
    WITH mx AS (SELECT max(ts) AS now_ts FROM events),
    s AS (
      SELECT e.event_id, e.user_id,
             ((epoch_us(mx.now_ts) - epoch_us(e.ts)) / 1000000.0) / 3600.0 AS age_h,
             e.value
      FROM events e CROSS JOIN mx)
    SELECT event_id, user_id,
           round(pow(2.0, -age_h / {P.DECAY_HALF_LIFE_HOURS}), 6) AS recency,
           round(least(greatest(pow(0.5, age_h / {P.DECAY_HALF_LIFE_HOURS})
                                + log2(1.0 + CAST(value AS DOUBLE)) * 0.05, 0.0), 1.0), 6)
             AS ebbinghaus
    FROM s
    """,
)
def decay_scores_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency + Ebbinghaus decay lanes (SURVEY W5/W6) anchored at the
    corpus max timestamp (deterministic 'now')."""
    e = _t(spark, sf_dir, "events")
    now = e.agg(F.max("ts").alias("now_ts"))
    j = e.crossJoin(F.broadcast(now))
    return j.select(
        "event_id",
        "user_id",
        F.round(
            recency_score(F.col("ts"), F.col("now_ts"), P.DECAY_HALF_LIFE_HOURS), 6
        ).alias("recency"),
        F.round(
            ebbinghaus_score(
                F.col("ts"), F.col("now_ts"), F.col("value"), P.DECAY_HALF_LIFE_HOURS
            ),
            6,
        ).alias("ebbinghaus"),
    )


@query(
    "zscore_outliers_embeddings",
    f"""
    WITH pos AS (SELECT label, vec_id, t.i, CAST(embedding[t.i] AS DOUBLE) AS val
                 FROM embeddings, range(1, {P.EMBEDDING_DIM + 1}) t(i)),
    base AS (SELECT label, i, avg(val) AS mu,
                    greatest(var_pop(val), 1e-6) AS var
             FROM pos GROUP BY label, i),
    z AS (SELECT p.label, p.vec_id,
                 round(sqrt(avg((p.val - b.mu) * (p.val - b.mu) / b.var)), 6) AS zscore
          FROM pos p JOIN base b ON p.label = b.label AND p.i = b.i
          GROUP BY p.label, p.vec_id)
    SELECT label, vec_id, zscore FROM z WHERE zscore > {P.ZSCORE_SIGMA}
    """,
)
def zscore_outliers_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group embedding baseline (μ, floored diag-cov) + z-score
    outlier gate (SURVEY A3/A4 — the quarantine candidate set)."""
    emb = _t(spark, sf_dir, "embeddings")
    return zscore_outliers(
        emb, "label", "vec_id", "embedding", P.EMBEDDING_DIM, P.ZSCORE_SIGMA
    )


# ---------------------------------------------------------------------------
# Text analysis (lang-id, token stats — BASELINE.json pipeline operators)
# ---------------------------------------------------------------------------

from mnemo_spark.operators.textquality import LANG_STOPWORDS  # noqa: E402


def _langid_sql() -> str:
    hit_cols = ",\n             ".join(
        f"len(list_filter(toks, t -> t IN ({', '.join(repr(w) for w in words)}))) AS h_{lang}"
        for lang, words in sorted(LANG_STOPWORDS.items())
    )
    langs_desc = sorted(LANG_STOPWORDS, reverse=True)
    m = "greatest(" + ", ".join(f"h_{l}" for l in sorted(LANG_STOPWORDS)) + ")"
    case = " ".join(f"WHEN h_{l} = m THEN '{l}'" for l in langs_desc[:-1])
    last = langs_desc[-1]
    return f"""
    WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                 FROM documents),
    hits AS (SELECT doc_id,
             {hit_cols}
             FROM tok),
    best AS (SELECT doc_id, {m} AS m, * FROM hits)
    SELECT doc_id,
           CASE WHEN m = 0 THEN 'und' {case} ELSE '{last}' END AS pred_lang
    FROM best
    """


@query("lang_id_docs", _langid_sql())
def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-share language ID (pipeline text-analysis operator;
    ties break to greatest lang code, 'und' when no hits)."""
    return lang_id(_t(spark, sf_dir, "documents"))


@query(
    "token_stats_docs",
    r"""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS ws_words,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS regex_tokens,
           CAST(ceil(len(text) / 4.0) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
)
def token_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace words, regex tokens,
    ceil(chars/4) BPE estimate (reference F13)."""
    return token_stats(_t(spark, sf_dir, "documents"))
