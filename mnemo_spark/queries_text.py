"""Text/scalar-function + temporal-join queries: as-of join, window
analytics, excerpt/encoding metadata, date absolutization (F9/F12/
F15 + the time-series join the reference leaves to predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mnemo_spark.functions.reflection import absolutize_dates
from mnemo_spark.functions.text import excerpt, token_estimate
from mnemo_spark.registry import _t, query


@query(
    "asof_join_events",
    """
    WITH w AS (
      SELECT event_id, event_type, ts,
             last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_ts
      FROM events)
    SELECT event_id, last_purchase_ts,
           (epoch_us(ts) - epoch_us(last_purchase_ts)) // 60000000 AS gap_minutes
    FROM w
    WHERE event_type = 'error' AND last_purchase_ts IS NOT NULL
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the most recent
    purchase at-or-before it by the same user. Expressed as an
    IGNORE-NULLS running last over the merged ordered stream — no
    join at all, one window sort per user partition (the classic
    Spark as-of shape; beats union+join at any scale because the
    sort is the shuffle)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True
    ).over(w)
    gap = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_purchase_ts")))
        / F.lit(60000000)
    ).cast("long")
    return (
        e.withColumn("last_purchase_ts", last_purchase)
        .filter((F.col("event_type") == "error") & F.col("last_purchase_ts").isNotNull())
        .select("event_id", "last_purchase_ts", gap.alias("gap_minutes"))
    )


@query(
    "window_stats_events",
    """
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS moving_avg5,
           round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 2) AS delta_prev,
           dense_rank() OVER (PARTITION BY user_id ORDER BY CAST(value AS DECIMAL(18,2)) DESC) AS value_rank,
           ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile
    FROM events
    """,
)
def window_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-analytics breadth (SURVEY §2.5): bounded moving average,
    lag delta, dense_rank, ntile — one shuffle on user_id shared by
    all four frames."""
    e = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w5 = wo.rowsBetween(-4, Window.currentRow)
    wrank = Window.partitionBy("user_id").orderBy(
        F.desc(F.col("value").cast("decimal(18,2)"))
    )
    return e.select(
        "event_id",
        F.round(F.avg("value").over(w5), 6).alias("moving_avg5"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(wo), F.lit(0.0)), 2
        ).alias("delta_prev"),
        F.dense_rank().over(wrank).alias("value_rank"),
        F.ntile(4).over(wo).alias("quartile"),
    )


@query(
    "excerpt_meta_docs",
    """
    SELECT doc_id,
           substr(split_part(text, chr(10), 1), 1, 60) AS excerpt,
           to_base64(encode(substr(text, 1, 12))) AS head_b64,
           hex(encode(substr(text, 1, 4))) AS head_hex,
           CAST(ceil(len(text) / 4.0) AS BIGINT) AS est_tokens
    FROM documents
    """,
)
def excerpt_meta_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (F12 excerpt, F15 base64/hex, F13 token
    estimate) as one projection."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        excerpt(F.col("text"), 60).alias("excerpt"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("head_b64"),
        F.hex(F.encode(F.substring("text", 1, 4), "UTF-8")).alias("head_hex"),
        token_estimate("text").alias("est_tokens"),
    )


@query(
    "date_absolutize_events",
    """
    WITH s AS (
      SELECT event_id, CAST(ts AS DATE) AS d,
             CAST(floor(value) AS BIGINT) % 9 + 1 AS a,
             CAST(floor(value) AS BIGINT) % 3 + 1 AS w
      FROM events WHERE event_type = 'purchase')
    SELECT event_id,
           concat('ordered ', strftime(d - CAST(a AS INT), '%Y-%m-%d'),
                  ', ship ', strftime(d + CAST(w * 7 AS INT), '%Y-%m-%d')) AS abs_text
    FROM s
    """,
)
def date_absolutize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date absolutization (SURVEY F9, reflection.rs:305-400):
    relative phrases ('N days ago', 'in N weeks') rewritten to ISO
    dates anchored at each event's timestamp. The oracle states the
    SEMANTICS (the dates the phrases denote); the Spark side routes
    through the actual regexp rewriter in functions.reflection.
    floor() before the modulo: DuckDB's double→bigint cast rounds
    while Spark's truncates."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    n_ago = (F.floor("value").cast("bigint") % 9 + 1).cast("string")
    n_weeks = (F.floor("value").cast("bigint") % 3 + 1).cast("string")
    text = F.concat(
        F.lit("ordered "), n_ago, F.lit(" days ago, ship in "), n_weeks, F.lit(" weeks")
    )
    s = e.select("event_id", "ts", text.alias("text"))
    return s.select(
        "event_id", absolutize_dates(F.col("text"), F.col("ts")).alias("abs_text")
    )


from mnemo_spark.operators.poisoning import poisoning_flags  # noqa: E402


@query(
    "poisoning_flags_docs",
    """
    WITH base AS (
      SELECT doc_id, source,
             regexp_matches(text, '(ignore (all )?previous|disregard .*instructions|system prompt|do not tell)') AS marker_hit,
             CAST(len(text) AS DOUBLE) AS l,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    tf AS (
      SELECT doc_id, max(c) AS maxtf, sum(c) AS ntok
      FROM (SELECT doc_id, t, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS t FROM base)
            GROUP BY doc_id, t)
      GROUP BY doc_id),
    prof AS (
      SELECT source, avg(l) AS mu, greatest(stddev_pop(l), 1e-6) AS sigma
      FROM base GROUP BY source),
    j AS (
      SELECT b.doc_id, b.source, b.marker_hit,
             round(CASE WHEN tf.ntok > 0 THEN tf.maxtf * 1.0 / tf.ntok ELSE 0.0 END, 6)
               AS repetition_ratio,
             round(abs(b.l - p.mu) / p.sigma, 6) AS len_z
      FROM base b JOIN tf USING (doc_id) JOIN prof p USING (source))
    SELECT doc_id, source, marker_hit, repetition_ratio, len_z,
           (marker_hit OR repetition_ratio > 0.2 OR len_z > 2.0) AS flagged
    FROM j
    """,
)
def poisoning_flags_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisoning defense signals (SURVEY F17, query/poisoning.rs):
    injection-marker regex, token-repetition ratio, and per-source
    length z-score vs the A2 profile — union of signals = the
    quarantine candidate set (MINJA/ASI06 gate, batch form)."""
    return poisoning_flags(
        _t(spark, sf_dir, "documents"), group_col="source"
    )


# ---------------------------------------------------------------------------
# SimHash hamming-band near-dup pairs (round 4 — completes the simhash
# family: signatures existed, the bucketed pair join did not)
# ---------------------------------------------------------------------------

from mnemo_spark.operators.dedup import simhash_near_dup_pairs  # noqa: E402

_SIMHASH_SIG_SQL = """
    tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
            FROM documents WHERE doc_id % 3 = 0),
    sb AS (SELECT doc_id, p.i,
                 CASE WHEN substr(md5(t), p.i, 1) IN ('8','9','a','b','c','d','e','f')
                      THEN 1 ELSE -1 END AS c
          FROM tok, range(1, 17) p(i)),
    sagg AS (SELECT doc_id, i, sum(c) AS s FROM sb GROUP BY doc_id, i),
    sig AS (SELECT doc_id,
                   string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY i)
                     AS simhash
            FROM sagg GROUP BY doc_id)
"""


@query(
    "simhash_near_dup_pairs",
    f"""
    WITH {_SIMHASH_SIG_SQL.strip()},
    sigi AS (SELECT doc_id,
                    CAST(sum(CASE WHEN s > 0 THEN 1 << (16 - i) ELSE 0 END)
                         AS BIGINT) AS sim_int
             FROM sagg GROUP BY doc_id),
    banded AS (SELECT doc_id, sim_int, bb.b,
                      (sim_int >> (bb.b * 8)) & 255 AS band
               FROM sigi, range(0, 2) bb(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                             a.sim_int AS sa, b.sim_int AS sb
             FROM banded a
             JOIN banded b ON a.b = b.b AND a.band = b.band
                          AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 1
    """,
)
def simhash_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (operators/dedup.py
    simhash_near_dup_pairs): hamming-band bucketing — candidates come
    only from an equi-join on signature slices (complete for
    hamming ≤ bands−1), exact hamming on candidates."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return simhash_near_dup_pairs(docs, max_hamming=1, bands=2).withColumn(
        "hamming", F.col("hamming").cast("int")
    )
