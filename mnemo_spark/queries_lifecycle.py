"""Lifecycle-verb queries (reference §2.9 batch jobs): decay pass,
TTL sweep, consolidation clustering, causality trace.

Each derives memory-style columns (importance, decay curve, TTL,
parent pointer) deterministically from the events/documents tables so
the lifecycle semantics are oracle-checkable on the driver corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mnemo_spark import params as P
from mnemo_spark.operators.consolidate import connected_components, consolidate_clusters
from mnemo_spark.operators.dedup import ngram_jaccard_pairs
from mnemo_spark.operators.lifecycle import decay_pass, ttl_sweep
from mnemo_spark.registry import _t, query

# per-type decay curve assignment (exercises all four families)
_CURVE_CASE_SQL = """CASE event_type
  WHEN 'purchase' THEN 'step:240'
  WHEN 'signup'   THEN 'power_law:1.0'
  WHEN 'click'    THEN 'linear'
  WHEN 'error'    THEN 'step:120'
  ELSE 'exponential' END"""

_TTL_CASE_SQL = """CASE event_type
  WHEN 'purchase' THEN INTERVAL 60 DAY
  WHEN 'signup'   THEN INTERVAL 45 DAY
  WHEN 'click'    THEN INTERVAL 7 DAY
  WHEN 'view'     THEN INTERVAL 3 DAY
  ELSE INTERVAL 14 DAY END"""


def _curve_col():
    return (
        F.when(F.col("event_type") == "purchase", "step:240")
        .when(F.col("event_type") == "signup", "power_law:1.0")
        .when(F.col("event_type") == "click", "linear")
        .when(F.col("event_type") == "error", "step:120")
        .otherwise("exponential")
    )


@query(
    "decay_pass_events",
    f"""
    WITH mx AS (SELECT max(ts) AS now_ts FROM events),
    s AS (
      SELECT e.event_id,
             least(e.value / 100.0, 1.0) AS imp,
             ((epoch_us(mx.now_ts) - epoch_us(e.ts)) / 1000000.0) / 3600.0 AS age_h,
             len(e.props) % 10 AS access_count,
             {_CURVE_CASE_SQL} AS fn
      FROM events e CROSS JOIN mx),
    c AS (
      SELECT event_id, imp, access_count, fn, age_h,
             CASE
               WHEN fn = 'linear' THEN greatest(0.0, 1.0 - {P.DECAY_RATE} * age_h)
               WHEN fn = 'step:240' THEN CASE WHEN age_h < 240.0 THEN 1.0 ELSE 0.5 END
               WHEN fn = 'step:120' THEN CASE WHEN age_h < 120.0 THEN 1.0 ELSE 0.5 END
               WHEN fn = 'power_law:1.0' THEN pow(1.0 + age_h, -1.0)
               ELSE exp(-{P.DECAY_RATE} * age_h)
             END AS curve
      FROM s),
    eff AS (
      SELECT event_id,
             round(least(greatest(imp * curve + 0.05 * ln(1.0 + access_count), 0.0), 1.0), 6)
               AS eff_importance
      FROM c)
    SELECT event_id, eff_importance,
           CASE WHEN eff_importance < {P.FORGET_BELOW} THEN 'forgotten'
                WHEN eff_importance < {P.ARCHIVE_BELOW} THEN 'archived'
                ELSE 'active' END AS new_state
    FROM eff
    """,
)
def decay_pass_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """run_decay_pass (SURVEY F8 + lifecycle.rs:108-155): per-record
    4-curve effective importance + archive/forget state transitions,
    one shuffle-free projection."""
    e = _t(spark, sf_dir, "events")
    now = e.agg(F.max("ts").alias("now_ts"))
    j = e.crossJoin(F.broadcast(now)).select(
        "event_id",
        "ts",
        F.col("now_ts"),
        F.least(F.col("value") / 100.0, F.lit(1.0)).alias("imp"),
        (F.length("props") % 10).alias("access_count"),
        _curve_col().alias("fn"),
    )
    out = decay_pass(
        j,
        importance=F.col("imp"),
        ts=F.col("ts"),
        now=F.col("now_ts"),
        access_count=F.col("access_count"),
        decay_rate=F.lit(P.DECAY_RATE),
        decay_function=F.col("fn"),
        archive_below=P.ARCHIVE_BELOW,
        forget_below=P.FORGET_BELOW,
    )
    return out.select("event_id", "eff_importance", "new_state")


@query(
    "reflection_archive_candidates_events",
    f"""
    WITH s AS (
      SELECT user_id, event_id,
             least(value / 100.0, 1.0) AS imp,
             ((epoch_us(TIMESTAMP '{P.AS_OF_TS}') - epoch_us(ts)) / 1000000.0) / 3600.0 AS age_h,
             len(props) % 3 AS access_count
      FROM events WHERE ts <= TIMESTAMP '{P.AS_OF_TS}'),
    eff AS (
      SELECT user_id, event_id, age_h, access_count,
             round(least(greatest(imp * exp(-0.01 * age_h)
                                  + 0.05 * ln(1.0 + access_count), 0.0), 1.0), 6)
               AS eff_importance
      FROM s)
    SELECT user_id, event_id, eff_importance
    FROM eff
    WHERE access_count = 0 AND age_h >= 168.0 AND eff_importance < 0.2
    """,
)
def reflection_archive_candidates_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reflection stage-5 stale archival (reflection.rs:272-301) as a
    relational program over the events corpus: exponential effective
    importance (rate 0.01/h, reflection defaults) + access boost,
    archive candidates = never-accessed rows at least a week old whose
    effective importance decayed under 0.2 at the as-of instant — the
    same predicate run_reflection_pass applies to the memories table."""
    from mnemo_spark.functions.decay import effective_importance

    e = _t(spark, sf_dir, "events")
    now_c = F.lit(P.AS_OF_TS).cast("timestamp")
    age_h = (
        (F.unix_micros(now_c) - F.unix_micros(F.col("ts"))).cast("double") / 1.0e6
    ) / 3600.0
    eff = effective_importance(
        F.least(F.col("value") / 100.0, F.lit(1.0)),
        F.col("ts"),
        now_c,
        F.length("props") % 3,
        F.lit(None),
        F.lit(None),
    )
    return (
        e.filter(F.col("ts") <= now_c)
        .select(
            "user_id",
            "event_id",
            (F.length("props") % 3).alias("_ac"),
            age_h.alias("_age"),
            F.round(eff, 6).alias("eff_importance"),
        )
        .filter((F.col("_ac") == 0) & (F.col("_age") >= 168.0) & (F.col("eff_importance") < 0.2))
        .select("user_id", "event_id", "eff_importance")
    )


@query(
    "ttl_sweep_events",
    f"""
    WITH mx AS (SELECT max(ts) AS now_ts FROM events),
    x AS (SELECT e.event_id, e.user_id, e.ts + {_TTL_CASE_SQL} AS expires_at, mx.now_ts
          FROM events e CROSS JOIN mx)
    SELECT user_id, count(*) AS n_expired, max(expires_at) AS last_expiry
    FROM x WHERE expires_at <= now_ts GROUP BY user_id
    """,
)
def ttl_sweep_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """run_ttl_sweep (SURVEY T2/P6): per-type TTL assignment at write
    (T3's working-tier auto-TTL generalized), sweep of expired rows,
    summarized per user (production MERGE-deletes the row set)."""
    e = _t(spark, sf_dir, "events")
    now = e.agg(F.max("ts").alias("now_ts"))
    ttl = (
        F.when(F.col("event_type") == "purchase", F.expr("INTERVAL 60 DAY"))
        .when(F.col("event_type") == "signup", F.expr("INTERVAL 45 DAY"))
        .when(F.col("event_type") == "click", F.expr("INTERVAL 7 DAY"))
        .when(F.col("event_type") == "view", F.expr("INTERVAL 3 DAY"))
        .otherwise(F.expr("INTERVAL 14 DAY"))
    )
    j = e.crossJoin(F.broadcast(now)).withColumn("expires_at", F.col("ts") + ttl)
    doomed = ttl_sweep(
        j, F.col("expires_at"), F.col("now_ts"), ["event_id", "user_id"]
    )
    return doomed.groupBy("user_id").agg(
        F.count("*").alias("n_expired"), F.max("expired_at").alias("last_expiry")
    )


@query(
    "dedup_clusters_docs",
    f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                    range(1, greatest(len(toks) - {P.JACCARD_SHINGLE_K - 2}, 1)),
                    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shs
           FROM tok),
    e0 AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    dfr AS (SELECT s FROM e0 GROUP BY s HAVING count(*) <= {P.JACCARD_MAX_DF}),
    e AS (SELECT e0.doc_id, e0.s FROM e0 JOIN dfr USING (s)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
              FROM e a JOIN e b USING (s) WHERE a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      WHERE n * 1.0 / (sa.sz + sb.sz - n) >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e2.dst FROM reach JOIN edges e2 ON reach.r = e2.src),
    lbl AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
    SELECT cluster, count(*) AS n_members,
           string_agg(node::VARCHAR, '|' ORDER BY node) AS member_ids
    FROM lbl GROUP BY cluster HAVING count(*) >= 2
    """,
)
def dedup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidation clustering (SURVEY A5, lifecycle.rs:199-398):
    connected components over the near-duplicate pair graph via
    iterative min-label propagation, then the per-cluster rollup that
    becomes the consolidated Semantic record."""
    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, 0.5, P.JACCARD_SHINGLE_K, max_df=P.JACCARD_MAX_DF)
    labels = connected_components(pairs, "id_a", "id_b")
    return consolidate_clusters(labels).select(
        "cluster",
        "n_members",
        F.array_join(
            F.transform("member_ids", lambda x: x.cast("string")), "|"
        ).alias("member_ids"),
    )


@query(
    "dup_representative_docs",
    f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                    range(1, greatest(len(toks) - {P.JACCARD_SHINGLE_K - 2}, 1)),
                    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shs
           FROM tok),
    e0 AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    dfr AS (SELECT s FROM e0 GROUP BY s HAVING count(*) <= {P.JACCARD_MAX_DF}),
    e AS (SELECT e0.doc_id, e0.s FROM e0 JOIN dfr USING (s)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
              FROM e a JOIN e b USING (s) WHERE a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      WHERE n * 1.0 / (sa.sz + sb.sz - n) >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e2.dst FROM reach JOIN edges e2 ON reach.r = e2.src),
    lbl AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
    scored AS (SELECT l.node, l.cluster, length(d.text) AS text_len
               FROM lbl l JOIN documents d ON l.node = d.doc_id),
    rk AS (SELECT node, cluster, text_len,
                  row_number() OVER (PARTITION BY cluster
                                     ORDER BY text_len DESC, node) AS r
           FROM scored)
    SELECT cluster,
           min(CASE WHEN r = 1 THEN node END) AS rep_id,
           max(CASE WHEN r = 1 THEN text_len END) AS rep_len,
           CAST(count(*) AS BIGINT) AS n_members,
           string_agg(CASE WHEN r > 1 THEN node::VARCHAR END, '|'
                      ORDER BY node) AS dropped_ids
    FROM rk GROUP BY cluster
    """,
)
def dup_representative_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster representative selection — the keep-best step
    that turns dedup CLUSTERS into a deduplicated CORPUS (the
    reference consolidates members into one Semantic record,
    lifecycle.rs:199-398; a training pipeline instead keeps the most
    complete member and drops the rest).

    Representative = longest text, doc_id ascending as tiebreak —
    deterministic and SQL-reproducible. Shape: the same pair graph +
    connected components as `dedup_clusters_docs`, then ONE window
    (partitioned by cluster — parallel across clusters, a cluster is
    never bigger than its dup group) and a groupBy on the SAME key, so
    the rank and the rollup reuse one exchange. The corpus-sized side
    only ever joins on doc_id; nothing all-pairs, nothing global."""
    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, 0.5, P.JACCARD_SHINGLE_K, max_df=P.JACCARD_MAX_DF
    )
    labels = connected_components(pairs, "id_a", "id_b")
    scored = labels.join(
        docs.select(
            F.col("doc_id").alias("node"),
            F.length("text").cast("long").alias("text_len"),
        ),
        "node",
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("text_len"), F.asc("node"))
    ranked = scored.withColumn("_r", F.row_number().over(w))
    return ranked.groupBy("cluster").agg(
        F.min(F.when(F.col("_r") == 1, F.col("node"))).alias("rep_id"),
        F.max(F.when(F.col("_r") == 1, F.col("text_len"))).alias("rep_len"),
        F.count("*").alias("n_members"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.when(F.col("_r") > 1, F.col("node")))),
                lambda x: x.cast("string"),
            ),
            "|",
        ).alias("dropped_ids"),
    )


@query(
    "causality_trace_events",
    """
    WITH RECURSIVE p AS (
      SELECT event_id,
             lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS parent_event_id
      FROM events),
    seeds AS (SELECT e.event_id FROM events e WHERE e.event_type = 'error'),
    walk(event_id, depth) AS (
      SELECT event_id, 0 FROM seeds
      UNION ALL
      SELECT p.parent_event_id, walk.depth + 1
      FROM walk JOIN p ON p.event_id = walk.event_id
      WHERE walk.depth < 3 AND p.parent_event_id IS NOT NULL)
    SELECT event_id, min(depth) AS depth FROM walk GROUP BY event_id
    """,
)
def causality_trace_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causality trace (SURVEY J7, query/causality.rs): ancestor walk
    over a parent-pointer DAG (parent = previous event of the same
    user), ≤3 levels, min-depth dedup.

    The parent edge IS `lag(event_id)` over the user sequence, so the
    k-hop ancestor chain is exactly `lag(event_id, d)` for d ≤ k: the
    whole iterative walk collapses into ONE window projection +
    posexplode + min-depth groupBy — two shuffles total, no per-hop
    join cascade. (The general-graph form stays in operators/graph.py
    `trace_causality` for DAGs that aren't sequence-derived.)"""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    anc = e.select(
        "event_id",
        "event_type",
        *[F.lag("event_id", d).over(w).alias(f"_a{d}") for d in (1, 2, 3)],
    ).filter(F.col("event_type") == "error")
    walk = anc.select(
        F.posexplode(
            F.array(F.col("event_id"), F.col("_a1"), F.col("_a2"), F.col("_a3"))
        ).alias("_depth", "_eid")
    ).filter(F.col("_eid").isNotNull())
    return (
        walk.groupBy("_eid")
        .agg(F.min("_depth").alias("depth"))
        .select(F.col("_eid").alias("event_id"), "depth")
    )


from mnemo_spark.operators.lifecycle import ewma_by_key  # noqa: E402

_EWMA_ALPHA = 0.3


@query(
    "ewma_user_values",
    f"""
    WITH RECURSIVE r AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 50),
    f(user_id, rn, event_id, s) AS (
      SELECT user_id, rn, event_id,
             floor(value * 1000000.0 + 0.5) / 1000000.0
      FROM r WHERE rn = 1
      UNION ALL
      SELECT r.user_id, r.rn, r.event_id,
             floor(({_EWMA_ALPHA} * r.value + (1.0 - {_EWMA_ALPHA}) * f.s)
                   * 1000000.0 + 0.5) / 1000000.0
      FROM f JOIN r ON r.user_id = f.user_id AND r.rn = f.rn + 1)
    SELECT user_id, event_id, s AS ewma FROM f
    """,
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (operators/lifecycle.ewma_by_key):
    the sequential fold runs Arrow-batched per user — parallel across
    users, exact within — while the oracle walks the identical
    recursion as a recursive CTE. The carried state quantizes to 6dp
    each step on BOTH sides (a raw float fold drifts 1 ulp between
    engines via FMA contraction on long series)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    out = ewma_by_key(
        e, _EWMA_ALPHA, ["user_id"], ["ts", "event_id"], "value"
    )
    return out.select("user_id", "event_id", "ewma")
