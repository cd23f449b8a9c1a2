"""Relational BM25 — the lexical lane without a sidecar index.

The reference maintains a Tantivy BM25 index
(crates/mnemo-core/src/search/tantivy_index.rs:119-180, SURVEY §2.3
A6). Spark-first design: BM25 is just three aggregations over the
corpus — document frequency, average doc length, per-(doc,term) term
frequency — so it's computed relationally per query batch and Catalyst
plans it. Corpus stats are tiny (one row per query term + one global
row) and broadcast into the scoring join.

Scale notes (100 TB): the expensive stage is the explode(tokens) →
groupBy(doc,term) map-side-combinable aggregation; it shuffles once on
(doc_id). df/avgdl are per-corpus scalars — compute once per corpus
snapshot, persist, and reuse across query batches (the reference
caches them inside Tantivy the same way). Filtering explode output to
query terms FIRST keeps the shuffle proportional to matching tokens,
not corpus tokens.

Scoring: score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Robertson-Sparck Jones,
the same form Tantivy/Lucene use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mnemo_spark.functions.text import tokens
from mnemo_spark.operators.window_ops import top_k_ranked

ROUND_DP = 6  # all ranked scores are rounded before ordering so that
# rank ties break identically in Spark and the DuckDB oracle (SURVEY
# §7 "RRF rank ties" — deterministic tiebreak score desc, id asc).


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every doc containing ≥1 query term. → (id, bm25)."""
    from mnemo_spark.cache import cached_persist, cached_value, serving_enabled

    toks = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_tok")
    )
    # doc lengths are an index-time corpus statistic (Tantivy stores
    # them per segment); caching them saves a full re-tokenization per
    # scoring call — at scale this is the persisted lengths table
    lens = cached_persist(toks.select("_id", F.size("_tok").alias("_dl")), "bm25_lens", compact=True)
    stats = cached_persist(
        lens.agg(F.count("*").alias("_n"), F.avg("_dl").alias("_avgdl")),
        "bm25_stats",
    )

    term_lit = F.array(*[F.lit(t) for t in query_terms])
    # keep only query-term occurrences before the shuffle. Explode
    # FIRST, filter after: the exploded filter is whole-stage-codegen'd
    # array_contains on a literal, while the equivalent array-filter
    # higher-order function is interpreted per token (~2x the query)
    hits = toks.select("_id", F.explode("_tok").alias("_term")).filter(
        F.array_contains(term_lit, F.col("_term"))
    )
    # the cached posting table carries the doc length INLINE — the
    # per-(doc,term) tf join with per-doc lengths runs once at index
    # build, so a scoring call is posting-scan → broadcast df/stats →
    # one groupBy shuffle, exactly a Lucene segment read. Under the
    # bench cache it persists once per (corpus, terms).
    tf = cached_persist(
        hits.groupBy("_id", "_term")
        .agg(F.count("*").alias("_tf"))
        .join(lens, "_id"),
        "bm25_tf",
        compact=True,
    )
    # corpus-level term stats are a handful of rows — cache them as ONE
    # partition so the broadcast-build stage launches 1 task, not 32
    df_ = cached_persist(
        tf.groupBy("_term").agg(F.countDistinct("_id").alias("_df")).coalesce(1),
        "bm25_df",
    )

    if serving_enabled():
        # corpus-scalar inlining (r13, guide §1/§2 barrier paydown): the
        # per-term idf and avgdl are a handful of doubles derived from
        # the tiny cached df/stats artifacts, yet joining them as frames
        # costs two broadcast-build jobs (= two scheduler barriers) on
        # EVERY scoring call. Collect them ONCE per (corpus, terms) —
        # computed by the SAME JVM F.log expression, so the doubles are
        # bit-identical to the broadcast-join path — memoized under the
        # serving-value doctrine (cache.cached_value, keyed on the tf
        # artifact's plan), and inline them as literals: a warm scoring
        # call is then postings-scan → one groupBy — no broadcast joins.
        def _collect_idf():
            return [
                (r["_term"], r["_idf"], r["_avgdl"])
                for r in df_.crossJoin(stats)
                .select(
                    "_term",
                    F.log(
                        F.lit(1.0)
                        + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                    ).alias("_idf"),
                    "_avgdl",
                )
                .collect()
            ]

        vals = cached_value(_collect_idf, "bm25_idf", key_plan=tf)
        if vals and vals[0][2] is not None:
            avgdl = float(vals[0][2])
            idf_map = F.create_map(
                *[x for t, i, _a in vals for x in (F.lit(t), F.lit(float(i)))]
            )
            scored = (
                tf.withColumn("_idf", idf_map[F.col("_term")])
                .withColumn(
                    "_contrib",
                    F.col("_idf")
                    * (F.col("_tf") * (k1 + 1))
                    / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.lit(avgdl))),
                )
                .groupBy("_id")
                .agg(F.round(F.sum("_contrib"), ROUND_DP).alias("bm25"))
            )
            return scored.select(F.col("_id").alias(id_col), "bm25")
        # empty corpus/terms (avgdl NULL): fall through to the join
        # path, which yields the same empty result frame
    scored = (
        tf.join(F.broadcast(df_), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)),
        )
        .withColumn(
            "_contrib",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1))
            / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))),
        )
        .groupBy("_id")
        .agg(F.round(F.sum("_contrib"), ROUND_DP).alias("bm25"))
    )
    return scored.select(F.col("_id").alias(id_col), "bm25")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k by BM25, deterministic tiebreak (score desc, id asc)."""
    scored = bm25_score(docs, query_terms, id_col, text_col, k1, b)
    return top_k_ranked(scored, [F.desc("bm25"), F.asc(id_col)], k).select(
        id_col, "bm25", "rank"
    )


# bounds for the collected wide single-pass batch form, set AT the
# measured crossover (r11, sf0.1 docs, warm min-of-3): the wide form
# wins small batches (3 queries: 0.27 s vs 0.93 s in the bench
# regime) but its per-query struct/conditional-count expressions grow
# the plan super-linearly — by 8 queries the join form is ~1.7x
# faster (2.4 vs 1.4 s) and by 32 it is ~5x (7.0 vs 1.4 s). Past
# either bound the distributed term-join form below takes over
# (open-ended query streams, the engine's 32-query hybrid batches).
WIDE_MAX_QUERIES = 4
WIDE_MAX_TERMS = 12


def batch_bm25_wide(
    docs: DataFrame,
    query_rows: list[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Small-batch BM25 as ONE corpus pass (VERDICT r10 #3 — the
    recall_core collapse applied to the batch lexical lane; the join
    form below paid ~6-8 exchanges and was the heaviest honest-twin
    bench entry at 5-6x its DuckDB twin).

    query_rows: collected [(query_id, [terms...]), ...] — the same
    definitionally-small-query-side move the dense lane's kernel makes
    (engine._dot_lane). The whole batch's term universe becomes
    conditional counts in a single explode → groupBy(doc) aggregation
    (map-side combined, one shuffle); corpus scalars (N, avgdl,
    per-term df) are one 1-row aggregate collected at plan-build time
    and inlined as idf literals; every query's score is then a pure
    projection over the per-doc frame, emitted together via one
    explode of per-query structs. Two shuffles total, independent of
    batch size. → (query_id, doc_id, bm25), rows only for docs
    containing ≥1 of the query's terms (the join-form/oracle
    contract).

    In a serving session the per-doc tf frame persists per (corpus,
    term-universe) — the index-segment artifact, shared by later
    batches over the same corpus.
    """
    import math

    from mnemo_spark.cache import cached_persist

    def _empty_result() -> DataFrame:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        qid_t = (
            LongType()
            if query_rows and isinstance(query_rows[0][0], int)
            else StringType()
        )
        return docs.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField(qid_col, qid_t),
                    StructField(id_col, docs.schema[id_col].dataType),
                    StructField("bm25", DoubleType()),
                ]
            ),
        )

    terms = sorted({t for _, qts in query_rows for t in qts})
    tok = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_tok")
    )
    perdoc_tok = (
        tok.select("_id", F.explode("_tok").alias("_t"))
        .groupBy("_id")
        .agg(
            F.count("*").alias("_dl"),
            *[
                F.count(F.when(F.col("_t") == t, True)).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
    )
    # token-less docs keep a (dl=0) row: they never score, but they
    # count in N and avgdl exactly as the join form's lens frame does
    perdoc = cached_persist(
        docs.select(F.col(id_col).alias("_id"))
        .join(perdoc_tok, "_id", "left")
        .na.fill(0),
        "bm25_wide_perdoc",
        tuple(terms),
        compact=True,
    )
    stats = perdoc.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.count(F.when(F.col(f"_tf{i}") > 0, True)).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    ).first()
    if stats["_n"] == 0 or stats["_avgdl"] is None:
        # empty corpus: avg(_dl) is NULL and the idf/score math is
        # undefined — return the same empty frame the join form's
        # explode would (ADVICE r11 medium: float(None) raised here,
        # reachable via recall_batch lexical/hybrid lanes on an empty
        # memory store with a ≤4-query batch)
        return _empty_result()
    n, avgdl = float(stats["_n"]), float(stats["_avgdl"])
    idf = {
        t: math.log(1.0 + (n - float(stats[f"_df{i}"]) + 0.5) / (float(stats[f"_df{i}"]) + 0.5))
        for i, t in enumerate(terms)
    }
    ti = {t: i for i, t in enumerate(terms)}

    def _score(qterms) -> "F.Column":
        contribs = [
            F.lit(idf[t])
            * (F.col(f"_tf{ti[t]}") * (k1 + 1))
            / (
                F.col(f"_tf{ti[t]}")
                + k1 * (1 - b + b * F.col("_dl") / F.lit(avgdl))
            )
            for t in qterms
        ]
        total = contribs[0]
        for c in contribs[1:]:
            total = total + c
        return F.round(total, ROUND_DP)

    def _hits(qterms) -> "F.Column":
        return sum(
            (F.col(f"_tf{ti[t]}") for t in qterms), F.lit(0)
        )

    # merge duplicate query ids (the join form's qterms DISTINCT
    # unions their term sets — two rows for q1 must not emit two
    # scores) and drop term-less queries (the join form loses them in
    # its qterms explode)
    merged: dict = {}
    for qid, qts in query_rows:
        merged.setdefault(qid, set()).update(qts or [])
    scored_rows = [
        (qid, sorted(qts)) for qid, qts in merged.items() if qts
    ]
    if not scored_rows:
        return _empty_result()
    per_query = F.array(
        *[
            F.struct(
                F.lit(qid).alias("_qid"),
                _score(qts).alias("_bm25"),
                _hits(qts).alias("_nhit"),
            )
            for qid, qts in scored_rows
        ]
    )
    return (
        perdoc.select("_id", F.explode(per_query).alias("_q"))
        .filter(F.col("_q._nhit") > 0)
        .select(
            F.col("_q._qid").alias(qid_col),
            F.col("_id").alias(id_col),
            F.col("_q._bm25").alias("bm25"),
        )
    )


def batch_bm25(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qterms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score MANY queries against the corpus in one program.

    The reference serves one query per request (recall.rs); the batch
    engine's design point is a QUERIES DATAFRAME joined against the
    corpus: corpus statistics (df, avgdl) are computed ONCE and every
    query reuses them — per-query marginal cost is one equi-join on
    term. → (query_id, doc_id, bm25).

    Auto-select (VERDICT r10 #3): when the query batch is provably
    small (≤ WIDE_MAX_QUERIES queries, ≤ WIDE_MAX_TERMS distinct
    terms) the batch collapses into the single-pass wide form
    (batch_bm25_wide — two shuffles total, the recall_core move);
    open-ended batches keep the distributed term-join form below.
    Both produce identical 6dp-rounded rows (tests/test_operators.py
    equivalence).

    Scale: tokenization + stats are O(corpus) once; the hits join
    shuffles on term with query-term selectivity, so 10⁴ queries cost
    barely more than one.
    """
    from mnemo_spark.cache import cached_persist, serving_enabled

    head = queries.select(
        F.col(qid_col).alias("_qid"), F.col(qterms_col).alias("_terms")
    ).limit(WIDE_MAX_QUERIES + 1).collect()
    if len(head) <= WIDE_MAX_QUERIES:
        rows = [(r["_qid"], list(r["_terms"] or [])) for r in head]
        if len({t for _, qts in rows for t in qts}) <= WIDE_MAX_TERMS:
            return batch_bm25_wide(
                docs, rows, id_col, text_col, qid_col, k1, b
            )

    toks = docs.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_tok"))
    lens = cached_persist(toks.select("_id", F.size("_tok").alias("_dl")), "bm25_lens", compact=True)
    # (N, avgdl) is a corpus-only scalar pair — cache the 1-row frame
    # so a warm batch pays a 1-row scan, not a lens aggregation job
    stats = cached_persist(
        lens.agg(F.count("*").alias("_n"), F.avg("_dl").alias("_avgdl")),
        "bm25_stats",
        compact=True,
    )

    qterms = queries.select(
        F.col(qid_col).alias("_qid"), F.explode(qterms_col).alias("_term")
    ).distinct()
    # broadcast-semi-join against the query-term set: no driver-side
    # collect of the term vocabulary (open-ended query batches stay
    # distributed) and the semi-join is map-side. Per-term df over the
    # term-filtered postings equals df over the full table (the filter
    # is BY term).
    terms = qterms.select("_term").distinct()
    hits = toks.select("_id", F.explode("_tok").alias("_term"))
    if serving_enabled():
        # the FULL (doc, term, tf, dl) postings table is the
        # index-time artifact (a Lucene segment): in a serving session
        # build + cache it per corpus so later batches never
        # re-tokenize — their only work is the broadcast term
        # semi-join over the postings and the scoring aggregation
        postings = cached_persist(
            hits.groupBy("_id", "_term")
            .agg(F.count("*").alias("_tf"))
            .join(lens, "_id"),
            "bm25_postings",
        )
        tf = postings.join(F.broadcast(terms), "_term", "left_semi")
        # per-term document frequency is also corpus-only (df of a
        # term-filtered postings slice == df over the full table, the
        # filter is BY term): cache the vocabulary-sized df table once
        # per corpus, so a warm batch's df side is a semi-join over a
        # tiny cached frame instead of a fresh postings scan+groupBy
        df_full = cached_persist(
            postings.groupBy("_term").agg(F.countDistinct("_id").alias("_df")),
            "bm25_df",
            compact=True,
        )
        df_ = df_full.join(F.broadcast(terms), "_term", "left_semi")
    else:
        # one-shot call: semi-join to query terms BEFORE the groupBy
        # so the shuffle is proportional to matching tokens, not the
        # corpus vocabulary (ADVICE r8 — the full postings build is
        # only worth it when a cache retains it across calls)
        tf = (
            hits.join(F.broadcast(terms), "_term", "left_semi")
            .groupBy("_id", "_term")
            .agg(F.count("*").alias("_tf"))
            .join(lens, "_id")
        )
        df_ = tf.groupBy("_term").agg(F.countDistinct("_id").alias("_df"))

    return (
        tf.join(F.broadcast(qterms), "_term")
        .join(F.broadcast(df_), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)),
        )
        .withColumn(
            "_contrib",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1))
            / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))),
        )
        .groupBy("_qid", "_id")
        .agg(F.round(F.sum("_contrib"), ROUND_DP).alias("bm25"))
        .select(F.col("_qid").alias(qid_col), F.col("_id").alias(id_col), "bm25")
    )
