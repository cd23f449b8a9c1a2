"""Embedding-pipeline queries: deterministic hash-bag embedder (F5),
IVF approximate ANN (J6 scale path #2), and embedding-cosine
near-duplicate pairs (J5 — the reference's conflict candidate
detection, query/conflict.rs:84-151).

Together with vector_topk / ann_lsh_topk / knn_label_vote in the core
registry these cover the similarity-search surface end to end:
exact brute force → sign-LSH → IVF, plus the embedder that produces
vectors in the first place.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mnemo_spark import params as P
from mnemo_spark.functions.embedder import hash_bag_embedding
from mnemo_spark.operators.vector import cosine_pairs, ivf_topk
from mnemo_spark.registry import _t, query

_QIDS = ", ".join(str(i) for i in P.VECTOR_QUERY_IDS)
_CIDS = ", ".join(str(i) for i in P.IVF_CENTROID_IDS)

_COS = (
    "round(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)
_COS_RAW = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@query(
    "hash_bag_embedding_docs",
    f"""
    WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
                 FROM documents),
    b AS (SELECT doc_id,
                 CAST(('0x' || substr(md5(t), 1, 6))::BIGINT % {P.HASHBAG_DIM} AS INT) AS bucket
          FROM tok),
    cnt AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY doc_id, bucket),
    n AS (SELECT doc_id, sqrt(sum(c * c)) AS l2 FROM cnt GROUP BY doc_id)
    SELECT cnt.doc_id, cnt.bucket, round(cnt.c / n.l2, 6) AS weight
    FROM cnt JOIN n USING (doc_id)
    """,
)
def hash_bag_embedding_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bag embedding (SURVEY F5,
    embedding/mod.rs:68-114): md5-prefix token buckets, L2-normalized,
    sparse long form — the engine's reproducible fallback embedder."""
    return hash_bag_embedding(
        _t(spark, sf_dir, "documents"), P.HASHBAG_DIM, "doc_id", "text"
    )


@query(
    "embed_batch_docs",
    f"""
    WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
                 FROM documents),
    b AS (SELECT doc_id,
                 CAST(('0x' || substr(md5(t), 1, 6))::BIGINT % {P.HASHBAG_DIM} AS INT) AS bucket
          FROM tok),
    cnt AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY doc_id, bucket),
    n AS (SELECT doc_id, sqrt(sum(c * c)) AS l2 FROM cnt GROUP BY doc_id)
    SELECT cnt.doc_id, cnt.bucket, round(cnt.c / n.l2, 6) AS weight
    FROM cnt JOIN n USING (doc_id)
    """,
)
def embed_batch_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 batch-embedder interface driven end to end: the mapInPandas
    provider path (embed_batch + HashBagEmbedder, the pluggable-model
    plumbing of embedding/onnx.rs / openai.rs) produces dense vectors,
    exploded here to sparse long form and proven bit-identical to the
    relational hash-bag oracle."""
    from mnemo_spark.functions.embed_batch import HashBagEmbedder, embed_batch
    from mnemo_spark.io import spread_table

    # the mapInPandas embedder is one Python worker per input partition
    # and the cached documents table is a single scan split — read via
    # the core-count-partitioned cached twin so the Arrow kernel runs
    # on every core (r13, guide §2.5/§4 — identity at scale)
    docs = spread_table(spark, sf_dir, "documents").select("doc_id", "text")
    dense = embed_batch(docs, HashBagEmbedder(P.HASHBAG_DIM), "text", "_vec")
    return (
        dense.select("doc_id", F.posexplode("_vec").alias("bucket", "weight"))
        .filter(F.col("weight") != 0.0)
        .select(
            "doc_id",
            "bucket",
            F.round(F.col("weight").cast("double"), 6).alias("weight"),
        )
    )


@query(
    "cluster_maturity_embeddings",
    f"""
    WITH m AS (
      SELECT label, vec_id, embedding::DOUBLE[] AS v,
             vec_id % 5 AS ac, vec_id % 4 AS dg,
             ((epoch_us(TIMESTAMP '{P.AS_OF_TS}')
               - (epoch_us(TIMESTAMP '2024-01-01 00:00:00') + vec_id * 60000000))
              / 1000000.0) / 3600.0 AS age_h
      FROM embeddings),
    comp AS (
      SELECT label, count(*) AS n_members,
             round(avg(exp(-{math.log(2.0) / 72.0!r} * age_h)), 6) AS recency,
             round(least(avg(ln(1.0 + ac)) / ln(9.0), 1.0), 6) AS hit_success,
             round(least(avg(dg) / 6.0, 1.0), 6) AS edge_degree
      FROM m GROUP BY label),
    red AS (
      SELECT a.label,
             round(least(greatest(avg({_COS.format(a='a.v', b='b.v')}), 0.0), 1.0), 6)
               AS redundancy
      FROM m a JOIN m b ON a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY a.label),
    scored AS (
      SELECT c.label, c.n_members, c.recency, c.hit_success, c.edge_degree,
             coalesce(r.redundancy, 0.5) AS redundancy
      FROM comp c LEFT JOIN red r USING (label))
    SELECT label, n_members, recency, hit_success, edge_degree, redundancy,
           round(least(greatest(0.25 * recency + 0.30 * hit_success
                                + 0.20 * edge_degree + 0.25 * redundancy,
                                0.0), 1.0), 6) AS combined
    FROM scored
    """,
)
def cluster_maturity_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-maturity scoring (SURVEY A7, maturity.rs:52-230) over
    the embeddings corpus: label groups as clusters, deterministic
    pseudo access/degree columns, all four components + the combined
    weight-normalised score through the real cluster_maturity
    operator (the same program run_consolidation gates on)."""
    from mnemo_spark.operators.maturity import cluster_maturity

    emb = _t(spark, sf_dir, "embeddings")
    base_us = int(
        __import__("datetime")
        .datetime(2024, 1, 1)
        .replace(tzinfo=__import__("datetime").timezone.utc)
        .timestamp()
        * 1_000_000
    )
    members = emb.select(
        F.col("label").alias("cluster"),
        F.col("vec_id").alias("id"),
        F.timestamp_micros(
            F.lit(base_us) + F.col("vec_id").cast("long") * 60_000_000
        ).alias("last_accessed_at"),
        (F.col("vec_id") % 5).alias("access_count"),
        (F.col("vec_id") % 4).alias("degree"),
        F.col("embedding"),
    )
    out = cluster_maturity(
        members, P.AS_OF_TS, degree_col="degree", hit_saturation=8.0
    )
    return out.select(
        F.col("cluster").alias("label"),
        "n_members",
        "recency",
        "hit_success",
        "edge_degree",
        "redundancy",
        "combined",
    )


@query(
    "ivf_ann_topk",
    f"""
    WITH cent AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cvec
                  FROM embeddings WHERE vec_id IN ({_CIDS})),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT c.vec_id, cent.cent_id,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY {_COS_RAW.format(a='c.v', b='cent.cvec')} DESC,
                                           cent.cent_id) AS rn
        FROM c CROSS JOIN cent)
      WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id IN ({_QIDS})),
    probe AS (
      SELECT query_id, cent_id, qv FROM (
        SELECT q.query_id, cent.cent_id, q.qv,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_COS_RAW.format(a='q.qv', b='cent.cvec')} DESC,
                                           cent.cent_id) AS rn
        FROM q CROSS JOIN cent)
      WHERE rn <= {P.IVF_NPROBE}),
    s AS (SELECT p.query_id, a.vec_id,
                 {_COS.format(a='c.v', b='p.qv')} AS cos_sim
          FROM probe p JOIN assign a USING (cent_id) JOIN c ON c.vec_id = a.vec_id)
    SELECT query_id, vec_id, cos_sim, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id) AS rank FROM s)
    WHERE rank <= {P.VECTOR_TOPK}
    """,
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate ANN (SURVEY J6 scale path): nearest-centroid
    cell assignment + nprobe-cell probing — at scale the corpus is
    partitioned by cell so probes prune I/O, not just compute."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(P.VECTOR_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    centroids = emb.filter(F.col("vec_id").isin(P.IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    return ivf_topk(emb, queries, centroids, P.IVF_NPROBE, P.VECTOR_TOPK)


@query(
    "cosine_near_dup_embeddings",
    f"""
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS.format(a='a.v', b='b.v')} AS cos_sim
    FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS.format(a='a.v', b='b.v')} >= {P.COSINE_DUP_THRESHOLD}
    """,
)
def cosine_near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (SURVEY J5,
    query/conflict.rs:84-151): same-group self-join — the reference
    scopes to same agent; here the label column bounds the quadratic
    term exactly the way agent_id does at scale."""
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_pairs(
        emb, P.COSINE_DUP_THRESHOLD, "vec_id", "embedding", group_col="label"
    )


@query(
    "conflict_resolution_embeddings",
    f"""
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, round(sqrt(list_dot_product(v, v)), 6) AS nrm FROM c),
    pairs AS (SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b
              FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE {_COS.format(a='a.v', b='b.v')} >= {P.COSINE_DUP_THRESHOLD})
    SELECT p.label, p.id_a, p.id_b,
           CASE WHEN na.nrm >= nb.nrm THEN p.id_b ELSE p.id_a END AS loser_id
    FROM pairs p
    JOIN n na ON p.id_a = na.vec_id
    JOIN n nb ON p.id_b = nb.vec_id
    """,
)
def conflict_resolution_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conflict RESOLUTION as a relational program (conflict.rs:154-260
    keep_highest_importance): detected near-dup pairs, importance stood
    in by the embedding norm, the winner keeps (a wins ties via the
    deterministic id_a < id_b pair order) and the loser id is what a
    soft-delete join would consume — the same join algebra
    MnemoSparkEngine.resolve_conflicts runs on the memories table."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = cosine_pairs(
        emb, P.COSINE_DUP_THRESHOLD, "vec_id", "embedding", group_col="label"
    ).select("label", "id_a", "id_b")
    nrm = emb.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("embedding").cast("array<double>"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            6,
        ).alias("nrm"),
    )
    return (
        pairs.join(nrm.select(F.col("vec_id").alias("id_a"), F.col("nrm").alias("_na")), "id_a")
        .join(nrm.select(F.col("vec_id").alias("id_b"), F.col("nrm").alias("_nb")), "id_b")
        .select(
            "label",
            "id_a",
            "id_b",
            F.when(F.col("_na") >= F.col("_nb"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("loser_id"),
        )
    )


# ---------------------------------------------------------------------------
# PQ ANN (operators/pq.py) — the compressed-vector scale path
# ---------------------------------------------------------------------------

_DSUB = 64 // P.PQ_M


@query(
    "pq_ann_topk",
    f"""
    WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                 WHERE embedding IS NOT NULL),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nn FROM raw),
    u AS (SELECT vec_id,
                 list_transform(v, x -> x / nn) AS v
          FROM n WHERE nn > 0),
    ms AS (SELECT unnest(range(0, {P.PQ_M})) AS m),
    -- codebook: sub-vectors of the first {P.PQ_KSUB} ids; centroid
    -- INDEX == vec_id because ids 0..{P.PQ_KSUB - 1} sort to positions 0..{P.PQ_KSUB - 1}
    bs AS (SELECT vec_id AS c, ms.m,
                  v[ms.m * {_DSUB} + 1 : ms.m * {_DSUB} + {_DSUB}] AS cs
           FROM u CROSS JOIN ms WHERE vec_id < {P.PQ_KSUB}),
    vs AS (SELECT vec_id, ms.m,
                  v[ms.m * {_DSUB} + 1 : ms.m * {_DSUB} + {_DSUB}] AS s
           FROM u CROSS JOIN ms),
    enc AS (SELECT vec_id, m, c AS code FROM (
              SELECT vs.vec_id, vs.m, bs.c,
                     row_number() OVER (
                       PARTITION BY vs.vec_id, vs.m
                       ORDER BY list_dot_product(bs.cs, bs.cs)
                                - 2 * list_dot_product(vs.s, bs.cs),
                                bs.c) AS rn
              FROM vs JOIN bs USING (m))
            WHERE rn = 1),
    qs AS (SELECT vec_id AS query_id, m, s FROM vs
           WHERE vec_id IN ({", ".join(str(i) for i in P.VECTOR_QUERY_IDS)})),
    t AS (SELECT q.query_id, b.m, b.c,
                 list_dot_product(q.s, q.s)
                 - 2 * list_dot_product(q.s, b.cs)
                 + list_dot_product(b.cs, b.cs) AS d
          FROM qs q JOIN bs b USING (m)),
    dist AS (SELECT t.query_id, e.vec_id, round(sum(t.d), 6) AS adc_dist
             FROM enc e JOIN t ON t.m = e.m AND t.c = e.code
             GROUP BY t.query_id, e.vec_id)
    SELECT query_id, vec_id, adc_dist, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_dist, vec_id) AS rank
          FROM dist)
    WHERE rank <= {P.VECTOR_TOPK}
    """,
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization top-k (operators/pq.py; the reference's
    USearch quantization axis, index/usearch.rs): vectors compress to
    {m}×4-bit codes, queries score by asymmetric distance over
    driver-built lookup tables. The oracle re-derives codebook,
    encoding, ADC tables and ranking in pure SQL — the approximation
    itself is deterministic, so it IS contractable; recall-vs-exact is
    measured separately by tools/eval_ann.py.
    """
    from mnemo_spark.operators.pq import pq_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=P.PQ_M, ksub=P.PQ_KSUB)
    queries = emb.filter(F.col("vec_id").isin(P.VECTOR_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return pq_topk(emb, queries, books, k=P.VECTOR_TOPK)


@query(
    "kmeans_step_embeddings",
    f"""
    WITH cent AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cvec
                  FROM embeddings WHERE vec_id IN ({_CIDS})),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE embedding IS NOT NULL),
    assign AS (
      SELECT vec_id, cent_id, v FROM (
        SELECT c.vec_id, cent.cent_id, c.v,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY {_COS_RAW.format(a='c.v', b='cent.cvec')} DESC,
                                           cent.cent_id) AS rn
        FROM c CROSS JOIN cent)
      WHERE rn = 1),
    dims AS (SELECT unnest(range(1, 65)) AS d)
    SELECT cent_id, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_members,
           round(avg(v[CAST(d AS INT)]) FILTER (WHERE d = 1), 6) AS mean_d1,
           round(avg(v[CAST(d AS INT)]) FILTER (WHERE d = 64), 6) AS mean_d64
    FROM assign CROSS JOIN dims
    GROUP BY cent_id
    """,
)
def kmeans_step_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration (assign → recompute means) — the iterative-
    algorithm shape behind IVF codebook training, kept to a single
    oracle-checkable step (a full k-means run is just this step under
    a driver loop; each step is one broadcast-assign + one groupBy).
    Outputs per-cell membership and the first/last mean dimensions so
    the 64-wide mean vector stays row-sized for the compare."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    centroids = emb.filter(F.col("vec_id").isin(P.IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    from mnemo_spark.operators.vector import assign_cells

    assigned = assign_cells(emb, centroids)
    means = assigned.groupBy("cent_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg(F.element_at(F.col("embedding").cast("array<double>"), 1)), 6).alias("mean_d1"),
        F.round(F.avg(F.element_at(F.col("embedding").cast("array<double>"), 64)), 6).alias("mean_d64"),
    )
    return means
