"""Deterministic hash-bag text embedder (reference F5,
embedding/mod.rs:68-114: token→bucket hash counts, L2-normalized).

The reference's deterministic fallback embedder hashes each token to
one of `dim` buckets and L2-normalizes the count vector — exactly the
HashingTF→Normalizer pipeline, but expressed relationally so the
embedding is reproducible bit-for-bit in ANY engine (the bucket hash
is md5-prefix mod dim, not a JVM-specific hash): the cross-engine
portability the reference gets from FNV-1a.

Long-form output (doc, bucket, weight) rather than a dense array:
sparse is the natural relational shape, joins/aggregations consume it
directly (e.g. sparse cosine = sum of weight products on bucket), and
at 100 TB the explode→groupBy is one map-side-combinable shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mnemo_spark.functions.text import tokens

ROUND_DP = 6


def token_bucket(tok, dim: int):
    """Deterministic bucket in [0, dim): first 6 md5 hex digits mod dim.

    Portable across engines (Spark `conv`, DuckDB hex cast) unlike
    `F.hash` (Murmur3, JVM-specific).
    """
    return (
        F.conv(F.substring(F.md5(tok), 1, 6), 16, 10).cast("bigint") % dim
    ).cast("int")


def hash_bag_embedding(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse L2-normalized hash-bag embedding.

    → (id, bucket, weight) with Σ weight² = 1 per doc; docs with no
    tokens produce no rows (the reference's no-op-embedder fail-loud
    analog: absence is detectable).
    """
    from mnemo_spark.cache import cached_persist

    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_t")
    )
    cnt = (
        tok.withColumn("bucket", token_bucket(F.col("_t"), dim))
        .groupBy("_id", "bucket")
        .agg(F.count("*").alias("_c"))
    )
    w = Window.partitionBy("_id")
    out = (
        cnt.withColumn("_l2", F.sqrt(F.sum(F.col("_c") * F.col("_c")).over(w)))
        .select(
            F.col("_id").alias(id_col),
            "bucket",
            F.round(F.col("_c") / F.col("_l2"), ROUND_DP).alias("weight"),
        )
    )
    # the sparse embedding frame IS the vector index the reference
    # persists (USearch/pgvector); cache it per (corpus, dim) so every
    # consumer (hybrid recall cosine lane, embedding queries) reuses
    # one materialization instead of re-tokenizing the corpus
    return cached_persist(out, "hash_bag_emb", dim, compact=True)


def batch_hash_bag_cosine(
    docs: DataFrame,
    queries: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qterms_col: str = "terms",
) -> DataFrame:
    """Hash-bag cosine of MANY queries against the corpus in one
    program — the batched semantic lane (reference recall.rs:332-737
    served per-request; the batch engine's design point is a QUERIES
    DATAFRAME, mirroring operators/bm25.batch_bm25 on the lexical
    side).

    → (query_id, doc_id, cos) for every (query, doc) pair sharing at
    least one hashed bucket — hits-only, like an ANN index returning
    matches, never the whole corpus per query.

    Protocol (shared with the single-query oracle in
    queries_recall.py): integer per-doc bucket counts, per-query
    weights 6dp-rounded after L2 normalization, one per-(query,doc)
    fold of the dot product divided by the UNROUNDED doc L2, rounded
    once at the end — the 6dp round absorbs summation-order ulps.

    Scale: the doc side (bucket counts + L2) is computed ONCE and
    cached per (corpus, dim) — the resident index segment; the query
    side is definitionally small and broadcasts, so the only per-batch
    work is a broadcast equi-join on bucket + one groupBy shuffle on
    (query, doc) — 10⁴ queries cost barely more than one.
    """
    from mnemo_spark.cache import cached_persist

    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_t")
    )
    wd = Window.partitionBy("_id")
    # cache counts WITH the per-doc L2 — the whole doc side is the
    # index-time artifact, so a query batch pays only the broadcast
    # bucket join, not the norm window
    dside = cached_persist(
        tok.withColumn("_b", token_bucket(F.col("_t"), dim))
        .groupBy("_id", "_b")
        .agg(F.count("*").alias("_c"))
        .withColumn("_l2", F.sqrt(F.sum(F.col("_c") * F.col("_c")).over(wd))),
        "hash_bag_counts_l2",
        dim,
        compact=True,
    )

    qtok = queries.select(
        F.col(qid_col).alias("_qid"), F.explode(qterms_col).alias("_t")
    )
    qcnt = (
        qtok.withColumn("_b", token_bucket(F.col("_t"), dim))
        .groupBy("_qid", "_b")
        .agg(F.count("*").alias("_qc"))
    )
    wq = Window.partitionBy("_qid")
    qvec = qcnt.select(
        "_qid",
        "_b",
        F.round(
            F.col("_qc") / F.sqrt(F.sum(F.col("_qc") * F.col("_qc")).over(wq)),
            ROUND_DP,
        ).alias("_qw"),
    )

    return (
        dside.join(F.broadcast(qvec), "_b")
        .groupBy("_qid", "_id")
        .agg(
            F.round(
                F.sum(F.col("_c") * F.col("_qw")) / F.first("_l2"), ROUND_DP
            ).alias("cos")
        )
        .select(F.col("_qid").alias(qid_col), F.col("_id").alias(id_col), "cos")
    )
