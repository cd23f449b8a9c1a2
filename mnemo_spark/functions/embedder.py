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
    return cached_persist(out, "hash_bag_emb", dim)
