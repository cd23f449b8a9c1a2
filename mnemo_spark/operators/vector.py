"""Dense vector retrieval (reference J5/J6, index/usearch.rs).

The reference serves single-query ANN from an in-process USearch HNSW
graph. A batch Spark engine inverts that: queries arrive as a
DataFrame, the corpus is the big side, and top-k is an exact
brute-force ranked join — embarrassingly parallel, no index to build
or keep consistent (SURVEY §4: "an algorithm choice, not a planner
concern").

Physical strategy at scale:
- `topk_cosine`: broadcast the (small) query side into a crossJoin;
  each corpus partition computes its local scores, a per-query
  row_number window takes the global top-k. One shuffle of
  candidate-sized data on query_id. For very large k·|Q|, swap the
  window for a per-partition `limit` + re-rank (AQE handles the rest).
- `lsh_sign_bucket` / `ann_lsh_topk`: the 100-TB path. Signed random
  hyperplanes (deterministic literals) give each vector an H-bit
  bucket; candidates co-bucket with the query, so the crossJoin
  becomes an equi-join on bucket — shuffle-friendly, prunes the
  corpus ~2^H-fold at some recall cost. Same contract as the
  reference's approximate HNSW.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mnemo_spark.functions.similarity import cosine, dot

ROUND_DP = 6


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine per query. → (query_id, vec_id, cos_sim, rank)."""
    joined = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(cosine(F.col(corpus_vec), F.col(query_vec)), ROUND_DP).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_sign_bucket(vec, hyperplanes: list[list[float]]):
    """H-bit sign-LSH bucket of a vector column as a bit-string.

    hyperplanes are plain Python literals (deterministic, shared with
    the SQL oracle) — each contributes one bit: 1 iff dot(v, h) > 0.

    The plane matrix ships as ONE nested-array literal: building it
    from per-element F.lit columns costs H·dim py4j round-trips
    (~2s of driver time for 8×64 — measured), which dwarfed the
    actual scan at bench scale. Evaluation is unchanged: interpreted
    higher-order dot per plane, same as before.
    """
    planes = F.lit([[float(x) for x in h] for h in hyperplanes])
    return F.concat_ws(
        "",
        F.transform(
            planes,
            lambda h: F.when(dot(vec, h) > 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    The crossJoin of `topk_cosine` becomes an equi-join on bucket —
    the join Spark shuffles/broadcasts by key, so corpus partitions
    holding other buckets are never scored.
    """
    c = corpus.withColumn("_bucket", lsh_sign_bucket(F.col(corpus_vec), hyperplanes))
    q = queries.withColumn("_bucket", lsh_sign_bucket(F.col(query_vec), hyperplanes))
    joined = c.join(F.broadcast(q), "_bucket").select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(cosine(F.col(corpus_vec), F.col(query_vec)), ROUND_DP).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
    allow_unscoped: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (i<j) with cosine ≥ threshold (reference J5).

    The reference bounds this with ANN top-20 per record
    (query/conflict.rs:84-151); here the exact form self-joins within
    an optional group (the reference scopes to same agent — at scale
    ALWAYS pass group_col or pre-bucket with LSH so the self-join is
    per-partition, never global). The ungrouped form is a full
    crossJoin and REFUSES to run unless allow_unscoped=True (tests /
    provably-small inputs only) — nothing else stops a caller from
    going quadratic on the whole corpus.
    """
    if group_col is None and not allow_unscoped:
        raise ValueError(
            "cosine_pairs without group_col is a full O(n^2) crossJoin; "
            "pass group_col (per-agent / LSH-bucket scoping) or set "
            "allow_unscoped=True for provably small inputs"
        )
    if group_col is not None:
        # vectorized path: pairwise cosine per group as one numpy
        # matmul inside applyInPandas — the expression form evaluates
        # the zip_with/aggregate fold INTERPRETED per pair, ~50x
        # slower on |group|² pairs; groups parallelize across
        # executors exactly like the reference's per-agent scoping
        import numpy as np
        import pandas as pd

        from pyspark.sql.types import DoubleType, StructField, StructType

        in_schema = {f.name: f.dataType for f in vectors.schema.fields}
        out_schema = StructType(
            [
                StructField(group_col, in_schema[group_col], True),
                StructField("id_a", in_schema[id_col], True),
                StructField("id_b", in_schema[id_col], True),
                StructField("cos_sim", DoubleType(), True),
            ]
        )

        def pairs_of(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(id_col).reset_index(drop=True)
            ids = pdf[id_col].to_numpy()
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((V * V).sum(axis=1))
            norms[norms == 0.0] = np.nan  # NULL-safe like the expression form
            S = (V @ V.T) / np.outer(norms, norms)
            ia, ib = np.triu_indices(len(ids), k=1)
            sims = np.round(S[ia, ib], ROUND_DP)
            keep = sims >= threshold
            return pd.DataFrame(
                {
                    group_col: pdf[group_col].iloc[ia[keep]].to_numpy(),
                    "id_a": ids[ia[keep]],
                    "id_b": ids[ib[keep]],
                    "cos_sim": sims[keep],
                }
            )

        return vectors.groupBy(group_col).applyInPandas(pairs_of, out_schema)

    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    joined = a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), ROUND_DP))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def knn_label_vote(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    label_col: str = "label",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """k-NN majority-vote classification. → (query_id, pred_label, votes)."""
    nn = topk_cosine(corpus, queries, k, corpus_id, corpus_vec, query_id, query_vec)
    votes = (
        nn.join(corpus.select(corpus_id, label_col), corpus_id)
        .groupBy(query_id, label_col)
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("votes"), F.asc(label_col))
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(query_id, F.col(label_col).alias("pred_label"), "votes")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path
    next to sign-LSH.

    Build: every corpus vector is assigned to its nearest centroid
    (one broadcast join against the small centroid set — the
    "inverted list"). Probe: each query scores only vectors in its
    nprobe nearest cells. At 100 TB the corpus is written partitioned
    by cell id, so a probe touches nprobe partitions and the
    crossJoin never materializes.

    Centroids here come from a deterministic seed set (k-means would
    drift between engines; the reference's HNSW is equally an
    approximation choice, SURVEY §4).
    """
    cw = Window.partitionBy(corpus_id).orderBy(F.desc("_cs"), F.asc(cent_id))
    assign = (
        corpus.crossJoin(F.broadcast(centroids))
        .withColumn("_cs", cosine(F.col(corpus_vec), F.col(cent_vec)))
        .withColumn("_rn", F.row_number().over(cw))
        .filter(F.col("_rn") == 1)
        .select(corpus_id, cent_id)
    )
    qw = Window.partitionBy(query_id).orderBy(F.desc("_cs"), F.asc(cent_id))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("_cs", cosine(F.col(query_vec), F.col(cent_vec)))
        .withColumn("_rn", F.row_number().over(qw))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id, cent_id, query_vec)
    )
    cand = assign.join(F.broadcast(probes), cent_id).join(corpus, corpus_id)
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        cand.select(
            F.col(query_id),
            F.col(corpus_id),
            F.round(cosine(F.col(corpus_vec), F.col(query_vec)), ROUND_DP).alias(
                "cos_sim"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
