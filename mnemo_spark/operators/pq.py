"""Product-quantization ANN (J6's third approximation strategy next
to sign-LSH and IVF; the reference's USearch index — index/usearch.rs
— ships scalar/product quantization for exactly this reason).

Why PQ at 100 TB: float32 embeddings at dim 64 cost 256 B/vector; an
m=8 × 16-centroid code costs 8 B — a 32× memory cut, which is the
difference between an embedding store that fits executor memory and
one that doesn't. Accuracy is recoverable (tools/eval_ann.py measures
recall@k against exact cosine, same harness as LSH/IVF).

Design (FAISS-standard, re-expressed for Spark):
- codebook TRAINING is deterministic: the sub-vectors of the first
  `ksub` corpus rows by id (k-means would drift between runs and
  engines; the approximation axis is measured, not contracted).
- vectors are L2-NORMALIZED before encoding, so asymmetric-distance
  ranking is monotone with cosine similarity (‖q−v‖² = 2−2·cos on the
  unit sphere) and the recall harness compares apples to apples.
- ENCODE + ADC SCORE fuse into ONE mapInPandas pass over the corpus
  (the ivf_topk physical pattern): the codebook and the per-query
  distance tables are driver-computed literals (m·ksub floats — FAISS
  ships them to every node identically), each Arrow batch encodes
  with one einsum + argmin and scores with one table gather, local
  top-k prunes before the only shuffle (candidate-sized, on
  query_id). Zero joins, zero corpus re-shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from mnemo_spark.operators.vector import _collect_vec_side

ROUND_DP = 6


def _normalize(X: np.ndarray) -> np.ndarray:
    n = np.sqrt((X * X).sum(axis=1, keepdims=True))
    return np.where(n > 0.0, X / np.where(n == 0.0, 1.0, n), 0.0)


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> np.ndarray:
    """Deterministic codebook: (m, ksub, dim/m) from the first `ksub`
    corpus vectors by id, L2-normalized then split into m sub-spaces.
    Driver-side by design — the codebook is a broadcast constant."""
    seed = corpus.filter(F.col(corpus_id) < ksub).select(corpus_id, corpus_vec)
    _, C = _collect_vec_side(seed, corpus_id, corpus_vec)
    if C is None or C.shape[0] < ksub:
        raise ValueError(f"need ≥{ksub} corpus rows with {corpus_id} < {ksub}")
    dim = C.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    return _normalize(C).reshape(ksub, m, dim // m).transpose(1, 0, 2).copy()


def _encode(V: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) → (n, m) argmin codes; ties take the lowest centroid
    index (np.argmin's first-minimum contract)."""
    m, ksub, dsub = books.shape
    S = _normalize(V).reshape(len(V), m, dsub)
    # ‖s−c‖² = ‖s‖² − 2 s·c + ‖c‖²; ‖s‖² is constant per argmin
    cross = np.einsum("nmd,mkd->nmk", S, books)
    c2 = (books * books).sum(axis=2)  # (m, ksub)
    return (c2[None, :, :] - 2.0 * cross).argmin(axis=2)


def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """→ (id, codes array<int>): the compressed representation a
    100-TB deployment persists instead of raw floats."""
    from mnemo_spark.functions.similarity import stack_batch

    from pyspark.sql.types import ArrayType, IntegerType

    id_type = corpus.schema[corpus_id].dataType
    schema = StructType(
        [
            StructField(corpus_id, id_type, True),
            StructField("codes", ArrayType(IntegerType()), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nulls = pdf[corpus_vec].isna().to_numpy()
            V = stack_batch(pdf[corpus_vec], nulls)
            codes = _encode(V, books)
            out = pd.DataFrame({corpus_id: pdf[corpus_id].to_numpy()})
            out["codes"] = [None if bad else row.tolist()
                            for bad, row in zip(nulls, codes)]
            yield out

    return corpus.select(corpus_id, corpus_vec).mapInPandas(run, schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Asymmetric-distance top-k: → (query_id, vec_id, adc_dist, rank)
    ranked by (adc_dist asc, id asc); NULL/zero vectors are excluded
    (they have no direction to match)."""
    from mnemo_spark.functions.similarity import stack_batch

    m, ksub, dsub = books.shape
    qids, Q = _collect_vec_side(queries, query_id, query_vec)
    if Q is None:
        raise ValueError("query side is empty or carries NULL vectors")
    Qs = _normalize(Q).reshape(len(qids), m, dsub)
    # per-query ADC tables: T[q, m, c] = ‖q_m − c‖²
    cross = np.einsum("qmd,mkd->qmk", Qs, books)
    q2 = (Qs * Qs).sum(axis=2)  # (q, m)
    c2 = (books * books).sum(axis=2)  # (m, ksub)
    T = q2[:, :, None] - 2.0 * cross + c2[None, :, :]
    qid_arr = np.asarray(qids)

    schema = StructType(
        [
            StructField(query_id, queries.schema[query_id].dataType, True),
            StructField(corpus_id, corpus.schema[corpus_id].dataType, True),
            StructField("adc_dist", DoubleType(), True),
        ]
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nulls = pdf[corpus_vec].isna().to_numpy()
            V = stack_batch(pdf[corpus_vec], nulls)
            norms = np.sqrt((V * V).sum(axis=1))
            ok = ~nulls & (norms > 0.0)
            if not ok.any():
                continue
            codes = _encode(V[ok], books)  # (n_ok, m)
            ids = pdf[corpus_id].to_numpy()[ok]
            # gather: dist[q, v] = Σ_m T[q, m, codes[v, m]]
            d = T[:, np.arange(m)[None, :], codes].sum(axis=2)  # (q, n_ok)
            out_q, out_i, out_d = [], [], []
            for j in range(len(qid_arr)):
                row = d[j]
                keep = np.arange(row.size)
                if row.size > k:
                    thr = np.partition(row, k - 1)[k - 1]
                    keep = np.flatnonzero(row <= thr + 1e-9)
                out_q.append(np.full(keep.size, qid_arr[j]))
                out_i.append(ids[keep])
                out_d.append(row[keep])
            yield pd.DataFrame(
                {
                    query_id: np.concatenate(out_q),
                    corpus_id: np.concatenate(out_i),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    cand = (
        corpus.select(corpus_id, corpus_vec)
        .mapInPandas(score, schema)
        .withColumn("adc_dist", F.round(F.col("adc_dist"), ROUND_DP))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.asc("adc_dist"), F.asc(corpus_id)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "adc_dist", "rank")
    )
