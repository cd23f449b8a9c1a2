"""operators/vector.batch_dot_scores — the r9 Arrow matmul kernel
behind both recall verbs' dense semantic lane. Properties:

1. kernel scores ≡ the expression form (crossJoin + zip_with fold) at
   6 dp on mixed data incl. NULL embeddings (which must be DROPPED,
   the lane's `score IS NOT NULL` contract);
2. margin pruning (limit=N) never changes any downstream per-query
   top-N selection, rounded or unrounded ordering alike.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from mnemo_spark.operators.vector import batch_dot_scores

DIM = 16


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    rows = []
    for i in range(300):
        vec = (
            None
            if i % 37 == 0
            else [round(rng.uniform(-1, 1), 3) for _ in range(DIM)]
        )
        rows.append((f"d{i:03d}", vec))
    return spark.createDataFrame(
        rows, "id string, embedding array<float>"
    ).repartition(5)


def _qmatrix():
    rng = random.Random(13)
    qids = [f"q{j}" for j in range(4)]
    Q = np.asarray(
        [[round(rng.uniform(-1, 1), 3) for _ in range(DIM)] for _ in qids],
        dtype=np.float64,
    )
    return qids, Q


def _expression_scores(spark, corpus, qids, Q):
    qvecs = spark.createDataFrame(
        [(qid, [float(x) for x in row]) for qid, row in zip(qids, Q)],
        "_qid string, _qv array<float>",
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("_qv").cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        corpus.crossJoin(F.broadcast(qvecs))
        .select("_qid", "id", dot.alias("score"))
        .filter(F.col("score").isNotNull())
    )


def _rounded(df):
    return {
        (r["_qid"], r["id"]): round(r["score"], 6) for r in df.collect()
    }


def test_kernel_matches_expression_form(spark, corpus):
    qids, Q = _qmatrix()
    from pyspark.sql.types import StringType

    got = _rounded(
        batch_dot_scores(
            corpus, qids, Q, corpus_id="id", corpus_vec="embedding",
            query_id="_qid", qid_type=StringType(), score_col="score",
        )
    )
    want = _rounded(_expression_scores(spark, corpus, qids, Q))
    assert got == want
    # NULL embeddings were dropped, not zero-filled
    assert not any(k[1] == "d000" for k in got)


@pytest.mark.parametrize("k", [1, 5, 20])
def test_margin_pruning_preserves_topk(spark, corpus, k):
    from pyspark.sql import Window
    from pyspark.sql.types import StringType

    qids, Q = _qmatrix()
    full = batch_dot_scores(
        corpus, qids, Q, corpus_id="id", corpus_vec="embedding",
        query_id="_qid", qid_type=StringType(), score_col="score",
    )
    pruned = batch_dot_scores(
        corpus, qids, Q, corpus_id="id", corpus_vec="embedding",
        query_id="_qid", qid_type=StringType(), score_col="score", limit=k,
    )

    def topk(df, rounded):
        score = F.round("score", 6) if rounded else F.col("score")
        w = Window.partitionBy("_qid").orderBy(F.desc(score), F.asc("id"))
        out = (
            df.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
        )
        return sorted(
            (r["_qid"], r["id"], round(r["score"], 6), r["_r"])
            for r in out.collect()
        )

    for rounded in (False, True):
        assert topk(pruned, rounded) == topk(full, rounded)
