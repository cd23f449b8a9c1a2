"""F6 batch-embedder interface + U1 fail-loud semantic gate
(reference embedding/mod.rs:7-53, onnx.rs, openai.rs;
recall.rs:366-375)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine
from mnemo_spark.functions.embed_batch import (
    BatchEmbedder,
    HashBagEmbedder,
    HttpBatchEmbedder,
    NoopEmbedder,
    OnnxMiniLMEmbedder,
    embed_batch,
)
from mnemo_spark.functions.embedder import hash_bag_embedding

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)

_ROW_SCHEMA = (
    "id string, agent_id string, content string, memory_type string, "
    "scope string, importance float, tags array<string>, created_at timestamp"
)


def test_semantic_recall_refuses_noop_embedder(spark):
    rows = spark.createDataFrame(
        [("m1", "a1", "paris is in france", "semantic", "private", 0.5, [], T0)],
        _ROW_SCHEMA,
    )
    eng = MnemoSparkEngine(spark, embedder=NoopEmbedder()).remember_batch(rows)
    for strategy in ("semantic", "hybrid"):
        with pytest.raises(RuntimeError, match="semantic-capable"):
            eng.recall("paris", "a1", strategy=strategy)
    # non-semantic strategies still work under noop
    assert eng.recall("paris", "a1", strategy="lexical").count() >= 0
    # the noop provider itself fails loud
    with pytest.raises(RuntimeError, match="cannot embed"):
        NoopEmbedder().embed(["x"])


def test_embedder_survives_verbs(spark):
    """_clone propagates the configured provider — the gate must not
    silently reset to the default after a mutation."""
    rows = spark.createDataFrame(
        [("m1", "a1", "hello world", "semantic", "private", 0.5, [], T0)], _ROW_SCHEMA
    )
    eng = MnemoSparkEngine(spark, embedder=NoopEmbedder()).remember_batch(rows)
    eng = eng.forget(["m1"], strategy="soft", now=T0)
    with pytest.raises(RuntimeError, match="semantic-capable"):
        eng.recall("hello", "a1", strategy="semantic")


def test_embed_batch_matches_relational_hash_bag(spark):
    """The mapInPandas provider path must be bit-identical to the
    relational hash_bag_embedding on the same texts."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta"), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    dim = 16
    dense = embed_batch(docs, HashBagEmbedder(dim), "text", "vec")
    sparse_from_dense = {
        (r.doc_id, b): round(w, 6)
        for r in dense.collect()
        for b, w in enumerate(r.vec)
        if w != 0.0
    }
    sparse_rel = {
        (r.doc_id, r.bucket): r.weight
        for r in hash_bag_embedding(docs, dim, "doc_id", "text").collect()
    }
    assert set(sparse_from_dense) == set(sparse_rel)
    for k, v in sparse_rel.items():
        assert abs(sparse_from_dense[k] - v) < 2e-6
    # empty / NULL texts embed to the zero vector, detectably
    zeros = {r.doc_id for r in dense.collect() if all(w == 0.0 for w in r.vec)}
    assert zeros == {3, 4}


def test_http_batch_embedder_batches_and_validates(spark):
    def fake_post(url, payload):
        # encode the batch size into every vector: executor-side state
        # can't be observed from the driver, but the data comes back
        n = len(payload["input"])
        return [[float(n), 1.0] for _ in payload["input"]]

    emb = HttpBatchEmbedder("http://unit.test/v1/embeddings", dim=2, post_fn=fake_post)
    docs = spark.createDataFrame([(i, f"text {i}") for i in range(10)], "id int, text string")
    rows = embed_batch(docs.repartition(1), emb, "text", "vec", batch_size=4).collect()
    assert len(rows) == 10
    sizes = [int(r.vec[0]) for r in rows]
    # 10 texts at batch_size=4 -> sub-batches of 4/4/2, never 1-by-1
    assert max(sizes) <= 4 and max(sizes) > 1
    assert sum(1 for s in sizes if s == 2) == 2

    def bad_post(url, payload):
        return [[1.0] for _ in payload["input"]]  # wrong dim

    bad = HttpBatchEmbedder("http://unit.test", dim=2, post_fn=bad_post)
    with pytest.raises(Exception, match="expected"):
        embed_batch(docs, bad, "text", "vec").collect()


def test_onnx_embedder_fails_loud_without_runtime():
    emb = OnnxMiniLMEmbedder("/nonexistent/model.onnx")
    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime present; load path exercised elsewhere")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="onnxruntime"):
        emb.load()


def test_hash_bag_embedder_deterministic():
    a = HashBagEmbedder(8).embed(["the quick brown fox", "jumps"])
    b = HashBagEmbedder(8).embed(["the quick brown fox", "jumps"])
    assert np.array_equal(a, b)
    norms = np.sqrt((a * a).sum(axis=1))
    assert np.allclose(norms, 1.0, atol=1e-5)


def _len_onehot_embedder(dim: int = 8):
    """Deterministic provider whose vectors are one-hot at
    len(text) % dim — trivially distinguishable from the hash-bag, so
    tests can prove the configured provider is the one actually used
    on BOTH the write path and the query path (ADVICE r2). Defined
    inside a function so cloudpickle serializes the class BY VALUE —
    executors cannot import the test module."""

    class _LenOneHot(BatchEmbedder):
        name = "len_onehot"
        semantic = True

        def __init__(self, dim: int = 8):
            self.dim = dim

        def embed(self, texts):
            out = np.zeros((len(texts), self.dim), dtype=np.float64)
            for i, t in enumerate(texts):
                out[i, len(t or "") % self.dim] = 1.0
            return out

    return _LenOneHot(dim)


def test_remember_batch_routes_through_configured_provider(spark):
    """remember_batch must embed via self.embedder, not the built-in
    hash-bag expression (the silent-degrade U1 forbids)."""
    rows = spark.createDataFrame(
        [("m1", "a1", "abcd", "semantic", "private", 0.5, [], T0)], _ROW_SCHEMA
    )
    eng = MnemoSparkEngine(spark, embedding_dim=8, embedder=_len_onehot_embedder(8))
    got = eng.remember_batch(rows).memories.select("embedding").collect()[0][0]
    assert got == [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]  # len("abcd") % 8 == 4


def test_semantic_lane_uses_provider_query_vector(spark):
    """The query vector must come from the same provider as stored
    vectors: under _LenOneHotEmbedder, score = 1 iff the doc content
    length matches the query length mod dim."""
    rows = spark.createDataFrame(
        [
            ("same", "a1", "wxyz!", "semantic", "private", 0.5, [], T0),  # len 5
            ("diff", "a1", "pq", "semantic", "private", 0.5, [], T0),     # len 2
        ],
        _ROW_SCHEMA,
    )
    eng = MnemoSparkEngine(spark, embedding_dim=8, embedder=_len_onehot_embedder(8))
    hits = eng.remember_batch(rows).recall("hello", "a1", strategy="semantic", k=5)
    scores = {r["id"]: r["score"] for r in hits.collect()}
    assert scores["same"] == 1.0 and scores["diff"] == 0.0


def test_remember_under_nonsemantic_provider_stores_null_vectors(spark):
    """A non-semantic provider must not silently hash-bag: writes
    succeed with NULL embeddings and the semantic gate still refuses."""
    rows = spark.createDataFrame(
        [("m1", "a1", "hello", "semantic", "private", 0.5, [], T0)], _ROW_SCHEMA
    )
    eng = MnemoSparkEngine(spark, embedder=NoopEmbedder()).remember_batch(rows)
    assert eng.memories.select("embedding").collect()[0][0] is None
    assert eng.recall("hello", "a1", strategy="lexical").count() == 1


def test_embedder_dim_mismatch_refused_at_construction(spark):
    with pytest.raises(ValueError, match="dim"):
        MnemoSparkEngine(spark, embedding_dim=64, embedder=_len_onehot_embedder(8))
