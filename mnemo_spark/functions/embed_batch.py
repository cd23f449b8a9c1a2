"""Pluggable batch embedders over Arrow-batched mapInPandas
(reference F6/U1: embedding/mod.rs:7-53 provider trait + fail-loud
gate; embedding/onnx.rs:1-645 ONNX MiniLM; embedding/openai.rs:1-40
HTTP batch provider).

Spark-first design: an embedder is a picklable object shipped to
executors; `embed_batch` wraps it in ONE mapInPandas pass — the model
loads once per task (lazy `load()` inside the generator, reused
across Arrow batches), texts are embedded in vectorized batches,
never row-at-a-time. At 100 TB this is the only sane shape: the
model forward pass dominates, Arrow transfer is amortized, and the
operator parallelizes per input partition with no shuffle.

The fail-loud gate (U1): the reference refuses semantic recall under
`NoopEmbeddingProvider` (recall.rs:366-375) instead of silently
returning garbage. `NoopEmbedder` here reproduces that: any attempt
to embed raises, and `MnemoSparkEngine.recall(strategy="semantic")`
checks `embedder.semantic` before planning the lane.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

_TOKEN_RE = re.compile(r"[a-z0-9]+")


class BatchEmbedder:
    """Provider interface (embedding/mod.rs:7-53).

    Subclasses set `name`, `dim`, `semantic` (whether the gate admits
    this provider for semantic recall) and implement
    `embed(texts) -> np.ndarray[len(texts), dim]`. `load()` runs once
    per executor task before the first batch — put model/session
    construction there, never in __init__ (the object is pickled to
    executors, so __init__ state must stay cheap and serializable).
    """

    name = "abstract"
    dim = 0
    semantic = False

    def load(self) -> None:  # pragma: no cover - default no-op
        pass

    def embed(self, texts: list[str]) -> np.ndarray:
        raise NotImplementedError


class NoopEmbedder(BatchEmbedder):
    """The reference's NoopEmbeddingProvider: embedding is an error.

    Exists so the semantic-recall gate has something to refuse — an
    engine configured with this provider fails loud instead of
    hashing silently."""

    name = "noop"
    semantic = False

    def __init__(self, dim: int = 256):
        self.dim = dim

    def embed(self, texts: list[str]) -> np.ndarray:
        raise RuntimeError(
            "NoopEmbedder cannot embed: configure a real provider "
            "(reference embedding/mod.rs:7-53 fail-loud contract)"
        )


class HashBagEmbedder(BatchEmbedder):
    """Deterministic dense hash-bag provider (embedding/mod.rs:68-114).

    Bit-identical to the relational `hash_bag_embedding` (same
    md5-prefix bucket hash, L2 norm, 6-dp rounding), so the mapInPandas
    path is oracle-checkable against the same DuckDB SQL. Quality
    floor: this is the reference's own hashed fallback — real semantic
    quality needs the ONNX/HTTP providers — but it IS a configured
    provider, so the gate admits it (the reference's LoCoMo runs use
    exactly this fallback)."""

    name = "hash_bag"
    semantic = True

    def __init__(self, dim: int = 256):
        self.dim = dim
        # token→bucket memo: corpora are Zipfian, so the md5 per token
        # OCCURRENCE (the r8 form) recomputed the same hash tens of
        # times per document; memoizing per unique token cuts the
        # Python-side cost to one md5 per vocabulary entry per task.
        # Values are pure functions of (token, dim) — memoization
        # cannot change any embedding.
        self._bucket_memo: dict[str, int] = {}

    def _bucket(self, tok: str) -> int:
        b = self._bucket_memo.get(tok)
        if b is None:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % self.dim
            self._bucket_memo[tok] = b
        return b

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        bucket = self._bucket
        for i, text in enumerate(texts):
            toks = _TOKEN_RE.findall((text or "").lower())
            if toks:
                np.add.at(out[i], [bucket(t) for t in toks], 1.0)
        norms = np.sqrt((out * out).sum(axis=1, keepdims=True))
        norms[norms == 0.0] = 1.0  # zero-token doc -> zero vector
        return np.round(out / norms, 6)


class OnnxMiniLMEmbedder(BatchEmbedder):
    """ONNX MiniLM provider (embedding/onnx.rs:1-645): tokenize →
    transformer forward → mean-pool over attention mask → L2 norm.

    The ONNX runtime and tokenizer libs are not in this container, so
    `load()` fails loud with the exact dependency list — the Spark
    plumbing (pickling, per-task session init, batch shape) is real
    and tested via the deterministic providers."""

    name = "onnx_minilm"
    semantic = True

    def __init__(self, model_path: str, tokenizer_path: str | None = None,
                 dim: int = 384, max_seq_len: int = 256):
        self.model_path = model_path
        self.tokenizer_path = tokenizer_path or model_path
        self.dim = dim
        self.max_seq_len = max_seq_len
        self._session = None
        self._tokenizer = None

    def load(self) -> None:
        try:
            import onnxruntime  # noqa: F401
            from tokenizers import Tokenizer  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "OnnxMiniLMEmbedder needs `onnxruntime` and `tokenizers` "
                "(the reference bundles MiniLM-L6-v2 the same way, "
                "embedding/onnx.rs:1-645); install them or use "
                "HashBagEmbedder/HttpBatchEmbedder"
            ) from exc
        import onnxruntime
        from tokenizers import Tokenizer

        self._session = onnxruntime.InferenceSession(self.model_path)
        self._tokenizer = Tokenizer.from_file(self.tokenizer_path)
        self._tokenizer.enable_truncation(max_length=self.max_seq_len)

    def embed(self, texts: list[str]) -> np.ndarray:  # pragma: no cover
        enc = self._tokenizer.encode_batch([t or "" for t in texts])
        max_len = max(len(e.ids) for e in enc)
        ids = np.zeros((len(enc), max_len), dtype=np.int64)
        mask = np.zeros((len(enc), max_len), dtype=np.int64)
        for i, e in enumerate(enc):
            ids[i, : len(e.ids)] = e.ids
            mask[i, : len(e.ids)] = e.attention_mask
        (hidden,) = self._session.run(
            None,
            {"input_ids": ids, "attention_mask": mask,
             "token_type_ids": np.zeros_like(ids)},
        )[:1]
        m = mask[:, :, None].astype(np.float64)
        pooled = (hidden * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1e-9)
        norms = np.linalg.norm(pooled, axis=1, keepdims=True)
        return pooled / np.maximum(norms, 1e-12)


class HttpBatchEmbedder(BatchEmbedder):
    """HTTP batch provider (embedding/openai.rs:1-40): POST the text
    batch, read back one vector per text.

    `post_fn(url, payload_dict) -> list[list[float]]` is injectable so
    tests exercise the full batching path without a network; the
    default uses stdlib urllib (no extra deps)."""

    name = "http_batch"
    semantic = True

    def __init__(self, endpoint: str, dim: int, model: str = "default",
                 post_fn=None, timeout: float = 30.0):
        self.endpoint = endpoint
        self.dim = dim
        self.model = model
        self.post_fn = post_fn
        self.timeout = timeout

    def _default_post(self, url: str, payload: dict) -> list[list[float]]:
        import json
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            body = json.loads(resp.read())
        return [d["embedding"] for d in body["data"]]

    def embed(self, texts: list[str]) -> np.ndarray:
        post = self.post_fn or self._default_post
        vecs = post(self.endpoint, {"model": self.model, "input": list(texts)})
        out = np.asarray(vecs, dtype=np.float64)
        if out.shape != (len(texts), self.dim):
            raise ValueError(
                f"embedder returned shape {out.shape}, "
                f"expected ({len(texts)}, {self.dim})"
            )
        return out


def embed_batch(
    df: DataFrame,
    embedder: BatchEmbedder,
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 256,
) -> DataFrame:
    """Add `out_col: array<float>` by running the embedder over Arrow
    batches in one mapInPandas pass (F6).

    Partition-parallel, shuffle-free; the model loads once per task.
    batch_size sub-batches each Arrow batch so peak memory is bounded
    by batch_size x dim regardless of
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    if not isinstance(embedder, BatchEmbedder):
        raise TypeError(f"not a BatchEmbedder: {embedder!r}")
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(FloatType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        embedder.load()
        for pdf in batches:
            texts = pdf[text_col].fillna("").astype(str).tolist()
            if texts:
                chunks = [
                    embedder.embed(texts[i : i + batch_size])
                    for i in range(0, len(texts), batch_size)
                ]
                vecs = np.vstack(chunks).astype(np.float32)
                pdf = pdf.assign(**{out_col: list(vecs)})
            else:
                pdf = pdf.assign(**{out_col: pd.Series([], dtype=object)})
            yield pdf

    return df.mapInPandas(run, out_schema)
