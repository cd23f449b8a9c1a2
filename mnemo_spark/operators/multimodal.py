"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed by Arrow-batched `mapInPandas` stages.

A 100-TB training-data pipeline carries image/audio/video as `binary`
columns next to typed metadata. The Spark-side plumbing here — the
media schema, the mapInPandas batch shape, the partition sizing rules
— is real and tested; the codec step itself is stubbed (this
container has no image/audio libraries) in two clearly-marked ways:

- `decode_media(..., codec="raw")`: a DETERMINISTIC FAKE "decode"
  (byte histogram → fixed-dim float feature) so the end-to-end
  pipeline shape is testable with stable outputs.
- `decode_media(..., codec="jpeg"/"wav"/...)`: raises
  NotImplementedError — swap in a real decoder (PIL/librosa/ffmpeg)
  by replacing `_decode_batch` only; the Spark plumbing around it is
  unchanged.

Scale notes: binary payloads make rows wide — size
`spark.sql.files.maxPartitionBytes` so a partition holds O(100) media
rows, and never collect payloads to the driver. mapInPandas streams
Arrow batches, so peak executor memory is one batch of payloads, not
one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),  # opaque payload
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

_REAL_CODECS = ("jpeg", "png", "wav", "mp4")


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic fake feature: L1-normalized 16-bin byte histogram.

    Stands in for decode→resize→embed; same signature, stable output.
    """
    if not payload:
        return [0.0] * FEATURE_DIM
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    n = float(len(payload))
    return [round(h / n, 6) for h in hist]


def _decode_batch(pdf: pd.DataFrame, codec: str) -> pd.DataFrame:
    if codec != "raw":
        raise NotImplementedError(
            f"codec {codec!r}: real decoders are not available in this "
            "environment; replace _decode_batch with a PIL/librosa/ffmpeg "
            "implementation — the surrounding Spark plumbing is unchanged"
        )
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
            "feature": pdf["content"].map(
                lambda b: _fake_decode(b if b is not None else b"")
            ),
        }
    )


def decode_media(media: DataFrame, codec: str = "raw") -> DataFrame:
    """binary payloads → fixed-dim features via Arrow-batched
    mapInPandas. The iterator-of-batches signature means one Arrow
    batch of payloads in memory at a time."""
    if codec not in ("raw", *_REAL_CODECS):
        raise ValueError(f"unknown codec {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf, codec)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into frame
    stubs (frame_no, byte_offset) without decoding — the shuffle/
    explode shape of frame extraction, with the codec left to
    `decode_media`. Offsets assume fixed-size frame records (real
    containers need the codec's index; that part is the stub)."""
    n_frames = (F.octet_length("content") / F.lit(256)).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias(
                "frame_no"
            ),
        )
        .withColumn("byte_offset", (F.col("frame_no") * 256).cast("long"))
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text bytes as opaque
    payloads so the pipeline is exercisable on the driver corpus."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "video")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")).alias(
            "meta"
        ),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("content", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
        StructField("orig_bytes", LongType(), False),
    ]
)


def resize_media(media: DataFrame, target_bytes: int = 512) -> DataFrame:
    """Resize/downsample stage: shrink each payload to ≤ target_bytes
    by stride sampling (deterministic fake for PIL resize / audio
    resample — swap the per-batch body, keep the schema and batch
    shape). Emits the SAME media schema (+orig_bytes) so it chains
    before `decode_media`, exactly where a real pipeline puts the
    resolution cut to shrink shuffle width early."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            sizes = payloads.map(lambda b: len(b) if b is not None else 0)

            def shrink(b):
                if b is None or len(b) <= target_bytes:
                    return b
                stride = -(-len(b) // target_bytes)  # ceil
                return bytes(b[::stride])

            out = pdf[["media_id", "media_type"]].copy()
            out["content"] = payloads.map(shrink)
            out["meta"] = pdf["meta"]
            out["orig_bytes"] = sizes
            yield out

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)
