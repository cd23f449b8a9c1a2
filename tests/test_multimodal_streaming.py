"""Multimodal plumbing + Structured Streaming tests.

Multimodal: the mapInPandas decode pipeline must have a stable
schema, deterministic fake features, and loud NotImplementedError for
real codecs. Streaming: windowed/sessionized streaming aggregations
must equal their batch twins on the same data (the batch queries are
oracle-gated, so equality transfers correctness to the stream path).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mnemo_spark.io import load_table, table_path
from mnemo_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    frame_sample_plan,
    media_from_documents,
)
from mnemo_spark.streaming.events import (
    read_event_stream,
    run_available_now,
    windowed_counts,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def test_decode_media_schema_and_determinism(media):
    out = decode_media(media, codec="raw")
    rows = {r["media_id"]: r for r in out.collect()}
    again = {r["media_id"]: r for r in decode_media(media, codec="raw").collect()}
    assert rows.keys() == again.keys() and len(rows) > 0
    some = next(iter(rows.values()))
    assert len(some["feature"]) == FEATURE_DIM
    for mid, r in rows.items():
        assert r["feature"] == again[mid]["feature"], "decode must be deterministic"
        if r["n_bytes"] > 0:
            assert abs(sum(r["feature"]) - 1.0) < 1e-3  # L1-normalized histogram


def test_decode_media_real_codec_is_loud(media):
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        decode_media(media, codec="jpeg").collect()
    with pytest.raises(ValueError):
        decode_media(media, codec="gif")


def test_resize_then_decode_chains(media):
    from mnemo_spark.operators.multimodal import resize_media

    resized = resize_media(media, target_bytes=64)
    rows = resized.collect()
    assert rows
    for r in rows:
        assert len(r["content"] or b"") <= 64
        assert r["orig_bytes"] >= len(r["content"] or b"")
        assert r["meta"] is not None  # metadata survives the stage
    # the resized frame feeds decode_media unchanged (schema-compatible)
    feats = decode_media(
        resized.select("media_id", "media_type", "content", "meta"),
        codec="raw",
    ).collect()
    assert len(feats) == len(rows)
    assert all(len(f["feature"]) == 16 for f in feats)
    # determinism across runs
    again = {r["media_id"]: r["content"] for r in resize_media(media, 64).collect()}
    assert {r["media_id"]: r["content"] for r in rows} == again


def test_frame_sample_plan_shape(media):
    frames = frame_sample_plan(media, every_n=10)
    rows = frames.collect()
    assert rows, "video rows should expand to frame stubs"
    assert all(r["frame_no"] % 10 == 0 for r in rows)
    assert all(r["byte_offset"] == r["frame_no"] * 256 for r in rows)


def test_windowed_stream_equals_batch(spark, sf_dir, tmp_path):
    # stream source needs a directory; stage the events file into one
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(table_path(sf_dir, "events"), src / "part-0.parquet")

    stream = read_event_stream(spark, str(src))
    assert stream.isStreaming
    run_available_now(windowed_counts(stream, "1 hour"), "win_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table("win_counts").collect()
    }

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_stateful_running_totals_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: state carries across micro-batches —
    two source files, one file per trigger, final totals must equal
    the batch aggregate over both."""
    import pyspark.sql.functions as SF

    from mnemo_spark.streaming.events import read_event_stream, running_user_totals

    src = tmp_path / "stateful_src"
    src.mkdir()
    # split the ORIGINAL file (pyarrow preserves its TIMESTAMP(NANOS)
    # schema, which the stream reader expects) into two micro-batches
    import pyarrow.parquet as pq

    from mnemo_spark.io import table_path

    t = pq.read_table(table_path(sf_dir, "events"))
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), src / "p0.parquet")
    pq.write_table(t.slice(half), src / "p1.parquet")
    full = load_table(spark, sf_dir, "events")

    # state shuffles on spark.sql.shuffle.partitions per micro-batch;
    # shrink it for the test so the two batches are fast
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    out = running_user_totals(read_event_stream(spark, str(src)))
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # last update per user = final state
    got_df = spark.table("running_totals")
    # update mode appends one row per (batch, user); keep the max-n row
    latest = (
        got_df.groupBy("user_id")
        .agg(SF.max(SF.struct("n_events", "total_value")).alias("m"))
        .select("user_id", "m.n_events", "m.total_value")
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 2)) for r in latest.collect()}
    want = {
        r["user_id"]: (r["n"], round(r["t"], 2))
        for r in full.groupBy("user_id")
        .agg(SF.count("*").alias("n"), SF.sum("value").alias("t"))
        .collect()
    }
    assert got == want


def test_streaming_dedup_drops_cross_batch_duplicates(spark, sf_dir, tmp_path):
    """dropDuplicates state spans micro-batches: feeding the same
    file twice yields each event exactly once."""
    import shutil

    from mnemo_spark.streaming.events import dedup_stream, read_event_stream

    src = tmp_path / "dedup_src"
    src.mkdir()
    shutil.copy(table_path(sf_dir, "events"), src / "a.parquet")
    shutil.copy(table_path(sf_dir, "events"), src / "b.parquet")

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    q = (
        dedup_stream(read_event_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    n_distinct = load_table(spark, sf_dir, "events").count()
    got = spark.table("dedup_out")
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_streaming_pii_scrub_matches_batch(spark, tmp_path):
    """Batch/stream unification for the curation family: scrub_pii is
    pure column arithmetic, so the SAME operator call applies to a
    readStream frame unchanged, and a streaming pass over the corpus
    produces byte-identical scrubbed text to the batch pass."""
    import os

    from pyspark.sql import functions as F

    from mnemo_spark.operators.redact import scrub_pii

    rows = [
        (0, "mail me at a.b@example.com or call 555-123-4567"),
        (1, "server 10.0.0.1 holds ssn 123-45-6789"),
        (2, "clean text, nothing to mask"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    os.makedirs(src)
    df.filter(F.col("doc_id") < 2).coalesce(1).write.parquet(src + "/b0")
    df.filter(F.col("doc_id") >= 2).coalesce(1).write.parquet(src + "/b1")

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        scrub_pii(stream)
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r.doc_id: (r.n_email, r.n_ssn, r.n_phone, r.n_ip, r.scrubbed)
        for r in spark.table("pii_stream").collect()
    }
    batch = {
        r.doc_id: (r.n_email, r.n_ssn, r.n_phone, r.n_ip, r.scrubbed)
        for r in scrub_pii(df).collect()
    }
    assert streamed == batch
    assert streamed[0][4] == "mail me at <EMAIL> or call <PHONE>"
    assert streamed[1][4] == "server <IP> holds ssn <SSN>"
