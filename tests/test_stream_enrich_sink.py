"""Stream-static enrichment + idempotent merge sink: the streaming
ingest path must enrich against static dimensions exactly like the
batch join, and a replayed stream over the same source files must not
duplicate sink rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mnemo_spark.io import load_table
from mnemo_spark.streaming.events import enrich_stream, merge_parquet_sink


def _two_file_source(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    src = str(tmp_path / "src")
    os.makedirs(src)
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    events.filter(F.col("ts") <= cut).coalesce(1).write.parquet(src + "/b0")
    events.filter(F.col("ts") > cut).coalesce(1).write.parquet(src + "/b1")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    return events, stream


def test_enrich_stream_matches_batch_join(spark, sf_dir, tmp_path):
    events, stream = _two_file_source(spark, sf_dir, tmp_path)
    dims = (
        events.select("user_id")
        .distinct()
        .withColumn(
            "tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd")
        )
    )
    q = (
        enrich_stream(stream, dims)
        .writeStream.format("memory")
        .queryName("enriched_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["tier"])
        for r in spark.table("enriched_stream").select("event_id", "tier").collect()
    }
    want = {
        (r["event_id"], r["tier"])
        for r in events.join(dims, "user_id", "left")
        .select("event_id", "tier")
        .collect()
    }
    assert got == want and len(got) > 0


def test_merge_sink_replay_is_idempotent(spark, sf_dir, tmp_path):
    events, stream = _two_file_source(spark, sf_dir, tmp_path)
    out = str(tmp_path / "sink")
    n = events.count()

    q1 = merge_parquet_sink(stream, out, str(tmp_path / "ck1")).start()
    q1.awaitTermination()
    assert spark.read.parquet(out).count() == n

    # full replay: fresh checkpoint over the SAME source files — the
    # file sink alone would double every row; the keyed anti-join
    # must keep the sink exactly once per event_id
    _, stream2 = (events, None)
    stream2 = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "src"))
    )
    q2 = merge_parquet_sink(stream2, out, str(tmp_path / "ck2")).start()
    q2.awaitTermination()
    sunk = spark.read.parquet(out)
    assert sunk.count() == n
    assert sunk.select("event_id").distinct().count() == n


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    from mnemo_spark.streaming.events import view_purchase_join_stream

    events, stream = _two_file_source(spark, sf_dir, tmp_path)
    q = (
        view_purchase_join_stream(stream)
        .writeStream.format("memory")
        .queryName("vp_join_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_vp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["purchase_id"], r["view_id"])
        for r in spark.table("vp_join_stream").collect()
    }
    want = {
        (r["purchase_id"], r["view_id"])
        for r in view_purchase_join_stream(events).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_rollup_merge_matches_batch_and_replays_once(
    spark, sf_dir, tmp_path
):
    from mnemo_spark.sources.txlog import TxTable
    from mnemo_spark.streaming.events import rollup_merge_sink

    events, stream = _two_file_source(spark, sf_dir, tmp_path)
    tx_path = str(tmp_path / "rollup")
    q = rollup_merge_sink(stream, tx_path, str(tmp_path / "ckr")).start()
    q.awaitTermination()

    tx = TxTable(tx_path)
    got = {
        (r["user_id"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in tx.snapshot(spark).collect()
    }
    want = {
        (r["user_id"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in events.groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
    # one commit per micro-batch → the version history is the rollup's
    # time travel: v0 is the first file's partial rollup
    assert len(tx.versions()) == 2
    assert tx.snapshot(spark, version=0).count() <= len(got)

    # replayed epoch: re-delivering batch 1 must be a no-op
    before = tx.latest_version()
    batch1 = events.limit(50)
    import mnemo_spark.streaming.events as ev

    # call the inner writer directly with an already-committed batch_id
    writer = rollup_merge_sink(stream, tx_path, str(tmp_path / "ckr2"))
    # simulate: the sink's idempotence lives in TxTable.last_txn
    assert tx.last_txn("rollup_sink") == 1
    tx.commit(batch1, mode="append", txn=("rollup_sink", 1))
    assert tx.latest_version() == before, "replayed txn must not commit"
    assert {
        (r["user_id"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in tx.snapshot(spark).collect()
    } == want


def test_rollup_sink_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Restart semantics: a second run over the SAME checkpoint after
    new files land must process ONLY the new micro-batches (Spark's
    file-source offset log) while the txn watermark keeps replays
    idempotent — the rollup converges to the batch answer across the
    restart."""
    import os

    from mnemo_spark.sources.txlog import TxTable
    from mnemo_spark.streaming.events import rollup_merge_sink

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    src = str(tmp_path / "src")
    os.makedirs(src)
    events.filter(F.col("ts") <= cut).coalesce(1).write.parquet(src + "/b0")

    def stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    tx_path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ck")
    q1 = rollup_merge_sink(stream(), tx_path, ckpt).start()
    q1.awaitTermination()
    tx = TxTable(tx_path)
    v_after_first = tx.latest_version()

    # new data lands; the SAME checkpoint resumes where it left off
    events.filter(F.col("ts") > cut).coalesce(1).write.parquet(src + "/b1")
    q2 = rollup_merge_sink(stream(), tx_path, ckpt).start()
    q2.awaitTermination()

    got = {
        (r["user_id"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in tx.snapshot(spark).collect()
    }
    want = {
        (r["user_id"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in events.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == want
    # the restart processed exactly the one new batch
    assert tx.latest_version() == v_after_first + 1
