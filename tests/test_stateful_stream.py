"""transformWithState chain assignment: the cross-batch streaming twin
of operators/chain.assign_chain must produce byte-identical chains to
the batch fold when micro-batches arrive in event-time order."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mnemo_spark.io import load_table
from mnemo_spark.operators.chain import assign_chain
from mnemo_spark.streaming.events import chained_hashes_stream


@pytest.fixture()
def rocksdb(spark):
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    yield
    if old:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_chain_matches_batch(spark, sf_dir, tmp_path, rocksdb):
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)

    src = str(tmp_path / "src")
    os.makedirs(src)
    # two files, split on event-time order, so the second micro-batch
    # genuinely exercises the cross-batch state handoff
    half1 = events.filter(F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp"))
    half2 = events.filter(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
    assert half1.count() > 0 and half2.count() > 0
    half1.coalesce(1).write.parquet(src + "/b0")
    half2.coalesce(1).write.parquet(src + "/b1")

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = chained_hashes_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("chain_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: (r["prev_hash"], r["chain_hash"])
        for r in spark.table("chain_stream").collect()
    }

    hashed = events.select(
        "user_id",
        "ts",
        "event_id",
        F.sha2(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("event_type"),
                F.col("value").cast("decimal(18,2)").cast("string"),
            ),
            256,
        ).alias("ch"),
    )
    want = {
        r["event_id"]: (r["prev_hash"], r["chain_hash"])
        for r in assign_chain(hashed, ["user_id"], ["ts", "event_id"], "ch").collect()
    }
    assert len(got) == len(want) > 0
    assert got == want
