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


def test_stream_chain_out_of_order_diverges_but_links(spark, sf_dir, tmp_path, rocksdb):
    """Documented contract: a late event (earlier ts arriving in a
    later micro-batch) chains in ARRIVAL order, so the stream result
    diverges from the batch fold — but every chain stays internally
    linked (append-only audit semantics: committed hashes are never
    rewritten to re-admit a late row)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") == 1)
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    late = events.filter(F.col("ts") <= cutoff)
    early_arriving = events.filter(F.col("ts") > cutoff)
    assert late.count() > 0 and early_arriving.count() > 0

    src = str(tmp_path / "src")
    os.makedirs(src)
    # LATER event-time rows arrive first; earlier rows arrive second
    early_arriving.coalesce(1).write.parquet(src + "/b0")
    late.coalesce(1).write.parquet(src + "/b1")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        chained_hashes_stream(stream)
        .writeStream.format("memory")
        .queryName("chain_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("chain_ooo").collect()

    batch = {
        r.event_id: (r.prev_hash, r.chain_hash)
        for r in assign_chain(
            events.withColumn(
                "content_hash",
                F.sha2(
                    F.concat_ws(
                        "|",
                        F.col("event_id").cast("string"),
                        F.col("event_type"),
                        F.col("value").cast("decimal(18,2)").cast("string"),
                    ),
                    256,
                ),
            ),
            ["user_id"],
            ["ts", "event_id"],
            "content_hash",
        ).collect()
    }
    # divergence is explicit: at least one event hashes differently
    diverged = [r for r in streamed if batch[r.event_id][1] != r.chain_hash]
    assert diverged, "out-of-order arrival must diverge from the batch fold"
    # ...but the streamed chain itself stays linked in arrival order
    by_arrival = {}
    for r in streamed:
        by_arrival.setdefault(r.user_id, []).append(r)
    for seq in by_arrival.values():
        assert seq[0].prev_hash == ""
        for prev, cur in zip(seq, seq[1:]):
            assert cur.prev_hash == prev.chain_hash
