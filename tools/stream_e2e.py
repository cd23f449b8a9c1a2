"""Streaming end-to-end at scale (VERDICT r9 #7): the pieces proven at
test scale — recall-index maintenance, the chained-hash sink — run as
one pipeline over a full sf corpus, with throughput and exactly-once/
bit-identity evidence recorded.

Pipeline A (write path of hybrid recall, reference remember.rs:168-177):
  documents --(file stream, N arrival files, maxFilesPerTrigger=1)-->
  recall_index_sink (per-doc stats, LWW merge, txn epochs) -->
  recall_scored_from_index === scored_from_perdoc(batch) [bit-identical]

Pipeline B (audit chain, reference storage/mod.rs:156-166):
  events --(file stream, ts-ordered arrival files)-->
  chain_merge_sink (per-user hash chains, carried heads) -->
  verify_chain: zero breaks AND === one-shot batch assign_chain

Usage: python tools/stream_e2e.py [sf_dir] [n_files]
Prints one JSON line with docs/s, events/s, per-batch latency, and the
identity-check verdicts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mnemo_spark.io import load_table  # noqa: E402
from mnemo_spark.operators.chain import assign_chain, verify_chain  # noqa: E402
from mnemo_spark.operators.recall_core import (  # noqa: E402
    perdoc_stats,
    scored_from_perdoc,
)
from mnemo_spark.session import get_spark  # noqa: E402
from mnemo_spark.streaming.events import chain_merge_sink  # noqa: E402
from mnemo_spark.streaming.index_maint import (  # noqa: E402
    recall_index_sink,
    recall_scored_from_index,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _split_files(df, src: str, n_files: int, order_col: str) -> None:
    """N ts-ordered arrival files (ntile over the order column keeps
    arrival order == chain order, the chain sink's documented
    precondition)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(order_col))
    parts = df.withColumn("_b", F.ntile(n_files).over(w))
    for i in range(1, n_files + 1):
        parts.filter(F.col("_b") == i).drop("_b").coalesce(1).write.parquet(
            f"{src}/b{i:03d}"
        )


def _progress(q) -> dict:
    durs = [
        p["batchDuration"] / 1000.0
        for p in (json.loads(x) if isinstance(x, str) else x for x in q.recentProgress)
        if p.get("batchDuration")
    ]
    return {
        "n_batches": len(durs),
        "mean_batch_s": round(sum(durs) / len(durs), 3) if durs else None,
        "max_batch_s": round(max(durs), 3) if durs else None,
    }


def _identical(a, b) -> bool:
    return a.exceptAll(b).limit(1).count() == 0 and b.exceptAll(a).limit(1).count() == 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("stream_e2e")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_e2e_")
    out: dict = {"sf_dir": sf_dir, "n_arrival_files": n_files}

    # ---- pipeline A: recall-index maintenance over documents --------
    docs = load_table(spark, sf_dir, "documents").select(*DOC_COLS)
    n_docs = docs.count()
    src_a = f"{work}/docs_src"
    os.makedirs(src_a)
    _split_files(docs, src_a, n_files, "doc_id")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_a)
    )
    tx_path, ckpt = f"{work}/recall_index", f"{work}/ckpt_a"
    t0 = time.monotonic()
    q = recall_index_sink(stream, tx_path, ckpt).start()
    q.awaitTermination()
    wall_a = time.monotonic() - t0
    streamed = recall_scored_from_index(spark, tx_path)
    batch = scored_from_perdoc(perdoc_stats(docs))
    t1 = time.monotonic()
    identical_a = _identical(streamed, batch)
    serve_s = round(time.monotonic() - t1, 3)
    out["recall_index"] = {
        "n_docs": n_docs,
        "ingest_wall_s": round(wall_a, 2),
        "docs_per_s": round(n_docs / wall_a, 1),
        **_progress(q),
        "streamed_equals_batch": identical_a,
        "serving_read_plus_identity_s": serve_s,
    }

    # ---- pipeline B: chained-hash sink over events -------------------
    events = load_table(spark, sf_dir, "events").select(
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
    n_events = events.count()
    src_b = f"{work}/events_src"
    os.makedirs(src_b)
    _split_files(events, src_b, n_files, "ts")
    stream_b = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_b)
    )
    sink, ckpt_b = f"{work}/chain_sink", f"{work}/ckpt_b"
    t0 = time.monotonic()
    qb = chain_merge_sink(stream_b, sink, ckpt_b).start()
    qb.awaitTermination()
    wall_b = time.monotonic() - t0
    chained = spark.read.parquet(sink)
    breaks = (
        verify_chain(chained, ["user_id"], ["ts", "event_id"], "ch")
        .agg(F.sum("n_breaks"))
        .collect()[0][0]
        or 0
    )
    breaks = int(breaks)
    want = assign_chain(events, ["user_id"], ["ts", "event_id"], "ch")
    identical_b = _identical(
        chained.select("user_id", "event_id", "prev_hash", "chain_hash"),
        want.select("user_id", "event_id", "prev_hash", "chain_hash"),
    )
    out["chain_sink"] = {
        "n_events": n_events,
        "ingest_wall_s": round(wall_b, 2),
        "events_per_s": round(n_events / wall_b, 1),
        **_progress(qb),
        "chain_breaks": breaks,
        "streamed_equals_batch": identical_b,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
