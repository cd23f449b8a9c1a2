"""Incremental recall-index maintenance — the streaming write path of
the hybrid-recall core.

The reference maintains its retrieval indexes ON EVERY WRITE:
`remember.rs:168-177` runs insert → vector-index add → full-text
add+commit inside the remember path, so recall always reads an index
that is current up to the last write. The batch engine's equivalent
index is the per-doc statistics frame (operators/recall_core.py) —
and because every row of that frame is a function of its OWN document
only, it is exactly the shape that can be maintained incrementally:

  micro-batch of (doc_id, text, n_chars, source)
    -> perdoc_stats(batch)          per-doc lane statistics, batch-local
    -> LWW MERGE by doc_id          a rewritten doc replaces its row
    -> TxTable commit               txn epoch => exactly-once on replay

Corpus-level scalars (N, avgdl, per-term df) are NOT maintained: they
are a 1-row aggregate over the maintained frame, re-derived at query
time by `recall_scored_from_index` — the same split Lucene makes
between per-segment postings (incremental) and global stats (computed
at search time across segments).

Scale: each micro-batch tokenizes ONLY its own documents; the merge
rewrite is bounded by the current table (at 100 TB the txlog's
file-stats pruning scopes the copy-on-write to files whose doc_id
ranges intersect the batch — TxTable.merge documents the same bound).
A replayed micro-batch (restart between write and epoch commit) sees
its batch_id ≤ the txn watermark and skips — the Delta
txnAppId/txnVersion pattern, proven by test replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mnemo_spark.operators.recall_core import perdoc_stats, scored_from_perdoc


def recall_index_sink(
    doc_stream: DataFrame,
    tx_path: str,
    checkpoint_dir: str,
    app_id: str = "recall_index",
):
    """foreachBatch sink maintaining the per-doc recall index in a
    TxTable at `tx_path`. Returns the DataStreamWriter (caller
    starts it)."""
    from mnemo_spark.sources.txlog import TxTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tx = TxTable(tx_path)
        stats = perdoc_stats(batch_df)
        if tx.latest_version() is None:
            tx.commit(stats, mode="append", txn=(app_id, batch_id))
            return
        last = tx.last_txn(app_id)
        if last is not None and batch_id <= last:
            return  # replayed epoch: already durable
        survivors = tx.snapshot(spark).join(
            stats.select("doc_id"), "doc_id", "left_anti"
        )
        tx.commit(
            survivors.unionByName(stats),
            mode="overwrite",
            txn=(app_id, batch_id),
        )

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def recall_scored_from_index(spark: SparkSession, tx_path: str) -> DataFrame:
    """Lane scores over the MAINTAINED index table — bit-identical to
    `recall_core.recall_scored` over the same corpus (the equivalence
    the stream test proves): per-doc rows come from the table, corpus
    scalars are re-derived at query time."""
    from mnemo_spark.sources.txlog import TxTable

    return scored_from_perdoc(TxTable(tx_path).snapshot(spark))
