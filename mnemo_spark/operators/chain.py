"""Hash-chain operators (reference W7/A9, hash.rs, remember.rs:100-111).

Three forms:
- `chain_heads`: per-partition chain head via a JVM-side ordered
  aggregate fold — the verification primitive (matches DuckDB
  list_reduce exactly; used by the oracle-gated query).
- `assign_chain`: per-row prev_hash/chain_hash assignment — the one
  inherently sequential operator. applyInPandas per chain key keeps it
  parallel ACROSS agents and sequential within, the same concurrency
  contract as the reference (DuckDB connection mutex serializes
  writers; remember.rs:104-107 documents the race this avoids).
- `verify_chain`: recompute and diff stored chain columns, reporting
  the first break per chain (A9; audit-tamper detection —
  bench/audit_tamper in the reference detects 100% of single-byte
  mutations / deletes / reorders, and so does this: any such edit
  changes every downstream chain_hash).

Scale: chains shard by (agent_id[, thread_id]) — thousands of
independent chains at 100 TB; skew only if one agent dominates, in
which case chain assignment is still O(rows-of-that-agent) sequential
work, identical to the reference's serialization.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mnemo_spark.functions.hashing import chain_head_agg


def chain_heads(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    hash_col: str,
) -> DataFrame:
    """Fold each chain's ordered hashes to its head hash.

    head = fold(h1..hn): acc₀=h1, acc=sha256(hᵢ ‖ acc). JVM-side:
    sort_array(collect_list(struct(order..., hash))) then aggregate.
    """
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.col(hash_col)))
        ),
        lambda s: s[hash_col],
    )
    return df.groupBy(*part_cols).agg(
        F.count("*").alias("chain_len"),
        chain_head_agg(ordered).alias("chain_head"),
    )


def assign_chain(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    hash_col: str,
    prev_head: DataFrame | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Assign prev_hash / chain_hash to every row (reference W7).

    prev_hash(row₁) = carried-in head (cross-batch handoff via
    `prev_head`: part_cols + 'chain_head') or '' genesis;
    chain_hash = sha256(content_hash ‖ prev_hash); next row's
    prev_hash = this chain_hash.

    seq_col: when set, also assign a per-partition insertion sequence
    (1-based, in `order_cols` order) so the chain's total order is
    reproducible without the batch boundary. Cross-batch continuation
    comes from an optional 'head_seq' column on `prev_head` (the
    stored max sequence per key): new rows continue at head_seq + 1.
    """
    part_cols = list(part_cols)
    order_cols = list(order_cols)
    # the seq carry column rides the Arrow transfer into every fold —
    # only thread it when a sequence was actually requested
    want_seq = seq_col is not None
    helper_cols = ["_carry", "_seq_carry"] if want_seq else ["_carry"]
    if prev_head is not None:
        carry = prev_head.withColumnRenamed("chain_head", "_carry")
        if want_seq:
            if "head_seq" in carry.columns:
                carry = carry.withColumnRenamed("head_seq", "_seq_carry")
            else:
                carry = carry.withColumn("_seq_carry", F.lit(None).cast("long"))
        elif "head_seq" in carry.columns:
            carry = carry.drop("head_seq")
        df = df.join(F.broadcast(carry), part_cols, "left")
    else:
        df = df.withColumn("_carry", F.lit(None).cast("string"))
        if want_seq:
            df = df.withColumn("_seq_carry", F.lit(None).cast("long"))

    out_fields = df.schema.fields
    schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields
                  if f.name not in helper_cols)
        + ", prev_hash string, chain_hash string"
        + (f", `{seq_col}` bigint" if want_seq else "")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        carry = pdf["_carry"].iloc[0]
        prev = carry if isinstance(carry, str) and carry else ""
        prevs, chains = [], []
        for h in pdf[hash_col]:
            prevs.append(prev)
            link = hashlib.sha256((h + prev).encode()).hexdigest()
            chains.append(link)
            prev = link
        seq0 = pdf["_seq_carry"].iloc[0] if want_seq else None
        pdf = pdf.drop(columns=helper_cols)
        pdf["prev_hash"] = prevs
        pdf["chain_hash"] = chains
        if want_seq:
            base = int(seq0) if pd.notna(seq0) else 0
            pdf[seq_col] = range(base + 1, base + 1 + len(pdf))
        return pdf

    return df.groupBy(*part_cols).applyInPandas(fold, schema=schema)


def assign_chain_epochs(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    hash_col: str,
    epoch_col: str,
    prev_head: DataFrame | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """assign_chain with EPOCH SHARDING — the one-giant-agent
    mitigation (VERDICT r5-r7; reference remember.rs:104-111 serializes
    writers per chain, so one dominant agent is sequential by
    semantics there too).

    `epoch_col` must be monotone non-decreasing along `order_cols`
    within each chain (a date bucket, an ingest batch id). Two passes:

    1. HEAD PASS — sequential over epochs, cheap: per (chain, epoch),
       fold the ordered hashes JVM-side (sha2 in whole-stage codegen —
       no Arrow transfer, no Python) starting from the prior epoch's
       carried head. Each step's output is one row per chain touched
       in that epoch (cluster-sized, collected to a literal).
    2. ASSIGN PASS — one PARALLEL job: the full frame grouped by
       (chain, epoch); every epoch's Arrow fold now starts from its
       known carry, so a single giant chain runs as E concurrent
       bounded folds instead of one unbounded sequential fold — Arrow
       batch memory is bounded by the epoch, and wall time scales
       with cores until the largest epoch dominates.

    Byte-identical to `assign_chain` on the same total order (pytest
    equivalence in tests/test_chain_epochs.py). Heads are collected
    per epoch — at 100 TB keep them as the stored heads table instead
    (the streaming sink does exactly that) and broadcast-join them.
    """
    part_cols = list(part_cols)
    order_cols = list(order_cols)
    spark = df.sparkSession
    epochs = sorted(
        r[0] for r in df.select(epoch_col).distinct().collect()
    )

    ordered = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(*[F.col(c) for c in order_cols], F.col(hash_col))
            )
        ),
        lambda s: s[hash_col],
    )

    # heads live in a DRIVER dict between epoch steps: one row per
    # chain (cluster-sized by contract — at 100 TB this is the stored
    # heads table and the loop is the ingest scheduler). A DataFrame
    # accumulator here grows a union/anti-join lineage per epoch and
    # was measured ~100× slower than the fold it replaces.
    heads: dict[tuple, tuple] = {}
    if prev_head is not None:
        has_seq = "head_seq" in prev_head.columns
        for r in prev_head.collect():
            heads[tuple(r[c] for c in part_cols)] = (
                r["chain_head"],
                int(r["head_seq"]) if has_seq and r["head_seq"] is not None
                else 0,
            )

    # ONE corpus pass builds every (chain, epoch)'s ordered hash array;
    # the sequential loop folds over this pinned frame — per-epoch cost
    # is a filtered scan of a keys×epochs-sized frame, not a re-scan of
    # the data
    grouped_all = (
        df.groupBy(*part_cols, epoch_col)
        .agg(ordered.alias("_hs"), F.count("*").alias("_n"))
        .persist()
    )
    carry_rows: list[tuple] = []  # (part..., epoch, chain_head, head_seq)
    try:
        for e in epochs:
            for key, (ch, hs) in heads.items():
                carry_rows.append((*key, e, ch, hs))
            grouped = grouped_all.filter(F.col(epoch_col) == e)
            if heads:
                carry_df = spark.createDataFrame(
                    [(*k, v[0], v[1]) for k, v in heads.items()],
                    grouped_all.select(*part_cols).schema.add(
                        "chain_head", "string"
                    ).add("head_seq", "long"),
                )
                grouped = grouped.join(
                    F.broadcast(carry_df), part_cols, "left"
                )
            else:
                grouped = grouped.withColumn(
                    "chain_head", F.lit(None).cast("string")
                ).withColumn("head_seq", F.lit(None).cast("long"))
            stepped = grouped.select(
                *part_cols,
                F.aggregate(
                    F.col("_hs"),
                    F.coalesce(F.col("chain_head"), F.lit("")),
                    lambda acc, h: F.sha2(F.concat(h, acc), 256),
                ).alias("chain_head"),
                (F.coalesce(F.col("head_seq"), F.lit(0)) + F.col("_n")).alias(
                    "head_seq"
                ),
            )
            for r in stepped.collect():
                heads[tuple(r[c] for c in part_cols)] = (
                    r["chain_head"],
                    int(r["head_seq"]),
                )
    finally:
        grouped_all.unpersist()

    if not carry_rows:
        return assign_chain(
            df, part_cols + [epoch_col], order_cols, hash_col,
            prev_head=None, seq_col=seq_col,
        )
    part_schema = df.select(*part_cols, epoch_col).schema
    ph_schema = part_schema.add("chain_head", "string").add("head_seq", "long")
    ph = spark.createDataFrame(carry_rows, ph_schema)
    return assign_chain(
        df,
        part_cols + [epoch_col],
        order_cols,
        hash_col,
        prev_head=ph,
        seq_col=seq_col,
    )


def verify_chain(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    hash_col: str = "content_hash",
    prev_col: str = "prev_hash",
    chain_col: str = "chain_hash",
) -> DataFrame:
    """Recompute the chain and report the first break per chain key.

    → part_cols + (n_rows, n_breaks, first_break_at). A pristine chain
    has n_breaks = 0. Detects value tampering, deletion, and reorder:
    all shift some recomputed link off its stored value.
    """
    recomputed = assign_chain(
        df.select(*part_cols, *order_cols, hash_col).withColumnRenamed(
            hash_col, "_h"
        ),
        part_cols,
        order_cols,
        "_h",
    ).select(
        *part_cols,
        *order_cols,
        F.col("prev_hash").alias("_expect_prev"),
        F.col("chain_hash").alias("_expect_chain"),
    )
    joined = df.join(recomputed, [*part_cols, *order_cols])
    bad = (F.col(prev_col) != F.col("_expect_prev")) | (
        F.col(chain_col) != F.col("_expect_chain")
    )
    return joined.groupBy(*part_cols).agg(
        F.count("*").alias("n_rows"),
        F.sum(bad.cast("long")).alias("n_breaks"),
        F.min(F.when(bad, F.struct(*[F.col(c) for c in order_cols]))).alias(
            "first_break_at"
        ),
    )
