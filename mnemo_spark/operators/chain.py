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
from mnemo_spark.io import fold_partitions


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

    # ONE Arrow stream per partition instead of one per group (r13):
    # the exchange stays pinned at full reduce parallelism inside
    # fold_partitions (the repartition_for_fold rationale), and the
    # per-group IPC round-trip — measured ~15 ms/group, 95% of the
    # fold stage's executorRunTime — collapses to a vectorized
    # boundary scan per partition batch.
    return fold_partitions(df, part_cols, order_cols, fold, schema)


def assign_chain_auto(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    hash_col: str,
    prev_head: DataFrame | None = None,
    seq_col: str | None = None,
    epoch_col: str | None = None,
    crossover_rows: int | None = None,
    n_epochs: int = 16,
    stats: "tuple | None" = None,
) -> DataFrame:
    """ONE code path for chain assignment (VERDICT r9 #6): pick the
    single per-chain fold below the measured epoch-fold crossover and
    the epoch-sharded form above it, so callers no longer opt in to
    `assign_chain_epochs` by hand.

    The crossover is MEASURED, not guessed: docs/benchmarks/
    chain_epochs_growth_r9.json demonstrates the epoch form winning
    from ~2x the sf0.1 one-agent chain (~200k rows/chain) onward, with
    the gap widening 1.6x per doubling — below it the single fold's
    lower fixed cost wins. Default threshold 200_000 rows
    (MNEMO_CHAIN_EPOCH_CROSSOVER env-overridable for cluster-measured
    values).

    One agg job decides: per-chain row counts (max), plus the global
    min/max of the leading order column — or zero jobs when the
    caller passes `stats=(max_chain_rows, lead_min, lead_max,
    lead_has_null)` folded into an action it already runs (the
    engine's write path merges this into its validation agg, keeping
    remember_batch at one decision job). Above the crossover,
    `epoch_col` (a caller's natural bucket) is used when given;
    otherwise an epoch is DERIVED as equal-width buckets of the
    leading order column between its global min/max — monotone
    non-decreasing along order_cols by construction, so the epoch
    contract holds and the output is byte-identical to the single
    fold (tests/test_chain_epochs.py proves identity for any valid
    epoch choice). A NULL leading order value (or, when no epoch_col
    is given, a leading column that is not numeric or timestamp —
    DATE included, it cannot cast to double) falls back to the single
    fold — never a guessed bucket.
    """
    import os

    from pyspark.sql.types import (
        NumericType,
        TimestampType,
    )

    if crossover_rows is None:
        crossover_rows = int(
            os.environ.get("MNEMO_CHAIN_EPOCH_CROSSOVER", "200000")
        )
    part_cols = list(part_cols)
    order_cols = list(order_cols)
    lead = order_cols[0]
    lead_t = df.schema[lead].dataType
    # DateType deliberately excluded: Spark cannot cast DATE → DOUBLE,
    # so a date-ordered chain takes the single-fold fallback (callers
    # with a natural date bucket pass it as epoch_col instead)
    derivable = isinstance(lead_t, (NumericType, TimestampType))

    if stats is not None:
        maxn, gmin, gmax, has_null = stats
    else:
        agg = (
            df.groupBy(*part_cols)
            .agg(
                F.count("*").alias("_n"),
                F.min(lead).alias("_mn"),
                F.max(lead).alias("_mx"),
                F.max(F.col(lead).isNull().cast("int")).alias("_null"),
            )
            .agg(
                F.max("_n").alias("maxn"),
                F.min("_mn").alias("gmin"),
                F.max("_mx").alias("gmax"),
                F.max("_null").alias("has_null"),
            )
            .collect()
        )
        row = agg[0] if agg else None
        maxn = row["maxn"] if row is not None else None
        gmin = row["gmin"] if row is not None else None
        gmax = row["gmax"] if row is not None else None
        has_null = bool(row["has_null"]) if row is not None else True
    big = maxn is not None and maxn > crossover_rows
    if not big or (epoch_col is None and (not derivable or has_null)):
        return assign_chain(
            df, part_cols, order_cols, hash_col, prev_head, seq_col
        )
    if epoch_col is not None:
        return assign_chain_epochs(
            df, part_cols, order_cols, hash_col, epoch_col, prev_head, seq_col
        )
    v = F.col(lead).cast("double")
    lo, hi = (
        F.lit(gmin).cast(lead_t).cast("double"),
        F.lit(gmax).cast(lead_t).cast("double"),
    )
    width = (hi - lo) / F.lit(float(n_epochs))
    # clamped BOTH ends: callers may pass stats measured before a
    # transform that shifts the order column (the engine's backdated-
    # write guard bumps created_at); clamping keeps the bucket
    # monotone and in-range for any value
    bucket = F.when(width > 0, F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(n_epochs - 1).cast("long"),
            F.floor((v - lo) / width),
        ),
    )).otherwise(F.lit(0).cast("long"))
    out = assign_chain_epochs(
        df.withColumn("_auto_epoch", bucket),
        part_cols,
        order_cols,
        hash_col,
        "_auto_epoch",
        prev_head,
        seq_col,
    )
    return out.drop("_auto_epoch")


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

    `epoch_col` must be non-NULL and monotone non-decreasing along
    `order_cols` within each chain (a date bucket, an ingest batch
    id) — both contract violations FAIL LOUDLY in-plan (ADVICE r8;
    previously a NULL epoch raised an opaque TypeError and a
    non-monotone epoch silently produced mis-ordered chains). Two
    passes, ONE job each (VERDICT r8 #4 — the previous head pass ran
    E sequential driver-scheduled jobs, a fixed ~6.3 s of job-floor
    at 16 epochs regardless of data size):

    1. HEAD PASS — entirely JVM-side, no driver loop: per (chain,
       epoch) the ordered hash arrays aggregate once, then ONE
       higher-order `aggregate` per chain folds its epoch arrays in
       epoch order (sha2 stays in codegen), emitting every epoch's
       carry-in head + sequence base. The inherently sequential carry
       chain (sha256(h‖acc) is not associative) runs WITHIN one task
       per chain, parallel ACROSS chains; the same fold tracks
       per-epoch (min, max) order keys and flags monotonicity
       violations, surfaced as `raise_error` in the carry projection.
    2. ASSIGN PASS — one PARALLEL job: the full frame grouped by
       (chain, epoch); every epoch's Arrow fold starts from its
       broadcast carry, so a single giant chain runs as E concurrent
       bounded folds instead of one unbounded sequential fold — Arrow
       batch memory is bounded by the epoch, and wall time scales
       with cores until the largest epoch dominates.

    Byte-identical to `assign_chain` on the same total order (pytest
    equivalence in tests/test_chain_epochs.py). Memory shape: the
    head pass co-locates one chain's HASH COLUMN (64 B/row) per task
    — far smaller than the single fold's full-row Arrow transfer; for
    a chain whose bare hashes exceed task memory, keep heads as the
    stored heads table and let the ingest scheduler carry them across
    batches (the streaming sink does exactly that).
    """
    part_cols = list(part_cols)
    order_cols = list(order_cols)

    ordered = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(*[F.col(c) for c in order_cols], F.col(hash_col))
            )
        ),
        lambda s: s[hash_col],
    )
    okey = F.struct(*[F.col(c) for c in order_cols])
    grouped = df.groupBy(*part_cols, epoch_col).agg(
        ordered.alias("_hs"),
        F.count("*").alias("_n"),
        F.min(okey).alias("_omin"),
        F.max(okey).alias("_omax"),
    )
    eps = F.struct(
        F.col(epoch_col).alias("e"),
        F.col("_omin").alias("mn"),
        F.col("_omax").alias("mx"),
        F.col("_hs").alias("hs"),
        F.col("_n").alias("n"),
    )
    per_chain = grouped.groupBy(*part_cols).agg(
        # sorts by the leading field `e`; epochs are unique per chain
        # (the groupBy key), NULLs first — caught by the raise below
        F.sort_array(F.collect_list(eps)).alias("_eps")
    )
    if prev_head is not None:
        carry = prev_head.withColumnRenamed("chain_head", "_carry0")
        if "head_seq" in carry.columns:
            carry = carry.withColumnRenamed("head_seq", "_seq0")
        else:
            carry = carry.withColumn("_seq0", F.lit(None).cast("long"))
        per_chain = per_chain.join(F.broadcast(carry), part_cols, "left")
    else:
        per_chain = per_chain.withColumn(
            "_carry0", F.lit(None).cast("string")
        ).withColumn("_seq0", F.lit(None).cast("long"))

    epoch_t = df.schema[epoch_col].dataType.simpleString()
    order_t = ",".join(
        f"`{c}`:{df.schema[c].dataType.simpleString()}" for c in order_cols
    )
    zero = F.struct(
        F.coalesce(F.col("_carry0"), F.lit("")).alias("h"),
        F.coalesce(F.col("_seq0"), F.lit(0)).cast("long").alias("s"),
        F.lit(None).cast(f"struct<{order_t}>").alias("pm"),
        F.lit(False).alias("v"),
        F.array().cast(f"array<struct<e:{epoch_t},h:string,s:bigint>>").alias("o"),
    )

    def _step(acc, x):
        return F.struct(
            # the carry INTO epoch x is recorded BEFORE folding x's
            # hashes — identical to assign_chain's per-row semantics
            F.aggregate(
                x["hs"], acc["h"], lambda a, hh: F.sha2(F.concat(hh, a), 256)
            ).alias("h"),
            (acc["s"] + x["n"]).alias("s"),
            x["mx"].alias("pm"),
            (acc["v"] | (acc["pm"].isNotNull() & (acc["pm"] > x["mn"]))).alias(
                "v"
            ),
            F.concat(
                acc["o"],
                F.array(
                    F.struct(
                        x["e"].alias("e"), acc["h"].alias("h"), acc["s"].alias("s")
                    )
                ),
            ).alias("o"),
        )

    folded = per_chain.select(
        *part_cols,
        F.aggregate(
            F.col("_eps"),
            zero,
            _step,
            lambda acc: F.struct(acc["v"].alias("v"), acc["o"].alias("o")),
        ).alias("_agg"),
    )
    ph = folded.select(
        *part_cols,
        F.col("_agg.v").alias("_v"),
        # chain-level NULL flag so the diagnostic names the real
        # contract break (a NULL epoch sorts first and usually trips
        # the monotone flag too)
        F.exists("_agg.o", lambda x: x["e"].isNull()).alias("_null_e"),
        F.explode("_agg.o").alias("_x"),
    ).select(
        *part_cols,
        F.col("_x.e").alias(epoch_col),
        F.when(
            F.col("_null_e"),
            F.raise_error(
                F.lit(
                    f"assign_chain_epochs: NULL value in epoch column"
                    f" {epoch_col!r} — every row must carry an epoch"
                )
            ),
        )
        .when(
            F.col("_v"),
            F.raise_error(
                F.lit(
                    f"assign_chain_epochs: epoch column {epoch_col!r} is not"
                    f" monotone non-decreasing along order_cols"
                    f" {order_cols} within a chain — refusing to emit a"
                    " mis-ordered chain"
                )
            ),
        )
        .otherwise(F.col("_x.h"))
        .alias("chain_head"),
        F.col("_x.s").alias("head_seq"),
    )
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
