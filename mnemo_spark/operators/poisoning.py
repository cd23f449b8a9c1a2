"""Poisoning defense (reference F17, query/poisoning.rs:1-364 +
anomaly gate wiring): lexical markers, repetition/self-reference
heuristics, and per-profile statistical z-checks produce quarantine
candidates — the MINJA/ASI06 defense surface, generalized to any
corpus table.

Three signals, one pass each:
- marker hits: `rlike` over a marker regex (injection phrases).
- repetition ratio: max token frequency / token count (token-stuffing
  attacks repeat the payload token).
- length z-score vs the per-group profile (agent_profiles A2 analog):
  |len - μ_group| / σ_group.

Scale: profiles are one groupBy over the corpus, broadcast back; the
signals are projections — the whole gate is ONE corpus-scalar shuffle
(the per-group profile aggregation, map-side combined to |groups|
rows) regardless of corpus size. The repetition ratio is computed
per-row with array_sort + aggregate (max run length in the sorted
token array ≡ max token frequency), so the corpus token stream never
shuffles and the per-doc stats never join back (r13 — the old shape
paid explode → groupBy(doc, term) → groupBy(doc) → corpus equi-join:
two token-volume shuffles plus a corpus-sized join, all to compute a
quantity each row can derive from its own tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mnemo_spark.functions.text import tokens

ROUND_DP = 6
DEFAULT_MARKERS = r"(ignore (all )?previous|disregard .*instructions|system prompt|do not tell)"


def poisoning_flags(
    docs: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    marker_regex: str = DEFAULT_MARKERS,
    z_threshold: float = 2.0,
    repetition_threshold: float = 0.2,
) -> DataFrame:
    """→ (id, group, marker_hit, repetition_ratio, len_z, flagged).

    flagged = any signal fires — the quarantine candidate set the
    reference writes back as `quarantined` (replayable, not deleted).
    """
    toks = tokens(text_col)
    # max token frequency per row, JVM-side: the longest equal run in
    # the SORTED token array is exactly max-over-terms count(term) —
    # no explode, no (doc, term) shuffle, no per-doc join-back. Docs
    # with zero tokens are dropped, matching the old inner join against
    # the exploded tf frame (explode of an empty array emits no row).
    _run = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1)
        .otherwise(F.lit(1).cast("long"))
        .alias("run"),
        F.greatest(
            acc["maxrun"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                F.lit(1).cast("long")
            ),
        ).alias("maxrun"),
    )
    maxtf = F.aggregate(
        F.array_sort("_toks"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("maxrun"),
        ),
        _run,
        lambda acc: acc["maxrun"],
    )
    base = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.col(text_col).rlike(marker_regex).alias("marker_hit"),
        F.length(text_col).cast("double").alias("_len"),
        toks.alias("_toks"),
    )
    profile = base.groupBy(group_col).agg(
        F.avg("_len").alias("_mu"),
        F.greatest(F.stddev_pop("_len"), F.lit(1e-6)).alias("_sigma"),
    )
    joined = (
        base.withColumn("_maxtf", maxtf)
        .withColumn("_ntok", F.size("_toks"))
        .filter(F.col("_ntok") > 0)
        .drop("_toks")
        .join(F.broadcast(profile), group_col)
        .withColumn(
            "repetition_ratio",
            F.round(
                F.when(F.col("_ntok") > 0, F.col("_maxtf") / F.col("_ntok")).otherwise(
                    0.0
                ),
                ROUND_DP,
            ),
        )
        .withColumn(
            "len_z",
            F.round(F.abs(F.col("_len") - F.col("_mu")) / F.col("_sigma"), ROUND_DP),
        )
    )
    return joined.select(
        id_col,
        group_col,
        "marker_hit",
        "repetition_ratio",
        "len_z",
        (
            F.col("marker_hit")
            | (F.col("repetition_ratio") > repetition_threshold)
            | (F.col("len_z") > z_threshold)
        ).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# v0.5.17 forged-reasoning defense (reference retrieval.rs:216-430
# ReasoningTrustPolicy) — the shared policy expressions engine.recall
# and the oracle-gated query both compose.
# ---------------------------------------------------------------------------

TRUSTED_REASONING = ("model_authored", "user_provided", "tool_verified")


def reasoning_authorship(metadata_col) -> "F.Column":
    """Parsed reasoning authorship with the reference's FAIL-CLOSED
    default: absent metadata, absent key, or unparseable JSON all read
    as 'unverified' (retrieval.rs:296-306 from_metadata)."""
    c = F.col(metadata_col) if isinstance(metadata_col, str) else metadata_col
    return F.coalesce(
        F.get_json_object(c, "$.reasoning_provenance.authorship"),
        F.lit("unverified"),
    )


def reasoning_admitted(metadata_col, trusted=TRUSTED_REASONING) -> "F.Column":
    """True iff the entry's reasoning provenance is in the trusted set
    (ReasoningTrustPolicy::admits_record)."""
    return reasoning_authorship(metadata_col).isin(*list(trusted))
