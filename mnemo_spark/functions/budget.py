"""Recall budget planner for 1M-class context windows (reference
mnemo-core/src/budget/{models,planner}.rs): per-model context
windows with system/response reserves, a memory-vs-history share,
typed fallback strategies, and a recall plan (k, per-chunk token
budget, dedup radius) sized so the injection can never overflow the
window.

The planner itself is pure driver-side arithmetic (it runs once per
request); `apply_plan` is the Spark side — truncate + cap the ranked
hits under the plan, entirely relationally.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (total_tokens, system_reserve, response_reserve) per model id —
# mirrors the reference's MODEL_TABLE (budget/models.rs:51-117,
# vendor-doc numbers as of its 2026-04-28 refresh)
MODEL_TABLE: dict[str, tuple[int, int, int]] = {
    "gpt-5.1-400k": (400_000, 8_000, 16_000),
    "gpt-5.1-128k": (128_000, 4_000, 8_000),
    "claude-3.7-sonnet-1m": (1_000_000, 16_000, 32_000),
    "claude-3.7-sonnet-200k": (200_000, 8_000, 16_000),
    "gemini-2.5-pro-2m": (2_000_000, 16_000, 32_000),
    "gemini-2.5-pro-1m": (1_000_000, 8_000, 16_000),
    "deepseek-v4-1m": (1_000_000, 8_000, 24_000),
    "deepseek-v3-128k": (128_000, 4_000, 8_000),
}

TRUNCATE_OLDEST = "truncate_oldest"
DROP_DUPLICATES = "drop_duplicates"
NO_FALLBACK = "none"


@dataclass(frozen=True)
class ContextBudget:
    model: str
    total_tokens: int
    system_reserve: int
    response_reserve: int
    mem_share: float = 0.45  # planner.rs:19-21 default

    @classmethod
    def for_model(cls, model: str) -> "ContextBudget":
        if model not in MODEL_TABLE:
            raise ValueError(
                f"unknown model {model!r}; known: {sorted(MODEL_TABLE)}"
            )
        total, sysr, respr = MODEL_TABLE[model]
        return cls(model, total, sysr, respr)

    def with_mem_share(self, share: float) -> "ContextBudget":
        return ContextBudget(
            self.model,
            self.total_tokens,
            self.system_reserve,
            self.response_reserve,
            min(max(share, 0.0), 1.0),
        )

    def available(self) -> int:
        return max(
            0, self.total_tokens - self.system_reserve - self.response_reserve
        )

    def memory_budget(self) -> int:
        return int(self.available() * self.mem_share)


@dataclass(frozen=True)
class RecallPlan:
    k: int
    chunk_tokens: int
    dedup_radius: float
    fallback: str


def plan_recall(budget: ContextBudget, history_tokens: int) -> RecallPlan:
    """planner.rs:83-130 heuristics verbatim: fallback kicks in when
    history overruns its share (or aggressive dedup on 1M-class
    windows); chunk budget steps 256/512/1024 with window class; k
    spends ~70% of the memory budget on bodies, clamped to [1, 256]."""
    avail = budget.available()
    mem_budget = budget.memory_budget()
    history_share = max(0, avail - mem_budget)
    if history_tokens > history_share:
        fallback = TRUNCATE_OLDEST
    elif mem_budget > 100_000:
        fallback = DROP_DUPLICATES
    else:
        fallback = NO_FALLBACK
    if budget.total_tokens >= 800_000:
        chunk_tokens = 1024
    elif budget.total_tokens >= 200_000:
        chunk_tokens = 512
    else:
        chunk_tokens = 256
    usable = int(mem_budget * 0.7)
    k = min(max(usable // chunk_tokens, 1), 256)
    dedup_radius = 0.92 if budget.total_tokens >= 800_000 else 0.88
    return RecallPlan(k, chunk_tokens, dedup_radius, fallback)


def apply_plan(
    hits: DataFrame,
    plan: RecallPlan,
    content_col: str = "content",
    rank_col: str = "rank",
) -> DataFrame:
    """Enforce the plan relationally over ranked recall hits: keep
    the top-k, truncate each body to the per-chunk token budget
    (ceil(chars/4) token estimate, F13), and report the estimated
    token spend so callers can assert the no-overflow invariant."""
    kept = hits.filter(F.col(rank_col) <= plan.k)
    max_chars = plan.chunk_tokens * 4
    return kept.withColumn(
        content_col, F.substring(F.col(content_col), 1, max_chars)
    ).withColumn(
        "est_tokens", F.ceil(F.length(content_col) / 4.0).cast("long")
    )
