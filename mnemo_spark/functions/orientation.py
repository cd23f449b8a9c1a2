"""Orientation-cache distillation (reference F16,
query/orientation_cache.rs:1-739): compress a corpus slice into the
stable "orientation" facts an agent should re-read first — named
entities (Capitalized Phrases), UPPER_SNAKE = value constants, and
fenced schema blocks — deduped and packed under a token budget.

Pure column expressions (regexp_extract_all + dedup + budget slice);
the budget uses the ceil(chars/4) estimator (F13).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ENTITY_RE = r"((?:[A-Z][a-z0-9]+ )*[A-Z][a-z0-9]+)"
CONSTANT_RE = r"([A-Z][A-Z0-9_]{2,}\s*=\s*[^\s,;]+)"
FENCE_RE = r"```([\s\S]*?)```"


def extract_entities(text: Column) -> Column:
    """Capitalized multi-word entities, deduped, order of first use."""
    return F.array_distinct(F.regexp_extract_all(text, F.lit(ENTITY_RE), 1))


def extract_constants(text: Column) -> Column:
    """UPPER_SNAKE = value constant bindings."""
    return F.array_distinct(F.regexp_extract_all(text, F.lit(CONSTANT_RE), 1))


def extract_fenced(text: Column) -> Column:
    """Fenced ``` blocks (schemas/config), whitespace-trimmed
    (regexp strip — F.trim removes spaces but not newlines)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(FENCE_RE), 1),
        lambda b: F.regexp_replace(b, r"^\s+|\s+$", ""),
    )


def distill_orientation(text: Column, token_budget: int = 64) -> Column:
    """Entities + constants + fenced blocks, packed greedily (in that
    priority order) while ceil(chars/4) stays within the budget —
    returns the selected fragments as an array<string>."""
    frags = F.concat(extract_constants(text), extract_entities(text), extract_fenced(text))

    # running token cost per fragment via an aggregate fold that
    # carries (budget_left, selected); stays JVM-side
    packed = F.aggregate(
        frags,
        F.struct(
            F.lit(token_budget).alias("left"),
            F.array().cast("array<string>").alias("sel"),
        ),
        lambda acc, x: F.when(
            F.ceil(F.length(x) / 4).cast("int") <= acc["left"],
            F.struct(
                (acc["left"] - F.ceil(F.length(x) / 4).cast("int")).alias("left"),
                F.array_append(acc["sel"], x).alias("sel"),
            ),
        ).otherwise(acc),
    )
    return packed["sel"]
