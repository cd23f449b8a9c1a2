"""Reflection-pass text rewrites (reference F9,
query/reflection.rs:305-400): date absolutization — relative phrases
("yesterday", "3 days ago", "in 2 weeks") rewritten to ISO dates
anchored at each record's created_at, so consolidated memories stay
meaningful after time passes.

Implementation note: this was originally a chain of 7 nested
regexp_replace/when column expressions. Each step referenced the
previous output 3x, so the expression TREE grew ~3^7 — fine when
applied once at the top of a plan, but nesting it under a filter plus
a conditional rewrite plus a re-hash (as the reflection pass does)
overflowed whole-stage codegen. A vectorized Arrow-batched pandas UDF
keeps the per-row work identical (same patterns, same first-match
quantity semantics, same sequential application order) with a
constant-size plan node. The DuckDB oracle for
`date_absolutize_events` is unchanged and still passes — the UDF is
behaviorally identical to the expression form.
"""

from __future__ import annotations

import datetime as dt
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# (compiled regex, quantity multiplier in days or None for fixed, sign)
_PATTERNS = [
    (re.compile(r"\byesterday\b"), None, -1),
    (re.compile(r"\btomorrow\b"), None, 1),
    (re.compile(r"\btoday\b"), None, 0),
    (re.compile(r"\b(\d+) days? ago\b"), 1, -1),
    (re.compile(r"\b(\d+) weeks? ago\b"), 7, -1),
    (re.compile(r"\bin (\d+) days?\b"), 1, 1),
    (re.compile(r"\bin (\d+) weeks?\b"), 7, 1),
]


def rewrite_relative_dates(text: str | None, anchor_day: dt.date | None) -> str | None:
    """Sequentially apply each pattern family. Quantity families take
    the FIRST match's quantity and rewrite every occurrence of the
    family to that date (the reference rewriter's per-family
    behavior, preserved from the original expression form)."""
    if text is None or anchor_day is None:
        return text
    for rx, mult, sign in _PATTERNS:
        if mult is None:
            iso = (anchor_day + dt.timedelta(days=sign)).strftime("%Y-%m-%d")
            text = rx.sub(iso, text)
        else:
            m = rx.search(text)
            if m:
                n = int(m.group(1))
                iso = (anchor_day + dt.timedelta(days=n * mult * sign)).strftime(
                    "%Y-%m-%d"
                )
                text = rx.sub(iso, text)
    return text


def _absolutize_batch(text: pd.Series, anchor: pd.Series) -> pd.Series:
    days = pd.to_datetime(anchor).dt.date
    return pd.Series(
        [
            rewrite_relative_dates(t, d if not pd.isna(d) else None)
            for t, d in zip(text, days)
        ],
        dtype="object",
    )


def absolutize_dates(text: Column, anchor: Column) -> Column:
    """Rewrite every supported relative-date phrase in `text` to the
    ISO date it denotes relative to `anchor` (a date/timestamp).

    The pandas_udf is constructed here, not at module scope — executor
    processes import this module while unpickling, and the decorator
    needs an active session."""
    udf = F.pandas_udf(_absolutize_batch, "string")
    return udf(text, anchor.cast("timestamp"))
