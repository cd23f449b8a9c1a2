"""Reflection-pass text rewrites (reference F9,
query/reflection.rs:305-400): date absolutization — relative phrases
("yesterday", "3 days ago", "in 2 weeks") rewritten to ISO dates
anchored at each record's created_at, so consolidated memories stay
meaningful after time passes.

Pure column expressions: regexp_extract pulls the quantity,
date_add/date_sub compute the anchor offset, regexp_replace splices
the ISO date back in. One pattern family per step; steps compose.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PATTERNS = [
    # (regex, n_extract_group or fixed offset days, sign)
    (r"\byesterday\b", None, -1),
    (r"\btomorrow\b", None, 1),
    (r"\btoday\b", None, 0),
    (r"\b(\d+) days? ago\b", 1, -1),
    (r"\b(\d+) weeks? ago\b", 7, -1),
    (r"\bin (\d+) days?\b", 1, 1),
    (r"\bin (\d+) weeks?\b", 7, 1),
]


def absolutize_dates(text: Column, anchor: Column) -> Column:
    """Rewrite every supported relative-date phrase in `text` to the
    ISO date it denotes relative to `anchor` (a date/timestamp)."""
    out = text
    day = F.to_date(anchor)
    for pattern, mult, sign in _PATTERNS:
        if mult is None:
            iso = F.date_format(F.date_add(day, sign), "yyyy-MM-dd")
            out = F.regexp_replace(out, pattern, iso)
        else:
            # quantity from the FIRST match; strings with several
            # different quantities of the same family keep the first
            # (same per-family behavior as the reference's rewriter)
            n = F.regexp_extract(out, pattern, 1).cast("int")
            offset = (n * mult * sign).cast("int")
            iso = F.date_format(F.date_add(day, offset), "yyyy-MM-dd")
            out = F.when(
                F.regexp_extract(out, pattern, 0) != "",
                F.regexp_replace(out, pattern, iso),
            ).otherwise(out)
    return out
