"""PII detection + scrubbing for training-data curation.

A 100-TB pre-training pipeline must strip personally identifiable
information before anything else consumes the text (the reference has
no media/PII pipeline; this extends the engine's curation family the
same way decontamination and quality sampling do). Everything is
`regexp_extract_all` / `regexp_replace` column arithmetic — codegen
speed, shuffle-free, and exactly oracle-twinned because the patterns
avoid constructs where RE2 (DuckDB) and java.util.regex diverge
(no backreferences, no lookaround).

Counting happens on the RAW text per pattern independently (a string
matched by two patterns counts in both — the audit wants per-type
totals); masking applies in a fixed order (email → ssn → phone → ip)
so the scrubbed output is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# single source of truth: the oracle SQL interpolates THESE constants
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\+?\d{3}[- .]\d{3}[- .]\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (name, pattern, mask) in masking order — SSN before phone so the
# 3-2-4 digit shape is claimed by the more specific pattern first
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
)


def pii_counts(text) -> dict[str, F.Column]:
    """Per-type match counts over the raw text column."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, n_email, n_ssn, n_phone, n_ip, scrubbed): per-type hit
    counts plus the masked text. Pure projection — at 100 TB this is a
    map-only pass that fuses into whatever scan feeds it."""
    text = F.col(text_col)
    counts = pii_counts(text)
    scrubbed = text
    for _, pat, mask in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, mask)
    return docs.select(
        F.col(id_col),
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
        scrubbed.alias("scrubbed"),
    )
