"""Text primitives: tokenize, shingle, counts, excerpts.

Cross-engine contract (must match the DuckDB oracle bit-for-bit):
  tokens(text)   = regexp_extract_all(lower(text), '[a-z0-9]+')
  shingle k      = space-joined runs of k consecutive tokens
  token_estimate = ceil(length(text) / 4)        (reference F13,
                   query/retained.rs token heuristic)
  excerpt        = first non-empty line, char-capped (reference F12,
                   recall.rs:1096-1106)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """Lower-cased alphanumeric tokens as an array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def shingles(tok: Column, k: int = 3) -> Column:
    """Word k-shingles: space-joined runs of k consecutive tokens.

    Built with higher-order functions (transform over an index
    sequence + 1-based element_at) so the whole thing stays JVM-side.
    Documents shorter than k tokens yield an empty array.
    """
    # guard: sequence(1, 0) would DESCEND in Spark — short docs get []
    idx = F.when(
        F.size(tok) >= k, F.sequence(F.lit(1), F.size(tok) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    parts = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tok, i + j) for j in range(k)]
    )
    return F.transform(idx, parts)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def token_estimate(col: Column | str) -> Column:
    """ceil(chars/4) — the reference's token-cost heuristic (F13)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.ceil(F.length(c) / F.lit(4)).cast("long")


def excerpt(col: Column | str, max_chars: int = 120) -> Column:
    """First non-empty line of content, capped at max_chars (F12)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, "\n"), lambda x: F.length(F.trim(x)) > 0)
    # F.get is null-safe on empty arrays (element_at throws under ANSI)
    first = F.coalesce(F.get(lines, 0), F.lit(""))
    return F.substring(first, 1, max_chars)


# GPT-2-style pre-tokenizer, restricted to the RE2 ∩ java.util.regex
# common subset (the upstream pattern's trailing-space lookahead is
# dropped — lookaround doesn't exist in RE2, and the count differs
# only on runs of trailing whitespace): contractions, space-prefixed
# letter runs, digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """Sub-word-shaped token count: the number of GPT-2-style
    pre-tokens is the standard fast proxy for BPE token cost (every
    BPE merge happens INSIDE one pre-token, so this upper-bounds the
    sequence length far tighter than ceil(chars/4))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0))


def chunk_text(
    col: Column | str, size: int = 200, stride: int = 150
) -> Column:
    """Overlapping character chunks: array of substrings starting at
    1, 1+stride, 1+2·stride, … each `size` chars (the last one
    shorter). stride < size gives the overlap embedding pipelines use
    so no boundary context is lost. Pure column expression — chunking
    fuses into the scan, and the downstream explode is map-side."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    c = F.col(col) if isinstance(col, str) else col
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(c) - 1, F.lit(1)),
        F.lit(stride),
    )
    return F.transform(starts, lambda s: F.substring(c, s, size))
