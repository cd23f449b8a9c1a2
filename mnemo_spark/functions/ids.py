"""Time-ordered id generation (reference F14, memory.rs:44 — UUIDv7
primary keys) and the graph edge-extractor gate (reference U5,
mnemo-graph/src/extract.rs:1-29).

UUIDv7 layout (RFC 9562): 48-bit unix-epoch milliseconds, 4-bit
version (7), 12 random bits, 2-bit variant (10), 62 random bits. The
point of v7 over v4 is that lexicographic id order IS time order —
which is exactly what chain assignment and current-fact resolution
sort on. The random bits here are derived deterministically from an
entropy column (sha-256), because a reproducible batch engine must
produce the same ids on re-run — the "random" field's only job is
collision avoidance within one millisecond, which a per-row entropy
hash provides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def uuidv7(ts: Column, entropy: Column) -> Column:
    """Deterministic UUIDv7 string from a timestamp + entropy column.

    ts: timestamp column (millisecond precision is encoded; RFC 9562
    field layout). entropy: any column unique per row at the same
    millisecond (e.g. content, or a source id).
    """
    millis_hex = F.lpad(F.lower(F.hex(F.unix_millis(ts))), 12, "0")
    h = F.sha2(F.concat_ws("|", ts.cast("string"), entropy.cast("string")), 256)
    # rand_a: 12 bits -> 3 hex chars from the hash
    rand_a = F.substring(h, 1, 3)
    # variant: top 2 bits '10' -> first hex digit in {8,9,a,b}
    variant_digit = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")),
        (F.conv(F.substring(h, 4, 1), 16, 10).cast("int") % 4) + 1,
    )
    rand_b_head = F.substring(h, 5, 3)
    rand_b_tail = F.substring(h, 8, 12)
    return F.concat_ws(
        "-",
        F.substring(millis_hex, 1, 8),
        F.substring(millis_hex, 9, 4),
        F.concat(F.lit("7"), rand_a),
        F.concat(variant_digit, rand_b_head),
        rand_b_tail,
    )


def extract_edges(spark: SparkSession, memories: DataFrame) -> DataFrame:
    """U5 edge-extractor gate (mnemo-graph/src/extract.rs:1-29).

    The reference feature-gates an LLM relation extractor and ships a
    stub returning `[]` ("shipping a half-tuned extractor would land
    bad edges"). Mirrored here: the REAL implementation slot is a
    mapInPandas batch LLM call over `content` (the same shape as the
    batch embedders in functions.embed_batch); until a model is wired
    this returns an empty, correctly-typed edge frame so call-sites
    are stable when the extractor lands.
    """
    return spark.createDataFrame(
        [], "src_id string, dst_id string, relation string, weight double"
    )
