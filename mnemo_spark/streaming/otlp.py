"""OTLP span → agent_events adapter (SURVEY §2 S11).

The reference accepts simplified OTLP JSON traces over REST
(crates/mnemo-rest/src/lib.rs:61, handlers.rs:712-860) and lands each
span as an agent event: agent_id from resource attributes (`agent.id`
or `service.name`), event_type from the GenAI semantic-convention
operation name (handlers.rs:632-710), token/cost/model fields from
`gen_ai.*` attributes, latency from the span nano timestamps, and the
raw span attributes as the event payload.

Spark-first: the whole mapping is ONE from_json + two explodes + pure
column expressions (higher-order `filter` over the attribute arrays) —
no UDF, fully codegen-able, identical for a batch backfill of trace
archives and a `readStream` tail of an OTLP file drop. At 100 TB of
traces the explode is map-side only: no shuffle until whatever
aggregation the caller adds downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Simplified OTLP JSON envelope (the same subset the reference parses;
# OTLP encodes 64-bit nanos and ints as either JSON strings or
# numbers — string-typed fields absorb both under from_json).
_ATTR = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField(
                "value",
                T.StructType(
                    [
                        T.StructField("stringValue", T.StringType()),
                        T.StructField("intValue", T.StringType()),
                        T.StructField("doubleValue", T.DoubleType()),
                    ]
                ),
            ),
        ]
    )
)

OTLP_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _ATTR)]),
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "spans",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("traceId", T.StringType()),
                                                        T.StructField("spanId", T.StringType()),
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField(
                                                            "startTimeUnixNano", T.StringType()
                                                        ),
                                                        T.StructField(
                                                            "endTimeUnixNano", T.StringType()
                                                        ),
                                                        T.StructField("attributes", _ATTR),
                                                    ]
                                                )
                                            ),
                                        )
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _attr(attrs: Column, key: str, field: str) -> Column:
    """First attribute with `key`, projected to value.<field> — the
    array-order find_map the reference uses (handlers.rs:643-686)."""
    return F.get(F.filter(attrs, lambda a: a["key"] == key), 0)["value"][field]


def _first_attr_of(attrs: Column, keys: list[str], field: str) -> Column:
    """First attribute (in array order) whose key is IN keys —
    `agent.id` / `service.name` resolution (handlers.rs:732-742)."""
    key_arr = F.array(*[F.lit(k) for k in keys])
    return F.get(
        F.filter(attrs, lambda a: F.array_contains(key_arr, a["key"])), 0
    )["value"][field]


def otlp_spans_to_events(
    traces: DataFrame,
    json_col: str = "value",
    default_agent_id: str = "default",
) -> DataFrame:
    """Flatten OTLP JSON documents into agent-event rows.

    traces: one OTLP envelope per row in `json_col` (a text-file
    stream, a Kafka value column, a raw archive table — any string
    source). → (agent_id, trace_id, span_id, event_type, model,
    tokens_input, tokens_output, latency_ms, cost_usd, ts, payload)
    with the reference's field semantics (handlers.rs:712-860).
    """
    parsed = traces.select(
        F.from_json(F.col(json_col), OTLP_SCHEMA).alias("_doc")
    )
    # ONE generator (r11; VERDICT r10 #4): the nesting flattens into
    # (resource-attrs, span) structs with higher-order transforms
    # INSIDE one projection, then a single explode — the previous
    # explode→explode→explode chain paid ~4x this plan's time at
    # sf0.1 (three Generate stages over progressively wider rows).
    # Null inner arrays are filtered before flatten (flatten(..) is
    # NULL when any element is null, which would drop sibling spans —
    # the chained form only dropped the null branch).
    pairs = parsed.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.filter(
                        "_doc.resourceSpans",
                        lambda rs: rs["scopeSpans"].isNotNull(),
                    ),
                    lambda rs: F.flatten(
                        F.transform(
                            F.filter(
                                rs["scopeSpans"],
                                lambda ss: ss["spans"].isNotNull(),
                            ),
                            lambda ss: F.transform(
                                ss["spans"],
                                lambda sp: F.struct(
                                    rs["resource"]["attributes"].alias(
                                        "_rattrs"
                                    ),
                                    sp.alias("_sp"),
                                ),
                            ),
                        )
                    ),
                )
            )
        ).alias("_p")
    )
    spans = pairs.select(
        F.coalesce(
            _first_attr_of(
                F.col("_p._rattrs"), ["agent.id", "service.name"], "stringValue"
            ),
            F.lit(default_agent_id),
        ).alias("agent_id"),
        F.col("_p._sp").alias("_sp"),
    )

    attrs = F.col("_sp.attributes")
    op = F.coalesce(
        _attr(attrs, "gen_ai.operation.name", "stringValue"), F.col("_sp.name")
    )
    event_type = (
        F.when(op.contains("chat"), "assistant_message")
        .when(op.contains("embed"), "retrieval_query")
        .when(op.contains("tool"), "tool_call")
        .otherwise("tool_call")
    )
    start_ns = F.col("_sp.startTimeUnixNano").cast("long")
    end_ns = F.col("_sp.endTimeUnixNano").cast("long")
    latency_ms = F.when(
        end_ns > start_ns, ((end_ns - start_ns) / F.lit(1_000_000)).cast("long")
    )
    # integer `div`, never `/`: epoch-nanos (~1.7e18 for current dates)
    # exceed double's 2^53 mantissa, so float division here would skew
    # ts by up to ~256 µs (the same failure mode io.py guards against)
    ts = F.when(
        start_ns > 0,
        F.timestamp_micros(F.expr("CAST(_sp.startTimeUnixNano AS BIGINT) div 1000")),
    ).otherwise(F.current_timestamp())

    return spans.select(
        "agent_id",
        F.col("_sp.traceId").alias("trace_id"),
        F.col("_sp.spanId").alias("span_id"),
        event_type.alias("event_type"),
        _attr(attrs, "gen_ai.request.model", "stringValue").alias("model"),
        _attr(attrs, "gen_ai.usage.input_tokens", "intValue")
        .cast("long")
        .alias("tokens_input"),
        _attr(attrs, "gen_ai.usage.output_tokens", "intValue")
        .cast("long")
        .alias("tokens_output"),
        latency_ms.alias("latency_ms"),
        _attr(attrs, "gen_ai.usage.cost", "doubleValue").alias("cost_usd"),
        ts.alias("ts"),
        F.to_json(attrs).alias("payload"),
    )


def otlp_events_as_table_rows(otlp_events: DataFrame) -> DataFrame:
    """Project adapter output onto the engine's events-table shape
    (event_id, ts, user_id, event_type, value, props) so OTLP spans
    flow straight into every downstream events operator — chain
    assignment, TTL, decay, sessionize. Deterministic ids: xxhash64 of
    the span identity (the reference mints UUIDv7 per request; a batch
    replay needs replay-stable ids instead)."""
    return otlp_events.select(
        F.xxhash64("trace_id", "span_id").alias("event_id"),
        "ts",
        F.xxhash64("agent_id").alias("user_id"),
        "event_type",
        F.coalesce(F.col("cost_usd"), F.col("latency_ms").cast("double"), F.lit(0.0)).alias(
            "value"
        ),
        F.col("payload").alias("props"),
    )


def read_otlp_stream(
    spark: SparkSession, path: str, default_agent_id: str = "default"
) -> DataFrame:
    """File-source stream of OTLP JSON documents (one envelope per
    line) → agent-event rows; the streaming entry matching
    read_event_stream for the events table."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    return otlp_spans_to_events(raw, "value", default_agent_id)
