"""OTLP span ingestion (S11): simplified OTLP JSON → agent-event rows
→ events-table projection → chain assignment, mirroring the
reference's REST ingest (mnemo-rest/src/handlers.rs:712-860) as a
relational program, batch and streaming."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mnemo_spark.operators.chain import assign_chain
from mnemo_spark.streaming.otlp import (
    otlp_events_as_table_rows,
    otlp_spans_to_events,
    read_otlp_stream,
)


def _envelope(agent: str | None, spans: list[dict]) -> str:
    res_attrs = (
        [{"key": "service.name", "value": {"stringValue": agent}}] if agent else []
    )
    return json.dumps(
        {
            "resourceSpans": [
                {
                    "resource": {"attributes": res_attrs},
                    "scopeSpans": [{"spans": spans}],
                }
            ]
        }
    )


def _span(trace, span, name, start_ns, end_ns, attrs=None):
    return {
        "traceId": trace,
        "spanId": span,
        "name": name,
        "startTimeUnixNano": str(start_ns),
        "endTimeUnixNano": end_ns if isinstance(end_ns, int) else str(end_ns),
        "attributes": attrs or [],
    }


BASE_NS = 1_700_000_000_000_000_000


def _sample_docs():
    genai_attrs = [
        {"key": "gen_ai.operation.name", "value": {"stringValue": "chat claude"}},
        {"key": "gen_ai.request.model", "value": {"stringValue": "m-1"}},
        {"key": "gen_ai.usage.input_tokens", "value": {"intValue": "120"}},
        {"key": "gen_ai.usage.output_tokens", "value": {"intValue": 34}},
        {"key": "gen_ai.usage.cost", "value": {"doubleValue": 0.0042}},
    ]
    return [
        _envelope(
            "agent-a",
            [
                _span("t1", "s1", "llm chat", BASE_NS, BASE_NS + 250_000_000, genai_attrs),
                _span("t1", "s2", "embed query", BASE_NS + 1_000_000_000, BASE_NS + 1_100_000_000),
            ],
        ),
        _envelope(
            None,  # no resource attrs -> default agent id
            [_span("t2", "s3", "tool use", BASE_NS + 2_000_000_000, BASE_NS + 2_000_000_000)],
        ),
    ]


def test_otlp_field_mapping(spark):
    df = spark.createDataFrame([(d,) for d in _sample_docs()], ["value"])
    out = otlp_spans_to_events(df, default_agent_id="fallback").orderBy("span_id")
    rows = {r.span_id: r for r in out.collect()}
    assert set(rows) == {"s1", "s2", "s3"}

    s1 = rows["s1"]
    assert s1.agent_id == "agent-a"
    assert s1.trace_id == "t1"
    assert s1.event_type == "assistant_message"  # operation name contains 'chat'
    assert s1.model == "m-1"
    assert (s1.tokens_input, s1.tokens_output) == (120, 34)  # str and int encodings
    assert s1.cost_usd == 0.0042
    assert s1.latency_ms == 250
    assert s1.ts.isoformat().startswith("2023-11-14")  # from startTimeUnixNano
    assert "gen_ai.request.model" in s1.payload  # raw attrs preserved as payload

    s2 = rows["s2"]
    assert s2.event_type == "retrieval_query"  # span-name fallback contains 'embed'
    assert s2.model is None and s2.cost_usd is None
    assert s2.latency_ms == 100

    s3 = rows["s3"]
    assert s3.agent_id == "fallback"
    assert s3.event_type == "tool_call"
    assert s3.latency_ms is None  # end == start -> no latency, like the reference


def test_otlp_rows_chain_assignment(spark):
    """Spans land on the events-table shape and chain per user —
    the reference's append-events path (integration: handlers ->
    remember.rs hash chain)."""
    df = spark.createDataFrame([(d,) for d in _sample_docs()], ["value"])
    rows = otlp_events_as_table_rows(otlp_spans_to_events(df))
    assert rows.columns == ["event_id", "ts", "user_id", "event_type", "value", "props"]
    hashed = rows.withColumn(
        "content_hash",
        F.sha2(F.concat_ws("|", F.col("event_id").cast("string"), "props"), 256),
    )
    chained = assign_chain(hashed, ["user_id"], ["ts", "event_id"], "content_hash")
    got = chained.orderBy("ts").collect()
    assert len(got) == 3
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    for seq in by_user.values():
        assert seq[0].prev_hash == ""  # chain head starts empty
        for prev, cur in zip(seq, seq[1:]):
            assert cur.prev_hash == prev.chain_hash  # linked
    # deterministic ids: re-running the adapter reproduces event_ids
    again = {
        r.event_id
        for r in otlp_events_as_table_rows(otlp_spans_to_events(df)).collect()
    }
    assert again == {r.event_id for r in got}


def test_otlp_stream_matches_batch(spark, tmp_path):
    """readStream over an OTLP file drop yields exactly the batch
    adapter's rows (same program, streaming source)."""
    src = str(tmp_path / "otlp")
    os.makedirs(src)
    docs = _sample_docs()
    for i, d in enumerate(docs):
        with open(f"{src}/batch{i}.jsonl", "w") as f:
            f.write(d + "\n")

    out = read_otlp_stream(spark, src)
    q = (
        out.writeStream.format("memory")
        .queryName("otlp_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.span_id, r.agent_id, r.event_type, r.latency_ms)
        for r in spark.table("otlp_stream").collect()
    }
    batch_df = spark.createDataFrame([(d,) for d in docs], ["value"])
    batch = {
        (r.span_id, r.agent_id, r.event_type, r.latency_ms)
        for r in otlp_spans_to_events(batch_df).collect()
    }
    assert streamed == batch and len(streamed) == 3


def test_otlp_adapter_survives_malformed_input(spark):
    """Backfill robustness: truncated JSON, wrong shapes, missing
    attributes, and absent timestamps must produce NULL-field rows or
    no rows — never a job failure (a 100-TB trace archive always
    contains garbage)."""
    from pyspark.sql import functions as F

    from mnemo_spark.streaming.otlp import otlp_spans_to_events

    good = (
        '{"resourceSpans":[{"resource":{"attributes":[]},"scopeSpans":'
        '[{"spans":[{"traceId":"t1","spanId":"s1","name":"chat",'
        '"startTimeUnixNano":"0","endTimeUnixNano":"0","attributes":[]}]}]}]}'
    )
    cases = [
        ("truncated", '{"resourceSpans":[{"resou'),
        ("not json", "hello world"),
        ("empty", ""),
        ("null", None),
        ("wrong shape", '{"foo": 1}'),
        ("spans not array", '{"resourceSpans":[{"scopeSpans":[{"spans":42}]}]}'),
        ("good minimal", good),
    ]
    df = spark.createDataFrame(cases, "label string, value string")
    rows = otlp_spans_to_events(df).collect()
    # only the good envelope produces a span row
    assert len(rows) == 1
    r = rows[0]
    # no agent attrs -> default; chat name -> assistant_message;
    # zero start -> wall-clock fallback (NOT NULL); zero latency -> NULL
    assert r.agent_id == "default"
    assert r.event_type == "assistant_message"
    assert r.ts is not None
    assert r.latency_ms is None
    assert r.tokens_input is None and r.cost_usd is None


def test_otlp_stream_windowed_cost_rollup(spark, tmp_path):
    """Observability pipeline end to end: an OTLP JSON file stream →
    span adapter → watermarked tumbling-window token/cost rollup per
    agent — the dashboard aggregation a trace consumer actually runs,
    exercised across two micro-batches."""
    import json
    import os

    from pyspark.sql import functions as F

    from mnemo_spark.streaming.otlp import otlp_spans_to_events

    def envelope(agent, span_id, start_h, tokens, cost):
        start_ns = (1704067200 + start_h * 3600) * 1_000_000_000  # 2024-01-01
        return json.dumps(
            {
                "resourceSpans": [
                    {
                        "resource": {
                            "attributes": [
                                {"key": "agent.id", "value": {"stringValue": agent}}
                            ]
                        },
                        "scopeSpans": [
                            {
                                "spans": [
                                    {
                                        "traceId": "t" + span_id,
                                        "spanId": span_id,
                                        "name": "chat completion",
                                        "startTimeUnixNano": str(start_ns),
                                        "endTimeUnixNano": str(start_ns + 5_000_000),
                                        "attributes": [
                                            {
                                                "key": "gen_ai.usage.input_tokens",
                                                "value": {"intValue": str(tokens)},
                                            },
                                            {
                                                "key": "gen_ai.usage.cost",
                                                "value": {"doubleValue": cost},
                                            },
                                        ],
                                    }
                                ]
                            }
                        ],
                    }
                ]
            }
        )

    src = str(tmp_path / "src")
    os.makedirs(src)
    batch0 = [envelope("a1", "s1", 0, 100, 0.5), envelope("a1", "s2", 0, 50, 0.25)]
    batch1 = [envelope("a1", "s3", 1, 30, 0.15), envelope("a2", "s4", 1, 70, 0.35)]
    with open(src + "/b0.jsonl", "w") as f:
        f.write("\n".join(batch0))
    with open(src + "/b1.jsonl", "w") as f:
        f.write("\n".join(batch1))

    raw = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(src)
    )
    events = otlp_spans_to_events(raw, "value")
    rollup = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "agent_id")
        .agg(
            F.sum("tokens_input").alias("tokens"),
            F.round(F.sum("cost_usd"), 2).alias("cost"),
            F.count("*").alias("n_spans"),
        )
        .select(F.col("win.start").alias("window_start"), "agent_id", "tokens", "cost", "n_spans")
    )
    q = (
        rollup.writeStream.format("memory")
        .queryName("otlp_rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; re-aggregate in
    # complete mode semantics by reading the sink + state via a final
    # batch check over the same adapter output instead
    got = {
        (r.agent_id, r.window_start.hour): (r.tokens, r.cost, r.n_spans)
        for r in spark.table("otlp_rollup").collect()
    }
    batch_df = spark.createDataFrame(
        [(v,) for v in batch0 + batch1], "value string"
    )
    want = {
        (r.agent_id, r.window_start.hour): (r.tokens, r.cost, r.n_spans)
        for r in (
            otlp_spans_to_events(batch_df, "value")
            .groupBy(F.window("ts", "1 hour").alias("win"), "agent_id")
            .agg(
                F.sum("tokens_input").alias("tokens"),
                F.round(F.sum("cost_usd"), 2).alias("cost"),
                F.count("*").alias("n_spans"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                "agent_id",
                "tokens",
                "cost",
                "n_spans",
            )
            .collect()
        )
    }
    # every window the stream closed must match the batch rollup
    for key, vals in got.items():
        assert want[key] == vals, key
    assert ("a1", 0) in want and want[("a1", 0)] == (150, 0.75, 2)
    assert want[("a2", 1)] == (70, 0.35, 1)
