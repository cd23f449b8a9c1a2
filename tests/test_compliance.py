"""Compliance-operator tests (reference crates/mnemo-compliance):
consent-guard refusal ladder, retention verify_path findings, and the
signed NDJSON audit export + offline verifier + tamper detection."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from mnemo_spark.operators.compliance import (
    RETENTION_PROFILES,
    consent_gate,
    export_audit_log,
    retention_verify_path,
    verify_ndjson_export,
)

NOW = "2026-02-01 00:00:00"


def test_consent_refusal_ladder(spark):
    writes = spark.createDataFrame(
        [("s1", "analytics"), ("s1", "profiling"), ("s2", "analytics"),
         ("s3", "analytics"), ("s4", "analytics")],
        "subject_id string, scope string",
    )
    consents = spark.createDataFrame(
        [
            # s1: live analytics grant; no profiling grant
            ("s1", "analytics", None, "tok-1", False),
            # s2: grant expired
            ("s2", "analytics", dt.datetime(2025, 1, 1), "tok-2", False),
            # s3: grant revoked
            ("s3", "analytics", None, "tok-3", True),
            # s4: no rows at all → deny_no_consent
        ],
        "subject_id string, scope string, expires_at timestamp,"
        " token_sha256 string, revoked boolean",
    )
    got = {
        (r["subject_id"], r["scope"]): (r["decision"], r["token_sha256"])
        for r in consent_gate(writes, consents, NOW).collect()
    }
    assert got[("s1", "analytics")] == ("allow", "tok-1")
    assert got[("s1", "profiling")][0] == "deny_scope"
    assert got[("s2", "analytics")][0] == "deny_expired"
    assert got[("s3", "analytics")][0] == "deny_revoked"
    assert got[("s4", "analytics")][0] == "deny_no_consent"
    # denied rows never leak a token hash into the audit trail
    assert all(tok is None for (d, tok) in got.values() if d != "allow")


def test_retention_verify_path_findings(spark):
    before = spark.createDataFrame(
        [(i, f"2026-01-{(i % 28) + 1:02d} 00:00:00", f"h{i}", f"p{i}")
         for i in range(40)],
        "event_id long, ts string, content_hash string, prev_hash string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # lawful: drop only rows older than a 10-day floor (now = Feb 1)
    cutoff = F.lit("2026-01-22 00:00:00").cast("timestamp")
    lawful = before.filter(F.col("ts") >= cutoff)
    r = retention_verify_path(before, lawful, "sweep", NOW, floor_days=10).collect()[0]
    assert r["ok"] and r["dropped_in_floor"] == 0 and r["dropped_total"] > 0
    assert r["profile"] == "dpdp-rules" and r["floor_days"] == 10
    # violating: drop a young row and rewrite a retained hash
    bad = before.filter(F.col("event_id") != 25).withColumn(
        "content_hash",
        F.when(F.col("event_id") == 26, F.lit("tampered")).otherwise(
            F.col("content_hash")
        ),
    )
    r2 = retention_verify_path(before, bad, "compact", NOW, floor_days=10).collect()[0]
    assert not r2["ok"] and r2["dropped_in_floor"] == 1 and r2["rewritten"] == 1
    # the shipped profiles carry the vetted floors
    assert RETENTION_PROFILES["eu-ai-act-art19"]["floor_days"] == 180
    assert RETENTION_PROFILES["hipaa-164.312b"]["floor_days"] == 2190


EVENTS = [
    {"event_id": f"e{i}", "timestamp": f"2026-01-0{i + 1}T00:00:00Z",
     "agent_id": "a1", "event_type": "MemoryWrite",
     "content_hash": f"h{i}", "thread_id": "t,with,commas" if i == 1 else "t1"}
    for i in range(3)
]
KEY = bytes(range(32))


def test_ndjson_signed_export_verifies_and_detects_tamper():
    bundle = export_audit_log(EVENTS, "ndjson_signed", signing_key=KEY)
    assert bundle["event_count"] == 3 and bundle["verifying_key_hex"]
    assert verify_ndjson_export(bundle["bytes"], bundle["verifying_key_hex"]) == 3
    # tamper with line 1's event → its signature breaks
    lines = bundle["bytes"].decode().splitlines()
    doc = json.loads(lines[1])
    doc["e"]["agent_id"] = "evil"
    lines[1] = json.dumps(doc, sort_keys=True)
    with pytest.raises(ValueError, match="bad signature at line 1"):
        verify_ndjson_export("\n".join(lines).encode(), bundle["verifying_key_hex"])
    # reordering breaks the prev chain
    swapped = "\n".join([lines[0], bundle["bytes"].decode().splitlines()[2]])
    with pytest.raises(ValueError, match="chain break"):
        verify_ndjson_export(swapped.encode(), bundle["verifying_key_hex"])


def test_csv_export_escapes_and_empty_window_refused():
    bundle = export_audit_log(EVENTS, "eu_ai_office_csv")
    text = bundle["bytes"].decode()
    assert text.startswith("event_id,timestamp,agent_id,event_type,model,")
    assert '"t,with,commas"' in text  # RFC4180 escaping
    assert bundle["verifying_key_hex"] is None
    with pytest.raises(ValueError, match="EmptyAuditWindow"):
        export_audit_log([], "eu_ai_office_csv")
    with pytest.raises(ValueError, match="requires a signing key"):
        export_audit_log(EVENTS, "ndjson_signed")
