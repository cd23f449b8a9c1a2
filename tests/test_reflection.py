"""Full 5-stage reflection pass (reference reflection.rs:147-301;
upstream scenarios integration_test.rs:3143-3326)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
NOW = T0 + dt.timedelta(days=30)

_ROW_SCHEMA = (
    "id string, agent_id string, content string, memory_type string, "
    "scope string, importance float, tags array<string>, created_at timestamp"
)


def _engine(spark):
    rows = spark.createDataFrame(
        [
            # stage 1: relative date phrase, anchored at created_at
            ("r1", "a1", "met the vendor 3 days ago", "episodic", "private", 0.9,
             [], T0),
            # stage 2: dreamed marker, not yet processed
            ("r2", "a1", "rewritten by the dream pass", "semantic", "private", 0.9,
             ["dreamed_at"], T0),
            # stage 3: two near-identical memories (same tokens -> cosine 1.0)
            ("r3", "a1", "the build pipeline uses spark", "semantic", "private", 0.8,
             ["infra"], T0),
            ("r4", "a1", "the build pipeline uses spark", "semantic", "private", 0.8,
             ["build"], T0 + dt.timedelta(hours=1)),
            # stage 4: similar but different content, both LOW importance
            # 13 of 14 distinct tokens shared -> cosine 13/14 = 0.929
            ("r5", "a1", "cache ttl for the web tier must be set to exactly ten "
             "short minutes overall", "semantic", "private", 0.1, [], T0),
            ("r6", "a1", "cache ttl for the web tier must be set to exactly ten "
             "short minutes total", "semantic", "private", 0.2, [],
             T0 + dt.timedelta(hours=1)),
            # stage 5: old, unimportant, never accessed -> archive
            ("r7", "a1", "some trivial stale note", "episodic", "private", 0.15,
             [], T0),
            # control: too YOUNG for the age gate (created 1 day before
            # NOW) — raw importance cannot save a week-old unaccessed
            # memory from exponential decay (0.95*e^-7.2 < 0.2), age can
            ("r8", "a1", "critical production credential location", "semantic",
             "private", 0.95, [], NOW - dt.timedelta(days=1)),
        ],
        _ROW_SCHEMA,
    )
    return MnemoSparkEngine(spark).remember_batch(rows).materialized()


def test_reflection_pass_all_stages(spark):
    eng = _engine(spark)
    out, report = eng.run_reflection_pass("a1", now=NOW)
    out = out.materialized()
    mems = {r.id: r for r in out.memories.collect()}

    # stage 1: "3 days ago" -> ISO date anchored at created_at (T0)
    assert report["absolutized_dates"] >= 1
    assert mems["r1"].content == "met the vendor 2023-12-29"
    # content hash was recomputed for the rewritten content
    orig = {r.id: r for r in eng.memories.collect()}
    assert mems["r1"].content_hash != orig["r1"].content_hash

    # stage 2: dreamed marker processed exactly once
    assert report["dreamed_accepted"] == 1
    assert "dreamed_processed" in list(mems["r2"].tags)
    out2, report2 = out.run_reflection_pass("a1", now=NOW + dt.timedelta(hours=1))
    assert report2["dreamed_accepted"] == 0  # idempotent marker

    # stage 3: older twin consolidated, newer keeps and absorbs tags
    assert report["consolidated"] >= 1
    assert mems["r3"].consolidation_state == "consolidated"  # older
    # the keeper is NOT consolidated (stage 5 may later archive it —
    # at 30 days unaccessed, the reference's decay math archives too)
    assert mems["r4"].consolidation_state != "consolidated"
    assert set(mems["r4"].tags) == {"build", "infra"}

    # stage 4: low-importance different-content pair -> older soft-deleted
    assert report["conflicts_resolved"] >= 1
    assert mems["r5"].deleted_at is not None
    assert mems["r6"].deleted_at is None

    # stage 5: stale unimportant note archived; important one untouched
    assert report["archived"] >= 1
    assert mems["r7"].consolidation_state == "archived"
    assert mems["r8"].consolidation_state == "active"
    # eff importance math: 0.15 * exp(-0.01 * 720h) ~ 0.0001 < 0.2
    assert 0.15 * math.exp(-0.01 * 720) < 0.2

    # audit: one ReflectionCompleted event for the agent
    n_ev = out.events.filter(F.col("event_type") == "ReflectionCompleted").count()
    assert n_ev == 1


def test_reflection_scoped_to_agent(spark):
    rows = spark.createDataFrame(
        [
            ("x1", "a1", "note from 2 days ago", "episodic", "private", 0.9, [], T0),
            ("x2", "a2", "note from 2 days ago", "episodic", "private", 0.9, [], T0),
        ],
        _ROW_SCHEMA,
    )
    eng = MnemoSparkEngine(spark).remember_batch(rows).materialized()
    out, report = eng.run_reflection_pass("a1", now=NOW)
    out = out.materialized()
    mems = {r.id: r for r in out.memories.collect()}
    assert report["total_scanned"] == 1
    assert "2023-12-30" in mems["x1"].content  # a1 rewritten
    assert "days ago" in mems["x2"].content  # a2 untouched


def test_coordinated_mode_gates_and_force(spark):
    """v0.3.1 ReflectionMode gate (reflection.rs:44-141; upstream
    test_coordinated_skips_below_new_record_floor): below the 5-new-
    record floor a coordinated pass skips without mutating state; a
    second coordinated pass within 24h of a completed one skips
    too_soon; force and mode='always' override."""
    rows = spark.createDataFrame(
        [(f"c{i}", "a1", f"note {i}", "semantic", "private", 0.5, [],
          T0 + dt.timedelta(minutes=i)) for i in range(3)],
        _ROW_SCHEMA,
    )
    eng = MnemoSparkEngine(spark).remember_batch(rows).materialized()

    # 3 records < floor of 5 -> skip, nothing mutated
    out, rep = eng.run_reflection_pass_with_mode("a1", now=NOW)
    assert rep["skipped"] == "not_enough_new_records"
    assert out is eng
    assert out.events.filter(
        F.col("event_type") == "ReflectionCompleted"
    ).count() == 0

    # force overrides the floor and the pass actually runs
    out2, rep2 = eng.run_reflection_pass_with_mode("a1", force=True, now=NOW)
    out2 = out2.materialized()
    assert rep2["skipped"] is None and rep2["total_scanned"] == 3
    assert out2.events.filter(
        F.col("event_type") == "ReflectionCompleted"
    ).count() == 1

    # 5 fresh records later, a coordinated pass within 24h still skips
    more = spark.createDataFrame(
        [(f"d{i}", "a1", f"fresh {i}", "semantic", "private", 0.5, [],
          NOW + dt.timedelta(minutes=i + 1)) for i in range(5)],
        _ROW_SCHEMA,
    )
    eng3 = out2.remember_batch(more).materialized()
    _, rep3 = eng3.run_reflection_pass_with_mode(
        "a1", now=NOW + dt.timedelta(hours=1)
    )
    assert rep3["skipped"] == "too_soon"
    # ...and runs once the 24h cadence has elapsed
    _, rep4 = eng3.run_reflection_pass_with_mode(
        "a1", now=NOW + dt.timedelta(hours=25)
    )
    assert rep4["skipped"] is None and rep4["total_scanned"] == 8


def test_dream_report_trailer_ingested_once(spark):
    """reflection.rs:639-724: an Auto-Dream '## Organization Report'
    trailer is ingested exactly once — DreamReportIngested event plus
    the idempotent metadata marker."""
    rows = spark.createDataFrame(
        [("m1", "a1",
          "summary\n\n## Organization Report\nconsolidated: 3\nremoved: 1",
          "semantic", "private", 0.5, [], T0)]
        + [(f"f{i}", "a1", f"filler {i}", "semantic", "private", 0.5, [],
            T0 + dt.timedelta(minutes=i)) for i in range(5)],
        _ROW_SCHEMA,
    )
    eng = MnemoSparkEngine(spark).remember_batch(rows).materialized()
    out, rep = eng.run_reflection_pass_with_mode("a1", now=NOW)
    out = out.materialized()
    assert rep["skipped"] is None and rep["dream_report_ingested"] == 1
    assert out.events.filter(
        F.col("event_type") == "DreamReportIngested"
    ).count() == 1
    marked = out.memories.filter(F.col("id") == "m1").collect()[0]
    assert "dream_report_ingested_at" in (marked["metadata"] or "")

    # second pass: the marker makes ingestion a no-op
    out2, rep2 = out.run_reflection_pass_with_mode("a1", force=True, now=NOW)
    assert rep2["dream_report_ingested"] == 0
    assert out2.events.filter(
        F.col("event_type") == "DreamReportIngested"
    ).count() == 1


def test_dream_report_marker_survives_non_object_metadata(spark):
    """The ingestion marker is spliced into the metadata JSON string;
    splicing is only valid for objects. Valid-JSON-but-not-object
    metadata (array, string, number) must be replaced with a fresh
    object — not corrupted into malformed JSON that breaks the
    idempotence marker (ReasoningProvenance::attach does the same)."""
    import json

    trailer = "s\n\n## Organization Report\nconsolidated: 1"
    rows = spark.createDataFrame(
        [
            ("obj", "a1", trailer, "semantic", "private", 0.5, [], T0,
             '{"keep": "me"}'),
            ("arr", "a1", trailer, "semantic", "private", 0.5, [], T0,
             "[1, 2]"),
            ("str", "a1", trailer, "semantic", "private", 0.5, [], T0,
             '"just a note"'),
            ("num", "a1", trailer, "semantic", "private", 0.5, [], T0, "42"),
            ("nul", "a1", trailer, "semantic", "private", 0.5, [], T0, None),
            ("emp", "a1", trailer, "semantic", "private", 0.5, [], T0, ""),
            # malformed: '{'-prefixed but unparseable — must take the
            # fresh-object arm, not splice into invalid JSON (ADVICE r7:
            # get_json_object→NULL makes the object predicate NULL, and
            # TRUE AND NULL falls through when() into the splice branch)
            ("bad", "a1", trailer, "semantic", "private", 0.5, [], T0,
             "{bad"),
        ]
        + [(f"f{i}", "a1", f"filler {i}", "semantic", "private", 0.5, [],
            T0 + dt.timedelta(minutes=i), None) for i in range(5)],
        _ROW_SCHEMA + ", metadata string",
    )
    eng = MnemoSparkEngine(spark).remember_batch(rows).materialized()
    out, rep = eng.run_reflection_pass_with_mode("a1", now=NOW)
    out = out.materialized()
    assert rep["dream_report_ingested"] == 7
    metas = {
        r["id"]: r["metadata"]
        for r in out.memories.filter(
            F.col("id").isin(
                ["obj", "arr", "str", "num", "nul", "emp", "bad"]
            )
        ).collect()
    }
    for mid, raw in metas.items():
        parsed = json.loads(raw)  # every result must be VALID json
        assert isinstance(parsed, dict), (mid, raw)
        assert "dream_report_ingested_at" in parsed, (mid, raw)
    assert json.loads(metas["obj"])["keep"] == "me"

    # idempotent for every shape: second pass ingests nothing
    _, rep2 = out.run_reflection_pass_with_mode("a1", force=True, now=NOW)
    assert rep2["dream_report_ingested"] == 0
