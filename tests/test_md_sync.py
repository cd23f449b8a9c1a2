"""S12 markdown wiki sync (crates/mnemo-md-sync): frontmatter parse
contract, directory read, engine sync, flush round-trip."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mnemo_spark.engine import MnemoSparkEngine
from mnemo_spark.sources.md_sync import (
    flush_markdown,
    parse_markdown,
    read_md_dir,
    sync_markdown,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_parse_markdown_contract():
    # no frontmatter: whole input is the body (parser.rs test)
    p = parse_markdown("# Heading\n\nbody text")
    assert p["mnemo_id"] is None and p["tags"] == []
    assert p["body"] == "# Heading\n\nbody text"
    # all fields
    p = parse_markdown(
        "---\nmnemo_id: abc-123\nagent_id: prod-runner\n"
        "tags: [a, b, c]\nexpires_at: 2026-12-31T00:00:00Z\n---\n# H\n\nbody\n"
    )
    assert p["mnemo_id"] == "abc-123"
    assert p["agent_id"] == "prod-runner"
    assert p["tags"] == ["a", "b", "c"]
    assert p["expires_at"] == "2026-12-31T00:00:00Z"
    assert p["body"] == "# H\n\nbody\n"
    # unterminated frontmatter: error surfaced, not raised
    p = parse_markdown("---\nmnemo_id: x\nbody but no close")
    assert p["parse_error"] is not None
    # unknown keys ignored; quoted tags stripped
    p = parse_markdown("---\nfutureKey: v\ntags: [\"a\", 'b', c]\n---\nbody")
    assert p["tags"] == ["a", "b", "c"] and p["body"] == "body"
    # bare close at end of file
    p = parse_markdown("---\ntags: [x]\n---")
    assert p["tags"] == ["x"] and p["body"] == ""


def test_md_sync_roundtrip(spark, tmp_path):
    wiki = tmp_path / "wiki"
    wiki.mkdir()
    (wiki / "note1.md").write_text(
        "---\nmnemo_id: md-note-1\nagent_id: writer\ntags: [geo]\n---\n"
        "# Paris\n\nparis is the capital of france\n"
    )
    (wiki / "note2.md").write_text("plain note without frontmatter\n")
    (wiki / "broken.md").write_text("---\nmnemo_id: x\nnever closed")
    (wiki / "ignored.txt").write_text("not markdown")

    parsed = read_md_dir(spark, str(wiki))
    assert parsed.count() == 3  # .txt excluded by glob

    eng, errors = sync_markdown(
        MnemoSparkEngine(spark), spark, str(wiki), "md-sync", T0
    )
    # the broken file is surfaced, not imported
    errs = errors.collect()
    assert len(errs) == 1 and "broken.md" in errs[0].path
    mems = {r.id: r for r in eng.memories.collect()}
    assert len(mems) == 2
    assert mems["md-note-1"].agent_id == "writer"
    assert list(mems["md-note-1"].tags) == ["geo"]
    assert mems["md-note-1"].content.startswith("# Paris")
    assert mems["md-note-1"].content_hash  # ordinary write path
    # untagged file got a stable path-derived id
    other = [r for rid, r in mems.items() if rid != "md-note-1"][0]
    assert other.id.startswith("md-") and other.agent_id == "md-sync"

    # recall works over the synced wiki
    hits = eng.recall("paris capital", "writer", strategy="lexical").collect()
    assert hits and hits[0].id == "md-note-1"

    # flush renders frontmatter that re-parses to the same record
    rendered = {r.path: r.text for r in flush_markdown(eng.memories).collect()}
    txt = rendered[[p for p in rendered if "note1" in p][0]]
    p2 = parse_markdown(txt)
    assert p2["mnemo_id"] == "md-note-1"
    assert p2["agent_id"] == "writer"
    assert p2["tags"] == ["geo"]
    assert p2["body"] == mems["md-note-1"].content


def test_md_sync_edit_is_new_version(spark, tmp_path):
    wiki = tmp_path / "wiki2"
    wiki.mkdir()
    f = wiki / "fact.md"
    f.write_text("---\nmnemo_id: fact-1\n---\nversion one\n")
    eng, _ = sync_markdown(MnemoSparkEngine(spark), spark, str(wiki), "w", T0)
    f.write_text("---\nmnemo_id: fact-1\n---\nversion two\n")
    eng, _ = sync_markdown(eng, spark, str(wiki), "w", T0 + dt.timedelta(hours=1))
    # both versions exist; the current-fact resolver picks the newest
    versions = eng.memories.filter(F.col("id") == "fact-1")
    assert versions.count() == 2
    from mnemo_spark.operators.window_ops import current_fact_resolver

    cur = (
        current_fact_resolver(versions, ["id"], "created_at", "content_hash")
        .filter(F.col("is_current"))
        .collect()
    )
    assert len(cur) == 1 and cur[0].content == "version two\n"


def test_md_metadata_json_survives_special_path_chars(spark, tmp_path):
    """ADVICE r2: the md_path metadata must be built with to_json, not
    string concat — a path containing a quote or backslash must stay
    valid JSON or flush silently misroutes the file."""
    wiki = tmp_path / 'wi"ki'
    wiki.mkdir()
    (wiki / 'a"b.md').write_text("quoted-path note\n")
    eng, errors = sync_markdown(
        MnemoSparkEngine(spark), spark, str(wiki), "md-sync", T0
    )
    assert errors.count() == 0
    row = eng.memories.select(
        F.get_json_object("metadata", "$.md_path").alias("p")
    ).collect()[0]
    # valid JSON (get_json_object no longer NULLs out); Spark's file
    # source URI-encodes the quote as %22, which is fine — the stored
    # form and the flush routing just have to AGREE
    assert row.p is not None and row.p.endswith('a%22b.md')
    paths = [r.path for r in flush_markdown(eng.memories).collect()]
    assert paths == [row.p]  # original path, not flushed/<id>.md
