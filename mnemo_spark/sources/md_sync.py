"""Markdown wiki sync (reference S12, crates/mnemo-md-sync — parser.rs
frontmatter contract, spec.rs sync policies).

The reference syncs a git-tracked Markdown directory ("agent wiki")
into the memory store: frontmatter keys (mnemo_id, agent_id, tags,
expires_at) map to record fields, the body becomes content, and edits
round-trip. Spark-first shape: ONE batch job —
`spark.read.text(wholetext)` over the glob, an Arrow-batched parse,
a remember_batch append (a changed file is a new memory version; the
current-fact resolver supersedes the old one) — instead of the
reference's notify watcher. Run it from any scheduler; the parse is
partition-parallel and the write path is the ordinary engine append.

flush_markdown renders memories back to frontmatter+body text, the
other direction of the round-trip (spec.rs SyncFlushPolicy's
PreferEngine import mode; the git-commit layer is out of scope here
exactly as it is in the reference crate, which ships the contract
layer only).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRONTMATTER_KEYS = ("mnemo_id", "agent_id", "tags", "expires_at")

_PARSED_SCHEMA = (
    "path string, mnemo_id string, agent_id string, tags array<string>, "
    "expires_at string, body string, parse_error string"
)


def parse_markdown(text: str) -> dict:
    """parser.rs:44-104 contract: optional `---` frontmatter block with
    the four known keys (unknown keys ignored), body after the closing
    fence. Errors are returned, not raised (distributed parse keeps
    bad files visible instead of failing the job)."""
    out = {
        "mnemo_id": None,
        "agent_id": None,
        "tags": [],
        "expires_at": None,
        "body": "",
        "parse_error": None,
    }
    if text is None:
        return out
    trimmed = text.lstrip("﻿")  # strip BOM (parser.rs:51)
    if not trimmed.startswith("---\n"):
        out["body"] = text
        return out
    rest = trimmed[4:]
    close = rest.find("\n---\n")
    bare = close == -1
    if bare:
        close = rest.find("\n---")
        if close == -1 or rest[close:] != "\n---":
            out["parse_error"] = "frontmatter is not closed with `---`"
            out["body"] = text
            return out
    header = rest[:close]
    for line in header.splitlines():
        line = line.strip()
        if not line or ":" not in line:
            continue
        k, v = line.split(":", 1)
        k, v = k.strip(), v.strip()
        if k == "mnemo_id" and v:
            out["mnemo_id"] = v
        elif k == "agent_id" and v:
            out["agent_id"] = v
        elif k == "tags":
            out["tags"] = _parse_tag_list(v)
        elif k == "expires_at" and v:
            out["expires_at"] = v
        # unknown keys ignored (parser.rs:82)
    body_start = close + (len("\n---") if bare else len("\n---\n"))
    out["body"] = rest[body_start:].lstrip("\n")
    return out


def _parse_tag_list(raw: str) -> list[str]:
    s = raw.strip()
    if s.startswith("["):
        s = s[1:]
    if s.endswith("]"):
        s = s[:-1]
    tags = [t.strip().strip("\"'") for t in s.split(",")]
    return [t for t in tags if t]


def read_md_dir(spark: SparkSession, root: str, glob: str = "*.md") -> DataFrame:
    """S12 reader: whole-file text scan over the wiki directory →
    (path, mnemo_id, agent_id, tags, expires_at, body, parse_error).

    The scan is a plain distributed file source (each file one row,
    partition-parallel); parsing is one Arrow batch pass. At wiki
    scale this is overkill; at 100 TB of docs it's the same job.
    """
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            F.col("_metadata.file_path").alias("path"), F.col("value").alias("text")
        )
    )

    def parse_batch(batches):
        for pdf in batches:
            parsed = [parse_markdown(t) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"].tolist(),
                    "mnemo_id": [p["mnemo_id"] for p in parsed],
                    "agent_id": [p["agent_id"] for p in parsed],
                    "tags": [p["tags"] for p in parsed],
                    "expires_at": [p["expires_at"] for p in parsed],
                    "body": [p["body"] for p in parsed],
                    "parse_error": [p["parse_error"] for p in parsed],
                }
            )

    return raw.mapInPandas(parse_batch, _PARSED_SCHEMA)


def md_memory_rows(parsed: DataFrame, default_agent: str, now) -> DataFrame:
    """Map parsed wiki files to remember_batch-ready rows.

    - id: frontmatter mnemo_id, else a stable hash of the file path
      (re-importing an untagged file updates the same memory)
    - a changed file is a NEW VERSION of the same id — the engine's
      current-fact resolver supersedes older versions, mirroring the
      reference's "edit produces a new memory version"
    - files that failed to parse are EXCLUDED here; surface them from
      `parse_error` upstream (fail-loud by inspection, not mid-job)
    """
    ok = parsed.filter(F.col("parse_error").isNull())
    return ok.select(
        F.coalesce(
            F.col("mnemo_id"),
            F.concat(F.lit("md-"), F.substring(F.sha2(F.col("path"), 256), 1, 16)),
        ).alias("id"),
        F.coalesce(F.col("agent_id"), F.lit(default_agent)).alias("agent_id"),
        F.col("body").alias("content"),
        F.lit("semantic").alias("memory_type"),
        F.lit("private").alias("scope"),
        F.lit(0.5).cast("float").alias("importance"),
        F.col("tags"),
        # to_json, not string concat: a path containing a quote or
        # backslash must still produce valid JSON, or get_json_object
        # returns NULL downstream and flush silently misroutes the file
        F.to_json(F.struct(F.col("path").alias("md_path"))).alias("metadata"),
        F.lit(now).cast("timestamp").alias("created_at"),
        F.col("expires_at").cast("timestamp").alias("expires_at"),
    )


def sync_markdown(engine, spark: SparkSession, root: str, default_agent: str, now,
                  glob: str = "*.md"):
    """One sync pass: read → parse → append as new versions. Returns
    (new_engine, parse_errors DataFrame)."""
    parsed = read_md_dir(spark, root, glob)
    errors = parsed.filter(F.col("parse_error").isNotNull()).select(
        "path", "parse_error"
    )
    rows = md_memory_rows(parsed, default_agent, now)
    return engine.remember_batch(rows), errors


def flush_markdown(memories: DataFrame) -> DataFrame:
    """Render memories back to wiki text → (path, text): frontmatter
    with the four contract keys + the body — the disk half of the
    round-trip. Writing files is the caller's side effect (collect for
    a wiki-sized set, or foreachPartition at scale)."""
    tags_str = F.concat(F.lit("["), F.array_join(F.col("tags"), ", "), F.lit("]"))
    header = F.concat(
        F.lit("---\nmnemo_id: "),
        F.col("id"),
        F.lit("\nagent_id: "),
        F.col("agent_id"),
        F.lit("\ntags: "),
        tags_str,
        F.when(
            F.col("expires_at").isNotNull(),
            F.concat(
                F.lit("\nexpires_at: "),
                F.date_format(F.col("expires_at"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            ),
        ).otherwise(F.lit("")),
        F.lit("\n---\n"),
    )
    path = F.coalesce(
        F.get_json_object("metadata", "$.md_path"),
        F.concat(F.lit("flushed/"), F.col("id"), F.lit(".md")),
    )
    return memories.select(
        path.alias("path"), F.concat(header, F.col("content")).alias("text")
    )
