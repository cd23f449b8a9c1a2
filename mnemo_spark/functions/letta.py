"""Letta-protocol state mapping (reference crates/mnemo-letta).

Letta (formerly MemGPT) standardised three REST shapes
(mnemo-letta/src/lib.rs:1-24); the HTTP transport stays out of scope
(SURVEY §3.3 — serving adapters collapse into Spark SQL), but the
STATE semantics those endpoints manipulate are engine behavior and
are mapped here:

- create_agent (handlers.rs:28-52): mint an agent id; persona/human
  blocks persist as Semantic memories tagged `letta-block:persona` /
  `letta-block:human`.
- send_message (handlers.rs:56-133): persist the user turn as
  Episodic (tags letta-message + role:<r>), then recall top-5 hybrid
  and return the deterministic recalled-memories summary — wiring a
  real LLM is the caller's job, upstream too.
- core_memory (handlers.rs:135-150): the current persona/human
  blocks — newest block version wins, the engine's current-fact
  contract.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

BLOCK_TAG = "letta-block:"
CORE_BLOCKS = ("persona", "human")


def _store_block(engine, agent_id: str, block: str, content: str, now):
    mid = hashlib.sha256(f"{agent_id}|{block}|{now}|{content}".encode()).hexdigest()[:32]
    rows = engine.spark.createDataFrame(
        [(mid, agent_id, content, "semantic", "private", 0.5,
          [f"{BLOCK_TAG}{block}"], now)],
        "id string, agent_id string, content string, memory_type string,"
        " scope string, importance float, tags array<string>,"
        " created_at timestamp",
    )
    return engine.remember_batch(rows)


def create_agent(engine, now, agent_id: str | None = None,
                 persona: str | None = None, human: str | None = None):
    """POST /v1/agents state change (handlers.rs:28-52). One engine
    hosts many Letta agents at once — a Letta agent IS a mnemo
    agent_id. → (engine', agent_id)."""
    if agent_id is None:
        agent_id = "letta-" + hashlib.sha256(
            f"{now}|{persona}|{human}".encode()
        ).hexdigest()[:12]
    if persona:
        engine = _store_block(engine, agent_id, "persona", persona, now)
    if human:
        engine = _store_block(engine, agent_id, "human", human, now)
    return engine, agent_id


def send_message(engine, agent_id: str, content: str, now, role: str = "user"):
    """POST /v1/agents/{id}/messages state change (handlers.rs:56-133):
    persist the turn as Episodic, recall top-5 hybrid, and return the
    deterministic summary frame. → (engine', reply_str)."""
    if not content.strip():
        raise ValueError("message content is required")
    mid = hashlib.sha256(f"{agent_id}|{content}|{now}".encode()).hexdigest()[:32]
    rows = engine.spark.createDataFrame(
        [(mid, agent_id, content, "episodic", "private", 0.5,
          ["letta-message", f"role:{role}"], now)],
        "id string, agent_id string, content string, memory_type string,"
        " scope string, importance float, tags array<string>,"
        " created_at timestamp",
    )
    engine = engine.remember_batch(rows)
    hits = engine.recall(content, principal=agent_id, k=5, now=now).collect()
    if not hits:
        return engine, "No prior memories — starting fresh."
    lines = "\n".join(f"- {r['content']}" for r in hits[:5])
    return engine, f"Recalled {len(hits)}:\n{lines}"


def core_memory(engine, agent_id: str):
    """GET /v1/agents/{id}/memory (handlers.rs:135-150): the newest
    persona/human block per label. → DataFrame (block, content) with
    ≤ one row per label."""
    tagged = engine.memories.filter(
        (F.col("agent_id") == agent_id)
        & F.col("deleted_at").isNull()
        & (F.col("memory_type") == "semantic")
    ).select(
        F.explode("tags").alias("tag"), "content", "created_at", "id"
    ).filter(F.col("tag").startswith(BLOCK_TAG)).withColumn(
        "block", F.substring(F.col("tag"), len(BLOCK_TAG) + 1, 64)
    )
    w = Window.partitionBy("block").orderBy(F.desc("created_at"), F.desc("id"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("block", "content")
    )
