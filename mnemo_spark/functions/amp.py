"""AMP / memorywire interop adapter (reference crates/mnemo-amp).

AMP models an agent's memory surface as 5 operations (remember /
recall / forget / merge / expire) over 4 memory types, carried in a
self-describing JSON envelope validated against a JSON-Schema
document (mnemo-amp/src/lib.rs:5-23). The reference maps each op to
an engine call (lib.rs op table):

  remember → engine.remember        (here: remember_batch, 1-row)
  recall   → engine.recall          (top-k, default 5)
  forget   → engine.forget
  merge    → remember(consolidated) + forget(sources)
  expire   → set expires_at + run_ttl_sweep   (engine.expire)

plus a HITL diff-and-approve hook gating LONG-TERM writes
(semantic/procedural; approval.rs:1-14 — episodic/working bypass),
whose decision lands in the hash-chained audit log, and a fan-out
router whose recall fusion is RRF or max (router.rs; operators/rrf.py
rrf_fuse / max_fuse).

The adapter is deliberately thin: validation + dispatch. All data
movement stays inside the engine's relational verbs; the envelope
layer never touches a row.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import functions as F

AMP_VERSION = "amp/1"
AMP_OPS = ("remember", "recall", "forget", "merge", "expire")
AMP_TYPES = ("episodic", "semantic", "procedural", "working")
LONG_TERM_TYPES = ("semantic", "procedural")  # approval.rs:3-4


class AmpError(ValueError):
    """error.rs ladder; kind ∈ {validation, rejected}."""

    def __init__(self, kind: str, detail: str):
        super().__init__(f"{kind}: {detail}")
        self.kind = kind


def validate_envelope(env: dict) -> dict:
    """JSON-Schema-style envelope validation (wire.rs:96-130).

    Checks the version tag, op/memory_type enums, and the per-op
    payload contract; fills defaults (top_k=5 — the conformance
    suite's recall@5, wire.rs:114-117). Unknown keys pass through
    untouched (forward-compat, like serde's catch-all)."""
    out = dict(env)
    version = out.setdefault("amp_version", AMP_VERSION)
    if not str(version).startswith("amp/"):
        raise AmpError("validation", f"unsupported amp_version {version!r}")
    op = out.get("op")
    if op not in AMP_OPS:
        raise AmpError("validation", f"op must be one of {AMP_OPS}, got {op!r}")
    mt = out.get("memory_type")
    if mt not in AMP_TYPES:
        raise AmpError("validation", f"memory_type must be one of {AMP_TYPES}, got {mt!r}")
    if op == "remember" and not out.get("content"):
        raise AmpError("validation", "remember requires content")
    if op == "recall" and not out.get("query"):
        raise AmpError("validation", "recall requires query")
    if op in ("forget", "merge", "expire") and not out.get("memory_ids"):
        raise AmpError("validation", f"{op} requires memory_ids")
    if op == "merge" and len(out["memory_ids"]) < 2:
        raise AmpError("validation", "merge requires at least 2 memory_ids")
    out.setdefault("top_k", 5)
    out.setdefault("tags", [])
    return out


@dataclass
class WriteDiff:
    """What a pending long-term write would change (approval.rs:17-31)."""

    agent_id: str
    memory_type: str
    before: str | None
    after: str
    tags: list[str] = field(default_factory=list)

    def render(self) -> str:
        """Compact deterministic diff, stable across runs
        (approval.rs:34-55)."""
        head = f"[{self.memory_type}] tags={self.tags!r}"
        if self.before is not None:
            return f"{head}\n- {self.before}\n+ {self.after}"
        return f"{head}\n+ {self.after}"


class AmpStore:
    """MemoryStore-conformant surface over MnemoSparkEngine
    (store.rs; lib.rs:11-13 "any AMP-speaking client can drive the
    engine unchanged").

    approval_hook: callable(WriteDiff) -> (approved: bool, reason:
    str). When set, long-term writes (semantic/procedural) are gated;
    the decision is appended to the hash-chained audit log either way
    (approval.rs:7-11) so the approve trail replays alongside the
    write it authorized. Short-term tiers bypass the hook.
    """

    def __init__(self, engine, default_agent: str = "amp-agent", approval_hook=None):
        self.engine = engine
        self.default_agent = default_agent
        self.approval_hook = approval_hook

    # -- helpers ---------------------------------------------------------

    def _record_decision(self, agent_id: str, diff: WriteDiff, approved: bool, now):
        event_type = "DecisionApprove" if approved else "DecisionReject"
        decision = self.engine.spark.createDataFrame(
            [(agent_id, event_type,
              hashlib.sha256(diff.render().encode()).hexdigest()[:32], now)],
            "agent_id string, event_type string, memory_id string, ts timestamp",
        )
        self.engine = self.engine._clone(
            events=self.engine._append_events(decision)
        )

    def _mint_id(self, agent_id: str, content: str, created_at) -> str:
        return hashlib.sha256(
            f"{agent_id}|{content}|{created_at}".encode()
        ).hexdigest()[:32]

    # -- dispatch (store.rs dispatch; lib.rs op table) -------------------

    def dispatch(self, env: dict, now=None) -> dict:
        env = validate_envelope(env)
        agent = env.get("agent_id") or self.default_agent
        op = env["op"]
        if op == "remember":
            return self._remember(env, agent, now)
        if op == "recall":
            hits = self.engine.recall(env["query"], principal=agent, k=env["top_k"])
            return {
                "op": op,
                "ok": True,
                "hits": [
                    {"id": r["id"], "content": r["content"], "score": float(r["score"])}
                    for r in hits.collect()
                ],
            }
        if op == "forget":
            self.engine = self.engine.forget(env["memory_ids"], strategy="soft", now=now)
            return {"op": op, "ok": True, "ids": env["memory_ids"]}
        if op == "merge":
            return self._merge(env, agent, now)
        # expire
        self.engine = self.engine.expire(
            env["memory_ids"], env.get("ttl_seconds"), now=now
        )
        return {"op": op, "ok": True, "ids": env["memory_ids"]}

    def _gate(self, agent: str, mt: str, before: str | None, after: str,
              tags: list[str], now) -> None:
        if self.approval_hook is None or mt not in LONG_TERM_TYPES:
            return
        diff = WriteDiff(agent, mt, before, after, tags)
        approved, reason = self.approval_hook(diff)
        self._record_decision(agent, diff, approved, now)
        if not approved:
            raise AmpError("rejected", reason or "write rejected by approval hook")

    def _remember(self, env: dict, agent: str, now) -> dict:
        self._gate(agent, env["memory_type"], None, env["content"], env["tags"], now)
        mid = self._mint_id(agent, env["content"], now)
        rows = self.engine.spark.createDataFrame(
            [(mid, agent, env["content"], env["memory_type"], "private", 0.5,
              env["tags"], now)],
            "id string, agent_id string, content string, memory_type string,"
            " scope string, importance float, tags array<string>,"
            " created_at timestamp",
        )
        self.engine = self.engine.remember_batch(rows)
        return {"op": "remember", "ok": True, "ids": [mid]}

    def _merge(self, env: dict, agent: str, now) -> dict:
        """lib.rs op table: merge = remember(consolidated) + forget of
        the sources — NOT the branch-timeline engine.merge."""
        sources = (
            self.engine.memories.filter(F.col("id").isin(env["memory_ids"]))
            .select("id", "content")
            .orderBy("id")
            .collect()
        )
        if len(sources) < 2:
            raise AmpError("validation", "merge sources not found")
        folded = "\n".join(r["content"] or "" for r in sources)
        self._gate(agent, env["memory_type"], folded, folded, env["tags"], now)
        mid = self._mint_id(agent, folded, now)
        rows = self.engine.spark.createDataFrame(
            [(mid, agent, folded, env["memory_type"], "private", 0.5,
              env["tags"], now,
              '{"consolidated_from": ' + str([r["id"] for r in sources]).replace("'", '"') + "}")],
            "id string, agent_id string, content string, memory_type string,"
            " scope string, importance float, tags array<string>,"
            " created_at timestamp, metadata string",
        )
        self.engine = self.engine.remember_batch(rows)
        self.engine = self.engine.forget(
            [r["id"] for r in sources], strategy="soft", now=now
        )
        return {"op": "merge", "ok": True, "ids": [mid]}
