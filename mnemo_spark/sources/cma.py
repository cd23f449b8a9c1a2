"""CMA-Memory compat shim (reference crates/mnemo-cma).

The CMA beta's data model is a Markdown filesystem tree at
`<root>/.memory/` with a sibling `audit.jsonl` log (lib.rs:1-25).
The reference ships four pieces, re-expressed here:

1. The tree layout + sync modes (tree.rs SyncMode: read_through /
   write_through / mirror).
2. An audit bridge: every CMA write becomes exactly one chained
   event whose hash folds prev ‖ source ‖ path ‖ op ‖ bytes
   (audit_bridge.rs:47-72 `bridge_event`) — the Python fold below is
   BIT-IDENTICAL to the Rust one (raw-byte sha256, 8-byte
   big-endian length), so a tree imported by either implementation
   lands the same chain head.
3. A one-shot importer walking an existing tree (migrate.rs:22-73
   `import_cma_tree`): pure + sorted so two runs over the same tree
   produce the same ImportSummary; actual engine ingestion is wired
   by the caller (here: `ingest_cma_tree`, reusing the md_sync
   reader so CMA files flow through the SAME distributed parse path
   as the wiki source).
4. Export back to a byte-identical tree + `tree_digest`
   (migrate.rs:95-127) so users can leave cleanly — the round-trip
   test's digest equality is the exit guarantee.

The per-file bridge walk is driver-side by design: it folds a
sequential hash chain over FILE METADATA (path + length), thousands
of entries at most — the document BODIES flow through the
distributed md_sync reader, never through this loop.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

SYNC_MODES = ("read_through", "write_through", "mirror")
GENESIS = b"\x00" * 32


@dataclass(frozen=True)
class BridgedEvent:
    """audit_bridge.rs:30-37; hashes carried as raw bytes."""

    source: str  # cma_beta | cma_import
    cma_path: str
    cma_op: str
    n_bytes: int
    prev_hash: bytes
    bridge_hash: bytes


def bridge_event(
    source: str, cma_path: str, cma_op: str, n_bytes: int, prev_hash: bytes
) -> BridgedEvent:
    """Hash one CMA row into the chain (audit_bridge.rs:47-72):
    sha256(prev ‖ source ‖ '|' ‖ path ‖ '|' ‖ op ‖ '|' ‖ bytes_be)."""
    if source not in ("cma_beta", "cma_import"):
        raise ValueError(f"unknown CmaSource {source!r}")
    h = hashlib.sha256()
    h.update(prev_hash)
    h.update(source.encode())
    h.update(b"|")
    h.update(cma_path.encode())
    h.update(b"|")
    h.update(cma_op.encode())
    h.update(b"|")
    h.update(n_bytes.to_bytes(8, "big"))
    return BridgedEvent(source, cma_path, cma_op, n_bytes, prev_hash, h.digest())


def _walk_sorted(memory_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(memory_dir):
        for f in files:
            out.append(os.path.join(root, f))
    return sorted(out)


def import_cma_tree(memory_dir: str) -> tuple[dict, list[BridgedEvent]]:
    """Walk a CMA tree → (ImportSummary dict, bridged events)
    (migrate.rs:22-73). Pure and sorted: same tree → same chain
    head, byte-identical with the reference implementation."""
    head = GENESIS
    files = memories = 0
    bridged: list[BridgedEvent] = []
    if os.path.isdir(memory_dir):
        for path in _walk_sorted(memory_dir):
            files += 1
            rel = os.path.relpath(path, memory_dir)
            ev = bridge_event(
                "cma_import", rel, "import", os.path.getsize(path), head
            )
            head = ev.bridge_hash
            bridged.append(ev)
            if path.endswith(".md"):
                memories += 1
    return (
        {
            "files": files,
            "memories": memories,
            "audit_events_bridged": len(bridged),
            "hmac_chain_head": head.hex(),
        },
        bridged,
    )


def export_to_tree(memory_dir: str, files: list[tuple[str, str]]) -> None:
    """Synthesize a CMA tree from (relative path, body) pairs
    (migrate.rs:95-105) — the clean exit path."""
    os.makedirs(memory_dir, exist_ok=True)
    for rel, body in files:
        path = os.path.join(memory_dir, rel)
        os.makedirs(os.path.dirname(path) or memory_dir, exist_ok=True)
        with open(path, "w") as fh:
            fh.write(body)


def tree_digest(memory_dir: str) -> str:
    """SHA-256 over sorted (rel ‖ '\\n' ‖ body ‖ '\\n--\\n')
    (migrate.rs:110-127): two trees with the same files-and-bytes
    produce the same digest — the round-trip guarantee."""
    h = hashlib.sha256()
    for path in _walk_sorted(memory_dir):
        rel = os.path.relpath(path, memory_dir)
        h.update(rel.encode())
        h.update(b"\n")
        with open(path, "rb") as fh:
            h.update(fh.read())
        h.update(b"\n--\n")
    return h.hexdigest()


def ingest_cma_tree(engine, spark, memory_dir: str, default_agent: str, now,
                    mode: str = "write_through"):
    """Wire the importer into the engine (the caller-side ingestion
    migrate.rs leaves to mnemo-cli): bridge the tree's metadata chain
    driver-side, then flow the .md bodies through the shared
    distributed md_sync parse path.

    read_through: answer from the tree WITHOUT persisting
    (tree.rs:9-12) — returns (engine unchanged, rows, summary).
    write_through/mirror: remember the rows as new versions —
    returns (new engine, rows, summary). Mirror's reconciliation is
    export_to_tree + tree_digest equality, engine-wins.
    """
    if mode not in SYNC_MODES:
        raise ValueError(f"unknown SyncMode {mode!r}; expected one of {SYNC_MODES}")
    from mnemo_spark.sources.md_sync import md_memory_rows, read_md_dir

    summary, _bridged = import_cma_tree(memory_dir)
    parsed = read_md_dir(spark, memory_dir)
    rows = md_memory_rows(parsed, default_agent, now)
    if mode == "read_through":
        return engine, rows, summary
    return engine.remember_batch(rows), rows, summary
