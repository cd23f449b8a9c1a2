"""Harness envelopes (reference U3, src/retrieval.rs:439-610):
presentation adapters that render typed recall hits into the string
envelope a nominated agent harness expects.

Pure post-processing over an already top-k (driver-sized) hits frame:
rendering collects the k rows — the one place driver-side collect is
the right call, because the output IS a single string for one consumer.
Retrieval itself is untouched (HarnessAware delegates to the ordinary
hybrid recall, exactly like the reference).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

HARNESSES = ("claude_code", "codex", "gemini_cli", "chronos", "generic")
FORMATS = ("inline", "file_based", "side_channel")


def _first_line(text: str) -> str:
    return (text or "").splitlines()[0].strip() if text else ""


def shape_envelope(
    hits: DataFrame,
    harness: str = "generic",
    fmt: str = "inline",
    id_col: str = "id",
    score_col: str = "score",
    content_col: str = "content",
) -> str:
    """Render ranked hits for a harness (retrieval.rs:487-610).

    claude_code inline: markdown sections with fenced content;
    non-inline: one-line pointers. codex: JSON (file_based = pointer
    summary, inline = full content). gemini_cli: numbered [N] lines.
    chronos: timeline one-liners. generic: TSV fallback.
    """
    if harness not in HARNESSES:
        raise ValueError(f"unknown harness {harness!r}; expected one of {HARNESSES}")
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    rows = (
        hits.select(id_col, score_col, content_col)
        .toLocalIterator()  # k rows; no full-frame materialization spike
    )
    rows = [(str(r[0]), float(r[1]), r[2] or "") for r in rows]

    if harness == "claude_code":
        out = ["# mnemo.recall (Claude Code envelope)", ""]
        for i, (mid, score, content) in enumerate(rows, 1):
            if fmt == "inline":
                out.append(
                    f"## hit {i} (recall://{mid} • score {score:.3f})\n"
                    f"```\n{content}\n```\n"
                )
            else:
                out.append(
                    f"- hit {i} → `recall://{mid}` (score {score:.3f}): "
                    f"{_first_line(content)}"
                )
        return "\n".join(out) + ("\n" if fmt != "inline" else "")
    if harness == "codex":
        if fmt == "file_based":
            ptrs = [{"id": mid, "score": round(score, 3)} for mid, score, _ in rows]
            return json.dumps({"envelope": "codex_file_based", "hits": ptrs})
        blocks = [
            {"id": mid, "score": round(score, 3), "content": content}
            for mid, score, content in rows
        ]
        return json.dumps({"envelope": "codex_inline", "hits": blocks})
    if harness == "gemini_cli":
        lines = ["mnemo recall (Gemini CLI envelope)"]
        lines += [
            f"[{i}] score={score:.3f} id={mid} — {content}"
            for i, (mid, score, content) in enumerate(rows, 1)
        ]
        return "\n".join(lines) + "\n"
    if harness == "chronos":
        lines = ["chronos recall envelope"]
        lines += [
            f"t={score:.3f} id={mid} :: {_first_line(content)}"
            for mid, score, content in rows
        ]
        return "\n".join(lines) + "\n"
    # generic TSV: content made single-line so the envelope stays parseable
    lines = [
        "\t".join(
            (mid, f"{score:.3f}", content.replace("\t", " ").replace("\n", " ").replace("\r", " "))
        )
        for mid, score, content in rows
    ]
    return "\n".join(lines) + ("\n" if lines else "")
