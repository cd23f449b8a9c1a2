"""Regulatory-compliance surfaces (reference crates/mnemo-compliance).

Four modules, re-expressed relationally:

- **Retention-conformance profiles** (retention.rs): named obligations
  (DPDP Rules ≥1y, EU AI Act Art.19 ≥6mo, HIPAA §164.312(b) 6y) whose
  `verify_path` compares event-log snapshots taken before/after a
  deletion/compaction/migration path ran and reports drops within the
  retention floor + rewrites of retained rows. Here that diff is two
  joins (anti for drops, inner for immutability) instead of a
  driver-side HashMap walk — at 100 TB the before/after logs never
  leave the cluster.
- **Consent gate** (consent.rs ConsentState + mannsetu.rs
  ConsentTokenGuard): every write presents (subject, scope, token);
  the guard refuses missing / expired / wrong-subject / wrong-scope /
  revoked consent BEFORE the engine sees the data. One broadcast
  join + when-cascade over the writes stream (the consent table is
  manifest-sized); the HTTP consent-manager bindings themselves are
  transport (SURVEY §3.3) — the decision semantics live here.
- **EU AI Act audit export** (audit.rs): NDJSON with a per-line
  Ed25519 signature chaining to the previous line, or the AI-Office
  CSV template. The chain fold is inherently sequential over a
  bounded export window (the reference also operates on a sliced
  `&[AgentEvent]`); bodies are collected only for the window being
  exported.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86_400

# retention.rs:63-99 — vetted defaults; floors are configurable
RETENTION_PROFILES = {
    "dpdp-rules": {
        "floor_days": 365,
        "obligation": "India DPDP Rules 2025 — retain personal data, traffic "
        "data and processing logs (Seventh Schedule)",
    },
    "eu-ai-act-art19": {
        "floor_days": 180,
        "obligation": "EU AI Act Art.19/26(6) — keep automatically-generated "
        "logs for at least six months",
    },
    "hipaa-164.312b": {
        "floor_days": 2190,
        "obligation": "HIPAA 45 CFR §164.312(b) audit controls — documentation "
        "retained six years (§164.316(b)(2))",
    },
}


def retention_verify_path(
    before: DataFrame,
    after: DataFrame,
    path: str,
    now,
    profile: str = "dpdp-rules",
    floor_days: int | None = None,
    id_col: str = "event_id",
    ts_col: str = "ts",
    hash_cols: tuple = ("content_hash", "prev_hash"),
) -> DataFrame:
    """retention.rs:148-208 verify_path as a relational diff.

    → one row: (path, profile, floor_days, n_before, n_after,
    dropped_total, dropped_in_floor, rewritten, ok). ok ⇔ nothing
    inside the floor was dropped and no retained row was rewritten
    (drops OUTSIDE the floor are lawful housekeeping and only
    counted).
    """
    days = floor_days if floor_days is not None else RETENTION_PROFILES[profile]["floor_days"]
    now_c = F.lit(now).cast("timestamp")
    age_s = F.unix_timestamp(now_c) - F.unix_timestamp(F.col(ts_col))
    in_floor = age_s < days * SECONDS_PER_DAY

    a = after.select(
        F.col(id_col).alias("_aid"),
        *[F.col(c).alias(f"_a_{c}") for c in hash_cols],
    )
    joined = before.join(a, before[id_col] == F.col("_aid"), "left")
    dropped = F.col("_aid").isNull()
    rewritten = ~dropped & (
        sum(
            [(F.col(c) != F.col(f"_a_{c}")).cast("int") for c in hash_cols],
            F.lit(0),
        )
        > 0
    )
    agg = joined.agg(
        F.count("*").alias("n_before"),
        F.sum(dropped.cast("long")).alias("dropped_total"),
        F.sum((dropped & in_floor).cast("long")).alias("dropped_in_floor"),
        F.sum(rewritten.cast("long")).alias("rewritten"),
    )
    n_after = after.count()
    return agg.select(
        F.lit(path).alias("path"),
        F.lit(profile).alias("profile"),
        F.lit(days).cast("int").alias("floor_days"),
        "n_before",
        F.lit(n_after).cast("long").alias("n_after"),
        "dropped_total",
        "dropped_in_floor",
        "rewritten",
        ((F.col("dropped_in_floor") == 0) & (F.col("rewritten") == 0)).alias("ok"),
    )


CONSENT_DECISIONS = (
    "allow",
    "deny_no_consent",
    "deny_expired",
    "deny_scope",
    "deny_revoked",
)


def consent_gate(
    writes: DataFrame,
    consents: DataFrame,
    now,
    subject_col: str = "subject_id",
    scope_col: str = "scope",
) -> DataFrame:
    """Per-write consent decision (consent.rs ConsentState.has_scope /
    is_active; mannsetu.rs:229-266 ConsentTokenGuard::authorize).

    writes: one row per attempted processing op with (subject, scope).
    consents: the consent-manager snapshot — (subject_id, scope,
    expires_at nullable, token_sha256, revoked boolean). → writes +
    (decision, token_sha256): allow carries the grant's token hash
    into the audit trail (consent.rs:31-33); denials name the reason,
    checked in the guard's order (missing → expired → revoked →
    scope). The consent table is broadcast — it is manifest-sized
    next to a 100-TB write stream.
    """
    now_c = F.lit(now).cast("timestamp")
    active = F.col("expires_at").isNull() | (F.col("expires_at") > now_c)
    # ONE broadcast keyed by subject instead of two (per-subject flag +
    # per-(subject, scope) grant): the write stream is the 100-TB side,
    # so every probe it saves is paid per write row, and one broadcast
    # build replaces two over the same consent snapshot (r13, guide
    # §2.4/§3.1 — two operations keyed the same way share one pass).
    # Level 1: per (subject, scope) — did ANY consent row make this
    # scope active, is one of those unrevoked, and which token hash
    # authorizes it (min = deterministic). Level 2: roll scopes up to
    # one row per subject carrying a scope→(live, token) map; a scope
    # enters the map exactly when the old grant frame had its key (≥1
    # active row). NULL scopes stay out of the map — the old equi-join
    # never matched them either.
    live_grant = active & ~F.col("revoked")
    per_scope = consents.groupBy(
        F.col(subject_col).alias("_subj"), F.col(scope_col).alias("_scope")
    ).agg(
        F.max(active.cast("int")).alias("_act"),
        F.max(live_grant.cast("int")).alias("_live"),
        F.min(F.when(live_grant, F.col("token_sha256"))).alias("_token"),
    )
    per_subject = per_scope.groupBy("_subj").agg(
        F.max("_act").alias("_has_active"),
        F.map_from_entries(
            F.collect_list(
                F.when(
                    (F.col("_act") == 1) & F.col("_scope").isNotNull(),
                    F.struct(
                        F.col("_scope").alias("k"),
                        F.struct(
                            F.col("_live").alias("live"),
                            F.col("_token").alias("token"),
                        ).alias("v"),
                    ),
                )
            )
        ).alias("_grants"),
    )
    j = writes.join(
        F.broadcast(per_subject), writes[subject_col] == F.col("_subj"), "left"
    )
    g = F.try_element_at(F.col("_grants"), writes[scope_col])
    decision = (
        F.when(F.col("_subj").isNull(), F.lit("deny_no_consent"))
        .when(F.col("_has_active") == 0, F.lit("deny_expired"))
        .when(g.isNull(), F.lit("deny_scope"))
        .when(g["live"] == 0, F.lit("deny_revoked"))
        .otherwise(F.lit("allow"))
    )
    return j.select(
        *[writes[c] for c in writes.columns],
        decision.alias("decision"),
        F.when(decision == "allow", g["token"]).alias("token_sha256"),
    )


GENESIS_HEX = "0" * 64


def export_audit_log(
    events: list[dict],
    fmt: str = "ndjson_signed",
    signing_key: bytes | None = None,
) -> dict:
    """audit.rs:80-147 export_audit_log over an already-sliced,
    chronologically-ordered export window (the reference takes
    `&[AgentEvent]` the same way).

    ndjson_signed: each line {"i", "e", "prev", "sig"} where sig =
    Ed25519(sha256(i ‖ prev_hex ‖ canonical_json(event))) and the next
    line's prev is that digest — tamper with any line and every later
    signature breaks. eu-ai-office-csv: the columnar template with
    RFC4180 escaping. → {"format", "bytes", "verifying_key_hex",
    "event_count"}; empty windows fail loud (EmptyAuditWindow).
    """
    if not events:
        raise ValueError("EmptyAuditWindow: refusing to export zero events")
    if fmt == "eu_ai_office_csv":
        cols = ("event_id", "timestamp", "agent_id", "event_type", "model",
                "thread_id", "tokens_input", "tokens_output", "content_hash")
        out = [",".join(cols)]
        for e in events:
            out.append(",".join(_csv_escape(str(e.get(c, "") or "")) for c in cols))
        return {
            "format": fmt,
            "bytes": ("\n".join(out) + "\n").encode(),
            "verifying_key_hex": None,
            "event_count": len(events),
        }
    if fmt != "ndjson_signed":
        raise ValueError(f"unknown audit format {fmt!r}")
    if signing_key is None:
        raise ValueError("Signature: NdjsonSigned export requires a signing key")
    from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey

    sk = Ed25519PrivateKey.from_private_bytes(signing_key)
    vk_hex = sk.public_key().public_bytes_raw().hex()
    out_lines = []
    prev = GENESIS_HEX
    for i, e in enumerate(events):
        event_json = json.dumps(e, sort_keys=True, default=str)
        digest = hashlib.sha256(
            str(i).encode() + prev.encode() + event_json.encode()
        ).digest()
        sig = sk.sign(digest).hex()
        out_lines.append(
            json.dumps(
                {"i": i, "e": json.loads(event_json), "prev": prev, "sig": sig},
                sort_keys=True,
            )
        )
        prev = digest.hex()
    return {
        "format": fmt,
        "bytes": ("\n".join(out_lines) + "\n").encode(),
        "verifying_key_hex": vk_hex,
        "event_count": len(events),
    }


def verify_ndjson_export(data: bytes, verifying_key_hex: str) -> int:
    """Offline verifier for the signed NDJSON trail: recompute each
    line's digest from (i, prev, canonical event), check the chain
    linkage AND the Ed25519 signature. Returns the number of verified
    lines; raises on the first break."""
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PublicKey

    vk = Ed25519PublicKey.from_public_bytes(bytes.fromhex(verifying_key_hex))
    prev = GENESIS_HEX
    n = 0
    for raw in data.decode().splitlines():
        line = json.loads(raw)
        if line["prev"] != prev:
            raise ValueError(f"chain break at line {line['i']}: prev mismatch")
        event_json = json.dumps(line["e"], sort_keys=True, default=str)
        digest = hashlib.sha256(
            str(line["i"]).encode() + prev.encode() + event_json.encode()
        ).digest()
        try:
            vk.verify(bytes.fromhex(line["sig"]), digest)
        except InvalidSignature as exc:
            raise ValueError(f"bad signature at line {line['i']}") from exc
        prev = digest.hex()
        n += 1
    return n


def _csv_escape(s: str) -> str:
    if "," in s or '"' in s or "\n" in s:
        return '"' + s.replace('"', '""') + '"'
    return s
