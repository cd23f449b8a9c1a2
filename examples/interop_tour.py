"""Interop tour: one engine serving every satellite-crate protocol.

An operator runs ONE relational engine and speaks, in order:
AMP (remember through the approval gate) → Letta (agent blocks +
message) → Mesh (ACL decision + chained audit envelope) → deal
ledger (sign, tamper, pinpoint the dispute) → CMA (export a tree,
re-import it to the same digest) → compliance (consent-gate a write
batch, export the signed audit trail and verify it offline).

Run: python examples/interop_tour.py
Prints one JSON line of stage outcomes.
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mnemo_spark.engine import MnemoSparkEngine  # noqa: E402
from mnemo_spark.functions.amp import AmpStore  # noqa: E402
from mnemo_spark.functions.letta import core_memory, create_agent, send_message  # noqa: E402
from mnemo_spark.operators.compliance import (  # noqa: E402
    consent_gate,
    export_audit_log,
    verify_ndjson_export,
)
from mnemo_spark.operators.deal import sign_deals, verify_deal_chain  # noqa: E402
from mnemo_spark.operators.mesh import authorize_ops, chain_audit_envelopes  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402
from mnemo_spark.sources.cma import export_to_tree, import_cma_tree, tree_digest  # noqa: E402

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)
KEY = b"interop-tour-demo-hmac-key-32-b!"


def main() -> None:
    spark = get_spark("interop_tour", cpus=8)
    out: dict = {}

    # -- AMP: approval-gated long-term write ---------------------------
    amp = AmpStore(
        MnemoSparkEngine(spark),
        default_agent="ops-agent",
        approval_hook=lambda diff: ("secret" not in diff.after, "secrets refused"),
    )
    ok = amp.dispatch(
        {"op": "remember", "memory_type": "semantic",
         "content": "deploys go out friday mornings"},
        now=T0,
    )
    try:
        amp.dispatch(
            {"op": "remember", "memory_type": "semantic",
             "content": "the secret staging password"},
            now=T0,
        )
        out["amp_rejected_secret"] = False
    except Exception:  # noqa: BLE001 — the gate refuses, by design
        out["amp_rejected_secret"] = True
    out["amp_stored"] = bool(ok["ids"])
    # commit each protocol stage before the next reads it (lineage
    # truncation — keeps every later action O(its own stage))
    eng = amp.engine.materialized()

    # -- Letta: same engine hosts a Letta-shaped agent -----------------
    eng, aid = create_agent(eng, T0, persona="terse", human="likes fridays")
    eng = eng.materialized()
    eng, reply = send_message(eng, aid, "when do deploys happen?",
                              T0 + dt.timedelta(seconds=1))
    eng = eng.materialized()
    out["letta_blocks"] = core_memory(eng, aid).count()
    out["letta_reply_recalled"] = reply.startswith("Recalled")

    # -- Mesh: decide + chain the decision into an audit ledger --------
    ops = spark.createDataFrame(
        [("spiffe://prod/agent-1", "att", "prod", "memories", "recall", 1),
         ("spiffe://dev/agent-9", "att", "prod", "memories", "recall", 2)],
        "spiffe_id string, attestation string, tenant string, scope string,"
        " op string, seq long",
    )
    decided = authorize_ops(ops, None)  # trust-domain mode
    chained = chain_audit_envelopes(decided, ["tenant"], ["seq"]).orderBy("seq")
    rows = chained.collect()
    out["mesh_decisions"] = sorted(r["decision"] for r in rows)
    out["mesh_chain_linked"] = rows[1]["prev_hash"] == rows[0]["chain_hash"]

    # -- Deal ledger: sign, tamper, pinpoint ---------------------------
    deals = spark.createDataFrame(
        [("L", f"d{i}", "buyer-a", "seller-b", f'{{"task":{i}}}',
          f"2024-03-01 09:00:0{i}") for i in range(5)],
        "ledger string, deal_id string, buyer string, seller string,"
        " terms string, signed_at string",
    )
    signed = sign_deals(deals, KEY, ["ledger"], ["signed_at", "deal_id"])
    tampered = signed.withColumn(
        "terms", F.when(F.col("deal_id") == "d3", F.lit("{forged}"))
        .otherwise(F.col("terms")),
    )
    report = verify_deal_chain(tampered, KEY, ["ledger"], ["signed_at", "deal_id"])
    out["deal_dispute_offset"] = report.collect()[0]["divergent_offset"]

    # -- CMA: leave cleanly, come back to the same digest --------------
    with tempfile.TemporaryDirectory() as tmp:
        tree = str(Path(tmp) / ".memory")
        export_to_tree(tree, [("persona.md", "be terse"), ("notes/a.md", "friday")])
        digest1 = tree_digest(tree)
        summary, _ = import_cma_tree(tree)
        out["cma_roundtrip_stable"] = (
            summary["memories"] == 2 and tree_digest(tree) == digest1
        )

    # -- Compliance: consent-gate writes, export + verify the trail ----
    writes = spark.createDataFrame(
        [("subj-1", "analytics"), ("subj-2", "analytics")],
        "subject_id string, scope string",
    )
    consents = spark.createDataFrame(
        [("subj-1", "analytics", None, "tok-1", False)],
        "subject_id string, scope string, expires_at timestamp,"
        " token_sha256 string, revoked boolean",
    )
    dec = consent_gate(writes, consents, "2024-03-01 00:00:00")
    out["consent_decisions"] = sorted(r["decision"] for r in dec.collect())
    events = [
        {"event_id": r["event_id"], "agent_id": r["agent_id"],
         "event_type": r["event_type"], "timestamp": str(r["ts"])}
        for r in eng.events.orderBy("ts", "event_id").collect()
    ]
    bundle = export_audit_log(events, "ndjson_signed", signing_key=bytes(range(32)))
    out["audit_lines_verified"] = verify_ndjson_export(
        bundle["bytes"], bundle["verifying_key_hex"]
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
