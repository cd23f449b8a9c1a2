"""Mesh runtime adapter: per-namespace ACL + chained audit envelopes
(reference crates/mnemo-mesh).

The reference gates every privileged op behind a MeshPolicyEnforcer
(policy.rs:93-121 `StaticPolicyEnforcer::authorize`) deciding over a
(SPIFFE identity, namespace tenant/scope, op) triple, then appends a
MeshAuditEnvelope to a sha256-chained ledger (lib.rs:86-120) so
decisions and memory receipts share one timeline.

Spark-first re-expression: the caller presents a DataFrame of ops
(one row per attempted privileged call) and the static policy is a
rules DataFrame; `authorize_ops` is ONE left join + a when-cascade —
no per-op round trips, and the rules side is broadcast (a manifest is
always small). The decision cascade is faithful to policy.rs:
missing identity → deny_missing_identity; empty attestation →
deny_empty_attestation; static-rules mode: rule hit → allow, else
deny; empty-rules (trust-domain) mode: SPIFFE trust domain must equal
the namespace tenant, else deny_namespace_mismatch.

`chain_audit_envelopes` reuses the engine's sequential-per-key chain
fold (operators/chain.py assign_chain) over the envelope canonical
hash, mirroring next_chain_head = sha256(prev ‖ spiffe ‖ '|' ‖ op ‖
'|' ‖ ns ‖ '|' ‖ decision) (lib.rs:101-110).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mnemo_spark.operators.chain import assign_chain

MEM_OPS = ("recall", "write", "forget", "branch", "replay_as_of", "export_provenance")
DECISIONS = (
    "allow",
    "deny",
    "deny_missing_identity",
    "deny_empty_attestation",
    "deny_namespace_mismatch",
)


def authorize_ops(
    ops: DataFrame,
    rules: DataFrame | None,
    spiffe_col: str = "spiffe_id",
    attestation_col: str = "attestation",
    tenant_col: str = "tenant",
    scope_col: str = "scope",
    op_col: str = "op",
) -> DataFrame:
    """Decide every attempted op. → ops columns + decision.

    ops: one row per privileged call; `spiffe_col` NULL models a
    caller with no identity, `attestation_col` NULL/'' an empty
    token. rules: (spiffe_id, tenant, scope, op) allow rows —
    anything not enumerated denies by default (policy.rs:50-55).
    rules=None selects the reference's empty-rules mode, where the
    only check past identity is SPIFFE-trust-domain == tenant
    (policy.rs:107-113: the trust-domain branch fires only when the
    rule map is empty).
    """
    trust_domain = F.regexp_extract(F.col(spiffe_col), r"^spiffe://([^/]+)/.+$", 1)
    base_denies = F.when(
        F.col(spiffe_col).isNull(), F.lit("deny_missing_identity")
    ).when(
        F.col(attestation_col).isNull() | (F.col(attestation_col) == ""),
        F.lit("deny_empty_attestation"),
    )
    if rules is None:
        decision = base_denies.when(
            trust_domain != F.col(tenant_col), F.lit("deny_namespace_mismatch")
        ).otherwise(F.lit("allow"))
        return ops.withColumn("decision", decision)
    matched = rules.select(
        F.col(spiffe_col), F.col(tenant_col), F.col(scope_col), F.col(op_col),
        F.lit(True).alias("_rule_hit"),
    ).dropDuplicates([spiffe_col, tenant_col, scope_col, op_col])
    joined = ops.join(
        F.broadcast(matched),
        on=[spiffe_col, tenant_col, scope_col, op_col],
        how="left",
    )
    decision = base_denies.when(F.col("_rule_hit"), F.lit("allow")).otherwise(
        F.lit("deny")
    )
    return joined.withColumn("decision", decision).drop("_rule_hit")


def chain_audit_envelopes(
    decisions: DataFrame,
    ledger_cols: Sequence[str],
    order_cols: Sequence[str],
    spiffe_col: str = "spiffe_id",
    tenant_col: str = "tenant",
    scope_col: str = "scope",
    op_col: str = "op",
    decision_col: str = "decision",
    prev_head: DataFrame | None = None,
) -> DataFrame:
    """Chain each decision into the audit ledger (lib.rs:97-120).

    envelope hash = sha256(spiffe ‖ '|' ‖ op ‖ '|' ‖ tenant/scope ‖
    '|' ‖ decision); the running chain fold (prev ‖ envelope) is the
    shared assign_chain primitive, so a Mesh ledger verifies with the
    same verify_chain tooling as the memory-provenance chain — one
    continuous ledger, exactly the reference's pitch. `prev_head`
    carries an existing provenance chain head in (cross-ledger
    handoff, like cross-batch streaming).
    """
    canon = F.concat_ws(
        "|",
        F.coalesce(F.col(spiffe_col), F.lit("")),
        F.col(op_col),
        F.concat_ws("/", F.col(tenant_col), F.col(scope_col)),
        F.col(decision_col),
    )
    enveloped = decisions.withColumn("_env_hash", F.sha2(canon, 256))
    return assign_chain(
        enveloped, ledger_cols, order_cols, "_env_hash", prev_head=prev_head
    ).drop("_env_hash")
