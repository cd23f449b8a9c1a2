"""The worked examples must keep running and keep their asserted
guarantees — they are the user-facing composition proof."""

from __future__ import annotations

import json
import sys


def test_training_pipeline_example(spark, sf_dir, capsys, monkeypatch):
    from examples import training_data_pipeline as ex

    monkeypatch.setattr(sys, "argv", ["x", sf_dir])
    ex.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["input"] >= out["after_exact_dedup"] >= out["after_near_dedup"]
    assert out["packed_sequences"] > 0


def test_agent_memory_demo_example(capsys):
    from examples import agent_memory_demo as ex

    ex.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bob_sees_secret"] is False
    assert out["chain_intact_after_roundtrip"] is True


def test_interop_tour_example(capsys):
    from examples import interop_tour as ex

    ex.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["amp_stored"] and out["amp_rejected_secret"]
    assert out["letta_blocks"] == 2 and out["letta_reply_recalled"]
    assert out["mesh_decisions"] == ["allow", "deny_namespace_mismatch"]
    assert out["mesh_chain_linked"]
    assert out["deal_dispute_offset"] == 3
    assert out["cma_roundtrip_stable"]
    assert out["consent_decisions"] == ["allow", "deny_no_consent"]
    assert out["audit_lines_verified"] >= 1
