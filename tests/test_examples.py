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
