"""Retrieval-quality regression gate (SURVEY §5 parity axis).

Mirrors the reference's nightly policy
(.github/scripts/check_bench_regression.py): per-strategy recall@10
must stay within `max_regression_pp` percentage points of the
committed baseline (docs/benchmarks/quality_parity.json); a strategy
disappearing from the eval is itself a regression. Runs the SAME
programs the CLI evals publish (tools/eval_quality.py /
tools/eval_ann.py import surface) at sf0.001 so the gate is
per-commit, not nightly.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

BASELINE = json.loads((REPO / "docs/benchmarks/quality_parity.json").read_text())
SF_DIR = "/root/testdata/sf0.001"


def _gate(measured: dict, committed: dict, max_pp: float) -> list[str]:
    problems = []
    for strategy, base_metrics in committed["strategies"].items():
        got = measured["strategies"].get(strategy)
        if got is None:
            problems.append(f"strategy {strategy!r} dropped from the eval")
            continue
        base = base_metrics["recall@10"]
        now = got["recall@10"]
        if (base - now) * 100.0 > max_pp:
            problems.append(
                f"{strategy}: recall@10 {now:.4f} regressed >{max_pp}pp "
                f"below committed {base:.4f}"
            )
    return problems


def test_retrieval_quality_gate(spark):
    from eval_quality import evaluate

    measured = evaluate(spark, SF_DIR, 100)
    problems = _gate(
        measured,
        BASELINE["retrieval"]["sf0.001"],
        BASELINE["max_regression_pp"],
    )
    assert not problems, "; ".join(problems)
    # the committed ordering property: fused ranking beats both single
    # lanes on MRR (the rank-sensitive metric RRF optimizes; recall@10
    # at the tiny sf0.001 corpus is too quantized to order lanes)
    s = measured["strategies"]
    assert s["hybrid"]["mrr"] >= max(s["lexical"]["mrr"], s["semantic"]["mrr"])


def test_ann_quality_gate(spark):
    from eval_ann import evaluate

    measured = evaluate(spark, SF_DIR, 50)
    problems = _gate(
        measured,
        BASELINE["ann_vs_exact"]["sf0.001"],
        BASELINE["max_regression_pp"],
    )
    assert not problems, "; ".join(problems)
    # self-retrieval invariant: both bucketing schemes co-locate a
    # vector with itself, so recall@1 against the exact oracle is 1.0
    for strategy, m in measured["strategies"].items():
        assert m["recall@1"] == 1.0, strategy
