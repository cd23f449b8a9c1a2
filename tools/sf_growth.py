"""Scale-growth probe over REGISTRY queries (not synthetic families).

Times each named registry query at two (or more) sf dirs and prints
the per-10x growth ratio — the direct answer to "would this plan
hold at 100 TB?". A linear operator grows ~10x per 10x data (usually
less on local[32] while parallel slack remains); an all-pairs shape
grows ~100x.

Execution is `df.write.format("noop")` — full plan runs, nothing
collects, so driver-side materialization can't flatter the number.
Warm protocol: one untimed warmup pass per sf dir (JVM/codegen/cache
fill), then min of `--reps` timed passes.

Usage:
    python tools/sf_growth.py sfdirA sfdirB -- query [query ...]
    python tools/sf_growth.py --json out.json sfdirA sfdirB -- q1 q2
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from mnemo_spark.registry import QUERIES  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402


def run_once(spark, name: str, sf: str) -> float:
    df = QUERIES[name](spark, sf)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> int:
    args = sys.argv[1:]
    out_json = None
    reps = 2
    while args and args[0].startswith("--") and args[0] != "--":
        if args[0] == "--json":
            out_json = args[1]
            args = args[2:]
        elif args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(
                f"unknown flag {args[0]!r}; usage: sf_growth.py [--json OUT]"
                " [--reps N] SF_DIR... -- QUERY..."
            )
    sep = args.index("--")
    sf_dirs, names = args[:sep], args[sep + 1:]

    spark = get_spark("sf_growth")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    for sf in sf_dirs:
        for name in names:
            run_once(spark, name, sf)  # warmup: codegen + parquet footer cache
            best = min(run_once(spark, name, sf) for _ in range(reps))
            results.setdefault(name, {})[sf] = round(best, 3)
            print(f"{name} @ {sf}: {best:.2f}s", flush=True)

    print()
    hdr = "query".ljust(34) + "".join(s.split('/')[-1].rjust(10) for s in sf_dirs)
    print(hdr + "   growth")
    for name in names:
        row = results[name]
        times = [row[s] for s in sf_dirs]
        growth = times[-1] / times[0] if times[0] > 0 else float("inf")
        print(
            name.ljust(34)
            + "".join(f"{t:10.2f}" for t in times)
            + f"   {growth:6.1f}x"
        )
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dirs": sf_dirs, "reps": reps, "queries": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
