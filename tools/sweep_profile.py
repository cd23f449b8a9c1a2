"""Whole-registry profile sweep: per-query plan-BUILD time vs ACTION
time vs Spark job count, warm, bench-identical action (.count()).

Where bench.py answers "how long", this answers "where": a query whose
warm cost is mostly BUILD is paying driver-side plan construction /
eager artifact work per call; one whose cost is mostly ACTION with a
high job count is paying stage-barrier chains; one with 1-2 jobs and
all-action time is doing real data work. Usage:

    python tools/sweep_profile.py [--n 3] [--out /tmp/sweep.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mnemo_spark.registry import QUERIES  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    n = 3
    out = "/tmp/sweep.json"
    names = []
    i = 0
    while i < len(args):
        if args[i] in ("--n", "--out"):
            if i + 1 >= len(args):  # ADVICE r13: trailing flag w/o value
                print(f"sweep_profile: {args[i]} requires a value", file=sys.stderr)
                return 2
            if args[i] == "--n":
                n = int(args[i + 1])
            else:
                out = args[i + 1]
            i += 2
        else:
            names.append(args[i]); i += 1
    unknown = [q for q in names if q not in QUERIES]
    if unknown:  # ADVICE r13: a typo must not silently shrink the sweep
        print(f"sweep_profile: unknown queries: {unknown}", file=sys.stderr)
        return 2
    if not names:
        names = sorted(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("MNEMO_CACHE_TABLES", "1")
    spark = get_spark("sweep_profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    from mnemo_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    rows = {}
    for name in names:
        if name not in QUERIES:
            continue
        sc.setJobDescription(f"sweep:{name}")
        # warm-up (codegen + serving caches)
        QUERIES[name](spark, sf_dir).count()
        build, action, jobs = [], [], []
        for _ in range(n):
            before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            after = set(tracker.getJobIdsForGroup(None) or [])
            build.append(t1 - t0)
            action.append(t2 - t1)
            jobs.append(len(after - before))
        rows[name] = {
            "build": round(min(build), 4),
            "action": round(min(action), 4),
            "total": round(min(b + a for b, a in zip(build, action)), 4),
            "jobs": min(jobs),
        }
        sc.setJobDescription(None)
        print(
            f"{name}: build {rows[name]['build']:.3f} action {rows[name]['action']:.3f}"
            f" jobs {rows[name]['jobs']}",
            flush=True,
        )
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1, sort_keys=True)
    tot = sum(r["total"] for r in rows.values())
    b = sum(r["build"] for r in rows.values())
    a = sum(r["action"] for r in rows.values())
    j = sum(r["jobs"] for r in rows.values())
    print(f"TOTAL {tot:.1f}s  build {b:.1f}s  action {a:.1f}s  jobs {j}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
