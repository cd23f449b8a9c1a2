"""Warm-profile registry queries: noop-sink timings + Spark job counts.

Usage: python tools/profile_query.py <query> [query ...] [--n 5] [--count]

Methodology per the optimization guide §1.4: the timed action is the
noop sink (computes every column, no collect), run --n times warm
after one untimed warm-up; reports min/median and the number of Spark
jobs the warm execution launches (stage-barrier chains show up as job
count, the r12 REST-metrics lesson). --count times .count() instead,
matching bench.py's action.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mnemo_spark.registry import QUERIES  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    n = 5
    use_count = False
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1]); i += 2
        elif args[i] == "--count":
            use_count = True; i += 1
        else:
            names.append(args[i]); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("MNEMO_CACHE_TABLES", "1")
    spark = get_spark("profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}")
            continue
        sc.setJobDescription(f"profile:{name}")
        # warm-up (pays codegen + populates serving caches)
        df = QUERIES[name](spark, sf_dir)
        if use_count:
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        times = []
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        job_counts = []
        for _ in range(n):
            before = tracker.getJobIdsForGroup(None) or []
            df = QUERIES[name](spark, sf_dir)
            t0 = time.time()
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            after = tracker.getJobIdsForGroup(None) or []
            job_counts.append(len(set(after) - set(before)))
        sc.setJobDescription(None)
        print(
            f"{name}: min {min(times):.3f}s median {statistics.median(times):.3f}s"
            f" jobs/run {job_counts}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
