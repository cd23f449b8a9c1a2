"""Parallel pytest runner — the suite sharded by FILE across worker
processes, each with its own SparkSession (VERDICT r10 #6: the
sequential suite hit 41-49 min on one local[8] session and was
becoming the round's binding constraint; pytest-xdist is not in the
sandbox, so this is the dependency-free equivalent).

Design: a dynamic work queue of test files, N worker threads each
running `pytest <file>` as a subprocess with MNEMO_TEST_CPUS=4 and an
8g driver (8 workers x local[4] saturates the 32-core box; 8 x 8g
stays far under the 128 GiB heap). Files are ordered longest-first
from the previous run's recorded durations (tests/.partest_durations
.json, refreshed every run; file size is the cold-start proxy) so the
makespan isn't hostage to a long tail. Per-file isolation is CLEANER
than the shared session, not dirtier — no cross-file cache/serving
state — and every file gets identical fixtures (conftest.py's
session scope becomes per-file scope).

Exit: non-zero if ANY file fails, errors, or collects zero tests.
Usage: python tools/partest.py [-jN] [pytest-file-substring ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path
from queue import Empty, Queue

REPO = Path(__file__).resolve().parents[1]
TESTS = REPO / "tests"
DUR_PATH = TESTS / ".partest_durations.json"


def main() -> int:
    workers = 8
    pats = []
    for a in sys.argv[1:]:
        if a.startswith("-j"):
            workers = int(a[2:])
        else:
            pats.append(a)
    files = sorted(TESTS.glob("test_*.py"))
    if pats:
        files = [f for f in files if any(p in f.name for p in pats)]
    if not files:
        print("partest: no test files matched", file=sys.stderr)
        return 2
    try:
        dur = json.loads(DUR_PATH.read_text())
    except Exception:  # noqa: BLE001 - first run / stale file
        dur = {}
    files.sort(key=lambda p: -float(dur.get(p.name, p.stat().st_size / 1000.0)))

    env = dict(
        os.environ,
        MNEMO_TEST_CPUS=os.environ.get("MNEMO_TEST_CPUS", "4"),
        MNEMO_SPARK_DRIVER_MEM=os.environ.get("MNEMO_SPARK_DRIVER_MEM", "8g"),
    )
    q: Queue = Queue()
    for f in files:
        q.put(f)
    results: dict[str, tuple[int, float, str]] = {}
    lock = threading.Lock()
    t_start = time.time()

    def work() -> None:
        while True:
            try:
                f = q.get_nowait()
            except Empty:
                return
            t0 = time.time()
            p = subprocess.run(
                [
                    sys.executable,
                    "-m",
                    "pytest",
                    str(f),
                    "-q",
                    "--tb=line",
                    "-p",
                    "no:cacheprovider",
                ],
                capture_output=True,
                text=True,
                cwd=REPO,
                env=env,
            )
            dt = time.time() - t0
            tail = (p.stdout or "")[-6000:] + (p.stderr or "")[-2000:]
            with lock:
                results[f.name] = (p.returncode, dt, tail)
                status = "ok" if p.returncode == 0 else f"RC={p.returncode}"
                last = next(
                    (
                        ln
                        for ln in reversed((p.stdout or "").splitlines())
                        if "passed" in ln or "failed" in ln or "error" in ln
                    ),
                    "",
                )
                print(
                    f"[{len(results):>2}/{len(files)}] {f.name:<38}"
                    f" {dt:7.1f}s {status:<6} {last.strip()}",
                    flush=True,
                )

    threads = [threading.Thread(target=work) for _ in range(min(workers, len(files)))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    if not pats:  # only refresh the duration book on full runs
        try:
            DUR_PATH.write_text(
                json.dumps(
                    {k: round(v[1], 1) for k, v in sorted(results.items())},
                    indent=0,
                )
            )
        except Exception:  # noqa: BLE001 - bookkeeping only
            pass

    wall = time.time() - t_start
    bad = {k: v for k, v in results.items() if v[0] != 0}
    # auditable totals (VERDICT r11 #3): sum the per-file pass/fail
    # counts out of each pytest summary line so the artifact's
    # per-file listing, this total, and `pytest --collect-only -q`
    # are three mutually checkable statements of the same number
    import re

    counts = {
        "passed": 0,
        "failed": 0,
        "error": 0,
        "skipped": 0,
        "xfailed": 0,
        "xpassed": 0,
    }
    unparsed = []
    # ADVICE r12: match xfailed/xpassed (bucketed explicitly) and
    # recognize a skipped-only summary line, so the totals line can
    # never silently undercount vs the --collect-only cross-check
    kinds_re = r"(x?passed|x?failed|errors?|skipped)"
    for name, (_, _, tail) in sorted(results.items()):
        summary = next(
            (
                ln
                for ln in reversed(tail.splitlines())
                if re.search(rf"\d+ {kinds_re}", ln)
            ),
            None,
        )
        if summary is None:
            unparsed.append(name)
            continue
        for n, kind in re.findall(rf"(\d+) {kinds_re}", summary):
            counts[kind[:-1] if kind == "errors" else kind] += int(n)
    print(f"\npartest: {len(files)} files in {wall:.0f}s wall "
          f"({sum(v[1] for v in results.values()):.0f}s cpu-serial), "
          f"{len(bad)} failed")
    total = sum(counts.values())
    print(
        f"partest totals: {total} tests = "
        + ", ".join(f"{v} {k}" for k, v in counts.items() if v)
        + (f" (UNPARSED: {unparsed})" if unparsed else "")
    )
    for name, (rc, _, tail) in sorted(bad.items()):
        print(f"\n===== {name} (rc={rc}) =====\n{tail}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
