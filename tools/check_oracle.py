"""Local replica of the driver's correctness gate.

Runs every registry query in Spark AND its DuckDB oracle SQL on the
same sf dir, compares row count, column names, and order-insensitive
values (floats rounded within the queries themselves). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from mnemo_spark.io import TABLES, table_path  # noqa: E402
from mnemo_spark.registry import ORACLE, QUERIES  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    # Type-strict like the driver's hasher: an integer-typed 509 and a
    # float-typed 509.0 must NOT normalize to the same string (DuckDB
    # HUGEINT sums surface as float64 — the round-1 hash-fail mode).
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return "f:" + f"{v:.9g}"
    if isinstance(v, Decimal):
        return "f:" + f"{float(v):.9g}"
    if isinstance(v, int):
        return "i:" + str(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLE:
            # rows-only queries are SELF-verifying: any boolean check
            # column (valid, roundtrip_ok, ...) must be uniformly true
            check_cols = [
                i
                for i, c in enumerate(scols)
                if c in ("valid", "roundtrip_ok", "ciphertext_differs")
            ]
            bad = [
                r for r in srows if any(r[i] is not True for i in check_cols)
            ]
            if check_cols and bad:
                print(f"FAIL {name}: self-check column false on {len(bad)} rows")
                failures.append(name)
                continue
            print(f"SKIP {name}: no oracle ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(ORACLE[name])
            ocols = [c.lower() for c in res.columns]
            otypes = [str(t) for t in res.types]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        # fetchall() hides HUGEINT (returns Python int), but the driver's
        # pandas path renders it float64 → hash mismatch vs Spark bigint.
        huge = [c for c, t in zip(ocols, otypes) if "HUGEINT" in t]
        if huge:
            print(f"FAIL {name}: oracle HUGEINT column(s) {huge} — add CAST(... AS BIGINT)")
            failures.append(name)
            continue

        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={scols} duckdb={ocols}")
            failures.append(name)
            continue
        sn = norm_rows(scols, srows)
        on = norm_rows(ocols, orows)
        if len(sn) != len(on):
            print(f"FAIL {name}: rowcount spark={len(sn)} duckdb={len(on)}")
            failures.append(name)
            continue
        if sn != on:
            bad = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            failures.append(name)
            continue
        print(f"OK   {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
