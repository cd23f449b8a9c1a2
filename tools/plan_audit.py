"""Physical-plan audit over the whole query registry.

Flags the four classic scale-killers in every registered query's
executed plan at a given sf dir:

- ordered Window with no partition spec (single-task global sort);
- Exchange SinglePartition that is not under a final limit/TakeOrdered
  (all data through one task);
- CartesianProduct / BroadcastNestedLoopJoin (unbounded pair blowup);
- BatchEvalPython (row-at-a-time Python UDF — the slow path; Arrow
  forms print ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas
  and are licensed at the documented seams).

Exit 0 when only allowlisted hits remain; prints one line per finding.
Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")

from mnemo_spark.registry import QUERIES  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402

# (query, pattern) pairs that are DELIBERATE and documented; a global
# window over a frame that is k-sized / dimension-bounded by
# construction is fine — the docstrings at each site say why.
ALLOW = {
    # k-row or month/window-dimension frames (bounded by construction)
    ("revenue_mom_orders", "window"),        # months dimension (~tens)
    ("revenue_mom_orders", "single"),        # same month-dim sort
    # (envelope_lines_docs was allowlisted here until r7 — WRONG: its
    # window input was the FULL documents table, not the k survivors;
    # now fixed via top_k_ranked and no longer exempt)
    ("ivf_ann_topk", "window"),              # k probe results
    ("cosine_near_dup_embeddings", "single"),
    # final global top-k / single-row reduces: SinglePartition under
    # a limit or a 1-row aggregate is the intended terminal shape
}

# A BroadcastNestedLoopJoin whose BUILD side is a 1-row aggregate
# (the scalar-subquery pattern: corpus N, a threshold, an average, a
# literal now()-frame) or an explicit Limit is a constant-sized
# broadcast — not a pair blowup. Detected by scanning the build
# subtree for a keyless aggregate / one-row local relation.
_SCALAR_BUILD = re.compile(
    r"HashAggregate\(keys=\[\]|SortAggregate\(key=\[\]|"
    r"ObjectHashAggregate\(keys=\[\]|LocalTableScan|OneRowRelation|"
    r"ReusedExchange|GlobalLimit|CollectLimit"
)


def _node_pos(line: str) -> int:
    """Column of this plan line's tree connector (+- or :-), or the
    first non-art character for the root; -1 for non-node lines."""
    m = re.search(r"[+:]-", line)
    if m:
        return m.start()
    s = line.strip()
    if not s or s.startswith("=="):
        return -1
    return len(line) - len(line.lstrip())


def _build_side(lines: list[str], i: int) -> str:
    """Text of the BUILD subtree of the join node at line i: its
    children sit 3 columns deeper; BuildRight means the LAST child."""
    p = _node_pos(lines[i])
    kids = []
    for j in range(i + 1, len(lines)):
        q = _node_pos(lines[j])
        if q < 0:
            continue
        if q <= p:
            break
        if q == p + 3:
            kids.append(j)
    if not kids:
        return ""
    start = kids[-1]
    end = len(lines)
    for j in range(start + 1, len(lines)):
        q = _node_pos(lines[j])
        if 0 <= q <= p:
            end = j
            break
    return " ".join(lines[start:end])


def audit_plan(name: str, plan: str) -> list[str]:
    finds = []
    lines = plan.splitlines()
    for i, raw in enumerate(lines):
        line = raw.strip()
        m = re.search(r"\bWindow (\[.*)", line)
        if m and ("ASC" in line or "DESC" in line):
            if len(re.findall(r"\], \[", m.group(1))) < 2:
                if (name, "window") not in ALLOW:
                    finds.append(f"unpartitioned-ordered-window: {line[:140]}")
        if "CartesianProduct" in line or "BroadcastNestedLoopJoin" in line:
            if not _SCALAR_BUILD.search(_build_side(lines, i)):
                finds.append(f"nested-loop-join: {line[:140]}")
        if "BatchEvalPython" in line:
            finds.append(f"row-at-a-time-python-udf: {line[:140]}")
        if "Exchange SinglePartition" in line:
            # look up the tree (previous lines with less indent) for a
            # limit/TakeOrdered/aggregate consumer — the legitimate uses
            ctx = " ".join(lines[max(0, i - 6): i])
            ok = re.search(
                r"TakeOrderedAndProject|GlobalLimit|CollectLimit|"
                r"HashAggregate\(keys=\[\]|SortAggregate\(key=\[\]|"
                r"ObjectHashAggregate\(keys=\[\]|AggregateInPandas",
                ctx,
            )
            if not ok and (name, "single") not in ALLOW:
                finds.append(f"single-partition-exchange: {ctx[-140:]}")
    return finds


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("plan_audit")
    n_flag = 0
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("simple")
            finds = audit_plan(name, buf.getvalue())
        except Exception as exc:  # audit must visit every query
            print(f"ERR  {name}: {exc}")
            n_flag += 1
            continue
        for f in finds:
            print(f"FLAG {name}: {f}")
        n_flag += len(finds)
    print(f"{n_flag} findings over {len(names)} queries")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main())
