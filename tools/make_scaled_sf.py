"""Build an sf1.0-scale dataset by key-offset replication of sf0.1.

The driver's generator isn't available locally, so the 10x corpus is
synthesized from sf0.1 itself: every fact/dim row is replicated R
times with all integer keys offset by `replica * (max_key + 1)`,
keeping referential integrity (orders->customer, lineitem->orders/
part/supplier, events->user) intact per replica. The tiny dims
(region, nation) stay as-is so FK ranges hold.

Two deliberate perturbations keep the scaled corpus honest:
- document text gains a per-replica sentinel token (`rp<i>`) so
  replicas are NEAR-duplicates (jaccard ~0.99) rather than exact
  ones — the realistic web-scale duplicate-cluster shape, and it
  keeps exact-dedup from collapsing the whole corpus;
- embeddings get a deterministic per-replica jitter on dim 0
  (+i * 1e-3) so similarity scores don't manufacture exact ties that
  would make top-k row sets engine-dependent.

Oracle validity is unaffected: tools/check_oracle.py runs Spark and
DuckDB on the SAME parquet, whatever its provenance. Usage:

    python tools/make_scaled_sf.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> columns that carry entity keys to offset, with the entity
# whose max defines the stride (so FKs offset by the same amount)
KEYED = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

STRIDE_SQL = {
    "customer": "SELECT max(c_custkey) + 1 FROM customer",
    "supplier": "SELECT max(s_suppkey) + 1 FROM supplier",
    "part": "SELECT max(p_partkey) + 1 FROM part",
    "orders": "SELECT max(o_orderkey) + 1 FROM orders",
    "events": "SELECT max(event_id) + 1 FROM events",
    "user": "SELECT max(user_id) + 1 FROM events",
    "documents": "SELECT max(doc_id) + 1 FROM documents",
    "embeddings": "SELECT max(vec_id) + 1 FROM embeddings",
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1x"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    strides = {k: con.execute(q).fetchone()[0] for k, q in STRIDE_SQL.items()}

    for t in ["region", "nation"]:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet'")
        print(t, "copied")

    for t, keys in KEYED.items():
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {t}").fetchall()]
        sel = []
        for c in cols:
            offset = next((s for k, s in keys if k == c), None)
            if offset is not None:
                sel.append(f"{c} + r.i * {strides[offset]} AS {c}")
            elif t == "documents" and c == "text":
                sel.append("CASE WHEN r.i = 0 THEN text"
                           " ELSE text || ' rp' || r.i END AS text")
            elif t == "documents" and c == "n_chars":
                sel.append("CASE WHEN r.i = 0 THEN n_chars ELSE"
                           " n_chars + 3 + length(CAST(r.i AS VARCHAR))"
                           " END AS n_chars")
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "CAST(list_prepend(embedding[1] + r.i * 0.001,"
                    " embedding[2:]) AS FLOAT[]) AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} FROM {t}"
            f" CROSS JOIN (SELECT unnest(range({reps})) AS i) r"
            f" ORDER BY r.i) TO '{out}/{t}.parquet'"
        )
        con.execute(q)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
