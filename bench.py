"""Headline benchmark: runs the registry's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mnemo_spark.registry import QUERIES  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_orders_per_priority",
    "bm25_topk_docs",
    "rrf_hybrid_docs",
    "recall_batch_docs",
    # round-9 surface: the batched graph lane
    "recall_batch_graph_docs",
    "vector_topk",
    "ann_lsh_topk",
    "knn_label_vote",
    "event_chain_heads",
    "sessionize_events",
    "decay_scores_events",
    "zscore_outliers_embeddings",
    "lang_id_docs",
    "token_stats_docs",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "graph_expand_2hop",
    "assign_chain_events",
    "rollup_revenue",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "hash_bag_embedding_docs",
    "ivf_ann_topk",
    "cosine_near_dup_embeddings",
    "decay_pass_events",
    "ttl_sweep_events",
    "dedup_clusters_docs",
    "dup_representative_docs",
    "causality_trace_events",
    "hybrid_recall_docs",
    "asof_join_events",
    "window_stats_events",
    "q21_waiting_suppliers",
    "quantile_stats_lineitem",
    "poisoning_flags_docs",
    # round-2 operators
    "embed_batch_docs",
    "cluster_maturity_embeddings",
    "conflict_resolution_embeddings",
    "reflection_archive_candidates_events",
    # round-3 operators
    "q2_min_cost_supplier",
    "q11_important_value",
    "q20_part_promotion",
    "decontaminate_docs",
    "train_test_split_docs",
    "pack_sequences_docs",
    "quality_sample_docs",
    "repetition_docs",
    "vocab_topk_docs",
    "incremental_dedup_docs",
    "stratified_sample_docs",
    # round-4 engine-verb surfaces (representative pick per family)
    "point_lookup_orders",
    "merge_upsert_orders",
    "sync_conflicts_orders",
    "logical_clock_events",
    "replay_checkpoints_events",
    "delegation_closure_users",
    "uuid7_assign_events",
    "pii_scrub_docs",
    "token_entropy_docs",
    "source_mixture_docs",
    "pq_ann_topk",
    "bpe_token_count_docs",
    "chunk_docs",
    "kmeans_step_embeddings",
    "approx_distinct_events",
    "simhash_near_dup_pairs",
    "interval_join_events",
    "approx_quantiles_lineitem",
    "fuzzy_match_docs",
    "weighted_sample_docs",
    "triangle_count_users",
    "grouping_sets_orders",
    "ewma_user_values",
    # round-4 analytics surfaces
    "scd2_user_state",
    "mad_outliers_events",
    "pagerank_step_users",
    "tfidf_topk_docs",
    "value_histogram_events",
    "sliding_window_events",
    "funnel_users",
    "cohort_retention_users",
    "profile_columns_orders",
    "event_pair_lift",
    "regr_price_qty_lineitem",
    "activity_streaks_users",
    "revenue_mom_orders",
    "transition_matrix_events",
    "zorder_key_events",
    "incremental_rollup_events",
    "winsorize_events",
    "length_pctrank_docs",
    "benford_profile_events",
    "gap_fill_daily_events",
    "rolling_7d_avg_events",
    "approx_topk_terms_docs",
    "interevent_gap_stats",
    "path_to_purchase_users",
    "rolling_spike_events",
    "trajectory_growth_events",
    "abc_customers_orders",
    "growth_accounting_users",
    "rfm_segments_orders",
    "copurchase_part_pairs",
    # round-4 interop surfaces
    "deal_reputation_orders",
    "deal_chain_verify_orders",
    "mesh_policy_events",
    "code_mode_savings_docs",
    "consent_gate_events",
    "retention_audit_events",
    # round-5 surfaces
    "quarantine_review_events",
    "reasoning_trust_events",
    "topic_doc_bodies_events",
]

# r10 (VERDICT r9 #4): every registry query is timed — the 47 engine-
# verb/interop surfaces previously outside the list were invisible to
# round-over-round perf diffs. The explicit list above keeps its order
# (stable round-over-round comparisons); everything else in the
# registry appends alphabetically. Queries whose DuckDB oracles are
# deliberately closed-form twins of walk/parse work (lineage, OTLP)
# are timed too — tools/bench_compare.py is where twin comparability
# matters, and it discloses those rows as shape-mismatched.
_KNOWN = set(BENCH_QUERIES)
BENCH_QUERIES += sorted(q for q in QUERIES if q not in _KNOWN)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # decode each parquet table once for the whole run (DuckDB's buffer
    # pool gets the same treatment on the oracle side); warm-up below
    # materializes the caches
    os.environ.setdefault("MNEMO_CACHE_TABLES", "1")
    spark = get_spark("mnemo_bench")

    # warm-up: JVM/codegen startup + table-cache materialization, so
    # neither pollutes q1
    from mnemo_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    # Three full INTERLEAVED passes over the query list; per query the
    # MINIMUM across passes is reported. Pass 1 pays whole-stage-codegen
    # compilation (compiles once and amortizes over the whole scan at
    # the 100 TB design point — steady-state throughput is the tracked
    # quantity). Interleaving is the contention guard: this shared box
    # swings identical code by whole multiples for seconds at a time,
    # and back-to-back repeats of ONE query can both land inside a bad
    # window (r3: q21 posted 8.1s for a 1.1s plan); with whole-list
    # passes the same window hits DIFFERENT queries each pass, so the
    # per-query min recovers.
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for _ in range(3):
        for name in BENCH_QUERIES:
            if name not in QUERIES:
                continue
            t0 = time.time()
            counts[name] = QUERIES[name](spark, sf_dir).count()
            dt = time.time() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = dt
    timings = {name: round(t, 3) for name, t in timings.items()}
    for name, t in timings.items():
        print(f"# {name}: {t}s ({counts[name]} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # The driver captures only the TAIL of stdout: r4's single line with
    # 114 per-query entries overflowed it and the front (metric/value)
    # was cut off, so the driver recorded parsed:null. Full per-query
    # detail goes to a file + stderr; stdout's final line is a COMPACT
    # summary (headline total, count, the 10 slowest) that always fits.
    detail = {
        "metric": "mnemo_spark_headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "mnemo_spark_headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "n_queries": len(timings),
                "queries": slowest,
                "detail_file": "BENCH_DETAIL.json",
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
