"""Shared query parameters — single source of truth for BOTH the Spark
queries and their DuckDB oracle SQL, so constants can never drift.

LSH hyperplanes are deterministic ±1 literals (seeded PRNG, embedded
as literals on both sides) — sign-random-projection LSH for cosine.
"""

from __future__ import annotations

import os
import random

EMBEDDING_DIM = 64  # the embeddings TABLE's vector dimensionality
# (fixed by the driver's testdata; LSH hyperplanes/IVF/PQ/z-score all
# operate on that table and must match it)

HASHBAG_DIM = 256  # bucket count of the deterministic hash-bag TEXT
# embedder (reference embedding/mod.rs:68-114). r9 promotes 256 from
# the 64 default: the backend eval (tools/eval_backends.py, QUALITY.md)
# measures hashbag-256 at nDCG@10 0.768 vs 0.648 for 64 with identical
# latency, and 64-d MRR at the 10x corpus is collision-dominated.
# Engine default (functions/embed_batch.HashBagEmbedder) matches.

# retrieval
BM25_QUERY_TERMS = ["spark", "join", "window", "query"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

RRF_K = 30
RRF_WEIGHTS = {"bm25": 6.0, "length": 1.0}  # reference's tuned [6,1,0,0]
RRF_LIMIT = 20

VECTOR_QUERY_IDS = [0, 1, 2]
KNN_QUERY_IDS = [5, 6, 7, 8, 9]
VECTOR_TOPK = 10
KNN_K = 10

LSH_NUM_PLANES = 8


def _hyperplanes(num: int = LSH_NUM_PLANES, dim: int = EMBEDDING_DIM, seed: int = 42):
    rng = random.Random(seed)
    return [[float(rng.choice((-1.0, 1.0))) for _ in range(dim)] for _ in range(num)]


LSH_HYPERPLANES: list[list[float]] = _hyperplanes()

# serving-cache byte budget (VERDICT r9 #5): total MATERIALIZED cached
# bytes a serving session may pin before cached_persist starts evicting
# its oldest tracked entries (degrade-to-recompute, never OOM). 0 = un-
# bounded. Default 32 GiB — a quarter of the local 128 GiB heap; on a
# real cluster set it per-executor-fleet via the env var. Reference
# analog: the LRU record cache's max_entries bound (cache.rs:1-196).
SERVING_CACHE_BUDGET_BYTES = int(
    os.environ.get("MNEMO_CACHE_BUDGET_BYTES", str(32 << 30))
)
# temporal / lifecycle
SESSION_GAP_MINUTES = 30.0
DECAY_HALF_LIFE_HOURS = 168.0
AS_OF_TS = "2024-01-15 00:00:00"
INCREMENTAL_WATERMARK = "2024-01-25 00:00:00"

# outliers
ZSCORE_SIGMA = 1.04  # synthetic embeddings are well-concentrated; the
# reference's 3.0 default is exposed on the operator — this query
# threshold is chosen to exercise a non-empty result set at EVERY
# gated scale factor (r9: 1.05 was vacuous at sf0.1/sf1x — max z
# tightens toward 1.044 as per-dim variance estimates converge; 1.04
# keeps 3-30 outliers at sf0.001 through sf1x).

# dedup / text
JACCARD_SHINGLE_K = 3
JACCARD_THRESHOLD = 0.05
JACCARD_MAX_DOC_ID = 200
# boilerplate guard: a shingle shared by this many docs contributes
# O(df^2) candidate pairs — one hot shingle makes the inverted-index
# join quadratic at 100 TB, so both engines drop shingles above the cap
JACCARD_MAX_DF = 100
MINHASH_NUM = 12
MINHASH_BANDS = 4
# universal-hash family for MinHash permutations: h_i = (A_i*h0 + B_i) mod P
# with h0 = first-8-hex of md5(shingle) as an int (< 2^32). P is the
# smallest prime > 2^32; A < 2^30 keeps A*h0 + B < 2^62 — no BIGINT
# overflow in either engine. Constants are seeded so Spark literals and
# the DuckDB oracle SQL agree byte-for-byte.
MINHASH_PRIME = 4294967311


def _minhash_coeffs(num: int = MINHASH_NUM, seed: int = 7):
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30)) for _ in range(num)
    ]


MINHASH_COEFFS: list[tuple[int, int]] = _minhash_coeffs()
DEDUP_PREFIX_TOKENS = 5
FINGERPRINT_K = 5

# evidence budget (bm25 top scores ≈ 1.6 on the synthetic corpus →
# a bar of 8 keeps a ~5-doc prefix)
EVIDENCE_BAR = 8.0
EVIDENCE_MAX = 15
TOKEN_BUDGET = 400

# IVF ANN (deterministic seed centroids — kmeans would drift between
# engines; approximation choice per SURVEY §4)
IVF_CENTROID_IDS = list(range(20, 28))
IVF_NPROBE = 2

# dense-lane ANN routing (VERDICT r9 #3): recall/recall_batch route
# their semantic lane through IVF cell probing once the store exceeds
# this row count — the exact kernel is O(corpus) per query by design,
# so above the threshold the engine switches to the sub-O(corpus)
# probe, mirroring the reference's serve-from-HNSW-not-exact choice
# (index/usearch.rs:18-28). Gated: tools/eval_ann.py --routed measures
# recall@10 vs exact ≥ 0.95 at the 10x corpus. Tunables mirror FAISS
# conventions: more cells → finer partition, more probes → higher
# recall at higher cost.
ANN_ROUTE_MIN_CORPUS = int(os.environ.get("MNEMO_ANN_ROUTE_MIN_CORPUS", "200000"))
# cell count floor — actual n_cells = max(this, min(max_cells, √store)),
# the FAISS nlist≈√n convention (per-query probe cost O(nprobe·√n))
ANN_ROUTE_CELLS = int(os.environ.get("MNEMO_ANN_ROUTE_CELLS", "64"))
# cell count ceiling: √n tracks the corpus up to max_cells² rows
# (default 65536 → 4.3B vectors); beyond that a single flat codebook
# stops being the right structure — use a two-level split (IMI /
# partition-per-shard codebooks), not a bigger nlist
ANN_ROUTE_MAX_CELLS = int(os.environ.get("MNEMO_ANN_ROUTE_MAX_CELLS", "65536"))
# probes per query — CONSTANT (FAISS convention; VERDICT r10 #2): the
# r10 form scaled nprobe as n_cells/8, which silently turned the
# routed lane into a fixed 1/8-of-corpus scan — a constant-factor cut,
# not the O(nprobe·√n) the design claims. With nprobe held constant
# the probed fraction FALLS as the corpus grows (nprobe/√n) and
# per-query work is genuinely sub-linear. Gate: tools/eval_ann.py
# --routed measures routed recall@10 ≥ 0.95 vs exact at 50k AND 500k
# docs (docs/benchmarks/ann_route_r11.json). Default 32: measured
# recall@10 0.964 at 50k docs (nprobe 16 gave 0.896 — under the gate).
ANN_ROUTE_NPROBE = int(os.environ.get("MNEMO_ANN_ROUTE_NPROBE", "32"))
# Lloyd refinement passes over the seed codebook at index time — paid
# once per store version. 4 (r11, was 2): constant-nprobe recall at
# 500k docs was 0.894 with 2 iters and 0.976 with 4 — centroid quality
# is what holds the FAISS-convention fixed probe count at scale.
ANN_ROUTE_KMEANS_ITERS = int(os.environ.get("MNEMO_ANN_ROUTE_KMEANS_ITERS", "4"))

# embedding near-dup (within-label cosine: max .475, p99 .295 on the
# synthetic corpus — .28 keeps a small true-positive set)
COSINE_DUP_THRESHOLD = 0.28

# lifecycle decay pass (rate per hour; 30-day event corpus → ages up
# to ~720h, exp(-0.002*720) ≈ 0.24 at the tail)
DECAY_RATE = 0.002
ARCHIVE_BELOW = 0.3
FORGET_BELOW = 0.1

# flagship hybrid recall (trust set: even-numbered sources trusted —
# exercises P4 fail-closed down-weighting on a ~half split)
RECALL_WEIGHTS = {"bm25": 6.0, "embed": 6.0, "length": 1.0}
# r9 re-tune for the 256-bucket embedder (embed 3.0 -> 6.0): the
# reference tunes lane weights per embedder (its [6,1,0,0] was tuned
# on ITS eval set); with hashbag-256 the semantic lane outranks BM25
# (sf0.01 MRR 0.335 vs 0.277) and the old 6:3 under-weighted it —
# hybrid fell below the semantic lane at sf0.001/sf1x. At 6:6:1 the
# tuned-hybrid-beats-every-single-lane property holds at sf0.001,
# sf0.01 AND the 10x corpus (weight sweep in the r9 round log).
RECALL_LIMIT = 20
TRUSTED_SOURCES = [f"src{i}" for i in range(0, 20, 2)]

# candidate over-fetch per lane before fusion (recall.rs:397 limit*3)
RECALL_LANE_OVERFETCH = 3

# PQ ANN (deterministic codebook: sub-vectors of the first PQ_KSUB
# corpus rows — k-means would drift between engines/runs)
PQ_M = 8  # sub-spaces (dim 64 → 8 dims each)
PQ_KSUB = 16  # centroids per sub-space (4-bit codes)
