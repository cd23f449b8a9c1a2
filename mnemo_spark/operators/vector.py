"""Dense vector retrieval (reference J5/J6, index/usearch.rs).

The reference serves single-query ANN from an in-process USearch HNSW
graph. A batch Spark engine inverts that: queries arrive as a
DataFrame, the corpus is the big side, and top-k is an exact
brute-force ranked join — embarrassingly parallel, no index to build
or keep consistent (SURVEY §4: "an algorithm choice, not a planner
concern").

Physical strategy at scale:
- `topk_cosine`: broadcast the (small) query side into a crossJoin;
  each corpus partition computes its local scores, a per-query
  row_number window takes the global top-k. One shuffle of
  candidate-sized data on query_id. For very large k·|Q|, swap the
  window for a per-partition `limit` + re-rank (AQE handles the rest).
- `lsh_sign_bucket` / `ann_lsh_topk`: the 100-TB path. Signed random
  hyperplanes (deterministic literals) give each vector an H-bit
  bucket; candidates co-bucket with the query, so the crossJoin
  becomes an equi-join on bucket — shuffle-friendly, prunes the
  corpus ~2^H-fold at some recall cost. Same contract as the
  reference's approximate HNSW.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mnemo_spark.functions.similarity import (
    cosine,
    cosine_arrow,
    cosine_matrix,
    stack_batch,
)

ROUND_DP = 6


def _collect_vec_side(df: DataFrame, id_col: str, vec_col: str):
    """Collect a definitionally-small vector side (query set / centroid
    codebook) to the driver, sorted by id: (ids, (n, dim) float64).

    This is the same data movement a broadcast join performs — FAISS
    ships the IVF codebook to every node identically. Only ever call
    on the small side (queries / centroids), never the corpus.
    """
    rows = sorted(df.select(id_col, vec_col).collect(), key=lambda r: r[id_col])
    ids = [r[id_col] for r in rows]
    vecs = [r[vec_col] for r in rows]
    if not ids or any(v is None for v in vecs):
        # NULL vectors can't form a matmul block — signal the caller
        # to fall back to the pairwise kernel path
        return ids, None
    return ids, np.asarray([list(v) for v in vecs], dtype=np.float64)


# rounding quantum of ROUND_DP; local-top-k pruning keeps anything
# within 2 quanta of the batch k-th best so no row that could ROUND
# into the global top-k is ever dropped (two values >1e-6 apart land
# in different round-6 buckets, so k strictly-greater rounded scores
# always outrank the dropped row regardless of id tie-breaks)
_PRUNE_MARGIN = 2e-6


def _local_topk_frame(
    qid_arr, ids, sims, valid, k: int, query_id: str, corpus_id: str, extras=None
) -> pd.DataFrame:
    """Per-batch candidate pruning for scatter-gather top-k.

    sims/valid are (n, nq). Emits, per query: every row within
    _PRUNE_MARGIN of the batch's k-th best unrounded score, plus (only
    when the batch has <k valid rows) the k lowest-id NULL-score rows
    so the global NULLs-last ordering stays reproducible.

    extras: optional {col_name: (n,) array} of corpus columns carried
    through candidate selection (hydration without a re-join).
    """
    n, nq = sims.shape
    extras = extras or {}
    out_q, out_i, out_s, out_null = [], [], [], []
    out_keep: list = []
    for j in range(nq):
        col = sims[:, j]
        val = valid[:, j]
        iv = np.flatnonzero(val)
        if iv.size > k:
            thr = np.partition(col[iv], -k)[-k]
            iv = iv[col[iv] >= thr - _PRUNE_MARGIN]
        keep_null = np.array([], dtype=np.int64)
        if iv.size < k:
            inv = np.flatnonzero(~val)
            if inv.size:
                order = np.argsort(ids[inv], kind="stable")  # lowest ids first
                keep_null = inv[order[: k - iv.size]]
        out_q.append(np.full(iv.size + keep_null.size, qid_arr[j]))
        out_i.append(np.concatenate([ids[iv], ids[keep_null]]))
        out_s.append(np.concatenate([col[iv], np.zeros(keep_null.size)]))
        out_keep.append(np.concatenate([iv, keep_null]))
        out_null.append(
            np.concatenate(
                [np.zeros(iv.size, dtype=bool), np.ones(keep_null.size, dtype=bool)]
            )
        )
    if not out_q:
        frame = {
            query_id: [],
            corpus_id: [],
            "cos_sim": pd.array([], dtype="Float64"),
        }
        for name, arr in extras.items():
            frame[name] = arr[:0]
        return pd.DataFrame(frame)
    svals = pd.array(np.concatenate(out_s), dtype="Float64")
    nulls = np.concatenate(out_null)
    if nulls.any():
        svals[nulls] = pd.NA
    frame = {
        query_id: np.concatenate(out_q),
        corpus_id: np.concatenate(out_i),
        "cos_sim": svals,
    }
    keep_all = np.concatenate(out_keep)
    for name, arr in extras.items():
        frame[name] = arr[keep_all]
    return pd.DataFrame(frame)


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Exact top-k cosine per query. → (query_id, vec_id, cos_sim, rank
    [, *carry_cols]).

    Scoring is one numpy matmul per corpus Arrow batch against the
    collected query matrix (mapInPandas) — the query side is
    definitionally small (it was broadcast before; collecting it is
    the same data movement), and this keeps Arrow traffic linear in
    the corpus instead of corpus×queries. The previous interpreted
    higher-order-function fold measured 10-100× slower per row.
    Ranking happens on the ROUND_DP-rounded score, so the kernel swap
    cannot reorder results.

    carry_cols: corpus columns hydrated through the scoring pass
    itself (candidates carry their attributes out of the batch), so
    consumers like the kNN vote never re-scan or re-join the corpus.
    """
    carry = list(carry_cols or [])
    qids, Q = _collect_vec_side(queries, query_id, query_vec)
    if Q is None:
        # NULL/empty query vectors: pairwise Arrow kernel keeps the
        # exact NULL contract of the expression form
        joined = corpus.crossJoin(F.broadcast(queries)).select(
            F.col(query_id),
            F.col(corpus_id),
            F.round(
                cosine_arrow(F.col(corpus_vec), F.col(query_vec)), ROUND_DP
            ).alias("cos_sim"),
            *[F.col(c) for c in carry],
        )
    else:
        out_schema = StructType(
            [
                StructField(query_id, queries.schema[query_id].dataType, True),
                StructField(corpus_id, corpus.schema[corpus_id].dataType, True),
                StructField("cos_sim", DoubleType(), True),
            ]
            + [StructField(c, corpus.schema[c].dataType, True) for c in carry]
        )
        qn = np.sqrt((Q * Q).sum(axis=1))
        qid_arr = np.asarray(qids)

        def score(batches):
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                nulls = pdf[corpus_vec].isna().to_numpy()
                V = stack_batch(pdf[corpus_vec], nulls)
                vn = np.sqrt(np.einsum("ij,ij->i", V, V))
                denom = np.outer(vn, qn)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.where(
                        denom > 0.0, (V @ Q.T) / np.where(denom == 0.0, 1.0, denom), 0.0
                    )
                valid = (denom > 0.0) & ~nulls[:, None]
                yield _local_topk_frame(
                    qid_arr,
                    pdf[corpus_id].to_numpy(),
                    sims,
                    valid,
                    k,
                    query_id,
                    corpus_id,
                    extras={c: pdf[c].to_numpy() for c in carry},
                )

        joined = (
            corpus.select(corpus_id, corpus_vec, *carry)
            .mapInPandas(score, out_schema)
            .withColumn("cos_sim", F.round(F.col("cos_sim"), ROUND_DP))
        )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def batch_dot_scores(
    corpus: DataFrame,
    qids: list,
    Q: "np.ndarray",
    corpus_id: str = "id",
    corpus_vec: str = "embedding",
    query_id: str = "_qid",
    qid_type=None,
    score_col: str = "score",
    limit: int | None = None,
    route: "tuple | None" = None,
    cell_col: str | None = None,
) -> DataFrame:
    """Raw DOT-product scores of a collected query matrix against the
    corpus — the engine's batched semantic lane kernel (r9; the
    previous `crossJoin + zip_with/aggregate` expression evaluated the
    dot interpreted per element, measured ~250 ms marginal cost PER
    QUERY at a 5k-doc corpus and growing with it — the exact shape the
    batch verb exists to avoid).

    One numpy matmul per corpus Arrow batch (V @ Q.T, float64), Arrow
    traffic linear in the corpus. NULL-embedding rows are dropped —
    the same contract as the expression form's `score IS NOT NULL`
    filter. With `limit` set, each batch emits only rows within
    _PRUNE_MARGIN of its per-query limit-th best score, so any
    downstream per-query top-`limit` selection (rounded or unrounded,
    any id tiebreak) sees exactly the rows it would have seen from the
    full cross product; limit=None emits every scored pair (needed
    when a later re-weighting can promote arbitrary ranks, e.g.
    reasoning-trust down-weight on a single-lane strategy).

    route=(C, cell_queries) switches the kernel to IVF cell probing
    (VERDICT r9 #3 — the engine's sub-O(corpus) dense lane above
    params.ANN_ROUTE_MIN_CORPUS): C is the (n_cells, dim) centroid
    matrix, cell_queries maps cell index → array of query indices that
    probe it. Each corpus Arrow batch assigns its rows to their
    nearest-cosine cell (one matmul) and scores a row ONLY against the
    queries probing its cell — per-query work shrinks from O(corpus)
    to O(corpus × nprobe / n_cells), and on the partitioned-by-cell
    layout (ivf_write_partitioned) the unprobed cells are never read
    at all. Unprobed rows are NOT lane candidates (the ANN contract —
    same as ivf_topk; recall vs exact is gated by tools/eval_ann.py
    --routed). With cell_col set, rows carry a PRECOMPUTED cell id
    (the index-time artifact — the engine persists it once per store)
    and the kernel skips the assignment matmul entirely; C may then be
    None.
    """
    if qid_type is None:
        # infer from the ids themselves: engine callers pass explicit
        # types; bare callers almost always use string or int qids.
        # np.integer counts as int; bool does NOT (it subclasses int)
        qid_type = (
            LongType()
            if qids
            and isinstance(qids[0], (int, np.integer))
            and not isinstance(qids[0], bool)
            else StringType()
        )
        # validate the WHOLE list against the inferred type (ADVICE
        # r10): inference looks only at qids[0], so a mixed list
        # ([1, 'a']) or float qids would otherwise fail deep inside
        # Arrow conversion on an executor instead of loudly here
        def _fits(q) -> bool:
            if isinstance(qid_type, LongType):
                return isinstance(q, (int, np.integer)) and not isinstance(
                    q, bool
                )
            return isinstance(q, str)

        bad = [q for q in qids if not _fits(q)]
        if bad:
            raise ValueError(
                f"batch_dot_scores: qids are not type-consistent with the "
                f"inferred {qid_type.simpleString()} qid type (first "
                f"offender: {bad[0]!r}) — pass qid_type explicitly for "
                f"mixed/float/other qid types"
            )
    out_schema = StructType(
        [
            StructField(query_id, qid_type, True),
            StructField(corpus_id, corpus.schema[corpus_id].dataType, True),
            StructField(score_col, DoubleType(), True),
        ]
    )
    nq = len(qids)
    # Ship the query matrix as a broadcast variable, not a closure
    # capture (ADVICE r9): a captured ndarray is re-pickled into EVERY
    # task's serialized closure, while a broadcast moves it to each
    # executor once and tasks share the handle.
    if route is not None:
        C, cell_queries = route
        if C is None and cell_col is None:
            raise ValueError(
                "batch_dot_scores: routed mode needs centroids (in-kernel "
                "assignment) or cell_col (precomputed cells)"
            )
        C = None if C is None else np.asarray(C, dtype=np.float64)
        cell_queries = {
            int(c): np.asarray(qs, dtype=np.int64)
            for c, qs in cell_queries.items()
        }
    else:
        C, cell_queries = None, None
    bc = corpus.sparkSession.sparkContext.broadcast(
        (
            np.asarray(qids, dtype=object),
            np.asarray(Q, dtype=np.float64),
            C,
            cell_queries,
        )
    )
    from mnemo_spark.cache import track_broadcast

    track_broadcast(bc)  # serving sessions reclaim executor copies on exit

    def score(batches):
        qid_arr, Qm, Cm, cq = bc.value
        qdim = Qm.shape[1] if Qm.ndim == 2 else len(Qm)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nulls = pdf[corpus_vec].isna().to_numpy()
            if nulls.all():
                continue
            pdf = pdf[~nulls]
            try:
                V = np.vstack(pdf[corpus_vec].to_numpy()).astype(
                    np.float64, copy=False
                )
                if V.shape[1] != qdim:
                    raise ValueError(
                        f"corpus vectors are {V.shape[1]}-d"
                    )
            except ValueError as e:
                # ragged or wrong-width corpus vectors: fail loud WITH
                # the dims (ADVICE r9) — the raw executor traceback
                # ('all input arrays must have the same shape') names
                # neither side; the constructor's U1 guard catches the
                # engine-level case, this catches frames built outside
                # the engine
                widths = sorted(
                    {len(v) for v in pdf[corpus_vec].to_numpy()[:1024]}
                )
                raise ValueError(
                    f"batch_dot_scores: corpus column {corpus_vec!r} "
                    f"width(s) {widths} incompatible with {qdim}-d query "
                    f"vectors — corpus and queries must share one "
                    f"embedder/dim ({e})"
                ) from e
            ids = pdf[corpus_id].to_numpy()
            if cq is not None:
                # IVF-routed: each row scores against ONLY the queries
                # probing its cell (mirrors ivf_topk.probe_score; dot
                # scores keep the lane's exact score semantics). Cell
                # ids come precomputed from cell_col (the index-time
                # artifact) or from an in-kernel assignment matmul.
                if cell_col is not None:
                    cell = pdf[cell_col].to_numpy()
                else:
                    cell = cosine_matrix(V, Cm).argmax(axis=1)
                for ci, qidx in cq.items():
                    mask = cell == ci
                    if not mask.any():
                        continue
                    sims_m = V[mask] @ Qm[qidx].T
                    ids_m = ids[mask]
                    if limit is not None:
                        yield _local_topk_frame(
                            qid_arr[qidx],
                            ids_m,
                            sims_m,
                            np.ones_like(sims_m, dtype=bool),
                            limit,
                            query_id,
                            corpus_id,
                        ).rename(columns={"cos_sim": score_col})
                    else:
                        nm = int(mask.sum())
                        yield pd.DataFrame(
                            {
                                query_id: np.repeat(qid_arr[qidx], nm),
                                corpus_id: np.tile(ids_m, len(qidx)),
                                score_col: sims_m.T.reshape(-1),
                            }
                        )
                continue
            sims = V @ Qm.T  # (n, nq)
            if limit is not None:
                yield _local_topk_frame(
                    qid_arr,
                    ids,
                    sims,
                    np.ones_like(sims, dtype=bool),
                    limit,
                    query_id,
                    corpus_id,
                ).rename(columns={"cos_sim": score_col})
            else:
                n = len(pdf)
                yield pd.DataFrame(
                    {
                        query_id: np.repeat(qid_arr, n),
                        corpus_id: np.tile(ids, nq),
                        score_col: sims.T.reshape(-1),
                    }
                )

    in_cols = [corpus_id, corpus_vec] + ([cell_col] if cell_col else [])
    return corpus.select(*in_cols).mapInPandas(score, out_schema)


def refine_centroids(
    corpus: DataFrame,
    C: "np.ndarray",
    corpus_vec: str = "embedding",
    iters: int = 2,
) -> "np.ndarray":
    """Lloyd-refine a deterministic seed codebook against the corpus —
    sharpens IVF cells far beyond raw seed rows (measured: routed
    recall@10 0.93 → ≥0.95 at the 10x corpus) while staying
    deterministic: fixed seeds + a fixed iteration count, no RNG.

    Per iteration ONE Arrow pass emits per-batch per-cell (sum, n) —
    at most n_cells tiny rows per batch — the driver combines and
    averages (the reduce side of a k-means step without a shuffle).
    Empty cells keep their previous centroid. Cost: `iters` corpus
    passes at INDEX time; the serving path never pays it (the refined
    codebook and cell column are cached artifacts).
    """
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from mnemo_spark.functions.similarity import stack_batch

    out_schema = StructType(
        [
            StructField("cell", IntegerType(), True),
            StructField("s", ArrayType(DoubleType()), True),
            StructField("n", LongType(), True),
        ]
    )
    C = np.asarray(C, dtype=np.float64)
    for _ in range(iters):
        bc = corpus.sparkSession.sparkContext.broadcast(C)

        def partial_sums(batches):
            Cm = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                nulls = pdf[corpus_vec].isna().to_numpy()
                if nulls.all():
                    continue
                V = stack_batch(pdf[corpus_vec], nulls)
                V = V[~nulls]
                cell = cosine_matrix(V, Cm).argmax(axis=1)
                cells, inv = np.unique(cell, return_inverse=True)
                sums = np.zeros((len(cells), V.shape[1]))
                np.add.at(sums, inv, V)
                counts = np.bincount(inv)
                yield pd.DataFrame(
                    {
                        "cell": cells.astype("int32"),
                        "s": list(sums),
                        "n": counts.astype("int64"),
                    }
                )

        rows = (
            corpus.select(corpus_vec)
            .mapInPandas(partial_sums, out_schema)
            .groupBy("cell")
            .agg(
                F.aggregate(
                    F.collect_list("s"),
                    F.array(*[F.lit(0.0) for _ in range(C.shape[1])]),
                    lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                ).alias("s"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        bc.unpersist()
        newC = C.copy()
        for r in rows:
            if r["n"]:
                newC[int(r["cell"])] = np.asarray(r["s"]) / float(r["n"])
        C = newC
    return C


def lsh_sign_bucket(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """H-bit sign-LSH bucket of a vector column as a bit-string.

    hyperplanes are plain Python literals (deterministic, shared with
    the SQL oracle) — each contributes one bit: 1 iff dot(v, h) > 0.

    One Arrow-batched numpy kernel computes all H dots per batch as a
    single (n, dim) @ (dim, H) matmul — the previous interpreted
    per-plane higher-order fold was the measured bottleneck of
    `ann_lsh_topk`. A NULL vector stacks as the zero vector and gets
    the all-'0' bucket, exactly like the old expression form
    (`when(NULL > 0, '1').otherwise('0')` → '0' per plane).
    """
    P = np.asarray([[float(x) for x in h] for h in hyperplanes], dtype=np.float64)

    @pandas_udf(StringType())
    def bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        nulls = v.isna().to_numpy()
        V = stack_batch(v, nulls)
        if V.shape[1] == 0:  # all-NULL batch
            return pd.Series(["0" * P.shape[0]] * len(v))
        bits = (V @ P.T) > 0.0
        return pd.Series(
            ["".join("1" if x else "0" for x in row) for row in bits]
        )

    return bucket(vec)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    Logically the crossJoin of `topk_cosine` becomes an equi-join on
    bucket; physically (codebook path) the query set is collected, its
    buckets computed driver-side, and ONE mapInPandas pass over the
    corpus buckets + scores + locally prunes — only buckets some query
    occupies are ever scored, and nothing but pruned candidates leaves
    the pass. Falls back to the bucket equi-join when query vectors
    are NULL/empty.
    """
    qids, Q = _collect_vec_side(queries, query_id, query_vec)
    if Q is not None:
        P = np.asarray(
            [[float(x) for x in h] for h in hyperplanes], dtype=np.float64
        )
        qn = np.sqrt((Q * Q).sum(axis=1))
        qbits = (Q @ P.T) > 0.0
        bucket_queries: dict[tuple, list[int]] = {}
        for qi in range(len(qids)):
            bucket_queries.setdefault(tuple(qbits[qi]), []).append(qi)
        qid_arr = np.asarray(qids)
        out_schema = StructType(
            [
                StructField(query_id, queries.schema[query_id].dataType, True),
                StructField(corpus_id, corpus.schema[corpus_id].dataType, True),
                StructField("cos_sim", DoubleType(), True),
            ]
        )

        def bucket_score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                nulls = pdf[corpus_vec].isna().to_numpy()
                V = stack_batch(pdf[corpus_vec], nulls)
                ids = pdf[corpus_id].to_numpy()
                vbits = (V @ P.T) > 0.0
                vn = np.sqrt(np.einsum("ij,ij->i", V, V))
                for bucket, qidx in bucket_queries.items():
                    mask = (vbits == np.asarray(bucket)).all(axis=1)
                    if not mask.any():
                        continue
                    Vm, vnm, nullm = V[mask], vn[mask], nulls[mask]
                    d = np.outer(vnm, qn[qidx])
                    with np.errstate(divide="ignore", invalid="ignore"):
                        s = np.where(
                            d > 0.0, (Vm @ Q[qidx].T) / np.where(d == 0.0, 1.0, d), 0.0
                        )
                    valid = (d > 0.0) & ~nullm[:, None]
                    yield _local_topk_frame(
                        qid_arr[qidx], ids[mask], s, valid, k, query_id, corpus_id
                    )

        joined = (
            corpus.select(corpus_id, corpus_vec)
            .mapInPandas(bucket_score, out_schema)
            .withColumn("cos_sim", F.round(F.col("cos_sim"), ROUND_DP))
        )
    else:
        c = corpus.withColumn(
            "_bucket", lsh_sign_bucket(F.col(corpus_vec), hyperplanes)
        )
        q = queries.withColumn(
            "_bucket", lsh_sign_bucket(F.col(query_vec), hyperplanes)
        )
        joined = c.join(F.broadcast(q), "_bucket").select(
            F.col(query_id),
            F.col(corpus_id),
            F.round(
                cosine_arrow(F.col(corpus_vec), F.col(query_vec)), ROUND_DP
            ).alias("cos_sim"),
        )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
    allow_unscoped: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (i<j) with cosine ≥ threshold (reference J5).

    The reference bounds this with ANN top-20 per record
    (query/conflict.rs:84-151); here the exact form self-joins within
    an optional group (the reference scopes to same agent — at scale
    ALWAYS pass group_col or pre-bucket with LSH so the self-join is
    per-partition, never global). The ungrouped form is a full
    crossJoin and REFUSES to run unless allow_unscoped=True (tests /
    provably-small inputs only) — nothing else stops a caller from
    going quadratic on the whole corpus.
    """
    if group_col is None and not allow_unscoped:
        raise ValueError(
            "cosine_pairs without group_col is a full O(n^2) crossJoin; "
            "pass group_col (per-agent / LSH-bucket scoping) or set "
            "allow_unscoped=True for provably small inputs"
        )
    if group_col is not None:
        # vectorized path: pairwise cosine per group as one numpy
        # matmul inside applyInPandas — the expression form evaluates
        # the zip_with/aggregate fold INTERPRETED per pair, ~50x
        # slower on |group|² pairs; groups parallelize across
        # executors exactly like the reference's per-agent scoping
        import numpy as np
        import pandas as pd

        from pyspark.sql.types import DoubleType, StructField, StructType

        in_schema = {f.name: f.dataType for f in vectors.schema.fields}
        out_schema = StructType(
            [
                StructField(group_col, in_schema[group_col], True),
                StructField("id_a", in_schema[id_col], True),
                StructField("id_b", in_schema[id_col], True),
                StructField("cos_sim", DoubleType(), True),
            ]
        )

        def pairs_of(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(id_col).reset_index(drop=True)
            ids = pdf[id_col].to_numpy()
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((V * V).sum(axis=1))
            norms[norms == 0.0] = np.nan  # NULL-safe like the expression form
            S = (V @ V.T) / np.outer(norms, norms)
            ia, ib = np.triu_indices(len(ids), k=1)
            sims = np.round(S[ia, ib], ROUND_DP)
            keep = sims >= threshold
            return pd.DataFrame(
                {
                    group_col: pdf[group_col].iloc[ia[keep]].to_numpy(),
                    "id_a": ids[ia[keep]],
                    "id_b": ids[ib[keep]],
                    "cos_sim": sims[keep],
                }
            )

        return vectors.groupBy(group_col).applyInPandas(pairs_of, out_schema)

    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    joined = a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), ROUND_DP))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def knn_label_vote(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    label_col: str = "label",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """k-NN majority-vote classification. → (query_id, pred_label, votes).

    Labels ride through the scoring pass itself (carry_cols), so the
    vote aggregates the top-k frame directly — no second corpus scan
    and no hydration join."""
    nn = topk_cosine(
        corpus,
        queries,
        k,
        corpus_id,
        corpus_vec,
        query_id,
        query_vec,
        carry_cols=[label_col],
    )
    votes = nn.groupBy(query_id, label_col).agg(F.count("*").alias("votes"))
    w = Window.partitionBy(query_id).orderBy(F.desc("votes"), F.asc(label_col))
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(query_id, F.col(label_col).alias("pred_label"), "votes")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path
    next to sign-LSH.

    Build: every corpus vector is assigned to its nearest centroid
    (one broadcast join against the small centroid set — the
    "inverted list"). Probe: each query scores only vectors in its
    nprobe nearest cells. At 100 TB the corpus is written partitioned
    by cell id, so a probe touches nprobe partitions and the
    crossJoin never materializes.

    Centroids here come from a deterministic seed set (k-means would
    drift between engines; the reference's HNSW is equally an
    approximation choice, SURVEY §4).

    Physical plan (codebook path): collect the centroid codebook and
    query set (both definitionally small — FAISS ships the codebook to
    every node identically), compute the query→cell probe map driver-
    side, then ONE mapInPandas pass over the corpus does assignment
    (argmax matmul) + probe-scoped scoring + local top-k pruning; a
    final window merges the per-batch candidates. Zero joins, zero
    corpus re-shuffles, Arrow traffic linear in corpus size.
    """
    cids, C = _collect_vec_side(centroids, cent_id, cent_vec)
    qids, Q = _collect_vec_side(queries, query_id, query_vec)
    if C is not None and Q is not None:
        cn = np.sqrt((C * C).sum(axis=1))
        qn = np.sqrt((Q * Q).sum(axis=1))
        # driver-side probe: nprobe nearest cells per query; stable
        # argsort of -sims ties→lowest centroid index = lowest cent_id
        # (centroid rows are sorted by id), matching the SQL
        # row_number() ORDER BY _cs DESC, cent_id contract
        order = np.argsort(-cosine_matrix(Q, C), axis=1, kind="stable")
        cell_queries: dict[int, list[int]] = {}
        for qi in range(len(qids)):
            for ci in order[qi, :nprobe]:
                cell_queries.setdefault(int(ci), []).append(qi)
        qid_arr = np.asarray(qids)
        out_schema = StructType(
            [
                StructField(query_id, queries.schema[query_id].dataType, True),
                StructField(corpus_id, corpus.schema[corpus_id].dataType, True),
                StructField("cos_sim", DoubleType(), True),
            ]
        )

        def probe_score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                nulls = pdf[corpus_vec].isna().to_numpy()
                V = stack_batch(pdf[corpus_vec], nulls)
                ids = pdf[corpus_id].to_numpy()
                vn = np.sqrt(np.einsum("ij,ij->i", V, V))
                cell = cosine_matrix(V, C).argmax(axis=1)  # first max = lowest cent_id
                for ci, qidx in cell_queries.items():
                    mask = cell == ci
                    if not mask.any():
                        continue
                    Vm, vnm, nullm = V[mask], vn[mask], nulls[mask]
                    Qs = Q[qidx]
                    d = np.outer(vnm, qn[qidx])
                    with np.errstate(divide="ignore", invalid="ignore"):
                        s = np.where(
                            d > 0.0, (Vm @ Qs.T) / np.where(d == 0.0, 1.0, d), 0.0
                        )
                    valid = (d > 0.0) & ~nullm[:, None]
                    yield _local_topk_frame(
                        qid_arr[qidx], ids[mask], s, valid, k, query_id, corpus_id
                    )

        cand = (
            corpus.select(corpus_id, corpus_vec)
            .mapInPandas(probe_score, out_schema)
            .withColumn("cos_sim", F.round(F.col("cos_sim"), ROUND_DP))
        )
    else:
        # NULL/empty codebook or query vectors: declarative fallback
        # keeps the exact expression-form NULL contract
        cw = Window.partitionBy(corpus_id).orderBy(F.desc("_cs"), F.asc(cent_id))
        assign = (
            corpus.crossJoin(F.broadcast(centroids))
            .withColumn("_cs", cosine_arrow(F.col(corpus_vec), F.col(cent_vec)))
            .withColumn("_rn", F.row_number().over(cw))
            .filter(F.col("_rn") == 1)
            .select(corpus_id, cent_id)
        )
        qw = Window.partitionBy(query_id).orderBy(F.desc("_cs"), F.asc(cent_id))
        probes = (
            queries.crossJoin(F.broadcast(centroids))
            .withColumn("_cs", cosine(F.col(query_vec), F.col(cent_vec)))
            .withColumn("_rn", F.row_number().over(qw))
            .filter(F.col("_rn") <= nprobe)
            .select(query_id, cent_id, query_vec)
        )
        cand = (
            assign.join(F.broadcast(probes), cent_id)
            .join(corpus, corpus_id)
            .select(
                F.col(query_id),
                F.col(corpus_id),
                F.round(
                    cosine_arrow(F.col(corpus_vec), F.col(query_vec)), ROUND_DP
                ).alias("cos_sim"),
            )
        )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_write_partitioned(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> None:
    """Materialize the IVF layout: the corpus written partitioned by
    its nearest-centroid cell (the inverted list ON DISK).

    This is the documented 100-TB posture of `ivf_topk` made
    physical: at scale the assignment pass runs once per snapshot and
    every probe afterwards touches only nprobe partition directories —
    partition pruning at the FileScan, not a post-scan filter.
    """
    assigned = assign_cells(
        corpus, centroids, corpus_id, corpus_vec, cent_id, cent_vec
    )
    assigned.write.mode("overwrite").partitionBy("cent_id").parquet(path)


def ivf_probe_partitioned(
    spark,
    path: str,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """Probe an `ivf_write_partitioned` layout: compute each query's
    nprobe cells from the codebook driver-side (identical contract to
    ivf_topk's probe map), push ONE `cent_id IN (...)` predicate into
    the scan — Catalyst prunes to the probed partition directories —
    then score only the surviving rows. Results are identical to
    ivf_topk over the full corpus: rows outside probed cells can never
    contribute to any query's candidate set.
    """
    cids, C = _collect_vec_side(centroids, cent_id, cent_vec)
    qids, Q = _collect_vec_side(queries, query_id, query_vec)
    if C is None or Q is None:
        raise ValueError("probe requires non-NULL centroid and query vectors")
    order = np.argsort(-cosine_matrix(Q, C), axis=1, kind="stable")
    probed = sorted({cids[int(ci)] for qi in range(len(qids)) for ci in order[qi, :nprobe]})
    pruned = spark.read.parquet(path).filter(F.col("cent_id").isin(probed))
    return ivf_topk(
        pruned.select(corpus_id, corpus_vec),
        queries,
        centroids,
        nprobe,
        k,
        corpus_id,
        corpus_vec,
        query_id,
        query_vec,
        cent_id,
        cent_vec,
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """Nearest-centroid assignment (the IVF build step / one half of a
    Lloyd iteration): → corpus columns + cent_id, by max cosine with
    ties to the lowest centroid id — the same contract as ivf_topk's
    inline assignment. Codebook is driver-collected (it is the
    broadcast constant); one Arrow pass over the corpus, no joins."""
    cids, C = _collect_vec_side(centroids, cent_id, cent_vec)
    if C is None:
        raise ValueError("centroid side is empty or carries NULL vectors")
    cid_arr = np.asarray(cids)

    from pyspark.sql.types import StructType

    schema = StructType(
        [corpus.schema[corpus_id], corpus.schema[corpus_vec]]
    ).add("cent_id", centroids.schema[cent_id].dataType, True)

    from mnemo_spark.functions.similarity import stack_batch

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nulls = pdf[corpus_vec].isna().to_numpy()
            V = stack_batch(pdf[corpus_vec], nulls)
            cell = cid_arr[cosine_matrix(V, C).argmax(axis=1)]  # first max = lowest cent_id
            out = pdf[[corpus_id, corpus_vec]].copy()
            out["cent_id"] = cell
            out.loc[nulls, "cent_id"] = None
            yield out

    return corpus.select(corpus_id, corpus_vec).mapInPandas(run, schema)
