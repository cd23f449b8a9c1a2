"""Training-data pipeline operators: decontamination, deterministic
train/test splits, sequence packing, quality-weighted sampling.

These are the curation steps a 100-TB pre-training pipeline runs after
dedup (operators/dedup.py) and quality scoring (operators/textquality):

- decontaminate: flag corpus documents that share word-shingles with a
  benchmark/eval set, so test data never leaks into training data.
- hash_split: deterministic, reshuffle-stable train/test assignment
  from a salted md5 of the document id (no RNG state, any worker
  recomputes the same split).
- pack_sequences: concat-and-chunk assignment of documents to fixed
  token-capacity training sequences (the standard LLM pretraining
  batching layout), parallel per group.
- quality_bernoulli_sample: thin the corpus keeping each doc with
  probability = its quality score (quality-weighted resampling),
  again via the deterministic md5 uniform — no RNG.

Cross-engine primitive: u01(x) = CAST(first 6 hex chars of md5 AS int)
/ 16^6 — exactly representable in a double, bit-identical in Spark
(`conv(substr(md5, 1, 6), 16, 10)`) and DuckDB
(`CAST('0x' || substr(md5, 1, 6) AS BIGINT)`).

Scale notes (100 TB):
- decontaminate joins the corpus's shingle rows against the benchmark
  shingle universe with a BROADCAST semi-shape join — benchmark sets
  are tiny (thousands of eval docs) relative to the corpus, so the
  corpus never shuffles.
- hash_split / quality sampling are pure projections (codegen'd, no
  shuffle, no RNG coordination across executors).
- pack_sequences windows are partitioned by the group column — one
  shuffle on the group key; within-group order is (doc_id) so re-runs
  are byte-stable. A global (ungrouped) packing would serialize
  through one partition and is refused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mnemo_spark.functions.text import token_estimate
from mnemo_spark.operators.dedup import _shingle_rows

ROUND_DP = 6
_U01_HEX_DIGITS = 6
_U01_DENOM = 16**_U01_HEX_DIGITS


def u01(col, salt: str):
    """Deterministic uniform [0,1) from a salted md5 — the portable
    no-RNG sampling primitive (exact in a double: 24 bits)."""
    h = F.substring(F.md5(F.concat(F.lit(salt + "#"), col.cast("string"))), 1, _U01_HEX_DIGITS)
    return F.conv(h, 16, 10).cast("long") / F.lit(float(_U01_DENOM))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-overlap contamination report, one row per corpus doc
    that shares ≥1 word-shingle with the benchmark set:
    (doc_id, n_shingles, n_contaminated, contamination).

    The benchmark's distinct-shingle universe is broadcast (eval sets
    are small); the corpus side is an inner join against it, so the
    only wide work is the corpus's own tokenize+explode — no
    corpus-vs-corpus shuffle. Mirrors the n-gram-overlap decontamination
    step of standard pre-training pipelines.
    """
    corpus_sh = _shingle_rows(corpus, id_col, text_col, shingle_k)
    bench_sh = _shingle_rows(benchmark, id_col, text_col, shingle_k).select(
        "_sh"
    ).distinct()
    sizes = corpus_sh.groupBy("_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "_sh")
        .groupBy("_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        hits.join(sizes, "_id")
        .select(
            F.col("_id").alias(id_col),
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), ROUND_DP).alias(
                "contamination"
            ),
        )
    )


def hash_split(
    docs: DataFrame,
    test_frac: float = 0.2,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Append a deterministic `split` column ('train' | 'test'):
    test iff u01(salted md5 of id) < test_frac.

    Pure projection — reshuffle-stable, no RNG, no shuffle; any
    executor assigns the same doc the same way, and re-running the
    pipeline (or growing the corpus) never reassigns existing docs.
    """
    return docs.withColumn(
        "split",
        F.when(u01(F.col(id_col), salt) < F.lit(test_frac), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def pack_sequences(
    docs: DataFrame,
    capacity_tokens: int,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out
    end-to-end per group in (id) order, then cut into fixed
    `capacity_tokens` training sequences. → one row per doc:
    (group, doc_id, n_tokens, start_off, seq_first, seq_last, n_seqs).

    Docs may span a chunk boundary (seq_first < seq_last) — exactly
    the standard LLM pretraining layout. The window partitions on
    `group_col`, so packing parallelizes across groups; a global
    ungrouped packing would funnel the corpus through one partition
    and is deliberately not offered.
    """
    if not group_col:
        raise ValueError(
            "pack_sequences requires group_col: a global packing order "
            "serializes the corpus through a single partition"
        )
    tok = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col),
        token_estimate(text_col).alias("n_tokens"),
    )
    w = Window.partitionBy("grp").orderBy(id_col)
    end = F.sum("n_tokens").over(w)
    start = end - F.col("n_tokens")
    cap = F.lit(capacity_tokens)
    seq_first = F.floor(start / cap)
    # an empty doc occupies no span: pin it to its start chunk
    seq_last = F.when(
        F.col("n_tokens") > 0, F.floor((end - 1) / cap)
    ).otherwise(seq_first)
    return tok.select(
        F.col("grp").alias(group_col),
        id_col,
        "n_tokens",
        start.alias("start_off"),
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + 1).alias("n_seqs"),
    )


def quality_bernoulli_sample(
    scored: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    salt: str = "qsample",
) -> DataFrame:
    """Quality-weighted corpus thinning: keep each doc with
    probability = its quality score, via the deterministic u01 —
    the quality-resampling step of modern curation pipelines, with
    reproducible output and zero cross-executor RNG coordination.

    → input rows filtered to the kept sample, plus the draw (`u`).
    """
    u = u01(F.col(id_col), salt)
    return (
        scored.withColumn("u", F.round(u, ROUND_DP))
        .filter(u < F.col(quality_col))
    )


def stratified_sample(
    docs: DataFrame,
    n_per_stratum: int,
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rank rows within
    each stratum by the salted md5 uniform and keep the first n — a
    reproducible stratified subsample (eval-set carving, per-language
    balancing) with no RNG and no global ordering.

    The rank window partitions on the stratum, so the sample
    parallelizes across strata; a skewed stratum costs one partition's
    sort of its own rows only.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        u01(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def source_mixture_weights(
    docs: DataFrame, alpha: float = 0.5, source_col: str = "source"
) -> DataFrame:
    """Domain-mixing weights: sampling share per source ∝ n^alpha,
    normalized (alpha<1 up-weights small domains — the standard
    temperature-smoothed mixture used to balance pre-training
    corpora). One groupBy on the source key + a 1-row broadcast of
    the normalizer; the corpus itself never re-shuffles.
    → (source, n, mix_weight)."""
    agg = docs.groupBy(source_col).agg(F.count("*").alias("n"))
    z = agg.agg(F.sum(F.pow(F.col("n").cast("double"), alpha)).alias("_z"))
    return agg.crossJoin(F.broadcast(z)).select(
        source_col,
        "n",
        F.round(
            F.pow(F.col("n").cast("double"), alpha) / F.col("_z"), ROUND_DP
        ).alias("mix_weight"),
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): key_i = ln(u_i)/w_i with deterministic u_i = md5-uniform;
    the k LARGEST keys are the sample — one pass, no RNG coordination,
    reshuffle-stable, exactly the data-mixing draw (sample quality-
    weighted docs) at any scale. ln(u)/w is the monotone-equivalent of
    the textbook u^(1/w), numerically gentler.
    → (id, weight, samp_key, rank)."""
    from mnemo_spark.operators.window_ops import top_k_ranked

    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u01(F.col(id_col), salt)) / w, 9)
    scored = docs.filter(w > 0).select(
        F.col(id_col), w.alias("weight"), key.alias("samp_key")
    )
    # parallel partial top-k (TakeOrderedAndProject), never a global
    # single-partition rank window
    return top_k_ranked(scored, [F.desc("samp_key"), F.asc(id_col)], k)
