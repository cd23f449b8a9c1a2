"""Oracle-gated queries for the training-data pipeline operators
(operators/pipeline.py): decontamination, deterministic splits,
sequence packing, quality-weighted sampling.

All run over the driver's `documents` table. The DuckDB SQL twins are
the independent semantic spec; both sides share the cross-engine
primitives proven by the dedup family (md5 shingles, `[a-z0-9]+`
tokenization, ceil(chars/4) token estimate) plus the
hex-u01 trick: CAST(first 6 md5 hex chars AS int) / 16^6 is
bit-identical in Spark (`conv(..., 16, 10)`) and DuckDB
(`CAST('0x' || ... AS BIGINT)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mnemo_spark import params as P
from mnemo_spark.operators.pipeline import (
    decontaminate,
    hash_split,
    pack_sequences,
    quality_bernoulli_sample,
)
from mnemo_spark.operators.textquality import quality_scores
from mnemo_spark.registry import _t, query

# every 97th doc stands in for the held-out benchmark/eval set; the
# corpus's planted near-duplicates guarantee real contamination hits
_BENCH_MOD = 97
_SPLIT_TEST_FRAC = 0.2
_PACK_CAPACITY = 2048  # power of two: n/2048 is exact in a double

_SHINGLE_SQL = f"""
    tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                    range(1, greatest(len(toks) - {P.JACCARD_SHINGLE_K - 2}, 1)),
                    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shs
           FROM tok),
    e AS (SELECT doc_id, unnest(shs) AS s FROM sh)
"""

_U01_SQL = (
    "CAST('0x' || substr(md5(concat('{salt}#', CAST(doc_id AS VARCHAR))), 1, 6)"
    "     AS BIGINT) / 16777216.0"
)


@query(
    "decontaminate_docs",
    f"""
    WITH {_SHINGLE_SQL},
    bench AS (SELECT DISTINCT s FROM e WHERE doc_id % {_BENCH_MOD} = 0),
    corp AS (SELECT doc_id, s FROM e WHERE doc_id % {_BENCH_MOD} <> 0),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY doc_id),
    hits AS (SELECT doc_id, count(*) AS n_contaminated
             FROM corp JOIN bench USING (s) GROUP BY doc_id)
    SELECT h.doc_id, n_shingles, n_contaminated,
           round(n_contaminated * 1.0 / n_shingles, 6) AS contamination
    FROM hits h JOIN sizes USING (doc_id)
    """,
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing word-shingles
    with the held-out set. The benchmark shingle universe is broadcast
    — the 100-TB corpus never shuffles for this check."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return decontaminate(corpus, bench, P.JACCARD_SHINGLE_K)


@query(
    "train_test_split_docs",
    f"""
    WITH s AS (
      SELECT lang, n_chars,
             CASE WHEN {_U01_SQL.format(salt="split")} < {_SPLIT_TEST_FRAC}
                  THEN 'test' ELSE 'train' END AS split
      FROM documents)
    SELECT lang, split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY lang, split
    """,
)
def train_test_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted-hash train/test split, summarized per
    (lang, split). Pure projection before the tiny rollup — no RNG,
    reshuffle-stable, new data never reassigns old docs."""
    docs = hash_split(
        _t(spark, sf_dir, "documents"), _SPLIT_TEST_FRAC, salt="split"
    )
    return docs.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


@query(
    "pack_sequences_docs",
    f"""
    WITH tok AS (SELECT lang, doc_id,
                        CAST(ceil(len(text) / 4.0) AS BIGINT) AS n_tokens
                 FROM documents),
    w AS (SELECT lang, doc_id, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS e
          FROM tok)
    SELECT lang, doc_id, n_tokens,
           CAST(e - n_tokens AS BIGINT) AS start_off,
           CAST(floor((e - n_tokens) / {_PACK_CAPACITY}.0) AS BIGINT) AS seq_first,
           CAST(CASE WHEN n_tokens > 0 THEN floor((e - 1) / {_PACK_CAPACITY}.0)
                     ELSE floor((e - n_tokens) / {_PACK_CAPACITY}.0) END
                AS BIGINT) AS seq_last,
           CAST(CASE WHEN n_tokens > 0 THEN floor((e - 1) / {_PACK_CAPACITY}.0)
                     ELSE floor((e - n_tokens) / {_PACK_CAPACITY}.0) END
                - floor((e - n_tokens) / {_PACK_CAPACITY}.0) + 1 AS BIGINT) AS n_seqs
    FROM w
    """,
)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of docs into 2048-token training
    sequences, parallel per language group (the standard pretraining
    batch layout)."""
    return pack_sequences(
        _t(spark, sf_dir, "documents"), _PACK_CAPACITY, group_col="lang"
    )


@query(
    "quality_sample_docs",
    rf"""
    WITH s AS (
      SELECT doc_id, text,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
             len(text) AS n_chars_m,
             len(text) - len(translate(text, '.,!?;:''"()[]{{}}', '')) AS punct
      FROM documents),
    m AS (
      SELECT doc_id, n_chars_m, len(toks) AS n_tokens, punct,
             len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','that','for'))) AS stop_hits,
             CASE WHEN len(toks) > 0
                  THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS mean_tok
      FROM s),
    r AS (
      SELECT doc_id,
             CASE WHEN n_chars_m > 0 THEN CAST(punct AS DOUBLE) / n_chars_m ELSE 0.0 END AS punct_ratio,
             CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END AS stop_ratio,
             n_tokens, mean_tok
      FROM m),
    q AS (
      SELECT doc_id,
             round(least(n_tokens / 100.0, 1.0) * 0.4
                   + least(stop_ratio * 5.0, 1.0) * 0.3
                   + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2
                   + CASE WHEN mean_tok >= 3.0 AND mean_tok <= 10.0 THEN 1.0 ELSE 0.0 END * 0.1,
                   6) AS quality
      FROM r),
    d AS (
      SELECT doc_id, quality,
             {_U01_SQL.format(salt="qsample")} AS u
      FROM q)
    SELECT doc_id, quality, round(u, 6) AS u
    FROM d WHERE u < quality
    """,
)
def quality_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted Bernoulli thinning: keep each doc with
    probability = its composite quality score, via the deterministic
    md5-uniform (reproducible, shuffle-free, no RNG coordination)."""
    from mnemo_spark.io import spread_table

    # the composite-quality regex/token pass is per-row-expensive and
    # the cached documents table is one scan split — read via the
    # core-count-partitioned cached twin so the tokenize runs on every
    # core (r13, guide §2.5; identity at scale)
    scored = quality_scores(
        spread_table(spark, sf_dir, "documents")
    ).select("doc_id", "quality")
    return quality_bernoulli_sample(scored, salt="qsample").select(
        "doc_id", "quality", "u"
    )


_VOCAB_K = 50


@query(
    "repetition_docs",
    """
    WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                 FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, greatest(len(toks), 1)),
                                       i -> concat_ws(' ', toks[i], toks[i+1]))) AS s
          FROM tok),
    c AS (SELECT doc_id, s, count(*) AS cnt FROM g GROUP BY doc_id, s),
    a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n2g, count(*) AS d2g,
                 CAST(max(cnt) AS BIGINT) AS maxc
          FROM c GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(n2g, 0) AS n_2grams,
           round(CASE WHEN coalesce(n2g, 0) > 0
                      THEN 1.0 - d2g * 1.0 / n2g ELSE 0.0 END, 6) AS dup_2gram_ratio,
           round(CASE WHEN coalesce(n2g, 0) > 0
                      THEN maxc * 1.0 / n2g ELSE 0.0 END, 6) AS top_2gram_share
    FROM documents d LEFT JOIN a USING (doc_id)
    """,
)
def repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition gate: duplicate-2gram ratio
    and most-frequent-2gram share (boilerplate/degenerate-generation
    detector)."""
    from mnemo_spark.operators.textquality import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


@query(
    "vocab_topk_docs",
    f"""
    WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
               FROM documents)
    SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
    FROM t GROUP BY term
    ORDER BY cf DESC, term
    LIMIT {_VOCAB_K}
    """,
)
def vocab_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head (cf/df stats table): one partial-agg
    shuffle on term, TakeOrderedAndProject top-k."""
    from mnemo_spark.operators.textquality import vocab_topk

    return vocab_topk(_t(spark, sf_dir, "documents"), _VOCAB_K)


_MINHASH_R = P.MINHASH_NUM // P.MINHASH_BANDS
_COEF_VALUES = ", ".join(
    f"({s}, {a}, {b})" for s, (a, b) in enumerate(P.MINHASH_COEFFS)
)
_INC_NEW_MOD = 10  # every 10th doc plays the incoming crawl batch


@query(
    "incremental_dedup_docs",
    f"""
    WITH {_SHINGLE_SQL},
    h0 AS (SELECT doc_id, CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS h0 FROM e),
    coef(seed, a, b) AS (VALUES {_COEF_VALUES}),
    seeded AS (SELECT doc_id, seed, (a * h0 + b) % {P.MINHASH_PRIME} AS h
               FROM h0, coef),
    sig AS (SELECT doc_id, seed, min(h) AS minhash FROM seeded GROUP BY doc_id, seed),
    band AS (SELECT doc_id, CAST(seed // {_MINHASH_R} AS INT) AS band,
                    md5(string_agg(minhash::VARCHAR, '|' ORDER BY minhash)) AS band_key
             FROM sig GROUP BY doc_id, CAST(seed // {_MINHASH_R} AS INT)),
    nb AS (SELECT * FROM band WHERE doc_id % {_INC_NEW_MOD} = 0),
    cb AS (SELECT * FROM band WHERE doc_id % {_INC_NEW_MOD} <> 0)
    SELECT nb.doc_id, count(*) AS n_band_hits,
           count(DISTINCT cb.doc_id) AS n_corpus_candidates
    FROM nb JOIN cb USING (band, band_key)
    GROUP BY nb.doc_id
    """,
)
def incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-crawl dedup: the new batch's LSH band keys equi-join a
    (at scale: precomputed) corpus signature table — corpus work never
    repeats and the corpus never self-joins.

    r13 (guide §2.4): both sides slice ONE band table instead of
    running the shingle→minhash pipeline per side (per-doc signatures
    commute with the id split), and in serving sessions that table is
    the SAME pinned, join-key-partitioned artifact
    minhash_near_dup_pairs reads — one signature materialization
    serves every band-join surface, exactly like the stored signature
    table both docstrings describe at 100 TB."""
    from mnemo_spark.operators.dedup import (
        incremental_band_hits,
        pinned_band_table,
    )

    docs = _t(spark, sf_dir, "documents")
    band = pinned_band_table(
        docs, P.MINHASH_NUM, P.MINHASH_BANDS, P.JACCARD_SHINGLE_K
    )
    nb = band.filter(F.col("_id") % _INC_NEW_MOD == 0)
    cb = band.filter(F.col("_id") % _INC_NEW_MOD != 0)
    return incremental_band_hits(nb, cb)


_STRAT_N = 20


@query(
    "stratified_sample_docs",
    f"""
    WITH u AS (
      SELECT doc_id, lang, n_chars,
             {_U01_SQL.format(salt="strat")} AS u
      FROM documents),
    r AS (SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rk
          FROM u)
    SELECT lang, doc_id, n_chars FROM r WHERE rk <= {_STRAT_N}
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language deterministic subsample via the salted
    md5 uniform rank — per-stratum windows, no global sort."""
    from mnemo_spark.operators.pipeline import stratified_sample

    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return stratified_sample(docs, _STRAT_N, "lang")


# ---------------------------------------------------------------------------
# PII scrub / token entropy / source mixture (round-4 curation additions)
# ---------------------------------------------------------------------------

from mnemo_spark.operators.pipeline import source_mixture_weights  # noqa: E402
from mnemo_spark.operators.redact import (  # noqa: E402
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    SSN_RE,
    scrub_pii,
)
from mnemo_spark.operators.textquality import token_entropy  # noqa: E402

# the corpus text is synthetic lowercase words — inject deterministic
# PII identically on both sides so detection has real positives
_PII_BUILT_SQL = """
    built AS (
      SELECT doc_id,
             substr(text, 1, 40)
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                     ELSE '' END
             || CASE WHEN doc_id % 4 = 0
                     THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4567'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
                     ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS text
      FROM documents)
"""


def _pii_built(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    t = F.substring(F.col("text"), 1, 40)
    t = F.concat(
        t,
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com now")),
        ).otherwise(""),
        F.when(
            d % 4 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((d % 1000).cast("string"), 3, "0"), F.lit("-4567")),
        ).otherwise(""),
        F.when(
            d % 5 == 0,
            F.concat(F.lit(" from 192.168."), (d % 256).cast("string"), F.lit(".17")),
        ).otherwise(""),
        F.when(
            d % 7 == 0,
            F.concat(F.lit(" ssn 123-45-"), F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(""),
    )
    return docs.select("doc_id", t.alias("text"))


@query(
    "pii_scrub_docs",
    f"""
    WITH {_PII_BUILT_SQL.strip()}
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_email,
           len(regexp_extract_all(text, '{SSN_RE}')) AS n_ssn,
           len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phone,
           len(regexp_extract_all(text, '{IPV4_RE}')) AS n_ip,
           md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{SSN_RE}', '<SSN>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g'),
                 '{IPV4_RE}', '<IP>', 'g')) AS scrubbed_md5
    FROM built
    """,
)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/redact.py): per-type detection counts
    + deterministic masking over text with injected emails / phones /
    IPs / SSNs. Map-only pass, no shuffle; the scrubbed text is
    md5-compared so the masking itself is value-checked."""
    built = _pii_built(_t(spark, sf_dir, "documents"))
    out = scrub_pii(built)
    return out.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        "n_ip",
        F.md5(F.col("scrubbed")).alias("scrubbed_md5"),
    )


@query(
    "token_entropy_docs",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents),
    cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t)
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
    FROM cnt GROUP BY doc_id
    """,
)
def token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy (operators/textquality.py
    token_entropy): the perplexity-proxy quality gate — degenerate
    repetition scores near zero, token soup scores near log2(n)."""
    return token_entropy(_t(spark, sf_dir, "documents"))


@query(
    "source_mixture_docs",
    """
    WITH agg AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    z AS (SELECT sum(pow(CAST(n AS DOUBLE), 0.5)) AS z FROM agg)
    SELECT a.source, CAST(a.n AS BIGINT) AS n,
           round(pow(CAST(a.n AS DOUBLE), 0.5) / z.z, 6) AS mix_weight
    FROM agg a CROSS JOIN z
    """,
)
def source_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights (operators/pipeline.py
    source_mixture_weights): temperature-smoothed (alpha=0.5) sampling
    share per source for corpus balancing."""
    return source_mixture_weights(_t(spark, sf_dir, "documents"), alpha=0.5)


from mnemo_spark.functions.text import BPE_PATTERN, bpe_token_count, token_count, token_estimate  # noqa: E402

_BPE_SQL = BPE_PATTERN.replace("'", "''")


@query(
    "bpe_token_count_docs",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_bpe,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
           CAST(ceil(len(text) / 4.0) AS BIGINT) AS n_est
    FROM documents
    """,
)
def bpe_token_count_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways (functions/text.py): GPT-2-style
    pre-tokenizer regex (the BPE-cost proxy), whitespace/alnum word
    count, and the reference's ceil(chars/4) estimate (F13) — the
    pipeline's sequence-length budgeting inputs, all codegen-side."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        bpe_token_count("text").alias("n_bpe"),
        token_count("text").alias("n_words"),
        token_estimate("text").alias("n_est"),
    )


from mnemo_spark.functions.text import chunk_text  # noqa: E402

_CHUNK_SIZE = 180
_CHUNK_STRIDE = 120


@query(
    "chunk_docs",
    f"""
    WITH c AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(text) - 1, 1) + 1, {_CHUNK_STRIDE}),
               s -> substr(text, CAST(s AS INT), {_CHUNK_SIZE}))) AS chunk,
             unnest(range(1, greatest(len(text) - 1, 1) + 1, {_CHUNK_STRIDE})) AS start
      FROM documents WHERE doc_id % 5 = 0)
    SELECT doc_id,
           CAST((start - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_no,
           len(chunk) AS n_chars_chunk,
           md5(chunk) AS chunk_md5
    FROM c
    """,
)
def chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (functions/text.chunk_text)
    — the embedding-prep shape: stride {_CHUNK_STRIDE} < size
    {_CHUNK_SIZE} so consecutive chunks share context. posexplode
    keeps the chunk index; both the chunk list and the explode are
    map-side (no shuffle anywhere)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    chunks = d.select(
        "doc_id",
        F.posexplode(chunk_text("text", _CHUNK_SIZE, _CHUNK_STRIDE)).alias(
            "chunk_no", "chunk"
        ),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_no").cast("int"),
        F.length("chunk").alias("n_chars_chunk"),
        F.md5("chunk").alias("chunk_md5"),
    )


from mnemo_spark.operators.dedup import fuzzy_match_pairs  # noqa: E402
from mnemo_spark.operators.pipeline import weighted_sample  # noqa: E402


@query(
    "fuzzy_match_docs",
    """
    WITH b AS (
      SELECT doc_id, substr(lower(text), 1, 16) AS blk,
             substr(lower(text), 1, 60) AS probe
      FROM documents)
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(levenshtein(a.probe, c.probe) AS INT) AS edit_dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE levenshtein(a.probe, c.probe) <= 8
    """,
)
def fuzzy_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage fuzzy matching (operators/dedup.py
    fuzzy_match_pairs): blocking on the normalized 16-char prefix
    collapses the pair space, then candidates pay levenshtein on a
    60-char probe — the standard linkage plan at any corpus size.

    r14: the operator now pins a NARROW (id, block, probe) frame
    partitioned on the blocking key and pays a banded levenshtein —
    see fuzzy_match_pairs; this query was the sf1x scaling probe's
    smoking gun (18.3 s noop, flat across 8 vs 32 cores, the whole
    pair bill serialized on the 1-split wide documents scan)."""
    return fuzzy_match_pairs(
        _t(spark, sf_dir, "documents"), block_len=16, probe_len=60, max_dist=8
    ).withColumn("edit_dist", F.col("edit_dist").cast("int"))


_WS_K = 50


@query(
    "weighted_sample_docs",
    f"""
    WITH s AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
             round(ln(CAST(('0x' || substr(md5('wsample#' || CAST(doc_id AS VARCHAR)), 1, 6))
                           AS BIGINT) / 16777216.0)
                   / CAST(n_chars AS DOUBLE), 9) AS samp_key
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, weight, samp_key, rank
    FROM (SELECT *, row_number() OVER (ORDER BY samp_key DESC, doc_id) AS rank
          FROM s)
    WHERE rank <= {_WS_K}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (operators/pipeline.py
    weighted_sample, Efraimidis-Spirakis A-ES): longer documents draw
    proportionally more often, deterministically — the quality-weighted
    data-mixing draw, one pass, no RNG coordination."""
    return weighted_sample(
        _t(spark, sf_dir, "documents"), k=_WS_K, weight_col="n_chars"
    )
