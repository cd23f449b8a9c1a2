"""Text analysis: language-ID, quality scoring, token stats,
fingerprints (BASELINE.json pipeline operators; reference analogs:
poisoning lexical heuristics F17, token estimate F13, excerpt F12).

Everything is Column arithmetic over tokens/characters — no UDFs —
so it runs at full codegen speed and has an exact SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mnemo_spark.functions.text import token_count, token_estimate, tokens

ROUND_DP = 6

# Tiny per-language function-word lists (public knowledge). The
# heuristic is argmax of stopword hit-share — standard n-gram/
# stopword language ID at the "good enough for corpus routing" tier.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
}

PUNCT = ".,!?;:'\"()[]{}"
STOPWORDS_EN = LANG_STOPWORDS["en"]


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: argmax stopword hits; ties break to the
    lexicographically GREATEST language code (struct-max semantics,
    mirrored in the oracle); 'und' when nothing matches.
    → (id, pred_lang)."""
    tok = tokens(text_col)
    scores = [
        F.struct(
            F.size(F.filter(tok, lambda t: t.isin(*words))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    # array_max compares (hits, lang) lexicographically → highest hits,
    # tiebreak greatest lang code.
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals with a
    composite score in [0,1] — the standard pre-training quality
    gate features. → (id, n_chars, n_tokens, punct_ratio,
    stopword_ratio, mean_token_len, quality)."""
    t = F.col(text_col)
    tok = tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(tok)
    punct = n_chars - F.length(F.translate(t, PUNCT, ""))
    stop_hits = F.size(F.filter(tok, lambda x: x.isin(*STOPWORDS_EN)))
    mean_tok = F.when(
        n_tokens > 0,
        F.aggregate(tok, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(0.0)
    # composite: reward moderate length + stopword presence, penalize
    # punctuation soup and degenerate token lengths
    quality = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
        + F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.1
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, ROUND_DP).alias("punct_ratio"),
        F.round(stop_ratio, ROUND_DP).alias("stopword_ratio"),
        F.round(mean_tok, ROUND_DP).alias("mean_token_len"),
        F.round(quality, ROUND_DP).alias("quality"),
    )


def token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counting: whitespace words, regex tokens, ceil(chars/4)
    BPE-ish estimate (reference F13). → per-doc counts."""
    t = F.col(text_col)
    ws_words = F.size(F.filter(F.split(t, r"\s+"), lambda x: F.length(x) > 0))
    return docs.select(
        F.col(id_col),
        ws_words.alias("ws_words"),
        token_count(text_col).alias("regex_tokens"),
        token_estimate(text_col).alias("est_bpe_tokens"),
    )


def fingerprint_mink(
    docs: DataFrame,
    k: int = 5,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document fingerprint: the k lexicographically-smallest
    md5(shingle) values, '|'-joined (a min-k sketch — same family as
    winnowing/rolling-hash fingerprints, order-stable across engines).
    → (id, fingerprint)."""
    from mnemo_spark.operators.dedup import _shingle_rows

    sh = _shingle_rows(docs, id_col, text_col, shingle_k).select(
        F.col("_id").alias(id_col), F.md5("_sh").alias("_h")
    )
    return sh.groupBy(id_col).agg(
        F.concat_ws(
            "|", F.slice(F.sort_array(F.collect_list("_h")), 1, k)
        ).alias("fingerprint")
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition signals over token
    2-grams: duplicate-2gram ratio (1 - distinct/total) and the share
    of the single most frequent 2-gram. High values flag boilerplate
    and degenerate generations that length/stopword gates miss.
    → (id, n_2grams, dup_2gram_ratio, top_2gram_share).

    Shape: explode(2-grams) → two map-side-combinable aggregations
    keyed on (doc, gram) then (doc) — the same single-shuffle family
    as SimHash; no windows, no driver state.
    """
    from mnemo_spark.functions.text import shingles

    g = docs.select(
        F.col(id_col).alias("_id"), F.explode(shingles(tokens(text_col), 2)).alias("_g")
    )
    per_gram = g.groupBy("_id", "_g").agg(F.count("*").alias("_cnt"))
    agg = per_gram.groupBy("_id").agg(
        F.sum("_cnt").alias("_n"),
        F.count("*").alias("_d"),
        F.max("_cnt").alias("_m"),
    )
    base = docs.select(F.col(id_col).alias("_id"))
    out = base.join(agg, "_id", "left")
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("long")
    return out.select(
        F.col("_id").alias(id_col),
        n.alias("n_2grams"),
        F.round(
            F.when(n > 0, 1.0 - F.col("_d").cast("double") / n).otherwise(F.lit(0.0)), ROUND_DP
        ).alias("dup_2gram_ratio"),
        F.round(
            F.when(n > 0, F.col("_m").cast("double") / n).otherwise(F.lit(0.0)), ROUND_DP
        ).alias("top_2gram_share"),
    )


def vocab_topk(
    docs: DataFrame, k: int = 50, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary head: top-k terms by collection frequency
    with document frequency — the df/cf statistics table BM25 and
    tokenizer training both start from. → (term, cf, df).

    orderBy+limit plans TakeOrderedAndProject (parallel partial
    top-k); the aggregation is one shuffle on term with partial
    combine, so the reduce side only sees |vocab| rows, not |tokens|.
    """
    t = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    )
    return (
        t.groupBy("term")
        .agg(
            F.count("*").alias("cf"),
            F.countDistinct("_id").alias("df"),
        )
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(k)
    )


def token_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy (bits) of each doc's token distribution — the
    perplexity-proxy quality signal: near-zero entropy = degenerate
    repetition, unusually high = token soup. H = log2(n) − Σc·log2(c)/n
    (the factored form keeps both engines on the identical float
    expression). One explode + one keyed aggregation — a single
    shuffle on (doc, token), map-side combined.
    → (id, n_tokens, entropy_bits)."""
    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_t")
    )
    cnt = tok.groupBy("_id", "_t").agg(F.count("*").alias("_c"))
    return (
        cnt.groupBy("_id")
        .agg(
            F.sum("_c").alias("_n"),
            F.sum(F.col("_c") * F.log2("_c")).alias("_sclogc"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").alias("n_tokens"),
            F.round(
                F.log2("_n") - F.col("_sclogc") / F.col("_n"), ROUND_DP
            ).alias("entropy_bits"),
        )
    )
