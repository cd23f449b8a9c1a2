"""End-to-end training-data curation pipeline over the synthetic
corpus: profile → near-dup removal → quality gate → decontaminate →
token budget packing → stratified split — every stage an operator
from the library, composed exactly as a 100-TB run would compose them
(the only difference at scale is the SF of the input and the cluster
under it).

Run: python examples/training_data_pipeline.py [sf_dir]
Prints one JSON line of stage-by-stage row counts.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mnemo_spark.io import load_table  # noqa: E402
from mnemo_spark.operators.dedup import exact_dedup, minhash_band_pairs  # noqa: E402
from mnemo_spark.operators.pipeline import (  # noqa: E402
    decontaminate,
    hash_split,
    pack_sequences,
)
from mnemo_spark.operators.textquality import quality_scores  # noqa: E402
from mnemo_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training_pipeline")
    docs = load_table(spark, sf_dir, "documents")
    counts = {"input": docs.count()}

    # 1. exact dedup: drop every member of a hash-identical group
    #    except the keeper
    groups = exact_dedup(docs)
    losers = groups.select(
        F.explode("member_ids").alias("doc_id"), F.col("keep_id")
    ).filter(F.col("doc_id") != F.col("keep_id"))
    docs = docs.join(losers.select("doc_id"), "doc_id", "left_anti")
    counts["after_exact_dedup"] = docs.count()

    # 2. near-dup removal: LSH candidates with >= 2 agreeing bands;
    #    drop the higher id of each pair
    pairs = minhash_band_pairs(docs).filter(F.col("n_bands") >= 2)
    docs = docs.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    counts["after_near_dedup"] = docs.count()

    # 3. quality gate: drop the bottom of the composite score
    scored = quality_scores(docs)
    docs = (
        docs.join(scored.select("doc_id", "quality"), "doc_id")
        .filter(F.col("quality") >= 0.35)
        .drop("quality")
    )
    counts["after_quality_gate"] = docs.count()

    # 4. decontamination vs a benchmark set (here: a slice of the
    #    corpus itself stands in for the eval set): drop docs sharing
    #    >30% of their shingles with the benchmark
    bench = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0
    )
    contaminated = decontaminate(docs, bench).filter(
        F.col("contamination") > 0.3
    )
    docs = docs.join(
        contaminated.select("doc_id"), "doc_id", "left_anti"
    )
    counts["after_decontaminate"] = docs.count()

    # 5. deterministic split, then pack the train half into
    #    2048-token sequences grouped by language
    split = hash_split(docs, test_frac=0.1)
    train = split.filter(F.col("split") == "train").drop("split")
    packed = pack_sequences(train, capacity_tokens=2048, group_col="lang")
    counts["train_docs"] = train.count()
    counts["packed_sequences"] = int(
        packed.groupBy("lang")
        .agg(F.max("seq_last").alias("m"))
        .agg(F.sum(F.col("m") + 1))
        .collect()[0][0]
    )

    assert counts["input"] > counts["after_near_dedup"]
    assert counts["packed_sequences"] > 0
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
