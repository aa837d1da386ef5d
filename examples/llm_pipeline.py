"""End-to-end LLM training-data pipeline (the north-star composition): raw
documents → quality & language filter → exact dedup → MinHash near-dedup →
token accounting → curated output.

Every stage is one of the engine's §2.10 operators; the whole pipeline is
declarative, shuffles exactly where the SCALING.md analysis says it must
(fingerprint agg, LSH band join), and ends in a partitioned parquet sink.

    python -m examples.llm_pipeline [sf_dir]
"""

import sys
import tempfile

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.io import write_files
from apache_flink_essentials_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
)
from apache_flink_essentials_spark.operators.text import (
    bpe_train_merges,
    detect_language,
    quality_score,
    text_stats,
)


def run(spark=None, sf_dir="/root/testdata/sf0.001"):
    spark = spark or get_spark("example-llm-pipeline")
    docs = load_table(spark, "documents", sf_dir)
    n_raw = docs.count()

    # 1. quality + language gates (cheap, narrow — run FIRST so every later
    #    shuffle moves only surviving docs)
    quality = quality_score(docs)
    lang = detect_language(docs)
    kept = (
        docs.join(quality.select("doc_id", "quality_score"), "doc_id")
        .join(lang, "doc_id")
        .filter((F.col("quality_score") > 0.4) & (F.col("detected_lang") != "und"))
    )

    # 2. exact dedup: keep min-id representative per fingerprint
    reps = exact_dedup(kept).select(F.col("keep_id").alias("doc_id"))
    uniq = kept.join(reps, "doc_id")

    # 3. near-dedup: drop the higher id of every confirmed near-dup pair
    near = minhash_lsh_pairs(uniq, jaccard_threshold=0.6)
    drop = near.select(F.col("id_b").alias("doc_id")).distinct()
    curated = uniq.join(drop, "doc_id", "left_anti")

    # 4. token accounting for the surviving corpus
    stats = text_stats(curated)
    summary = stats.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    )

    out = tempfile.mkdtemp(prefix="curated_")
    write_files(
        curated.join(stats.select("doc_id", "n_tokens"), "doc_id"),
        out,
        partition_by=["lang"],
    )
    n_final = curated.count()
    print(f"raw={n_raw} → kept={kept.count()} → unique={uniq.count()} → curated={n_final}")
    summary.show()

    # 5. tokenizer bootstrap: the first BPE merge rules fitted on the
    #    CURATED corpus (training the tokenizer on pre-dedup data would
    #    weight boilerplate into the merge table)
    print("first BPE merges on the curated corpus:")
    bpe_train_merges(curated, n_merges=3).show(truncate=False)

    print(f"curated corpus written to {out} (partitioned by lang)")
    return curated


if __name__ == "__main__":
    run(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
