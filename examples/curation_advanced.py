"""Advanced curation pipeline over the round-2 operator tier: substring-
level dedup → per-source dedup-rate report → curriculum training order →
contrastive pair mining — the stages between "deduped corpus" and "ready
training dataset".

Composition notes: the substring pass drops documents whose duplicated-span
fraction exceeds a threshold (finer-grained than whole-doc near-dedup); the
report aggregates what was dropped per source (observability before
training, not after); the curriculum order interleaves sources best-first;
contrastive pairs feed an embedding trainer from the SAME corpus.

    python -m examples.curation_advanced [sf_dir]
"""

import sys

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators.curation import (
    contrastive_pairs,
    curriculum_order,
)
from apache_flink_essentials_spark.operators.dedup import (
    minhash_lsh_pairs,
    substring_dup_spans,
)


def run(spark=None, sf_dir="/root/testdata/sf0.001"):
    spark = spark or get_spark(app_name="curation-advanced")
    docs = load_table(spark, "documents", sf_dir)

    # 1. substring-level dedup: drop docs that are >50% duplicated spans.
    # Docs shorter than k tokens have NO spans row (they cannot contain a
    # k-gram) — LEFT join and keep the null-fraction rows, or short docs
    # would silently vanish from the corpus while the report showed
    # nothing dropped.
    spans = substring_dup_spans(docs, k=20, min_docs=2)
    flagged = docs.join(
        spans.select("doc_id", "dup_fraction"), "doc_id", "left"
    )
    curated = flagged.filter(
        F.col("dup_fraction").isNull() | (F.col("dup_fraction") <= 0.5)
    ).drop("dup_fraction")

    # 2. observability: what did the gate drop, per source?
    report = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("dup_fraction") > 0.5, 1).otherwise(0)
        ).alias("n_dropped"),
    )

    # 3. curriculum: best-first within source, round-robin across sources
    ordered = curriculum_order(curated, "n_chars")

    # 4. contrastive pairs: near-dup positives + ring-sampled negatives
    pos = minhash_lsh_pairs(curated).select("id_a", "id_b")
    pairs = contrastive_pairs(pos, curated, n_neg=2, seed=0)

    return curated, report, ordered, pairs


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    curated, report, ordered, pairs = run(sf_dir=sf)
    print("curated docs:", curated.count())
    report.orderBy("source").show(5)
    ordered.orderBy("train_order").show(5)
    print("contrastive pairs:", pairs.groupBy("label").count().collect())


if __name__ == "__main__":
    main()
