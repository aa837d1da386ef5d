"""Tokenizer-design workbench (north-star composition): sweep vocabulary
sizes for occurrence coverage, audit OOV pressure under the chosen vocab,
train the first BPE merges, then re-measure segmentation compression —
the loop a team runs before freezing a tokenizer for a 100 TB corpus.

Every stage is an oracle-backed §2.10 operator; the expensive relations
(token type table, merge table) are vocabulary-sized, so the whole
workbench costs one corpus scan per stage regardless of corpus size.

    python -m examples.tokenizer_design [sf_dir]
"""

import sys

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators.text import (
    bpe_segment,
    bpe_train_merges,
    oov_rate,
    vocab_coverage,
)


def run(spark=None, sf_dir="/root/testdata/sf0.001"):
    spark = spark or get_spark("example-tokenizer-design")
    docs = load_table(spark, "documents", sf_dir)

    # 1. coverage curve: how much of the occurrence mass each candidate
    #    vocabulary size captures (type table is vocab-sized — cheap)
    coverage = vocab_coverage(docs, vocab_sizes=(100, 500, 1000, 5000))
    coverage.show()

    # 2. OOV pressure under the top-100 vocab (the complement of coverage,
    #    per document — the distribution matters, not just the mean)
    oov = oov_rate(docs, vocab_size=100)
    oov.agg(
        F.avg("oov_rate").alias("mean_oov"),
        F.expr("percentile(oov_rate, 0.9)").alias("p90_oov"),
    ).show()

    # 3. first BPE merges on the corpus (the merge table is the artifact
    #    a production train would checkpoint)
    merges = bpe_train_merges(docs, n_merges=3)
    merges.show(truncate=False)
    rules = [r.pair for r in merges.orderBy("step").collect()]

    # 4. apply the merges: per-doc symbol counts — the compression the
    #    3-rule table already buys
    seg = bpe_segment(docs, rules)
    stats = seg.agg(
        F.sum("n_symbols").alias("symbols_after"),
        F.sum("n_chars").alias("chars"),
    ).collect()[0]
    print(f"symbols after 3 merges: {stats.symbols_after} over {stats.chars} chars")
    return coverage


if __name__ == "__main__":
    run(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
