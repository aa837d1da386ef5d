"""Round-5 curation surface as one runnable job: Gopher rule filtering →
paragraph-level dedup → dataset card → perplexity buckets, then the PQ /
IVF-PQ ANN tier over the embeddings table.

Run: ``python -m examples.curation_rules_and_pq [sf_dir]``.

This mirrors the order a production corpus pipeline applies them: the
single-scan rule battery prunes first (cheapest place to drop a doc),
paragraph dedup strips cross-doc boilerplate, the dataset card reports
what survived, and perplexity buckets pick the mixture; the ANN tier is
the retrieval side of the same corpus.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.io import load_table
from apache_flink_essentials_spark.operators.curation import (
    dataset_card,
    perplexity_buckets,
)
from apache_flink_essentials_spark.operators.dedup import paragraph_dedup_docs
from apache_flink_essentials_spark.operators.text import (
    gopher_quality_flags,
    unigram_logprob,
)
from apache_flink_essentials_spark.operators.vector import (
    ivfpq_index,
    ivfpq_search,
    kmeans_fit,
    knn_cosine_bruteforce,
    knn_recall,
    pq_fit,
)


def run(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark(app_name="curation-rules-and-pq")
    docs = load_table(spark, "documents", sf_dir)

    # 1. Gopher rule battery (single scan). The synthetic corpus is
    #    short-doc and nearly stopword-free, so relax the word-count
    #    floor and the required-stopword count the way a caller tunes
    #    thresholds to the corpus; the rules still bite (docs without
    #    'the' / below 10 words drop).
    flags = gopher_quality_flags(docs, min_words=10, min_stopword_hits=1)
    kept = docs.join(
        flags.filter("gopher_pass").select("doc_id"), "doc_id"
    )
    print(f"gopher: {docs.count()} docs → {kept.count()} pass")

    # 2. paragraph-level dedup (token-separator fixture variant; real
    #    corpora pass sep_regex='\\n{2,}')
    recon = paragraph_dedup_docs(kept, sep_regex=r"\s*\ba\b\s*", sep_out=" | ")
    recon.agg(
        F.sum("n_paras").alias("paragraphs"),
        F.sum("n_kept").alias("kept_paragraphs"),
    ).show()

    # 3. dataset card + perplexity buckets over the survivors
    dataset_card(kept).orderBy(F.desc("n_tokens")).show(10, False)
    perplexity_buckets(unigram_logprob(kept)).orderBy("bucket").show()

    # 4. ANN tier: IVF-PQ index + search, recall vs exact
    emb = load_table(spark, "embeddings", sf_dir)
    cents = kmeans_fit(emb, k=8, iters=2, dim=64)
    books = pq_fit(emb, m=4, k=16, iters=2, dim=64)
    idx = ivfpq_index(emb, cents, books)
    q = emb.filter(F.col("vec_id") < 10)
    approx = ivfpq_search(emb, q, cents, books, k=5, nprobe=4, pre_indexed=idx)
    # fixture embeddings are near-random (the PQ worst case — planted-
    #    cluster tests show recall 1.0 when structure exists), so expect a
    #    modest number here; the point is the plumbing end to end
    knn_recall(knn_cosine_bruteforce(emb, q), approx).agg(
        F.avg("recall").alias("mean_recall_vs_exact_cosine")
    ).show()
    return recon


if __name__ == "__main__":
    run(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
