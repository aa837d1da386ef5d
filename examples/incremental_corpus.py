"""Incremental-corpus maintenance workbench (round 12): the nightly
"fold today's crawl into the settled corpus" pipeline, where NOTHING
settled is ever re-hashed or re-clustered:

  * exact dedup vs corpus      — `dedup_against_corpus` (anti-join on
    stored fingerprints)
  * near-dedup vs corpus       — `near_dedup_with_signatures` against a
    PREBUILT signature table (only the batch is hashed)
  * incremental entity resolution — new match edges folded into settled
    `(node, component)` assignments via `assign_components_incremental`
    (CC over the batch-sized collapsed graph; equal to full recompute,
    pinned by test + the er_assign_incremental oracle)
  * corpus-bounded dedup report — `ngram_jaccard_best_match` with
    `max_token_df` (per-doc best match, O(corpus) output, linear
    posting work) — the decision relation curation actually consumes

    python -m examples.incremental_corpus [sf_dir]
"""

import sys

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators.dedup import (
    assign_components_incremental,
    build_signature_table,
    connected_components,
    dedup_against_corpus,
    near_dedup_with_signatures,
    ngram_jaccard_best_match,
    ngram_jaccard_pairs,
)


def run(spark=None, sf_dir: str = "/root/testdata/sf0.001"):
    spark = spark or get_spark(app_name="incremental-corpus")
    docs = load_table(spark, "documents", sf_dir)

    # the settled corpus vs tonight's batch
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    # 1. exact dedup: drop batch rows whose fingerprint already exists
    fresh = dedup_against_corpus(batch, corpus)
    print("batch rows surviving exact dedup:", fresh.count())

    # 2. near-dedup against the persisted signature table — the corpus
    #    contributed its band hashes ONCE, at build time
    sigs = build_signature_table(corpus)
    kept = near_dedup_with_signatures(fresh, sigs)
    print("batch rows surviving near dedup:", kept.count())

    # 3. incremental ER: settled clusters + tonight's match edges
    all_pairs = ngram_jaccard_pairs(
        docs, block_cols=["lang", "source"], threshold=0.5
    )
    is_new = lambda c: F.col(c) % 3 == 0  # noqa: E731
    settled = connected_components(
        all_pairs.where(~is_new("id_a") & ~is_new("id_b")), "id_a", "id_b"
    )
    updated = assign_components_incremental(
        all_pairs.where(is_new("id_a") | is_new("id_b")), settled
    )
    print("updated assignment rows:", updated.count())

    # 4. the corpus-bounded dedup report (what curation consumes)
    report = ngram_jaccard_best_match(
        docs, block_cols=["lang", "source"], max_token_df=10
    )
    print("per-doc best-match rows (O(corpus)):", report.count())
    return report


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    report = run(sf_dir=sf_dir)
    report.orderBy(F.desc("best_jaccard"), "doc_id").show(5)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
