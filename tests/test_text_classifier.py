"""Hashing-trick classifier + cross-document novelty: planted-corpus
golden checks and pure-python model equivalence (the oracle twin covers
the md5 arithmetic; these pin the SEMANTICS on controlled inputs)."""

import hashlib

from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators.text import (
    hash_classifier_score,
    novelty_stats,
)


def _py_weight(token: str, n_buckets: int = 512, n_weights: int = 2048) -> int:
    b = int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n_buckets
    return (b * 2654435761) % n_weights - n_weights // 2


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_classifier_matches_python_model(spark):
    rows = [(1, "the quick brown fox"), (2, "jumps over the lazy dog dog")]
    out = {r.doc_id: r for r in hash_classifier_score(_docs(spark, rows)).collect()}
    for doc_id, text in rows:
        toks = text.lower().split()
        sw = sum(_py_weight(t) for t in toks)
        # UNROUNDED per-row rational: identical int operands -> the
        # engine's double equals python's exactly
        expect = sw / (1024.0 * len(toks))
        got = out[doc_id]
        assert got.n_tokens == len(toks)
        assert got.score == expect
        assert got.label == ("keep" if got.score > 0 else "drop")


def test_hash_classifier_score_bounded(spark, ):
    rows = [(i, f"token{i} alpha beta gamma") for i in range(50)]
    scores = [r.score for r in hash_classifier_score(_docs(spark, rows)).collect()]
    assert all(-1.0 <= s <= 1.0 for s in scores)
    assert len(set(scores)) > 1  # weights actually vary across buckets


def test_novelty_first_doc_is_fully_novel(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),          # exact repeat: zero novelty
        (3, "a b c x y z"),        # mixes old and new grams
    ]
    out = {r.doc_id: r for r in novelty_stats(_docs(spark, rows)).collect()}
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0
    # doc 3 grams: "a b c" (seen in doc 1), "b c x", "c x y", "x y z" (novel)
    assert out[3].n_grams == 4
    assert out[3].n_novel == 3
    assert abs(out[3].novelty - 0.75) < 1e-12


def test_novelty_short_doc_single_gram(spark):
    rows = [(1, "one two"), (2, "one two")]
    out = {r.doc_id: r for r in novelty_stats(_docs(spark, rows)).collect()}
    assert out[1].n_grams == 1 and out[1].novelty == 1.0
    assert out[2].novelty == 0.0


def test_rake_scores_planted_document(spark):
    # "fast table scan" is delimited by stopwords; RAKE should score the
    # long phrase above the singletons: each word has freq=1, degree=3 →
    # score 3e6 each → phrase sum 9e6; singleton "merge" scores 1e6
    from apache_flink_essentials_spark.operators.text import rake_keyphrases

    rows = [(1, "the fast table scan of merge in sort")]
    out = rake_keyphrases(_docs(spark, rows), k=10).collect()
    by_phrase = {r.phrase: r for r in out}
    assert by_phrase["fast table scan"].score_milli == 9_000_000
    assert by_phrase["merge"].score_milli == 1_000_000
    assert by_phrase["fast table scan"].rk == 1


def test_rake_degree_counts_shared_words(spark):
    # "big data" and "data lake": data has freq=2, degree=4 → score 2e6;
    # big/lake freq=1 degree=2 → 2e6; both phrases sum to 4e6, tie broken
    # by phrase text
    from apache_flink_essentials_spark.operators.text import rake_keyphrases

    rows = [(1, "big data of data lake")]
    out = rake_keyphrases(_docs(spark, rows), k=10).collect()
    scores = {r.phrase: (r.score_milli, r.rk) for r in out}
    assert scores["big data"] == (4_000_000, 1)
    assert scores["data lake"] == (4_000_000, 2)


def test_vocab_coverage_planted(spark):
    from apache_flink_essentials_spark.operators.text import vocab_coverage

    # 6 "aa", 3 "bb", 1 "cc" → top-1 covers 6/10, top-2 covers 9/10
    rows = [(1, "aa aa aa bb"), (2, "aa aa aa bb bb cc")]
    out = {
        r.vocab_size: r
        for r in vocab_coverage(_docs(spark, rows), vocab_sizes=(1, 2, 10)).collect()
    }
    assert (out[1].covered_occurrences, out[1].total_occurrences) == (6, 10)
    assert out[2].covered_occurrences == 9
    assert out[10].coverage == 1.0  # N beyond the vocab covers everything
    assert out[1].coverage == 0.6


def test_langid_confusion_counts_are_complete(spark):
    from pyspark.sql import functions as F

    from apache_flink_essentials_spark import load_table
    from apache_flink_essentials_spark.operators.text import detected_lang_expr

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    conf = (
        docs.select(F.col("lang"), detected_lang_expr("text").alias("det"))
        .groupBy("lang", "det")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in conf) == docs.count()
    # the detector should get the labeled language right more often than
    # any single wrong guess for at least one language (sanity, not acc)
    diag = sum(r["count"] for r in conf if r.lang == r.det)
    assert diag > 0
