"""Round-11 hardening tests: the four ADVICE items.

1. kmv_jaccard degenerate (empty/all-NULL) inputs must not divide by zero.
2. fd_violations with an empty spec list raises a clear ValueError.
3. unpartitioned_windows must NOT count an aggregate on the broadcast
   side of a join as bounding the window's streaming input.
"""

import pytest
from pyspark.sql import functions as F


# ---- kmv_jaccard zero-guard -------------------------------------------------


def test_kmv_jaccard_both_empty(spark):
    from apache_flink_essentials_spark.operators import sketches as SK

    a = spark.createDataFrame([], "x string")
    b = spark.createDataFrame([], "x string")
    r = SK.kmv_jaccard(a, b, "x", k=16).collect()[0]
    assert r.k_used == 0
    assert r.jaccard_kmv == 0.0 and r.jaccard_exact == 0.0
    assert r.abs_error == 0.0


def test_kmv_jaccard_all_null(spark):
    from apache_flink_essentials_spark.operators import sketches as SK

    a = spark.createDataFrame([(None,), (None,)], "x string")
    b = spark.createDataFrame([(None,)], "x string")
    r = SK.kmv_jaccard(a, b, "x", k=16).collect()[0]
    assert r.k_used == 0 and r.jaccard_kmv == 0.0


def test_kmv_jaccard_one_empty_side(spark):
    from apache_flink_essentials_spark.operators import sketches as SK

    a = spark.createDataFrame([(v,) for v in "abc"], "x string")
    b = spark.createDataFrame([], "x string")
    r = SK.kmv_jaccard(a, b, "x", k=16).collect()[0]
    assert (r.n_exact_a, r.n_exact_b, r.n_exact_inter) == (3, 0, 0)
    assert r.jaccard_kmv == 0.0 and r.jaccard_exact == 0.0


# ---- fd_violations empty spec -----------------------------------------------


def test_fd_violations_empty_spec_raises(spark):
    from apache_flink_essentials_spark.operators import profiling as P

    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError, match="at least one FD spec"):
        P.fd_violations(df, [])


# ---- unpartitioned_windows ignores broadcast-side aggregates -----------------


def test_walker_ignores_broadcast_side_bounding(spark):
    """A data-sized global window whose only aggregate sits on the
    broadcast side of a crossJoin must read as UNBOUNDED — the 1-row
    stats relation bounds the broadcast side, not the window input."""
    from pyspark.sql.window import Window

    from apache_flink_essentials_spark.plans import unpartitioned_windows

    data = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("v"))
    stats = data.agg(F.avg("v").alias("mean_v"))
    w = Window.orderBy("id")
    df = (
        data.crossJoin(F.broadcast(stats))
        .withColumn("rn", F.row_number().over(w))
    )
    ws = unpartitioned_windows(df)
    assert ws, "expected a global WindowExec in the plan"
    assert all(not x["bounded"] for x in ws), (
        "broadcast-side aggregate must not count as bounding: "
        f"{ws}"
    )


def test_walker_still_sees_genuine_bounding(spark):
    """A global window fed BY an aggregate stays bounded."""
    from pyspark.sql.window import Window

    from apache_flink_essentials_spark.plans import unpartitioned_windows

    data = spark.range(1000).select((F.col("id") % 7).alias("k"))
    agg = data.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    df = agg.withColumn("rn", F.row_number().over(Window.orderBy("k")))
    ws = unpartitioned_windows(df)
    assert ws and all(x["bounded"] for x in ws), f"expected bounded: {ws}"


# ---- cooccurrence_edges ------------------------------------------------------


def test_cooccurrence_edges_matches_join_form(spark):
    from apache_flink_essentials_spark.operators import graph as G

    rows = [
        (1, 10), (1, 20), (1, 30), (1, 10),  # dup (group, item)
        (2, 20), (2, 30),
        (3, 40),            # singleton group: no edges
        (4, None), (None, 50),  # nulls dropped
    ]
    df = spark.createDataFrame(rows, "g int, it int")
    got = sorted(map(tuple, G.cooccurrence_edges(df, "g", "it").collect()))
    assert got == [(10, 20), (10, 30), (20, 30)]


def test_cooccurrence_edges_group_cap(spark):
    from apache_flink_essentials_spark.operators import graph as G

    rows = [(1, i) for i in range(5)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "g int, it int")
    got = sorted(map(tuple,
        G.cooccurrence_edges(df, "g", "it", max_group_size=3).collect()))
    assert got == [(1, 2)]  # group 1 (5 items) dropped entirely


def test_triangle_stats_empty_edges(spark):
    from apache_flink_essentials_spark.operators import graph as G

    e = spark.createDataFrame([], "a bigint, b bigint")
    r = G.triangle_stats(e).collect()[0]
    assert r.n_nodes == 0 and r.n_triangles == 0
    assert r.global_clustering == 0.0


# ---- adversarial second wave: graph + dedup/text degenerate inputs ----------
# (round-11 item: empty graph, single-node, all-self-loops for
# pagerank/HITS/k-core; empty and 1-doc corpus for MinHash/BPE/BM25)


def _empty_directed(spark):
    return spark.createDataFrame([], "src bigint, dst bigint")


def test_pagerank_fixedpoint_empty_graph(spark):
    from apache_flink_essentials_spark.operators import graph as G

    assert G.pagerank_fixedpoint(_empty_directed(spark), iterations=2).collect() == []


def test_pagerank_fixedpoint_all_self_loops(spark):
    from apache_flink_essentials_spark.operators import graph as G

    # 2 nodes, each only linking to itself: rank mass stays uniform
    df = spark.createDataFrame([(1, 1), (2, 2)], "src bigint, dst bigint")
    got = {r.node: r.rank_fp for r in
           G.pagerank_fixedpoint(df, iterations=3).collect()}
    assert got == {1: 500_000_000_000, 2: 500_000_000_000}


def test_pagerank_fixedpoint_single_edge(spark):
    from apache_flink_essentials_spark.operators import graph as G

    df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    got = {r.node: r.rank_fp for r in
           G.pagerank_fixedpoint(df, iterations=1).collect()}
    # n=2: base 75e9 each; node2 also gets 85% of node1's initial 500e9
    assert set(got) == {1, 2}
    assert got[2] > got[1] > 0


def test_hits_fixedpoint_empty_graph(spark):
    from apache_flink_essentials_spark.operators import graph as G

    assert G.hits_fixedpoint(_empty_directed(spark), iterations=2).collect() == []


def test_hits_fixedpoint_all_self_loops(spark):
    from apache_flink_essentials_spark.operators import graph as G

    df = spark.createDataFrame([(1, 1), (2, 2)], "src bigint, dst bigint")
    got = {r.node: (r.hub_micro, r.auth_micro) for r in
           G.hits_fixedpoint(df, iterations=2).collect()}
    assert got == {1: (500_000, 500_000), 2: (500_000, 500_000)}


def test_kcore_empty_and_subcritical(spark):
    from apache_flink_essentials_spark.operators import graph as G

    empty = spark.createDataFrame([], "a bigint, b bigint")
    assert G.kcore(empty, k=2).collect() == []
    # a single edge has max degree 1: the 2-core is empty
    one = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    assert G.kcore(one, k=2).collect() == []


def test_kcore_triangle_survives_k2(spark):
    from apache_flink_essentials_spark.operators import graph as G

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a bigint, b bigint"
    )
    got = {r.node: r.core_degree for r in G.kcore(tri, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}  # pendant node 4 peeled


def test_minhash_lsh_empty_and_single_doc(spark):
    from apache_flink_essentials_spark.operators import dedup as D

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert D.minhash_lsh_pairs(empty).collect() == []
    one = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    assert D.minhash_lsh_pairs(one).collect() == []  # no pair from 1 doc


def test_bpe_empty_and_single_doc(spark):
    from apache_flink_essentials_spark.operators import text as T

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert T.bpe_train_merges(empty, n_merges=3).collect() == []
    one = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog the the")],
        "doc_id bigint, text string",
    )
    merges = T.bpe_train_merges(one, n_merges=3).collect()
    assert 0 < len(merges) <= 3
    assert all(m.n_occ >= 1 for m in merges)
    # the most frequent pair must lead ("h e" x4 in this doc)
    assert merges[0].pair == "h e" and merges[0].n_occ == 4


def test_bm25_empty_corpus_and_no_hit_query(spark):
    from apache_flink_essentials_spark.operators import text as T

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert T.bm25_rank(empty, ["fox"], k=5).collect() == []
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id bigint, text string",
    )
    assert T.bm25_rank(docs, ["zzz_not_present"], k=5).collect() == []
    hit = T.bm25_rank(docs, ["delta"], k=5).collect()
    assert [r.doc_id for r in hit] == [2]


# ---- containment posting join: heavy-hitter shingle cap ----------------------


def test_containment_shingle_df_cap_underestimates(spark):
    from apache_flink_essentials_spark.operators import dedup as D

    # 4 docs in one block; "x y z" boilerplate in all of them; docs 1/2
    # also share real content
    docs = spark.createDataFrame(
        [
            (1, "x y z a b c d e"),
            (2, "x y z a b c d f"),
            (3, "x y z p q r s t"),
            (4, "x y z u v w m n"),
        ],
        "doc_id bigint, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))

    uncapped = {
        (r.src_id, r.dst_id): r.containment
        for r in D.containment_pairs(docs, threshold=0.0).collect()
    }
    capped = {
        (r.src_id, r.dst_id): r.containment
        for r in D.containment_pairs(
            docs, threshold=0.0, max_shingle_df=3
        ).collect()
    }
    # cap drops the boilerplate-only pairs (their only shared shingles
    # have df=4 > 3) and UNDER-estimates the real pair, never over
    assert set(capped) <= set(uncapped)
    for pair, c in capped.items():
        assert c <= uncapped[pair] + 1e-12
    # the real near-dup pair (1->2 shares a..e run) survives the cap
    assert (1, 2) in capped and capped[(1, 2)] > 0.5
    # a boilerplate-only pair is gone under the cap but present uncapped
    assert (3, 4) in uncapped and (3, 4) not in capped


def test_containment_posting_join_matches_bruteforce(spark):
    """Posting-join intersections == python set intersections on a
    planted corpus (the rewrite's correctness pin)."""
    import itertools

    from apache_flink_essentials_spark.operators import dedup as D

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "beta gamma delta epsilon zeta eta",
        3: "one two three four five six seven",
        4: "alpha beta gamma delta epsilon zeta",  # exact dup of 1
        5: "unrelated words entirely here now yes",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))

    got = {
        (r.src_id, r.dst_id): r.containment
        for r in D.containment_pairs(docs, threshold=0.0).collect()
    }

    def sh(t, k=3):
        w = t.split()
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)} or {t}

    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        inter = len(sh(texts[a]) & sh(texts[b]))
        if inter:
            want[(a, b)] = inter / len(sh(texts[a]))
            want[(b, a)] = inter / len(sh(texts[b]))
    assert got == want


def test_ngram_jaccard_posting_join_matches_bruteforce(spark):
    import itertools

    from apache_flink_essentials_spark.operators import dedup as D

    texts = {
        1: "alpha beta gamma delta",
        2: "beta gamma delta eta",
        3: "one two three four",
        4: "alpha beta gamma delta",
        5: "alpha one unique words",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    ).withColumn("lang", F.lit("en"))

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(
            docs, block_cols=["lang"], threshold=0.01
        ).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = set(texts[a].split()), set(texts[b].split())
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.01:
            want[(a, b)] = j
    assert got == want


def test_ngram_jaccard_threshold_zero_keeps_disjoint_pairs(spark):
    from apache_flink_essentials_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id bigint, text string"
    ).withColumn("lang", F.lit("en"))
    rows = D.ngram_jaccard_pairs(
        docs, block_cols=["lang"], threshold=0.0
    ).collect()
    assert len(rows) == 1 and rows[0].jaccard == 0.0
