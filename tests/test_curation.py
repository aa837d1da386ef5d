"""Curation operators: deterministic stratified sampling (domain mixing),
repetition-ratio quality, and fixed-budget sequence packing."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators import curation as CU
from apache_flink_essentials_spark.operators import text as X


def _docs(spark):
    rows = [(i, f"doc {i} body", "en", f"src{i % 4}", 10) for i in range(400)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark)
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out = CU.stratified_sample(docs, "source", rates, default_rate=0.25)
    got = out.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in got}
    assert by_src.get("src0") == 100          # rate 1.0 keeps everything
    assert "src2" not in by_src               # rate 0.0 keeps nothing
    assert 25 <= by_src.get("src1", 0) <= 75  # ~50 of 100 (exact hash sample)
    assert 5 <= by_src.get("src3", 0) <= 50   # default 0.25 of 100
    # deterministic: identical selection on re-run
    again = {r.doc_id for r in CU.stratified_sample(
        docs, "source", rates, default_rate=0.25).select("doc_id").collect()}
    assert again == {r.doc_id for r in out.select("doc_id").collect()}


def test_stratified_sample_is_consistent_hash_sample(spark):
    # keep-set at rate r is a SUBSET of keep-set at rate r' > r — the
    # property that lets mixes be re-weighted without churning rows
    docs = _docs(spark)
    low = {r.doc_id for r in CU.stratified_sample(
        docs, "source", {}, default_rate=0.3).select("doc_id").collect()}
    high = {r.doc_id for r in CU.stratified_sample(
        docs, "source", {}, default_rate=0.6).select("doc_id").collect()}
    assert low <= high
    assert len(low) < len(high)


def test_repetition_stats_hand_example(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y z"), (3, "w")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in X.repetition_stats(df).collect()}
    # doc 1 bigrams: "a b","b a","a b" → top share 2/3, dup fraction 1/3
    assert abs(out[1].top_bigram_share - 2 / 3) < 1e-12
    assert abs(out[1].dup_bigram_fraction - 1 / 3) < 1e-12
    # doc 2: all distinct → top share 1/2, dup 0
    assert abs(out[2].top_bigram_share - 0.5) < 1e-12
    assert out[2].dup_bigram_fraction == 0.0
    assert 3 not in out                        # single token → no bigrams


def test_pack_sequences_invariants(spark):
    docs = X.token_count(_docs(spark))
    out = CU.pack_sequences(docs, "n_tokens", budget=7, num_groups=8).collect()
    # every doc exactly once
    assert sorted(r.doc_id for r in out) == list(range(400))
    # per-pack token sums respect the budget (no oversize docs here: 3 tokens)
    sums = {}
    for r in out:
        assert not r.oversize
        sums[r.pack_id] = sums.get(r.pack_id, 0) + r.n_tokens
    assert all(s <= 7 for s in sums.values())
    assert max(sums.values()) > 3              # packs actually combine docs


def test_pack_sequences_oversize_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 100), (3, 5), (4, 6)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in CU.pack_sequences(
        df, "n_tokens", budget=10, num_groups=2).collect()}
    assert out[2].oversize and not out[1].oversize
    # deterministic pack ids across runs and input partitioning
    again = {r.doc_id: r.pack_id for r in CU.pack_sequences(
        df.repartition(7), "n_tokens", budget=10, num_groups=2).collect()}
    assert again == {d: r.pack_id for d, r in out.items()}


def test_mixture_by_token_budget_semantics(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}", 10) for i in range(300)],
        "doc_id long, source string, n_tokens long",
    )
    budgets = {"src0": 250, "src1": 10_000, "src2": 0}
    out = CU.mixture_by_token_budget(
        df, budgets, token_count_col="n_tokens", num_buckets=8
    )
    rows = out.collect()
    per = {}
    for r in rows:
        per[r.source] = per.get(r.source, 0) + r.n_tokens
    # budget respected per stratum; no slack bigger than one doc
    assert per.get("src0", 0) == 250            # 25 docs of 10 tokens fit exactly
    assert per.get("src1", 0) == 1000           # whole stratum fits
    assert "src2" not in per                    # zero budget drops stratum
    # deterministic under repartitioning and bucket count
    again = sorted(
        r.doc_id
        for r in CU.mixture_by_token_budget(
            df.repartition(13), budgets, token_count_col="n_tokens", num_buckets=8
        ).collect()
    )
    assert again == sorted(r.doc_id for r in rows)


def test_chunk_documents_cover_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(13))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        CU.chunk_documents(df, max_tokens=8, overlap=4).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 4 over 13 tokens: starts 0, 4, 8 — [0:8), [4:12), [8:13)
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert rows[0].chunk_text.split() == [f"t{i}" for i in range(8)]
    assert rows[1].chunk_text.split() == [f"t{i}" for i in range(4, 12)]
    assert rows[2].chunk_text.split() == [f"t{i}" for i in range(8, 13)]
    assert [r.n_chunk_tokens for r in rows] == [8, 8, 5]


def test_chunk_documents_short_and_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(f"x{i}" for i in range(8)))],
        "doc_id long, text string",
    )
    out = CU.chunk_documents(df, max_tokens=8, overlap=4)
    per = {}
    for r in out.collect():
        per.setdefault(r.doc_id, []).append(r)
    assert len(per[1]) == 1 and per[1][0].n_chunk_tokens == 3
    # exactly max_tokens → one chunk, no ghost second chunk of pure overlap
    assert len(per[2]) == 1 and per[2][0].n_chunk_tokens == 8


def test_source_term_affinity_hand_example(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple pear", "s1"), (2, "pear pear pear pear kiwi", "s2")],
        "doc_id long, text string, source string",
    )
    out = {(r.source, r.term): r for r in X.source_term_affinity(docs, k=5).collect()}
    # apple: c_st=2 (s1), c_t=2, n_s1=3, n=8 → affinity = 2*8/(2*3)
    assert out[("s1", "apple")].affinity == 2 * 8 / (2 * 3)
    assert out[("s1", "apple")].rank == 1
    # kiwi only in s2: 1*8/(1*5)
    assert out[("s2", "kiwi")].affinity == 8 / 5
    assert out[("s2", "kiwi")].rank == 1
    assert ("s1", "kiwi") not in out  # absent terms don't appear


def test_sample_n_per_stratum_exact_counts(spark):
    docs = _docs(spark)  # 100 docs in each of src0..src3
    out = CU.sample_n_per_stratum(docs, "source", 30)
    counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts == {f"src{i}": 30 for i in range(4)}
    # n larger than the stratum → whole stratum, no padding
    small = docs.filter(F.col("doc_id") < 10)  # src0..3 with 2-3 docs each
    full = CU.sample_n_per_stratum(small, "source", 30)
    assert full.count() == 10


def test_sample_n_per_stratum_deterministic_and_ranked(spark):
    docs = _docs(spark)
    a = CU.sample_n_per_stratum(docs, "source", 15, seed=3)
    b = CU.sample_n_per_stratum(docs, "source", 15, seed=3)
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect())
    # ranks are 1..n within each stratum
    ranks = {(r.source, r.sample_rank) for r in a.collect()}
    assert ranks == {(f"src{i}", k) for i in range(4) for k in range(1, 16)}
    # a different seed picks a different subset (overwhelming probability)
    c = CU.sample_n_per_stratum(docs, "source", 15, seed=4)
    assert {r.doc_id for r in a.collect()} != {r.doc_id for r in c.collect()}


def test_weighted_sample_favors_heavy_rows(spark):
    # weights: doc_id < 350 → 1, doc_id >= 350 → 100; w_sum=5350,
    # mean_w=13.375 → light rows kept at p≈1.5%, heavy capped at p=1.0
    rows = [(i, "t", "en", "s", 1 if i < 350 else 100) for i in range(400)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = CU.weighted_sample(docs, "n_chars", 0.2, seed=1)
    light = out.filter(F.col("doc_id") < 350).count()
    heavy = out.filter(F.col("doc_id") >= 350).count()
    assert heavy >= 40      # p capped at 1.0 for heavy rows (0.2*100*400/5350 > 1)
    assert light < 30       # light rows kept at p = 0.2*1*400/5350 ≈ 1.5%
    # deterministic
    again = CU.weighted_sample(docs, "n_chars", 0.2, seed=1)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect())


def test_weighted_sample_uniform_weights_reduce_to_rate(spark):
    docs = _docs(spark)  # constant n_chars=10 → p == rate exactly
    out = CU.weighted_sample(docs, "n_chars", 0.5, seed=2)
    assert 130 <= out.count() <= 270  # ~200 of 400


def test_group_split_is_group_atomic_and_deterministic(spark):
    docs = _docs(spark)
    out = CU.group_split(docs, "source", {"train": 0.5, "val": 0.25, "test": 0.25})
    per_group = out.groupBy("source").agg(
        F.countDistinct("split").alias("n")).collect()
    assert all(r.n == 1 for r in per_group)
    again = CU.group_split(docs, "source", {"train": 0.5, "val": 0.25, "test": 0.25})
    assert {(r.doc_id, r.split) for r in out.collect()} == {
        (r.doc_id, r.split) for r in again.collect()}
    # labels restricted to the declared set
    assert {r.split for r in out.collect()} <= {"train", "val", "test"}


def test_boilerplate_chunk_stats_hand_example(spark):
    # chunks of 2 tokens; "x y" is the shared boilerplate chunk
    docs = spark.createDataFrame(
        [(1, "x y a b"),     # chunks: "x y", "a b"
         (2, "x y c d"),     # chunks: "x y", "c d"
         (3, "e f g h")],    # chunks: "e f", "g h" — none shared
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in CU.boilerplate_chunk_stats(
        docs, max_tokens=2, min_docs=2).collect()}
    assert out[1].n_chunks == 2 and out[1].n_boilerplate_chunks == 1
    assert out[1].boilerplate_fraction == 0.5
    assert out[2].n_boilerplate_chunks == 1
    assert out[3].n_boilerplate_chunks == 0 and out[3].boilerplate_fraction == 0.0


def test_contrastive_pairs_labels_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pos = spark.createDataFrame([(0, 4)], "id_a long, id_b long")
    out = CU.contrastive_pairs(pos, docs, n_neg=2, seed=0)
    rows = out.collect()
    pos_rows = [(r.anchor_id, r.other_id) for r in rows if r.label == 1]
    neg_rows = {(r.anchor_id, r.other_id) for r in rows if r.label == 0}
    assert pos_rows == [(0, 4)]
    # every doc anchors <= 2 negatives; no self-pairs; no positive leakage
    from collections import Counter

    per_anchor = Counter(a for a, _ in neg_rows)
    assert all(c <= 2 for c in per_anchor.values())
    assert all(a != b for a, b in neg_rows)
    assert (0, 4) not in neg_rows and (4, 0) not in neg_rows
    # deterministic under replay
    again = {(r.anchor_id, r.other_id, r.label)
             for r in CU.contrastive_pairs(pos, docs, n_neg=2, seed=0).collect()}
    assert again == {(r.anchor_id, r.other_id, r.label) for r in rows}
    # different seed -> different ring (with overwhelming probability)
    other = {(r.anchor_id, r.other_id)
             for r in CU.contrastive_pairs(pos, docs, n_neg=2, seed=7).collect()
             if r.label == 0}
    assert other != neg_rows


def test_contrastive_fingerprint_fused_matches_fallback(spark):
    # docs 0/4 and 1/5 are whitespace-normalized exact duplicates
    rows = [
        (0, "Hello  World"), (4, "hello world"),
        (1, "a  b\tc"), (5, "A B C"),
        (2, "unique two"), (3, "unique three"),
        (6, "unique six"), (7, "unique seven"),
    ]
    one = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    many = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    fused = {(r.anchor_id, r.other_id, r.label)
             for r in CU.contrastive_pairs_fingerprint(one, n_neg=2).collect()}
    fallback = {(r.anchor_id, r.other_id, r.label)
                for r in CU.contrastive_pairs_fingerprint(many, n_neg=2).collect()}
    # fused single-split plan == distributed fallback, bit for bit
    assert fused == fallback
    assert {(a, b) for a, b, l in fused if l == 1} == {(0, 4), (1, 5)}
    negs = {(a, b) for a, b, l in fused if l == 0}
    assert all(a != b for a, b in negs)
    assert not negs & {(0, 4), (4, 0), (1, 5), (5, 1)}


def test_curriculum_order_round_robin_interleave(spark):
    docs = spark.createDataFrame(
        [
            (1, "s1", 90), (2, "s1", 80), (3, "s1", 70),
            (4, "s2", 99), (5, "s2", 10),
        ],
        "doc_id long, source string, q long",
    )
    out = [r.doc_id for r in CU.curriculum_order(docs, "q")
           .orderBy("train_order").collect()]
    # rank-1 docs of each source first (s1 then s2), then rank-2, ...
    assert out == [1, 4, 2, 5, 3]


def test_temperature_weights_flattens_mix(spark):
    # two sources 90/10 by tokens: at alpha=0.3 the minority source's
    # weight must exceed its natural share (up-sampling), weights sum to 1,
    # allocations sum to <= budget with integer floors
    from apache_flink_essentials_spark.operators import curation as CU

    rows = [(i, "big", "t " * 9) for i in range(9)]
    rows += [(9, "small", "t " * 9)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in CU.temperature_weights(
        docs, alpha=0.3, budget_tokens=1000).collect()}
    assert out["big"].n_tokens == 9 * out["small"].n_tokens
    assert abs(out["small"].nat_share - 0.1) < 1e-12
    assert out["small"].weight > out["small"].nat_share
    assert out["big"].weight < out["big"].nat_share
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-9
    assert out["big"].alloc_tokens + out["small"].alloc_tokens <= 1000
    # alpha=1 recovers the natural mix exactly (ratio of quantized pows)
    nat = {r.source: r for r in CU.temperature_weights(
        docs, alpha=1.0, budget_tokens=1000).collect()}
    assert abs(nat["small"].weight - 0.1) < 1e-6


def _waterfill(caps, budget):
    # brute-force reference: bisect the threshold t with sum(min(c,t)) = N
    if sum(caps) <= budget:
        return list(caps)
    lo, hi = 0.0, float(max(caps))
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(c, mid) for c in caps) < budget:
            lo = mid
        else:
            hi = mid
    t = (lo + hi) / 2
    return [min(float(c), t) for c in caps]


def test_unimax_matches_bruteforce_waterfill(spark):
    rows = [
        (i, " ".join(["tok"] * n), lang, "s", 0)
        for i, (lang, n) in enumerate(
            [("en", 500), ("en", 300), ("de", 90), ("fr", 40), ("zh", 10)]
        )
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {
        r.lang: r
        for r in CU.unimax_weights(
            docs, budget_frac=0.5, epoch_cap=1
        ).collect()
    }
    caps = {lang: out[lang].cap_tokens for lang in out}
    budget = int(sum(r.lang_tokens for r in out.values()) * 0.5)
    langs = sorted(caps)
    ref = dict(zip(langs, _waterfill([caps[l] for l in langs], budget)))
    for lang in langs:
        assert abs(out[lang].alloc_tokens - ref[lang]) < 1e-3
    # budget conservation and the per-language cap invariant
    assert abs(sum(r.alloc_tokens for r in out.values()) - budget) < 1e-3
    assert all(
        r.alloc_tokens <= r.cap_tokens + 1e-9 for r in out.values()
    )


def test_unimax_all_capped_when_budget_covers_caps(spark):
    docs = _docs(spark)
    out = CU.unimax_weights(docs, budget_frac=1.0, epoch_cap=1).collect()
    # N == sum(caps): every language simply gets its cap
    assert all(abs(r.alloc_tokens - r.cap_tokens) < 1e-9 for r in out)
