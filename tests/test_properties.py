"""Property-based tests (hypothesis): structural invariants that must hold
for ANY input — the replay-stability metamorphic property the reference
states (TimeBasedTransformations.scala:52) plus window-partition laws.

max_examples kept small: each example runs real Spark jobs.
"""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators import joins as J
from apache_flink_essentials_spark.operators import windows as W

BASE = datetime.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user_id
        st.integers(min_value=0, max_value=600),        # offset seconds
    ),
    min_size=1,
    max_size=40,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    data = [
        (u, BASE + datetime.timedelta(seconds=s), float(i))
        for i, (u, s) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "user_id int, ts timestamp, v double")


@given(rows=events_strategy, size=st.sampled_from([3, 7, 10, 60]))
@settings(**SETTINGS)
def test_tumbling_windows_partition_rows(spark, rows, size):
    # tumbling windows are a partition of the input: counts sum to |rows|
    # and every row's value is accounted for exactly once
    df = _df(spark, rows)
    out = W.tumbling(
        df, "ts", f"{size} seconds", [F.count("*").alias("n"), F.sum("v").alias("sv")]
    ).collect()
    assert sum(r.n for r in out) == len(rows)
    assert abs(sum(r.sv for r in out) - sum(float(i) for i in range(len(rows)))) < 1e-6


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_session_windows_cover_all_rows_without_overlap(spark, rows):
    df = _df(spark, rows)
    out = W.session(
        df, "ts", "30 seconds", [F.count("*").alias("n")], keys=["user_id"]
    ).collect()
    assert sum(r.n for r in out) == len(rows)
    # per user, sessions are disjoint and ordered: start >= previous end
    by_user = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.window_start)):
        prev = by_user.get(r.user_id)
        assert prev is None or r.window_start >= prev
        by_user[r.user_id] = r.window_end


@given(rows=events_strategy, parts=st.sampled_from([1, 3, 13]))
@settings(**SETTINGS)
def test_replay_stability_under_repartition(spark, rows, parts):
    # the reference's event-time invariant: arrival order / partitioning
    # never changes event-time results
    df = _df(spark, rows)
    shuffled = df.repartition(parts)
    a = W.tumbling(df, "ts", "7 seconds", [F.sum("v").alias("sv")])
    b = W.tumbling(shuffled, "ts", "7 seconds", [F.sum("v").alias("sv")])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_interval_join_mirror_symmetry(spark, rows):
    # l ⋈[-a,b] r ≡ r ⋈[-b,a] l with sides swapped (band condition mirrors)
    df = _df(spark, rows)
    left = df.filter(F.col("user_id") % 2 == 0)
    right = df.filter(F.col("user_id") % 2 == 1)
    ab = J.interval_join(left, right, "user_id", "ts", "ts", "-5 seconds", "9 seconds")
    ba = J.interval_join(right, left, "user_id", "ts", "ts", "-9 seconds", "5 seconds")
    a = sorted((r.l_v, r.r_v) for r in ab.collect())
    b = sorted((r.r_v, r.l_v) for r in ba.collect())
    assert a == b


# -- dedup soundness ---------------------------------------------------------

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12),
    min_size=2,
    max_size=8,
)


@given(token_lists=docs_strategy)
@settings(**SETTINGS)
def test_minhash_pairs_are_sound(spark, token_lists):
    # every pair the pipeline RETURNS must truly meet the jaccard threshold
    # (LSH banding may MISS pairs — approximate recall is by design — but a
    # returned pair is exact-verified, so false positives are a bug)
    from apache_flink_essentials_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
    sets = {i: set(toks) for i, toks in enumerate(token_lists)}
    for r in pairs:
        a, b = sets[r.id_a], sets[r.id_b]
        exact = len(a & b) / len(a | b)
        assert r.jaccard >= 0.5
        assert abs(r.jaccard - exact) < 1e-12, (r.id_a, r.id_b, r.jaccard, exact)


@given(token_lists=docs_strategy)
@settings(**SETTINGS)
def test_exact_dedup_counts_partition_corpus(spark, token_lists):
    # dedup groups partition the corpus: group sizes sum to the doc count
    # and each keep_id is the minimum member id of its group
    from apache_flink_essentials_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    groups = exact_dedup(df).collect()
    assert sum(g.n_dups for g in groups) == len(token_lists)
    normalized = {}
    for i, toks in enumerate(token_lists):
        normalized.setdefault(" ".join(toks), []).append(i)
    expected_keeps = {min(ids) for ids in normalized.values()}
    assert {g.keep_id for g in groups} == expected_keeps


def _model_capped_sessions(rows, gap, max_dur, max_ev):
    """Pure-Python reference model of windows.session_capped: rows are
    (key, ts, id); returns the set of (key, start, end, n) capped sessions."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ts, i in rows:
        by_key[k].append((ts, i))
    out = []
    for k, evs in by_key.items():
        evs.sort()
        # gap sessions
        sessions, cur = [], [evs[0]]
        for ts, i in evs[1:]:
            if ts - cur[-1][0] > gap:
                sessions.append(cur)
                cur = [(ts, i)]
            else:
                cur.append((ts, i))
        sessions.append(cur)
        for sess in sessions:
            start = sess[0][0]
            groups = defaultdict(list)
            for rank, (ts, i) in enumerate(sess):
                sub_d = (ts - start) // max_dur if max_dur else 0
                sub_c = rank // max_ev if max_ev else 0
                groups[(sub_d, sub_c)].append(ts)
            for g in groups.values():
                out.append((k, min(g), max(g), len(g)))
    return set(out)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),       # key
            st.integers(min_value=0, max_value=500),     # ts (epoch s)
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    gap=st.sampled_from([20, 60]),
    max_dur=st.sampled_from([None, 50, 100]),
    max_ev=st.sampled_from([None, 2, 4]),
)
@settings(**SETTINGS)
def test_session_capped_matches_python_model(spark, rows, gap, max_dur, max_ev):
    data = [(k, ts, i) for i, (k, ts) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, ts long, event_id long")
    got = {
        (r.k, r.session_start, r.session_end, r.n_events)
        for r in W.session_capped(
            df, "k", "ts", gap, "event_id",
            max_duration_seconds=max_dur, max_events=max_ev,
        ).collect()
    }
    assert got == _model_capped_sessions(data, gap, max_dur, max_ev)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # key
            st.integers(min_value=0, max_value=400),   # ts
            st.integers(min_value=-50, max_value=50),  # value (int → exact)
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_time_weighted_avg_matches_python_model(spark, rows):
    from collections import defaultdict

    from apache_flink_essentials_spark.operators.timeseries import (
        time_weighted_avg,
    )

    data = [(k, ts, float(v), i) for i, (k, ts, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k int, ts long, value double, event_id long"
    )
    got = {
        r.k: (r.total_seconds, r.twap)
        for r in time_weighted_avg(df, "k", "ts", "value", "event_id").collect()
    }
    by_key = defaultdict(list)
    for k, ts, v, i in data:
        by_key[k].append((ts, i, v))
    for k, evs in by_key.items():
        evs.sort()
        wsum = tot = 0
        for (t0, _, v), (t1, _, _) in zip(evs, evs[1:]):
            wsum += v * (t1 - t0)
            tot += t1 - t0
        if tot > 0:
            assert got[k][0] == tot
            assert abs(got[k][1] - wsum / tot) < 1e-9
        else:
            assert k not in got


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),   # ts
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_ohlc_matches_python_model(spark, rows):
    from collections import defaultdict

    from apache_flink_essentials_spark.operators.timeseries import ohlc

    data = [(1, i, ts, float(v)) for i, (ts, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, event_id long, ts long, value double")
    got = {
        r.bucket: (r.open, r.high, r.low, r.close, r.n_events)
        for r in ohlc(df, "k", "ts", "value", 60, "event_id").collect()
    }
    buckets = defaultdict(list)
    for k, i, ts, v in data:
        buckets[(ts // 60) * 60].append((ts, i, v))
    for b, evs in buckets.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        assert got[b] == (evs[0][2], max(vals), min(vals), evs[-1][2], len(evs))


@given(
    old=st.dictionaries(
        st.integers(min_value=0, max_value=8),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        max_size=8,
    ),
    new=st.dictionaries(
        st.integers(min_value=0, max_value=8),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        max_size=8,
    ),
)
@settings(**SETTINGS)
def test_snapshot_diff_matches_dict_diff(spark, old, new):
    from apache_flink_essentials_spark.operators.cdc import snapshot_diff

    schema = "k long, v double"
    o_df = spark.createDataFrame(
        [(k, None if v is None else float(v)) for k, v in old.items()], schema
    ) if old else spark.createDataFrame([], schema)
    n_df = spark.createDataFrame(
        [(k, None if v is None else float(v)) for k, v in new.items()], schema
    ) if new else spark.createDataFrame([], schema)
    got = {r.k: r.change_type for r in snapshot_diff(
        o_df, n_df, ["k"], ["v"]).collect()}
    expect = {}
    for k in set(old) | set(new):
        if k not in old:
            expect[k] = "A"
        elif k not in new:
            expect[k] = "D"
        elif old[k] != new[k]:
            expect[k] = "U"
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),          # user
            st.integers(min_value=0, max_value=100),        # ts
            st.sampled_from(["A", "B", "C"]),               # step type
        ),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    within=st.sampled_from([10, 30]),
)
@settings(**SETTINGS)
def test_funnel_steps_matches_greedy_model(spark, rows, within):
    from collections import defaultdict

    from apache_flink_essentials_spark.operators.transform import funnel_steps

    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        r.user_id: (r.t0, r.t1, r.t2, r.completed_steps)
        for r in funnel_steps(
            df, "user_id", "ts", "event_type", ["A", "B", "C"], within
        ).collect()
    }
    by_user = defaultdict(list)
    for u, ts, et in rows:
        by_user[u].append((ts, et))
    expect = {}
    for u, evs in by_user.items():
        a_times = sorted(t for t, e in evs if e == "A")
        if not a_times:
            continue
        times = [a_times[0], None, None]
        for i, step in enumerate(["B", "C"], start=1):
            prev = times[i - 1]
            if prev is None:
                break
            cands = sorted(
                t for t, e in evs
                if e == step and prev < t <= prev + within
            )
            times[i] = cands[0] if cands else None
        expect[u] = (times[0], times[1], times[2],
                     sum(1 for t in times if t is not None))
    assert got == expect


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ),
    min_size=1,
    max_size=20,
).filter(lambda es: any(s != t for s, t in es))


@given(edges=edges_strategy, iters=st.sampled_from([1, 3, 5]))
@settings(**SETTINGS)
def test_pagerank_fixedpoint_bit_exact_on_any_graph(spark, edges, iters):
    # the int64 fixed-point form must equal the pure-python integer model
    # EXACTLY (==, not approx) on arbitrary graphs — self-loops, dangling
    # sinks, duplicate edges, disconnected nodes included. This is the
    # whole contract: integer sums are order-independent, so no shuffle
    # layout can perturb the result.
    from apache_flink_essentials_spark.operators import graph as G
    from test_graph import _py_pagerank_fp

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank_fp
        for r in G.pagerank_fixedpoint(df, iterations=iters).collect()
    }
    want = _py_pagerank_fp(edges, iterations=iters)
    assert got == want


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=2,
        max_size=60,
    ).filter(lambda v: max(v) > min(v)),
    nb=st.integers(min_value=2, max_value=32),
)
@settings(**SETTINGS)
def test_quantile_bands_bound_holds_on_any_data(spark, vals, nb):
    # the histogram estimate is within one bucket width of the DISCRETE
    # rank quantile for ANY input distribution and bucket count
    import math

    from apache_flink_essentials_spark.operators.sketches import (
        portable_quantile_bands,
    )

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    out = portable_quantile_bands(
        df, "v", n_buckets=nb, quantiles=(0.5, 0.9)
    ).collect()
    s = sorted(vals)
    width = (s[-1] - s[0]) / nb
    for r in out:
        disc = s[math.ceil(r.q * len(s)) - 1]
        assert abs(r.est - disc) <= width + 1e-6 * max(1.0, abs(disc))


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "the", "a", "of"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_rake_matches_python_model_on_any_corpus(spark, texts):
    # distinct-candidate RAKE == the pure-python model for ANY corpus over
    # a small token alphabet (stopwords delimit; integer millionth scores)
    from apache_flink_essentials_spark.operators.text import (
        RAKE_STOPWORDS,
        rake_keyphrases,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in rake_keyphrases(df, k=1000).collect():
        got.setdefault(r.doc_id, {})[r.phrase] = r.score_milli

    for doc_id, text in rows:
        toks = text.lower().split()
        phrases, cur = [], []
        for t in toks:
            if t in RAKE_STOPWORDS:
                if cur:
                    phrases.append(" ".join(cur))
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(" ".join(cur))
        phrases = sorted(set(phrases))
        if not phrases:
            assert doc_id not in got
            continue
        freq, degree = {}, {}
        for p in phrases:
            ws = p.split()
            for w in ws:
                freq[w] = freq.get(w, 0) + 1
                degree[w] = degree.get(w, 0) + len(ws)
        expect = {
            p: sum((degree[w] * 1_000_000) // freq[w] for w in p.split())
            for p in phrases
        }
        assert got.get(doc_id, {}) == expect, (doc_id, text)


@given(
    vals=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=80),
    n_shards=st.integers(min_value=2, max_value=4),
)
@settings(**SETTINGS)
def test_portable_hll_merge_of_any_split_equals_one_shot(spark, vals, n_shards):
    # sketch algebra holds for ANY data and ANY sharding: registers are
    # integer maxima, so merge(partials(shard_i)) == one_shot(all)
    from apache_flink_essentials_spark.operators.sketches import (
        portable_hll_distinct,
        portable_hll_merge,
        portable_hll_partials,
    )

    df = spark.createDataFrame(
        [(v, i % n_shards) for i, v in enumerate(vals)], "v long, shard int"
    )
    sharded = portable_hll_partials(df, "v", keys=("shard",))
    merged = portable_hll_merge(sharded.drop("shard")).collect()[0]
    one = portable_hll_distinct(df, "v").collect()[0]
    assert (merged.register_sum, merged.v_empty, merged.hll_distinct) == (
        one.register_sum,
        one.v_empty,
        one.hll_distinct,
    )


@given(
    texts=st.lists(
        st.sampled_from(["x y", "x  y", "a b c", "q", "a b  c"]),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_softdedup_weights_sum_to_distinct_texts(spark, texts):
    # Σ weights == number of distinct normalized texts, for ANY corpus —
    # the invariant that makes soft dedup gradient-neutral per unique text
    from apache_flink_essentials_spark.operators.curation import (
        softdedup_weights,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = softdedup_weights(df).collect()
    n_distinct = len({" ".join(t.lower().split()) for t in texts})
    assert abs(sum(r.weight for r in out) - n_distinct) < 1e-9
    assert all(r.weight == 1 / r.cluster_size for r in out)


# ---- round-8 graph / reco invariants ------------------------------------

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=20,
)


def _brute_triangles(edges):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in es for n in e})
    tri = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:]
        for c in nodes[nodes.index(b) + 1:]
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    deg = {n: sum(1 for e in es if n in e) for n in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return len(es), wedges, tri


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_triangle_stats_matches_bruteforce(spark, edges):
    # the degree-ordered oriented count == O(n^3) brute force on any
    # small graph (self-loops and duplicate/reversed edges included)
    from apache_flink_essentials_spark.operators import graph as G

    df = spark.createDataFrame(edges, "a long, b long")
    und = G.undirected_edges(df, "a", "b")
    n_edges, wedges, tri = _brute_triangles(edges)
    if n_edges == 0:
        return
    r = G.triangle_stats(und).collect()[0]
    assert (r.n_edges, r.n_wedges, r.n_triangles) == (n_edges, wedges, tri)


@given(edges=edges_strategy, k=st.sampled_from([1, 2, 3]))
@settings(**SETTINGS)
def test_kcore_invariants(spark, edges, k):
    # every surviving node has core_degree >= k, and the k-core is a
    # FIXPOINT: peeling it again changes nothing
    from apache_flink_essentials_spark.operators import graph as G

    df = spark.createDataFrame(edges, "a long, b long")
    und = G.undirected_edges(df, "a", "b")
    core = G.kcore(und, k).collect()
    assert all(r.core_degree >= k for r in core)
    survivors = {r.node for r in core}
    es = {(r.a, r.b) for r in und.collect()
          if r.a in survivors and r.b in survivors}
    # recompute degrees within the core: must equal core_degree
    for r in core:
        assert sum(1 for e in es if r.node in e) == r.core_degree


@given(
    baskets=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # basket
            st.integers(min_value=0, max_value=5),   # item
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_item_cooccurrence_bounds(spark, baskets):
    # n_ab <= min(n_a, n_b); cosine in (0, 1]; lift is the same IEEE
    # double Python computes from the identical integer operands (the
    # unrounded-rational contract)
    from apache_flink_essentials_spark.operators import reco as R

    df = spark.createDataFrame(baskets, "basket long, item long")
    n_baskets = len({b for b, _ in baskets})
    rows = R.item_cooccurrence(df, "basket", "item").collect()
    for r in rows:
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert 0 < r.cosine <= 1.0
        assert r.lift == (r.n_ab * n_baskets) / (r.n_a * r.n_b)


# ---- round-9 structural invariants -----------------------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),      # day bucket
            st.booleans(),                              # defect flag
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_p_chart_exact_predicate_equals_float_form(spark, rows):
    # the cleared-denominator integer predicate must agree with the
    # textbook float band test EXCEPT within float rounding of the
    # boundary — and on these small exact integers the float form is
    # itself exact, so they agree everywhere
    import math

    from apache_flink_essentials_spark.operators import profiling as P

    data = [
        (BASE + datetime.timedelta(days=d), bool(f)) for d, f in rows
    ]
    df = spark.createDataFrame(data, "ts timestamp, bad boolean")
    out = P.p_chart(df, "ts", F.col("bad")).collect()
    N = sum(1 for _ in rows)
    K = sum(1 for _, f in rows if f)
    for r in out:
        band = 3.0 * math.sqrt(K * (N - K) * r.n)
        dev = abs(r.n_defect * N - K * r.n)
        assert r.is_out_of_control == (dev > band) or abs(dev - band) < 1e-9


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=500, allow_nan=False),
        min_size=3,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_theilsen_slope_between_min_and_max_pairwise(spark, vals):
    # the median pairwise slope is bracketed by the extreme pairwise
    # slopes, and a constant series yields exactly 0
    from apache_flink_essentials_spark.operators.timeseries import (
        theilsen_trend,
    )

    data = [
        (BASE + datetime.timedelta(hours=i), round(float(v), 2))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(data, "ts timestamp, value double")
    r = theilsen_trend(df, "ts", "value").collect()[0]
    ms = [round(v * 100) * 10000 for v in [round(float(v), 2) for v in vals]]
    slopes = [
        (ms[j] - ms[i]) / (j - i)
        for i in range(len(ms))
        for j in range(i + 1, len(ms))
    ]
    assert min(slopes) - 1e-6 <= r.slope_micro_per_bin <= max(slopes) + 1e-6


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-8, max_value=8, allow_nan=False,
                      allow_subnormal=False),
            min_size=4, max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_signed_projection_matches_numpy(spark, vecs):
    # the BIGINT fold equals an exact integer replay for any input
    from apache_flink_essentials_spark.operators import vector as V

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = V.signed_projection(df, dim=4, n_proj=4).collect()
    import math
    import struct as _struct

    table = V.signed_sign_table(4, 4)
    got = {(r.vec_id, r.proj_idx): r.proj_micro for r in out}
    for i, v in enumerate(vecs):
        # replicate float32 storage then the exact micro quantization
        v32 = [_struct.unpack("f", _struct.pack("f", x))[0] for x in v]
        vm = [math.floor(x * 1000000.0 + 0.5) for x in v32]
        for j in range(4):
            expect = sum(s * m for s, m in zip(table[j], vm))
            assert got[(i, j)] == expect


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=500, allow_nan=False),
        min_size=3,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_kendall_tau_bounded_and_antisymmetric(spark, vals):
    # |tau| <= 1 for any series, and reversing the series negates the
    # concordant/discordant split exactly (ties are reversal-invariant)
    from apache_flink_essentials_spark.operators.timeseries import (
        binned_sums,
        kendall_from_binned,
    )

    def run(series):
        data = [
            (BASE + datetime.timedelta(hours=i), round(float(v), 2))
            for i, v in enumerate(series)
        ]
        df = spark.createDataFrame(data, "ts timestamp, value double")
        return kendall_from_binned(
            binned_sums(df, "ts", "value", 3600)
        ).collect()[0]

    fwd = run(vals)
    rev = run(list(reversed(vals)))
    assert -1.0 <= fwd.kendall_tau <= 1.0
    assert fwd.concordant == rev.discordant
    assert fwd.ties == rev.ties
    assert fwd.n_pairs == len(vals) * (len(vals) - 1) // 2


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=500, allow_nan=False),
        min_size=1,
        max_size=25,
    ),
    k=st.sampled_from([3, 5]),
)
@settings(**SETTINGS)
def test_mad_flags_iff_exceeds_k_mad(spark, vals, k):
    # the flag is EXACTLY |m - med| > k*MAD — replay the lower-median
    # rule in python on the quantized micro means
    from apache_flink_essentials_spark.operators.timeseries import (
        binned_sums,
        mad_anomalies_from_binned,
    )

    data = [
        (BASE + datetime.timedelta(hours=i), round(float(v), 2))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(data, "ts timestamp, value double")
    out = mad_anomalies_from_binned(
        binned_sums(df, "ts", "value", 3600), k=k
    ).collect()
    ms = sorted((round(round(float(v), 2) * 100) * 10000) for v in vals)
    med = ms[(len(ms) + 1) // 2 - 1]
    ds = sorted(abs(m - med) for m in ms)
    mad = ds[(len(ds) + 1) // 2 - 1]
    for r in out:
        assert r.med_m == med and r.mad == mad
        assert r.is_anomaly == (abs(r.m - med) > k * mad)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # user
            st.integers(min_value=0, max_value=50),  # minute offset
            st.sampled_from(["a", "b", "c"]),        # type
        ),
        min_size=2,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_markov_stationary_mass_conserved_within_truncation(spark, rows):
    # total pi mass never exceeds 1e6 and loses at most
    # (n-1) + iterations * n^2 ulps: each NONZERO transition entry
    # truncates < 1 per round (n^2 is the entry-count ceiling), plus
    # the initial uniform split's n-1
    from apache_flink_essentials_spark.operators.transform import (
        markov_stationary,
    )

    data = [
        (i, u, BASE + datetime.timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )
    iters = 4
    out = markov_stationary(
        df, "user_id", "ts", "event_type", iterations=iters,
        order_cols=["event_id"],
    ).collect()
    if not out:
        return
    total = sum(r.pi_micro for r in out)
    n_states = len(out)
    assert total <= 1_000_000
    assert total >= 1_000_000 - (n_states - 1) - iters * n_states**2
    assert all(r.pi_micro >= 0 for r in out)


@given(
    ws=st.lists(
        st.integers(min_value=-10_000_000, max_value=10_000_000),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_threshold_sweep_monotone_nonincreasing(spark, ws):
    # survivors can only shrink as the threshold rises, and every count
    # equals the exact python filter
    from apache_flink_essentials_spark.operators.joins import threshold_sweep

    df = spark.createDataFrame([(w,) for w in ws], "weight_micro long")
    grid = [-5_000_000, 0, 5_000_000]
    out = {
        r.threshold_micro: r
        for r in threshold_sweep(df, "weight_micro", grid).collect()
    }
    prev = None
    for t in grid:
        assert out[t].n_above == sum(1 for w in ws if w >= t)
        assert out[t].n_pairs == len(ws)
        if prev is not None:
            assert out[t].n_above <= prev
        prev = out[t].n_above


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=900, allow_nan=False),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_max_drawdown_bounds(spark, vals):
    # 0 <= max_drawdown <= running peak; frac in [0, 1); a
    # non-decreasing series has zero drawdown
    from apache_flink_essentials_spark.operators.timeseries import (
        max_drawdown,
    )

    rows = [
        ("k", BASE + datetime.timedelta(days=i), round(float(v), 2))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    r = max_drawdown(df, "ts", "value", "k").collect()[0]
    assert 0 <= r.max_drawdown_cents <= r.peak_cents
    assert 0.0 <= r.max_dd_frac < 1.0

    inc = sorted(round(float(v), 2) for v in vals)
    rows2 = [
        ("k", BASE + datetime.timedelta(days=i), v)
        for i, v in enumerate(inc)
    ]
    df2 = spark.createDataFrame(rows2, "k string, ts timestamp, value double")
    r2 = max_drawdown(df2, "ts", "value", "k").collect()[0]
    assert r2.max_drawdown_cents == 0 and r2.max_dd_frac == 0.0


# ---- connected components vs a union-find model -----------------------

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ),
    min_size=1,
    max_size=60,
)


@given(edge_rows=edges_strategy)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edge_rows):
    """The large-star/small-star loop must agree with a plain Python
    union-find on ANY random multigraph (self-loops, duplicates,
    reversed edges, chains, stars — whatever hypothesis deals): every
    node incident to a non-loop edge labeled with its component's
    minimum id."""
    from apache_flink_essentials_spark.operators import dedup as D

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edge_rows:
        if a != b:
            nodes.update((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in nodes}

    df = spark.createDataFrame(edge_rows, "id_a long, id_b long")
    got = {
        r.node: r.component
        for r in D.connected_components(df).collect()
    }
    assert got == expected


@given(edge_rows=edges_strategy, split=st.integers(min_value=2, max_value=5))
@settings(**SETTINGS)
def test_assign_components_incremental_matches_full(spark, edge_rows, split):
    """Incremental fold-in ≡ full recompute on ANY random multigraph and
    ANY old/new edge split: edges whose min endpoint id % split == 0 are
    'tonight's batch', the rest are settled first. Covers merges of
    several settled clusters, batch-only components, and nodes that only
    ever appear in the batch."""
    from apache_flink_essentials_spark.operators import dedup as D

    old = [(a, b) for a, b in edge_rows if min(a, b) % split != 0]
    new = [(a, b) for a, b in edge_rows if min(a, b) % split == 0]
    if not old or not new:
        return  # degenerate split — nothing incremental to test
    old_df = spark.createDataFrame(old, "id_a long, id_b long")
    new_df = spark.createDataFrame(new, "id_a long, id_b long")
    settled = D.connected_components(old_df)
    got = {
        r.node: r.component
        for r in D.assign_components_incremental(new_df, settled).collect()
    }
    want = {
        r.node: r.component
        for r in D.connected_components(
            old_df.unionByName(new_df)
        ).collect()
    }
    assert got == want


@given(ns=st.lists(st.integers(min_value=1, max_value=10**13), min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_auto_num_planes_matches_duckdb_formula(ns):
    # vec_embedding_dedup_auto's oracle derives the plane count with
    # DuckDB's greatest(4, least(24, ceil(log2(n/8.0))::INT)); the Spark
    # side uses vector.auto_num_planes. Both must agree for EVERY corpus
    # size or the bucket assignment (hence the whole result) diverges —
    # including at exact powers of two where ceil(log2(...)) sits on an
    # FP edge.
    import duckdb

    from apache_flink_essentials_spark.operators.vector import auto_num_planes

    ns = ns + [8 * (1 << k) for k in range(0, 30, 3)]  # force exact-power edges
    got = duckdb.sql(
        "SELECT n, greatest(4, least(24, ceil(log2(n / 8.0))::INT)) AS np "
        "FROM (SELECT unnest([" + ",".join(map(str, ns)) + "]::BIGINT[]) AS n)"
    ).fetchall()
    for n, np_duck in got:
        assert auto_num_planes(n) == np_duck, (n, auto_num_planes(n), np_duck)
