"""Adversarial fixtures for the round-8/9 statistics operators — the
degenerate inputs a production corpus eventually serves up: a sketch
asked for more minima than the data has distinct values, a metronome
timeline (zero gap variance), an all-ties trend series, a series that
only ever goes up. Each test pins the DOCUMENTED degenerate behavior so
a refactor cannot silently turn it into a divide-by-zero or a NaN."""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators import sketches as SK
from apache_flink_essentials_spark.operators import timeseries as TS

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def _ts(s: int) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(seconds=s)


# ---- KMV with k > n: the estimator must degenerate to the exact count --


def test_kmv_k_exceeds_cardinality(spark):
    df = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "d", "e", "a", "b"]], "x string"
    )
    r = SK.kmv_distinct(df, "x", k=64).collect()[0]
    assert r.n_exact == 5
    assert r.k_used == 5  # only 5 hashes exist to keep
    assert r.kmv_estimate == 5.0  # the standard small-cardinality rule
    assert r.rel_error == 0.0


def test_kmv_single_value(spark):
    df = spark.createDataFrame([("only",)] * 10, "x string")
    r = SK.kmv_distinct(df, "x", k=8).collect()[0]
    assert (r.n_exact, r.k_used, r.kmv_estimate) == (1, 1, 1.0)


# ---- burstiness with constant gaps: a metronome is exactly B = -1 -----


def test_burstiness_metronome_is_minus_one(spark):
    rows = [(1, _ts(i * 60), "tick") for i in range(20)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    r = TS.interarrival_burstiness(df, "user_id", "ts", "event_type").collect()[0]
    assert r.n_gaps == 19
    assert r.mean_gap_s == 60.0
    assert r.burstiness == -1.0  # sigma = 0 -> (0 - mu)/(0 + mu)


def test_burstiness_simultaneous_events_is_null(spark):
    # all gaps zero: sigma = mu = 0 -> B undefined. Must be NULL (the
    # DuckDB 0/0 behavior), never an ANSI DIVIDE_BY_ZERO abort — one
    # degenerate timeline must not kill a corpus-wide audit.
    rows = [(1, _ts(0), "burst") for _ in range(5)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    r = TS.interarrival_burstiness(df, "user_id", "ts", "event_type").collect()[0]
    assert r.n_gaps == 4 and r.mean_gap_s == 0.0
    assert r.burstiness is None


# ---- Kendall with all ties: tau must be exactly 0, not undefined ------


def _flat_binned(spark, n_bins=6, value=10.0):
    rows = [(_ts(i * 3600), value) for i in range(n_bins)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    return TS.binned_sums(df, "ts", "value")


def test_kendall_all_ties(spark):
    r = TS.kendall_from_binned(_flat_binned(spark)).collect()[0]
    assert r.n_bins == 6
    assert r.n_pairs == 15
    assert (r.concordant, r.discordant) == (0, 0)
    assert r.ties == 15
    assert r.kendall_tau == 0.0


def test_theilsen_all_ties_zero_slope(spark):
    r = TS.theilsen_from_binned(_flat_binned(spark)).collect()[0]
    assert r.slope_micro_per_bin == 0.0


def test_permutation_entropy_constant_series(spark):
    # every triple is the single all-ties pattern -> entropy exactly 0
    r = TS.permutation_entropy_from_binned(_flat_binned(spark, n_bins=8)).collect()[0]
    assert r.n_patterns == 1
    assert r.perm_entropy == 0.0
    assert r.normalized_pe == 0.0


# ---- drawdown on monotone series --------------------------------------


def test_max_drawdown_monotone_increasing_is_zero(spark):
    rows = [(_ts(i * 86400), float(100 + 10 * i), "sales") for i in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp, value double, event_type string")
    r = TS.max_drawdown(df, "ts", "value", "event_type").collect()[0]
    assert r.n_bins == 10
    assert r.max_drawdown_cents == 0
    assert r.max_dd_frac == 0.0
    assert r.peak_cents == 19000  # 190.00 in cents


def test_max_drawdown_monotone_decreasing_is_full_drop(spark):
    rows = [(_ts(i * 86400), float(200 - 10 * i), "sales") for i in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp, value double, event_type string")
    r = TS.max_drawdown(df, "ts", "value", "event_type").collect()[0]
    assert r.peak_cents == 20000
    assert r.max_drawdown_cents == 9000  # 200.00 -> 110.00
    assert abs(r.max_dd_frac - 9000 / 20000) < 1e-12


# ---- negative bin sums through the half-up micro-mean (ADVICE item) ---


def test_micro_means_floor_on_negative_sums(spark):
    # half-up rounding must hold for negative bin means too: mean -1.005
    # rounds to -1.00 in micro units (half toward +inf), matching
    # DuckDB's floor-division form bit for bit.
    rows = [(_ts(0), -1.00), (_ts(1), -1.01)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    m = TS._micro_means(TS.binned_sums(df, "ts", "value")).collect()[0]
    # sum = -2.01, n = 2 -> mean = -1.005 -> half-up = -1.0050 -> -1005000
    # floor((2a + b)/(2b)) with a = -201*10^4... the contract value:
    assert m.m == -1_005_000


def test_cusum_negative_series_matches_floor_semantics(spark):
    # a strictly negative series exercises the negative-fold floor path
    # of cusum_micro (the old positivity-shift idiom's blind spot)
    rows = [(_ts(i * 3600), float(-100 - (i % 3))) for i in range(12)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = TS.cusum_changepoints(df, "ts", "value").collect()
    assert len(out) == 12
    # exact recomputation in Python integers (floor division semantics)
    import collections

    bins = collections.OrderedDict()
    for i in range(12):
        b = (i * 3600 + int(_EPOCH.timestamp())) // 3600
        bins.setdefault(b, []).append(-100 - (i % 3))
    ms = []
    for b, vs in sorted(bins.items()):
        sc = sum(int(round(v * 100)) for v in vs)
        n = len(vs)
        x = sc * 20000 + n
        ms.append(x // (2 * n))  # python // floors: the contract
    nb = len(ms)
    T = sum(ms)
    c = 0
    for i, (row, m) in enumerate(zip(out, ms)):
        assert row.bin_mean_micro == m
        c += m * nb - T
        assert row.cusum_micro == c // nb, (i, row.cusum_micro, c // nb)


# ---- ANSI divide-by-zero sweep: constant/empty/degenerate inputs -------
# Spark 4 ANSI mode ABORTS on x/0 even for doubles (unlike IEEE); DuckDB
# returns NULL. Every ratio below must yield NULL on its degenerate
# input, never an exception — one weird key/series/language somewhere in
# 100 TB must not kill a corpus-wide audit.


def test_zscore_constant_key_emits_nothing(spark):
    from apache_flink_essentials_spark.operators import profiling as P

    rows = [(i, 7, 5.0) for i in range(20)]  # sigma = 0 for the key
    df = spark.createDataFrame(rows, "event_id long, user_id int, value double")
    assert P.zscore_anomalies(df).count() == 0


def test_acf_constant_series_null(spark):
    rows = [(_ts(i * 3600), 5.0) for i in range(24)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = TS.acf(df, "ts", "value", lags=(1, 2, 3)).collect()
    assert len(out) == 3
    assert all(r.acf is None for r in out)


def test_seasonality_strength_constant_series_null(spark):
    rows = [(_ts(i * 3600), 5.0) for i in range(48)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    r = TS.seasonality_strength(df, "ts", "value", period=24).collect()[0]
    assert r.var_total == 0.0
    assert r.strength is None


def test_seasonal_naive_constant_series_mase_null(spark):
    rows = [(_ts(i * 3600), 5.0) for i in range(48)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    r = TS.seasonal_naive_eval(df, "ts", "value", season_lag=24).collect()[0]
    assert r.mae == 0.0
    assert r.mase is None


def test_zipf_single_term_and_uniform_counts(spark):
    from apache_flink_essentials_spark.operators import text as X

    one = spark.createDataFrame(
        [(1, "hello hello hello")], "doc_id long, text string"
    )
    r = X.zipf_fit(one).collect()[0]
    assert r.n_terms == 1 and r.slope is None  # x-variance 0

    uniform = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    r = X.zipf_fit(uniform).collect()[0]
    assert r.n_terms == 4
    assert r.r2 is None  # every count equal: y-variance 0


def test_tokenizer_fertility_empty_language_null(spark):
    from apache_flink_essentials_spark.operators import text as X

    rows = [(1, "", "xx"), (2, "   ", "xx"), (3, "real words here", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.lang: r for r in X.tokenizer_fertility(df).collect()}
    assert out["xx"].n_words == 0 and out["xx"].fertility is None
    assert out["en"].fertility is not None


def test_max_drawdown_all_zero_series_null_frac(spark):
    rows = [(_ts(i * 86400), 0.0, "zero") for i in range(5)]
    df = spark.createDataFrame(rows, "ts timestamp, value double, event_type string")
    r = TS.max_drawdown(df, "ts", "value", "event_type").collect()[0]
    assert r.peak_cents == 0 and r.max_drawdown_cents == 0
    assert r.max_dd_frac is None


def test_cosine_searches_survive_zero_vectors(spark):
    # a zero embedding (padding row / failed embedder call) must score
    # cosine 0 and sink in the ranking — safe-norm convention — never
    # raise ANSI DIVIDE_BY_ZERO through any cosine path
    from apache_flink_essentials_spark.operators import vector as V

    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # the zero vector
            (3, [0.0, 1.0, 0.0, 0.0]), (4, [0.5, 0.5, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id = 0")
    knn = V.knn_cosine_bruteforce(emb, q, k=4).collect()
    by_id = {r.neighbor_id: r.cosine for r in knn}
    assert by_id[2] == 0.0  # zero vector scored, not crashed
    assert by_id[1] > by_id[2]
    rec = V.hamming_recall(emb, q, k=3, dim=4, n_proj=8).collect()
    assert rec[0].n_exact == 3  # ran end to end
