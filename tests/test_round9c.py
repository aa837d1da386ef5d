"""Round-9 batch 7: Markov stationary distribution, discriminative
log-odds vocabulary, funnel latency quantiles, date-consistency audit,
permutation entropy, FS threshold sweep — planted inputs."""

import datetime
import math
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = datetime.datetime(2024, 1, 1)


def _ev(spark, rows):
    """rows: (user, minute_offset, type)"""
    data = [
        (i, u, BASE + datetime.timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_markov_stationary_alternating_chain(spark):
    from apache_flink_essentials_spark.operators.transform import (
        markov_stationary,
    )

    # A->B->A->B...: doubly-stochastic 2-state chain, stationary = 1/2
    # each; pi0 = 500000 each and every exact-integer step maps
    # (500000, 500000) to itself -> zero truncation drift
    rows = [(1, i, "A" if i % 2 == 0 else "B") for i in range(10)]
    out = {
        r.event_type: r
        for r in markov_stationary(
            _ev(spark, rows), "user_id", "ts", "event_type", iterations=6,
            order_cols=["event_id"],
        ).collect()
    }
    assert out["A"].pi_micro == 500000 and out["B"].pi_micro == 500000
    assert out["A"].pi == 0.5


def test_markov_stationary_absorbing_state(spark):
    from apache_flink_essentials_spark.operators.transform import (
        markov_stationary,
    )

    # A->B with B absorbing (dangling keeps its own mass): all of A's
    # mass lands in B after one step and stays
    rows = [(1, 0, "A"), (1, 1, "B"), (2, 0, "A"), (2, 1, "B")]
    out = {
        r.event_type: r
        for r in markov_stationary(
            _ev(spark, rows), "user_id", "ts", "event_type", iterations=4,
            order_cols=["event_id"],
        ).collect()
    }
    assert out["A"].pi_micro == 0 and out["B"].pi_micro == 1000000


def test_log_odds_discriminative_terms(spark):
    from apache_flink_essentials_spark.operators.text import log_odds_terms

    df = spark.createDataFrame(
        [("en", "apple apple apple"), ("de", "banane banane banane")],
        "lang string, text string",
    )
    out = {
        r.term: r
        for r in log_odds_terms(
            df, "en", "lang", top_n=5, min_count=1
        ).collect()
    }
    # ct=3, cr=0, nt=3, nr=3: score = ln(4/1) - ln(1/4) = 2 ln 4
    m = lambda x: math.floor(math.log(x) * 1e6 + 0.5)  # noqa: E731
    assert out["apple"].log_odds_micro == m(4.0) - m(1 / 4)
    assert out["banane"].log_odds_micro == m(1 / 4) - m(4.0)
    assert out["apple"].ct == 3 and out["apple"].cr == 0


def test_funnel_gap_quantiles_hand_gaps(spark):
    from apache_flink_essentials_spark.operators.patterns import (
        funnel_gap_quantiles,
    )

    # users 1..5 convert with gaps 10,20,30,40,50 minutes; user 6 never
    # converts; user 7 purchased BEFORE signup (excluded)
    rows = []
    for u, gap in [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]:
        rows += [(u, 0, "signup"), (u, gap, "purchase")]
    rows += [(6, 0, "signup"), (7, 5, "signup"), (7, 0, "purchase")]
    r = funnel_gap_quantiles(
        _ev(spark, rows), "user_id", "ts", "event_type",
        "signup", "purchase",
    ).collect()[0]
    assert r.n_converted == 5
    # ranks (k*(n+1)) div 4 for n=5: 1, 3, 4 -> gaps 10, 30, 40 minutes
    assert (r.min_s, r.p25_s, r.median_s, r.p75_s, r.max_s) == (
        600, 600, 1800, 2400, 3000
    )


def test_date_consistency_audit_planted(spark):
    from apache_flink_essentials_spark.operators.profiling import (
        date_consistency_audit,
    )

    d = lambda days: BASE + datetime.timedelta(days=days)  # noqa: E731
    rows = [
        ("ok", d(0), d(10)),     # fine
        ("ok", d(0), d(5)),      # fine
        ("bad", d(10), d(0)),    # violation: late < early
        ("bad", d(0), d(100)),   # late > 90d
    ]
    df = spark.createDataFrame(rows, "g string, e timestamp, l timestamp")
    out = {
        r.g: r for r in date_consistency_audit(df, "e", "l", "g").collect()
    }
    assert out["ok"].n_violations == 0 and out["ok"].n_late == 0
    assert out["bad"].n_violations == 1 and out["bad"].n_late == 1
    assert out["bad"].violation_rate == 0.5


def test_permutation_entropy_monotone_and_alternating(spark):
    from apache_flink_essentials_spark.operators.timeseries import (
        binned_sums,
        permutation_entropy_from_binned,
    )

    def series(vals):
        rows = [
            (BASE + datetime.timedelta(hours=i), float(v))
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        return permutation_entropy_from_binned(
            binned_sums(df, "ts", "value", 3600)
        ).collect()[0]

    mono = series(range(1, 13))
    assert mono.n_patterns == 1 and mono.perm_entropy == 0.0

    alt = series([1.0, 5.0] * 6)
    # triples alternate between patterns 021 and 102, equal counts
    assert alt.n_patterns == 2
    assert alt.perm_entropy == round(math.log(2.0), 6)
    assert alt.normalized_pe == round(math.log(2.0) / math.log(6.0), 6)


def test_threshold_sweep_hand_weights(spark):
    from apache_flink_essentials_spark.operators.joins import threshold_sweep

    df = spark.createDataFrame(
        [(-1_000_000,), (0,), (5_000_000,)], "weight_micro long"
    )
    out = {
        r.threshold_micro: r
        for r in threshold_sweep(
            df, "weight_micro", [0, 4_000_000]
        ).collect()
    }
    assert out[0].n_above == 2 and out[0].n_pairs == 3
    assert out[4_000_000].n_above == 1
    assert out[0].frac_above == 2 / 3
