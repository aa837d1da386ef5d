"""Round-12 additions: Theil-Sen distributed-rank path equivalence and
the tightened global-window walker interplay (fanout-above-aggregate is
covered in test_plans.py::test_walker_catches_pair_fanout_above_aggregate).
"""

import datetime

import pyspark.sql.functions as F  # noqa: F401  (parity with sibling files)


def _mk_events(spark, vals):
    t0 = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (t0 + datetime.timedelta(hours=i), float(v))
            for i, v in enumerate(vals)
        ],
        "ts timestamp, value double",
    )


def test_theilsen_two_path_equivalence(spark, monkeypatch):
    # the distributed (two-phase global_row_number) rank path must return
    # BIT-identical results to the single-task window path — same total
    # order, same middle-rank pick. Lower the gate so 36 bins (630
    # pairs) takes the distributed branch instead of generating 2M+.
    from apache_flink_essentials_spark.operators import timeseries as TS

    vals = [3.0 * i + 7.0 + (50.0 if i == 11 else 0.0) for i in range(36)]
    df = _mk_events(spark, vals)
    small = TS.theilsen_trend(df, "ts", "value").collect()
    monkeypatch.setattr(TS, "_THEILSEN_SMALL_PAIRS", 10)
    big = TS.theilsen_trend(df, "ts", "value").collect()
    assert [r.asDict() for r in small] == [r.asDict() for r in big]
    assert small[0]["n_bins"] == 36
    assert small[0]["n_pairs"] == 36 * 35 // 2
    # outlier-resistant: the single spiked bin must not drag the median
    assert abs(small[0]["slope_micro_per_bin"] - 3_000_000.0) < 1e-6


def test_theilsen_single_bin_yields_empty(spark):
    # n_pairs == 0 → zero rows, matching the oracle's grouped form
    from apache_flink_essentials_spark.operators import timeseries as TS

    df = _mk_events(spark, [5.0])
    assert TS.theilsen_trend(df, "ts", "value").count() == 0


def test_theilsen_two_bins_single_pair(spark):
    from apache_flink_essentials_spark.operators import timeseries as TS

    df = _mk_events(spark, [1.0, 4.0])
    r = TS.theilsen_trend(df, "ts", "value").collect()
    assert len(r) == 1
    assert r[0]["n_pairs"] == 1
    assert abs(r[0]["slope_micro_per_bin"] - 3_000_000.0) < 1e-6
