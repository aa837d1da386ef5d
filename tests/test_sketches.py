"""Sketch operators: error bounds vs exact answers, and sketch mergeability
(the property that makes them cluster-scale: partials union without rescan)."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators import sketches as S


def test_approx_distinct_within_rsd(spark, events):
    exact = events.select("user_id").distinct().count()
    est = S.approx_distinct(events, "user_id", rsd=0.02).collect()[0][0]
    assert abs(est - exact) <= max(3, 0.1 * exact)


def test_hll_partials_merge_to_global_estimate(spark, events):
    # per-event_type sketches merged == direct global estimate
    partials = S.hll_sketch_partials(events, "user_id", keys=["event_type"])
    merged = S.hll_merge(partials, "hll_user_id").collect()[0].estimate
    direct = S.hll_sketch_partials(events, "user_id")
    direct_est = S.hll_merge(direct, "hll_user_id").collect()[0].estimate
    assert merged == direct_est  # sketch merge is lossless vs one-shot


def test_approx_quantiles_bounds(spark, events):
    qs = S.approx_quantiles(events, "value", (0.0, 0.5, 1.0)).collect()[0].quantiles
    lo, med, hi = qs
    stats = events.agg(
        F.min("value"), F.expr("percentile(value, 0.5)"), F.max("value")
    ).collect()[0]
    assert lo == stats[0] and hi == stats[2]
    assert abs(med - stats[1]) <= 0.05 * (stats[2] - stats[0])


def test_top_k_by_count_exact(spark, events):
    top = S.top_k_by_count(events, "event_type", k=2).collect()
    exact = sorted(
        ((r["count"], r["event_type"]) for r in events.groupBy("event_type").count().collect()),
        reverse=True,
    )
    assert [(r.cnt, r.item) for r in top] == [(c, t) for c, t in exact[:2]]
