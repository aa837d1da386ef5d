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


def test_portable_hll_within_error_bound(spark, events):
    exact = events.select("user_id").distinct().count()
    est = S.portable_hll_distinct(events, "user_id").collect()[0]["hll_distinct"]
    # m=256 registers -> rsd ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(est - exact) <= max(5, 0.26 * exact)


def test_portable_hll_is_multiplicity_insensitive(spark, events):
    # HLL depends only on the SET of values: doubling every row must not
    # move the estimate at all (the property exact counting lacks and the
    # reason sketch rollups never need pre-dedup)
    one = S.portable_hll_distinct(events, "user_id").collect()[0]
    two = S.portable_hll_distinct(
        events.union(events), "user_id"
    ).collect()[0]
    assert one["hll_distinct"] == two["hll_distinct"]
    assert one["register_sum"] == two["register_sum"]


def test_portable_hll_grouped_keys(spark, events):
    rows = S.portable_hll_distinct(
        events, "user_id", keys=("event_type",)
    ).collect()
    exact = {
        r.event_type: r.cnt
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("cnt"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        e = exact[r.event_type]
        assert abs(r["hll_distinct"] - e) <= max(5, 0.26 * e)


def test_countmin_never_underestimates(spark, events):
    rows = S.countmin_topk(events, "user_id", k=100000).collect()
    assert rows, "expected at least one item"
    assert all(r.est_count >= r.true_count for r in rows)
    # true counts are the real per-item counts
    exact = {
        r.user_id: r["count"]
        for r in events.groupBy("user_id").count().collect()
    }
    assert all(r.true_count == exact[r.item] for r in rows)


def test_countmin_exact_when_width_dominates(spark, events):
    # width >> distinct items -> collisions vanish and the sketch estimate
    # collapses to the exact count (the width/accuracy dial)
    rows = S.countmin_topk(events, "user_id", k=5, width=1 << 20).collect()
    assert all(r.est_count == r.true_count for r in rows)
    top = S.top_k_by_count(events, "user_id", k=5).collect()
    assert [(r.item, r.true_count) for r in rows] == [
        (r.item, r.cnt) for r in top
    ]


def test_portable_hll_daily_partials_merge_equals_one_shot(spark):
    # merge(per-day partials) == one-shot sketch EXACTLY: the registers
    # are integer maxima, so splitting the pass by day cannot change them
    from apache_flink_essentials_spark import load_table
    from apache_flink_essentials_spark.operators.sketches import (
        portable_hll_distinct,
        portable_hll_merge,
        portable_hll_partials,
    )
    from pyspark.sql import functions as F

    events = load_table(spark, "events", "/root/testdata/sf0.001").withColumn(
        "day", F.to_date("ts"))
    daily = portable_hll_partials(events, "user_id", keys=["day"])
    merged = portable_hll_merge(daily.drop("day")).collect()[0]
    one = portable_hll_distinct(events, "user_id").collect()[0]
    assert (merged.register_sum, merged.v_empty, merged.hll_distinct) == \
        (one.register_sum, one.v_empty, one.hll_distinct)


# ---- portable quantile histogram ----


def test_quantile_bands_within_one_bucket_width(spark, events):
    """The histogram estimate is within one bucket width of the exact
    quantile (the documented error bound)."""
    nb = 64
    bands = {
        r.q: r.est
        for r in S.portable_quantile_bands(
            events, "value", n_buckets=nb, quantiles=(0.5, 0.9, 0.99)
        ).collect()
    }
    stats = events.agg(
        F.min("value"),
        F.max("value"),
        F.expr("percentile(value, 0.5)"),
        F.expr("percentile(value, 0.9)"),
        F.expr("percentile(value, 0.99)"),
    ).collect()[0]
    width = (stats[1] - stats[0]) / nb
    for q, exact in zip((0.5, 0.9, 0.99), stats[2:]):
        assert abs(bands[q] - exact) <= width + 1e-9, (q, bands[q], exact)


def test_quantile_histogram_partials_merge_equals_one_shot(spark, events):
    """Counts are additive: per-event_type histogram partials unioned and
    re-merged resolve to the SAME quantile rows as the one-shot sketch —
    the lakehouse-interchange property (write per-day partials, merge any
    range later without rescanning)."""
    stats = events.agg(
        F.min("value").alias("_vmin"),
        F.max("value").alias("_vmax"),
        F.count(F.lit(1)).alias("_n"),
    )
    row = stats.collect()[0]
    one_shot = S.quantile_histogram_partials(
        events, "value", row._vmin, row._vmax, n_buckets=64
    )
    # "daily" shards: split by event_type, sketch each shard independently
    types = [r[0] for r in events.select("event_type").distinct().collect()]
    shards = [
        S.quantile_histogram_partials(
            events.filter(F.col("event_type") == t),
            "value",
            row._vmin,
            row._vmax,
            n_buckets=64,
        )
        for t in types
    ]
    unioned = shards[0]
    for s in shards[1:]:
        unioned = unioned.unionByName(s)
    a = S.quantiles_from_histogram(one_shot, stats, 64).collect()
    b = S.quantiles_from_histogram(unioned, stats, 64).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_quantile_bands_exact_on_uniform_ramp(spark):
    """On 0..999 with 1000 buckets every bucket holds exactly one value, so
    the interpolated estimate IS the exact lower quantile."""
    df = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    bands = {
        r.q: r.est
        for r in S.portable_quantile_bands(
            df, "v", n_buckets=999, quantiles=(0.5, 0.9)
        ).collect()
    }
    # rank r resolves to the RIGHT edge of its bucket (frac = 1 when the
    # bucket holds exactly the ranked value): est = bucket + rank-in-bucket,
    # one width above the true lower quantile — the documented bound, met
    # with equality on a ramp
    assert bands[0.5] == 500.0
    assert bands[0.9] == 900.0


def test_grouped_quantile_bands_per_group_bound(spark, events):
    # the documented bound is vs the DISCRETE (rank-based) quantile: the
    # value at rank ceil(q*n) lies in the chosen bucket, so the estimate
    # is within one bucket width of it. (The interpolated percentile can
    # sit an order-statistic gap away on sparse tails — not the target.)
    import math

    nb = 64
    out = S.grouped_quantile_bands(
        events, "value", ["event_type"], n_buckets=nb
    ).collect()
    by_type = {}
    for r in events.select("event_type", "value").collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    assert len(out) > 0
    for r in out:
        vals = sorted(by_type[r.event_type])
        width = (vals[-1] - vals[0]) / nb
        disc = vals[math.ceil(r.q * len(vals)) - 1]
        assert abs(r.est - disc) <= width + 1e-9, (r.event_type, r.q, r.est, disc)


def test_hll_set_ops_union_is_lossless_merge(spark, events):
    # union estimate == one-shot sketch of the union rows (register max
    # merge is exact sketch algebra), and estimates track exact counts
    A = F.col("event_type").isin("view", "click")
    B = F.col("event_type").isin("click", "purchase")
    out = {r.set_op: r.estimate for r in S.hll_set_ops(events, "user_id", A, B).collect()}
    one_shot_union = S.portable_hll_distinct(
        events.where(A | B), "user_id"
    ).collect()[0]["hll_distinct"]
    assert out["union"] == one_shot_union
    exact_l = events.where(A).select("user_id").distinct().count()
    exact_i = (
        events.where(A).select("user_id").intersect(
            events.where(B).select("user_id")).count()
    )
    assert abs(out["left"] - exact_l) <= max(5, 0.26 * exact_l)
    # intersection is an estimate-of-estimates: allow the compounded bound
    assert abs(out["intersection"] - exact_i) <= max(10, 0.5 * exact_i)


def test_hll_set_ops_disjoint_intersection_near_zero(spark):
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 2 == 0).alias("even")
    )
    out = {
        r.set_op: r.estimate
        for r in S.hll_set_ops(
            df, "id", F.col("even"), ~F.col("even")
        ).collect()
    }
    # 1000 distinct each side, disjoint: the inclusion-exclusion error
    # scales with the UNION (rsd 6.5% at m=256, three compounding
    # estimates: ~sqrt(3)*0.065*2000 at 1 sigma) — assert 3 sigma of that
    assert abs(out["intersection"]) <= 3 * 0.065 * 2000 * 1.8
    assert abs(out["left"] - 1000) <= 260


# ---- KMV Jaccard -----------------------------------------------------------


def test_kmv_jaccard_small_sets_exact(spark):
    from apache_flink_essentials_spark.operators import sketches as SK

    # |A|=6, |B|=6, |A∩B|=3 -> J = 3/9; k=64 > all set sizes, so the
    # union sketch sees everything and the estimate must be EXACT
    a = spark.createDataFrame([(v,) for v in "abcdef"], "x string")
    b = spark.createDataFrame([(v,) for v in "defghi"], "x string")
    r = SK.kmv_jaccard(a, b, "x", k=64).collect()[0]
    assert (r.n_exact_a, r.n_exact_b, r.n_exact_inter) == (6, 6, 3)
    assert abs(r.jaccard_exact - 3 / 9) < 1e-15
    assert r.jaccard_kmv == r.jaccard_exact
    assert r.abs_error == 0.0
    assert r.k_used == 9  # |A ∪ B| distinct hashes


def test_kmv_jaccard_disjoint_and_identical(spark):
    from apache_flink_essentials_spark.operators import sketches as SK

    a = spark.createDataFrame([(v,) for v in "abc"], "x string")
    b = spark.createDataFrame([(v,) for v in "xyz"], "x string")
    r = SK.kmv_jaccard(a, b, "x", k=16).collect()[0]
    assert r.jaccard_kmv == 0.0 and r.jaccard_exact == 0.0

    r2 = SK.kmv_jaccard(a, a, "x", k=16).collect()[0]
    assert r2.jaccard_kmv == 1.0 and r2.jaccard_exact == 1.0


def test_kmv_jaccard_estimates_within_sketch_error(spark):
    from apache_flink_essentials_spark.operators import sketches as SK

    # 300 overlap out of 700-union -> J = 3/7; k=128 sketch error
    # ~1/sqrt(k) ≈ 0.09 — assert a generous band, exactness is pinned
    # by the oracle row
    a = spark.createDataFrame([(f"v{i}",) for i in range(500)], "x string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(200, 700)], "x string")
    r = SK.kmv_jaccard(a, b, "x", k=128).collect()[0]
    assert r.k_used == 128
    assert abs(r.jaccard_kmv - 3 / 7) < 0.15
