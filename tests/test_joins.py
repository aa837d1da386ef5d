"""§2.3 joins: interval-join bound semantics, window join co-bucketing,
as-of selection, connect running ratio — against the deterministic shopping
generators (the reference's own input model, Shopping.scala)."""

import datetime

from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators import joins as J
from apache_flink_essentials_spark.plans import uses_broadcast_join
from apache_flink_essentials_spark.sources import (
    catalog_events_batch,
    shopping_cart_events_batch,
)

BASE = datetime.datetime(2024, 1, 1)


def _ts(spark, rows, schema="user_id string, ts timestamp"):
    return spark.createDataFrame(rows, schema)


def sec(s):
    return BASE + datetime.timedelta(seconds=s)


def test_union_preserves_all_rows(spark):
    carts = shopping_cart_events_batch(spark, 20, source_id="kafka")
    files = shopping_cart_events_batch(spark, 10, source_id="files")
    u = J.union_streams(carts, files)
    assert u.count() == 30
    assert u.select("source_id").distinct().count() == 2


def test_window_join_same_bucket_only(spark):
    left = _ts(spark, [("u1", sec(1)), ("u1", sec(7))])
    right = _ts(spark, [("u1", sec(3)), ("u1", sec(11))])
    out = J.window_join(left, right, "user_id", "ts", "ts", "5 seconds")
    # windows [0,5) and [5,10): (1,3) co-bucketed; 7 pairs with nothing
    assert [(r.l_ts.second, r.r_ts.second) for r in out.collect()] == [(1, 3)]


def test_interval_join_exclusive_bounds(spark):
    # between(-2s, +2s) EXCLUSIVE: |tL - tR| = 2 must NOT match
    left = _ts(spark, [("u1", sec(10))])
    right = _ts(
        spark, [("u1", sec(8)), ("u1", sec(12)), ("u1", sec(9)), ("u1", sec(11))]
    )
    out = J.interval_join(
        left, right, "user_id", "ts", "ts", "-2 seconds", "2 seconds"
    )
    assert sorted(r.r_ts.second for r in out.collect()) == [9, 11]


def test_interval_join_inclusive_bounds(spark):
    left = _ts(spark, [("u1", sec(10))])
    right = _ts(spark, [("u1", sec(8)), ("u1", sec(12))])
    out = J.interval_join(
        left,
        right,
        "user_id",
        "ts",
        "ts",
        "-2 seconds",
        "2 seconds",
        lower_exclusive=False,
        upper_exclusive=False,
    )
    assert sorted(r.r_ts.second for r in out.collect()) == [8, 12]


def test_interval_join_is_keyed(spark):
    left = _ts(spark, [("u1", sec(10))])
    right = _ts(spark, [("u2", sec(10))])
    out = J.interval_join(
        left, right, "user_id", "ts", "ts", "-2 seconds", "2 seconds"
    )
    assert out.count() == 0


def test_asof_picks_latest_at_or_before(spark):
    left = _ts(spark, [("u1", sec(10))])
    right = _ts(spark, [("u1", sec(4)), ("u1", sec(9)), ("u1", sec(11))])
    out = J.as_of_join(left, right, "user_id", "ts", "ts")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].r_ts.second == 9


def test_asof_tolerance_yields_null(spark):
    left = _ts(spark, [("u1", sec(100))])
    right = _ts(spark, [("u1", sec(4))])
    out = J.as_of_join(left, right, "user_id", "ts", "ts", tolerance="10 seconds")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].r_ts is None


def test_connect_ratio_running_counts(spark):
    carts = shopping_cart_events_batch(spark, 6)       # times 0..5s
    catalog = catalog_events_batch(spark, 3)           # times 0..2s
    out = J.connect_ratio(carts, catalog, "time", "time").orderBy("ts", "side")
    last = out.collect()[-1]
    assert (last.left_count, last.right_count) == (6, 3)
    assert abs(last.ratio - 2.0) < 1e-9


def test_windowed_equi_join_uses_hash_join_with_broadcastable_side(spark):
    # small dimension side should broadcast (scale assertion)
    left = shopping_cart_events_batch(spark, 1000)
    right = F.broadcast(catalog_events_batch(spark, 10))
    out = J.window_join(left, right, "user_id", "time", "time", "5 seconds")
    assert uses_broadcast_join(out)


def test_bucketed_interval_join_matches_plain(spark):
    carts = shopping_cart_events_batch(spark, 200)
    catalog = catalog_events_batch(spark, 150)
    plain = J.interval_join(
        carts, catalog, "user_id", "time", "time", "-3 seconds", "3 seconds"
    )
    bucketed = J.interval_join_bucketed(
        carts, catalog, "user_id", "time", "time", -3, 3
    )
    a = sorted((r.l_time, r.r_time, r.l_user_id) for r in plain.collect())
    b = sorted((r.l_time, r.r_time, r.l_user_id) for r in bucketed.collect())
    assert a == b and len(a) > 0


def test_bucketed_interval_join_exclusive_bounds(spark):
    left = _ts(spark, [("u1", sec(10))])
    right = _ts(
        spark, [("u1", sec(8)), ("u1", sec(12)), ("u1", sec(9)), ("u1", sec(11))]
    )
    out = J.interval_join_bucketed(left, right, "user_id", "ts", "ts", -2, 2)
    assert sorted(r.r_ts.second for r in out.collect()) == [9, 11]


def test_fuzzy_join_blocked_matching(spark):
    from apache_flink_essentials_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "zenith ltd")], "id long, name string")
    right = spark.createDataFrame(
        [(10, "acme corp"),    # exact
         (11, "acmec orp"),   # distance 2 → excluded at max_distance=1
         (12, "acme cort"),   # distance 1
         (13, "zzzz corp")],  # different block → never compared
        "id long, name string")
    out = fuzzy_join(left, right, "name", "name", max_distance=1, block_chars=4)
    pairs = {(r.l_id, r.r_id, r.distance) for r in out.collect()}
    assert pairs == {(1, 10, 0), (1, 12, 1)}


def test_fuzzy_join_case_insensitive_distance(spark):
    from apache_flink_essentials_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame([(1, "ACme Corp")], "id long, name string")
    right = spark.createDataFrame([(10, "acme corp")], "id long, name string")
    out = fuzzy_join(left, right, "name", "name", max_distance=1, block_chars=4)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].distance == 0  # case variants match


def test_fuzzy_join_methods_agree_with_duplicates(spark):
    # neighborhood (value-level candidates + join-back) must reproduce the
    # blocked method's output EXACTLY, including duplicate-row multiplicity
    from apache_flink_essentials_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corp"), (3, "acme cort"), (4, "beta inc")],
        "id long, name string")
    right = spark.createDataFrame(
        [(10, "acme corp"), (11, "acme cor"), (12, "beta inc"), (13, "acmex")],
        "id long, name string")
    cols = ["l_id", "l_name", "r_id", "r_name", "distance"]

    def rows(method):
        out = fuzzy_join(left, right, "name", "name",
                         max_distance=1, block_chars=4, method=method)
        return sorted(tuple(r[c] for c in cols) for r in out.collect())

    blocked, neigh = rows("block"), rows("neighborhood")
    assert blocked == neigh
    # duplicate left values (ids 1,2) each produce their own exact match
    # against r_id=10, plus beta inc ↔ beta inc: multiplicity preserved
    assert sum(1 for t in neigh if t[4] == 0) == 3
    assert {(t[0], t[2]) for t in neigh if t[4] == 0} == {(1, 10), (2, 10), (4, 12)}


def test_fuzzy_join_max_block_size_caps_hot_prefix(spark):
    # planted hot prefix: 60x60 same-block rows would produce 3600 distance
    # evaluations; the cap drops the block entirely (documented recall
    # trade-off), while healthy blocks still match
    from apache_flink_essentials_spark.operators.joins import fuzzy_join

    hot = [(i, f"hotprefix {i:04d}") for i in range(60)]
    left = spark.createDataFrame(hot + [(100, "cool name")], "id long, name string")
    right = spark.createDataFrame(hot + [(200, "cool namex")], "id long, name string")
    out = fuzzy_join(left, right, "name", "name", max_distance=1,
                     block_chars=4, method="block", max_block_size=50)
    pairs = {(r.l_id, r.r_id) for r in out.collect()}
    assert pairs == {(100, 200)}  # hot block gone, healthy block intact


def test_fuzzy_join_length_bucket_exact(spark):
    # compound (prefix, length-bucket) key must not lose any pair: matches
    # within distance 1 straddle at most adjacent buckets, which the left
    # side probes explicitly
    from apache_flink_essentials_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [(1, "abcd" + "x" * 7), (2, "abcd" + "y" * 12)], "id long, name string")
    right = spark.createDataFrame(
        # distance-1 neighbors with lengths n-1 / n / n+1 of left id=1
        [(10, "abcd" + "x" * 6), (11, "abcd" + "x" * 7), (12, "abcd" + "x" * 8)],
        "id long, name string")
    base = fuzzy_join(left, right, "name", "name", max_distance=1,
                      block_chars=4, method="block")
    bucketed = fuzzy_join(left, right, "name", "name", max_distance=1,
                          block_chars=4, method="block", length_bucket=4)
    key = lambda out: sorted((r.l_id, r.r_id, r.distance) for r in out.collect())
    assert key(base) == key(bucketed)
    assert key(bucketed) == [(1, 10, 1), (1, 11, 0), (1, 12, 1)]


def test_bloom_semi_filter_no_false_negatives(spark):
    from apache_flink_essentials_spark import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, "lineitem", sf)
    keys = (
        load_table(spark, "orders", sf)
        .filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey")
    )
    filt = J.bloom_semi_filter(
        li, keys, "o_orderkey", "l_orderkey", m_bits=1 << 12, k_hashes=3
    )
    exact = li.join(
        keys, li.l_orderkey == keys.o_orderkey, "left_semi"
    )
    # every true match survives the bloom (no false negatives) ...
    assert exact.exceptAll(filt.select(*exact.columns)).count() == 0
    # ... and the pass set is a superset bounded by the whole input
    n_bloom, n_exact = filt.count(), exact.count()
    assert n_exact <= n_bloom <= li.count()


def test_bloom_semi_filter_collapses_to_semi_join_when_wide(spark):
    from apache_flink_essentials_spark import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, "lineitem", sf)
    keys = (
        load_table(spark, "orders", sf)
        .filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey")
    )
    wide = J.bloom_semi_filter(
        li, keys, "o_orderkey", "l_orderkey", m_bits=1 << 22, k_hashes=3
    )
    exact = li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi")
    assert wide.count() == exact.count()


def test_bloom_semi_filter_probe_is_scan_stage_only(spark):
    # the probe side must be a pure projection+filter: no join, no
    # exchange on the big side — the whole point of the operator
    from apache_flink_essentials_spark import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, "lineitem", sf)
    keys = load_table(spark, "orders", sf).select("o_orderkey").limit(100)
    filt = J.bloom_semi_filter(
        li, keys, "o_orderkey", "l_orderkey", m_bits=1 << 12
    )
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_bloom_anti_join_keeps_null_key_rows(spark):
    # a true LEFT ANTI JOIN keeps NULL-key probe rows (NULL never equals
    # any key); the bloom probe on a NULL value yields a NULL predicate,
    # which must be routed to the definite-out branch, not dropped by
    # both filters — pins the coalesce(false) routing in bloom_anti_join
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (None, "d"), (3, "e")],
        "k long, v string",
    )
    keys = spark.createDataFrame([(1,), (3,)], "k long")
    out = J.bloom_anti_join(df, keys, "k", m_bits=1 << 8, k_hashes=2)
    exact = df.join(keys.withColumnRenamed("k", "kk"),
                    df.k == F.col("kk"), "left_anti")
    nk = lambda t: (t[0] is None, t[0] or 0, t[1])
    got = sorted(((r.k, r.v) for r in out.collect()), key=nk)
    want = sorted(((r.k, r.v) for r in exact.select("k", "v").collect()),
                  key=nk)
    assert got == want
    assert (None, "c") in got and (None, "d") in got


def test_fs_match_weights_planted(spark):
    import math

    from pyspark.sql import functions as F

    from apache_flink_essentials_spark.operators.joins import fs_match_weights

    records = spark.createDataFrame(
        [
            (1, "acme corp", 7, "AUTO"),
            (2, "acme corp", 7, "AUTO"),    # exact duplicate of 1
            (3, "acme corpx", 9, "BLDG"),   # name within lev 1, rest differs
        ],
        "id long, name string, nation int, seg string",
    )
    cand = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    fields = {
        "name": (
            F.levenshtein(F.lower("_a_name"), F.lower("_b_name")) <= 1,
            0.9,
            0.01,
        ),
        "nation": (F.col("_a_nation") == F.col("_b_nation"), 0.95, 0.04),
        "seg": (F.col("_a_seg") == F.col("_b_seg"), 0.9, 0.2),
    }
    out = {
        (r.id_a, r.id_b): r
        for r in fs_match_weights(
            records, cand, "id", fields, 8_000_000, 0
        ).collect()
    }
    w = lambda m, u: round(math.log2(m / u) * 1e6)  # noqa: E731
    full = w(0.9, 0.01) + w(0.95, 0.04) + w(0.9, 0.2)
    assert out[(1, 2)].weight_micro == full
    assert out[(1, 2)].label == "match"
    partial = (
        w(0.9, 0.01)
        + round(math.log2(0.05 / 0.96) * 1e6)
        + round(math.log2(0.1 / 0.8) * 1e6)
    )
    assert out[(1, 3)].weight_micro == partial
    assert out[(1, 3)].agree_name == 1 and out[(1, 3)].agree_nation == 0
    assert out[(1, 3)].label in ("possible", "nonmatch")
