"""§2.4 window semantics edge cases."""

import datetime

from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators import windows as W


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id int, ts timestamp")


BASE = datetime.datetime(2024, 1, 1)


def sec(s, us=0):
    return BASE + datetime.timedelta(seconds=s, microseconds=us)


def test_tumbling_boundary_goes_to_next_window(spark):
    # [start, end): an event exactly at a boundary belongs to the NEXT window
    df = _df(spark, [(1, sec(0)), (1, sec(10)), (1, sec(19, 999999)), (1, sec(20))])
    out = W.tumbling(df, "ts", "10 seconds", [F.count("*").alias("n")])
    got = sorted((r.window_start % 100, r.n) for r in out.collect())
    assert got == [(0, 1), (10, 2), (20, 1)]


def test_session_exact_gap_merges(spark):
    # Spark merges sessions when the gap is EXACTLY the threshold (touching
    # intervals); the oracle SQL uses the same > rule — pin it here
    df = _df(spark, [(1, sec(0)), (1, sec(10)), (2, sec(0)), (2, sec(10, 1))])
    out = W.session(df, "ts", "10 seconds", [F.count("*").alias("n")], keys=["user_id"])
    got = {r.user_id: [] for r in out.collect()}
    for r in out.collect():
        got[r.user_id].append(r.n)
    assert sorted(got[1]) == [2]       # exactly 10s apart → merged
    assert sorted(got[2]) == [1, 1]    # 10s + 1µs → separate sessions


def test_sliding_replication_count(spark):
    # size 10 / slide 5 ⇒ every event appears in exactly 2 windows
    df = _df(spark, [(1, sec(3)), (1, sec(7)), (1, sec(12))])
    out = W.sliding(df, "ts", "10 seconds", "5 seconds", [F.count("*").alias("n")])
    assert sum(r.n for r in out.collect()) == 6


def test_session_window_end_is_last_plus_gap(spark):
    df = _df(spark, [(1, sec(0)), (1, sec(4))])
    out = W.session(df, "ts", "10 seconds", [F.count("*").alias("n")])
    r = out.collect()[0]
    assert r.window_end - r.window_start == 14


def test_count_window_by_id_matches_row_number_form(spark, events):
    aggs = lambda: [F.count("*").alias("n")]  # noqa: E731
    a = W.count_window(events, 10, order_by=["event_id"], aggs=aggs())
    b = W.count_window_by_id(events, 10, id_col="event_id", aggs=aggs())
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sliding_paned_matches_sliding(spark, events):
    from pyspark.sql import functions as F2

    a = W.sliding(
        events,
        "ts",
        "1 hour",
        "30 minutes",
        [
            F2.count("*").alias("n_events"),
            F2.sum("value").alias("sum_value"),
            F2.min("value").alias("min_value"),
            F2.max("value").alias("max_value"),
        ],
        keys=["event_type"],
    )
    b = W.sliding_paned(
        events,
        "ts",
        3600,
        1800,
        {
            "n_events": ("count", None),
            "sum_value": ("sum", F2.col("value")),
            "min_value": ("min", F2.col("value")),
            "max_value": ("max", F2.col("value")),
        },
        keys=["event_type"],
    )
    ra = sorted(
        (r.window_start, r.event_type, r.n_events, round(r.sum_value, 4), r.min_value, r.max_value)
        for r in a.collect()
    )
    rb = sorted(
        (r.window_start, r.event_type, r.n_events, round(r.sum_value, 4), r.min_value, r.max_value)
        for r in b.collect()
    )
    assert ra == rb


def test_count_window_keyed(spark, events):
    # keyed count windows: per-key ranks partition independently (the
    # scalable form — Flink's keyed GlobalWindows)
    out = W.count_window(
        events,
        5,
        order_by=["ts", "event_id"],
        aggs=[F.count("*").alias("n")],
        keys=["user_id"],
    )
    rows = out.collect()
    per_user = events.groupBy("user_id").count().collect()
    expected = {r.user_id: (r["count"] + 4) // 5 for r in per_user}
    got = {}
    for r in rows:
        got[r.user_id] = got.get(r.user_id, 0) + 1
    assert got == expected
    # all but the final window per key hold exactly 5 elements
    for r in rows:
        assert r.n == 5 or r.window_id == max(x.window_id for x in rows if x.user_id == r.user_id)


def test_processing_time_attribute(spark, events):
    out = W.with_processing_time(events.limit(10), "proc_time")
    rows = out.select("proc_time").collect()
    assert all(r.proc_time is not None for r in rows)


def test_session_paths_hand_computed(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return base + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1, session 1: a>b ; session 2 (gap 40m): a>b
        (1, 1, ts(0), "a"), (1, 2, ts(1), "b"),
        (1, 3, ts(41), "a"), (1, 4, ts(42), "b"),
        # user 2, one session: a>b
        (2, 5, ts(0), "a"), (2, 6, ts(2), "b"),
        # user 3, one session: c alone
        (3, 7, ts(0), "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = W.session_paths(df, "user_id", "ts", "event_type", gap="30 minutes")
    got = [(r.path, r.n_sessions) for r in out.collect()]
    assert got == [("a>b", 3), ("c", 1)]  # ordered by (count desc, path asc)


def test_session_paths_orders_within_second_by_event_id(spark):
    t = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, 2, t, "y"), (1, 1, t, "x")]  # same second, ids 1,2
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = W.session_paths(df, "user_id", "ts", "event_type").collect()
    assert [(r.path, r.n_sessions) for r in out] == [("x>y", 1)]


def test_session_capped_gap_and_duration_and_count(spark):
    from apache_flink_essentials_spark.operators.windows import session_capped

    rows = [
        # key 1: events at t=0,10,20 (one gap-session), gap=60
        (1, 1, 0), (2, 1, 10), (3, 1, 20),
        # then a gap > 60 → new session at t=200,210
        (4, 1, 200), (5, 1, 210),
    ]
    df = spark.createDataFrame(rows, "event_id long, k long, ts long")
    out = session_capped(
        df.withColumn("ts", F.col("ts").cast("timestamp")),
        "k", "ts", 60, "event_id",
    ).collect()
    got = {(r.session_start, r.session_end, r.n_events) for r in out}
    assert got == {(0, 20, 3), (200, 210, 2)}

    # duration cap 15s splits the first session at offset >= 15
    out2 = session_capped(
        df.withColumn("ts", F.col("ts").cast("timestamp")),
        "k", "ts", 60, "event_id", max_duration_seconds=15,
    ).collect()
    got2 = {(r.session_start, r.session_end, r.n_events) for r in out2}
    assert got2 == {(0, 10, 2), (20, 20, 1), (200, 210, 2)}

    # event cap 2 splits the first session after 2 events
    out3 = session_capped(
        df.withColumn("ts", F.col("ts").cast("timestamp")),
        "k", "ts", 60, "event_id", max_events=2,
    ).collect()
    got3 = {(r.session_start, r.session_end, r.n_events) for r in out3}
    assert got3 == {(0, 10, 2), (20, 20, 1), (200, 210, 2)}


def test_session_capped_pair_refinement(spark):
    from apache_flink_essentials_spark.operators.windows import session_capped

    # one gap-session of 6 events at t=0..50 step 10; duration cap 25 →
    # dur-subs [0,0,0][30,40][50]; count cap 4 → count-subs [0..3][4,5].
    # pair refinement must split at BOTH boundaries: {0,10,20},{30},{40},{50}
    rows = [(i, 1, i * 10) for i in range(6)]
    df = spark.createDataFrame(rows, "event_id long, k long, ts long")
    out = session_capped(
        df.withColumn("ts", F.col("ts").cast("timestamp")),
        "k", "ts", 100, "event_id",
        max_duration_seconds=25, max_events=4,
    ).collect()
    got = {(r.session_start, r.session_end, r.n_events) for r in out}
    assert got == {(0, 20, 3), (30, 30, 1), (40, 40, 1), (50, 50, 1)}


def test_sliding_count_distinct_hll_error_bound(spark):
    # HLL pane path vs exact path over the sf0.01 events fixture: every
    # window's estimate within 5% (default lgConfigK=12 is ~1.6% rel. err)
    from apache_flink_essentials_spark.io import load_table
    from apache_flink_essentials_spark.operators import windows as W

    events = load_table(spark, "events", "/root/testdata/sf0.01")
    exact = {
        r.window_start: r.n
        for r in W.sliding_count_distinct(
            events, "ts", "user_id", 604800, 86400, exact=True, alias="n"
        ).collect()
    }
    approx = {
        r.window_start: r.n
        for r in W.sliding_count_distinct(
            events, "ts", "user_id", 604800, 86400, exact=False, alias="n"
        ).collect()
    }
    assert set(exact) == set(approx)
    for ws, n in exact.items():
        assert abs(approx[ws] - n) <= max(2, 0.05 * n), (ws, n, approx[ws])


def test_sliding_count_distinct_hll_plan_shape(spark):
    # scale assertions for the sketch path: partial hash aggregation is
    # present (map-side sketch building), and NO expand/explode of raw rows
    # precedes the first aggregate — only pane sketches replicate
    from apache_flink_essentials_spark.io import load_table
    from apache_flink_essentials_spark.operators import windows as W
    from apache_flink_essentials_spark.plans import formatted_plan

    events = load_table(spark, "events", "/root/testdata/sf0.001")
    plan = formatted_plan(
        W.sliding_count_distinct(events, "ts", "user_id", 604800, 86400, exact=False)
    )
    assert "hll_sketch_agg" in plan or "hll_union_agg" in plan
    # the row-replicating exact form shows window explode before any agg;
    # the sketch form must aggregate first (pane grouping on the scan side)
    assert plan.index("HashAggregate") < plan.index("Generate") if "Generate" in plan else True
