"""Golden tests: the reference's scripted 12-event gaming timeline
(WindowFunctions.scala:24-37) with hand-computed expectations (FIXTURES.md §B)
— the closest thing the reference has to a test suite, asserted exactly.
serverStartTime = 2022-02-02T00:00:00Z (epoch 1643760000, divisible by 3,
so tumbling windows align at offsets 0/3/6/9)."""

import pytest
from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators import windows as W
from apache_flink_essentials_spark.sources import gaming_events

BASE = 1643760000  # 2022-02-02T00:00:00Z


@pytest.fixture(scope="module")
def gaming(spark):
    return gaming_events(spark)


def registrations(df):
    return F.count(F.when(F.col("event_type") == "PlayerRegistered", True)).alias("registrations")


def test_tumbling_3s_registrations(gaming):
    # WindowFunctions.scala:51-66: [0,3)→1 (bob), [3,6)→3, [6,9)→2; [9,12) has
    # 0 registrations but 3 online events → window exists with 0
    out = W.tumbling(gaming, "event_time", "3 seconds", [registrations(gaming)])
    got = {r.window_start - BASE: r.registrations for r in out.collect()}
    assert got == {0: 1, 3: 3, 6: 2, 9: 0}


def test_sliding_2s_1s_top1(gaming):
    # exercise at WindowFunctions.scala:211-226: best 2s window (1s slide)
    # for registrations is [3,5) with 3 (sam@3, rob@4, alice@4)
    windowed = W.sliding(
        gaming, "event_time", "2 seconds", "1 second", [registrations(gaming)]
    ).select("window_start", "window_end", "registrations")
    top = W.top_k_windows(windowed, by="registrations", k=1).collect()[0]
    assert (top.window_start - BASE, top.window_end - BASE, top.registrations) == (3, 5, 3)


def test_session_1s_gap_registrations(gaming):
    # WindowFunctions.scala:169-177: registrations at t=2,3,4,4,6,8 with 1s
    # gap → sessions {2,3,4}, {6}, {8}
    regs = gaming.filter(F.col("event_type") == "PlayerRegistered")
    out = W.session(regs, "event_time", "1 second", [F.count("*").alias("n")])
    got = sorted((r.window_start - BASE, r.n) for r in out.collect())
    assert got == [(2, 4), (6, 1), (8, 1)]


def test_count_window_10(gaming):
    # WindowFunctions.scala:187-202: first 10 events (by time order) contain
    # 6 registrations; remaining 2 events form an incomplete window
    out = W.count_window(
        gaming,
        10,
        order_by=["event_time", "event_type", "player_id"],
        aggs=[registrations(gaming), F.count("*").alias("n")],
    )
    got = {r.window_id: (r.registrations, r.n) for r in out.collect()}
    assert got[0] == (6, 10)
    assert got[1][1] == 2


def test_replay_stability_under_shuffled_input(gaming):
    # TimeBasedTransformations.scala:52 invariant: event-time results are
    # identical regardless of arrival order / partitioning
    shuffled = gaming.repartition(7).sortWithinPartitions(F.rand(seed=1))
    a = W.tumbling(gaming, "event_time", "3 seconds", [registrations(gaming)])
    b = W.tumbling(shuffled, "event_time", "3 seconds", [registrations(shuffled)])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
