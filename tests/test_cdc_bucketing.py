"""Pins for the CDC changelog operator, bucketed co-located joins, and
quantized KNN: hand-computable semantics plus the plan property that is the
whole point of bucketing (join with ZERO shuffle exchanges).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_flink_essentials_spark import io
from apache_flink_essentials_spark.operators import cdc as C
from apache_flink_essentials_spark.operators import vector as V
from apache_flink_essentials_spark.plans import count_exchanges, formatted_plan


def test_apply_changelog_latest_and_deletes(spark):
    rows = [
        # key 1: U@1, U@3 → latest U value 30
        (1, 1, 10.0, "U"), (1, 3, 30.0, "U"),
        # key 2: U@1, D@5 → deleted
        (2, 1, 11.0, "U"), (2, 5, 0.0, "D"),
        # key 3: D@1, U@2 → resurrected, value 22
        (3, 1, 0.0, "D"), (3, 2, 22.0, "U"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, value double, op string")
    out = {r.k: r for r in C.apply_changelog(df, ["k"], ["seq"]).collect()}
    assert set(out) == {1, 3}
    assert out[1].value == 30.0 and out[1].seq == 3
    assert out[3].value == 22.0


def test_apply_changelog_seq_tiebreaker_is_deterministic(spark):
    rows = [(1, 5, 1, 100.0, "U"), (1, 5, 2, 200.0, "U")]
    df = spark.createDataFrame(rows, "k long, ts long, eid long, value double, op string")
    out = C.apply_changelog(df, ["k"], ["ts", "eid"]).collect()
    assert len(out) == 1 and out[0].value == 200.0  # higher eid wins the tie


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = (
        spark.range(0, 1000)
        .select((F.col("id") % 50).alias("k"), (F.col("id") * 2).alias("va"))
    )
    b = (
        spark.range(0, 500)
        .select((F.col("id") % 50).alias("k"), (F.col("id") * 3).alias("vb"))
    )
    io.write_bucketed(a, "t_bucket_a", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "a"))
    io.write_bucketed(b, "t_bucket_b", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert count_exchanges(joined) == 0  # bucket-local: no shuffle at all
        assert joined.count() == 50 * 20 * 10
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


@pytest.fixture(scope="module")
def embeddings_small(spark):
    from apache_flink_essentials_spark.io import load_table

    return load_table(spark, "embeddings", "/root/testdata/sf0.001")


def test_quantized_knn_recall_vs_exact(embeddings_small):
    queries = embeddings_small.filter(F.col("vec_id") < 10)
    exact = V.knn_cosine_bruteforce(embeddings_small, queries, k=5)
    quant = V.knn_cosine_quantized(embeddings_small, queries, k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    q = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    recall = len(e & q) / len(e)
    assert recall >= 0.8  # int8 codes keep ≥80% of exact top-5 neighbors


def test_scd2_history_intervals(spark):
    rows = [
        # key 1: U@1, U@3, D@5 → two versions, both closed, none current
        (1, 1, "U"), (1, 3, "U"), (1, 5, "D"),
        # key 2: U@2 → one open current version
        (2, 2, "U"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, op string")
    out = sorted(
        C.scd2_history(df, ["k"], ["seq"]).collect(),
        key=lambda r: (r.k, r.version),
    )
    assert [(r.k, r.valid_from, r.valid_to, r.version, r.is_current) for r in out] == [
        (1, 1, 3, 1, False),
        (1, 3, 5, 2, False),
        (2, 2, None, 1, True),
    ]


def test_scd2_current_slice_matches_apply_changelog(spark):
    import random

    rng = random.Random(7)
    rows = [
        (rng.randrange(20), i, float(i), "D" if rng.random() < 0.2 else "U")
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k long, seq long, value double, op string")
    latest = {(r.k, r.seq) for r in C.apply_changelog(df, ["k"], ["seq"]).collect()}
    current = {
        (r.k, r.seq)
        for r in C.scd2_history(df, ["k"], ["seq"]).filter("is_current").collect()
    }
    assert latest == current


def test_point_in_time_join_picks_valid_version(spark):
    # dim history for key 1: v1 [10,20), v2 [20,30), v3 [30,open)
    changes = spark.createDataFrame(
        [(1, 10, "a", "U"), (1, 20, "b", "U"), (1, 30, "c", "U"),
         # key 2: one version then deleted at 50
         (2, 40, "x", "U"), (2, 50, "", "D")],
        "k long, seq long, attr string, op string",
    )
    dim = C.scd2_history(changes, ["k"], ["seq"])
    fact = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 19), (3, 1, 20), (4, 1, 99),
         (5, 1, 5),            # before first version → no match
         (6, 2, 45), (7, 2, 50), (8, 2, 60)],  # 7,8 after delete → no match
        "fid long, k long, ts long",
    )
    out = C.point_in_time_join(fact, dim, ["k"], "ts", ["attr", "version"])
    got = {r.fid: (r.attr, r.version) for r in out.collect()}
    assert got == {
        1: ("a", 1),   # boundary: ts == valid_from matches the opening version
        2: ("a", 1),
        3: ("b", 2),   # ts == next valid_from rolls to the next version
        4: ("c", 3),   # open interval
        6: ("x", 1),
    }


def test_point_in_time_join_never_duplicates_facts(spark):
    changes = spark.createDataFrame(
        [(1, t, f"v{t}", "U") for t in (10, 20, 20, 30)],  # tie at 20
        "k long, seq long, attr string, op string",
    )
    dim = C.scd2_history(changes, ["k"], ["seq", "attr"])
    fact = spark.createDataFrame(
        [(i, 1, t) for i, t in enumerate(range(10, 40))],
        "fid long, k long, ts long",
    )
    out = C.point_in_time_join(fact, dim, ["k"], "ts", ["attr"])
    assert out.count() == out.select("fid").distinct().count()


def test_snapshot_diff_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)],
        "k long, v double",
    )
    new = spark.createDataFrame(
        [(1, 10.0),        # unchanged → absent from diff
         (2, 25.0),        # updated
         (3, 30.0),        # null → value is an update (null-safe compare)
         (5, 50.0)],       # added; 4 deleted
        "k long, v double",
    )
    out = {r.k: r for r in C.snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[2].change_type == "U" and out[2].old_v == 20.0 and out[2].new_v == 25.0
    assert out[3].change_type == "U" and out[3].old_v is None
    assert out[4].change_type == "D" and out[4].new_v is None
    assert out[5].change_type == "A" and out[5].old_v is None
