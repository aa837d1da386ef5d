"""OLAP multi-grain aggregation, regex redaction, inverted index, and the
non-equi band join: semantics pinned on hand-computable inputs, plus the
plan shape that makes the band join scale (broadcast, no fact shuffle)."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators import joins as J
from apache_flink_essentials_spark.operators import olap as O
from apache_flink_essentials_spark.operators import text as X


def test_rollup_grains_and_flags(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
        "d1 string, d2 string, v long",
    )
    out = O.rollup_agg(df, ["d1", "d2"], {"s": F.sum("v")})
    rows = {(r.d1, r.d2, r.g_d1, r.g_d2): r.s for r in out.collect()}
    assert rows[("a", "x", 0, 0)] == 1
    assert rows[("a", None, 0, 1)] == 3      # subtotal, not a NULL key
    assert rows[("b", None, 0, 1)] == 4
    assert rows[(None, None, 1, 1)] == 7     # grand total
    # rollup is hierarchical: no (None, 'x') grain
    assert (None, "x", 1, 0) not in rows
    assert len(rows) == 3 + 2 + 1


def test_cube_has_all_grains(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("b", "y", 2)], "d1 string, d2 string, v long"
    )
    out = O.cube_agg(df, ["d1", "d2"], {"s": F.sum("v")})
    rows = {(r.d1, r.d2, r.g_d1, r.g_d2): r.s for r in out.collect()}
    assert rows[(None, "x", 1, 0)] == 1      # the grain rollup lacks
    assert rows[(None, None, 1, 1)] == 3


def test_pivot_explicit_values_and_fill(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "id long, k string"
    )
    out = {r.id: r for r in O.pivot_agg(
        df, ["id"], "k", ["a", "b", "zz"], F.count(F.lit(1)), fill=0
    ).collect()}
    assert (out[1].a, out[1].b, out[1].zz) == (2, 1, 0)
    assert (out[2].a, out[2].b, out[2].zz) == (0, 1, 0)


def test_redact_default_pii_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@example.com ip 10.0.0.1 ssn 123-45-6789 "
             "phone 555-123-4567 twice bob@example.com")],
        "doc_id long, text string",
    )
    r = X.redact(df).collect()[0]
    assert r.n_email == 2 and r.n_ipv4 == 1 and r.n_ssn == 1
    assert r.n_phone >= 1
    for tag in ("<EMAIL>", "<IPV4>", "<SSN>", "<PHONE>"):
        assert tag in r.redacted
    assert "bob@example.com" not in r.redacted
    assert "123-45-6789" not in r.redacted


def test_inverted_index_postings_cap_and_df(spark):
    df = spark.createDataFrame(
        [(i, "common term" + (" rare" if i == 7 else "")) for i in range(30)],
        "doc_id long, text string",
    )
    out = {r.term: r for r in X.inverted_index(df, max_postings=5).collect()}
    assert out["common"].df == 30
    assert out["common"].postings == [0, 1, 2, 3, 4]      # capped + sorted
    assert out["rare"].df == 1 and out["rare"].postings == [7]


def test_range_band_join_is_broadcast_no_shuffle(spark):
    facts = spark.range(1000).select(
        F.col("id"), (F.col("id") % 300).cast("double").alias("value")
    )
    bands = spark.createDataFrame(
        [("lo", 0.0, 100.0), ("hi", 100.0, 1000.0)],
        "band string, lo double, hi double",
    )
    joined = J.range_band_join(facts, bands, "value")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan   # fact side not shuffled
    got = {r.band: 1 for r in joined.collect() if r.value == 99.0}
    assert got == {"lo": 1}
    n_hi = sum(1 for r in joined.collect() if r.band == "hi")
    assert n_hi == 1000 - sum(1 for r in joined.collect() if r.band == "lo")


def test_merge_rollups_equals_full_recompute(spark):
    from apache_flink_essentials_spark.operators import olap as OL

    rows = [(d, t, float(v)) for d, t, v in [
        (0, "a", 1), (0, "a", 2), (0, "b", 5),
        (1, "a", 3), (1, "b", 4), (1, "b", 9),
    ]]
    df = spark.createDataFrame(rows, "day long, typ string, v double")
    mk = lambda d: OL.additive_rollup(  # noqa: E731
        d, ["day", "typ"],
        sum_cols={"s": F.col("v")},
        min_cols={"mn": F.col("v")},
        max_cols={"mx": F.col("v")},
    )
    full = {tuple(r[:2]): r[2:] for r in mk(df).collect()}
    # three-way split with one empty part and disjoint/overlapping keys
    parts = [
        mk(df.filter("day = 0")),
        mk(df.filter("day = 1 and typ = 'a'")),
        mk(df.filter("day = 1 and typ = 'b'")),
        mk(df.filter("day = 99")),            # empty partial
    ]
    merged = OL.merge_rollups(
        parts, ["day", "typ"], sum_cols=["s"], min_cols=["mn"], max_cols=["mx"]
    )
    got = {tuple(r[:2]): r[2:] for r in merged.collect()}
    assert got == full
