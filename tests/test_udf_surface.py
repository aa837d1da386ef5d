"""§2.9 UDF/UDAF/UDTF surface: the Arrow-batched escape hatches compute the
same answers as their tier-0 expression equivalents."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark.functions.udf import (
    char_ngrams_udtf,
    geo_mean_expr,
    geo_mean_udaf,
)


def test_pandas_udaf_matches_expression(spark, events):
    df = events.filter(F.col("value") > 0)
    via_udaf = {
        r.event_type: r.g
        for r in df.groupBy("event_type").agg(geo_mean_udaf()("value").alias("g")).collect()
    }
    via_expr = {
        r.event_type: r.g
        for r in df.groupBy("event_type").agg(geo_mean_expr("value").alias("g")).collect()
    }
    assert via_udaf.keys() == via_expr.keys()
    for k in via_udaf:
        assert abs(via_udaf[k] - via_expr[k]) < 1e-9


def test_udtf_explode_shape(spark):
    df = spark.createDataFrame([("abcde",), ("xy",)], "text string")
    out = df.select(F.explode(char_ngrams_udtf()("text")).alias("ngram"))
    got = sorted(r.ngram for r in out.collect())
    assert got == ["abc", "bcd", "cde"]  # "xy" too short → contributes nothing


def test_window_function_formatted_output(spark, events):
    from apache_flink_essentials_spark.operators.window_functions import (
        count_by_window_all,
    )

    r = count_by_window_all(
        events, "ts", "1 hour", F.col("event_type") == "signup"
    ).collect()[0]
    assert r.formatted == f"Window [{r.window_start} - {r.window_end}] {r.cnt}"


def test_python_udtf_range(spark):
    from apache_flink_essentials_spark.functions.udf import range_udtf

    Rng = range_udtf()
    spark.udtf.register("range_emitter", Rng)
    out = spark.sql(
        "SELECT t.n, r.m FROM VALUES (3), (1) AS t(n), LATERAL range_emitter(t.n) r"
    )
    got = sorted((r.n, r.m) for r in out.collect())
    assert got == [(3, 1), (3, 2)]  # n=1 emits nothing
