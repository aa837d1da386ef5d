"""Skew utilities + bucketed-table co-located joins (SCALING.md items)."""


from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators.skew import (
    replicate_join_skewed,
    salted_agg,
)


def test_salted_agg_matches_plain_agg(spark, events):
    plain = {
        (r.event_type): (r.n, round(r.sv, 4))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    salted = {
        (r.event_type): (r.n, round(r.sv, 4))
        for r in salted_agg(
            events,
            keys=["event_type"],
            partials={
                "n": ("sum", F.count("*")),
                "sv": ("sum", F.sum("value")),
            },
            salt_from=F.col("event_id"),
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_replicate_join_matches_plain_join(spark, events):
    users = events.select("user_id").distinct().withColumn(
        "flag", F.col("user_id") % 2
    )
    plain = sorted(
        (r.event_id, r.flag)
        for r in events.join(users, on="user_id").select("event_id", "flag").collect()
    )
    salted = sorted(
        (r.event_id, r.flag)
        for r in replicate_join_skewed(
            events, users, "user_id", salt_from=F.col("event_id"), n_salts=4
        )
        .select("event_id", "flag")
        .collect()
    )
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, events):
    # co-located join: both sides bucketed by the join key → SortMergeJoin
    # with ZERO Exchange (the 100 TB co-location story, SCALING.md item 4)
    from apache_flink_essentials_spark.plans import formatted_plan

    import shutil

    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_users")
    # a previous session's managed-table dirs survive the in-memory catalog
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_events", "b_users"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    events.select("event_id", "user_id", "value").write.bucketBy(
        8, "user_id"
    ).sortBy("user_id").mode("overwrite").saveAsTable("b_events")
    events.select("user_id").distinct().write.bucketBy(8, "user_id").sortBy(
        "user_id"
    ).mode("overwrite").saveAsTable("b_users")
    joined = spark.table("b_events").join(
        spark.table("b_users").hint("merge"), on="user_id"
    )
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan
    import re

    assert not re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE), plan
    assert joined.count() == events.count()


def test_salted_agg_equals_plain_groupby(spark, events):
    from pyspark.sql import functions as F

    from apache_flink_essentials_spark.operators.skew import salted_agg

    salted = salted_agg(
        events,
        ["event_type"],
        {
            "n": ("sum", F.count(F.lit(1))),
            "mx": ("max", F.max("value")),
        },
        salt_from=F.col("event_id"),
        n_salts=8,
    ).collect()
    plain = (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    )
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_replicate_join_skewed_equals_plain_join(spark, events):
    from pyspark.sql import functions as F

    from apache_flink_essentials_spark.operators.skew import (
        replicate_join_skewed,
    )

    dim = events.select("event_type").distinct().withColumn(
        "type_tag", F.upper(F.col("event_type"))
    )
    rep = replicate_join_skewed(
        events.select("event_id", "event_type"),
        dim,
        "event_type",
        salt_from=F.col("event_id"),
        n_salts=4,
    )
    plain = events.select("event_id", "event_type").join(dim, "event_type")
    assert rep.count() == plain.count()
    a = sorted(map(tuple, rep.select("event_id", "type_tag").collect()))
    b = sorted(map(tuple, plain.select("event_id", "type_tag").collect()))
    assert a == b
