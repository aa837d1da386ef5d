"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``apache_flink_essentials_spark``; this module is
the thin contract adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_flink_essentials_spark import registry  # noqa: E402
from apache_flink_essentials_spark.io import load_table  # noqa: E402
from apache_flink_essentials_spark.operators import windows as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's marquee example, WindowFunctions.scala
    :51-66, scaled to the fixture's time grain): registrations ('signup')
    per tumbling event-time window over the events stream table."""
    events = load_table(spark, "events", SMOKE_SF_DIR)
    return W.tumbling(
        events,
        "ts",
        "1 hour",
        [
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "signup", True)).alias("signups"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        ],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
