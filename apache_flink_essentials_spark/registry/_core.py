"""Query registry — the driver contract's implementation.

Each entry pairs a Spark DataFrame query (built from the operator library)
with an ANSI-SQL oracle DuckDB runs on the same parquet tables. Names map to
SURVEY §2 operator ids. Conventions for engine-portable results:

  * timestamps surface as truncating epoch-second BIGINTs
    (Spark ``cast(ts as long)`` ≡ DuckDB ``floor(epoch(ts))::BIGINT``)
  * money/metric SUMS go through DECIMAL (exact, order-independent) and are
    cast back to DOUBLE; AVGs are decimal-sum / count — never round() a
    noisy double sum: summation-order ULPs around an exact-boundary value
    flip the rounded digit differently per engine
  * per-row rationals (ratios, jaccard, scores) are UNROUNDED: identical
    int operands → bit-identical doubles in both engines, whereas round()
    itself diverges (Spark rounds the shortest decimal repr, DuckDB the
    scaled binary — e.g. 1923/1920 rounds to 1.001563 vs 1.001562)
  * round() survives only on transcendental aggregates (cosine, geo-mean)
    where fold-order noise needs absorbing and boundary hits have ~zero
    probability; ranking then uses the rounded value + id tiebreak
  * every computed column is aliased identically on both sides
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_flink_essentials_spark.io import from_sequence, load_table
from apache_flink_essentials_spark.functions import json_int, revenue
from apache_flink_essentials_spark.functions.udf import geo_mean_expr
from apache_flink_essentials_spark.operators import window_functions as WF
from apache_flink_essentials_spark.operators import dedup as D
from apache_flink_essentials_spark.operators import joins as J
from apache_flink_essentials_spark.operators import multimodal as M
from apache_flink_essentials_spark.operators import text as X
from apache_flink_essentials_spark.operators import transform as T
from apache_flink_essentials_spark.operators import vector as V
from apache_flink_essentials_spark.operators import windows as W

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Names registered AFTER the round-2 correctness snapshot. The driver
# oracle-checks a bounded prefix of the query ordering per round;
# `__spark_entry__._driver_order` uses this set to queue brand-new names
# BEHIND the older not-yet-checked ones, so adding breadth never pushes a
# pending name back out of the checked window.
LATE_ADDITIONS: set[str] = set()


def _register(name: str, oracle: str | None = None, late: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if late:
            LATE_ADDITIONS.add(name)
        return fn

    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir)


def _epoch(col: str):
    return F.col(col).cast("long")


