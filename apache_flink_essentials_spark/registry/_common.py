"""Shared import surface for the registry's query modules.

Every ``q_*`` module star-imports this: the original monolithic
``registry.py`` (split mechanically in round 11 — no behavior change) used
one header import block plus a handful of mid-file module-level imports;
centralizing them here keeps each chunk self-contained without re-deriving
which aliases its sections touch."""

from __future__ import annotations

import math as _math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as _Win

from apache_flink_essentials_spark.io import from_elements, from_sequence, load_table
from apache_flink_essentials_spark.functions import json_int, revenue
from apache_flink_essentials_spark.functions.udf import geo_mean_expr
from apache_flink_essentials_spark.operators import window_functions as WF
from apache_flink_essentials_spark.operators import cdc as C
from apache_flink_essentials_spark.operators import curation as CU
from apache_flink_essentials_spark.operators import dedup as D
from apache_flink_essentials_spark.operators import graph as G
from apache_flink_essentials_spark.operators import joins as J
from apache_flink_essentials_spark.operators import multimodal as M
from apache_flink_essentials_spark.operators import olap as O
from apache_flink_essentials_spark.operators import patterns as PT
from apache_flink_essentials_spark.operators import profiling as P
from apache_flink_essentials_spark.operators import reco as R
from apache_flink_essentials_spark.operators import sketches as SK
from apache_flink_essentials_spark.operators import text as X
from apache_flink_essentials_spark.operators import timeseries as TS
from apache_flink_essentials_spark.operators import transform as T
from apache_flink_essentials_spark.operators import vector as V
from apache_flink_essentials_spark.operators import web as WB
from apache_flink_essentials_spark.operators import windows as W

from ._core import (
    LATE_ADDITIONS,
    ORACLES,
    QUERIES,
    QueryFn,
    _epoch,
    _events,
    _register,
)

__all__ = [
    "_math", "Callable", "DataFrame", "SparkSession", "F", "_Win",
    "from_elements", "from_sequence", "load_table", "json_int", "revenue",
    "geo_mean_expr", "WF", "C", "CU", "D", "G", "J", "M", "O", "PT", "P",
    "R", "SK", "X", "TS", "T", "V", "WB", "W",
    "LATE_ADDITIONS", "ORACLES", "QUERIES", "QueryFn",
    "_epoch", "_events", "_register",
]
