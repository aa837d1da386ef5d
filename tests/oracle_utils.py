"""Local replica of the driver's DuckDB-oracle comparison.

Strictest plausible interpretation of the contract: row count, schema
(column names, sorted), and order-insensitive value equality (multiset of
canonicalized rows over name-sorted columns). Passing here should imply
passing any reasonable hash-based variant.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb

from apache_flink_essentials_spark.schemas import ALL_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ALL_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 2**53:
            return int(v)
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def compare(spark_df, con, sql: str) -> dict:
    spark_cols = sorted(spark_df.columns)
    spark_rows = [
        tuple(_canon(row[c]) for c in spark_cols) for row in spark_df.collect()
    ]
    duck = con.sql(sql)
    duck_cols_raw = duck.columns
    duck_cols = sorted(duck_cols_raw)
    duck_rows = [
        tuple(_canon(row[duck_cols_raw.index(c)]) for c in duck_cols)
        for row in duck.fetchall()
    ]
    result = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": spark_cols,
        "cols_duck": duck_cols,
        "count_match": len(spark_rows) == len(duck_rows),
        "schema_match": spark_cols == duck_cols,
    }
    sc, dc = Counter(spark_rows), Counter(duck_rows)
    result["value_match"] = sc == dc
    if not result["value_match"]:
        only_spark = list((sc - dc).elements())[:5]
        only_duck = list((dc - sc).elements())[:5]
        result["only_spark"] = only_spark
        result["only_duck"] = only_duck
    result["ok"] = result["count_match"] and result["schema_match"] and result["value_match"]
    return result
