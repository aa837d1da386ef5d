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
import pyarrow as pa

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


def _spark_family(dt) -> str:
    """Coarse type family for a Spark DataType.

    The driver's value hash is type-sensitive in at least one way we have
    observed: an uncast DuckDB HUGEINT (int128) sum hash-mismatches a Spark
    bigint even when every value is identical (round-1 q12). Families are
    coarse enough not to false-fail decimal-precision growth (decimal(22,2)
    vs decimal(38,2) both hashed fine in round 1) but strict enough that
    int-vs-decimal128 and int-vs-float can never pass locally.
    """
    name = dt.simpleString()
    if name in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if name in ("float", "double"):
        return "float"
    if name.startswith("decimal"):
        return "decimal"
    if name.startswith("timestamp"):
        return "timestamp"
    if name.startswith("array"):
        return "array"
    if name.startswith("struct"):
        return "struct"
    if name.startswith("map"):
        return "map"
    return name  # string, boolean, date, binary, ...


def _duck_family(at: pa.DataType) -> str:
    """Coarse type family for a DuckDB column as exported through Arrow.

    DuckDB HUGEINT exports as decimal128(38,0) — deliberately NOT mapped to
    "int", so an uncast integer sum in an oracle fails the family check.
    """
    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_floating(at):
        return "float"
    if pa.types.is_decimal(at):
        return "decimal"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_list(at) or pa.types.is_large_list(at) or pa.types.is_fixed_size_list(at):
        return "array"
    if pa.types.is_struct(at):
        return "struct"
    if pa.types.is_map(at):
        return "map"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "string"
    if pa.types.is_boolean(at):
        return "boolean"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return "binary"
    return str(at)


def compare(spark_df, con, sql: str) -> dict:
    spark_cols = sorted(spark_df.columns)
    spark_types = {f.name: _spark_family(f.dataType) for f in spark_df.schema.fields}
    spark_rows = [
        tuple(_canon(row[c]) for c in spark_cols) for row in spark_df.collect()
    ]
    duck = con.sql(sql)
    duck_cols_raw = duck.columns
    duck_cols = sorted(duck_cols_raw)
    duck_arrow_schema = con.sql(sql).arrow().schema
    duck_types = {
        name: _duck_family(duck_arrow_schema.field(name).type)
        for name in duck_cols_raw
    }
    duck_rows = [
        tuple(_canon(row[duck_cols_raw.index(c)]) for c in duck_cols)
        for row in duck.fetchall()
    ]
    type_mismatches = {
        c: (spark_types.get(c), duck_types.get(c))
        for c in spark_cols
        if c in duck_types and spark_types.get(c) != duck_types.get(c)
    }
    result = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": spark_cols,
        "cols_duck": duck_cols,
        "count_match": len(spark_rows) == len(duck_rows),
        "schema_match": spark_cols == duck_cols,
        "type_match": not type_mismatches,
    }
    if type_mismatches:
        result["type_mismatches"] = type_mismatches
    sc, dc = Counter(spark_rows), Counter(duck_rows)
    result["value_match"] = sc == dc
    if not result["value_match"]:
        only_spark = list((sc - dc).elements())[:5]
        only_duck = list((dc - sc).elements())[:5]
        result["only_spark"] = only_spark
        result["only_duck"] = only_duck
    result["ok"] = (
        result["count_match"]
        and result["schema_match"]
        and result["type_match"]
        and result["value_match"]
    )
    return result
