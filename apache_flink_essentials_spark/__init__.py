"""apache_flink_essentials_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo ``mtfelisb/apache-flink-essentials`` (a Flink DataStream-API
essentials codebase), re-expressed idiomatically on Spark DataFrame / SQL /
Structured Streaming. See SURVEY.md for the capability inventory this
implements; each operator module cites the reference file:line it covers.

Design rules (SURVEY §4, §7):
  * DataFrame/Column expressions everywhere — no Python lambdas where a
    Column expression exists, so Catalyst can push down / prune / fold.
  * Streaming semantics via Structured Streaming (watermarks, windows,
    stream-stream joins, applyInPandasWithState for the few genuinely
    stateful constructs).
  * Every batch-expressible operator has a DuckDB-oracle-checkable SQL twin
    (driver contract in __spark_entry__.py).
"""

from apache_flink_essentials_spark.session import get_spark, stop_spark
from apache_flink_essentials_spark.io import load_table, load_tables

__all__ = ["get_spark", "stop_spark", "load_table", "load_tables"]

__version__ = "0.1.0"
