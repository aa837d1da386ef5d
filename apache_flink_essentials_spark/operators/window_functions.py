"""Window-function styles WF1-WF7 (SURVEY §2.4) as explicit builders.

The reference exposes FIVE API styles for "aggregate a window's contents"
(WindowFunctions.scala:58-142, :187-226); they differ in *how* they see the
window (full iterable vs incremental accumulator vs context metadata), not
*what* they can compute over it. Spark's groupBy(window).agg() subsumes all
of them — these builders make the correspondence explicit and give the
formatted-string outputs the reference prints.

The incremental ``AggregateFunction`` style (WF3, :87-103) needs no special
form: Catalyst ALWAYS plans partial/merge aggregation (its add/merge split);
any agg expression passed here executes that way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_flink_essentials_spark.operators.windows import sliding, top_k_windows, tumbling


def count_by_window_all(
    df: DataFrame, ts_col: str, size: str, predicate: Column | None = None
) -> DataFrame:
    """WF1/WF2 (CountByWindowAll / ProcessAllWindowFunction,
    WindowFunctions.scala:58-84): per-window count (optionally filtered),
    with the reference's ``"Window [start - end] count"`` output string
    (format at :61) — window metadata ≙ the window_start/window_end columns.
    """
    cnt = F.count(F.when(predicate, True)) if predicate is not None else F.count("*")
    out = tumbling(df, ts_col, size, [cnt.alias("cnt")])
    return out.select(
        "window_start",
        "window_end",
        "cnt",
        F.format_string(
            "Window [%s - %s] %s", F.col("window_start"), F.col("window_end"), F.col("cnt")
        ).alias("formatted"),
    )


def count_by_window_keyed(
    df: DataFrame, ts_col: str, size: str, key: str
) -> DataFrame:
    """WF4/WF5 (keyed WindowFunction / ProcessWindowFunction,
    WindowFunctions.scala:114-142): per-key per-window size with the
    ``"$key: $window, $count"`` output (:116)."""
    out = tumbling(df, ts_col, size, [F.count("*").alias("cnt")], keys=[key])
    return out.select(
        "window_start",
        "window_end",
        key,
        "cnt",
        F.format_string(
            "%s: [%s - %s], %s",
            F.col(key),
            F.col("window_start"),
            F.col("window_end"),
            F.col("cnt"),
        ).alias("formatted"),
    )


def window_with_most(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    predicate: Column,
) -> DataFrame:
    """WF7 (KeepWindowAndCountFunction + maxBy exercise,
    WindowFunctions.scala:211-226): the sliding window with the most
    predicate-matching events — folded into the plan instead of the
    reference's driver-side collect+maxBy (:222-223)."""
    windowed = sliding(
        df, ts_col, size, slide, [F.count(F.when(predicate, True)).alias("cnt")]
    ).select("window_start", "window_end", "cnt")
    return top_k_windows(windowed, by="cnt", k=1)
