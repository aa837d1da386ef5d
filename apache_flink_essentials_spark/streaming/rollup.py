"""Continuous rollup — a hypertable-style continuous aggregate on
Structured Streaming.

The pattern (TimescaleDB continuous aggregates, Druid rollup ingestion): a
streaming windowed aggregation MATERIALIZES finalized windows into a
partitioned parquet rollup table as the watermark passes them; reads serve
``materialized rollup ∪ fresh aggregation of the raw tail`` — exact,
always-current results with the heavy aggregation amortized into ingest.
This is the scale answer for dashboard-grain queries over a 100 TB event
stream: the rollup table is ~|windows| rows, the tail re-aggregation only
ever touches data newer than the last finalized window, and day-partitioned
storage prunes reads.

Spark-first construction: the materialization IS a watermarked
``groupBy(window(...))`` in append mode (append emits exactly the
finalized windows — no custom trigger logic needed); the serving view is a
``unionByName`` of two DataFrames, so Catalyst prunes/pushes into both
sides. No custom state management anywhere.

Reference anchor: extends the windowed-aggregation surface
(``WindowFunctions.scala:54-66``) + file sink (``DataStreams.scala:57-62``)
into a persistent, incrementally-maintained aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_flink_essentials_spark.streaming.watermark import with_event_time


def _windowed_agg(
    df: DataFrame, ts_col: str, grain: str, aggs: list[Column]
) -> DataFrame:
    """Shared shape for both the streaming materialization and the batch
    tail: flat (window_start, window_end, day, *aggs) rows."""
    return (
        df.groupBy(F.window(F.col(ts_col), grain).alias("window"))
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.to_date(F.col("window.start")).alias("day"),
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def _agg_names(aggs: list[Column]) -> list[str]:
    names = []
    for c in aggs:
        # Column alias is the last name segment of the expression
        names.append(c._jc.toString().split(" AS ")[-1].strip("`"))
    return names


def continuous_rollup(
    stream: DataFrame,
    ts_col: str,
    grain: str,
    aggs: list[Column],
    path: str,
    checkpoint: str,
    watermark_delay: str = "0 seconds",
    trigger: dict | None = None,
):
    """Start the materialization: watermarked tumbling aggregation, append
    mode (emits a window exactly once, when the watermark finalizes it),
    day-partitioned parquet. Returns the streaming query handle.

    Exactly-once: checkpoint + parquet sink give end-to-end idempotent
    restarts; a window is never re-emitted, so the rollup table needs no
    dedup on read.
    """
    rolled = _windowed_agg(
        with_event_time(stream, ts_col, watermark_delay), ts_col, grain, aggs
    )
    writer = (
        rolled.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .partitionBy("day")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def realtime_aggregate(
    spark: SparkSession,
    rollup_path: str,
    raw: DataFrame,
    ts_col: str,
    grain: str,
    aggs: list[Column],
) -> DataFrame:
    """Serving view: materialized windows ∪ tail aggregation of raw events
    at/after the last finalized window end. The cutoff is window-aligned by
    construction (it IS a window end), so the union has no gap and no
    overlap. An empty rollup degrades to the full batch aggregation.

    The cutoff read is one max() over the rollup table's window_end —
    O(|windows|), served from parquet footer stats after partition pruning.
    """
    names = _agg_names(aggs)
    cols = ["window_start", "window_end", "day", *names]
    try:
        rollup = spark.read.parquet(rollup_path).select(*cols)
        cutoff = rollup.agg(F.max("window_end")).first()[0]
    except Exception:  # noqa: BLE001 — no rollup written yet
        rollup, cutoff = None, None
    if cutoff is None:
        return _windowed_agg(raw, ts_col, grain, aggs)
    tail = _windowed_agg(
        raw.filter(F.col(ts_col) >= F.lit(cutoff)), ts_col, grain, aggs
    )
    return rollup.unionByName(tail)
