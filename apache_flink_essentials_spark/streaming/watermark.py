"""Event time & watermarks (SURVEY §2.5, E1-E6).

``with_event_time`` ≙ ``assignTimestampsAndWatermarks(WatermarkStrategy
.forBoundedOutOfOrderness(...) + SerializableTimestampAssigner)``
(reference WindowFunctions.scala:42-49, TimeBasedTransformations.scala:54-62,
MultipleStreams.scala:66-83): the timestamp assigner is the column choice;
the bounded-out-of-orderness bound is the withWatermark delay.

Late-data semantics (E6): records older than watermark are dropped from
windowed aggregations — identical drop rule to Flink's default (no
allowed-lateness / side-output in the reference either).

The custom WatermarkGenerator (E2, TimeBasedTransformations.scala:76-91)
computes max(ts) - maxDelay - 1ms periodically; Spark's built-in watermark
is max(ts) - delay per micro-batch — same bound, cadence differs (documented
deviation, SURVEY §7.3). ``processing_time_trigger`` tunes the cadence
analog of setAutoWatermarkInterval (E3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def with_event_time(df: DataFrame, ts_col: str, max_out_of_orderness: str) -> DataFrame:
    """Declare event-time + bounded out-of-orderness on a streaming frame.

    e.g. ``with_event_time(stream, "time", "500 milliseconds")`` ≙ the
    reference's forBoundedOutOfOrderness(Duration.ofMillis(500)).
    No-op column-wise: watermark is metadata on the plan.
    """
    return df.withWatermark(ts_col, max_out_of_orderness)


def processing_time_trigger(interval: str = "1 second") -> dict:
    """Micro-batch trigger kwargs ≙ setAutoWatermarkInterval cadence (E3).
    Usage: ``df.writeStream.trigger(**processing_time_trigger("1 second"))``."""
    return {"processingTime": interval}


def available_now_trigger() -> dict:
    """Bounded drain-the-source trigger — used by the replay harness to run
    a stream to completion over a finite fixture."""
    return {"availableNow": True}


def enrich_with_static(stream: "DataFrame", dim: "DataFrame", on, how: str = "left") -> "DataFrame":
    """Stream-static join: enrich a streaming frame with a bounded dimension
    table — Spark's native analog of Flink's broadcast-state pattern (the
    dimension is re-read per micro-batch, so slowly-changing dims pick up
    updates between batches without restarts).

    The static side is joined fresh in every micro-batch plan; Catalyst
    broadcasts it when under the threshold — no state store involved, so
    this scales to any stream rate. Stateless row-wise enrichment only:
    aggregations after the join follow normal streaming semantics.
    """
    return stream.join(dim, on, how)
