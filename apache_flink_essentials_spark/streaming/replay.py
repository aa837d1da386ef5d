"""Batch ↔ stream bridge: the streaming ≡ batch equivalence harness
(SURVEY §5 test 4 — Structured Streaming's core guarantee is that the
incrementalized plan computes the batch answer; we TEST that, per query).

``replay_as_stream`` writes a bounded DataFrame to parquet and re-reads it
as a file-source stream (optionally N files ⇒ N micro-batches — exercising
incremental state across batches, not one giant batch).
``run_stream_to_df`` drives any streaming DataFrame to completion with an
availableNow trigger into a memory sink and returns the result as a batch
DataFrame for comparison.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def replay_as_stream(
    df: DataFrame,
    num_files: int = 4,
    order_by: str | None = None,
    path: str | None = None,
    flush_sentinel_col: str | None = None,
    flush_beyond: str = "365 days",
) -> DataFrame:
    """Replay a bounded DataFrame as a file-source stream.

    ``order_by`` + repartitionByRange keeps each file time-contiguous so the
    replay is roughly in event order (like the reference's scripted sources);
    ``maxFilesPerTrigger=1`` then yields one micro-batch per file.

    ``flush_sentinel_col``: append ONE sentinel row (the max-ts row shifted
    ``flush_beyond`` into the future) in a final file, written after the data
    files so the file source (mtime order) processes it last. It pushes the
    watermark past every real window so append-mode aggregations emit their
    final window. Callers must exclude sentinel-only windows from
    comparisons (window_start beyond the real max timestamp).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = df.sparkSession
    out = path or tempfile.mkdtemp(prefix="replay_")
    if order_by is not None:
        # The file source replays files in modification-time order; one bulk
        # write gives every file the same mtime and a later-range file
        # processed first would advance the watermark and DROP earlier files.
        # Write each time-range chunk sequentially → strictly increasing
        # mtimes → deterministic in-order replay.
        chunked = df.withColumn(
            "_chunk", F.ntile(num_files).over(Window.orderBy(F.col(order_by)))
        )
        for i in range(1, num_files + 1):
            chunked.filter(F.col("_chunk") == i).drop("_chunk").coalesce(1).write.mode(
                "append"
            ).parquet(out)
    else:
        df.repartition(num_files).write.mode("overwrite").parquet(out)
    if flush_sentinel_col is not None:
        sentinel = (
            df.orderBy(F.col(flush_sentinel_col).desc())
            .limit(1)
            .withColumn(
                flush_sentinel_col,
                F.col(flush_sentinel_col) + F.expr(f"interval '{flush_beyond}'"),
            )
        )
        sentinel.coalesce(1).write.mode("append").parquet(out)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(out)
    )


def run_stream_to_df(
    stream_df: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> DataFrame:
    """Drain a streaming DataFrame (availableNow) into a memory sink; return
    the collected result as a batch DataFrame."""
    spark = stream_df.sparkSession
    name = f"replay_sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {name} did not drain in {timeout_sec}s")
    return spark.table(name)


def assert_stream_equals_batch(
    batch_df: DataFrame,
    stream_result: DataFrame,
) -> None:
    """Order-insensitive equality of a streamed result vs the batch answer."""
    b = {tuple(r) for r in batch_df.collect()}
    s = {tuple(r) for r in stream_result.collect()}
    missing, extra = b - s, s - b
    assert not missing and not extra, (
        f"stream≠batch: missing={list(missing)[:3]} extra={list(extra)[:3]} "
        f"(batch={len(b)} stream={len(s)})"
    )
