"""Continuous rollup demo: a hypertable-style continuous aggregate over the
events fixture — materialize finalized 6-hour windows from a replayed
stream, then serve an exact always-current view (materialized ∪ raw tail).

Extends the reference's windowed-aggregation + file-sink surface
(WindowFunctions.scala:54-66, DataStreams.scala:57-62) into a persistent,
incrementally-maintained aggregate.
"""

import tempfile

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.io import load_table
from apache_flink_essentials_spark.streaming.replay import replay_as_stream
from apache_flink_essentials_spark.streaming.rollup import (
    continuous_rollup,
    realtime_aggregate,
)

SF_DIR = "/root/testdata/sf0.001"


def run(spark=None):
    spark = spark or get_spark("example-continuous-rollup")
    events = load_table(spark, "events", SF_DIR)
    aggs = [
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ]

    rollup_path = tempfile.mkdtemp(prefix="rollup_demo_")
    ckpt = tempfile.mkdtemp(prefix="rollup_demo_ckpt_")

    # ingest: replay the fixture as a 4-micro-batch stream; append mode
    # materializes each 6h window exactly once as the watermark passes it
    stream = replay_as_stream(events, num_files=4, order_by="ts", flush_sentinel_col="ts")
    q = continuous_rollup(
        stream, "ts", "6 hours", aggs, rollup_path, ckpt,
        watermark_delay="10 minutes", trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    n_mat = spark.read.parquet(rollup_path).count()
    print(f"materialized windows: {n_mat} -> {rollup_path}")

    # serving: materialized ∪ tail — always-current, exact
    view = realtime_aggregate(spark, rollup_path, events, "ts", "6 hours", aggs)
    view.orderBy("window_start").show(5, truncate=False)


if __name__ == "__main__":
    run()
