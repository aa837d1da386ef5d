"""≙ reference TimeBasedTransformations.scala: the same windowed count under
processing time (:16-46, non-deterministic) vs event time (:48-72,
deterministic), with bounded-out-of-orderness watermarks (:54-62).

The reference's punchline (:38-40 vs :52): processing-time results change
across runs; event-time results replay identically. Demonstrated here by
running the event-time pipeline twice (equal) and stamping ingest time for
the processing-time variant (whatever wall-clock says)."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.operators.windows import tumbling, with_processing_time
from apache_flink_essentials_spark.sources import shopping_cart_events_batch
from apache_flink_essentials_spark.streaming.replay import (
    replay_as_stream,
    run_stream_to_df,
)
from apache_flink_essentials_spark.streaming.watermark import with_event_time


def run(spark=None):
    spark = spark or get_spark("example-time-based")
    carts = shopping_cart_events_batch(spark, 100, with_removed=True)

    # event time, batch: deterministic
    agg = [F.count("*").alias("n_events")]
    by_event_a = tumbling(carts, "time", "5 seconds", agg)
    by_event_b = tumbling(carts, "time", "5 seconds", agg)
    assert sorted(map(tuple, by_event_a.collect())) == sorted(
        map(tuple, by_event_b.collect())
    )
    by_event_a.orderBy("window_start").show(5)

    # event time, streaming replay with watermark (≙ forBoundedOutOfOrderness 500ms)
    stream = with_event_time(
        replay_as_stream(carts, num_files=3, order_by="time", flush_sentinel_col="time"),
        "time",
        "500 milliseconds",
    )
    streamed = run_stream_to_df(tumbling(stream, "time", "5 seconds", agg))
    print(f"streamed windows: {streamed.count()}")

    # processing time (W5): window over arrival wall-clock — non-deterministic
    # across runs by construction (reference's own caveat at :38-40)
    by_proc = tumbling(
        with_processing_time(carts, "proc_time"), "proc_time", "5 seconds", agg
    )
    by_proc.show(3)
    return by_event_a


if __name__ == "__main__":
    run()
