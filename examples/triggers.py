"""≙ reference Triggers.scala: CountTrigger (:19-28, fire every 5 without
purge) and PurgingTrigger (:31-40, fire every 5 and purge) on the cart-event
stream — the two genuinely stateful streaming constructs, run through
applyInPandasWithState over a bounded replay so the job terminates."""

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.sources import shopping_cart_events_batch
from apache_flink_essentials_spark.streaming.replay import (
    replay_as_stream,
    run_stream_to_df,
)
from apache_flink_essentials_spark.streaming.stateful import (
    count_trigger_stream,
    count_window_stream,
)


def run(spark=None):
    spark = spark or get_spark("example-triggers")
    carts = shopping_cart_events_batch(spark, 60, with_removed=True)
    stream = lambda: replay_as_stream(carts, num_files=2, order_by="time")  # noqa: E731

    # TR1 CountTrigger.of(5): re-fire the growing per-user count every 5
    running = run_stream_to_df(
        count_trigger_stream(stream(), key_col="user_id", every=5),
        output_mode="update",
    )
    running.orderBy("key", "running_count").show(10)

    # TR2 PurgingTrigger(CountTrigger.of(5)): 5-element windows, fire & purge
    windows = run_stream_to_df(
        count_window_stream(stream(), key_col="user_id", size=5, value_col="quantity"),
        output_mode="update",
    )
    windows.orderBy("key", "window_id").show(10)
    return windows


if __name__ == "__main__":
    run()
