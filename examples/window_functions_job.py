"""≙ reference WindowFunctions.scala: every window assigner + function style
over the scripted 12-event gaming timeline (:24-37)."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.operators.window_functions import (
    count_by_window_all,
    count_by_window_keyed,
    window_with_most,
)
from apache_flink_essentials_spark.operators.windows import (
    count_window,
    session,
    tumbling,
)
from apache_flink_essentials_spark.sources import gaming_events

def run(spark=None):
    spark = spark or get_spark("example-window-functions")
    REGISTERED = F.col("event_type") == "PlayerRegistered"
    events = gaming_events(spark)

    # W1 + WF1/WF2/WF3: registrations per 3s tumbling window (:51-103)
    count_by_window_all(events, "event_time", "3 seconds", REGISTERED).orderBy(
        "window_start"
    ).show(truncate=False)

    # WF4/WF5: keyed by event type (:109-142)
    count_by_window_keyed(events, "event_time", "3 seconds", "event_type").orderBy(
        "window_start", "event_type"
    ).show(truncate=False)

    # W2 + WF7 exercise (:211-226): best 2s/1s sliding window
    window_with_most(events, "event_time", "2 seconds", "1 second", REGISTERED).show()

    # W3: 1s-gap session windows over registrations (:169-177)
    session(
        events.filter(REGISTERED), "event_time", "1 second", [F.count("*").alias("n")]
    ).orderBy("window_start").show()

    # W4 + WF6: count-10 global windows (:187-202)
    result = count_window(
        events,
        10,
        order_by=["event_time", "event_type", "player_id"],
        aggs=[F.count(F.when(REGISTERED, True)).alias("registrations")],
    )
    result.orderBy("window_id").show()
    return result


if __name__ == "__main__":
    run()
