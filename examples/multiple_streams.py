"""≙ reference MultipleStreams.scala: union (:19-33), window join (:36-57),
interval join (:61-103), connect + CoProcessFunction (:106-145) over the
shopping/catalog generator streams."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.operators.joins import (
    connect_ratio,
    interval_join,
    union_streams,
    window_join,
)
from apache_flink_essentials_spark.sources import (
    catalog_events_batch,
    shopping_cart_events_batch,
)


def run(spark=None):
    spark = spark or get_spark("example-multiple-streams")
    carts = shopping_cart_events_batch(spark, 100, source_id="kafka")
    carts_files = shopping_cart_events_batch(spark, 50, source_id="files")
    catalog = catalog_events_batch(spark, 80)

    # union of same-schema streams
    union_streams(carts, carts_files).groupBy("source_id").count().show()

    # window join: same user within the same 5s tumbling window (projection
    # string ≙ the reference's apply((l, r) => ...) at :50-53)
    wj = window_join(
        carts, catalog, "user_id", "time", "time", "5 seconds",
        projection=[
            F.format_string(
                "user %s bought %s and viewed %s", F.col("user_id"),
                F.col("l_sku"), F.col("r_product_id"),
            ).alias("matched")
        ],
    )
    wj.show(5, truncate=False)

    # interval join: |t_cart - t_catalog| < 2s, same user, bounds exclusive
    ij = interval_join(
        carts, catalog, "user_id", "time", "time", "-2 seconds", "2 seconds"
    )
    ij.select("l_user_id", "l_time", "r_time").show(5)

    # connect: running cart/catalog count ratio (parallelism-1 state machine
    # replayed over the event-time total order)
    result = connect_ratio(carts, catalog, "time", "time")
    result.orderBy(F.desc("ts")).show(5)
    return result


if __name__ == "__main__":
    run()
