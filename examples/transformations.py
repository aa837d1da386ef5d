"""≙ reference Transformations.scala: map (:18,:21-24), flatMap (:27,:30-37),
process (:41-45), keyBy+reduce (:48-56) over fromSequence(1,100) (:15)."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.io import from_sequence
from apache_flink_essentials_spark.operators.transform import (
    flat_map_range,
    key_by_reduce,
    map_columns,
)


def run(spark=None):
    spark = spark or get_spark("example-transformations")
    numbers = from_sequence(spark, 1, 100)

    # map: _ * 2 (both lambda and MapFunction forms are the same expression)
    doubled = map_columns(numbers, n=F.col("n"), doubled=F.col("n") * 2)
    doubled.show(5)

    # flatMap: n => Range(1, n) — explode(sequence), and the ProcessFunction
    # form (:41-45) is this same 1→N shape
    expanded = flat_map_range(from_sequence(spark, 1, 10))
    expanded.show(5)

    # keyBy(_ % 2 == 0).reduce(_ + _)
    reduced = key_by_reduce(
        numbers,
        key=(F.col("n") % 2 == 0),
        value=F.sum("n"),
        key_alias="is_even",
        agg_alias="total",
    )
    reduced.show()
    return reduced


if __name__ == "__main__":
    run()
