"""≙ reference DataStreams.scala: the fizzbuzz ETL pipeline (:24-66) —
source → map → filter → map → file sink, plus the simple print job (:10-21).
Flink's operator chain fuses these steps; here whole-stage codegen does
(one stage, zero shuffles — see tests/test_transform.py)."""

import tempfile

from apache_flink_essentials_spark import get_spark
from apache_flink_essentials_spark.io import from_elements, from_sequence, write_files
from apache_flink_essentials_spark.operators.transform import fizzbuzz_pipeline


def run(spark=None):
    spark = spark or get_spark("example-data-streams")

    # readingFromDataStreams (:10-21): fromElements + print sink
    from_elements(spark, [(1,), (2,), (3,), (4,)], "n int").show()

    # fizzBuzz exercise (:24-66): survivors written to a single file
    # (setParallelism(1) analog — demo only; scale path keeps N files)
    result = fizzbuzz_pipeline(from_sequence(spark, 1, 100))
    out = tempfile.mkdtemp(prefix="fizzbuzz_sink_")
    write_files(result, out, fmt="csv", single_file=True)
    result.show()
    print(f"sink: {out}")
    return result


if __name__ == "__main__":
    run()
