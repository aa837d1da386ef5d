"""Partitioned-sink → partition-pruned scan: the 100 TB storage-layout
contract. A hive-partitioned parquet dataset must turn an equality filter on
the partition column into directory pruning (PartitionFilters at the scan),
never a full-data read + row filter."""

from pyspark.sql import functions as F

from apache_flink_essentials_spark.io import load_table, write_files
from apache_flink_essentials_spark.plans import formatted_plan
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    events = load_table(spark, "events", SF_SMOKE)
    path = str(tmp_path / "events_by_type")
    write_files(events, path, partition_by=["event_type"])

    pruned = spark.read.parquet(path).filter(F.col("event_type") == "signup")
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "event_type" in plan

    # pruning is semantically transparent: same rows as filtering the source
    expected = events.filter(F.col("event_type") == "signup").count()
    assert pruned.count() == expected


def test_partitioned_write_round_trips_all_rows(spark, tmp_path):
    events = load_table(spark, "events", SF_SMOKE)
    path = str(tmp_path / "events_all")
    write_files(events, path, partition_by=["event_type"])
    assert spark.read.parquet(path).count() == events.count()


def test_compact_files_reduces_file_count(spark, tmp_path):
    from apache_flink_essentials_spark.io import compact_files

    events = load_table(spark, "events", SF_SMOKE)
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    events.repartition(64).write.parquet(src)  # simulate tiny-file ingest
    assert len(spark.read.parquet(src).inputFiles()) == 64

    compact_files(spark, src, dst, target_mb=256)
    compacted = spark.read.parquet(dst)
    assert len(compacted.inputFiles()) <= 4          # sf0.001 events ≪ 256 MB
    assert compacted.count() == events.count()       # lossless
    # content identical, not just counts
    assert set(map(tuple, compacted.collect())) == set(map(tuple, events.collect()))


def test_compact_files_sorted_rowgroups(spark, tmp_path):
    from apache_flink_essentials_spark.io import compact_files

    events = load_table(spark, "events", SF_SMOKE)
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "sorted")
    events.repartition(16).write.parquet(src)
    compact_files(spark, src, dst, target_mb=256, sort_by=["ts"])
    # sorted-within-file: each output file's rows are ts-ordered
    out = spark.read.parquet(dst).select(
        F.input_file_name().alias("f"), F.col("ts")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("f").orderBy("ts")
    violations = (
        out.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev") > F.col("ts"))
        .count()
    )
    assert violations == 0
