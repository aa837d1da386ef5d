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
