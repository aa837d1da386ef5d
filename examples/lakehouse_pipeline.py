"""End-to-end lakehouse CDC pipeline: event changelog → latest-state
snapshot → SCD2 dimension history → point-in-time fact enrichment →
snapshot reconciliation diff.

Composes the cdc tier the way a warehouse ingestion job would: one key
shuffle builds both the snapshot and the history, the point-in-time join
broadcasts the dimension, and the final diff validates a re-derived
snapshot against the incremental one (empty diff = consistent pipeline).

    python -m examples.lakehouse_pipeline [sf_dir]
"""

import sys

from pyspark.sql import functions as F

from apache_flink_essentials_spark import get_spark, load_table
from apache_flink_essentials_spark.operators.cdc import (
    apply_changelog,
    point_in_time_join,
    scd2_history,
    snapshot_diff,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="lakehouse-pipeline")
    events = load_table(spark, "events", sf)
    changes = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )

    snapshot = apply_changelog(changes, ["user_id"], ["ts_s", "event_id"])
    print(f"latest-state snapshot: {snapshot.count()} live keys")

    history = scd2_history(changes, ["user_id"], ["ts_s", "event_id"])
    print(f"SCD2 history: {history.count()} versions, "
          f"{history.filter('is_current').count()} current")

    facts = events.select(
        "event_id", "user_id", F.col("ts").cast("long").alias("ts_s")
    )
    enriched = point_in_time_join(
        facts, history.withColumnRenamed("event_id", "dim_event_id"),
        ["user_id"], "ts_s", ["version"],
    )
    print(f"facts enriched with as-of dimension version: {enriched.count()}")

    # reconciliation: re-derive the snapshot from the history's current
    # slice and diff — an empty diff proves snapshot ≡ history
    rederived = history.filter("is_current").select("user_id", "value")
    diff = snapshot_diff(
        snapshot.select("user_id", "value"), rederived, ["user_id"], ["value"]
    )
    n_diff = diff.count()
    print(f"reconciliation diff rows: {n_diff} (expect 0)")
    assert n_diff == 0, "snapshot and history current-slice disagree"


if __name__ == "__main__":
    main()
