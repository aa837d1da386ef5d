"""SparkSession factory — the engine's execution environment.

Covers the reference's execution-environment surface (SURVEY §2.7):
``StreamExecutionEnvironment.getExecutionEnvironment`` (reference
``DataStreams.scala:12``) maps to a configured ``SparkSession``. Parallelism
knobs (``setParallelism``, ``DataStreams.scala:62``) map to
``spark.sql.shuffle.partitions`` + AQE.

Scale posture: these defaults are tuned so the SAME logical plans scale from
local[32] tests to a 1000-executor cluster — AQE handles runtime partition
coalescing and skew-join splitting; explicit shuffle-partition counts are
only a starting hint that AQE resizes from actual map-output statistics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "apache-flink-essentials-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Configuration rationale, keyed to the 100 TB design goal:
      * AQE on (+ coalescePartitions + skewJoin): runtime re-planning replaces
        hand-tuned partition counts; skewed join keys are split automatically.
      * autoBroadcastJoinThreshold stays default (10 MB) — dimension tables
        (region/nation/supplier) broadcast automatically; we additionally hint
        with ``broadcast()`` where the dimension is known small.
      * Arrow enabled for every pandas-UDF boundary (the only Python-side
        hot paths we allow: stateful ops + vector UDFs).
      * Session timezone pinned to UTC so event-time semantics are
        deterministic and match the DuckDB oracle (naive timestamps = UTC).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # JDK 17 + local[32] + parquet readers: allocation-heavy stages can
        # die with a SPURIOUS "Retried waiting for GCLocker too often" OOM
        # while heap is free — 32 threads keep re-entering JNI critical
        # sections (parquet page decompression) so the retried allocation
        # never sees a completed GC (observed killing a 64.5M-row stage at
        # 8g that succeeds with headroom). Raising the retry count from the
        # default 2 lets the allocation wait out the critical sections
        # instead of throwing; no effect on genuinely-exhausted heaps.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark-warehouse"))
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
        # spark.sql.files.* left at defaults: a measured A/B showed the
        # once-installed global openCostInBytes=128KB bought nothing
        # (totals within 0.4% either way). If a single CPU-heavy scan
        # wants narrower splits, set spark.sql.files.openCostInBytes via
        # spark.conf.set inside that query (it is runtime-settable) and
        # restore after — never globally.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
