#!/usr/bin/env python
"""Per-query micro-bench replicating bench.py methodology (same-SF warm
run, min of 4 samples, full consumption) for a NAMED subset of queries —
the iterate-fast loop while tuning one operator. Also times the DuckDB
oracle twin when one exists so the per-query ratio is visible.

Usage: python scripts/minibench.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_flink_essentials_spark import get_spark  # noqa: E402
from apache_flink_essentials_spark import registry  # noqa: E402
from apache_flink_essentials_spark.schemas import ALL_TABLES  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="minibench", shuffle_partitions=max(8, cpus // 2)
    )
    spark.range(1).count()

    import duckdb

    con = duckdb.connect()
    for t in ALL_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    for name in names:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        sql = registry.ORACLES.get(name)
        dbest = None
        if sql:
            con.sql(sql).fetchall()
            dbest = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                dbest = min(dbest, time.perf_counter() - t0)
        ratio = f" ratio={best / dbest:.2f}x" if dbest else ""
        duck = f" duck={dbest:.3f}s" if dbest else ""
        print(f"{name}: spark={best:.3f}s{duck}{ratio}")


if __name__ == "__main__":
    main()
