#!/usr/bin/env python
"""A/B a set of session-config overrides over a named query subset with the
bench methodology (same-SF warm, min of 4). Each invocation is ONE config
variant (fresh JVM); compare across invocations.

    python scripts/confbench.py '<json conf overrides>' name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_flink_essentials_spark import get_spark  # noqa: E402
from apache_flink_essentials_spark import registry  # noqa: E402


def main() -> None:
    conf = json.loads(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="confbench",
        shuffle_partitions=max(8, cpus // 2),
        extra_conf=conf,
    )
    spark.range(1).count()
    total = 0.0
    for name in names:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name}: {best:.3f}s", flush=True)
    print(f"TOTAL: {total:.3f}s")


if __name__ == "__main__":
    main()
