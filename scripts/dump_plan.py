#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r12/<name>_<tag>.txt.

    python scripts/dump_plan.py <tag> name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_flink_essentials_spark import get_spark  # noqa: E402
from apache_flink_essentials_spark import registry  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="dump-plan", shuffle_partitions=max(8, cpus // 2))
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
