#!/usr/bin/env python
"""Physical-plan audit over every registered query: prints exchanges,
codegen stages, python-eval nodes, broadcast joins, pushed filters — the
'explain and iterate' loop as a one-shot report. Red flags are marked.

    python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_flink_essentials_spark import get_spark  # noqa: E402
from apache_flink_essentials_spark.plans import (  # noqa: E402
    codegen_stage_count,
    count_exchanges,
    formatted_plan,
)
import __spark_entry__ as E  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    print(f"{'query':35} exch codegen python cartesian bcast pushed")
    for name, fn in E.queries().items():
        try:
            df = fn(spark, sf)
            plan = formatted_plan(df)
            exch = count_exchanges(df)
            # executed-plan counter (formatted explain of the pre-execution
            # AQE plan doesn't show codegen stages)
            codegen = codegen_stage_count(df)
            python = ("BatchEvalPython" in plan) or ("ArrowEvalPython" in plan) or (
                "MapInPandas" in plan) or ("FlatMapGroupsInPandas" in plan)
            cartesian = "CartesianProduct" in plan
            bcast = "BroadcastHashJoin" in plan
            pushed = "PushedFilters: [" in plan and "PushedFilters: []" not in plan
            flags = []
            if cartesian:
                flags.append("!!CARTESIAN")
            if python and name in E.oracle_sql():
                flags.append("!!PYTHON-IN-ORACLE-PATH")
            print(
                f"{name:35} {exch:4d} {codegen:7d} {str(python):6} {str(cartesian):9} "
                f"{str(bcast):5} {str(pushed):6} {' '.join(flags)}"
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name:35} ERR {str(ex)[:120]}")


if __name__ == "__main__":
    main()
