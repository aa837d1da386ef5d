#!/usr/bin/env python
"""Replicates the driver's correctness gate locally: every registered query
vs its DuckDB oracle. Usage:

    python scripts/sweep.py [sf_dir] [name ...]   # default /root/testdata/sf0.01
                                                  # names: check only these
"""

from __future__ import annotations

import os
import sys
import time

sys.path[:0] = [
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
]

from apache_flink_essentials_spark import get_spark  # noqa: E402
import __spark_entry__ as E  # noqa: E402
from oracle_utils import compare, duck_connection  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="sweep")
    con = duck_connection(sf)
    fails = 0
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            oracle = E.oracle_sql().get(name)
            if oracle:
                r = compare(df, con, oracle)
                ok = r["ok"]
                fails += 0 if ok else 1
                detail = "" if ok else {
                    k: r[k]
                    for k in (
                        "rows_spark",
                        "rows_duck",
                        "only_spark",
                        "only_duck",
                        "type_mismatches",
                    )
                    if k in r
                }
                print(f"{'OK  ' if ok else 'FAIL'} {name} ({time.time()-t0:.1f}s) {detail}")
            else:
                print(f"rows {name}: {df.count()} ({time.time()-t0:.1f}s)")
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"ERR  {name}: {str(ex)[:200]}")
    print(f"DONE fails={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
