"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``apache_flink_essentials_spark``; this module is
the thin contract adapter.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_flink_essentials_spark import registry  # noqa: E402
from apache_flink_essentials_spark.io import load_table  # noqa: E402
from apache_flink_essentials_spark.operators import windows as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's marquee example, WindowFunctions.scala
    :51-66, scaled to the fixture's time grain): registrations ('signup')
    per tumbling event-time window over the events stream table."""
    events = load_table(spark, "events", SMOKE_SF_DIR)
    return W.tumbling(
        events,
        "ts",
        "1 hour",
        [
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "signup", True)).alias("signups"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        ],
    )


def _verified_names() -> dict[str, int]:
    """Names already green in a prior round's CORRECTNESS_r*.json.

    The driver oracle-checks a bounded prefix of ``queries()`` insertion
    order (round 1 covered 49 of 132), so we rotate: queries without a green
    driver row yet are registered first, already-verified ones last. A row
    counts as settled when it hash-matched, OR when its only "failure" is
    ``err == "no_oracle"`` AND the name is *still* oracle-less in the current
    registry — a rows-only check is the best an oracle-less op can ever
    achieve, so re-submitting it wastes checked-prefix slots (round 2 burned
    7 slots this way). But a query that *gains* an oracle later (round 9
    found ``ts_ewma_anomaly`` / ``curation_pack_sequences`` stuck this way)
    must re-enter the checked prefix until it earns a hash-matched row.
    Later rounds' files override earlier ones for the same name.

    Returns ``{name: round}`` where ``round`` is the LATEST round whose
    row for the name is green — the settled tail is then ordered
    stalest-attestation-first so each driver pass re-attests the oldest
    rows (a query rewritten after its green row regains a current row
    within a few rounds instead of never).
    """
    status: dict[str, bool] = {}
    last_green: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            good = (
                not err or (err == "no_oracle" and name not in registry.ORACLES)
            ) and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            status[name] = good
            if good:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return {n: last_green.get(n, 0) for n, g in status.items() if g}


def _family(name: str) -> str:
    return name.split("_", 1)[0]


def _driver_order(names: list[str]) -> list[str]:
    """Unverified oracle-backed names first — round-robin across op
    families so every family gets at least one row inside whatever prefix
    the driver checks — then unverified oracle-less names (whose rows-only
    check is weaker but still new signal), then already-settled names
    ordered STALEST green row first (so the driver's bounded prefix
    re-attests the oldest rows each round, keeping attestation fresh for
    queries rewritten after their green row)."""
    verified = _verified_names()
    has_oracle = set(registry.ORACLES)
    late = getattr(registry, "LATE_ADDITIONS", set())
    pending = [n for n in names if n not in verified]
    pending_oracle = [n for n in pending if n in has_oracle and n not in late]
    pending_late = [n for n in pending if n in has_oracle and n in late]
    pending_rows_only = [n for n in pending if n not in has_oracle]
    reg_idx = {n: i for i, n in enumerate(names)}
    done = sorted(
        (n for n in names if n in verified),
        key=lambda n: (verified[n], reg_idx[n]),
    )
    by_family: dict[str, list[str]] = {}
    for n in pending_oracle:
        by_family.setdefault(_family(n), []).append(n)
    interleaved: list[str] = []
    queues = list(by_family.values())
    while queues:
        queues = [q for q in queues if q]
        for q in queues:
            if q:
                interleaved.append(q.pop(0))
    return interleaved + pending_late + pending_rows_only + done


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _driver_order(list(registry.QUERIES))
    return {n: registry.QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    order = _driver_order(list(registry.QUERIES))
    return {n: registry.ORACLES[n] for n in order if n in registry.ORACLES}
