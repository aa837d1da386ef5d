"""Physical-plan assertions — the 100 TB design contract, checked in CI:
broadcasts where expected, pushdown reaching scans, no Python in hot paths,
bounded exchange counts."""

import __spark_entry__ as E
from apache_flink_essentials_spark.plans import (
    count_exchanges,
    formatted_plan,
    has_pushed_filters,
    uses_broadcast_join,
)
from tests.conftest import SF_SMOKE


def test_q3_broadcasts_customer(spark):
    df = E.queries()["q3_shipping_priority"](spark, SF_SMOKE)
    assert uses_broadcast_join(df)


def test_q5_broadcasts_dimensions(spark):
    df = E.queries()["q5_local_supplier_volume"](spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3


def test_q1_filter_pushed_to_scan(spark):
    df = E.queries()["q1_pricing_summary"](spark, SF_SMOKE)
    assert has_pushed_filters(df)


def test_q1_single_aggregate_exchange(spark):
    # partial → exchange → final HashAggregate: exactly one shuffle
    df = E.queries()["q1_pricing_summary"](spark, SF_SMOKE)
    assert count_exchanges(df) == 1


def test_tumbling_window_one_exchange(spark):
    df = E.queries()["w1_tumbling_hourly"](spark, SF_SMOKE)
    assert count_exchanges(df) == 1


def test_no_python_udf_in_oracle_queries(spark):
    # design rule: oracle-checked (hot-path) queries stay JVM-side; Python
    # appears only in the explicitly stateful/stubbed operators
    offenders = []
    for name in E.oracle_sql():
        plan = formatted_plan(E.queries()[name](spark, SF_SMOKE))
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_knn_broadcasts_queries(spark):
    df = E.queries()["vec_knn_bruteforce"](spark, SF_SMOKE)
    assert uses_broadcast_join(df)


def test_q1_fully_codegen(spark):
    # the whole q1 pipeline (scan→partial agg→final agg) must run inside
    # whole-stage codegen spans — no interpreted operators in the hot path
    from apache_flink_essentials_spark.plans import codegen_stage_count

    df = E.queries()["q1_pricing_summary"](spark, SF_SMOKE)
    assert codegen_stage_count(df) >= 2
