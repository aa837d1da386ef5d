"""The driver's correctness gate, replicated locally: every registered query
with an oracle must hash-match DuckDB at sf0.001 (fast tier; the driver runs
sf0.01 — run scripts/sweep.py for that)."""

import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connection


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF_SMOKE)


def _oracle_cases():
    oracles = E.oracle_sql()
    return [name for name in E.queries() if name in oracles]


@pytest.mark.parametrize("name", _oracle_cases())
def test_oracle_equivalence(spark, con, name):
    df = E.queries()[name](spark, SF_SMOKE)
    result = compare(df, con, E.oracle_sql()[name])
    assert result["ok"], {k: v for k, v in result.items() if k != "ok"}


@pytest.mark.parametrize("name", [n for n in E.queries() if n not in E.oracle_sql()])
def test_rows_only_queries_run(spark, name):
    # no-oracle queries (approximate/stub ops) must at least execute stably
    df = E.queries()[name](spark, SF_SMOKE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
