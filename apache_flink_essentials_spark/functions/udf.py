"""UDF / UDAF / UDTF surface (SURVEY §2.9) — the engine's mapping of the
reference's function-class hierarchy, with the performance tiers explicit:

  reference class            engine tier
  ─────────────────────────  ──────────────────────────────────────────────
  MapFunction                tier 0: Column expression (ALWAYS preferred)
  MapFunction (opaque)       tier 1: @pandas_udf scalar (Arrow-batched)
  FlatMapFunction            tier 0: explode(array expr); tier 1: pandas_udf
                             returning arrays + explode (UDTF analog)
  ReduceFunction/Aggregate-  tier 0: built-in agg; tier 1: pandas_udf
  Function                   GROUPED_AGG (custom UDAF)
  ProcessFunction et al.     applyInPandasWithState (streaming/stateful.py)

Row-at-a-time ``F.udf`` exists for completeness but is deliberately NOT
exported: ~10-100× slower than Arrow-batched pandas UDFs; nothing in this
engine uses it.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def geo_mean_udaf():
    """Custom UDAF (tier 1) — geometric mean, the canonical 'accumulator'
    aggregation (≙ AggregateFunction's createAccumulator/add/getResult,
    WindowFunctions.scala:87-103). Demonstration of the GROUPED_AGG escape
    hatch; when an expression form exists (here: exp(avg(ln))) prefer it.

    Factory (not a module-level decorator): pandas_udf return-type parsing
    needs an active SparkSession.
    """

    @pandas_udf("double")
    def _geo_mean(v: pd.Series) -> float:
        logs = v[v > 0].map(math.log)
        return float(math.exp(logs.mean())) if len(logs) else None

    return _geo_mean


def geo_mean_expr(col: Column | str) -> Column:
    """Tier-0 equivalent of geo_mean_udaf — exp(avg(ln(x))) — kept JVM-side.
    The pair (udaf, expr) is the engine's worked example that the declarative
    form beats the UDF tier; both are exercised in tests for equality."""
    c = F.col(col) if isinstance(col, str) else col
    return F.exp(F.avg(F.log(F.when(c > 0, c))))


def char_ngrams_udtf():
    """UDTF analog (FlatMapFunction, Transformations.scala:30-37): emit-many
    via array-returning pandas UDF + explode at the call site. Character
    trigrams as the worked example."""

    @pandas_udf("array<string>")
    def _ngrams(text: pd.Series) -> pd.Series:
        return text.map(lambda t: [t[i : i + 3] for i in range(max(len(t) - 2, 0))])

    return _ngrams


def range_udtf():
    """True Python UDTF (Spark 3.5+/4.x table function): the literal
    FlatMapFunction port — an eval() with an imperative emit loop
    (Transformations.scala:31-36 'for i <- 1 until n: out.collect(i)').
    Use via ``df.lateralJoin(rng(col("n")))`` or SQL lateral. Prefer the
    explode form (operators.transform.flat_map_range) — this exists for
    §2.9 surface completeness."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="m: bigint")
    class RangeEmitter:
        def eval(self, n: int):
            for i in range(1, n):
                yield (i,)

    return RangeEmitter
