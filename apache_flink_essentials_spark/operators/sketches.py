"""Sketch/approximate aggregation operators — the cardinality/quantile/
frequency estimators a 100 TB pipeline uses where exact answers would
shuffle the world (cf. HyperLogLog: Flajolet et al. '07; count-min: Cormode
& Muthukrishnan '05; Greenwald-Khanna quantiles).

All wrap Spark's built-in JVM sketch implementations (one pass, mergeable
partials — cluster-friendly by construction). Approximate by design →
verified by error-bound tests against exact answers, not the DuckDB oracle
(different engines' sketches differ legitimately).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, col: str, keys: Sequence[str] = (), rsd: float = 0.05
) -> DataFrame:
    """HyperLogLog++ distinct count, mergeable across partitions; rsd is the
    target relative standard deviation (smaller → bigger sketch)."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(f"approx_distinct_{col}")
    )


def hll_sketch_partials(df: DataFrame, col: str, keys: Sequence[str] = ()) -> DataFrame:
    """Re-aggregatable HLL sketch column (binary) — the pattern for rollup
    tables: store per-partition/per-day sketches, union later without
    rescanning (hll_sketch_agg/hll_union_agg, Spark 3.5+)."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.hll_sketch_agg(col).alias(f"hll_{col}")
    )


def hll_merge(df: DataFrame, sketch_col: str, keys: Sequence[str] = ()) -> DataFrame:
    """Merge stored sketches and resolve to an estimate."""
    merged = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.hll_union_agg(sketch_col).alias("merged")
    )
    return merged.select(
        *[F.col(k) for k in keys], F.hll_sketch_estimate("merged").alias("estimate")
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles as an aggregate expression
    (percentile_approx) — one pass, mergeable."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias("quantiles")
    )


def frequent_items(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Heavy hitters above a support threshold (Karp et al. one-pass
    algorithm via DataFrame.freqItems)."""
    return df.freqItems([col], support)


def top_k_by_count(df: DataFrame, col: str | Column, k: int = 10) -> DataFrame:
    """Exact top-k heavy hitters: hash-agg + TakeOrderedAndProject — the
    exact companion to frequent_items (one shuffle, k-row driver merge)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        df.groupBy(c.alias("item"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("item"))
        .limit(k)
    )
