"""Time-series operators: gap-filling with last-observation-carried-forward
(LOCF) and rows-frame moving aggregates — the hypertable-style analytics a
streaming engine's users run on event tables (TimescaleDB's
``time_bucket_gapfill``/``locf`` shape, built from pure DataFrame ops).

The reference's windowed jobs (e.g.
`/root/reference/src/main/scala/essentialsstreams/WindowFunctions.scala`
tumbling windows) bucket time but leave empty buckets ABSENT; gapfill is the
dual operation that a serving layer needs: densify the bucket grid and carry
values forward so every (key, bucket) cell exists.

Scale design: the dense grid is generated PER KEY from that key's own
[min, max] bucket span via `sequence` + `explode` — never a cross join of
keys × global time range, so a key active for one hour costs one row, not
the whole calendar. All shuffles are keyed by (key) or (key, bucket); the
LOCF window is one pass per key partition. At 100 TB, partition the input
by time first (the fixtures are time-ordered parquet) and the per-key spans
prune to the scanned slice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucket_expr(ts_col: str, step_s: int) -> Column:
    """Epoch-second bucket start: floor(epoch/step)*step as BIGINT —
    portable across engines (integer arithmetic only)."""
    return (
        F.floor(F.col(ts_col).cast("long") / step_s) * step_s
    ).cast("long")


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_s: int,
    seq_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Dense per-key time grid at ``step_s`` resolution spanning each key's
    own [min, max] observed buckets; buckets with no observation carry the
    last observed value forward (LOCF). Within a bucket, the LAST
    observation wins, ordered by (``ts_col``, *seq_cols) — pass tiebreakers
    for a total order, or "last" is engine-dependent.

    Output: (key, bucket, value_locf) — ``value_locf`` is never null because
    every key's grid starts at an observed bucket. The carried value is the
    original, untouched double → bit-identical under replay and across
    engines.
    """
    order = [F.col(ts_col).cast("long").desc()] + [
        F.desc(c) for c in (seq_cols or [])
    ]
    win_last = Window.partitionBy(key_col, "bucket").orderBy(*order)
    obs = (
        df.withColumn("bucket", bucket_expr(ts_col, step_s))
        .withColumn("_rn", F.row_number().over(win_last))
        .filter(F.col("_rn") == 1)
        .select(key_col, "bucket", F.col(value_col).alias("_v"))
    )
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step_s))
            ).alias("bucket"),
        )
    )
    win_locf = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(obs, [key_col, "bucket"], "left").select(
        key_col,
        "bucket",
        F.last("_v", ignorenulls=True).over(win_locf).alias("value_locf"),
    )


def moving_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: Sequence[str],
    preceding: int = 3,
) -> DataFrame:
    """Rows-frame moving sum/count/average per key over the ``preceding``+1
    most recent rows in ``order_cols`` order (a total order per key —
    include a tiebreaker column).

    Numeric portability: the frame sum is computed in DECIMAL(18,2) — exact
    in any fold order, so segment-tree window evaluation (DuckDB) and
    Spark's running frames agree bit-for-bit; the average is ONE IEEE
    division of the exact sum by the exact count. One shuffle on the key;
    the frame is evaluated in a single ordered pass per key partition.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-preceding, Window.currentRow)
    )
    msum = F.sum(F.col(value_col).cast("decimal(18,2)")).over(w).cast("double")
    mcnt = F.count("*").over(w)
    return df.select(
        key_col,
        *order_cols,
        msum.alias("moving_sum"),
        mcnt.alias("n_window"),
        (msum / mcnt).alias("moving_avg"),
    )
