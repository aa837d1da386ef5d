"""Skew mitigation utilities.

First line of defense is AQE (enabled in session.py): skewed shuffle/join
partitions are split at runtime from map-output statistics. These helpers
cover the cases AQE can't fix:

  * ``salted_agg`` — a single hot GROUP BY key (AQE can split a partition,
    but one key still lands in one reducer): two-phase aggregation through a
    deterministic salt.
  * ``replicate_join_skewed`` — hot join keys with a non-broadcastable but
    bounded right side: salt the left, replicate the right per salt.
  * ``hot_bucket_salted_join`` — the ADAPTIVE form for bucketed self-joins
    (LSH bands, sign buckets): only keys a broadcast hot-set marks are
    salted, with a per-key slice count, because AQE's skew-join splits by
    partition BYTES while a quadratic within-bucket compare is
    COMPUTE-skewed at tiny byte sizes (a ~1 MB bucket of 50k slim rows is
    n² popcounts in ONE task — the r12 sf1 curve measured 3 stragglers
    carrying a 32-task stage for ~25 min until this landed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[str, Column]],
    salt_from: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot keys: groupBy(keys + salt) computes
    partials across n_salts reducers, then a cheap second agg merges per key.

    ``partials``: out_name → (merge_op in {sum, min, max}, partial_expr).
    counts are expressed as sum-merged count partials. ``salt_from`` must be
    deterministic (hash of some non-key column) so results are replayable.
    """
    salt = F.pmod(F.xxhash64(salt_from), F.lit(n_salts)).alias("_salt")
    first = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[expr.alias(f"_p_{name}") for name, (_op, expr) in partials.items()]
    )
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    second = first.groupBy(*[F.col(k) for k in keys]).agg(
        *[
            merge_fns[op](f"_p_{name}").alias(name)
            for name, (op, _expr) in partials.items()
        ]
    )
    return second


def replicate_join_skewed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_from: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with a salted key: left rows scatter across n_salts
    sub-partitions per key; right rows replicate n_salts× (explode) so every
    (key, salt) pair finds its match. Correct for inner equi-joins; use when
    the hot key's left side overwhelms one reducer and the right side is too
    big to broadcast but small enough to replicate n× ."""
    l = left.withColumn("_salt", F.pmod(F.xxhash64(salt_from), F.lit(n_salts)))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long")))
    )
    return l.join(r, on=[key, "_salt"], how="inner").drop("_salt")


def hot_bucket_salted_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    id_a: str = "id_a",
    threshold: int = 4096,
    max_slices: int = 64,
    max_inline_hot: int = 64,
) -> DataFrame:
    """Self-band-join ``a ⋈ b ON key`` with deterministic salting of hot
    band buckets only. ``a`` must carry one row per corpus element — its
    per-key counts define the hot set (count > ``threshold``), which is
    aggregate-sized by construction (≤ corpus/threshold keys). Hot keys
    get ``S_k = ceil(n_k/threshold) ≤ max_slices`` slices: ``a`` rows
    take slice ``pmod(xxhash64(id_a), S_k)``, ``b`` rows replicate
    across all ``S_k`` slices; cold keys keep salt 0 and zero
    replication. Every (a, b) row combination meets in exactly one
    slice, so join output is identical to the unsalted form — only the
    task-level distribution of the quadratic compare changes.

    Self-funding at low skew (r13, the r12 verdict's one regression):
    the hot set is COLLECTED up front (one bounded aggregate job — the
    same aggregate the broadcast build ran anyway) and the plan adapts:

      * no hot keys (the common case): the plain unsalted equi-join —
        zero salt columns, zero extra joins in the plan;
      * ≤ ``max_inline_hot`` hot keys: the per-key slice counts inline
        as ONE map literal (an O(|hot|) lookup per row — trivial at the
        64-key cap), still no join against the hot set;
      * more (a pathologically hot corpus): the broadcast-join form,
        which never collects more than ``max_inline_hot + 1`` rows here.
    """
    hot = (
        # null keys never survive the equi-join, and a null map key would
        # be rejected by create_map — exclude them from the hot set
        a.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > threshold)
        .select(
            key,
            F.least(
                F.ceil(F.col("_n") / F.lit(threshold)), F.lit(max_slices)
            ).cast("int").alias("_slices"),
        )
    )
    hot_rows = hot.limit(max_inline_hot + 1).collect()
    if not hot_rows:
        return a.join(b, on=key)
    if len(hot_rows) <= max_inline_hot:
        mapping = F.create_map(
            *[
                lit
                for r in hot_rows
                for lit in (F.lit(r[0]), F.lit(int(r[1])))
            ]
        )
        sl_a = F.element_at(mapping, F.col(key))
        a2 = a.withColumn(
            "_salt",
            F.when(
                sl_a.isNotNull(),
                F.pmod(F.xxhash64(F.col(id_a)), sl_a).cast("int"),
            ).otherwise(F.lit(0)),
        )
        sl_b = F.element_at(mapping, F.col(key))
        b2 = b.withColumn(
            "_salt",
            F.explode(
                F.when(
                    sl_b.isNotNull(),
                    F.sequence(F.lit(0), sl_b - F.lit(1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        return a2.join(b2, on=[key, "_salt"]).drop("_salt")
    a2 = (
        a.join(F.broadcast(hot), on=key, how="left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_slices").isNotNull(),
                F.pmod(F.xxhash64(F.col(id_a)), F.col("_slices")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_slices")
    )
    b2 = (
        b.join(F.broadcast(hot), on=key, how="left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_slices").isNotNull(),
                    F.sequence(F.lit(0), F.col("_slices") - F.lit(1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_slices")
    )
    return a2.join(b2, on=[key, "_salt"]).drop("_salt")
