"""Iterative graph analytics: fixed-iteration PageRank.

Companion to the connected-components operator in `dedup.py` (large-star /
small-star): where CC canonicalizes near-duplicate clusters, PageRank ranks
nodes by link structure — the classic "iterative algorithm the engine must
express without a driver-side loop over collect()". The reference has no
graph surface; this is north-star breadth for corpus-graph curation
(domain authority for web-crawl filtering).

Execution shape per iteration (the part that must survive 100 TB):

  * edges are deduplicated, repartitioned ONCE on ``src`` and cached —
    every iteration's join reuses that partitioning, so each round pays
    ONE exchange (ranks → src hash) + ONE aggregation exchange (contribs →
    dst hash); the edge table itself never moves again.
  * dangling mass (nodes with no out-edges) is a one-row aggregate that
    broadcast-cross-joins onto the rank update — it never leaves the
    cluster, so each iteration is ONE job (the eager checkpoint), with no
    per-iteration driver round-trip.
  * ``localCheckpoint`` per iteration truncates lineage so the physical
    plan stays O(1) per round instead of O(iterations) (same pattern as
    `dedup.connected_components`).

Results are plain doubles; summation order across partitions makes the
last ulp partitioning-dependent, so PageRank is registered rows-only (the
driver's weaker check) and its semantics are pinned by hand-computed
pytest fixtures at rtol 1e-9 — the honest contract for iterative float
algorithms (SURVEY §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list → ``(node, rank)``.

    Uniform initial rank 1/N; per iteration
    ``rank(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + dangling/N)``
    where ``dangling`` is the rank mass sitting on nodes without
    out-edges. Ranks sum to 1 every iteration (asserted in tests).
    """
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .repartition("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # also materializes the cached edge/node tables
    if n == 0:
        e.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(iterations):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank", "outdeg")
        # dangling mass stays IN the plan as a one-row aggregate that
        # broadcast-cross-joins onto the rank update — one job per
        # iteration (the eager localCheckpoint), no driver round-trip
        dangling = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        contribs = (
            e.join(with_deg.filter(F.col("outdeg").isNotNull()),
                   e["src"] == with_deg["node"])
            .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping) * F.col("_dangling") / F.lit(float(n))
                 + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )

    e.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_fixedpoint(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank in int64 fixed-point micro-units → ``(node, rank_fp)``.

    Same structure as :func:`pagerank` but every quantity is an integer
    multiple of ``1/scale`` and every division floors:

      ``rank(v) = (15*scale) div (100*n)
                  + (85 * dangling) div (100 * n)
                  + Σ_{u→v} (85 * rank(u)) div (100 * outdeg(u))``

    Integer addition is associative and commutative, so the result is
    BIT-EXACT under any shuffle/summation order — unlike the float form,
    this variant is fully oracle-checkable (the DuckDB twin unrolls the
    same iterations as CTE stages). The quantization error vs true
    PageRank is ≤ iterations·outdeg ulps of 1/scale — irrelevant for
    ranking/filtering use, and the price of exact reproducibility across
    engines and cluster layouts. Damping fixed at 85/100.

    Scale shape is identical to :func:`pagerank`: edges deduped +
    repartitioned once, two exchanges per iteration, one-row dangling
    aggregate broadcast back, localCheckpoint keeps the plan O(1)/round.
    Overflow headroom: rank ≤ scale = 1e12, ×85 ≈ 8.5e13 ≪ 2^63.
    """
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .repartition("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = int(15 * scale) // (100 * n)
    ranks = nodes.withColumn(
        "rank_fp", F.lit(int(scale) // n).cast("long")
    )

    for _ in range(iterations):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank_fp", "outdeg")
        dangling = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).cast("long")
            .alias("_dangling")
        )
        contribs = (
            e.join(with_deg.filter(F.col("outdeg").isNotNull()),
                   e["src"] == with_deg["node"])
            .select(
                F.col("dst"),
                # positive int64 `div` == floor division on both engines
                F.expr("(85 * rank_fp) div (100 * outdeg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (F.lit(base).cast("long")
                 + F.expr(f"(85 * _dangling) div (100 * {n})")
                 + F.coalesce(F.col("contrib"), F.lit(0)).cast("long")
                 ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )

    e.unpersist()
    nodes.unpersist()
    return ranks


def degree_distribution(edges: DataFrame) -> DataFrame:
    """Degree histogram of a (src, dst) edge list — the first thing to
    read before running ANY iterative graph algorithm at scale: the max
    out/in degree bounds the hottest join partition in every pagerank /
    label-propagation / CC superstep, and a power-law tail is the cue to
    salt or cap (the same hot-key story as the dedup tier's bucket caps).

    Edges are deduplicated first (multi-edges inflate degrees); output is
    (side 'src'|'dst', degree, n_nodes) — the distribution, not the
    per-node table, so the result is aggregate-sized at any graph size.

    Scale: one distinct shuffle on the edge pair, then per-side degree
    hash aggs and a degree-histogram agg — all keyed, all map-side
    combined.
    """
    e = edges.select("src", "dst").distinct()
    out_deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.lit("src").alias("side"), "degree")
    )
    in_deg = (
        e.groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.lit("dst").alias("side"), "degree")
    )
    return (
        out_deg.unionByName(in_deg)
        .groupBy("side", "degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("side", "degree")
    )
