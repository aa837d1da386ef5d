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
