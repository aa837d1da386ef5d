"""Registry query module (mechanical split of the former monolithic registry.py,
round 11 — registration order preserved by the package __init__ import order)."""

from __future__ import annotations

from ._common import *  # noqa: F401,F403
from ._common import (  # noqa: F401 — underscore names not covered by *
    _epoch,
    _events,
    _math,
    _register,
    _Win,
)
from .q_round5_7 import _FS_W, _fs_weights_q  # noqa: F401

# =========================================================================
# round 9 batch 5: Holt-Winters seasonal, modularity, cohort value curves
# =========================================================================


def _hw_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS5

    return TS5.holt_winters_from_binned(
        TS5.binned_sums(_events(spark, sf), "ts", "value"), period=24
    )


_register(
    "ts_holt_winters",
    # recursive twin with LIST state: the seasonal vector rotates one
    # slot per step; every l_t reference is inlined identically on both
    # sides so the coupled recursion replays the same IEEE ops
    """
    WITH RECURSIVE b0 AS (
      SELECT floor(epoch(ts))::BIGINT // 3600 AS bin,
             count(*)::BIGINT AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), x AS (
      SELECT bin, (s::DOUBLE) / n AS x,
             row_number() OVER (ORDER BY bin) AS rn
      FROM b0
    ), rec AS (
      SELECT bin, x, rn, x AS level, 0.0::DOUBLE AS trend,
             0.0::DOUBLE AS seasonal,
             list_transform(range(24), i -> 0.0::DOUBLE) AS seas
      FROM x WHERE rn = 1
      UNION ALL
      SELECT b.bin, b.x, b.rn,
             0.5 * (b.x - r.seas[1]) + 0.5 * (r.level + r.trend)
               AS level,
             0.3 * ((0.5 * (b.x - r.seas[1]) + 0.5 * (r.level + r.trend))
                    - r.level) + 0.7 * r.trend AS trend,
             0.2 * (b.x - (0.5 * (b.x - r.seas[1])
                           + 0.5 * (r.level + r.trend)))
             + 0.8 * r.seas[1] AS seasonal,
             list_append(r.seas[2:24],
               0.2 * (b.x - (0.5 * (b.x - r.seas[1])
                             + 0.5 * (r.level + r.trend)))
               + 0.8 * r.seas[1]) AS seas
      FROM rec r JOIN x b ON b.rn = r.rn + 1
    )
    SELECT bin, x, level, trend, seasonal FROM rec ORDER BY bin
    """,
    late=True,
)(_hw_q)


def _modularity_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import graph as G6

    part = (
        load_table(spark, "part", sf)
        .where(F.col("p_brand").startswith("Brand#1"))
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    )
    li = (
        load_table(spark, "lineitem", sf)
        .join(
            F.broadcast(part.select("l_partkey")), "l_partkey", "left_semi"
        )
        .select("l_orderkey", "l_partkey")
    )
    e = G6.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    assign = part.select(
        F.col("l_partkey").alias("node"), F.col("p_brand").alias("community")
    )
    return G6.modularity(e, assign)


_register(
    "graph_modularity",
    """
    WITH pp AS (SELECT p_partkey, p_brand FROM part
                WHERE p_brand LIKE 'Brand#1%'),
    li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS v
           FROM lineitem JOIN pp ON l_partkey = p_partkey),
    e AS MATERIALIZED (SELECT DISTINCT x.v AS a, y.v AS b
          FROM li x JOIN li y ON x.o = y.o AND x.v < y.v),
    deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
              SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
            GROUP BY 1),
    dc AS (SELECT p_brand AS community, sum(degree)::BIGINT AS dcv
           FROM deg JOIN pp ON deg.node = pp.p_partkey GROUP BY 1),
    bsum AS (SELECT count(*)::BIGINT AS n_communities,
                    sum(dcv::HUGEINT * dcv::HUGEINT) AS bb
             FROM dc),
    tagged AS (SELECT ca.p_brand AS c1, cb.p_brand AS c2
               FROM e JOIN pp ca ON e.a = ca.p_partkey
                      JOIN pp cb ON e.b = cb.p_partkey),
    asum AS (SELECT count(*)::BIGINT AS n_edges,
                    sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END)::BIGINT
                      AS within_edges
             FROM tagged)
    SELECT n_edges, n_communities, within_edges,
           within_edges::DOUBLE / n_edges::DOUBLE
           - bb::DOUBLE / (4.0 * n_edges::DOUBLE * n_edges::DOUBLE)
             AS modularity
    FROM asum, bsum
    """,
    late=True,
)(_modularity_q)


def _cohort_value_q(spark: SparkSession, sf: str) -> DataFrame:
    # LTV curves: the retention cohort grid extended with exact decimal
    # purchase value per cell and the cumulative value curve per cohort
    # (window over the CELL relation, not the data)
    from pyspark.sql.window import Window as _W

    ev = _events(spark, sf)
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    cells = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts")).alias("activity_week"),
            F.col("value").cast("decimal(18,2)").alias("_v"),
        )
        .join(cohorts, "user_id")
        .filter(F.col("activity_week") >= F.col("cohort_week"))
        .groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week_epoch"),
            (F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7)
            .cast("int").alias("week_offset"),
        )
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.sum("_v").alias("_pv"),
        )
    )
    w = (
        _W.partitionBy("cohort_week_epoch")
        .orderBy("week_offset")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    return cells.select(
        "cohort_week_epoch",
        "week_offset",
        "n_active",
        F.col("_pv").cast("double").alias("period_value"),
        F.sum("_pv").over(w).cast("double").alias("cum_value"),
    ).orderBy("cohort_week_epoch", "week_offset")


_register(
    "cohort_value_curves",
    """
    WITH cohorts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), cells AS (
      SELECT floor(epoch(cohort_week))::BIGINT AS cohort_week_epoch,
             (date_diff('day', cohort_week,
                        date_trunc('week', e.ts)) / 7)::INT AS week_offset,
             count(DISTINCT e.user_id)::BIGINT AS n_active,
             sum(CAST(e.value AS DECIMAL(18,2))) AS pv
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND date_trunc('week', e.ts) >= cohort_week
      GROUP BY 1, 2
    )
    SELECT cohort_week_epoch, week_offset, n_active,
           pv::DOUBLE AS period_value,
           (sum(pv) OVER (PARTITION BY cohort_week_epoch
              ORDER BY week_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             AS cum_value
    FROM cells ORDER BY cohort_week_epoch, week_offset
    """,
    late=True,
)(_cohort_value_q)


# =========================================================================
# round 9 batch 6: robust drift tails (MAD / Kendall / Bollinger /
# drawdown), Adamic-Adar link prediction, Yule's K, HHI concentration
# =========================================================================


def _mad_bins_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS3

    return TS3.mad_anomalies_from_binned(
        TS3.binned_sums(_events(spark, sf), "ts", "value", 3600), k=5
    )


_register(
    "ts_mad_bins",
    # the drift workbench's robust tail over the SAME binned_sums
    # relation cusum/acf consume; exact lower-median integer contract
    # (vs events_mad_outliers' per-row interpolated-percentile screen)
    """
    WITH b0 AS (
      SELECT floor(epoch(ts))::BIGINT // 3600 AS bin,
             count(*)::BIGINT AS n,
             (sum(CAST(value AS DECIMAL(18,2))) * 100)::BIGINT AS sc
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), bins AS (
      SELECT bin, (sc * 20000 + n) // (2 * n) AS m FROM b0
    ), cnt AS (
      SELECT count(*)::BIGINT AS n FROM bins
    ), rk AS (
      SELECT bin, m, row_number() OVER (ORDER BY m, bin) AS _rk FROM bins
    ), med AS (
      SELECT m AS med_m FROM rk, cnt WHERE _rk = (n + 1) // 2
    ), d AS (
      SELECT bin, m, med_m, abs(m - med_m) AS _d FROM bins, med
    ), rk2 AS (
      SELECT _d, row_number() OVER (ORDER BY _d, bin) AS _rk FROM d
    ), mad AS (
      SELECT _d AS mad FROM rk2, cnt WHERE _rk = (n + 1) // 2
    )
    SELECT bin, m, med_m, mad, (_d > 5 * mad) AS is_anomaly
    FROM d, mad ORDER BY bin
    """,
    late=True,
)(_mad_bins_q)


def _kendall_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS3

    return TS3.kendall_from_binned(
        TS3.binned_sums(_events(spark, sf), "ts", "value", 3600)
    )


_register(
    "ts_kendall_trend",
    """
    WITH b0 AS (
      SELECT floor(epoch(ts))::BIGINT // 3600 AS bin,
             count(*)::BIGINT AS n,
             (sum(CAST(value AS DECIMAL(18,2))) * 100)::BIGINT AS sc
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), bins AS (
      SELECT bin, (sc * 20000 + n) // (2 * n) AS m FROM b0
    ), cnt AS (
      SELECT count(*)::BIGINT AS n_bins FROM bins
    ), agg AS (
      SELECT count(*)::BIGINT AS n_pairs,
             sum(CASE WHEN b.m > a.m THEN 1 ELSE 0 END)::BIGINT
               AS concordant,
             sum(CASE WHEN b.m < a.m THEN 1 ELSE 0 END)::BIGINT
               AS discordant,
             sum(CASE WHEN b.m = a.m THEN 1 ELSE 0 END)::BIGINT AS ties
      FROM bins a JOIN bins b ON a.bin < b.bin
    )
    SELECT n_bins, n_pairs, concordant, discordant, ties,
           (concordant - discordant) / n_pairs::DOUBLE AS kendall_tau
    FROM agg, cnt
    """,
    late=True,
)(_kendall_q)


def _bollinger_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS3

    return TS3.bollinger_from_binned(
        TS3.binned_sums(_events(spark, sf), "ts", "value", 3600),
        window=24, k=2,
    )


_register(
    "ts_bollinger_breaks",
    # exact integer predicate (w·m − S1)² > k²·(w·S2 − S1²) on the
    # HUGEINT/DECIMAL(38,0) pathway — no float reaches the booleans
    """
    WITH b0 AS (
      SELECT floor(epoch(ts))::BIGINT // 3600 AS bin,
             count(*)::BIGINT AS n,
             (sum(CAST(value AS DECIMAL(18,2))) * 100)::BIGINT AS sc
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), bins AS (
      SELECT bin, (sc * 20000 + n) // (2 * n) AS m FROM b0
    ), roll AS (
      SELECT bin, m,
             count(*) OVER w AS win_n,
             sum(m::HUGEINT) OVER w AS s1,
             sum(m::HUGEINT * m::HUGEINT) OVER w AS s2
      FROM bins
      WINDOW w AS (ORDER BY bin ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT bin, m, win_n::BIGINT AS win_n,
           ((24::HUGEINT * m - s1) * (24::HUGEINT * m - s1)
              > 4::HUGEINT * (24::HUGEINT * s2 - s1 * s1))
             AND (24::HUGEINT * m - s1 > 0) AS is_upper_break,
           ((24::HUGEINT * m - s1) * (24::HUGEINT * m - s1)
              > 4::HUGEINT * (24::HUGEINT * s2 - s1 * s1))
             AND (24::HUGEINT * m - s1 < 0) AS is_lower_break
    FROM roll WHERE win_n = 24 ORDER BY bin
    """,
    late=True,
)(_bollinger_q)


def _drawdown_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS3

    return TS3.max_drawdown(
        _events(spark, sf), "ts", "value", "event_type", step_s=86400
    )


_register(
    "ts_max_drawdown",
    """
    WITH bins AS (
      SELECT event_type AS key, floor(epoch(ts))::BIGINT // 86400 AS bin,
             (sum(CAST(value AS DECIMAL(18,2))) * 100)::BIGINT AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), run AS (
      SELECT key, bin, v,
             max(v) OVER (PARTITION BY key ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM bins
    )
    SELECT key AS event_type, count(*)::BIGINT AS n_bins,
           max(peak)::BIGINT AS peak_cents,
           max(peak - v)::BIGINT AS max_drawdown_cents,
           max((peak - v) / peak::DOUBLE) AS max_dd_frac
    FROM run GROUP BY 1 ORDER BY 1
    """,
    late=True,
)(_drawdown_q)


def _adamic_adar_q(spark: SparkSession, sf: str) -> DataFrame:
    # same region-scoped sourcing graph as graph_supplier_overlap (the
    # scoping cuts the wedge degree BEFORE the quadratic step), but a
    # different region and the AA weighting: rare shared customers
    # dominate the score instead of washing out in the raw count
    from apache_flink_essentials_spark.operators import graph as G6

    region_suppliers = (
        load_table(spark, "supplier", sf)
        .join(F.broadcast(load_table(spark, "nation", sf)
                          .where(F.col("n_regionkey") == 1)),
              F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    bip = (
        load_table(spark, "orders", sf)
        .join(load_table(spark, "lineitem", sf)
              .join(F.broadcast(region_suppliers), "l_suppkey",
                    "left_semi"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("l_suppkey").alias("node"),
                F.col("o_custkey").alias("nb"))
    )
    return (
        G6.adamic_adar_pairs(bip, "node", "nb")
        .orderBy(F.col("aa_micro").desc(), "node_a", "node_b")
        .limit(20)
    )


_register(
    "graph_adamic_adar",
    """
    WITH rs AS (SELECT s_suppkey FROM supplier JOIN nation
                  ON s_nationkey = n_nationkey WHERE n_regionkey = 1),
    base AS (SELECT DISTINCT l_suppkey AS node, o_custkey AS nb
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             JOIN rs ON l_suppkey = s_suppkey),
    nbw AS (SELECT nb, floor(1000000.0 / ln(count(*)) + 0.5)::BIGINT AS w
            FROM base GROUP BY 1 HAVING count(*) >= 2),
    pairs AS (SELECT x.node AS node_a, y.node AS node_b,
                     count(*)::BIGINT AS n_common,
                     sum(w)::BIGINT AS aa_micro
              FROM base x JOIN base y
                ON x.nb = y.nb AND x.node < y.node
              JOIN nbw ON x.nb = nbw.nb
              GROUP BY 1, 2)
    SELECT node_a, node_b, n_common, aa_micro,
           aa_micro / 1000000.0 AS aa_score
    FROM pairs ORDER BY aa_micro DESC, node_a, node_b LIMIT 20
    """,
    late=True,
)(_adamic_adar_q)


_register(
    "text_yule_k",
    r"""
    WITH tt AS (
      SELECT grp, term, count(*)::BIGINT AS c
      FROM (SELECT lang AS grp,
                   unnest(string_split_regex(lower(text), '\s+')) AS term
            FROM documents)
      WHERE term != '' GROUP BY 1, 2
    ), g AS (
      SELECT grp, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
             sum(c::HUGEINT * c::HUGEINT) AS s2
      FROM tt GROUP BY 1
    )
    SELECT grp AS lang, n_tokens, n_types,
           (10000::HUGEINT * (s2 - n_tokens))::DOUBLE
             / (n_tokens::DOUBLE * n_tokens::DOUBLE) AS yule_k
    FROM g ORDER BY lang
    """,
    late=True,
)(lambda spark, sf: X.yule_k(load_table(spark, "documents", sf), "lang"))


def _hhi_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import profiling as P6

    df = (
        load_table(spark, "orders", sf)
        .join(load_table(spark, "customer", sf),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(load_table(spark, "nation", sf)),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return P6.concentration_hhi(df, "n_name", "o_custkey", "o_totalprice")


_register(
    "events_hhi_concentration",
    """
    WITH pe AS (
      SELECT n_name AS grp, o_custkey AS ent,
             sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS r
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_totalprice IS NOT NULL
      GROUP BY 1, 2
    ), g AS (
      SELECT grp, count(*)::BIGINT AS n_entities,
             sum(r)::BIGINT AS total_cents,
             sum(r::HUGEINT * r::HUGEINT) AS s2, max(r)::BIGINT AS mx
      FROM pe GROUP BY 1
    )
    SELECT grp AS n_name, n_entities, total_cents,
           s2::DOUBLE / (total_cents::DOUBLE * total_cents::DOUBLE) AS hhi,
           mx / total_cents::DOUBLE AS top_share
    FROM g ORDER BY n_name
    """,
    late=True,
)(_hhi_q)


# =========================================================================
# round 9 batch 7: Markov stationary distribution, discriminative
# log-odds vocabulary, funnel latency quantiles, date-consistency audit,
# permutation entropy, FS threshold sweep
# =========================================================================


def _markov_stationary_q(spark: SparkSession, sf: str) -> DataFrame:
    return T.markov_stationary(
        _events(spark, sf), "user_id", "ts", "event_type",
        iterations=12, order_cols=["event_id"],
    )


def _markov_oracle(iterations: int = 12) -> str:
    """Unrolled power iteration (MATERIALIZED per the CTE-inlining
    convention — each stage must evaluate once, not 3^k times)."""
    head = """
    WITH pairs AS MATERIALIZED (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ), t AS MATERIALIZED (
      SELECT from_type, to_type, count(*)::BIGINT AS c,
             sum(count(*)) OVER (PARTITION BY from_type)::BIGINT AS cf
      FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
    ), states AS MATERIALIZED (
      SELECT from_type AS s FROM t UNION SELECT to_type FROM t
    ), dang AS MATERIALIZED (
      SELECT s FROM states EXCEPT SELECT DISTINCT from_type FROM t
    ), p0 AS MATERIALIZED (
      SELECT s, (1000000 // (SELECT count(*) FROM states))::BIGINT AS pi
      FROM states
    )"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""", p{i} AS MATERIALIZED (
      SELECT st.s,
             (coalesce(inc.m, 0)
              + CASE WHEN st.s IN (SELECT s FROM dang)
                     THEN prev.pi ELSE 0 END)::BIGINT AS pi
      FROM states st
      JOIN p{i - 1} prev ON prev.s = st.s
      LEFT JOIN (SELECT t.to_type AS s,
                        sum((p.pi * t.c) // t.cf)::BIGINT AS m
                 FROM p{i - 1} p JOIN t ON t.from_type = p.s
                 GROUP BY 1) inc ON inc.s = st.s
    )""")
    tail = f"""
    SELECT s AS event_type, pi AS pi_micro, pi / 1000000.0 AS pi
    FROM p{iterations} ORDER BY event_type
    """
    return head + "".join(steps) + tail


_register(
    "events_markov_stationary", _markov_oracle(12), late=True
)(_markov_stationary_q)


_register(
    "text_log_odds_en",
    r"""
    WITH tt AS (
      SELECT term,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ct,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS cr
      FROM (SELECT lang,
                   unnest(string_split_regex(lower(text), '\s+')) AS term
            FROM documents)
      WHERE term != '' GROUP BY 1
    ), tot AS (
      SELECT sum(ct)::BIGINT AS nt, sum(cr)::BIGINT AS nr FROM tt
    ), s AS (
      SELECT term, ct, cr,
             (floor(ln((ct + 1) / (nt - ct + 1)) * 1e6 + 0.5)::BIGINT
              - floor(ln((cr + 1) / (nr - cr + 1)) * 1e6 + 0.5)::BIGINT)
               AS log_odds_micro
      FROM tt, tot
    )
    SELECT term, ct, cr, log_odds_micro,
           log_odds_micro / 1000000.0 AS log_odds
    FROM s WHERE ct + cr >= 10
    ORDER BY abs(log_odds_micro) DESC, term LIMIT 20
    """,
    late=True,
)(lambda spark, sf: X.log_odds_terms(
    load_table(spark, "documents", sf), "en", "lang",
    top_n=20, min_count=10,
))


def _funnel_gap_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import patterns as PA7

    return PA7.funnel_gap_quantiles(
        _events(spark, sf), "user_id", "ts", "event_type",
        "signup", "purchase",
    )


_register(
    "events_funnel_gap_quantiles",
    """
    WITH f AS (
      SELECT user_id AS k, min(floor(epoch(ts))::BIGINT) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ), g AS (
      SELECT e.user_id AS k,
             min(floor(epoch(e.ts))::BIGINT) - min(f.t0) AS gap_s
      FROM events e JOIN f ON e.user_id = f.k
      WHERE e.event_type = 'purchase'
        AND floor(epoch(e.ts))::BIGINT >= f.t0
      GROUP BY 1
    ), r AS (
      SELECT k, gap_s, row_number() OVER (ORDER BY gap_s, k) AS rk,
             count(*) OVER ()::BIGINT AS n
      FROM g
    )
    SELECT max(n)::BIGINT AS n_converted, min(gap_s)::BIGINT AS min_s,
           max(CASE WHEN rk = greatest(1, (1 * (n + 1)) // 4)
                    THEN gap_s END)::BIGINT AS p25_s,
           max(CASE WHEN rk = greatest(1, (2 * (n + 1)) // 4)
                    THEN gap_s END)::BIGINT AS median_s,
           max(CASE WHEN rk = greatest(1, (3 * (n + 1)) // 4)
                    THEN gap_s END)::BIGINT AS p75_s,
           max(gap_s)::BIGINT AS max_s
    FROM r
    """,
    late=True,
)(_funnel_gap_q)


def _date_audit_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import profiling as P7

    j = (
        load_table(spark, "lineitem", sf)
        .join(load_table(spark, "orders", sf),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderstatus", "o_orderdate", "l_shipdate")
    )
    return P7.date_consistency_audit(
        j, "o_orderdate", "l_shipdate", "o_orderstatus", late_days=90
    )


_register(
    "dq_date_consistency",
    """
    WITH j AS (
      SELECT o_orderstatus AS grp,
             floor(epoch(o_orderdate))::BIGINT AS e,
             floor(epoch(l_shipdate))::BIGINT AS l
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT grp AS o_orderstatus, count(*)::BIGINT AS n_rows,
           sum(CASE WHEN l < e THEN 1 ELSE 0 END)::BIGINT AS n_violations,
           sum(CASE WHEN l > e + 7776000 THEN 1 ELSE 0 END)::BIGINT
             AS n_late,
           sum(CASE WHEN l < e THEN 1 ELSE 0 END)::BIGINT
             / count(*)::BIGINT AS violation_rate,
           sum(CASE WHEN l > e + 7776000 THEN 1 ELSE 0 END)::BIGINT
             / count(*)::BIGINT AS late_rate
    FROM j GROUP BY 1 ORDER BY 1
    """,
    late=True,
)(_date_audit_q)


def _perm_entropy_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS3

    return TS3.permutation_entropy_from_binned(
        TS3.binned_sums(_events(spark, sf), "ts", "value", 3600)
    )


_register(
    "ts_permutation_entropy",
    """
    WITH b0 AS (
      SELECT floor(epoch(ts))::BIGINT // 3600 AS bin,
             count(*)::BIGINT AS n,
             (sum(CAST(value AS DECIMAL(18,2))) * 100)::BIGINT AS sc
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), bins AS (
      SELECT bin, (sc * 20000 + n) // (2 * n) AS m FROM b0
    ), tri AS (
      SELECT lag(m, 2) OVER (ORDER BY bin) AS a,
             lag(m, 1) OVER (ORDER BY bin) AS b,
             m AS c
      FROM bins
    ), pat AS (
      SELECT CASE WHEN a <= b AND b <= c THEN '012'
                  WHEN a <= b AND NOT b <= c AND a <= c THEN '021'
                  WHEN a <= b AND NOT b <= c AND NOT a <= c THEN '201'
                  WHEN NOT a <= b AND a <= c THEN '102'
                  WHEN NOT a <= b AND NOT a <= c AND b <= c THEN '120'
                  ELSE '210' END AS pattern
      FROM tri WHERE a IS NOT NULL AND b IS NOT NULL
    ), counts AS (
      SELECT pattern, count(*)::BIGINT AS n FROM pat GROUP BY 1
    ), wp AS (
      SELECT n, sum(n) OVER ()::BIGINT AS nn FROM counts
    )
    SELECT max(nn)::BIGINT AS n_triples, count(*)::BIGINT AS n_patterns,
           round(-sum((n / nn) * ln(n / nn)), 6) AS perm_entropy,
           round(-sum((n / nn) * ln(n / nn)) / ln(6.0), 6)
             AS normalized_pe
    FROM wp
    """,
    late=True,
)(_perm_entropy_q)


_ER_SWEEP_GRID = [
    -4_000_000, -2_000_000, 0, 2_000_000, 4_000_000,
    6_000_000, 8_000_000, 10_000_000, 12_000_000,
]


def _er_sweep_q(spark: SparkSession, sf: str) -> DataFrame:
    return J.threshold_sweep(
        _fs_weights_q(spark, sf), "weight_micro", _ER_SWEEP_GRID
    )


def _er_sweep_oracle() -> str:
    grid = ", ".join(f"({t})" for t in _ER_SWEEP_GRID)
    return f"""
    WITH cand AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON lower(substr(a.c_name, 1, 16)) = lower(substr(b.c_name, 1, 16))
       AND a.c_custkey < b.c_custkey
    ), j AS (
      SELECT id_a, id_b,
             (levenshtein(lower(a.c_name), lower(b.c_name)) <= 1)::INT
               AS agree_name,
             (a.c_nationkey = b.c_nationkey)::INT AS agree_nation,
             (a.c_mktsegment = b.c_mktsegment)::INT AS agree_segment
      FROM cand
      JOIN customer a ON a.c_custkey = id_a
      JOIN customer b ON b.c_custkey = id_b
    ), w AS (
      SELECT (CASE WHEN agree_name = 1 THEN {_FS_W["name"][0]}
                   ELSE {_FS_W["name"][1]} END
              + CASE WHEN agree_nation = 1 THEN {_FS_W["nation"][0]}
                     ELSE {_FS_W["nation"][1]} END
              + CASE WHEN agree_segment = 1 THEN {_FS_W["segment"][0]}
                     ELSE {_FS_W["segment"][1]} END)::BIGINT
               AS weight_micro
      FROM j
    ), sc AS (
      SELECT weight_micro AS _w, count(*)::BIGINT AS _c
      FROM w GROUP BY 1
    ), grid(threshold_micro) AS (VALUES {grid})
    SELECT threshold_micro::BIGINT AS threshold_micro,
           sum(_c)::BIGINT AS n_pairs,
           sum(CASE WHEN _w >= threshold_micro THEN _c ELSE 0 END)::BIGINT
             AS n_above,
           sum(CASE WHEN _w >= threshold_micro THEN _c ELSE 0 END)::BIGINT
             / sum(_c)::BIGINT AS frac_above
    FROM sc, grid GROUP BY 1 ORDER BY 1
    """


_register("er_threshold_sweep", _er_sweep_oracle(), late=True)(_er_sweep_q)


# =========================================================================
# round 9 batch 8: HITS hubs/authorities, kNN label vote, running
# revenue share, revenue deciles
# =========================================================================


def _hits_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import graph as G8

    edges = (
        load_table(spark, "lineitem", sf)
        .join(load_table(spark, "orders", sf),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string"))
            .alias("dst"),
        )
    )
    return G8.hits_fixedpoint(edges, iterations=6)


def _hits_oracle(iterations: int = 6) -> str:
    head = """
    WITH e AS MATERIALIZED (
      SELECT DISTINCT 'S' || l_suppkey::VARCHAR AS src,
                      'C' || o_custkey::VARCHAR AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), srcs AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
    dsts AS MATERIALIZED (SELECT DISTINCT dst AS node FROM e),
    h0 AS MATERIALIZED (
      SELECT node,
             (1000000 // (SELECT count(*) FROM srcs))::BIGINT AS h
      FROM srcs
    )"""
    steps = []
    for i in range(1, iterations + 1):
        prev_h = f"h{i - 1}"
        steps.append(f""", a{i}r AS MATERIALIZED (
      SELECT e.dst AS node, sum(p.h)::BIGINT AS a
      FROM e JOIN {prev_h} p ON e.src = p.node GROUP BY 1
    ), a{i} AS MATERIALIZED (
      SELECT node,
             ((a * 1000000) // (SELECT sum(a) FROM a{i}r))::BIGINT AS a
      FROM a{i}r
    ), h{i}r AS MATERIALIZED (
      SELECT e.src AS node, sum(p.a)::BIGINT AS h
      FROM e JOIN a{i} p ON e.dst = p.node GROUP BY 1
    ), h{i} AS MATERIALIZED (
      SELECT node,
             ((h * 1000000) // (SELECT sum(h) FROM h{i}r))::BIGINT AS h
      FROM h{i}r
    )""")
    tail = f"""
    SELECT n.node, coalesce(hh.h, 0)::BIGINT AS hub_micro,
           coalesce(aa.a, 0)::BIGINT AS auth_micro
    FROM (SELECT node FROM srcs UNION SELECT node FROM dsts) n
    LEFT JOIN h{iterations} hh ON hh.node = n.node
    LEFT JOIN a{iterations} aa ON aa.node = n.node
    ORDER BY n.node
    """
    return head + "".join(steps) + tail


_register("graph_hits_fixedpoint", _hits_oracle(6), late=True)(_hits_q)


def _knn_vote_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    return V.knn_label_vote(
        emb, emb.filter(F.col("vec_id") % 50 == 0), k=5
    )


_register(
    "vec_knn_label_vote",
    """
    WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
         q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id % 50 = 0),
         scored AS (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                  e.label AS _nl,
                  round(
                    list_aggregate(list_transform(range(1, 65),
                        i -> q.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE),
                      'sum')
                    / (sqrt(list_aggregate(list_transform(range(1, 65),
                        i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE),
                      'sum'))
                     * sqrt(list_aggregate(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE),
                      'sum'))),
                  6) AS cosine
           FROM q, e WHERE q.vec_id != e.vec_id
         ), topk AS (
           SELECT query_id, _nl FROM (
             SELECT query_id, _nl, cosine,
                    row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rank
             FROM scored
           ) WHERE rank <= 5
         ), votes AS (
           SELECT query_id, _nl, count(*)::BIGINT AS votes
           FROM topk GROUP BY 1, 2
         ), pred AS (
           SELECT query_id, _nl AS predicted_label, votes FROM (
             SELECT query_id, _nl, votes,
                    row_number() OVER (PARTITION BY query_id
                        ORDER BY votes DESC, _nl ASC) AS r
             FROM votes
           ) WHERE r = 1
         )
    SELECT p.query_id, q.label AS true_label, p.predicted_label, p.votes,
           (p.predicted_label = q.label) AS correct
    FROM pred p JOIN q ON q.vec_id = p.query_id
    ORDER BY p.query_id
    """,
    late=True,
)(_knn_vote_q)


def _running_share_q(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W9

    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per = (
        load_table(spark, "orders", sf)
        .join(load_table(spark, "customer", sf),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(load_table(spark, "nation", sf)),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            (F.col("o_orderdate").cast("long") / F.lit(2592000))
            .cast("long").alias("period"),
        )
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = (
        W9.partitionBy("n_name").orderBy("period")
        .rowsBetween(W9.unboundedPreceding, W9.currentRow)
    )
    wt = W9.partitionBy("n_name")
    return per.select(
        "n_name", "period", "rev_cents",
        F.sum("rev_cents").over(w).alias("cum_cents"),
        (F.sum("rev_cents").over(w) / F.sum("rev_cents").over(wt))
        .alias("cum_share"),
    ).orderBy("n_name", "period")


_register(
    "olap_running_share",
    # 30-day integer periods (epoch div 2592000): calendar months need
    # engine-matched tz/date logic; the integer bin is the portable form
    """
    WITH per AS (
      SELECT n_name, floor(epoch(o_orderdate))::BIGINT // 2592000 AS period,
             sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT
               AS rev_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, period, rev_cents,
           sum(rev_cents) OVER (PARTITION BY n_name ORDER BY period
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS cum_cents,
           sum(rev_cents) OVER (PARTITION BY n_name ORDER BY period
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             / sum(rev_cents) OVER (PARTITION BY n_name)::BIGINT
             AS cum_share
    FROM per ORDER BY n_name, period
    """,
    late=True,
)(_running_share_q)


def _revenue_deciles_q(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W9

    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cust = (
        load_table(spark, "orders", sf)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(cents).alias("rev_cents"))
    )
    # reuse the CCNet bucketing operator across domains: score = weight
    # = revenue -> equal-count customer deciles with exact cents mass
    dec = CU.perplexity_buckets(
        cust, n_buckets=10, score_col="rev_cents",
        id_col="c_custkey", weight_col="rev_cents",
    )
    w_all = W9.rowsBetween(W9.unboundedPreceding, W9.unboundedFollowing)
    w_cum = W9.orderBy("bucket").rowsBetween(
        W9.unboundedPreceding, W9.currentRow
    )
    return dec.select(
        F.col("bucket").alias("decile"),
        F.col("n_docs").alias("n_customers"),
        "rev_cents",
        (F.col("rev_cents") / F.sum("rev_cents").over(w_all))
        .alias("rev_share"),
        (F.sum("rev_cents").over(w_cum) / F.sum("rev_cents").over(w_all))
        .alias("cum_share"),
    ).orderBy("decile")


_register(
    "events_revenue_deciles",
    """
    WITH cust AS (
      SELECT o_custkey AS c_custkey,
             sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT
               AS rev_cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT rev_cents,
             row_number() OVER (ORDER BY rev_cents, c_custkey) AS rn,
             count(*) OVER () AS n
      FROM cust
    ), dec AS (
      SELECT (floor(((rn - 1) * 10) / n) + 1)::BIGINT AS decile,
             count(*)::BIGINT AS n_customers,
             sum(rev_cents)::BIGINT AS rev_cents
      FROM ranked GROUP BY 1
    )
    SELECT decile, n_customers, rev_cents,
           rev_cents / sum(rev_cents) OVER ()::BIGINT AS rev_share,
           sum(rev_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             / sum(rev_cents) OVER ()::BIGINT AS cum_share
    FROM dec ORDER BY decile
    """,
    late=True,
)(_revenue_deciles_q)


# =========================================================================
# round 9 batch 9: KMV cardinality audit, inter-arrival burstiness,
# top-N per group, PK uniqueness audit
# =========================================================================


def _kmv_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import sketches as SK9

    return SK9.kmv_distinct(_events(spark, sf), "user_id", k=64)


_register(
    "sketch_kmv_distinct",
    """
    WITH h AS (
      SELECT DISTINCT
        ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT AS _h
      FROM events WHERE user_id IS NOT NULL
    ), kth AS (
      SELECT count(*)::BIGINT AS k_used, max(_h)::BIGINT AS kth_hash
      FROM (SELECT _h FROM h ORDER BY _h LIMIT 64)
    ), ex AS (
      SELECT count(*)::BIGINT AS n_exact FROM h
    ), est AS (
      SELECT n_exact, k_used, kth_hash,
             CASE WHEN n_exact < 64 THEN n_exact::DOUBLE
                  ELSE (63 * 281474976710656) / kth_hash
             END AS kmv_estimate
      FROM ex, kth
    )
    SELECT n_exact, k_used, kth_hash, kmv_estimate,
           (kmv_estimate - n_exact) / n_exact AS rel_error
    FROM est
    """,
    late=True,
)(_kmv_q)


def _burstiness_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS3

    return TS3.interarrival_burstiness(
        _events(spark, sf), "user_id", "ts", "event_type"
    )


_register(
    "ts_interarrival_burstiness",
    """
    WITH g AS (
      SELECT event_type AS type,
             floor(epoch(ts))::BIGINT
               - lag(floor(epoch(ts))::BIGINT) OVER (
                   PARTITION BY event_type, user_id ORDER BY ts) AS _g
      FROM events
    ), a AS (
      SELECT type, count(*)::BIGINT AS n_gaps, sum(_g)::BIGINT AS s1,
             sum(_g::HUGEINT * _g::HUGEINT) AS s2
      FROM g WHERE _g IS NOT NULL GROUP BY 1
    )
    SELECT type AS event_type, n_gaps, s1 / n_gaps AS mean_gap_s,
           round(
             (sqrt((n_gaps::HUGEINT * s2 - s1::HUGEINT * s1)::DOUBLE)
                / n_gaps - s1 / n_gaps)
             / (sqrt((n_gaps::HUGEINT * s2 - s1::HUGEINT * s1)::DOUBLE)
                / n_gaps + s1 / n_gaps), 6) AS burstiness
    FROM a ORDER BY event_type
    """,
    late=True,
)(_burstiness_q)


def _topn_group_q(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W9

    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    per = (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(load_table(spark, "part", sf)
                          .select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = W9.partitionBy("p_brand").orderBy(
        F.desc("rev_cents"), F.asc("p_partkey")
    )
    return (
        per.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "rev_cents", "rank")
        .orderBy("p_brand", "rank")
    )


_register(
    "olap_topn_per_group",
    """
    WITH per AS (
      SELECT p_brand, p_partkey,
             sum(floor(l_extendedprice * (1 - l_discount) * 100
                       + 0.5)::BIGINT)::BIGINT AS rev_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    SELECT p_brand, p_partkey, rev_cents, rank FROM (
      SELECT p_brand, p_partkey, rev_cents,
             row_number() OVER (PARTITION BY p_brand
                 ORDER BY rev_cents DESC, p_partkey ASC)::INT AS rank
      FROM per
    ) WHERE rank <= 3 ORDER BY p_brand, rank
    """,
    late=True,
)(_topn_group_q)


_UNIQ_SPECS = [
    ("customer.c_custkey", "customer", "c_custkey"),
    ("documents.doc_id", "documents", "doc_id"),
    ("embeddings.vec_id", "embeddings", "vec_id"),
    ("events.event_id", "events", "event_id"),
    ("lineitem.(l_orderkey,l_linenumber)", "lineitem", None),
    ("nation.n_nationkey", "nation", "n_nationkey"),
    ("orders.o_orderkey", "orders", "o_orderkey"),
    ("part.p_partkey", "part", "p_partkey"),
    ("region.r_regionkey", "region", "r_regionkey"),
    ("supplier.s_suppkey", "supplier", "s_suppkey"),
]


def _uniqueness_q(spark: SparkSession, sf: str) -> DataFrame:
    # PK-uniqueness audit across every declared key — referential_audit's
    # sibling (keys EXIST there; keys are UNIQUE here). Each relation is
    # one count/count-distinct aggregate; the union is one-row branches.
    outs = []
    for name, table, col in _UNIQ_SPECS:
        t = load_table(spark, table, sf)
        # composite keys count as a STRUCT: multi-column countDistinct
        # drops rows where ANY column is NULL, while DuckDB's
        # count(DISTINCT (a, b)) keeps structs with NULL fields — the
        # struct form makes both engines keep them (null-safe grouping)
        key = (
            F.countDistinct(F.col(col))
            if col is not None
            else F.countDistinct(
                F.struct(F.col("l_orderkey"), F.col("l_linenumber"))
            )
        )
        outs.append(
            t.agg(
                F.count(F.lit(1)).alias("n_rows"),
                key.cast("long").alias("n_distinct"),
            ).select(
                F.lit(name).alias("relation"),
                "n_rows",
                "n_distinct",
                (F.col("n_rows") - F.col("n_distinct")).alias("n_dup_rows"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("relation")


def _uniqueness_oracle() -> str:
    parts = []
    for name, table, col in _UNIQ_SPECS:
        key = (
            f"count(DISTINCT {col})"
            if col is not None
            else "count(DISTINCT (l_orderkey, l_linenumber))"
        )
        parts.append(f"""
      SELECT '{name}' AS relation, count(*)::BIGINT AS n_rows,
             {key}::BIGINT AS n_distinct,
             (count(*) - {key})::BIGINT AS n_dup_rows
      FROM {table}""")
    return " UNION ALL ".join(parts) + " ORDER BY relation"


_register("dq_uniqueness_audit", _uniqueness_oracle(), late=True)(
    _uniqueness_q
)


# =========================================================================
# round 10: functional-dependency violation mining (g3 error audit)
# =========================================================================
_FD_SPECS = [
    # (name, table, x_col, y_col) — a mix of FDs the fixture satisfies
    # (the key FD p_partkey -> p_brand, g3 = 0) and ones it does not,
    # so the audit exercises both the zero and the heavy-violation path
    ("customer.c_nationkey->c_mktsegment", "customer",
     "c_nationkey", "c_mktsegment"),
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
    ("part.p_partkey->p_brand", "part", "p_partkey", "p_brand"),
    ("part.p_type->p_size", "part", "p_type", "p_size"),
]


def _fd_q(spark: SparkSession, sf: str) -> DataFrame:
    by_table: dict[str, list] = {}
    for name, table, x, y in _FD_SPECS:
        by_table.setdefault(table, []).append((name, [x], y))
    outs = [
        P.fd_violations(load_table(spark, t, sf), specs)
        for t, specs in by_table.items()
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("fd")


def _fd_oracle() -> str:
    parts = []
    for name, table, x, y in _FD_SPECS:
        parts.append(f"""
      SELECT '{name}' AS fd, sum(rows_)::BIGINT AS n_rows,
             count(*)::BIGINT AS n_groups,
             sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END)::BIGINT
               AS n_violating_groups,
             (sum(rows_) - sum(keep_))::BIGINT AS g3_rows,
             (sum(rows_) - sum(keep_))::BIGINT
               / sum(rows_)::BIGINT::DOUBLE AS g3_error
      FROM (
        SELECT x, count(*)::BIGINT AS ny, sum(n)::BIGINT AS rows_,
               max(n)::BIGINT AS keep_
        FROM (SELECT {x} AS x, {y} AS y, count(*)::BIGINT AS n
              FROM {table} GROUP BY 1, 2)
        GROUP BY x
      )""")
    return " UNION ALL ".join(parts) + " ORDER BY fd"


_register("dq_fd_violations", _fd_oracle(), late=True)(_fd_q)


# =========================================================================
# round 10 (cont.): KMV set-similarity — sketch-file corpus-overlap screen
# =========================================================================
def _kmv_jaccard_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import sketches as SK4

    ev = _events(spark, sf)
    return SK4.kmv_jaccard(
        ev.where(F.col("event_type") == "purchase").select("user_id"),
        ev.where(F.col("event_type") == "view").select("user_id"),
        "user_id",
        k=128,
    )


_register(
    "sketch_kmv_jaccard",
    """
    WITH ha AS (
      SELECT DISTINCT
        ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT AS _h
      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ), hb AS (
      SELECT DISTINCT
        ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT AS _h
      FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
    ), sa AS (SELECT _h FROM ha ORDER BY _h LIMIT 128),
    sb AS (SELECT _h FROM hb ORDER BY _h LIMIT 128),
    su AS (
      SELECT _h FROM (SELECT _h FROM sa UNION SELECT _h FROM sb)
      ORDER BY _h LIMIT 128
    ), est AS (
      SELECT count(*)::BIGINT AS k_used,
             sum(CASE WHEN su._h IN (SELECT _h FROM sa)
                       AND su._h IN (SELECT _h FROM sb)
                      THEN 1 ELSE 0 END)::BIGINT AS m
      FROM su
    ), ex AS (
      SELECT (SELECT count(*) FROM ha)::BIGINT AS n_exact_a,
             (SELECT count(*) FROM hb)::BIGINT AS n_exact_b,
             (SELECT count(*) FROM ha
              WHERE _h IN (SELECT _h FROM hb))::BIGINT AS n_exact_inter
    )
    SELECT k_used, n_exact_a, n_exact_b, n_exact_inter,
           CASE WHEN (n_exact_a + n_exact_b - n_exact_inter) > 0
                THEN n_exact_inter
                     / (n_exact_a + n_exact_b - n_exact_inter)::DOUBLE
                ELSE 0.0 END AS jaccard_exact,
           CASE WHEN k_used > 0 THEN m / k_used::DOUBLE
                ELSE 0.0 END AS jaccard_kmv,
           abs(CASE WHEN k_used > 0 THEN m / k_used::DOUBLE
                    ELSE 0.0 END
               - CASE WHEN (n_exact_a + n_exact_b - n_exact_inter) > 0
                      THEN n_exact_inter
                           / (n_exact_a + n_exact_b - n_exact_inter)::DOUBLE
                      ELSE 0.0 END) AS abs_error
    FROM est, ex
    """,
    late=True,
)(_kmv_jaccard_q)
