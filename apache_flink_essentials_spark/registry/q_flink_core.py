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

# =========================================================================
# §2.2 transforms (T1-T9)
# =========================================================================

_register(
    "t1_map_double",
    "SELECT range AS n, range * 2 AS doubled FROM range(1, 101)",
)(lambda spark, sf: T.map_columns(
    from_sequence(spark, 1, 100), n=F.col("n"), doubled=F.col("n") * 2
))

_register(
    "t1_fizzbuzz",
    """
    SELECT range AS n,
           CASE WHEN range % 15 = 0 THEN 'fizzbuzz'
                WHEN range % 3 = 0 THEN 'fizz'
                WHEN range % 5 = 0 THEN 'buzz'
                ELSE '' END AS output
    FROM range(1, 101)
    """,
)(lambda spark, sf: T.fizzbuzz(from_sequence(spark, 1, 100)))

_register(
    "t1_fizzbuzz_pipeline",
    "SELECT range AS n FROM range(1, 101) WHERE range % 15 = 0",
)(lambda spark, sf: T.fizzbuzz_pipeline(from_sequence(spark, 1, 100)))

_register(
    "t3_flatmap_range",
    """
    SELECT n, unnest(CASE WHEN n > 1 THEN range(1, n) ELSE [] END) AS m
    FROM (SELECT range AS n FROM range(1, 11))
    """,
)(lambda spark, sf: T.flat_map_range(from_sequence(spark, 1, 10)))

_register(
    "t5_filter_signup",
    """
    SELECT event_id, floor(epoch(ts))::BIGINT AS ts_epoch, user_id, value
    FROM events WHERE event_type = 'signup'
    """,
)(lambda spark, sf: T.filter_event_type(_events(spark, sf), "signup").select(
    "event_id", _epoch("ts").alias("ts_epoch"), "user_id", "value"
))

_register(
    "t7_keyby_parity_sum",
    """
    SELECT (range % 2 = 0) AS is_even, sum(range)::BIGINT AS total
    FROM range(1, 101) GROUP BY 1
    """,
)(lambda spark, sf: T.key_by_reduce(
    from_sequence(spark, 1, 100),
    key=(F.col("n") % 2 == 0),
    value=F.sum("n"),
    key_alias="is_even",
    agg_alias="total",
))

_register(
    "t8_keyby_reduce_events",
    """
    SELECT user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)(lambda spark, sf: _events(spark, sf).groupBy("user_id").agg(
    F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    F.count("*").alias("n_events"),
))

_register(
    "t6_running_reduce",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM events
    """,
)(lambda spark, sf: T.running_reduce(
    _events(spark, sf),
    key="user_id",
    value=F.sum(F.col("value").cast("decimal(18,2)")),
    order_by=["ts", "event_id"],
    agg_alias="running_total",
).select("event_id", "user_id", F.col("running_total").cast("double").alias("running_total")))


# =========================================================================
# §2.4 windows (W1-W4, WF1-WF7)
# =========================================================================

_TUMBLING_ORACLE = """
    SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS window_start,
           (floor(epoch(ts) / 3600) * 3600 + 3600)::BIGINT AS window_end,
           count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'signup') AS signups,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
"""

_register("w1_tumbling_hourly", _TUMBLING_ORACLE)(
    lambda spark, sf: W.tumbling(
        _events(spark, sf),
        "ts",
        "1 hour",
        [
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "signup", True)).alias("signups"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        ],
    )
)

_register(
    "w1_tumbling_keyed",
    """
    SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS window_start,
           (floor(epoch(ts) / 3600) * 3600 + 3600)::BIGINT AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)(lambda spark, sf: W.tumbling(
    _events(spark, sf),
    "ts",
    "1 hour",
    [
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ],
    keys=["event_type"],
))

_register(
    "w2_sliding_1h_30m",
    """
    SELECT ws::BIGINT AS window_start, (ws + 3600)::BIGINT AS window_end,
           count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'signup') AS signups
    FROM (
      SELECT unnest([floor(epoch(ts) / 1800) * 1800,
                     floor(epoch(ts) / 1800) * 1800 - 1800]) AS ws,
             event_type
      FROM events
    ) GROUP BY 1, 2
    """,
)(lambda spark, sf: W.sliding(
    _events(spark, sf),
    "ts",
    "1 hour",
    "30 minutes",
    [
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("event_type") == "signup", True)).alias("signups"),
    ],
))

_SLIDING_ORACLE = """
    SELECT ws::BIGINT AS window_start, (ws + 3600)::BIGINT AS window_end,
           count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'signup') AS signups
    FROM (
      SELECT unnest([floor(epoch(ts) / 1800) * 1800,
                     floor(epoch(ts) / 1800) * 1800 - 1800]) AS ws,
             event_type
      FROM events
    ) GROUP BY 1, 2
"""

# same semantics (and oracle) as w2_sliding_1h_30m, different physical plan:
# pane-based two-level aggregation — the scale path for big size/slide ratios
_register("w2_sliding_paned", _SLIDING_ORACLE)(
    lambda spark, sf: W.sliding_paned(
        _events(spark, sf),
        "ts",
        3600,
        1800,
        {
            "n_events": ("count", None),
            "signups": ("count", F.when(F.col("event_type") == "signup", True)),
        },
    )
)

_register(
    "w3_session_30m_user",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           floor(epoch(min(ts)))::BIGINT AS window_start,
           floor(epoch(max(ts) + INTERVAL '30 minutes'))::BIGINT AS window_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)(lambda spark, sf: W.session(
    _events(spark, sf),
    "ts",
    "30 minutes",
    [F.count("*").alias("n_events")],
    keys=["user_id"],
))

_register(
    "w4_count_window_10",
    """
    SELECT window_id, count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'signup') AS signups,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT floor((row_number() OVER (ORDER BY event_id) - 1) / 10)::BIGINT AS window_id,
             event_type, value
      FROM events
    ) GROUP BY 1
    """,
)(lambda spark, sf: W.count_window(
    _events(spark, sf),
    10,
    order_by=["event_id"],
    aggs=[
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("event_type") == "signup", True)).alias("signups"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ],
))

# same count-window semantics via the no-sort dense-id path (scale variant)
_register(
    "w4_count_window_by_id",
    """
    SELECT floor(event_id / 10)::BIGINT AS window_id,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)(lambda spark, sf: W.count_window_by_id(
    _events(spark, sf),
    10,
    id_col="event_id",
    aggs=[
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ],
))

_register(
    "w3_session_global",
    """
    WITH flagged AS (
      SELECT ts,
             CASE WHEN ts - lag(ts) OVER (ORDER BY ts, event_id)
                       > INTERVAL '10 minutes'
                  OR lag(ts) OVER (ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT ts,
             sum(new_session) OVER (ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT floor(epoch(min(ts)))::BIGINT AS window_start,
           floor(epoch(max(ts) + INTERVAL '10 minutes'))::BIGINT AS window_end,
           count(*) AS n_events
    FROM numbered GROUP BY session_id
    """,
)(lambda spark, sf: W.session(
    _events(spark, sf), "ts", "10 minutes", [F.count("*").alias("n_events")]
))

_register(
    "wf7_top1_sliding_window",
    """
    SELECT ws::BIGINT AS window_start,
           count(*) FILTER (WHERE event_type = 'signup') AS signups
    FROM (
      SELECT unnest([floor(epoch(ts) / 1800) * 1800,
                     floor(epoch(ts) / 1800) * 1800 - 1800]) AS ws,
             event_type
      FROM events
    ) GROUP BY 1
    ORDER BY signups DESC, window_start ASC LIMIT 1
    """,
)(lambda spark, sf: W.top_k_windows(
    W.sliding(
        _events(spark, sf),
        "ts",
        "1 hour",
        "30 minutes",
        [F.count(F.when(F.col("event_type") == "signup", True)).alias("signups")],
    ).select("window_start", "signups"),
    by="signups",
    k=1,
))


# =========================================================================
# §2.3 joins (J1-J4 + as-of)
# =========================================================================

_register(
    "j1_union",
    """
    SELECT event_id, floor(epoch(ts))::BIGINT AS ts_epoch, user_id, event_type
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, floor(epoch(ts))::BIGINT, user_id, event_type
    FROM events WHERE event_type = 'purchase'
    """,
)(lambda spark, sf: J.union_streams(
    T.filter_event_type(_events(spark, sf), "click"),
    T.filter_event_type(_events(spark, sf), "purchase"),
).select("event_id", _epoch("ts").alias("ts_epoch"), "user_id", "event_type"))

_register(
    "j2_window_join_1h",
    """
    SELECT c.user_id AS user_id,
           (floor(epoch(c.ts) / 3600) * 3600)::BIGINT AS window_start,
           c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND floor(epoch(c.ts) / 3600) = floor(epoch(p.ts) / 3600)
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)(lambda spark, sf: J.window_join(
    T.filter_event_type(_events(spark, sf), "click"),
    T.filter_event_type(_events(spark, sf), "purchase"),
    key="user_id",
    left_ts="ts",
    right_ts="ts",
    size="1 hour",
    projection=[
        F.col("user_id"),
        F.col("window_start"),
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
    ],
))

_register(
    "j3_interval_join_10m",
    """
    SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL '10 minutes'
     AND c.ts < p.ts + INTERVAL '10 minutes'
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)(lambda spark, sf: J.interval_join(
    T.filter_event_type(_events(spark, sf), "click"),
    T.filter_event_type(_events(spark, sf), "purchase"),
    key="user_id",
    left_ts="ts",
    right_ts="ts",
    lower="-10 minutes",
    upper="10 minutes",
).select(
    F.col("l_user_id").alias("user_id"),
    F.col("l_event_id").alias("click_id"),
    F.col("r_event_id").alias("purchase_id"),
))

_register(
    "j4_connect_ratio",
    """
    WITH u AS (
      SELECT ts, event_id, 'left' AS side FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT ts, event_id, 'right' AS side FROM events WHERE event_type = 'purchase'
    )
    SELECT floor(epoch(ts))::BIGINT AS ts_epoch, event_id, side,
           left_count::BIGINT AS left_count, right_count::BIGINT AS right_count,
           CASE WHEN right_count > 0
                THEN left_count::DOUBLE / right_count END AS ratio,
           left_count * 100.0 / (left_count + right_count) AS left_pct
    FROM (
      SELECT ts, event_id, side,
             sum(CASE WHEN side = 'left' THEN 1 ELSE 0 END) OVER w AS left_count,
             sum(CASE WHEN side = 'right' THEN 1 ELSE 0 END) OVER w AS right_count
      FROM u
      WINDOW w AS (ORDER BY ts, event_id, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    """,
)(lambda spark, sf: J.connect_ratio(
    T.filter_event_type(_events(spark, sf), "click"),
    T.filter_event_type(_events(spark, sf), "purchase"),
    left_ts="ts",
    right_ts="ts",
    tiebreak=["event_id"],
).select(
    _epoch("ts").alias("ts_epoch"),
    "event_id",
    "side",
    "left_count",
    "right_count",
    "ratio",
    "left_pct",
))

_register(
    "j5_asof_join_1h",
    """
    SELECT user_id, click_id, purchase_id FROM (
      SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY p.ts DESC, p.event_id DESC) AS rk
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL '1 hour'
    ) WHERE rk = 1
    """,
)(lambda spark, sf: J.as_of_join(
    T.filter_event_type(_events(spark, sf), "click"),
    T.filter_event_type(_events(spark, sf), "purchase"),
    key="user_id",
    left_ts="ts",
    right_ts="ts",
    tolerance="1 hour",
).select(
    F.col("l_user_id").alias("user_id"),
    F.col("l_event_id").alias("click_id"),
    F.col("r_event_id").alias("purchase_id"),
))


