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
from .q_northstar import _lang_oracle  # noqa: F401
from .q_round5_7 import (  # noqa: F401
    _FS_T_MATCH,
    _FS_W,
    _fs_match_pairs_q,
    _fs_weights_q,
)

# =========================================================================
# round 8 batch 2: corpus statistics, forecastability, entity clustering
# =========================================================================

_register(
    "text_burstiness",
    r"""
    WITH occ AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ), dt AS (
      SELECT doc_id, term, count(*)::BIGINT AS c
      FROM occ WHERE term != '' GROUP BY 1, 2
    ), t AS (
      SELECT term, sum(c)::BIGINT AS cf, count(*)::BIGINT AS df
      FROM dt GROUP BY 1
    )
    SELECT term, cf, df, cf / df::DOUBLE AS burstiness
    FROM t ORDER BY cf DESC, term LIMIT 20
    """,
    late=True,
)(lambda spark, sf: X.term_burstiness(load_table(spark, "documents", sf)))


_register(
    "text_hapax_ratio",
    r"""
    WITH tt AS (
      SELECT grp, term, count(*)::BIGINT AS c
      FROM (SELECT source AS grp,
                   unnest(string_split_regex(lower(text), '\s+')) AS term
            FROM documents)
      WHERE term != '' GROUP BY 1, 2
    ), g AS (
      SELECT grp, count(*)::BIGINT AS vocab_size,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax_count
      FROM tt GROUP BY 1
    )
    SELECT grp AS source, vocab_size, hapax_count,
           hapax_count / vocab_size::DOUBLE AS hapax_ratio
    FROM g ORDER BY source
    """,
    late=True,
)(lambda spark, sf: X.hapax_ratio(load_table(spark, "documents", sf)))


_register(
    "ts_seasonal_naive",
    """
    WITH bins AS (
      SELECT floor(epoch(ts))::BIGINT // 3600 AS bin,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), season AS (
      SELECT count(*)::BIGINT AS n_pairs, sum(abs(a.x - b.x)) AS ae
      FROM bins a JOIN bins b ON b.bin = a.bin - 24
    ), naive1 AS (
      SELECT count(*)::BIGINT AS n1, sum(abs(a.x - b.x)) AS ae1
      FROM bins a JOIN bins b ON b.bin = a.bin - 1
    )
    SELECT n_pairs, round(ae / n_pairs, 6) AS mae,
           round(ae1 / n1, 6) AS scale_mae,
           round((ae / n_pairs) / (ae1 / n1), 6) AS mase
    FROM season, naive1
    """,
    late=True,
)(lambda spark, sf: TS.seasonal_naive_eval(_events(spark, sf), "ts", "value"))


def _er_clusters_q(spark: SparkSession, sf: str) -> DataFrame:
    """FS-matched pairs → connected components → cluster-size histogram:
    the end of the entity-resolution story (er_fs_match_weights scores
    pairs; this collapses them into entities). Reuses the large-star /
    small-star CC operator; output is aggregate-sized (one row per
    distinct cluster size)."""
    pairs = _fs_match_pairs_q(spark, sf)
    cc = D.connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


_register(
    "er_entity_clusters",
    f"""
    WITH RECURSIVE cand AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON lower(substr(a.c_name, 1, 16)) = lower(substr(b.c_name, 1, 16))
       AND a.c_custkey < b.c_custkey
    ), w AS (
      SELECT id_a, id_b,
             (CASE WHEN levenshtein(lower(a.c_name), lower(b.c_name)) <= 1
                   THEN {_FS_W["name"][0]} ELSE {_FS_W["name"][1]} END
              + CASE WHEN a.c_nationkey = b.c_nationkey
                     THEN {_FS_W["nation"][0]} ELSE {_FS_W["nation"][1]} END
              + CASE WHEN a.c_mktsegment = b.c_mktsegment
                     THEN {_FS_W["segment"][0]} ELSE {_FS_W["segment"][1]} END
             )::BIGINT AS weight_micro
      FROM cand
      JOIN customer a ON a.c_custkey = id_a
      JOIN customer b ON b.c_custkey = id_b
    ), pairs AS (
      SELECT id_a, id_b FROM w WHERE weight_micro >= {_FS_T_MATCH}
    ), und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ), rep AS (
      SELECT a AS node, least(a, min(b))::BIGINT AS component
      FROM reach GROUP BY a
    ), sizes AS (
      SELECT component, count(*)::BIGINT AS cluster_size
      FROM rep GROUP BY 1
    )
    SELECT cluster_size, count(*)::BIGINT AS n_clusters
    FROM sizes GROUP BY 1 ORDER BY 1
    """,
    late=True,
)(_er_clusters_q)


def _er_incremental_q(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ER (r12): customers with custkey % 3 == 0 arrive as a
    NEW batch against settled clusters built from the rest. Settled
    assignments come from CC over corpus-only match pairs; the batch
    folds in via `assign_components_incremental` (CC over the collapsed
    batch-sized graph; corpus never re-clustered). The result is exactly
    the full recompute over ALL pairs — which is what the oracle runs."""
    # one pass for both branches below: the match-pair relation feeds the
    # corpus CC AND the new-edge fold, and without a barrier each branch
    # re-runs the blocked candidate join + levenshtein (guide §2.4)
    pairs = _fs_match_pairs_q(spark, sf).localCheckpoint(eager=False)
    is_new_a = F.col("id_a") % 3 == 0
    is_new_b = F.col("id_b") % 3 == 0
    corpus_pairs = pairs.where(~is_new_a & ~is_new_b)
    new_edges = pairs.where(is_new_a | is_new_b)
    settled = D.connected_components(corpus_pairs, "id_a", "id_b")
    return (
        D.assign_components_incremental(new_edges, settled)
        .select(
            F.col("node").cast("long").alias("c_custkey"),
            F.col("component").cast("long").alias("entity_rep"),
        )
    )


_register(
    "er_assign_incremental",
    f"""
    WITH RECURSIVE cand AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON lower(substr(a.c_name, 1, 16)) = lower(substr(b.c_name, 1, 16))
       AND a.c_custkey < b.c_custkey
    ), w AS (
      SELECT id_a, id_b,
             (CASE WHEN levenshtein(lower(a.c_name), lower(b.c_name)) <= 1
                   THEN {_FS_W["name"][0]} ELSE {_FS_W["name"][1]} END
              + CASE WHEN a.c_nationkey = b.c_nationkey
                     THEN {_FS_W["nation"][0]} ELSE {_FS_W["nation"][1]} END
              + CASE WHEN a.c_mktsegment = b.c_mktsegment
                     THEN {_FS_W["segment"][0]} ELSE {_FS_W["segment"][1]} END
             )::BIGINT AS weight_micro
      FROM cand
      JOIN customer a ON a.c_custkey = id_a
      JOIN customer b ON b.c_custkey = id_b
    ), pairs AS (
      SELECT id_a, id_b FROM w WHERE weight_micro >= {_FS_T_MATCH}
    ), und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    )
    SELECT a::BIGINT AS c_custkey, least(a, min(b))::BIGINT AS entity_rep
    FROM reach GROUP BY a
    """,
    late=True,
)(_er_incremental_q)


_register(
    "multimodal_exact_dedup",
    # payload bytes are the documents' UTF-8 text (documents_as_media),
    # so DuckDB's VARCHAR md5 hashes the identical byte string Spark's
    # binary md5 sees
    """
    SELECT md5(text) AS digest, count(*)::BIGINT AS n_copies,
           min(doc_id)::BIGINT AS keep_id
    FROM documents GROUP BY 1 HAVING count(*) >= 2 ORDER BY digest
    """,
    late=True,
)(lambda spark, sf: M.exact_payload_dedup(
    M.documents_as_media(load_table(spark, "documents", sf))
))


def _kcore_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import graph as G3

    part = (
        load_table(spark, "part", sf)
        .where(F.col("p_brand").startswith("Brand#1"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(part), "l_partkey", "left_semi")
        .select("l_orderkey", "l_partkey")
    )
    return G3.kcore(
        G3.cooccurrence_edges(li, "l_orderkey", "l_partkey"), k=30
    )


def _kcore_oracle(k: int = 30, rounds: int = 10) -> str:
    """Unrolled-peeling twin of the iterative kcore: the k-core is a
    UNIQUE fixpoint of integer peeling (no floats, no order
    sensitivity), so — unlike PageRank — a bounded unroll IS an exact
    oracle once it covers the fixture's peeling depth (verified
    rounds=10 ≡ rounds=14 at sf0.001/0.01/0.1). CTEs are MATERIALIZED:
    DuckDB inlines plain CTEs, and e_i referencing e_{i-1} three times
    makes un-materialized unrolling expand 3^rounds scans (measured:
    fd exhaustion at rounds=8)."""
    parts = ["""
    WITH pp AS (SELECT p_partkey FROM part WHERE p_brand LIKE 'Brand#1%'),
    li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS v
           FROM lineitem JOIN pp ON l_partkey = p_partkey),
    e0 AS MATERIALIZED (SELECT DISTINCT x.v AS a, y.v AS b
           FROM li x JOIN li y ON x.o = y.o AND x.v < y.v)"""]
    for i in range(1, rounds + 1):
        prev = i - 1
        parts.append(f""",
    d{i} AS MATERIALIZED (SELECT node, count(*)::BIGINT AS c
             FROM (SELECT a AS node FROM e{prev}
                   UNION ALL SELECT b AS node FROM e{prev})
             GROUP BY 1),
    k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE c >= {k}),
    e{i} AS MATERIALIZED (SELECT a, b FROM e{prev}
             WHERE a IN (SELECT node FROM k{i})
               AND b IN (SELECT node FROM k{i}))""")
    parts.append(f"""
    SELECT node, count(*)::BIGINT AS core_degree
    FROM (SELECT a AS node FROM e{rounds}
          UNION ALL SELECT b AS node FROM e{rounds})
    GROUP BY 1 ORDER BY 1
    """)
    return "".join(parts)


_register("graph_kcore", _kcore_oracle(), late=True)(_kcore_q)


def _join_size_audit_q(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf)
    o = load_table(spark, "orders", sf)
    ev = _events(spark, sf)
    return P.join_size_audit([
        ("events*events@user_id", ev, "user_id", ev, "user_id"),
        ("lineitem*lineitem@l_partkey", li, "l_partkey", li, "l_partkey"),
        ("lineitem*orders@orderkey", li, "l_orderkey", o, "o_orderkey"),
    ])


_register(
    "dq_join_size_audit",
    """
    WITH edges(relation, a_tbl, b_tbl) AS (VALUES
      ('events*events@user_id', 1, 1),
      ('lineitem*lineitem@l_partkey', 2, 2),
      ('lineitem*orders@orderkey', 3, 4)
    ), ca1 AS (SELECT user_id AS k, count(*)::BIGINT c FROM events
               WHERE user_id IS NOT NULL GROUP BY 1),
    ca2 AS (SELECT l_partkey AS k, count(*)::BIGINT c FROM lineitem
            WHERE l_partkey IS NOT NULL GROUP BY 1),
    ca3 AS (SELECT l_orderkey AS k, count(*)::BIGINT c FROM lineitem
            WHERE l_orderkey IS NOT NULL GROUP BY 1),
    ca4 AS (SELECT o_orderkey AS k, count(*)::BIGINT c FROM orders
            WHERE o_orderkey IS NOT NULL GROUP BY 1),
    e1 AS (SELECT 'events*events@user_id' AS relation,
                  count(*)::BIGINT AS n_keys_common,
                  coalesce(sum(a.c * b.c), 0)::BIGINT AS join_rows,
                  coalesce(max(a.c * b.c), 0)::BIGINT AS max_key_rows
           FROM ca1 a JOIN ca1 b ON a.k = b.k),
    e2 AS (SELECT 'lineitem*lineitem@l_partkey',
                  count(*)::BIGINT, coalesce(sum(a.c * b.c), 0)::BIGINT,
                  coalesce(max(a.c * b.c), 0)::BIGINT
           FROM ca2 a JOIN ca2 b ON a.k = b.k),
    e3 AS (SELECT 'lineitem*orders@orderkey',
                  count(*)::BIGINT, coalesce(sum(a.c * b.c), 0)::BIGINT,
                  coalesce(max(a.c * b.c), 0)::BIGINT
           FROM ca3 a JOIN ca4 b ON a.k = b.k),
    u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
          UNION ALL SELECT * FROM e3)
    SELECT relation, n_keys_common, join_rows, max_key_rows,
           CASE WHEN join_rows > 0
                THEN max_key_rows / join_rows::DOUBLE
                ELSE 0.0 END AS skew_share
    FROM u ORDER BY relation
    """,
    late=True,
)(_join_size_audit_q)


def _golden_record_q(spark: SparkSession, sf: str) -> DataFrame:
    pairs = _fs_match_pairs_q(spark, sf)
    cc = D.connected_components(pairs, "id_a", "id_b")
    members = cc.join(
        load_table(spark, "customer", sf),
        cc["node"] == F.col("c_custkey"),
    )
    return J.golden_record(
        members,
        "component",
        "node",
        first_by_rep={"golden_name": "c_name"},
        modal={"golden_nation": "c_nationkey"},
        maxed={"golden_acctbal": "c_acctbal"},
    )


_register(
    "er_golden_record",
    f"""
    WITH RECURSIVE cand AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON lower(substr(a.c_name, 1, 16)) = lower(substr(b.c_name, 1, 16))
       AND a.c_custkey < b.c_custkey
    ), w AS (
      SELECT id_a, id_b,
             (CASE WHEN levenshtein(lower(a.c_name), lower(b.c_name)) <= 1
                   THEN {_FS_W["name"][0]} ELSE {_FS_W["name"][1]} END
              + CASE WHEN a.c_nationkey = b.c_nationkey
                     THEN {_FS_W["nation"][0]} ELSE {_FS_W["nation"][1]} END
              + CASE WHEN a.c_mktsegment = b.c_mktsegment
                     THEN {_FS_W["segment"][0]} ELSE {_FS_W["segment"][1]} END
             )::BIGINT AS weight_micro
      FROM cand
      JOIN customer a ON a.c_custkey = id_a
      JOIN customer b ON b.c_custkey = id_b
    ), pairs AS (
      SELECT id_a, id_b FROM w WHERE weight_micro >= {_FS_T_MATCH}
    ), und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ), rep AS (
      SELECT a AS node, least(a, min(b))::BIGINT AS component
      FROM reach GROUP BY a
    ), members AS (
      SELECT rep.node, rep.component, c.c_name, c.c_nationkey, c.c_acctbal
      FROM rep JOIN customer c ON c.c_custkey = rep.node
    ), votes AS (
      SELECT component, c_nationkey, count(*)::BIGINT AS v
      FROM members GROUP BY 1, 2
    ), modal AS (
      SELECT component, c_nationkey AS golden_nation
      FROM (SELECT component, c_nationkey,
                   row_number() OVER (PARTITION BY component
                     ORDER BY v DESC, c_nationkey) AS rn
            FROM votes)
      WHERE rn = 1
    ), base AS (
      SELECT component, count(*)::BIGINT AS n_members,
             min(node)::BIGINT AS rep_id,
             arg_min(c_name, node) AS golden_name,
             max(c_acctbal) AS golden_acctbal
      FROM members GROUP BY 1
    )
    SELECT b.component, n_members, rep_id, golden_name, golden_nation,
           golden_acctbal
    FROM base b JOIN modal m ON b.component = m.component
    ORDER BY b.component
    """,
    late=True,
)(_golden_record_q)


_register(
    "events_km_gap_survival",
    """
    WITH ev AS (
      SELECT user_id, floor(epoch(ts))::BIGINT AS t, event_id FROM events
    ), g AS (
      SELECT lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t
               AS gap
      FROM ev
    ), bk AS (
      SELECT least(gap // 3600, 24) AS b FROM g WHERE gap IS NOT NULL
    ), counts AS (
      SELECT b, count(*)::BIGINT AS n_b FROM bk GROUP BY 1
    ), tot AS (SELECT sum(n_b)::BIGINT AS total FROM counts),
    grid AS (
      SELECT b, n_b,
             total - coalesce(sum(n_b) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM counts, tot
    )
    SELECT b AS t, n_at_risk::BIGINT AS n_at_risk, n_b AS n_events,
           round(exp(sum(ln(1.0 - n_b / n_at_risk::DOUBLE))
             OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
             AS survival
    FROM grid WHERE b < 24 AND n_at_risk > n_b ORDER BY t
    """,
    late=True,
)(lambda spark, sf: TS.km_gap_survival(
    _events(spark, sf), "user_id", "ts", "event_id"))


_register(
    "text_js_divergence",
    r"""
    WITH occ AS (
      SELECT grp, term, count(*)::BIGINT AS c
      FROM (SELECT source AS grp,
                   unnest(string_split_regex(lower(text), '\s+')) AS term
            FROM documents)
      WHERE term != '' GROUP BY 1, 2
    ), corpus AS (
      SELECT term, sum(c)::BIGINT AS qc FROM occ GROUP BY 1
    ), head AS (
      SELECT term, qc FROM (
        SELECT term, qc,
               row_number() OVER (ORDER BY qc DESC, term) AS rn
        FROM corpus) WHERE rn <= 1000
    ), tq AS (SELECT sum(qc)::BIGINT AS tq FROM head),
    st AS (
      SELECT occ.grp, occ.term, occ.c
      FROM occ JOIN head ON occ.term = head.term
    ), totals AS (
      SELECT grp, sum(c)::BIGINT AS tg FROM st GROUP BY 1
    ), grid AS (
      SELECT t.grp,
             coalesce(s.c, 0) / t.tg::DOUBLE AS p,
             h.qc / q.tq::DOUBLE AS q
      FROM totals t CROSS JOIN head h
      LEFT JOIN st s ON s.grp = t.grp AND s.term = h.term, tq q
    ), k AS (
      SELECT grp,
             CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0))
                  ELSE 0.0 END AS kp,
             q * ln(q / ((p + q) / 2.0)) AS kq
      FROM grid
    )
    SELECT grp AS source, count(*)::BIGINT AS n_terms,
           round(0.5 * sum(kp) + 0.5 * sum(kq), 6) AS jsd
    FROM k GROUP BY 1 ORDER BY 1
    """,
    late=True,
)(lambda spark, sf: X.js_divergence_by_group(
    load_table(spark, "documents", sf)))


def _quality_calibration_q(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-signal calibration: does the cheap density score AGREE
    with the Gopher rule battery? Equal-count density deciles × gopher
    pass rate — the audit run before trusting any single quality filter
    to gate a corpus (a well-calibrated cheap score lets the expensive
    battery run on a sample only)."""

    docs = load_table(spark, "documents", sf)
    toks = X.tokens_expr("text")
    scored = docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("density"),
        X.gopher_pass_expr("text").cast("int").alias("pass"),
    ).where(F.size(toks) > 0)
    # the equal-count bucket machinery IS perplexity_buckets with the
    # gopher flag as the "weight": its size-adaptive rank computes rank
    # and count in ONE window stage on small inputs, replacing a
    # hand-rolled rank + count-agg + broadcast chain that cost 3 extra
    # jobs (measured 1.01 s -> ~0.4 s at sf0.1)
    buckets = CU.perplexity_buckets(
        scored, n_buckets=10, score_col="density", id_col="doc_id",
        weight_col="pass",
    )
    return buckets.select(
        F.col("bucket").cast("long").alias("decile"),
        "n_docs",
        F.col("pass").cast("long").alias("n_pass"),
        (F.col("pass") / F.col("n_docs")).alias("pass_rate"),
        F.col("min_density"),
        F.col("max_density"),
    ).orderBy("decile")


_register(
    "curation_quality_calibration",
    rf"""
    WITH g AS (
      SELECT doc_id, gopher_pass FROM ({ORACLES["text_gopher_quality"]})
    ), scored AS (
      SELECT doc_id,
             len(list_distinct(string_split_regex(lower(text), '\s+')))
               / len(string_split_regex(lower(text), '\s+'))::DOUBLE
               AS density
      FROM documents
      WHERE len(string_split_regex(lower(text), '\s+')) > 0
    ), r AS (
      SELECT s.doc_id, density, g.gopher_pass::INT AS pass,
             row_number() OVER (ORDER BY density, s.doc_id)::BIGINT AS rn,
             count(*) OVER ()::BIGINT AS n
      FROM scored s JOIN g ON s.doc_id = g.doc_id
    )
    SELECT ((rn - 1) * 10 // n + 1)::BIGINT AS decile,
           count(*)::BIGINT AS n_docs,
           sum(pass)::BIGINT AS n_pass,
           sum(pass) / count(*)::DOUBLE AS pass_rate,
           min(density) AS min_density,
           max(density) AS max_density
    FROM r GROUP BY 1 ORDER BY 1
    """,
    late=True,
)(_quality_calibration_q)


def _did_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import patterns as PT

    ev = _events(spark, sf)
    treated = (
        ev.where(F.col("event_type") == "signup")
        .select("user_id").distinct()
    )
    return PT.diff_in_diff(
        ev, "user_id", "ts", "value", treated, "2024-01-16 00:00:00",
        outcome_filter=F.col("event_type") == "purchase",
    )


_register(
    "events_diff_in_diff",
    """
    WITH treated AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    ), cells AS (
      SELECT CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treated,
             CASE WHEN e.ts >= TIMESTAMP '2024-01-16 00:00:00'
                  THEN 1 ELSE 0 END AS post,
             count(*)::BIGINT AS n,
             CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS mean
      FROM events e LEFT JOIN treated t ON e.user_id = t.user_id
      WHERE e.value IS NOT NULL AND e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT sum(n)::BIGINT AS n_outcomes,
           sum(CASE WHEN treated = 0 AND post = 0 THEN mean END)
             AS pre_control,
           sum(CASE WHEN treated = 0 AND post = 1 THEN mean END)
             AS post_control,
           sum(CASE WHEN treated = 1 AND post = 0 THEN mean END)
             AS pre_treated,
           sum(CASE WHEN treated = 1 AND post = 1 THEN mean END)
             AS post_treated,
           (sum(CASE WHEN treated = 1 AND post = 1 THEN mean END)
            - sum(CASE WHEN treated = 1 AND post = 0 THEN mean END))
           - (sum(CASE WHEN treated = 0 AND post = 1 THEN mean END)
              - sum(CASE WHEN treated = 0 AND post = 0 THEN mean END))
             AS did
    FROM cells
    """,
    late=True,
)(_did_q)


_register(
    "ts_seasonality_strength",
    """
    WITH bins AS (
      SELECT floor(epoch(ts))::BIGINT // 3600 AS bin,
             (floor(epoch(ts))::BIGINT // 3600) % 24 AS phase,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), profile AS (
      SELECT phase, avg(x) AS m FROM bins GROUP BY 1
    )
    SELECT count(*)::BIGINT AS n_bins,
           round(var_pop(x), 6) AS var_total,
           round(var_pop(x - m), 6) AS var_resid,
           round(1.0 - var_pop(x - m) / var_pop(x), 6) AS strength
    FROM bins JOIN profile USING (phase)
    """,
    late=True,
)(lambda spark, sf: TS.seasonality_strength(_events(spark, sf), "ts", "value"))


# =========================================================================
# round 9: degree assortativity, Theil-Sen robust trend, signed random
# projection, Kneser-Ney bigram smoothing, schema-drift profile
# =========================================================================


def _assort_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import graph as G4

    part = (
        load_table(spark, "part", sf)
        .where(F.col("p_brand").startswith("Brand#1"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(part), "l_partkey", "left_semi")
        .select("l_orderkey", "l_partkey")
    )
    return G4.degree_assortativity(
        G4.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    )


_register(
    "graph_assortativity",
    """
    WITH pp AS (SELECT p_partkey FROM part WHERE p_brand LIKE 'Brand#1%'),
    li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS v
           FROM lineitem JOIN pp ON l_partkey = p_partkey),
    e AS (SELECT DISTINCT x.v AS a, y.v AS b
          FROM li x JOIN li y ON x.o = y.o AND x.v < y.v),
    deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
              SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
            GROUP BY 1),
    paired AS (SELECT da.degree::HUGEINT AS da, db.degree::HUGEINT AS db
               FROM e JOIN deg da ON e.a = da.node
                      JOIN deg db ON e.b = db.node),
    sums AS (SELECT count(*)::HUGEINT AS m,
                    sum(da + db) AS sx,
                    sum(2::HUGEINT * da * db) AS sxy,
                    sum(da * da + db * db) AS sxx
             FROM paired)
    SELECT (SELECT count(*)::BIGINT FROM deg) AS n_nodes,
           m::BIGINT AS n_edges,
           CASE WHEN ((2::HUGEINT * m)::DOUBLE * sxx::DOUBLE
                      - sx::DOUBLE * sx::DOUBLE) != 0.0
                THEN ((2::HUGEINT * m)::DOUBLE * sxy::DOUBLE
                      - sx::DOUBLE * sx::DOUBLE)
                     / ((2::HUGEINT * m)::DOUBLE * sxx::DOUBLE
                        - sx::DOUBLE * sx::DOUBLE)
           END AS assortativity
    FROM sums
    """,
    late=True,
)(_assort_q)


def _theilsen_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS3

    return TS3.theilsen_trend(_events(spark, sf), "ts", "value")


_register(
    "ts_theilsen_trend",
    # mirrors theilsen_from_binned: exact micro-unit bin means (the
    # cusum contract), per-pair int/int slope rationals, median as the
    # middle element(s) of the (slope, bi, bj) total order
    """
    WITH b0 AS (
      SELECT floor(epoch(ts))::BIGINT // 3600 AS bin,
             count(*)::BIGINT AS n,
             (sum(CAST(value AS DECIMAL(18,2))) * 100)::BIGINT AS sc
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), m AS (
      SELECT bin, (sc * 20000 + n) // (2 * n) AS m FROM b0
    ), slopes AS (
      SELECT a.bin AS bi, b.bin AS bj,
             (b.m - a.m)::DOUBLE / (b.bin - a.bin)::DOUBLE AS slope
      FROM m a JOIN m b ON a.bin < b.bin
    ), ranked AS (
      SELECT slope,
             row_number() OVER (ORDER BY slope, bi, bj)::BIGINT AS rk
      FROM slopes
    ), counts AS (
      SELECT count(*)::BIGINT AS n_bins,
             (count(*)::BIGINT * (count(*)::BIGINT - 1) // 2) AS n_pairs
      FROM m
    )
    SELECT n_bins, n_pairs,
           round((min(slope) + max(slope)) / 2.0, 6)
             AS slope_micro_per_bin
    FROM ranked, counts
    WHERE rk = (n_pairs + 1) // 2 OR rk = n_pairs // 2 + 1
    GROUP BY n_bins, n_pairs
    """,
    late=True,
)(_theilsen_q)


def _signed_proj_q(spark: SparkSession, sf: str) -> DataFrame:
    return V.signed_projection(
        load_table(spark, "embeddings", sf), dim=64, n_proj=16, seed=0
    )


def _signed_proj_oracle() -> str:
    rows = ",\n      ".join(
        f"({j}, [{','.join(str(s) for s in row)}])"
        for j, row in enumerate(V.signed_sign_table(16, 64, seed=0))
    )
    return f"""
    WITH vm AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> floor(x::DOUBLE * 1000000.0 + 0.5)::BIGINT) AS v
      FROM embeddings
    ), sg(j, s) AS (VALUES
      {rows}
    )
    SELECT vec_id, j::BIGINT AS proj_idx,
           list_sum(list_transform(range(1, 65),
             i -> v[i] * s[i]))::BIGINT AS proj_micro,
           list_sum(list_transform(range(1, 65),
             i -> v[i] * s[i]))::BIGINT >= 0 AS bit
    FROM vm, sg
    """


_register("vec_signed_projection", _signed_proj_oracle(), late=True)(
    _signed_proj_q
)


def _kn_q(spark: SparkSession, sf: str) -> DataFrame:
    return X.kneser_ney_bigrams(load_table(spark, "documents", sf), top_n=20)


_register(
    "text_kneser_ney_top20",
    # fixed-order all-integer-operand KN form with d = 3/4:
    # max(c12-d,0)/c1 + (d*n1p/c1)*(n1f/B) == greatest(4c12-3,0)/(4c1)
    # + 3*n1p*n1f/(4*c1*B) -- two divisions + one addition, unrounded
    r"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t != '') AS tl
      FROM documents
    ), occ AS (
      SELECT tl[i] AS w1, tl[i + 1] AS w2, count(*)::BIGINT AS c12
      FROM toks, UNNEST(range(1, len(tl))) AS r(i)
      GROUP BY 1, 2
    ), lf AS (
      SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1p
      FROM occ GROUP BY 1
    ), rt AS (
      SELECT w2, count(*)::BIGINT AS n1f FROM occ GROUP BY 1
    ), btot AS (SELECT count(*)::BIGINT AS b FROM occ),
    scored AS (
      SELECT w1, w2, c12, n1p, n1f,
             greatest(4 * c12 - 3, 0)::DOUBLE / (4 * c1)::DOUBLE
             + (n1p::DOUBLE * n1f::DOUBLE * 3)
               / (c1::DOUBLE * b::DOUBLE * 4) AS p_kn,
             row_number() OVER (ORDER BY c12 DESC, w1, w2)::BIGINT
               AS rank
      FROM occ JOIN lf USING (w1) JOIN rt USING (w2), btot
    )
    SELECT rank, w1, w2, c12, n1p, n1f, p_kn
    FROM scored WHERE rank <= 20 ORDER BY rank
    """,
    late=True,
)(_kn_q)


def _schema_drift_q(spark: SparkSession, sf: str) -> DataFrame:
    return P.schema_drift(
        _events(spark, sf), "ts", ["event_type", "props", "user_id", "value"]
    )


_register(
    "dq_schema_drift",
    """
    WITH b AS (
      SELECT ((min(floor(epoch(ts))::BIGINT)
               + max(floor(epoch(ts))::BIGINT)) // 2) AS cut
      FROM events
    ), sided AS (
      SELECT CASE WHEN floor(epoch(ts))::BIGINT <= cut THEN 'early'
                  ELSE 'late' END AS side,
             user_id, event_type, value, props
      FROM events, b
    ), p AS (
      SELECT side, count(*)::BIGINT AS n,
             count(event_type)::BIGINT AS nn0,
             count(DISTINCT event_type)::BIGINT AS nd0,
             count(props)::BIGINT AS nn1,
             count(DISTINCT props)::BIGINT AS nd1,
             count(user_id)::BIGINT AS nn2,
             count(DISTINCT user_id)::BIGINT AS nd2,
             count(value)::BIGINT AS nn3,
             count(DISTINCT value)::BIGINT AS nd3
      FROM sided GROUP BY 1
    ), long AS (
      SELECT side, n, 'event_type' AS col, nn0 AS nn, nd0 AS nd FROM p
      UNION ALL SELECT side, n, 'props', nn1, nd1 FROM p
      UNION ALL SELECT side, n, 'user_id', nn2, nd2 FROM p
      UNION ALL SELECT side, n, 'value', nn3, nd3 FROM p
    )
    SELECT col AS "column",
           max(CASE WHEN side = 'early' THEN n END) AS n_early,
           max(CASE WHEN side = 'late' THEN n END) AS n_late,
           (max(CASE WHEN side = 'early' THEN n END)
            - max(CASE WHEN side = 'early' THEN nn END))
           / max(CASE WHEN side = 'early' THEN n END)::DOUBLE
             AS null_rate_early,
           (max(CASE WHEN side = 'late' THEN n END)
            - max(CASE WHEN side = 'late' THEN nn END))
           / max(CASE WHEN side = 'late' THEN n END)::DOUBLE
             AS null_rate_late,
           max(CASE WHEN side = 'early' THEN nd END) AS n_distinct_early,
           max(CASE WHEN side = 'late' THEN nd END) AS n_distinct_late
    FROM long GROUP BY 1 ORDER BY 1
    """,
    late=True,
)(_schema_drift_q)


# =========================================================================
# round 9 batch 2: SPC p-chart, Flesch readability, Holt linear smoothing,
# Hamming-space SimHash KNN + recall
# =========================================================================


def _pchart_q(spark: SparkSession, sf: str) -> DataFrame:
    return P.p_chart(
        _events(spark, sf), "ts", F.col("event_type") == "error"
    )


_register(
    "dq_error_pchart",
    # exact integer control predicate: (k*N - K*n)^2 > 9*K*(N-K)*n —
    # the squared/cleared form of |p - pbar| > 3*sqrt(pbar(1-pbar)/n),
    # so no float threshold ever reaches the hashed boolean
    """
    WITH bins AS (
      SELECT floor(epoch(ts))::BIGINT // 86400 AS bin,
             count(*)::BIGINT AS n,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
               AS n_defect
      FROM events GROUP BY 1
    ), center AS (
      SELECT sum(n)::BIGINT AS nn, sum(n_defect)::BIGINT AS kk FROM bins
    )
    SELECT bin, n, n_defect,
           n_defect / n::DOUBLE AS defect_rate,
           kk / nn::DOUBLE AS center_rate,
           (n_defect::HUGEINT * nn::HUGEINT - kk::HUGEINT * n::HUGEINT)
           * (n_defect::HUGEINT * nn::HUGEINT - kk::HUGEINT * n::HUGEINT)
           > 9::HUGEINT * kk::HUGEINT * (nn::HUGEINT - kk::HUGEINT)
             * n::HUGEINT
             AS is_out_of_control
    FROM bins, center ORDER BY bin
    """,
    late=True,
)(_pchart_q)


def _flesch_q(spark: SparkSession, sf: str) -> DataFrame:
    return X.flesch_reading_ease(load_table(spark, "documents", sf))


_register(
    "text_flesch",
    r"""
    WITH c AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t != '') AS toks,
             greatest(len(list_filter(
               string_split_regex(text, '[.!?]+'),
               s -> trim(s) != '')), 1)::BIGINT AS n_sentences
      FROM documents
    ), k AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             n_sentences,
             list_sum(list_transform(toks,
               t -> len(regexp_extract_all(t, '[aeiouy]+'))))::BIGINT
               AS n_syllables
      FROM c
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206.835 - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
                   - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE)
             AS flesch
    FROM k WHERE n_words > 0
    """,
    late=True,
)(_flesch_q)


def _holt_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import timeseries as TS4

    return TS4.holt_linear(_events(spark, sf), "ts", "value")


_register(
    "ts_holt_linear",
    # the ewma_anomaly recursive-twin argument: the CTE advances one
    # bin per step replaying the identical IEEE ops in the identical
    # order as the Spark-side left fold -> raw doubles hash-match
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
      SELECT bin, x, rn, x AS level, 0.0::DOUBLE AS trend
      FROM x WHERE rn = 1
      UNION ALL
      SELECT b.bin, b.x, b.rn,
             0.5 * b.x + 0.5 * (r.level + r.trend) AS level,
             0.3 * ((0.5 * b.x + 0.5 * (r.level + r.trend)) - r.level)
             + 0.7 * r.trend AS trend
      FROM rec r JOIN x b ON b.rn = r.rn + 1
    )
    SELECT bin, x, level, trend FROM rec ORDER BY bin
    """,
    late=True,
)(_holt_q)


def _hamming_knn_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    return V.hamming_knn(
        emb, emb.filter(F.col("vec_id") < 10), k=5, dim=64, n_proj=16,
        seed=0,
    )


def _sig_cte() -> str:
    """Shared signature CTE: micro-quantize, project against the ±1
    literal table, pack sign bits into one BIGINT."""
    rows = ",\n      ".join(
        f"({j}, [{','.join(str(s) for s in row)}])"
        for j, row in enumerate(V.signed_sign_table(16, 64, seed=0))
    )
    return f"""
    vm AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> floor(x::DOUBLE * 1000000.0 + 0.5)::BIGINT) AS v
      FROM embeddings
    ), sg(j, s) AS (VALUES
      {rows}
    ), sigs AS (
      SELECT vec_id,
             sum(CASE WHEN list_sum(list_transform(range(1, 65),
                        i -> v[i] * s[i]))::BIGINT >= 0
                      THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS sig
      FROM vm, sg GROUP BY vec_id
    )"""


_register(
    "vec_hamming_knn",
    f"""
    WITH {_sig_cte()}
    SELECT query_id, neighbor_id, hamming, rank FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             bit_count(xor(q.sig::BITSTRING, e.sig::BITSTRING))::BIGINT
               AS hamming,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY bit_count(xor(q.sig::BITSTRING,
                                      e.sig::BITSTRING)), e.vec_id)::INT
               AS rank
      FROM sigs q JOIN sigs e ON q.vec_id < 10 AND q.vec_id != e.vec_id
    ) WHERE rank <= 5 ORDER BY query_id, rank
    """,
    late=True,
)(_hamming_knn_q)


def _hamming_recall_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    q = emb.filter(F.col("vec_id") < 10)
    # fused single-candidate-relation form (one corpus scan, one pair
    # enumeration, both rankings over one exchange, join-free recall) —
    # value-identical to knn_recall(hamming_knn(...), bruteforce(...))
    return V.hamming_recall(emb, q, k=5, dim=64, n_proj=16, seed=0)


_register(
    "vec_hamming_recall",
    f"""
    WITH {_sig_cte()},
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY bit_count(xor(q.sig::BITSTRING,
                                        e.sig::BITSTRING)), e.vec_id)
                 AS rank
        FROM sigs q JOIN sigs e ON q.vec_id < 10 AND q.vec_id != e.vec_id
      ) WHERE rank <= 5
    ),
    exact AS (SELECT query_id, neighbor_id
              FROM ({ORACLES['vec_knn_bruteforce']}))
    SELECT x.query_id,
           count(*)::BIGINT AS n_exact,
           sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             ::BIGINT AS n_hit,
           sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE AS recall
    FROM exact x LEFT JOIN approx a
      ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
    GROUP BY x.query_id
    """,
    late=True,
)(_hamming_recall_q)


# =========================================================================
# round 9 batch 3: tokenizer fertility, Bloom FPR audit, centroid drift
# =========================================================================


def _fertility_q(spark: SparkSession, sf: str) -> DataFrame:
    return X.tokenizer_fertility(load_table(spark, "documents", sf))


_register(
    "text_tokenizer_fertility",
    r"""
    WITH c AS (
      SELECT lang,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             t -> t != ''))::BIGINT AS w,
             len(list_filter(string_split_regex(
               regexp_replace(
                 regexp_replace(lower(text), '([a-z]+)(\d)', '\1 \2', 'g'),
                 '(\d)([a-z])', '\1 \2', 'g'),
               '\s+'), t -> t != ''))::BIGINT AS s
      FROM documents
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(w)::BIGINT AS n_words, sum(s)::BIGINT AS n_subwords,
           sum(s)::BIGINT / sum(w)::BIGINT::DOUBLE AS fertility
    FROM c GROUP BY lang ORDER BY lang
    """,
    late=True,
)(_fertility_q)


def _bloom_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import sketches as SK2

    ev = _events(spark, sf)
    return SK2.bloom_fpr_audit(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "error"),
        "event_id",
        m_bits=4096,
        k=4,
    )


_register(
    "sketch_bloom_fpr",
    """
    WITH a_el AS (
      SELECT DISTINCT event_id AS e FROM events
      WHERE event_type = 'purchase' AND event_id IS NOT NULL
    ), b_el AS (
      SELECT e FROM (
        SELECT DISTINCT event_id AS e FROM events
        WHERE event_type = 'error' AND event_id IS NOT NULL)
      WHERE e NOT IN (SELECT e FROM a_el)
    ), hashes(i) AS (VALUES (0), (1), (2), (3)),
    bits AS (
      SELECT DISTINCT
        ('0x' || substr(md5(i::VARCHAR || ':' || e::VARCHAR), 1, 12))
          ::BIGINT % 4096 AS pos
      FROM a_el, hashes
    ), probe AS (
      SELECT e,
        ('0x' || substr(md5(i::VARCHAR || ':' || e::VARCHAR), 1, 12))
          ::BIGINT % 4096 AS pos
      FROM b_el, hashes
    ), fp AS (
      SELECT count(*)::BIGINT AS n_false_positive FROM (
        SELECT p.e FROM probe p JOIN bits USING (pos)
        GROUP BY p.e HAVING count(*) = 4)
    )
    SELECT (SELECT count(*)::BIGINT FROM a_el) AS n_inserted,
           (SELECT count(*)::BIGINT FROM b_el) AS n_probed,
           (SELECT count(*)::BIGINT FROM bits) AS bits_set,
           n_false_positive,
           n_false_positive
             / (SELECT count(*) FROM b_el)::DOUBLE AS observed_fpr,
           round(pow(1.0 - exp(-4.0
                   * (SELECT count(*) FROM a_el)::DOUBLE / 4096.0),
                 4.0), 6) AS theoretical_fpr
    FROM fp
    """,
    late=True,
)(_bloom_q)


def _centroid_drift_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    return V.centroid_drift(emb, F.col("vec_id") % 2 == 1, dim=64)


_register(
    "vec_centroid_drift",
    """
    WITH base AS (
      SELECT label, (vec_id % 2)::INT AS side, r.i AS d,
             floor(embedding[r.i]::DOUBLE * 1000000.0 + 0.5)::BIGINT
               AS vm
      FROM embeddings, UNNEST(range(1, 65)) AS r(i)
    ), dims AS (
      SELECT label, side, d, sum(vm)::BIGINT AS s,
             count(*)::BIGINT AS n
      FROM base GROUP BY 1, 2, 3
    ), sides AS (
      SELECT label, d,
             max(CASE WHEN side = 0 THEN s END) AS sa,
             max(CASE WHEN side = 1 THEN s END) AS sb,
             max(CASE WHEN side = 0 THEN n END) AS na,
             max(CASE WHEN side = 1 THEN n END) AS nb
      FROM dims GROUP BY 1, 2
    ), moments AS (
      SELECT label, max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
             sum(sa::HUGEINT * sb::HUGEINT) AS dot,
             sum(sa::HUGEINT * sa::HUGEINT) AS naa,
             sum(sb::HUGEINT * sb::HUGEINT) AS nbb
      FROM sides GROUP BY 1
    )
    SELECT label, n_a, n_b,
           CASE WHEN naa > 0 AND nbb > 0
                THEN round(dot::DOUBLE
                           / (sqrt(naa::DOUBLE) * sqrt(nbb::DOUBLE)), 6)
           END AS centroid_cosine
    FROM moments ORDER BY label
    """,
    late=True,
)(_centroid_drift_q)


# =========================================================================
# round 9 batch 4: k-hop blast radius, freshness audit, ER blocking audit
# =========================================================================


def _khop_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import graph as G5

    part = (
        load_table(spark, "part", sf)
        .where(F.col("p_brand").startswith("Brand#1"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(part), "l_partkey", "left_semi")
        .select("l_orderkey", "l_partkey")
    )
    e = G5.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    seeds = e.agg(F.min("a").alias("node"))
    return G5.khop_reach(e, seeds, max_hops=3)


_register(
    "graph_khop_reach",
    """
    WITH pp AS (SELECT p_partkey FROM part WHERE p_brand LIKE 'Brand#1%'),
    li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS v
           FROM lineitem JOIN pp ON l_partkey = p_partkey),
    e AS MATERIALIZED (SELECT DISTINCT x.v AS a, y.v AS b
          FROM li x JOIN li y ON x.o = y.o AND x.v < y.v),
    e2 AS MATERIALIZED (
      SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
    h0 AS MATERIALIZED (SELECT min(a)::BIGINT AS node FROM e),
    h1 AS MATERIALIZED (
      SELECT DISTINCT d AS node FROM e2 JOIN h0 ON e2.s = h0.node
      WHERE d NOT IN (SELECT node FROM h0)),
    h2 AS MATERIALIZED (
      SELECT DISTINCT d AS node FROM e2 JOIN h1 ON e2.s = h1.node
      WHERE d NOT IN (SELECT node FROM h0)
        AND d NOT IN (SELECT node FROM h1)),
    h3 AS MATERIALIZED (
      SELECT DISTINCT d AS node FROM e2 JOIN h2 ON e2.s = h2.node
      WHERE d NOT IN (SELECT node FROM h0)
        AND d NOT IN (SELECT node FROM h1)
        AND d NOT IN (SELECT node FROM h2))
    SELECT node, 0 AS hop FROM h0
    UNION ALL SELECT node, 1 FROM h1
    UNION ALL SELECT node, 2 FROM h2
    UNION ALL SELECT node, 3 FROM h3
    ORDER BY hop, node
    """,
    late=True,
)(_khop_q)


def _freshness_q(spark: SparkSession, sf: str) -> DataFrame:
    return P.freshness_audit(_events(spark, sf), "ts", "event_type")


_register(
    "dq_freshness",
    """
    WITH b AS (
      SELECT max(floor(epoch(ts))::BIGINT) AS gmax,
             min(floor(epoch(ts))::BIGINT) AS gmin
      FROM events
    ), per AS (
      SELECT event_type,
             max(floor(epoch(ts))::BIGINT) AS last_ts_s,
             count(*)::BIGINT AS n_total,
             sum(CASE WHEN floor(epoch(ts))::BIGINT > gmax - 86400
                      THEN 1 ELSE 0 END)::BIGINT AS n_last_window,
             max(gmax) AS gmax, max(gmin) AS gmin
      FROM events, b GROUP BY 1
    )
    SELECT event_type, last_ts_s,
           (gmax - last_ts_s)::BIGINT AS lag_s,
           n_total, n_last_window,
           n_total / ((gmax - gmin) // 86400 + 1)::DOUBLE
             AS avg_per_window,
           n_last_window::DOUBLE * ((gmax - gmin) // 86400 + 1)::DOUBLE
             / n_total::DOUBLE AS last_window_ratio
    FROM per ORDER BY event_type
    """,
    late=True,
)(_freshness_q)


def _blocking_audit_q(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import joins as J2

    p = load_table(spark, "part", sf)
    return J2.blocking_audit(p, [
        ("brand", F.col("p_brand")),
        ("name_prefix2", F.lower(F.substring("p_name", 1, 2))),
        ("name_prefix4", F.lower(F.substring("p_name", 1, 4))),
    ])


_register(
    "er_blocking_audit",
    """
    WITH s1 AS (
      SELECT p_brand AS k, count(*)::BIGINT AS b FROM part
      WHERE p_brand IS NOT NULL GROUP BY 1
    ), s2 AS (
      SELECT lower(substr(p_name, 1, 2)) AS k, count(*)::BIGINT AS b
      FROM part WHERE p_name IS NOT NULL GROUP BY 1
    ), s3 AS (
      SELECT lower(substr(p_name, 1, 4)) AS k, count(*)::BIGINT AS b
      FROM part WHERE p_name IS NOT NULL GROUP BY 1
    ), rolled AS (
      SELECT 'brand' AS scheme, sum(b)::BIGINT AS n_records,
             count(*)::BIGINT AS n_blocks,
             sum(b * (b - 1) // 2)::BIGINT AS candidate_pairs,
             max(b)::BIGINT AS max_block,
             max(b * (b - 1) // 2)::BIGINT AS max_pairs
      FROM s1
      UNION ALL
      SELECT 'name_prefix2', sum(b)::BIGINT, count(*)::BIGINT,
             sum(b * (b - 1) // 2)::BIGINT, max(b)::BIGINT,
             max(b * (b - 1) // 2)::BIGINT
      FROM s2
      UNION ALL
      SELECT 'name_prefix4', sum(b)::BIGINT, count(*)::BIGINT,
             sum(b * (b - 1) // 2)::BIGINT, max(b)::BIGINT,
             max(b * (b - 1) // 2)::BIGINT
      FROM s3
    )
    SELECT scheme, n_records, n_blocks, candidate_pairs,
           1.0 - candidate_pairs::DOUBLE
                 / (n_records * (n_records - 1) // 2)::DOUBLE
             AS reduction_ratio,
           max_block,
           CASE WHEN candidate_pairs > 0
                THEN max_pairs / candidate_pairs::DOUBLE
                ELSE 0.0 END AS max_block_pair_share
    FROM rolled ORDER BY scheme
    """,
    late=True,
)(_blocking_audit_q)


