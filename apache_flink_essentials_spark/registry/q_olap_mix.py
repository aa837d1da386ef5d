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
from .q_northstar import _MINHASH_ORACLE  # noqa: F401

# =========================================================================
# OLAP multi-grain aggregation (rollup / cube / grouping sets / pivot)
# =========================================================================
from apache_flink_essentials_spark.operators import olap as O  # noqa: E402


def _events_daily(spark: SparkSession, sf: str) -> DataFrame:
    return _events(spark, sf).select(
        (F.floor(F.col("ts").cast("long") / 86400) * 86400)
        .cast("long").alias("day_start"),
        "event_type", "user_id", "value",
    )


_register(
    "olap_rollup_daily_type",
    """
    WITH ev AS (
      SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS day_start,
             event_type, value
      FROM events
    )
    SELECT day_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(GROUPING(day_start) AS INT) AS g_day_start,
           CAST(GROUPING(event_type) AS INT) AS g_event_type
    FROM ev GROUP BY ROLLUP (day_start, event_type)
    """,
)(lambda spark, sf: O.rollup_agg(
    _events_daily(spark, sf),
    ["day_start", "event_type"],
    {
        "n_events": F.count("*"),
        "sum_value": F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double"),
    },
))


_register(
    "olap_cube_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)::BIGINT AS sum_qty,
           count(*) AS n_rows,
           CAST(GROUPING(l_returnflag) AS INT) AS g_l_returnflag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_l_linestatus
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)(lambda spark, sf: O.cube_agg(
    load_table(spark, "lineitem", sf),
    ["l_returnflag", "l_linestatus"],
    {
        "sum_qty": F.sum("l_quantity").cast("long"),
        "n_rows": F.count("*"),
    },
))


_register(
    "olap_grouping_sets_events",
    """
    WITH ev AS (
      SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS day_start,
             event_type, value
      FROM events
    )
    SELECT day_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(GROUPING(day_start) AS INT) AS g_day_start,
           CAST(GROUPING(event_type) AS INT) AS g_event_type
    FROM ev GROUP BY GROUPING SETS ((day_start), (event_type), ())
    """,
)(lambda spark, sf: O.grouping_sets_agg(
    _events_daily(spark, sf),
    [["day_start"], ["event_type"], []],
    ["day_start", "event_type"],
    {
        "n_events": "count(*)",
        "sum_value": "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)",
    },
))


_register(
    "olap_pivot_user_event_type",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)(lambda spark, sf: O.pivot_agg(
    _events(spark, sf),
    ["user_id"], "event_type",
    ["click", "error", "purchase", "signup", "view"],
    F.count(F.lit(1)), fill=0,
))


# =========================================================================
# regex redaction + inverted index + non-equi band join + rank analytics
# =========================================================================

_register(
    "text_redact",
    r"""
    SELECT doc_id,
           length(regexp_extract_all(text, 'sp[a-z]+k'))::BIGINT AS n_spark,
           length(regexp_extract_all(text, 'vec[a-z]*'))::BIGINT AS n_vec,
           regexp_replace(
             regexp_replace(text, 'sp[a-z]+k', '<SPARK>', 'g'),
             'vec[a-z]*', '<VEC>', 'g') AS redacted
    FROM documents
    """,
)(lambda spark, sf: X.redact(
    load_table(spark, "documents", sf),
    {"spark": r"sp[a-z]+k", "vec": r"vec[a-z]*"},
))


_register(
    "text_inverted_index",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ), pairs AS (
      SELECT DISTINCT doc_id, term FROM tok WHERE term != ''
    )
    SELECT term, count(*)::BIGINT AS df,
           array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 20),
                           ',') AS postings
    FROM pairs GROUP BY term
    """,
)(lambda spark, sf: X.inverted_index(
    load_table(spark, "documents", sf), max_postings=20
).withColumn(
    # The library op stays array-valued; the registered query joins the
    # postings to a scalar string because the driver harness canonicalizes
    # with pandas sort/factorize, which cannot hash list cells (r03 err).
    "postings", F.array_join("postings", ",")
))


def _value_bands(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0),
         ("high", 150.0, 300.0), ("extreme", 300.0, 1e9)],
        "band string, lo double, hi double",
    )


_register(
    "events_value_bands",
    """
    WITH bands(band, lo, hi) AS (VALUES
      ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
      ('high', 150.0, 300.0), ('extreme', 300.0, 1e9))
    SELECT band, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events LEFT JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """,
)(lambda spark, sf: J.range_band_join(
    _events(spark, sf), _value_bands(spark), "value"
).groupBy("band").agg(
    F.count("*").alias("n_events"),
    F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    .alias("sum_value"),
))


_register(
    "events_value_ranks",
    """
    SELECT event_id, event_type,
           ntile(10) OVER w AS decile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)(lambda spark, sf: _events(spark, sf).select(
    "event_id", "event_type",
    F.ntile(10).over(
        _Win.partitionBy("event_type").orderBy("value", "event_id")
    ).alias("decile"),
    F.percent_rank().over(
        _Win.partitionBy("event_type").orderBy("value", "event_id")
    ).alias("pr"),
    F.cume_dist().over(
        _Win.partitionBy("event_type").orderBy("value", "event_id")
    ).alias("cd"),
))


# =========================================================================
# set operations + iterative graph analytics
# =========================================================================
from apache_flink_essentials_spark.operators import graph as G  # noqa: E402


def _users_of(spark: SparkSession, sf: str, event_type: str) -> DataFrame:
    return (
        _events(spark, sf)
        .filter(F.col("event_type") == event_type)
        .select("user_id")
    )


_register(
    "events_set_ops",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)(lambda spark, sf: _users_of(spark, sf, "click")
    .intersect(_users_of(spark, sf, "view"))
    .subtract(_users_of(spark, sf, "purchase")))


_register(
    "events_set_ops_all",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)(lambda spark, sf: _users_of(spark, sf, "click")
    .intersectAll(_users_of(spark, sf, "view")))


# customer→supplier order graph; iterative float algorithm → rows-only
# driver check (semantics pinned by tests/test_graph.py, SURVEY §5)
_register("graph_pagerank_custsupp")(
    lambda spark, sf: G.pagerank(
        load_table(spark, "orders", sf)
        .join(load_table(spark, "lineitem", sf),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("src"),
                (F.col("l_suppkey") + F.lit(1_000_000)).alias("dst")),
        iterations=5,
    )
)


# Fixed-point PageRank twin: every quantity is an int64 multiple of
# 1e-12 and every division floors, so integer-sum commutativity makes the
# result bit-exact under ANY shuffle order — the float pagerank above
# stays rows-only (last-ulp depends on partitioning), this variant is a
# full hash-matched oracle row. The DuckDB twin unrolls the same 5
# iterations as CTE stages (`//` floor-div == Spark `div` on positives).
_PR_FP_ITERS = 5
_PR_FP_SCALE = 10**12


def _pagerank_fp_oracle() -> str:
    head = """
    WITH e AS (
      SELECT DISTINCT o_custkey::BIGINT AS src,
             (l_suppkey + 1000000)::BIGINT AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
    outdeg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
    r0 AS (
      SELECT node, (%(scale)d // (SELECT n FROM nn))::BIGINT AS rank_fp
      FROM nodes
    )""" % {"scale": _PR_FP_SCALE}
    steps = []
    for i in range(1, _PR_FP_ITERS + 1):
        p = f"r{i - 1}"
        steps.append(f""",
    d{i} AS (
      SELECT coalesce(sum(r.rank_fp), 0)::BIGINT AS dang
      FROM {p} r LEFT JOIN outdeg o ON r.node = o.src
      WHERE o.src IS NULL
    ),
    c{i} AS (
      SELECT e.dst AS node,
             sum((85 * r.rank_fp) // (100 * o.outdeg))::BIGINT AS contrib
      FROM e JOIN {p} r ON e.src = r.node JOIN outdeg o ON e.src = o.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT nd.node,
             ((15 * {_PR_FP_SCALE}) // (100 * (SELECT n FROM nn))
              + (85 * (SELECT dang FROM d{i}))
                  // (100 * (SELECT n FROM nn))
              + coalesce(c.contrib, 0))::BIGINT AS rank_fp
      FROM nodes nd LEFT JOIN c{i} c ON nd.node = c.node
    )""")
    return (
        head + "".join(steps)
        + f"\n    SELECT node::BIGINT AS node, rank_fp FROM r{_PR_FP_ITERS}"
    )


_register(
    "graph_pagerank_fixedpoint", _pagerank_fp_oracle(), late=True,
)(lambda spark, sf: G.pagerank_fixedpoint(
    load_table(spark, "orders", sf)
    .join(load_table(spark, "lineitem", sf),
          F.col("o_orderkey") == F.col("l_orderkey"))
    .select(F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + F.lit(1_000_000)).alias("dst")),
    iterations=_PR_FP_ITERS,
    scale=_PR_FP_SCALE,
))


# =========================================================================
# document chunking + corpus drift
# =========================================================================

_register(
    "curation_chunk_documents",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n,
             greatest(0, CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) * 24)
               AS last_start
      FROM t
    )
    SELECT doc_id,
           CAST(start / 24 AS INT) AS chunk_id,
           array_to_string(list_slice(toks, start + 1, start + 32), ' ')
             AS chunk_text,
           least(32, n - start)::BIGINT AS n_chunk_tokens
    FROM (
      SELECT doc_id, toks, n,
             unnest(range(0, last_start + 1, 24)) AS start
      FROM s
    )
    """,
)(lambda spark, sf: CU.chunk_documents(
    load_table(spark, "documents", sf), max_tokens=32, overlap=8
))


_register(
    "text_source_affinity_top5",
    r"""
    WITH pairs AS (
      SELECT source, term, count(*)::BIGINT AS c_st
      FROM (
        SELECT source,
               unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents
      ) WHERE term != '' GROUP BY source, term
    ), per_term AS (
      SELECT term, sum(c_st)::BIGINT AS c_t FROM pairs GROUP BY term
    ), per_src AS (
      SELECT source, sum(c_st)::BIGINT AS n_s FROM pairs GROUP BY source
    ), tot AS (
      SELECT sum(c_t)::BIGINT AS n_tot FROM per_term
    ), scored AS (
      SELECT p.source, p.term, p.c_st, t.c_t,
             CAST(p.c_st * n_tot AS DOUBLE) / CAST(t.c_t * s.n_s AS DOUBLE)
               AS affinity
      FROM pairs p JOIN per_term t USING (term)
                   JOIN per_src s USING (source), tot
    )
    SELECT source, term, c_st, c_t, affinity, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY affinity DESC, term) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)(lambda spark, sf: X.source_term_affinity(
    load_table(spark, "documents", sf), k=5
))


# =========================================================================
# exact-count stratified sampling + OOV-rate quality proxy + semantic dedup
# =========================================================================

_register(
    "curation_sample_n_per_stratum",
    """
    SELECT doc_id, source, sample_rank FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5('7:' || doc_id) ASC, doc_id ASC) AS INT)
               AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 20
    """,
)(lambda spark, sf: CU.sample_n_per_stratum(
    load_table(spark, "documents", sf), "source", 20, seed=7
).select("doc_id", "source", "sample_rank"))


_register(
    "text_oov_rate",
    r"""
    WITH tok AS (
      SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents
      ) WHERE term != ''
    ), vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS total_tf FROM tok GROUP BY term
        ORDER BY total_tf DESC, term ASC LIMIT 100
      )
    )
    SELECT t.doc_id,
           count(*)::BIGINT AS n_tokens,
           sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS oov_tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.doc_id
    """,
)(lambda spark, sf: X.oov_rate(
    load_table(spark, "documents", sf), vocab_size=100
))


# k-means is float-iterative → rows-only driver check; semantics pinned by
# the planted-duplicate test in tests/test_text_vector.py (SURVEY §5).
# Threshold 0.4 is calibrated to the near-random fixture embeddings (no
# cosine ≥0.6 pairs exist at sf0.01); real corpora use 0.9-0.97.
_register("vector_semantic_dedup")(
    lambda spark, sf: V.semantic_dedup(
        load_table(spark, "embeddings", sf), k=8, iters=2, threshold=0.4,
        dim=64,
    )
)


# =========================================================================
# point-in-time (as-of-validity) join + weighted sampling
# =========================================================================

def _cdc_pit(spark: SparkSession, sf: str) -> DataFrame:
    """Each event joined to the SCD2 dimension version valid at its ts —
    fact and dimension derive from the same events changelog, so the fact
    at a version's open is matched to exactly that version."""
    ev = _events(spark, sf)
    fact = ev.select(
        "event_id", "user_id", F.col("ts").cast("long").alias("ts_s")
    )
    changes = ev.select(
        "user_id",
        F.col("event_id").alias("dim_event_id"),
        F.col("ts").cast("long").alias("chg_ts"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    dim = C.scd2_history(changes, ["user_id"], ["chg_ts", "dim_event_id"])
    return C.point_in_time_join(
        fact, dim, ["user_id"], "ts_s", ["dim_event_id", "version"]
    ).select("event_id", "user_id", "ts_s", "dim_event_id", "version")


_register(
    "cdc_point_in_time",
    """
    WITH dim AS (
      SELECT user_id, dim_event_id, valid_from, valid_to, version FROM (
        SELECT user_id, dim_event_id, chg_ts AS valid_from,
               lead(chg_ts) OVER w AS valid_to,
               (row_number() OVER w)::INT AS version, op
        FROM (
          SELECT user_id, event_id AS dim_event_id,
                 floor(epoch(ts))::BIGINT AS chg_ts,
                 CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
          FROM events
        )
        WINDOW w AS (PARTITION BY user_id ORDER BY chg_ts, dim_event_id)
      ) WHERE op != 'D'
    )
    SELECT f.event_id, f.user_id, floor(epoch(f.ts))::BIGINT AS ts_s,
           d.dim_event_id, d.version
    FROM events f JOIN dim d
      ON f.user_id = d.user_id
     AND d.valid_from <= floor(epoch(f.ts))::BIGINT
     AND (floor(epoch(f.ts))::BIGINT < d.valid_to OR d.valid_to IS NULL)
    """,
)(_cdc_pit)


_register(
    "curation_weighted_sample",
    """
    WITH stats AS (
      SELECT sum(CAST(n_chars AS DECIMAL(28,6))) AS w_sum,
             count(*) AS n FROM documents
    )
    SELECT doc_id, source, n_chars FROM documents, stats
    WHERE ('0x' || substr(md5('5:' || doc_id), 1, 8))::BIGINT / 4294967296.0
          < least(1.0, 0.2 * CAST(n_chars AS DOUBLE) * CAST(n AS DOUBLE)
                       / CAST(w_sum AS DOUBLE))
    """,
)(lambda spark, sf: CU.weighted_sample(
    load_table(spark, "documents", sf), "n_chars", 0.2, seed=5
).select("doc_id", "source", "n_chars"))


_register(
    "curation_group_split",
    """
    SELECT doc_id, source,
           CASE
             WHEN ('0x' || substr(md5('3:' || source), 1, 8))::BIGINT
                  / 4294967296.0 < 0.8 THEN 'train'
             WHEN ('0x' || substr(md5('3:' || source), 1, 8))::BIGINT
                  / 4294967296.0 < 0.9 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)(lambda spark, sf: CU.group_split(
    load_table(spark, "documents", sf), "source",
    {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3,
).select("doc_id", "source", "split"))


# =========================================================================
# capped sessions + grouped covariance + BM25 ranking
# =========================================================================

_register(
    "w3_session_capped",
    """
    WITH base AS (
      SELECT user_id, floor(epoch(ts))::BIGINT AS ts_s, event_id FROM events
    ), brk AS (
      SELECT user_id, ts_s, event_id,
             CASE WHEN ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS b
      FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ), sess AS (
      SELECT user_id, ts_s, event_id,
             sum(b) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
               AS sess_no
      FROM brk
    ), sub AS (
      SELECT user_id, ts_s, sess_no,
             floor((ts_s - min(ts_s) OVER (PARTITION BY user_id, sess_no))
                   / 7200)::BIGINT AS sub_d,
             floor((row_number() OVER (PARTITION BY user_id, sess_no
                                       ORDER BY ts_s, event_id) - 1)
                   / 5)::BIGINT AS sub_c
      FROM sess
    )
    SELECT user_id, min(ts_s)::BIGINT AS session_start,
           max(ts_s)::BIGINT AS session_end, count(*)::BIGINT AS n_events
    FROM sub GROUP BY user_id, sess_no, sub_d, sub_c
    """,
)(lambda spark, sf: W.session_capped(
    _events(spark, sf), "user_id", "ts", 1800, "event_id",
    max_duration_seconds=7200, max_events=5,
))


_register(
    "events_grouped_covariance",
    """
    SELECT user_id, n,
           sxy / n - (sx / n) * (sy / n) AS cov_pop
    FROM (
      SELECT user_id, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             CAST(sum(CAST(floor(epoch(ts) / 3600)::BIGINT % 24
                           AS DECIMAL(18,4))) AS DOUBLE) AS sy,
             CAST(sum(CAST(value AS DECIMAL(18,4))
                      * CAST(floor(epoch(ts) / 3600)::BIGINT % 24
                             AS DECIMAL(18,4))) AS DOUBLE) AS sxy
      FROM events GROUP BY user_id
    ) WHERE n >= 2
    """,
)(lambda spark, sf: P.grouped_covariance(
    _events(spark, sf), "user_id", "value",
    (F.col("ts").cast("long") / F.lit(3600)).cast("long") % 24,
))


_register(
    "text_bm25",
    r"""
    WITH d2 AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
             len(string_split_regex(lower(text), '\s+')) AS dl
      FROM documents
    ), scalars AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM d2
    ), tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, dl, unnest(toks) AS term FROM d2
      ) WHERE term IN ('spark', 'window', 'join')
      GROUP BY doc_id, dl, term
    ), dfreq AS (
      SELECT term, count(*) AS df_t FROM tf GROUP BY term
    )
    SELECT doc_id, CAST(sum(CAST(score AS DECIMAL(38,18))) AS DOUBLE) AS bm25
    FROM (
      SELECT tf.doc_id,
             (CAST(n_docs AS DOUBLE) / CAST(df_t AS DOUBLE))
             * (CAST(tf AS DOUBLE) * 2.2
                / (CAST(tf AS DOUBLE)
                   + 1.2 * (1.0 - 0.75
                            + 0.75 * CAST(dl AS DOUBLE) / avgdl))) AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN scalars
    ) GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
)(lambda spark, sf: X.bm25_rank(
    load_table(spark, "documents", sf), ["spark", "window", "join"], k=10
))


# =========================================================================
# incremental NEAR dedup: new batch (odd ids) vs corpus (even ids)
# =========================================================================

# reuse the minhash oracle's CTE chain up through `banded`, then cross-join
# new-side bands against corpus-side bands instead of self-pairing
_MINHASH_BANDED_PREFIX = _MINHASH_ORACLE.split("), pairs AS (")[0]

_NEAR_INC_ORACLE = _MINHASH_BANDED_PREFIX + """
    ), pairs AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM banded n JOIN banded c
        ON n.band_idx = c.band_idx AND n.band_hash = c.band_hash
       AND n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
    ), matched AS (
      SELECT DISTINCT p.new_id
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.new_id
      JOIN toks tb ON tb.doc_id = p.corpus_id
      WHERE len(list_intersect(ta.tok_set, tb.tok_set))::DOUBLE
                / len(list_distinct(ta.tok_set || tb.tok_set)) >= 0.5
    )
    SELECT doc_id, source FROM documents
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT new_id FROM matched)
"""


def _near_inc(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, "documents", sf)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    return D.near_dedup_against_corpus(new, corpus).select("doc_id", "source")


_register("dedup_near_incremental", _NEAR_INC_ORACLE)(_near_inc)


# =========================================================================
# snapshot diff (reverse CDC) + data-quality expectation report
# =========================================================================

def _snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Two latest-state snapshots built from overlapping event subsets
    (event_id % 3 != 0 vs % 2 != 0) diffed back into a changelog — users
    present only in one snapshot surface as A/D, differing latest values
    as U. Single-scan/single-shuffle form (r12): both snapshots derive
    from the same events relation, so snapshot_diff_from_events collapses
    the two changelog windows + full-outer join into one conditional
    max_by aggregate (sf0.1 min-of-5: 0.373 s vs 0.634 s, same rows)."""
    ev = _events(spark, sf).select(
        "user_id", "event_id", F.col("ts").cast("long").alias("ts_s"),
        "value",
    )
    return C.snapshot_diff_from_events(
        ev,
        ["user_id"],
        ["ts_s", "event_id"],
        "value",
        F.col("event_id") % 3 != 0,
        F.col("event_id") % 2 != 0,
    )


_register(
    "cdc_snapshot_diff",
    """
    WITH oldsnap AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY floor(epoch(ts))::BIGINT DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 3 != 0
      ) WHERE rn = 1
    ), newsnap AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY floor(epoch(ts))::BIGINT DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 2 != 0
      ) WHERE rn = 1
    )
    SELECT user_id, change_type, old_value, new_value FROM (
      SELECT coalesce(n.user_id, o.user_id) AS user_id,
             CASE WHEN o.user_id IS NULL THEN 'A'
                  WHEN n.user_id IS NULL THEN 'D'
                  WHEN o.value IS DISTINCT FROM n.value THEN 'U' END
               AS change_type,
             o.value AS old_value, n.value AS new_value
      FROM oldsnap o FULL OUTER JOIN newsnap n ON o.user_id = n.user_id
    ) WHERE change_type IS NOT NULL
    """,
)(_snapshot_diff)


_register(
    "events_quality_expectations",
    """
    WITH t AS (
      SELECT count(*)::BIGINT AS n_rows,
             sum(CASE WHEN NOT coalesce(event_type != 'error', FALSE)
                      THEN 1 ELSE 0 END)::BIGINT AS v_err,
             sum(CASE WHEN NOT coalesce(ts IS NOT NULL, FALSE)
                      THEN 1 ELSE 0 END)::BIGINT AS v_ts,
             sum(CASE WHEN NOT coalesce(value <= 400, FALSE)
                      THEN 1 ELSE 0 END)::BIGINT AS v_val
      FROM events
    )
    SELECT rule, violations, n_rows,
           CAST(violations AS DOUBLE) / n_rows AS violation_rate
    FROM (
      SELECT 'no_error_events' AS rule, v_err AS violations, n_rows FROM t
      UNION ALL SELECT 'ts_not_null', v_ts, n_rows FROM t
      UNION ALL SELECT 'value_le_400', v_val, n_rows FROM t
    )
    """,
)(lambda spark, sf: P.expect(_events(spark, sf), {
    "no_error_events": F.col("event_type") != "error",
    "ts_not_null": F.col("ts").isNotNull(),
    "value_le_400": F.col("value") <= 400,
}))


_register(
    "curation_boilerplate_chunks",
    r"""
    WITH toked AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
             len(string_split_regex(lower(text), '\s+')) AS n
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             array_to_string(toks[s + 1 : s + 8], ' ') AS chunk_text
      FROM (
        SELECT doc_id, toks,
               unnest(range(0,
                 greatest(0, (ceil((n - 8) / 8.0)::BIGINT) * 8) + 1, 8)) AS s
        FROM toked
      )
    ), freq AS (
      SELECT chunk_text, count(DISTINCT doc_id) AS docs_with_chunk
      FROM chunks GROUP BY chunk_text
    )
    SELECT c.doc_id,
           count(*)::BIGINT AS n_chunks,
           sum(CASE WHEN f.docs_with_chunk >= 2 THEN 1 ELSE 0 END)::BIGINT
             AS n_boilerplate_chunks,
           CAST(sum(CASE WHEN f.docs_with_chunk >= 2 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS boilerplate_fraction
    FROM chunks c JOIN freq f ON c.chunk_text = f.chunk_text
    GROUP BY c.doc_id
    """,
)(lambda spark, sf: CU.boilerplate_chunk_stats(
    load_table(spark, "documents", sf), max_tokens=8, min_docs=2
))


