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
from .q_northstar import _COS, _STOPWORDS_SQL  # noqa: F401

# =========================================================================
# fused multimodal curation decision: text quality × embedding geometry
# =========================================================================

def _fused_curation(spark: SparkSession, sf: str) -> DataFrame:
    """documents and embeddings are id-aligned fixtures (doc_id = vec_id);
    the keep decision fuses a text-side quality score with an
    embedding-side centroid-cosine — the standard two-signal curation
    gate (drop low-quality OR geometrically-outlying items). Both sides
    reduce to (id, score) before the equi-join, so at 100 TB the join
    carries two slim score tables, not text or vectors."""
    q = X.quality_score(load_table(spark, "documents", sf))
    o = V.centroid_outliers(load_table(spark, "embeddings", sf))
    return (
        q.join(o, q["doc_id"] == o["vec_id"])
        .select(
            "doc_id",
            "quality_score",
            "cosine_to_centroid",
            (
                (F.col("quality_score") >= 0.5)
                & (F.col("cosine_to_centroid") >= 0.1)
            ).alias("keep"),
        )
    )


_register(
    "curation_fused_score",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ), q AS (
      SELECT doc_id,
             0.4 * least(1.0, len(toks) / 100.0)
               + 0.4 * (len(list_distinct(toks))::DOUBLE / len(toks))
               + 0.2 * least(1.0, len(list_filter(toks,
                     t -> list_contains({_STOPWORDS_SQL}, t)))::DOUBLE / 5.0)
               AS quality_score
      FROM t
    ), ex AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS pos,
             unnest(list_transform(embedding, x -> x::DOUBLE)) AS val
      FROM embeddings
    ), comp AS (
      SELECT label, pos,
             sum(val::DECIMAL(30,10))::DOUBLE / count(*) AS c
      FROM ex GROUP BY label, pos
    ), cent AS (
      SELECT label, array_agg(c ORDER BY pos) AS centroid
      FROM comp GROUP BY label
    ), o AS (
      SELECT e.vec_id,
             round(
               list_aggregate(list_transform(range(1, 65),
                   i -> e.embedding[i]::DOUBLE * c.centroid[i]), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE),
                   'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> c.centroid[i] * c.centroid[i]), 'sum'))),
             6) AS cosine_to_centroid
      FROM embeddings e JOIN cent c ON e.label = c.label
    )
    SELECT q.doc_id, q.quality_score, o.cosine_to_centroid,
           (q.quality_score >= 0.5 AND o.cosine_to_centroid >= 0.1) AS keep
    FROM q JOIN o ON q.doc_id = o.vec_id
    """,
)(_fused_curation)


# ---- OHLC resampling + time-weighted average ----

_register(
    "ts_ohlc_hourly",
    """
    WITH ranked AS (
      SELECT user_id, value,
             (floor(epoch(ts) / 3600) * 3600)::BIGINT AS bucket,
             row_number() OVER (PARTITION BY user_id, floor(epoch(ts) / 3600)
               ORDER BY floor(epoch(ts))::BIGINT, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, floor(epoch(ts) / 3600)
               ORDER BY floor(epoch(ts))::BIGINT DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, bucket,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*)::BIGINT AS n_events
    FROM ranked GROUP BY user_id, bucket
    """,
)(lambda spark, sf: TS.ohlc(
    _events(spark, sf), "user_id", "ts", "value", 3600, "event_id"
))


_register(
    "ts_time_weighted_avg",
    """
    WITH d AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,4)) AS v,
             lead(floor(epoch(ts))::BIGINT) OVER w
               - floor(epoch(ts))::BIGINT AS dur
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY floor(epoch(ts))::BIGINT, event_id)
    )
    SELECT user_id, total_seconds,
           CAST(wsum AS DOUBLE) / CAST(total_seconds AS DOUBLE) AS twap
    FROM (
      SELECT user_id, sum(v * dur) AS wsum, sum(dur)::BIGINT AS total_seconds
      FROM d WHERE dur IS NOT NULL GROUP BY user_id
    ) WHERE total_seconds > 0
    """,
)(lambda spark, sf: TS.time_weighted_avg(
    _events(spark, sf), "user_id", "ts", "value", "event_id"
))


# ---- generalized N-step ordered funnel (signup → view → purchase) ----
_register(
    "funnel_three_step",
    """
    WITH s0 AS (
      SELECT user_id, min(floor(epoch(ts))::BIGINT) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), s1 AS (
      SELECT s0.user_id, t0, min(floor(epoch(e.ts))::BIGINT) AS t1
      FROM s0 LEFT JOIN events e
        ON e.user_id = s0.user_id AND e.event_type = 'view'
       AND floor(epoch(e.ts))::BIGINT > t0
       AND floor(epoch(e.ts))::BIGINT <= t0 + 604800
      GROUP BY s0.user_id, t0
    ), s2 AS (
      SELECT s1.user_id, t0, t1, min(floor(epoch(e.ts))::BIGINT) AS t2
      FROM s1 LEFT JOIN events e
        ON e.user_id = s1.user_id AND e.event_type = 'purchase'
       AND floor(epoch(e.ts))::BIGINT > t1
       AND floor(epoch(e.ts))::BIGINT <= t1 + 604800
      GROUP BY s1.user_id, t0, t1
    )
    SELECT user_id, t0, t1, t2,
           (CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS completed_steps
    FROM s2
    """,
)(lambda spark, sf: T.funnel_steps(
    _events(spark, sf), "user_id", "ts", "event_type",
    ["signup", "view", "purchase"], 604800,
))


# ---- blocked fuzzy (edit-distance) self-join: near-identical names ----
_register(
    "fuzzy_name_pairs",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS distance
    FROM customer a JOIN customer b
      ON lower(substr(a.c_name, 1, 16)) = lower(substr(b.c_name, 1, 16))
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)(lambda spark, sf: (lambda c: J.fuzzy_join(
    c.select("c_custkey", "c_name"), c.select("c_custkey", "c_name"),
    "c_name", "c_name", max_distance=1, block_chars=16,
).filter(F.col("l_c_custkey") < F.col("r_c_custkey")).select(
    F.col("l_c_custkey").alias("id_a"),
    F.col("r_c_custkey").alias("id_b"),
    "distance",
))(load_table(spark, "customer", sf)))


# PCA is float-iterative (eigendecomposition) → rows-only driver check;
# direction/variance/determinism semantics pinned in tests (SURVEY §5).
# The registered output flattens the array<double> projection into scalar
# pc0..pc3 columns: the driver's pandas canonicalizer factorizes column
# values and cannot hash Python lists (same class of err that hit
# text_inverted_index in r3 — see VERDICT r4 item 1). Library users call
# V.pca_project directly and keep the array column.
_register("vec_pca_project")(
    lambda spark, sf: (lambda emb: V.pca_project(
        emb, V.pca_fit(emb, k=4, dim=64)
    ).select(
        "vec_id",
        *[F.col("pca")[i].alias(f"pc{i}") for i in range(4)],
    ))(load_table(spark, "embeddings", sf))
)


# ---- PCA projection mechanism, FULLY oracle-anchored ----
# The fit is float-iterative (LAPACK eigh) so vec_pca_project stays
# rows-only, but the projection stage is a deterministic centered dot:
# fix a 4x64 basis from integer arithmetic, inline the identical decimal
# literals on both sides (decimal->double parse is correctly rounded in
# both engines), and the left-assoc fold in dot_expr matches SQL's
# left-assoc `+` chain bit for bit — raw doubles hash-match, no rounding
# contract needed (the vec_pq_adc precedent, applied to PCA).
_PCA_FIX_MEAN = [((i * 37) % 19 - 9) / 100.0 for i in range(64)]
_PCA_FIX_COMPS = [
    [(((j * 64 + i) * 2654435761) % 2000 - 1000) / 1000.0
     for i in range(64)]
    for j in range(4)
]


def _pca_apply_oracle() -> str:
    cols = ", ".join(
        "("
        + " + ".join(
            f"(embedding[{i + 1}]::DOUBLE - ({_PCA_FIX_MEAN[i]!r}))"
            f" * ({_PCA_FIX_COMPS[j][i]!r})"
            for i in range(64)
        )
        + f") AS pc{j}"
        for j in range(4)
    )
    return f"SELECT vec_id, {cols} FROM embeddings"


_register("vec_pca_apply", _pca_apply_oracle(), late=True)(
    lambda spark, sf: V.pca_project(
        load_table(spark, "embeddings", sf),
        {"mean": _PCA_FIX_MEAN, "components": _PCA_FIX_COMPS},
    ).select(
        "vec_id",
        *[F.col("pca")[i].alias(f"pc{i}") for i in range(4)],
    )
)


# ---- rolling 7-day active users (sliding-window COUNT DISTINCT) ----
# Oracle checks the EXACT form (rows replicate 7x before the distinct agg).
# exact=False is the default 100 TB path: per-day HLL pane sketches merged
# across windows (W.sliding_count_distinct) — error-bound-tested vs exact in
# tests/test_windows.py, ~1.6% relative error at default precision.
_register(
    "events_wau_7d",
    """
    SELECT ws::BIGINT AS window_start, (ws + 604800)::BIGINT AS window_end,
           count(DISTINCT user_id)::BIGINT AS active_users
    FROM (
      SELECT (floor(epoch(ts) / 86400) - k) * 86400 AS ws, user_id
      FROM events, unnest(range(0, 7)) AS t(k)
    ) GROUP BY 1, 2
    """,
)(lambda spark, sf: W.sliding_count_distinct(
    _events(spark, sf), "ts", "user_id", 604800, 86400,
    exact=True, alias="active_users",
))


# ---- per-window top-k groups (daily top event types) ----
_register(
    "events_daily_top_types",
    """
    SELECT day_start, event_type, n_events, rnk FROM (
      SELECT day_start, event_type, n_events,
             row_number() OVER (PARTITION BY day_start
               ORDER BY n_events DESC, event_type) AS rnk
      FROM (
        SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS day_start,
               event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2
      )
    ) WHERE rnk <= 2
    """,
)(lambda spark, sf: (lambda agg: agg.withColumn(
    "rnk",
    F.row_number().over(
        _Win.partitionBy("day_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
    ),
).filter(F.col("rnk") <= 2))(
    _events(spark, sf)
    .groupBy(
        (F.floor(F.col("ts").cast("long") / 86400) * 86400).alias("day_start"),
        "event_type",
    )
    .agg(F.count(F.lit(1)).alias("n_events"))
))


# ---- substring-level dedup: duplicated k-gram span coverage per doc ----
_register(
    "dedup_substring_spans",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      FROM documents
    ), base AS (
      SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 20
    ), flat AS (
      SELECT doc_id, n, g.pos AS pos, g.fp AS fp FROM (
        SELECT doc_id, n, unnest(list_transform(range(1, n - 20 + 2),
            i -> struct_pack(pos := i - 1,
                             fp := md5(array_to_string(t[i:i+19], ' '))))) AS g
        FROM base) q
    ), dup AS (
      SELECT fp FROM flat GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
    ), m AS (
      SELECT doc_id, n, pos FROM flat WHERE fp IN (SELECT fp FROM dup)
    ), cov AS (
      SELECT doc_id, n,
             least(20, coalesce(lead(pos) OVER (PARTITION BY doc_id
                                                ORDER BY pos),
                                pos + 20) - pos) AS c
      FROM m
    ), agg AS (
      SELECT doc_id, sum(c)::BIGINT AS dup_tokens FROM cov GROUP BY doc_id
    )
    SELECT b.doc_id, b.n::INT AS n_tokens,
           coalesce(a.dup_tokens, 0)::BIGINT AS dup_tokens,
           coalesce(a.dup_tokens, 0) / b.n AS dup_fraction
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)(lambda spark, sf: D.substring_dup_spans(
    load_table(spark, "documents", sf), k=20, min_docs=2
))


# ---- CEP-style pattern detection (Flink CEP analog) ----
from apache_flink_essentials_spark.operators import patterns as PT  # noqa: E402

_register(
    "events_cep_error_triple",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2,
             lead(ts, 2) OVER w AS end_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           floor(epoch(ts))::BIGINT AS start_s,
           floor(epoch(end_ts))::BIGINT AS end_s,
           (floor(epoch(end_ts)) - floor(epoch(ts)))::BIGINT AS span_seconds
    FROM o
    WHERE event_type = 'error' AND t1 = 'error' AND t2 = 'error'
      AND floor(epoch(end_ts)) - floor(epoch(ts)) <= 86400
    """,
)(lambda spark, sf: PT.match_strict_sequence(
    _events(spark, sf), "user_id", "ts", "event_type",
    ["error", "error", "error"], within_seconds=86400,
    order_cols=["event_id"],
).select(
    "user_id",
    F.col("start_ts").cast("long").alias("start_s"),
    F.col("end_ts").cast("long").alias("end_s"),
    "span_seconds",
))


_register(
    "events_cep_abandoned_view",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p
      FROM events
    )
    SELECT user_id, floor(epoch(ts))::BIGINT AS view_s,
           floor(epoch(next_p))::BIGINT AS next_purchase_s
    FROM o
    WHERE event_type = 'view'
      AND (next_p IS NULL OR floor(epoch(next_p)) - floor(epoch(ts)) > 1800)
    """,
)(lambda spark, sf: PT.match_absence(
    _events(spark, sf), "user_id", "ts", "event_type",
    first="view", absent="purchase", within_seconds=1800,
    order_cols=["event_id"],
).select(
    "user_id",
    F.col("ts").cast("long").alias("view_s"),
    F.col("next_absent_ts").cast("long").alias("next_purchase_s"),
))


# ---- gapfill with linear interpolation (TimescaleDB `interpolate`) ----
_register(
    "ts_interpolate_hourly",
    """
    WITH ranked AS (
      SELECT user_id, value,
             (floor(epoch(ts) / 3600) * 3600)::BIGINT AS bucket,
             row_number() OVER (
               PARTITION BY user_id, floor(epoch(ts) / 3600)
               ORDER BY floor(epoch(ts))::BIGINT DESC, event_id DESC) AS rn
      FROM events
    ), obs AS (
      SELECT user_id, bucket, value FROM ranked WHERE rn = 1
    ), bounds AS (
      SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
      FROM obs GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(range(mn, mx + 3600, 3600)) AS bucket
      FROM bounds
    ), joined AS (
      SELECT g.user_id, g.bucket,
             last_value(o.value IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN o.value IS NOT NULL THEN g.bucket END
                        IGNORE NULLS) OVER wp AS pb,
             first_value(o.value IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN o.value IS NOT NULL THEN g.bucket END
                         IGNORE NULLS) OVER wf AS nb
      FROM grid g
      LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket
      WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY g.user_id ORDER BY g.bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket,
           CASE WHEN nb = pb THEN pv
                ELSE pv + (nv - pv) * ((bucket - pb) / (nb - pb))
           END AS value_interp
    FROM joined
    """,
)(lambda spark, sf: TS.gapfill_interpolate(
    _events(spark, sf), "user_id", "ts", "value", 3600, seq_cols=["event_id"]
))


# ---- URL canonicalization + canonical-URL dedup (crawl curation) ----
from apache_flink_essentials_spark.io import from_elements  # noqa: E402
from apache_flink_essentials_spark.operators import web as WB  # noqa: E402

_URL_FIXTURE = [
    (1, "https://Example.COM/Path/Page"),
    (2, "https://example.com:443/Path/Page#sec2"),
    (3, "http://example.com:80/a?utm_source=news&id=2&utm_campaign=x#f"),
    (4, "http://example.com/a?id=2"),
    (5, "https://example.com/list/"),
    (6, "https://example.com/list"),
    (7, "https://EXAMPLE.com/"),
    (8, "https://example.com"),
    (9, "https://example.com/a?fbclid=abc"),
    (10, "https://example.com/a?gclid=1&x=2"),
    (11, "https://other.org:8080/a/"),
    (12, "http://example.com/CaseSensitive"),
    (13, "http://example.com/casesensitive"),
    (14, "https://example.com/b?utm_a=1&utm_b=2&q=3"),
]

_URL_VALUES = ", ".join(f"({i}, '{u}')" for i, u in _URL_FIXTURE)

_register(
    "web_url_dedup",
    rf"""
    WITH urls(page_id, url) AS (VALUES {_URL_VALUES}),
    a AS (SELECT page_id, regexp_replace(url, '#.*$', '') AS u FROM urls),
    b AS (SELECT page_id,
                 lower(regexp_extract(u,
                   '^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)', 1))
                 || regexp_replace(u,
                   '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*', '') AS u
          FROM a),
    c AS (SELECT page_id,
                 regexp_replace(regexp_replace(u,
                   '^(http://[^/:?#]+):80([/?#]|$)', '\1\2'),
                   '^(https://[^/:?#]+):443([/?#]|$)', '\1\2') AS u
          FROM b),
    d AS (SELECT page_id,
                 regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(u,
                     '([?&])(utm_[^&#=]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
                   '\?&+', '?', 'g'), '&&+', '&', 'g'),
                   '[?&]+$', '') AS u
          FROM c),
    e AS (SELECT page_id, regexp_replace(u, '/$', '') AS u FROM d)
    SELECT u AS canonical_url,
           min(page_id)::BIGINT AS keep_id,
           count(*)::BIGINT AS n_dups
    FROM e GROUP BY u
    """,
)(lambda spark, sf: WB.canonical_url_dedup(
    from_elements(spark, _URL_FIXTURE, "page_id long, url string")
))


# ---- per-source dedup-rate observability report ----
_register(
    "curation_dedup_report",
    r"""
    SELECT source,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT md5(array_to_string(
             string_split_regex(lower(text), '\s+'), ' ')))::BIGINT
             AS n_unique,
           1 - count(DISTINCT md5(array_to_string(
             string_split_regex(lower(text), '\s+'), ' '))) / count(*)
             AS dup_rate
    FROM documents GROUP BY source
    """,
)(lambda spark, sf: (lambda d: d.groupBy("source").agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.count_distinct(
        D.text_fingerprint_expr("text")
    ).alias("n_unique"),
    (
        1
        - F.count_distinct(
            D.text_fingerprint_expr("text")
        )
        / F.count(F.lit(1))
    ).alias("dup_rate"),
))(load_table(spark, "documents", sf)))


# ---- incremental materialized-rollup maintenance ----
# Split at 2024-01-16 00:00 UTC (epoch 1705363200): the "yesterday's
# rollup" half and the "new delta" half; merged partials must equal the
# full recompute — the continuous-aggregate refresh contract.
def _olap_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from apache_flink_essentials_spark.operators import olap as OL

    ev = _events(spark, sf).select(
        (F.floor(F.col("ts").cast("long") / 86400) * 86400)
        .cast("long").alias("day_start"),
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    cut = 1705363200
    base, delta = ev.filter(F.col("ts_s") < cut), ev.filter(
        F.col("ts_s") >= cut
    )
    mk = lambda d: OL.additive_rollup(  # noqa: E731
        d,
        ["day_start", "event_type"],
        sum_cols={"sum_value": F.col("v")},
        min_cols={"min_value": F.col("v")},
        max_cols={"max_value": F.col("v")},
    )
    merged = OL.merge_rollups(
        [mk(base), mk(delta)],
        ["day_start", "event_type"],
        sum_cols=["sum_value"],
        min_cols=["min_value"],
        max_cols=["max_value"],
    )
    return merged.select(
        "day_start",
        "event_type",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


_register(
    "olap_incremental_rollup",
    """
    SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS day_start,
           event_type,
           count(*)::BIGINT AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
           CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)(_olap_incremental)


# MMR is float-iterative (greedy selection) → rows-only driver check; the
# diversity-vs-top-k semantics are pinned in tests (SURVEY §5 model)
def _vec_mmr(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    cands = V.knn_cosine_bruteforce(
        emb, emb.filter(F.col("vec_id") < 10), k=50
    ).join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    return V.mmr_diversify(
        cands, "query_id", "neighbor_id", "embedding", "cosine",
        k=5, lam=0.7,
    )


_register("vec_mmr_diversify")(_vec_mmr)


# Oracle-checkable MMR twin: rounding every candidate-candidate cosine to
# 6dp BEFORE any comparison makes the greedy argmax sequence engine- and
# shuffle-order-independent, so the whole k-step selection replays in SQL
# as unrolled CTE stages (the pandas form above stays rows-only: numpy
# matmul sums differ in the last ulp). The damping constants are inlined
# from the SAME Python doubles on both sides — `1 - 0.7` is
# 0.30000000000000004, not the literal 0.3.
_MMR_K = 5
_MMR_LAM = 0.7


def _mmr_oracle() -> str:
    lam = repr(_MMR_LAM)
    om = repr(1.0 - _MMR_LAM)
    sq = (
        "coalesce(nullif(sqrt(list_aggregate(list_transform(range(1, 65),"
        " i -> {v}.embedding[i]::DOUBLE * {v}.embedding[i]::DOUBLE),"
        " 'sum')), 0), 1)"
    )
    head = f"""
    WITH scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
      WHERE a.vec_id < 10
    ),
    cands AS (
      SELECT query_id, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC)
                 AS rnk
        FROM scored
      ) WHERE rnk <= 50
    ),
    cv AS (
      SELECT c.query_id AS q, c.neighbor_id AS cid, c.cosine AS rel,
             emb.embedding, {sq.format(v="emb")} AS nrm
      FROM cands c JOIN embeddings emb ON emb.vec_id = c.neighbor_id
    ),
    sims AS (
      SELECT a.q, a.cid AS ia, b.cid AS ib,
             round(list_aggregate(list_transform(range(1, 65),
                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE),
                 'sum') / (a.nrm * b.nrm), 6) AS sim
      FROM cv a JOIN cv b ON a.q = b.q
    ),
    sel1 AS (
      SELECT q, cid, 1 AS rank, mmr_score FROM (
        SELECT q, cid, mmr_score,
               row_number() OVER (PARTITION BY q
                                  ORDER BY mmr_score DESC, cid ASC) AS rr
        FROM (SELECT q, cid, {lam} * rel AS mmr_score FROM cv)
      ) WHERE rr = 1
    ),
    p1 AS (SELECT q, cid FROM sel1)"""
    steps = []
    for i in range(2, _MMR_K + 1):
        steps.append(f""",
    sel{i} AS (
      SELECT q, cid, {i} AS rank, mmr_score FROM (
        SELECT q, cid, mmr_score,
               row_number() OVER (PARTITION BY q
                                  ORDER BY mmr_score DESC, cid ASC) AS rr
        FROM (
          SELECT r.q, r.cid,
                 {lam} * r.rel - {om} * m.max_sim AS mmr_score
          FROM cv r
          JOIN (SELECT s.q, s.ia AS cid, max(s.sim) AS max_sim
                FROM sims s JOIN p{i - 1} p ON s.q = p.q AND s.ib = p.cid
                GROUP BY s.q, s.ia) m
            ON r.q = m.q AND r.cid = m.cid
          WHERE NOT EXISTS (SELECT 1 FROM p{i - 1} p2
                            WHERE p2.q = r.q AND p2.cid = r.cid)
        )
      ) WHERE rr = 1
    ),
    p{i} AS (SELECT q, cid FROM p{i - 1}
             UNION ALL SELECT q, cid FROM sel{i})""")
    union = "\n      UNION ALL ".join(
        f"SELECT * FROM sel{i}" for i in range(1, _MMR_K + 1)
    )
    return (
        head + "".join(steps)
        + f"""
    SELECT q AS query_id, rank, cid AS neighbor_id, mmr_score
    FROM ({union})"""
    )


def _vec_mmr_exact(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    cands = V.knn_cosine_bruteforce(
        emb, emb.filter(F.col("vec_id") < 10), k=50
    ).join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    return V.mmr_diversify_exact(
        cands, "query_id", "neighbor_id", "embedding", "cosine",
        k=_MMR_K, lam=_MMR_LAM,
    )


_register("vec_mmr_exact", _mmr_oracle(), late=True)(_vec_mmr_exact)


# ---- contrastive training-pair construction ----
def _contrastive_q(spark: SparkSession, sf: str) -> DataFrame:
    # positive mining + ring negatives fused over ONE scan — on the
    # single-split bench fixture this is a zero-exchange plan (see
    # contrastive_pairs_fingerprint); at scale it falls back to the
    # groupBy-mined-positives composition whose shuffles are the point.
    return CU.contrastive_pairs_fingerprint(
        load_table(spark, "documents", sf), n_neg=2, seed=0
    )


_register(
    "curation_contrastive_pairs",
    r"""
    WITH fp AS (
      SELECT doc_id, md5(array_to_string(
               string_split_regex(lower(text), '\s+'), ' ')) AS f
      FROM documents
    ), pos AS (
      SELECT a.doc_id AS anchor_id, b.doc_id AS other_id
      FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
    ), ring AS (
      SELECT doc_id AS anchor_id,
             row_number() OVER (
               ORDER BY ('0x' || substr(md5('0:' || doc_id), 1, 8))::BIGINT
                        / 4294967296.0, doc_id) AS rn
      FROM documents
    ), n AS (SELECT count(*) AS n FROM documents),
    probes AS (
      SELECT anchor_id, ((rn - 1 + j) % n) + 1 AS target_rn
      FROM ring, n, unnest(range(1, 3)) AS u(j)
    ), negs AS (
      SELECT p.anchor_id, r.anchor_id AS other_id
      FROM probes p JOIN ring r ON p.target_rn = r.rn
      WHERE p.anchor_id != r.anchor_id
        AND NOT EXISTS (
          SELECT 1 FROM pos s
          WHERE (s.anchor_id = p.anchor_id AND s.other_id = r.anchor_id)
             OR (s.anchor_id = r.anchor_id AND s.other_id = p.anchor_id))
    )
    SELECT anchor_id, other_id, 1 AS label FROM pos
    UNION ALL SELECT anchor_id, other_id, 0 AS label FROM negs
    """,
)(_contrastive_q)


# ---- first-order Markov transition matrix over user timelines ----
_register(
    "events_markov_transitions",
    """
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type, count(*)::BIGINT AS n_transitions,
           count(*) / sum(count(*)) OVER (PARTITION BY from_type) AS p_next
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)(lambda spark, sf: T.transition_counts(
    _events(spark, sf), "user_id", "ts", "event_type",
    order_cols=["event_id"],
))


# ---- curriculum/training-order construction ----
_register(
    "curation_curriculum_order",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             )::INT AS rank_in_source
      FROM documents
    )
    SELECT doc_id, source, rank_in_source,
           row_number() OVER (
             ORDER BY rank_in_source, source, doc_id)::BIGINT AS train_order
    FROM ranked
    """,
)(lambda spark, sf: CU.curriculum_order(
    load_table(spark, "documents", sf), "n_chars"
))


# EWMA control chart: the recurrence is SEQUENTIAL but not order-free —
# a recursive CTE that advances every key one row per iteration replays
# the exact same IEEE ops in the exact same order (dev = x - ewma;
# ewma += a*dev; ewvar = (1-a)*(ewvar + a*dev*dev) — all left-assoc in
# both engines), so raw doubles hash-match bit-for-bit (verified at
# sf0.001 and sf0.01). Formerly rows-only; planted-spike +
# stream==batch bit-equality stay pinned in tests.
_register(
    "ts_ewma_anomaly",
    """
    WITH RECURSIVE base AS (
      SELECT user_id, floor(epoch(ts))::BIGINT AS ts_s, value::DOUBLE AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY floor(epoch(ts))::BIGINT, value)
               AS rn
      FROM events
    ), rec AS (
      SELECT user_id, ts_s, x, rn,
             x AS ewma, 0.0::DOUBLE AS ewvar, FALSE AS is_anomaly
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.ts_s, b.x, b.rn,
             r.ewma + 0.3 * (b.x - r.ewma) AS ewma,
             (1.0 - 0.3) * (r.ewvar + 0.3 * (b.x - r.ewma)
                            * (b.x - r.ewma)) AS ewvar,
             (r.ewvar > 0.0 AND
              (b.x - r.ewma) * (b.x - r.ewma) > 3.0 * 3.0 * r.ewvar)
               AS is_anomaly
      FROM rec r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
    )
    SELECT user_id, ts_s, x AS value, ewma, is_anomaly FROM rec
    """,
    late=True,
)(lambda spark, sf: TS.ewma_anomaly(
    _events(spark, sf), "user_id", "ts", "value", alpha=0.3, z=3.0
))

# The expression-only normalized EWMA *is* oracle-checkable: both engines
# run the identical Horner fold over the windowed value list (no pow, no
# rounding — see ewma_smooth docstring), so raw doubles hash-match.
_register(
    "ts_ewma_smooth",
    """
    WITH s AS (
      SELECT user_id, event_id,
             floor(epoch(ts))::BIGINT AS ts_s, value::DOUBLE AS value,
             list(value::DOUBLE)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS win
      FROM events
    )
    SELECT user_id, event_id, ts_s, value,
           list_reduce(win, (a, x) -> a * 0.7::DOUBLE + x)
           / list_reduce(list_transform(win, x -> 1.0::DOUBLE),
                         (a, x) -> a * 0.7::DOUBLE + x) AS ewma
    FROM s
    """,
    late=True,
)(lambda spark, sf: TS.ewma_smooth(
    _events(spark, sf), "user_id", "ts", "value", "event_id",
    alpha=0.3, window=50,
))


# ---- winnowing (MOSS) document fingerprints ----
_register(
    "text_winnow_fingerprints",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      FROM documents
    ), base AS (
      SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 5 + 4 - 1
    ), hashed AS (
      SELECT doc_id,
             list_transform(t, s ->
               ('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647) AS th,
             n
      FROM base
    ), grammed AS (
      SELECT doc_id,
             list_transform(range(1, n - 5 + 2), i ->
               list_reduce(th[i:i+4], (a, b) -> (a*31 + b) % 2147483647))
               AS g,
             n - 5 + 1 AS n_grams
      FROM hashed
    )
    SELECT DISTINCT doc_id, fingerprint FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, n_grams - 4 + 2),
                                   j -> list_min(g[j:j+3]))) AS fingerprint
      FROM grammed
    )
    """,
)(lambda spark, sf: X.winnow_fingerprints(
    load_table(spark, "documents", sf), k=5, w=4
))


_register(
    "text_winnow_candidates",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      FROM documents
    ), base AS (
      SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 5 + 4 - 1
    ), hashed AS (
      SELECT doc_id,
             list_transform(t, s ->
               ('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647) AS th,
             n
      FROM base
    ), grammed AS (
      SELECT doc_id,
             list_transform(range(1, n - 5 + 2), i ->
               list_reduce(th[i:i+4], (a, b) -> (a*31 + b) % 2147483647))
               AS g,
             n - 5 + 1 AS n_grams
      FROM hashed
    ), fps AS (
      SELECT DISTINCT doc_id, fingerprint FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, n_grams - 4 + 2),
                                     j -> list_min(g[j:j+3]))) AS fingerprint
        FROM grammed
      )
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*)::BIGINT AS n_shared
    FROM fps a JOIN fps b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)(lambda spark, sf: X.winnow_candidate_pairs(
    load_table(spark, "documents", sf), k=5, w=4, min_shared=2
))


# ---- entity resolution: fuzzy match -> transitive clusters ----
def _er_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, "customer", sf).select("c_custkey", "c_name")
    pairs = (
        J.fuzzy_join(c, c, "c_name", "c_name", max_distance=1,
                     block_chars=16)
        .filter(F.col("l_c_custkey") < F.col("r_c_custkey"))
        .select(
            F.col("l_c_custkey").alias("id_a"),
            F.col("r_c_custkey").alias("id_b"),
        )
    )
    cc = D.connected_components(pairs, "id_a", "id_b")
    return cc.select(
        F.col("node").alias("c_custkey"),
        F.col("component").cast("long").alias("entity_id"),
    )


_register(
    "er_customer_entities",
    """
    WITH RECURSIVE pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON lower(substr(a.c_name, 1, 16)) = lower(substr(b.c_name, 1, 16))
       AND a.c_custkey < b.c_custkey
      WHERE levenshtein(lower(a.c_name), lower(b.c_name)) <= 1
    ), und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    )
    SELECT a AS c_custkey, least(a, min(b))::BIGINT AS entity_id
    FROM reach GROUP BY a
    """,
)(_er_customers)


# ---- seasonal-baseline anomalies (hour-of-day phase z-score) ----
_register(
    "ts_seasonal_anomalies",
    """
    WITH stats AS (
      SELECT event_type,
             (floor(epoch(ts) / 3600)::BIGINT % 24) AS phase,
             count(*) AS n,
             sum(value::DECIMAL(18,4))::DOUBLE AS s,
             sum(value::DECIMAL(18,4) * value::DECIMAL(18,4))::DOUBLE AS ss
      FROM events GROUP BY 1, 2
    ), mu AS (
      SELECT event_type, phase, s / n AS mu,
             sqrt(ss / n - (s / n) * (s / n)) AS sigma
      FROM stats
    )
    SELECT e.event_id, e.event_type,
           (floor(epoch(e.ts) / 3600)::BIGINT % 24) AS phase,
           e.value::DOUBLE AS value,
           (e.value::DOUBLE - mu) / sigma AS z_seasonal
    FROM events e
    JOIN mu ON e.event_type = mu.event_type
           AND (floor(epoch(e.ts) / 3600)::BIGINT % 24) = mu.phase
    WHERE sigma > 0 AND abs((e.value::DOUBLE - mu) / sigma) > 3.0
    """,
)(lambda spark, sf: TS.seasonal_residuals(
    _events(spark, sf), "event_type", "ts", "value", "event_id", z=3.0
))


# ---- left-outer interval join: clicks that never converted ----
_register(
    "j3_interval_join_left",
    """
    SELECT c.user_id AS user_id, c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL '10 minutes'
     AND c.ts < p.ts + INTERVAL '10 minutes'
    """,
)(lambda spark, sf: J.interval_join(
    T.filter_event_type(_events(spark, sf), "click"),
    T.filter_event_type(_events(spark, sf), "purchase"),
    key="user_id",
    left_ts="ts",
    right_ts="ts",
    lower="-10 minutes",
    upper="10 minutes",
    how="left_outer",
).select(
    F.col("l_user_id").alias("user_id"),
    F.col("l_event_id").alias("click_id"),
    F.col("r_event_id").alias("purchase_id"),
))


# =========================================================================
# round-3 additions (late=True: queued behind older unchecked names in the
# driver's bounded correctness prefix — see LATE_ADDITIONS)
# =========================================================================

_register(
    "text_unigram_logprob",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ), occ AS (
      SELECT doc_id, tok, count(*)::BIGINT AS n_occ
      FROM tok WHERE tok != '' GROUP BY doc_id, tok
    ), cnt AS (
      SELECT tok, sum(n_occ)::BIGINT AS cnt FROM occ GROUP BY tok
    ), tot AS (
      SELECT sum(cnt)::BIGINT AS total FROM cnt
    ), s AS (
      SELECT o.doc_id,
             sum(o.n_occ)::BIGINT AS n_tokens,
             sum(o.n_occ * round(log10(c.cnt::DOUBLE) * 1e6)::BIGINT)::BIGINT
               AS s
      FROM occ o JOIN cnt c USING (tok) GROUP BY o.doc_id
    )
    SELECT doc_id, n_tokens,
           s / (1e6 * n_tokens)
             - log10((SELECT total FROM tot)::DOUBLE) AS mean_logprob
    FROM s
    """,
    late=True,
)(lambda spark, sf: X.unigram_logprob(load_table(spark, "documents", sf)))


_register(
    "text_pmi_pairs",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ), tok2 AS (
      SELECT DISTINCT doc_id, tok FROM tok WHERE tok != ''
    ), docfreq AS (
      SELECT tok, count(*)::BIGINT AS df FROM tok2 GROUP BY tok
    ), vocab AS (
      SELECT tok, df FROM docfreq ORDER BY df DESC, tok ASC LIMIT 64
    ), n AS (
      SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM documents
    ), pair_counts AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, count(*)::BIGINT AS pair_docs
      FROM (SELECT t.doc_id, t.tok FROM tok2 t JOIN vocab v USING (tok)) a
      JOIN (SELECT t.doc_id, t.tok FROM tok2 t JOIN vocab v USING (tok)) b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT p.tok_a, p.tok_b, p.pair_docs,
           va.df AS df_a, vb.df AS df_b,
           log10(p.pair_docs::DOUBLE * (SELECT n_docs FROM n)
                 / (va.df::DOUBLE * vb.df)) AS pmi
    FROM pair_counts p
    JOIN vocab va ON p.tok_a = va.tok
    JOIN vocab vb ON p.tok_b = vb.tok
    ORDER BY pmi DESC, p.tok_a ASC, p.tok_b ASC LIMIT 50
    """,
    late=True,
)(lambda spark, sf: X.pmi_pairs(load_table(spark, "documents", sf)))


_register(
    "curation_temperature_weights",
    r"""
    WITH per AS (
      SELECT source,
             count(*)::BIGINT AS n_docs,
             sum(len(string_split_regex(lower(text), '\s+')))::BIGINT
               AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n_tokens)::BIGINT AS total FROM per
    ), w AS (
      SELECT per.*, tot.total,
             round(pow(per.n_tokens::DOUBLE / tot.total, 0.3)
                   * 1e9)::BIGINT AS w
      FROM per, tot
    ), ws AS (
      SELECT sum(w)::BIGINT AS wsum FROM w
    )
    SELECT w.source, w.n_docs, w.n_tokens,
           w.n_tokens::DOUBLE / w.total AS nat_share,
           w.w::DOUBLE / ws.wsum AS weight,
           floor(100000 * w.w / ws.wsum)::BIGINT AS alloc_tokens
    FROM w, ws
    """,
    late=True,
)(lambda spark, sf: CU.temperature_weights(
    load_table(spark, "documents", sf), alpha=0.3, budget_tokens=100_000
))


_register(
    "events_attribution_last_touch",
    """
    WITH o AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS ts_us,
             max(CASE WHEN event_type <> 'purchase'
                 THEN struct_pack(ts := epoch_us(ts),
                                  id := event_id, t := event_type) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev
      FROM events
    )
    SELECT user_id, event_id AS target_id,
           (ts_us // 1000000)::BIGINT AS target_ts_s,
           CASE WHEN prev.ts IS NOT NULL AND ts_us - prev.ts <= 3600000000
                THEN prev.t END AS attributed_type,
           CASE WHEN prev.ts IS NOT NULL AND ts_us - prev.ts <= 3600000000
                THEN prev.id END AS attributed_id,
           CASE WHEN prev.ts IS NOT NULL AND ts_us - prev.ts <= 3600000000
                THEN (ts_us // 1000000)::BIGINT - (prev.ts // 1000000)::BIGINT
                END AS gap_seconds
    FROM o WHERE event_type = 'purchase'
    """,
    late=True,
)(lambda spark, sf: PT.last_touch_attribution(
    _events(spark, sf), "user_id", "ts", "event_type", "event_id",
    target="purchase", within_seconds=3600,
))


_register(
    "events_value_percentiles",
    """
    SELECT event_type,
           count(*)::BIGINT AS n,
           quantile_cont(value::DOUBLE, 0.5) AS p50,
           quantile_cont(value::DOUBLE, 0.95) AS p95,
           quantile_cont(value::DOUBLE, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    late=True,
)(lambda spark, sf: P.value_percentiles(
    _events(spark, sf), "event_type", "value"
))


_register(
    "events_ab_conversion_ztest",
    """
    WITH per_unit AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
      FROM events GROUP BY 1, 2
    ), agg AS (
      SELECT sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN variant = 'a' THEN s ELSE 0 END)::BIGINT AS conv_a,
             sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END)::BIGINT AS n_b,
             sum(CASE WHEN variant = 'b' THEN s ELSE 0 END)::BIGINT AS conv_b
      FROM per_unit
    )
    SELECT n_a, conv_a, n_b, conv_b,
           conv_a::DOUBLE / n_a AS rate_a,
           conv_b::DOUBLE / n_b AS rate_b,
           conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b AS rate_diff,
           CASE WHEN sqrt((conv_a + conv_b)::DOUBLE / (n_a + n_b)
                     * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                     * (1.0 / n_a + 1.0 / n_b)) > 0
                THEN (conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
                     / sqrt((conv_a + conv_b)::DOUBLE / (n_a + n_b)
                            * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b))
           END AS z_stat
    FROM agg
    """,
    late=True,
)(lambda spark, sf: P.ab_conversion_ztest(
    _events(spark, sf).select(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("variant"),
        (F.col("event_type") == "purchase").alias("converted"),
    ),
    "user_id", "variant", "converted",
))


_register(
    "dedup_exact_best",
    r"""
    SELECT md5(array_to_string(string_split_regex(lower(text), '\s+'), ' '))
             AS fingerprint,
           max(struct_pack(s := n_chars, i := doc_id)).i AS keep_id,
           max(struct_pack(s := n_chars, i := doc_id)).s AS keep_score,
           count(*)::BIGINT AS n_dups
    FROM documents
    GROUP BY 1
    """,
    late=True,
)(lambda spark, sf: D.exact_dedup_best(
    load_table(spark, "documents", sf), score_col="n_chars"
))


_register(
    "vec_knn_matryoshka",
    """
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
         q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
         coarse AS (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                  q.embedding AS qv, e.embedding AS ev,
                  round(
                    list_aggregate(list_transform(range(1, 17),
                        i -> q.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum')
                    / (sqrt(list_aggregate(list_transform(range(1, 17),
                        i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE), 'sum'))
                     * sqrt(list_aggregate(list_transform(range(1, 17),
                        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum'))),
                  6) AS c
           FROM q, e WHERE q.vec_id != e.vec_id
         ), cand AS (
           SELECT query_id, neighbor_id, qv, ev FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY c DESC, neighbor_id ASC) AS cr
             FROM coarse) WHERE cr <= 50
         ), scored AS (
           SELECT query_id, neighbor_id,
                  round(
                    list_aggregate(list_transform(range(1, 65),
                        i -> qv[i]::DOUBLE * ev[i]::DOUBLE), 'sum')
                    / (sqrt(list_aggregate(list_transform(range(1, 65),
                        i -> qv[i]::DOUBLE * qv[i]::DOUBLE), 'sum'))
                     * sqrt(list_aggregate(list_transform(range(1, 65),
                        i -> ev[i]::DOUBLE * ev[i]::DOUBLE), 'sum'))),
                  6) AS cosine
           FROM cand
         )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC)::INT
               AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    late=True,
)(lambda spark, sf: V.knn_cosine_matryoshka(
    load_table(spark, "embeddings", sf),
    load_table(spark, "embeddings", sf).filter(F.col("vec_id") < 10),
    k=5, coarse_dims=16, coarse_keep=50,
))


_register(
    "dedup_containment",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, lang, source,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM toks
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh))::BIGINT AS i,
             len(a.sh)::BIGINT AS na, len(b.sh)::BIGINT AS nb
      FROM sh a JOIN sh b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
    ), directed AS (
      SELECT id_a AS src_id, id_b AS dst_id, i::DOUBLE / na AS containment
      FROM pairs
      UNION ALL
      SELECT id_b AS src_id, id_a AS dst_id, i::DOUBLE / nb AS containment
      FROM pairs
    )
    SELECT src_id, dst_id, containment FROM directed WHERE containment >= 0.6
    """,
    late=True,
)(lambda spark, sf: D.containment_pairs(load_table(spark, "documents", sf)))


# corpus-bounded twin (r12): the drop decision needs only each doc's BEST
# container — O(corpus) output vs the directional pair list's density²
_register(
    "dedup_containment_best",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, lang, source,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM toks
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh))::BIGINT AS i,
             len(a.sh)::BIGINT AS na, len(b.sh)::BIGINT AS nb
      FROM sh a JOIN sh b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
    ), directed AS (
      SELECT id_a AS src_id, id_b AS dst_id, i::DOUBLE / na AS containment
      FROM pairs
      UNION ALL
      SELECT id_b AS src_id, id_a AS dst_id, i::DOUBLE / nb AS containment
      FROM pairs
    ), qual AS (
      SELECT * FROM directed WHERE containment >= 0.6
    ), ranked AS (
      SELECT src_id, dst_id, containment,
             row_number() OVER (PARTITION BY src_id
               ORDER BY containment DESC, dst_id ASC) AS rn
      FROM qual
    )
    SELECT src_id AS doc_id, dst_id AS container_id, containment
    FROM ranked WHERE rn = 1
    """,
    late=True,
)(lambda spark, sf: D.containment_best_container(
    load_table(spark, "documents", sf)
))


_register(
    "events_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value::DOUBLE, 0.5) AS med
      FROM events GROUP BY event_type
    ), stats AS (
      SELECT e.event_type, min(m.med) AS med,
             quantile_cont(abs(e.value::DOUBLE - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value::DOUBLE AS value,
           (e.value::DOUBLE - s.med) / (1.4826 * s.mad) AS robust_z
    FROM events e JOIN stats s USING (event_type)
    WHERE s.mad > 0
      AND abs(e.value::DOUBLE - s.med) > 3.0 * 1.4826 * s.mad
    """,
    late=True,
)(lambda spark, sf: P.mad_outliers(_events(spark, sf)))


_register(
    "events_winsorized_values",
    """
    WITH b AS (
      SELECT event_type,
             quantile_cont(value::DOUBLE, 0.01) AS lo,
             quantile_cont(value::DOUBLE, 0.99) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           least(greatest(e.value::DOUBLE, b.lo), b.hi) AS value_w,
           (e.value::DOUBLE < b.lo OR e.value::DOUBLE > b.hi) AS clipped
    FROM events e JOIN b USING (event_type)
    """,
    late=True,
)(lambda spark, sf: CU.winsorize(
    _events(spark, sf), "event_type", "value"
).select("event_id", "event_type", "value", "value_w", "clipped"))


# =========================================================================
# round-4 additions (late=True keeps the driver's checked prefix stable):
# bigram LM scoring, ANN recall evaluation, DSIR importance weights
# =========================================================================

_register(
    "text_bigram_logprob",
    r"""
    WITH fl AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t != '') AS fl
      FROM documents
    ), big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(fl)),
                    i -> fl[i] || ' ' || fl[i + 1])) AS bg
      FROM fl WHERE len(fl) >= 2
    ), occ AS (
      SELECT doc_id, bg, count(*)::BIGINT AS n_occ FROM big
      GROUP BY doc_id, bg
    ), cnt AS (
      SELECT bg, sum(n_occ)::BIGINT AS cnt_bg FROM occ GROUP BY bg
    ), first_tok AS (
      SELECT split_part(bg, ' ', 1) AS a, sum(cnt_bg)::BIGINT AS cnt_a
      FROM cnt GROUP BY a
    )
    SELECT o.doc_id,
           sum(o.n_occ)::BIGINT AS n_bigrams,
           sum(o.n_occ * (round(log10(c.cnt_bg::DOUBLE) * 1e6)::BIGINT
                          - round(log10(f.cnt_a::DOUBLE) * 1e6)::BIGINT)
               )::BIGINT
             / (1e6 * sum(o.n_occ)) AS mean_logprob
    FROM occ o
    JOIN cnt c USING (bg)
    JOIN first_tok f ON split_part(o.bg, ' ', 1) = f.a
    GROUP BY o.doc_id
    """,
    late=True,
)(lambda spark, sf: X.bigram_logprob(load_table(spark, "documents", sf)))


# recall@5 of the int8-quantized KNN against the exact KNN — both sides
# deterministic and oracle-expressible, so the evaluation itself is a
# hash-matched driver row (the harness every ANN knob trade is judged by)
_register(
    "vec_knn_recall",
    f"""
    WITH exact_knn AS ({ORACLES['vec_knn_bruteforce']}),
    approx_knn AS ({ORACLES['vec_knn_quantized']})
    SELECT e.query_id,
           count(*)::BIGINT AS n_exact,
           sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_hit,
           sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             / count(*)::BIGINT AS recall
    FROM exact_knn e
    LEFT JOIN approx_knn a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """,
    late=True,
)(lambda spark, sf: V.knn_recall(
    V.knn_cosine_bruteforce(
        load_table(spark, "embeddings", sf),
        load_table(spark, "embeddings", sf).filter(F.col("vec_id") < 10),
    ),
    V.knn_cosine_quantized(
        load_table(spark, "embeddings", sf),
        load_table(spark, "embeddings", sf).filter(F.col("vec_id") < 10),
    ),
))


# recall@5 of the hyperplane-LSH ANN against the exact KNN — makes the ANN
# tier's ACCURACY driver-visible, not just its row counts (r4 verdict item
# 8). The `vec_embedding_dedup` idiom scaled up: all 32 plane vectors
# (4 planes × 8 tables) inline as literal DOUBLE[] lists, bucket bits from
# the same left-to-right dot-product fold both engines share, candidates
# from same-(table, bucket) collisions, exact-cosine re-rank, then
# `knn_recall`'s int/int recall ratio. The Spark side runs the HOF
# (use_arrow=False) bucket assignment: numpy's pairwise-summation matmul
# could flip a sign on a near-zero dot product, while the HOF fold is
# bit-identical to the SQL literal expansion.
_LSH_RECALL_TABLES, _LSH_RECALL_PLANES_PER = 8, 4
_LSH_PLANES = [
    V._hyperplane(64, i)
    for i in range(_LSH_RECALL_TABLES * _LSH_RECALL_PLANES_PER)
]
_LSH_PLANES_SQL = ",\n           ".join(
    "[" + ",".join(repr(c) for c in plane) + "]::DOUBLE[] AS lp%d" % i
    for i, plane in enumerate(_LSH_PLANES)
)
_LSH_BUCKETS_SQL = ",\n".join(
    "             "
    + "\n             + ".join(
        "(CASE WHEN list_aggregate(list_transform(range(1, 65),"
        f" i -> embedding[i]::DOUBLE * lp{t * _LSH_RECALL_PLANES_PER + p}[i]),"
        f" 'sum') >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(_LSH_RECALL_PLANES_PER)
    )
    for t in range(_LSH_RECALL_TABLES)
)

_register(
    "vec_ann_lsh_recall",
    f"""
    WITH planes AS (SELECT {_LSH_PLANES_SQL}),
    bk AS (
      SELECT vec_id,
             unnest(range(0, {_LSH_RECALL_TABLES})) AS table_id,
             unnest([
{_LSH_BUCKETS_SQL}
             ]) AS bucket
      FROM embeddings, planes
    ),
    cands AS (
      SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS neighbor_id
      FROM bk q JOIN bk e
        ON q.table_id = e.table_id AND q.bucket = e.bucket
      WHERE q.vec_id < 10 AND q.vec_id != e.vec_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id, {_COS} AS cosine
      FROM cands c
      JOIN embeddings a ON a.vec_id = c.query_id
      JOIN embeddings b ON b.vec_id = c.neighbor_id
    ),
    approx_knn AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC)
                 AS rank
        FROM scored
      ) WHERE rank <= 5
    ),
    exact_knn AS ({ORACLES['vec_knn_bruteforce']})
    SELECT e.query_id,
           count(*)::BIGINT AS n_exact,
           sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_hit,
           sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             / count(*)::BIGINT AS recall
    FROM exact_knn e
    LEFT JOIN approx_knn a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """,
    late=True,
)(lambda spark, sf: V.knn_recall(
    V.knn_cosine_bruteforce(
        load_table(spark, "embeddings", sf),
        load_table(spark, "embeddings", sf).filter(F.col("vec_id") < 10),
    ),
    V.ann_lsh_cosine(
        load_table(spark, "embeddings", sf),
        load_table(spark, "embeddings", sf).filter(F.col("vec_id") < 10),
        num_planes=4,
        num_tables=8,
        use_arrow=False,
    ),
))


# DSIR importance weights toward the 'en' slice: every intermediate is an
# exact integer (micro-logs) until the final float combination, so the
# oracle hash-matches on raw doubles
_register(
    "curation_dsir_weights",
    r"""
    WITH tok AS (
      SELECT doc_id, lang = 'en' AS is_target,
             unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ), tok2 AS (
      SELECT * FROM tok WHERE tok != ''
    ), occ AS (
      SELECT doc_id, tok, count(*)::BIGINT AS n_occ FROM tok2
      GROUP BY doc_id, tok
    ), cnt AS (
      SELECT tok, count(*)::BIGINT AS cnt_r,
             count(CASE WHEN is_target THEN 1 END)::BIGINT AS cnt_t
      FROM tok2 GROUP BY tok
    ), tot AS (
      SELECT sum(cnt_r)::BIGINT AS tot_r, sum(cnt_t)::BIGINT AS tot_t,
             count(*)::BIGINT AS vocab
      FROM cnt
    )
    SELECT o.doc_id,
           sum(o.n_occ)::BIGINT AS n_tokens,
           sum(o.n_occ * (round(log10((c.cnt_t + 1)::DOUBLE) * 1e6)::BIGINT
                          - round(log10((c.cnt_r + 1)::DOUBLE) * 1e6)::BIGINT)
               )::BIGINT / 1e6
             - sum(o.n_occ)::BIGINT
               * (log10((t.tot_t + t.vocab)::DOUBLE)
                  - log10((t.tot_r + t.vocab)::DOUBLE)) AS log_weight
    FROM occ o JOIN cnt c USING (tok) CROSS JOIN tot t
    GROUP BY o.doc_id, t.tot_t, t.tot_r, t.vocab
    """,
    late=True,
)(lambda spark, sf: CU.dsir_weights(
    load_table(spark, "documents", sf), F.col("lang") == "en"
))


# ---- Gopher quality rule battery (Rae et al. 2021 §A1.1) ----
# Raw metrics + per-rule booleans + the conjunction, expression-only (one
# scan, no shuffle). Ratios are int/int IEEE divisions in the same operand
# order on both sides (module conventions). The fixture corpus is
# single-line (no bullets/ellipses), so those rules pass trivially while
# word-count / mean-word-len / stopword rules split the corpus — the flags
# exercised non-degenerately are asserted distinct in tests.
_GOPHER_STOP_SQL = "['" + "', '".join(X.GOPHER_STOPWORDS) + "']"

_register(
    "text_gopher_quality",
    rf"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents
    ), m AS (
      SELECT doc_id, text, toks, lines,
             len(toks) AS n_words,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS total_len,
             length(text) - length(replace(text, '#', '')) AS hash_cnt,
             (length(text) - length(replace(text, '...', ''))) / 3 AS ell_cnt,
             length(text) - length(replace(text, '…', '')) AS uni_ell_cnt,
             len(lines) AS n_lines,
             len(list_filter(lines, ln -> regexp_matches(ln, '^[\s]*[-*•‣]'))) AS n_bullet,
             len(list_filter(lines, ln -> regexp_matches(ln, '(\.\.\.|…)\s*$'))) AS n_ell_end,
             len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha,
             len(list_filter({_GOPHER_STOP_SQL}, s -> list_contains(toks, s))) AS stop_hits
      FROM t
    )
    SELECT doc_id,
           n_words::INT AS n_words,
           total_len / n_words AS mean_word_len,
           (hash_cnt + ell_cnt + uni_ell_cnt) / n_words AS symbol_ratio,
           n_bullet / n_lines AS bullet_frac,
           n_ell_end / n_lines AS ellipsis_frac,
           n_alpha / n_words AS alpha_frac,
           stop_hits::INT AS stopword_hits,
           (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
           (total_len / n_words >= 3.0 AND total_len / n_words <= 10.0) AS ok_mean_word_len,
           ((hash_cnt + ell_cnt + uni_ell_cnt) / n_words <= 0.1) AS ok_symbol_ratio,
           (n_bullet / n_lines <= 0.9) AS ok_bullet,
           (n_ell_end / n_lines <= 0.3) AS ok_ellipsis,
           (n_alpha / n_words >= 0.8) AS ok_alpha,
           (stop_hits >= 2) AS ok_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (total_len / n_words >= 3.0 AND total_len / n_words <= 10.0)
            AND ((hash_cnt + ell_cnt + uni_ell_cnt) / n_words <= 0.1)
            AND (n_bullet / n_lines <= 0.9)
            AND (n_ell_end / n_lines <= 0.3)
            AND (n_alpha / n_words >= 0.8)
            AND (stop_hits >= 2)) AS gopher_pass
    FROM m
    """,
    late=True,
)(lambda spark, sf: X.gopher_quality_flags(load_table(spark, "documents", sf)))


# ---- CCNet paragraph-level dedup (Wenzek et al. 2019) ----
# The fixture corpus is single-line, so paragraph boundaries are derived
# from the frequent token 'a' acting as a separator (the operator is
# unit-agnostic — production callers pass '\n{2,}'). ~6% of the resulting
# segments repeat corpus-wide at sf0.01, so the first-occurrence keep, the
# (doc_id, para_idx) tiebreak, and the in-order reconstruction are all
# exercised non-vacuously. First-occurrence = min(struct) under a
# map-side-combining hash aggregate — hot paragraphs cannot hot-spot the
# shuffle (operator docstring).
_PARA_SEP = r"\s*\ba\b\s*"

_register(
    "dedup_paragraph",
    rf"""
    WITH p0 AS (
      SELECT doc_id,
             unnest(string_split_regex(text, '{_PARA_SEP}')) AS paragraph,
             generate_subscripts(string_split_regex(text, '{_PARA_SEP}'), 1) - 1 AS para_idx
      FROM documents
    ), p AS (
      SELECT doc_id, para_idx, paragraph, md5(paragraph) AS pkey
      FROM p0 WHERE length(paragraph) >= 1
    ), f AS (
      SELECT pkey, min(doc_id * 1000000 + para_idx) AS first_key
      FROM p GROUP BY pkey
    )
    SELECT p.doc_id,
           count(*)::BIGINT AS n_paras,
           sum(CASE WHEN p.doc_id * 1000000 + p.para_idx = f.first_key
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           coalesce(
             string_agg(p.paragraph, ' | ' ORDER BY p.para_idx)
               FILTER (WHERE p.doc_id * 1000000 + p.para_idx = f.first_key),
             '') AS retained_text
    FROM p JOIN f USING (pkey)
    GROUP BY p.doc_id
    """,
    late=True,
)(lambda spark, sf: D.paragraph_dedup_docs(
    load_table(spark, "documents", sf),
    sep_regex=_PARA_SEP,
    sep_out=" | ",
))


# ---- product quantization ANN (Jégou et al. 2011) ----
# Codebooks come from the deterministic per-subspace kmeans (lowest-id
# init, no RNG) → float-iterative → rows-only driver check, like
# vec_ivf_search. ADC quality (= exact distances when the codebook
# contains every distinct sub-vector) and the arrow≡expression encode
# equality are pinned in tests/test_text_vector.py. Scalar output columns
# only (driver-canon constraint — VERDICT r4 item 1).
def _pq(spark: SparkSession, sf: str) -> DataFrame:
    # the quadratic ADC stage does ~|queries| lookups per corpus row —
    # CPU-heavy-per-byte, so the parallelism floor pays for itself well
    # below floor_parallelism's default 32 MB gate (a single-file 13 MB
    # fixture otherwise runs encode + the 500k-pair join on ONE core)
    emb = T.floor_parallelism(
        load_table(spark, "embeddings", sf), min_task_bytes=1 << 18
    # the raw corpus feeds FOUR actions (PQ seed window, one codebook
    # pass, the query collect, the final search) — one materialization
    # instead of four scan+exchange reruns (guide §5)
    ).localCheckpoint(eager=True)
    # normalize=True: squared-L2 over unit vectors is monotonic in cosine,
    # so PQ ranks by the same metric as the exact KNN tier; normalization
    # happens in numpy inside the Arrow passes (free next to the matmul),
    # never as an interpreted per-element expression over the corpus
    books = V.pq_fit(emb, m=4, k=8, iters=1, dim=64, normalize=True)
    enc = V.pq_encode(emb, books, normalize=True)
    return V.pq_search(
        emb,
        emb.filter(F.col("vec_id") < 10),
        books,
        k=5,
        pre_encoded=enc,
        normalize=True,
    )


_register("vec_pq_search", late=True)(_pq)


# The FITTED codebook of vec_pq_search cannot hash-match an oracle (k-means
# sub-centroid means are order-dependent float sums), but the encode + ADC
# machinery it exercises is deterministic given a FIXED codebook — so this
# row anchors exactly that: the same splitmix-constant generator behind the
# LSH oracles supplies an m=4 × k=8 codebook as SQL literals, Spark runs
# the expression-path pq_encode (left-to-right fold, bit-identical to the
# SQL expansion) + the real pq_search ADC, and DuckDB replays code
# assignment (argmin with lowest-index tiebreak), the query distance
# tables, and the m-lookup ADC sum. adc_sq_dist is rounded to 6 dp on both
# sides (the pq_search contract), absorbing the numpy-vs-fold summation
# order of the tiny driver-side query tables.
_PQ_ADC_M, _PQ_ADC_K, _PQ_ADC_SUB = 4, 8, 16
_PQ_ADC_BOOKS = [
    [V._hyperplane(_PQ_ADC_SUB, s * _PQ_ADC_K + c) for c in range(_PQ_ADC_K)]
    for s in range(_PQ_ADC_M)
]
_PQ_ADC_BOOKS_SQL = ",\n      ".join(
    f"({s}, {c}, [" + ",".join(repr(x) for x in _PQ_ADC_BOOKS[s][c])
    + "]::DOUBLE[])"
    for s in range(_PQ_ADC_M)
    for c in range(_PQ_ADC_K)
)
_PQ_ADC_DIST = """list_aggregate(list_transform(range(1, 17),
               i -> (e.embedding[bk.s * 16 + i]::DOUBLE - bk.b[i])
                    * (e.embedding[bk.s * 16 + i]::DOUBLE - bk.b[i])),
             'sum')"""


def _pq_adc(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    enc = V.pq_encode(emb, _PQ_ADC_BOOKS, use_arrow=False)
    return V.pq_search(
        emb,
        emb.filter(F.col("vec_id") < 10),
        _PQ_ADC_BOOKS,
        k=5,
        pre_encoded=enc,
    )


# Same fixed-constant anchoring for the IVF-PQ composite: 4 splitmix
# centroids as literals, coarse assignment + nprobe=2 probe selection +
# cluster-confined ADC all replayed in SQL. Anchors the machinery of
# vec_ivfpq_search (whose FITTED centroids/codebooks stay rows-only).
# Fixed-centroid SemDedup twin: with a pre-fitted (here: splitmix-constant)
# partition and the expression-path assignment, the whole SemDedup drop
# list — argmin cluster assignment, within-cluster pair cosines (6dp
# contract), threshold, lowest-id keeper — is deterministic arithmetic
# that DuckDB replays exactly. Anchors the machinery of
# vector_semantic_dedup (whose FITTED k-means stays rows-only).
_SEMDEDUP_CENTS = [V._hyperplane(64, 700 + j) for j in range(4)]
_SEMDEDUP_CENTS_SQL = ",\n      ".join(
    f"({j}, [" + ",".join(repr(x) for x in _SEMDEDUP_CENTS[j])
    + "]::DOUBLE[])"
    for j in range(4)
)
_SEMDEDUP_COARSE_DIST = """list_aggregate(list_transform(range(1, 65),
               i -> (e.embedding[i]::DOUBLE - ct.v[i])
                    * (e.embedding[i]::DOUBLE - ct.v[i])),
             'sum')"""

_register(
    "vec_semdedup_apply",
    f"""
    WITH cents(j, v) AS (VALUES
      {_SEMDEDUP_CENTS_SQL}
    ),
    assign AS (
      SELECT vec_id, j AS cluster_id FROM (
        SELECT e.vec_id, ct.j,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SEMDEDUP_COARSE_DIST} ASC, ct.j ASC) AS rn
        FROM embeddings e, cents ct
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT x.cluster_id, x.ia, x.ib, {_COS} AS cosine
      FROM (
        SELECT a1.cluster_id, a1.vec_id AS ia, b1.vec_id AS ib
        FROM assign a1 JOIN assign b1
          ON a1.cluster_id = b1.cluster_id AND a1.vec_id < b1.vec_id
      ) x
      JOIN embeddings a ON a.vec_id = x.ia
      JOIN embeddings b ON b.vec_id = x.ib
    )
    SELECT ib AS vec_id,
           min(cluster_id) AS cluster_id,
           min(ia)::BIGINT AS kept_neighbor,
           max(cosine) AS max_cosine
    FROM cand WHERE cosine >= 0.4
    GROUP BY ib
    """,
    late=True,
)(lambda spark, sf: V.semantic_dedup(
    load_table(spark, "embeddings", sf),
    threshold=0.4,
    dim=64,
    centroids=_SEMDEDUP_CENTS,
    assign_arrow=False,
))


_IVFPQ_ADC_CENTS = [V._hyperplane(64, 500 + j) for j in range(4)]
_IVFPQ_ADC_CENTS_SQL = ",\n      ".join(
    f"({j}, [" + ",".join(repr(x) for x in _IVFPQ_ADC_CENTS[j])
    + "]::DOUBLE[])"
    for j in range(4)
)
_IVFPQ_COARSE_DIST = """list_aggregate(list_transform(range(1, 65),
               i -> (e.embedding[i]::DOUBLE - ct.v[i])
                    * (e.embedding[i]::DOUBLE - ct.v[i])),
             'sum')"""


def _ivfpq_adc(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    idx = V.pq_encode(
        V.ivf_assign(emb, _IVFPQ_ADC_CENTS, use_arrow=False),
        _PQ_ADC_BOOKS,
        use_arrow=False,
    )
    return V.ivfpq_search(
        emb,
        emb.filter(F.col("vec_id") < 10),
        _IVFPQ_ADC_CENTS,
        _PQ_ADC_BOOKS,
        k=5,
        nprobe=2,
        pre_indexed=idx,
    )


_register(
    "vec_ivfpq_adc",
    f"""
    WITH cents(j, v) AS (VALUES
      {_IVFPQ_ADC_CENTS_SQL}
    ),
    books(s, c, b) AS (VALUES
      {_PQ_ADC_BOOKS_SQL}
    ),
    assign AS (
      SELECT vec_id, j AS cluster_id FROM (
        SELECT e.vec_id, ct.j,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVFPQ_COARSE_DIST} ASC, ct.j ASC) AS rn
        FROM embeddings e, cents ct
      ) WHERE rn = 1
    ),
    codes AS (
      SELECT vec_id, s, c FROM (
        SELECT e.vec_id, bk.s, bk.c,
               row_number() OVER (
                 PARTITION BY e.vec_id, bk.s
                 ORDER BY {_PQ_ADC_DIST} ASC, bk.c ASC) AS rn
        FROM embeddings e, books bk
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, j AS cluster_id FROM (
        SELECT e.vec_id AS query_id, ct.j,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVFPQ_COARSE_DIST} ASC, ct.j ASC) AS rn
        FROM embeddings e, cents ct WHERE e.vec_id < 10
      ) WHERE rn <= 2
    ),
    qdt AS (
      SELECT e.vec_id AS query_id, bk.s, bk.c, {_PQ_ADC_DIST} AS d
      FROM embeddings e, books bk
      WHERE e.vec_id < 10
    ),
    adc AS (
      SELECT q.query_id, cd.vec_id AS neighbor_id,
             round(sum(q.d), 6) AS adc_sq_dist
      FROM codes cd
      JOIN assign a ON a.vec_id = cd.vec_id
      JOIN probes p ON p.cluster_id = a.cluster_id
      JOIN qdt q ON q.query_id = p.query_id
                AND q.s = cd.s AND q.c = cd.c
      WHERE q.query_id != cd.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_sq_dist, rank::INT AS rank FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY adc_sq_dist ASC, neighbor_id ASC) AS rank
      FROM adc
    ) WHERE rank <= 5
    """,
    late=True,
)(_ivfpq_adc)


_register(
    "vec_pq_adc",
    f"""
    WITH books(s, c, b) AS (VALUES
      {_PQ_ADC_BOOKS_SQL}
    ),
    codes AS (
      SELECT vec_id, s, c FROM (
        SELECT e.vec_id, bk.s, bk.c,
               row_number() OVER (
                 PARTITION BY e.vec_id, bk.s
                 ORDER BY {_PQ_ADC_DIST} ASC, bk.c ASC) AS rn
        FROM embeddings e, books bk
      ) WHERE rn = 1
    ),
    qdt AS (
      SELECT e.vec_id AS query_id, bk.s, bk.c, {_PQ_ADC_DIST} AS d
      FROM embeddings e, books bk
      WHERE e.vec_id < 10
    ),
    adc AS (
      SELECT q.query_id, cd.vec_id AS neighbor_id,
             round(sum(q.d), 6) AS adc_sq_dist
      FROM codes cd JOIN qdt q ON q.s = cd.s AND q.c = cd.c
      WHERE q.query_id != cd.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_sq_dist, rank::INT AS rank FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY adc_sq_dist ASC, neighbor_id ASC) AS rank
      FROM adc
    ) WHERE rank <= 5
    """,
    late=True,
)(_pq_adc)


# ---- dataset-card summary (per-stratum counts + Gopher pass rates) ----
# Every ratio is exact-int / exact-int → bit-identical doubles (module
# conventions); the oracle repeats the Gopher conjunction from
# text_gopher_quality inline.
_register(
    "curation_dataset_card",
    rf"""
    WITH t AS (
      SELECT lang, source,
             string_split_regex(lower(text), '\s+') AS toks,
             string_split(text, chr(10)) AS lines, text
      FROM documents
    ), m AS (
      SELECT lang, source,
             len(toks) AS n_words,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS total_len,
             length(text) - length(replace(text, '#', '')) AS hash_cnt,
             (length(text) - length(replace(text, '...', ''))) / 3 AS ell_cnt,
             length(text) - length(replace(text, '…', '')) AS uni_ell_cnt,
             len(lines) AS n_lines,
             len(list_filter(lines, ln -> regexp_matches(ln, '^[\s]*[-*•‣]'))) AS n_bullet,
             len(list_filter(lines, ln -> regexp_matches(ln, '(\.\.\.|…)\s*$'))) AS n_ell_end,
             len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha,
             len(list_filter({_GOPHER_STOP_SQL}, s -> list_contains(toks, s))) AS stop_hits
      FROM t
    ), d AS (
      SELECT lang, source, n_words,
             CASE WHEN (n_words >= 50 AND n_words <= 100000)
                   AND (total_len / n_words >= 3.0 AND total_len / n_words <= 10.0)
                   AND ((hash_cnt + ell_cnt + uni_ell_cnt) / n_words <= 0.1)
                   AND (n_bullet / n_lines <= 0.9)
                   AND (n_ell_end / n_lines <= 0.3)
                   AND (n_alpha / n_words >= 0.8)
                   AND (stop_hits >= 2)
                  THEN 1 ELSE 0 END AS pass
      FROM m
    ), agg AS (
      SELECT lang, source,
             count(*)::BIGINT AS n_docs,
             sum(n_words)::BIGINT AS n_tokens,
             sum(pass)::BIGINT AS n_gopher_pass
      FROM d GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens,
           n_tokens / (sum(n_tokens) OVER ()) AS token_share,
           n_gopher_pass,
           n_gopher_pass / n_docs AS gopher_pass_rate,
           n_tokens / n_docs AS avg_doc_tokens
    FROM agg
    """,
    late=True,
)(lambda spark, sf: CU.dataset_card(load_table(spark, "documents", sf)))


# ---- IVF-PQ composite ANN (FAISS IVFPQ architecture) ----
# Coarse k-means partition + PQ codes + nprobe-confined ADC. Both
# quantizers are float-iterative → rows-only, like vec_ivf_search /
# vec_pq_search; exactness at full probe + lossless codebooks is pinned
# in tests. Scalar output columns only.
def _ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    emb = T.floor_parallelism(
        load_table(spark, "embeddings", sf), min_task_bytes=1 << 18
    )
    # the normalized corpus feeds SIX actions (k-means seed window + one
    # Lloyd pass, PQ seed window + one codebook pass, the query-set
    # collect, and the final indexed search) — localCheckpoint runs the
    # scan + ArrowEvalPython normalize ONCE instead of once per action
    # (guide §5; r12 verdict item 5: single codebook-relation
    # materialization, Arrow normalize/encode stay the only Python)
    base = V._l2_normalized(emb, "vec_id", "embedding").localCheckpoint(
        eager=True
    )
    cents = V.kmeans_fit(base, k=8, iters=1, dim=64)
    books = V.pq_fit(base, m=4, k=8, iters=1, dim=64)
    idx = V.ivfpq_index(base, cents, books)
    return V.ivfpq_search(
        base,
        base.filter(F.col("vec_id") < 10),
        cents,
        books,
        k=5,
        nprobe=3,
        pre_indexed=idx,
    )


_register("vec_ivfpq_search", late=True)(_ivfpq)


# ---- CCNet perplexity buckets (Wenzek et al. 2019 §4.3) ----
# Equal-count LM-score bins over the exact integer-micro-log unigram
# score; ranks via the distributed two-phase global_row_number, bucket id
# via integer floor arithmetic — bit-identical to the window-function
# oracle (which may use a plain OVER () because DuckDB runs single-node).
_register(
    "curation_perplexity_buckets",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ), occ AS (
      SELECT doc_id, tok, count(*)::BIGINT AS n_occ
      FROM tok WHERE tok != '' GROUP BY doc_id, tok
    ), cnt AS (
      SELECT tok, sum(n_occ)::BIGINT AS cnt FROM occ GROUP BY tok
    ), tot AS (
      SELECT sum(cnt)::BIGINT AS total FROM cnt
    ), s AS (
      SELECT o.doc_id,
             sum(o.n_occ)::BIGINT AS n_tokens,
             sum(o.n_occ * round(log10(c.cnt::DOUBLE) * 1e6)::BIGINT)::BIGINT
               AS s
      FROM occ o JOIN cnt c USING (tok) GROUP BY o.doc_id
    ), ulp AS (
      SELECT doc_id, n_tokens,
             s / (1e6 * n_tokens)
               - log10((SELECT total FROM tot)::DOUBLE) AS mean_logprob
      FROM s
    ), ranked AS (
      SELECT doc_id, n_tokens, mean_logprob,
             row_number() OVER (ORDER BY mean_logprob, doc_id) AS rn,
             count(*) OVER () AS n
      FROM ulp
    )
    SELECT ((rn - 1) * 5) // n + 1 AS bucket,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           min(mean_logprob) AS min_mean_logprob,
           max(mean_logprob) AS max_mean_logprob
    FROM ranked
    GROUP BY 1
    """,
    late=True,
)(lambda spark, sf: CU.perplexity_buckets(
    X.unigram_logprob(load_table(spark, "documents", sf))
))


# ---- IVF recall row (completes the ANN quality triptych: quantized
# recall is oracle-backed, LSH recall is oracle-backed via inlined
# planes; IVF's centroids are float-iterative, so its recall row is
# rows-only — but the driver still sees the 10 per-query recall rows) ----
def _ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    q = emb.filter(F.col("vec_id") < 10)
    cents = V.kmeans_fit(emb, k=8, iters=2, dim=64)
    return V.knn_recall(
        V.knn_cosine_bruteforce(emb, q),
        V.ivf_search(emb, q, cents, k=5, nprobe=2),
    )


_register("vec_ivf_recall", late=True)(_ivf_recall)


