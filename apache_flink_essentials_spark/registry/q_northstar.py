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
# §2.8 scalar functions
# =========================================================================

_register(
    "scalar_time_funcs",
    """
    SELECT event_id,
           year(ts)::INT AS y, month(ts)::INT AS mo, day(ts)::INT AS d,
           hour(ts)::INT AS h, minute(ts)::INT AS mi,
           (dayofweek(ts) + 1)::INT AS dow_sunday1,
           floor(epoch(date_trunc('day', ts)))::BIGINT AS day_epoch
    FROM events
    """,
)(lambda spark, sf: _events(spark, sf).select(
    "event_id",
    F.year("ts").alias("y"),
    F.month("ts").alias("mo"),
    F.dayofmonth("ts").alias("d"),
    F.hour("ts").alias("h"),
    F.minute("ts").alias("mi"),
    F.dayofweek("ts").alias("dow_sunday1"),  # Spark: 1=Sunday; DuckDB dow 0=Sunday
    F.date_trunc("day", F.col("ts")).cast("long").alias("day_epoch"),
))

_register(
    "scalar_string_funcs",
    """
    SELECT doc_id,
           upper(substr(text, 1, 12)) AS head_upper,
           replace(lang, 'e', '3') AS lang_l33t,
           translate(source, 'src', 'SRC') AS source_translated,
           levenshtein(lang, 'en')::INT AS lev_to_en,
           length(concat(lang, '/', source))::INT AS tag_len
    FROM documents
    """,
)(lambda spark, sf: load_table(spark, "documents", sf).select(
    "doc_id",
    F.upper(F.substring("text", 1, 12)).alias("head_upper"),
    F.regexp_replace("lang", "e", "3").alias("lang_l33t"),
    F.translate("source", "src", "SRC").alias("source_translated"),
    F.levenshtein("lang", F.lit("en")).alias("lev_to_en"),
    F.length(F.concat(F.col("lang"), F.lit("/"), F.col("source"))).alias("tag_len"),
))

_register(
    "cube_user_type",
    """
    SELECT user_id, event_type,
           grouping(user_id)::INT AS g_user, grouping(event_type)::INT AS g_type,
           count(*) AS n_events
    FROM events GROUP BY CUBE (user_id, event_type)
    """,
)(lambda spark, sf: _events(spark, sf)
    .cube("user_id", "event_type")
    .agg(
        F.grouping("user_id").cast("int").alias("g_user"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.count("*").alias("n_events"),
    )
    .select("user_id", "event_type", "g_user", "g_type", "n_events"))

_register(
    "scalar_json_props",
    """
    SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events
    """,
)(lambda spark, sf: _events(spark, sf).select(
    "event_id", json_int("props", "$.k").alias("k")
))


# =========================================================================
# §2.10 north-star: dedup / text / vectors / multimodal
# =========================================================================

_register(
    "dedup_exact",
    r"""
    SELECT md5(array_to_string(string_split_regex(lower(text), '\s+'), ' ')) AS fingerprint,
           min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)(lambda spark, sf: D.exact_dedup(load_table(spark, "documents", sf)))

_MINHASH_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(lower(text), '\s+') AS toks,
             list_distinct(string_split_regex(lower(text), '\s+')) AS tok_set
      FROM documents
    ), sh AS (
      SELECT doc_id, tok_set,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM toks
    ), hashed AS (
      SELECT doc_id, tok_set,
             list_transform(shingles, s -> md5('0:' || s)) AS h0,
             list_transform(shingles, s -> md5('1:' || s)) AS h1
      FROM sh
    ), mh AS (
      SELECT doc_id, tok_set,
             [list_aggregate(list_transform(h0, h -> h[1:8]), 'min'),
              list_aggregate(list_transform(h0, h -> h[9:16]), 'min'),
              list_aggregate(list_transform(h0, h -> h[17:24]), 'min'),
              list_aggregate(list_transform(h0, h -> h[25:32]), 'min'),
              list_aggregate(list_transform(h1, h -> h[1:8]), 'min'),
              list_aggregate(list_transform(h1, h -> h[9:16]), 'min'),
              list_aggregate(list_transform(h1, h -> h[17:24]), 'min'),
              list_aggregate(list_transform(h1, h -> h[25:32]), 'min')] AS mh
      FROM hashed
    ), banded AS (
      SELECT doc_id, tok_set,
             unnest([0, 1, 2, 3]) AS band_idx,
             unnest([md5(mh[1] || '|' || mh[2]), md5(mh[3] || '|' || mh[4]),
                     md5(mh[5] || '|' || mh[6]), md5(mh[7] || '|' || mh[8])]) AS band_hash
      FROM mh
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
    SELECT p.id_a, p.id_b,
           len(list_intersect(ta.tok_set, tb.tok_set))::DOUBLE
                 / len(list_distinct(ta.tok_set || tb.tok_set)) AS jaccard
    FROM pairs p
    JOIN toks ta ON ta.doc_id = p.id_a
    JOIN toks tb ON tb.doc_id = p.id_b
    WHERE len(list_intersect(ta.tok_set, tb.tok_set))::DOUBLE
                / len(list_distinct(ta.tok_set || tb.tok_set)) >= 0.5
"""

_register("dedup_minhash_lsh", _MINHASH_ORACLE)(
    lambda spark, sf: D.minhash_lsh_pairs(load_table(spark, "documents", sf))
)

_register(
    "dedup_ngram_jaccard",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.tok, b.tok))::DOUBLE
                 / len(list_distinct(a.tok || b.tok)) AS jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.tok, b.tok))::DOUBLE
                / len(list_distinct(a.tok || b.tok)) >= 0.5
    """,
)(lambda spark, sf: D.ngram_jaccard_pairs(
    load_table(spark, "documents", sf), block_cols=["lang", "source"]
))

# corpus-bounded output contract for pair-emitting dedup (r12): pair count
# grows with duplicate density² (11.08M pairs at sf1 = 97× the sf0.1
# output), so the per-doc argmax is the shape that survives 100 TB —
# O(corpus) rows, pairs reduced by map-side partial max_by before any
# exchange
_register(
    "dedup_ngram_best_match",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.tok, b.tok))::DOUBLE
                   / len(list_distinct(a.tok || b.tok)) AS jaccard
      FROM toks a JOIN toks b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.tok, b.tok))::DOUBLE
                  / len(list_distinct(a.tok || b.tok)) >= 0.5
    ), sym AS (
      SELECT id_a AS doc, id_b AS partner, jaccard FROM pairs
      UNION ALL
      SELECT id_b AS doc, id_a AS partner, jaccard FROM pairs
    ), ranked AS (
      SELECT doc, partner, jaccard,
             row_number() OVER (PARTITION BY doc
               ORDER BY jaccard DESC, partner ASC) AS rn
      FROM sym
    )
    SELECT doc AS doc_id, partner AS best_match_id, jaccard AS best_jaccard
    FROM ranked WHERE rn = 1
    """,
)(lambda spark, sf: D.ngram_jaccard_best_match(
    load_table(spark, "documents", sf), block_cols=["lang", "source"]
))

# the LINEAR scale path (r12): max_token_df=10 drops heavy-hitter tokens
# from the posting join (kept in denominators → guaranteed under-estimate,
# no false positives). Uncapped posting work is Σ C(df,2) — alpha 1.89/1.94
# on the densifying sf1 fixture; capped it is ≤ cap × Σ df, linear. The
# oracle replicates the cap exactly: df per (block, token) from distinct
# postings, tokens with df > 10 excluded from intersections only.
_register(
    "dedup_ngram_best_match_capped",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ), posts AS (
      SELECT doc_id, lang, source, unnest(tok) AS t FROM toks
    ), dfs AS (
      SELECT lang, source, t, count(*) AS df FROM posts GROUP BY 1, 2, 3
    ), kept AS (
      SELECT p.doc_id, p.lang, p.source, p.t
      FROM posts p JOIN dfs USING (lang, source, t) WHERE df <= 10
    ), ic AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS i
      FROM kept a JOIN kept b
        ON a.lang = b.lang AND a.source = b.source AND a.t = b.t
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b,
             i::DOUBLE / (len(ta.tok) + len(tb.tok) - i) AS jaccard
      FROM ic JOIN toks ta ON ta.doc_id = id_a
              JOIN toks tb ON tb.doc_id = id_b
      WHERE i::DOUBLE / (len(ta.tok) + len(tb.tok) - i) >= 0.5
    ), sym AS (
      SELECT id_a AS doc, id_b AS partner, jaccard FROM pairs
      UNION ALL
      SELECT id_b AS doc, id_a AS partner, jaccard FROM pairs
    ), ranked AS (
      SELECT doc, partner, jaccard,
             row_number() OVER (PARTITION BY doc
               ORDER BY jaccard DESC, partner ASC) AS rn
      FROM sym
    )
    SELECT doc AS doc_id, partner AS best_match_id, jaccard AS best_jaccard
    FROM ranked WHERE rn = 1
    """,
    late=True,
)(lambda spark, sf: D.ngram_jaccard_best_match(
    load_table(spark, "documents", sf),
    block_cols=["lang", "source"],
    max_token_df=10,
))

_STOPWORDS_SQL = "['" + "', '".join(X.STOPWORDS_EN) + "']"

_register(
    "text_stats",
    rf"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks)::INT AS n_tokens,
           len(list_distinct(toks))::INT AS n_distinct_tokens,
           length(text)::INT AS n_chars,
           list_aggregate(list_transform(toks, t -> length(t)), 'sum')::DOUBLE
                 / len(toks) AS avg_token_len,
           len(list_filter(toks, t -> list_contains({_STOPWORDS_SQL}, t)))::DOUBLE
                 / len(toks) AS stopword_ratio,
           len(list_distinct(toks))::DOUBLE / len(toks) AS ttr
    FROM t
    """,
)(lambda spark, sf: X.text_stats(load_table(spark, "documents", sf)))

_register(
    "text_quality",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    )
    SELECT doc_id, len(toks)::INT AS n_tokens,
           0.4 * least(1.0, len(toks) / 100.0)
                 + 0.4 * (len(list_distinct(toks))::DOUBLE / len(toks))
                 + 0.2 * least(1.0, len(list_filter(toks,
                       t -> list_contains({_STOPWORDS_SQL}, t)))::DOUBLE / 5.0)
                 AS quality_score
    FROM t
    """,
)(lambda spark, sf: X.quality_score(load_table(spark, "documents", sf)))


def _lang_oracle() -> str:
    score_exprs = []
    for lang, markers in sorted(X.LANG_MARKERS.items()):
        marker_sql = "['" + "', '".join(markers) + "']"
        score_exprs.append(
            f"len(list_intersect(toks, {marker_sql})) AS score_{lang}"
        )
    langs = sorted(X.LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE "
    for lang in langs:
        case += f"WHEN score_{lang} = {greatest} THEN '{lang}' "
    case += "END"
    return rf"""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split_regex(lower(text), '\s+')) AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, {", ".join(score_exprs)} FROM t
    )
    SELECT doc_id,
           CASE WHEN {greatest} > 0 THEN {case} ELSE 'und' END AS detected_lang
    FROM scored
    """


_register("text_lang_detect", _lang_oracle())(
    lambda spark, sf: X.detect_language(load_table(spark, "documents", sf))
)

_register(
    "text_fingerprint",
    r"""
    SELECT doc_id,
           md5(array_to_string(string_split_regex(lower(text), '\s+'), ' ')) AS fingerprint
    FROM documents
    """,
)(lambda spark, sf: X.fingerprint(load_table(spark, "documents", sf)))

_register(
    "text_token_count",
    r"""
    SELECT doc_id, lang,
           len(string_split_regex(lower(text), '\s+'))::INT AS n_tokens
    FROM documents
    """,
)(lambda spark, sf: token_count_q(spark, sf))


def token_count_q(spark: SparkSession, sf: str) -> DataFrame:
    return X.token_count(load_table(spark, "documents", sf)).select(
        "doc_id", "lang", "n_tokens"
    )


_register(
    "vec_knn_bruteforce",
    """
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
         q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
         scored AS (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                  round(
                    list_aggregate(list_transform(range(1, 65),
                        i -> q.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum')
                    / (sqrt(list_aggregate(list_transform(range(1, 65),
                        i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE), 'sum'))
                     * sqrt(list_aggregate(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum'))),
                  6) AS cosine
           FROM q, e WHERE q.vec_id != e.vec_id
         )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC)::INT AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)(lambda spark, sf: V.knn_cosine_bruteforce(
    load_table(spark, "embeddings", sf),
    load_table(spark, "embeddings", sf).filter(F.col("vec_id") < 10),
))

_COS = """round(
      list_aggregate(list_transform(range(1, 65),
          i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')
      / (sqrt(list_aggregate(list_transform(range(1, 65),
          i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE), 'sum'))
       * sqrt(list_aggregate(list_transform(range(1, 65),
          i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum'))),
    6)"""

_register(
    "vec_cosine_pairs_blocked",
    f"""
    SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS} AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS} >= 0.3
    """,
)(lambda spark, sf: V.cosine_pairs_blocked(
    load_table(spark, "embeddings", sf), block_col="label", threshold=0.3
))

# corpus-bounded twin (r12): per-vector best within-block partner —
# O(corpus) output; the pair stream reduces via map-side max_by before
# any exchange (the pair form's sf1 curve alpha was mostly result size)
_register(
    "vec_cosine_best_match",
    f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_COS} >= 0.3
    ), sym AS (
      SELECT id_a AS doc, id_b AS partner, cosine FROM pairs
      UNION ALL
      SELECT id_b AS doc, id_a AS partner, cosine FROM pairs
    ), ranked AS (
      SELECT doc, partner, cosine,
             row_number() OVER (PARTITION BY doc
               ORDER BY cosine DESC, partner ASC) AS rn
      FROM sym
    )
    SELECT doc AS vec_id, partner AS best_match_id, cosine AS best_cosine
    FROM ranked WHERE rn = 1
    """,
    late=True,
)(lambda spark, sf: V.cosine_best_match_blocked(
    load_table(spark, "embeddings", sf), block_col="label", threshold=0.3
))

_register(
    "wf1_formatted_window",
    """
    SELECT window_start, window_end, cnt,
           'Window [' || window_start::VARCHAR || ' - ' || window_end::VARCHAR
               || '] ' || cnt::VARCHAR AS formatted
    FROM (
      SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS window_start,
             (floor(epoch(ts) / 3600) * 3600 + 3600)::BIGINT AS window_end,
             count(*) FILTER (WHERE event_type = 'signup') AS cnt
      FROM events GROUP BY 1, 2
    )
    """,
)(lambda spark, sf: WF.count_by_window_all(
    _events(spark, sf), "ts", "1 hour", F.col("event_type") == "signup"
))

_register(
    "udaf_geomean",
    """
    SELECT event_type, round(exp(avg(ln(value))), 6) AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
)(lambda spark, sf: _events(spark, sf)
    .filter(F.col("value") > 0)
    .groupBy("event_type")
    .agg(F.round(geo_mean_expr("value"), 6).alias("geo_mean")))

_register(
    "text_bpe_token_count",
    r"""
    SELECT doc_id,
           len(string_split_regex(
               regexp_replace(
                   regexp_replace(lower(text), '([a-z]+)(\d)', '\1 \2', 'g'),
                   '(\d)([a-z])', '\1 \2', 'g'),
               '\s+'))::INT AS n_bpe_tokens
    FROM documents
    """,
)(lambda spark, sf: load_table(spark, "documents", sf).select(
    "doc_id",
    F.size(X.bpe_ish_tokens_expr("text")).alias("n_bpe_tokens"),
))

# LSH ANN + embedding dedup: approximate by design — registered WITHOUT an
# oracle; driver records the weaker rows-only check (recall < 1 is intended).
def _ivf(spark: SparkSession, sf: str) -> DataFrame:
    # one Lloyd iteration, index built once per call (fit + single
    # assignment pass via ivf_index — the searched DataFrame IS the fit's
    # assignment, never re-assigned); dim passed so the fit skips its probe.
    # localCheckpoint: the corpus feeds the seed collect, the Lloyd pass,
    # the query collect and the final search — one scan, not four (§5)
    emb = load_table(spark, "embeddings", sf).localCheckpoint(eager=True)
    centroids, indexed = V.ivf_index(emb, k=8, iters=1, dim=64)
    return V.ivf_search(
        emb,
        emb.filter(F.col("vec_id") < 10),
        centroids,
        k=5,
        nprobe=3,
        pre_assigned=indexed,
    )


_register("vec_ivf_search")(_ivf)

_register("vec_ann_lsh")(
    lambda spark, sf: V.ann_lsh_cosine(
        load_table(spark, "embeddings", sf),
        load_table(spark, "embeddings", sf).filter(F.col("vec_id") < 10),
        num_planes=4,
        num_tables=8,
        use_arrow=True,  # numpy matmul bucket assignment; 5× the HOF form
    )
)

# The LSH hyperplanes are deterministic integer-mixed constants
# (vector._hyperplane — no RNG), so the DuckDB oracle can replicate bucket
# assignment exactly by inlining the same plane components as literals:
# this upgrades vec_embedding_dedup from a rows-only check (which recorded
# a vacuous 0 rows at sf0.01 under threshold=0.9 — r3 verdict item 4) to a
# full hash-matched oracle row. threshold=0.35 yields a small non-trivial
# pair set on the synthetic fixture; production dedup runs ≥0.99.
_DEDUP_PLANES = [V._hyperplane(64, p) for p in range(8)]
_DEDUP_PLANES_SQL = ",\n           ".join(
    "[" + ",".join(repr(c) for c in plane) + "]::DOUBLE[] AS p%d" % i
    for i, plane in enumerate(_DEDUP_PLANES)
)
_DEDUP_BUCKET_SQL = "\n             + ".join(
    "(CASE WHEN list_aggregate(list_transform(range(1, 65),"
    f" i -> embedding[i]::DOUBLE * p{j}[i]), 'sum') >= 0"
    f" THEN {1 << j} ELSE 0 END)"
    for j in range(8)
)

_register(
    "vec_embedding_dedup",
    f"""
    WITH planes AS (SELECT {_DEDUP_PLANES_SQL}),
    bk AS (
      SELECT vec_id, embedding,
             {_DEDUP_BUCKET_SQL} AS bucket
      FROM embeddings, planes
    )
    SELECT * FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.35
    """,
    late=True,
)(
    lambda spark, sf: V.embedding_dedup_pairs(
        load_table(spark, "embeddings", sf), threshold=0.35
    )
)

# r12: the auto-planes variant. A FIXED plane count super-linearizes the
# Σ bucket² pair stage as the corpus grows (sf0.1→sf1 curve: alpha 1.24 at
# 8 planes); `num_planes=None` derives clamp(ceil(log2(n/8)), 4, 24) from a
# metadata-cheap count so expected occupancy stays constant. The oracle
# replicates the SAME formula from count(*) and masks unused bits of a
# 24-plane bucket expression — fully hash-checkable at ANY scale factor
# (the fixture sizes 20/200/2000/20000 put n/8 safely between powers of
# two, so ceil(log2(·)) can't straddle a ULP edge across engines).
_AUTO_PLANES = [V._hyperplane(64, p) for p in range(24)]
_AUTO_PLANES_SQL = ",\n           ".join(
    "[" + ",".join(repr(c) for c in plane) + "]::DOUBLE[] AS p%d" % i
    for i, plane in enumerate(_AUTO_PLANES)
)
_AUTO_BUCKET_SQL = "\n             + ".join(
    f"(CASE WHEN {j} < n.np AND list_aggregate(list_transform(range(1, 65),"
    f" i -> embedding[i]::DOUBLE * p{j}[i]), 'sum') >= 0"
    f" THEN {1 << j} ELSE 0 END)"
    for j in range(24)
)

_register(
    "vec_embedding_dedup_auto",
    f"""
    WITH n AS (
      SELECT greatest(4, least(24,
               ceil(log2(count(*) / 8.0))::INT)) AS np
      FROM embeddings
    ),
    planes AS (SELECT {_AUTO_PLANES_SQL}),
    bk AS (
      SELECT vec_id, embedding,
             {_AUTO_BUCKET_SQL} AS bucket
      FROM embeddings, planes, n
    )
    SELECT * FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.35
    """,
    late=True,
)(
    lambda spark, sf: V.embedding_dedup_pairs(
        load_table(spark, "embeddings", sf), threshold=0.35, num_planes=None
    )
)

# r12b: embedding leg of the incremental-ingest matrix (minhash: ✓,
# simhash: ✓, ER: ✓). The corpus bucket table pins its AUTO plane count
# at build time (sig_planes) — the batch buckets with the CORPUS's
# planes, and the oracle derives the same count from the corpus subset's
# count(*), masking unused bits of the 24-plane bucket expression.
_register(
    "vec_embedding_dedup_incremental",
    f"""
    WITH n AS (
      SELECT greatest(4, least(24,
               ceil(log2(count(*) / 8.0))::INT)) AS np
      FROM embeddings WHERE vec_id % 2 = 0
    ),
    planes AS (SELECT {_AUTO_PLANES_SQL}),
    bk AS (
      SELECT vec_id, embedding,
             {_AUTO_BUCKET_SQL} AS bucket
      FROM embeddings, planes, n
    ),
    matched AS (
      SELECT DISTINCT b.vec_id
      FROM bk a JOIN bk b ON a.bucket = b.bucket
      WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
        AND a.vec_id <> b.vec_id AND {_COS} >= 0.35
    )
    SELECT vec_id FROM embeddings
    WHERE vec_id % 2 = 1 AND vec_id NOT IN (SELECT vec_id FROM matched)
    """,
    late=True,
)(
    lambda spark, sf: V.embedding_dedup_against_corpus(
        load_table(spark, "embeddings", sf).filter(F.col("vec_id") % 2 == 1),
        load_table(spark, "embeddings", sf).filter(F.col("vec_id") % 2 == 0),
        threshold=0.35,
        num_planes=None,
    ).select("vec_id")
)

def _curation(spark: SparkSession, sf: str) -> DataFrame:
    # end-to-end training-data curation: language gate → quality gate →
    # exact dedup (min-id representative per fingerprint) → per-source
    # yield stats. The text operators compose as EXPRESSIONS into one
    # single-scan projection (no self-joins of documents); dedup's
    # fingerprint hash-agg is the only shuffle before the final rollup.
    kept = (
        load_table(spark, "documents", sf)
        .select(
            "doc_id",
            "source",
            X.detected_lang_expr().alias("detected_lang"),
            F.size(X.tokens_expr()).alias("n_tokens"),
            X.quality_score_expr().alias("quality_score"),
            X.fingerprint_expr().alias("fingerprint"),
        )
        .filter(
            (F.col("detected_lang") == "en")
            & (F.col("quality_score") >= 0.7)
            & (F.col("n_tokens") >= 10)
        )
    )
    # dedup representative via window-min on the fingerprint partition: no
    # self-join, so the document scan happens exactly ONCE in the plan
    from pyspark.sql.window import Window as _W

    survivors = kept.withColumn(
        "keep_id", F.min("doc_id").over(_W.partitionBy("fingerprint"))
    ).filter(F.col("doc_id") == F.col("keep_id"))
    return survivors.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def _curation_oracle() -> str:
    score_exprs = []
    for lang, markers in sorted(X.LANG_MARKERS.items()):
        marker_sql = "['" + "', '".join(markers) + "']"
        score_exprs.append(
            f"len(list_intersect(dtoks, {marker_sql})) AS score_{lang}"
        )
    langs = sorted(X.LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE "
    for lang in langs:
        case += f"WHEN score_{lang} = {greatest} THEN '{lang}' "
    case += "END"
    return rf"""
    WITH t AS (
      SELECT doc_id, source,
             string_split_regex(lower(text), '\s+') AS toks,
             list_distinct(string_split_regex(lower(text), '\s+')) AS dtoks
      FROM documents
    ), scored AS (
      SELECT doc_id, source, toks, {", ".join(score_exprs)} FROM t
    ), kept AS (
      SELECT doc_id, source,
             len(toks)::INT AS n_tokens,
             md5(array_to_string(toks, ' ')) AS fingerprint
      FROM scored
      WHERE (CASE WHEN {greatest} > 0 THEN {case} ELSE 'und' END) = 'en'
        AND 0.4 * least(1.0, len(toks) / 100.0)
            + 0.4 * (len(list_distinct(toks))::DOUBLE / len(toks))
            + 0.2 * least(1.0, len(list_filter(toks,
                  t -> list_contains({_STOPWORDS_SQL}, t)))::DOUBLE / 5.0) >= 0.7
        AND len(toks) >= 10
    )
    SELECT source, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
    FROM kept
    WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY fingerprint)
    GROUP BY source
    """


_register("curation_pipeline", _curation_oracle())(_curation)


def _simhash_keyed_prefix(bits: int = 32) -> str:
    """Shared CTE prefix of the simhash oracles: md5-hex-digit-parity
    fingerprints (bit for bit the operators.dedup.simhash construction)
    banded into lo/hi halves."""
    odd = "('1','3','5','7','9','b','d','f')"
    contribs = ", ".join(
        f"list_aggregate(list_transform(hashed, h -> CASE WHEN substr(h, {j + 1}, 1) "
        f"IN {odd} THEN 1 ELSE -1 END), 'sum') AS c{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN c{j} > 0 THEN {2**j}::BIGINT ELSE 0 END)" for j in range(bits))
    half = 2 ** (bits // 2)
    return rf"""
    WITH hashed AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split_regex(lower(text), '\s+')),
                            t -> md5(t)) AS hashed
      FROM documents
    ), contrib AS (
      SELECT doc_id, {contribs} FROM hashed
    ), fp AS (
      SELECT doc_id, ({fp}) AS simhash FROM contrib
    ), keyed AS (
      SELECT doc_id, simhash, simhash % {half} AS lo,
             floor(simhash / {half})::BIGINT AS hi
      FROM fp
    )"""


def _simhash_oracle(bits: int = 32, max_hamming: int = 3) -> str:
    """DuckDB twin of operators.dedup.simhash_dup_pairs."""
    return rf"""{_simhash_keyed_prefix(bits)}, cands AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM keyed a JOIN keyed b ON a.lo = b.lo AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
      FROM keyed a JOIN keyed b ON a.hi = b.hi AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::INT AS hamming
    FROM cands WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
    """


def _simhash_best_oracle(bits: int = 32, max_hamming: int = 3) -> str:
    """DuckDB twin of operators.dedup.simhash_best_match: per-doc argmin
    over the same band-candidate relation (ties → smallest partner id)."""
    return rf"""{_simhash_keyed_prefix(bits)}, cands AS (
      SELECT a.doc_id AS doc, b.doc_id AS partner,
             bit_count(xor(a.simhash, b.simhash))::INT AS hamming
      FROM keyed a JOIN keyed b ON a.lo = b.lo AND a.doc_id <> b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id, bit_count(xor(a.simhash, b.simhash))::INT
      FROM keyed a JOIN keyed b ON a.hi = b.hi AND a.doc_id <> b.doc_id
    ), ranked AS (
      SELECT doc, partner, hamming,
             row_number() OVER (PARTITION BY doc
               ORDER BY hamming, partner) AS rn
      FROM cands WHERE hamming <= {max_hamming}
    )
    SELECT doc AS doc_id, partner AS best_match_id, hamming AS best_hamming
    FROM ranked WHERE rn = 1
    """


_register("dedup_simhash", _simhash_oracle())(
    lambda spark, sf: D.simhash_dup_pairs(load_table(spark, "documents", sf))
)

# r12 corpus-bounded twin (the shuffle-byte audit measured the pair form's
# sf1 result at 64.5M rows / ~745 MB shuffled — all output): per-doc
# min_by over the band-candidate stream, map-side combined, O(corpus) out.
_register("dedup_simhash_best", _simhash_best_oracle(), late=True)(
    lambda spark, sf: D.simhash_best_match(load_table(spark, "documents", sf))
)


def _simhash_inc_oracle(bits: int = 32, max_hamming: int = 3) -> str:
    """DuckDB twin of operators.dedup.simhash_dedup_with_fingerprints:
    odd-id batch deduped against the even-id corpus's fingerprints."""
    return rf"""{_simhash_keyed_prefix(bits)}, matched AS (
      SELECT DISTINCT n.doc_id AS new_id
      FROM keyed n JOIN keyed c ON n.lo = c.lo
      WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        AND bit_count(xor(n.simhash, c.simhash)) <= {max_hamming}
      UNION
      SELECT DISTINCT n.doc_id
      FROM keyed n JOIN keyed c ON n.hi = c.hi
      WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        AND bit_count(xor(n.simhash, c.simhash)) <= {max_hamming}
    )
    SELECT doc_id, source FROM documents
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT new_id FROM matched)
    """


def _simhash_inc(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, "documents", sf)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    return D.simhash_dedup_against_corpus(new, corpus).select(
        "doc_id", "source"
    )


# r12b: the simhash leg of the incremental-ingest matrix (minhash already
# has near_dedup_with_signatures; ER has assign_components_incremental) —
# batch hashed O(batch), corpus fingerprints reused from a persisted
# build_simhash_table relation, batch side (the small one) replicated by
# the hot-bucket salting.
_register("dedup_simhash_incremental", _simhash_inc_oracle(), late=True)(
    _simhash_inc
)

_register(
    "multimodal_metadata",
    """
    SELECT doc_id AS media_id, 'image' AS modality,
           octet_length(text::BLOB)::INT AS payload_bytes,
           'application/octet-stream' AS mime
    FROM documents
    """,
)(lambda spark, sf: M.media_metadata(
    M.documents_as_media(load_table(spark, "documents", sf))
))

# Multimodal feature extraction runs the REAL decoder stack
# (media_codecs: header probes + PNG/BMP/WAV codecs): document payloads are
# text bytes, so every row takes the honest decoded=false byte-histogram
# branch — deterministic, rows-only checkable. Pixel/sample decode paths are
# pinned by planted-fixture tests (tests/test_multimodal_decode.py).
_register("multimodal_features")(
    lambda spark, sf: M.extract_features(
        M.documents_as_media(load_table(spark, "documents", sf))
    ).select("media_id", "payload_bytes", "decoded", "feature_dim")
)

# Header-probe decode (format/dims/audio params from payload bytes, O(header)
# per row). Python by necessity (byte parsing), hence rows-only: the design
# rule keeps Python out of oracle-checked plans.
_register("multimodal_decode")(
    lambda spark, sf: M.decode_media(
        M.documents_as_media(load_table(spark, "documents", sf))
    )
)

# -- near-dup cluster canonicalization (connected components over LSH pairs) --
# Oracle: transitive closure via recursive CTE over the SAME pair list the
# dedup_minhash_lsh oracle produces — exact component minimum per doc.
_CC_ORACLE = (
    "WITH RECURSIVE pairs AS (\n"
    + _MINHASH_ORACLE
    + """
    ), und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    )
    SELECT a AS doc_id, least(a, min(b))::BIGINT AS rep_id
    FROM reach GROUP BY a
    """
)

_register("dedup_cc_canonical", _CC_ORACLE)(
    lambda spark, sf: D.dedup_clusters(load_table(spark, "documents", sf))
)

# BPE first-merge statistics: top adjacent character pairs within tokens.
# substring is 1-based CHARACTER indexing in both engines; range(1, n) in
# DuckDB ≡ sequence(1, n-1) in Spark (stop-exclusive vs inclusive).
_register(
    "text_bpe_pair_stats",
    r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(text), '\s+')) AS t
      FROM documents
    ), tok2 AS (
      SELECT t FROM tok WHERE length(t) >= 2
    ), pairs AS (
      SELECT substring(t, CAST(i AS INT), 2) AS pair
      FROM (SELECT t, unnest(range(1, length(t))) AS i FROM tok2)
    ), cnt AS (
      SELECT pair, count(*)::BIGINT AS n_occ FROM pairs GROUP BY pair
    )
    SELECT pair, n_occ, rank FROM (
      SELECT pair, n_occ,
             row_number() OVER (ORDER BY n_occ DESC, pair ASC)::INT AS rank
      FROM cnt
    ) WHERE rank <= 20
    """,
    late=True,
)(lambda spark, sf: X.bpe_pair_stats(
    load_table(spark, "documents", sf), k=20
))


# BPE merge TRAINING (first 3 merges) — the iterative tokenizer trainer as
# one declarative plan. Each step's top pair and corpus rewrite are exact
# (integer counts, pair-asc tiebreak, literal non-overlapping replace —
# identical left-to-right semantics in both engines), so the unrolled
# 3-step CTE chain hash-matches.
_BPE_MERGES = 3


def _bpe_merges_oracle() -> str:
    head = r"""
    WITH r0 AS (
      SELECT trim(regexp_replace(t, '(.)', '\1 ', 'g')) AS rep
      FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS t
            FROM documents) q
      WHERE length(t) >= 2
    )"""
    steps = []
    for i in range(1, _BPE_MERGES + 1):
        p = f"r{i - 1}"
        steps.append(f""",
    p{i} AS (
      SELECT s[i] || ' ' || s[i + 1] AS pair
      FROM (SELECT string_split(rep, ' ') AS s,
                   unnest(range(1, len(string_split(rep, ' ')))) AS i
            FROM {p}) q
    ),
    t{i} AS (
      SELECT {i} AS step, pair, count(*)::BIGINT AS n_occ
      FROM p{i} GROUP BY pair
      ORDER BY n_occ DESC, pair ASC LIMIT 1
    )""")
        if i < _BPE_MERGES:
            steps.append(f""",
    r{i} AS (
      SELECT replace(rep, (SELECT pair FROM t{i}),
                     replace((SELECT pair FROM t{i}), ' ', '')) AS rep
      FROM {p}
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT * FROM t{i}" for i in range(1, _BPE_MERGES + 1)
    )
    return head + "".join(steps) + f"\n    SELECT step, pair, n_occ FROM ({union})"


_register(
    "text_bpe_train_merges", _bpe_merges_oracle(), late=True,
)(lambda spark, sf: X.bpe_train_merges(
    load_table(spark, "documents", sf), n_merges=_BPE_MERGES
))


# BPE APPLY with a FIXED merge table (applying any given table is valid
# semantics regardless of what corpus trained it — the registered rules
# are common English merges). Single-char tokens segment to one symbol;
# n_chars excludes whitespace; both counts exact integers.
_BPE_APPLY_MERGES = ["e r", "i n", "t h"]


def _bpe_segment_oracle() -> str:
    rep = "trim(regexp_replace(t, '(.)', '\\1 ', 'g'))"
    for m in _BPE_APPLY_MERGES:
        rep = f"replace({rep}, '{m}', '{m.replace(' ', '')}')"
    return rf"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS t
      FROM documents
    )
    SELECT doc_id,
           sum(len(string_split({rep}, ' ')))::BIGINT AS n_symbols,
           sum(length(t))::BIGINT AS n_chars
    FROM tok WHERE t != ''
    GROUP BY doc_id
    """


_register(
    "text_bpe_segment", _bpe_segment_oracle(), late=True,
)(lambda spark, sf: X.bpe_segment(
    load_table(spark, "documents", sf), _BPE_APPLY_MERGES
))


# ---- corpus curation: domain mixing + repetition quality + packing ----
from apache_flink_essentials_spark.operators import curation as CU  # noqa: E402

_MIX_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25, "src4": 0.1}

_register(
    "curation_stratified_sample",
    CU.stratified_sample_oracle_sql(
        "source", _MIX_RATES, select="doc_id, source, n_chars", default_rate=0.05
    ),
)(lambda spark, sf: CU.stratified_sample(
    load_table(spark, "documents", sf), "source", _MIX_RATES, default_rate=0.05
).select("doc_id", "source", "n_chars"))

_register(
    "text_repetition",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM toks
    ), cnt AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2
    )
    SELECT doc_id,
           max(c)::DOUBLE / sum(c) AS top_bigram_share,
           1.0 - count(*)::DOUBLE / sum(c) AS dup_bigram_fraction
    FROM cnt GROUP BY doc_id
    """,
)(lambda spark, sf: X.repetition_stats(load_table(spark, "documents", sf)))

# Sequence packing: next-fit fold inside hash groups. The reset-on-overflow
# accumulator is a non-associative sequential fold — not a plain window
# function — but it IS pure INTEGER arithmetic, so a recursive CTE that
# advances every hash group one row per iteration replays it bit-exactly
# (iteration count = max rows per group; the md5 group key spreads sf0.01's
# 500 docs ~8 per group). This upgrades the row from rows-only to a full
# hash-matched oracle; pytest still pins the invariants (each doc exactly
# once, pack sums ≤ budget, oversize flagged, deterministic pack ids).
_register(
    "curation_pack_sequences",
    r"""
    WITH RECURSIVE base AS (
      SELECT doc_id,
             len(string_split_regex(lower(text), '\s+'))::BIGINT AS n_tokens,
             ('0x' || substr(md5('g0:' || doc_id::VARCHAR), 1, 8))::BIGINT
               % 64 AS pack_group
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tokens, pack_group,
             row_number() OVER (PARTITION BY pack_group ORDER BY doc_id)
               AS rn
      FROM base
    ), rec AS (
      SELECT pack_group, rn, doc_id, n_tokens,
             0::BIGINT AS pack_local,
             (CASE WHEN n_tokens >= 512 THEN 1 ELSE 0 END)::BIGINT
               AS local_out,
             (CASE WHEN n_tokens >= 512 THEN 0 ELSE n_tokens END)::BIGINT
               AS acc_out
      FROM ranked WHERE rn = 1
      UNION ALL
      SELECT t.pack_group, t.rn, t.doc_id, t.n_tokens,
             r.local_out
               + CASE WHEN r.acc_out > 0 AND r.acc_out + t.n_tokens > 512
                      THEN 1 ELSE 0 END AS pack_local,
             (r.local_out
               + CASE WHEN r.acc_out > 0 AND r.acc_out + t.n_tokens > 512
                      THEN 1 ELSE 0 END)
               + CASE WHEN (CASE WHEN r.acc_out > 0
                                  AND r.acc_out + t.n_tokens > 512
                                 THEN 0 ELSE r.acc_out END) + t.n_tokens
                           >= 512
                      THEN 1 ELSE 0 END AS local_out,
             CASE WHEN (CASE WHEN r.acc_out > 0
                              AND r.acc_out + t.n_tokens > 512
                             THEN 0 ELSE r.acc_out END) + t.n_tokens >= 512
                  THEN 0
                  ELSE (CASE WHEN r.acc_out > 0
                              AND r.acc_out + t.n_tokens > 512
                             THEN 0 ELSE r.acc_out END) + t.n_tokens
             END AS acc_out
      FROM rec r JOIN ranked t
        ON t.pack_group = r.pack_group AND t.rn = r.rn + 1
    )
    SELECT doc_id, n_tokens, pack_group,
           pack_group * 1099511627776 + pack_local AS pack_id,
           n_tokens > 512 AS oversize
    FROM rec
    """,
    late=True,
)(
    lambda spark, sf: CU.pack_sequences(
        X.token_count(load_table(spark, "documents", sf)),
        token_count_col="n_tokens",
        budget=512,
    )
)

# ---- per-key sequential analytics (Window functions over event streams) ----
from pyspark.sql import Window as _Win  # noqa: E402


def _user_deltas(spark: SparkSession, sf: str) -> DataFrame:
    # per-user inter-event gaps via lag() — ONE shuffle on user_id serves
    # both the lag and the per-user aggregate (Catalyst reuses the
    # hash-partitioning of the Window exchange for the groupBy)
    w = _Win.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = _events(spark, sf).select(
        "user_id",
        (_epoch("ts") - F.lag(_epoch("ts")).over(w)).alias("gap_s"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.avg("gap_s").alias("avg_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


_register(
    "events_user_gap_stats",
    """
    WITH gaps AS (
      SELECT user_id,
             floor(epoch(ts))::BIGINT
               - lag(floor(epoch(ts))::BIGINT)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    SELECT user_id, count(gap_s) AS n_gaps,
           avg(gap_s) AS avg_gap_s, max(gap_s) AS max_gap_s
    FROM gaps GROUP BY user_id
    """,
)(_user_deltas)


def _top2_per_user(spark: SparkSession, sf: str) -> DataFrame:
    # top-k per group: rank inside the partition, keep k — the scalable
    # grouped top-k (never a global sort; one exchange on the group key,
    # and Spark pushes a per-partition top-k limit below the rank filter)
    w = _Win.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        _events(spark, sf)
        .select("user_id", "event_id", "value", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 2)
    )


_register(
    "events_top2_per_user",
    """
    SELECT user_id, event_id, value, rnk FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rnk
      FROM events
    ) WHERE rnk <= 2
    """,
)(_top2_per_user)

# ---- incremental dedup: new batch vs existing corpus (anti-join) ----
_register(
    "dedup_incremental",
    r"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(string_split_regex(lower(text), '\s+'), ' ')) AS fingerprint
      FROM documents
    ), corpus AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250
    )
    SELECT f.doc_id, f.source FROM fp f
    WHERE f.doc_id >= 250
      AND f.fingerprint NOT IN (SELECT fingerprint FROM corpus)
    """,
)(lambda spark, sf: D.dedup_against_corpus(
    load_table(spark, "documents", sf).filter(F.col("doc_id") >= 250),
    load_table(spark, "documents", sf).filter(F.col("doc_id") < 250),
).select("doc_id", "source"))

# ---- per-group centroid + outlier score (corpus hygiene) ----
_register(
    "vec_centroid_outliers",
    """
    WITH ex AS (
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
    )
    SELECT e.vec_id, e.label,
           round(
             list_aggregate(list_transform(range(1, 65),
                 i -> e.embedding[i]::DOUBLE * c.centroid[i]), 'sum')
             / (sqrt(list_aggregate(list_transform(range(1, 65),
                 i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, 65),
                 i -> c.centroid[i] * c.centroid[i]), 'sum'))),
           6) AS cosine_to_centroid
    FROM embeddings e JOIN cent c ON e.label = c.label
    """,
)(lambda spark, sf: V.centroid_outliers(load_table(spark, "embeddings", sf)))

# ---- profiling / diagnostics tier ----
from apache_flink_essentials_spark.operators import profiling as P  # noqa: E402

_register(
    "skew_profile_suppkey",
    """
    WITH counts AS (
      SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey
    ), total AS (SELECT sum(cnt) AS total FROM counts),
    top AS (
      SELECT l_suppkey, cnt FROM counts
      ORDER BY cnt DESC, l_suppkey LIMIT 20
    )
    SELECT row_number() OVER (ORDER BY cnt DESC, l_suppkey)::INT AS rnk,
           l_suppkey, cnt,
           cnt::DOUBLE / total AS share,
           (sum(cnt) OVER (ORDER BY cnt DESC, l_suppkey
                           ROWS UNBOUNDED PRECEDING))::DOUBLE / total
             AS cum_share
    FROM top, total
    """,
)(lambda spark, sf: P.key_skew_profile(
    load_table(spark, "lineitem", sf), "l_suppkey", 20))


_register(
    "events_zscore_outliers",
    """
    WITH stats AS (
      SELECT user_id,
             count(*) AS n,
             sum(value::DECIMAL(18,4))::DOUBLE AS s,
             sum(value::DECIMAL(18,4) * value::DECIMAL(18,4))::DOUBLE AS ss
      FROM events GROUP BY user_id
    ), mu AS (
      SELECT user_id, s / n AS mu, sqrt(ss / n - (s / n) ^ 2) AS sigma
      FROM stats
    )
    SELECT e.event_id, e.user_id, e.value,
           (e.value::DOUBLE - mu) / sigma AS z
    FROM events e JOIN mu USING (user_id)
    WHERE abs((e.value::DOUBLE - mu) / sigma) > 2.0
    """,
)(lambda spark, sf: P.zscore_anomalies(load_table(spark, "events", sf)))


_register(
    "profile_documents",
    """
    WITH one AS (
      SELECT count(*) AS n_rows,
        sum((doc_id IS NULL)::BIGINT)::BIGINT  AS nn1, count(DISTINCT doc_id)  AS nd1,
          min(doc_id)::VARCHAR  AS mn1, max(doc_id)::VARCHAR  AS mx1,
        sum((text IS NULL)::BIGINT)::BIGINT    AS nn2, count(DISTINCT text)    AS nd2,
          min(text)             AS mn2, max(text)             AS mx2,
        sum((lang IS NULL)::BIGINT)::BIGINT    AS nn3, count(DISTINCT lang)    AS nd3,
          min(lang)             AS mn3, max(lang)             AS mx3,
        sum((source IS NULL)::BIGINT)::BIGINT  AS nn4, count(DISTINCT source)  AS nd4,
          min(source)           AS mn4, max(source)           AS mx4,
        sum((n_chars IS NULL)::BIGINT)::BIGINT AS nn5, count(DISTINCT n_chars) AS nd5,
          min(n_chars)::VARCHAR AS mn5, max(n_chars)::VARCHAR AS mx5
      FROM documents
    )
    SELECT col_name, n_rows, n_null, n_distinct, min_s, max_s FROM (
      SELECT 'doc_id'  AS col_name, n_rows, nn1 AS n_null, nd1 AS n_distinct, mn1 AS min_s, mx1 AS max_s FROM one
      UNION ALL
      SELECT 'text',    n_rows, nn2, nd2, mn2, mx2 FROM one
      UNION ALL
      SELECT 'lang',    n_rows, nn3, nd3, mn3, mx3 FROM one
      UNION ALL
      SELECT 'source',  n_rows, nn4, nd4, mn4, mx4 FROM one
      UNION ALL
      SELECT 'n_chars', n_rows, nn5, nd5, mn5, mx5 FROM one
    )
    """,
)(lambda spark, sf: P.profile_columns(
    load_table(spark, "documents", sf),
    ["doc_id", "text", "lang", "source", "n_chars"]))


# ---- int8 scalar quantization (embedding storage-scale path) ----
_register(
    "vec_quantize_int8",
    """
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v,
             list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
               AS scale
      FROM embeddings
    ), q AS (
      SELECT vec_id, v, scale,
             CASE WHEN scale = 0
                  THEN list_transform(v, x -> 0.0::DOUBLE)
                  ELSE list_transform(v, x -> greatest(-127.0::DOUBLE,
                         least(127.0::DOUBLE, floor(x / scale + 0.5))))
             END AS qv
      FROM base
    )
    SELECT vec_id, scale,
           list_aggregate(list_transform(qv, x -> x * x), 'sum')::BIGINT
             AS qnorm2,
           list_aggregate(
             list_transform(range(1, len(v) + 1),
                            i -> (v[i] - qv[i] * scale) ^ 2), 'sum')
             / len(v) AS mse
    FROM q
    """,
)(lambda spark, sf: V.quantize_int8_stats(load_table(spark, "embeddings", sf)))

# ---- CDC changelog materialization (lakehouse merge-on-read shape) ----
from apache_flink_essentials_spark.operators import cdc as C  # noqa: E402


def _cdc_latest(spark: SparkSession, sf: str) -> DataFrame:
    # events replayed as a changelog on the user_id key: 'error' events act
    # as deletes, everything else upserts; (ts, event_id) is the total seq
    changes = _events(spark, sf).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return C.apply_changelog(
        changes, ["user_id"], ["ts_s", "event_id"]
    ).select("user_id", "event_id", "ts_s", "value")


_register(
    "cdc_latest_state",
    """
    SELECT user_id, event_id, ts_s, value FROM (
      SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ts_s, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY floor(epoch(ts))::BIGINT DESC,
                                         event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND op != 'D'
    """,
)(_cdc_latest)


# ---- quantized KNN (int8 codes; scales cancel → pure integer scoring) ----
_register(
    "vec_knn_quantized",
    """
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v,
             list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
               AS scale
      FROM embeddings
    ), qv AS (
      SELECT vec_id,
             CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0::DOUBLE)
                  ELSE list_transform(v, x -> greatest(-127.0::DOUBLE,
                         least(127.0::DOUBLE, floor(x / scale + 0.5))))
             END AS q
      FROM base
    ), scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(
               list_aggregate(list_transform(range(1, 65),
                   i -> a.q[i] * b.q[i]), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> a.q[i] * a.q[i]), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> b.q[i] * b.q[i]), 'sum'))),
             6) AS cosine
      FROM (SELECT * FROM qv WHERE vec_id < 10) a, qv b
      WHERE a.vec_id != b.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC)::INT
               AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)(lambda spark, sf: V.knn_cosine_quantized(
    load_table(spark, "embeddings", sf),
    load_table(spark, "embeddings", sf).filter(F.col("vec_id") < 10),
))


# ---- corpus vocabulary stats + tf-idf (ratio-idf, engine-portable) ----
_register(
    "text_term_stats",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM tok WHERE term != '' GROUP BY doc_id, term
    )
    SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf
    FROM tf GROUP BY term HAVING count(*) >= 5
    """,
)(lambda spark, sf: X.term_stats(load_table(spark, "documents", sf), min_df=5))


_register(
    "text_tfidf_top3",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM tok WHERE term != '' GROUP BY doc_id, term
    ), df_t AS (
      SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df_t.df,
             (tf.tf * n.n_docs)::DOUBLE / df_t.df::DOUBLE AS tfidf
      FROM tf JOIN df_t USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
      SELECT *, (row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY tfidf DESC, tf DESC, term ASC))::INT AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)(lambda spark, sf: X.tfidf_top_terms(load_table(spark, "documents", sf), k=3))


# ---- SCD Type-2 versioned dimension history from the same changelog ----
def _cdc_scd2(spark: SparkSession, sf: str) -> DataFrame:
    changes = _events(spark, sf).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return C.scd2_history(changes, ["user_id"], ["ts_s", "event_id"]).select(
        "user_id", "event_id", "valid_from", "valid_to", "version", "is_current"
    )


_register(
    "cdc_scd2_history",
    """
    SELECT user_id, event_id, valid_from, valid_to, version, is_current FROM (
      SELECT user_id, event_id, ts_s AS valid_from,
             lead(ts_s) OVER w AS valid_to,
             (row_number() OVER w)::INT AS version,
             (lead(ts_s) OVER w IS NULL) AS is_current,
             op
      FROM (
        SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ts_s,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM events
      )
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ) WHERE op != 'D'
    """,
)(_cdc_scd2)


# ---- time-series tier: gapfill+LOCF, rows-frame moving aggregates ----
from apache_flink_essentials_spark.operators import timeseries as TS  # noqa: E402


_register(
    "ts_gapfill_locf_hourly",
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
      SELECT user_id, unnest(range(mn, mx + 3600, 3600)) AS bucket FROM bounds
    )
    SELECT g.user_id, g.bucket,
           last_value(o.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM grid g
    LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket
    """,
)(lambda spark, sf: TS.gapfill_locf(
    _events(spark, sf), "user_id", "ts", "value", 3600, seq_cols=["event_id"]
))


def _ts_moving(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf).select(
        "user_id", "event_id", F.col("ts").cast("long").alias("ts_s"), "value"
    )
    return TS.moving_agg(ev, "user_id", "value", ["ts_s", "event_id"], preceding=3)


_register(
    "ts_moving_avg_4rows",
    """
    SELECT user_id, ts_s, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS moving_sum,
           count(*) OVER w AS n_window,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / (count(*) OVER w) AS moving_avg
    FROM (
      SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ts_s, value
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)(_ts_moving)


# ---- session path mining: top click-paths over 30-minute sessions ----
_register(
    "session_paths_top20",
    """
    WITH flagged AS (
      SELECT user_id, event_id, event_type, ts,
             floor(epoch(ts))::BIGINT AS ts_s,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, sum(new_session) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ), paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts_s, event_id) AS path
      FROM numbered GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC LIMIT 20
    """,
)(lambda spark, sf: W.session_paths(
    _events(spark, sf), "user_id", "ts", "event_type"
))


# ---- one-pass equal-width value histogram ----
_register(
    "events_value_histogram",
    """
    SELECT floor(value / 5.0) * 5.0 AS bin_start,
           count(*) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
)(lambda spark, sf: P.value_histogram(_events(spark, sf), "value", 5.0))


# ---- benchmark decontamination: train/bench n-gram overlap ----
_register(
    "dedup_contamination",
    r"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(toks) >= 5
                    THEN list_distinct(list_transform(
                           range(1, len(toks) - 3),
                           i -> array_to_string(toks[i:i+4], ' ')))
                    ELSE [array_to_string(toks, ' ')] END) AS gram
      FROM toks
    ), bgrams AS (
      SELECT DISTINCT gram FROM grams WHERE source IN ('src0', 'src1')
    )
    SELECT t.doc_id,
           count(*) AS n_grams,
           count(b.gram) AS n_contaminated,
           count(b.gram) / count(*) AS contamination
    FROM (SELECT * FROM grams WHERE source NOT IN ('src0', 'src1')) t
    LEFT JOIN bgrams b ON t.gram = b.gram
    GROUP BY t.doc_id
    """,
)(lambda spark, sf: D.ngram_contamination(
    load_table(spark, "documents", sf).filter(
        ~F.col("source").isin("src0", "src1")
    ),
    load_table(spark, "documents", sf).filter(
        F.col("source").isin("src0", "src1")
    ),
    n=5,
))


# ---- training-mixture construction under per-source token budgets ----
def _mixture_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = X.token_count(load_table(spark, "documents", sf))
    return CU.mixture_by_token_budget(
        docs,
        {"src2": 600, "src5": 100_000_000, "src8": 150, "src11": 0},
        seed=0,
        num_buckets=64,
    ).select("doc_id", "source", "n_tokens")


_register(
    "curation_mixture_budget",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split_regex(lower(text), '\s+'))::INT AS n_tokens,
             ('0x' || substr(md5('0:' || doc_id), 1, 8))::BIGINT
               / 4294967296.0 AS h
      FROM documents
      WHERE source IN ('src2', 'src5', 'src8', 'src11')
    ), c AS (
      SELECT *, sum(n_tokens::BIGINT) OVER (
               PARTITION BY source ORDER BY floor(h * 64), h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT doc_id, source, n_tokens FROM c
    WHERE cum <= CASE source WHEN 'src2' THEN 600
                             WHEN 'src5' THEN 100000000
                             WHEN 'src8' THEN 150
                             WHEN 'src11' THEN 0 END
    """,
)(_mixture_q)


