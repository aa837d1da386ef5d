"""Web-corpus curation: URL canonicalization and canonical-URL dedup —
the first dedup pass of any crawl-derived training pipeline (Common-Crawl
style: the same page is fetched under utm-tagged, fragment-bearing,
default-port, trailing-slash spellings; canonicalize THEN fingerprint).

Pure Column-expression regex pipeline (Java regex JVM-side) — no Python,
no shuffle until the final canonical-URL aggregate, so canonicalization is
a zero-exchange map over the crawl at any scale. Every rule has an exact
RE2 twin in the DuckDB oracle (the patterns use only the common
Java-regex/RE2 subset: no backrefs in the MATCH, only in the replacement).

Rules (applied in order):
  1. strip the fragment (#...)
  2. lowercase the scheme://authority prefix (path/query case preserved)
  3. drop default ports (http :80, https :443)
  4. drop tracking params (utm_*, fbclid, gclid) and re-glue separators
  5. strip one trailing slash (non-root and root alike: host/ == host)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAMS = r"(utm_[^&#=]*|fbclid|gclid)"


def normalize_url_expr(url_col: str = "url") -> Column:
    """Canonical form of a URL column via the 5-rule pipeline above."""
    u = F.col(url_col)
    # 1. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme://authority (group 1), keep the rest verbatim
    prefix = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "")
    u = F.concat(F.lower(prefix), rest)
    # 3. default ports (capture the follower instead of a lookahead — RE2,
    # which the DuckDB oracle uses, has no lookarounds)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    # 4. tracking params, then re-glue ?& / && / trailing separators
    u = F.regexp_replace(u, r"([?&])" + TRACKING_PARAMS + r"=[^&#]*", "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    # 5. one trailing slash
    u = F.regexp_replace(u, r"/$", "")
    return u


def canonical_url_dedup(
    df: DataFrame, id_col: str = "page_id", url_col: str = "url"
) -> DataFrame:
    """Group pages by canonical URL: keep the min-id representative and the
    member count. One hash-agg shuffle on the canonical string (crawl-scale
    note: URLs are short and near-unique, so partial aggregation collapses
    almost everything map-side)."""
    return (
        df.select(normalize_url_expr(url_col).alias("canonical_url"), id_col)
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )
