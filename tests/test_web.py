"""URL canonicalization: each rule pinned on a hand-checkable case."""

from apache_flink_essentials_spark.operators import web as WB


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "page_id long, url string"
    )
    return [
        r.c for r in df.select(
            WB.normalize_url_expr("url").alias("c")
        ).orderBy("page_id").collect()
    ]


def test_url_rules(spark):
    got = _canon(spark, [
        "https://Example.COM/Path#frag",          # case + fragment
        "http://example.com:80/a",                # default http port
        "https://example.com:443/a",              # default https port
        "https://other.org:8080/a",               # non-default port kept
        "https://example.com/a?utm_source=x&id=1",  # tracking param dropped
        "https://example.com/a?utm_a=1&utm_b=2",  # all params tracking
        "https://example.com/list/",              # trailing slash
        "http://example.com/CaseSensitive",       # path case preserved
    ])
    assert got == [
        "https://example.com/Path",
        "http://example.com/a",
        "https://example.com/a",
        "https://other.org:8080/a",
        "https://example.com/a?id=1",
        "https://example.com/a",
        "https://example.com/list",
        "http://example.com/CaseSensitive",
    ]


def test_canonical_url_dedup_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "https://A.com/x?utm_c=1"),
            (2, "https://a.com/x"),
            (3, "https://a.com/y"),
        ],
        "page_id long, url string",
    )
    out = {r.canonical_url: (r.keep_id, r.n_dups)
           for r in WB.canonical_url_dedup(df).collect()}
    assert out == {
        "https://a.com/x": (1, 2),
        "https://a.com/y": (3, 1),
    }
