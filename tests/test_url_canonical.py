"""canonical_url / dedup_url_canonical (operators/text.py).

The conformance entry replays the whole function in DuckDB; these pin
each canonicalization rule on handwritten URLs, including the shapes
the synthesized fixture never emits (non-default ports, mixed tracking
and real params, bare hosts, empty queries after filtering).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _canon(spark, urls):
    from easydb_server_spark.operators.text import canonical_url

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i INT, url STRING")
    rows = df.select("i", canonical_url("url").alias("c")).orderBy("i").collect()
    return [r["c"] for r in rows]


def test_scheme_host_case_and_www(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM/Path/To/Page",
            "https://example.com/Path/To/Page",
        ],
    )
    # host lowercases and www strips; PATH CASE IS PRESERVED
    assert got[0] == "https://example.com/Path/To/Page"
    assert got[0] == got[1]


def test_default_port_strips_other_ports_stay(spark):
    got = _canon(
        spark,
        [
            "https://example.com:443/a",
            "http://example.com:80/a",
            "https://example.com:8443/a",
            "http://example.com:443/a",  # 443 is NOT http's default
        ],
    )
    assert got[0] == "https://example.com/a"
    assert got[1] == "http://example.com/a"
    assert got[2] == "https://example.com:8443/a"
    assert got[3] == "http://example.com:443/a"


def test_fragment_drops_and_trailing_slashes_strip(spark):
    got = _canon(
        spark,
        [
            "https://example.com/a/b/#section",
            "https://example.com/a/b",
            "https://example.com/",
            "https://example.com",
        ],
    )
    assert got[0] == got[1] == "https://example.com/a/b"
    assert got[2] == got[3] == "https://example.com"


def test_tracking_params_drop_and_rest_sort(spark):
    got = _canon(
        spark,
        [
            "https://example.com/a?utm_source=x&b=2&a=1&fbclid=123",
            "https://example.com/a?a=1&b=2",
            "https://example.com/a?UTM_Source=x&gclid=9&ref=tw",
            "https://example.com/a?&&",
        ],
    )
    assert got[0] == "https://example.com/a?a=1&b=2"
    assert got[0] == got[1]
    # all params filtered (tracking-key match is case-insensitive)
    assert got[2] == "https://example.com/a"
    assert got[3] == "https://example.com/a"


def test_dedup_keeps_best_quality_then_smallest_id(spark):
    from easydb_server_spark.operators.text import dedup_url_canonical

    df = spark.createDataFrame(
        [
            (1, "https://example.com/a", 10),
            (2, "HTTPS://WWW.EXAMPLE.COM/a/", 30),
            (3, "https://example.com:443/a?utm_source=z", 30),
            (4, "https://other.com/b", 5),
        ],
        "doc_id BIGINT, url STRING, n_chars BIGINT",
    )
    out = {
        r["canonical_url"]: (r["keep_id"], r["keep_quality"], r["n_variants"])
        for r in dedup_url_canonical(df, "url", "doc_id", "n_chars").collect()
    }
    assert out["https://example.com/a"] == (2, 30, 3)  # quality tie -> doc 2 < doc 3
    assert out["https://other.com/b"] == (4, 5, 1)


def test_plan_is_single_aggregate_no_window(spark):
    """The keeper argmax must ride the hash aggregate (min(struct)),
    never a corpus-wide window — one exchange total."""
    from easydb_server_spark.operators.text import dedup_url_canonical

    df = spark.createDataFrame(
        [(1, "https://example.com/a", 10)], "doc_id BIGINT, url STRING, n_chars BIGINT"
    )
    plan = dedup_url_canonical(df, "url", "doc_id", "n_chars")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1


def test_illformed_urls_are_deterministic_not_fatal(spark):
    """Garbage inputs must not throw and must be a pure function of the
    input (the oracle REPLAYS the same regexps, so any Java-vs-RE2
    divergence on degenerate shapes would show up as a conformance
    flake — pin the behavior here instead): schemeless strings parse
    to an empty scheme/host and survive."""
    got = _canon(
        spark,
        [
            "not a url at all",
            "",
            "ftp://weird.example.com:21/a",
            "https://:443/",          # empty host
            "https://example.com?#",  # empty query and fragment
        ],
    )
    # schemeless: every component regexp fails -> empty canonical
    assert got[0] == "://"
    assert got[1] == "://"
    # non-http scheme passes through; :21 is not a default port
    assert got[2] == "ftp://weird.example.com:21/a"
    # degenerate but deterministic: ':443' is all port, no host, and
    # 443 is https' default, so both strip
    assert got[3] == "https://"
    assert got[4] == "https://example.com"
