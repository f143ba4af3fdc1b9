"""URL canonicalization + recrawl dedup."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from redactify_spark.operators import urls as U


def canon(spark, *url_list):
    df = spark.createDataFrame([(u,) for u in url_list], "url string")
    return [r.canonical_url
            for r in U.with_canonical_url(df).collect()]


def test_canonical_rules(spark):
    got = canon(
        spark,
        "HTTPS://Example.COM:443/Path/",
        "http://example.com:80/",
        "https://example.com/a?utm_source=x&b=2&a=1#frag",
        "https://example.com/a?b=2&a=1",
        "https://example.com",
        "https://example.com/a?utm_campaign=y&gclid=123&fbclid=9&ref=z",
        "https://example.com:8443/keep-port",
        "http://example.com:443/non-default-for-http",
    )
    assert got == [
        "https://example.com/Path",          # host lower, path case kept
        "http://example.com/",               # root slash kept
        "https://example.com/a?a=1&b=2",     # tracking+frag gone, sorted
        "https://example.com/a?a=1&b=2",     # merges with the above
        "https://example.com/",              # empty path -> '/'
        "https://example.com/a",             # all-tracking query -> none
        "https://example.com:8443/keep-port",
        "http://example.com:443/non-default-for-http",
    ]


def test_canonical_idempotent(spark):
    urls = ["HTTPS://A.B:443/x/?utm_x=1&z=2&a=3#f",
            "http://host/path", "https://h/?a=1"]
    once = canon(spark, *urls)
    twice = canon(spark, *once)
    assert once == twice


def test_dedup_pages_keeps_newest_snapshot(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        ("https://example.com/a?utm_source=x", t, "old"),
        ("HTTPS://EXAMPLE.com/a", t + dt.timedelta(days=3), "new"),
        ("https://other.com/b", t, "only"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string")
    kept = {r.text for r in U.dedup_pages_by_url(pages).collect()}
    assert kept == {"new", "only"}


def test_fragment_question_mark_is_not_a_query(spark):
    """A '?' inside the fragment must not resurrect a query string
    (ADVICE r2): '/p#sec?x=1' and '/p' are the same resource."""
    df = spark.createDataFrame(
        [("http://ex.com/p#sec?x=1",),
         ("http://ex.com/p",),
         ("http://ex.com/p?a=1#sec?x=2",),
         ("http://ex.com/p?redirect=http://o.com/x?y=1",)], "url string")
    out = [r.canonical_url for r in U.with_canonical_url(df).collect()]
    assert out[0] == "http://ex.com/p"
    assert out[1] == "http://ex.com/p"
    assert out[2] == "http://ex.com/p?a=1"
    # '?' INSIDE the query is part of it (RFC 3986): the query starts at
    # the FIRST '?', not the last
    assert out[3] == "http://ex.com/p?redirect=http://o.com/x?y=1"
