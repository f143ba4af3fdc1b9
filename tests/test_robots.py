"""robots.txt parsing + longest-prefix crawl permission (RFC 9309
decision rule, prefix subset)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redactify_spark.operators import robots as RB

_ROBOTS = """# policy
User-agent: *
Disallow: /private
Allow: /private/pub
Disallow:
Disallow: /cgi/*.cgi
Allow: /exact$

User-agent: SpecialBot
Disallow: /
"""


def _rules(spark, body=_ROBOTS, host="h.example"):
    df = spark.createDataFrame([(host, body)],
                               "host string, robots_txt string")
    return RB.parse_robots(df)


def test_parse_groups_comments_and_wildcard_subset(spark):
    got = {(r.agent, r.rule, r.path_prefix)
           for r in _rules(spark).collect()}
    assert got == {
        ("*", "disallow", "/private"),
        ("*", "allow", "/private/pub"),
        ("*", "disallow", "/cgi/"),      # literal prefix up to first '*'
        ("*", "allow", "/exact"),        # trailing '$' dropped
        ("specialbot", "disallow", "/"),
    }
    # empty Disallow: (allow-all idiom) was discarded


def test_parse_case_and_crlf(spark):
    body = "USER-AGENT: Bot\r\nDISALLOW: /A # inline comment\r\n"
    got = [(r.agent, r.rule, r.path_prefix)
           for r in _rules(spark, body).collect()]
    assert got == [("bot", "disallow", "/A")]


def _decide(spark, urls, agent="*", body=_ROBOTS, **kw):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    out = RB.crawl_permission(u, _rules(spark, body), agent=agent, **kw)
    return {r.url: r.allowed for r in out.collect()}


def test_longest_match_and_allow_tie(spark):
    got = _decide(spark, [
        "https://h.example/private/secret",      # /private disallow
        "https://h.example/private/pub/doc",     # longer allow wins
        "https://h.example/open",                # no match -> allowed
        "https://h.example/",                    # no match -> allowed
        "https://h.example",                     # empty path -> '/'
        "https://other.example/private/x",       # host w/o robots
    ])
    assert got == {
        "https://h.example/private/secret": False,
        "https://h.example/private/pub/doc": True,
        "https://h.example/open": True,
        "https://h.example/": True,
        "https://h.example": True,
        "https://other.example/private/x": True,
    }


def test_allow_wins_exact_length_tie(spark):
    body = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    got = _decide(spark, ["https://h.example/dir/x"], body=body)
    assert got == {"https://h.example/dir/x": True}


def test_specific_agent_group_is_exclusive(spark):
    """A host with a SpecialBot group serves SpecialBot ONLY those
    rules -- the '*' group's Allow does not rescue it."""
    got = _decide(spark, ["https://h.example/private/pub/doc",
                          "https://h.example/open"],
                  agent="SpecialBot")
    assert got == {"https://h.example/private/pub/doc": False,
                   "https://h.example/open": False}


def test_broadcast_off_parity(spark):
    urls = [f"https://h.example/private/pub/d{i}" for i in range(20)] + \
           [f"https://h.example/private/s{i}" for i in range(20)]
    a = _decide(spark, urls)
    b = _decide(spark, urls, broadcast_rules=False)
    assert a == b


def test_urls_side_has_no_exchange(spark):
    """The 10^12-row side must not shuffle: the ONLY hash exchange in
    the whole plan is the hosts-sized rule aggregation feeding the
    broadcast; the per-url decision is a per-row fold."""
    import contextlib
    import io
    u = spark.range(1000).select(
        F.concat(F.lit("https://h.example/p"),
                 F.col("id").cast("string")).alias("url"))
    df = RB.crawl_permission(u, _rules(spark))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # tree section: the streamed (urls) subtree prints between the top
    # join and its BroadcastExchange child -- it must hold no Exchange
    # (the rules side may shuffle freely: it is hosts-sized)
    streamed = plan.split("BroadcastHashJoin")[1].split(
        "BroadcastExchange")[0]
    assert "Exchange" not in streamed


# ---------------------------------------------------------------------------
# sitemap discovery + parsing
# ---------------------------------------------------------------------------

def test_sitemap_urls_discovery(spark):
    body = ("User-agent: *\nDisallow: /x\n"
            "Sitemap: https://h.example/s1.xml\n"
            "SITEMAP:   https://h.example/s2.xml\n"   # case + spaces
            "# Sitemap: https://h.example/commented.xml\n")
    df = spark.createDataFrame([("h.example", body)],
                               "host string, robots_txt string")
    got = {(r.host, r.sitemap_url) for r in RB.sitemap_urls(df).collect()}
    assert got == {("h.example", "https://h.example/s1.xml"),
                   ("h.example", "https://h.example/s2.xml")}


def test_parse_sitemap_entries(spark):
    xml = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://h.example/a </loc>
       <lastmod> 2025-02-03 </lastmod></url>
  <url>
    <loc>https://h.example/b</loc>
  </url>
  <url><lastmod>2025-01-01</lastmod></url>
</urlset>"""
    df = spark.createDataFrame([("h.example", xml)],
                               "host string, sitemap_xml string")
    got = sorted((r.host, r.url, r.lastmod)
                 for r in RB.parse_sitemap(df).collect())
    # loc/lastmod trimmed; entry without loc dropped; missing lastmod
    # -> NULL
    assert got == [("h.example", "https://h.example/a", "2025-02-03"),
                   ("h.example", "https://h.example/b", None)]


def test_parse_sitemap_multiline_blocks_do_not_bleed(spark):
    """(?s) block matching is non-greedy: adjacent <url> entries never
    merge."""
    xml = ("<urlset>" +
           "".join(f"<url><loc>https://h.example/p{i}</loc></url>\n"
                   for i in range(50)) + "</urlset>")
    df = spark.createDataFrame([("h.example", xml)],
                               "host string, sitemap_xml string")
    assert RB.parse_sitemap(df).count() == 50


def test_crawl_delays_groups_and_validation(spark):
    body = ("User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"
            "Crawl-delay: 4\n"                 # same group: max wins
            "User-agent: FastBot\nCRAWL-DELAY: 0.5\n"
            "User-agent: BadBot\nCrawl-delay: soon\n")  # non-numeric
    df = spark.createDataFrame([("h.example", body)],
                               "host string, robots_txt string")
    got = {(r.host, r.agent, r.delay_sec)
           for r in RB.crawl_delays(df).collect()}
    assert got == {("h.example", "*", 10.0),
                   ("h.example", "fastbot", 0.5)}
