"""robots.txt politeness filtering: parse + longest-prefix permission
matching, fully native (oracle-checkable, whole-stage codegen).

A Common-Crawl-scale pipeline must answer "may agent X fetch url U?"
for ~10^12 (url, agent) pairs against ~10^8 small per-host rule files.
Everything here is native column expressions so the decision join
stays JVM-side:

- `parse_robots` turns raw robots.txt bodies into a flat
  (host, agent, rule, path_prefix, line_no) table.  The only stateful
  part of the format -- rules belong to the most recent User-agent
  line(s) above them -- is a per-host `last(...) ignorenulls` window
  ordered by line position; robots files are tiny (Google caps parsing
  at 500 KiB), so the per-host window is bounded.
- `crawl_permission` joins urls to their host's rule group and applies
  the REP decision rule (RFC 9309 / Google): most specific (longest)
  matching prefix wins; on a tie, Allow wins; no matching rule means
  allowed; a host with no robots entry is allowed.  Agent resolution
  is two-tier: a host that has a group for `agent` uses ONLY those
  rules, else its `*` group.

Scope (documented subset): path rules are treated as PLAIN PREFIXES --
the `*` / `$` wildcard extension is not implemented (rules containing
`*` are kept as literal prefixes up to the first `*`; a trailing `$`
is dropped).  Empty `Disallow:` (allow-all idiom) is discarded at
parse time, matching the spec's "empty pattern matches nothing".

Scale shape: rules tables are hosts-sized (tiny next to urls) --
`crawl_permission` broadcasts them by default, so the urls table is
never shuffled at all; pass broadcast_rules=False for a giant rules
table to fall back to a host-keyed shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from redactify_spark.operators.weblinks import host_expr

#: directive line: "name: value" with optional comment tail
_DIRECTIVE = r"^\s*([A-Za-z-]+)\s*:\s*([^#]*?)\s*(?:#.*)?$"


def _tagged_directives(robots: DataFrame, host_col: str,
                       body_col: str) -> DataFrame:
    """(host, line_no, _name, _value, agent): every directive line
    tagged with its user-agent group (most recent User-agent line
    above; consecutive User-agent headers keep the LAST one -- the
    documented simplification, multi-agent headers are rare and the
    `*` group almost always exists alongside)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n"))
        .alias("line_no", "line"))
    parsed = lines.select(
        "host", "line_no",
        F.lower(F.regexp_extract("line", _DIRECTIVE, 1)).alias("_name"),
        F.regexp_extract("line", _DIRECTIVE, 2).alias("_value"))
    w = (Window.partitionBy("host").orderBy("line_no")
         .rowsBetween(Window.unboundedPreceding, 0))
    return parsed.withColumn(
        "agent",
        F.last(F.when(parsed["_name"] == "user-agent",
                      F.lower(F.col("_value"))), ignorenulls=True).over(w))


def parse_robots(robots: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, agent, rule, path_prefix, line_no): one row per
    Allow/Disallow directive, tagged with its user-agent group (see
    _tagged_directives)."""
    tagged = _tagged_directives(robots, host_col, body_col)
    rules = (tagged
             .where(F.col("_name").isin("allow", "disallow") &
                    F.col("agent").isNotNull() & (F.col("_value") != ""))
             .select("host", "agent",
                     F.col("_name").alias("rule"),
                     # wildcard subset: literal prefix up to the first
                     # '*'; trailing '$' dropped
                     F.regexp_replace(
                         F.regexp_extract("_value", r"^([^*]*)", 1),
                         r"\$$", "").alias("path_prefix"),
                     "line_no"))
    return rules.where(F.col("path_prefix") != "")


def crawl_permission(urls: DataFrame, rules: DataFrame,
                     agent: str = "*", url_col: str = "url",
                     broadcast_rules: bool = True) -> DataFrame:
    """Input urls + parsed rules -> input columns + `allowed` boolean
    for `agent` (RFC 9309 decision rule; see module docstring).

    The urls side is NEVER shuffled: rules collapse to one array-valued
    row per host (hosts-sized, broadcast by default) and the
    longest-match decision is a per-row higher-order fold over that
    array -- zero exchanges on the 10^12-row side, one tiny shuffle on
    the rules side."""
    a = agent.lower()
    r = rules.where(F.col("agent").isin(a, "*"))
    # agent-tier resolution: hosts with a specific group use ONLY it
    specific_hosts = (r.where(F.col("agent") == a)
                      .select("host").distinct()
                      .withColumn("_has_specific", F.lit(True)))
    r = (r.join(specific_hosts, "host", "left")
         .where((F.col("agent") == a) |
                F.col("_has_specific").isNull()))
    # one row per host: its rules as an array of (prefix, is_allow) --
    # hosts-sized, broadcastable; the per-url decision is then a pure
    # per-row fold (longest matching prefix; tie -> allow), so the urls
    # table is NEVER shuffled
    per_host = (r.groupBy("host").agg(
        F.collect_list(F.struct(
            F.col("path_prefix").alias("p"),
            (F.col("rule") == "allow").alias("al"))).alias("_rules")))
    if broadcast_rules:
        per_host = F.broadcast(per_host)

    u = urls.withColumn("_host", host_expr(F.col(url_col))) \
            .withColumn("_path",
                        F.coalesce(
                            F.nullif(F.regexp_extract(
                                F.col(url_col),
                                r"^https?://[^/]+(/[^#]*)", 1), F.lit("")),
                            F.lit("/")))
    j = u.join(per_host, u["_host"] == per_host["host"], "left")
    # fold: carry (best score, verdict); score = 2*len + allow-bit so a
    # longer prefix always beats a shorter one and Allow wins length
    # ties (RFC 9309); initial verdict TRUE covers both no-match and
    # no-robots-entry
    path = F.col("_path")
    decision = F.aggregate(
        F.coalesce(F.col("_rules"),
                   F.array().cast("array<struct<p:string,al:boolean>>")),
        F.struct(F.lit(-1).cast("long").alias("score"),
                 F.lit(True).alias("verdict")),
        lambda acc, x: F.when(
            path.startswith(x["p"]) &
            ((F.length(x["p"]) * 2 +
              F.when(x["al"], 1).otherwise(0)) > acc["score"]),
            F.struct((F.length(x["p"]) * 2 +
                      F.when(x["al"], 1).otherwise(0)).alias("score"),
                     x["al"].alias("verdict"))).otherwise(acc),
        lambda acc: acc["verdict"])
    return (j.withColumn("allowed", decision)
            .drop("host", "_rules", "_host", "_path"))


# ---------------------------------------------------------------------------
# sitemap discovery + parsing
# ---------------------------------------------------------------------------

def sitemap_urls(robots: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url): `Sitemap:` directives.  Agent-independent
    per the spec (they sit outside user-agent groups), so this is a
    stateless line scan -- no group window needed."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), r"\r?\n")).alias("line"))
    return (lines
            .select("host",
                    F.regexp_extract(
                        "line", r"(?i)^\s*sitemap\s*:\s*(\S+)", 1)
                    .alias("sitemap_url"))
            .where(F.col("sitemap_url") != ""))


def parse_sitemap(sitemaps: DataFrame, host_col: str = "host",
                  xml_col: str = "sitemap_xml") -> DataFrame:
    """(host, url, lastmod): one row per <url> entry of a sitemap XML
    body.  Native regexp over the (?s)-dotall <url> blocks -- the
    10^8-sitemap fetch table parses inside one whole-stage-codegen'd
    scan, no XML library, no Python.  `lastmod` is NULL when the entry
    has none; entries without <loc> are dropped.

    Scope: urlset sitemaps (the leaf format).  A <sitemapindex> file
    nests further sitemap urls -- feed those back through this parser's
    sibling scan; recursion depth in the wild is 1."""
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(F.regexp_extract_all(
            F.col(xml_col), F.lit(r"(?s)<url>(.*?)</url>"), 1))
        .alias("_b"))
    return (blocks
            .select("host",
                    F.regexp_extract("_b", r"<loc>\s*([^<\s][^<]*?)\s*</loc>",
                                     1).alias("url"),
                    F.nullif(
                        F.regexp_extract(
                            "_b", r"<lastmod>\s*([^<]*?)\s*</lastmod>", 1),
                        F.lit("")).alias("lastmod"))
            .where(F.col("url") != ""))


def crawl_delays(robots: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, agent, delay_sec): Crawl-delay directives per user-agent
    group -- the input to per-host fetch budgets (a host's budget =
    3600/delay pages/hour for the planning agent's group).  Non-numeric
    values are dropped; duplicate directives in one group keep the
    LARGEST delay (the conservative read).  Same two-tier agent
    resolution as crawl_permission applies downstream: prefer the
    specific group's row, else '*'."""
    tagged = _tagged_directives(robots, host_col, body_col)
    return (tagged
            .where((F.col("_name") == "crawl-delay") &
                   F.col("agent").isNotNull() &
                   F.col("_value").rlike(r"^\d+(\.\d+)?$"))
            .groupBy("host", "agent")
            .agg(F.max(F.col("_value").cast("double"))
                 .alias("delay_sec")))
