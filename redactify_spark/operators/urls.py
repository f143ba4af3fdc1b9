"""URL canonicalization + recrawl dedup for Common-Crawl-style pages.

A crawl sees the same logical page under many spellings (case-variant
hosts, tracking params, fragments, default ports, trailing slashes) and
under many snapshots (recrawls).  Canonicalizing BEFORE detection
removes that multiplier from every downstream stage -- at 10^12 pages
the cheapest mention is the one never extracted twice.

Everything here is native column expressions (regexp over the
RE2-and-Java-compatible subset, list filter/sort/join), so the
canonicalization is whole-stage-codegen'd, usable in partition pruning,
and DuckDB-oracle-checkable (q66).

Canonical form:
- scheme and host lowercased (path/query case preserved -- significant)
- default ports stripped (:80 for http, :443 for https)
- fragment dropped
- tracking params dropped (utm_*, gclid, fbclid, ref), remaining params
  sorted (param ORDER is almost never significant; sorting merges
  a=1&b=2 with b=2&a=1)
- trailing slash stripped from non-root paths; empty path -> '/'
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TRACKING = r"^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$"


def canonical_url_expr(url: Column) -> Column:
    """Self-contained native canonical-URL expression (module docstring
    has the rules).  Non-URL strings (no scheme) canonicalize to
    '://'-prefixed junk rather than erroring -- filter upstream."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://",
                                      1))
    hostport = F.lower(F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.when(scheme == "http",
                  F.regexp_replace(hostport, r":80$", "")) \
            .when(scheme == "https",
                  F.regexp_replace(hostport, r":443$", "")) \
            .otherwise(hostport)
    rawpath = F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.when(rawpath == "", F.lit("/")) \
            .when(F.length(rawpath) > 1,
                  F.regexp_replace(rawpath, r"/$", "")) \
            .otherwise(rawpath)
    # The query starts at the FIRST '?' that precedes any fragment:
    # [^#?]* stops at either delimiter, so a '?' inside the fragment
    # ('/p#sec?x=1') cannot resurrect a query, and a '?' inside the
    # query ('?redirect=http://o.com/x?y=1') stays part of it.
    query = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING)))
    qs = F.when(F.size(params) > 0,
                F.concat(F.lit("?"), F.array_join(params, "&"))) \
          .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qs)


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    """Add the canonical-URL column."""
    return df.withColumn(out_col, canonical_url_expr(F.col(url_col)))


def dedup_pages_by_url(pages: DataFrame, url_col: str = "url",
                       ts_col: str = "warc_ts") -> DataFrame:
    """Recrawl dedup: keep the NEWEST snapshot per canonical URL
    (deterministic tiebreak on the raw url string).  One shuffle keyed
    by canonical url; at 10^12 pages this is the single highest-leverage
    volume reducer before detection."""
    withc = with_canonical_url(pages, url_col)
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(ts_col).desc(), F.col(url_col))
    return (withc.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
