"""Web-link graph: href extraction -> host graph -> host PageRank."""

import pytest
from pyspark.sql import functions as F

from redactify_spark.operators import weblinks as W
from redactify_spark.sources import pages as P


def test_extract_page_links_pure():
    """Absolute hrefs only, in document order; nav/footer boilerplate
    (relative hrefs) skipped."""
    links = ("https://site1.example/aaa", "https://site2.example/bbb")
    html = P.render_html("hello world", "https://me.example/x", links)
    assert W.extract_page_links(html) == list(links)
    assert W.extract_page_links(P.render_html("t", "u")) == []


def test_links_preserve_text_invariant():
    """The outlink section must not disturb the byte-identical
    html->text invariant (BASELINE input_hint)."""
    for i in (0, 7, 63, 999):
        text = P.synth_text(i)
        links = tuple(P.page_url(t) for t in P.link_targets(i))
        assert P.extract_text(
            P.render_html(text, P.page_url(i), links)) == text


def test_link_targets_deterministic_and_distinct():
    """Targets are a pure function of doc_id alone (same html bytes for
    the same id regardless of corpus size/tranche) and distinct."""
    for i in (0, 1, 500, 4095, 9000):
        t = P.link_targets(i)
        assert t == P.link_targets(i)
        assert len(set(t)) == P.LINKS_PER_PAGE
        assert all(0 <= x < P.LINK_SPACE for x in t)


def test_extract_links_matches_arithmetic(spark):
    """The Spark stage parses ACTUAL html; the result must equal the
    arithmetic link model (the q110 oracle premise)."""
    n = 150
    got = sorted((r.src, r.dst)
                 for r in W.extract_links(
                     P.synth_pages(spark, n, partitions=4)).collect())
    want = sorted((P.page_url(i), P.page_url(t))
                  for i in range(n) for t in P.link_targets(i))
    assert got == want


def test_host_graph_weights_and_self_loops(spark):
    df = spark.createDataFrame(
        [("https://a.example/1", "https://b.example/x"),
         ("https://a.example/2", "https://b.example/y"),
         ("https://a.example/3", "https://a.example/zz"),   # self-host
         ("https://b.example/1", "https://c.example:8080/q"),
         ("not a url", "https://c.example/q")],              # bad src
        ["src", "dst"])
    got = {(r.src_host, r.dst_host): r.n_links
           for r in W.host_graph(df).collect()}
    assert got == {("a.example", "b.example"): 2,
                   ("b.example", "c.example:8080"): 1}
    kept = {(r.src_host, r.dst_host): r.n_links
            for r in W.host_graph(df, keep_self_loops=True).collect()}
    assert kept[("a.example", "a.example")] == 1


def _numpy_weighted_pagerank(edges, iterations=5, d=0.85):
    """(src, dst, w) directed weighted PageRank, GraphX convention."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    wsum = {}
    for u, _, w in edges:
        wsum[u] = wsum.get(u, 0.0) + w
    r = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        acc = {n: 0.0 for n in nodes}
        for u, v, w in edges:
            acc[v] += r[u] * w / wsum[u]
        r = {n: (1 - d) + d * acc[n] for n in nodes}
    return r


def test_host_pagerank_matches_reference(spark):
    """Weighted directed PageRank parity vs a pure-Python re-derivation
    (dangling host c holds the base term)."""
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "a", 2), ("b", "c", 2)]
    df = spark.createDataFrame(edges,
                               ["src_host", "dst_host", "n_links"])
    want = _numpy_weighted_pagerank(edges)
    got = {r.host: r.rank for r in W.host_pagerank(df).collect()}
    assert set(got) == set(want)
    for h, v in want.items():
        assert got[h] == pytest.approx(v, abs=1e-12), h


def test_dangling_links_flow_into_host_graph(spark):
    """Link targets beyond the crawled corpus (the web norm) still
    contribute host edges: every extracted dst is a well-formed URL in
    LINK_SPACE, whether or not the target page was crawled."""
    n = 40  # << LINK_SPACE, so most targets are dangling
    links = W.extract_links(P.synth_pages(spark, n, partitions=2))
    bad = links.where(~F.col("dst").rlike(r"^https://site\d+\.example/"))
    assert bad.count() == 0
    hosts = W.host_graph(links)
    assert hosts.count() > 0
    assert hosts.groupBy().sum("n_links").collect()[0][0] <= n * P.LINKS_PER_PAGE


# ---------------------------------------------------------------------------
# redirect-chain resolution (URL canonicalization)
# ---------------------------------------------------------------------------

def _brute_resolve(pairs, limit=100):
    """Step-by-step walker: (final, hops) or (None, None) for loops."""
    m = {}
    for a, b in pairs:
        m[a] = min(b, m[a]) if a in m else b
    out = {}
    for n in sorted({x for p in pairs for x in p}):
        cur, hops = n, 0
        while cur in m and hops < limit:
            cur = m[cur]
            hops += 1
        out[n] = (None, None, True) if cur in m else (cur, hops, False)
    return out


def test_resolve_redirects_chains_and_terminals(spark):
    """Chain 1->2->3->4 (terminal 4) + isolated terminal via dst-only."""
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    got = {r.node: (r.final, r.hops, r.cyclic)
           for r in W.resolve_redirects(df).collect()}
    assert got == {1: (4, 3, False), 2: (4, 2, False),
                   3: (4, 1, False), 4: (4, 0, False)}


def test_resolve_redirects_cycle_and_tail(spark):
    """3-cycle plus a tail feeding it: every involved node is cyclic
    with NULL final/hops; the untouched chain still resolves."""
    df = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 10), (9, 10), (1, 2)], ["src", "dst"])
    got = {r.node: (r.final, r.hops, r.cyclic)
           for r in W.resolve_redirects(df).collect()}
    for n in (9, 10, 11, 12):
        assert got[n] == (None, None, True), n
    assert got[1] == (2, 1, False) and got[2] == (2, 0, False)


def test_resolve_redirects_self_loop_and_dup_src(spark):
    """Self-redirect is a 1-cycle; duplicate srcs collapse to min dst."""
    df = spark.createDataFrame([(5, 5), (1, 3), (1, 2)], ["src", "dst"])
    got = {r.node: (r.final, r.hops, r.cyclic)
           for r in W.resolve_redirects(df).collect()}
    assert got[5] == (None, None, True)
    assert got[1] == (2, 1, False)      # min dst wins
    assert got[2] == (2, 0, False)


def test_resolve_redirects_matches_brute_force_random(spark):
    """Pointer doubling == step-by-step walking on random functional
    graphs (chains, trees into terminals, cycles, tails into cycles)."""
    import random
    rng = random.Random(31)
    for trial in range(3):
        n = 40
        pairs = [(i, rng.randrange(n))
                 for i in range(n) if rng.random() < 0.8]
        got = {r.node: (r.final, r.hops, r.cyclic)
               for r in W.resolve_redirects(
                   spark.createDataFrame(pairs, "src long, dst long"))
               .collect()}
        assert got == _brute_resolve(pairs), trial


def test_resolve_redirects_long_chain_log_rounds(spark):
    """A length-500 chain resolves within the default doubling budget
    (2^16 >> 500) with exact hop counts."""
    pairs = [(i, i + 1) for i in range(500)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.node: (r.final, r.hops)
           for r in W.resolve_redirects(df).collect()}
    assert got[0] == (500, 500)
    assert got[250] == (500, 250)
    assert got[500] == (500, 0)


# ---------------------------------------------------------------------------
# anchor-text alias aggregation
# ---------------------------------------------------------------------------

def test_extract_page_anchors_pairs_and_boilerplate():
    """Absolute hrefs pair with their anchor text; relative nav links
    are skipped; the article body cannot inject anchors (escaped)."""
    html = P.render_html('see <a href="https://evil.example/x">inject</a>',
                         "https://me.example/p",
                         ("https://a.example/1", "https://b.example/2"),
                         ("Acme Corp", "see docs"))
    got = W.extract_page_anchors(html)
    assert got == [("https://a.example/1", "Acme Corp"),
                   ("https://b.example/2", "see docs")]


def test_extract_anchors_matches_link_extraction(spark):
    """Anchor extraction sees exactly the same (src, dst) edges as
    extract_links on the same pages."""
    pages = P.synth_pages(spark, 50, partitions=4)
    links = {(r.src, r.dst) for r in W.extract_links(pages).collect()}
    anchors = W.extract_anchors(pages).collect()
    assert {(r.src, r.dst) for r in anchors} == links
    assert all(r.anchor for r in anchors)


def test_anchor_text_aliases_topk_and_ties(spark):
    df = spark.createDataFrame(
        [("s1", "d", "Acme"), ("s2", "d", "Acme"), ("s3", "d", "ACME Inc"),
         ("s4", "d", "Acme"), ("s5", "d", "zcorp"), ("s6", "d", "azcorp"),
         ("s7", "e", ""), ("s8", "e", "only")],
        "src string, dst string, anchor string")
    got = [(r.dst, r.anchor, r.n_refs, r.rank)
           for r in W.anchor_text_aliases(df, k=2)
           .orderBy("dst", "rank").collect()]
    # count desc, then lexicographic tiebreak; empty anchors dropped
    assert got == [("d", "Acme", 3, 1), ("d", "ACME Inc", 1, 2),
                   ("e", "only", 1, 1)]


def test_anchor_aliases_name_targets_consistently(spark):
    """Every alias row's anchor embeds the target doc id from the
    deterministic template model."""
    pages = P.synth_pages(spark, 200, partitions=4)
    rows = W.anchor_text_aliases(W.extract_anchors(pages), k=3).collect()
    assert rows
    for r in rows:
        tid = r.anchor.split()[-1]
        assert P.page_url(int(tid)) == r.dst


def test_resolve_redirects_fixed_budget_no_early_exit(spark):
    """early_exit=False (sized fixed budget, no per-round count jobs)
    gives identical verdicts: 2^5 = 32 >= the longest chain here."""
    pairs = [(i, i + 1) for i in range(20)] + [(50, 51), (51, 50)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    a = {r.node: (r.final, r.hops, r.cyclic)
         for r in W.resolve_redirects(df).collect()}
    b = {r.node: (r.final, r.hops, r.cyclic)
         for r in W.resolve_redirects(df, max_doubling=5,
                                      early_exit=False).collect()}
    assert a == b


def test_extract_page_anchors_tolerates_attributes():
    """Real-web anchors carry attributes after href (rel/target/class);
    the anchor pairing must survive them."""
    html = (b'<html><body>'
            b'<a href="https://a.example/1" rel="nofollow">Acme</a>'
            b'<a href="https://b.example/2" target="_blank" class="x">B</a>'
            b'</body></html>')
    assert W.extract_page_anchors(html) == [
        ("https://a.example/1", "Acme"),
        ("https://b.example/2", "B")]
