"""Batched randomized property tests: many random cases per SINGLE
Spark job (collect once, assert per row) -- fuzz coverage without
per-example Spark latency.  Seeds fixed; failures print the case."""

import random

import pytest
from pyspark.sql import functions as F


def test_chunking_reconstruction_fuzz(spark):
    """For random texts and any token count, chunks minus overlaps
    reproduce the token stream and never exceed the window."""
    from redactify_spark.operators.curation import chunk_documents
    rng = random.Random(31)
    texts = {}
    for i in range(60):
        n = rng.choice([0, 1, 2, 7, 31, 32, 33, 63, 64, 65,
                        rng.randint(0, 300)])
        texts[i] = " ".join(f"w{rng.randint(0, 9)}_{j}" for j in range(n))
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=32, overlap=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in texts.items():
        want = text.split()
        got_rows = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if not want:
            assert not got_rows, i
            continue
        rebuilt = got_rows[0].chunk_text.split()
        for r in got_rows[1:]:
            rebuilt += r.chunk_text.split()[8:]
        assert rebuilt == want, i
        assert all(r.n_chunk_tokens <= 32 for r in got_rows), i


def test_canonical_url_idempotence_fuzz(spark):
    from redactify_spark.operators.urls import with_canonical_url
    rng = random.Random(47)
    hosts = ["Example.COM", "a.b.ORG", "X-Y.net:8080",
             "site.io:443", "w.co:80"]
    paths = ["", "/", "/A/b/", "/x", "/p/q/r/"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=x&z=9",
               "?gclid=1&ref=z", "?a=1&a=0"]
    frags = ["", "#f", "#x/y"]
    urls = []
    for _ in range(120):
        scheme = rng.choice(["http", "HTTPS", "ftp"])
        urls.append(scheme + "://" + rng.choice(hosts) + rng.choice(paths)
                    + rng.choice(queries) + rng.choice(frags))
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    once = {r.i: r.canonical_url
            for r in with_canonical_url(df).collect()}
    df2 = spark.createDataFrame([(i, u) for i, u in once.items()],
                                "i long, url string")
    twice = {r.i: r.canonical_url
             for r in with_canonical_url(df2).collect()}
    assert once == twice


def test_sessionize_matches_pure_python_fuzz(spark):
    import datetime as dt

    from redactify_spark.operators import temporal as TP
    rng = random.Random(53)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(8):
        t = 0
        for _ in range(rng.randint(0, 40)):
            t += rng.choice([1, 60, 1799, 1800, 1801, 7200])  # seconds
            rows.append((eid, user, base + dt.timedelta(seconds=t)))
            eid += 1
    ev = spark.createDataFrame(rows,
                               "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.session_idx
           for r in TP.sessionize(ev, gap_minutes=30.0).collect()}

    # pure-python reference: new session when gap > 30 min
    per_user = {}
    for eid_, user, ts in rows:
        per_user.setdefault(user, []).append((ts, eid_))
    want = {}
    for user, evs in per_user.items():
        evs.sort()
        idx, prev = 0, None
        for ts, eid_ in evs:
            if prev is not None and (ts - prev).total_seconds() > 1800:
                idx += 1
            want[eid_] = idx
            prev = ts
    assert got == want
