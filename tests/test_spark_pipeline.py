"""Spark pipeline integration: detection stage, triples, P/R vs oracle,
partitioning-invariance."""

import pytest

from redactify_spark.detect import kernel
from redactify_spark.operators.detection import (anonymize_documents,
                                                 detect_mentions)
from redactify_spark.operators.triples import all_triples, contact_triples
from redactify_spark.sources import pages as P

N = 120


@pytest.fixture(scope="module")
def pages_df(spark):
    return P.extract_text_column(P.synth_pages(spark, N, partitions=4)).cache()


@pytest.fixture(scope="module")
def mentions_df(spark, pages_df):
    return detect_mentions(pages_df, id_col="url", text_col="text").cache()


def oracle_triples():
    """Driver-side oracle: run the SAME kernel per synthesized doc."""
    expected = set()
    for i in range(N):
        url, text = P.page_url(i), P.synth_text(i)
        for m in kernel.detect_document(text):
            expected.add((url, f"mentions_{m['entity_group'].lower()}",
                          m["entity_text"]))
    return expected


def test_triple_precision_recall(mentions_df):
    got = {(r.subj, r.pred, r.obj) for r in
           all_triples(mentions_df, id_col="url")
           .where("pred like 'mentions_%'").collect()}
    exp = oracle_triples()
    tp = len(got & exp)
    precision = tp / len(got)
    recall = tp / len(exp)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # with an identical kernel both should in fact be exact:
    assert got == exp


def test_partitioning_invariance(spark, pages_df):
    """Same triple set regardless of partition count (local[8] vs local[32]
    equivalence evidence at the operator level)."""
    m2 = detect_mentions(pages_df.repartition(2), id_col="url",
                         text_col="text")
    m16 = detect_mentions(pages_df.repartition(16), id_col="url",
                          text_col="text")
    s2 = {tuple(r) for r in m2.collect()}
    s16 = {tuple(r) for r in m16.collect()}
    assert s2 == s16


def test_contact_triples_join(mentions_df):
    rows = contact_triples(mentions_df, id_col="url").collect()
    assert rows, "expected entity->contact co-mention edges"
    assert all(r.pred == "has_contact" for r in rows)
    # every page has a PERSON + an EMAIL -> at least one edge per page
    assert len({r.prov_doc for r in rows}) == N


def test_anonymize_documents_stage(spark, pages_df):
    out = anonymize_documents(pages_df.limit(10), id_col="url",
                              text_col="text").collect()
    assert len(out) == 10
    for r in out:
        assert r.n_entities > 0
        assert "@" not in r.anonymized_text or "[EMAIL_ADDRESS-" in r.anonymized_text


def test_unicode_and_null_texts_through_udtf(spark):
    """Non-ASCII text and null/empty rows must flow through the Arrow
    UDTF without error, with character offsets identical to the pure
    kernel (Python str indices, not bytes)."""
    rows = [
        (0, "Müller schreibt an test@beispiel.de über die Rechnung."),
        (1, "日本語テキスト contact admin@example.jp phone 555-123-4567"),
        (2, None),
        (3, ""),
        (4, "héllo wörld no entities"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in detect_mentions(df, id_col="doc_id", text_col="text").collect():
        got.setdefault(r.doc_id, set()).add(
            (r.entity_group, r.start, r.end, r.surface))
    for doc_id, text in rows:
        want = {(m["entity_group"], m["start"], m["end"], m["entity_text"])
                for m in kernel.detect_document(text or "")}
        assert got.get(doc_id, set()) == want, doc_id
    # offsets index the unicode string: the surface slice matches
    for doc_id, text in rows:
        for (_, s, e, surface) in got.get(doc_id, set()):
            assert (text or "")[s:e] == surface


def test_mentions_schema(mentions_df):
    names = [f.name for f in mentions_df.schema.fields]
    assert names == ["url", "entity_group", "start", "end", "score",
                     "detector", "surface", "pseudo_key"]


def test_max_text_len_guard(spark):
    """The operational truncation guard detects only within the prefix;
    default (None) is untouched reference semantics."""
    text = "email early@a.co " + ("filler " * 20) + "email late@z.co"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    full = {r.surface for r in detect_mentions(df).collect()}
    capped = {r.surface for r in
              detect_mentions(df, max_text_len=30).collect()}
    assert "early@a.co" in full and "late@z.co" in full
    assert "early@a.co" in capped and "late@z.co" not in capped


def test_mention_contexts_span_alignment(spark):
    """context[ctx_start:ctx_end] == surface for every mention, and the
    window clamps correctly at text boundaries."""
    from redactify_spark.operators.detection import (detect_mentions,
                                                     mention_contexts)
    rows = [
        (0, "mail me at alice@example.com today"),               # interior
        (1, "bob@site.org starts this document with an email"),  # at start
        (2, "the document ends with carol@host.net"),            # at end
    ]
    pages = spark.createDataFrame(rows, "doc_id long, text string")
    mentions = detect_mentions(pages)
    ctx = mention_contexts(mentions, pages, window_chars=10)
    got = ctx.collect()
    assert got
    texts = dict(rows)
    for r in got:
        assert r.context[r.ctx_start:r.ctx_end] == r.surface, r
        assert r.context in texts[r.doc_id]
        assert len(r.context) <= len(r.surface) + 20
