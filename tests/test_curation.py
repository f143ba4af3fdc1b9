"""Corpus curation operators: deterministic split, dedup+quality prep,
token-budget packing (two-phase global cumsum)."""

import pytest
from pyspark.sql import functions as F

from redactify_spark.operators import curation as CU


def test_split_deterministic_and_proportional(spark):
    docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {(r.doc_id, r.split) for r in
         CU.deterministic_split(docs, holdout_pct=10).collect()}
    b = {(r.doc_id, r.split) for r in
         CU.deterministic_split(docs.repartition(17),
                                holdout_pct=10).collect()}
    assert a == b, "split depends on partitioning"
    n_hold = sum(1 for _, s in a if s == "holdout")
    assert 0.07 < n_hold / 5000 < 0.13   # ~10%, md5-uniform
    # pct=0 -> all train; pct=100 -> all holdout
    assert {r.split for r in
            CU.deterministic_split(docs, 0).select("split")
            .distinct().collect()} == {"train"}


def test_corpus_prep_dedups_and_gates(spark):
    good = "the quick brown fox jumps over the lazy dog " * 5  # quality 1.0
    rows = [(0, good, "s"), (1, good, "s"),        # exact dups: keep 0
            (2, "tiny", "s"),                      # fails length band
            (3, good + "unique tail", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = {r.doc_id for r in CU.corpus_prep(docs, min_quality=0.6).collect()}
    assert kept == {0, 3}


def test_token_budget_pack_matches_naive(spark):
    """Two-phase prefix cumsum == the naive single-window global cumsum
    (computed driver-side), including the band-boundary rows."""
    import random
    rng = random.Random(11)
    rows = [(i, round(rng.choice([0.2, 0.4, 0.6, 0.8, 1.0]), 2),
             rng.randrange(10, 200)) for i in range(500)]
    docs = spark.createDataFrame(
        rows, "doc_id long, quality_score double, n_tokens long")
    budget = 8000
    got = {(r.doc_id, r.cum_tokens) for r in
           CU.token_budget_pack(docs, budget).collect()}
    # naive: global (quality desc, id asc) running sum
    cum, want = 0, set()
    for i, q, t in sorted(rows, key=lambda x: (-x[1], x[0])):
        cum += t
        if cum <= budget:
            want.add((i, cum))
    assert got == want
    assert want  # budget admits some rows
    assert len(want) < len(rows)  # ...but not all


def test_token_budget_pack_plan_no_single_partition_window(spark):
    """The global cumsum must NOT plan a single-partition window: every
    Window node keyed by the data must carry a partition spec."""
    import contextlib
    import io
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5 / 10 + 0.5).alias("quality_score"),
        F.lit(10).alias("n_tokens"))
    packed = CU.token_budget_pack(docs, 400)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        packed.explain("formatted")
    plan = buf.getvalue()
    # the data-sized running sum is a window PARTITIONED by the band
    # (windowspecdefinition(quality_score..., doc_id ...))
    assert any("windowspecdefinition(quality_score" in ln and "doc_id" in ln
               for ln in plan.splitlines()), plan
    # exactly one SinglePartition exchange exists, and it only feeds the
    # tiny distinct-band prefix table -- never the data
    assert plan.count("SinglePartition") == 1, plan


def test_repetition_features(spark):
    from redactify_spark.operators import textstats as X
    rows = [
        (0, "a b c\na b c\nd e f"),          # 1 dup line of 3
        (1, "x y z unique words only here"),
        (2, "w w w w"),                      # 3 dup words of 4
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in X.repetition_features(docs).collect()}
    assert abs(got[0].dup_line_frac - (1 - 2 / 3)) < 1e-6
    assert got[1].dup_word_frac == 0.0
    assert abs(got[2].dup_word_frac - 0.75) < 1e-6
    assert got[3].dup_line_frac == 0.0 and got[3].n_words == 0


def test_gopher_rules(spark):
    from redactify_spark.operators import textstats as X
    long_ok = " ".join(f"word{i%97}xx" for i in range(120))
    rows = [
        (0, long_ok),                          # passes all
        (1, "short text"),                     # fails word count
        (2, " ".join(["same"] * 120)),         # fails repetition
        (3, long_ok + " ###### " * 30),        # fails symbol ratio
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in X.gopher_rules(docs).collect()}
    assert got[0].gopher_pass
    assert not got[1].ok_word_count
    assert not got[2].ok_repetition
    assert not got[3].ok_symbol_ratio


def test_stratified_sample_deterministic_and_ratelike(spark):
    from redactify_spark.operators.curation import stratified_sample
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = {r.doc_id for r in stratified_sample(
        docs, "lang", {"en": 50, "de": 10}).collect()}
    s2 = {r.doc_id for r in stratified_sample(
        docs.repartition(13), "lang", {"en": 50, "de": 10}).collect()}
    assert s1 == s2  # partition-invariant, no RNG
    n_en = sum(1 for d in s1 if d % 2 == 0)
    n_de = len(s1) - n_en
    assert 400 <= n_en <= 600        # ~50% of 1000
    assert 50 <= n_de <= 150         # ~10% of 1000
    # a row's fate is independent of the rest of the corpus
    half = {r.doc_id for r in stratified_sample(
        docs.where("doc_id < 1000"), "lang", {"en": 50, "de": 10}).collect()}
    assert half == {d for d in s1 if d < 1000}


def test_stratified_sample_default_rate_zero_drops_unknown(spark):
    from redactify_spark.operators.curation import stratified_sample
    docs = spark.createDataFrame(
        [(i, "xx") for i in range(100)], "doc_id long, lang string")
    assert stratified_sample(docs, "lang", {"en": 50}).count() == 0


def test_tfidf_topk_hand_fixture(spark):
    from redactify_spark.operators.textstats import tfidf_topk
    import math
    docs = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "")],
        "doc_id long, text string")
    out = {(r.doc_id, r.token): (r.tf, r.tfidf)
           for r in tfidf_topk(docs, k=2).collect()}
    # N=3; df: apple 1, banana 2, cherry 1
    idf = lambda df: math.log((3 + 1) / (df + 1)) + 1
    assert out[(0, "apple")] == (2, round(2 * idf(1), 6))
    assert out[(0, "banana")] == (1, round(1 * idf(2), 6))
    assert out[(1, "cherry")] == (1, round(1 * idf(1), 6))
    assert (2, "") not in out and not any(d == 2 for d, _ in out)
    # k=2 keeps exactly the top tokens per doc
    assert len([1 for d, _ in out if d == 0]) == 2


def test_chunk_documents_windows_and_overlap(spark):
    from redactify_spark.operators.curation import chunk_documents
    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, words), (1, "a b c"), (2, "   "), (3, "")],
        "doc_id long, text string")
    out = {(r.doc_id, r.chunk_idx): r.chunk_text
           for r in chunk_documents(docs, chunk_tokens=4,
                                    overlap=1).collect()}
    # doc 0: stride 3 -> starts 0,3,6 cover w0..w9 (start 9 not needed:
    # 1 + ceil((10-4)/3) = 3 chunks)
    assert out[(0, 0)] == "w0 w1 w2 w3"
    assert out[(0, 1)] == "w3 w4 w5 w6"
    assert out[(0, 2)] == "w6 w7 w8 w9"
    assert (0, 3) not in out
    # short doc -> single partial chunk; blank/empty docs -> nothing
    assert out[(1, 0)] == "a b c" and (1, 1) not in out
    assert not any(d in (2, 3) for d, _ in out)


def test_chunk_documents_reconstructs_tokens(spark):
    """Concatenating chunks minus overlaps reproduces the token stream."""
    from redactify_spark.operators.curation import chunk_documents
    text = " ".join(f"t{i}" for i in range(137))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(docs, chunk_tokens=32, overlap=8)
                  .collect(), key=lambda r: r.chunk_idx)
    rebuilt = rows[0].chunk_text.split()
    for r in rows[1:]:
        rebuilt += r.chunk_text.split()[8:]
    assert rebuilt == text.split()
    assert all(r.n_chunk_tokens <= 32 for r in rows)


def test_chunk_documents_rejects_bad_overlap(spark):
    from redactify_spark.operators.curation import chunk_documents
    import pytest as _pt
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_sample_per_group_deterministic_count(spark):
    from redactify_spark.operators.curation import sample_per_group
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = sorted((r.lang, r.doc_id)
                for r in sample_per_group(docs, "lang", 7).collect())
    s2 = sorted((r.lang, r.doc_id)
                for r in sample_per_group(docs.repartition(13),
                                          "lang", 7).collect())
    assert s1 == s2
    from collections import Counter
    per = Counter(lang for lang, _ in s1)
    assert per == {"en": 7, "de": 7}
    # groups smaller than k keep everything
    tiny = spark.createDataFrame([(1, "xx"), (2, "xx")],
                                 "doc_id long, lang string")
    assert sample_per_group(tiny, "lang", 7).count() == 2


def test_remove_boilerplate_lines(spark):
    from redactify_spark.operators.curation import remove_boilerplate_lines
    rows = [(i, f"HEADER\nbody {i} line one\nbody {i} line two\nFOOTER")
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_lines_kept, r.text)
           for r in remove_boilerplate_lines(
               docs, n_docs=20, min_doc_frac=0.5).collect()}
    assert out[3] == (2, "body 3 line one\nbody 3 line two")
    assert all(v[0] == 2 for v in out.values())
    # a doc that is ALL boilerplate disappears
    plus = docs.union(spark.createDataFrame(
        [(99, "HEADER\nFOOTER")], "doc_id long, text string"))
    out2 = remove_boilerplate_lines(plus, n_docs=21, min_doc_frac=0.5)
    assert 99 not in {r.doc_id for r in out2.collect()}


def test_weighted_sample_proportional_and_deterministic(spark):
    from redactify_spark.operators.curation import weighted_sample_per_group
    # two weight classes: w=9 vs w=1 -> heavy rows should dominate
    rows = [(i, "g", 9.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, g string, w double")
    s1 = sorted(r.doc_id for r in
                weighted_sample_per_group(docs, "g", 200, "w").collect())
    s2 = sorted(r.doc_id for r in
                weighted_sample_per_group(docs.repartition(11), "g", 200,
                                          "w").collect())
    assert s1 == s2 and len(s1) == 200
    heavy = sum(1 for d in s1 if d % 2 == 0)
    # E[heavy] ~ 180 under w=9:1; require clearly-above-uniform
    assert heavy > 150, heavy
    # zero/negative weights are never selected
    docs2 = spark.createDataFrame(
        [(0, "g", 0.0), (1, "g", -1.0), (2, "g", 1.0)],
        "doc_id long, g string, w double")
    assert [r.doc_id for r in
            weighted_sample_per_group(docs2, "g", 5, "w").collect()] == [2]


# -- exact-substring dedup: maximal repeated spans (VERDICT r3 #3) ----------

def test_maximal_spans_merge_hand_fixture(spark):
    """Two docs sharing an 11-token run: the 4 overlapping 8-gram hits
    in the second doc must merge into ONE maximal span of exactly 11
    tokens; the corpus-wide first occurrence (doc 1) is untouched."""
    from redactify_spark.operators.dedup import maximal_repeated_spans
    shared = "a b c d e f g h i j k"   # 11 tokens
    df = spark.createDataFrame(
        [(1, "start one " + shared + " tail one x y z"),
         (2, "other prefix " + shared + " different suffix"),
         (3, "totally unrelated words with no repeats at all here ok")],
        ["doc_id", "text"])
    spans = maximal_repeated_spans(df, n=8).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s.doc_id, s.span_start, s.span_end, s.n_tokens) == (2, 3, 13, 11)


def test_remove_repeated_spans_reconstruction(spark):
    """Splice invariants: (a) docs with no repeated span round-trip to
    their whitespace-normalized text byte-exactly; (b) removal deletes
    exactly the span tokens and keeps everything else in order;
    (c) keep_first=False removes every occurrence including the first;
    (d) punctuation/case differences between occurrences still match
    (in-place normalization) while the SURVIVING text keeps its
    original bytes."""
    import re

    from redactify_spark.operators.dedup import remove_repeated_spans
    shared = "a b c d e f g h i j k"
    d1 = "start  one " + shared + " tail one x y z"      # double space
    d2 = "other prefix A, B. C d E f G h I j K?! different suffix"
    d3 = "totally unrelated words with no repeats at all here ok"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
    out = {r.doc_id: r for r in remove_repeated_spans(df, n=8).collect()}
    # (a)+(d) doc 1 is the corpus-wide first occurrence: kept, normalized
    assert out[1].text == re.sub(r"\s+", " ", d1).strip()
    assert out[1].n_tokens_removed == 0
    # (b)+(d) doc 2's punctuated variant matched and was spliced out,
    # surviving tokens keep original bytes
    assert out[2].text == "other prefix different suffix"
    assert out[2].n_tokens_removed == 11
    assert out[3].text == d3 and out[3].n_tokens_removed == 0
    # (c) remove every occurrence
    out_all = {r.doc_id: r for r in
               remove_repeated_spans(df, n=8, keep_first=False).collect()}
    assert out_all[1].text == "start one tail one x y z"
    assert out_all[1].n_tokens_removed == 11
    assert out_all[2].n_tokens_removed == 11


def test_remove_repeated_spans_within_doc_and_empty(spark):
    """A window repeated twice INSIDE one doc counts (total-occurrence
    min_count); empty/short docs pass through."""
    from redactify_spark.operators.dedup import remove_repeated_spans
    rep = "p q r s t u v w"             # 8 tokens, repeated in doc 1
    df = spark.createDataFrame(
        [(1, rep + " middle " + rep + " end"),
         (2, ""), (3, "short doc")], ["doc_id", "text"])
    out = {r.doc_id: r for r in remove_repeated_spans(df, n=8).collect()}
    # first occurrence kept, second spliced
    assert out[1].text == rep + " middle end"
    assert out[1].n_tokens_removed == 8
    assert out[2].text == "" and out[2].n_tokens_removed == 0
    assert out[3].text == "short doc" and out[3].n_tokens_removed == 0
