"""Fuzz-equivalence pins for the r6 kernel micro-optimizations.

The r6 optimization round rewrote two pure helpers for speed; these
tests pin the new implementations against literal re-implementations of
the old ones over adversarial + random inputs, so any semantic drift
(unicode classes, hex-prefix arithmetic) fails loudly."""

import hashlib
import random

from redactify_spark.operators.dedup import _word_shingles
from redactify_spark.operators.linking import normalize_surface


def _normalize_surface_loop(s: str) -> str:
    """The pre-r6 per-character reference implementation."""
    out = []
    prev_space = True
    for ch in s.lower():
        if ch.isalnum():
            out.append(ch)
            prev_space = False
        elif not prev_space:
            out.append(" ")
            prev_space = True
    return "".join(out).strip()


def _word_shingles_hex(text: str, k: int = 3) -> set[int]:
    """The pre-r6 hexdigest-slicing reference implementation."""
    words = normalize_surface(text).split()
    if len(words) < k:
        joined = " ".join(words)
        return {int(hashlib.md5(joined.encode()).hexdigest()[:15], 16)}
    return {int(hashlib.md5(" ".join(words[i:i + k]).encode())
                .hexdigest()[:15], 16)
            for i in range(len(words) - k + 1)}


ADVERSARIAL = [
    "", " ", "_", "__a__b__", "a", "ab c", "  leading and trailing  ",
    "tabs\tand\nnewlines", "MiXeD CaSe 123", "ünïcödé Straße çöğü",
    "digits ٣٤٥ and 二三 numerals", "ⅩⅣ roman numeral Ⅻ", "x" * 500,
    "emoji 🙂 in the middle", "dash-joined and under_scored words",
    "quotes 'single' \"double\" and punct!?;:",
    "² superscript two is alnum", "́ combining acute alone",
]


def test_normalize_surface_matches_loop_reference():
    rng = random.Random(606)
    pool = ("abc ABC 123 _-.!? \t\n" "üßçñé ١٢٣ четыре αβγ 中文 🙂 ²½Ⅻ")
    cases = list(ADVERSARIAL)
    for _ in range(2000):
        cases.append("".join(rng.choice(pool)
                             for _ in range(rng.randrange(0, 60))))
    for s in cases:
        assert normalize_surface(s) == _normalize_surface_loop(s), repr(s)


def test_word_shingles_matches_hex_reference():
    rng = random.Random(607)
    words = ("the quick brown fox jumps over a lazy dog with many "
             "short and long tokens ünïcödé ١٢٣").split()
    cases = list(ADVERSARIAL)
    for _ in range(300):
        cases.append(" ".join(rng.choice(words)
                              for _ in range(rng.randrange(0, 30))))
    for s in cases:
        assert _word_shingles(s) == _word_shingles_hex(s), repr(s)
        assert _word_shingles(s, k=2) == _word_shingles_hex(s, k=2), repr(s)


def test_langid_numpy_scorer_matches_exploded(spark):
    """The r6 vectorized numpy langid scorer must be row-identical to
    the all-native explode/join formulation it replaced (which is also
    the shape the q104 DuckDB oracle mirrors)."""
    from redactify_spark.operators.langid import (LANG_SAMPLES,
                                                  lang_id_ngram,
                                                  lang_id_ngram_exploded)

    rows = [(i, s) for i, s in enumerate(LANG_SAMPLES.values())]
    rows += [
        (100, ""), (101, None), (102, "12345 !!! ###"), (103, "   \t "),
        (104, "the the the aaa"), (105, "x"),
        (106, "mixed english text with 数字 and عربية inside"),
        (107, "ÄÖÜ großes Straßenfest in münchen"),
        (108, "ёлка и ґанок під київським небом"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, lang_id_ngram(df).collect()))
    b = sorted(map(tuple, lang_id_ngram_exploded(df).collect()))
    assert a == b
