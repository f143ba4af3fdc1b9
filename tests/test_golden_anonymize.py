"""Exact-golden gate for the splice-rewrite anonymization family
(q32/q32b/q32c), which is not SQL-expressible and therefore has no
DuckDB oracle: full anonymized_text outputs for pinned doc_ids are
md5-pinned here, at every strategy (pseudonymize / mask+preserve-format
/ redact).

If a change to the kernel or the splice rewriter alters ANY byte of the
output, these hashes move.  Regenerate only after verifying the new
output by hand against the reference semantics
(server/anonymization_engine.py)."""

import hashlib

import pytest

GOLDEN = {
    ("q32_anonymize", 0, 9): "1ad6d651611d88c6025916a21ccbd07f",
    ("q32_anonymize", 3, 7): "4dc6e0be46ba3b0021192a1973673c67",
    ("q32_anonymize", 8, 9): "1a7f87152f3621eb1b904cd2facfafcc",
    ("q32b_anonymize_mask", 0, 9): "3a4ce7462fe02572040de2fc8431503f",
    ("q32b_anonymize_mask", 3, 7): "d440604ab0565710d8f1a5b1c75b9f7b",
    ("q32b_anonymize_mask", 8, 9): "bac56df1f8c8d03430a2b779b0763886",
    ("q32c_anonymize_redact", 0, 9): "2d36704375a0c8107960e1bccb7bf216",
    ("q32c_anonymize_redact", 3, 7): "dbd4069816b505c0216555ba37e9f9fe",
    ("q32c_anonymize_redact", 8, 9): "a5d38ebf705d8a24fa0bfbaeaefd2700",
}


@pytest.fixture(scope="module")
def q32_rows(spark):
    import __spark_entry__ as entry
    qs = entry.queries()
    out = {}
    for name in ("q32_anonymize", "q32b_anonymize_mask",
                 "q32c_anonymize_redact"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        for r in df.where("doc_id in (0, 3, 8)").collect():
            out[(name, r.doc_id)] = r
    return out


def test_golden_hashes(q32_rows):
    for (name, doc_id, n_entities), h in GOLDEN.items():
        r = q32_rows[(name, doc_id)]
        assert r.n_entities == n_entities, (name, doc_id, r.n_entities)
        got = hashlib.md5(r.anonymized_text.encode()).hexdigest()
        assert got == h, (name, doc_id, r.anonymized_text)


def test_golden_shapes_readable(q32_rows):
    """Human-readable invariants backing the hashes: each strategy's
    rewrite leaves the expected surface shapes in doc 0."""
    pseudo = q32_rows[("q32_anonymize", 0)].anonymized_text
    assert "[PERSON-" in pseudo and "[EMAIL_ADDRESS-" in pseudo
    mask = q32_rows[("q32b_anonymize_mask", 0)].anonymized_text
    assert "***-***-" in mask          # phone keeps last-4 format
    assert "@ma" in mask               # email keeps domain shape
    redact = q32_rows[("q32c_anonymize_redact", 0)].anonymized_text
    assert "[REDACTED-PERSON]" in redact
    assert "[REDACTED-SSN]" in redact
