"""Pages source: byte-identical html->text invariant + determinism."""

from redactify_spark.sources import pages as P


def test_extract_invariant_byte_identical():
    for i in range(0, 512, 7):
        text = P.synth_text(i)
        html = P.render_html(text, P.page_url(i))
        assert P.extract_text(html) == text


def test_extract_handles_escaping():
    text = "a < b & c > d with 'quotes'"
    assert P.extract_text(P.render_html(text, "u")) == text


def test_synthesis_deterministic():
    assert P.synth_text(42) == P.synth_text(42)
    assert P.page_url(42) == P.page_url(42)
    assert P.page_lang(42) == P.page_lang(42)
    assert P.synth_text(1) != P.synth_text(2)


def test_head_entity_skew_fraction():
    head = sum(1 for i in range(800)
               if "google" in P.synth_text(i))
    assert head == 800 // P.HEAD_ENTITY_FRACTION


def test_pages_contain_detectable_pii():
    from redactify_spark.detect import kernel
    types = {m["entity_group"] for m in kernel.detect_document(P.synth_text(3))}
    assert {"PERSON", "ORGANIZATION", "LOCATION", "EMAIL_ADDRESS",
            "PHONE_NUMBER", "SSN", "DATE_TIME"} <= types
