"""Property-based invariants of the detection/anonymization kernel
(hypothesis).  These hold for ARBITRARY input text, not just fixtures."""

from hypothesis import given, settings
from hypothesis import strategies as st

from redactify_spark.detect import anonymize as A
from redactify_spark.detect import kernel

# text with PII-ish fragments mixed into noise
_frag = st.sampled_from([
    "john.doe@example.com", "555-123-4567", "123-45-6789",
    "https://x.example/a", "password: hunter2!", "Dr. Smith",
    "google", "work", "10.0.0.1", "ip", "2024-01-02", "ssn",
    " ", "\n", ". ", "Alice Brown", "Acme Corp", "ending in 1234",
])
_noise = st.text(
    alphabet="abcdefghij KLMNOP0123:-.@$/\n", min_size=0, max_size=40)
texts = st.lists(st.one_of(_frag, _noise), min_size=0, max_size=12) \
    .map(" ".join)


@given(texts)
@settings(max_examples=150, deadline=None)
def test_spans_within_bounds_and_ordered(text):
    ms = kernel.detect_document(text)
    prev_start = -1
    for m in ms:
        assert 0 <= m["start"] < m["end"] <= len(text)
        assert m["entity_text"] == text[m["start"]:m["end"]]
        assert 0.0 <= m["score"] <= 1.0
        assert m["start"] >= prev_start  # sorted by start
        prev_start = m["start"]


@given(texts)
@settings(max_examples=150, deadline=None)
def test_no_overlaps_after_p7(text):
    ms = kernel.detect_document(text)
    for a, b in zip(ms, ms[1:]):
        assert a["end"] <= b["start"] or a["start"] >= b["end"], (a, b)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_detection_idempotent_deterministic(text):
    assert kernel.detect_document(text) == kernel.detect_document(text)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_p6_unique_surface_type(text):
    """P6 dedup keys on PRE-normalization labels (detection_engine.py:
    691-719 runs before server.py:160-178), so uniqueness of
    (lower(surface), type) holds at the post_process stage -- NOT after
    P8 normalization, where sibling labels (PER/PERSON, ORG/ORGANIZATION,
    LOC/LOCATION) may merge into duplicate keys.  The post-normalize
    quirk is pinned by test_p6_pre_normalization_quirk_* below."""
    ms = kernel.detect_document(text, normalized=False)
    keys = [(m["entity_text"].lower(), m["entity_group"].upper())
            for m in ms]
    assert len(keys) == len(set(keys))


# ---------------------------------------------------------------------------
# Reference quirk: P6 runs pre-normalization, so a surface detected as
# `PER` by general NER and as `PERSON` by the PII-specialized model (whose
# per-model map runs pre-union, pii_specialized_ner.py:246-274) survives
# P6 TWICE and P8 merges both to duplicate PERSON mentions.  Found by
# hypothesis in round 4; the reference does exactly this.
# ---------------------------------------------------------------------------

_QUIRK_TEXT = ("Alice Brown john.doe@example.com john.doe@example.com "
               "ssn Alice Brown")


def test_p6_pre_normalization_quirk_person():
    ms = kernel.detect_document(_QUIRK_TEXT)
    person_keys = [(m["entity_text"].lower(), m["entity_group"])
                   for m in ms if m["entity_group"] == "PERSON"
                   and m["entity_text"].lower() == "alice brown"]
    # BOTH mentions survive: one entered P6 as PER (general NER), one as
    # PERSON (pii-specialized map), keys differ, P8 maps PER->PERSON.
    assert len(person_keys) == 2, ms
    # pre-normalization output is still key-unique
    raw = kernel.detect_document(_QUIRK_TEXT, normalized=False)
    raw_keys = [(m["entity_text"].lower(), m["entity_group"].upper())
                for m in raw]
    assert len(raw_keys) == len(set(raw_keys))
    labels = sorted(m["entity_group"].upper() for m in raw
                    if m["entity_text"].lower() == "alice brown")
    assert labels == ["PER", "PERSON"], raw


def test_p6_quirk_anonymization_splices_both():
    """Anonymization consequence of the quirk: both duplicate PERSON
    spans are spliced (each occupies a distinct position)."""
    ms = kernel.detect_document(_QUIRK_TEXT)
    out = A.anonymize_text(_QUIRK_TEXT, ms, "redact")
    assert "Alice Brown" not in out
    assert out.count("[REDACTED-PERSON]") == 2, out


def _quirk_pair_via_post_process(raw_label, canon_label):
    """Unit-level pin for each sibling pair: two synthetic mentions of
    the same surface at distinct positions, one carrying the raw label
    and one the canonical label, both clear P6 (distinct keys) and merge
    to duplicate canonical keys after normalize_server."""
    text = "Acme Widget things Acme Widget"
    ents = [
        {"entity_group": raw_label, "start": 0, "end": 11, "score": 0.9,
         "word": "Acme Widget", "detector": "t1"},
        {"entity_group": canon_label, "start": 19, "end": 30, "score": 0.8,
         "word": "Acme Widget", "detector": "t2"},
    ]
    processed = kernel.post_process(ents, text)
    keys = [(m["entity_text"].lower(), m["entity_group"].upper())
            for m in processed]
    assert len(keys) == 2 and len(set(keys)) == 2, processed
    final = kernel.normalize_server(processed)
    final_keys = [(m["entity_text"].lower(), m["entity_group"].upper())
                  for m in final]
    assert final_keys == [("acme widget", canon_label)] * 2, final


def test_p6_pre_normalization_quirk_org():
    _quirk_pair_via_post_process("ORG", "ORGANIZATION")


def test_p6_pre_normalization_quirk_loc():
    _quirk_pair_via_post_process("LOC", "LOCATION")


def test_p6_pre_normalization_quirk_per_unit():
    _quirk_pair_via_post_process("PER", "PERSON")


@given(texts, st.sampled_from(["pseudonymize", "mask", "redact", "custom"]))
@settings(max_examples=100, deadline=None)
def test_anonymize_removes_every_span(text, strategy):
    ms = kernel.detect_document(text)
    out = A.anonymize_text(text, ms, strategy,
                           preserve_format=(strategy == "mask"))
    # splice safety: text outside all spans is preserved verbatim
    # (check prefix before the first span and suffix after the last)
    if ms:
        first, last = ms[0], ms[-1]
        assert out.startswith(text[:first["start"]])
        assert out.endswith(text[last["end"]:])
    else:
        assert out == text


@given(st.text(alphabet="ab1@.-x ", min_size=0, max_size=30))
@settings(max_examples=150, deadline=None)
def test_partial_mask_preserves_length(token):
    assert len(A.partial_mask_token(token)) == len(token)
    assert len(A.mask_ssn(token)) == len(token)


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=100, deadline=None)
def test_pages_invariant_any_id(doc_id):
    from redactify_spark.sources import pages as P
    t = P.synth_text(doc_id)
    assert P.extract_text(P.render_html(t, P.page_url(doc_id))) == t


@given(st.text(alphabet="ab c\nd  ef.g-h", min_size=0, max_size=80),
       st.integers(0, 80), st.integers(0, 80))
@settings(max_examples=300, deadline=None)
def test_word_window_matches_slice_split(text, a, b):
    """Token-index word window == reference slice-then-split for ARBITRARY
    spans (including mid-token and whitespace boundaries)."""
    from redactify_spark.detect.kernel import _TOKEN_RE, _word_window
    span_start = min(a, len(text))
    span_end = min(max(b, span_start), len(text))
    tokens = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]
    for ctx in (1, 3, 40):
        import redactify_spark.config as C
        old = C.ENGINE_CONFIG["context_window"]
        C.ENGINE_CONFIG["context_window"] = ctx
        try:
            fast = _word_window(text, span_start, span_end, tokens, ctx)
            slow = _word_window(text, span_start, span_end, None, ctx)
        finally:
            C.ENGINE_CONFIG["context_window"] = old
        assert fast == slow, (text, span_start, span_end, ctx, fast, slow)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=120))
@settings(max_examples=300, deadline=None)
def test_native_tokens_match_normalize_surface_ascii(text):
    """The q43/q44 native tokenizer (ASCII regex) must equal the Python
    kernel's normalize_surface().split() on ASCII inputs -- the claim
    that the native word-shingle Jaccard IS the minhash verify-stage
    semantics rests on this (the documented divergence is unicode-only).
    Pure-python re-implementation of the Spark/DuckDB expression:
    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')).split(' ')."""
    import re

    from redactify_spark.operators.linking import normalize_surface
    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    native = norm.split(" ") if norm else []
    python = normalize_surface(text).split()
    assert native == python, (text, native, python)
