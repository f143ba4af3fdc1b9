"""Mask-parity fixtures: anonymization strategies A1-A15.

Hash pseudonyms are checked against the exact values the reference
README publishes (README.md:337-345): md5('john.doe@example.com')[:6]
== '8eb1b5', md5('555-123-4567')[:6] == 'ca71de' -- byte-parity with
the reference's A1 (server/anonymization_engine.py:229-242).
"""

from redactify_spark.detect import anonymize as A
from redactify_spark.detect import kernel


def test_pseudonymize_reference_hashes():
    assert A.pseudonymize_value("john.doe@example.com", "EMAIL_ADDRESS") == \
        "[EMAIL_ADDRESS-8eb1b5]"
    assert A.pseudonymize_value("555-123-4567", "PHONE_NUMBER") == \
        "[PHONE_NUMBER-ca71de]"


def test_redact():
    assert A.redact_value("SSN") == "[REDACTED-SSN]"


def test_full_mask_pseudonymize_carveout():
    # PERSON is in pseudonymize_types -> full mask pseudonymizes instead
    assert A.full_mask_token("John", "PERSON").startswith("[PERSON-")
    assert A.full_mask_token("123-45-6789", "SSN") == "*" * 11


def test_mask_email():
    # local 'john.smith' (10 chars) -> first2 + 6 masks + last2;
    # domain 'example' (7 > 5) -> first2 + 5 masks; TLD kept
    assert A.mask_email("john.smith@example.com") == "jo******th@ex*****.com"
    # short local (<=4): first char + masks
    assert A.mask_email("ab@x.io") == "a*@*.io"


def test_mask_phone():
    assert A.mask_phone("555-123-4567") == "***-***-4567"
    assert A.mask_phone("(555) 123-4567") == "(***) ***-4567"


def test_mask_credit_card():
    assert A.mask_credit_card("4539-1488-0343-6467") == "****-****-****-6467"


def test_mask_ssn():
    assert A.mask_ssn("123-45-6789") == "*******6789"


def test_mask_sensitive_token():
    assert A.mask_sensitive_token("supersecretpw") == "su***********"
    assert A.mask_sensitive_token("short") == "*****"


def test_mask_date_leading_year():
    assert A.mask_date("2024-06-01") == "****-06-01"


def test_mask_date_trailing_year():
    assert A.mask_date("12/31/2024") == "12/31/****"


def test_mask_url():
    out = A.mask_url("https://portal.example.com/users/abc123")
    assert out.endswith(".com/us***/ab****")
    assert out.startswith("https://po****.ex*****.com")


def test_mask_url_whitelist_segments():
    out = A.mask_url("https://app.example.com/api/v1/users")
    assert "/api/v1/" in out


def test_generic_partial_mask_lengths():
    assert A.partial_mask_token("ab") == "**"
    assert A.partial_mask_token("abcd") == "a***"
    assert A.partial_mask_token("abcdefgh") == "ab****gh"
    assert A.partial_mask_token("abcdefghijk") == "ab******ijk"


def test_custom_rules():
    assert A.custom_anonymize("MRN-778899", "PATIENT_ID").startswith("[MRN-")
    assert A.custom_anonymize("key123", "API_KEY").startswith("[TOKEN-")
    assert len(A.custom_anonymize("key123", "API_KEY")) == len("[TOKEN-]") + 8


def test_splice_right_to_left():
    text = "a@b.co and c@d.co"
    ents = [
        {"entity_group": "EMAIL_ADDRESS", "start": 0, "end": 6},
        {"entity_group": "EMAIL_ADDRESS", "start": 11, "end": 17},
    ]
    out = A.anonymize_text(text, ents, "redact")
    assert out == "[REDACTED-EMAIL_ADDRESS] and [REDACTED-EMAIL_ADDRESS]"


def test_repeated_surface_quirk():
    """After P6 dedup a repeated surface has one span -> only that span is
    rewritten (reference quirk, SURVEY.md §2.4)."""
    t = "email a@b.co and again email a@b.co here"
    ms = kernel.detect_document(t)
    out = A.anonymize_text(t, ms, "pseudonymize")
    assert out.count("a@b.co") == 1  # the second occurrence survives


def test_end_to_end_pseudonymize():
    t = "Contact Dr. Smith at john.doe@example.com"
    ms = kernel.detect_document(t)
    out = A.anonymize_text(t, ms, "pseudonymize")
    assert "[EMAIL_ADDRESS-8eb1b5]" in out
    assert "john.doe@example.com" not in out


def test_batch_matches_single():
    texts = ["call 555-123-4567", "email x@y.io now"]
    ents = kernel.detect_batch(texts)
    outs = A.anonymize_batch(texts, ents)
    assert outs[0] == A.anonymize_text(texts[0], ents[0])
    assert outs[1] == A.anonymize_text(texts[1], ents[1])


def test_new_country_types_anonymize_via_generic_path():
    """AU/SG/IN entity types (no type-specific mask exists, same as the
    reference) flow through the generic mask / pseudonym / redact
    strategies end to end."""
    from redactify_spark.detect import anonymize as A
    from redactify_spark.detect import kernel as K
    text = "business ABN 51 824 753 556 and NRIC S1234567D on file"
    ments = K.detect_document(text)
    types = {m["entity_group"] for m in ments}
    assert {"AU_ABN", "SG_NRIC_FIN"} <= types
    assert A.anonymize_text(text, ments, "mask") == \
        "business ABN 51*********556 and NRIC S1*****7D on file"
    assert A.anonymize_text(text, ments, "pseudonymize") == \
        "business ABN [AU_ABN-2295a0] and NRIC [SG_NRIC_FIN-73b95d] on file"
    assert A.anonymize_text(text, ments, "redact") == \
        "business ABN [REDACTED-AU_ABN] and NRIC [REDACTED-SG_NRIC_FIN] " \
        "on file"
