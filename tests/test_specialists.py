"""D10-D12 specialist pattern banks (disabled by default, enabled via
flags + explicit domains -- mirrors server/server.py:83-86)."""

import pytest

from redactify_spark import config as C
from redactify_spark.detect import kernel, specialists


def test_technical_patterns():
    got = specialists.detect_technical(
        "uuid 550e8400-e29b-41d4-a716-446655440000 on host 10.0.0.1 "
        "running v2.1.3 hash d41d8cd98f00b204e9800998ecf8427e")
    types = {m["entity_group"]: m for m in got}
    assert "UUID" in types and types["UUID"]["score"] == 0.95
    assert "VERSION" in types
    # md5-length hash gets the +0.05 standard-length boost
    assert "HASH" in types and types["HASH"]["score"] == pytest.approx(0.90)


def test_legal_patterns():
    got = specialists.detect_legal(
        "see 42 U.S.C. § 1983 and case no: AB-1234 in the record")
    types = {m["entity_group"] for m in got}
    assert "STATUTE_REFERENCE" in types
    assert "CASE_NUMBER" in types


def test_financial_patterns_luhn_and_ticker():
    got = specialists.detect_financial(
        "card 4539148803436467 ticker AAPL amount $1,234.56 swift DEUTDEFF")
    by_type = {m["entity_group"]: m for m in got}
    assert by_type["CREDIT_CARD"]["score"] == pytest.approx(0.95)  # 0.90+Luhn
    assert by_type["TICKER_SYMBOL"]["score"] == pytest.approx(0.90)  # famous
    assert "MONETARY_AMOUNT" in by_type
    assert "SWIFT_CODE" in by_type


def test_disabled_by_default():
    text = "uuid 550e8400-e29b-41d4-a716-446655440000 here"
    got = kernel.detect_document(text)
    assert not any(m.get("detector") == "mcp_technical" for m in got)


def test_enabled_via_flag_and_domain():
    text = "statute 42 U.S.C. § 1983 cited herein today"
    old = C.ENGINE_CONFIG["enable_legal_ner"]
    C.ENGINE_CONFIG["enable_legal_ner"] = True
    try:
        got = kernel.detect_document(text, domains=["general", "legal"])
        assert any(m.get("detector") == "mcp_legal" for m in got)
    finally:
        C.ENGINE_CONFIG["enable_legal_ner"] = old
    # threshold P1: legal floor is 0.8, so a 0.85 pattern survives but
    # would not if the floor applied were stricter
