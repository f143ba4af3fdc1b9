"""Specialist pattern banks D10-D12 (technical / legal / financial).

These mirror the reference's three disabled-by-default NER
microservices' regex sub-banks (the model halves are the same pluggable
NER stage as D6).  Their MCP servers are commented out in the live
reference (server/server.py:83-86), and the live domain classifier
never emits their domains (server/detection_engine.py:302-310), so by
default these never run -- exactly as here (ENGINE_CONFIG flags False,
domains gated).  To enable one inside detect_document BOTH gates must
open: flip ENGINE_CONFIG['enable_<bank>_ner'] AND pass the domain in
`domains` (mirrors the reference's flag-AND-domain check,
detection_engine.py:336-358).  The detect_technical/detect_legal/
detect_financial functions below run unconditionally when called
directly.

Citations:
- technical bank + confidences: server/models/technical_ner.py:49-59,
  :223-251 (length adjustments), :208-221 (type map).  The x1.15
  technical-context boost (:144-146) applies only to the MODEL half of
  D10 (the pluggable NER stage), not the pattern bank -- reproduced
  accordingly: pattern confidences here carry no context boost.
- legal bank: server/models/legal_ner.py:46-54, :226-250
- financial bank: server/models/financial_ner.py:46-62, :249-278,
  Luhn validation :280-301, ticker boost :273-275
"""

from __future__ import annotations

import re

from redactify_spark.detect.kernel import (luhn_valid,
                                           remove_overlaps_by_score)

_TECH = [
    ("api_key", re.compile(r"\b[A-Za-z0-9]{20,}\b"), "API_KEY", 0.85),
    ("uuid", re.compile(r"\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\b", re.I), "UUID", 0.95),
    ("ip_address", re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"), "IP_ADDRESS", 0.90),
    ("mac_address", re.compile(r"\b[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}\b", re.I), "MAC_ADDRESS", 0.95),
    ("version", re.compile(r"\bv?\d+\.\d+(?:\.\d+)*(?:-[a-zA-Z0-9]+)?\b"), "VERSION", 0.80),
    ("port", re.compile(r"\b(?:port\s+)?([1-9][0-9]{0,4})\b", re.I), "PORT", 0.75),
    ("hash", re.compile(r"\b[a-f0-9]{32,}\b", re.I), "HASH", 0.85),
    ("token", re.compile(r"\b(?:token|key|secret)[\s:=]+([A-Za-z0-9+/]{20,}={0,2})\b", re.I), "AUTHENTICATION_TOKEN", 0.90),
]

_LEGAL = [
    ("case_number", re.compile(r"\b(?:case|docket)[-\s]?(?:no|number)[-\s:]*([A-Z0-9-]{4,20})\b", re.I), "CASE_NUMBER", 0.90),
    ("court", re.compile(r"\b(?:court|tribunal|judge)[-\s]?(?:of|in)?\s*([A-Z][A-Za-z\s]{5,30})\b", re.I), "COURT", 0.85),
    ("legal_citation", re.compile(r"\b\d+\s+[A-Z][A-Za-z\.]+\s+\d+\b"), "LEGAL_CITATION", 0.95),
    ("contract_id", re.compile(r"\b(?:contract|agreement)[-\s]?(?:no|number|id)[-\s:]*([A-Z0-9-]{4,15})\b", re.I), "CONTRACT_ID", 0.85),
    ("bar_number", re.compile(r"\b(?:bar|attorney)[-\s]?(?:no|number)[-\s:]*([A-Z0-9]{4,12})\b", re.I), "BAR_NUMBER", 0.90),
    ("statute", re.compile(r"\b\d+\s+U\.?S\.?C\.?\s+§?\s*\d+\b", re.I), "STATUTE_REFERENCE", 0.95),
]

_FIN = [
    ("account_number", re.compile(r"\b(?:account|acct)[-\s]?(?:no|number)[-\s:]*([0-9]{6,17})\b", re.I), "ACCOUNT_NUMBER", 0.85),
    ("routing_number", re.compile(r"\b(?:routing|aba)[-\s]?(?:no|number)[-\s:]*([0-9]{9})\b", re.I), "ROUTING_NUMBER", 0.95),
    ("credit_card", re.compile(r"\b(?:4[0-9]{12}(?:[0-9]{3})?|5[1-5][0-9]{14}|3[47][0-9]{13}|3[0-9]{13}|6(?:011|5[0-9]{2})[0-9]{12})\b"), "CREDIT_CARD", 0.90),
    ("swift_code", re.compile(r"\b[A-Z]{6}[A-Z0-9]{2}(?:[A-Z0-9]{3})?\b"), "SWIFT_CODE", 0.95),
    ("iban", re.compile(r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{4}[0-9]{7}(?:[A-Z0-9]?){0,16}\b"), "IBAN", 0.95),
    ("cusip", re.compile(r"\b[0-9]{3}[0-9A-Z]{5}[0-9]\b"), "CUSIP", 0.90),
    ("isin", re.compile(r"\b[A-Z]{2}[0-9A-Z]{9}[0-9]\b"), "ISIN", 0.90),
    ("ticker_symbol", re.compile(r"\b[A-Z]{1,5}(?:\.[A-Z]{1,2})?\b"), "TICKER_SYMBOL", 0.80),
    ("amount", re.compile(r"\$\s*[0-9]{1,3}(?:,[0-9]{3})*(?:\.[0-9]{2})?"), "MONETARY_AMOUNT", 0.85),
    ("tax_id", re.compile(r"\b(?:ein|tax[-\s]id)[-\s:]*([0-9]{2}-[0-9]{7})\b", re.I), "TAX_ID", 0.90),
    ("portfolio_id", re.compile(r"\b(?:portfolio|fund)[-\s]?(?:id|number)[-\s:]*([A-Z0-9]{4,12})\b", re.I), "PORTFOLIO_ID", 0.85),
]

_FAMOUS_TICKERS = {"AAPL", "GOOGL", "MSFT", "AMZN", "TSLA", "META", "NVDA"}


def _scan(bank, text: str, detector: str, adjust=None) -> list[dict]:
    out = []
    for name, pat, etype, base in bank:
        for m in pat.finditer(text):
            s, e = m.span()
            surface = m.group()
            if m.groups() and m.group(1):
                s, e = m.start(1), m.end(1)
                surface = m.group(1)
            if len(surface) < 3 and name not in ("port",):
                continue
            conf = base
            if adjust:
                conf = adjust(name, surface, conf)
            out.append({"entity_group": etype, "start": s, "end": e,
                        "score": min(1.0, max(0.1, conf)),
                        "word": surface, "detector": detector,
                        "pattern_type": name})
    return remove_overlaps_by_score(out)


def _tech_adjust(name: str, surface: str, conf: float) -> float:
    # technical_ner.py:237-249
    if name == "api_key":
        if len(surface) > 32:
            conf += 0.05
        elif len(surface) < 20:
            conf -= 0.10
    elif name == "hash" and len(surface) in (32, 40, 64, 128):
        conf += 0.05
    return conf


def _fin_adjust(name: str, surface: str, conf: float) -> float:
    # financial_ner.py:268-278
    if name == "credit_card" and luhn_valid(re.sub(r"[-\s]", "", surface)):
        conf += 0.05
    elif name == "ticker_symbol" and surface.upper() in _FAMOUS_TICKERS:
        conf += 0.10
    return conf


def detect_technical(text: str) -> list[dict]:
    """D10 pattern half (model half = pluggable NER stage)."""
    return _scan(_TECH, text, "technical_pattern_detector", _tech_adjust)


def detect_legal(text: str) -> list[dict]:
    """D11 pattern half."""
    return _scan(_LEGAL, text, "legal_pattern_detector")


def detect_financial(text: str) -> list[dict]:
    """D12 pattern half, with Luhn and famous-ticker boosts."""
    return _scan(_FIN, text, "financial_pattern_detector", _fin_adjust)
