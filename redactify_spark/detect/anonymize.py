"""Anonymization kernel: pure-function rewrite strategies A1-A15.

Reproduces the semantics of the reference anonymization engine
(server/anonymization_engine.py): hash pseudonyms, redaction labels,
full masking with pseudonymize-type carve-outs, smart per-type partial
masks, custom per-type rules, and the right-to-left splice rewrite.

These functions are pure and deterministic; the Spark stage applies
them inside pandas UDFs, and the md5 pseudonym (A1) doubles as the
stable mention key for the KG (matches Spark's built-in `md5()` +
`substring()` so the same key is computable natively).
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional
from urllib.parse import urlparse, urlunparse

from redactify_spark import config as C

_MASK = C.ANON_CONFIG["partial_mask_char"]
_HASH_LEN = C.ANON_CONFIG["hash_length"]


def _hash6(value: str, length: int = _HASH_LEN) -> str:
    algo = C.ANON_CONFIG["hash_algorithm"]
    h = hashlib.sha256 if algo == "sha256" else hashlib.md5
    return h(value.encode("utf-8")).hexdigest()[:length]


def pseudonymize_value(value: str, entity_type: str) -> str:
    """A1 (anonymization_engine.py:229-242): [TYPE-md5(value)[:6]]."""
    return f"[{entity_type.upper()}-{_hash6(value)}]"


def redact_value(entity_type: str) -> str:
    """A2 (:205)."""
    return f"[REDACTED-{entity_type}]"


def full_mask_token(token: str, entity_type: str) -> str:
    """A3 (:244-248)."""
    if entity_type and entity_type.upper() in C.PSEUDONYMIZE_TYPES:
        return pseudonymize_value(token, entity_type)
    return "*" * len(token)


def mask_email(email: str) -> str:
    """A5 (:276-303)."""
    try:
        local, domain = email.split("@")
    except ValueError:
        return partial_mask_token(email)
    if len(local) > 4:
        local_masked = local[0:2] + _MASK * (len(local) - 4) + local[-2:]
    else:
        local_masked = local[0] + _MASK * (len(local) - 1)
    parts = domain.split(".")
    if len(parts) > 1:
        tld = parts[-1]
        name = ".".join(parts[:-1])
        if len(name) > 5:
            dm = name[0:2] + _MASK * (len(name) - 2)
        else:
            dm = _MASK * len(name)
        masked_domain = dm + "." + tld
    else:
        masked_domain = _MASK * len(domain)
    return local_masked + "@" + masked_domain


def mask_phone(phone: str) -> str:
    """A6 (:305-347): keep last 4 digits, re-interleave original layout."""
    digits_only = re.sub(r"[^0-9+]", "", phone)
    if len(digits_only) <= 4:
        return _MASK * len(phone)
    if digits_only.startswith("+"):
        prefix_end = digits_only.find("9")
        if prefix_end != -1 and prefix_end < 4:
            prefix = digits_only[:prefix_end + 1]
            main = digits_only[prefix_end + 1:]
        else:
            prefix = "+"
            main = digits_only[1:]
    else:
        prefix, main = "", digits_only
    if len(main) > 4:
        masked_main = _MASK * (len(main) - 4) + main[-4:]
    else:
        masked_main = _MASK * len(main)
    masked_digits = prefix + masked_main
    result, di = "", 0
    for ch in phone:
        if ch.isdigit() or ch == "+":
            result += masked_digits[di] if di < len(masked_digits) else _MASK
            di += 1
        else:
            result += ch
    return result


def mask_credit_card(card: str) -> str:
    """A7 (:349-372)."""
    digits = re.sub(r"[^0-9]", "", card)
    if len(digits) >= 4:
        masked = _MASK * (len(digits) - 4) + digits[-4:]
    else:
        masked = _MASK * len(digits)
    result, di = "", 0
    for ch in card:
        if ch.isdigit():
            result += masked[di] if di < len(masked) else _MASK
            di += 1
        else:
            result += ch
    return result


def mask_ssn(ssn: str) -> str:
    """A8 (:374-380)."""
    if len(ssn) > 4:
        return _MASK * (len(ssn) - 4) + ssn[-4:]
    return _MASK * len(ssn)


def mask_sensitive_token(token: str) -> str:
    """A9 (:382-388)."""
    if len(token) > 8:
        return token[:2] + _MASK * (len(token) - 2)
    return _MASK * len(token)


def mask_date(date: str) -> str:
    """A10 (:390-410): mask a 4-digit year, preserve separators."""
    if len(date) > 6 and re.search(r"\d{4}", date):
        parts = re.split(r"[-/\s:]", date)
        if len(parts) > 2 and len(parts[0]) == 4:
            parts[0] = _MASK * 4
            seps = re.findall(r"[-/\s:]", date)
            rebuilt = parts[0]
            for i, part in enumerate(parts[1:]):
                rebuilt += (seps[i] if i < len(seps) else "-") + part
            return rebuilt
        elif len(parts) > 2 and len(parts[-1]) == 4:
            return re.sub(r"\d{4}", _MASK * 4, date)
    return partial_mask_token(date)


def mask_url(url: str) -> str:
    """A11 (:412-466)."""
    try:
        parsed = urlparse(url)
    except Exception:
        return partial_mask_token(url)
    scheme, netloc, path = parsed.scheme, parsed.netloc, parsed.path
    params, query, fragment = parsed.params, parsed.query, parsed.fragment
    if ":" in netloc:
        domain, port = netloc.split(":", 1)
        port = ":" + port
    else:
        domain, port = netloc, ""
    parts = domain.split(".")
    masked_parts = []
    for i, part in enumerate(parts):
        if i == len(parts) - 1 and len(parts) > 1:
            masked_parts.append(part)  # keep TLD
        elif len(part) > 3:
            masked_parts.append(part[0:2] + _MASK * (len(part) - 2))
        else:
            masked_parts.append(_MASK * len(part))
    masked_netloc = ".".join(masked_parts) + port
    if path:
        segs = []
        for seg in path.split("/"):
            if not seg:
                segs.append(seg)
            elif seg.lower() in C.URL_PATH_WHITELIST:
                segs.append(seg)
            elif len(seg) >= 5:
                segs.append(seg[0:2] + _MASK * (len(seg) - 2))
            else:
                segs.append(_MASK * len(seg))
        masked_path = "/".join(segs)
    else:
        masked_path = path
    return urlunparse((scheme, masked_netloc, masked_path, params, query,
                       fragment))


def partial_mask_token(token: str) -> str:
    """A12 generic partial mask (:468-480)."""
    n = len(token)
    if n <= 2:
        return _MASK * n
    elif n <= 5:
        return token[0] + _MASK * (n - 1)
    elif n <= 10:
        return token[0:2] + _MASK * (n - 4) + token[-2:]
    return token[0:2] + _MASK * (n - 5) + token[-3:]


def smart_partial_mask(text: str, entity_type: str) -> str:
    """A4 dispatcher (:250-274)."""
    if not text:
        return text
    t = entity_type.upper() if entity_type else ""
    if t == "EMAIL_ADDRESS":
        return mask_email(text)
    if t == "PHONE_NUMBER":
        return mask_phone(text)
    if t == "URL":
        return mask_url(text)
    if t == "CREDIT_CARD":
        return mask_credit_card(text)
    if t == "SSN":
        return mask_ssn(text)
    if t in ("PASSWORD", "API_KEY", "AUTHENTICATION_TOKEN"):
        return mask_sensitive_token(text)
    if t == "DATE_TIME":
        return mask_date(text)
    return partial_mask_token(text)


def custom_anonymize(entity_text: str, entity_type: str) -> str:
    """A13 (:482-497)."""
    t = entity_type.upper() if entity_type else ""
    if t in ("MEDICAL_RECORD_NUMBER", "PATIENT_ID"):
        return f"[MRN-{_hash6(entity_text)}]"
    if t in ("CASE_NUMBER", "LEGAL_CITATION"):
        return f"[CASE-{_hash6(entity_text)}]"
    if t in ("ACCOUNT_NUMBER", "ROUTING_NUMBER"):
        return f"[ACCT-{_hash6(entity_text)}]"
    if t in ("API_KEY", "AUTHENTICATION_TOKEN"):
        return f"[TOKEN-{_hash6(entity_text, 8)}]"
    return pseudonymize_value(entity_text, entity_type)


def anonymize_entity(entity_text: str, entity_type: str, strategy: str,
                     preserve_format: bool,
                     custom_rules: Optional[dict[str, str]] = None) -> str:
    """Strategy dispatch (:187-211)."""
    if custom_rules and entity_type in custom_rules:
        return custom_rules[entity_type]
    if strategy == "pseudonymize":
        return pseudonymize_value(entity_text, entity_type)
    if strategy == "mask":
        if preserve_format:
            return smart_partial_mask(entity_text, entity_type)
        return full_mask_token(entity_text, entity_type)
    if strategy == "redact":
        return redact_value(entity_type)
    if strategy == "custom":
        return custom_anonymize(entity_text, entity_type)
    return pseudonymize_value(entity_text, entity_type)


def anonymize_text(text: str, entities: list[dict],
                   strategy: str = "pseudonymize",
                   preserve_format: bool = True,
                   custom_rules: Optional[dict[str, str]] = None) -> str:
    """A14 splice rewrite (:116-152): apply replacements right-to-left so
    earlier offsets stay valid.  Note the reference quirk: after P6 dedup a
    repeated surface has ONE span only, so other occurrences are untouched.
    """
    if not text:
        return ""
    out = text
    for e in sorted(entities, key=lambda x: x.get("start", 0), reverse=True):
        s, en = e.get("start", 0), e.get("end", 0)
        etype = e.get("entity_group", "UNKNOWN")
        original = text[s:en] if s < len(text) and en <= len(text) else ""
        if not original:
            continue
        replacement = anonymize_entity(original, etype, strategy,
                                       preserve_format, custom_rules)
        out = out[:s] + replacement + out[en:]
    return out


def anonymize_batch(texts: list[str], entities_list: list[list[dict]],
                    strategy: str = "pseudonymize",
                    preserve_format: bool = True) -> list[str]:
    """A15 (:499-526)."""
    if len(texts) != len(entities_list):
        raise ValueError("texts and entity lists must align")
    return [anonymize_text(t, es, strategy, preserve_format)
            for t, es in zip(texts, entities_list)]
