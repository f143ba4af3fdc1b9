"""Native column expressions vs the pure kernel: byte parity per row."""

import pytest
from pyspark.sql import functions as F

from redactify_spark.detect import anonymize as A
from redactify_spark.functions import native as N

TOKENS = ["ab", "abcd", "abcde", "abcdefgh", "abcdefghij", "abcdefghijk",
          "john.doe@example.com", "123-45-6789", "x", "supersecretpw",
          "1234567890123456789012345"]
TYPES = ["PERSON", "SSN", "API_KEY", "FINANCIAL", "CREDENTIAL",
         "MEDICAL_RECORD_NUMBER", "CASE_NUMBER", "ACCOUNT_NUMBER",
         "AUTHENTICATION_TOKEN", "UNKNOWN_T"]


@pytest.fixture(scope="module")
def tok_df(spark):
    rows = [(t, ty) for t in TOKENS for ty in TYPES]
    return spark.createDataFrame(rows, "tok string, ty string").cache()


def _column_parity(df, expr, pyfn):
    rows = df.select("tok", "ty", expr.alias("got")).collect()
    for r in rows:
        assert r.got == pyfn(r.tok, r.ty), (r.tok, r.ty, r.got)


def test_pseudonymize_parity(tok_df):
    _column_parity(tok_df, N.pseudonymize_expr(F.col("tok"), F.col("ty")),
                   lambda t, ty: A.pseudonymize_value(t, ty))


def test_redact_parity(tok_df):
    _column_parity(tok_df, N.redact_expr(F.col("ty")),
                   lambda t, ty: A.redact_value(ty))


def test_full_mask_parity(tok_df):
    _column_parity(tok_df, N.full_mask_expr(F.col("tok"), F.col("ty")),
                   lambda t, ty: A.full_mask_token(t, ty))


def test_mask_ssn_parity(tok_df):
    _column_parity(tok_df, N.mask_ssn_expr(F.col("tok")),
                   lambda t, ty: A.mask_ssn(t))


def test_mask_sensitive_parity(tok_df):
    _column_parity(tok_df, N.mask_sensitive_token_expr(F.col("tok")),
                   lambda t, ty: A.mask_sensitive_token(t))


def test_partial_mask_parity(tok_df):
    _column_parity(tok_df, N.partial_mask_expr(F.col("tok")),
                   lambda t, ty: A.partial_mask_token(t))


def test_custom_anonymize_parity(tok_df):
    _column_parity(tok_df, N.custom_anonymize_expr(F.col("tok"), F.col("ty")),
                   lambda t, ty: A.custom_anonymize(t, ty))


def test_normalize_type_expr(spark):
    from redactify_spark.detect.kernel import normalize_full
    aliases = ["PER", "ORG", "GPE", "EMAIL", "CC", "MISC", "O",
               "NEWTYPE", "mrn", "passport"]
    df = spark.createDataFrame([(a,) for a in aliases], "ty string")
    rows = df.select("ty", N.normalize_type_expr(F.col("ty")).alias("canon")) \
             .collect()
    for r in rows:
        assert r.canon == normalize_full(r.ty), (r.ty, r.canon)


def test_codegen_no_python(spark, tok_df):
    """The native exprs must not introduce python UDF nodes."""
    plan = tok_df.select(
        N.pseudonymize_expr(F.col("tok"), F.col("ty")),
        N.partial_mask_expr(F.col("tok")))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan