"""Transformation-plane tests: masker semantics (reference fixture cases),
pipeline dispatch, type conversion, hashing properties."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions import masking
from sqlserver_pg_cdc_spark.operators.transform import (
    TransformationPipeline,
    conditional,
    conversion_failed,
    convert_type,
    convert_type_keep_original,
    create_gdpr_pipeline,
    create_pii_pipeline,
)


def _apply_one(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(fn("v").alias("out")).collect()]


EMAIL_CASES = [
    ("user@example.com", "u***@example.com"),
    ("john.doe@company.com", "j*******@company.com"),
    ("user@@example.com", "*****************"),  # malformed -> full mask
    ("a@ex.com", "a@ex.com"),  # 1-char local -> unchanged
    ("noatsign", "noatsign"),  # no @ -> unchanged
    ("@example.com", "************"),  # empty local -> full mask
    ("user@", "*****"),  # empty domain -> full mask
    (None, None),
]


def test_mask_email(spark):
    vals, want = zip(*EMAIL_CASES)
    assert _apply_one(spark, masking.mask_email, vals) == list(want)


PHONE_CASES = [
    ("(123) 456-7890", "(***) ***-7890"),
    ("+1-555-123-4567", "+*-***-***-4567"),
    ("123", "123"),  # <4 digits -> unchanged
    ("5551234567", "******4567"),
    (None, None),
]


def test_mask_phone(spark):
    vals, want = zip(*PHONE_CASES)
    assert _apply_one(spark, masking.mask_phone, vals) == list(want)


SSN_CASES = [
    ("123-45-6789", "***-**-6789"),
    ("123456789", "*****6789"),
    ("12345", "*****"),  # wrong length -> full mask of original
    (None, None),
]


def test_mask_ssn(spark):
    vals, want = zip(*SSN_CASES)
    assert _apply_one(spark, masking.mask_ssn, vals) == list(want)


CC_CASES = [
    ("4532-1234-5678-9010", "****-****-****-9010"),
    ("4532123456789010", "************9010"),
    ("1234", "****"),  # too short -> full mask
    (None, None),
]


def test_mask_credit_card(spark):
    vals, want = zip(*CC_CASES)
    assert _apply_one(spark, masking.mask_credit_card, vals) == list(want)


IP_CASES = [
    ("192.168.1.100", "192.***.*.***"),
    ("10.0.0.1", "10.***.*.***"),
    (
        "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
        "2001:0db8:85a3:0000:****:****:****:****",
    ),
    ("fe80::1", "fe80:0000:0000:0000:****:****:****:****"),
    (None, None),
]


def test_mask_ip(spark):
    vals, want = zip(*IP_CASES)
    assert _apply_one(spark, masking.mask_ip, vals) == list(want)


def test_luhn(spark):
    # 4532015112830366 is Luhn-valid; flipping a digit breaks it
    got = _apply_one_bool(spark, ["4532015112830366", "4532015112830367"])
    assert got == [True, False]


def _apply_one_bool(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(masking.luhn_check("v").alias("out")).collect()]


def test_hash_value_matches_hashlib(spark):
    salt = "pepper-123"
    val = "hello"
    [got] = _apply_one(spark, lambda c: masking.hash_value(c, salt), [val])
    assert got == hashlib.sha256((salt + val).encode()).hexdigest()
    [trunc] = _apply_one(spark, lambda c: masking.hash_value(c, salt, truncate=16), [val])
    assert trunc == got[:16]
    [blake] = _apply_one(
        spark, lambda c: masking.hash_value(c, salt, algorithm="blake2b"), [val]
    )
    assert blake == hashlib.blake2b((salt + val).encode()).hexdigest()


def test_hash_value_rejects_weak_algo_and_short_salt(spark):
    with pytest.raises(ValueError):
        masking.hash_value(F.col("x"), "longenough", algorithm="md5")
    with pytest.raises(ValueError):
        masking.hash_value(F.col("x"), "short")


def test_pii_pipeline_dispatch(spark):
    df = spark.createDataFrame(
        [("user@example.com", "(123) 456-7890", "123-45-6789", "42", "keepme")],
        "email string, phone_number string, ssn string, customer_id string, note string",
    )
    out = create_pii_pipeline("salt12345").apply(df).collect()[0]
    assert out["email"] == "u***@example.com"
    assert out["phone_number"] == "(***) ***-7890"
    assert out["ssn"] == "***-**-6789"
    assert out["customer_id"] == hashlib.sha256(b"salt1234542").hexdigest()[:16]
    assert out["note"] == "keepme"  # non-matching column untouched


def test_gdpr_pipeline_hashes_names(spark):
    df = spark.createDataFrame([("Alice", 7)], "name string, other int")
    out = create_gdpr_pipeline("salt12345").apply(df).collect()[0]
    assert out["name"] == hashlib.sha256(b"salt12345Alice").hexdigest()
    assert out["other"] == 7


def test_convert_type_modes(spark):
    df = spark.createDataFrame(
        [("12.50",), ("oops",), (None,)], "v string"
    )
    rows = df.select(
        convert_type("v", "decimal(10,2)").alias("strict"),
        convert_type_keep_original("v", "decimal(10,2)").alias("keep"),
        conversion_failed("v", "decimal(10,2)").alias("err"),
    ).collect()
    assert [str(r["strict"]) if r["strict"] is not None else None for r in rows] == [
        "12.50",
        None,
        None,
    ]
    assert [r["keep"] for r in rows] == ["12.50", "oops", None]
    assert [r["err"] for r in rows] == [False, True, False]


def test_conditional_transform(spark):
    df = spark.createDataFrame([("secret", 1), ("public", 0)], "v string, flag int")
    fn = conditional(
        F.col("flag") == 1,
        lambda c: F.lit("<redacted>"),
    )
    got = [r["v"] for r in df.withColumn("v", fn(F.col("v"))).collect()]
    assert got == ["<redacted>", "public"]


def test_mask_email_sql_parity(spark, duck):
    """The DuckDB fragment must reproduce the Spark expression exactly."""
    vals = [v for v, _ in EMAIL_CASES if v is not None]
    got = _apply_one(spark, masking.mask_email, vals)
    quoted = ", ".join(f"('{v}')" for v in vals)
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT {masking.mask_email_sql('v')} FROM (VALUES {quoted}) t(v)"
        ).fetchall()
    ]
    assert got == want


def test_mask_ssn_sql_parity(spark, duck):
    vals = [v for v, _ in SSN_CASES if v is not None]
    got = _apply_one(spark, masking.mask_ssn, vals)
    quoted = ", ".join(f"('{v}')" for v in vals)
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT {masking.mask_ssn_sql('v')} FROM (VALUES {quoted}) t(v)"
        ).fetchall()
    ]
    assert got == want
