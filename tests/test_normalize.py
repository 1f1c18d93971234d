"""Byte-parity of text normalization with the reference semantics.

Golden strings from the reference's own unit tests
(tests/unit_tests/test_util_functions.py:18-86 in vietexob/name-matching),
plus Unicode cases pinning down str.isnumeric() behavior.
"""

import pytest
from pyspark.sql import functions as F

from name_matching_spark.functions.normalize import (
    normalize_text,
    normalize_text_col,
    normalize_udf,
    preprocess_name,
    remove_or_extract_numeric_tokens,
)

GOLDEN = [
    # (text, remove_numbers, remove_stopwords, expected)
    ("THE CLIENT ### WAS BORN ON 02/01 YEAR 1989.", True, True, "CLIENT BORN YEAR"),
    ("THE CLIENT ### WAS BORN ON 02/01 YEAR 1989.", False, True, "CLIENT BORN 02 01 YEAR 1989"),
    ("THE CLIENT ### WAS BORN ON 02/01 YEAR 1989.", True, False, "THE CLIENT WAS BORN ON YEAR"),
    ("THE CLIENT ### WAS BORN ON 02/01 YEAR 1989.", False, False, "THE CLIENT WAS BORN ON 02 01 YEAR 1989"),
]

NUMERIC_CASES = [
    # standalone remove_or_extract semantics (reference
    # test_util_functions.py:61-86): '12-34' is a single NON-numeric token
    ("Token 1234 removed", "Token removed", "1234"),
    ("Token 12-34 removed", "Token 12-34 removed", ""),
    ("No numbers here", "No numbers here", ""),
    ("Token 123 and 456 and 789", "Token and and", "123 456 789"),
]

UNICODE_CASES = [
    "FRANÇOIS MÜLLER",
    "FULL WIDTH １２３ DIGITS",   # full-width digits are isnumeric
    "FRACTION ½ TOKEN",           # vulgar fraction is isnumeric
    "MIXED １２AB TOKEN",         # mixed is not numeric
    "J. WICK & CO, LTD",
]


@pytest.mark.parametrize("text,rn,rs,expected", GOLDEN)
def test_golden_python(text, rn, rs, expected):
    assert normalize_text(text, remove_numbers=rn, remove_stopwords=rs) == expected


def test_numeric_token_semantics():
    for text, removed, extracted in NUMERIC_CASES:
        assert remove_or_extract_numeric_tokens(text, is_removal=True) == removed
        assert remove_or_extract_numeric_tokens(text, is_removal=False) == extracted
    # full normalization splits '12-34' at the punctuation pass first
    assert (
        normalize_text("Token 12-34 removed", remove_numbers=True, remove_stopwords=False)
        == "Token removed"
    )


def test_preprocess_name_examples():
    assert preprocess_name("Hotel Cont'l") == "HOTEL CONT L"
    assert preprocess_name("J. Wick") == "J WICK"
    assert preprocess_name("O'Brien & Associates, Inc.") == "O BRIEN ASSOCIATES INC"


def test_stem_flag_returns_string():
    out = normalize_text("RUNNING QUICKLY THROUGH TREES", True, True, stem=True)
    assert isinstance(out, str) and len(out) > 0


def _run_col(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [
        r["out"]
        for r in df.select(normalize_text_col(F.col("text"), **kw).alias("out")).collect()
    ]


def test_native_column_parity(spark):
    texts = [t for t, *_ in GOLDEN] + [t for t, *_ in NUMERIC_CASES] + UNICODE_CASES
    for rn, rs in [(True, False), (False, False), (True, True), (False, True)]:
        expected = [normalize_text(t, remove_numbers=rn, remove_stopwords=rs) for t in texts]
        got = _run_col(spark, texts, remove_numbers=rn, remove_stopwords=rs)
        assert got == expected, (rn, rs)


def test_udf_parity(spark):
    texts = [t for t, *_ in GOLDEN] + UNICODE_CASES
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        r["out"]
        for r in df.select(normalize_udf(upper=True)(F.col("text")).alias("out")).collect()
    ]
    assert got == [normalize_text(t.upper(), True, False) for t in texts]
