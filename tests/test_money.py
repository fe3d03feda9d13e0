"""Golden monetary-parser contract (reference tests/test_monetary_parser.py:7-55).

The exact input->CLP pairs from FIXTURES.md §5 — the highest-risk
kernel (dot/comma disambiguation)."""

from __future__ import annotations

import pytest

from polla_spark.errors import ParseError
from polla_spark.functions.money import parse_millones_clp

GOLDEN = [
    ("690", 690_000_000),
    ("$ 690", 690_000_000),
    ("4.300", 4_300_000_000),
    ("4,75", 4_750_000),
    ("1.234,56", 1_234_560_000),
    ("4300", 4_300_000_000),
    ("0,5", 500_000),
    ("4.300 MM", 4_300_000_000),
    ("4,3 M", 4_300_000),
    ("1.000.000 Mil", 1_000_000_000),
    ("7500", 7_500_000_000),
    ("99.999", 99_999_000_000),
    ("0,1", 100_000),
    ("1.234.567", 1_234_567_000_000),
]

ERRORS = ["", " ", "$", "abc", "1.2.3.4"]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_golden(raw, expected):
    assert parse_millones_clp(raw) == expected


@pytest.mark.parametrize("raw", ERRORS)
def test_errors(raw):
    with pytest.raises(ParseError):
        parse_millones_clp(raw)


def test_none_is_error():
    with pytest.raises(ParseError):
        parse_millones_clp(None)


def test_millones_word_unit():
    assert parse_millones_clp("2 millones") == 2_000_000


def test_large_range():
    # amounts reach 1.2e12 (reference tests/test_monetary_parser.py:51)
    assert parse_millones_clp("1.200.000") == 1_200_000_000_000


def test_spark_vectorized_parity(spark):
    from pyspark.sql import functions as F

    from polla_spark.functions.money import money_parse_cols

    rows = [(r,) for r, _ in GOLDEN] + [(r,) for r in ERRORS]
    df = spark.createDataFrame(rows, "raw string")
    got = (
        df.withColumn("p", money_parse_cols(F.col("raw")))
        .select("raw", "p.clp", "p.parse_error")
        .collect()
    )
    by_raw = {r["raw"]: r for r in got}
    for raw, expected in GOLDEN:
        assert by_raw[raw]["clp"] == expected, raw
        assert by_raw[raw]["parse_error"] is None
    for raw in ERRORS:
        assert by_raw[raw]["clp"] is None
        assert by_raw[raw]["parse_error"] is not None
