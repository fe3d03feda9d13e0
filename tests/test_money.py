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


def _shape_corpus() -> list[str]:
    """Deterministic sample across every shape family the parser sees:
    plain ints, dot groupings, comma/dot decimals, mixed groupings,
    every unit spelling, currency signs, and malformed strings."""
    import random

    rng = random.Random(42)
    out: list[str] = []
    for _ in range(40):
        n = rng.randint(1, 10**9)
        grouped = f"{n:,}".replace(",", ".")
        out += [str(n), grouped, f"$ {grouped}", f"{grouped} MM"]
    for _ in range(30):
        i, f2 = rng.randint(0, 999), rng.randint(0, 99)
        out += [f"{i},{f2:02d}", f"{i},{f2:02d} millones", f"{i}.{f2:02d}"]
    for _ in range(15):
        i, f3 = rng.randint(1, 999), rng.randint(0, 999)
        out += [f"{i},{f3:03d}", f"1.{f3:03d},{rng.randint(0, 99):02d}"]
    for _ in range(10):
        n = rng.randint(1, 10**6)
        out += [f"{n} mil", f"{n}m", f"{n} M"]
    out += ["", " ", "$", "abc", "1.2.3.4", "1.23.456", "12,3456789", "1..2",
            "5m m", "mil", "690 mm extra", "1,234,567"]
    return out


def test_native_fast_path_matches_scalar(spark):
    """Wherever the native expression claims a value it must equal the
    scalar contract; it must claim every golden clean shape and never
    claim a known-error input."""
    from pyspark.sql import functions as F

    from polla_spark.functions.money import money_native_clp

    corpus = sorted(set(_shape_corpus() + [r for r, _ in GOLDEN] + ERRORS))
    df = spark.createDataFrame([(r,) for r in corpus], "raw string")
    got = df.select("raw", money_native_clp(F.col("raw")).alias("n")).collect()
    claimed = {}
    for r in got:
        if r["n"] is not None:
            claimed[r["raw"]] = r["n"]
            assert r["n"] == parse_millones_clp(r["raw"]), r["raw"]
    for raw, expected in GOLDEN:
        assert claimed.get(raw) == expected, f"native must handle golden {raw!r}"
    for raw in ERRORS:
        assert raw not in claimed


def test_native_path_has_no_python_eval(spark):
    """The clean branch is pure JVM: no EvalPython node in its plan.
    The frame dispatcher carries exactly one Arrow node — on the dirty
    branch only."""
    from pyspark.sql import functions as F

    from polla_spark.functions.money import money_native_clp, money_parse_frame

    df = spark.createDataFrame([("690",), ("4.300",)], "raw string")
    plan = (
        df.select(money_native_clp(F.col("raw")).alias("clp"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "pythonUDF" not in plan

    fplan = (
        money_parse_frame(df, "raw")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert fplan.count("ArrowEvalPython") == 1


def test_money_parse_frame_equals_kernel(spark):
    """Frame dispatch (clean->JVM, dirty->Arrow) returns exactly what
    the kernel-only path returns, for every shape."""
    from pyspark.sql import functions as F

    from polla_spark.functions.money import _money_udf, money_parse_frame

    corpus = sorted(set(_shape_corpus()))
    df = spark.createDataFrame([(r,) for r in corpus], "raw string")
    got = {
        r["raw"]: (r["clp"], r["parse_error"] is not None)
        for r in money_parse_frame(df, "raw").select("raw", "parsed.*").collect()
    }
    want = {
        r["raw"]: (r["p"]["clp"], r["p"]["parse_error"] is not None)
        for r in df.withColumn("p", _money_udf(F.col("raw"))).collect()
    }
    assert got == want


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
