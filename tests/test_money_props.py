"""Property-based money-parser tests (hypothesis): round-trip from
known-good Spanish formattings back to the integer CLP value, and
scalar == vectorized parity on arbitrary inputs. The reference has no
property testing (SURVEY.md §5) — golden cases only — so this is the
engine's added safety net for the '.'/',' disambiguation sharp edges
(reference pozos.py:95-134)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from polla_spark.errors import ParseError
from polla_spark.functions.money import _parse_batch, parse_millones_clp


def _group_thousands(n: int, sep: str) -> str:
    s = f"{n:,}"
    return s.replace(",", sep)


@given(st.integers(min_value=1, max_value=10**9))
@settings(max_examples=300, deadline=None)
def test_plain_and_dot_grouped_roundtrip(n):
    # bare numbers are in the page's "millones" context: x1e6
    assert parse_millones_clp(str(n)) == n * 1_000_000
    # Chilean thousands grouping with '.' (valid 3-digit groups)
    assert parse_millones_clp(_group_thousands(n, ".")) == n * 1_000_000
    # with currency sign and spaces
    assert parse_millones_clp(f"$ {_group_thousands(n, '.')}") == n * 1_000_000


@given(st.integers(min_value=1, max_value=10**6))
@settings(max_examples=200, deadline=None)
def test_explicit_units_override_context(n):
    # explicit units apply to the literal value (no double-scaling)
    assert parse_millones_clp(f"{n} millones") == n * 1_000_000
    assert parse_millones_clp(f"{n}mm") == n * 1_000_000
    assert parse_millones_clp(f"{n} mil") == n * 1_000


@given(
    st.integers(min_value=1, max_value=999),
    st.integers(min_value=0, max_value=99),
)
@settings(max_examples=200, deadline=None)
def test_decimal_comma_millones(intpart, frac):
    raw = f"{intpart},{frac:02d} millones"
    expected = int(round((intpart + frac / 100) * 1_000_000))
    assert parse_millones_clp(raw) == expected


@given(st.text(max_size=24))
@settings(max_examples=500, deadline=None)
def test_scalar_equals_vectorized_on_arbitrary_text(raw):
    """The pandas_udf batch kernel must agree with the scalar parser on
    EVERY input — including garbage: same value or same error-flag."""
    try:
        expected_val, expected_err = parse_millones_clp(raw), None
    except ParseError as exc:
        expected_val, expected_err = None, str(exc) or "error"
    out = _parse_batch(pd.Series([raw]))
    got_val = out["clp"].iloc[0]
    got_err = out["parse_error"].iloc[0]
    if expected_err is None:
        assert got_err is None and int(got_val) == expected_val
    else:
        assert got_err is not None and pd.isna(got_val)
