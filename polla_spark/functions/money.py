"""Spanish "millones"-context monetary parser -> integer CLP.

Behavioral contract (golden cases in reference
tests/test_monetary_parser.py:7-55; semantics at
polla_app/sources/pozos.py:60-145):

* the page quotes amounts in MILLIONS: bare ``"690"`` means CLP
  690,000,000; explicit units override — ``MM``/``millones``/``M`` keep
  the x1e6 scale, trailing ``mil`` means x1e3;
* ``.`` and ``,`` are disambiguated as thousands-vs-decimal separators
  by 3-digit group validation: ``"4.300"`` -> 4300 (thousands) but
  ``"4,75"`` -> 4.75 (decimal); mixed ``"1.234,56"`` -> 1234.56;
  malformed groupings (``"1.2.3.4"``) are parse errors;
* empty / non-numeric input is a parse error.

Two surfaces:

* :func:`parse_millones_clp` — scalar, raises :class:`ParseError`
  (driver-side use and golden tests);
* :func:`money_parse_cols` — Spark-side Arrow-batched kernel that
  returns ``(clp BIGINT, parse_error STRING)`` columns. Errors become
  data, not task failures, so one malformed row cannot fail a 100 TB
  job (SURVEY.md §7.4#2); enforce aggregate guards downstream.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import ParseError

MILLION = 1_000_000
THOUSAND = 1_000

_GROUP_LEN = 3


def _split_unit(text: str) -> tuple[str, int]:
    """Peel an optional unit suffix off the lowercased raw string.

    Unit detection happens before currency/whitespace stripping, in the
    same precedence order the golden cases pin down: MM / "millones"
    first, then "mil", then a bare trailing "m".
    """
    scale = MILLION
    if text.endswith("mm") or "millones" in text:
        text = text.replace("millones", "").replace("mm", "")
    elif text.endswith("mil"):
        scale = THOUSAND
        text = text[: -len("mil")]
    elif text.endswith("m"):
        text = text.rstrip("m")
    return text.strip(), scale


def _degroup(num: str) -> str:
    """Resolve ``.``/``,`` roles; return a float()-ready string.

    Raises ValueError on malformed groupings. Mirrors the reference's
    decision tree (pozos.py:95-134) exactly — including its quirks —
    because the golden tests are the contract.
    """
    dotted, commaed = "." in num, "," in num
    if dotted and commaed:
        # dots must be 3-digit thousands groups; the final dot-group's
        # prefix (before the comma) must also be 3 digits
        segs = num.split(".")
        interior_ok = all(len(s) == _GROUP_LEN for s in segs[1:-1])
        tail_ok = len(segs[-1].partition(",")[0]) == _GROUP_LEN
        if not (interior_ok and tail_ok):
            raise ValueError(f"bad mixed grouping: {num!r}")
        return num.replace(".", "").replace(",", ".")
    for sep in (",", "."):
        if sep not in num:
            continue
        segs = num.split(sep)
        if len(segs) > 2:
            if any(len(s) != _GROUP_LEN for s in segs[1:]):
                raise ValueError(f"bad repeated separator: {num!r}")
            return "".join(segs)
        if len(segs[1]) == _GROUP_LEN:
            return "".join(segs)  # lone 3-digit group reads as thousands
        return segs[0] + "." + segs[1] if sep == "," else num
    return num


def parse_millones_clp(raw: str | None) -> int:
    """Scalar parse; raises ParseError exactly where the reference does.

    >>> parse_millones_clp("690")          # bare = millones context
    690000000
    >>> parse_millones_clp("4.300")        # dot = thousands grouping
    4300000000
    >>> parse_millones_clp("4,75")         # comma = decimal
    4750000
    >>> parse_millones_clp("1.234,56")     # mixed grouping
    1234560000
    >>> parse_millones_clp("500 mil")      # explicit unit overrides
    500000
    >>> parse_millones_clp("1.2.3.4")
    Traceback (most recent call last):
        ...
    polla_spark.errors.ParseError: Unable to parse monetary value: 1.2.3.4
    """
    text = (raw or "").strip().lower()
    if not text:
        raise ParseError("Empty monetary value", context={"raw": raw})
    text, scale = _split_unit(text)
    text = text.replace("$", "").replace(" ", "")
    try:
        value = float(_degroup(text))
    except ValueError as exc:
        raise ParseError(
            f"Unable to parse monetary value: {raw}",
            original_error=exc,
            context={"raw": raw},
        ) from exc
    return int(round(value * scale))


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_RESULT_TYPE = T.StructType(
    [
        T.StructField("clp", T.LongType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


def _parse_batch(series: pd.Series) -> pd.DataFrame:
    clp: list[int | None] = []
    errs: list[str | None] = []
    for raw in series:
        try:
            clp.append(parse_millones_clp(raw))
            errs.append(None)
        except ParseError as exc:
            clp.append(None)
            errs.append(exc.message)
    return pd.DataFrame({"clp": pd.array(clp, dtype="Int64"), "parse_error": errs})


@F.pandas_udf(_RESULT_TYPE)
def _money_udf(series: pd.Series) -> pd.DataFrame:
    # Arrow-batched: one Python call per ~10k-row batch, not per row.
    return _parse_batch(series)


# ---------------------------------------------------------------------------
# Native-expression fast path
# ---------------------------------------------------------------------------
#
# The unambiguous shapes — the overwhelming majority of real page text —
# parse as a pure JVM expression chain (rlike dispatch -> regexp_replace
# degrouping -> DECIMAL arithmetic), keeping the hot path inside
# whole-stage codegen. Only rows the chain cannot prove unambiguous
# (malformed groupings, units in odd positions, non-integral products)
# fall back to the Arrow kernel. Contract parity is pinned by running
# every golden case through both paths (tests/test_money.py).

def money_native_clp(raw: Column) -> Column:
    """BIGINT CLP for natively-parseable shapes; NULL when the row
    needs the Python kernel (which also decides real errors).

    Mirrors :func:`parse_millones_clp` step-for-step: unit peel in the
    same precedence order (MM/millones anywhere > trailing "mil" >
    trailing "m"s), then ``$``/space strip, then the dot/comma
    degrouping decision tree — but only for the shapes whose reading
    is structurally unambiguous. DECIMAL(28,10) arithmetic keeps the
    product exact; a non-integral product (possible only for "mil"
    with >3 decimals) is deliberately left to the kernel so the two
    paths can never disagree on rounding.
    """
    s = F.lower(F.trim(F.coalesce(raw, F.lit(""))))
    has_mm = s.rlike("mm$") | s.contains("millones")
    ends_mil = ~has_mm & s.rlike("mil$")
    ends_m = ~has_mm & ~ends_mil & s.rlike("m$")
    body = (
        F.when(has_mm, F.regexp_replace(F.regexp_replace(s, "millones", ""), "mm", ""))
        .when(ends_mil, s.substr(F.lit(1), F.length(s) - 3))
        .when(ends_m, F.regexp_replace(s, "m+$", ""))
        .otherwise(s)
    )
    # scalar path strips exactly '$' and plain spaces after unit peel
    clean = F.regexp_replace(F.trim(body), "[$ ]", "")
    scale = F.when(ends_mil, F.lit(THOUSAND)).otherwise(F.lit(MILLION))

    digits = clean.rlike("^[0-9]{1,12}$")
    dot_grouped = clean.rlike("^[0-9]{1,3}(\\.[0-9]{3}){1,3}$")
    dot_decimal = clean.rlike("^[0-9]{1,9}\\.[0-9]{1,6}$") & ~clean.rlike(
        "^[0-9]+\\.[0-9]{3}$"
    )
    comma_thousands = clean.rlike("^[0-9]{1,9},[0-9]{3}$")
    comma_decimal = clean.rlike("^[0-9]{1,9},[0-9]{1,6}$") & ~comma_thousands
    mixed = clean.rlike("^[0-9]{1,3}(\\.[0-9]{3}){1,3},[0-9]{1,6}$")

    num = (
        F.when(digits, clean)
        .when(dot_grouped, F.regexp_replace(clean, "\\.", ""))
        .when(dot_decimal, clean)
        .when(comma_thousands, F.regexp_replace(clean, ",", ""))
        .when(comma_decimal, F.regexp_replace(clean, ",", "."))
        # mixed: drop the dot groups, the comma becomes the decimal point
        .when(mixed, F.regexp_replace(F.regexp_replace(clean, "\\.", ""), ",", "."))
    )
    val = num.cast("decimal(28,10)") * scale
    integral = val == F.floor(val).cast("decimal(28,10)")
    return F.when(val.isNotNull() & integral, F.floor(val).cast("long"))


def money_parse_cols(raw: Column) -> Column:
    """``struct(clp BIGINT, parse_error STRING)`` for a raw money string.

    Dispatch: native expression result when the shape is unambiguous;
    the Arrow kernel otherwise. The kernel's *input* is masked to NULL
    for natively-parsed rows, so the Python batch does no regex work
    for them (the exchange itself still carries the batch — use
    :func:`money_parse_frame` to keep clean rows out of the Python
    boundary entirely).

    Usage::

        df.withColumn("parsed", money_parse_cols(F.col("raw")))
          .select("*", "parsed.clp", "parsed.parse_error")
    """
    native = money_native_clp(raw)
    fallback = _money_udf(F.when(native.isNull(), raw))
    return F.when(
        native.isNotNull(),
        F.struct(
            native.alias("clp"), F.lit(None).cast("string").alias("parse_error")
        ),
    ).otherwise(fallback)


def money_parse_frame(df, raw_col: str, out_col: str = "parsed"):
    """Frame-level dispatch: clean rows take the pure-JVM branch (zero
    Python eval — the plan for that branch contains no EvalPython
    node); only rows the native chain rejects cross the Arrow boundary.
    The union preserves every input column plus ``out_col``.

    This is the 100 TB shape: Python cost scales with the *dirty* row
    count, not the corpus.
    """
    native = money_native_clp(F.col(raw_col))
    tagged = df.withColumn("_native_clp", native)
    clean = tagged.filter(F.col("_native_clp").isNotNull()).withColumn(
        out_col,
        F.struct(
            F.col("_native_clp").alias("clp"),
            F.lit(None).cast("string").alias("parse_error"),
        ),
    )
    dirty = tagged.filter(F.col("_native_clp").isNull()).withColumn(
        out_col, _money_udf(F.col(raw_col))
    )
    return clean.unionByName(dirty).drop("_native_clp")
