"""Golden Spanish date / sorteo extraction (FIXTURES.md §6)."""

from __future__ import annotations

import datetime as dt

import pytest

from polla_spark.functions.dates import extract_proximo_info, parse_spanish_date

GOLDEN = [
    ("Resultados Sorteo : 5417 Fecha : abril 26, 2026", 5417, dt.date(2026, 4, 26)),
    (
        "Próximo sorteo número 5418, será sorteado el martes, 28 de abril del 2026.",
        5418,
        dt.date(2026, 4, 28),
    ),
    ("Sorteo #24298 abril 27, 2026", 24298, dt.date(2026, 4, 27)),
    ("Fecha Próximo Sorteo: martes 16 de septiembre de 2025", None, dt.date(2025, 9, 16)),
    ("Fecha Próximo Sorteo: 32 de feprerillo de 2025", None, None),
]


@pytest.mark.parametrize("text,sorteo,fecha", GOLDEN)
def test_scalar(text, sorteo, fecha):
    got_sorteo, got_fecha = extract_proximo_info(text)
    assert got_sorteo == sorteo
    assert got_fecha == fecha


def test_setiembre_variant():
    assert parse_spanish_date("1 de setiembre de 2025") == dt.date(2025, 9, 1)


def test_impossible_day_is_null():
    assert parse_spanish_date("31 de febrero de 2025") is None


def test_native_columns_parity(spark):
    from pyspark.sql import functions as F

    from polla_spark.functions.dates import fecha_col, sorteo_col

    df = spark.createDataFrame([(t,) for t, _, _ in GOLDEN], "text string")
    rows = df.select(
        "text",
        sorteo_col(F.col("text")).alias("sorteo"),
        fecha_col(F.col("text")).alias("fecha"),
    ).collect()
    by_text = {r["text"]: r for r in rows}
    for text, sorteo, fecha in GOLDEN:
        assert by_text[text]["sorteo"] == sorteo, text
        assert by_text[text]["fecha"] == fecha, text
