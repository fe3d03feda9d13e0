"""Golden smoke-fixture framework (reference tests/test_smoke_sources.py
pattern): each tests/fixtures/sources/<name>/ dir auto-parametrizes;
every key of expected.json is asserted against the parser output."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from polla_spark.errors import ParseError
from polla_spark.sources.pozos import parse_openloto_html, parse_polla_html

FIXTURES = Path(__file__).parent / "fixtures" / "sources"
PARSERS = {"openloto": parse_openloto_html, "polla": parse_polla_html}


def fixture_dirs():
    return sorted(d for d in FIXTURES.iterdir() if (d / "page.html").exists())


@pytest.mark.parametrize("fixture_dir", fixture_dirs(), ids=lambda d: d.name)
def test_smoke_source(fixture_dir):
    html = (fixture_dir / "page.html").read_text(encoding="utf-8")
    expected = json.loads((fixture_dir / "expected.json").read_text(encoding="utf-8"))
    payload = PARSERS[fixture_dir.name](html)
    for key, want in expected.items():
        assert payload[key] == want, f"{fixture_dir.name}.{key}"
    assert len(payload["sha256"]) == 64


def test_openloto_excludes_total():
    html = (FIXTURES / "openloto" / "page.html").read_text(encoding="utf-8")
    assert "Total estimado" not in parse_openloto_html(html)["montos"]


def test_script_content_ignored():
    html = (FIXTURES / "openloto" / "page.html").read_text(encoding="utf-8")
    assert parse_openloto_html(html)["montos"]["Loto Clásico"] == 690_000_000


def test_malformed_page_raises():
    with pytest.raises(ParseError):
        parse_openloto_html("<body><p>Loto Clásico $ACUMULADO Recargado $N/A</p></body>")


def test_zero_amounts_raise():
    with pytest.raises(ParseError):
        parse_polla_html("<body><ul><li class='other'>nothing here</li></ul></body>")


def test_invalid_date_still_parses_amounts():
    html = """<body><p>Loto Cl&aacute;sico $690</p>
    <p>Fecha Pr&oacute;ximo Sorteo: 32 de feprerillo de 2025</p></body>"""
    payload = parse_openloto_html(html)
    assert payload["montos"]["Loto Clásico"] == 690_000_000
    assert payload["fecha"] is None
