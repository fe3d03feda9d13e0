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


def test_polla_injected_fetcher_e2e():
    """A browser fetcher injected into get_pozo_polla drives the full
    render->parse path (no NotImplementedError, no scrapling needed)."""
    from polla_spark.sources.pozos import RenderedPage, get_pozo_polla

    html = (FIXTURES / "polla" / "page.html").read_text(encoding="utf-8")
    expected = json.loads(
        (FIXTURES / "polla" / "expected.json").read_text(encoding="utf-8")
    )
    calls: list[str] = []

    def fake_fetcher(url: str) -> RenderedPage:
        calls.append(url)
        return RenderedPage(status=200, html=html)

    payload = get_pozo_polla("https://www.polla.cl/es/", fetcher=fake_fetcher)
    assert calls == ["https://www.polla.cl/es/"]
    assert payload["montos"] == expected["montos"]


def test_polla_fetcher_retries_then_fails():
    from polla_spark.sources.pozos import RenderedPage, get_pozo_polla

    calls: list[int] = []

    def bad_fetcher(url: str) -> RenderedPage:
        calls.append(1)
        return RenderedPage(status=503, html="")

    with pytest.raises(ParseError, match="after 3 attempts"):
        get_pozo_polla("https://www.polla.cl/es/", retries=3, fetcher=bad_fetcher)
    assert len(calls) == 3


def test_nested_markup_inside_prize_span():
    """Nested elements inside a .prize span stay in prize scope, and
    text after the span closes is out of scope (tag-stack tracking)."""
    html = """<body><ul>
    <li class="sub-game"><img src="/img/loto_logo.png"/>
      <span class="prize"><b>1.200</b><i> Millones</i></span>
      <span>9.999 not a prize</span>
    </li></ul></body>"""
    payload = parse_polla_html(html)
    assert payload["montos"] == {"Loto Clásico": 1_200_000_000}


def test_user_agent_env_override(monkeypatch):
    from polla_spark.sources.net import DEFAULT_UA, effective_user_agent

    monkeypatch.delenv("POLLA_USER_AGENT", raising=False)
    assert effective_user_agent(None) == DEFAULT_UA
    monkeypatch.setenv("POLLA_USER_AGENT", "EnvBot/2.0")
    assert effective_user_agent(None) == "EnvBot/2.0"
    assert effective_user_agent("Explicit/1.0") == "Explicit/1.0"
