"""Google Sheets publish: row shaping, header-by-width, decision gate,
dry-run diff (reference polla_app/publish.py).

gspread is not in this image — the network client is injected
(``client=``) and defaults to an import-try; everything else (row
shapes, headers, gating, diff) is pure and tested offline. At scale
this sink is a ``foreachBatch``/collected-rows driver write: Sheets is
an API sink, never an executor-side effect.
"""

from __future__ import annotations

import difflib
import json
from pathlib import Path
from typing import Any

from ..errors import PublishError

CANONICAL_HEADER = [
    "sorteo", "fecha", "fuente", "categoria", "premio_clp", "ganadores",
    "pozos_proximo", "provenance",
]
POZOS_HEADER = ["sorteo", "fecha", "categoria", "pozo_clp"]
DISCREPANCY_HEADER = [
    "categoria", "consensus", "disagreeing", "max_deviation", "missing_sources",
]


def load_normalized(path: str | Path) -> list[dict[str, Any]]:
    rows = []
    for line in Path(path).read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if line:
            rows.append(json.loads(line))
    return rows


def record_to_rows(record: dict[str, Any]) -> list[list[Any]]:
    """Normalized record -> positional Sheets rows (publish.py:69-100).

    premios present -> 8-column canonical rows; otherwise 4-column
    pozos rows (one per category, insertion order preserved).
    """
    premios = record.get("premios") or []
    if premios:
        return [
            [
                record.get("sorteo"),
                record.get("fecha"),
                record.get("fuente"),
                p.get("categoria"),
                p.get("premio_clp"),
                p.get("ganadores"),
                json.dumps(record.get("pozos_proximo", {}), ensure_ascii=False),
                json.dumps(record.get("provenance", {}), ensure_ascii=False),
            ]
            for p in premios
        ]
    return [
        [record.get("sorteo"), record.get("fecha"), categoria, valor]
        for categoria, valor in (record.get("pozos_proximo") or {}).items()
    ]


def header_for(rows: list[list[Any]]) -> list[str]:
    """Header picked by row width (publish.py:136-150)."""
    if rows and len(rows[0]) == len(CANONICAL_HEADER):
        return CANONICAL_HEADER
    return POZOS_HEADER


def mismatch_rows(report: dict[str, Any]) -> list[list[Any]]:
    """Report mismatches -> 5-column rows with JSON cells (publish.py:103-116)."""
    out = []
    for m in report.get("mismatches", []):
        out.append(
            [
                m.get("categoria"),
                json.dumps(m.get("consensus", {}), ensure_ascii=False),
                json.dumps(m.get("disagreeing", {}), ensure_ascii=False),
                m.get("max_deviation"),
                json.dumps(m.get("missing_sources", []), ensure_ascii=False),
            ]
        )
    return out


def parse_publish_decision(report: dict[str, Any], summary: dict[str, Any] | None,
                           force_publish: bool) -> tuple[bool, str]:
    """Gate (publish.py:119-133): status startswith 'publish', summary
    override wins, force overrides quarantine."""
    if force_publish:
        return True, "force_publish"
    if summary is not None and "publish" in summary:
        return bool(summary["publish"]), str(summary.get("publish_reason", "summary"))
    status = str((report.get("decision") or {}).get("status", ""))
    return status.startswith("publish"), status


def unified_diff_vs_live(rows: list[list[Any]], live_values: list[list[Any]]) -> str:
    """Dry-run textual diff (publish.py:244-269)."""
    fmt = lambda rs: [", ".join("" if c is None else str(c) for c in r) for r in rs]  # noqa: E731
    return "\n".join(
        difflib.unified_diff(fmt(live_values), fmt(rows), "live", "local", lineterm="")
    )


def default_client():
    try:
        import gspread  # type: ignore

        return gspread
    except ImportError:
        return None


def publish_to_google_sheets(
    *,
    normalized_path: str | Path,
    comparison_report_path: str | Path,
    summary: dict[str, Any] | None = None,
    worksheet: str = "Normalized",
    discrepancy_tab: str = "Discrepancies",
    dry_run: bool = False,
    force_publish: bool = False,
    allow_quarantine: bool = False,
    client: Any = None,
    spreadsheet_key: str | None = None,
) -> dict[str, Any]:
    """Publish one normalized record (publish.py:196-299).

    Returns a result dict: {published, reason, rows, header, diff?}.
    The injected ``client`` must expose
    ``open_by_key(key).worksheet/add_worksheet -> ws`` with
    ``clear/update/get_all_values`` — the gspread surface.
    """
    records = load_normalized(normalized_path)
    if not records:
        raise RuntimeError(f"no normalized records at {normalized_path}")
    record = records[0]  # first-record limit (publish.py:213-218)
    report = json.loads(Path(comparison_report_path).read_text(encoding="utf-8"))

    rows = record_to_rows(record)
    header = header_for(rows)
    publish, reason = parse_publish_decision(report, summary, force_publish)
    result: dict[str, Any] = {
        "published": False,
        "reason": reason,
        "rows": rows,
        "header": header,
        "mismatch_rows": mismatch_rows(report),
    }

    if dry_run:
        live: list[list[Any]] = []
        if client is not None and spreadsheet_key:
            try:
                ws = client.open_by_key(spreadsheet_key).worksheet(worksheet)
                live = ws.get_all_values()
            except Exception:  # noqa: BLE001
                live = []
        result["diff"] = unified_diff_vs_live([header] + rows, live)
        return result

    if not publish and not allow_quarantine:
        return result

    client = client if client is not None else default_client()
    if client is None or spreadsheet_key is None:
        raise PublishError(
            "no Sheets client available (gspread not installed / no key)"
        )
    book = client.open_by_key(spreadsheet_key)
    try:
        ws = book.worksheet(worksheet)
    except Exception:  # noqa: BLE001 — get-or-create (publish.py:153-158)
        ws = book.add_worksheet(worksheet, rows=100, cols=20)
    ws.clear()
    ws.update([header] + rows)
    if result["mismatch_rows"] or allow_quarantine:
        try:
            dws = book.worksheet(discrepancy_tab)
        except Exception:  # noqa: BLE001
            dws = book.add_worksheet(discrepancy_tab, rows=100, cols=10)
        dws.clear()
        body = result["mismatch_rows"] or [["(no discrepancies)", "", "", "", ""]]
        dws.update([DISCREPANCY_HEADER] + body)
    result["published"] = True
    return result
