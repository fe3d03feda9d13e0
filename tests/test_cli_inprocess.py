"""In-process CLI coverage (round-4 verdict task #5): the subprocess
e2e in test_cli_subprocess.py certifies the real `python -m
polla_spark` contract but is invisible to the settrace coverage
harness (scripts/minicov.py). These tests drive the SAME command
functions through click's CliRunner inside this process, so cli.py's
branches are measured — and they double as fast regression tests for
the command glue (option parsing, error surfaces, JSON shapes)."""

from __future__ import annotations

import json

import pytest
from click.testing import CliRunner

from polla_spark.cli import cli


@pytest.fixture()
def runner():
    return CliRunner()


def test_health_offline(runner):
    res = runner.invoke(cli, ["health", "--offline"])
    assert res.exit_code == 0
    payload = json.loads(res.output)
    assert payload["status"] == "pass"
    assert payload["checks"]["python"]["status"] == "pass"
    assert payload["checks"]["pyspark"]["status"] == "pass"


def _patch_loaders(monkeypatch, loaders):
    from polla_spark.sources import pozos

    monkeypatch.setattr(pozos, "SOURCE_LOADERS", loaders)


def test_health_online_all_pass(runner, monkeypatch):
    _patch_loaders(
        monkeypatch,
        {"s1": lambda **kw: {"montos": {"Loto": 1000}},
         "s2": lambda **kw: {"montos": {"Loto": 2000}}},
    )
    res = runner.invoke(cli, ["health", "--online"])
    assert res.exit_code == 0
    payload = json.loads(res.output)
    assert payload["status"] == "pass"
    assert payload["checks"]["s1"]["status"] == "pass"
    assert "ms" in payload["checks"]["s2"]


def test_health_online_degraded_and_fail(runner, monkeypatch):
    def boom(**kw):
        raise RuntimeError("down")

    # one of two fails -> degraded, exit 0
    _patch_loaders(
        monkeypatch,
        {"ok": lambda **kw: {"montos": {"Loto": 1000}}, "bad": boom},
    )
    res = runner.invoke(cli, ["health", "--online"])
    assert res.exit_code == 0
    payload = json.loads(res.output)
    assert payload["status"] == "degraded"
    assert payload["checks"]["bad"]["status"] == "fail"

    # all fail -> fail, exit 1; a zero-amount payload also fails the
    # sanity range check (cli.py SANITY_CAP gate)
    _patch_loaders(
        monkeypatch,
        {"bad": boom, "zero": lambda **kw: {"montos": {"Loto": 0}}},
    )
    res = runner.invoke(cli, ["health", "--online"])
    assert res.exit_code == 1
    assert json.loads(res.output)["status"] == "fail"


def test_pozos_payloads_and_errors(runner, monkeypatch):
    def ok(**kw):
        return {"montos": {"Loto": 500}, "montos_html": "<secret>"}

    def boom(**kw):
        raise ValueError("x" * 500)

    _patch_loaders(monkeypatch, {"good": ok, "bad": boom})
    res = runner.invoke(cli, ["pozos"])
    assert res.exit_code == 0
    payload = json.loads(res.output)
    # raw HTML is stripped from the printed payload
    assert "montos_html" not in payload["good"]
    assert payload["good"]["montos"] == {"Loto": 500}
    # loader errors become structured entries, message capped at 300
    assert payload["bad"]["error"] == "ValueError"
    assert len(payload["bad"]["message"]) <= 300


def test_run_error_surfaces(runner):
    res = runner.invoke(cli, ["run", "--sources", "nosuch"])
    assert res.exit_code != 0
    assert "unknown source" in res.output

    res = runner.invoke(cli, ["run", "--source-url", "bogus"])
    assert res.exit_code != 0
    assert "expected source=url" in res.output

    res = runner.invoke(
        cli, ["run", "--bulk", "x.jsonl", "--source-url", "a=b"]
    )
    assert res.exit_code != 0
    assert "--source-url does not apply" in res.output


def test_run_env_override_bad_json(runner, monkeypatch):
    monkeypatch.setenv("ALT_SOURCE_URLS", "{not json")
    res = runner.invoke(cli, ["run"])
    assert res.exit_code != 0
    assert "invalid ALT_SOURCE_URLS JSON" in res.output
    monkeypatch.setenv("ALT_SOURCE_URLS", json.dumps(["not", "a", "dict"]))
    res = runner.invoke(cli, ["run"])
    assert res.exit_code != 0
    assert "invalid ALT_SOURCE_URLS JSON" in res.output


def test_run_full_pipeline_in_process(runner, monkeypatch, spark, tmp_path):
    """The run command's happy path (fixture loaders patched in):
    ingest -> consensus -> decide -> artifacts, all in-process so the
    command body is coverage-visible. Also exercises the deprecated
    --no-include-pozos warning branch."""
    from tests.test_pipeline_e2e import fixture_loaders

    _patch_loaders(monkeypatch, fixture_loaders())
    args = [
        "run", "--no-include-pozos",
        "--raw-dir", str(tmp_path / "raw"),
        "--normalized", str(tmp_path / "normalized.jsonl"),
        "--comparison-report", str(tmp_path / "report.json"),
        "--summary", str(tmp_path / "summary.json"),
        "--state-file", str(tmp_path / "state.jsonl"),
    ]
    res = runner.invoke(cli, args)
    assert res.exit_code == 0, res.output
    assert "deprecated" in res.output.lower()
    summary = json.loads(res.output[res.output.index("{"):])
    assert summary["decision"]["status"] in {"publish", "quarantine"}
    assert (tmp_path / "normalized.jsonl").exists()


def test_run_bulk_in_process(runner, spark, tmp_path):
    """The bulk branch through CliRunner: N run_ids decided in one
    Spark job, census JSON on stdout (the subprocess twin stays in
    test_cli_subprocess.py; this one is coverage-visible)."""
    rows = []
    for run_i in range(2):
        for prio, name in enumerate(["s1", "s2"]):
            rows.append({
                "run_id": f"r{run_i}",
                "source_name": name,
                "source_priority": prio,
                "fuente": f"https://x/{name}",
                "fetched_at": "2026-05-01T12:00:00.000Z",
                "sha256": f"sha_{name}_r{run_i}",
                "estimado": True,
                "user_agent": "ua",
                "sorteo": 6000 + run_i,
                "fecha": "2026-05-03",
                "montos": {"Loto Clásico": 100 + run_i},
            })
    payloads = tmp_path / "payloads.jsonl"
    payloads.write_text(
        "\n".join(json.dumps(r, ensure_ascii=False) for r in rows)
    )
    res = runner.invoke(cli, [
        "run", "--bulk", str(payloads),
        "--output-dir", str(tmp_path / "bulk_out"),
        "--expected-sources", "2",
        "--state-file", str(tmp_path / "no_state.jsonl"),
    ])
    assert res.exit_code == 0, res.output
    summary = json.loads(res.output[res.output.index("{"):])
    assert summary["mode"] == "bulk" and summary["runs"] == 2
    assert summary["by_status"] == {"publish": 2}


def test_publish_dry_run_and_missing_artifacts(runner, spark, tmp_path):
    res = runner.invoke(cli, [
        "publish", "--normalized", "/nonexistent.jsonl",
        "--comparison-report", "/missing.json", "--dry-run",
    ])
    assert res.exit_code != 0
    assert "artifact not found" in res.output

    # real artifacts via the pipeline, then an in-process dry run
    from tests.test_pipeline_e2e import fixture_loaders, paths

    from polla_spark.pipeline import run_pipeline

    kw = paths(tmp_path)
    run_pipeline(spark, sources=["all"], loaders=fixture_loaders(), **kw)
    res = runner.invoke(cli, [
        "publish",
        "--normalized", str(kw["normalized_path"]),
        "--comparison-report", str(kw["comparison_report_path"]),
        "--summary", str(kw["summary_path"]),
        "--dry-run",
    ])
    assert res.exit_code == 0, res.output
    out = json.loads(res.output[res.output.index("{"):])
    assert out["published"] is False
    assert out["rows"]
