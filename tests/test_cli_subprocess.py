"""Subprocess CLI e2e (reference tests/e2e/test_verification_suite.py
shape): real `python -m polla_spark` invocations. Spark-starting paths
are covered in-process by test_pipeline_e2e.py; these check the CLI
contract itself (help, flags, offline probes, error surfaces) without
paying a JVM per test."""

from __future__ import annotations

import json
import subprocess
import sys


def run_cli(*args: str, env: dict | None = None) -> subprocess.CompletedProcess:
    import os

    full_env = {**os.environ, **(env or {})}
    return subprocess.run(
        [sys.executable, "-m", "polla_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
        env=full_env,
    )


def test_alt_source_urls_env_bad_json_is_clean_error():
    res = run_cli("run", env={"ALT_SOURCE_URLS": "{not json"})
    assert res.returncode != 0
    assert "invalid ALT_SOURCE_URLS JSON" in res.stderr
    assert "Traceback" not in res.stderr


def test_help_lists_all_commands():
    res = run_cli("--help")
    assert res.returncode == 0
    for cmd in ("run", "publish", "pozos", "health"):
        assert cmd in res.stdout


def test_run_help_lists_reference_flags():
    res = run_cli("run", "--help")
    assert res.returncode == 0
    for flag in ("--sources", "--source-url", "--retries", "--timeout",
                 "--fail-fast", "--raw-dir", "--normalized", "--state-file",
                 "--log-file", "--mismatch-threshold", "--include-pozos",
                 "--force-publish"):
        assert flag in res.stdout, flag


def test_health_offline_json():
    res = run_cli("health", "--offline")
    assert res.returncode == 0
    payload = json.loads(res.stdout)
    assert payload["status"] == "pass"
    assert payload["checks"]["pyspark"]["status"] == "pass"


def test_bad_source_url_flag_is_clean_error():
    res = run_cli("run", "--source-url", "bogus")
    assert res.returncode != 0
    assert "expected source=url" in res.stderr


def test_unknown_source_is_clean_error():
    res = run_cli("run", "--sources", "nosuch")
    assert res.returncode != 0
    assert "unknown source: nosuch" in res.stderr
    assert "Traceback" not in res.stderr


def test_publish_missing_artifact_is_clean_error():
    res = run_cli("publish", "--normalized", "/nonexistent.jsonl",
                  "--comparison-report", "/also-missing.json", "--dry-run")
    assert res.returncode != 0
    assert "artifact not found" in res.stderr
    assert "Traceback" not in res.stderr


def test_deprecated_include_pozos_warns():
    res = run_cli("run", "--no-include-pozos", "--sources", "openloto",
                  "--source-url", "openloto=skip")
    # deprecation warning surfaces on stderr (reference __main__.py:167-173)
    assert "deprecated" in res.stderr.lower()
