"""CLI mirroring the reference's entry points (SURVEY.md §2.7):

  python -m polla_spark run      — ingest + consensus + decide
  python -m polla_spark publish  — artifacts -> Google Sheets
  python -m polla_spark pozos    — print per-source payloads
  python -m polla_spark health   — offline/online probe

Deprecated reference flags are kept with warnings (``--include-pozos``)
for CLI parity; ``--fail-fast`` is honored (the reference threads it
through without reading it — documented dead surface, SURVEY.md §7.5).
"""

from __future__ import annotations

import json
import sys
import time
import warnings

import click

DEFAULT_TIMEOUT = 30
DEFAULT_RETRIES = 3
SANITY_CAP = 50_000_000_000


def _spark():
    from .session import get_spark

    return get_spark("polla_spark_cli")


@click.group()
def cli() -> None:
    """polla_spark — PySpark-native pozo pipeline."""


def _parse_overrides(pairs: tuple[str, ...]) -> dict[str, str]:
    """CLI --source-url pairs merged over the ALT_SOURCE_URLS env JSON
    (reference __main__.py:160-197: flags win over env)."""
    import os

    out: dict[str, str] = {}
    env = os.environ.get("ALT_SOURCE_URLS")
    if env:
        try:
            parsed = json.loads(env)
            if not isinstance(parsed, dict):
                raise ValueError("must be a JSON object")
            out.update({str(k).lower(): str(v) for k, v in parsed.items()})
        except (json.JSONDecodeError, ValueError) as exc:
            raise click.UsageError(f"invalid ALT_SOURCE_URLS JSON: {exc}") from exc
    for pair in pairs:
        if "=" not in pair:
            raise click.BadParameter(f"expected source=url, got {pair!r}")
        k, v = pair.split("=", 1)
        out[k.strip().lower()] = v.strip()
    return out


@cli.command()
@click.option("--sources", default="all", help="csv: pozos/openloto/polla/all")
@click.option("--source-url", "source_urls", multiple=True, help="source=url override (or source=skip)")
@click.option("--retries", default=DEFAULT_RETRIES, type=click.IntRange(min=1))
@click.option("--timeout", default=DEFAULT_TIMEOUT, type=click.IntRange(min=1))
@click.option("--fail-fast/--no-fail-fast", default=False)
@click.option("--raw-dir", default="artifacts/raw")
@click.option("--normalized", default="artifacts/normalized.jsonl")
@click.option("--comparison-report", default="artifacts/comparison_report.json")
@click.option("--summary", default="artifacts/run_summary.json")
@click.option("--state-file", default="pipeline_state/last_run.jsonl")
@click.option("--log-file", default=None, help="append-only JSONL event log")
@click.option("--mismatch-threshold", default=0.25, type=float)
@click.option("--include-pozos/--no-include-pozos", default=True,
              help="deprecated no-op (reference __main__.py:167-173)")
@click.option("--force-publish", is_flag=True, default=False)
@click.option("--bulk", "bulk_path", default=None,
              help="bulk/backfill mode: path to a SOURCE_PAYLOAD dataset "
                   "(parquet dir, or a .jsonl/.ndjson file); every distinct "
                   "run_id is decided in ONE Spark job via run_pipeline_bulk")
@click.option("--output-dir", default="artifacts/bulk",
              help="bulk mode: artifact directory (normalized/mismatches/decisions)")
@click.option("--expected-sources", default=2, type=click.IntRange(min=1),
              help="bulk mode: source count full confidence requires")
def run(sources, source_urls, retries, timeout, fail_fast, raw_dir, normalized,
        comparison_report, summary, state_file, log_file, mismatch_threshold,
        include_pozos, force_publish, bulk_path, output_dir,
        expected_sources) -> None:
    """Ingest sources, merge with consensus, decide, write artifacts."""
    if not include_pozos:
        warnings.warn("--include-pozos is deprecated and has no effect",
                      DeprecationWarning, stacklevel=1)
        click.echo("warning: --include-pozos is deprecated and has no effect",
                   err=True)
    if bulk_path is not None:
        if source_urls:
            raise click.UsageError("--bulk replays captured payloads; "
                                   "--source-url does not apply")
        _run_bulk(bulk_path, output_dir, expected_sources, state_file,
                  mismatch_threshold, force_publish)
        return
    from .pipeline import run_pipeline
    from .sinks.slack import SlackNotifier
    from .sources.pozos import normalize_sources

    try:
        requested = normalize_sources([s for s in sources.split(",") if s.strip()])
    except ValueError as exc:  # clean CLI error (reference ConfigError path)
        raise click.UsageError(str(exc)) from exc
    result = run_pipeline(
        _spark(),
        sources=requested,
        source_overrides=_parse_overrides(source_urls),
        raw_dir=raw_dir,
        normalized_path=normalized,
        comparison_report_path=comparison_report,
        summary_path=summary,
        state_path=state_file,
        log_path=log_file,
        timeout=timeout,
        retries=retries,
        fail_fast=fail_fast,
        mismatch_threshold=mismatch_threshold,
        force_publish=force_publish,
        notifier=SlackNotifier(),
    )
    click.echo(json.dumps(result, ensure_ascii=False, indent=2))


def _run_bulk(bulk_path: str, output_dir: str, expected_sources: int,
              state_file: str, mismatch_threshold: float,
              force_publish: bool) -> None:
    """N-run backfill through one Spark job (pipeline.run_pipeline_bulk):
    artifacts are written executor-side; only the per-status census
    (<= 4 rows) is collected for the CLI summary."""
    import pathlib

    from pyspark.sql import functions as F

    from .pipeline import load_state_df, run_pipeline_bulk
    from .schemas import SOURCE_PAYLOAD

    spark = _spark()
    if bulk_path.endswith((".jsonl", ".ndjson", ".json")):
        from .sources.io import read_ndjson

        payloads = read_ndjson(spark, bulk_path, SOURCE_PAYLOAD)
    else:
        payloads = spark.read.schema(SOURCE_PAYLOAD).parquet(bulk_path)
    decisions = run_pipeline_bulk(
        spark,
        payloads,
        expected_sources=expected_sources,
        output_dir=output_dir,
        state_df=load_state_df(spark, pathlib.Path(state_file)),
        mismatch_threshold=mismatch_threshold,
        force_publish=force_publish,
    )
    census = {
        r["status"]: r["n"]
        for r in decisions.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    click.echo(json.dumps(
        {
            "mode": "bulk",
            "runs": int(sum(census.values())),
            "by_status": census,
            "metrics": decisions.bulk_metrics,
            "output_dir": output_dir,
        },
        ensure_ascii=False,
        indent=2,
    ))


@cli.command()
@click.option("--normalized", default="artifacts/normalized.jsonl")
@click.option("--comparison-report", default="artifacts/comparison_report.json")
@click.option("--summary", "summary_path", default=None)
@click.option("--worksheet", default="Normalized")
@click.option("--discrepancy-tab", default="Discrepancies")
@click.option("--dry-run", is_flag=True, default=False)
@click.option("--force-publish", is_flag=True, default=False)
@click.option("--allow-quarantine", is_flag=True, default=False)
@click.option("--spreadsheet-key", envvar="POLLA_SPREADSHEET_KEY", default=None)
def publish(normalized, comparison_report, summary_path, worksheet,
            discrepancy_tab, dry_run, force_publish, allow_quarantine,
            spreadsheet_key) -> None:
    """Publish normalized artifacts to Google Sheets."""
    from .sinks.sheets import publish_to_google_sheets

    import pathlib

    for p in (normalized, comparison_report, summary_path):
        if p and not pathlib.Path(p).exists():
            raise click.UsageError(f"artifact not found: {p}")
    summary = None
    if summary_path:
        summary = json.loads(open(summary_path, encoding="utf-8").read())
    result = publish_to_google_sheets(
        normalized_path=normalized,
        comparison_report_path=comparison_report,
        summary=summary,
        worksheet=worksheet,
        discrepancy_tab=discrepancy_tab,
        dry_run=dry_run,
        force_publish=force_publish,
        allow_quarantine=allow_quarantine,
        spreadsheet_key=spreadsheet_key,
    )
    if dry_run:
        click.echo(result.get("diff", ""))
    click.echo(json.dumps({k: v for k, v in result.items() if k != "diff"},
                          ensure_ascii=False, indent=2, default=str))


@cli.command()
@click.option("--timeout", default=DEFAULT_TIMEOUT, type=click.IntRange(min=1))
@click.option("--retries", default=DEFAULT_RETRIES, type=click.IntRange(min=1))
def pozos(timeout, retries) -> None:
    """Print per-source payloads (or structured errors)."""
    from .sources.pozos import SOURCE_LOADERS

    out = {}
    for name, loader in SOURCE_LOADERS.items():
        try:
            payload = loader(timeout=timeout, retries=retries)
            payload.pop("montos_html", None)
            out[name] = payload
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": type(exc).__name__, "message": str(exc)[:300]}
    click.echo(json.dumps(out, ensure_ascii=False, indent=2, default=str))


@cli.command()
@click.option("--online/--offline", default=False)
@click.option("--timeout", default=DEFAULT_TIMEOUT, type=click.IntRange(min=1))
def health(online, timeout) -> None:
    """JSON health probe (reference __main__.py:294-373)."""
    import pyspark

    checks: dict[str, dict] = {
        "python": {"status": "pass", "version": sys.version.split()[0]},
        "pyspark": {"status": "pass", "version": pyspark.__version__},
    }
    status = "pass"
    if online:
        from .sources.pozos import SOURCE_LOADERS

        failures = 0
        for name, loader in SOURCE_LOADERS.items():
            t0 = time.perf_counter()
            try:
                payload = loader(timeout=timeout, retries=1)
                ok = any(
                    0 < v < SANITY_CAP for v in (payload.get("montos") or {}).values()
                )
                checks[name] = {
                    "status": "pass" if ok else "fail",
                    "ms": round((time.perf_counter() - t0) * 1000, 1),
                }
                failures += 0 if ok else 1
            except Exception as exc:  # noqa: BLE001
                checks[name] = {
                    "status": "fail",
                    "error": str(exc)[:200],
                    "ms": round((time.perf_counter() - t0) * 1000, 1),
                }
                failures += 1
        n = len(SOURCE_LOADERS)
        status = "pass" if failures == 0 else ("degraded" if failures < n else "fail")
    click.echo(json.dumps({"status": status, "checks": checks}, indent=2))
    if status == "fail":
        sys.exit(1)


if __name__ == "__main__":
    cli()
