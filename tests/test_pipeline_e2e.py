"""Pipeline integration: fixture sources -> artifacts -> decision ->
publish (reference tests/test_pipeline.py / test_publish.py / test_e2e.py
shapes)."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pytest

from polla_spark.errors import ParseError
from polla_spark.pipeline import run_pipeline
from polla_spark.sinks import sheets as SH
from polla_spark.sinks.slack import SlackNotifier
from polla_spark.sources.pozos import parse_openloto_html, parse_polla_html

FIXTURES = Path(__file__).parent / "fixtures" / "sources"


def fixture_loaders(openloto_fails=False):
    op_html = (FIXTURES / "openloto" / "page.html").read_text(encoding="utf-8")
    po_html = (FIXTURES / "polla" / "page.html").read_text(encoding="utf-8")

    def openloto(url=None, **kw):
        if openloto_fails:
            raise ParseError("boom")
        return parse_openloto_html(op_html)

    def polla(url=None, **kw):
        return parse_polla_html(po_html)

    return {"openloto": openloto, "polla": polla}


def paths(tmp_path):
    return dict(
        raw_dir=tmp_path / "raw",
        normalized_path=tmp_path / "normalized.jsonl",
        comparison_report_path=tmp_path / "report.json",
        summary_path=tmp_path / "summary.json",
        state_path=tmp_path / "state.jsonl",
    )


def test_full_run_and_idempotency(spark, tmp_path):
    kw = paths(tmp_path)
    summary = run_pipeline(spark, sources=["all"], loaders=fixture_loaders(), **kw)
    assert summary["decision"]["status"] == "quarantine" or summary["publish"] in (True, False)
    # fixture sources disagree on every category -> quarantine
    assert summary["decision"]["status"] == "quarantine"
    assert summary["publish"] is False

    record = json.loads(kw["normalized_path"].read_text().splitlines()[0])
    assert record["api_version"] == "v1.2"
    assert record["sorteo"] == 5322  # primary = openloto (priority 0)
    assert record["pozos_proximo"]["Loto Clásico"] == 690_000_000
    assert record["provenance"]["pozos"]["primary"]["source_name"] == "openloto"
    assert len(record["provenance"]["pozos"]["alternatives"]) == 1
    assert (kw["raw_dir"] / "www_openloto_cl.json").exists() or any(
        kw["raw_dir"].iterdir()
    )
    report = json.loads(kw["comparison_report_path"].read_text())
    assert report["decision"]["mismatched_categories"] > 0
    assert report["api_version"] == "v1.2"

    # second run, same state -> decision skip is NOT expected because
    # first run quarantined but state was still written; same content
    # -> unchanged -> skip
    summary2 = run_pipeline(spark, sources=["all"], loaders=fixture_loaders(), **kw)
    assert summary2["decision"]["status"] == "skip"
    assert summary2["publish"] is False


def test_agreeing_sources_publish(spark, tmp_path):
    kw = paths(tmp_path)
    op_html = (FIXTURES / "openloto" / "page.html").read_text(encoding="utf-8")
    loaders = {
        "openloto": lambda **kw2: parse_openloto_html(op_html),
        "polla": lambda **kw2: parse_openloto_html(op_html, fuente="https://mirror"),
    }
    summary = run_pipeline(spark, sources=["all"], loaders=loaders, **kw)
    assert summary["decision"]["status"] == "publish"
    assert summary["publish"] is True
    assert summary["decision"]["confidence"] == "full"


def test_degraded_mode_one_source_fails(spark, tmp_path):
    kw = paths(tmp_path)
    summary = run_pipeline(
        spark, sources=["all"], loaders=fixture_loaders(openloto_fails=True), **kw
    )
    assert summary["decision"]["confidence"] == "degraded"
    assert summary["source_failures"][0]["source_name"] == "openloto"
    record = json.loads(kw["normalized_path"].read_text().splitlines()[0])
    assert record["provenance"]["pozos"]["primary"]["source_name"] == "polla"


def test_all_sources_fail(spark, tmp_path):
    kw = paths(tmp_path)
    loaders = {
        "openloto": lambda **k: (_ for _ in ()).throw(ParseError("x")),
        "polla": lambda **k: (_ for _ in ()).throw(ParseError("y")),
    }
    with pytest.raises(RuntimeError, match="No sources returned data"):
        run_pipeline(spark, sources=["all"], loaders=loaders, **kw)


def test_source_skip_override(spark, tmp_path):
    kw = paths(tmp_path)
    summary = run_pipeline(
        spark,
        sources=["all"],
        source_overrides={"polla": "skip"},
        loaders=fixture_loaders(),
        **kw,
    )
    # single source responding out of 2 requested -> degraded
    assert summary["decision"]["confidence"] == "degraded"


def test_soak_chaos_alternating_source_failure(spark, tmp_path):
    """Soak + chaos per the reference's SLO doc
    (/root/reference/docs/SLOs.md:44-48 — "run pipeline in a loop with
    stable inputs; ensure idempotent outcomes", "simulate one source
    failing"): 6 iterations against byte-stable fixture content with
    openloto failing on every EVEN run. Pins, across the whole loop:

    - idempotency: run 1 publishes, every later run (content
      unchanged) decides ``skip`` and never re-publishes;
    - confidence degrades on failure runs and RECOVERS on the next
      healthy run (no sticky degradation);
    - artifacts stay byte-stable modulo run metadata (the normalized
      record differs only in ``run_id`` and provenance ``fetched_at``
      — both stamped per run by design; content hashes identical);
    - the state file stays a single well-formed JSONL line — never
      corrupted, never duplicated. It is REWRITTEN every run by design
      (reference pipeline.py:437 does the same), so a degraded run's
      state carries single-source provenance; what must never drift is
      the VALUE level (sorteo, pozos map), and healthy-run state must
      be byte-identical to the healthy baseline modulo run metadata.
    """
    op_html = (FIXTURES / "openloto" / "page.html").read_text(encoding="utf-8")
    kw = paths(tmp_path)

    def loaders(fail_openloto: bool):
        def op(**k):
            if fail_openloto:
                raise ParseError("chaos: injected openloto outage")
            return parse_openloto_html(op_html)

        return {
            "openloto": op,
            "polla": lambda **k: parse_openloto_html(op_html, fuente="https://mirror"),
        }

    def stable_view(record: dict) -> dict:
        rec = json.loads(json.dumps(record))  # deep copy
        rec.pop("run_id", None)
        for fam in rec.get("provenance", {}).values():
            fam.get("primary", {}).pop("fetched_at", None)
            for alt in fam.get("alternatives", []):
                alt.pop("fetched_at", None)
        return rec

    baseline = None
    state_sha = None
    for i in range(1, 7):
        fail = i % 2 == 0
        summary = run_pipeline(
            spark, sources=["all"], loaders=loaders(fail), **kw
        )
        # decisions: publish once, then idempotent skips
        if i == 1:
            assert summary["decision"]["status"] == "publish"
            assert summary["publish"] is True
        else:
            assert summary["decision"]["status"] == "skip", f"run {i}"
            assert summary["publish"] is False
        # confidence tracks THIS run's source health (degrade+recover)
        expected_conf = "degraded" if fail else "full"
        assert summary["decision"]["confidence"] == expected_conf, f"run {i}"
        if fail:
            assert summary["source_failures"][0]["source_name"] == "openloto"
        else:
            assert not summary["source_failures"]
        # artifacts byte-stable modulo run metadata
        record = json.loads(kw["normalized_path"].read_text().splitlines()[0])
        view = stable_view(record)
        if fail:
            # one source down: provenance legitimately loses the
            # failed source; everything VALUE-level must still match
            assert view["pozos_proximo"] == baseline["pozos_proximo"], f"run {i}"
            assert view["sorteo"] == baseline["sorteo"]
        elif baseline is None:
            baseline = view
        else:
            assert view == baseline, f"run {i}: healthy-run artifact drifted"
        # state file: exactly one well-formed line, values never drift
        lines = kw["state_path"].read_text().splitlines()
        assert len(lines) == 1, f"run {i}: state grew/duplicated"
        state_record = json.loads(lines[0])  # raises if corrupt
        assert state_record["pozos_proximo"] == baseline["pozos_proximo"]
        assert state_record["sorteo"] == baseline["sorteo"]
        if not fail:
            sha = hashlib.sha256(
                json.dumps(stable_view(state_record), sort_keys=True).encode()
            ).hexdigest()
            if state_sha is None:
                state_sha = sha
            else:
                assert sha == state_sha, f"run {i}: healthy state drifted"


def test_force_publish_on_unchanged(spark, tmp_path):
    kw = paths(tmp_path)
    run_pipeline(spark, sources=["openloto"], loaders=fixture_loaders(), **kw)
    summary = run_pipeline(
        spark, sources=["openloto"], loaders=fixture_loaders(), force_publish=True, **kw
    )
    assert summary["decision"]["status"] == "publish_forced"
    assert summary["publish"] is True


# ---------------------------------------------------------------------------
# Publish / sinks
# ---------------------------------------------------------------------------

class FakeWorksheet:
    def __init__(self):
        self.values: list[list] = []

    def clear(self):
        self.values = []

    def update(self, rows):
        self.values = rows

    def get_all_values(self):
        return self.values


class FakeBook:
    def __init__(self):
        self.sheets: dict[str, FakeWorksheet] = {}

    def worksheet(self, name):
        if name not in self.sheets:
            raise KeyError(name)
        return self.sheets[name]

    def add_worksheet(self, name, rows=0, cols=0):
        self.sheets[name] = FakeWorksheet()
        return self.sheets[name]


class FakeClient:
    def __init__(self):
        self.book = FakeBook()

    def open_by_key(self, key):
        return self.book


@pytest.fixture()
def published_artifacts(spark, tmp_path):
    kw = paths(tmp_path)
    op_html = (FIXTURES / "openloto" / "page.html").read_text(encoding="utf-8")
    loaders = {
        "openloto": lambda **kw2: parse_openloto_html(op_html),
        "polla": lambda **kw2: parse_openloto_html(op_html, fuente="https://mirror"),
    }
    run_pipeline(spark, sources=["all"], loaders=loaders, **kw)
    return kw


def test_publish_rows_and_header(published_artifacts):
    record = SH.load_normalized(published_artifacts["normalized_path"])[0]
    rows = SH.record_to_rows(record)
    assert SH.header_for(rows) == SH.POZOS_HEADER  # premios empty -> 4-col
    assert rows[0][2] == "Loto Clásico"
    assert rows[0][3] == 690_000_000


def test_publish_live_with_fake_client(published_artifacts):
    client = FakeClient()
    result = SH.publish_to_google_sheets(
        normalized_path=published_artifacts["normalized_path"],
        comparison_report_path=published_artifacts["comparison_report_path"],
        client=client,
        spreadsheet_key="k",
    )
    assert result["published"] is True
    ws = client.book.sheets["Normalized"]
    assert ws.values[0] == SH.POZOS_HEADER
    assert ["Loto Clásico", 690_000_000] == ws.values[1][2:]


def test_publish_dry_run_diff(published_artifacts):
    result = SH.publish_to_google_sheets(
        normalized_path=published_artifacts["normalized_path"],
        comparison_report_path=published_artifacts["comparison_report_path"],
        dry_run=True,
    )
    assert result["published"] is False
    assert "Loto Clásico" in result["diff"]


def test_quarantine_not_published_without_flag(spark, tmp_path):
    kw = paths(tmp_path)
    run_pipeline(spark, sources=["all"], loaders=fixture_loaders(), **kw)  # quarantine
    client = FakeClient()
    result = SH.publish_to_google_sheets(
        normalized_path=kw["normalized_path"],
        comparison_report_path=kw["comparison_report_path"],
        client=client,
        spreadsheet_key="k",
    )
    assert result["published"] is False
    assert "Normalized" not in client.book.sheets
    # force_publish overrides the gate (publish.py force semantics)
    result2 = SH.publish_to_google_sheets(
        normalized_path=kw["normalized_path"],
        comparison_report_path=kw["comparison_report_path"],
        client=client,
        spreadsheet_key="k",
        force_publish=True,
    )
    assert result2["published"] is True


def test_bulk_multi_run_pipeline(spark, tmp_path):
    """3 run_ids through one bulk job: per-run decisions, artifacts
    written as DataFrames (no driver collect of data rows)."""
    import datetime as dt

    from polla_spark.pipeline import run_pipeline_bulk
    from polla_spark.schemas import SOURCE_PAYLOAD

    def payload(run, source, prio, montos):
        return {
            "run_id": run,
            "source_name": source,
            "source_priority": prio,
            "fuente": f"https://{source}.example/",
            "fetched_at": dt.datetime(2025, 6, 1, 12, 0),
            "sha256": f"sha_{source}_{run}",
            "estimado": True,
            "user_agent": "BulkBot/1.0",
            "sorteo": 5000 + int(run[-1]),
            "fecha": dt.date(2025, 6, 2),
            "montos": montos,
        }

    agree = {"Loto Clásico": 100, "Recargado": 200}
    disagree = {"Loto Clásico": 999, "Recargado": 200}
    rows = [
        # r1: sources agree -> publish
        payload("r1", "openloto", 0, agree),
        payload("r1", "polla", 1, agree),
        # r2: 1/2 categories disagree -> mismatch_ratio 0.5 > 0.25 -> quarantine
        payload("r2", "openloto", 0, agree),
        payload("r2", "polla", 1, disagree),
        # r3: single source -> publish, single_source confidence
        payload("r3", "openloto", 0, agree),
    ]
    pdf = spark.createDataFrame(rows, SOURCE_PAYLOAD)
    decisions = run_pipeline_bulk(
        spark, pdf, expected_sources=2, output_dir=tmp_path / "bulk"
    )
    got = {r["run_id"]: r for r in decisions.collect()}
    assert set(got) == {"r1", "r2", "r3"}
    assert got["r1"]["status"] == "publish" and got["r1"]["confidence"] == "full"
    assert got["r2"]["status"] == "quarantine"
    assert got["r3"]["status"] == "publish"
    assert got["r3"]["confidence"] == "degraded"  # 1 < expected 2

    # artifacts are real JSONL datasets readable back by Spark
    norm = spark.read.json(str(tmp_path / "bulk" / "normalized"))
    assert norm.count() == 3
    assert set(norm.columns) >= {"run_id", "pozos_proximo", "provenance", "confidence"}
    mism = spark.read.json(str(tmp_path / "bulk" / "mismatches"))
    assert mism.filter(mism.run_id == "r2").count() == 1

    # observed metrics rode the decisions write job (no extra pass)
    assert decisions.bulk_metrics == {
        "n_runs": 3, "n_published": 2, "n_quarantined": 1, "n_skipped": 0,
    }
    dec = spark.read.json(str(tmp_path / "bulk" / "decisions"))
    assert dec.count() == 3


def test_bulk_pipeline_at_table_scale(spark, tmp_path):
    """Backfill shape: ~30 runs x 4 sources derived from the events
    table (the consensus queries' derivation), through one bulk job.
    One decision per run, artifacts as datasets, zero data-row collect."""
    import datetime as dt

    from pyspark.sql import functions as F

    from polla_spark.pipeline import run_pipeline_bulk
    from polla_spark.plans.consensus_q import payload_long

    long = payload_long(spark, "/root/testdata/sf0.01")
    payloads = (
        long.groupBy("run_id", "source_name", "source_priority")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("categoria", "valor")))
            ).alias("montos")
        )
        .select(
            "run_id",
            "source_name",
            "source_priority",
            F.concat(F.lit("https://x/"), "source_name").alias("fuente"),
            F.lit(dt.datetime(2026, 8, 13, 12, 0)).alias("fetched_at"),
            F.concat_ws("_", F.lit("sha"), "run_id", "source_name").alias("sha256"),
            F.lit(True).alias("estimado"),
            F.lit("bulk-ua").alias("user_agent"),
            F.lit(1).cast("long").alias("sorteo"),
            F.lit(dt.date(2026, 8, 14)).alias("fecha"),
            "montos",
        )
    )
    n_runs = payloads.select("run_id").distinct().count()
    assert n_runs >= 25  # real multi-run input, not a toy

    decisions = run_pipeline_bulk(
        spark, payloads, expected_sources=4, output_dir=tmp_path / "bulk_scale"
    )
    rows = decisions.collect()
    assert len(rows) == n_runs
    assert {r["status"] for r in rows} <= {"publish", "quarantine", "skip"}
    # the derived sources disagree on small-domain values often enough
    # that both outcomes appear — a degenerate all-publish result would
    # mean the mismatch plumbing broke
    assert any(r["status"] == "quarantine" for r in rows)
    back = spark.read.json(str(tmp_path / "bulk_scale" / "normalized"))
    assert back.count() == n_runs
    assert back.filter(F.col("provenance.pozos.primary.user_agent") != "bulk-ua").count() == 0


def test_slack_notifier_payloads():
    sent = []
    notifier = SlackNotifier(webhook_url="https://hooks.test/x",
                             poster=lambda url, p: sent.append((url, p)))
    payload = notifier.run_complete(
        {"run_id": "abc12345", "decision": {"status": "publish", "confidence": "full"},
         "publish": True}
    )
    assert "publish" in payload["text"]
    mismatches = [{"categoria": f"c{i}", "consensus": {}, "disagreeing": {}} for i in range(20)]
    q = notifier.quarantine({"run_id": "r", "publish_reason": "dev"}, mismatches)
    # 15-mismatch truncation (reference notifiers.py:84)
    section_blocks = [b for b in q["blocks"] if b["type"] == "section"]
    assert len(section_blocks) == 1 + 15
    assert "5 more" in q["blocks"][-1]["elements"][0]["text"]
    assert len(sent) == 2
