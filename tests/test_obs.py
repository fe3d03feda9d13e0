"""JSONL log stream: timestamps + correlation ids + redaction
(reference pipeline.py:228-254, obs.py:31-64)."""

from __future__ import annotations

import json

from polla_spark.obs import JsonLogStream


def test_log_stream_stamps_and_redacts(tmp_path):
    p = tmp_path / "log.jsonl"
    log = JsonLogStream(p, correlation_id="run-123")
    log.emit("source_fetched", fuente="https://example.com", api_key="supersecret123")
    log.metric("pipeline_run", tags={"decision": "publish"})
    lines = [json.loads(x) for x in p.read_text().splitlines()]
    assert len(lines) == 2
    ev = lines[0]
    assert ev["event"] == "source_fetched"
    assert ev["correlation_id"] == "run-123"
    assert "timestamp" in ev
    assert ev["fuente"] == "https://example.com"  # allowlisted key
    assert "supersecret123" not in json.dumps(ev)  # sensitive key redacted
    m = lines[1]
    assert m["event"] == "metric" and m["metric"] == "pipeline_run"
    assert m["tags"]["decision"] == "publish"


def test_none_path_is_noop(tmp_path):
    log = JsonLogStream(None)
    log.emit("anything", x=1)  # must not raise or write
