"""Executor-side bulk fetch kernel (sources/net.fetch_udf_frame):
drives real HTTP against a local server — success rows, error rows
(never task failures), host partitioning."""

from __future__ import annotations

import http.server
import threading
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from polla_spark.sources.net import fetch_udf_frame

FIXTURES = Path(__file__).parent / "fixtures" / "sources"


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("www")
    (d / "a.html").write_text("<html><body>alpha ñ</body></html>", encoding="utf-8")
    (d / "b.html").write_text("<html><body>beta</body></html>", encoding="utf-8")
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(d), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_bulk_fetch_success_and_error_rows(spark, http_root):
    urls = spark.createDataFrame(
        [
            (f"{http_root}/a.html",),
            (f"{http_root}/b.html",),
            (f"{http_root}/missing.html",),  # 404 -> error row
        ],
        "url string",
    )
    out = fetch_udf_frame(urls, timeout=5).collect()
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in out}
    assert set(rows) == {"a.html", "b.html", "missing.html"}
    assert "alpha ñ" in rows["a.html"]["html"]  # charset sniffing holds here too
    assert rows["a.html"]["error"] is None
    assert len(rows["a.html"]["sha256"]) == 64
    assert rows["missing.html"]["error"] is not None
    assert rows["missing.html"]["html"] is None


def test_bulk_fetch_partitions_by_host(spark, http_root):
    urls = spark.createDataFrame(
        [(f"{http_root}/a.html",), (f"{http_root}/b.html",)], "url string"
    )
    df = fetch_udf_frame(urls, timeout=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-host repartition is in the plan (rate limits hold cluster-wide)
    assert "hashpartitioning" in plan and "ParseUrl" in plan


def test_bulk_fetch_max_concurrency_caps_tasks(spark, http_root):
    """The aggregate-RPS budget: max_concurrency coalesces the
    host-partitioned frame so at most that many fetch tasks run at
    once — and because coalesce unions WHOLE partitions, a host's
    URLs still live in exactly one task (the per-host rate limit is
    still enforced by a single worker loop)."""
    urls = spark.createDataFrame(
        [(f"{http_root}/a.html",), (f"{http_root}/b.html",)], "url string"
    )
    # the cap is an UPPER bound: AQE may already have coalesced the
    # tiny host shuffle below it (coalesce never splits partitions)
    df = fetch_udf_frame(urls, timeout=5, max_concurrency=2)
    assert 1 <= df.rdd.getNumPartitions() <= 2
    # results unaffected by the cap
    out = fetch_udf_frame(urls, timeout=5, max_concurrency=1)
    assert out.rdd.getNumPartitions() == 1
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert rows["a.html"]["error"] is None and rows["b.html"]["error"] is None
    with pytest.raises(ValueError):
        fetch_udf_frame(urls, max_concurrency=0)
