"""Polite HTTP fetch: robots.txt gate, per-host rate limit, retry with
jittered exponential backoff (reference polla_app/net.py:41-177).

Driver-side for the reference workload (2 URLs/day). The scale path
for bulk crawling is :func:`fetch_udf_frame` — a ``mapInPandas``
kernel over a URL DataFrame where each partition keeps one session and
its own token bucket, with per-host partitioning so rate limits hold
cluster-wide (reference semantics S1-S4 re-expressed for executors).
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import hashlib
import os
import random
import time
import urllib.robotparser
from functools import lru_cache
from urllib.parse import urlparse

from ..errors import NetworkError, RobotsDisallowedError

DEFAULT_UA = "PollaSparkBot/1.0 (+contact@example.com)"
DEFAULT_TIMEOUT = 20


def effective_user_agent(override: str | None = None) -> str:
    """UA resolution order: explicit override > POLLA_USER_AGENT env >
    default (reference polla_app/sources/pozos.py:227-232)."""
    if override:
        return override
    return os.environ.get("POLLA_USER_AGENT") or DEFAULT_UA

DEFAULT_RETRIES = 3
BACKOFF_FACTOR = 1.5
BACKOFF_CAP = 30.0

_last_hit: dict[str, float] = {}


@dataclasses.dataclass(frozen=True)
class FetchMetadata:
    """Reference net.py:26-38 shape."""

    url: str
    user_agent: str
    fetched_at: dt.datetime
    html: str

    @property
    def sha256(self) -> str:
        return hashlib.sha256(self.html.encode("utf-8")).hexdigest()


@lru_cache(maxsize=64)
def _robots_parser(robots_url: str) -> urllib.robotparser.RobotFileParser | None:
    parser = urllib.robotparser.RobotFileParser()
    try:
        parser.set_url(robots_url)
        parser.read()
        return parser
    except Exception:
        return None  # unreachable robots -> allow (reference behavior)


def robots_allowed(url: str, user_agent: str) -> bool:
    parts = urlparse(url)
    robots_url = f"{parts.scheme}://{parts.netloc}/robots.txt"
    parser = _robots_parser(robots_url)
    if parser is None:
        return True
    return parser.can_fetch(user_agent, url)


def backoff_seconds(attempt: int, factor: float = BACKOFF_FACTOR,
                    cap: float = BACKOFF_CAP) -> float:
    """factor * 2^(attempt-1), <=25% jitter, capped (net.py:75-83)."""
    base = min(factor * (2 ** (attempt - 1)), cap)
    return min(base + base * random.uniform(0, 0.25), cap)


def _rate_limit(host: str) -> None:
    rps = float(os.environ.get("POLLA_RATE_LIMIT_RPS", "1.0"))
    if rps <= 0:
        return
    min_interval = 1.0 / rps
    now = time.monotonic()
    prev = _last_hit.get(host)
    if prev is not None and now - prev < min_interval:
        time.sleep(min_interval - (now - prev))
    _last_hit[host] = time.monotonic()


def fetch_html(url: str, user_agent: str | None = None,
               timeout: int = DEFAULT_TIMEOUT, *,
               retries: int | None = None,
               session=None) -> FetchMetadata:
    """GET with robots gate + rate limit + 429/5xx retry (net.py:86-177).

    ``user_agent=None`` resolves POLLA_USER_AGENT then the default.
    ``session`` lets a caller supply a long-lived ``requests.Session``
    (connection pooling across MANY urls — the bulk-fetch kernel does
    this per partition); default is one fresh session per call, still
    reused across that call's retries."""
    import requests

    user_agent = effective_user_agent(user_agent)
    if not robots_allowed(url, user_agent):
        raise RobotsDisallowedError(f"robots.txt disallows {url}")
    attempts = retries if retries is not None else DEFAULT_RETRIES
    host = urlparse(url).netloc
    last: Exception | None = None
    owns_session = session is None
    if owns_session:
        session = requests.Session()  # one session across retries
    try:
        for attempt in range(1, attempts + 1):
            _rate_limit(host)
            try:
                resp = session.get(
                    url, headers={"User-Agent": user_agent}, timeout=timeout
                )
                if resp.status_code == 429 or resp.status_code >= 500:
                    raise NetworkError(f"HTTP {resp.status_code} from {url}")
                resp.raise_for_status()
                if "charset" not in resp.headers.get("content-type", "").lower():
                    # requests defaults charset-less text/* to ISO-8859-1
                    # (RFC 2616) which mojibakes UTF-8 pages ("N°" -> "NÂ°");
                    # sniff the real encoding instead.
                    resp.encoding = resp.apparent_encoding or "utf-8"
                return FetchMetadata(
                    url=url,
                    user_agent=user_agent,
                    fetched_at=dt.datetime.now(dt.timezone.utc),
                    html=resp.text,
                )
            except Exception as exc:  # noqa: BLE001 — isolate, retry
                last = exc
                if attempt < attempts:
                    time.sleep(backoff_seconds(attempt))
    finally:
        if owns_session:
            # close locally-created sessions deterministically — pooled
            # sockets released only at GC exhaust file descriptors on
            # long-running executors (round-6 advice). Caller-supplied
            # sessions are the caller's to close.
            session.close()
    raise NetworkError(f"fetch failed after {attempts} attempts: {url}",
                       original_error=last)


def fetch_udf_frame(urls_df, user_agent: str | None = None,
                    timeout: int = DEFAULT_TIMEOUT,
                    max_concurrency: int | None = None):
    """Scale path: fetch a DataFrame of URLs on executors.

    Partitions by host so each host's rate limit is enforced by
    exactly one task; inside the task ONE ``requests.Session`` is
    shared across every URL (connection pooling / keep-alive — not
    just across one URL's retries) and failures become rows
    (``error`` column), never task failures.

    ``max_concurrency`` caps the number of SIMULTANEOUS fetch tasks
    (a ``coalesce`` after the host partitioning, which preserves the
    one-task-per-host invariant — coalesce only unions whole
    partitions, it never splits one). Per-host politeness alone does
    not bound the job's AGGREGATE request rate: 1,000 distinct hosts
    across 1,000 executors all crawl at their own POLLA_RATE_LIMIT_RPS
    simultaneously. The cap bounds the aggregate at
    ``max_concurrency`` hosts in flight at once; note a capped task
    cycling MANY hosts is paced by response latency, not by the
    PER-HOST limiter (different hosts never wait on each other), so
    the worst-case aggregate is ``max_concurrency / latency`` RPS —
    a concurrency budget, not a strict RPS budget. Leave ``None``
    only when the URL list is known host-light (the default keeps
    the old behavior).
    """
    from pyspark.sql import functions as F

    schema = (
        "url string, fetched_at timestamp, sha256 string, html string, error string"
    )

    def fetch_partition(batches):
        import pandas as pd
        import requests

        session = requests.Session()  # pooled across the whole task
        try:
            for pdf in batches:
                out = []
                for url in pdf["url"]:
                    try:
                        meta = fetch_html(url, user_agent, timeout, session=session)
                        out.append(
                            (url, meta.fetched_at, meta.sha256, meta.html, None)
                        )
                    except Exception as exc:  # noqa: BLE001
                        out.append((url, None, None, None, str(exc)[:500]))
                yield pd.DataFrame(
                    out, columns=["url", "fetched_at", "sha256", "html", "error"]
                )
        finally:
            # executors cycle many partitions per process — release the
            # pooled sockets at task end, not at GC (round-6 advice)
            session.close()

    host = F.parse_url(F.col("url"), F.lit("HOST"))
    parted = urls_df.repartition(host)
    if max_concurrency is not None:
        if max_concurrency < 1:
            raise ValueError(f"max_concurrency must be >= 1: {max_concurrency}")
        parted = parted.coalesce(max_concurrency)
    return parted.mapInPandas(fetch_partition, schema=schema)
