"""Unit coverage of the polite-fetch kernel (sources/net.py): retry /
backoff / rate-limit / robots / encoding branches driven with a fake
``requests`` module — no network, no sleeping (the real-fetch shape is
covered by the fixture-driven source tests and the bulk mapInPandas
tests)."""

from __future__ import annotations

import sys
import types

import pytest

from polla_spark.errors import NetworkError, RobotsDisallowedError
from polla_spark.sources import net


class _Resp:
    def __init__(self, status=200, text="<html>ok</html>",
                 content_type="text/html"):
        self.status_code = status
        self.text = text
        self.headers = {"content-type": content_type}
        self.encoding = None
        self.apparent_encoding = "utf-8"

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")


def _fake_requests(monkeypatch, responses):
    """Install a fake `requests` whose Session.get pops ``responses``
    (an exception instance raises instead of returning)."""
    class _Calls(list):
        closed = 0  # sessions closed — fetch_html must close what it creates

    calls = _Calls()

    class Session:
        def get(self, url, headers=None, timeout=None):
            calls.append((url, headers, timeout))
            r = responses.pop(0)
            if isinstance(r, Exception):
                raise r
            return r

        def close(self):  # real requests.Session has close()
            calls.closed += 1

    mod = types.ModuleType("requests")
    mod.Session = Session
    monkeypatch.setitem(sys.modules, "requests", mod)
    # no real waiting in unit tests
    monkeypatch.setattr(net.time, "sleep", lambda s: None)
    monkeypatch.setattr(net, "robots_allowed", lambda url, ua: True)
    monkeypatch.setattr(net, "_rate_limit", lambda host: None)
    return calls


def test_fetch_success_sniffs_charsetless_encoding(monkeypatch):
    resp = _Resp(content_type="text/html")  # no charset -> sniff
    calls = _fake_requests(monkeypatch, [resp])
    meta = net.fetch_html("https://x.test/p", user_agent="UA/1")
    assert meta.html == "<html>ok</html>" and meta.user_agent == "UA/1"
    assert resp.encoding == "utf-8"  # apparent_encoding applied
    assert meta.sha256 and len(meta.sha256) == 64
    assert calls[0][1] == {"User-Agent": "UA/1"}
    assert calls.closed == 1  # fetch_html closes the session it created


def test_fetch_charset_present_keeps_encoding(monkeypatch):
    resp = _Resp(content_type="text/html; charset=utf-8")
    _fake_requests(monkeypatch, [resp])
    net.fetch_html("https://x.test/p", user_agent="UA/1")
    assert resp.encoding is None  # untouched when the header declares it


def test_fetch_retries_on_429_then_succeeds(monkeypatch):
    calls = _fake_requests(monkeypatch, [_Resp(status=429), _Resp()])
    meta = net.fetch_html("https://x.test/p", user_agent="UA/1", retries=3)
    assert meta.html == "<html>ok</html>"
    assert len(calls) == 2  # one retry, then success


def test_fetch_exhausts_retries_raises_network_error(monkeypatch):
    calls = _fake_requests(
        monkeypatch, [_Resp(status=500), _Resp(status=503), ValueError("boom")]
    )
    with pytest.raises(NetworkError) as ei:
        net.fetch_html("https://x.test/p", user_agent="UA/1", retries=3)
    assert "after 3 attempts" in str(ei.value)
    assert isinstance(ei.value.original_error, ValueError)
    assert len(calls) == 3
    assert calls.closed == 1  # closed even on the failure path


def test_fetch_leaves_caller_supplied_session_open(monkeypatch):
    calls = _fake_requests(monkeypatch, [_Resp()])
    import requests  # the fake installed above

    session = requests.Session()
    net.fetch_html("https://x.test/p", user_agent="UA/1", session=session)
    assert calls.closed == 0  # caller-owned sessions are the caller's to close


def test_fetch_robots_disallowed(monkeypatch):
    _fake_requests(monkeypatch, [])
    monkeypatch.setattr(net, "robots_allowed", lambda url, ua: False)
    with pytest.raises(RobotsDisallowedError):
        net.fetch_html("https://x.test/private", user_agent="UA/1")


def test_backoff_growth_jitter_and_cap():
    lows = [net.BACKOFF_FACTOR * 2 ** (a - 1) for a in (1, 2, 3)]
    for attempt, low in zip((1, 2, 3), lows):
        for _ in range(50):
            s = net.backoff_seconds(attempt)
            assert low <= s <= min(low * 1.25, net.BACKOFF_CAP), (attempt, s)
    # deep attempts cap out
    assert net.backoff_seconds(30) == net.BACKOFF_CAP


def test_rate_limit_sleeps_only_within_interval(monkeypatch):
    slept = []
    monkeypatch.setattr(net.time, "sleep", lambda s: slept.append(s))
    monkeypatch.setenv("POLLA_RATE_LIMIT_RPS", "2.0")  # 0.5s interval
    net._last_hit.clear()
    net._rate_limit("h.test")        # first hit: no sleep
    assert slept == []
    net._rate_limit("h.test")        # immediate second hit: sleeps
    assert len(slept) == 1 and 0 < slept[0] <= 0.5
    # disabled limiter never sleeps
    monkeypatch.setenv("POLLA_RATE_LIMIT_RPS", "0")
    net._rate_limit("h.test")
    assert len(slept) == 1


def test_robots_parser_failure_allows(monkeypatch):
    # unreachable robots.txt -> None parser -> allow (reference
    # behavior); use a scheme urllib cannot fetch
    net._robots_parser.cache_clear()
    assert net.robots_allowed("bogus-scheme://nohost.test/x", "UA/1") is True
