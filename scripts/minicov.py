"""Minimal statement-coverage harness for environments without
coverage.py / pytest-cov (this sandbox bakes neither and installs are
barred — pyproject.toml declares the intended `fail_under = 80` gate
for environments that have them).

Methodology (coverage.py-compatible statement coverage, approximated):

- executable lines per file = the union of line numbers in the
  compiled code objects (``code.co_lines()``, recursing into nested
  code objects), i.e. exactly what CPython can attribute execution to;
- covered lines = line events observed by a ``sys.settrace`` /
  ``threading.settrace`` tracer filtered to the target package
  (filtering at call granularity keeps overhead low — untracked
  files never get a line tracer).

Known under-counts vs coverage.py: code executed ONLY inside pandas
UDF / mapInPandas worker subprocesses or via the CLI subprocess tests
is invisible to the parent tracer (coverage.py has the same blind spot
without its subprocess hooks).

Usage: python scripts/minicov.py [pytest args...]
Writes per-file and total percentages to stdout (pytest output goes to
stderr so the report stays parseable).
"""

from __future__ import annotations

import os
import sys
import threading
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "polla_spark"

_covered: dict[str, set[int]] = {}


def _local_trace(frame, event, arg):
    if event == "line":
        _covered[frame.f_code.co_filename].add(frame.f_lineno)
    return _local_trace


def _global_trace(frame, event, arg):
    if event == "call":
        fn = frame.f_code.co_filename
        if fn.startswith(str(PKG)):
            _covered.setdefault(fn, set())
            return _local_trace
    return None


def _executable_lines(path: Path) -> set[int]:
    try:
        code = compile(path.read_text(), str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _, _, line in co.co_lines():
            if line is not None:
                lines.add(line)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def main() -> int:
    import pytest

    sys.path.insert(0, str(REPO))
    os.chdir(REPO)
    threading.settrace(_global_trace)
    sys.settrace(_global_trace)
    try:
        rc = pytest.main(sys.argv[1:] or ["tests/", "-q"])
    finally:
        sys.settrace(None)
        threading.settrace(None)

    total_exec = total_cov = 0
    rows = []
    for path in sorted(PKG.rglob("*.py")):
        ex = _executable_lines(path)
        if not ex:
            continue
        cov = _covered.get(str(path), set()) & ex
        total_exec += len(ex)
        total_cov += len(cov)
        rows.append((str(path.relative_to(REPO)), len(cov), len(ex)))
    for name, c, e in rows:
        print(f"{name:60s} {c:5d}/{e:5d}  {100.0 * c / e:5.1f}%")
    pct = 100.0 * total_cov / total_exec if total_exec else 0.0
    print(f"{'TOTAL':60s} {total_cov:5d}/{total_exec:5d}  {pct:5.1f}%")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
