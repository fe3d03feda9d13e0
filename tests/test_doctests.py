"""Doctest runner for the scalar parse kernels — parity with the
reference's doctest discipline (its CI collects doctests)."""

from __future__ import annotations

import doctest

from polla_spark.functions import dates, money


def test_module_doctests():
    for mod in (money, dates):
        result = doctest.testmod(mod, verbose=False)
        assert result.failed == 0, f"{mod.__name__}: {result.failed} doctest failures"
        assert result.attempted > 0, f"{mod.__name__}: no doctests collected"
