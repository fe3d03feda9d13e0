"""Shared fixtures: one SparkSession per test session; testdata paths."""

from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from polla_spark.session import get_spark

    # small core count keeps test startup/shuffle overhead low
    s = get_spark("polla_spark_tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from polla_spark.session import load_tables

    return load_tables(spark, SF_SMOKE)
