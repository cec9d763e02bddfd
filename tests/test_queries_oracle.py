"""Runs every registered oracle-backed query against DuckDB on the
sf0.001 fixtures — the local mirror of the driver's t2 gate.

(The driver runs sf0.01; sf0.001 keeps the pytest loop fast. A marked
slow test repeats at sf0.01.)
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from oracle_harness import compare_query  # noqa: E402

from wrds2pg_spark.queries import REGISTRY

SF_FAST = "/root/testdata/sf0.001"
SF_DRIVER = "/root/testdata/sf0.01"

ORACLE_KEYS = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ALL_KEYS = sorted(REGISTRY)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match_sf0001(spark, name):
    compare_query(spark, SF_FAST, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match_sf001(spark, name):
    compare_query(spark, SF_DRIVER, name)


@pytest.mark.parametrize("name", ALL_KEYS)
def test_query_runs(spark, name):
    """Rows-only smoke for every registered query (incl. non-oracle)."""
    df = REGISTRY[name].fn(spark, SF_FAST)
    assert df.count() >= 0


def test_entry_smoke(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_every_registered_key_is_benched():
    """Drift guard, CI-side: bench.py must time every REGISTRY key
    (round-2 verdict found join_asof_tolerance registered but
    unbenched).  Also: nothing benched that isn't registered."""
    import bench

    assert sorted(set(REGISTRY) - set(bench.HEADLINE)) == []
    assert sorted(set(bench.HEADLINE) - set(REGISTRY)) == []
