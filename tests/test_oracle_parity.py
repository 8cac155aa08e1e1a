"""Replicates the driver's t2 gate: every queries() entry that has an
oracle must hash-match it. Runs at sf0.001 by default (fast); set
PARITY_SF_DIR=/root/testdata/sf0.01 to run at the driver's scale."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duckdb_conn

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_parity(name, spark, con):
    df = _QUERIES[name](spark, SF_DIR)
    compare(name, df, con, _ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(name, spark):
    """No-oracle queries must at least run and return a stable schema."""
    df = _QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
