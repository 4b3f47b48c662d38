"""Differential test of every registered query against its DuckDB oracle —
a local replica of the driver's t2 correctness gate, run at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle import compare, duckdb_conn

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def oracle_db():
    conn = duckdb_conn(SF_ORACLE)
    yield conn
    conn.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, oracle_db, name):
    assert name in QUERIES, f"oracle_sql has {name} but queries() does not"
    spark_df = QUERIES[name](spark, SF_ORACLE)
    oracle_pdf = oracle_db.execute(ORACLES[name]).fetchdf()
    compare(spark_df, oracle_pdf, name)


def test_all_queries_run(spark):
    """Queries without oracles (rows-only checks) must still execute."""
    for name, fn in QUERIES.items():
        if name not in ORACLES:
            df = fn(spark, SF_ORACLE)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
