"""Differential test: every queries() entry vs its DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (run locally at the smallest
scale factor for speed; the driver runs sf0.01).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare, duckdb_conn

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


def test_every_oracle_key_has_query():
    missing = set(_ORACLE) - set(_QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    fn = _QUERIES[name]
    sdf = fn(spark, sf_dir)
    if name not in _ORACLE:
        # rows-only check, like the driver's weaker path
        assert sdf.count() >= 0
        return
    con = duckdb_conn(sf_dir)
    ddf = con.execute(_ORACLE[name]).fetchdf()
    errs = compare(sdf, ddf, name)
    assert not errs, "\n".join(errs)
