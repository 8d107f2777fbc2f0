"""Every registered query must match its DuckDB oracle at sf0.001.

This is the local mirror of the driver's CORRECTNESS gate (exact value
compare, order-insensitive).
"""

from __future__ import annotations

import pytest

from db_loader_spark.oracle import compare, duck_connection
from db_loader_spark.queries import all_queries, diagnostic_queries

# Driver registry PLUS the pytest-only diagnostics (quadratic
# verifiers demoted from the registry in r6 — they keep their oracle
# value checks here).
REGISTRY = {**all_queries(), **diagnostic_queries()}


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    res = compare(name, df, spec.oracle, duck)
    assert res.ok, res.detail


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_contract_shapes():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 40
    assert set(o) <= set(q)
    for name, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
