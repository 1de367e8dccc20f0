"""End-to-end: every registered query matches its DuckDB oracle at sf0.001
(the driver repeats this at sf0.01). Queries without an oracle get a
rows-executable smoke check."""

from __future__ import annotations

import pytest

from dig_aggregator_core_spark import registry

from .oracle import compare, duck_con

registry.load_all()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = registry.QUERIES[name](spark, sf_dir)
    if name in registry.ORACLES:
        compare(df, con, registry.ORACLES[name])
    else:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        assert df.schema is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
    keys = set(e.queries())
    assert set(e.oracle_sql()) <= keys
