"""Query/oracle registry backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2 registers here a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the equivalent
DuckDB oracle SQL. The driver compares them at sf=0.01 (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased IDENTICALLY in Spark and SQL;
- double-valued aggregates are rounded the same number of places on both
  sides (cross-engine float summation order differs in the last ulps);
- DuckDB's integer SUM returns INT128 — oracles cast to BIGINT/DOUBLE to
  match Spark's types.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import (  # noqa: F401
        aggregates,
        analytic,
        analytic2,
        dedup,
        frequency,
        multimodal,
        pipeline,
        relational,
        reshape,
        scalarfn,
        scale,
        scans,
        similarity,
        textops,
        timeseries,
        windows,
    )
    from .streaming import stateful as stream_stateful  # noqa: F401
    from .streaming import windows as stream_windows  # noqa: F401
