"""Local mirror of the driver's DuckDB-oracle comparison: row count, column
names (sorted), and order-insensitive values must match.

Comparison is strict: rows become repr-strings (floats normalized through
round(.,6)+0.0 so -0.0 == 0.0 and NaN is a token) and are compared as
multisets — stricter than float-equality, catching representation drift the
driver's value-hash would also catch."""

from __future__ import annotations

import math

import duckdb
import numpy as np

SF_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in SF_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return round(v, 6) + 0.0
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(df) -> list[str]:
    cols = sorted(df.columns, key=str.lower)
    rows = [
        repr(tuple(_norm(x) for x in r))
        for r in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def compare(spark_df, con, sql: str) -> None:
    sdf = spark_df.toPandas()
    odf = con.execute(sql).fetchdf()
    s_cols = sorted(c.lower() for c in sdf.columns)
    o_cols = sorted(c.lower() for c in odf.columns)
    assert s_cols == o_cols, f"columns differ: {s_cols} vs {o_cols}"
    assert len(sdf) == len(odf), f"row count differs: {len(sdf)} vs {len(odf)}"
    s_rows, o_rows = _canon(sdf), _canon(odf)
    bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    assert not bad, f"{len(bad)} row diffs (first 3): {bad[:3]}"
