"""dig-aggregator-core-spark: a PySpark-native analytics engine with the
capabilities of broadinstitute/dig-aggregator-core (see SURVEY.md).

Layer A (analytics operators): pure DataFrame/Spark SQL — `operators/`,
`functions/`.
Layer B (incremental dataflow engine): glob sources, stage rules, delta
anti-join against a Parquet ledger — `plans/`, `sources/`.
Streaming parity/extension: `streaming/`.
"""

__version__ = "0.1.0"
