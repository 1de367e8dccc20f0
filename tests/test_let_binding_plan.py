"""Pin the let-binding idiom (VERDICT r12 "What's wrong #5").

The PQ building-block expressions bind the 64-dim quantized vector zv
(and each per-subspace slice) via 1-element ``transform(array(<expr>),
x -> <body>)`` wrappers: a lambda variable is bound once per element,
so references inside the body are free. The idiom leans on Catalyst
NOT inlining through a lambda binder — if a future Spark version's
CollapseProject/inline rules substituted the bound expression back into
the per-codeword lambda bodies, the quantization transform would
re-evaluate M*K = 128x per row (measured: sf0.1 encode 1.26 s with the
inlined shape vs 0.51 s let-bound+spread, r12 batch 4).

These tests count the quantization's textual occurrences in the
OPTIMIZED plan: exactly one evaluation site per consumer. A Spark
upgrade that re-inlines trips the count and fails loudly instead of
silently restoring the 128x work.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_aggregator_core_spark.operators import similarity as S


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pq_codes_single_quantization_eval(spark, sf_dir):
    df = S._pq_zvecs(spark, sf_dir).select(
        F.expr(S._PQ_CODES_EXPR).alias("codes")
    )
    plan = _optimized(df)
    # the quantization is the only round() in the subtree; let-bound it
    # appears exactly once (inlined into the array(zv) binder slot)
    assert plan.count("round(") == 1, plan
    # and the binder wrapper itself must survive optimization: the body
    # references the lambda variable, not a re-expanded quantization
    assert plan.count("lambdafunction") >= 1


def test_pq_dt_single_quantization_eval(spark, sf_dir):
    df = (
        S._pq_zvecs(spark, sf_dir)
        .filter(F.expr(S._QUERY_FILTER))
        .select(F.posexplode(F.expr(S._PQ_DT_EXPR)).alias("m", "partials"))
    )
    plan = _optimized(df)
    assert plan.count("round(") == 1, plan
