"""Physical-plan shape assertions — the 100 TB guardrails. These pin
the plans that correctness tests can't see: no global single-partition
sort in pagination, broadcast joins for dims, single Arrow UDF
evaluation for multi-field extraction, pushed-down parquet filters."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_trials_etl_spark.operators import analytics as A
from clinical_trials_etl_spark.operators import htmlqueries as HQ


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_p7_pagination_has_no_global_window_sort(spark, sf_dir):
    plan = _plan(A.q_p7_pagination(spark, sf_dir))
    assert "Window" not in plan, "global row_number window is back"
    assert "TakeOrderedAndProject" in plan


def test_j4_dims_are_broadcast(spark, sf_dir):
    plan = _plan(A.q_j4_revenue_by_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_multi_field_extractor_evaluates_udf_once(spark, sf_dir):
    df = HQ.q_html_selector_fields(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("ArrowEvalPython") == 1


def test_parquet_filter_pushdown(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_totalprice")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan
    # column pruning reaches the scan
    assert "o_comment" not in plan
