"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` aggregates every implemented operator registry
(SURVEY.md §2 + the training-data suites); ``oracle_sql()`` exposes the
DuckDB-equivalent SQL for all SQL-expressible entries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clinical_trials_etl_spark.operators import (
    analytics,
    dedup,
    events_ops,
    htmlqueries,
    olap,
    multimodal,
    relational2,
    similarity,
    textstats,
)

_REGISTRIES = [
    htmlqueries.QUERIES,
    textstats.QUERIES,
    dedup.QUERIES,
    similarity.QUERIES,
    multimodal.QUERIES,
    events_ops.QUERIES,
    olap.QUERIES,
    analytics.QUERIES,
    relational2.QUERIES,
]


# Round-3 re-certification front (driver records the first 50 merged
# entries in insertion order; see VERDICT.md round-2 items 1-2):
#  - the two queries whose oracle SQL was fixed this round (HUGEINT →
#    BIGINT cast: w4_sessionize, text_rolling_fingerprint);
#  - the two whose semantics changed after their only driver rows
#    (f13 str.strip trimming, commit 716da44; f10 exact findall
#    branching, commit 7abe37e);
#  - the new a17b approx-percentile twin (first driver row);
#  - then every entry that fell OUTSIDE round 2's 50-entry window
#    (analytics tail + relational2), whose hard signal is round-1-only,
#    so the driver re-verifies that tail this round. The r2-green
#    suites fill the remaining slots in registry order; everything is
#    additionally covered every run by tests/test_oracle_parity.py at
#    sf0.001 and sf0.01.
_RECERT_FRONT = [
    "w4_sessionize",
    "text_rolling_fingerprint",
    "f10_age_range",
    "f13_list_preview",
    "a17b_value_percentiles_approx",
    # (a3b_distinct_users_approx is Spark-only — rows-only driver
    # check; its ±3·rsd accuracy contract is pinned in
    # tests/test_oracle_parity.py)
    # outside round 2's driver window (r1 signal only):
    "j3b_active_customers",
    "set_union_except",
    "f2_clean_text",
    "f3_normalize_string",
    "f4_normalize_number",
    "f5_normalize_date",
    "f8_duration",
    "f11_normalize_country",
    "f12_normalize_phase",
    "w2b_top_order_per_segment",
    "p4_match_notnull",
    "p8_project_rename",
    "p9_equality_filter",
    "p10_complete_info",
    "p12_prefix_autocomplete",
    "s14_point_lookup",
    "j2_explode_parent_key",
    "a14_batch_tally",
    "f6_normalize_boolean",
    "f7_extract_year",
    "f9_is_date_valid",
    "q3_shipping_priority",
    "q5_supplier_volume",
]


def _merged() -> dict[str, tuple]:
    """Merged registry. Order matters: the driver records oracle rows
    for exactly the first 50 entries in insertion order, so the
    re-certification list above goes first (SQL-oracled entries always
    ahead of rows-only ones); the rest follow in registry order."""
    oracled: dict[str, tuple] = {}
    rows_only: dict[str, tuple] = {}
    for reg in _REGISTRIES:
        overlap = (oracled.keys() | rows_only.keys()) & reg.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        for name, (fn, sql) in reg.items():
            (oracled if sql is not None else rows_only)[name] = (fn, sql)
    missing = [n for n in _RECERT_FRONT if n not in oracled]
    if missing:
        raise ValueError(f"recert-front names not oracled: {missing}")
    out: dict[str, tuple] = {n: oracled[n] for n in _RECERT_FRONT}
    out.update(oracled)
    out.update(rows_only)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (TPC-H Q1 shape, A11)."""
    return analytics.q_a11_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _merged().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _merged().items() if sql is not None}
