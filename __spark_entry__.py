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


# Round-4 re-certification front (driver records the first 50 merged
# entries in insertion order; VERDICT.md round-3 items 1-2):
#  - the 7 queries (LSH/simhash/ANN/near-dup/IVF/mm_feature/a3b) that
#    have NEVER had a driver row — rounds 1-3 always placed them (all
#    rows-only then) behind the 76 SQL-oracled entries, outside the
#    50-row window. mm_feature_extract gained a full DuckDB oracle in
#    round 4 (sha256 hex-slice twin); the other six stay rows-only,
#    where the driver record (row-count + schema + no-crash) is still
#    independent signal the repo's own tests can't provide;
#  - html_adversarial_text (new this round): driver-oracled
#    certification of the round-3 fast-path risk guard on pages that
#    exercise its parser and degradation branches;
#  - then the 26 oracled queries whose newest driver row is round-2
#    (the analytics/window/predicate/join tail — code byte-unchanged
#    since, per VERDICT.md, but their hard signal would otherwise turn
#    two rounds old). The remaining ~16 slots fill in registry order
#    with round-3-fresh queries; everything is additionally covered
#    every run by tests/test_oracle_parity.py at sf0.001 and sf0.01.
_RECERT_FRONT = [
    # never driver-checked (rows-only)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_lsh_topk",
    "sim_near_dup_pairs",
    "sim_ivf_topk",
    "mm_feature_extract",
    "a3b_distinct_users_approx",
    # new this round (oracled)
    "html_adversarial_text",
    # round-2-tail oracled queries (re-certify before signal ages out)
    "a16_rollup_status_priority",
    "a17_value_percentiles",
    "a1_event_type_counts",
    "a2_top10_words",
    "a3_distinct_users",
    "a4_mktsegment_counts",
    "a5_top_order_priorities",
    "a6_returnflag_status_counts",
    "a7_orders_timeline",
    "a8_nation_multiagg",
    "a9_filtered_count",
    "a10_props_value_counts",
    "a11_pricing_summary",
    "a13_customer_cohorts",
    "w1_rolling_mean_daily",
    "w2_top_nation",
    "w3_max_lsn_per_key",
    "p5_regex_filter",
    "p6_date_range",
    "p7_pagination",
    "p11_multi_col_search",
    "p13_truncate",
    "p14_fillna",
    "j4_revenue_by_nation",
    "j4b_parttype_revenue",
    "j3_customers_without_orders",
]


def _merged() -> dict[str, tuple]:
    """Merged registry. Order matters: the driver records oracle rows
    for exactly the first 50 entries in insertion order, so the
    re-certification list above goes first (and may include rows-only
    entries — that IS how they get their driver record); the remaining
    SQL-oracled entries follow in registry order, then any remaining
    rows-only ones."""
    oracled: dict[str, tuple] = {}
    rows_only: dict[str, tuple] = {}
    for reg in _REGISTRIES:
        overlap = (oracled.keys() | rows_only.keys()) & reg.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        for name, (fn, sql) in reg.items():
            (oracled if sql is not None else rows_only)[name] = (fn, sql)
    missing = [n for n in _RECERT_FRONT
               if n not in oracled and n not in rows_only]
    if missing:
        raise ValueError(f"recert-front names unregistered: {missing}")
    out: dict[str, tuple] = {
        n: (oracled.get(n) or rows_only[n]) for n in _RECERT_FRONT
    }
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
