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
    multimodal,
    relational2,
    similarity,
    textstats,
)

_REGISTRIES = [
    analytics.QUERIES,
    relational2.QUERIES,
    textstats.QUERIES,
    dedup.QUERIES,
    similarity.QUERIES,
    multimodal.QUERIES,
]


def _merged() -> dict[str, tuple]:
    out: dict[str, tuple] = {}
    for reg in _REGISTRIES:
        overlap = out.keys() & reg.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(reg)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (TPC-H Q1 shape, A11)."""
    return analytics.q_a11_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _merged().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _merged().items() if sql is not None}
