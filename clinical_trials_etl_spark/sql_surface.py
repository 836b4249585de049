"""Raw-SQL query surface (SURVEY.md §3.3 — custom/raw query passthrough).

The reference lets users submit raw MongoDB find/aggregate JSON which is
executed verbatim (st_trial_analytics.py:1842-1851). The Spark-native
equivalent is ``spark.sql`` over registered views: parse -> analyze ->
optimize -> execute all inside Catalyst, so user queries get predicate
pushdown / pruning / AQE for free (SURVEY.md §4).

``register_star_schema`` exposes the driver star schema;
``register_lake_table`` exposes a live CDC lake table snapshot, so
`SELECT lang, count(*) FROM pages GROUP BY 1` style queries run against
the latest committed snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clinical_trials_etl_spark.lake.table import LakeTable

STAR_TABLES = [
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
]


def register_star_schema(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register the driver's parquet star schema as temp views."""
    names = tables or STAR_TABLES
    for name in names:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(
            name
        )
    return names


def register_lake_table(
    spark: SparkSession, table: LakeTable, name: str = "pages",
    version: int | None = None,
) -> str:
    """Register a lake-table snapshot (live rows) as a temp view —
    optionally a historical snapshot (time travel by version)."""
    table.read(version).createOrReplaceTempView(name)
    return name


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Execute a user SQL query over the registered views."""
    return spark.sql(query)
