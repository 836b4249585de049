"""Raw-SQL passthrough surface tests (SURVEY.md §3.3)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from clinical_trials_etl_spark import sql_surface
from clinical_trials_etl_spark.cdc.replay import replay
from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    write_changelog_segments,
)


def test_star_schema_sql_matches_dataframe(spark, sf_dir):
    sql_surface.register_star_schema(spark, sf_dir)
    via_sql = sql_surface.sql(
        spark,
        "SELECT c_mktsegment, COUNT(*) AS cnt FROM customer "
        "GROUP BY c_mktsegment ORDER BY cnt DESC, c_mktsegment",
    ).collect()
    via_df = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "c_mktsegment")
        .collect()
    )
    assert via_sql == via_df


def test_lake_table_view_and_time_travel(spark):
    work = tempfile.mkdtemp(prefix="sql_surface_")
    spec = LogSpec(n_events=1500, n_hosts=20, seed=7)
    write_changelog_segments(spark, spec, f"{work}/log", n_segments=4)
    table = replay(spark, f"{work}/log", f"{work}/table")

    sql_surface.register_lake_table(spark, table, "pages")
    counts = sql_surface.sql(
        spark,
        "SELECT language, COUNT(*) AS cnt FROM pages "
        "GROUP BY language ORDER BY cnt DESC, language",
    ).collect()
    assert sum(r["cnt"] for r in counts) == table.read().count()
    assert all(r["language"] is not None for r in counts)

    # time travel: an earlier snapshot has fewer-or-equal rows and the
    # query surface works identically against it
    versions = [v for v in range(table.current_version() + 1)]
    mid = versions[len(versions) // 2]
    sql_surface.register_lake_table(spark, table, "pages_mid", version=mid)
    n_mid = sql_surface.sql(spark, "SELECT COUNT(*) AS n FROM pages_mid").collect()[0]["n"]
    n_now = table.read().count()
    assert 0 <= n_mid <= spec.n_events
    assert n_now != 0
