"""Validation/quarantine rule tests (SURVEY.md §5 — the reference's
runtime quality rules as one-pass Column predicates)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_trials_etl_spark import validation as V


def _trials_df(spark):
    d = datetime.date
    return spark.createDataFrame(
        [
            Row(key="t1", key_detail="t1", start=d(2024, 1, 1),
                end=d(2024, 6, 1), summary_countries=["France"],
                detail_countries=["France", "Spain"]),
            Row(key="t2", key_detail="t2", start=d(2024, 6, 1),
                end=d(2024, 1, 1), summary_countries=["France"],
                detail_countries=["France"]),          # date order violated
            Row(key="t3", key_detail="OTHER", start=None,
                end=d(2024, 1, 1), summary_countries=["Italy"],
                detail_countries=["France"]),          # key + subset violated
            Row(key="", key_detail=None, start=None, end=None,
                summary_countries=None, detail_countries=None),  # missing key
        ]
    )


def _rules():
    return {
        "missing_key": V.required("key"),
        "date_order": V.date_order("start", "end"),
        "key_mismatch": V.fields_equal("key", "key_detail"),
        "summary_not_subset": V.subset_of(
            "summary_countries", "detail_countries"
        ),
    }


def test_validate_and_split(spark):
    validated = V.validate(_trials_df(spark), _rules())
    clean, quarantined = V.split(validated)

    assert [r["key"] for r in clean.collect()] == ["t1"]
    issues = {r["key"]: set(r[V.ISSUES_COL]) for r in quarantined.collect()}
    assert issues["t2"] == {"date_order"}
    assert issues["t3"] == {"key_mismatch", "summary_not_subset"}
    assert issues[""] == {"missing_key"}


def test_issue_counts(spark):
    validated = V.validate(_trials_df(spark), _rules())
    _, quarantined = V.split(validated)
    counts = {r["issue"]: r["cnt"] for r in V.issue_counts(quarantined).collect()}
    assert counts == {
        "date_order": 1,
        "key_mismatch": 1,
        "summary_not_subset": 1,
        "missing_key": 1,
    }


def test_pages_rules_on_changelog(spark):
    from clinical_trials_etl_spark.datagen.changelog import LogSpec, changelog_df

    log = changelog_df(spark, LogSpec(n_events=500, n_hosts=10, seed=3))
    validated = V.validate(log, V.pages_rules())
    clean, quarantined = V.split(validated)
    # the generator emits well-formed events: everything passes
    assert quarantined.count() == 0
    assert clean.count() == log.count()

    # corrupt some rows and confirm they quarantine with the right reasons
    corrupted = log.withColumn(
        "url", F.when(F.col("lsn") % 100 == 0, F.lit(None)).otherwise(F.col("url"))
    )
    _, q2 = V.split(V.validate(corrupted, V.pages_rules()))
    assert q2.count() == corrupted.filter(F.col("url").isNull()).count()
    assert set(q2.select(F.explode(V.ISSUES_COL)).distinct().toPandas()["col"]) == {
        "missing_url"
    }
