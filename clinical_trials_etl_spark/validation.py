"""Distributed data-quality validation with a quarantine path
(SURVEY.md §5 — the reference's runtime validation rules, which are its
de-facto definition of correctness, re-expressed as declarative Column
predicates evaluated in one pass).

Reference rules ported (trials_extractor/processors/validator.py):

- required sections/fields present            (validator.py:36-76)
- date coherence: start <= end                (validator.py:78-105)
- cross-field key consistency                 (validator.py:107-135)
- subset consistency: summary list ⊆ details  (validator.py:138-148)

Design: a rule is ``(name, predicate Column)`` where the predicate is
TRUE when the row passes. ``validate`` evaluates every rule in a single
projection (no shuffle, whole-stage codegen) and returns the row set
annotated with an ``_issues`` array of failed rule names; ``split``
separates clean rows from quarantined ones. Unlike the reference —
which validates AFTER persisting, so invalid docs land in the store
(main.py:189-193, noted in SURVEY.md §3.1) — the quarantine path runs
before the sink.

At 100 TB this is one narrow map over the batch: no aggregation, no
collect; issue tallies (the reference's per-batch accounting) are a
separate groupBy over the exploded issue names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ISSUES_COL = "_issues"


# ------------------------------------------------------------ rule builders


def required(col: Column | str) -> Column:
    """Field must be present and non-empty (validator.py:36-76)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (c.cast("string") != "")


def date_order(start: Column | str, end: Column | str) -> Column:
    """start <= end when both present (validator.py:78-105). Rows with
    either side missing pass — the reference only flags when both parse."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return s.isNull() | e.isNull() | (s <= e)


def fields_equal(a: Column | str, b: Column | str) -> Column:
    """Cross-section key consistency (validator.py:119-135): two copies
    of the same identifier must agree when both present."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return ca.isNull() | cb.isNull() | (ca == cb)


def subset_of(subset: Column | str, superset: Column | str) -> Column:
    """Array containment (validator.py:138-148): every summary entry
    must appear in the detailed list."""
    sub = F.col(subset) if isinstance(subset, str) else subset
    sup = F.col(superset) if isinstance(superset, str) else superset
    return (
        sub.isNull()
        | sup.isNull()
        | (F.size(F.array_except(sub, sup)) == 0)
    )


# ---------------------------------------------------------------- evaluate


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Annotate every row with the names of the rules it fails, in one
    codegen'd projection."""
    issue_arr = F.array_compact(
        F.array(
            *[
                F.when(~pred, F.lit(name)).otherwise(F.lit(None))
                for name, pred in rules.items()
            ]
        )
    )
    return df.withColumn(ISSUES_COL, issue_arr)


def split(validated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the issues col, quarantined rows with it)."""
    clean = validated.filter(F.size(F.col(ISSUES_COL)) == 0).drop(ISSUES_COL)
    quarantined = validated.filter(F.size(F.col(ISSUES_COL)) > 0)
    return clean, quarantined


def issue_counts(quarantined: DataFrame) -> DataFrame:
    """Per-rule violation tally (the reference's batch accounting,
    batch_utils.py:67-69, as an aggregate)."""
    return (
        quarantined.select(F.explode(F.col(ISSUES_COL)).alias("issue"))
        .groupBy("issue")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "issue")
    )


# ------------------------------------------------- pages-domain rule set


def pages_rules() -> dict[str, Column]:
    """The reference rule set mapped onto the change-stream pages domain:
    url is the natural key (euct_number analog), warc_ts the capture
    date, html required for upserts."""
    return {
        "missing_url": required("url"),
        "missing_warc_ts": required(F.col("warc_ts").cast("string")),
        "missing_html_on_upsert": (F.col("op") == "D")
        | F.col("html").isNotNull(),
        "lsn_nonnegative": F.col("lsn") >= 0,
    }
