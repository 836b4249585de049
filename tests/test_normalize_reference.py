"""Reference-semantics goldens for normalize_age_range (F10): an
independent Python model of the reference's findall-based branching
(trials_extractor/processors/normalizer.py:87-115), run against the
Spark Column expression on adversarial inputs — including the cases
where naive regex models diverge (bare numbers, dash not between the
numbers, '+' and '-' both present).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from clinical_trials_etl_spark.functions.normalize import normalize_age_range


def ref_age_range(value):
    """Line-for-line model of the reference's branching."""
    if not value or not isinstance(value, str):
        return (None, None)
    numbers = re.findall(r"\d+", value)
    min_age = None
    max_age = None
    if "+" in value and numbers:
        min_age = int(numbers[0])
    elif "-" in value and len(numbers) >= 2:
        min_age = int(numbers[0])
        max_age = int(numbers[1])
    return (min_age, max_age)


CASES = [
    "65+ years",
    "18-64 years",
    "18 years",                # bare number -> (None, None)
    "up to 17 years (child)-ish",  # dash AFTER both... one number only
    "between 18 and 64 - adults",  # dash not between the numbers
    "65+ (18-64 excluded)",    # both '+' and '-': '+' branch wins
    "+",                       # '+' but no numbers
    "- 5",                     # dash with one number -> (None, None)
    "5 - 9",
    "no ages here",
    "",
    "12-34-56",                # three runs: first two win
]


def test_age_range_matches_reference_model(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "raw string")
    parsed = normalize_age_range(F.col("raw"))
    got = {
        r["raw"]: (r["mn"], r["mx"])
        for r in df.select(
            "raw",
            parsed["min"].alias("mn"),
            parsed["max"].alias("mx"),
        ).collect()
    }
    for s in CASES:
        assert got[s] == ref_age_range(s), (s, got[s], ref_age_range(s))
