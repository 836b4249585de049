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


def ref_normalize_list(value, separator=","):
    if not value or not isinstance(value, str):
        return []
    items = [item.strip() for item in value.split(separator)]
    return [item for item in items if item]


def ref_normalize_string(value):
    if not value or not isinstance(value, str):
        return value
    return re.sub(r"\s+", " ", value).strip()


def ref_normalize_number_canonical(value):
    """Reference tri-state (int -> float-with-comma -> original),
    projected onto the engine's canonical-string form."""
    if not value or not isinstance(value, str):
        return value
    v = value.strip()
    try:
        return str(int(v))
    except ValueError:
        pass
    try:
        return str(float(v.replace(",", ".")))
    except ValueError:
        pass
    return value


LIST_CASES = [
    "a, b , ,c",
    "one",
    " , ,, ",
    "a,\tb\t, c ",     # tab-padded items must trim clean (str.strip)
    "x;y, z",
]

STRING_CASES = [
    "  a   b\t\tc  ",
    "one\ntwo",
    "clean",
]

# Python-int grammar exotica (underscores "1_0", unicode digits, inf/nan)
# are a documented non-goal of the JVM model; the common grammar must match.
NUMBER_CASES = [
    "12", " 12 ", "+5", "-7", "0040",
    "3,5", "3.5", "1e3", "-2.75",
    "abc", "12abc", "1.2.3",
]


def test_list_string_number_match_reference_model(spark):
    from clinical_trials_etl_spark.functions.normalize import (
        normalize_list,
        normalize_number_canonical,
        normalize_string,
    )

    cases = sorted(set(LIST_CASES + STRING_CASES + NUMBER_CASES))
    df = spark.createDataFrame([(s,) for s in cases], "raw string")
    got = {
        r["raw"]: r
        for r in df.select(
            "raw",
            normalize_list(F.col("raw")).alias("lst"),
            normalize_string(F.col("raw")).alias("st"),
            normalize_number_canonical(F.col("raw")).alias("num"),
        ).collect()
    }
    for s in LIST_CASES:
        assert got[s]["lst"] == ref_normalize_list(s), (s, got[s]["lst"])
    for s in STRING_CASES:
        assert got[s]["st"] == ref_normalize_string(s), (s, got[s]["st"])
    for s in NUMBER_CASES:
        assert got[s]["num"] == ref_normalize_number_canonical(s), (
            s, got[s]["num"], ref_normalize_number_canonical(s),
        )
