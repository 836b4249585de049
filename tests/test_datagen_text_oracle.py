"""Independent text oracle: the datagen declares, as a Spark column
expression, the EXACT text the reference chain extracts from each
generated page (datagen/changelog.py::_html_and_text). The kernel must
reproduce it byte-for-byte — unlike reference_fold (which calls the
same pure-Python kernel), this oracle shares no code with the kernel,
so it catches semantic drift in either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    changelog_df,
    expected_page_text,
)
from clinical_trials_etl_spark.functions.html_extract import extract_text_udf


@pytest.mark.parametrize("pad", [0, 40])
def test_kernel_matches_declared_text(spark, pad):
    spec = LogSpec(n_events=300, n_hosts=6, seed=13, html_pad_blocks=pad)
    log = changelog_df(spark, spec).filter(F.col("op") != "D")
    _html, declared = expected_page_text(spec)
    checked = log.select(
        "lsn",
        declared.alias("expected"),
        extract_text_udf(F.col("html")).alias("extracted"),
    )
    bad = checked.filter(F.col("expected") != F.col("extracted"))
    assert bad.count() == 0, bad.limit(3).collect()
    assert checked.count() > 0
