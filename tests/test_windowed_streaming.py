"""Watermarked windowed streaming aggregation tests (SURVEY.md §2.9)."""

from __future__ import annotations

import pytest

from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.streaming.windowed import (
    run_windowed_counts,
    windowed_op_counts,
)

SPEC = LogSpec(
    n_events=3000, n_hosts=10, paths_per_host=40, seed=11,
    ooo_frac=0.3, max_lag_s=1800,
)


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wal_windowed"))
    write_changelog_segments(spark, SPEC, d, n_segments=6)
    return d


def test_streamed_windows_match_batch_oracle(spark, log_dir, tmp_path):
    emitted = run_windowed_counts(
        spark, log_dir, str(tmp_path / "ckpt"),
        query_name="wc_test", window_duration="5 minutes",
        watermark="40 minutes",
    ).collect()
    # multiple micro-batches advanced the watermark, so a prefix of the
    # stream's windows finalized and was emitted exactly once
    assert len(emitted) > 0
    keys = [(r["window_start"], r["op"]) for r in emitted]
    assert len(keys) == len(set(keys)), "append mode emitted a window twice"

    # every finalized window must exactly equal the batch computation
    # (same aggregation on the data at rest — late events within the
    # watermark were waited for, none lost)
    static = spark.read.option("basePath", log_dir).parquet(log_dir)
    oracle = {
        (r["window_start"], r["op"]): (r["cnt"], r["approx_urls"])
        for r in windowed_op_counts(
            static, "5 minutes", "40 minutes"
        ).collect()
    }
    for r in emitted:
        k = (r["window_start"], r["op"])
        assert k in oracle
        assert (r["cnt"], r["approx_urls"]) == oracle[k], k


def test_windowed_state_is_bounded(spark, log_dir):
    """The aggregation groups by (window, op): distinct windows is
    bounded by the time span / window size, not the event count."""
    static = spark.read.option("basePath", log_dir).parquet(log_dir)
    res = windowed_op_counts(static, "5 minutes", "40 minutes").collect()
    span_s = SPEC.n_events + SPEC.max_lag_s  # lsn-seconds span of the log
    max_windows = span_s // 300 + 2
    n_windows = len({r["window_start"] for r in res})
    assert 0 < n_windows <= max_windows


def test_streamed_session_windows_match_batch_oracle(spark, log_dir, tmp_path):
    from clinical_trials_etl_spark.streaming.windowed import (
        run_sessionized_counts,
        sessionized_host_counts,
    )

    emitted = run_sessionized_counts(
        spark, log_dir, str(tmp_path / "ckpt_sess"),
        query_name="sess_test", gap="10 minutes", watermark="40 minutes",
    ).collect()
    assert len(emitted) > 0
    keys = [(r["session_start"], r["host"]) for r in emitted]
    assert len(keys) == len(set(keys)), "a finalized session emitted twice"

    static = spark.read.option("basePath", log_dir).parquet(log_dir)
    oracle = {
        (r["session_start"], r["host"]): (r["session_end"], r["cnt"])
        for r in sessionized_host_counts(
            static, "10 minutes", "40 minutes"
        ).collect()
    }
    for r in emitted:
        k = (r["session_start"], r["host"])
        assert k in oracle, k
        assert (r["session_end"], r["cnt"]) == oracle[k], k
