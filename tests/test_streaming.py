"""Streaming shell tests: foreachBatch apply with checkpoint, restart
convergence, metrics listener (SURVEY.md §7 stage 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_trials_etl_spark.cdc.replay import create_pages_table
from clinical_trials_etl_spark.cdc.stream import run_stream
from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.datagen.reference_fold import fold_changelog

SPEC = LogSpec(n_events=1200, n_hosts=8, paths_per_host=30, seed=7)


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wal_stream"))
    write_changelog_segments(spark, SPEC, d, n_segments=4)
    return d


def _expected(spark, log_dir):
    rows = [
        r.asDict()
        for r in spark.read.option("basePath", log_dir).parquet(log_dir).collect()
    ]
    return fold_changelog(rows)


def test_stream_apply_and_restart(spark, log_dir, tmp_path):
    table = create_pages_table(spark, str(tmp_path / "tbl"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "metrics")

    progress = run_stream(
        spark, log_dir, table, ckpt, max_files_per_trigger=2,
        metrics_path=metrics,
    )
    assert len(progress) >= 2  # multiple micro-batches ran
    want = _expected(spark, log_dir)
    got_urls = {r["url"] for r in table.read().select("url").collect()}
    assert got_urls == set(want)

    v1 = table.current_version()
    # restart from checkpoint: nothing new -> no new commits
    run_stream(spark, log_dir, table, ckpt, max_files_per_trigger=2)
    assert table.current_version() == v1

    # metrics table landed with per-batch rows (listener events are
    # delivered async: the live progress list can gain a final event
    # after the parquet flush, so allow a one-event skew)
    m = spark.read.parquet(metrics)
    assert abs(m.count() - len(progress)) <= 1 and m.count() >= 2
    assert m.agg(F.sum("num_input_rows")).collect()[0][0] >= SPEC.n_events

    # lineage: every merge commit carries its epoch + touched buckets
    merges = [e for e in table.lineage() if e["type"] == "merge"]
    assert merges and all("epoch" in e and e["touched_buckets"] for e in merges)


def test_stream_full_state_equivalence(spark, log_dir, tmp_path):
    """Value-level equivalence of the streamed table vs the fold."""
    table = create_pages_table(spark, str(tmp_path / "tbl2"), n_buckets=8)
    run_stream(spark, log_dir, table, str(tmp_path / "ckpt2"))
    want = _expected(spark, log_dir)
    rows = table.read().collect()
    assert len(rows) == len(want)
    for r in rows:
        w = want[r["url"]]
        assert r["text"] == w["text"]
        assert r["language"] == w["language"]
        assert r["warc_ts"] == w["warc_ts"]


def test_stream_merge_on_read_with_compaction(spark, log_dir, tmp_path):
    """Delta-mode streaming + periodic compaction converges to the
    identical state as COW streaming, and the compaction boundary
    actually folded layers (some commits are compactions)."""
    table = create_pages_table(spark, str(tmp_path / "tbl_mor"), n_buckets=8)
    run_stream(
        spark, log_dir, table, str(tmp_path / "ckpt_mor"),
        max_files_per_trigger=1, merge_mode="delta", compact_every=2,
    )
    want = _expected(spark, log_dir)
    got = {r["url"]: r["text"] for r in table.read().collect()}
    assert set(got) == set(want)
    assert all(got[u] == want[u]["text"] for u in want)
    kinds = {e["type"] for e in table.lineage()}
    assert "compaction" in kinds
    # a kill/resume over the same checkpoint is a no-op
    v = table.current_version()
    run_stream(
        spark, log_dir, table, str(tmp_path / "ckpt_mor"),
        max_files_per_trigger=1, merge_mode="delta", compact_every=2,
    )
    assert table.current_version() == v
