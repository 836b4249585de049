"""Partition evolution (LakeTable.rebucket): the bucket layout changes,
the data must not — reads, point lookups, time travel, and subsequent
CDC merges all stay correct under the new bucket count.
"""

from __future__ import annotations

import pytest

from clinical_trials_etl_spark.cdc.apply import apply_batch
from clinical_trials_etl_spark.cdc.replay import (
    create_pages_table,
    list_segments,
    replay,
)
from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.datagen.reference_fold import fold_changelog

SPEC = LogSpec(n_events=2500, n_hosts=10, paths_per_host=40, seed=17)


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wal_rebucket"))
    write_changelog_segments(spark, SPEC, d, n_segments=6)
    return d


@pytest.fixture(scope="module")
def expected(spark, log_dir):
    rows = [
        r.asDict()
        for r in spark.read.option("basePath", log_dir)
        .parquet(log_dir)
        .collect()
    ]
    return fold_changelog(rows)


def _state(table, version=None):
    rows = table.read(version=version).collect()
    return {r["url"]: (r["text"], r["warc_ts"]) for r in rows}


def test_rebucket_preserves_state_and_layout_metadata(
    spark, log_dir, expected, tmp_path
):
    table = replay(
        spark, log_dir, str(tmp_path / "t"), n_buckets=8,
        segments_per_batch=1,
    )
    before = _state(table)
    v_before = table.current_version()

    stats = table.rebucket(32)
    assert stats["rebucketed"] and stats["n_buckets"] == 32
    assert table.snapshot()["n_buckets"] == 32

    # data unchanged under the new layout
    assert _state(table) == before
    # time travel: the pre-rebucket snapshot still reads its own layout
    assert _state(table, version=v_before) == before
    # full state still equals the independent fold
    got = _state(table)
    assert set(got) == set(expected)
    assert all(got[u][0] == expected[u]["text"] for u in expected)

    # point lookup hashes with the new bucket count
    some_url = sorted(expected)[0]
    row = table.lookup(some_url).collect()
    assert len(row) == 1 and row[0]["url"] == some_url

    # a no-op rebucket is refused cheaply
    assert table.rebucket(32)["rebucketed"] is False


def test_merges_after_rebucket_match_fold(spark, log_dir, expected, tmp_path):
    segs = list_segments(log_dir)
    half = len(segs) // 2

    table = create_pages_table(spark, str(tmp_path / "staged"), n_buckets=8)
    for i, seg in enumerate(segs[:half]):
        batch = spark.read.option("basePath", log_dir).parquet(seg)
        apply_batch(table, batch, f"seg-{i:04d}")
    table.rebucket(32)
    for i, seg in enumerate(segs[half:], start=half):
        batch = spark.read.option("basePath", log_dir).parquet(seg)
        apply_batch(table, batch, f"seg-{i:04d}")

    got = _state(table)
    assert set(got) == set(expected)
    assert all(got[u][0] == expected[u]["text"] for u in expected)
