"""Snapshot-metadata hygiene: commits must write O(touched buckets)
metadata, not O(history) — snapshot JSON size stays bounded as commits
accumulate, untouched buckets keep their manifest entries (no file-list
rewrite), batch idempotence uses the bounded hwm/recent scheme, and
lineage accrues in per-commit sidecars."""

from __future__ import annotations

import os

from clinical_trials_etl_spark.cdc.apply import apply_batch
from clinical_trials_etl_spark.cdc.replay import create_pages_table

COLS = (
    "lsn long, op string, url string, warc_ts timestamp, html binary,"
    " lang string, language string, fetch_status long, schema_ver int"
)


def _batch(spark, lsn0, urls):
    return spark.createDataFrame(
        [
            (lsn0 + i, "I", u, None, f"<p>{u}-{lsn0}</p>".encode(), "en",
             None, None, 1)
            for i, u in enumerate(urls)
        ],
        COLS,
    )


def test_snapshot_size_bounded_and_manifests_reused(spark, tmp_path):
    table = create_pages_table(spark, str(tmp_path / "t"), n_buckets=8)
    sizes = []
    for i in range(12):
        apply_batch(table, _batch(spark, i * 10, [f"https://h/{i}"]), f"e-{i}")
        sizes.append(os.path.getsize(table._snap_path(table.current_version())))
    # size is O(n_buckets), not O(commits): the last snapshot must not
    # have grown meaningfully past the point where all buckets exist
    assert sizes[-1] <= sizes[5] * 1.5

    # a merge touching one bucket must keep other buckets' file entries
    # pointing at their existing (immutable) manifests
    snap_before = table.snapshot()
    apply_batch(table, _batch(spark, 1000, ["https://h/0"]), "e-100")
    snap_after = table.snapshot()
    changed = {
        b
        for b in snap_before["manifests"]
        if snap_after["manifests"].get(b) != snap_before["manifests"][b]
    }
    assert len(changed) == 1  # only the touched bucket remapped


def test_batch_hwm_idempotence(spark, tmp_path):
    table = create_pages_table(spark, str(tmp_path / "t2"), n_buckets=4)
    apply_batch(table, _batch(spark, 0, ["https://a/1"]), "epoch-0")
    apply_batch(table, _batch(spark, 10, ["https://a/2"]), "epoch-1")
    v = table.current_version()
    # exact re-delivery of either epoch is a metadata no-op
    assert apply_batch(table, _batch(spark, 0, ["https://a/1"]), "epoch-0")["skipped"]
    assert apply_batch(table, _batch(spark, 10, ["https://a/2"]), "epoch-1")["skipped"]
    assert table.current_version() == v
    # non-numeric ids go through the recent set
    assert not table.is_applied("manual-backfill")
    apply_batch(table, _batch(spark, 20, ["https://a/3"]), "manual-backfill")
    assert table.is_applied("manual-backfill")
    # snapshot carries bounded structures only
    snap = table.snapshot()
    assert "applied_batches" not in snap and "files" not in snap
    assert len(snap["applied_recent"]) <= table._RECENT_CAP


def test_lineage_sidecars_in_commit_order(spark, tmp_path):
    table = create_pages_table(spark, str(tmp_path / "t3"), n_buckets=4)
    for i in range(3):
        apply_batch(table, _batch(spark, i * 10, [f"https://b/{i}"]), f"e-{i}")
    lin = table.lineage()
    assert [e["batch_id"] for e in lin if e["type"] == "merge"] == [
        "e-0",
        "e-1",
        "e-2",
    ]
