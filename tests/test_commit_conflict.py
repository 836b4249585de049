"""Optimistic-concurrency tripwire on snapshot commits.

The table is single-writer by design (one streaming query per
checkpoint — the Structured Streaming model); these pin what happens
when that assumption is violated or a commit crashes mid-flight:

- committing a version that already exists raises CommitConflict
  (atomic create-if-absent via hard link) instead of silently
  last-writer-wins overwriting the snapshot chain;
- a manifest left by a CRASHED attempt (write-then-commit order, no
  snapshot landed) is legitimately replaced by the single-writer
  retry; a manifest belonging to a COMMITTED snapshot is not;
- the _current pointer is a hint: a crash between snapshot link and
  pointer update self-heals (roll-forward), it does not wedge the
  next commit in an unwinnable conflict.
"""

from __future__ import annotations

import os

import pytest

from clinical_trials_etl_spark.lake.table import CommitConflict, LakeTable

FIELDS = [
    {"id": 1, "name": "url", "type": "string"},
    {"id": 2, "name": "val", "type": "string"},
]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, val string, lsn long, op string")


def _table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, "url",
                         n_buckets=2)
    t.merge(_batch(spark, [("u1", "a", 1, "I")]), batch_id="e-1")
    return t


def test_snapshot_commit_conflict_raises(spark, tmp_path):
    t = _table(spark, tmp_path)
    snap = dict(t.snapshot())
    # a concurrent winner already owns this version number
    with pytest.raises(CommitConflict, match="concurrent writer"):
        t._write_snapshot(snap)
    # the winner's snapshot content is untouched
    assert t.read().count() == 1
    # the next version commits normally
    t.merge(_batch(spark, [("u2", "b", 2, "I")]), batch_id="e-2")
    assert t.read().count() == 2


def test_crashed_manifest_residue_is_replaced_on_retry(spark, tmp_path):
    t = _table(spark, tmp_path)
    v_next = t.current_version() + 1
    # crashed attempt: manifest written, snapshot never committed
    t._write_manifest(v_next, {"0": []})
    # the single-writer retry replaces the residue and commits
    t.merge(_batch(spark, [("u2", "b", 2, "I")]), batch_id="e-2")
    assert t.current_version() == v_next
    assert t.read().count() == 2


def test_manifest_of_committed_snapshot_is_protected(spark, tmp_path):
    t = _table(spark, tmp_path)
    v = t.current_version()  # v1: committed merge with its manifest
    with pytest.raises(CommitConflict, match="already-committed"):
        t._write_manifest(v, {"0": []})


def test_stale_current_pointer_rolls_forward(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("u2", "b", 2, "I")]), batch_id="e-2")
    v = t.current_version()
    # crash between snapshot link and pointer update: pointer lags
    with open(os.path.join(t.meta_dir, "_current"), "w") as f:
        f.write(str(v - 1))
    assert t.current_version() == v
    # and the next commit proceeds instead of wedging in a conflict
    t.merge(_batch(spark, [("u3", "c", 3, "I")]), batch_id="e-3")
    assert t.current_version() == v + 1
    assert t.read().count() == 3
