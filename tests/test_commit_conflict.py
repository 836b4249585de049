"""Optimistic-concurrency tripwire on snapshot commits.

The table is single-writer by design (one streaming query per
checkpoint — the Structured Streaming model); these pin what happens
when that assumption is violated or a commit crashes mid-flight:

- committing a version that already exists raises CommitConflict
  (atomic create-if-absent via hard link) instead of silently
  last-writer-wins overwriting the snapshot chain;
- manifests live at unique paths and are only ever reachable through
  a committed snapshot / lineage entry, so rivals racing on one
  version number can't cross-link each other's file lists during the
  write-then-commit window — the loser's manifest is inert residue;
- the _current pointer is a hint: a crash between snapshot link and
  pointer update self-heals (roll-forward), it does not wedge the
  next commit in an unwinnable conflict;
- the ONE sanctioned concurrent writer — a maintenance compact()
  beside the ingest stream (Iceberg rewrite_data_files pattern) —
  REBASES on a lost race when the winners only appended delta layers
  (the rewrite's inputs are all still live), and hard-conflicts when
  a winner rewrote an input (COW merge / rebucket): the RewriteFiles
  validation analog.
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


def test_manifests_are_unique_path_never_clobbered(spark, tmp_path):
    """Two writers racing on the SAME version number each get their
    own manifest file — the write-then-commit window can't cross-link
    one writer's committed snapshot to the other's file list."""
    t = _table(spark, tmp_path)
    v_next = t.current_version() + 1
    p1 = t._write_manifest(v_next, {"0": [{"path": "rival-a"}]})
    p2 = t._write_manifest(v_next, {"0": [{"path": "rival-b"}]})
    assert p1 != p2 and os.path.exists(p1) and os.path.exists(p2)
    import json
    with open(p1) as f:
        assert json.load(f)["files"]["0"][0]["path"] == "rival-a"
    # crashed-attempt residue never blocks the single-writer retry
    t.merge(_batch(spark, [("u2", "b", 2, "I")]), batch_id="e-2")
    assert t.current_version() == v_next
    assert t.read().count() == 2


def test_rival_merge_loser_cannot_corrupt_winner_state(spark, tmp_path):
    """COW rival merges on one base: the loser raises and the winner's
    committed version reads back the WINNER's rows — its snapshot
    references only its own manifest, not the loser's."""
    t = _table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    _inject_before_commit(
        t, lambda: racer.merge(_batch(spark, [("u7", "winner", 7, "I")]),
                               batch_id="rival-w"))
    with pytest.raises(CommitConflict):
        t.merge(_batch(spark, [("u8", "loser", 8, "I")]), batch_id="e-2")
    vals = {r["url"]: r["val"] for r in t.read().collect()}
    assert vals.get("u7") == "winner" and "u8" not in vals


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


# ---------------------------------------------------------------------------
# compaction rebase-on-conflict (Iceberg RewriteFiles validation analog)
# ---------------------------------------------------------------------------


def _inject_before_commit(t: LakeTable, action) -> None:
    """Fire ``action`` once, right before t's next snapshot commit —
    simulating a concurrent writer winning the race in the window
    between the compaction's data rewrite and its metadata commit."""
    orig = t._write_snapshot
    state = {"fired": False}

    def hook(snap):
        if not state["fired"]:
            state["fired"] = True
            action()
        return orig(snap)

    t._write_snapshot = hook


def _delta_table(spark, tmp_path, name="t"):
    t = LakeTable.create(spark, str(tmp_path / name), FIELDS, "url",
                         n_buckets=1)
    t.merge(_batch(spark, [("u1", "a", 1, "I"), ("u2", "b", 2, "I")]),
            batch_id="e-1", mode="delta")
    t.merge(_batch(spark, [("u1", "a2", 3, "U"), ("u3", "c", 4, "I")]),
            batch_id="e-2", mode="delta")
    return t


def test_compact_rebases_over_concurrent_delta_merge(spark, tmp_path):
    t = _delta_table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    concurrent = _batch(
        spark, [("u1", "a3", 5, "U"), ("u9", "z", 6, "I")])
    _inject_before_commit(
        t, lambda: racer.merge(concurrent, batch_id="e-3", mode="delta"))

    res = t.compact(max_files_per_bucket=1)
    assert res["compacted_buckets"] == 1

    # the winner's merge commit is preserved underneath the compaction
    hist = t.history()
    assert hist[0]["operation"] == "compaction"
    assert hist[1]["operation"] == "merge"
    assert hist[1]["detail"]["batch_id"] == "e-3"
    assert hist[0]["parent"] == hist[1]["version"]
    assert res["version"] == hist[0]["version"]

    # rebased state == compact-then-apply ordering, byte-for-byte
    ref = _delta_table(spark, tmp_path, name="ref")
    ref.compact(max_files_per_bucket=1)
    ref.merge(concurrent, batch_id="e-3", mode="delta")
    cols = ["url", "val"]
    assert (sorted(t.read().select(*cols).collect())
            == sorted(ref.read().select(*cols).collect()))

    # the adopted layer sits ON TOP of the compacted base in the
    # manifest list (base first, newer layers after): the rebased
    # winner's own manifest (recorded in its lineage) is the LAST
    # entry, the compacted fold the first
    snap = t.snapshot()
    lists = snap["manifests"]["0"]
    merge_manifest = hist[1]["detail"]["commit_manifest"]
    assert len(lists) == 2 and lists[1] == merge_manifest

    # the winner's idempotency-ledger entry survived the rebase:
    # re-delivering its epoch is a metadata no-op
    redeliver = t.merge(concurrent, batch_id="e-3", mode="delta")
    assert redeliver.get("skipped") is True


def test_compact_conflicts_when_cow_merge_rewrote_inputs(spark, tmp_path):
    t = _delta_table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    _inject_before_commit(
        t, lambda: racer.merge(
            _batch(spark, [("u1", "a3", 5, "U")]),
            batch_id="e-3", mode="cow"))
    with pytest.raises(CommitConflict, match="stale"):
        t.compact(max_files_per_bucket=1)
    # the winner's commit is current and intact; once new layers land,
    # rerunning the compaction on the new state succeeds
    assert t.history()[0]["operation"] == "merge"
    assert {r["url"]: r["val"] for r in t.read().collect()}["u1"] == "a3"
    t.merge(_batch(spark, [("u4", "d", 7, "I")]), batch_id="e-4",
            mode="delta")
    res = t.compact(max_files_per_bucket=1)
    assert res["compacted_buckets"] == 1
    vals = {r["url"]: r["val"] for r in t.read().collect()}
    assert vals["u1"] == "a3" and vals["u4"] == "d"


def test_compact_conflicts_when_rebucket_changed_layout(spark, tmp_path):
    t = _delta_table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    _inject_before_commit(t, lambda: racer.rebucket(4))
    with pytest.raises(CommitConflict, match="rebucket"):
        t.compact(max_files_per_bucket=1)
    assert t.snapshot()["n_buckets"] == 4
    assert t.read().count() == 3


def test_compact_rebase_adopts_concurrent_schema_evolution(spark, tmp_path):
    t = _delta_table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    new_fields = FIELDS + [{"id": 3, "name": "extra", "type": "string"}]
    _inject_before_commit(
        t, lambda: racer.evolve(new_fields, note="add extra"))
    res = t.compact(max_files_per_bucket=1)
    assert res["compacted_buckets"] == 1
    # the rebased snapshot carries the evolved schema; the compacted
    # files (written pre-evolution) read back with NULL for the new
    # column via their recorded physical signature
    assert [f["name"] for f in t.fields()] == ["url", "val", "extra"]
    rows = t.read().collect()
    assert len(rows) == 3 and all(r["extra"] is None for r in rows)


# ---------------------------------------------------------------------------
# delta-merge rebase-on-conflict (the other direction: ingest loses the
# race to an out-of-band maintenance commit)
# ---------------------------------------------------------------------------


def test_delta_merge_rebases_over_concurrent_compaction(spark, tmp_path):
    t = _delta_table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    _inject_before_commit(t, lambda: racer.compact(max_files_per_bucket=1))

    res = t.merge(_batch(spark, [("u1", "a3", 5, "U"), ("u9", "z", 6, "I")]),
                  batch_id="e-3", mode="delta")
    assert res["skipped"] is False

    # the maintenance winner is preserved underneath the merge
    hist = t.history()
    assert hist[0]["operation"] == "merge"
    assert hist[1]["operation"] == "compaction"
    assert hist[0]["parent"] == hist[1]["version"]

    # state == compact-then-merge serialized ordering
    ref = _delta_table(spark, tmp_path, name="ref")
    ref.compact(max_files_per_bucket=1)
    ref.merge(_batch(spark, [("u1", "a3", 5, "U"), ("u9", "z", 6, "I")]),
              batch_id="e-3", mode="delta")
    cols = ["url", "val"]
    assert (sorted(t.read().select(*cols).collect())
            == sorted(ref.read().select(*cols).collect()))

    # exactly-once survived the rebase; the feed resolves the rebased
    # commit's own manifest from its lineage entry
    assert t.merge(_batch(spark, [("u1", "a3", 5, "U")]),
                   batch_id="e-3", mode="delta").get("skipped") is True
    feed = t.changes(res["version"] - 1, res["version"])
    assert {r["url"] for r in feed.collect()} == {"u1", "u9"}


def test_delta_merge_conflicts_with_rival_merge_writer(spark, tmp_path):
    t = _delta_table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    _inject_before_commit(
        t, lambda: racer.merge(_batch(spark, [("u8", "y", 9, "I")]),
                               batch_id="rival-1", mode="delta"))
    with pytest.raises(CommitConflict, match="MERGE writer"):
        t.merge(_batch(spark, [("u9", "z", 6, "I")]),
                batch_id="e-3", mode="delta")
    # the rival's commit is intact
    assert {r["url"] for r in t.read().collect()} >= {"u8"}


def test_cow_merge_never_rebases(spark, tmp_path):
    t = _delta_table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    _inject_before_commit(t, lambda: racer.compact(max_files_per_bucket=1))
    with pytest.raises(CommitConflict):
        t.merge(_batch(spark, [("u9", "z", 6, "I")]),
                batch_id="e-3", mode="cow")


def test_delta_merge_conflicts_when_rebucket_won(spark, tmp_path):
    t = _delta_table(spark, tmp_path)
    racer = LakeTable(spark, t.root)
    _inject_before_commit(t, lambda: racer.rebucket(4))
    with pytest.raises(CommitConflict, match="rebucket"):
        t.merge(_batch(spark, [("u9", "z", 6, "I")]),
                batch_id="e-3", mode="delta")
    # a straight retry re-buckets the batch against the new layout
    res = t.merge(_batch(spark, [("u9", "z", 6, "I")]),
                  batch_id="e-3", mode="delta")
    assert res["skipped"] is False
    assert {r["url"]: r["val"] for r in t.read().collect()}["u9"] == "z"
