"""Manifest key bloom filters (LakeTable key_bloom_bits).

Point-lookup file skipping that min/max stats cannot provide: a bloom
miss is KEY-EXACT ("this key is definitely not in this file"), so
lookups may soundly skip even DELTA LAYERS — the files the range-stats
rule must keep, because a range-skipped delta file could hold a key's
max-LSN winner. On a layer-accreting streaming table this keeps point
lookups O(files-holding-the-key) between compactions.

Blooms are built by one narrow distributed Spark job over the written
files' key column (write side) and probed with the SAME Spark
expression (xxhash64 over (key, probe-index)) at lookup — no Python
reimplementation of the hash that could drift from the JVM's.
"""

from __future__ import annotations

import pytest

from clinical_trials_etl_spark.lake.table import LakeTable

FIELDS = [
    {"id": 1, "name": "url", "type": "string"},
    {"id": 2, "name": "val", "type": "string"},
]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, val string, lsn long, op string")


def _build(spark, root, key_bloom_bits):
    """Deterministic table: 6 delta layers of inserts, then an update
    and a delete layer — per-key winners span layers."""
    t = LakeTable.create(spark, root, FIELDS, "url", n_buckets=2,
                         key_bloom_bits=key_bloom_bits)
    for i in range(6):
        t.merge(
            _batch(spark, [(f"u{i}-{k}", f"v{i}", i * 10 + k, "I")
                           for k in range(5)]),
            batch_id=f"e-{i}", mode="delta")
    t.merge(_batch(spark, [("u3-2", "NEW", 999, "U"),
                           ("u0-0", None, 998, "D")]),
            batch_id="e-6", mode="delta")
    return t


def test_blooms_recorded_on_every_write_path(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"), key_bloom_bits=512)
    ents = t.files()
    assert ents and all("key_bloom" in e for e in ents)
    assert all(len(e["key_bloom"]) == 512 // 64 for e in ents)
    t.compact()  # fold: compacted base files get fresh blooms too
    ents = t.files()
    assert ents and all("key_bloom" in e for e in ents)
    t.rebucket(4)
    assert all("key_bloom" in e for e in t.files())
    # the property follows the snapshot chain
    assert t.snapshot()["key_bloom_bits"] == 512


def test_lookup_equivalence_with_and_without_blooms(spark, tmp_path):
    """Bloom skipping is invisible in results: every live key, the
    deleted key and a missing key resolve identically to a bloom-less
    control table built from the same log."""
    t = _build(spark, str(tmp_path / "t"), key_bloom_bits=512)
    ctl = _build(spark, str(tmp_path / "ctl"), key_bloom_bits=None)
    assert all("key_bloom" not in e for e in ctl.files())

    keys = sorted(r["url"] for r in ctl.read().select("url").collect())
    assert keys  # sanity
    for u in [*keys, "u0-0", "no-such-key"]:
        got = [(r["url"], r["val"]) for r in t.lookup(u).collect()]
        want = [(r["url"], r["val"]) for r in ctl.lookup(u).collect()]
        assert got == want, u
    # the updated key reflects its max-LSN winner through the skip
    assert t.lookup("u3-2").collect()[0]["val"] == "NEW"
    assert t.lookup("u0-0").collect() == []


def test_lookup_skips_bloom_missing_delta_layers(spark, tmp_path):
    """The plan gate: on a bucket holding many delta layers, a point
    lookup plans only the files whose bloom may contain the key —
    strictly fewer than the bucket holds (min/max alone must read all
    layered files)."""
    t = _build(spark, str(tmp_path / "t"), key_bloom_bits=512)
    total = len(t.files())
    df = t.lookup("u3-2")
    planned = len(set(df.inputFiles()))
    # u3-2 lives in exactly two layers (insert + update)
    assert planned == 2 < total
    assert df.collect()[0]["val"] == "NEW"
    # a missing key usually plans zero files; bloom false positives
    # may admit a few — never more than the bucket holds, and the
    # result is exact either way
    assert t.lookup("absent-key").collect() == []


def test_bloom_bits_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="multiple of 64"):
        LakeTable.create(spark, str(tmp_path / "x"), FIELDS, "url",
                         key_bloom_bits=100)
    with pytest.raises(ValueError, match="multiple of 64"):
        LakeTable.create(spark, str(tmp_path / "y"), FIELDS, "url",
                         key_bloom_bits=32)


def test_cdc_replay_with_blooms_end_to_end(spark, tmp_path):
    """Blooms ride the real CDC path: a delta-mode replay of a
    generated changelog records blooms on every layer, and point
    lookups on the pages table resolve each url exactly."""
    from clinical_trials_etl_spark.cdc.replay import replay
    from clinical_trials_etl_spark.datagen.changelog import (
        LogSpec,
        write_changelog_segments,
    )

    spec = LogSpec(n_events=1500, n_hosts=20, seed=11)
    log = str(tmp_path / "log")
    write_changelog_segments(spark, spec, log, n_segments=3)
    t = replay(spark, log, str(tmp_path / "tbl"),
               merge_mode="delta", key_bloom_bits=4096)
    assert t.files() and all("key_bloom" in e for e in t.files())
    urls = [r["url"]
            for r in t.read().select("url").limit(5).collect()]
    for u in urls:
        got = t.lookup(u).collect()
        assert len(got) == 1 and got[0]["url"] == u
