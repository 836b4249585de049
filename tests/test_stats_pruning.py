"""Manifest column stats + file-skipping reads (Iceberg manifest
min/max pruning analog, lake/table.py::_read_skipping).

Contract under test:
- every write records per-file [min, max] for orderable columns from
  the parquet footer (one driver-side metadata read, no Spark job);
- ``read(between=(col, lo, hi))`` equals ``read()`` + row filter on
  EVERY table shape (COW, delta-layered, post-compaction) — stats only
  skip files, they never substitute for the filter;
- after ``compact(sort_by=col, rows_per_file=k)`` the skipping is
  real: a narrow window's scan plans strictly fewer input files;
- skipping never crosses the winner rule: in a delta-layered bucket a
  key whose max-LSN winner is OUT of range must not resurrect its
  superseded in-range row.

Reference analog: none — the reference re-scans full collections per
query (trials_extractor/storage/mongodb_storage.py); this is the
engine-native path that makes time-windowed reads O(window) files at
design scale.
"""

from __future__ import annotations

import datetime

import pytest

from clinical_trials_etl_spark.lake.table import LakeTable

FIELDS = [
    {"id": 1, "name": "url", "type": "string"},
    {"id": 2, "name": "warc_ts", "type": "timestamp"},
    {"id": 3, "name": "val", "type": "string"},
]


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2026, 1, day, hour, 0, 0)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, val string, "
              "lsn long, op string")


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """30 keys across three one-day COW commits (10 keys/day), then a
    sorted compaction with 10-row files — each bucket splits into
    time-contiguous file ranges."""
    root = str(tmp_path_factory.mktemp("stats") / "t")
    t = LakeTable.create(spark, root, FIELDS, "url", n_buckets=2)
    for day in (1, 2, 3):
        rows = [(f"u{day}-{i}", _ts(day, i % 24), f"v{day}-{i}",
                 day * 100 + i, "I") for i in range(10)]
        t.merge(_batch(spark, rows), batch_id=f"day-{day}")
    t.compact(sort_by="warc_ts", rows_per_file=10)
    return t


def test_stats_recorded_on_write(table):
    entries = table.files()
    assert entries
    for e in entries:
        stats = e.get("stats") or {}
        # timestamp (f_2) and the system lsn must both carry stats
        assert "f_2" in stats and "_lsn" in stats, e["path"]
        lo, hi = stats["f_2"]
        assert isinstance(lo, int) and lo <= hi  # epoch micros
        # binary-free schema here, but strings get stats too
        assert "f_1" in stats


def test_between_equals_filter(table):
    lo, hi = _ts(2), _ts(2, 23)
    import pyspark.sql.functions as F

    expected = sorted(
        r["url"] for r in table.read()
        .where(F.col("warc_ts").between(F.lit(lo), F.lit(hi)))
        .collect())
    got = sorted(
        r["url"]
        for r in table.read(between=("warc_ts", lo, hi)).collect())
    assert got == expected
    assert len(got) == 10  # exactly day 2


def test_between_skips_files_after_sorted_compaction(table):
    all_files = {e["path"] for e in table.files()}
    assert len(all_files) >= 4, "sorted compaction must split files"
    day2 = table.read(between=("warc_ts", _ts(2), _ts(2, 23)))
    touched = set(day2.inputFiles())
    # the narrow window plans strictly fewer files than the table has
    assert 0 < len(touched) < len(all_files)
    # and no planned file is stat-disjoint from the window
    lo_e = int(_ts(2).replace(
        tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    hi_e = int(_ts(2, 23).replace(
        tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    by_path = {e["path"]: e for e in table.files()}
    for path in touched:
        local = path.removeprefix("file://")
        st = by_path[local]["stats"]["f_2"]
        assert not (st[1] < lo_e or st[0] > hi_e), local


def test_between_with_columns_projection(table):
    got = sorted(
        tuple(r) for r in table.read(
            columns=["url", "val"],
            between=("warc_ts", _ts(3), _ts(3, 23))).collect())
    assert len(got) == 10
    assert all(u.startswith("u3-") for u, _v in got)


def test_between_on_string_column(table):
    got = {r["url"] for r in
           table.read(between=("url", "u1-", "u1-~")).collect()}
    assert got == {f"u1-{i}" for i in range(10)}


def test_no_resurrection_across_delta_layers(spark, tmp_path):
    """u1's winner moves OUT of the window via a delta commit: the
    windowed read must drop u1 entirely, not resurrect the superseded
    in-window base row (which naive delta-file skipping would do)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, "url",
                         n_buckets=2)
    t.merge(_batch(spark, [("u1", _ts(1), "old", 1, "I"),
                           ("u2", _ts(1), "keep", 2, "I")]),
            batch_id="b-1")
    t.merge(_batch(spark, [("u1", _ts(9), "new", 10, "U")]),
            batch_id="b-2", mode="delta")
    got = {r["url"]: r["val"] for r in
           t.read(between=("warc_ts", _ts(1), _ts(1, 23))).collect()}
    assert got == {"u2": "keep"}
    # and the winner is visible in ITS window
    got9 = {r["url"]: r["val"] for r in
            t.read(between=("warc_ts", _ts(9), _ts(9, 23))).collect()}
    assert got9 == {"u1": "new"}


def test_between_skips_nothing_without_sort_but_stays_correct(
        spark, tmp_path):
    """Un-clustered COW table: one commit writes the full range into
    each bucket, so nothing is skippable — the read must still be
    exactly the filter."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, "url",
                         n_buckets=2)
    rows = [(f"u{i}", _ts(1 + i % 9), f"v{i}", i, "I")
            for i in range(40)]
    t.merge(_batch(spark, rows), batch_id="one")
    lo, hi = _ts(4), _ts(6, 23)
    expected = {r[0] for r in rows if lo <= r[1] <= hi}
    got = {r["url"] for r in
           t.read(between=("warc_ts", lo, hi)).collect()}
    assert got == expected


def test_tombstones_stay_filtered(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, "url",
                         n_buckets=2)
    t.merge(_batch(spark, [("u1", _ts(1), "a", 1, "I"),
                           ("u2", _ts(1), "b", 2, "I")]), batch_id="i")
    t.merge(_batch(spark, [("u1", _ts(1), None, 9, "D")]), batch_id="d")
    got = {r["url"] for r in
           t.read(between=("warc_ts", _ts(1), _ts(1, 23))).collect()}
    assert got == {"u2"}


def test_unknown_between_column_raises(table):
    with pytest.raises(ValueError, match="unknown between column"):
        table.read(between=("nope", 1, 2)).collect()


def test_lookup_skips_files_after_key_sorted_compaction(spark, tmp_path):
    """Sorted compaction ON THE KEY buys point lookups the same
    skipping it buys range reads: the bucket-pruned lookup plans only
    the file(s) whose key range can contain the key."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, "url",
                         n_buckets=2)
    rows = [(f"u{i:03d}", _ts(1 + i % 9), f"v{i}", i, "I")
            for i in range(60)]
    t.merge(_batch(spark, rows), batch_id="load")
    t.compact(sort_by="url", rows_per_file=8)
    per_bucket = {}
    for e in t.files():
        per_bucket.setdefault(e["bucket"], []).append(e)
    assert all(len(v) >= 3 for v in per_bucket.values()), \
        "key-sorted compaction must split each bucket"

    df = t.lookup("u042")
    got = [(r["url"], r["val"]) for r in df.collect()]
    assert got == [("u042", "v42")]
    planned = set(df.inputFiles())
    bucket_files = max(len(v) for v in per_bucket.values())
    assert 0 < len(planned) < bucket_files, (
        f"lookup planned {len(planned)} files; bucket holds "
        f"{bucket_files}")


def test_lookup_still_correct_on_layered_bucket(spark, tmp_path):
    """A delta-layered bucket must not skip: the lookup's winner could
    live in any layer file."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, "url",
                         n_buckets=2)
    t.merge(_batch(spark, [("u1", _ts(1), "old", 1, "I")]),
            batch_id="b-1")
    t.merge(_batch(spark, [("u1", _ts(2), "new", 9, "U")]),
            batch_id="b-2", mode="delta")
    got = [(r["url"], r["val"]) for r in t.lookup("u1").collect()]
    assert got == [("u1", "new")]


def test_multi_column_sort_order(spark, tmp_path):
    """sort_by=[a, b] clusters lexicographically: the leading column
    gets full range clustering (skippable), the second clusters within
    leading-value ties — and the windowed read still equals the
    filter."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, "url",
                         n_buckets=2)
    rows = [(f"u{i:03d}", _ts(1 + i % 9, i % 24), f"g{i % 3}", i, "I")
            for i in range(90)]
    t.merge(_batch(spark, rows), batch_id="load")
    t.compact(sort_by=["val", "warc_ts"], rows_per_file=10)
    assert t.lineage()[-1]["sort_by"] == ["val", "warc_ts"]

    total = len({e["path"] for e in t.files()})
    win = t.read(between=("val", "g1", "g1"))
    expected = {r[0] for r in rows if r[2] == "g1"}
    assert {r["url"] for r in win.collect()} == expected
    assert 0 < len(set(win.inputFiles())) < total


def test_open_ended_bounds(table):
    """between with one open end: 'everything since day 3' and
    'everything up to day 1' — still file-skipped, still exact."""
    since = table.read(between=("warc_ts", _ts(3), None))
    got = {r["url"] for r in since.collect()}
    assert got == {f"u3-{i}" for i in range(10)}
    all_files = {e["path"] for e in table.files()}
    assert 0 < len(set(since.inputFiles())) < len(all_files)

    until = table.read(between=("warc_ts", None, _ts(1, 23)))
    assert {r["url"] for r in until.collect()} == {
        f"u1-{i}" for i in range(10)}

    with pytest.raises(ValueError, match="at least one bound"):
        table.read(between=("warc_ts", None, None))
