"""Snapshot-bootstrap handoff (cdc/bootstrap.py): seed the table from a
consistent snapshot at LSN S, tail the log from S — final live state
byte-identical to a fresh full-log replay, with or without the
``min_lsn`` source filter (max-LSN merge makes the filter an
optimization, not a correctness requirement)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_trials_etl_spark.cdc.bootstrap import (
    BOOTSTRAP_BATCH_ID,
    bootstrap_from_snapshot,
    bootstrap_lsn,
    infer_schema_ver,
)
from clinical_trials_etl_spark.cdc.registry import PAGES_REGISTRY
from clinical_trials_etl_spark.cdc.replay import replay
from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    changelog_df,
    write_changelog_segments,
)
from clinical_trials_etl_spark.datagen.reference_fold import fold_changelog

SPEC = LogSpec(n_events=900, n_hosts=8, paths_per_host=25, seed=17)

SNAP_COLS = ("url string, warc_ts timestamp, html binary, "
             "language string, fetch_status long")


def _snapshot_rows(spark, spec, cut_lsn):
    """The source table as of ``cut_lsn``: the independent fold of the
    log prefix, in the latest schema naming (what a real snapshot read
    would return). ``text`` is dropped — the engine re-extracts."""
    rows = [r.asDict() for r in changelog_df(spark, spec).collect()
            if r["lsn"] <= cut_lsn]
    folded = fold_changelog(rows)
    return [(v["url"], v["warc_ts"], v["html"], v["language"],
             v["fetch_status"]) for v in folded.values()]


def _live(table):
    return sorted(
        ((r["url"], r["warc_ts"], bytes(r["html"]) if r["html"] is not None
          else None, r["text"], r["language"], r["fetch_status"])
         for r in table.read().collect()),
    )


@pytest.fixture(scope="module")
def log_and_cut(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("bootstrap")
    log_dir = str(work / "log")
    write_changelog_segments(spark, SPEC, log_dir, n_segments=6)
    lsns = sorted(r["lsn"] for r in
                  changelog_df(spark, SPEC).select("lsn").collect())
    cut = lsns[len(lsns) // 2]  # mid-log snapshot point
    fresh = replay(spark, log_dir, str(work / "t_fresh"))
    return log_dir, cut, _live(fresh)


def test_handoff_equivalence(spark, tmp_path, log_and_cut):
    """bootstrap(snapshot@S) + replay(lsn > S) == fresh full replay,
    byte-identical live rows including kernel-extracted text."""
    log_dir, cut, want = log_and_cut
    snap = spark.createDataFrame(
        _snapshot_rows(spark, SPEC, cut), SNAP_COLS)
    table = bootstrap_from_snapshot(
        spark, snap, str(tmp_path / "t"), cut, n_buckets=4)
    assert bootstrap_lsn(table) == cut
    # the bulk load itself went through the registry: table evolved to
    # the snapshot's schema version before the merge
    assert table.fields() == PAGES_REGISTRY[4]
    replay(spark, log_dir, str(tmp_path / "t"), min_lsn=cut,
           batch_prefix="tail")
    assert _live(table) == want


def test_full_log_over_bootstrap_converges(spark, tmp_path, log_and_cut):
    """Replaying the ENTIRE log (no min_lsn filter) over a bootstrapped
    table converges to the same live state: every event with
    lsn <= S loses to the snapshot row stamped at S."""
    log_dir, cut, want = log_and_cut
    snap = spark.createDataFrame(
        _snapshot_rows(spark, SPEC, cut), SNAP_COLS)
    table = bootstrap_from_snapshot(
        spark, snap, str(tmp_path / "t"), cut, n_buckets=4)
    replay(spark, log_dir, str(tmp_path / "t"), batch_prefix="full")
    assert _live(table) == want


def test_bootstrap_idempotent_and_per_row_lsn(spark, tmp_path, log_and_cut):
    """Retrying a bootstrap is a metadata no-op (idempotency ledger);
    per-row last-modified lsns are honored when the source provides
    them and validated against the claimed snapshot position."""
    log_dir, cut, want = log_and_cut
    rows = [r.asDict() for r in changelog_df(spark, SPEC).collect()
            if r["lsn"] <= cut]
    last_lsn = {}
    for r in rows:
        last_lsn[r["url"]] = max(last_lsn.get(r["url"], 0), r["lsn"])
    folded = fold_changelog(rows)
    snap = spark.createDataFrame(
        [(v["url"], v["warc_ts"], v["html"], v["language"],
          v["fetch_status"], last_lsn[v["url"]])
         for v in folded.values()],
        SNAP_COLS + ", lsn long")
    table = bootstrap_from_snapshot(
        spark, snap, str(tmp_path / "t"), cut, n_buckets=4)
    v1 = table.current_version()
    again = bootstrap_from_snapshot(
        spark, snap, str(tmp_path / "t"), cut, n_buckets=4)
    assert again.current_version() == v1  # skipped, not re-applied
    assert any(k.startswith("bootstrap")
               for k in table.snapshot()["batch_hwm"])
    replay(spark, log_dir, str(tmp_path / "t"), min_lsn=cut,
           batch_prefix="tail")
    assert _live(table) == want

    # a snapshot claiming consistency at S but carrying lsn > S is
    # rejected before any write
    bad = snap.withColumn("lsn", F.col("lsn") + F.lit(cut))
    with pytest.raises(ValueError, match="not consistent"):
        bootstrap_from_snapshot(spark, bad, str(tmp_path / "t2"), cut)


def test_infer_schema_ver():
    assert infer_schema_ver(
        ["url", "warc_ts", "html", "language", "fetch_status"],
        PAGES_REGISTRY) == 4
    assert infer_schema_ver(["url", "lang", "text"], PAGES_REGISTRY) == 2
    with pytest.raises(ValueError, match="no registry version"):
        infer_schema_ver(["url", "nonsense"], PAGES_REGISTRY)
    with pytest.raises(ValueError, match="not in the registry"):
        bootstrap_from_snapshot(None, None, "", 0, schema_ver=99)


def test_job_cli_bootstrap_then_stream(spark, tmp_path, log_and_cut):
    """The spark-submit shape: --bootstrap-snapshot + --snapshot-lsn
    seeds the table, --stream tails only lsn > S from the WAL, and a
    later maintenance-free re-invocation picks the recorded bootstrap
    LSN up as the default --from-lsn."""
    from clinical_trials_etl_spark.job import main

    log_dir, cut, want = log_and_cut
    snap_path = str(tmp_path / "snap.parquet")
    spark.createDataFrame(
        _snapshot_rows(spark, SPEC, cut), SNAP_COLS
    ).write.parquet(snap_path)

    res = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ckpt"), "--stream",
        "--bootstrap-snapshot", snap_path, "--snapshot-lsn", str(cut),
    ])
    assert res["mode"] == "stream"
    from clinical_trials_etl_spark.lake.table import LakeTable
    table = LakeTable(spark, str(tmp_path / "t"))
    assert _live(table) == want

    # resume without the bootstrap flags: min_lsn defaults from the
    # table's bootstrap lineage; no new data -> same version
    again = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ckpt"), "--stream",
    ])
    assert again["version"] == res["version"]
    assert again["rows"] == res["rows"]
