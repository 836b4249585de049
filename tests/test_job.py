"""spark-submit job entry-point tests (batch + streaming modes, resume)."""

from __future__ import annotations

from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.job import main

SPEC = LogSpec(n_events=800, n_hosts=8, paths_per_host=25, seed=5)


def test_job_batch_and_stream_converge(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    write_changelog_segments(spark, SPEC, log_dir, n_segments=3)

    batch = main(["--log-dir", log_dir, "--table", str(tmp_path / "t_batch")])
    assert batch["mode"] == "replay" and batch["rows"] > 0

    stream = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t_stream"),
        "--checkpoint", str(tmp_path / "ckpt"), "--stream",
        "--metrics", str(tmp_path / "metrics"),
    ])
    assert stream["mode"] == "stream" and stream["batches"] >= 1
    assert stream["rows"] == batch["rows"]

    # re-invocation resumes from checkpoint: no new data -> same version
    again = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t_stream"),
        "--checkpoint", str(tmp_path / "ckpt"), "--stream",
    ])
    assert again["version"] == stream["version"]
    assert again["rows"] == stream["rows"]


def test_job_maintain_out_of_band(spark, tmp_path):
    """--maintain: the out-of-band maintenance pass the compaction
    rebase sanctions — delta-ingest with the job, then compact +
    expire + GC against the same table root from a separate
    invocation, state byte-identical throughout."""
    log_dir = str(tmp_path / "log")
    write_changelog_segments(spark, SPEC, log_dir, n_segments=3)

    ingest = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t"),
        "--merge-mode", "delta",
    ])
    assert ingest["mode"] == "replay" and ingest["rows"] > 0

    from clinical_trials_etl_spark.lake.table import LakeTable
    t = LakeTable(spark, str(tmp_path / "t"))
    before = {r["url"]: r["text"] for r in t.read().collect()}
    layered = max(len(v) for v in t.snapshot()["manifests"].values())
    assert layered > 1  # delta replay left layers for the fold

    maint = main([
        "--table", str(tmp_path / "t"), "--maintain",
        "--compact-sort-by", "warc_ts",
        "--expire-keep", "2", "--gc-orphans-older-than", "0",
    ])
    assert maint["mode"] == "maintain"
    assert maint["compact"]["compacted_buckets"] > 0
    assert maint["version"] == t.current_version()
    assert "expire" in maint and "gc" in maint

    after = {r["url"]: r["text"] for r in t.read().collect()}
    assert after == before
    assert max(len(v) for v in t.snapshot()["manifests"].values()) == 1

    # ingesting without --log-dir is a usage error, not a crash
    import pytest
    with pytest.raises(SystemExit):
        main(["--table", str(tmp_path / "t")])


def test_job_stream_publishes_envelopes(spark, tmp_path):
    """--envelope-dir/--publish-envelopes-every: the spark-submit
    streaming job produces the change topic alongside the table."""
    from clinical_trials_etl_spark.cdc.envelope import last_published

    log_dir = str(tmp_path / "log_env")
    write_changelog_segments(spark, SPEC, log_dir, n_segments=3)
    env = str(tmp_path / "envelopes")
    res = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t_env"),
        "--checkpoint", str(tmp_path / "ckpt_env"), "--stream",
        "--max-files-per-trigger", "1",
        "--envelope-dir", env, "--publish-envelopes-every", "1",
    ])
    assert res["mode"] == "stream"
    assert last_published(env) == res["version"]
