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
