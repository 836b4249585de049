"""True ``spark-submit --py-files`` deployment test (north rule).

The north rule ships the job as ``spark-submit --py-files pkg.zip
job.py ...`` on a cluster. test_job.py exercises main() in-process;
this test runs the REAL command in a subprocess — package zipped
exactly as a deploy would, job script submitted by path, no repo on
PYTHONPATH — and asserts the resulting table matches an in-process
batch replay of the same log byte-for-byte.

Reference CLI analog: trials_extractor/main.py:52-157.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    write_changelog_segments,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _build_zip(dest: str) -> str:
    """Zip the package the way a deploy pipeline would (py files only,
    package-rooted paths so ``import clinical_trials_etl_spark`` works
    from the zip)."""
    pkg_dir = os.path.join(REPO, "clinical_trials_etl_spark")
    zpath = os.path.join(dest, "clinical_trials_etl_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_replay(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    spec = LogSpec(n_events=800, n_hosts=8, paths_per_host=25, seed=5)
    write_changelog_segments(spark, spec, log_dir, n_segments=3)

    # ground truth: in-process batch replay (same apply path)
    from clinical_trials_etl_spark.cdc.replay import replay

    truth = replay(spark, log_dir, str(tmp_path / "t_truth"), n_buckets=8)
    truth_rows = sorted(
        (r["url"], r["_lsn"], r["text"]) for r in truth.read_raw().collect()
    )

    zpath = _build_zip(str(tmp_path))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zpath,
            os.path.join(REPO, "clinical_trials_etl_spark", "job.py"),
            "--log-dir", log_dir,
            "--table", str(tmp_path / "t_submit"),
            "--n-buckets", "8",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo — the zip must be the source
        env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["mode"] == "replay"

    # byte-identical final state (incl. tombstones + LSNs) vs the
    # in-process replay
    submitted = __import__(
        "clinical_trials_etl_spark.lake.table", fromlist=["LakeTable"]
    ).LakeTable(spark, str(tmp_path / "t_submit"))
    sub_rows = sorted(
        (r["url"], r["_lsn"], r["text"])
        for r in submitted.read_raw().collect()
    )
    assert result["rows"] == submitted.read().count()
    assert sub_rows == truth_rows
