"""Real-catalog smoke path (VERDICT.md round-3 stretch item 8).

In this sandbox no Iceberg runtime jar is installed, so the test SKIPS —
but it is a complete, runnable recipe: on any machine with
``iceberg-spark-runtime`` on the classpath it boots a local
Hadoop-catalog Iceberg warehouse, replays a changelog through
``apply_batch`` with ``SPARK_GRAFT_ICEBERG_EXECUTE=1`` (so every rendered
ALTER/MERGE from lake/iceberg_sql.py executes against the real catalog),
and diffs the catalog table's final state against the parquet stand-in's
(LakeTable) — row-for-row, column-for-column.

Reference analog: the real store at
trials_extractor/storage/mongodb_storage.py:154-245 (upsert path) — here
the "real store" is an actual Iceberg catalog instead of the stand-in.

Jar-availability audit trail (one dated line per round, per
VERDICT.md item 8): 2026-08-19 (round 5) — no iceberg-spark-runtime
jar under the pyspark install, no ivy cache, no package network
access in this container; the test remains the 1 designed skip.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _iceberg_runtime_jar() -> str | None:
    """Find an iceberg-spark-runtime jar on the pyspark install or in
    $SPARK_GRAFT_ICEBERG_JAR."""
    explicit = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        hits = glob.glob(os.path.join(jars_dir, "iceberg-spark-runtime*.jar"))
        return hits[0] if hits else None
    except Exception:
        return None


_SMOKE = r"""
import os, sys, tempfile
sys.path.insert(0, os.environ["SMOKE_REPO"])
from pyspark.sql import SparkSession
jar = os.environ["SMOKE_JAR"]
wh = tempfile.mkdtemp(prefix="ice-wh-")
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.jars", jar)
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.lake.type", "hadoop")
    .config("spark.sql.catalog.lake.warehouse", wh)
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from clinical_trials_etl_spark.cdc.apply import apply_batch
from clinical_trials_etl_spark.cdc.registry import PAGES_REGISTRY
from clinical_trials_etl_spark.cdc.replay import create_pages_table
from clinical_trials_etl_spark.datagen.changelog import LogSpec, changelog_df
from clinical_trials_etl_spark.lake import iceberg_sql as I

spark.sql(I.create_table_statement("lake.smoke", PAGES_REGISTRY[1], "url", 8))
work = tempfile.mkdtemp(prefix="ice-standin-")
standin = create_pages_table(spark, work, n_buckets=8)
os.environ["SPARK_GRAFT_ICEBERG_TABLE"] = "lake.smoke"
os.environ["SPARK_GRAFT_ICEBERG_EXECUTE"] = "1"
spec = LogSpec(n_events=600, n_hosts=10, seed=7)
log = changelog_df(spark, spec).cache()
for i in range(3):
    batch = log.filter((log.lsn >= i * 200) & (log.lsn < (i + 1) * 200))
    apply_batch(standin, batch, f"smoke-{i}")

cols = "url, warc_ts, text, language, fetch_status, _lsn"
real = {r["url"]: r.asDict()
        for r in spark.sql(
            f"SELECT {cols} FROM lake.smoke WHERE NOT _deleted").collect()}
want = {r["url"]: r.asDict()
        for r in standin.read()
        .selectExpr(*cols.split(", ")).collect()}
assert set(real) == set(want), (len(real), len(want))
for u, w in want.items():
    assert real[u] == w, (u, real[u], w)
print(f"ICEBERG-SMOKE-OK rows={len(real)}")
"""


@pytest.mark.skipif(
    _iceberg_runtime_jar() is None,
    reason="no iceberg-spark-runtime jar on this machine — set "
    "SPARK_GRAFT_ICEBERG_JAR or install one into pyspark/jars to run "
    "the real-catalog smoke path (rendered DDL/MERGE executed against "
    "a local Hadoop-catalog warehouse, diffed vs the parquet stand-in)",
)
def test_real_catalog_merge_matches_standin():
    env = dict(
        os.environ,
        SMOKE_REPO=_REPO,
        SMOKE_JAR=_iceberg_runtime_jar(),
    )
    # own subprocess: the catalog session needs builder-time configs
    # (extensions + catalog impl) the shared test session doesn't have
    out = subprocess.run(
        [sys.executable, "-c", _SMOKE],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ICEBERG-SMOKE-OK" in out.stdout
