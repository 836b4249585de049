"""SparkSession factory tuned for the engine.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime coalescing + skew-join splitting cover most shuffle
  sizing; explicit salting is still applied in the CDC apply path
  (see ``cdc/apply.py``) because AQE does not rebalance the shuffle
  feeding a MERGE inside ``foreachBatch``.
- ``spark.sql.shuffle.partitions`` defaults to the local core count in
  the sandbox; on a real cluster it should be ~2-3x total cores and is
  left overridable via env.
- Arrow execution enabled: every Python-side kernel in this repo is an
  Arrow-vectorized pandas UDF (no per-row Python), per BASELINE.json.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "clinical_trials_etl_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores``: parallelism for local mode (the bench harness passes 8
    vs 32 to evidence the two-cluster-size scaling criterion).
    """
    cores = str(cores or DEFAULT_CPUS)
    shuffle_partitions = int(shuffle_partitions or cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT96 timestamps carry no parquet min/max statistics (their
        # ordering is undefined by the spec); TIMESTAMP_MICROS restores
        # footer stats, which the lake's manifest-level file skipping
        # reads (lake/table.py::_parquet_footer)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
