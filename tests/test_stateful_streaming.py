"""Cross-batch stateful dedup (applyInPandasWithState): per key, each
micro-batch emits at most one row, lsns strictly increase across
emissions, and the final emission carries the key's global max lsn —
checked against the independent fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_trials_etl_spark.cdc.stream import TRANSPORT_SCHEMA
from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.streaming.stateful import dedup_across_batches

SPEC = LogSpec(n_events=2000, n_hosts=10, paths_per_host=30, seed=11)


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wal_state"))
    write_changelog_segments(spark, SPEC, d, n_segments=5)
    return d


def test_cross_batch_dedup(spark, log_dir, tmp_path):
    source = (
        spark.readStream.schema(TRANSPORT_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .option("basePath", log_dir)
        .parquet(log_dir)
    )
    query = (
        dedup_across_batches(source)
        .writeStream.format("memory")
        .queryName("dedup_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    emitted = spark.table("dedup_state").select("url", "lsn").collect()

    # ground truth: global max lsn per url over the whole log
    raw = spark.read.option("basePath", log_dir).parquet(log_dir)
    truth = {
        r["url"]: r["mx"]
        for r in raw.groupBy("url").agg(F.max("lsn").alias("mx")).collect()
    }

    seen: dict[str, list[int]] = {}
    for r in emitted:
        seen.setdefault(r["url"], []).append(r["lsn"])
    # arrival order within the memory sink isn't guaranteed per url,
    # but the SET of emissions must be strictly increasing when sorted
    # by emission semantics: no value may repeat, and the max must be
    # the fold's max
    assert set(seen) == set(truth)
    for url, lsns in seen.items():
        assert len(lsns) == len(set(lsns)), f"duplicate emission for {url}"
        assert max(lsns) == truth[url]
    # compression: at most one emission per key per micro-batch, and
    # strictly fewer rows than the raw stream delivered
    assert len(truth) <= len(emitted) < SPEC.n_events
