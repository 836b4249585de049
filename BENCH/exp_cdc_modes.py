#!/usr/bin/env python
"""One-off experiment: driver-bench CDC leg (200k events, 8 segments,
local[32]) under COW vs delta+compact, with per-batch timing.

Not part of the driver contract — feeds the bench-configuration
decision recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from clinical_trials_etl_spark.session import get_spark  # noqa: E402


def run_mode(spark, mode: str, n_events: int, compact_every: int | None):
    from clinical_trials_etl_spark.cdc.apply import apply_batch
    from clinical_trials_etl_spark.cdc.replay import (
        create_pages_table,
        list_segments,
    )
    from clinical_trials_etl_spark.cdc.stream import TRANSPORT_SCHEMA
    from clinical_trials_etl_spark.datagen.changelog import (
        LogSpec,
        write_changelog_segments,
    )

    work = tempfile.mkdtemp(prefix=f"exp_cdc_{mode}_")
    try:
        spec = LogSpec(n_events=n_events, n_hosts=max(50, n_events // 200),
                       paths_per_host=200, seed=42)
        log_dir = os.path.join(work, "log")
        write_changelog_segments(spark, spec, log_dir, n_segments=8)
        table = create_pages_table(spark, os.path.join(work, "table"), 16)
        segs = list_segments(log_dir)
        t0 = time.perf_counter()
        batch_times = []
        for i, seg in enumerate(segs):
            tb = time.perf_counter()
            batch = spark.read.schema(TRANSPORT_SCHEMA).option(
                "basePath", log_dir).parquet(seg)
            apply_batch(table, batch, batch_id=f"b-{i}",
                        merge_mode=mode)
            if compact_every and (i + 1) % compact_every == 0:
                table.compact()
            batch_times.append(round(time.perf_counter() - tb, 3))
        if mode == "delta":
            table.compact()
        wall = time.perf_counter() - t0
        rows = table.read().count()
        return {"mode": mode, "wall": round(wall, 2),
                "ev_s": round(n_events / wall, 1),
                "rows": rows, "batches": batch_times}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("exp_cdc", cores="32")
    # warmup workers
    from clinical_trials_etl_spark.dist import ensure_package_on_executors
    from clinical_trials_etl_spark.functions.html_extract import extract_text_udf
    from pyspark.sql import functions as F
    ensure_package_on_executors(spark)
    warm = spark.range(128).repartition(32)
    warm.select(extract_text_udf(F.encode(F.lit("<p>w</p>"), "UTF-8"))) \
        .write.format("noop").mode("overwrite").save()

    for mode, ce in (("cow", None), ("delta", 4), ("cow", None), ("delta", 4)):
        r = run_mode(spark, mode, n, ce)
        print(r, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
