"""Measure manifest-stats collection wall time vs written-file count:
serial driver-side parquet-footer reads vs the distributed
mapInPandas job (VERDICT r4 #1 — compact/rebucket at design scale must
not stall the driver for O(files) serial metadata reads).

Writes one bucket-partitioned parquet layout per file-count point
(the same shape compact() produces), then times
LakeTable._collect_written_files under each path over the SAME
directory. Output: one JSON line per point.

Run: python BENCH/exp_stats_collect.py [out.json]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from clinical_trials_etl_spark.lake.table import (  # noqa: E402
    SYS_BUCKET, SYS_DELETED, SYS_LSN, LakeTable,
)
from clinical_trials_etl_spark.session import get_spark  # noqa: E402


def layout(spark, root, n_files, rows_per_file=200):
    """Bucket-partitioned parquet with ~n_files files, the physical
    schema of the pages table (f_1 url, f_2 ts, f_3 html...)."""
    n = n_files * rows_per_file
    df = (
        spark.range(n)
        .select(
            F.concat(F.lit("https://h"), (F.col("id") % 97),
                     F.lit("/p"), F.col("id")).alias("f_1"),
            F.timestamp_seconds(F.lit(1600000000) + F.col("id"))
            .alias("f_2"),
            F.encode(F.concat(F.lit("<p>"), F.col("id"), F.lit("</p>")),
                     "utf-8").alias("f_3"),
            F.lit("en").alias("f_4"),
            F.col("id").alias(SYS_LSN),
            F.lit(False).alias(SYS_DELETED),
            (F.col("id") % n_files).cast("int").alias(SYS_BUCKET),
        )
        .repartition(n_files, F.col(SYS_BUCKET))
    )
    df.write.mode("overwrite").partitionBy(SYS_BUCKET).parquet(root)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(cores=32)
    phys = {"f_1": "string", "f_2": "timestamp", "f_3": "binary",
            "f_4": "string"}
    table = LakeTable(spark, tempfile.mkdtemp())  # helper methods only
    results = []
    for n_files in (64, 256, 1024, 4096):
        root = tempfile.mkdtemp(prefix=f"stats{n_files}-")
        layout(spark, root, n_files)
        point = {"n_files": n_files}
        for name, thresh in (("serial", 10**9), ("distributed", 0)):
            LakeTable.STATS_DISTRIBUTED_MIN_FILES = thresh
            t0 = time.time()
            files, rows = table._collect_written_files(root, phys)
            point[name + "_s"] = round(time.time() - t0, 3)
            point.setdefault("files_seen", len(files))
            assert len(files) == n_files and rows == n_files * 200
        point["speedup"] = round(
            point["serial_s"] / point["distributed_s"], 2)
        results.append(point)
        print(json.dumps(point), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
