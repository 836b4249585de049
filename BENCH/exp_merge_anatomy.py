#!/usr/bin/env python
"""Decompose one COW merge epoch into its physical phases.

exp_stream_profile.py established that streaming epoch cost is ~all
inside LakeTable.merge (shell bookkeeping is ~0.3 s/epoch). This
experiment times the merge's constituent plans separately on a
realistic mid-stream state (replayed table + one fresh batch) to find
which phase to attack:

  read_only      scan target + batch, count (no shuffle)
  winner_full    union -> groupBy(key).max_by(full payload)  [shuffle 1]
  winner_slim    same aggregation over (key, lsn, deleted) only
  plus_fill      winner_full + Arrow text extraction
  plus_repart    ... + repartition(n, bucket)                [shuffle 2]
  full_write     the real write (partitionBy parquet)

Usage: python BENCH/exp_merge_anatomy.py [n_events] [n_segments] [buckets] [pad]
       (defaults 200_000 / 8 / 64 / 80 — the bench_stream regime)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    pad = int(sys.argv[4]) if len(sys.argv) > 4 else 80

    from pyspark.sql import functions as F
    from clinical_trials_etl_spark.session import get_spark
    from clinical_trials_etl_spark.datagen.changelog import (
        LogSpec, write_changelog_segments,
    )
    from clinical_trials_etl_spark.cdc.replay import replay, list_segments
    from clinical_trials_etl_spark.cdc.apply import (
        normalize_batch, fill_text_post_winner,
    )
    from clinical_trials_etl_spark.cdc.registry import PAGES_REGISTRY
    from clinical_trials_etl_spark.cdc.stream import TRANSPORT_SCHEMA
    from clinical_trials_etl_spark.lake.table import (
        LakeTable, SYS_LSN, SYS_DELETED, SYS_BUCKET,
    )

    spark = get_spark("merge-anatomy",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    work = tempfile.mkdtemp(prefix="merge_anatomy_")
    log_dir = os.path.join(work, "log")
    spec = LogSpec(n_events=n_events, n_hosts=max(100, n_events // 500),
                   paths_per_host=400, seed=42, html_pad_blocks=pad)
    write_changelog_segments(spark, spec, log_dir,
                             n_segments=n_segments, files_per_segment=32)

    # replay all but the last segment -> realistic mid-stream table
    segs = list_segments(log_dir)
    table_root = os.path.join(work, "tbl")
    table = replay(spark, log_dir, table_root, segments_per_batch=1,
                   n_buckets=buckets)
    # use the LAST segment again as "one more epoch" (content realistic;
    # idempotence not in play because we never commit)
    batch = spark.read.schema(TRANSPORT_SCHEMA).option(
        "basePath", log_dir).parquet(segs[-1])

    snap = table.snapshot()
    fields = table.fields(snap)
    key = table.key_field(snap)
    names = [f["name"] for f in fields]
    normalized = normalize_batch(batch, fields, PAGES_REGISTRY)
    src = normalized.select(
        *names,
        F.col("lsn").cast("long").alias(SYS_LSN),
        (F.col("op") == "D").alias(SYS_DELETED),
    ).withColumn(SYS_BUCKET, table.bucket_expr(F.col(key)))
    target = table.read_raw().withColumn(
        SYS_BUCKET, table.bucket_expr(F.col(key)))
    union = target.unionByName(src)

    payload = F.struct(*[c for c in union.columns if c != key])

    def winner(df):
        return df.groupBy(key).agg(
            F.max_by(payload, F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))
                     ).alias("_p")).select(key, "_p.*")

    def t(label, df, write_dir=None, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            if write_dir:
                out = os.path.join(work, f"{write_dir}-{time.monotonic_ns()}")
                df.write.mode("overwrite").partitionBy(SYS_BUCKET).parquet(out)
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:14s} {best:7.3f} s")
        return best

    print(f"table rows={table.read().count()} batch rows={batch.count()}")
    t("read_only", union)
    slim = target.select(key, SYS_LSN, SYS_DELETED).unionByName(
        src.select(key, SYS_LSN, SYS_DELETED))
    t("winner_slim", slim.groupBy(key).agg(
        F.max(F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))).alias("w")))
    w_full = winner(union)
    t("winner_full", w_full)
    filled = fill_text_post_winner(w_full)
    t("plus_fill", filled)
    reparted = filled.select(
        *[F.col(f["name"]).alias(f"f_{f['id']}") for f in fields],
        F.col(SYS_LSN), F.col(SYS_DELETED), F.col(SYS_BUCKET),
    ).repartition(buckets, F.col(SYS_BUCKET))
    t("plus_repart", reparted)
    t("full_write", reparted, write_dir="w")
    spark.stop()


if __name__ == "__main__":
    main()
