#!/usr/bin/env python
"""A/B the COW merge plan shapes on an identical mid-stream state.

OLD: union(target, batch) -> wide max_by winner agg (SortAggregate,
     full payload through one exchange) -> fill -> repartition(bucket)
     (full payload through a second exchange) -> write.
NEW: batch-only wide dedup + slim broadcast winner decision; target
     streams scan -> broadcast-filter -> write with no exchange.

Usage: python BENCH/exp_merge_anatomy2.py [n_events] [n_segments] [buckets] [pad]
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
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    pad = int(sys.argv[4]) if len(sys.argv) > 4 else 0

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
        SYS_LSN, SYS_DELETED, SYS_BUCKET,
    )

    spark = get_spark("merge-ab",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    work = tempfile.mkdtemp(prefix="merge_ab_")
    log_dir = os.path.join(work, "log")
    kw = dict(n_hosts=max(50, n_events // 200), seed=7)
    if pad:
        kw.update(paths_per_host=400, html_pad_blocks=pad)
    spec = LogSpec(n_events=n_events, **kw)
    write_changelog_segments(spark, spec, log_dir, n_segments=n_segments)

    segs = list_segments(log_dir)
    table = replay(spark, log_dir, os.path.join(work, "tbl"),
                   segments_per_batch=1, n_buckets=buckets)
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

    def out_sel(df):
        return df.select(
            *[F.col(f["name"]).alias(f"f_{f['id']}") for f in fields],
            F.col(SYS_LSN), F.col(SYS_DELETED), F.col(SYS_BUCKET))

    def t(label, df, write=False, runs=3):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            if write:
                out = os.path.join(work, f"w-{time.monotonic_ns()}")
                df.write.mode("overwrite").partitionBy(SYS_BUCKET).parquet(out)
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:22s} {best:7.3f} s")

    # ---------------- OLD shape ----------------
    payload = F.struct(*[c for c in src.columns if c != key])
    old_w = target.unionByName(src).groupBy(key).agg(
        F.max_by(payload, F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))
                 ).alias("_p")).select(key, "_p.*")
    old_filled = fill_text_post_winner(old_w)
    old_full = out_sel(old_filled).repartition(
        buckets, F.col(SYS_BUCKET))

    # ---------------- NEW shape ----------------
    src_one = (src.groupBy(key).agg(
        F.max_by(payload, F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))
                 ).alias("_p")).select(key, "_p.*"))
    b_slim = (src.groupBy(key).agg(
        F.max(F.struct(F.col(SYS_LSN), F.col(SYS_DELETED))).alias("_w"))
        .select(F.col(key), F.col(f"_w.{SYS_LSN}").alias("_b_lsn"),
                F.col(f"_w.{SYS_DELETED}").alias("_b_del")))
    batch_wins = (F.struct(F.col("_b_lsn"), F.col("_b_del"), F.lit(1))
                  > F.struct(F.col(SYS_LSN), F.col(SYS_DELETED), F.lit(0)))
    keep_target = (target.join(F.broadcast(b_slim), key, "left")
                   .where(F.coalesce(~batch_wins, F.lit(True)))
                   .drop("_b_lsn", "_b_del"))
    t_beats = (target.select(key, SYS_LSN, SYS_DELETED)
               .join(F.broadcast(b_slim), key, "inner")
               .where(~batch_wins).select(key))
    keep_batch = fill_text_post_winner(
        src_one.join(F.broadcast(t_beats), key, "left_anti"))
    new_full = out_sel(keep_target.unionByName(
        keep_batch.repartition(buckets, F.col(SYS_BUCKET))))

    print(f"table={table.read().count()} batch={batch.count()} "
          f"buckets={buckets} pad={pad}")
    t("old: winner_agg", old_w)
    t("old: +fill", old_filled)
    t("old: +repart (noop)", old_full)
    t("old: full write", old_full, write=True)
    t("new: keep_target", keep_target)
    t("new: keep_batch", keep_batch)
    t("new: union (noop)", new_full)
    t("new: full write", new_full, write=True)
    spark.stop()


if __name__ == "__main__":
    main()
