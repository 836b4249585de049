"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_broadcast(df: DataFrame) -> DataFrame:
    """Size-conditional broadcast hint for a dimension side of a join.

    ``F.broadcast`` is unconditional: at sandbox scale it is the right
    plan for customer/part/supplier dims, but at 100× (customer ≈ 15M
    rows at sf100) the same hint OOMs the driver instead of degrading
    to a shuffle join. This helper applies the hint only when
    Catalyst's own size estimate for the (filtered, pruned) plan is
    under ``spark.sql.autoBroadcastJoinThreshold`` — above it the
    frame is returned unhinted and the planner/AQE picks the join
    strategy, which is exactly the degradation a 1000-executor run
    needs. Genuinely tiny dims (nation/region/band literals) keep the
    plain unconditional hint at their call sites.

    The estimate is driver-side plan metadata (optimizedPlan stats —
    file sizes for scans), no job is run."""
    spark = df.sparkSession
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                            "10485760")
    t = str(thresh).lower().rstrip("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if t.endswith(suffix):
            t, mult = t[:-1], m
            break
    limit = int(t) * mult
    if limit < 0:  # broadcast disabled outright
        return df
    est = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    return F.broadcast(df) if est <= limit else df


def scan_parallel(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's default parallelism
    before CPU-heavy per-row kernels (signatures, Arrow UDF parsing).

    Why: a parquet scan parallelizes by file/row-group split — a table
    written as one row group is ONE scan task, so any expensive
    expression pipelined onto the scan runs single-threaded no matter
    how many cores exist (measured: minhash signatures at sf0.1 took
    3.9 s on one task vs ~0.2 s after this repartition). The shuffle it
    inserts moves only the scan's (pruned) columns — trivially cheap
    next to the kernel work it unlocks. At production scale tables have
    many splits and AQE balances them, but a defensive repartition in
    front of a kernel whose cost per row is >> scan cost per row is
    still the right plan shape (same reason the CDC path extracts text
    AFTER the dedup shuffle)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)
