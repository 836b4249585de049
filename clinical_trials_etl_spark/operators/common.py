"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
