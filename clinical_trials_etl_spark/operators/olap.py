"""Generic OLAP surface beyond the reference's own queries: pivot,
rollup (grouping sets), exact percentiles — the dashboard/report shapes
a warehouse engine is expected to have.

Scale notes:
- Pivot: ``groupBy().pivot(col, values)`` with the value list PINNED —
  an unpinned pivot runs an extra distinct-values job and makes the
  output schema data-dependent (a driver-side surprise at 10^10 rows).
  Pinned, it compiles to one shuffle of conditional aggregates.
- Rollup: one shuffle; Spark expands grouping sets map-side (partial
  aggregation applies per set), no extra pass per level.
- Percentile: ``F.percentile`` (exact, interpolated) matches DuckDB's
  ``quantile_cont`` definition for the oracle. Exact percentile buffers
  each group's values — fine for bounded per-group cardinality; at
  design scale (10^10 rows per event type) that is an executor-memory
  wall, so ``a17b`` is the scale-safe default: ``approx_percentile``
  (Greenwald-Khanna mergeable sketch, rank error ≤ n/accuracy,
  O((accuracy) log n) state per group regardless of n). With group
  sizes ≤ accuracy the sketch is provably exact and returns the same
  discrete quantile as DuckDB's ``quantile_disc``, which is what the
  oracle pins; production keeps the same accuracy and accepts ≤0.01%
  rank error instead of a per-group sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_a15_pivot_user_event_matrix(spark, sf_dir):
    """Pivot: per-user event-type count matrix (pinned value list)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .orderBy("user_id")
    )


_PIVOT_COLS = ",\n       ".join(
    f"COALESCE(COUNT(*) FILTER (event_type = '{t}'), 0) AS {t}"
    for t in EVENT_TYPES
)

SQL_PIVOT = f"""
SELECT user_id,
       {_PIVOT_COLS}
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_a16_rollup_status_priority(spark, sf_dir):
    """Rollup over (o_orderstatus, o_orderpriority): per-pair counts,
    per-status subtotals, and the grand total in ONE shuffle (grouping
    sets expanded map-side). NULL marks the rolled-up level, as in
    ANSI ROLLUP."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


SQL_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def q_a17_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles of event value per event type
    (p50/p90/p99), rounded for cross-engine float stability."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


SQL_PERCENTILES = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


A17B_ACCURACY = 10_000


def q_a17b_value_percentiles_approx(spark, sf_dir):
    """Scale-safe percentile twin of a17: ``approx_percentile`` with a
    mergeable Greenwald-Khanna sketch instead of a per-group value
    buffer. Rank error ≤ n/accuracy; with accuracy=10,000 and the test
    tables' group sizes (≤ ~4k/event type at sf0.01) the result is
    provably EXACT — the discrete quantile, i.e. DuckDB's
    ``quantile_disc`` — so the oracle comparison is hash-strict. At
    10^10 rows/group the same plan holds O(accuracy·log n) state and
    returns values within 0.01% rank error, where exact ``percentile``
    (a17) would OOM the executors."""
    e = _t(spark, sf_dir, "events")
    acc = F.lit(A17B_ACCURACY)
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.5), acc).alias("ap50"),
            F.approx_percentile("value", F.lit(0.9), acc).alias("ap90"),
            F.approx_percentile("value", F.lit(0.99), acc).alias("ap99"),
        )
        .orderBy("event_type")
    )


SQL_PERCENTILES_APPROX = """
SELECT event_type,
       quantile_disc(value, 0.5) AS ap50,
       quantile_disc(value, 0.9) AS ap90,
       quantile_disc(value, 0.99) AS ap99
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "a15_pivot_user_event_matrix": (
        q_a15_pivot_user_event_matrix,
        SQL_PIVOT,
    ),
    "a16_rollup_status_priority": (
        q_a16_rollup_status_priority,
        SQL_ROLLUP,
    ),
    "a17_value_percentiles": (q_a17_value_percentiles, SQL_PERCENTILES),
    "a17b_value_percentiles_approx": (
        q_a17b_value_percentiles_approx,
        SQL_PERCENTILES_APPROX,
    ),
}
