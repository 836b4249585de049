"""Event-stream operators over ``events``: sessionization, as-of join,
range join — the classic clickstream/CDC-adjacent shapes a web-scale
engine needs beyond plain relational operators.

Scale design (100 TB):
- Sessionization: ONE shuffle keyed by user + a per-user sort — the
  canonical shape. Per-partition work is bounded by per-user event
  counts; a hot user bounds one task, not the stage (and the streaming
  variant lives in streaming/stateful.py as applyInPandasWithState).
- As-of join: expressed as a single-pass windowed carry-forward
  (``last(..., ignorenulls)`` over the per-user event order), NOT an
  inequality join — Spark executes ts-inequality joins as
  broadcast-nested-loop (O(n*m) per partition); the window form is one
  shuffle + sort, the sort-merge as-of shape Flink/kdb use.
- Range join: the probe side stays a scan; the small band dimension is
  an explicit ``broadcast()`` literal DataFrame, so the inequality join
  is a broadcast nested loop over a handful of rows per record — the
  only sane plan when one side is tiny and the predicate is a range.

All three are oracled: timestamps compare via exact integer
microseconds (``unix_micros`` / ``epoch_us``), money-style sums via
decimal casts (order-independent, bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, integer microseconds

# value bands for the range-join rollup (lo inclusive, hi exclusive)
VALUE_BANDS = [
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("mid", 50.0, 100.0),
    ("large", 100.0, 250.0),
    ("jumbo", 250.0, 1000.0),
]


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_w4_sessionize(spark, sf_dir):
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds 30 minutes. Per session: event count,
    start, and duration. Event order within a user is (ts, event_id) —
    total and deterministic."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "ts"
    )
    order = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(order)
    run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = e.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0),
    ).withColumn("session_num", F.sum("new_sess").over(run))
    return (
        sess.groupBy("user_id", "session_num")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.max("us") - F.min("us")).alias("duration_us"),
        )
        .orderBy("user_id", "session_num")
    )


SQL_SESSIONIZE = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, ts FROM events
), marked AS (
  SELECT *,
    CASE WHEN us - LAG(us) OVER w IS NULL
           OR us - LAG(us) OVER w > {SESSION_GAP_US}
         THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), numbered AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS session_num
  FROM marked
)
SELECT user_id, session_num, COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(us) - MIN(us) AS duration_us
FROM numbered GROUP BY user_id, session_num
ORDER BY user_id, session_num
"""


def q_j5_asof_last_click(spark, sf_dir):
    """As-of join inside the event stream: for every purchase, the most
    recent click of the same user at or before it (strictly before in
    the total (ts, event_id) order). Single-pass windowed
    carry-forward — see module docstring for why this beats an
    inequality join at scale. The oracle is written as a correlated
    max() subquery, i.e. a structurally different computation of the
    same relation — a stronger check than mirroring the window."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    order = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")),
        ignorenulls=True,
    ).over(order)
    # the carry-forward at a purchase row includes only rows ordered
    # strictly before it (the current row is the purchase itself), so
    # this is "latest click with (ts, event_id) < purchase's"
    return (
        e.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("last_click_ts").cast("timestamp"))
            ).alias("gap_us"),
        )
        .orderBy("event_id")
    )


SQL_ASOF = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
  (SELECT MAX(c.ts) FROM events c
   WHERE c.user_id = p.user_id AND c.event_type = 'click'
     AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id)))
    AS last_click_ts,
  epoch_us(p.ts) - epoch_us(
    (SELECT MAX(c.ts) FROM events c
     WHERE c.user_id = p.user_id AND c.event_type = 'click'
       AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))))
    AS gap_us
FROM events p WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


def q_j6_value_band_rollup(spark, sf_dir):
    """Range join: events land in value bands [lo, hi) from a tiny
    literal dimension, explicitly broadcast; per band: count + exact
    decimal sum. The band table is 5 rows — broadcast nested loop is
    the wanted plan, and the rollup after it is one ordinary shuffle."""
    e = _t(spark, sf_dir, "events")
    bands = e.sparkSession.createDataFrame(
        VALUE_BANDS, "band string, lo double, hi double"
    )
    joined = e.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return (
        joined.groupBy("band", "lo")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("lo")
        .select("band", "n_events", "sum_value")
    )


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{b}' AS band, {lo} AS lo, {hi} AS hi"
    for b, lo, hi in VALUE_BANDS
)

SQL_RANGE_JOIN = f"""
WITH bands AS ({_BANDS_SQL})
SELECT band, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS sum_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY band, lo ORDER BY lo
"""


def q_w5_user_value_delta(spark, sf_dir):
    """lag/lead window pair: per-user event-over-event value delta and
    the following event's type, in the total (ts, event_id) order. One
    shuffle keyed by user; deltas round-trip through DECIMAL so both
    engines produce bit-identical doubles."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_val = F.lag("value").over(w)
    delta = (
        F.col("value").cast("decimal(18,2)")
        - prev_val.cast("decimal(18,2)")
    ).cast("double")
    return e.select(
        "event_id",
        "user_id",
        "value",
        delta.alias("value_delta"),
        F.lead("event_type").over(w).alias("next_type"),
    ).orderBy("event_id")


SQL_VALUE_DELTA = """
SELECT event_id, user_id, value,
       CAST(CAST(value AS DECIMAL(18,2))
            - CAST(LAG(value) OVER w AS DECIMAL(18,2)) AS DOUBLE)
         AS value_delta,
       LEAD(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


QUERIES = {
    "w4_sessionize": (q_w4_sessionize, SQL_SESSIONIZE),
    "j5_asof_last_click": (q_j5_asof_last_click, SQL_ASOF),
    "j6_value_band_rollup": (q_j6_value_band_rollup, SQL_RANGE_JOIN),
    "w5_user_value_delta": (q_w5_user_value_delta, SQL_VALUE_DELTA),
}
