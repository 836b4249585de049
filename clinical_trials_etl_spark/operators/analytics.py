"""Relational analytics operators (SURVEY.md §2) over the driver star schema.

Every entry in ``QUERIES`` maps a name to ``(spark_fn, oracle_sql)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` is the idiomatic-Spark program and
``oracle_sql`` is the ANSI-SQL equivalent DuckDB runs on the same parquet.
Reference provenance for each operator is cited as (ID) against
SURVEY.md §2 / the reference repo files listed there.

Numeric-determinism policy (so Spark and DuckDB hash identically):
- money columns are 2-decimal doubles; aggregate them as DECIMAL(12,2)
  (exact, order-independent), round to 2, cast back to DOUBLE — both
  engines then produce bit-identical doubles.
- averages = (exact decimal sum -> double) / count: identical IEEE ops.
- every computed integer is cast to BIGINT on both sides.
- timestamps are emitted as formatted strings, never raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_trials_etl_spark.functions import normalize as N
from clinical_trials_etl_spark.operators.common import dim_broadcast

# ---------------------------------------------------------------- helpers


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def money(col):
    """Exact 2-decimal representation for order-independent aggregation."""
    return col.cast("decimal(12,2)")


def dec2dbl(col):
    """Exact decimal aggregate -> canonical double."""
    return F.round(col, 2).cast("double")


MONEY_SUM = "CAST(ROUND(SUM(CAST({x} AS DECIMAL(12,2))), 2) AS DOUBLE)"


# ---------------------------------------------------------------- queries


def q_a1_event_type_counts(spark, sf_dir):
    """(A1) group-count + sort desc — st_trial_analytics.py:207-216."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "event_type")
    )


SQL_A1 = """
SELECT event_type, COUNT(*) AS cnt
FROM events GROUP BY event_type ORDER BY cnt DESC, event_type
"""


def q_a2_top10_words(spark, sf_dir):
    """(A2) unwind + group-count top-10 — mongodb_storage.py:360-373.
    explode == $unwind; deterministic tie-break on the word itself."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(10)
    )


SQL_A2 = """
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word ORDER BY cnt DESC, word LIMIT 10
"""


def q_a3_distinct_users(spark, sf_dir):
    """(A3/A12) distinct count — st_trial_analytics.py:232-243."""
    return t(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


SQL_A3 = """
SELECT COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_event_types
FROM events
"""


def q_a3b_distinct_users_approx(spark, sf_dir):
    """Scale-safe twin of a3: ``approx_count_distinct`` (HyperLogLog++,
    default rsd=5%) instead of exact COUNT(DISTINCT).

    Exact distinct is a full shuffle of every distinct value per
    aggregation; at 10^10 events the HLL sketch holds O(1/rsd^2)
    registers, merges map-side, and never shuffles values — the same
    mergeable-sketch reasoning as a17b's approx_percentile. Unlike
    a17b there is NO exactness regime to pin an oracle to: Spark's
    estimator is biased a few percent even when registers far exceed
    the cardinality (measured: 151 vs 150 at rsd=0.01; shrinking rsd
    to 0.005 happened to hit 150 at sf0.01 but read 1501 vs 1500 at
    sf0.1 and cost 40x the runtime — 8.9 s vs 0.2 s — so a
    hash-strict oracle would be both fragile and the WRONG
    configuration to ship). Registered Spark-only; the ±3·rsd
    accuracy contract is pinned by tests/test_oracle_parity.py
    against the exact a3 at both scale factors, and DuckDB's
    approx_count_distinct (a different sketch) is not comparable."""
    return t(spark, sf_dir, "events").agg(
        F.approx_count_distinct("user_id").alias("n_users"),
        F.approx_count_distinct("event_type").alias("n_event_types"),
    )


def q_a4_mktsegment_counts(spark, sf_dir):
    """(A4) group-count by segment — st_trial_analytics.py:245-256."""
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "c_mktsegment")
    )


SQL_A4 = """
SELECT c_mktsegment, COUNT(*) AS cnt
FROM customer GROUP BY c_mktsegment ORDER BY cnt DESC, c_mktsegment
"""


def q_a5_top_order_priorities(spark, sf_dir):
    """(A5) group-count top-k — st_trial_analytics.py:411-429."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "o_orderpriority")
        .limit(3)
    )


SQL_A5 = """
SELECT o_orderpriority, COUNT(*) AS cnt
FROM orders GROUP BY o_orderpriority
ORDER BY cnt DESC, o_orderpriority LIMIT 3
"""


def q_a6_returnflag_status_counts(spark, sf_dir):
    """(A6) two-key group-count — st_trial_analytics.py:372-390."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_A6 = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_a7_orders_timeline(spark, sf_dir):
    """(A7) time-bucketed count by month — st_trial_analytics.py:346-370."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("month")
    )


SQL_A7 = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS cnt
FROM orders GROUP BY month ORDER BY month
"""


def q_a8_nation_multiagg(spark, sf_dir):
    """(A8) multi-aggregate per group — st_trial_analytics.py:431-454.
    Dim table broadcast: nation is tiny, so the join is map-side."""
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
            "inner",
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dec2dbl(F.sum(money(F.col("c_acctbal")))).alias("total_acctbal"),
        )
        .orderBy(F.desc("n_customers"), "n_name")
    )


SQL_A8 = f"""
SELECT n_name, COUNT(*) AS n_customers,
       {MONEY_SUM.format(x="c_acctbal")} AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_customers DESC, n_name
"""


def q_a9_filtered_count(spark, sf_dir):
    """(A9) filtered count — st_trial_analytics.py:339."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount").between(0.05, 0.07)) & (F.col("l_quantity") < 24)
    ).agg(F.count("*").alias("cnt"))


SQL_A9 = """
SELECT COUNT(*) AS cnt FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_a10_props_value_counts(spark, sf_dir):
    """(A10 + F20) JSON path projection + value_counts top-10 —
    st_trial_analytics.py:2232, 1861."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "k")
        .limit(10)
    )


SQL_A10 = """
SELECT json_extract_string(props, '$.k') AS k, COUNT(*) AS cnt
FROM events GROUP BY k ORDER BY cnt DESC, k LIMIT 10
"""


def q_a11_pricing_summary(spark, sf_dir):
    """(A11/A1-shape flagship, TPC-H Q1) multi-agg incl. sums and avgs —
    column sums st_trial_analytics.py:1365-1366."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = money(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(12,2)") - money(F.col("l_discount"))
    )
    charge = disc_price * (F.lit(1).cast("decimal(12,2)") + money(F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec2dbl(F.sum(money(F.col("l_quantity")))).alias("sum_qty"),
            dec2dbl(F.sum(money(F.col("l_extendedprice")))).alias("sum_base_price"),
            dec2dbl(F.sum(disc_price)).alias("sum_disc_price"),
            dec2dbl(F.sum(charge)).alias("sum_charge"),
            (
                F.sum(money(F.col("l_quantity"))).cast("double") / F.count("*")
            ).alias("avg_qty"),
            (
                F.sum(money(F.col("l_extendedprice"))).cast("double") / F.count("*")
            ).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_A11 = f"""
SELECT l_returnflag, l_linestatus,
  {MONEY_SUM.format(x="l_quantity")} AS sum_qty,
  {MONEY_SUM.format(x="l_extendedprice")} AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
      AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) *
      (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE)
      AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_a13_customer_cohorts(spark, sf_dir):
    """(A13) disjoint cohort buckets in one pass —
    st_trial_analytics.py:2259-2286."""
    c = t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        c.groupBy(bucket.alias("cohort"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("cohort")
    )


SQL_A13 = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS cohort,
       COUNT(*) AS cnt
FROM customer GROUP BY cohort ORDER BY cohort
"""


def q_w1_rolling_mean_daily(spark, sf_dir):
    """(W1) centered rolling mean k=3 over daily counts —
    st_trial_analytics.py:1200. Reference semantics exactly: pandas
    ``rolling(3, center=True).mean()`` defaults min_periods to the
    window size, so the first and last rows (incomplete windows) are
    NaN -> NULL here, not 2-element means.

    The unpartitioned window (WindowExec warns) is deliberate: it runs
    over the POST-AGGREGATE daily series — one row per day, bounded by
    the calendar, not the event count — so the single-partition sort is
    a few thousand rows at any data scale. The 10^10 rows were already
    reduced by the shuffling groupBy above."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("day").rowsBetween(-1, 1)
    full = F.count("cnt").over(w) == 3
    return daily.select(
        "day",
        "cnt",
        F.when(full, F.avg("cnt").over(w)).alias("rolling_avg"),
    ).orderBy("day")


SQL_W1 = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS cnt
  FROM events GROUP BY day
)
SELECT day, cnt,
       CASE WHEN COUNT(cnt) OVER w = 3 THEN AVG(cnt) OVER w END
         AS rolling_avg
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
ORDER BY day
"""


def q_w2_top_nation(spark, sf_dir):
    """(W2) top-1 per ordering — st_trial_analytics.py:1367."""
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    counts = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), "n_name")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", "cnt")
    )


SQL_W2 = """
WITH counts AS (
  SELECT n_name, COUNT(*) AS cnt
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, cnt FROM (
  SELECT n_name, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, n_name) AS rn
  FROM counts
) WHERE rn = 1
"""


def q_w3_max_lsn_per_key(spark, sf_dir):
    """(W3) max-sequence-number dedup per key — the CDC apply window
    (reference analog: last-write-wins upsert mongodb_storage.py:229-231).
    Here: latest event per user."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


SQL_W3 = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
"""


def q_p5_regex_filter(spark, sf_dir):
    """(P5) case-insensitive regex filter —
    search_trials_advanced st_trial_analytics.py:291-344."""
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").rlike("(?i)^(cold|blue) "))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


SQL_P5 = """
SELECT p_partkey, p_name, p_brand FROM part
WHERE regexp_matches(p_name, '(?i)^(cold|blue) ')
ORDER BY p_partkey
"""


def q_p6_date_range(spark, sf_dir):
    """(P6) date-range predicate $gte/$lte — st_trial_analytics.py:325-332."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-12-31").cast("timestamp"),
            )
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderstatus",
        )
        .orderBy("o_orderkey")
    )


SQL_P6 = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderstatus
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
ORDER BY o_orderkey
"""


def paginate_keyset(df, key: str, last_key, n: int):
    """Keyset pagination — the engine shape for 'next page after key K':
    WHERE key > K ORDER BY key LIMIT n. Executes as a pushed-down filter
    + TakeOrderedAndProject (distributed partial top-n), never a global
    single-partition sort. ``last_key`` is what a real client carries
    between pages (the reference's .skip() analog carries an offset,
    st_trial_analytics.py:334-339)."""
    return df.filter(F.col(key) > F.lit(last_key)).orderBy(key).limit(n)


def q_p7_pagination(spark, sf_dir):
    """(P7) pagination, keyset-style — st_trial_analytics.py:334-339.

    The OFFSET boundary key (the 100th o_orderkey) is itself computed
    distributively: orderBy().limit(100) is TakeOrderedAndProject, its
    max is the boundary, broadcast as a 1-row join — so neither leg
    sorts the table in one partition (the round-1 row_number() over a
    global Window did, the classic scale-killer; asserted gone in
    tests/test_plans.py). A real paging client passes last_key directly
    and only the paginate_keyset leg runs."""
    o = t(spark, sf_dir, "orders")
    boundary = (
        o.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(100)
        .agg(F.max("o_orderkey").alias("last_key"))
    )
    page = (
        o.join(F.broadcast(boundary))
        .filter(F.col("o_orderkey") > F.col("last_key"))
        .orderBy("o_orderkey")
        .limit(20)
    )
    return page.select("o_orderkey", "o_totalprice")


SQL_P7 = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 20 OFFSET 100
"""


def q_p11_multi_col_search(spark, sf_dir):
    """(P11) multi-column OR substring search, case-insensitive —
    st_trial_analytics.py:2120-2136."""
    d = t(spark, sf_dir, "documents")
    term = "merge"
    cond = (
        F.lower(F.col("text")).contains(term)
        | F.lower(F.col("source")).contains(term)
        | F.lower(F.col("lang")).contains(term)
    )
    return d.filter(cond).select("doc_id", "lang", "source").orderBy("doc_id")


SQL_P11 = """
SELECT doc_id, lang, source FROM documents
WHERE contains(lower(text), 'merge') OR contains(lower(source), 'merge')
   OR contains(lower(lang), 'merge')
ORDER BY doc_id
"""


def q_p13_truncate(spark, sf_dir):
    """(P13) truncate/ellipsis projection — st_trial_analytics.py:513-517."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", N.truncate_ellipsis(F.col("text"), 50).alias("preview")
    ).orderBy("doc_id")


SQL_P13 = """
SELECT doc_id,
       CASE WHEN length(text) > 50 THEN substr(text, 1, 50) || '...'
            ELSE text END AS preview
FROM documents ORDER BY doc_id
"""


def q_p14_fillna(spark, sf_dir):
    """(P14) fillna/default — st_trial_analytics.py:876 etc."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.coalesce(F.nullif(F.col("event_type"), F.lit("")), F.lit("Not specified")).alias(
                "event_type_filled"
            ),
        )
        .orderBy("event_id")
        .limit(200)
    )


SQL_P14 = """
SELECT event_id,
       COALESCE(NULLIF(event_type, ''), 'Not specified') AS event_type_filled
FROM events ORDER BY event_id LIMIT 200
"""


def q_j4_revenue_by_nation(spark, sf_dir):
    """(J4) star join lineitem⋈orders⋈customer⋈nation⋈region + agg.
    Dims broadcast; fact-fact join shuffles on the join key only."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    revenue = money(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(12,2)") - money(F.col("l_discount"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dec2dbl(F.sum(revenue)).alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("r_name", "n_name")
    )


SQL_J4 = """
SELECT r_name, n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
      AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


def q_j4b_parttype_revenue(spark, sf_dir):
    """(J4) broadcast dim join part⋈lineitem + agg per type."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(dim_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            dec2dbl(F.sum(money(F.col("l_extendedprice")))).alias("total_price"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_type")
    )


SQL_J4B = f"""
SELECT p_type, {MONEY_SUM.format(x="l_extendedprice")} AS total_price,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type ORDER BY p_type
"""


def q_j3_customers_without_orders(spark, sf_dir):
    """(J3) anti-join existence-violation check — validator.py:138-148
    pattern (element-of-A-not-in-B)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SQL_J3 = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def q_j3b_active_customers(spark, sf_dir):
    """(J3) semi-join existence check."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 200000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


SQL_J3B = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
ORDER BY c_custkey
"""


def q_set_union_except(spark, sf_dir):
    """(§2.7) set ops: nations having customers UNION nations having
    suppliers; and EXCEPT for customer-only nations."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    union = c.union(s).distinct().withColumn("src", F.lit("either"))
    only_c = (
        c.distinct()
        .exceptAll(s.distinct())
        .withColumn("src", F.lit("customer_only"))
    )
    return union.union(only_c).orderBy("src", "nationkey")


SQL_SET = """
SELECT nationkey, src FROM (
  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey, 'either' AS src
  FROM customer
  UNION
  SELECT DISTINCT CAST(s_nationkey AS BIGINT), 'either' FROM supplier
  UNION ALL
  SELECT nationkey, 'customer_only' AS src FROM (
    SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier
  )
) ORDER BY src, nationkey
"""


def q_f3_normalize_string(spark, sf_dir):
    """(F3) whitespace collapse + trim — normalizer.py:14-32."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")).alias("norm_text"),
    ).orderBy("doc_id")


SQL_F3 = r"""
SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm_text
FROM documents ORDER BY doc_id
"""


def q_f4_normalize_number(spark, sf_dir):
    """(F4) tri-state number coercion on the JSON prop (string) —
    normalizer.py:34-64."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.select(
            "event_id",
            k.alias("raw"),
            k.try_cast("long").alias("as_long"),
            F.replace(k, F.lit(","), F.lit(".")).try_cast("double").alias("as_double"),
        )
        .orderBy("event_id")
        .limit(200)
    )


SQL_F4 = """
SELECT event_id,
       json_extract_string(props, '$.k') AS raw,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS as_long,
       TRY_CAST(replace(json_extract_string(props, '$.k'), ',', '.') AS DOUBLE)
         AS as_double
FROM events ORDER BY event_id LIMIT 200
"""


def q_f5_normalize_date(spark, sf_dir):
    """(F5+F7) date normalization through the dd/MM/yyyy round-trip +
    year extraction — date_utils.py:13-48, 73-94."""
    o = t(spark, sf_dir, "orders")
    raw = F.date_format("o_orderdate", "dd/MM/yyyy")
    norm = F.coalesce(
        F.try_to_date(raw, "yyyy-MM-dd"),
        F.try_to_date(raw, "dd/MM/yyyy"),
    )
    return (
        o.select(
            "o_orderkey",
            raw.alias("raw_date"),
            F.date_format(norm, "yyyy-MM-dd").alias("norm_date"),
            F.year(norm).cast("long").alias("year"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


SQL_F5 = """
SELECT o_orderkey,
       strftime(o_orderdate, '%d/%m/%Y') AS raw_date,
       strftime(COALESCE(TRY_STRPTIME(strftime(o_orderdate, '%d/%m/%Y'), '%Y-%m-%d'),
                         TRY_STRPTIME(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y')),
                '%Y-%m-%d') AS norm_date,
       CAST(year(o_orderdate) AS BIGINT) AS year
FROM orders ORDER BY o_orderkey LIMIT 500
"""


def q_f8_duration(spark, sf_dir):
    """(F8) day-difference duration, histogrammed — date_utils.py:96-120."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    dur = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        joined.groupBy(dur.cast("long").alias("ship_delay_days"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("ship_delay_days")
    )


SQL_F8 = """
SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
            AS BIGINT) AS ship_delay_days,
       COUNT(*) AS cnt
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY ship_delay_days ORDER BY ship_delay_days
"""


def q_f10_age_range(spark, sf_dir):
    """(F10) '{min}-{max}' range parsing into a struct-as-two-cols —
    normalizer.py:87-115."""
    p = t(spark, sf_dir, "part")
    rng = F.concat(
        F.col("p_size").cast("string"), F.lit("-"), (F.col("p_size") + 10).cast("string")
    )
    parsed = N.normalize_age_range(rng)
    return p.select(
        "p_partkey",
        rng.alias("range_str"),
        parsed["min"].cast("long").alias("range_min"),
        parsed["max"].cast("long").alias("range_max"),
    ).orderBy("p_partkey")


SQL_F10 = r"""
SELECT p_partkey,
       CAST(p_size AS VARCHAR) || '-' || CAST(p_size + 10 AS VARCHAR) AS range_str,
       CAST(p_size AS BIGINT) AS range_min,
       CAST(p_size + 10 AS BIGINT) AS range_max
FROM part ORDER BY p_partkey
"""


def q_f11_normalize_country(spark, sf_dir):
    """(F11) vocabulary map with passthrough applied to region names —
    normalizer.py:117-176. ('europe' hits the map domain shape; region
    names pass through unchanged, proving the passthrough arm.)"""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.select(
        "n_name", N.normalize_country(F.col("r_name")).alias("canon_region")
    ).orderBy("n_name")


def _country_case_sql(col: str) -> str:
    whens = "\n".join(
        f"WHEN lower(trim({col})) = '{k}' THEN '{v}'"
        for k, v in N._COUNTRY_MAP.items()
    )
    return f"CASE {whens} ELSE {col} END"


SQL_F11 = f"""
SELECT n_name, {_country_case_sql("r_name")} AS canon_region
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_name
"""


def q_f12_normalize_phase(spark, sf_dir):
    """(F12) roman-numeral phase extraction — normalizer.py:178-213.
    Phase strings synthesized deterministically from o_orderpriority."""
    o = t(spark, sf_dir, "orders")
    phase_str = F.concat(
        F.lit("Phase "),
        F.expr("repeat('I', CAST(substr(o_orderpriority, 1, 1) AS INT) % 4)"),
    )
    roman = F.upper(F.regexp_extract(phase_str, r"(?i)phase\s+([IViv]+)", 1))
    norm = F.when(roman != "", F.concat(F.lit("PHASE "), roman)).otherwise(phase_str)
    return (
        o.select(phase_str.alias("phase_raw"), norm.alias("phase_norm"))
        .groupBy("phase_raw", "phase_norm")
        .agg(F.count("*").alias("cnt"))
        .orderBy("phase_raw")
    )


SQL_F12 = """
WITH p AS (
  SELECT 'Phase ' || repeat('I', CAST(substr(o_orderpriority, 1, 1) AS INT) % 4)
           AS phase_raw
  FROM orders
)
SELECT phase_raw,
       CASE WHEN regexp_extract(phase_raw, '(?i)phase\\s+([IViv]+)', 1) <> ''
            THEN 'PHASE ' || upper(regexp_extract(phase_raw, '(?i)phase\\s+([IViv]+)', 1))
            ELSE phase_raw END AS phase_norm,
       COUNT(*) AS cnt
FROM p GROUP BY phase_raw, phase_norm ORDER BY phase_raw
"""


def q_f13_list_preview(spark, sf_dir):
    """(F13+F21) normalize_list + ', '.join(xs[:3]) preview —
    normalizer.py:66-85; st_trial_analytics.py:1156-1164."""
    d = t(spark, sf_dir, "documents")
    words = F.filter(
        F.transform(F.split(F.col("text"), " "), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return d.select(
        "doc_id",
        F.array_join(F.slice(words, 1, 3), ", ").alias("preview3"),
        F.size(words).cast("long").alias("n_items"),
    ).orderBy("doc_id")


SQL_F13 = r"""
SELECT doc_id,
       array_to_string(list_filter(list_transform(string_split(text, ' '),
                                                  x -> regexp_replace(x, '^\s+|\s+$', '', 'g')),
                                   x -> x <> '')[1:3], ', ') AS preview3,
       CAST(len(list_filter(list_transform(string_split(text, ' '),
                                           x -> regexp_replace(x, '^\s+|\s+$', '', 'g')),
                            x -> x <> '')) AS BIGINT) AS n_items
FROM documents ORDER BY doc_id
"""


def q_f2_clean_text(spark, sf_dir):
    """(F2) the clean_text chain as a relational expression —
    cleaner.py:10-35 (ASCII subset here; the full unicode chain is the
    Arrow kernel in functions/html_extract.py)."""
    d = t(spark, sf_dir, "documents")
    c = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    for src, dst in N._CLEAN_REPLACEMENTS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return d.select("doc_id", c.alias("clean")).orderBy("doc_id")


_SQL_F2_CHAIN = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
for _src, _dst in N._CLEAN_REPLACEMENTS:
    _d = _dst.replace("'", "''")
    _SQL_F2_CHAIN = f"replace({_SQL_F2_CHAIN}, '{_src}', '{_d}')"

SQL_F2 = f"""
SELECT doc_id, {_SQL_F2_CHAIN} AS clean FROM documents ORDER BY doc_id
"""


# name -> (spark_fn, oracle_sql or None)
QUERIES = {
    "a1_event_type_counts": (q_a1_event_type_counts, SQL_A1),
    "a2_top10_words": (q_a2_top10_words, SQL_A2),
    "a3_distinct_users": (q_a3_distinct_users, SQL_A3),
    "a3b_distinct_users_approx": (q_a3b_distinct_users_approx, None),
    "a4_mktsegment_counts": (q_a4_mktsegment_counts, SQL_A4),
    "a5_top_order_priorities": (q_a5_top_order_priorities, SQL_A5),
    "a6_returnflag_status_counts": (q_a6_returnflag_status_counts, SQL_A6),
    "a7_orders_timeline": (q_a7_orders_timeline, SQL_A7),
    "a8_nation_multiagg": (q_a8_nation_multiagg, SQL_A8),
    "a9_filtered_count": (q_a9_filtered_count, SQL_A9),
    "a10_props_value_counts": (q_a10_props_value_counts, SQL_A10),
    "a11_pricing_summary": (q_a11_pricing_summary, SQL_A11),
    "a13_customer_cohorts": (q_a13_customer_cohorts, SQL_A13),
    "w1_rolling_mean_daily": (q_w1_rolling_mean_daily, SQL_W1),
    "w2_top_nation": (q_w2_top_nation, SQL_W2),
    "w3_max_lsn_per_key": (q_w3_max_lsn_per_key, SQL_W3),
    "p5_regex_filter": (q_p5_regex_filter, SQL_P5),
    "p6_date_range": (q_p6_date_range, SQL_P6),
    "p7_pagination": (q_p7_pagination, SQL_P7),
    "p11_multi_col_search": (q_p11_multi_col_search, SQL_P11),
    "p13_truncate": (q_p13_truncate, SQL_P13),
    "p14_fillna": (q_p14_fillna, SQL_P14),
    "j4_revenue_by_nation": (q_j4_revenue_by_nation, SQL_J4),
    "j4b_parttype_revenue": (q_j4b_parttype_revenue, SQL_J4B),
    "j3_customers_without_orders": (q_j3_customers_without_orders, SQL_J3),
    "j3b_active_customers": (q_j3b_active_customers, SQL_J3B),
    "set_union_except": (q_set_union_except, SQL_SET),
    "f2_clean_text": (q_f2_clean_text, SQL_F2),
    "f3_normalize_string": (q_f3_normalize_string, SQL_F3),
    "f4_normalize_number": (q_f4_normalize_number, SQL_F4),
    "f5_normalize_date": (q_f5_normalize_date, SQL_F5),
    "f8_duration": (q_f8_duration, SQL_F8),
    "f10_age_range": (q_f10_age_range, SQL_F10),
    "f11_normalize_country": (q_f11_normalize_country, SQL_F11),
    "f12_normalize_phase": (q_f12_normalize_phase, SQL_F12),
    "f13_list_preview": (q_f13_list_preview, SQL_F13),
}
