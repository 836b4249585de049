"""Second relational operator batch — fills remaining SURVEY.md §2 rows
(P4, P8, P9, P10, P12, S14, J2, A14, F6, F7, F9) plus two TPC-H-shaped
headline joins (Q3/Q5 shapes under J4) that exercise the fact-fact
shuffle + broadcast-dim pattern at benchmark scale.

Same contract as operators/analytics.py: ``QUERIES[name] = (spark_fn,
oracle_sql)``; numeric-determinism policy identical (decimal-exact money
aggregation -> round(2) -> double; computed ints as BIGINT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_trials_etl_spark.functions import normalize as N
from clinical_trials_etl_spark.operators.analytics import dec2dbl, money, t
from clinical_trials_etl_spark.operators.common import dim_broadcast

# ---------------------------------------------------------------- filters


def q_p4_match_notnull(spark, sf_dir):
    """(P4) $match null/existence filter — st_trial_analytics.py:401,
    483-489: keep events whose value and props both exist."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("props").isNotNull()
                & (F.col("props") != ""))
        .select("event_id", "event_type", "value")
    )


SQL_P4 = """
SELECT event_id, event_type, value FROM events
WHERE value IS NOT NULL AND props IS NOT NULL AND props <> ''
"""


def q_p8_project_rename(spark, sf_dir):
    """(P8) $project nested path -> flat rename — st_trial_analytics.py:
    490-503: pull props.k out of the JSON payload as a typed column."""
    return t(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
        .try_cast("long")
        .alias("prop_k"),
    )


SQL_P8 = """
SELECT event_id,
       TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS prop_k
FROM events
"""


def q_p9_equality_filter(spark, sf_dir):
    """(P9) pandas df[df[col]==x] equality filter —
    st_trial_analytics.py:2104-2105."""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


SQL_P9 = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_mktsegment = 'BUILDING'
"""


def q_p10_complete_info(spark, sf_dir):
    """(P10) non-empty + AND-chain 'complete info' predicate —
    st_trial_analytics.py:2108-2118, 2262-2282."""
    return (
        t(spark, sf_dir, "customer")
        .filter(
            (F.col("c_name") != "")
            & F.col("c_acctbal").isNotNull()
            & (F.col("c_acctbal") > 0)
            & (F.col("c_mktsegment") != "")
        )
        .agg(F.count("*").cast("long").alias("n_complete"))
    )


SQL_P10 = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_complete FROM customer
WHERE c_name <> '' AND c_acctbal IS NOT NULL AND c_acctbal > 0
  AND c_mktsegment <> ''
"""


def q_p12_prefix_autocomplete(spark, sf_dir):
    """(P12) prefix autocomplete: pattern filter + projection + limit —
    search_trials_by_pattern st_trial_analytics.py:465-473. Deterministic
    via full sort before limit (TakeOrderedAndProject)."""
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("s"))
        .select("p_partkey", "p_name")
        .orderBy("p_name", "p_partkey")
        .limit(20)
    )


SQL_P12 = """
SELECT p_partkey, p_name FROM part
WHERE p_name LIKE 's%' ORDER BY p_name, p_partkey LIMIT 20
"""


def q_s14_point_lookup(spark, sf_dir):
    """(S14) keyed point lookup find_one — mongodb_storage.py:247-265.
    At lake scale this prunes to one bucket via the key-hash layout."""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 7)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


SQL_S14 = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
WHERE c_custkey = 7
"""


# ------------------------------------------------------------ flatten/tally


def q_j2_explode_parent_key(spark, sf_dir):
    """(J2) parent-key propagation through flatten — csv_exporter.py:
    95-248: child rows carry the parent natural key without a join;
    explode keeps parent columns."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            F.explode(N.normalize_list(F.col("text"), " ")).alias("word"),
        )
        .groupBy("doc_id", "source")
        .agg(F.count("*").cast("long").alias("n_words"))
    )


SQL_J2 = """
SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_words
FROM (
  SELECT doc_id, source, trim(unnest(string_split(text, ' '))) AS word
  FROM documents
) WHERE word <> ''
GROUP BY doc_id, source
"""


def q_a14_batch_tally(spark, sf_dir):
    """(A14) batch success/dup/fail accounting — main.py:148,
    batch_utils.py:68, mongodb_storage.py:422-431: one-pass conditional
    tallies via sum(when(...)), the observe()/metrics shape."""
    return t(spark, sf_dir, "events").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_success"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_failed"),
        F.sum(
            F.when(~F.col("event_type").isin("purchase", "error"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_other"),
    )


SQL_A14 = """
SELECT
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_success,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_failed,
  CAST(SUM(CASE WHEN event_type NOT IN ('purchase','error') THEN 1 ELSE 0 END)
    AS BIGINT) AS n_other
FROM events
"""


# ------------------------------------------------------- scalar functions


def _mixed_date_str(spark, sf_dir):
    """Deterministic mixed-format date strings derived from o_orderdate
    (the reference's messy-input regime for F5/F7/F9).

    scan_parallel: the downstream normalize chain runs ~8 try_to_date
    attempts + 2 regexes PER ROW — kernel-class cost that must not stay
    pipelined on a single-row-group scan task (common.scan_parallel)."""
    from clinical_trials_etl_spark.operators.common import scan_parallel

    o = scan_parallel(t(spark, sf_dir, "orders"))
    m = F.pmod(F.col("o_orderkey"), F.lit(4))
    return o.select(
        "o_orderkey",
        F.when(m == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(m == 1, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(m == 2, F.concat(F.lit("around "),
                               F.date_format("o_orderdate", "yyyy")))
        .otherwise(F.lit("unknown"))
        .alias("date_str"),
    )


_SQL_MIXED = """
  SELECT o_orderkey,
    CASE o_orderkey % 4
      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
      WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
      WHEN 2 THEN 'around ' || strftime(o_orderdate, '%Y')
      ELSE 'unknown' END AS date_str
  FROM orders
"""


def q_f6_normalize_boolean(spark, sf_dir):
    """(F6) vocab-driven boolean — utils/date_utils.py:50-71, vocab
    settings.py:74-75: mixed yes/oui/t/0/maybe inputs -> tri-state."""
    docs = t(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("lang") == "en", "Yes")
        .when(F.col("lang") == "fr", "non")
        .when(F.col("lang") == "de", " T ")
        .when(F.col("lang") == "es", "0")
        .otherwise("maybe")
    )
    return (
        docs.select(N.normalize_boolean(raw).alias("flag"))
        .groupBy("flag")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy("flag")
    )


SQL_F6 = """
SELECT flag, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT CASE
    WHEN lower(trim(raw)) IN ('yes','y','true','t','1','oui') THEN TRUE
    WHEN lower(trim(raw)) IN ('no','n','false','f','0','non') THEN FALSE
    ELSE NULL END AS flag
  FROM (
    SELECT CASE lang WHEN 'en' THEN 'Yes' WHEN 'fr' THEN 'non'
                     WHEN 'de' THEN ' T ' WHEN 'es' THEN '0'
                     ELSE 'maybe' END AS raw
    FROM documents
  )
) GROUP BY flag ORDER BY flag
"""


def q_f7_extract_year(spark, sf_dir):
    """(F7) year from normalized date with regex fallback —
    utils/date_utils.py:73-94: the 'around 2023' arm only parses via the
    \\b(19|20)\\d{2}\\b fallback."""
    mixed = _mixed_date_str(spark, sf_dir)
    return (
        mixed.select(N.extract_year(F.col("date_str")).alias("yr"))
        .groupBy("yr")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy("yr")
    )


SQL_F7 = f"""
SELECT yr, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT COALESCE(
    year(COALESCE(
      TRY_STRPTIME(clean, '%Y-%m-%d'),
      TRY_STRPTIME(clean, '%d/%m/%Y'),
      TRY_STRPTIME(clean, '%d-%m-%Y'),
      TRY_STRPTIME(clean, '%d.%m.%Y'))),
    TRY_CAST(NULLIF(regexp_extract(date_str, '\\b((?:19|20)\\d{{2}})\\b', 1), '')
             AS INTEGER)
  ) AS yr
  FROM (
    SELECT date_str, regexp_replace(date_str, '[^0-9/.\\-]', '', 'g') AS clean
    FROM ({_SQL_MIXED})
  )
) GROUP BY yr ORDER BY yr
"""


def q_f9_is_date_valid(spark, sf_dir):
    """(F9) date-validity predicate — utils/date_utils.py:122-133."""
    mixed = _mixed_date_str(spark, sf_dir)
    return (
        mixed.select(N.is_date_valid(F.col("date_str")).alias("valid"))
        .groupBy("valid")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy("valid")
    )


SQL_F9 = f"""
SELECT valid, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT COALESCE(
      TRY_STRPTIME(clean, '%Y-%m-%d'),
      TRY_STRPTIME(clean, '%d/%m/%Y'),
      TRY_STRPTIME(clean, '%d-%m-%Y'),
      TRY_STRPTIME(clean, '%d.%m.%Y')) IS NOT NULL AS valid
  FROM (
    SELECT regexp_replace(date_str, '[^0-9/.\\-]', '', 'g') AS clean
    FROM ({_SQL_MIXED})
  )
) GROUP BY valid ORDER BY valid
"""


# ------------------------------------------------------ headline joins


def q_q3_shipping_priority(spark, sf_dir):
    """(J4 headline, TPC-H Q3 shape) segment filter -> 3-way join ->
    revenue top-10. customer broadcasts; orders⋈lineitem shuffles on the
    order key only; filters push to the parquet scans."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = money(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(12,2)") - money(F.col("l_discount"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(dec2dbl(F.sum(revenue)).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


SQL_Q3 = """
SELECT o_orderkey, o_orderpriority,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2)
      AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_q5_supplier_volume(spark, sf_dir):
    """(J4 headline, TPC-H Q5 shape) 6-way star join, revenue per nation
    restricted to local suppliers (customer and supplier in the same
    nation) — dims broadcast, one fact-fact shuffle."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    revenue = money(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(12,2)") - money(F.col("l_discount"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim_broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            dim_broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dec2dbl(F.sum(revenue)).alias("revenue"))
        .orderBy(F.desc("revenue"), "r_name", "n_name")
    )


SQL_Q5 = """
SELECT r_name, n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2)
      AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY revenue DESC, r_name, n_name
"""


def q_w2b_top_order_per_segment(spark, sf_dir):
    """(W2 per-group form) top-1 per partition via row_number window —
    st_trial_analytics.py:1367's sort+iloc[0], generalized to one
    winner per group: the highest-value order per market segment."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    joined = o.join(dim_broadcast(c), o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", "o_orderkey",
                money(F.col("o_totalprice")).cast("double").alias("top_price"))
        .orderBy("c_mktsegment")
    )


SQL_W2B = """
SELECT c_mktsegment, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS top_price
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn = 1 ORDER BY c_mktsegment
"""


QUERIES = {
    "w2b_top_order_per_segment": (q_w2b_top_order_per_segment, SQL_W2B),
    "p4_match_notnull": (q_p4_match_notnull, SQL_P4),
    "p8_project_rename": (q_p8_project_rename, SQL_P8),
    "p9_equality_filter": (q_p9_equality_filter, SQL_P9),
    "p10_complete_info": (q_p10_complete_info, SQL_P10),
    "p12_prefix_autocomplete": (q_p12_prefix_autocomplete, SQL_P12),
    "s14_point_lookup": (q_s14_point_lookup, SQL_S14),
    "j2_explode_parent_key": (q_j2_explode_parent_key, SQL_J2),
    "a14_batch_tally": (q_a14_batch_tally, SQL_A14),
    "f6_normalize_boolean": (q_f6_normalize_boolean, SQL_F6),
    "f7_extract_year": (q_f7_extract_year, SQL_F7),
    "f9_is_date_valid": (q_f9_is_date_valid, SQL_F9),
    "q3_shipping_priority": (q_q3_shipping_priority, SQL_Q3),
    "q5_supplier_volume": (q_q5_supplier_volume, SQL_Q5),
}
