"""Text-analysis operators for training-data pipelines over ``documents``.

First-class components per the build brief: language-ID (stopword
heuristic), quality scoring, token counting, document fingerprinting.
All JVM-side (built-in functions only) so they ride whole-stage codegen
at 100 TB; nothing here needs Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_trials_etl_spark.operators.common import scan_parallel


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tokens(col):
    return F.filter(F.split(col, " "), lambda x: x != "")


def q_token_count(spark, sf_dir):
    """Whitespace tokenizer + counts; BPE-ish subword estimate via a
    4-chars-per-token heuristic (ceil(n_chars/4)) for budget planning."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        F.ceil(F.length("text") / 4).cast("long").alias("n_subword_est"),
    ).orderBy("doc_id")


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
         AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       CAST(CEIL(length(text) / 4.0) AS BIGINT) AS n_subword_est
FROM documents ORDER BY doc_id
"""


def q_quality_score(spark, sf_dir):
    """Quality signals: token count, mean token length, stopword ratio,
    punctuation ratio — the length/punct/stopword family used by web-scale
    corpus filters (C4/Gopher-style rules, public literature)."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda x: F.lower(x).isin("the", "a", "of", "and", "to", "in"))
    )
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"[.,;:!?]", ""))
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        (n_chars.cast("double") / n_tokens).alias("mean_token_len"),
        (stop_hits.cast("double") / n_tokens).alias("stopword_ratio"),
        (punct.cast("double") / n_chars).alias("punct_ratio"),
        ((n_tokens >= 10) & (stop_hits > 0)).alias("passes_quality"),
    ).orderBy("doc_id")


SQL_QUALITY = r"""
WITH q AS (
  SELECT doc_id, text,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> lower(x) IN ('the','a','of','and','to','in'))) AS stop_hits,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS DOUBLE) / n_tokens AS mean_token_len,
       CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(punct AS DOUBLE) / n_chars AS punct_ratio,
       (n_tokens >= 10 AND stop_hits > 0) AS passes_quality
FROM q ORDER BY doc_id
"""


# n-gram stopword profiles per language; deterministic first-match-wins
# CASE chain (mirrored exactly in the oracle SQL).
_LANG_MARKERS = [
    ("en", ("the", "and", "of")),
    ("fr", ("le", "la", "et")),
    ("de", ("der", "und", "die")),
    ("es", ("el", "los", "y")),
    ("zh", ("的", "是", "了")),
]


def q_lang_id(spark, sf_dir):
    """N-gram/stopword language-ID heuristic; scored against the table's
    ground-truth ``lang`` column."""
    d = _t(spark, sf_dir, "documents")
    toks = F.transform(_tokens(F.col("text")), lambda x: F.lower(x))
    pred = F.lit("und")
    # build reversed so first marker in the list wins
    for lang, markers in reversed(_LANG_MARKERS):
        hit = F.size(F.filter(toks, lambda x: x.isin(*markers))) > 0
        pred = F.when(hit, F.lit(lang)).otherwise(pred)
    d2 = d.select("doc_id", "lang", pred.alias("pred_lang"))
    return (
        d2.groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("cnt"))
        .orderBy("lang", "pred_lang")
    )


def _lang_case_sql() -> str:
    whens = []
    for lang, markers in _LANG_MARKERS:
        cond = " OR ".join(
            f"len(list_filter(toks, x -> x = '{m}')) > 0" for m in markers
        )
        whens.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


SQL_LANG_ID = f"""
WITH d AS (
  SELECT doc_id, lang,
         list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                        x -> lower(x)) AS toks
  FROM documents
)
SELECT lang, {_lang_case_sql()} AS pred_lang, COUNT(*) AS cnt
FROM d GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


def q_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over the whitespace-normalized text
    (content-defined identity used by the dedup suite)."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return d.select("doc_id", F.md5(norm.cast("binary")).alias("fp")).orderBy(
        "doc_id"
    )


SQL_FINGERPRINT = r"""
SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
FROM documents ORDER BY doc_id
"""


def q_corpus_clean(spark, sf_dir):
    """End-to-end corpus-cleaning pipeline — the composition a
    training-data prep job actually runs (C4/Gopher-style, public
    literature): exact dedup keeps the lowest doc_id per content
    fingerprint, quality gates drop short/stopword-free docs, and the
    survivors carry their token counts for budget accounting.

    Plan shape at 100 TB: ONE shuffle keyed by the content digest (the
    dedup groupBy); the keeper join is an aggregation-side self-join on
    the same key (no extra shuffle of the full text — only doc_id rides
    back); quality predicates are JVM expressions evaluated in the same
    scan. No Python anywhere."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda x: F.lower(x).isin("the", "a", "of", "and", "to", "in"))
    )
    scored = d.select(
        "doc_id",
        "lang",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        n_tokens.cast("long").alias("n_tokens"),
        stop_hits.alias("stop_hits"),
    )
    keepers = (
        scored.groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_doc_id"))
        .withColumnRenamed("fp", "keeper_fp")
    )
    return (
        scored.join(
            keepers,
            (scored.fp == keepers.keeper_fp)
            & (scored.doc_id == keepers.keeper_doc_id),
        )
        .filter((F.col("n_tokens") >= 10) & (F.col("stop_hits") > 0))
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    )


SQL_CORPUS_CLEAN = """
WITH scored AS (
  SELECT doc_id, lang, md5(text) AS fp,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> lower(x) IN ('the','a','of','and','to','in'))) AS stop_hits
  FROM documents
), keepers AS (
  SELECT fp, MIN(doc_id) AS keeper_doc_id FROM scored GROUP BY fp
)
SELECT s.doc_id, s.lang, s.n_tokens
FROM scored s JOIN keepers k
  ON s.fp = k.fp AND s.doc_id = k.keeper_doc_id
WHERE s.n_tokens >= 10 AND s.stop_hits > 0
ORDER BY s.doc_id
"""


# --------------------------------------------------------- winnowing
# Rolling-hash document fingerprinting (winnowing, Schleimer et al.
# SIGMOD'03 — the MOSS scheme): polynomial hash of every WINNOW_K-char
# gram, then keep the minimum hash of each WINNOW_W-wide window. The
# fingerprint set is position-independent enough to survive local edits,
# which md5-style whole-document digests (text_fingerprint above) do not.
WINNOW_K = 8
WINNOW_W = 4
WINNOW_MOD = 2147483647  # 2^31 - 1
WINNOW_BASE = 257
# 257^(K-1-j) mod M for j in 0..K-1: gram hash = sum(ascii(c_j)*POW[j]) % M.
# Max partial sum = K * 255 * M ~ 4.4e12 << 2^63, so the sum-then-mod
# form is overflow-safe in both engines' 64-bit ints — no fold needed.
WINNOW_POW = [pow(WINNOW_BASE, WINNOW_K - 1 - j, WINNOW_MOD)
              for j in range(WINNOW_K)]


def q_rolling_fingerprint(spark, sf_dir):
    """Winnowing fingerprints per document (see module constants): the
    fingerprint-set size, its minimum, and an md5 digest of the sorted
    set for cheap equality joins. Everything is a JVM array expression
    (sequence/transform/aggregate/slice) — one scan, no shuffle, no
    Python; DuckDB replays the identical arithmetic for the oracle.
    Documents shorter than WINNOW_K chars get the degenerate single-gram
    hash (sum of code points mod M), defined identically on both sides.

    Kernel shape: the scan is repartitioned first (scan_parallel — a
    single-row-group parquet file is ONE task, and this is the most
    expression-heavy kernel in the suite), and the code points are
    materialized ONCE per document before the gram loop — the first
    cut called substring() K times per gram (O(n*K) substrings) and ran
    single-threaded: 31.7 s at sf0.1; this form benches ~1 s."""
    k, w, mod = WINNOW_K, WINNOW_W, WINNOW_MOD
    pows = ", ".join(str(p) for p in WINNOW_POW)
    d = scan_parallel(_t(spark, sf_dir, "documents"))
    cps = """
      transform(sequence(1, length(text)),
                j -> CAST(ascii(substring(text, j, 1)) AS BIGINT))
    """
    expr = f"""
      CASE WHEN size(cps) >= {k} THEN
        transform(sequence(1, size(cps) - {k} + 1),
          i -> aggregate(sequence(0, {k - 1}), CAST(0 AS BIGINT),
                 (acc, j) -> acc
                             + element_at(cps, i + j)
                             * element_at(array({pows}), j + 1)) % {mod})
      ELSE
        array(aggregate(cps, CAST(0 AS BIGINT),
                (acc, c) -> acc + c) % {mod})
      END
    """
    wins = f"""
      CASE WHEN size(gram_hashes) >= {w} THEN
        transform(sequence(1, size(gram_hashes) - {w} + 1),
          j -> array_min(slice(gram_hashes, j, {w})))
      ELSE array(array_min(gram_hashes)) END
    """
    fp = "array_sort(array_distinct(winnowed))"
    return (
        d.select("doc_id", F.expr(cps).alias("cps"))
        .select("doc_id", F.expr(expr).alias("gram_hashes"))
        .select("doc_id", F.expr(wins).alias("winnowed"))
        .select("doc_id", F.expr(fp).alias("fp"))
        .select(
            "doc_id",
            F.size("fp").cast("long").alias("n_fp"),
            F.element_at("fp", 1).alias("fp_min"),
            F.md5(
                F.array_join(
                    F.transform("fp", lambda x: x.cast("string")), ","
                ).cast("binary")
            ).alias("fp_digest"),
        )
        .orderBy("doc_id")
    )


SQL_ROLLING_FP = f"""
WITH g AS (
  SELECT doc_id,
    CASE WHEN length(text) >= {WINNOW_K} THEN
      list_transform(range(1, length(text) - {WINNOW_K} + 2),
        i -> list_aggregate(
               list_transform(range(0, {WINNOW_K}),
                 j -> CAST(ascii(substring(text, CAST(i + j AS INT), 1))
                      AS BIGINT)
                      * ([{", ".join(str(p) for p in WINNOW_POW)}][j + 1])),
               'sum') % {WINNOW_MOD})
    ELSE
      [list_aggregate(
         list_transform(range(1, length(text) + 1),
           j -> CAST(ascii(substring(text, CAST(j AS INT), 1)) AS BIGINT)),
         'sum') % {WINNOW_MOD}]
    END AS gram_hashes
  FROM documents
), wnd AS (
  SELECT doc_id,
    CASE WHEN len(gram_hashes) >= {WINNOW_W} THEN
      list_transform(range(1, len(gram_hashes) - {WINNOW_W} + 2),
        j -> list_aggregate(
               gram_hashes[j:j + {WINNOW_W} - 1], 'min'))
    ELSE [list_aggregate(gram_hashes, 'min')] END AS winnowed
  FROM g
), f AS (
  SELECT doc_id, list_sort(list_distinct(winnowed)) AS fp FROM wnd
)
SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
       CAST(fp[1] AS BIGINT) AS fp_min,
       md5(array_to_string(fp, ',')) AS fp_digest
FROM f ORDER BY doc_id
"""


def q_corpus_split(spark, sf_dir):
    """Deterministic train/val/test corpus split (90/5/5) by hashing
    the DOCUMENT ID, never by position or random() — the property a
    training pipeline needs at 100 TB: the same doc lands in the same
    split on any cluster size, any partitioning, any re-run, and new
    docs join a split without reshuffling old ones. Hash = first 4 hex
    chars of md5 (uniform on 0..65535), mod 100 against fixed
    thresholds; md5 is identical in Spark and DuckDB, so the oracle is
    value-exact. JVM-only expressions — rides whole-stage codegen."""
    d = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10)
        .cast("int") % 100
    )
    return d.select(
        "doc_id",
        bucket.cast("long").alias("split_bucket"),
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test")).alias("split"),
    ).orderBy("doc_id")


SQL_CORPUS_SPLIT = """
SELECT doc_id,
       CAST(bucket AS BIGINT) AS split_bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS INTEGER) % 100 AS bucket
  FROM documents
) ORDER BY doc_id
"""


QUERIES = {
    "text_token_count": (q_token_count, SQL_TOKEN_COUNT),
    "text_corpus_split": (q_corpus_split, SQL_CORPUS_SPLIT),
    "text_quality_score": (q_quality_score, SQL_QUALITY),
    "text_lang_id": (q_lang_id, SQL_LANG_ID),
    "text_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "text_rolling_fingerprint": (q_rolling_fingerprint, SQL_ROLLING_FP),
    "text_corpus_clean": (q_corpus_clean, SQL_CORPUS_CLEAN),
}
