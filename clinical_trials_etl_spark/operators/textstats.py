"""Text-analysis operators for training-data pipelines over ``documents``.

First-class components per the build brief: language-ID (stopword
heuristic), quality scoring, token counting, document fingerprinting.
All JVM-side (built-in functions only) so they ride whole-stage codegen
at 100 TB; nothing here needs Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F


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


QUERIES = {
    "text_token_count": (q_token_count, SQL_TOKEN_COUNT),
    "text_quality_score": (q_quality_score, SQL_QUALITY),
    "text_lang_id": (q_lang_id, SQL_LANG_ID),
    "text_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "text_corpus_clean": (q_corpus_clean, SQL_CORPUS_CLEAN),
}
