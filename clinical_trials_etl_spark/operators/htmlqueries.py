"""Driver-oracled queries for the HTML extraction kernels (the S1/S2,
P1-P3, F1-F2, F17-F19 surface of SURVEY.md §2).

The star-schema testdata has no html column, so each query *constructs*
HTML deterministically from ``documents`` columns with JVM ``concat``
(the ``multimodal.with_payload`` pattern), runs the real Arrow kernel
over it, and the DuckDB oracle computes the expected output with plain
string expressions over the identical construction. This gives the
selector/table/list/label kernels green CORRECTNESS rows, not just
pytest goldens.

Reference parity targets:
- whole-document text: trials_extractor/utils/html_utils.py:109-122 +
  processors/cleaner.py:10-35 (extract_text + clean_text chain);
- selector projection incl. ``+`` adjacent-sibling, ``>`` child and
  ``:-soup-contains`` (config/selectors.py:8-194 syntax);
- table -> records, ragged rows skipped (html_utils.py:124-164);
- <ul>/<ol> -> items (html_utils.py:166-179);
- p.bolder label -> next-sibling value map (html_utils.py:181-230).

Scale note: HTML construction and explosion are pure JVM; only the
parse/select kernels are Python, and they are Arrow-vectorized pandas
UDFs (one DOM build per document for the whole field set) — the same
placement as the CDC extraction hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_trials_etl_spark.dist import ensure_package_on_executors
from clinical_trials_etl_spark.operators.common import scan_parallel
from clinical_trials_etl_spark.functions import html_extract as HX


def _docs(spark, sf_dir):
    # repartition ahead of the Arrow parse kernel: single-row-group
    # parquet = one scan task (common.scan_parallel)
    return scan_parallel(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _b(expr):
    """HTML string -> binary payload column (kernels take binary html)."""
    return F.encode(expr, "UTF-8")


# --------------------------------------------------------------- F1+F2

def q_html_extract_text(spark, sf_dir):
    """Whole-document text extraction: title/h1/p text nodes concatenate
    in document order, the comment contributes nothing, clean_text
    collapses whitespace — byte-identical to the reference chain."""
    ensure_package_on_executors(spark)
    d = _docs(spark, sf_dir)
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><h1>"),
        F.upper(F.col("lang")),
        F.lit("</h1><p>"),
        F.substring(F.col("text"), 1, 120),
        F.lit("</p><!-- not text --></body></html>"),
    )
    return d.select(
        "doc_id", HX.extract_text_udf(_b(html)).alias("text_out")
    ).orderBy("doc_id")


SQL_HTML_EXTRACT_TEXT = r"""
SELECT doc_id,
       trim(regexp_replace(
         'Doc ' || CAST(doc_id AS VARCHAR) || upper(lang)
                || substring(text, 1, 120),
         '\s+', ' ', 'g')) AS text_out
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------ P1/P2/P3

_FIELD_SELECTORS = {
    # reference selector shapes, verbatim syntax (config/selectors.py)
    "title_val": "p.bolder:-soup-contains('Title:') + p",
    "lang_val": "p.bolder:-soup-contains('Lang:') + p",
    "country_val": "div#locations > div > h3",
    "decision_val": "h4:-soup-contains('Decision') + table",
}


def q_html_selector_fields(spark, sf_dir):
    """CSS-selector field projection through the full selector grammar
    (``+`` adjacent sibling, ``>`` child, ``:-soup-contains``) — one DOM
    build per document for all four fields."""
    ensure_package_on_executors(spark)
    d = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<div id="header"><p class="bolder">Title:</p><p>'),
        F.substring(F.col("text"), 1, 40),
        F.lit('</p><p class="bolder">Lang:</p><p>'),
        F.col("lang"),
        F.lit('</p></div><div id="locations"><div><h3>'),
        F.upper(F.col("lang")),
        F.lit("</h3></div><h4>Decision</h4><table><tr><td>"),
        F.col("source"),
        F.lit("</td></tr></table></div>"),
    )
    fields = HX.make_fields_extractor(_FIELD_SELECTORS)
    return (
        d.select("doc_id", fields(_b(html)).alias("f"))
        .select("doc_id", "f.*")
        .orderBy("doc_id")
    )


SQL_HTML_SELECTOR_FIELDS = r"""
SELECT doc_id,
       trim(regexp_replace(substring(text, 1, 40), '\s+', ' ', 'g')) AS title_val,
       lang AS lang_val,
       upper(lang) AS country_val,
       source AS decision_val
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------------ F17

def q_html_table_records(spark, sf_dir):
    """<table> -> records: header row from <th>, each <tr> of matching
    arity becomes one record (ragged header row itself is skipped), then
    explode to relational rows."""
    ensure_package_on_executors(spark)
    d = _docs(spark, sf_dir)
    html = F.concat(
        F.lit("<table><tr><th>Key</th><th>Value</th></tr>"),
        F.lit("<tr><td>lang</td><td>"),
        F.col("lang"),
        F.lit("</td></tr><tr><td>chars</td><td>"),
        F.col("n_chars").cast("string"),
        F.lit("</td></tr></table>"),
    )
    recs = d.select(
        "doc_id", HX.extract_table_udf(_b(html)).alias("recs")
    )
    exploded = recs.select(
        "doc_id", F.posexplode("recs").alias("row_idx", "rec")
    )
    return exploded.select(
        "doc_id",
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("rec")["Key"].alias("k"),
        F.col("rec")["Value"].alias("v"),
    ).orderBy("doc_id", "row_idx")


SQL_HTML_TABLE_RECORDS = """
SELECT doc_id, CAST(0 AS BIGINT) AS row_idx, 'lang' AS k, lang AS v
FROM documents
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT), 'chars', CAST(n_chars AS VARCHAR)
FROM documents
ORDER BY doc_id, row_idx
"""


# ------------------------------------------------------------------ F18

def q_html_list_items(spark, sf_dir):
    """<ul> -> item array (first two whitespace tokens of the text),
    exploded with position."""
    ensure_package_on_executors(spark)
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    html = F.concat(
        F.lit("<ul><li>"),
        F.element_at(toks, 1),
        F.lit("</li><li>"),
        F.element_at(toks, 2),
        F.lit("</li></ul>"),
    )
    items = d.select(
        "doc_id", HX.extract_list_udf(_b(html)).alias("items")
    )
    return items.select(
        "doc_id", F.posexplode("items").alias("pos", "item")
    ).withColumn("pos", F.col("pos").cast("long")).orderBy("doc_id", "pos")


SQL_HTML_LIST_ITEMS = """
SELECT doc_id, CAST(0 AS BIGINT) AS pos, split_part(text, ' ', 1) AS item
FROM documents
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT), split_part(text, ' ', 2)
FROM documents
ORDER BY doc_id, pos
"""


# -------------------------------------------------------------- F19/P3

def q_html_label_values(spark, sf_dir):
    """p.bolder label -> next <p> value map; ':' suffix stripped from
    labels (the reference's dominant field-extraction idiom)."""
    ensure_package_on_executors(spark)
    d = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<div><p class="bolder">Lang:</p><p>'),
        F.col("lang"),
        F.lit('</p><p class="bolder">Source:</p><p>'),
        F.col("source"),
        F.lit("</p></div>"),
    )
    m = HX.extract_label_values_udf(_b(html))
    return d.select(
        "doc_id",
        m["Lang"].alias("lang_value"),
        m["Source"].alias("source_value"),
    ).orderBy("doc_id")


SQL_HTML_LABEL_VALUES = """
SELECT doc_id, lang AS lang_value, source AS source_value
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------- composed document

_DOC_SPEC = {
    # flat fields resolved in one walk; nested section with scoping;
    # keys sorted in the JSON so the byte format is deterministic
    "euct": "p.bolder:-soup-contains('EUCT number:') + p",
    "phase": "p.bolder:-soup-contains('Trial Phase:') + p",
    "info": {
        "__scope__": "div#trial_information",
        "condition": "p.bolder:-soup-contains('Medical condition') + p",
    },
}


def q_html_document_assembly(spark, sf_dir):
    """Composed nested-document extraction (the reference's main
    program shape, main.py:225-243) with a hash-checked oracle: the
    assembled document is emitted as compact sorted-key JSON, which is
    byte-identical to DuckDB's to_json over the same construction."""
    ensure_package_on_executors(spark)
    from clinical_trials_etl_spark.functions import document_extract as DX

    d = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<div><p class="bolder">EUCT number:</p><p>EUCT-'),
        F.col("doc_id").cast("string"),
        F.lit('</p><p class="bolder">Trial Phase:</p><p>Phase '),
        F.upper(F.col("lang")),
        F.lit('</p><div id="trial_information">'),
        F.lit('<p class="bolder">Medical condition:</p><p>'),
        F.col("source"),
        F.lit("</p></div></div>"),
    )
    udf = DX.make_document_extractor(_DOC_SPEC, compact=True)
    return d.select("doc_id", udf(_b(html)).alias("doc")).orderBy("doc_id")


SQL_HTML_DOCUMENT_ASSEMBLY = """
SELECT doc_id,
       to_json(struct_pack(
         euct := 'EUCT-' || CAST(doc_id AS VARCHAR),
         info := struct_pack(condition := source),
         phase := 'Phase ' || upper(lang)
       )) AS doc
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------- adversarial corpus

def q_html_adversarial_text(spark, sf_dir):
    """extract_text over generator-declared ADVERSARIAL pages — the
    driver-oracled certification of the fast-path risk guard
    (html_extract.py::_RISKY_RE) and both non-fast code paths, which
    the other html_* queries (well-formed concat-built pages) never
    exercise (VERDICT.md round-3 item 2).

    Three deterministic page variants by doc_id % 3:
      0: parser path — bare '<' as data, <script>/<style> raw-text
         contents, quoted-'>' attribute, comment, entities, and an
         unterminated comment at EOF;
      1: fast path — well-formed tags + entities + comment (guard must
         pass it);
      2: degradation path — malformed marked section '<![ x' crashes
         CPython's HTMLParser, so the kernel must fall back to the
         regex strip (one bad page degrades, never kills the batch).
    The oracle declares each variant's exact expected text with plain
    SQL string expressions (HTMLParser text-walk semantics worked out
    by hand; pinned independently in tests/test_fast_extract.py)."""
    ensure_package_on_executors(spark)
    d = _docs(spark, sf_dir)
    t = F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 8)
    v = F.pmod(F.col("doc_id"), F.lit(3))
    html = (
        F.when(
            v == 0,
            F.concat(
                F.lit("<html><body><p>a < b and 1< "), t, F.lit("</p>"),
                F.lit("<script>var x = '<b>"), t, F.lit("</b>';</script>"),
                F.lit("<style>p > s { color: red }</style>"),
                F.lit('<a title="x>y">'), t, F.lit("-link</a>"),
                F.lit("<!-- hidden "), t, F.lit(" -->"),
                F.lit("<p>&amp; "), t, F.lit(" &lt;tag&gt;</p>"),
                F.lit("tail <!-- unterminated "), t,
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("<html><head><title>T "), t,
                F.lit("</title></head><body><p>"), t,
                F.lit(" &amp; co</p><!-- c --><div><span>x "), t,
                F.lit("</span></div></body></html>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<html><body><![ "), t, F.lit("<p>after "), t,
                F.lit("</p>&amp; done</body></html>"),
            )
        )
    )
    return d.select(
        "doc_id",
        v.alias("variant"),
        HX.extract_text_udf(_b(html)).alias("text_out"),
    ).orderBy("doc_id")


SQL_HTML_ADVERSARIAL_TEXT = r"""
SELECT doc_id,
       doc_id % 3 AS variant,
       CASE doc_id % 3
         WHEN 0 THEN 'a < b and 1< ' || t || 'var x = ''<b>' || t
                  || '</b>'';p > s { color: red }' || t || '-link& '
                  || t || ' <tag>tail <!-- unterminated ' || t
         WHEN 1 THEN 'T ' || t || t || ' & cox ' || t
         ELSE 'after ' || t || '& done'
       END AS text_out
FROM (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS t
      FROM documents)
ORDER BY doc_id
"""


QUERIES = {
    "html_extract_text": (q_html_extract_text, SQL_HTML_EXTRACT_TEXT),
    "html_adversarial_text": (
        q_html_adversarial_text,
        SQL_HTML_ADVERSARIAL_TEXT,
    ),
    "html_document_assembly": (
        q_html_document_assembly,
        SQL_HTML_DOCUMENT_ASSEMBLY,
    ),
    "html_selector_fields": (q_html_selector_fields, SQL_HTML_SELECTOR_FIELDS),
    "html_table_records": (q_html_table_records, SQL_HTML_TABLE_RECORDS),
    "html_list_items": (q_html_list_items, SQL_HTML_LIST_ITEMS),
    "html_label_values": (q_html_label_values, SQL_HTML_LABEL_VALUES),
}
