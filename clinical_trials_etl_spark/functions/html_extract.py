"""Arrow-vectorized HTML extraction kernels (the P1-P3/F1-F2/F17-F19
surface of SURVEY.md §2, re-expressed as pandas UDFs over a ``binary``
html column — zero per-row Python at the plan level, per BASELINE.json
input_hint).

Reference semantics reproduced:
- ``extract_text``: whole-document text, ``.strip()``-ed
  (trials_extractor/utils/html_utils.py:109-122).
- ``clean_text``: \\s+ collapse -> strip -> fixed unicode replacements
  (trials_extractor/processors/cleaner.py:10-35). The composition
  ``clean_text(extract_text(html))`` is the byte-identity invariant
  checked per url by tests/test_html_golden.py.
- selector field extraction with '' default
  (trials_extractor/extractors/base.py:88-101).
- table -> records, skipping ragged rows (html_utils.py:124-164).
- <ul>/<ol> -> list of strings (html_utils.py:166-179).
- label/value pairs from p.bolder labels, ':' suffix stripped
  (html_utils.py:181-210).
"""

from __future__ import annotations

import html as _htmlmod
import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinical_trials_etl_spark.functions import htmldom

_WS_RE = re.compile(r"\s+")

# same replacement set as functions/normalize.py::_CLEAN_REPLACEMENTS
_REPLACEMENTS = [
    (" ", " "),
    ("’", "'"),
    ("–", "-"),
    ("—", "-"),
    ("“", '"'),
    ("”", '"'),
]


def clean_text_py(text: str) -> str:
    """Reference clean_text semantics, byte-for-byte (cleaner.py:10-35).
    Note \\s is unicode-aware in Python, so U+00A0 is already collapsed
    by the first step — the explicit replacement mirrors the reference's
    (redundant but harmless) second pass."""
    if not text:
        return text
    out = _WS_RE.sub(" ", text).strip()
    for src, dst in _REPLACEMENTS:
        out = out.replace(src, dst)
    return out


def _decode(payload) -> str:
    if payload is None:
        return ""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        return bytes(payload).decode("utf-8", errors="replace")
    return str(payload)


class _TextCollector(HTMLParser):
    """Streaming text-node collector for whole-document extraction.

    ``extract_text`` only needs the concatenation of text nodes in
    document order — which is independent of tree shape — so the DOM
    build in htmldom is unnecessary work on the CDC hot path. The
    collector matches htmldom's text semantics exactly (entities
    decoded per text node, comments/doctype/PI contribute nothing,
    script/style contents contribute) at ~1.5x the throughput; the
    selector kernels below still build the DOM."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []

    def handle_data(self, data: str) -> None:
        self.parts.append(data)


def _extract_text_parser(s: str) -> str:
    collector = _TextCollector()
    collector.feed(s)
    collector.close()
    return clean_text_py("".join(collector.parts).strip())


# Fast-path risk detector. The regex fast path (strip comments + tags,
# then one unescape pass) is byte-identical to the HTMLParser walk
# EXCEPT on the constructs below, so any hit routes the document to the
# parser. Hits are conservative (a flagged doc is merely slower, never
# wrong); each alternative names the divergence it fences off:
#   <(?![a-zA-Z/!?])   '<' not opening markup — HTMLParser keeps it as
#                      text, tag-stripping would eat through it
#   <script/<style     raw-text elements: parser treats contents as
#                      data (tags inside NOT parsed), stripping would
#                      remove tag-like text inside them
#   <!(?!--|DOCTYPE)   declarations/CDATA other than comments and a
#                      plain doctype (parser has bespoke handling)
#   <!DOCTYPE...[      doctype with internal subset (']>' nesting)
#   ="...>" / ='...>'  quoted attribute value containing '>' — the
#                      first-'>' cut would split the tag
#   &xxx<              entity-like run abutting a tag: parser decodes
#                      per text node, post-strip decoding would merge
#                      fragments across the removed tag
_RISKY_RE = re.compile(
    r"<(?![a-zA-Z/!?])"
    r"|<[sS][cC][rR][iI][pP][tT]"
    r"|<[sS][tT][yY][lL][eE]"
    r"|<!(?!--|[dD][oO][cC][tT][yY][pP][eE][^>\[]*>)"
    r"|=\s*\"[^\"]*>"
    r"|=\s*'[^']*>"
    r"|&[a-zA-Z0-9#]*<"
)

_COMMENT_OR_TAG_RE = re.compile(r"<!--.*?-->|<[^>]*>", re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)


def _fast_eligible(s: str) -> bool:
    if _RISKY_RE.search(s) is not None:
        return False
    # a '<!--' with no closing '-->' AFTER it (unterminated, or only a
    # stray earlier '-->') parses as data/EOF-flush in HTMLParser but
    # would be eaten as a tag by the strip regex — route to the parser
    return "<!--" not in s or "<!--" not in _COMMENT_RE.sub("", s)


def _extract_text_one(payload) -> str:
    """binary html -> cleaned text; regex fast path with a guarded
    fallback to the HTMLParser walk (identical output either way —
    pinned by tests/test_fast_extract.py property + corpus tests).

    The fast path is ~10x the parser on tag-dense pages and carries
    the CDC hot loop; the guard is a few C-level scans of the page."""
    s = _decode(payload)
    if _fast_eligible(s):
        return clean_text_py(
            _htmlmod.unescape(_COMMENT_OR_TAG_RE.sub("", s)).strip()
        )
    try:
        return _extract_text_parser(s)
    except Exception:
        # CPython's HTMLParser raises AssertionError from _markupbase
        # ("expected name token") on malformed marked sections such as
        # '<![ x' or '<![>' — exactly the docs the risk guard routes
        # here. One bad page must degrade (regex strip), not kill the
        # whole CDC batch; pinned by tests/test_fast_extract.py.
        return clean_text_py(
            _htmlmod.unescape(_COMMENT_OR_TAG_RE.sub("", s)).strip()
        )


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary html -> cleaned whole-document text (F1+F2)."""
    return html.map(_extract_text_one)


@F.pandas_udf(T.StringType())
def fill_text_udf(
    html: pd.Series, text: pd.Series, deleted: pd.Series
) -> pd.Series:
    """Masked fill kernel for the CDC merge: extract html -> text ONLY
    where ``text`` is null and the row is not a tombstone; everything
    else passes through unchanged.

    The mask lives INSIDE the kernel on purpose. Spark evaluates a
    Python UDF unconditionally (ArrowEvalPython) even under CASE WHEN,
    and a split-filter-union around a kernel duplicates its child plan
    (for the merge that meant running the table-sized winner
    aggregation twice). A masked kernel keeps the plan single-branch:
    Arrow transfers every winner row once, but the per-page extraction
    — the actual cost — runs only on the O(batch) rows that need it.
    Gated by tests counting kernel invocations per row class."""
    need = text.isna() & ~deleted.fillna(False).astype(bool)
    if not need.any():
        return text
    out = text.copy()
    out[need] = html[need].map(_extract_text_one)
    return out


def make_field_extractor(selector: str):
    """Pandas UDF extracting one CSS-selected field per document with the
    reference's '' default (P1/P2; extractors/base.py:88-101)."""

    @F.pandas_udf(T.StringType())
    def field_udf(html: pd.Series) -> pd.Series:
        def one(payload):
            root = htmldom.parse(_decode(payload))
            node = htmldom.select_one(root, selector)
            if node is None:
                return ""
            return clean_text_py(node.text.strip())

        return html.map(one)

    return field_udf


def make_fields_extractor(selectors: dict[str, str]):
    """One UDF evaluating a whole selector table (the reference's
    config/selectors.py projection spec) in a single parse per document,
    returning a struct. This is the scale-correct shape: N fields cost
    one DOM build and ONE document walk (htmldom.select_first_many
    indexes branches by subject tag), not N of each — the reference
    evaluates ~213 selectors per page, so both factors matter."""
    names = list(selectors)
    schema = T.StructType([T.StructField(n, T.StringType()) for n in names])

    @F.pandas_udf(schema)
    def fields_udf(html: pd.Series) -> pd.DataFrame:
        rows = []
        for payload in html:
            root = htmldom.parse(_decode(payload))
            found = htmldom.select_first_many(root, selectors)
            rows.append(
                {
                    name: (
                        ""
                        if found[name] is None
                        else clean_text_py(found[name].text.strip())
                    )
                    for name in names
                }
            )
        return pd.DataFrame(rows, columns=names)

    return fields_udf


def table_records(table) -> list[dict]:
    """<table> node -> header-keyed records, ragged rows skipped
    (F17; html_utils.py:124-164). Headers from <thead th>, else the
    first row's <th>."""
    if table is None:
        return []
    headers = [th.text.strip() for th in htmldom.select(table, "thead th")]
    if not headers:
        first_row = htmldom.select_one(table, "tr")
        if first_row is not None:
            headers = [th.text.strip() for th in htmldom.select(first_row, "th")]
    if not headers:
        return []
    body = htmldom.select_one(table, "tbody") or table
    rows = []
    for tr in htmldom.select(body, "tr"):
        cells = [td.text.strip() for td in htmldom.select(tr, "td")]
        if len(cells) == len(headers):
            rows.append(dict(zip(headers, cells)))
    return rows


def list_items(node) -> list[str]:
    """<ul>/<ol> node -> item texts (F18; html_utils.py:166-179)."""
    if node is None:
        return []
    return [li.text.strip() for li in htmldom.select(node, "li")]


def label_values(scope) -> dict[str, str]:
    """p.bolder label -> next <p> value pairs, ':' suffix stripped from
    labels (F19/P3; html_utils.py:181-230)."""
    if scope is None:
        return {}
    result = {}
    for label in htmldom.select(scope, "p.bolder"):
        key = label.text.strip()
        if key.endswith(":"):
            key = key[:-1]
        value_node = label.find_next("p")
        if value_node is not None:
            result[key] = value_node.text.strip()
    return result


_TABLE_SCHEMA = T.ArrayType(
    T.MapType(T.StringType(), T.StringType())
)


@F.pandas_udf(_TABLE_SCHEMA)
def extract_table_udf(html: pd.Series) -> pd.Series:
    """First <table> -> array<map<header,cell>> (see table_records)."""

    def one(payload):
        root = htmldom.parse(_decode(payload))
        return table_records(htmldom.select_one(root, "table"))

    return html.map(one)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_list_udf(html: pd.Series) -> pd.Series:
    """First <ul>/<ol> -> array of item texts (see list_items)."""

    def one(payload):
        root = htmldom.parse(_decode(payload))
        return list_items(htmldom.select_one(root, "ul, ol"))

    return html.map(one)


@F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
def extract_label_values_udf(html: pd.Series) -> pd.Series:
    """p.bolder label -> next <p> value map (see label_values)."""

    def one(payload):
        root = htmldom.parse(_decode(payload))
        return label_values(root)

    return html.map(one)
