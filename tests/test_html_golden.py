"""Byte-identity gate for the HTML extraction kernel (FIXTURES.md §4).

Each fixture pairs raw HTML with the expected extracted text under the
reference chain semantics (extract_text html_utils.py:109-122 +
clean_text cleaner.py:10-35), hand-computed per the documented parsing
semantics in functions/htmldom.py. Assertions are exact string
equality — byte identity per url.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinical_trials_etl_spark.functions import html_extract as HX
from clinical_trials_etl_spark.functions import htmldom

GOLDEN = [
    ("simple", "<html><body><p>Hello world</p></body></html>", "Hello world"),
    (
        "unicode_punct",
        "<p>foo bar ’baz’ – ok “q”</p>",
        "foo bar 'baz' - ok \"q\"",
    ),
    ("multi_ws", "<div>  a\n\t b  </div>", "a b"),
    ("nested", "<div><span>a</span><b>b</b> c</div>", "ab c"),
    (
        "table_concat",
        "<table><thead><tr><th>H1</th><th>H2</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td></tr></tbody></table>",
        "H1H212",
    ),
    (
        "entities",
        "<p>a &amp; b &lt;c&gt; &quot;d&quot; &#8217;e</p>",
        "a & b <c> \"d\" 'e",
    ),
    ("comment_excluded", "<div>a<!-- hidden -->b</div>", "ab"),
    ("script_included", "<div>a<script>var x=1;</script>b</div>", "avar x=1;b"),
    ("empty", "<div></div>", ""),
    ("unclosed_p", "<div><p>one<p>two</div>", "onetwo"),
    ("void_elements", "<p>a<br>b<img src=x>c</p>", "abc"),
    ("list_concat", "<ul><li>x</li><li>y</li></ul>", "xy"),
    ("stray_end_tag", "<div>a</span>b</div>", "ab"),
    (
        "mixed_page",
        "<html><head><title>T</title></head><body>"
        "<div id='summary'><p class='bolder'>Status:</p><p>Active</p></div>"
        "</body></html>",
        "TStatus:Active",
    ),
]


@pytest.mark.parametrize("name,html,expected", GOLDEN)
def test_pure_python_kernel(name, html, expected):
    assert HX._extract_text_one(html.encode()) == expected


def _html_df(spark, pairs):
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("html", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(
        [(name, html.encode()) for name, html, _ in pairs], schema
    )


def test_arrow_udf_byte_identity(spark):
    """The Arrow path must equal the pure-Python chain byte-for-byte
    per url — the BASELINE.json invariant."""
    df = _html_df(spark, GOLDEN)
    got = {
        r["url"]: r["text"]
        for r in df.select(
            "url", HX.extract_text_udf("html").alias("text")
        ).collect()
    }
    for name, _html, expected in GOLDEN:
        assert got[name] == expected, f"{name}: {got[name]!r} != {expected!r}"


def test_selector_field_extraction(spark):
    cases = [
        ("hit", "<div id='summary'><p class='value'>V</p></div>"),
        ("miss", "<div id='other'><p>nope</p></div>"),
    ]
    df = _html_df(spark, [(n, h, None) for n, h in cases])
    udf = HX.make_field_extractor("#summary p.value")
    got = {r["url"]: r["f"] for r in df.select("url", udf("html").alias("f")).collect()}
    assert got["hit"] == "V"
    assert got["miss"] == ""  # reference default, extractors/base.py:88-101


def test_contains_pseudo_selector():
    root = htmldom.parse("<div><p>alpha</p><p>beta gamma</p></div>")
    node = htmldom.select_one(root, "p:contains('beta')")
    assert node is not None and node.text == "beta gamma"
    assert htmldom.select_one(root, "p:contains('zzz')") is None


def test_table_extraction_ragged_rows(spark):
    html = (
        "<table><thead><tr><th>A</th><th>B</th></tr></thead><tbody>"
        "<tr><td>1</td><td>2</td></tr>"
        "<tr><td>only-one</td></tr>"  # ragged: skipped (html_utils.py:159-162)
        "<tr><td>3</td><td>4</td></tr>"
        "</tbody></table>"
    )
    df = _html_df(spark, [("t", html, None)])
    rows = df.select(HX.extract_table_udf("html").alias("rows")).collect()[0]["rows"]
    assert rows == [{"A": "1", "B": "2"}, {"A": "3", "B": "4"}]


def test_list_extraction(spark):
    df = _html_df(spark, [("l", "<ol><li> x </li><li>y</li></ol>", None)])
    items = df.select(HX.extract_list_udf("html").alias("xs")).collect()[0]["xs"]
    assert items == ["x", "y"]


def test_label_value_extraction(spark):
    html = (
        "<div><p class='bolder'>Name:</p><p>Alice</p>"
        "<p class='bolder'>Age:</p><p>42</p></div>"
    )
    df = _html_df(spark, [("lv", html, None)])
    m = df.select(HX.extract_label_values_udf("html").alias("m")).collect()[0]["m"]
    assert m == {"Name": "Alice", "Age": "42"}


def test_multi_field_single_parse(spark):
    html = (
        "<div id='header'><span class='key'>K1</span></div>"
        "<div id='summary'><span class='key'>K2</span></div>"
    )
    df = _html_df(spark, [("mf", html, None)])
    udf = HX.make_fields_extractor(
        {"h": "#header .key", "s": "#summary .key", "missing": "#nope .key"}
    )
    row = df.select(udf("html").alias("f")).select("f.*").collect()[0]
    assert (row["h"], row["s"], row["missing"]) == ("K1", "K2", "")
