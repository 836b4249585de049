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


# --------------------------------------------------------------------------
# Reference-selector goldens: real selector strings lifted verbatim from
# trials_extractor/config/selectors.py:8-194, run against a CTIS-shaped
# fixture document. Expectations are hand-computed under strict CSS
# semantics (what soupsieve resolves): `A + B` = B is the element sibling
# immediately after A.

CTIS_FIXTURE = """
<html><body>
<div class='header'>
  <p class='bolder'>Title:</p><p>A Study of Example vs Placebo</p>
  <p class='bolder'>EUCT number:</p><p>2024-510001-34-00</p>
  <p class='bolder'>Protocol code:</p><p>EX-2024-01</p>
</div>
<div id='summary'>
  <div id='trial_information'>
    <p class='bolder'>Medical condition:</p><p>Severe asthma</p>
    <p class='bolder'>Trial Phase:</p><p>Phase III</p>
    <p class='bolder'>Sponsor:</p><p>Acme Pharma</p>
    <p class='bolder'>Age range:</p><p>18-64</p>
    <p class='bolder'>Locations:</p><p>France, Germany</p>
  </div>
  <div id='overall_trial_status'>
    <p class='bolder'>Overall trial status:</p><p>Ongoing</p>
    <p class='bolder'>Start of Trial:</p><p>2024-03-01</p>
  </div>
  <div id='applications'>
    <h3>IN preparation</h3>
    <p class='bolder'>Application type:</p><p>Initial</p>
    <h4>Assessment Part I</h4>
    <p class='bolder'>Reference Member State:</p><p>France</p>
    <h4>Assessment Part II</h4>
    <table><tr><th>MS</th><th>Conclusion</th></tr>
           <tr><td>FR</td><td>Acceptable</td></tr></table>
    <h4>Decision</h4>
    <table><tr><th>MS</th><th>Decision</th></tr>
           <tr><td>FR</td><td>Authorised</td></tr></table>
  </div>
</div>
<div id='locations'>
  <div><h3>France</h3><p class='bolder'>Planned number of subjects:</p><p>120</p></div>
  <div><h3>Germany</h3><p class='bolder'>Planned number of subjects:</p><p>80</p></div>
  <h2 id='sponsors'>Sponsors</h2>
  <h4>Scientific contact point</h4>
  <p class='bolder'>Name of organisation:</p><p>Acme Pharma SA</p>
  <p class='bolder'>Phone:</p><p>+33 1 42 00 00 00</p>
  <h4>Public contact point</h4>
  <p class='bolder'>Name of organisation:</p><p>Acme Public Desk</p>
</div>
</body></html>
"""

# (selector string verbatim from config/selectors.py, expected select_one
# text under strict CSS — None = no match, the extractor's '' default)
REFERENCE_SELECTOR_GOLDENS = [
    # HEADER_SELECTORS (selectors.py:8-12)
    ("p.bolder:-soup-contains('Title:') + p", "A Study of Example vs Placebo"),
    ("p.bolder:-soup-contains('EUCT number:') + p", "2024-510001-34-00"),
    ("p.bolder:-soup-contains('Protocol code:') + p", "EX-2024-01"),
    # SUMMARY_SELECTORS.trial_information (selectors.py:17-27)
    ("div#trial_information", "ANY"),
    ("p.bolder:-soup-contains('Medical condition') + p", "Severe asthma"),
    ("p.bolder:-soup-contains('Trial Phase:') + p", "Phase III"),
    ("p.bolder:-soup-contains('Age range:') + p", "18-64"),
    # overall_trial_status (selectors.py:28-35)
    ("p.bolder:-soup-contains('Overall trial status:') + p", "Ongoing"),
    # applications (selectors.py:58-77) — the `h4 + table` family (94 uses)
    ("h4:-soup-contains('Assessment Part II') + table", "ANY"),
    ("h4:-soup-contains('Decision') + table", "ANY"),
    ("div#applications h3", "IN preparation"),
    # LOCATIONS_SELECTORS (selectors.py:150-168) — the `>` child chain
    ("div#locations > div > h3", "France"),
    ("p.bolder:-soup-contains('Planned number of subjects:') + p", "120"),
    ("h2#sponsors", "Sponsors"),
    # scientific_contact chained `+` (selectors.py:182-185): the first
    # p.bolder IS adjacent to the h4 -> matches; 'Phone:' is NOT adjacent
    # -> no match, exactly as soupsieve resolves it on the real documents.
    (
        "h4:-soup-contains('Scientific contact point') "
        "+ p.bolder:-soup-contains('Name of organisation:') + p",
        "Acme Pharma SA",
    ),
    (
        "h4:-soup-contains('Scientific contact point') "
        "+ p.bolder:-soup-contains('Phone:') + p",
        None,
    ),
    (
        "h4:-soup-contains('Public contact point') "
        "+ p.bolder:-soup-contains('Name of organisation:') + p",
        "Acme Public Desk",
    ),
]


@pytest.mark.parametrize("selector,expected", REFERENCE_SELECTOR_GOLDENS)
def test_reference_selector_goldens(selector, expected):
    root = htmldom.parse(CTIS_FIXTURE)
    node = htmldom.select_one(root, selector)
    if expected is None:
        assert node is None, f"{selector!r} must not match (strict CSS +)"
    elif expected == "ANY":
        assert node is not None
    else:
        assert node is not None, f"{selector!r} found nothing"
        assert HX.clean_text_py(node.text.strip()) == expected


def test_child_combinator_excludes_deeper_descendants():
    root = htmldom.parse(
        "<div id='a'><p>direct</p><section><p>deep</p></section></div>"
    )
    assert [n.text for n in htmldom.select(root, "div#a > p")] == ["direct"]
    assert [n.text for n in htmldom.select(root, "div#a p")] == [
        "direct",
        "deep",
    ]


def test_adjacent_sibling_strictness():
    root = htmldom.parse(
        "<div><h4>L</h4><span>gap</span><p>after-gap</p><h4>M</h4><p>adj</p></div>"
    )
    # text nodes / whitespace between siblings do not break adjacency
    root2 = htmldom.parse("<div><h4>M</h4>\n  <p>adj</p></div>")
    assert htmldom.select_one(root, "h4:-soup-contains('L') + p") is None
    assert htmldom.select_one(root, "h4:-soup-contains('M') + p").text == "adj"
    assert htmldom.select_one(root2, "h4 + p").text == "adj"


def test_general_sibling_combinator():
    root = htmldom.parse("<div><h3>t</h3><p>1</p><span>s</span><p>2</p></div>")
    assert [n.text for n in htmldom.select(root, "h3 ~ p")] == ["1", "2"]


def test_soup_contains_alias_and_document_order():
    root = htmldom.parse("<div><p>alpha beta</p><p>beta</p></div>")
    a = htmldom.select(root, "p:-soup-contains('beta')")
    b = htmldom.select(root, "p:contains('beta')")
    assert [n.text for n in a] == ["alpha beta", "beta"]
    assert [n.text for n in a] == [n.text for n in b]
    # alternation output is document order, not branch order
    root2 = htmldom.parse("<div><ol><li>a</li></ol><ul><li>b</li></ul></div>")
    assert [n.tag for n in htmldom.select(root2, "ul, ol")] == ["ol", "ul"]


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


def test_select_first_many_equals_per_selector_select_one():
    """The single-walk multi-selector evaluator must return exactly
    what select_one returns per entry, across every reference selector
    golden (including the strict-CSS non-matches)."""
    root = htmldom.parse(CTIS_FIXTURE)
    table = {
        f"s{i}": sel for i, (sel, _exp) in enumerate(REFERENCE_SELECTOR_GOLDENS)
    }
    combined = htmldom.select_first_many(root, table)
    for name, sel in table.items():
        assert combined[name] is htmldom.select_one(root, sel), sel


def test_select_first_many_walks_once_fast():
    """Traversal sanity: evaluating the whole table in one walk must
    not be slower than per-selector walks (it should be much faster on
    wide tables; asserted loosely to stay robust under host noise)."""
    import time

    root = htmldom.parse(CTIS_FIXTURE * 3)
    table = {
        f"s{i}": sel for i, (sel, _exp) in enumerate(REFERENCE_SELECTOR_GOLDENS)
    }
    t0 = time.perf_counter()
    for _ in range(30):
        htmldom.select_first_many(root, table)
    one_walk = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(30):
        for sel in table.values():
            htmldom.select_one(root, sel)
    per_sel = time.perf_counter() - t0
    assert one_walk < per_sel * 1.2


def test_scoped_select_uses_document_context():
    """soupsieve semantics: only the subject must live inside the scope;
    earlier compounds may bind to the scope element itself or above it.
    The reference relies on this — section extractors apply selectors
    that name their own section container (e.g. LOCATIONS_SELECTORS
    'div#locations > div > h3' evaluated inside div#locations)."""
    root = htmldom.parse(
        "<div id='locations'><div><h3>France</h3></div>"
        "<div><h3>Germany</h3></div></div>"
    )
    section = htmldom.select_one(root, "div#locations")
    got = [n.text for n in htmldom.select(section, "div#locations > div > h3")]
    assert got == ["France", "Germany"]
    # but the subject itself must be BELOW the scope: the scope node
    # never matches its own selector
    assert htmldom.select(section, "div#locations") == []
