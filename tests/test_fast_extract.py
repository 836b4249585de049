"""The extract_text fast path must be byte-identical to the parser walk.

`_extract_text_one` routes documents through a regex fast path unless a
risk guard flags constructs where tag-stripping could diverge from the
HTMLParser semantics the goldens pin (html_utils.py:109-122 analog).
These tests attack the guard: every document where the guard says
"fast" must produce EXACTLY the parser's output, and the known-risky
constructs must either be flagged or still agree.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from clinical_trials_etl_spark.functions.html_extract import (
    _COMMENT_OR_TAG_RE,
    _decode,
    _extract_text_one,
    _extract_text_parser,
    _fast_eligible as _guard_says_fast,
    clean_text_py,
)
import html as _htmlmod


def _fast(s: str) -> str:
    return clean_text_py(_htmlmod.unescape(_COMMENT_OR_TAG_RE.sub("", s)).strip())


ADVERSARIAL = [
    # '<' as data (digit / space / '=' after it)
    "a < b and 1<2 done",
    "price <3 <= <4>",
    # quoted '>' inside attributes, both quote kinds
    '<a title="x>y">T</a>',
    "<a title='x>y'>T</a>",
    '<a alt="1" title="x>y" href="z">T</a>',
    "</a title='x>y'>tail",
    # raw-text elements: contents are data, inner tags NOT parsed
    "<script>var a = '<b>not bold</b>';</script>after",
    "<style>p > span { color: red }</style>after",
    "<SCRIPT>1 < 2</SCRIPT>x",
    # declarations / CDATA / doctype variants
    "<!DOCTYPE html><p>x</p>",
    "<!doctype html><p>x</p>",
    "<![CDATA[ <p>raw</p> ]]><i>y</i>",
    "<!ENTITY foo 'bar'><p>x</p>",
    # comments, incl. tag-like content and unterminated
    "a<!-- <p>hidden</p> -->b",
    "a<!-- unterminated",
    "a<!-- x --><!-- y -->b",
    # entities split across a removed tag (cross-tag merge hazard)
    "&am<b></b>p; literal",
    "&#6<i></i>0; literal",
    "x&amp<span></span>; y",
    # entities plain (fast-eligible)
    "A &amp; B &lt;tag&gt; &#65; &nbsp;done",
    # processing instructions
    "<?php echo '>' ?>tail",
    "<?xml version='1.0'?><p>x</p>",
    # malformed / unterminated tags at EOF
    "text <a href=",
    "text <a",
    "bare > gt",
    "<a b > c>",
    # empty / trivial
    "",
    "no tags at all",
    "<p></p>",
]


def test_adversarial_corpus_identical():
    for s in ADVERSARIAL:
        expect = _extract_text_parser(s)
        got = _extract_text_one(s.encode())
        assert got == expect, (s, got, expect)


def test_malformed_marked_sections_degrade_not_crash():
    # CPython's HTMLParser (_markupbase) raises AssertionError on
    # these; the guard routes them to the parser, so the wrapper must
    # catch and degrade to the regex strip instead of killing the
    # Spark task (one bad page must not fail a whole CDC batch)
    for s in ["<![ x", "<![>", "a<![ b>c", "<![\x00]>tail", "x<![y"]:
        raised = False
        try:
            _extract_text_parser(s)
        except Exception:
            raised = True
        got = _extract_text_one(s.encode())  # must not raise
        if raised:
            assert got == _fast(s), s
        else:
            assert got == _extract_text_parser(s), s


def test_guard_flags_each_divergent_construct():
    # each of these WOULD diverge under the fast path; the guard must
    # route every one to the parser
    must_flag = [
        "a < b",
        '<a title="x>y">T</a>',
        "<a title='x>y'>T</a>",
        "<script>var a = '<b>x</b>';</script>",
        "<style>p > s {}</style>",
        "<![CDATA[ <p>raw</p> ]]>",
        "&am<b></b>p;",
        "a<!-- unterminated",
    ]
    for s in must_flag:
        assert not _guard_says_fast(s), s


def test_representative_page_takes_fast_path():
    page = (
        "<html><head><title>T</title></head><body>"
        "<div id='summary'><p class='bolder'>Url:</p><p>u</p></div>"
        + "<div class=\"b\"><span>tok &amp;x</span></div>" * 40
        + "<!-- c --></body></html>"
    )
    assert _guard_says_fast(page)
    assert _extract_text_one(page.encode()) == _extract_text_parser(page)


_HTMLISH = st.lists(
    st.one_of(
        st.text(alphabet="abcXYZ 012<>/=\"'&;!#-?\n\t", max_size=8),
        st.sampled_from(
            ["<p>", "</p>", "<div ", "<!--", "-->", "&amp;", "&lt;",
             "&#65;", "<script>", "</script>", "<a href=",
             "<!DOCTYPE html>", "<?pi?>"]
        ),
    ),
    max_size=12,
).map("".join)


@settings(max_examples=400, deadline=None)
@given(_HTMLISH)
def test_property_fast_path_matches_parser(s):
    # the invariant under test: whenever the guard allows the fast
    # path, its output is byte-identical to the parser walk
    if _guard_says_fast(s):
        assert _fast(s) == _extract_text_parser(s)
    # and the dispatching wrapper always equals the parser on guarded
    # docs by construction — total behavior equals parser everywhere,
    # except where the parser itself crashes (malformed marked
    # sections), where the wrapper must degrade to the regex strip
    try:
        expect = (
            _fast(s) if _guard_says_fast(s) else _extract_text_parser(s)
        )
    except Exception:
        expect = _fast(s)
    assert _extract_text_one(s.encode()) == expect


def test_decode_passthrough_unchanged():
    assert _decode(None) == ""
    assert _decode(b"\xff<p>x</p>") == "�<p>x</p>"
