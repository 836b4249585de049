"""Full-grammar stress test (VERDICT r2 item 5): every selector
expression the reference ships — all string values in
trials_extractor/config/selectors.py:8-194 — must compile and run
through htmldom.select without error. The labeled match/no-match
subset lives in test_html_golden.py::REFERENCE_SELECTOR_GOLDENS; this
test guarantees there is no selector in the reference's entire config
that our grammar cannot parse (compile + evaluate on a CTIS-shaped
fixture), and pins the distinct syntax shapes the config uses."""

from __future__ import annotations

import ast
import os
import re

import pytest

from clinical_trials_etl_spark.functions import htmldom
from tests.test_html_golden import CTIS_FIXTURE

_REF_SELECTORS = "/root/reference/trials_extractor/config/selectors.py"


def _collect_selectors() -> list[str]:
    """All string dict-values in the reference config (pure-data file;
    parsed with ast, never imported/executed)."""
    with open(_REF_SELECTORS, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    out: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            for v in node.values:
                if isinstance(v, ast.Constant) and isinstance(v.value, str):
                    out.append(v.value)
    return out


SELECTORS = _collect_selectors()


def test_reference_config_is_fully_collected():
    # the config holds ~143 selector strings across its nested dicts;
    # a collapse here means the reference file moved or the walker broke
    assert len(SELECTORS) > 100
    assert len(set(SELECTORS)) > 60


@pytest.mark.parametrize(
    "selector", sorted(set(SELECTORS)), ids=lambda s: s[:60]
)
def test_every_reference_selector_parses_and_runs(selector):
    root = htmldom.parse(CTIS_FIXTURE)
    nodes = htmldom.select(root, selector)  # must not raise
    assert isinstance(nodes, list)
    # select_one agrees with select on emptiness/head
    one = htmldom.select_one(root, selector)
    if nodes:
        assert one is nodes[0]
    else:
        assert one is None


def test_config_syntax_shapes_are_covered():
    """Each distinct syntax feature present in the config must appear
    in the collected set (so a grammar regression can't hide behind a
    feature that silently vanished from the sample)."""
    shapes = {
        "soup_contains": lambda s: ":-soup-contains(" in s,
        "adjacent_sibling": lambda s: " + " in s,
        "chained_adjacent": lambda s: s.count(" + ") >= 2,
        "child_combinator": lambda s: " > " in s,
        "descendant": lambda s: re.search(r"\w (?![+>])\w", s) is not None,
        "id_selector": lambda s: "#" in s,
        "class_selector": lambda s: re.search(r"\w\.\w", s) is not None,
        "bare_tag": lambda s: re.fullmatch(r"[a-z][a-z0-9]*", s) is not None,
    }
    for name, pred in shapes.items():
        assert any(pred(s) for s in SELECTORS), f"shape {name} vanished"


@pytest.mark.skipif(
    not os.path.exists(_REF_SELECTORS), reason="reference not mounted"
)
def test_reference_file_still_present():
    assert os.path.getsize(_REF_SELECTORS) > 0
