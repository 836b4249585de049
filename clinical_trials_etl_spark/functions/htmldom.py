"""Minimal HTML DOM + CSS selector engine (pure stdlib, worker-side).

The container ships no lxml/bs4/selectolax, so the Arrow extraction
kernel builds on ``html.parser`` with an explicit, documented semantic
that mirrors the reference chain (BeautifulSoup-with-lxml ``.text`` →
``clean_text``; reference: trials_extractor/utils/html_utils.py:109-122 +
trials_extractor/processors/cleaner.py:10-35):

- text of a node = concatenation of every descendant text node in
  document order, entities decoded;
- comments, doctypes and processing instructions contribute nothing;
- script/style contents DO contribute (lxml ``text_content`` behavior);
- malformed HTML is recovered: void elements never take children,
  ``<p>`` auto-closes on a new block element, ``<li>`` on ``<li>``,
  ``<tr>``/``<td>``/``<th>`` on their table siblings, and unclosed tags
  are closed at EOF (the common lxml recoveries).

Selector support covers what the reference's ~190 selector expressions
use (trials_extractor/config/selectors.py:8-194): tag, ``#id``,
``.class``, compound ``tag.class``/``tag#id``, descendant combinators,
``,`` alternation, and the ``:contains('txt')`` pseudo-predicate
(emulated by substring match, html_utils.py:83-100).

This module is imported inside pandas UDFs only — one import per
executor, zero per-row Python at the Spark plan level.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

BLOCK_ELEMENTS = {
    "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "main", "nav", "ol", "p", "pre", "section", "table", "ul",
}

# tags whose open implicitly closes an open instance of the mapped tags
_AUTOCLOSE = {
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node or str
        self.parent = parent

    # ---- text ----
    def itertext(self):
        for child in self.children:
            if isinstance(child, str):
                yield child
            else:
                yield from child.itertext()

    @property
    def text(self) -> str:
        return "".join(self.itertext())

    # ---- traversal ----
    def iter(self):
        yield self
        for child in self.children:
            if isinstance(child, Node):
                yield from child.iter()

    def element_children(self):
        return [c for c in self.children if isinstance(c, Node)]

    @property
    def classes(self):
        return self.attrs.get("class", "").split()

    # ---- sibling navigation (reference get_next_sibling_text /
    #      find_next analogs, html_utils.py:181-230) ----
    def next_sibling_of_tag(self, tag: str):
        if self.parent is None:
            return None
        sibs = self.parent.element_children()
        try:
            idx = sibs.index(self)
        except ValueError:
            return None
        for sib in sibs[idx + 1 :]:
            if sib.tag == tag:
                return sib
        return None

    def find_next(self, tag: str):
        """First element with ``tag`` after this node in document order."""
        root = self
        while root.parent is not None:
            root = root.parent
        seen_self = False
        for node in root.iter():
            if node is self:
                seen_self = True
                continue
            if seen_self and node.tag == tag:
                return node
        return None


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        auto = _AUTOCLOSE.get(tag)
        if auto:
            while len(self.stack) > 1 and self.stack[-1].tag in auto:
                self.stack.pop()
        if tag in BLOCK_ELEMENTS:
            while len(self.stack) > 1 and self.stack[-1].tag == "p":
                self.stack.pop()
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored (recovery)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # comments / doctype / PIs contribute no text
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


def parse(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ------------------------------------------------------------- selectors

_CONTAINS_RE = re.compile(r":contains\(['\"](.+?)['\"]\)")
_PART_RE = re.compile(r"([a-zA-Z0-9*-]*)((?:[#.][\w-]+)*)$")


def _match_simple(node: Node, simple: str) -> bool:
    m = _PART_RE.match(simple)
    if not m:
        return False
    tag, quals = m.groups()
    if tag and tag != "*" and node.tag != tag.lower():
        return False
    for qual in re.findall(r"[#.][\w-]+", quals):
        if qual[0] == "#" and node.attrs.get("id") != qual[1:]:
            return False
        if qual[0] == "." and qual[1:] not in node.classes:
            return False
    return True


def _select_descendant(scope: Node, parts: list[str]) -> list[Node]:
    matches = [scope]
    for part in parts:
        next_matches = []
        seen = set()
        for node in matches:
            for cand in node.iter():
                if cand is node:
                    continue
                if _match_simple(cand, part) and id(cand) not in seen:
                    seen.add(id(cand))
                    next_matches.append(cand)
        matches = next_matches
    return matches


def select(scope: Node, selector: str) -> list[Node]:
    """All elements under ``scope`` matching the selector (document order
    within each alternation branch)."""
    out = []
    for branch in selector.split(","):
        contains = None
        m = _CONTAINS_RE.search(branch)
        if m:
            contains = m.group(1)
            branch = _CONTAINS_RE.sub("", branch)
        parts = branch.split()
        if not parts:
            continue
        found = _select_descendant(scope, parts)
        if contains is not None:
            found = [n for n in found if contains in n.text]
        out.extend(found)
    return out


def select_one(scope: Node, selector: str) -> Node | None:
    found = select(scope, selector)
    return found[0] if found else None
