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

Selector support covers the full syntax used by the reference's 213
selector expressions (trials_extractor/config/selectors.py:8-194):
tag, ``#id``, ``.class``, compound ``tag.class``/``tag#id``, the
``,`` alternation, all four combinators (descendant, ``>`` child,
``+`` adjacent sibling, ``~`` general sibling) and the
``:-soup-contains('txt')`` pseudo-predicate (with the deprecated
soupsieve alias ``:contains``), emulated as a substring match over
the element's recursive text (html_utils.py:83-100). Combinators
follow strict CSS semantics, matching soupsieve: ``A + B`` requires B
to be the element sibling *immediately* after A — reference selectors
that violate adjacency in the real documents (e.g. the
``sponsors.scientific_contact.phone`` chain) match nothing there too,
and the extractor's '' default applies, byte-identically.
Matching is scoped like soupsieve: the SUBJECT (rightmost compound)
must be a strict descendant of the ``select()`` scope node, while the
rest of the chain binds with full document context — ancestors above
the scope, and the scope element itself, participate. This is what
lets the reference apply selectors that name the section container
(``div#locations > div > h3``) while iterating inside that section.

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

    def prev_element_sibling(self):
        """Nearest preceding element sibling (CSS ``+`` subject)."""
        if self.parent is None:
            return None
        prev = None
        for sib in self.parent.children:
            if sib is self:
                return prev
            if isinstance(sib, Node):
                prev = sib
        return None

    def preceding_element_siblings(self):
        """All preceding element siblings, nearest first (CSS ``~``)."""
        if self.parent is None:
            return []
        out = []
        for sib in self.parent.children:
            if sib is self:
                break
            if isinstance(sib, Node):
                out.append(sib)
        out.reverse()
        return out

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
#
# Grammar (the subset soupsieve resolves for the reference's 213
# expressions, config/selectors.py:8-194):
#
#   selector  := branch ("," branch)*
#   branch    := compound (combinator compound)*
#   combinator:= " " | ">" | "+" | "~"
#   compound  := [tag|*] ("#id" | ".class")* pseudo*
#   pseudo    := ":-soup-contains('txt')" | ":contains('txt')"
#
# Matching is right-to-left (the subject is the rightmost compound),
# evaluated per candidate node in document order — so select() output
# is in document order across alternation branches, like soupsieve.

_PSEUDO_RE = re.compile(r":(?:-soup-)?contains\(\s*(['\"])(.*?)\1\s*\)")
_QUAL_RE = re.compile(r"[#.][\w-]+")
_HEAD_RE = re.compile(r"^([a-zA-Z0-9*-]*)")


class _Compound:
    __slots__ = ("tag", "id", "classes", "contains")

    def __init__(self, raw: str):
        self.contains = [m.group(2) for m in _PSEUDO_RE.finditer(raw)]
        raw = _PSEUDO_RE.sub("", raw)
        tag = _HEAD_RE.match(raw).group(1)
        self.tag = tag.lower() if tag and tag != "*" else None
        self.id = None
        self.classes = []
        for qual in _QUAL_RE.findall(raw[len(tag):]):
            if qual[0] == "#":
                self.id = qual[1:]
            else:
                self.classes.append(qual[1:])

    def matches(self, node: Node) -> bool:
        if self.tag is not None and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = node.classes
            if any(c not in have for c in self.classes):
                return False
        if self.contains:
            text = node.text
            if any(t not in text for t in self.contains):
                return False
        return True


def _split_top(selector: str, sep: str) -> list[str]:
    """Split on ``sep`` outside quotes/parens (contains-args hold both)."""
    parts, buf, quote, depth = [], [], None, 0
    for ch in selector:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _parse_branch(branch: str) -> list[tuple[str, _Compound]]:
    """Tokenize one branch into [(combinator, compound), ...]; the first
    combinator is relative to the select() scope (normally ' ')."""
    steps: list[tuple[str, _Compound]] = []
    buf: list[str] = []
    pending = " "
    quote, depth = None, 0

    def flush():
        nonlocal pending
        if buf:
            steps.append((pending, _Compound("".join(buf))))
            buf.clear()
            pending = " "

    for ch in branch:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and ch in " \t\n>+~":
            flush()
            if ch in ">+~":
                pending = ch
        else:
            buf.append(ch)
    flush()
    return steps


def _matches_at(node: Node, steps, scope: Node, idx: int) -> bool:
    """Right-to-left match with DOCUMENT context (soupsieve semantics):
    only the subject (rightmost compound) is constrained to the scope's
    subtree — enforced by the candidate enumeration in select()/
    select_one(); non-subject compounds may bind anywhere up the real
    document, including the scope element itself. This is what makes
    ``section.select("div#locations > div > h3")`` work when section IS
    div#locations, exactly as BeautifulSoup resolves it. A leading
    ``>`` is the ``:scope >`` form (child of the scope node)."""
    comb, comp = steps[idx]
    if not comp.matches(node):
        return False
    if idx == 0:
        if comb == " ":
            return True  # document context: any position
        if comb == ">":
            return node.parent is scope
        return False  # leading +/~ relative to scope: unsupported/CSS-invalid
    if comb == " ":
        anc = node.parent
        while anc is not None:
            if _matches_at(anc, steps, scope, idx - 1):
                return True
            anc = anc.parent
        return False
    if comb == ">":
        parent = node.parent
        return parent is not None and _matches_at(parent, steps, scope, idx - 1)
    if comb == "+":
        prev = node.prev_element_sibling()
        return prev is not None and _matches_at(prev, steps, scope, idx - 1)
    if comb == "~":
        return any(
            _matches_at(sib, steps, scope, idx - 1)
            for sib in node.preceding_element_siblings()
        )
    return False


_SELECTOR_CACHE: dict[str, list] = {}


def _compile(selector: str):
    compiled = _SELECTOR_CACHE.get(selector)
    if compiled is None:
        compiled = [
            steps
            for steps in (_parse_branch(b) for b in _split_top(selector, ","))
            if steps
        ]
        if len(_SELECTOR_CACHE) < 4096:
            _SELECTOR_CACHE[selector] = compiled
    return compiled


def select(scope: Node, selector: str) -> list[Node]:
    """All elements strictly under ``scope`` matching the selector, in
    document order (soupsieve order across ``,`` branches)."""
    branches = _compile(selector)
    if not branches:
        return []
    out = []
    for node in scope.iter():
        if node is scope:
            continue
        for steps in branches:
            if _matches_at(node, steps, scope, len(steps) - 1):
                out.append(node)
                break
    return out


def select_one(scope: Node, selector: str) -> Node | None:
    """First match in document order (BeautifulSoup ``select_one``)."""
    branches = _compile(selector)
    if not branches:
        return None
    for node in scope.iter():
        if node is scope:
            continue
        for steps in branches:
            if _matches_at(node, steps, scope, len(steps) - 1):
                return node
    return None


def select_first_many(
    scope: Node, selectors: dict[str, str]
) -> dict[str, Node | None]:
    """``select_one`` for a whole selector table in ONE document walk.

    The reference evaluates ~213 selector expressions per page
    (config/selectors.py) — one full-tree walk each is 213x the
    traversal work. Here every branch is indexed by its subject
    (rightmost) compound's tag, so each node only tests the branches
    whose subject could match it; the walk stops once every name has
    its first match. Output is equal to calling select_one per entry
    (pinned by tests/test_html_golden.py)."""
    results: dict[str, Node | None] = {name: None for name in selectors}
    by_tag: dict[str | None, list] = {}
    for name, selector in selectors.items():
        for steps in _compile(selector):
            subject = steps[-1][1]
            by_tag.setdefault(subject.tag, []).append((name, steps))
    pending = set(results)
    wildcard = by_tag.get(None, ())
    for node in scope.iter():
        if node is scope:
            continue
        for bucket in (by_tag.get(node.tag, ()), wildcard):
            for name, steps in bucket:
                if results[name] is None and _matches_at(
                    node, steps, scope, len(steps) - 1
                ):
                    results[name] = node
                    pending.discard(name)
        if not pending:
            break
    return results
