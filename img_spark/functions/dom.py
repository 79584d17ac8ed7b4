"""Minimal HTML DOM with the element API surface the reference relies on.

The reference parses pages with the ``crabquery`` crate (html5ever-backed;
main.rs:125) and uses exactly this element API: ``tag() attr() children()
parent() text() select()`` (main.rs:265-268, 374-396, 769-896). We rebuild
that surface dependency-free (no external C-parser variance, SURVEY.md
§7.4): html.parser-compatible tokenization plus the html5
implied-end-tag tree-construction rules (see below) so malformed
real-world markup — unclosed <li>/<p>/<td>, misnested <a> — produces the
html5 tree SHAPE the reference's parent()-walking heuristics assume
(tests/test_html5_tree.py pins the shapes against hand-derived spec
outcomes). Self-closing syntax on non-void elements keeps html.parser
semantics (treated as immediately closed); foster parenting and the full
adoption agency are intentionally out of scope.

Semantics pinned here:
- ``children()`` returns element children only (text nodes skipped) —
  the reference calls ``c.tag().unwrap()`` on children (main.rs:781).
- ``text()`` concatenates ALL descendant text nodes in document order and
  returns None when the subtree contains no text node (the reference
  pattern-matches ``Option<String>`` incl. whitespace-only Some,
  main.rs:829-831).
- bare attributes (``<a href>``) carry value ``""`` (html5ever behavior).
- duplicate attributes: first occurrence wins (html5ever behavior).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# --------------------------------------------------------------------------
# html5 tree-construction subset: implied end tags.
#
# crabquery parses with html5ever (main.rs:125). Literal html.parser
# nesting diverges from the html5 tree on malformed real-world markup —
# unclosed <li>/<p>/<td> etc. nest instead of closing — which changes
# element PARENTAGE, and with it the reference's parent()-walking
# heuristics (_album_href main.rs:374-396, check_next main.rs:769-896).
# Both tree builders below apply these start-tag rules (the subset of
# https://html.spec.whatwg.org/#tree-construction that affects tree
# shape): li/dd/dt/td/th/tr/row-group/option/heading auto-close, <p>
# closed by block starts (button scope), <a> closing an open <a>
# (simplified adoption agency — no reparenting). Not covered: foster
# parenting of table-misnested content, formatting-element reconstruction.
# --------------------------------------------------------------------------

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_P_CLOSERS = frozenset((
    "address article aside blockquote center details dialog dir div dl"
    " fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header"
    " hgroup hr main menu nav ol p pre section summary table ul li dd dt"
).split())
_BASE_SCOPE = frozenset(
    "html table td th caption applet object marquee template #document".split()
)
_LIST_SCOPE = _BASE_SCOPE | {"ol", "ul"}
_BUTTON_SCOPE = _BASE_SCOPE | {"button"}
_CELL_SCOPE = frozenset({"table", "html", "template", "#document"})


# hot-path guard: tags that can trigger ANY implied-end work; everything
# else (img, span, script, br, formatting tags …) skips the call entirely
_IMPLIED_TRIGGERS = (
    _P_CLOSERS
    | {"li", "dd", "dt", "td", "th", "tr", "tbody", "thead", "tfoot",
       "option", "optgroup", "a"}
    | _HEADINGS
)

# tags whose OPEN count is tracked so implied-end scans run only when a
# target is actually open (a plain <div> page never walks the stack)
_COUNTED = frozenset(
    {"p", "a", "li", "dd", "dt", "td", "th", "tr", "tbody", "thead", "tfoot"}
)


def _uncount(stack, i, counts):
    for j in range(i, len(stack)):
        t = stack[j]._tag
        if t in _COUNTED:
            counts[t] -= 1


def _close_in_scope(stack, targets, boundary, counts):
    """Pop the stack through the nearest target element, unless a scope
    boundary intervenes (html5 'has an element in X scope')."""
    for i in range(len(stack) - 1, 0, -1):
        t = stack[i]._tag
        if t in targets:
            _uncount(stack, i, counts)
            del stack[i:]
            return
        if t in boundary:
            return


def _apply_implied_end(stack, tag, counts):
    """Start-tag implied-end-tag rules; call BEFORE inserting ``tag``
    (and only when ``tag in _IMPLIED_TRIGGERS``)."""
    get = counts.get
    if tag == "li":
        if get("li"):
            _close_in_scope(stack, ("li",), _LIST_SCOPE, counts)
    elif tag in ("dd", "dt"):
        if get("dd") or get("dt"):
            _close_in_scope(stack, ("dd", "dt"), _LIST_SCOPE, counts)
    elif tag in ("td", "th"):
        if get("td") or get("th"):
            _close_in_scope(stack, ("td", "th"), _CELL_SCOPE, counts)
    elif tag == "tr":
        if get("tr"):
            _close_in_scope(stack, ("tr",), _CELL_SCOPE, counts)
    elif tag in ("tbody", "thead", "tfoot"):
        if get("tbody") or get("thead") or get("tfoot"):
            _close_in_scope(
                stack, ("tbody", "thead", "tfoot"), _CELL_SCOPE, counts
            )
    elif tag == "option":
        if stack[-1]._tag == "option":
            stack.pop()
    elif tag == "optgroup":
        while len(stack) > 1 and stack[-1]._tag in ("option", "optgroup"):
            stack.pop()
    elif tag == "a":
        if get("a"):
            _close_in_scope(stack, ("a",), _BASE_SCOPE, counts)
    if tag in _P_CLOSERS and get("p"):
        _close_in_scope(stack, ("p",), _BUTTON_SCOPE, counts)
    # spec order: the p-in-button-scope close runs FIRST, then the
    # heading current-node pop re-checks the (possibly new) stack top —
    # '<h1><p>x<h2>' makes h2 a SIBLING of h1 (html5ever parity), not a
    # child (https://html.spec.whatwg.org/#parsing-main-inbody, h1-h6)
    if tag in _HEADINGS and stack[-1]._tag in _HEADINGS:
        stack.pop()


class Node:
    __slots__ = ()


class Text(Node):
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


class Element(Node):
    __slots__ = (
        "_tag", "attrs", "_children", "_parent", "doc_order", "_elements"
    )

    def __init__(self, tag: str, attrs, parent, doc_order: int):
        self._tag = tag
        self.attrs = attrs  # dict, first-wins
        self._children = []  # Node list (elements + text, document order)
        self._parent = parent
        self.doc_order = doc_order
        self._elements = None  # cached pre-order descendant list

    # ----- crabquery-parity API -------------------------------------
    def tag(self):
        return self._tag

    def attr(self, name: str):
        return self.attrs.get(name)

    def parent(self):
        p = self._parent
        return p if isinstance(p, Element) else None

    def children(self):
        return [c for c in self._children if isinstance(c, Element)]

    def text(self):
        parts = []
        _collect_text(self, parts)
        if not parts:
            return None
        return "".join(parts)

    def select(self, selector: str):
        from .selector import select_in

        return select_in(self, selector)

    # ----- engine-side helpers ---------------------------------------
    def iter_elements(self):
        """Pre-order DFS over descendant elements (self excluded)."""
        return iter(self.elements_list())

    def elements_list(self):
        """Cached pre-order descendant element list (trees are immutable
        after parsing; multiple selects per page reuse one traversal)."""
        cached = self._elements
        if cached is not None:
            return cached
        out = []
        stack = list(reversed(self.children()))
        while stack:
            el = stack.pop()
            out.append(el)
            stack.extend(reversed(el.children()))
        self._elements = out
        return out

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Element {self._tag} {self.attrs}>"


def _collect_text(el: Element, parts: list):
    for c in el._children:
        if isinstance(c, Text):
            parts.append(c.data)
        else:
            _collect_text(c, parts)


class _Root(Element):
    __slots__ = ("doc_text",)


class Document:
    """Parsed page; ``select`` returns matches in document order
    (crabquery ``Document::select`` parity).

    Two tree builders produce identical trees (pinned by
    tests/test_fastdom.py): a regex-scanner (default, ~4× faster — this
    parse dominates the 100-TB extraction hot path) and the stdlib
    html.parser reference (``IMG_SPARK_HTML_PARSER=stdlib``)."""

    def __init__(self, html: str):
        import os

        if os.environ.get("IMG_SPARK_HTML_PARSER") == "stdlib":
            builder = _TreeBuilder()
            try:
                builder.feed(html)
                builder.close()
            except Exception:
                pass  # keep whatever tree was built (lenient)
            self.root = builder.root
        else:
            self.root = _fast_parse(html)

    def select(self, selector: str):
        from .selector import select_in

        return select_in(self.root, selector)

    def iter_elements(self):
        return self.root.iter_elements()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Root("#document", {}, None, 0)
        self.root.doc_text = []
        self._stack = [self.root]
        self._counts: dict = {}
        self._n = 0

    def handle_starttag(self, tag, attrs):
        self._n += 1
        if tag in _IMPLIED_TRIGGERS:
            _apply_implied_end(self._stack, tag, self._counts)
        adict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v if v is not None else ""
        el = Element(tag, adict, self._stack[-1], self._n)
        self._stack[-1]._children.append(el)
        if tag not in VOID_ELEMENTS:
            self._stack.append(el)
            if tag in _COUNTED:
                self._counts[tag] = self._counts.get(tag, 0) + 1

    def handle_startendtag(self, tag, attrs):
        self._n += 1
        # self-closing syntax still runs start-tag implied-end rules
        # ('<p>x<div/>' closes the p) — keeps the stdlib builder
        # tree-identical to _fast_parse, which applies them before
        # checking the self-closing flag
        if tag in _IMPLIED_TRIGGERS:
            _apply_implied_end(self._stack, tag, self._counts)
        adict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v if v is not None else ""
        el = Element(tag, adict, self._stack[-1], self._n)
        self._stack[-1]._children.append(el)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        if len(self._stack) > 1 and self._stack[-1]._tag == tag:
            if tag in _COUNTED:
                self._counts[tag] -= 1
            self._stack.pop()
            return
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i]._tag == tag:
                _uncount(self._stack, i, self._counts)
                del self._stack[i:]
                return
        # unmatched close tag: ignore (lenient)

    def handle_data(self, data):
        if data:
            self._stack[-1]._children.append(Text(data))
            # doc-order text, script/style excluded (extract_text twin)
            if self._stack[-1]._tag not in _RAWTEXT:
                self.root.doc_text.append(data)


# ---------------------------------------------------------------------------
# Fast regex tree builder (behavior-equivalent to _TreeBuilder; the
# equivalence is asserted over fixtures, bench pages and adversarial
# snippets in tests/test_fastdom.py)
# ---------------------------------------------------------------------------

import re as _re
from html import unescape as _unescape
from html.parser import attrfind_tolerant as _attrfind

_MASTER = _re.compile(
    r"""
      <!--.*?(?:--\s*>|$)         # comment (html.parser closer: --\s*>)
    | <!\[CDATA\[.*?(?:\]\s*\]\s*>|$)  # marked section (dropped when closed)
    | <![^>]*>?                   # doctype / declaration
    | <\?[^>]*>?                  # processing instruction
    | </([a-zA-Z][^\t\n\r\f />]*+)[^>]*>  # end tag, junk tolerated (group 1)
    | </[^>]*>                    # bogus end tag → dropped (html.parser)
    | <([a-zA-Z][^\t\n\r\f />]*+)          # CLEAN start tag (group 2): quotes
      ((?:[^<>"'=/]|/(?!>)|=\s*"[^"<]*"|=\s*'[^'<]*'|=[^>\s"']*)*+)  # (g3)
      (/?)>                       # self-closing flag (group 4) — anything
                                  # messier falls through to _parse_start
    | <(?=[a-zA-Z])               # irregular start tag → _parse_start
    | ([^<]+)                     # text run           (group 5)
    | <                           # lone '<' → data (html.parser behavior)
    """,
    _re.DOTALL | _re.VERBOSE,
)

_RAWTEXT = ("script", "style")  # html.parser CDATA_CONTENT_ELEMENTS
_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)

from html.parser import (  # noqa: E402  (html.parser's own tokenizer regexes)
    locatestarttagend_tolerant as _locate,
    tagfind_tolerant as _tagfind,
)


def _parse_attrs(blob: str) -> dict:
    if not blob:
        return {}
    attrs: dict = {}
    # html.parser's tolerant attr regex needs a preceding ['"\s/] char,
    # so scan " "+blob exactly like parse_starttag effectively does
    for m in _attrfind.finditer(" " + blob + " "):
        name, rest, value = m.group(1, 2, 3)
        if not name:
            continue
        if not rest:
            value = ""
        elif value[:1] == "'" == value[-1:] or value[:1] == '"' == value[-1:]:
            value = value[1:-1]
        if value and "&" in value:
            value = _unescape(value)
        key = name.lower()
        if key not in attrs:
            attrs[key] = value if value is not None else ""
    return attrs


_COMMENT_END = _re.compile(r"--\s*>$")
_CDATA_END = _re.compile(r"\]\s*\]\s*>$")


def _is_terminated(g0: str) -> bool:
    if g0.startswith("<!--"):
        m = _COMMENT_END.search(g0)
        return m is not None and m.start() >= 4
    if g0.startswith("<![CDATA["):
        return _CDATA_END.search(g0) is not None
    # declaration / PI: complete iff the '>' was consumed
    return g0.endswith(">")


def _whole_start_tag(html: str, i: int) -> int:
    """Verbatim port of HTMLParser.check_for_whole_start_tag (at EOF the
    buffer-boundary returns behave like end-of-input)."""
    m = _locate.match(html, i)
    j = m.end()
    nxt = html[j:j + 1]
    if nxt == ">":
        return j + 1
    if nxt == "/":
        if html.startswith("/>", j):
            return j + 2
        return -1  # '/' at end of input
    if nxt == "":
        return -1
    if nxt in "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ":
        return -1
    return j if j > i else i + 1


def _parse_start(html: str, i: int):
    """Verbatim port of HTMLParser.parse_starttag → returns
    (endpos, tag, attrs, startend, as_text). endpos -1 means incomplete
    (caller flushes the remainder as data, like close())."""
    endpos = _whole_start_tag(html, i)
    if endpos < 0:
        return -1, None, None, False, None
    m = _tagfind.match(html, i + 1)
    tag = m.group(1).lower()
    k = m.end()
    attrs: dict = {}
    while k < endpos:
        am = _attrfind.match(html, k)
        if not am:
            break
        name, rest, value = am.group(1, 2, 3)
        if not rest:
            value = ""
        elif value[:1] == "'" == value[-1:] or value[:1] == '"' == value[-1:]:
            value = value[1:-1]
        if value and "&" in value:
            value = _unescape(value)
        key = name.lower()
        if key not in attrs:
            attrs[key] = value
        k = am.end()
    end = html[k:endpos].strip()
    if end not in (">", "/>"):
        # junk tag: html.parser emits the raw span as data (no unescape)
        return endpos, None, None, False, html[i:endpos]
    return endpos, tag, attrs, end.endswith("/>"), None


def _fast_parse(html: str) -> Element:
    root = _Root("#document", {}, None, 0)
    doc_text: list = []
    root.doc_text = doc_text
    stack = [root]
    counts: dict = {}
    n = 0
    pos = 0
    L = len(html)
    finditer = _MASTER.finditer
    append_child = None
    while pos < L:
        matched = False
        for m in finditer(html, pos):
            matched = True
            pos = m.end()
            tag = m.group(2)
            if tag is None:
                text = m.group(5)
                if text is not None:
                    if "&" in text:
                        text = _unescape(text)  # may strip invalid refs
                    if text:
                        stack[-1]._children.append(Text(text))
                        doc_text.append(text)
                    continue
            else:
                # clean start tag (hot path)
                n += 1
                tag = tag.lower()
                if tag in _IMPLIED_TRIGGERS:
                    _apply_implied_end(stack, tag, counts)
                el = Element(tag, _parse_attrs(m.group(3)), stack[-1], n)
                stack[-1]._children.append(el)
                if m.group(4) or tag in VOID_ELEMENTS:
                    continue
                if tag in _RAWTEXT:
                    pos = _consume_rawtext(html, pos, tag, el, L)
                    break  # restart finditer at new pos
                stack.append(el)
                if tag in _COUNTED:
                    counts[tag] = counts.get(tag, 0) + 1
                continue
            end_name = m.group(1)
            if end_name is not None:
                want = end_name.lower()
                if want in VOID_ELEMENTS:
                    continue
                if len(stack) > 1 and stack[-1]._tag == want:
                    # hot path: well-formed close of the current element
                    if want in _COUNTED:
                        counts[want] -= 1
                    stack.pop()
                    continue
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i]._tag == want:
                        _uncount(stack, i, counts)
                        del stack[i:]
                        break
                continue
            g0 = m.group(0)
            if g0 == "<":
                i = m.start()
                if pos < L and html[pos] in _ASCII_LETTERS:
                    # irregular start tag: verbatim html.parser port
                    endpos, tag, attrs, startend, as_text = _parse_start(
                        html, i
                    )
                    if endpos < 0:
                        # incomplete at EOF: flushed as data, charref-
                        # converted (HTMLParser.goahead end-path)
                        tail = html[i:]
                        if "&" in tail:
                            tail = _unescape(tail)
                        if tail:
                            stack[-1]._children.append(Text(tail))
                            doc_text.append(tail)
                        pos = L
                        break
                    pos = endpos
                    if as_text is not None:
                        stack[-1]._children.append(Text(as_text))
                        doc_text.append(as_text)
                        break  # restart finditer at endpos
                    n += 1
                    if tag in _IMPLIED_TRIGGERS:
                        _apply_implied_end(stack, tag, counts)
                    el = Element(tag, attrs, stack[-1], n)
                    stack[-1]._children.append(el)
                    if not (startend or tag in VOID_ELEMENTS):
                        if tag in _RAWTEXT:
                            pos = _consume_rawtext(html, pos, tag, el, L)
                        else:
                            stack.append(el)
                            if tag in _COUNTED:
                                counts[tag] = counts.get(tag, 0) + 1
                    break  # restart finditer at endpos
                # '<' not opening a tag: html.parser emits it as data
                stack[-1]._children.append(Text("<"))
                doc_text.append("<")
                continue
            # comments/doctype/PI/marked sections: dropped when properly
            # terminated; html.parser flushes UNTERMINATED ones (buffered
            # to EOF) as data at close(), charref-converted
            if not _is_terminated(g0):
                if "&" in g0:
                    g0 = _unescape(g0)
                if g0:
                    stack[-1]._children.append(Text(g0))
                    doc_text.append(g0)
                continue
        else:
            break
        if not matched:
            break
    return root


def _consume_rawtext(html: str, pos: int, tag: str, el: Element, L: int) -> int:
    """script/style content: raw to the matching close tag, NO charref
    conversion; html.parser DROPS content without a complete close tag
    (buffered, discarded at close())."""
    close = _re.compile(r"</\s*%s" % tag, _re.IGNORECASE)
    cm = close.search(html, pos)
    gt = html.find(">", cm.end()) if cm else -1
    if cm and gt != -1:
        if cm.start() > pos:
            el._children.append(Text(html[pos:cm.start()]))
        return gt + 1
    return L
