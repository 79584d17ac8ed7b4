"""Minimal HTML DOM with the element API surface the reference relies on.

The reference parses pages with the ``crabquery`` crate (html5ever-backed;
main.rs:125) and uses exactly this element API: ``tag() attr() children()
parent() text() select()`` (main.rs:265-268, 374-396, 769-896). We rebuild
that surface on the Python stdlib ``html.parser`` so there is no external
C-parser variance (SURVEY.md §7.4). Fixtures are well-formed HTML with
explicit <html>/<body> wrappers, so html5's implied-tag tree building is
not needed.

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


class Node:
    __slots__ = ()


class Text(Node):
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


class Element(Node):
    __slots__ = ("_tag", "attrs", "_children", "_parent", "doc_order")

    def __init__(self, tag: str, attrs, parent, doc_order: int):
        self._tag = tag
        self.attrs = attrs  # dict, first-wins
        self._children = []  # Node list (elements + text, document order)
        self._parent = parent
        self.doc_order = doc_order

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
        stack = list(reversed(self.children()))
        while stack:
            el = stack.pop()
            yield el
            stack.extend(reversed(el.children()))

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Element {self._tag} {self.attrs}>"


def _collect_text(el: Element, parts: list):
    for c in el._children:
        if isinstance(c, Text):
            parts.append(c.data)
        else:
            _collect_text(c, parts)


class Document:
    """Parsed page; ``select`` returns matches in document order
    (crabquery ``Document::select`` parity)."""

    def __init__(self, html: str):
        builder = _TreeBuilder()
        try:
            builder.feed(html)
            builder.close()
        except Exception:
            pass  # keep whatever tree was built (lenient, like html5ever)
        self.root = builder.root

    def select(self, selector: str):
        from .selector import select_in

        return select_in(self.root, selector)

    def iter_elements(self):
        return self.root.iter_elements()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {}, None, 0)
        self._stack = [self.root]
        self._n = 0

    def handle_starttag(self, tag, attrs):
        self._n += 1
        adict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v if v is not None else ""
        el = Element(tag, adict, self._stack[-1], self._n)
        self._stack[-1]._children.append(el)
        if tag not in VOID_ELEMENTS:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self._n += 1
        adict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v if v is not None else ""
        el = Element(tag, adict, self._stack[-1], self._n)
        self._stack[-1]._children.append(el)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i]._tag == tag:
                del self._stack[i:]
                return
        # unmatched close tag: ignore (lenient)

    def handle_data(self, data):
        if data:
            self._stack[-1]._children.append(Text(data))
