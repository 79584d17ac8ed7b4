"""CSS selector subset engine.

Covers exactly the syntax surface of the reference's 114-site config
(/root/reference/src/web.json — verified by tokenizing every selector):
type selectors, ``.class`` conjunctions, ``#id``, ``[attr]``,
``[attr="value"]``, descendant (whitespace) and child (``>``)
combinators. No commas, no pseudo-classes (none appear in web.json).

Matching returns document order, like crabquery's ``select``
(main.rs:125, 163).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .dom import Element

_TOKEN = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<aname>[\w-]+)(?:=(?P<aval>"[^"]*"|'[^']*'|[^\]]*))?\]
    """,
    re.VERBOSE,
)


class Compound:
    __slots__ = ("tag", "classes", "ids", "attrs")

    def __init__(self):
        self.tag = None
        self.classes = []
        self.ids = []
        self.attrs = []  # (name, value-or-None)

    def matches(self, el: Element) -> bool:
        t = el._tag  # slot access — this is the hot loop of every select
        if t is None or t == "#document":
            return False
        if self.tag is not None and t != self.tag:
            return False
        if self.classes:
            cls = el.attrs.get("class")
            if cls is None:
                return False
            toks = cls.split()
            for c in self.classes:
                if c not in toks:
                    return False
        for i in self.ids:
            if el.attr("id") != i:
                return False
        for name, val in self.attrs:
            got = el.attr(name)
            if got is None:
                return False
            if val is not None and got != val:
                return False
        return True


@lru_cache(maxsize=512)
def parse_selector(sel: str):
    """Parse into [(combinator, Compound)]; combinator of the first
    compound is ' ' (unused), others ' ' (descendant) or '>' (child)."""
    parts = []
    # normalize: split on '>' keeping it as token, then whitespace
    tokens = []
    for chunk in re.split(r"(\s*>\s*)", sel.strip()):
        if not chunk:
            continue
        if ">" in chunk and chunk.strip() == ">":
            tokens.append(">")
        else:
            for t in chunk.split():
                tokens.append(t)
    comb = " "
    for tok in tokens:
        if tok == ">":
            comb = ">"
            continue
        comp = Compound()
        pos = 0
        for m in _TOKEN.finditer(tok):
            if m.start() != pos:
                break  # unparsable garbage: stop consuming
            pos = m.end()
            if m.group("tag"):
                comp.tag = m.group("tag").lower()
            elif m.group("cls"):
                comp.classes.append(m.group("cls"))
            elif m.group("id"):
                comp.ids.append(m.group("id"))
            elif m.group("aname"):
                v = m.group("aval")
                if v is not None and len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
                    v = v[1:-1]
                comp.attrs.append((m.group("aname"), v))
        parts.append((comb, comp))
        comb = " "
    return tuple(parts)


def _matches_chain(el: Element, parts, idx: int) -> bool:
    """Check compounds parts[0..idx] against el's ancestry (el already
    matched parts[idx])."""
    if idx == 0:
        return True
    comb, _ = parts[idx]
    target = parts[idx - 1][1]
    if comb == ">":
        p = el.parent()
        return p is not None and target.matches(p) and _matches_chain(p, parts, idx - 1)
    p = el.parent()
    while p is not None:
        if target.matches(p) and _matches_chain(p, parts, idx - 1):
            return True
        p = p.parent()
    return False


def select_in(scope: Element, selector: str):
    parts = parse_selector(selector)
    if not parts:
        return []
    last = parts[-1][1]
    out = []
    single = len(parts) == 1
    for el in scope.elements_list():
        if last.matches(el) and (single or _matches_chain(el, parts, len(parts) - 1)):
            out.append(el)
    return out
