"""Main-content extraction (readability-style boilerplate removal).

``extract_text`` (functions/extract.py) returns ALL visible text — the
WET-style invariant. A training-data pipeline additionally wants the
MAIN content of a page with navigation / footer / link-farm chrome
stripped (trafilatura / readability-lite). This kernel scores every
block-level container by how much non-link text it DIRECTLY owns,
penalized by its link density, and returns the text of the best block:

    score(el) = (chars - link_chars) * (1 - link_chars / chars)

over non-whitespace characters, ``<script>``/``<style>`` subtrees
excluded. Block tags delimit content scopes: text inside a nested
block element does NOT propagate to ancestor candidates — otherwise
``body`` aggregates every block's text and outscores the specific
``<article>`` whenever overall link density is low (the classic
readability wrapper-wins failure). Ties (an inline wrapper whose only
text is the winner's) resolve to the DEEPEST candidate, then earliest
document order. Containers whose owned text is entirely links
(chars == link_chars) are never candidates, so a pure link hub yields
``("", "")`` rather than its anchor soup. The returned text is the
winner's FULL subtree text (nested blocks included) — scoring locates
the densest node; extraction keeps its whole scope.

The heuristic is deterministic and closed-form, which is what lets the
driver oracle replay it in SQL over synthesized pages (see
plans/queries.py q_extract_text: the main block's tag varies
article/div/section by doc_id so a green row proves the scorer picked
the right node, not just "some text").
"""

from __future__ import annotations

from .dom import Document, Element, Text

# block-level tags that can BE the main-content container
BLOCK_TAGS = frozenset((
    "article", "main", "div", "section", "td", "body", "blockquote",
))

_SKIP = ("script", "style")


def _gather(el: Element, depth: int, in_link: bool, cands: list):
    """Post-order sweep: returns the (chars, link_chars) that ``el``
    contributes to its parent, counting non-whitespace characters only
    (markup indentation must not score). Block-tag elements register as
    candidates when they own any non-link text and contribute NOTHING
    upward — blocks delimit content scopes."""
    chars = 0
    link_chars = 0
    for c in el._children:
        if isinstance(c, Text):
            n = len("".join(c.data.split()))
            chars += n
            if in_link:
                link_chars += n
        elif c._tag not in _SKIP:
            ct, cl = _gather(c, depth + 1, in_link or c._tag == "a", cands)
            chars += ct
            link_chars += cl
    if el._tag in BLOCK_TAGS:
        if chars > link_chars:
            score = (chars - link_chars) * (1.0 - link_chars / chars)
            cands.append((score, depth, el.doc_order, el))
        return 0, 0
    return chars, link_chars


def _block_text(el: Element) -> str:
    """Whitespace-normalized visible text of one element's subtree
    (script/style excluded, runs of whitespace collapsed to one space)."""
    parts: list = []
    _walk(el, parts)
    return " ".join("".join(parts).split())


def _walk(el, parts):
    for c in el._children:
        if isinstance(c, Text):
            parts.append(c.data)
        elif c._tag not in _SKIP:
            _walk(c, parts)


def main_content_from(doc: Document):
    """(main_text, container_tag) for a parsed page; ("", "") when no
    block holds any non-link text."""
    cands: list = []
    _gather(doc.root, 0, False, cands)
    if not cands:
        return "", ""
    best = max(cands, key=lambda t: (t[0], t[1], -t[2]))
    return _block_text(best[3]), best[3]._tag


def main_content(html: str):
    """Parse + extract in one call (single-page / test convenience; the
    Spark path shares one parse with extract_text via
    operators/extract_udf.extract_main_text)."""
    return main_content_from(Document(html))
