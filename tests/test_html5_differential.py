"""Differential HTML-tree suite over adversarial real-world markup
(round-1/round-2 verdict item: retire malformed-HTML tree fidelity).

The reference parses with html5ever via crabquery (main.rs:125,
Cargo.toml:22). No independent html5 implementation ships in this
sandbox (html5lib absent), so the suite is built from three mutually
reinforcing checks, scored on the SELECTOR SURFACE web.json actually
uses (type/.class/#id/[attr]/descendant/child — see
functions/selector.py docstring), not raw tree identity:

1. **Composed differential corpus (≥1k cases)**: every adversarial
   FRAGMENT embedded in every CONTEXT wrapper. Both tree builders
   (fast regex scanner + stdlib html.parser based — independent
   tokenizers sharing only the tree-construction rules) must produce
   identical trees AND identical selector-battery hits.
2. **Extraction-surface invariant**: implied-end handling may
   REPARENT nodes but never drop or duplicate them — for every
   composed case, `img[src]` / `a[href]` hits equal the source-order
   start-tag list of the fragment + context annotations.
3. **Hand-derived spec anchors**: selector-visible outcomes derived by
   hand from the WHATWG tree-construction spec (the html5ever
   behavior) for the implied-end rules the parent()-walking
   heuristics (_album_href main.rs:374-396, check_next
   main.rs:769-896) depend on.

Known, documented OUT-OF-SURFACE divergences from html5ever (pinned at
the bottom so a behavior change is loud):
- adoption agency reparenting of misnested formatting tags
  (<b><i></b>t</i>): formatting elements carry no href/src and no
  web.json selector targets them — text/hit surface shown unaffected.
- table foster parenting (<table><div>..</div><tr>): the div stays
  INSIDE the table instead of moving before it; descendant selectors
  from the root still reach it — hit sets shown unaffected for the
  web.json selector shapes (no selector in the config excludes
  table ancestry).
"""

import itertools

import pytest

from img_spark.functions.dom import Document, Text, _fast_parse
from img_spark.functions.selector import select_in
from tests.test_fastdom import dump, stdlib_tree

# --------------------------------------------------------------------------
# fragments: adversarial markup + source-order img-src / a-href annotations
# --------------------------------------------------------------------------
# (markup, [img srcs], [a hrefs])
FRAGMENTS = [
    # unclosed list items / definition lists
    ('<ul><li><img src="/f/1.jpg"><li><img src="/f/2.jpg"></ul>',
     ["/f/1.jpg", "/f/2.jpg"], []),
    ('<ul><li><a href="/a/1"><img class="cov" src="/f/3.jpg">'
     '<li><a href="/a/2"><img class="cov" src="/f/4.jpg"></ul>',
     ["/f/3.jpg", "/f/4.jpg"], ["/a/1", "/a/2"]),
    ('<dl><dt>t<dd><img src="/f/5.jpg"><dt>u<dd><img src="/f/6.jpg"></dl>',
     ["/f/5.jpg", "/f/6.jpg"], []),
    ('<ol><li>1<ol><li><img src="/f/7.jpg"></ol><li>2</ol>',
     ["/f/7.jpg"], []),
    # unclosed paragraphs closed by blocks
    ('<p>a<p>b<div><img src="/f/8.jpg"></div>', ["/f/8.jpg"], []),
    ('<p><img src="/f/9.jpg"><hr><p><img src="/f/10.jpg">',
     ["/f/9.jpg", "/f/10.jpg"], []),
    ('<p>x<h1>t</h1><img src="/f/11.jpg">', ["/f/11.jpg"], []),
    ('<h1><p>x<h2>y</h2><img src="/f/12.jpg">', ["/f/12.jpg"], []),
    ('<p>a<button><p><img src="/f/13.jpg"></button>', ["/f/13.jpg"], []),
    # self-closing syntax on non-void trigger tags
    ('<p>x<div/><img src="/f/14.jpg">', ["/f/14.jpg"], []),
    ('<ul><li/><img src="/f/15.jpg"><li/><img src="/f/16.jpg"></ul>',
     ["/f/15.jpg", "/f/16.jpg"], []),
    ('<p/><a href="/a/3">x</a>', [], ["/a/3"]),
    # tables with implied cell/row ends
    ('<table><tr><td><img src="/f/17.jpg"><td><img src="/f/18.jpg">'
     '<tr><td><img src="/f/19.jpg"></table>',
     ["/f/17.jpg", "/f/18.jpg", "/f/19.jpg"], []),
    ('<table><thead><tr><td>h<tbody><tr><td><img src="/f/20.jpg"></table>',
     ["/f/20.jpg"], []),
    ('<td><img src="/f/21.jpg"></td>', ["/f/21.jpg"], []),
    # misnested anchors (simplified adoption agency)
    ('<a href="/a/4">x<a href="/a/5"><img src="/f/22.jpg"></a>',
     ["/f/22.jpg"], ["/a/4", "/a/5"]),
    ('<div><a href="/a/6">x<a href="/a/7">y</div>', [], ["/a/6", "/a/7"]),
    # wrong close order / stray close tags
    ('<div><span><img src="/f/23.jpg"></div></span>', ["/f/23.jpg"], []),
    ('</div><img src="/f/24.jpg"></p>', ["/f/24.jpg"], []),
    ('<b><i><a href="/a/8">t</b></i></a>', [], ["/a/8"]),
    # attribute junk
    ('<img src=/f/25.jpg alt=x data-y>', ["/f/25.jpg"], []),
    ("<img src='/f/26.jpg' src='/dup.jpg'>", ["/f/26.jpg"], []),
    ('<img\nsrc="/f/27.jpg"\nclass="ml">', ["/f/27.jpg"], []),
    ('<a href="/a/9?x=1&amp;y=2"><img src="/f/28.jpg"></a>',
     ["/f/28.jpg"], ["/a/9?x=1&y=2"]),
    ('<a href>bare</a>', [], [""]),
    # rawtext / comments (terminated — swallowing is html.parser parity)
    ('<script>var a = "<img src=/not/real.jpg>";</script>'
     '<img src="/f/29.jpg">', ["/f/29.jpg"], []),
    ('<!-- <img src="/not/real.jpg"> --><img src="/f/30.jpg">',
     ["/f/30.jpg"], []),
    ('<style>.x{background:url(/not/real.jpg)}</style>'
     '<img src="/f/31.jpg">', ["/f/31.jpg"], []),
    # selects / options
    ('<select><option>a<option>b</select><img src="/f/32.jpg">',
     ["/f/32.jpg"], []),
    ('<select><option>a<optgroup label="g"><option>b</select>', [], []),
    # heading soup
    ('<h1>a<h2>b<h3><img src="/f/33.jpg">', ["/f/33.jpg"], []),
    # foster-parenting-shaped (our builders keep content in the table)
    ('<table><div><img src="/f/34.jpg"></div><tr><td>x</table>',
     ["/f/34.jpg"], []),
    # deep unclosed nesting
    ('<div><div><div><p><img src="/f/35.jpg">', ["/f/35.jpg"], []),
    # entity / unicode soup around tags
    ('<p>&amp; &notareal; &#x41;<img src="/f/36.jpg">中文</p>',
     ["/f/36.jpg"], []),
    # duplicate class attrs + unquoted
    ('<div class=g class=h><img src="/f/37.jpg"></div>', ["/f/37.jpg"], []),
    # pagination-shaped
    ('<div class="pg"><ul><li><a href="/g/1">1</a>'
     '<li><span class="cur">2</span><li><a href="/g/3">3</a></ul></div>',
     [], ["/g/1", "/g/3"]),
]

# (prefix, suffix, [prefix img srcs], [prefix a hrefs],
#  [suffix img srcs], [suffix a hrefs])
CONTEXTS = [
    ("", "", [], [], [], []),
    ("<html><body>", "</body></html>", [], [], [], []),
    ('<div class="g">', "</div>", [], [], [], []),
    ('<div id="main">', "</div>", [], [], [], []),
    ("<ul><li>", "</ul>", [], [], [], []),
    ("<ul><li>pre<li>", "", [], [], [], []),
    ("<p>lead ", "", [], [], [], []),
    ("<p>lead ", " tail</p>", [], [], [], []),
    ("<table><tr><td>", "</table>", [], [], [], []),
    ("<td>", "</td>", [], [], [], []),
    ("<h1>head ", "", [], [], [], []),
    ("<button>", "</button>", [], [], [], []),
    ("<dl><dt>", "</dl>", [], [], [], []),
    ('<div class="wrap"><div class="inner">', "</div></div>", [], [], [], []),
    ('<a href="/ctx/1">', "</a>", [], ["/ctx/1"], [], []),
    ('<img src="/ctx/a.jpg">', "", ["/ctx/a.jpg"], [], [], []),
    ("", '<img src="/ctx/z.jpg">', [], [], ["/ctx/z.jpg"], []),
    ('<img src="/ctx/a.jpg"><p>', '<img src="/ctx/z.jpg">',
     ["/ctx/a.jpg"], [], ["/ctx/z.jpg"], []),
    ("<!-- lead --><div>", "</div><!-- tail -->", [], [], [], []),
    ("<!DOCTYPE html><div>", "</div>", [], [], [], []),
    ("<script>var x = 1;</script>", "", [], [], [], []),
    ("<span>inline ", "</span>", [], [], [], []),
    ("<b><i>fmt ", "</i></b>", [], [], [], []),
    ("<b><i>misnest</b>", "</i>", [], [], [], []),
    ("<form><fieldset>", "</fieldset></form>", [], [], [], []),
    ("<section><article>", "</article></section>", [], [], [], []),
    ("<ol><li><div>", "</div></ol>", [], [], [], []),
    ('<table><tbody><tr><td class="cell">', "</table>", [], [], [], []),
    ("<p>a<p>b<p>c", "", [], [], [], []),
    ('<div data-x="1" data-y>', "</div>", [], [], [], []),
]

SELECTOR_BATTERY = [
    "img", "a", "li", "td", "img[src]", "a[href]", "div img", "ul li",
    "ul > li", "li a", "td img", "div.g img", ".cov", "#main img",
    "p img", "h1", "table td", 'img[class="ml"]', "div.pg a", "span.cur",
]


def _hits(root, sel):
    out = []
    for el in select_in(root, sel):
        out.append((el.tag(), el.attr("src"), el.attr("href"),
                    tuple(sorted(el.attrs.items()))))
    return out


CASES = list(itertools.product(range(len(FRAGMENTS)), range(len(CONTEXTS))))
assert len(CASES) >= 1000


@pytest.mark.parametrize("fi,ci", CASES)
def test_differential_composed(fi, ci):
    frag, f_srcs, f_hrefs = FRAGMENTS[fi]
    pre, suf, p_srcs, p_hrefs, s_srcs, s_hrefs = CONTEXTS[ci]
    html = pre + frag + suf
    fast = _fast_parse(html)
    std = stdlib_tree(html)
    # 1. independent tokenizers, identical trees
    assert dump(fast, []) == dump(std, []), html
    # 2. identical selector-battery hits
    for sel in SELECTOR_BATTERY:
        assert _hits(fast, sel) == _hits(std, sel), (html, sel)
    # 3. extraction-surface invariant: reparenting never drops/dups a
    #    node — img[src] and a[href] hits are exactly the source-order
    #    start tags
    got_srcs = [el.attr("src") for el in select_in(fast, "img[src]")]
    assert got_srcs == p_srcs + f_srcs + s_srcs, html
    got_hrefs = [el.attr("href") for el in select_in(fast, "a[href]")]
    assert got_hrefs == p_hrefs + f_hrefs + s_hrefs, html


# --------------------------------------------------------------------------
# hand-derived spec anchors: selector-visible outcomes the reference's
# heuristics depend on (html5ever behavior, derived from the WHATWG
# tree-construction rules by hand)
# --------------------------------------------------------------------------
SPEC_ANCHORS = [
    # (html, selector, expected src/href values in document order)
    ('<ul><li><a href="/a/1"><img src="/1.jpg"><li><a href="/a/2">'
     '<img src="/2.jpg"></ul>', "li a img", ["/1.jpg", "/2.jpg"]),
    # unclosed li: each img has ITS OWN li ancestor, so `li > a > img`
    # child chains hold — literal nesting would bury li2 inside li1's a
    ('<ul><li><a href="/a/1"><img src="/1.jpg"><li><a href="/a/2">'
     '<img src="/2.jpg"></ul>', "ul > li > a > img", ["/1.jpg", "/2.jpg"]),
    # p closed by div: img inside div is NOT a p descendant
    ('<p>text<div><img src="/3.jpg"></div>', "p img", []),
    ('<p>text<div><img src="/3.jpg"></div>', "div img", ["/3.jpg"]),
    # heading closes heading: h2 img is not an h1 descendant
    ('<h1>a<h2><img src="/4.jpg">', "h1 img", []),
    ('<h1>a<h2><img src="/4.jpg">', "h2 img", ["/4.jpg"]),
    # p-close runs before heading pop: '<h1><p>x<h2>' puts h2 beside h1
    ('<h1><p>x<h2><img src="/5.jpg">', "h1 img", []),
    ('<h1><p>x<h2><img src="/5.jpg">', "h2 > img", ["/5.jpg"]),
    # td implied end: second cell's img not under the first
    ('<table><tr><td><img src="/6.jpg"><td><img src="/7.jpg"></table>',
     "td > img", ["/6.jpg", "/7.jpg"]),
    # a closes a: second anchor is not nested in the first
    ('<div><a href="/a/1">x<a href="/a/2"><img src="/8.jpg"></div>',
     "div > a", ["/a/1", "/a/2"]),
    ('<div><a href="/a/1">x<a href="/a/2"><img src="/8.jpg"></div>',
     'a[href="/a/1"] img', []),
    # button scope: p inside button does not close the outer p
    ('<p><img src="/9.jpg"><button><p><img src="/10.jpg"></button>',
     "p img", ["/9.jpg", "/10.jpg"]),
    # li scope stops at ol/ul boundary
    ('<ul><li><ol><li><img src="/11.jpg"></ol><img src="/12.jpg"></ul>',
     "ul > li img", ["/11.jpg", "/12.jpg"]),
    ('<ul><li><ol><li><img src="/11.jpg"></ol><img src="/12.jpg"></ul>',
     "ol > li > img", ["/11.jpg"]),
]


@pytest.mark.parametrize("case", range(len(SPEC_ANCHORS)))
def test_spec_anchor_selector_hits(case):
    html, sel, expected = SPEC_ANCHORS[case]
    for root in (_fast_parse(html), stdlib_tree(html)):
        got = [el.attr("src") or el.attr("href")
               for el in select_in(root, sel)]
        assert got == expected, (html, sel, got)


def test_album_href_walk_on_malformed_gallery_in_table():
    """_album_href parity (main.rs:374-396) on a gallery misnested in a
    table with unclosed cells — the walk still finds each cover's own
    anchor."""
    from img_spark.functions.extract import _album_href

    html = ('<table><tr><td><a href="/al/1"><img class="cov" src="/1.jpg">'
            '<td><a href="/al/2"><img class="cov" src="/2.jpg"></table>')
    for root in (_fast_parse(html), stdlib_tree(html)):
        covers = select_in(root, "img.cov")
        assert [_album_href(c) for c in covers] == ["/al/1", "/al/2"]


# --------------------------------------------------------------------------
# documented out-of-surface divergences from html5ever — pinned so a
# silent behavior change is loud, asserted to not move the web.json
# selector surface
# --------------------------------------------------------------------------


def test_divergence_adoption_agency_documented():
    """html5ever reparents the trailing text into a reconstructed <i>
    sibling of <b>; our builders close <i> with </b> and put the text
    in the enclosing div. Formatting tags carry no src/href and no
    web.json selector targets b/i — the a/img hit surface is identical
    either way."""
    html = '<div><b><i><a href="/a/1">t</a></b>after</i><img src="/x.jpg"></div>'
    for root in (_fast_parse(html), stdlib_tree(html)):
        div = root.children()[0]
        # our (pinned) shape: b > i > a; 'after' is div text
        b = div.children()[0]
        assert b.tag() == "b"
        assert [c.tag() for c in b.children()] == ["i"]
        # selector surface unaffected by the divergence:
        assert [e.attr("href") for e in select_in(root, "a[href]")] == ["/a/1"]
        assert [e.attr("src") for e in select_in(root, "img[src]")] == ["/x.jpg"]
        assert "after" in div.text()


def test_divergence_foster_parenting_documented():
    """html5ever foster-parents the <div> BEFORE the <table>; our
    builders keep it inside. Every web.json selector is a
    descendant-from-root pattern (no selector excludes table ancestry),
    so hit sets match html5ever's for the config surface."""
    html = ('<table><div class="g"><img src="/1.jpg"></div>'
            "<tr><td><img src='/2.jpg'></table>")
    for root in (_fast_parse(html), stdlib_tree(html)):
        table = root.children()[0]
        assert table.tag() == "table"
        # pinned: div stays inside the table (html5ever: before it)
        assert table.children()[0].tag() == "div"
        # surface unaffected: descendant selectors reach both imgs
        assert [e.attr("src") for e in select_in(root, "div.g img")] == ["/1.jpg"]
        assert [e.attr("src") for e in select_in(root, "td img")] == ["/2.jpg"]
        assert [e.attr("src") for e in select_in(root, "img[src]")] == [
            "/1.jpg", "/2.jpg"]
