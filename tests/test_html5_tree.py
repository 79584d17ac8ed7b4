"""html5 implied-end-tag tree shapes on malformed markup, hand-derived
from the WHATWG tree-construction spec (the reference's crabquery /
html5ever builds these trees; literal html.parser nesting does not).
Every case runs through BOTH tree builders (fast regex + stdlib-based)
— they must agree with each other and with the spec shape."""

import os

import pytest

from img_spark.functions.dom import Document


def both_trees(html):
    fast = Document(html).root
    os.environ["IMG_SPARK_HTML_PARSER"] = "stdlib"
    try:
        std = Document(html).root
    finally:
        del os.environ["IMG_SPARK_HTML_PARSER"]
    return fast, std


def shape(el):
    return (el.tag(), [shape(c) for c in el.children()])


def assert_equiv(html):
    fast, std = both_trees(html)
    assert shape(fast) == shape(std)
    return fast


def body_of(root):
    cur = root
    while cur.children() and cur.children()[0].tag() in ("html", "body"):
        cur = cur.children()[0]
    return cur


def test_li_siblings():
    root = assert_equiv("<ul><li>a<li>b<li>c</ul>")
    ul = root.children()[0]
    assert [c.tag() for c in ul.children()] == ["li", "li", "li"]
    assert [c.text() for c in ul.children()] == ["a", "b", "c"]


def test_li_scope_nested_list():
    # the inner <ol>'s li must NOT close the outer li (list-item scope
    # stops at ol/ul); the li after </ol> closes the outer li
    root = assert_equiv("<ul><li>a<ol><li>b</ol><li>c</ul>")
    ul = root.children()[0]
    lis = ul.children()
    assert [c.tag() for c in lis] == ["li", "li"]
    inner_ol = lis[0].children()[0]
    assert inner_ol.tag() == "ol"
    assert [c.tag() for c in inner_ol.children()] == ["li"]
    assert inner_ol.children()[0].text() == "b"


def test_p_closed_by_block_starts():
    root = assert_equiv("<p>one<p>two<div>three</div>")
    tags = [c.tag() for c in root.children()]
    assert tags == ["p", "p", "div"]
    assert [c.text() for c in root.children()] == ["one", "two", "three"]


def test_p_not_closed_across_button_scope():
    # button is a p-scope boundary: the inner p nests inside the button
    # while the outer p stays open (spec: 'has a p element in button scope')
    root = assert_equiv("<p>a<button><p>b</button>c")
    p = root.children()[0]
    assert p.tag() == "p"
    btn = p.children()[0]
    assert btn.tag() == "button"
    assert [c.tag() for c in btn.children()] == ["p"]


def test_table_cells_and_rows():
    root = assert_equiv("<table><tr><td>a<td>b<tr><td>c</table>")
    table = root.children()[0]
    rows = table.children()
    assert [r.tag() for r in rows] == ["tr", "tr"]
    assert [c.text() for c in rows[0].children()] == ["a", "b"]
    assert [c.text() for c in rows[1].children()] == ["c"]


def test_row_groups_close_each_other():
    root = assert_equiv(
        "<table><thead><tr><td>h<tbody><tr><td>b</table>"
    )
    table = root.children()[0]
    assert [g.tag() for g in table.children()] == ["thead", "tbody"]


def test_dt_dd_siblings():
    root = assert_equiv("<dl><dt>t1<dd>d1<dt>t2<dd>d2</dl>")
    dl = root.children()[0]
    assert [c.tag() for c in dl.children()] == ["dt", "dd", "dt", "dd"]


def test_options_siblings():
    root = assert_equiv("<select><option>a<option>b</select>")
    sel = root.children()[0]
    assert [c.text() for c in sel.children()] == ["a", "b"]


def test_optgroup_closes_option():
    root = assert_equiv(
        "<select><option>a<optgroup label=g><option>b</select>"
    )
    sel = root.children()[0]
    assert [c.tag() for c in sel.children()] == ["option", "optgroup"]


def test_nested_anchor_closes_open_anchor():
    # simplified adoption agency: a start <a> closes an open <a>
    root = assert_equiv('<div><a href="1">x<a href="2">y</div>')
    div = root.children()[0]
    anchors = div.children()
    assert [a.attr("href") for a in anchors] == ["1", "2"]
    assert anchors[1].parent().tag() == "div"


def test_heading_closes_heading():
    root = assert_equiv("<h1>x<h2>y")
    assert [c.tag() for c in root.children()] == ["h1", "h2"]


def test_heading_start_closes_p_then_heading():
    """Spec order: the p-in-button-scope close runs BEFORE the heading
    current-node pop — '<h1><p>x<h2>y' makes h2 a SIBLING of h1
    (html5ever), not a child of it."""
    root = assert_equiv("<h1><p>x<h2>y")
    assert [c.tag() for c in root.children()] == ["h1", "h2"]
    h1 = root.children()[0]
    assert [c.tag() for c in h1.children()] == ["p"]
    assert root.children()[1].text() == "y"


def test_self_closing_trigger_still_implies_end():
    """'<p>x<div/>y' — self-closing syntax on a non-void p-closer still
    closes the open p in BOTH builders (the div itself keeps
    html.parser's immediately-closed semantics)."""
    root = assert_equiv("<p>x<div/>y")
    assert [c.tag() for c in root.children()] == ["p", "div"]
    # y lands after the closed div, outside the p
    assert root.children()[0].text() == "x"


def test_self_closing_li_still_implies_end():
    root = assert_equiv("<ul><li/>a<li/>b</ul>")
    ul = root.children()[0]
    assert [c.tag() for c in ul.children()] == ["li", "li"]


def test_hr_closes_p():
    # void element in the p-closers set: pops p, inserts hr as sibling
    root = assert_equiv("<p>a<hr><p>b")
    assert [c.tag() for c in root.children()] == ["p", "hr", "p"]


def test_parent_walk_album_heuristic_on_malformed_list():
    """The reference's _album_href walks parent()/grandparent() for an
    href (main.rs:374-396). On an unclosed-li gallery list the html5
    tree gives each img the RIGHT <a> parent; literal nesting would walk
    into the previous list item."""
    from img_spark.functions.extract import _album_href

    html = (
        "<ul>"
        '<li><a href="/album/1"><img class="cov" src="/t/1.jpg">'
        '<li><a href="/album/2"><img class="cov" src="/t/2.jpg">'
        "</ul>"
    )
    doc = Document(html)
    covers = doc.select("img.cov")
    assert [_album_href(c) for c in covers] == ["/album/1", "/album/2"]


def test_check_next_on_unclosed_li_pagination():
    """C2 next-link positional heuristic over an unclosed-li pager: the
    current-page span's parent chain must be the html5 shape."""
    from img_spark.functions.extract import check_next

    html = (
        '<div class="pg"><ul>'
        '<li><a href="/g/1">1</a>'
        '<li><span class="current">2</span>'
        '<li><a href="/g/3">next</a>'
        "</ul></div>"
    )
    doc = Document(html)
    nexts = doc.select("div.pg a")
    got = check_next(nexts, "https://h.test/g/2")
    assert got == "https://h.test/g/3"


@pytest.mark.parametrize("html", [
    "<ul><li>a<li>b</ul>",
    "<p>one<p>two",
    "<table><tr><td>a<td>b</table>",
    '<div><a href="1">x<a href="2">y</div>',
    "<dl><dt>a<dd>b<dt>c</dl>",
    "<p>a<button><p>b</button>",
    "<h1>a<h2>b<h3>c",
])
def test_builders_agree_on_malformed(html):
    assert_equiv(html)
