"""Equivalence of the fast regex tree builder vs the stdlib html.parser
reference, over fixtures, bench pages and adversarial snippets."""

import os

import pytest
from hypothesis import given, settings, strategies as st

from img_spark.functions import dom as dom_mod
from img_spark.functions.dom import Document, Element, Text, _fast_parse, _TreeBuilder


def stdlib_tree(html: str, flag=None):
    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        # html.parser raises on some pathological marked sections
        # ('<![1'); the truncated tree it leaves behind is an artifact,
        # not reference behavior — callers may skip comparison
        if flag is not None:
            flag.append(True)
    return b.root


def dump(node, out, depth=0):
    """Adjacent text nodes are coalesced: chunk boundaries differ
    between the builders but are unobservable (text()/extract_text
    concatenate); node EXISTENCE and content are what matter."""
    for c in node._children:
        if isinstance(c, Text):
            if out and out[-1][0] == depth and out[-1][1] == "#text":
                out[-1] = (depth, "#text", out[-1][2] + c.data)
            else:
                out.append((depth, "#text", c.data))
        else:
            out.append((depth, c._tag, tuple(sorted(c.attrs.items()))))
            dump(c, out, depth + 1)
    return out


def assert_equiv(html: str):
    raised: list = []
    ref = stdlib_tree(html, raised)
    if raised:
        return  # stdlib parser crashed mid-input; no reference to match
    a = dump(_fast_parse(html), [])
    b = dump(ref, [])
    assert a == b, (html[:200], [x for x, y in zip(a, b) if x != y][:3],
                    len(a), len(b))


ADVERSARIAL = [
    "",
    "plain text only",
    "<html><body><p>a<p>b</p></body></html>",
    '<a href="/x?a=1&amp;b=2" title="&quot;q&quot;">A&amp;B &lt;x&gt;</a>',
    "<div><img src='/i.jpg'><br><p>t</p></div>",
    "<ul><li>a<li>b</ul>",  # unclosed li
    "<b><i>cross</b></i> nest",
    "<script>if (a < b && c > d) { x = '</div>'; }</script>after",
    "<SCRIPT>UPPER</SCRIPT>x",
    "<script src='x.js'></script>",
    "<style>.a{content:'<b>'}</style>",
    "<!-- comment <b>inside</b> --><p>after</p>",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<?php echo 1 ?><p>x</p>",
    "<div data-a data-b='2' C=3 d=\"4\">x</div>",
    "<div class='a' class='b'>dup attr</div>",
    "<img src=/unquoted/path.jpg alt=hi>",
    "<br/><hr /><input type='text'/>",
    "<div>broken < not a tag</div>",
    "<div>trailing <",
    "<p>&notareal; &amp stray &#65; &#x41;</p>",
    "<div><span>deep</div></span>",  # wrong close order
    "<td>no table</td>",
    "<a href=''>empty</a>",
    "<div\nclass='ml'\nid='x'>multiline</div>",
    "<div>ünïcödé 中文 🙂</div>",
    "<title>T &amp; T</title>",
    "<script>no close tag at all",
    "<style>a{}</style",
    "<img src='a.jpg' />text<img src='b.jpg'/>",
]


@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_adversarial_equiv(idx):
    assert_equiv(ADVERSARIAL[idx])


def test_fixture_pages_equiv():
    from img_spark.sources.synthweb import fixture_web
    from img_spark.functions.textops import lossy_decode

    rows, _, _, _ = fixture_web()
    for r in rows:
        assert_equiv(lossy_decode(r[2]))


def test_bench_pages_equiv():
    from img_spark.sources.synthweb import _bench_page

    for i in range(0, 400, 7):
        r = _bench_page(i, 64, 24, 12, 4, 12, 7, 6)
        assert_equiv(r[2].decode())


@given(st.text(alphabet="<>/='\"abc &;#x1!-\n ", max_size=80))
@settings(max_examples=500, deadline=None)
def test_property_equiv(s):
    assert_equiv(s)


def test_fast_is_default_and_faster():
    from img_spark.sources.synthweb import _bench_page
    import time

    pages = [
        _bench_page(i, 64, 24, 12, 4, 12, 7, 6)[2].decode() for i in range(150)
    ]
    import statistics

    for h in pages[:10]:
        _fast_parse(h)
        stdlib_tree(h)
    fast, std = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        for h in pages:
            _fast_parse(h)
        fast.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        for h in pages:
            stdlib_tree(h)
        std.append(time.perf_counter() - t0)
    assert statistics.median(fast) < statistics.median(std)  # the point


@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_doc_text_matches_walk(idx):
    """The parse-time doc_text list equals the tree walk (and both
    builders agree) — extract_text's fast path is exact."""
    from img_spark.functions.extract import _walk_text

    html = ADVERSARIAL[idx]
    for root in (_fast_parse(html), stdlib_tree(html)):
        if root is None:
            continue
        walked: list = []
        _walk_text(root, walked)
        assert "".join(getattr(root, "doc_text", walked)) == "".join(walked)
