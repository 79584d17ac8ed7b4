"""Golden-fixture tests for the page-extraction kernel, one per branch
of the FIXTURES.md §2 matrix. Expected values hand-derived from
/root/reference/src/main.rs (cited per test)."""

from img_spark.functions.extract import (
    check_next,
    extract_second_level,
    parse_page,
)
from img_spark.functions.dom import Document


def page(html, addr="https://site-a.test/g/1", img=None, nxt=None, alb=None, **kw):
    return parse_page(html.encode(), addr, img, nxt, alb, **kw)


def wrap(body, title="My Album"):
    return f"<html><head><title>{title}</title></head><body>{body}</body></html>"


# ------------------------------------------------------- E1 default
def test_plain_img_default_selector():
    r = page(wrap('<img src="/a.jpg"><img src="b.jpg">'))
    assert r.status == "ok"
    # "/a.jpg" is host-rooted, "b.jpg" resolves against the addr dir (E6)
    assert r.imgs == ["https://site-a.test/a.jpg", "https://site-a.test/g/b.jpg"]
    assert r.origins == ["html", "html"]
    assert r.imgs_len == 2 and r.empty_dup == 0


# ------------------------------------------------------- P4 priority
def test_data_src_priority():
    r = page(wrap('<img data-src="/lazy.jpg" src="/eager.jpg">'))
    assert r.imgs == ["https://site-a.test/lazy.jpg"]
    r = page(wrap('<img data-lazy-src="/l.jpg" src="/e.jpg">'))
    assert r.imgs == ["https://site-a.test/l.jpg"]


# ------------------------------------------------------- P3 bracket attr
def test_bracket_attr_selector():
    r = page(
        wrap('<img data-original="/o.jpg" src="/s.jpg">'),
        img="img[data-original]",
    )
    assert r.imgs == ["https://site-a.test/o.jpg"]
    # a[href]: attr read is href
    r = page(wrap('<a href="/full.jpg"><img src="/t.jpg"></a>'), img="a[href]")
    assert r.imgs == ["https://site-a.test/full.jpg"]


# ------------------------------------------------------- D1/D4 counters
def test_empty_dup_counters():
    r = page(wrap('<img src="/a.jpg"><img src="/a.jpg"><img><img src="">'))
    assert r.imgs == ["https://site-a.test/a.jpg"]
    # dup + missing attr + empty value (main.rs:305-313)
    assert r.empty_dup == 3


# ------------------------------------------------------- P5 embeds
def test_embed_counted_not_saved():
    r = page(wrap('<img src="data:image/png;base64,AA"><img src="/a.jpg">'))
    assert r.imgs == ["https://site-a.test/a.jpg"]
    assert r.embed == 1


# ------------------------------------------------------- E7 style attr
def test_style_attr_css():
    r = page(
        wrap('<div class="bg" style="background:url(&#39;/s.jpg&#39;) no-repeat"></div>'),
        img="div.bg[style]",
    )
    # attr derived from [style] → style branch → url_image (main.rs:272-288)
    assert r.imgs == ["https://site-a.test/s.jpg"]


# ------------------------------------------------------- E3 raw CSS
def test_css_extraction_detail():
    # img_sel None → BOTH the raw-CSS scan (main.rs:117-121) and the
    # default "img" select (main.rs:163) contribute
    html = wrap('<style>.x{background:url("/c.png")}</style><img src="/h.jpg">')
    r = page(html)
    assert set(r.imgs) == {"https://site-a.test/c.png", "https://site-a.test/h.jpg"}
    assert dict(zip(r.imgs, r.origins))["https://site-a.test/c.png"] == "css"
    assert r.imgs_len == 2


def test_css_not_scanned_with_img_selector():
    html = wrap('<style>.x{background:url("/c.png")}</style><div class="p"><img src="/h.jpg"></div>')
    r = page(html, img="div.p img")
    assert r.imgs == ["https://site-a.test/h.jpg"]


# ------------------------------------------------------- E5 cleanup top-level
def test_redirect_cleanup_only_single_level():
    html = wrap('<img src="/r?url=https%3A%2F%2Fcdn.x%2Fi.jpg">')
    r = page(html)
    assert r.imgs == ["https://cdn.x/i.jpg"]


# ------------------------------------------------------- E2 json: key
def test_json_key_extraction():
    html = (
        "<html><head><title>ignored</title></head><body><script>"
        # real sites serialize JS object literals with unquoted keys:
        # NAME:"url" → the 2nd quote-token after NAME is the url (main.rs:139-146)
        'var data = {imgUrl:"https:\\u002F\\u002Fcdn.x\\u002F1.jpg"};'
        'var b = {imgUrl:"https:\\u002F\\u002Fcdn.x\\u002F2.jpg"};'
        "</script>"
        '<script>var metaKeywords = "short,Longest Title Here";</script>'
        "</body></html>"
    )
    r = page(html, img="json: key | imgUrl", nxt="<script>", addr="https://site-j.test/g/3")
    assert set(r.imgs) == {"https://cdn.x/1.jpg", "https://cdn.x/2.jpg"}
    assert r.origins == ["json", "json"]
    assert r.title == "Longest Title Here"
    # C3: numeric pagination
    assert r.next_url == "https://site-j.test/g/4"


def test_json_array_extraction():
    html = (
        "<html><body><script>"
        'var pics = {"picList":["\\u002Fa.jpg","\\u002Fb.jpg", ","]};'
        "</script>"
        '<script>metaKeywords:"One,Two Longer";</script>'
        "</body></html>"
    )
    r = page(html, img="json: array | picList", addr="https://site-j.test/g")
    assert set(r.imgs) == {"/a.jpg", "/b.jpg"}  # json urls NOT canonicalized
    assert r.title == "Two Longer"


def test_json_no_hits_falls_back_to_title():
    html = wrap("<script>nothing here</script>", title="Fallback T")
    r = page(html, img="json: key | imgUrl")
    # json_img empty → title element path; imgs_len 0 → 'empty' quit
    assert r.status == "empty"


# ------------------------------------------------------- E8 title paths
def test_title_cleanup_chain():
    r = page(wrap('<img src="/a.jpg">', title="Best Gallery - Site | Page 2"))
    # rsplit on /-_|– → segments: 'Best Gallery ', ' Site ', ' Page 2';
    # longest trimmed = 'Best Gallery' (12 > 6 > 6)
    assert r.title == "Best Gallery"
    assert r.dir_title == "Best Gallery"


def test_title_page_strip():
    r = page(wrap('<img src="/a.jpg">', title="Gallery Page 3"))
    assert r.dir_title == "Gallery"


def test_no_title_page():
    r = parse_page(b"<html><body><img src='/a.jpg'></body></html>",
                   "https://site-a.test/", None, None, None)
    assert r.status == "no_title"


# ------------------------------------------------------- ∅ quit
def test_empty_page():
    r = page(wrap("<p>nothing</p>"))
    assert r.status == "empty"
    assert r.imgs == [] and r.next_url == ""


# ------------------------------------------------------- bad host
def test_bad_host():
    r = parse_page(b"x", "ftp://site-a.test/", None, None, None)
    assert r.status == "bad_host"
    r = parse_page(b"x", "https://nodot/", None, None, None)
    assert r.status == "bad_host"


# ------------------------------------------------------- lossy decode
def test_lossy_decode_page():
    html = ("<html><head><title>T</title></head><body>"
            "<img src='/a.jpg'></body></html>").encode()
    broken = html.replace(b"<body>", b"<body>\xff\xfe")
    r = parse_page(broken, "https://site-a.test/", None, None, None)
    assert r.imgs == ["https://site-a.test/a.jpg"]
    assert "�" in r.text


# ------------------------------------------------------- E1 two-level + E9
def test_two_level_selector():
    html = wrap('<a class="thumb" href="/page1.html">x</a>'
                '<a class="thumb" href="/page2.html">y</a>')
    r = page(html, img='a.thumb[href] | img.big', addr="https://site-a.test/idx")
    assert r.second_level_sel == "img.big"
    assert r.first_level_urls == [
        "https://site-a.test/page1.html",
        "https://site-a.test/page2.html",
    ]
    assert r.imgs == []  # filled by pass 2
    # pass 2: hardcoded src attr, title/alt ext whitelist (main.rs:340-364)
    fetched = [
        wrap('<img class="big" src="/full1.jpg" title="Nice.JPG">').encode(),
        wrap('<img class="big" src="/full2.jpg" alt="not-an-image">').encode(),
        wrap('<img class="big" src="/full2.jpg" alt="x.png?q">').encode(),
    ]
    out = extract_second_level(fetched, "img.big", "https://site-a.test/idx")
    assert out == [
        "https://site-a.test/full1.jpg | Nice.JPG",
        "https://site-a.test/full2.jpg",
    ]


# ------------------------------------------------------- C4 albums
def test_album_href_on_self():
    html = wrap('<div class="t"><a href="/alb1">A1</a></div>'
                '<div class="t"><a href="/alb2">A2</a></div>')
    r = page(html, alb="div.t a", addr="https://site-a.test/")
    assert r.status == "ok" and r.imgs == []
    assert r.albums == ["https://site-a.test/alb1", "https://site-a.test/alb2"]
    assert r.album_titles == ["A1", "A2"]
    assert r.albums_len == 2


def test_album_href_on_ancestor_and_descendant():
    html = wrap(
        # href on parent
        '<a href="/p-alb"><em class="t">T1</em></a>'
        # href on grandparent
        '<a href="/gp-alb"><span><em class="t" title="T2">x</em></span></a>'
        # no ancestor href → first a[href] under grandparent
        '<div><span><em class="t" alt="T3">y</em></span><a href="/d-alb">z</a></div>'
    )
    r = page(html, alb="em.t", addr="https://site-a.test/")
    assert r.albums == [
        "https://site-a.test/p-alb",
        "https://site-a.test/gp-alb",
        "https://site-a.test/d-alb",
    ]
    assert r.album_titles == ["T1", "T2", "T3"]


def test_album_policy():
    html = wrap('<div class="t"><a href="/a1">1</a></div>'
                '<div class="t"><a href="/a2">2</a></div>')
    assert page(html, alb="div.t a", album_policy="none").albums == []
    assert page(html, alb="div.t a", album_policy="first-1").albums == [
        "https://site-a.test/a1"
    ]


def test_albums_ignored_when_imgs_present():
    # (true, true): download imgs, do NOT follow albums (main.rs:239-241,260)
    html = wrap('<img src="/i.jpg"><div class="t"><a href="/a1">1</a></div>')
    r = page(html, alb="div.t a")
    assert r.imgs == ["https://site-a.test/i.jpg"] and r.albums == []


# ------------------------------------------------------- C2 next-link cases
def nx(body, sel, cur="https://site-a.test/list/2"):
    d = Document(wrap(body))
    return check_next(d.select(sel), cur)


def test_next_case_c_single_href():
    assert nx('<a class="next" href="/list/3">→</a>', "a.next") == \
        "https://site-a.test/list/3"


def test_next_case_b_i_parent():
    # case b fires only when the <i> itself HAS an href (main.rs:798,809):
    # an href-less <i> falls into case a instead
    assert nx('<a href="/list/3"><i class="arrow" href="#self">x</i></a>',
              "i.arrow") == "https://site-a.test/list/3"


def test_next_case_a_span_current_siblings():
    body = ('<div class="pg">'
            '<a href="/list/1">1</a>'
            '<span class="current">2</span>'
            '<a href="/list/3">3</a>'
            '<a href="/list/4">4</a>'
            "</div>")
    # selector hits the single span → walk parent children, split on the
    # "current" marker, last group, first <a> (main.rs:798-808)
    assert nx(body, "div.pg span") == "https://site-a.test/list/3"


def test_next_case_a_single_span_no_marker():
    body = ('<div class="pg"><a href="/list/1">1</a>'
            "<span>2</span>"
            '<a href="/list/3">3</a></div>')
    # splitter false but span-count==1 → still splits on the span
    assert nx(body, "div.pg span") == "https://site-a.test/list/3"


def test_next_case_d_div_two_hits():
    body = ('<div class="nav">'
            '<a href="/list/1">1</a>'
            '<a class="cur" href="/list/2">2</a>'
            '<a href="/list/3">3</a>'
            "</div>"
            '<div class="nav">other</div>')
    # 2 hits, first is div → split div children on splitter(first-child
    # or self), last group first <a>  (main.rs:816-826)
    assert nx(body, "div.nav") == "https://site-a.test/list/3"


def test_next_case_e_text_next():
    body = ('<div class="p"><a href="/list/1">1</a>'
            '<a href="/list/3">next page</a></div>')
    assert nx(body, "div.p a") == "https://site-a.test/list/3"


def test_next_case_e_text_cjk():
    body = ('<div class="p"><a href="/list/1">1</a>'
            '<a href="/list/3">下一页</a></div>')
    assert nx(body, "div.p a") == "https://site-a.test/list/3"


def test_next_case_e_title_attr():
    body = ('<div class="p"><a href="/list/1">1</a>'
            '<a href="/list/3" title="Next"><img src="/arrow.png"></a></div>')
    # no text → title attr probed. NOTE <img> child has no text.
    assert nx(body, "div.p a") == "https://site-a.test/list/3"


def test_next_case_f_positional():
    body = ('<div class="p">'
            '<a href="/list/1">1</a>'
            '<a href="/list/2">2</a>'
            '<a href="/list/3">3</a>'
            "</div>")
    # no next/下 text → positional: cur ends with /list/2 → take pos+1
    assert nx(body, "div.p a") == "https://site-a.test/list/3"


def test_next_case_f_page1_suffix():
    body = ('<div class="p">'
            '<a href="?page=1">1</a>'
            '<a href="?page=2">2</a>'
            "</div>")
    assert nx(body, "div.p a", cur="https://site-a.test/list") == \
        "https://site-a.test/?page=2"


def test_next_terminators():
    # self-link, '#', '/' all terminate (main.rs:889-891)
    assert nx('<a class="n" href="/list/2">2</a>', "a.n") == ""
    assert nx('<a class="n" href="#">#</a>', "a.n") == ""
    assert nx('<a class="n" href="/">/</a>', "a.n") == ""
    assert nx("<p>none</p>", "a.n") == ""


def test_next_positional_at_end():
    body = '<div class="p"><a href="/list/1">1</a><a href="/list/2">2</a></div>'
    # cur matches the LAST hit → no next (main.rs:871-878)
    assert nx(body, "div.p a") == ""


def test_extract_web_assets_kernel():
    """srcset/link-icon/@import extraction (north_star asset surface)."""
    from img_spark.functions.extract import extract_web_assets

    html = (
        '<html><head><link rel="shortcut icon" href="/f.ico">'
        '<link rel="stylesheet" href="/skip.css">'
        '<style>@import url(\'/c/a.css\');@import "/c/b.css";</style>'
        '</head><body>'
        '<img src="/i.jpg" srcset="/i-320.jpg 320w,/i-640.jpg 640w">'
        '<picture><source srcset="//cdn.t/x.webp 2x"></picture>'
        '<img srcset="">'
        "</body></html>"
    )
    out = extract_web_assets(html.encode(), "https://h.test/p/1")
    assert out == sorted([
        ("https://h.test/f.ico", "icon"),
        ("https://h.test/c/a.css", "import"),
        ("https://h.test/c/b.css", "import"),
        ("https://h.test/i-320.jpg", "srcset"),
        ("https://h.test/i-640.jpg", "srcset"),
        ("https://cdn.t/x.webp", "srcset"),
    ])


def test_scan_css_chain_kernel():
    """One @import chain level: images + deeper imports, canonicalized
    against the css file url; .css targets of url() stay rejected."""
    from img_spark.functions.extract import scan_css

    imgs, imps = scan_css(
        '.a{background:url(/i/x.png)} @import url("/c/deep.css");'
        " @import 'rel.css';",
        "https://h.test/css/a.css",
    )
    assert imgs == ["https://h.test/i/x.png"]
    assert imps == [
        "https://h.test/c/deep.css",
        "https://h.test/css/rel.css",
    ]
