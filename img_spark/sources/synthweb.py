"""Deterministic synthetic web (FIXTURES.md §1.1/§3).

Builds the ``pages`` table — exactly the BASELINE input_hint shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
— plus matching site-config rows, seeds and robots rules. The sandbox has
no network, so this table IS the web: the crawl "fetch" is an equi-join
against it (SURVEY.md §2.1 S2).

Two modes:
- fixture_web(): a small 4-site graph covering every extraction branch
  (albums, pagination, css-only, json-mode, two-level) with hand-known
  goldens; used by tests and the driver correctness queries.
- bench_pages_df(): parametric H-hosts × A-albums × P-pages generation,
  distributed via mapInPandas over spark.range (no driver-side loop), with
  a deliberately skewed host 0 to exercise salting/AQE.

The ``text`` column is composed independently by the builder from the
literal text snippets it emits — NOT by running the extractor — so the
byte-identical-text invariant is a real oracle.
"""

from __future__ import annotations

import datetime as dt
import zlib

EPOCH = dt.datetime(2024, 10, 16, 0, 0, 0)


class Html:
    """Tiny builder that tracks emitted text nodes alongside markup, so
    the expected extracted text is known by construction."""

    def __init__(self):
        self.h: list = []
        self.t: list = []

    def raw(self, markup: str):
        self.h.append(markup)
        return self

    def text(self, s: str):
        self.h.append(s)
        self.t.append(s)
        return self

    def script(self, body: str):
        # script text is excluded from extracted text
        self.h.append(f"<script>{body}</script>")
        return self

    def style(self, body: str):
        self.h.append(f"<style>{body}</style>")
        return self

    def page(self, title: str):
        self.raw("<html><head><title>")
        self.text(title)
        self.raw("</title></head><body>")
        return self

    def done(self):
        self.raw("</body></html>")
        return "".join(self.h), "".join(self.t)


def _page_row(idx: int, url: str, html: str, text: str, lang: str = "en"):
    return (url, EPOCH + dt.timedelta(seconds=idx), html.encode(), text, lang)


# ---------------------------------------------------------------------------
# Fixture web: 4 sites, every branch
# ---------------------------------------------------------------------------

FIXTURE_CONFIG = [
    {"Site": "site-a.test", "Img": "div.photo img", "Next": "div.pg a",
     "Album": "div.alblist a"},
    {"Site": "site-c.test", "Img": "json: key | photourl", "Next": "<script>"},
    {"Site": "site-d.test", "Img": "a.thumb[href] | img.big"},
    # site-b.test intentionally absent: default img selector + raw CSS scan
]

FIXTURE_SEEDS = [
    "https://site-a.test/",
    "https://site-b.test/gallery",
    "https://site-c.test/g/1",
    "https://site-d.test/idx",
]

FIXTURE_ROBOTS = [
    # (host, path_prefix, allow, crawl_delay)
    ("site-a.test", "/private", False, 0.0),
    ("site-a.test", "/", True, 0.0),
    ("site-b.test", "/", True, 0.0),
    ("site-c.test", "/", True, 0.0),
    ("site-d.test", "/", True, 0.0),
]


def _site_a_pages(rows: list):
    """site-a.test: index → 2 albums × 3 paginated pages, each page with
    imgs; one disallowed-by-robots album; zh titles on album 2."""
    b = Html().page("Site A Index - Galleries")
    b.raw('<div class="alblist">')
    for a, label in ((1, "Album One"), (2, "相册二")):
        b.raw(f'<a href="/a{a}/1" title="Album {a}">')
        b.text(label)
        b.raw("</a>")
    b.raw('<a href="/private/x/1" title="Hidden">')
    b.text("Hidden Album")
    b.raw("</a>")
    b.raw("</div>")
    html, text = b.done()
    rows.append(_page_row(len(rows), "https://site-a.test/", html, text))

    for a in (1, 2):
        for p in (1, 2, 3):
            lang = "zh" if a == 2 else "en"
            title = (
                f"Album {a} Gallery Page {p}" if a == 1 else f"相册{a} 第{p}页"
            )
            b = Html().page(title)
            b.raw('<div class="photo">')
            for j in (1, 2):
                b.raw(f'<img src="/static/a{a}/p{p}/i{j}.jpg">')
            # one absolute + one dup to exercise counters
            b.raw(f'<img src="https://cdn-a.test/a{a}/p{p}/big.jpg">')
            b.raw(f'<img src="/static/a{a}/p{p}/i1.jpg">')
            b.raw("</div>")
            # last page emits NO anchors: a lone prev-href would be the
            # single-hit case (c) of check_next and loop the crawl back
            b.raw('<div class="pg">')
            if p > 1 and p < 3:
                b.raw(f'<a href="/a{a}/{p - 1}">')
                b.text("prev")
                b.raw("</a>")
            b.raw('<span class="current">')
            b.text(str(p))
            b.raw("</span>")
            if p < 3:
                b.raw(f'<a href="/a{a}/{p + 1}">')
                b.text("next page" if a == 1 else "下一页")
                b.raw("</a>")
            b.raw("</div>")
            html, text = b.done()
            rows.append(
                _page_row(len(rows), f"https://site-a.test/a{a}/{p}", html, text, lang)
            )

    # disallowed album (fetchable but robots must block it)
    b = Html().page("Hidden Gallery")
    b.raw('<div class="photo"><img src="/secret/1.jpg"></div>')
    html, text = b.done()
    rows.append(_page_row(len(rows), "https://site-a.test/private/x/1", html, text))


def _site_b_pages(rows: list):
    """site-b.test: no config → default ``img`` selector + raw CSS scan,
    embeds counted, redirect-unwrap, invalid-UTF-8 html."""
    b = Html().page("B Gallery - Mixed")
    b.style(".hero{background:url('/css/hero.jpg')} .x{src:url(/f.woff2)}")
    b.raw('<img src="/imgs/1.jpg">')
    b.raw('<img data-src="/imgs/lazy.jpg" src="/imgs/eager.jpg">')
    b.raw('<img src="data:image/gif;base64,R0lGOD">')
    b.raw('<img src="/r?url=https%3A%2F%2Fcdn-b.test%2Fdeep.png">')
    b.raw("<p>")
    b.text("Some gallery text.")
    b.raw("</p>")
    html, text = b.done()
    # splice invalid UTF-8 into the binary to exercise lossy decode
    raw = html.encode().replace(b"</body>", b"\xff\xfe</body>")
    text = text  # invalid bytes sit outside text nodes
    rows.append(
        (
            "https://site-b.test/gallery",
            EPOCH + dt.timedelta(seconds=len(rows)),
            raw,
            text + "��",
            "en",
        )
    )


def _site_c_pages(rows: list):
    """site-c.test: json-mode extraction + <script> numeric pagination."""
    for p in (1, 2):
        b = Html().page("ignored title")
        b.script(
            'var gal = {photourl:"https:\\u002F\\u002Fcdn-c.test\\u002Fg'
            + str(p)
            + '\\u002Fa.jpg",x:1};'
            'var g2 = {photourl:"https:\\u002F\\u002Fcdn-c.test\\u002Fg'
            + str(p)
            + '\\u002Fb.jpg"};'
        )
        b.script(f'var metaKeywords = "tag,Gallery C Part {p},t2";')
        b.raw("<p>")
        b.text(f"json gallery {p}")
        b.raw("</p>")
        html, text = b.done()
        rows.append(_page_row(len(rows), f"https://site-c.test/g/{p}", html, text))
    # page 3 exists but has no json hits → crawl stops there
    b = Html().page("C End")
    b.script("var nothing = 1;")
    b.raw("<p>")
    b.text("the end")
    b.raw("</p>")
    html, text = b.done()
    rows.append(_page_row(len(rows), "https://site-c.test/g/3", html, text))


def _site_d_pages(rows: list):
    """site-d.test: two-level selector — index links to photo pages whose
    ``img.big`` carries the real image."""
    b = Html().page("D Two-Level Index")
    for k in (1, 2):
        b.raw(f'<a class="thumb" href="/photo{k}.html">')
        b.text(f"thumb {k}")
        b.raw("</a>")
    html, text = b.done()
    rows.append(_page_row(len(rows), "https://site-d.test/idx", html, text))
    for k in (1, 2):
        b = Html().page(f"D Photo {k}")
        alt = ' alt="Pretty.jpg"' if k == 1 else ""
        b.raw(f'<img class="big" src="/full/{k}.jpg"{alt}>')
        html, text = b.done()
        rows.append(
            _page_row(len(rows), f"https://site-d.test/photo{k}.html", html, text)
        )


def fixture_web():
    """Returns (page_rows, config_entries, seeds, robots_rows)."""
    rows: list = []
    _site_a_pages(rows)
    _site_b_pages(rows)
    _site_c_pages(rows)
    _site_d_pages(rows)
    return rows, FIXTURE_CONFIG, FIXTURE_SEEDS, FIXTURE_ROBOTS


PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def fixture_pages_df(spark):
    rows, _, _, _ = fixture_web()
    return spark.createDataFrame(rows, PAGES_DDL)


# ---------------------------------------------------------------------------
# Bench-scale generation (distributed, deterministic, skewed)
# ---------------------------------------------------------------------------

def bench_layout(hosts: int, albums: int, pages_per_album: int, skew: int = 10):
    """Host 0 gets ``skew``× the albums of other hosts (named host-skew
    risk, SURVEY.md §7.8). Returns (total_rows, rows_of_host0)."""
    h0 = 1 + albums * skew * pages_per_album
    rest = (hosts - 1) * (1 + albums * pages_per_album)
    return h0 + rest, h0


def bench_config(hosts: int):
    return [
        {
            "Site": ",".join(f"site{h}.bench" for h in range(hosts)),
            "Img": "div.photo img",
            "Next": "div.pg a",
            "Album": "div.alblist a",
        }
    ]


def bench_seeds(hosts: int):
    return [f"http://site{h}.bench/" for h in range(hosts)]


def _bench_page(idx: int, hosts: int, albums: int, ppa: int, skew: int,
                imgs_base: int = 3, imgs_var: int = 5, text_repeat: int = 1):
    """Pure function id → page row (host 0 carries the skewed share)."""
    h0_rows = 1 + albums * skew * ppa
    if idx < h0_rows:
        h, rel, n_alb = 0, idx, albums * skew
    else:
        r = idx - h0_rows
        per = 1 + albums * ppa
        h, rel, n_alb = 1 + r // per, r % per, albums
    hostname = f"site{h}.bench"
    if rel == 0:
        b = Html().page(f"Index of {hostname}")
        b.raw('<div class="alblist">')
        for a in range(n_alb):
            b.raw(f'<a href="/a{a}/1" title="Album {a}">')
            b.text(f"Album {a} of {hostname}")
            b.raw("</a>")
        b.raw("</div>")
        html, text = b.done()
        return (f"http://{hostname}/", EPOCH + dt.timedelta(seconds=idx),
                html.encode(), text, "en")
    a, p = (rel - 1) // ppa, (rel - 1) % ppa + 1
    n_imgs = imgs_base + zlib.crc32(f"{h}/{a}/{p}".encode()) % imgs_var
    b = Html().page(f"Gallery {a} Page {p} - {hostname}")
    b.raw('<div class="photo">')
    for j in range(n_imgs):
        if j % 2 == 0:
            b.raw(f'<img src="/static/a{a}/p{p}/i{j}.jpg">')
        else:
            b.raw(f'<img src="http://cdn{h}.bench/a{a}/p{p}/i{j}.jpg">')
    b.raw("</div>")
    for rep in range(text_repeat):
        b.raw("<p>")
        b.text(
            f"Photo set {a}.{p} on {hostname} with {n_imgs} photos, "
            f"paragraph {rep} of descriptive filler text for weight. "
        )
        b.raw("</p>")
    # last page emits NO anchors (see fixture comment: single prev href
    # would be check_next case (c) and loop the crawl back)
    b.raw('<div class="pg">')
    if 1 < p < ppa:
        b.raw(f'<a href="/a{a}/{p - 1}">')
        b.text("prev")
        b.raw("</a>")
    b.raw('<span class="current">')
    b.text(str(p))
    b.raw("</span>")
    if p < ppa:
        b.raw(f'<a href="/a{a}/{p + 1}">')
        b.text("next page")
        b.raw("</a>")
    b.raw("</div>")
    html, text = b.done()
    return (f"http://{hostname}/a{a}/{p}", EPOCH + dt.timedelta(seconds=idx),
            html.encode(), text, "en")


def bench_pages_df(spark, hosts=8, albums=4, pages_per_album=6, skew=10,
                   imgs_base=3, imgs_var=5, text_repeat=1, partitions=None):
    """Distributed generation: spark.range → mapInPandas, one deterministic
    page per id. No driver-side materialization."""
    import pandas as pd

    total, _ = bench_layout(hosts, albums, pages_per_album, skew)

    def gen(batches):
        for pdf in batches:
            rows = [
                _bench_page(int(i), hosts, albums, pages_per_album, skew,
                            imgs_base, imgs_var, text_repeat)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    n_parts = partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return (
        spark.range(0, total, 1, n_parts)
        .mapInPandas(gen, schema=PAGES_DDL)
    )


# ---------------------------------------------------------------------------
# Two-level bench web (gallery pages link to photo pages; the real image
# sits on the photo page — main.rs:325-364's two-level selector mode)
# ---------------------------------------------------------------------------

def bench2l_config(hosts: int):
    return [
        {
            "Site": ",".join(f"site{h}.bench2" for h in range(hosts)),
            "Img": "a.thumb[href] | img.big",
            "Next": "div.pg a",
            "Album": "div.alblist a",
        }
    ]


def bench2l_seeds(hosts: int):
    return [f"http://site{h}.bench2/" for h in range(hosts)]


def bench2l_layout(hosts: int, albums: int, ppa: int, thumbs: int):
    """Rows per host: 1 index + albums×ppa gallery pages, each followed
    by its ``thumbs`` photo pages. Returns total rows."""
    return hosts * (1 + albums * ppa * (1 + thumbs))


def _bench2l_page(idx: int, hosts: int, albums: int, ppa: int, thumbs: int):
    per = 1 + albums * ppa * (1 + thumbs)
    h, rel = idx // per, idx % per
    hostname = f"site{h}.bench2"
    if rel == 0:
        b = Html().page(f"Index of {hostname}")
        b.raw('<div class="alblist">')
        for a in range(albums):
            b.raw(f'<a href="/a{a}/1" title="Album {a}">')
            b.text(f"Album {a}")
            b.raw("</a>")
        b.raw("</div>")
        html, text = b.done()
        return (f"http://{hostname}/", EPOCH + dt.timedelta(seconds=idx),
                html.encode(), text, "en")
    block, slot = (rel - 1) // (1 + thumbs), (rel - 1) % (1 + thumbs)
    a, p = block // ppa, block % ppa + 1
    if slot == 0:
        # gallery page: thumb links (the FIRST level) + pagination
        b = Html().page(f"Gallery {a} Page {p} - {hostname}")
        for j in range(thumbs):
            b.raw(f'<a class="thumb" href="/a{a}/p{p}/t{j}.html">')
            b.text(f"thumb {j}")
            b.raw("</a>")
        b.raw('<div class="pg">')
        if 1 < p < ppa:
            b.raw(f'<a href="/a{a}/{p - 1}">')
            b.text("prev")
            b.raw("</a>")
        b.raw('<span class="current">')
        b.text(str(p))
        b.raw("</span>")
        if p < ppa:
            b.raw(f'<a href="/a{a}/{p + 1}">')
            b.text("next page")
            b.raw("</a>")
        b.raw("</div>")
        html, text = b.done()
        return (f"http://{hostname}/a{a}/{p}",
                EPOCH + dt.timedelta(seconds=idx), html.encode(), text, "en")
    # photo page: the SECOND level, fetched by resolve_second_level
    j = slot - 1
    b = Html().page(f"Photo {a}.{p}.{j}")
    b.raw(f'<img class="big" src="http://cdn{h}.bench2/a{a}/p{p}/f{j}.jpg">')
    b.raw("<p>")
    b.text(f"photo page {a}.{p}.{j} on {hostname}")
    b.raw("</p>")
    html, text = b.done()
    return (f"http://{hostname}/a{a}/p{p}/t{j}.html",
            EPOCH + dt.timedelta(seconds=idx), html.encode(), text, "en")


def bench2l_pages_df(spark, hosts=16, albums=4, pages_per_album=4,
                     thumbs=6, partitions=None):
    """Distributed two-level corpus (same contract as bench_pages_df)."""
    import pandas as pd

    total = bench2l_layout(hosts, albums, pages_per_album, thumbs)

    def gen(batches):
        for pdf in batches:
            rows = [
                _bench2l_page(int(i), hosts, albums, pages_per_album, thumbs)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    n_parts = partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return spark.range(0, total, 1, n_parts).mapInPandas(gen, schema=PAGES_DDL)
