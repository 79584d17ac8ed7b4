"""Property-based tests (SURVEY.md §5.2.6) and the config sanity check
(port of the reference's img::sanity_check_json, main.rs:1186-1240)."""

import json

from hypothesis import given, settings, strategies as st

from img_spark.functions.textops import (
    canonicalize,
    check_host,
    percent_encode,
    url_redirect_and_query_cleanup,
)
from img_spark.operators.seen import CuckooFilter

URL_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789./-_?&=%:#", max_size=60
)


@given(URL_CHARS, URL_CHARS)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_on_absolute(url, addr):
    """canonicalize output that starts with a scheme is a fixed point."""
    out = canonicalize(url, addr)
    if out.startswith("http"):
        assert canonicalize(out, addr) == out


@given(URL_CHARS)
@settings(max_examples=300, deadline=None)
def test_cleanup_idempotent(url):
    """query cleanup is idempotent when the input has no percent-escapes
    (decode happens once; already-decoded urls are fixed points)."""
    if "%" in url:
        return
    once = url_redirect_and_query_cleanup(url)
    assert url_redirect_and_query_cleanup(once) == once


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_percent_encode_charset(s):
    """encoded output only ever contains unreserved+safe chars; inputs
    without a literal '%' round-trip through percent-decoding. ('%' is
    in the reference's KEEP set, main.rs:563 — so '%00' stays '%00' and
    a decoder would mis-read it; faithful non-injectivity, not a bug.)"""
    from urllib.parse import unquote

    enc = percent_encode(s)
    for c in enc:
        assert c.isalnum() or c in ":/.-_?=%"
    if "%" not in s:
        assert unquote(enc, errors="strict") == s


@given(URL_CHARS)
@settings(max_examples=200, deadline=None)
def test_check_host_contains_dot(addr):
    h = check_host(addr)
    if h is not None:
        assert "." in h and "/" not in h


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=200))
@settings(max_examples=50, deadline=None)
def test_cuckoo_membership(hashes):
    """every inserted hash is reported seen afterwards (no false
    negatives — the cuckoo guarantee the crawl relies on), and
    probe_and_insert marks first occurrences new exactly once."""
    f = CuckooFilter(capacity=4096)
    flags = f.probe_and_insert(hashes)
    seen = set()
    for h, is_new in zip(hashes, flags):
        if h in seen:
            assert not is_new
        seen.add(h)
        assert f.contains_hash(h)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300),
       st.integers(min_value=1, max_value=32))
@settings(max_examples=50, deadline=None)
def test_salting_preserves_membership(hashes, partitions):
    """sharding by salt never loses membership: the union of per-salt
    filters answers exactly like processing sequentially."""
    shards = {}
    for h in hashes:
        salt = h % partitions
        shards.setdefault(salt, CuckooFilter(capacity=2048)).insert_hash(h)
    for h in hashes:
        assert shards[h % partitions].contains_hash(h)


def test_cuckoo_serialization_roundtrip():
    f = CuckooFilter(capacity=1024)
    for h in range(500):
        f.insert_hash(h * 2654435761)
    g = CuckooFilter.from_bytes(f.to_bytes())
    for h in range(500):
        assert g.contains_hash(h * 2654435761)
    assert g.count == f.count


def test_webjson_sanity():
    """Port of img::sanity_check_json (main.rs:1186-1240): the reference
    config must parse, and our loader must explode every domain; report
    duplicate domains and duplicate Img selectors (informational in the
    reference — asserted as structural sanity here)."""
    from img_spark.sources.site_config import load_site_config_rows

    rows = load_site_config_rows("/root/reference/src/web.json")
    cfg = json.load(open("/root/reference/src/web.json"))
    n_domains = sum(
        len([d for d in e["Site"].split(",") if d.strip()])
        for e in cfg
        if isinstance(e.get("Site"), str)
    )
    assert len(rows) == n_domains
    sites = [r[1] for r in rows]
    dup_sites = {s for s in sites if sites.count(s) > 1}
    # the shipped config has no duplicate domains
    assert not dup_sites
    # all selectors non-empty where present
    for _, site, img, nxt, alb in rows:
        assert site
        for sel in (img, nxt, alb):
            assert sel is None or sel.strip() == sel and sel != ""


# ---------------------------------------------------------------- WARC
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghij-._/:", min_size=1, max_size=30),
            st.binary(max_size=200),
            st.integers(min_value=200, max_value=599),
        ),
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_warc_roundtrip_survives_adversarial_bodies(recs):
    """Content-Length framing must carry ANY body bytes — including
    bodies that contain '\\r\\n\\r\\nWARC/1.0' or gzip magic — without
    desyncing record boundaries."""
    import datetime as dt

    from img_spark.sources.warc import build_warc, parse_warc

    poison = b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n\x1f\x8b"
    records = [
        (f"https://h.test/{u}", dt.datetime(2024, 1, 2, 3, 4, 5),
         body + poison, status)
        for u, body, status in recs
    ]
    out = list(parse_warc(build_warc(records)))
    assert len(out) == len(records)
    for (url, ts, body, status), r in zip(records, out):
        assert r["url"] == url
        assert r["date"] == ts
        assert r["http_status"] == status
        assert r["body"] == body


@given(st.integers(min_value=0, max_value=400), st.binary(max_size=40))
@settings(max_examples=300, deadline=None)
def test_warc_truncation_and_garbage_never_raise(cut, junk):
    """parse_warc on a truncated archive (any byte position) or with
    arbitrary junk appended yields a PREFIX of the records and never
    raises — crawl archives are corrupt by construction."""
    import datetime as dt

    from img_spark.sources.warc import build_warc, parse_warc

    blob = build_warc([
        ("https://a.test/1", dt.datetime(2024, 1, 1), b"<html>1</html>", 200),
        ("https://a.test/2", dt.datetime(2024, 1, 1), b"<html>2</html>", 200),
    ])
    full = [r["url"] for r in parse_warc(blob)]
    got = [r["url"] for r in parse_warc(blob[:cut])]
    assert got == full[:len(got)]  # always a clean prefix
    got2 = [r["url"] for r in parse_warc(blob + junk)]
    assert got2[:2] == full


def test_warc_streaming_parse_is_chunk_boundary_invariant(monkeypatch):
    """The streaming decompressor + incremental framer must produce
    identical records no matter where the gzip feed chunks fall — pin
    it by shrinking _GZ_CHUNK so every record straddles chunk edges."""
    import datetime as dt

    from img_spark.sources import warc

    records = [
        (f"https://h.test/p{i}", dt.datetime(2024, 1, 1),
         (f"<html>{'x' * (37 * i % 91)}{i}</html>").encode(), 200)
        for i in range(64)
    ]
    blob = warc.build_warc(records)
    want = [(r["url"], r["body"]) for r in warc.parse_warc(blob)]
    assert len(want) == 64
    for chunk in (1, 7, 64, 1 << 20):
        monkeypatch.setattr(warc, "_GZ_CHUNK", chunk)
        got = [(r["url"], r["body"]) for r in warc.parse_warc(blob)]
        assert got == want, f"chunk={chunk}"


def test_warc_many_member_archive_decompresses_in_linear_time():
    """ADVICE r3: feeding the whole remainder per gzip member made
    decompression O(bytes × members). With bounded-chunk feeding,
    32k members must decompress in well under a second of CPU."""
    import datetime as dt
    import time

    from img_spark.sources.warc import build_warc, parse_warc

    n = 32768
    blob = build_warc([
        (f"https://m.test/{i}", dt.datetime(2024, 1, 1), b"<html>m</html>",
         200)
        for i in range(n)
    ])
    t0 = time.perf_counter()
    count = sum(1 for _ in parse_warc(blob))
    wall = time.perf_counter() - t0
    assert count == n
    # quadratic behavior measured ~1.15s here; linear is ~0.1s.
    # 3s bound = linear with a generous shared-host margin.
    assert wall < 3.0, f"{wall:.2f}s for {n} members — quadratic regression?"


def test_warc_uncompressed_archive_parses_in_bounded_chunks():
    """Plain (non-gzip) WARC input must stream through the same
    bounded-slice path — one whole-archive chunk would make the record
    framer's buffer trim quadratic — and parse identically to the
    gzipped form."""
    import datetime as dt
    import gzip as _gz
    import time

    from img_spark.sources.warc import build_warc, parse_warc

    n = 20000
    records = [
        (f"https://u.test/{i}", dt.datetime(2024, 1, 1), b"<html>u</html>",
         200)
        for i in range(n)
    ]
    raw = b"".join(_gz.decompress(m) for m in (
        build_warc([r]) for r in records
    ))
    assert raw[:5] == b"WARC/"
    t0 = time.perf_counter()
    got = [r["url"] for r in parse_warc(raw)]
    wall = time.perf_counter() - t0
    assert got == [u for u, _, _, _ in records]
    # quadratic buffer-trim on a ~4.7MB raw archive would take minutes
    assert wall < 5.0, f"{wall:.2f}s — quadratic buffer trim?"


def test_warc_corrupt_mid_member_drops_record_not_truncates():
    """A bit-flipped gzip member must contribute NO record (its partial
    decompressed prefix would otherwise frame as a valid record with a
    silently truncated body) — everything before the corrupt member
    survives."""
    import datetime as dt

    from img_spark.sources.warc import build_warc, parse_warc

    recs = [
        (f"https://c.test/{i}", dt.datetime(2024, 1, 1),
         (b"<html>" + bytes(str(i), "ascii") * 2000 + b"</html>"), 200)
        for i in range(3)
    ]
    m = [build_warc([r]) for r in recs]
    # flip bytes deep inside member 1's deflate stream (past the header)
    bad = bytearray(m[1])
    for off in range(len(bad) // 2, len(bad) // 2 + 8):
        bad[off] ^= 0xFF
    blob = m[0] + bytes(bad) + m[2]
    out = list(parse_warc(blob))
    urls = [r["url"] for r in out]
    assert "https://c.test/1" not in urls  # dropped, never truncated
    assert urls[0] == "https://c.test/0"
    assert out[0]["body"] == recs[0][2]
    for r in out:  # no record may carry a short body
        assert r["body"].endswith(b"</html>")


def test_parse_sitemap_kernel():
    import gzip as _gz

    from img_spark.operators.fetch import parse_sitemap

    subs, pages = parse_sitemap(
        b"<sitemapindex><sitemap><loc>https://a/s.xml</loc></sitemap>"
        b"</sitemapindex>"
    )
    assert subs == ["https://a/s.xml"] and pages == []
    subs, pages = parse_sitemap(
        b"<urlset><url><loc>\n https://a/p?x=1&amp;y=2 </loc></url></urlset>"
    )
    assert subs == [] and pages == ["https://a/p?x=1&y=2"]
    assert parse_sitemap(_gz.compress(
        b"<urlset><url><loc>https://a/z</loc></url></urlset>"
    )) == ([], ["https://a/z"])
    # corrupt gzip / junk bodies: empty result, never a raise
    assert parse_sitemap(b"\x1f\x8bjunk") == ([], [])
    assert parse_sitemap(b"not xml at all") == ([], [])
    # namespace-prefixed serialization (ElementTree default output)
    assert parse_sitemap(
        b'<ns0:sitemapindex xmlns:ns0="http://www.sitemaps.org/schemas/'
        b'sitemap/0.9"><ns0:sitemap><ns0:loc>https://a/s.xml</ns0:loc>'
        b"</ns0:sitemap></ns0:sitemapindex>"
    ) == (["https://a/s.xml"], [])
    assert parse_sitemap(
        b"<ns0:urlset><ns0:url><ns0:loc>https://a/p</ns0:loc></ns0:url>"
        b"</ns0:urlset>"
    ) == ([], ["https://a/p"])


def test_warc_reader_yields_bounded_batches():
    """The pages-batch generator must flush every flush_rows records
    (peak task memory O(batch), not O(archive)) and the concatenation
    must equal the unchunked parse."""
    import datetime as dt

    import pandas as pd

    from img_spark.sources.warc import _page_batches, build_warc

    records = [
        (f"https://b.test/{i}", dt.datetime(2024, 1, 1, 0, 0, i % 60),
         f"<html>{i}</html>".encode(), 200)
        for i in range(1000)
    ]
    blob = build_warc(records)
    batches = list(_page_batches([blob], flush_rows=100))
    assert len(batches) >= 10  # many batches out of ONE archive
    assert all(len(b) <= 100 for b in batches)
    cat = pd.concat(batches, ignore_index=True)
    assert list(cat["url"]) == [u for u, _, _, _ in records]
    assert [bytes(h) for h in cat["html"]] == [h for _, _, h, _ in records]

    # byte-based flush: tiny byte budget → every batch is a single row
    bybytes = list(_page_batches([blob], flush_rows=10**9, flush_bytes=1))
    assert len(bybytes) >= 1000


def test_wet_reader_yields_bounded_batches():
    import datetime as dt

    import pandas as pd

    from img_spark.sources.warc import _text_batches, build_wet

    records = [
        (f"https://b.test/{i}", dt.datetime(2024, 1, 1), f"text {i}")
        for i in range(300)
    ]
    blob = build_wet(records)
    batches = list(_text_batches([blob], flush_rows=50))
    assert len(batches) >= 6
    cat = pd.concat(batches, ignore_index=True)
    assert list(cat["url"]) == [u for u, _, _ in records]
    assert list(cat["text"]) == [t for _, _, t in records]


# --- main-content extraction properties ------------------------------

_TAGSETS = st.sampled_from(
    ["div", "article", "section", "span", "p", "a", "td", "em"]
)
_WORDS = st.text(alphabet="abcdefghij ", min_size=0, max_size=30)


@st.composite
def _rand_html(draw, depth=0):
    """Random small HTML trees: nested tags with text, links, attrs."""
    if depth >= 3 or draw(st.booleans()):
        return draw(_WORDS)
    tag = draw(_TAGSETS)
    inner = "".join(
        draw(_rand_html(depth=depth + 1))
        for _ in range(draw(st.integers(0, 3)))
    )
    attr = ' href="/x"' if tag == "a" else ""
    return f"<{tag}{attr}>{inner}</{tag}>"


@given(_rand_html())
@settings(max_examples=200, deadline=None)
def test_main_text_is_subset_of_full_text(html):
    """The main block's non-whitespace characters are always a
    sub-multiset of the page's full visible characters — the scorer can
    only SELECT content, never invent or duplicate it. (Characters, not
    words: extract_text concatenates adjacent text nodes with no
    separator, so word boundaries differ across the two invariants.)"""
    from collections import Counter

    from img_spark.functions.extract import extract_text
    from img_spark.functions.maintext import main_content

    page = f"<body>{html}</body>"
    main, tag = main_content(page)
    full = Counter("".join(extract_text(page).split()))
    need = Counter("".join(main.split()))
    assert all(full[ch] >= n for ch, n in need.items()), (main, page)
    # a named container implies some text; no text implies no container
    assert (tag == "") == (main == "")


@given(_rand_html())
@settings(max_examples=100, deadline=None)
def test_main_text_parser_parity(html):
    """Fast and stdlib tree builders agree on the main block."""
    import os

    from img_spark.functions.maintext import main_content

    page = f"<body>{html}</body>"
    fast = main_content(page)
    os.environ["IMG_SPARK_HTML_PARSER"] = "stdlib"
    try:
        ref = main_content(page)
    finally:
        del os.environ["IMG_SPARK_HTML_PARSER"]
    assert fast == ref, page
