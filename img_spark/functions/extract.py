"""Page-extraction kernel: the reference's ``parse()`` (main.rs:114-498)
re-expressed as a pure function of ``(html bytes, url, selectors)``.

This is the byte-parity surface: per page it must produce the same
discovered-image URL set, next link, album URL list and title as the
reference. It is invoked per Arrow batch from the Spark layer
(img_spark.operators.extract_udf) — never per row from the driver.

Engine deviations from the reference (all terminal-behavior only):
- reference ``quit!``/``unwrap`` panics (missing title, href unwraps)
  become row-level statuses / empty results instead of aborting the job;
- the interactive album Y/N/All prompt (main.rs:412-468) becomes the
  ``album_policy`` config; default ``'all'`` ≙ answering ``A``;
- the two-level re-fetch (main.rs:325-338) is split out: the kernel
  reports ``second_level_sel`` + first-level URLs, the Spark layer joins
  them against the pages table and calls ``extract_second_level``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .dom import Document, Element
from .textops import (
    IMAGE_EXTS,
    SEP,
    CSS_MARKERS,
    ascii_lower,
    canonicalize,
    check_host,
    clean_title,
    css_image,
    final_title,
    lossy_decode,
    meta_keywords_title,
    rust_max_by_key,
    script_numeric_next,
    trim_end_matches,
    url_image,
    url_redirect_and_query_cleanup,
)


@dataclass
class PageResult:
    status: str = "ok"  # ok | no_title | empty | bad_host
    title: str = ""          # t after segment selection (message title)
    dir_title: str = ""      # t after suffix cleanup (download dir, F12 input)
    imgs: list = field(default_factory=list)        # sorted discovered set
    origins: list = field(default_factory=list)     # 'html'|'css'|'json' per img
    next_url: str = ""
    albums: list = field(default_factory=list)      # document order
    album_titles: list = field(default_factory=list)
    empty_dup: int = 0
    embed: int = 0
    albums_len: int = 0
    imgs_len: int = 0
    json_len: int = 0
    text: str = ""
    # readability-lite main content (functions/maintext.py); computed
    # only when parse_page(main_text=True) — an extra tree walk the
    # image-crawl hot path doesn't pay unless the pipeline curates text
    main_text: str = ""
    second_level_sel: str = ""   # non-empty → Spark layer must run pass 2
    first_level_urls: list = field(default_factory=list)


def extract_text(html: str) -> str:
    """Deterministic text extraction for the ``text``-column invariant:
    all text-node data in document order, excluding <script>/<style>
    subtrees, concatenated as-is (no added separators)."""
    return extract_text_from(Document(html))


def extract_text_from(doc: Document) -> str:
    # the fast tree builder records non-script/style text in document
    # order during the parse itself — no second tree walk
    cached = getattr(doc.root, "doc_text", None)
    if cached is not None:
        return "".join(cached)
    parts: list = []
    _walk_text(doc.root, parts)
    return "".join(parts)


from .dom import Text as _Text  # noqa: E402


def _walk_text(el, parts):
    for c in el._children:
        if isinstance(c, _Text):
            parts.append(c.data)
        elif c._tag not in ("script", "style"):
            _walk_text(c, parts)


def parse_page(
    html_bytes: bytes,
    addr: str,
    img_sel,
    next_sel,
    album_sel,
    album_policy: str = "all",
    main_text: bool = False,
) -> PageResult:
    r = PageResult()
    if check_host(addr) is None:
        r.status = "bad_host"
        return r
    html = lossy_decode(html_bytes)
    page = Document(html)  # parse ONCE; text + extraction share the tree
    r.text = extract_text_from(page)
    if main_text:
        from .maintext import main_content_from

        r.main_text = main_content_from(page)[0]

    # E3: raw-CSS scan only when the site has no Img selector (main.rs:117-121)
    css_img = css_image(html, addr) if img_sel is None else set()

    sels = tuple(img_sel.split(SEP, 1)) if (img_sel and SEP in img_sel) else None
    sel = sels[0] if sels else img_sel

    json_img: set = set()
    html_img: list = []
    if sel is not None and sel.startswith("json:"):
        # E2 (main.rs:130-161): pure string splitting, NOT a JSON parser
        kind = _trim_start(sel, "json:").strip()
        # the reference unwrap-panics on a json selector without a
        # " | NAME" pair (main.rs:132); engine: no extraction
        name = sels[1].strip() if sels else ""
        for s in page.select("script") if name else []:
            t = s.text()
            if t is None:
                continue
            for u in t.split(name)[1:]:
                if kind == "key":
                    parts = u.split('"')
                    if len(parts) > 1:
                        json_img.add(parts[1].replace("\\u002F", "/"))
                elif kind == "array":
                    body = _split_brackets(u)
                    if body is None:
                        continue
                    for x in body.split('"'):
                        if x.strip() and x.strip() != ",":
                            json_img.add(x.replace("\\u002F", "/"))
    else:
        html_img = page.select(sel if sel is not None else "img")

    # P3 attr derivation (main.rs:166-173)
    if sel is None:
        attr = "src"
    else:
        toks = sel.split()
        last = toks[-1] if toks else ""
        segs = _split_any(last, "[]")
        attr = segs[-2] if len(segs) >= 2 else "src"

    # E8 title (main.rs:175-211)
    if json_img:
        title = None
        for s in page.select("script"):
            t = s.text()
            if t is not None and "metaKeywords" in t:
                title = meta_keywords_title(t)
                break
        if title is None:
            r.status = "no_title"
            return r
    else:
        titles = page.select("title")
        if not titles:
            r.status = "no_title"  # reference quits (main.rs:196-199)
            return r
        title = titles[0].text()
        if title is None:
            r.status = "no_title"  # "NO title text" (main.rs:202)
            return r

    t = clean_title(title)
    r.title = t

    album_elements = page.select(album_sel) if album_sel is not None else None
    has_album = album_sel is not None and bool(album_elements)
    r.albums_len = len(album_elements) if album_elements is not None else 0
    r.json_len = len(json_img)
    r.imgs_len = len(html_img) + len(css_img) + len(json_img)

    if not has_album and r.imgs_len == 0:
        # reference quits the whole process here (main.rs:246); engine:
        # terminal page, nothing discovered, no next link.
        r.status = "empty"
        return r

    r.dir_title = final_title(t)

    imgs: dict = {}  # url -> origin, insertion-ordered
    if r.imgs_len > 0:
        urls: set = set()
        empty_dup = 0
        embed = 0
        for elm in html_img:
            value = None
            for a in ("data-src", "data-lazy", "data-lazy-src", attr):
                v = elm.attr(a)
                if v is not None:
                    value = v
                    break
            if value is None:
                empty_dup += 1
                continue
            if attr == "style":
                # E7 (main.rs:272-288)
                frag = None
                vt = value.strip()
                for m in CSS_MARKERS:
                    if m in vt:
                        frag = vt.split(m, 1)[1]
                        break
                if frag is not None:
                    u = url_image(frag)
                    if u is not None:
                        if u.startswith("data:image/"):
                            embed += 1  # feature `embed` off (main.rs:277-283)
                        else:
                            cu = canonicalize(u, addr)
                            if cu in urls:
                                empty_dup += 1
                            else:
                                urls.add(cu)
                                imgs[cu] = "html"
            elif value.startswith("data:image/"):
                embed += 1  # main.rs:289-296
            else:
                # E5 cleanup only for single-level selectors (sel == img,
                # main.rs:298-302)
                url = url_redirect_and_query_cleanup(value) if sels is None else value
                if not url:
                    empty_dup += 1
                else:
                    cu = canonicalize(url, addr)
                    if cu in urls:
                        empty_dup += 1
                    else:
                        urls.add(cu)
                        imgs[cu] = "html"
        r.empty_dup = empty_dup
        r.embed = embed

        if sels is not None and not sel.startswith("json:"):
            # two-level: Spark layer re-fetches these and runs pass 2.
            # json-mode selectors also contain " | " but their url set at
            # this point is always empty, so the reference's re-fetch
            # (main.rs:325-338) is a no-op there — json imgs survive the
            # chain into the sink (main.rs:367).
            r.second_level_sel = sels[1]
            r.first_level_urls = sorted(urls)
            imgs = {}
        for u in sorted(css_img):
            if u not in imgs:
                imgs[u] = "css"
        for u in sorted(json_img):
            if u not in imgs:
                imgs[u] = "json"
        r.imgs = list(imgs.keys())
        r.origins = [imgs[u] for u in r.imgs]

    if has_album and r.imgs_len == 0:
        # C4 album recursion (main.rs:369-471); policy 'all' ≙ answer A.
        if album_policy != "none":
            limit = len(album_elements)
            if album_policy.startswith("first-"):
                limit = int(album_policy.split("-", 1)[1])
            for alb in album_elements[:limit]:
                href = _album_href(alb)
                if href:
                    r.albums.append(canonicalize(href, addr))
                    r.album_titles.append(_album_title(alb))

    # next page (main.rs:475-497)
    if next_sel is None:
        r.next_url = ""
    elif next_sel == "<script>":
        r.next_url = script_numeric_next(addr, r.json_len)
    else:
        r.next_url = check_next(page.select(next_sel), addr)
    return r


def extract_second_level(fetched_html, right_sel: str, addr: str) -> list:
    """Two-level pass 2 (main.rs:338-364): over the fetched first-level
    pages, select ``right_sel``, read hardcoded ``src``, whitelist
    title/alt by image extension (P7), canonicalize against the ORIGINAL
    page address. The reference parses the concatenation of all fetched
    bodies; parsing each body separately yields the same element set for
    well-formed pages. Returns the sorted deduped url set."""
    urls: set = set()
    for hb in fetched_html:
        page = Document(lossy_decode(hb) if isinstance(hb, (bytes, bytearray)) else hb)
        for e in page.select(right_sel):
            src = e.attr("src")
            if src is None:
                continue  # reference unwrap-panics (main.rs:341)
            title_alt = None
            for a in ("title", "alt"):
                x = e.attr(a)
                if x is None:
                    continue
                at = x.strip()
                if at:
                    dot = at.rfind(".")
                    if dot != -1 and any(
                        ascii_lower(at[dot:]) == ext for ext in IMAGE_EXTS
                    ):
                        title_alt = x
                        break
            u = canonicalize(src, addr)
            urls.add(f"{u}{SEP}{title_alt}" if title_alt is not None else u)
    return sorted(urls)


# --------------------------------------------------------------------------
# Web-asset extraction beyond the reference parser (north_star surface:
# "img/src, srcset, link/icon, CSS url(...) and @import chains" —
# BASELINE.json). The reference only does src/url(); srcset, icon links
# and @import targets are engine extensions, kept OUT of parse_page so
# reference parity is untouched.
# --------------------------------------------------------------------------

import re as _re_assets

_IMPORT_RE = _re_assets.compile(
    r"""@import\s+(?:url\(\s*)?["']?([^"'()\s;]+)"""
)


def extract_web_assets(html_bytes, addr: str) -> list:
    """Returns sorted (asset_url, kind) pairs: ``srcset`` candidates of
    <img>/<source>, ``icon`` hrefs of <link rel~=icon>, ``import``
    targets of CSS @import chains (url() and string form, raw scan so
    inline <style> and style attributes are both covered)."""
    html = lossy_decode(html_bytes) if isinstance(
        html_bytes, (bytes, bytearray)
    ) else html_bytes
    page = Document(html)
    out: set = set()
    for sel in ("img", "source"):
        for el in page.select(sel):
            ss = el.attr("srcset")
            if not ss:
                continue
            for cand in ss.split(","):
                toks = cand.strip().split()
                if toks:
                    out.add((canonicalize(toks[0], addr), "srcset"))
    for el in page.select("link"):
        rel = el.attr("rel")
        if rel is None:
            continue
        tokens = ascii_lower(rel).split()
        if any(t in ("icon", "apple-touch-icon", "shortcut") for t in tokens):
            href = el.attr("href")
            if href:
                out.add((canonicalize(href, addr), "icon"))
    for m in _IMPORT_RE.finditer(html):
        out.add((canonicalize(m.group(1), addr), "import"))
    return sorted(out)


def scan_css(css_text: str, base_url: str):
    """One level of a CSS @import chain: image urls via the reference's
    url(/image(/image-set( scan (fonts/css rejected by url_image), plus
    deeper @import targets (url() and string form), both canonicalized
    against the css file's own url. Returns (sorted imgs, sorted imports)."""
    imgs = sorted(css_image(css_text, base_url))
    imports = sorted(
        {canonicalize(m.group(1), base_url)
         for m in _IMPORT_RE.finditer(css_text)}
    )
    return imgs, imports


# --------------------------------------------------------------------------
# C2: next-link heuristic engine (main.rs:769-896)
# --------------------------------------------------------------------------

def _splitter(e: Element) -> bool:
    c = e.attr("class")
    if c is not None and any(x in c for x in ("cur", "now", "active")):
        return True
    return e.attr("aria-current") is not None


def _slice_split(items, pred):
    """Rust ``slice::split`` parity: separators removed, trailing
    separator yields a trailing empty group, always ≥1 group."""
    groups = [[]]
    for e in items:
        if pred(e):
            groups.append([])
        else:
            groups[-1].append(e)
    return groups


def _set_next(tags) -> str:
    """main.rs:776-792."""
    tag = None
    for e in tags:
        ch = e.children()
        if e.tag() == "a" or (ch and ch[0].tag() == "a"):
            tag = e
            break
    if tag is None:
        return ""
    t = tag.text()
    if (t is None or t.strip() == "") and not tag.children():
        return ""
    href = tag.attr("href")
    if href is None:
        ch = tag.children()
        href = ch[0].attr("href") if ch else None
    return href if href is not None else ""  # reference unwrap-panics


def check_next(nexts, cur: str) -> str:
    if not nexts:
        next_link = ""
    elif len(nexts) == 1:
        el = nexts[0]
        if el.tag() == "span" or el.attr("href") is None:
            parent = el.parent()
            items = parent.children() if parent is not None else []
            span_count = sum(1 for x in items if x.tag() == "span")
            groups = _slice_split(
                items,
                lambda e: (e.tag() == "span" or e.attr("href") is None)
                and (_splitter(e) or span_count == 1),
            )
            next_link = _set_next(groups[-1])
        elif el.tag() == "i":
            p = el.parent()
            h = p.attr("href") if p is not None else None
            next_link = h if h is not None else ""
        else:
            next_link = el.attr("href") or ""
    else:
        el = nexts[0]
        if el.tag() == "div" and len(nexts) == 2:
            items = el.children()

            def pred(e):
                ch = e.children()
                if ch:
                    return _splitter(ch[0])
                return e.tag() == "span" or _splitter(e)

            next_link = _set_next(_slice_split(items, pred)[-1])
        else:
            found = None
            for n in reversed(nexts[-2:]):  # rfind over the last two
                if _is_nextish(n):
                    found = n
                    break
            if found is not None:
                next_link = found.attr("href") or ""
            else:
                # positional: locate current page among hits (main.rs:861-879)
                pos = None
                for i in range(len(nexts) - 1, -1, -1):
                    h = nexts[i].attr("href")
                    if h is None:
                        continue
                    ht = h.strip()
                    if (
                        cur.strip().endswith(ht)
                        or ht == "#"
                        or any(
                            (trim_end_matches(cur, "/") + suffix).endswith(ht)
                            for suffix in ("/1", "?page=1")
                        )
                    ):
                        pos = i
                        break
                if pos is not None and pos < len(nexts) - 1:
                    next_link = nexts[pos + 1].attr("href") or ""
                else:
                    next_link = ""

    # P8 self/`#`/`/` guards (main.rs:889-891); ends_with("") is True so
    # an empty link stays empty.
    if cur.strip().endswith(next_link) or next_link.strip() in ("#", "/"):
        next_link = ""
    return canonicalize(next_link, cur)


def _is_nextish(n: Element) -> bool:
    """main.rs:828-857: text / title / span.currenttext contains
    next/下, or has text and a ``target`` attr."""

    def nxt(s: str) -> bool:
        s = ascii_lower(s)
        return "下" in s or "next" in s

    t = n.text()
    if t is not None and t.strip() == "":
        t = None
    if t is not None:
        return nxt(t) or n.attr("target") is not None
    t = n.attr("title")
    if t is not None:
        return nxt(t)
    span = n.select("span.currenttext")
    if not span:
        return False
    t = span[0].text()
    return nxt(t) if t is not None else False


# --------------------------------------------------------------------------
# C4 helpers
# --------------------------------------------------------------------------

def _album_href(alb: Element):
    """main.rs:374-396: self href, else parent/grandparent href, else
    first ``a[href]`` under the last-probed ancestor."""
    href = alb.attr("href")
    if href is not None:
        return href
    p = alb.parent()
    n = 2
    while n > 0 and p is not None:
        href = p.attr("href")
        if href is not None:
            return href
        n -= 1
        if n > 0:
            p = p.parent()
    if p is None:
        return None
    cands = p.select("a[href]")
    return cands[0].attr("href") if cands else None


def _album_title(alb: Element):
    """main.rs:417-431: first of title/alt/aria-label, else text."""
    for a in ("title", "alt", "aria-label"):
        v = alb.attr(a)
        if v is not None:
            return v
    t = alb.text()
    if t is None or t.strip() == "":
        return None
    return t


def _trim_start(s: str, pat: str) -> str:
    while s.startswith(pat):
        s = s[len(pat):]
    return s


def _split_any(s: str, chars: str) -> list:
    out, cur = [], []
    for ch in s:
        if ch in chars:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _split_brackets(u: str):
    """Rust ``u.split(['[',']']).nth(1)`` (main.rs:148-150)."""
    parts = _split_any(u, "[]")
    return parts[1] if len(parts) > 1 else None
