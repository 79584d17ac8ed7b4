"""Pure-Python byte-parity string kernels.

Each function re-expresses one scalar operator of the reference crawler
(/root/reference/src/main.rs) with identical semantics. These are the
hot-path helpers invoked inside Arrow-vectorized pandas UDFs; they are
deliberately dependency-free and unit-testable in milliseconds.

Reference citations use ``main.rs:<line>`` form so parity can be audited.
"""

from __future__ import annotations

from urllib.parse import unquote

# CSS url-markers, in probe order (main.rs:7).
CSS_MARKERS = ("url(", "image(", "image-set(")

# Font/asset extensions rejected inside url(...) (main.rs:1023-1025).
_REJECT_EXTS = (
    ".otf", ".ttf", ".woff", ".woff2", ".cur", ".css", ".pdf", ".fnt",
    ".eot", ".cff",
)

# Image extensions whitelisted for 2nd-level title/alt (main.rs:346).
IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".avif", ".bmp")

# Two-level selector separator (main.rs:6).
SEP = " | "


def ascii_lower(s: str) -> str:
    """Rust ``to_ascii_lowercase``: lowercase ASCII letters only."""
    return "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in s)


def trim_start_matches(s: str, pat: str) -> str:
    """Rust ``str::trim_start_matches``: strip *repeated* prefix matches."""
    if not pat:
        return s
    while s.startswith(pat):
        s = s[len(pat):]
    return s


def trim_end_matches(s: str, pat: str) -> str:
    """Rust ``str::trim_end_matches``: strip *repeated* suffix matches."""
    if not pat:
        return s
    while s.endswith(pat):
        s = s[: -len(pat)]
    return s


def rust_max_by_key(items, key):
    """Rust ``Iterator::max_by_key``: on ties returns the LAST maximal
    element in iteration order (Python ``max`` returns the first)."""
    best = None
    best_k = None
    for it in items:
        k = key(it)
        if best_k is None or k >= best_k:
            best, best_k = it, k
    return best


def lossy_decode(b: bytes) -> str:
    """``String::from_utf8_lossy`` parity (main.rs:109): invalid UTF-8
    byte sequences become U+FFFD."""
    return b.decode("utf-8", errors="replace")


def check_host(addr: str):
    """P1 ``check_host`` (main.rs:50-62).

    Returns the host, or None where the reference would quit (engine
    policy: reject the row instead of aborting the job).
    """
    if "://" in addr:
        scheme, rest = addr.split("://", 1)
    else:
        scheme, rest = "http", addr
    low = ascii_lower(scheme)
    if low not in ("http", "https"):
        return None
    slash = rest.find("/")
    host = rest[:slash] if slash != -1 else rest
    if "." not in host:
        return None
    return host


def canonicalize(url: str, addr: str) -> str:
    """E6 ``canonicalize`` (main.rs:501-523).

    NOT urljoin: no ``..``/``.`` normalization, no fragment stripping;
    any url starting with the literal ``http`` is passed through; the
    relative branch keeps addr's directory via ``rfind('/')``.
    """
    if not url:
        return url
    if "://" in addr:
        scheme, path = addr.split("://", 1)
    else:
        scheme, path = "http", addr
    if not url.startswith("http"):
        if url.startswith("//"):
            return f"{scheme}:{url}"
        if url.startswith("/"):
            slash = path.find("/")
            host = path[:slash] if slash != -1 else path
            return f"{scheme}://{host}{url}"
        slash = path.rfind("/")
        base = path[:slash] if slash != -1 else path
        return f"{scheme}://{base}/{url}"
    return url


def url_redirect_and_query_cleanup(url: str) -> str:
    """E5 (main.rs:985-1003): percent-decode (lossy), unwrap trailing
    ``?url=`` redirects, then truncate the query by the reference's
    exact two-stage rule."""
    dec = unquote(url, errors="replace")
    p = dec.rfind("?url=")
    cleanup = dec[p + 5:] if p != -1 else dec
    end = None
    q = cleanup.find("?")
    if q != -1:
        a = cleanup[q:].find("&")
        if a != -1:
            end = a + q
    if end is None:
        slash = cleanup.rfind("/")
        if slash != -1:
            dot = cleanup[slash:].rfind(".")
            if dot != -1:
                amp = cleanup[slash + dot:].find("&")
                if amp != -1:
                    end = amp + dot + slash
    if end is None:
        end = len(cleanup)
    return cleanup[:end]


def url_image(content: str):
    """E4 ``url_image`` (main.rs:1006-1036): parse one ``url(...)`` body.
    Returns the cleaned URL, ``data:image/`` passthrough, or None."""
    rp = content.find(")")
    if rp == -1:
        return None
    url = content[:rp]
    for x in ("ltr ", "rtl "):
        url = trim_start_matches(url, x)
    url = url.strip("'\"").strip()
    for x in ("&#39;", "&apos;", "&#34;", "&quot;"):
        url = trim_end_matches(trim_start_matches(url, x), x).strip()
    if url.startswith("data:image/"):
        return url
    url = url_redirect_and_query_cleanup(url)
    h = url.rfind("#xywh")
    if h != -1:
        url = url[:h]
    if (
        not url
        or url == "undefined"
        or url.startswith(("{", "$"))
        or "#" in url
        or url.endswith(_REJECT_EXTS)
    ):
        return None
    return url.strip()


def css_image(html: str, addr: str) -> set:
    """E3 ``css_image`` (main.rs:1039-1065): scan raw HTML for
    ``url(`` / ``image(`` / ``image-set(`` fragments; ``image-set(``
    recurses. ``data:image/`` hits are dropped (default build skips
    embeds, main.rs:1053-1056)."""
    images: set = set()
    for marker in CSS_MARKERS:
        segments = html.split(marker)
        if marker == "image-set(":
            for seg in segments[1:]:
                images |= css_image(seg, addr)
        else:
            for seg in segments[1:]:
                u = url_image(seg)
                if u is not None:
                    if u.startswith("data:image/"):
                        continue  # feature `embed` off by default
                    images.add(canonicalize(u, addr))
    return images


def percent_encode(s: str) -> str:
    """F11 (main.rs:553-564, 629): percent-encode UTF-8 bytes that are
    not ASCII-alphanumeric and not in ``: / . - _ ? = %``.

    Not ``urllib.parse.quote`` — quote never encodes ``~`` / ``*`` etc.
    while the reference's NON_ALPHANUMERIC set does.
    """
    out = []
    for b in s.encode("utf-8"):
        c = chr(b)
        if ("0" <= c <= "9") or ("a" <= c <= "z") or ("A" <= c <= "Z") or c in ":/.-_?=%":
            out.append(c)
        else:
            out.append(f"%{b:02X}")
    return "".join(out)


def derive_filename(url: str):
    """F10 (main.rs:580-614): sink filename derivation.

    Returns ``(download_url, filename, needs_ext_detection)``:
    - download_url: left part of a two-level ``" | "`` pair (main.rs:580-581)
    - filename: derived name, or the right ``" | "`` part when the name
      has no extension (main.rs:601-611); None if the URL is invalid
      (no ``/`` — the reference quits, main.rs:583-585)
    - needs_ext_detection: True when content-type probing (S6) would run
    """
    lr = url.split(SEP, 1) if SEP in url else None
    u = lr[0] if lr else url
    slash = u.rfind("/")
    if slash == -1:
        return None, None, False
    name = u[slash + 1:].lstrip("-_")
    p = name.find("?url=")
    if p != -1:
        name = name[p + 5:]
    q = name.find("?")
    name_no_query = name[:q] if q != -1 else name
    has_ext = name_no_query.rfind(".") != -1
    if has_ext:
        return u, name_no_query, False
    if lr:
        return u, lr[1], False
    return u, name, True


def content_type_to_name(name: str, content_type: str) -> str:
    """S6 ``content_header_info`` tail (main.rs:716-734): map an
    ``image/<ext>`` content-type to ``name.ext``; unknown → ``name.ext!``."""
    if "image/" in content_type:
        _, ctx = content_type.rsplit("image/", 1)
        # reference probes ['+',';',','] in order and takes the FIRST
        # marker that exists (main.rs:718-721), not the minimum index
        for x in ("+", ";", ","):
            f = ctx.find(x)
            if f != -1:
                end = f
                break
        else:
            end = len(ctx)
        ext = ctx[:end]
        # an EMPTY ext still yields "name." (main.rs:723-727: name_ext is
        # non-empty, so the ".ext!" fallback at main.rs:730-733 never runs)
        if not name.endswith(f".{ext}"):
            return f"{name}.{ext}"
        return name
    return f"{name}.ext!"


def dir_name(title: str) -> str:
    """F12 (main.rs:530): album dir name = title with ``/`` → ``:``."""
    return title.replace("/", ":")


def clean_title(raw_title: str) -> str:
    """E8 title segment selection (main.rs:205-211): trim, then the
    longest-trimmed segment of an rsplit on ``/ - _ | –`` (reference
    tie-break: earliest segment in string order)."""
    t = raw_title.strip()
    seg = rust_max_by_key(
        reversed(_split_chars(t, "/-_|–")), key=lambda x: len(x.strip())
    )
    return seg.strip() if seg is not None else t


def final_title(t: str) -> str:
    """E8 title suffix cleanup (main.rs:249-258). Note the faithful
    asymmetry: the condition checks ``' page'``/``页`` but the cut point
    searches ``' page'``/``第``."""
    low = ascii_lower(t)
    if " page" in low or "页" in t:
        cut = low.rfind(" page")
        if cut == -1:
            cut = t.rfind("第")
        if cut == -1:
            cut = len(t)
        return t[:cut].strip()
    cut = max(t.rfind("("), t.rfind(","))
    if cut == -1:
        cut = len(t)
    return t[:cut].strip()


def meta_keywords_title(script_text: str):
    """E8 JSON-mode title (main.rs:180-194): text after ``metaKeywords``,
    second ``"``-delimited token, longest-trimmed comma segment
    (tie-break: last segment, Rust max_by_key)."""
    if "metaKeywords" not in script_text:
        return None
    after = script_text.split("metaKeywords", 1)[1]
    parts = after.split('"')
    if len(parts) < 2:
        return None
    return rust_max_by_key(parts[1].split(","), key=lambda s: len(s.strip()))


def script_numeric_next(addr: str, json_len: int) -> str:
    """C3 ``<script>`` numeric pagination (main.rs:476-493)."""
    if json_len == 0:
        return ""
    last = ""
    segs = addr.split("/")
    if segs and segs[-1] == "":
        segs.pop()  # split_terminator drops only the final empty segment
    if segs:
        last = segs[-1]
    # Rust u8::from_str: optional '+', digits only, 0..=255 (main.rs:484)
    body = last[1:] if last.startswith("+") else last
    if body.isdigit() and body.isascii() and 0 <= int(body) <= 255:
        num = int(body)
    else:
        num = 1
    base = trim_end_matches(trim_end_matches(addr, "/"), f"/{num}")
    return f"{base}/{num + 1}"


def _split_chars(s: str, chars: str) -> list:
    """Split on any char in ``chars`` (Rust ``split([..])`` parity)."""
    out = []
    cur = []
    for ch in s:
        if ch in chars:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def split_chars(s: str, chars: str) -> list:
    return _split_chars(s, chars)
