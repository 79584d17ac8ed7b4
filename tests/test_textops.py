"""Table-driven parity tests for the pure string kernels.

Expected values are hand-derived from the reference semantics
(/root/reference/src/main.rs, lines cited per case in SURVEY.md §2).
"""

import pytest

from img_spark.functions.textops import (
    canonicalize,
    check_host,
    clean_title,
    content_type_to_name,
    css_image,
    derive_filename,
    dir_name,
    final_title,
    lossy_decode,
    meta_keywords_title,
    percent_encode,
    rust_max_by_key,
    script_numeric_next,
    trim_end_matches,
    trim_start_matches,
    url_image,
    url_redirect_and_query_cleanup,
)


# ---------------------------------------------------------------- P1
@pytest.mark.parametrize(
    "addr,host",
    [
        ("https://a.example.com/x/y", "a.example.com"),
        ("http://a.b/", "a.b"),
        ("a.b/x", "a.b"),  # no scheme → default http (main.rs:51)
        ("HTTPS://a.b", "a.b"),  # case-insensitive scheme
        ("ftp://a.b", None),  # invalid scheme → reject (main.rs:53-55)
        ("https://localhost/x", None),  # host without '.' (main.rs:58-60)
        ("https://a.b.c", "a.b.c"),
    ],
)
def test_check_host(addr, host):
    assert check_host(addr) == host


# ---------------------------------------------------------------- E6
@pytest.mark.parametrize(
    "url,addr,expect",
    [
        ("", "https://h.com/a/b", ""),
        ("//cdn.x.com/i.jpg", "https://h.com/a/b", "https://cdn.x.com/i.jpg"),
        ("//cdn.x.com/i.jpg", "h.com/a/b", "http://cdn.x.com/i.jpg"),
        ("/img/i.jpg", "https://h.com/a/b", "https://h.com/img/i.jpg"),
        ("/img/i.jpg", "h.com", "http://h.com/img/i.jpg"),
        # relative: addr dir via rfind('/') — keeps /a (main.rs:515-519)
        ("i.jpg", "https://h.com/a/b", "https://h.com/a/i.jpg"),
        ("i.jpg", "https://h.com", "http://i.jpg" if False else "https://h.com/i.jpg"),
        # absolute passthrough, even "http"-prefixed junk (main.rs:506)
        ("https://other.com/i.png", "https://h.com/a", "https://other.com/i.png"),
        ("httpfoo", "https://h.com/a", "httpfoo"),
        # NO dot-segment normalization
        ("../i.jpg", "https://h.com/a/b", "https://h.com/a/../i.jpg"),
    ],
)
def test_canonicalize(url, addr, expect):
    assert canonicalize(url, addr) == expect


# ---------------------------------------------------------------- E5
@pytest.mark.parametrize(
    "url,expect",
    [
        ("https://h.com/i.jpg", "https://h.com/i.jpg"),
        # ?url= unwrap takes the LAST occurrence (rfind, main.rs:988)
        (
            "https://r.com/go?url=https%3A%2F%2Fh.com%2Fi.jpg",
            "https://h.com/i.jpg",
        ),
        (
            "https://a.com/?url=https://b.com/x?url=https://c.com/i.png",
            "https://c.com/i.png",
        ),
        # first '&' after first '?' truncates
        ("https://h.com/i.jpg?w=1&h=2", "https://h.com/i.jpg?w=1"),
        # no '&' after '?': fall to dot-rule; no '&' after dot → keep all
        ("https://h.com/i.jpg?wide", "https://h.com/i.jpg?wide"),
        # no '?': '&' after last '.' following last '/' truncates
        ("https://h.com/i.jpg&x=1", "https://h.com/i.jpg"),
        ("https://h.com/img&x=1", "https://h.com/img&x=1"),  # no dot → keep
        # percent-decode happens first
        ("https://h.com/a%20b.jpg", "https://h.com/a b.jpg"),
    ],
)
def test_url_cleanup(url, expect):
    assert url_redirect_and_query_cleanup(url) == expect


# ---------------------------------------------------------------- E4
@pytest.mark.parametrize(
    "content,expect",
    [
        ("https://h.com/i.jpg) no-repeat", "https://h.com/i.jpg"),
        ("'https://h.com/i.jpg')", "https://h.com/i.jpg"),
        ('"https://h.com/i.jpg")', "https://h.com/i.jpg"),
        ("&#39;https://h.com/i.jpg&#39;)", "https://h.com/i.jpg"),
        ("&quot;https://h.com/i.jpg&quot;)", "https://h.com/i.jpg"),
        ("ltr https://h.com/i.jpg)", "https://h.com/i.jpg"),
        ("data:image/png;base64,AAA)", "data:image/png;base64,AAA"),
        ("https://h.com/f.woff2)", None),
        ("https://h.com/f.css)", None),
        ("undefined)", None),
        ("{var})", None),
        ("$x)", None),
        ("https://h.com/i.jpg#frag)", None),  # '#' reject (main.rs:1022)
        ("https://h.com/i.jpg#xywh=0,0,1,1)", "https://h.com/i.jpg"),
        ("no-close-paren", None),
        (")", None),  # empty
    ],
)
def test_url_image(content, expect):
    assert url_image(content) == expect


# ---------------------------------------------------------------- E3
def test_css_image():
    html = (
        "<style>.a{background:url('/i1.jpg');} "
        ".b{background-image:image('i2.png')} "
        ".c{background:image-set(url('/i3.webp') 1x, url('/i4.webp') 2x)} "
        ".d{src:url(/f.woff2)} .e{background:url(data:image/png;base64,AA)}"
        "</style>"
    )
    got = css_image(html, "https://h.com/p/q")
    assert got == {
        "https://h.com/i1.jpg",
        "https://h.com/p/i2.png",
        "https://h.com/i3.webp",
        "https://h.com/i4.webp",
    }


# ---------------------------------------------------------------- F10/F11
@pytest.mark.parametrize(
    "url,fname,needs",
    [
        ("https://h.com/a/i.jpg", "i.jpg", False),
        ("https://h.com/a/i.jpg?w=1", "i.jpg", False),
        ("https://h.com/a/__-i.jpg", "i.jpg", False),
        ("https://h.com/a/x?url=deep/i.png", "i.png", False),
        ("https://h.com/a/noext", "noext", True),
        ("https://h.com/a/i.jpg | pretty.png", "i.jpg", False),
        ("https://h.com/a/noext | pretty.png", "pretty.png", False),
    ],
)
def test_derive_filename(url, fname, needs):
    u, name, need = derive_filename(url)
    assert name == fname and need == needs


def test_derive_filename_invalid():
    assert derive_filename("no-slash-at-all") == (None, None, False)


def test_percent_encode():
    # '~' and '*' ARE encoded (NON_ALPHANUMERIC), safe set kept verbatim
    assert percent_encode("https://h.com/a_b-c.jpg?x=1%") == (
        "https://h.com/a_b-c.jpg?x=1%"
    )
    assert percent_encode("a~b*c d") == "a%7Eb%2Ac%20d"
    assert percent_encode("日") == "%E6%97%A5"


def test_content_type_to_name():
    assert content_type_to_name("pic", "image/jpeg") == "pic.jpeg"
    assert content_type_to_name("pic", "image/svg+xml") == "pic.svg"
    assert content_type_to_name("pic.png", "image/png") == "pic.png"
    assert content_type_to_name("pic", "text/html") == "pic.ext!"
    # empty parsed ext: reference yields "name." (name_ext non-empty at
    # main.rs:723-727, so the ".ext!" fallback never runs)
    assert content_type_to_name("pic", "image/+xml") == "pic."
    assert content_type_to_name("pic", "image/;charset=x") == "pic."
    assert content_type_to_name("pic.", "image/;charset=x") == "pic."


def test_dir_name():
    assert dir_name("a/b/c") == "a:b:c"


# ---------------------------------------------------------------- E8
@pytest.mark.parametrize(
    "raw,expect",
    [
        ("  My Gallery - Site Name ", "My Gallery"),
        ("a|bb|c", "bb"),
        ("short_the longest segment here_x", "the longest segment here"),
        ("nosep", "nosep"),
        ("tie1-tie2", "tie1"),  # tie → earliest segment (Rust max_by_key + rsplit)
        ("a–bbb–cc", "bbb"),  # en-dash split
    ],
)
def test_clean_title(raw, expect):
    assert clean_title(raw) == expect


@pytest.mark.parametrize(
    "t,expect",
    [
        ("Gallery Page 3", "Gallery"),  # ' page' cut (lowercased rfind)
        ("Gallery 第3页", "Gallery"),  # 页 condition, 第 cut
        ("Gallery3页", "Gallery3页"),  # 页 present, no ' page'/第 → len cut
        ("Name (2024)", "Name"),
        ("Name, extra", "Name"),
        ("Plain", "Plain"),
    ],
)
def test_final_title(t, expect):
    assert final_title(t) == expect


def test_meta_keywords_title():
    s = 'var metaKeywords = "short,the longest one,mid";'
    assert meta_keywords_title(s) == "the longest one"
    # tie → LAST comma segment (forward max_by_key)
    s2 = 'metaKeywords="aa,bb";'
    assert meta_keywords_title(s2) == "bb"
    assert meta_keywords_title("no keywords here") is None


# ---------------------------------------------------------------- C3
@pytest.mark.parametrize(
    "addr,json_len,expect",
    [
        ("https://h.com/g/5", 3, "https://h.com/g/6"),
        ("https://h.com/g/5/", 3, "https://h.com/g/6"),
        ("https://h.com/gallery", 3, "https://h.com/gallery/2"),
        ("https://h.com/g/5", 0, ""),
        ("https://h.com/g/999", 2, "https://h.com/g/999/2"),  # >u8 → num=1
    ],
)
def test_script_numeric_next(addr, json_len, expect):
    assert script_numeric_next(addr, json_len) == expect


# ---------------------------------------------------------------- misc
def test_trim_matches():
    assert trim_start_matches("ababX", "ab") == "X"
    assert trim_end_matches("Xabab", "ab") == "X"


def test_rust_max_by_key_last_tie():
    assert rust_max_by_key(["aa", "bb", "c"], key=len) == "bb"


def test_lossy_decode():
    assert lossy_decode(b"ok\xff\xfeok") == "ok��ok"


def test_svg_sniff_expression_logic():
    # S7 (main.rs:753-762): pure-python mirror of the expression logic
    from img_spark.functions.textops import lossy_decode

    def sniff(prefix: bytes):
        return "svg" if "<svg" in lossy_decode(prefix)[:16] else None

    assert sniff(b"<svg xmlns='x'>") == "svg"
    assert sniff(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) is None
