"""Main-content extraction (functions/maintext.py + the
extract_main_text operator): readability-lite block scoring must strip
link-dense chrome, pick the most specific container, and agree between
the fast and stdlib tree builders."""

import os

import pytest

from img_spark.functions.maintext import main_content


NAV = '<div id="n"><a href="/">Home</a><a href="/a">About Us Now</a></div>'
FOOT = '<div id="f"><a href="/p">Privacy Policy</a><a href="/t">Terms</a></div>'


def test_article_beats_link_chrome():
    html = (f"<html><body>{NAV}<article><p>real content words for the win"
            f"</p></article>{FOOT}</body></html>")
    assert main_content(html) == ("real content words for the win", "article")


def test_pure_link_hub_yields_empty():
    html = ('<body><div><a href="x">only links</a><a href="y">more links'
            "</a></div></body>")
    assert main_content(html) == ("", "")


def test_empty_body_yields_empty():
    assert main_content("<body></body>") == ("", "")


def test_whitespace_normalized():
    html = "<body><section><p>alpha  beta\n\tgamma </p></section></body>"
    assert main_content(html) == ("alpha beta gamma", "section")


def test_deepest_container_wins_tie():
    # outer and inner div hold the same text; the more specific
    # container must be reported, never body
    html = "<body><div><div><p>nested text</p></div></div></body>"
    text, tag = main_content(html)
    assert (text, tag) == ("nested text", "div")


def test_td_container():
    html = ('<body><table><tr><td>cell main text content</td>'
            '<td><a href="z">nav</a></td></tr></table></body>')
    assert main_content(html) == ("cell main text content", "td")


def test_script_style_excluded():
    html = ('<body><script>var x = "enormous script body text";</script>'
            "<style>.c{color:red}</style><div>tiny</div></body>")
    assert main_content(html) == ("tiny", "div")


def test_link_density_discounts_mixed_block():
    # the mixed block has more raw text but half of it is links; the
    # clean block's undiscounted score must win
    mixed = ('<div><a href="/1">aaaaaaaaaaaaaaaaaaaa</a>'
             "bbbbbbbbbbbbbbbbbbbbbb</div>")
    clean = "<article>cccccccccccccccccccc</article>"
    text, tag = main_content(f"<body>{mixed}{clean}</body>")
    assert tag == "article"


def test_markup_whitespace_does_not_score():
    # indentation text nodes between elements must not make body a
    # better-scoring candidate than the article
    html = ("<body>\n  " + NAV + "\n  <article>\n    <p>words here</p>\n"
            "  </article>\n  " + FOOT + "\n</body>")
    assert main_content(html) == ("words here", "article")


def test_stdlib_parser_parity():
    html = (f"<html><body>{NAV}<article><p>real content words for the win"
            f"</p></article>{FOOT}</body></html>")
    os.environ["IMG_SPARK_HTML_PARSER"] = "stdlib"
    try:
        got = main_content(html)
    finally:
        del os.environ["IMG_SPARK_HTML_PARSER"]
    assert got == main_content(html)
    assert got == ("real content words for the win", "article")


@pytest.mark.usefixtures("spark")
def test_extract_main_text_operator(spark):
    from pyspark.sql import functions as F

    from img_spark.operators.extract_udf import extract_main_text

    rows = [
        ("u1", (f"<html><head><title>T1</title></head><body>{NAV}"
                f"<article><p>alpha beta</p></article>{FOOT}"
                "</body></html>").encode()),
        ("u2", None),  # fetch_failed page → empty strings, no crash
        ("u3", b"<body><div><a href='x'>links</a></div></body>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in extract_main_text(df).collect()}
    assert got["u1"]["main_text"] == "alpha beta"
    assert got["u1"]["main_tag"] == "article"
    # full-visible-text invariant comes from the SAME parse
    assert "T1" in got["u1"]["extracted_text"]
    assert "Home" in got["u1"]["extracted_text"]
    assert got["u2"]["main_text"] == "" and got["u2"]["extracted_text"] == ""
    assert got["u3"]["main_text"] == "" and got["u3"]["main_tag"] == ""
