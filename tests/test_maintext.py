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


def test_crawl_to_main_text_corpus(spark, tmp_path_factory):
    """E2E: a crawl run with CrawlConfig(main_text=True) writes the
    boilerplate-stripped text into the extracted deltas, and corpus
    curation with text_source='main' builds documents from it — while
    'full' keeps the WET-style everything-text. A main_text=False
    crawl refuses 'main' curation (manifest gate)."""
    from img_spark.operators.politeness import robots_df
    from img_spark.plans.corpus import crawl_documents
    from img_spark.plans.crawl import CrawlConfig, Crawler
    from img_spark.sources.synthweb import PAGES_DDL

    def page(body):
        return (f"<html><head><title>T - Site</title></head><body>{NAV}"
                f"<article><p>{body}</p></article>{FOOT}"
                "</body></html>").encode()

    rows = [
        ("https://mt.test/", None, page("alpha words one"), None, None),
        ("https://mt.test/p2", None, page("beta words  two"), None, None),
    ]
    pages = spark.createDataFrame(rows, PAGES_DDL)

    ckpt = tmp_path_factory.mktemp("ckpt_maintext")
    c = Crawler(
        spark, pages, [], robots_df(spark, []),
        CrawlConfig(checkpoint_dir=str(ckpt), partitions=4, main_text=True),
    )
    c.run(seeds=["https://mt.test/", "https://mt.test/p2"])

    main = {
        r["doc_id"]: r["text"]
        for r in crawl_documents(spark, str(ckpt),
                                 text_source="main").collect()
    }
    assert main["https://mt.test/"] == "alpha words one"
    assert main["https://mt.test/p2"] == "beta words two"  # ws-normalized
    full = {
        r["doc_id"]: r["text"]
        for r in crawl_documents(spark, str(ckpt),
                                 text_source="full").collect()
    }
    assert "Home" in full["https://mt.test/"]  # nav text retained
    assert "alpha words one" in full["https://mt.test/"]

    # a crawl WITHOUT the flag: column exists but empty → 'main' refused
    ckpt2 = tmp_path_factory.mktemp("ckpt_nomain")
    c2 = Crawler(
        spark, pages, [], robots_df(spark, []),
        CrawlConfig(checkpoint_dir=str(ckpt2), partitions=4),
    )
    c2.run(seeds=["https://mt.test/"])
    with pytest.raises(ValueError, match="main_text=False"):
        crawl_documents(spark, str(ckpt2), text_source="main")
    with pytest.raises(ValueError, match="'full'\\|'main'"):
        crawl_documents(spark, str(ckpt2), text_source="bogus")


def test_main_text_corpus_state_guard(spark, tmp_path_factory):
    """text_source is corpus state: incremental re-curation inherits
    the stored source and refuses a flip."""
    from img_spark.operators.politeness import robots_df
    from img_spark.plans.corpus import (
        build_corpus,
        build_corpus_incremental,
    )
    from img_spark.plans.crawl import CrawlConfig, Crawler
    from img_spark.sources.synthweb import PAGES_DDL

    body = (f"<html><head><title>T - S</title></head><body>{NAV}"
            "<article><p>corpus main words</p></article>"
            f"{FOOT}</body></html>").encode()
    pages = spark.createDataFrame(
        [("https://mt2.test/", None, body, None, None)], PAGES_DDL
    )
    ckpt = tmp_path_factory.mktemp("ckpt_mt_corpus")
    c = Crawler(
        spark, pages, [], robots_df(spark, []),
        CrawlConfig(checkpoint_dir=str(ckpt), partitions=4, main_text=True),
    )
    c.run(seeds=["https://mt.test/", "https://mt2.test/"])

    out = str(tmp_path_factory.mktemp("corpus_mt"))
    build_corpus(spark, str(ckpt), out, text_source="main")
    got = spark.read.parquet(out)
    texts = [r["text"] for r in got.collect()]
    assert "corpus main words" in texts
    assert all("Home" not in t for t in texts)
    # no new generations + matching source → no-op, no error
    r = build_corpus_incremental(spark, str(ckpt), out)
    assert r.get("unchanged")
    with pytest.raises(ValueError, match="text_source"):
        build_corpus_incremental(spark, str(ckpt), out, text_source="full")
    # documents= path cannot take a text_source
    with pytest.raises(ValueError, match="documents"):
        build_corpus(spark, None, out, documents=got, text_source="main")


def test_main_text_guard_checks_every_generation(spark, tmp_path_factory):
    """Round-7 review: the text_source='main' manifest gate must check
    EVERY generation in the read range, not just the newest — a
    checkpoint whose early generations ran with main_text=False would
    otherwise pass the guard and silently curate blank text for every
    page whose newest row lives in those generations."""
    import json

    from img_spark import fsio
    from img_spark.operators.politeness import robots_df
    from img_spark.plans.corpus import crawl_documents
    from img_spark.plans.crawl import CrawlConfig, Crawler
    from img_spark.sources.site_config import rows_from_config
    from img_spark.sources.synthweb import PAGES_DDL

    def page(body, album=""):
        return (f"<html><head><title>T - Site</title></head><body>{NAV}"
                f"{album}<article><p>{body}</p></article>{FOOT}"
                "</body></html>").encode()

    album = ('<div class="alb"><a href="https://mg.test/p1" title="P1">'
             "one</a></div>")
    rows = [
        ("https://mg.test/", None, page("index words here", album),
         None, None),
        ("https://mg.test/p1", None, page("leaf words here"), None, None),
    ]
    pages = spark.createDataFrame(rows, PAGES_DDL)
    cfg_rows = rows_from_config(
        [{"Site": "mg.test", "Img": "div.photo img", "Album": "div.alb a"}]
    )

    ckpt = tmp_path_factory.mktemp("ckpt_mixed_main")
    c = Crawler(
        spark, pages, cfg_rows, robots_df(spark, []),
        CrawlConfig(checkpoint_dir=str(ckpt), partitions=4,
                    main_text=True),
    )
    c.run(seeds=["https://mg.test/"])
    # two extraction generations: g1 (index) and g2 (album leaf)
    assert fsio.isdir(f"{ckpt}/extracted/g1")
    assert fsio.isdir(f"{ckpt}/extracted/g2")

    # all-True checkpoint curates fine
    assert crawl_documents(spark, str(ckpt),
                           text_source="main").count() == 2

    # flip generation 1's manifest to main_text=False (simulating a
    # crawl resumed with the flag after running without it): newest
    # manifest still says True, but the guard must refuse and NAME the
    # offending generation
    mp = f"{ckpt}/manifest-g1.json"
    m = json.loads(fsio.read_bytes(mp))
    m["main_text"] = False
    fsio.write_bytes_atomic(mp, json.dumps(m).encode())
    with pytest.raises(ValueError, match=r"generation\(s\) \[1\]"):
        crawl_documents(spark, str(ckpt), text_source="main")
    # the incremental slice that EXCLUDES the bad generation still works
    inc = crawl_documents(spark, str(ckpt), min_generation=1,
                          text_source="main")
    assert inc.count() == 1
