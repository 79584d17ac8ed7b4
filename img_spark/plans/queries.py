"""Driver correctness-gate queries: each Spark query is paired with an
independent DuckDB oracle SQL over the same parquet views
(__spark_entry__.py exposes them as queries()/oracle_sql()).

Synthesized inputs (URLs, HTML pages) are constructed with IDENTICAL
deterministic expressions on both sides, so the oracle checks the
ENGINE's transformation, not the input construction. Column names and
rounding are aligned on both sides (the driver hash-compares values
after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from img_spark.operators import dedup, similarity
from img_spark.operators.extract_udf import extract_pages
from img_spark.operators.politeness import apply_robots, dispatch_top_k, robots_df
from img_spark.operators.textquality import (
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_signals,
    token_count,
)
from img_spark.operators.urlexprs import canonicalize_expr, filename_expr, host_of
from img_spark.sources.site_config import attach_site_config


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


DID = F.col("doc_id").cast("string")


# =====================================================================
# Crawl-side operators (SURVEY.md §2.1/§2.2/§2.5/§2.7)
# =====================================================================

def q_host_extract(spark, sf_dir):
    """P1 check_host as a JVM projection (main.rs:50-62)."""
    mod7 = (F.col("doc_id") % 7).cast("string")
    url = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("https://site"), mod7, F.lit(".test/gal/"), DID))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("http://site"), mod7, F.lit(".test")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("site"), mod7, F.lit(".test/x")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("ftp://site"), mod7, F.lit(".test/x")))
        .otherwise(F.concat(F.lit("https://nodot"), DID, F.lit("/x")))
    )
    return _docs(spark, sf_dir).select(
        "doc_id", url.alias("url"), host_of(url).alias("host")
    )


SQL_HOST_EXTRACT = """
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN 'https://site' || (doc_id % 7)::varchar || '.test/gal/' || doc_id::varchar
      WHEN 1 THEN 'http://site' || (doc_id % 7)::varchar || '.test'
      WHEN 2 THEN 'site' || (doc_id % 7)::varchar || '.test/x'
      WHEN 3 THEN 'ftp://site' || (doc_id % 7)::varchar || '.test/x'
      ELSE 'https://nodot' || doc_id::varchar || '/x'
    END AS url
  FROM documents),
s AS (
  SELECT doc_id, url,
    CASE WHEN strpos(url,'://')>0 THEN substr(url,1,strpos(url,'://')-1) ELSE 'http' END AS scheme,
    CASE WHEN strpos(url,'://')>0 THEN substr(url,strpos(url,'://')+3) ELSE url END AS rest
  FROM u)
SELECT doc_id, url,
  CASE WHEN lower(scheme) NOT IN ('http','https') THEN NULL
       WHEN strpos(split_part(rest,'/',1),'.')=0 THEN NULL
       ELSE split_part(rest,'/',1) END AS host
FROM s
"""


def q_canonicalize(spark, sf_dir):
    """E6 canonicalize as a JVM projection (main.rs:501-523)."""
    mod7 = (F.col("doc_id") % 7).cast("string")
    addr = F.concat(F.lit("https://site"), mod7, F.lit(".test/gal/page/3"))
    rel = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(""))
        .when(F.col("doc_id") % 5 == 1, F.lit("//cdn.test/i.jpg"))
        .when(F.col("doc_id") % 5 == 2, F.lit("/img/x.png"))
        .when(F.col("doc_id") % 5 == 3, F.lit("deep/y.jpg"))
        .otherwise(F.lit("https://abs.test/z.gif"))
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        rel.alias("rel"),
        addr.alias("addr"),
        canonicalize_expr(rel, addr).alias("canon"),
    )


SQL_CANONICALIZE = """
WITH t AS (
  SELECT doc_id,
    CASE doc_id % 5 WHEN 0 THEN '' WHEN 1 THEN '//cdn.test/i.jpg'
      WHEN 2 THEN '/img/x.png' WHEN 3 THEN 'deep/y.jpg'
      ELSE 'https://abs.test/z.gif' END AS rel,
    'https://site' || (doc_id % 7)::varchar || '.test/gal/page/3' AS addr
  FROM documents),
p AS (
  SELECT *,
    CASE WHEN strpos(addr,'://')>0 THEN substr(addr,1,strpos(addr,'://')-1) ELSE 'http' END AS scheme,
    CASE WHEN strpos(addr,'://')>0 THEN substr(addr,strpos(addr,'://')+3) ELSE addr END AS path
  FROM t)
SELECT doc_id, rel, addr,
  CASE WHEN rel='' THEN rel
       WHEN rel LIKE 'http%' THEN rel
       WHEN rel LIKE '//%' THEN scheme || ':' || rel
       WHEN rel LIKE '/%' THEN scheme || '://' || split_part(path,'/',1) || rel
       ELSE scheme || '://' ||
            (CASE WHEN strpos(path,'/')>0 THEN regexp_replace(path,'/[^/]*$','') ELSE path END)
            || '/' || rel END AS canon
FROM p
"""


def q_filename(spark, sf_dir):
    """F10 sink filename derivation (main.rs:583-614)."""
    url = (
        F.when(F.col("doc_id") % 6 == 0,
               F.concat(F.lit("https://h.test/p/img"), DID, F.lit(".jpg")))
        .when(F.col("doc_id") % 6 == 1,
              F.concat(F.lit("https://h.test/a/-_-pic"), DID, F.lit(".png?x=1")))
        .when(F.col("doc_id") % 6 == 2,
              F.concat(F.lit("https://h.test/b/r?url=deep/d"), DID, F.lit(".webp")))
        .when(F.col("doc_id") % 6 == 3, F.lit("https://h.test/c/noext"))
        .when(F.col("doc_id") % 6 == 4,
              F.concat(F.lit("https://h.test/d/q"), DID, F.lit(".jpeg?a=1&b=2")))
        .otherwise(F.lit("no-slash-url"))
    )
    return _docs(spark, sf_dir).select(
        "doc_id", url.alias("url"), filename_expr(url).alias("filename")
    )


SQL_FILENAME = """
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN 'https://h.test/p/img' || doc_id::varchar || '.jpg'
      WHEN 1 THEN 'https://h.test/a/-_-pic' || doc_id::varchar || '.png?x=1'
      WHEN 2 THEN 'https://h.test/b/r?url=deep/d' || doc_id::varchar || '.webp'
      WHEN 3 THEN 'https://h.test/c/noext'
      WHEN 4 THEN 'https://h.test/d/q' || doc_id::varchar || '.jpeg?a=1&b=2'
      ELSE 'no-slash-url' END AS url
  FROM documents),
n AS (
  SELECT doc_id, url,
    strpos(url,'/')>0 AS has_slash,
    regexp_replace(regexp_extract(url,'[^/]*$'), '^[-_]+','') AS name1
  FROM u),
n2 AS (
  SELECT doc_id, url, has_slash,
    CASE WHEN strpos(name1,'?url=')>0 THEN substr(name1, strpos(name1,'?url=')+5) ELSE name1 END AS name2
  FROM n),
n3 AS (SELECT doc_id, url, has_slash, split_part(name2,'?',1) AS no_query FROM n2)
SELECT doc_id, url,
  CASE WHEN has_slash AND strpos(no_query,'.')>0 THEN no_query ELSE NULL END AS filename
FROM n3
"""


# P2 site-config lookup ------------------------------------------------
LOOKUP_CFG = [
    (0, "alpha.test", "img.a", "div.n a", "div.alb a"),
    (1, "beta.test", "div.b img", None, None),
    (2, "x.beta.test", "img.shadowed", None, None),  # shadowed by entry 1
    (3, "gamma.test", "json: key | photourl", "<script>", None),
]


def q_site_lookup(spark, sf_dir):
    host = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("alpha.test"))
        .when(F.col("doc_id") % 5 == 1, F.lit("sub.alpha.test"))
        .when(F.col("doc_id") % 5 == 2, F.lit("x.beta.test"))
        .when(F.col("doc_id") % 5 == 3, F.lit("nomatch.test"))
        .otherwise(F.lit("gamma.test"))
    )
    d = _docs(spark, sf_dir).select("doc_id", host.alias("host"))
    return attach_site_config(d, LOOKUP_CFG).select(
        "doc_id", "host", "img_sel", "next_sel", "album_sel"
    )


def _sql_site_lookup():
    whens = []
    for order, dom, img, nxt, alb in sorted(LOOKUP_CFG, key=lambda r: r[0]):
        def q(v):
            return "NULL" if v is None else "'" + v.replace("'", "''") + "'"
        whens.append(
            f"WHEN ends_with(rtrim(host), '{dom}') THEN struct_pack("
            f"img_sel := {q(img)}::varchar, next_sel := {q(nxt)}::varchar,"
            f" album_sel := {q(alb)}::varchar)"
        )
    case = "CASE " + " ".join(whens) + " ELSE NULL END"
    return f"""
WITH h AS (
  SELECT doc_id,
    CASE doc_id % 5 WHEN 0 THEN 'alpha.test' WHEN 1 THEN 'sub.alpha.test'
      WHEN 2 THEN 'x.beta.test' WHEN 3 THEN 'nomatch.test'
      ELSE 'gamma.test' END AS host
  FROM documents),
c AS (SELECT doc_id, host, {case} AS cfg FROM h)
SELECT doc_id, host, cfg.img_sel AS img_sel, cfg.next_sel AS next_sel,
       cfg.album_sel AS album_sel
FROM c
"""


# robots ---------------------------------------------------------------
ROBOTS_RULES = [
    ("h0.test", "/private", False, 0.0),
    ("h0.test", "/", True, 0.0),
    ("h1.test", "/", False, 0.0),
    ("h2.test", "/private/pub", True, 0.0),
    ("h2.test", "/private", False, 2.5),
]


def q_robots_allow(spark, sf_dir):
    hostn = (F.col("doc_id") % 10).cast("string")
    host = F.concat(F.lit("h"), hostn, F.lit(".test"))
    path = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("/pub/"), DID))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("/private/"), DID))
        .when(F.col("doc_id") % 4 == 2, F.lit("/private/pub/x"))
        .otherwise(F.lit("/"))
    )
    cand = _docs(spark, sf_dir).select(
        "doc_id",
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("url"),
    )
    out = apply_robots(cand, robots_df(spark, ROBOTS_RULES))
    return out.select("doc_id", "url", "allowed",
                      F.round("crawl_delay", 6).alias("crawl_delay"))


SQL_ROBOTS_ALLOW = """
WITH rules(host, path_prefix, allow, crawl_delay) AS (VALUES
  ('h0.test','/private',FALSE,0.0), ('h0.test','/',TRUE,0.0),
  ('h1.test','/',FALSE,0.0), ('h2.test','/private/pub',TRUE,0.0),
  ('h2.test','/private',FALSE,2.5)),
c AS (
  SELECT doc_id, 'h' || (doc_id % 10)::varchar || '.test' AS host,
    CASE doc_id % 4 WHEN 0 THEN '/pub/' || doc_id::varchar
      WHEN 1 THEN '/private/' || doc_id::varchar
      WHEN 2 THEN '/private/pub/x' ELSE '/' END AS path
  FROM documents)
SELECT doc_id, 'https://' || host || path AS url,
  COALESCE((SELECT r.allow FROM rules r WHERE r.host=c.host
            AND starts_with(c.path, r.path_prefix)
            ORDER BY length(r.path_prefix) DESC LIMIT 1), TRUE) AS allowed,
  round(COALESCE((SELECT r.crawl_delay FROM rules r WHERE r.host=c.host
            AND starts_with(c.path, r.path_prefix)
            ORDER BY length(r.path_prefix) DESC LIMIT 1), 0.0), 6) AS crawl_delay
FROM c
"""


def q_politeness_topk(spark, sf_dir):
    o = _orders(spark, sf_dir)
    pend = o.select(
        F.concat(F.lit("u"), F.col("o_orderkey").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 25).cast("string")).alias("host"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("path"),
        F.when(F.col("o_custkey") % 3 == 0, F.lit(5.0)).otherwise(F.lit(0.0)).alias(
            "crawl_delay"
        ),
    )
    return dispatch_top_k(pend, host_budget=2, batch_window_s=60.0).select(
        "url", "host", "dispatch"
    )


SQL_POLITENESS_TOPK = """
WITH pend AS (
  SELECT 'u' || o_orderkey::varchar AS url,
         'h' || (o_custkey % 25)::varchar AS host,
         lpad(o_orderkey::varchar, 10, '0') AS path,
         CASE WHEN o_custkey % 3 = 0 THEN 5.0 ELSE 0.0 END AS crawl_delay
  FROM orders),
r AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY path, url) AS rn
  FROM pend)
SELECT url, host,
  rn <= (CASE WHEN crawl_delay > 0
              THEN greatest(1, floor(60.0/crawl_delay)::int) ELSE 2 END) AS dispatch
FROM r
"""


def q_seen_antijoin(spark, sf_dir):
    o = _orders(spark, sf_dir)
    frontier = o.select(
        F.concat(F.lit("u"), F.col("o_orderkey").cast("string")).alias("url_canon"),
        "o_orderkey",
    )
    seen = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.concat(F.lit("u"), F.col("o_orderkey").cast("string")).alias("seen_url")
    )
    return frontier.join(
        seen, frontier["url_canon"] == seen["seen_url"], "left_anti"
    ).select("url_canon")


SQL_SEEN_ANTIJOIN = """
SELECT 'u' || o_orderkey::varchar AS url_canon
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders s WHERE s.o_orderkey % 2 = 0
    AND 'u' || s.o_orderkey::varchar = 'u' || o.o_orderkey::varchar)
"""


# =====================================================================
# Extraction UDF end-to-end (pages built from documents)
# =====================================================================

_CLEAN = "[^a-z0-9 ]"


def _doc_pages(spark, sf_dir, with_next=False):
    d = _docs(spark, sf_dir)
    mod10 = (F.col("doc_id") % 10).cast("string")
    page_url = F.concat(F.lit("https://ex"), mod10, F.lit(".test/d/"), DID)
    clean = F.regexp_replace(F.lower(F.col("text")), _CLEAN, "")
    body = F.concat(
        F.lit('<div class="photo">'),
        F.lit('<img src="/i/'), DID, F.lit('a.jpg">'),
        F.lit('<img src="i'), DID, F.lit('b.png">'),
        F.lit('<img src="https://cdn.test/c'), DID, F.lit('.webp">'),
        F.lit('<img src="/i/'), DID, F.lit('a.jpg">'),
        F.lit("</div>"),
    )
    nxt = (
        F.concat(
            F.lit('<div class="pg"><a href="/l/1">1</a><span class="current">2'
                  '</span><a href="/l/'),
            ((F.col("doc_id") % 9) + 2).cast("string"),
            F.lit('">next page</a></div>'),
        )
        if with_next
        else F.lit("")
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "), DID, F.lit(" - Photo Gallery"),
        F.lit("</title></head><body>"), body, nxt,
        F.lit("<p>"), clean, F.lit("</p></body></html>"),
    )
    return d.select(
        page_url.alias("url"),
        F.encode(html, "utf-8").alias("html"),
        (F.lit("div.photo img") if with_next else F.lit(None).cast("string")).alias("img_sel"),
        (F.lit("div.pg a") if with_next else F.lit(None).cast("string")).alias("next_sel"),
        F.lit(None).cast("string").alias("album_sel"),
    )


def q_extract_images(spark, sf_dir):
    """Full extraction UDF over synthesized pages: discovered-image URL
    set per page, canonicalized + deduped (E1/E6/D1)."""
    pages = _doc_pages(spark, sf_dir)
    out = extract_pages(pages)
    return out.select(
        F.col("url").alias("page_url"), F.explode("imgs").alias("img_url")
    )


SQL_EXTRACT_IMAGES = """
WITH d AS (
  SELECT doc_id,
    'https://ex' || (doc_id % 10)::varchar || '.test/d/' || doc_id::varchar AS page_url
  FROM documents)
SELECT page_url, img_url FROM (
  SELECT page_url,
    'https://ex' || (doc_id % 10)::varchar || '.test/i/' || doc_id::varchar || 'a.jpg' AS img_url FROM d
  UNION ALL
  SELECT page_url,
    'https://ex' || (doc_id % 10)::varchar || '.test/d/i' || doc_id::varchar || 'b.png' FROM d
  UNION ALL
  SELECT page_url, 'https://cdn.test/c' || doc_id::varchar || '.webp' FROM d)
"""


def q_extract_text(spark, sf_dir):
    """Byte-identical extracted-text invariant over synthesized pages."""
    pages = _doc_pages(spark, sf_dir)
    out = extract_pages(pages)
    return out.select(F.col("url").alias("page_url"), "extracted_text")


SQL_EXTRACT_TEXT = """
SELECT 'https://ex' || (doc_id % 10)::varchar || '.test/d/' || doc_id::varchar AS page_url,
  'Doc ' || doc_id::varchar || ' - Photo Gallery' ||
  regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS extracted_text
FROM documents
"""


def q_next_link(spark, sf_dir):
    """C2 next-link heuristics (case e: 'next' text among last 2 hits)."""
    pages = _doc_pages(spark, sf_dir, with_next=True)
    out = extract_pages(pages)
    return out.select(F.col("url").alias("page_url"), "next_url")


SQL_NEXT_LINK = """
SELECT 'https://ex' || (doc_id % 10)::varchar || '.test/d/' || doc_id::varchar AS page_url,
  'https://ex' || (doc_id % 10)::varchar || '.test/l/' || ((doc_id % 9) + 2)::varchar AS next_url
FROM documents
"""


def q_title_clean(spark, sf_dir):
    """E8 title pipeline: longest-segment pick + suffix cleanup."""
    d = _docs(spark, sf_dir)
    mod = (F.col("doc_id") % 100).cast("string")
    html = F.concat(
        F.lit("<html><head><title>t"), DID, F.lit("|Gallery Number "), mod,
        F.lit('</title></head><body><img src="/x'), DID,
        F.lit('.jpg"></body></html>'),
    )
    pages = d.select(
        F.concat(F.lit("https://t.test/"), DID).alias("url"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("img_sel"),
        F.lit(None).cast("string").alias("next_sel"),
        F.lit(None).cast("string").alias("album_sel"),
    )
    out = extract_pages(pages)
    return out.select(F.col("url").alias("page_url"), "title", "dir_title")


SQL_TITLE_CLEAN = """
SELECT 'https://t.test/' || doc_id::varchar AS page_url,
  'Gallery Number ' || (doc_id % 100)::varchar AS title,
  'Gallery Number ' || (doc_id % 100)::varchar AS dir_title
FROM documents
"""
