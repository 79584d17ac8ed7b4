"""Download-sink derivation (S4/S5/S6/S7, main.rs:526-766).

The reference's sink is `curl -Z` into per-album directories; the engine
materializes the same decisions as a ``downloads`` table: download dir
(album title, ``/``→``:``, F12), derived filename (F10), percent-encoded
fetch URL (F11), per-host referer (main.rs:641), and the
extension-detection flag (S6). Everything except the percent-encode is a
pure column expression; the encode runs as an Arrow pandas_udf because
the reference's NON_ALPHANUMERIC-minus-safe-set has no JVM builtin
equivalent (java.net.URLEncoder differs on '+'/'~').
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from img_spark.functions.textops import content_type_to_name, percent_encode
from img_spark.operators.urlexprs import filename_expr


@pandas_udf("string")
def percent_encode_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: percent_encode(u) if u is not None else None)


@pandas_udf("string")
def content_type_name_udf(names: pd.Series, ctypes: pd.Series) -> pd.Series:
    return pd.Series(
        [
            content_type_to_name(n, c) if n is not None and c is not None else None
            for n, c in zip(names, ctypes)
        ]
    )


def downloads_table(extracted: DataFrame) -> DataFrame:
    """From the extracted sink delta (page_url, host, dir_title, img_url)
    to download rows. Embeds (`data:image/`) are skipped — default build
    counts them (main.rs:566-577). Two-level ``"url | title"`` pairs:
    the left part downloads, the right part names the file
    (main.rs:580-609).
    """
    rows = extracted.filter(
        F.col("img_url").isNotNull()
        & ~F.col("img_url").startswith("data:image/")
    )
    u = F.when(
        F.col("img_url").contains(" | "),
        F.substring_index(F.col("img_url"), " | ", 1),
    ).otherwise(F.col("img_url"))
    fname = filename_expr(F.col("img_url"))
    return rows.select(
        F.col("page_url"),
        F.col("img_url"),
        u.alias("download_url"),
        F.translate(F.col("dir_title"), "/", ":").alias("dir"),
        fname.alias("filename"),
        fname.isNull().alias("needs_ext_detection"),
        F.concat(F.lit("https://"), F.col("host")).alias("referer"),
        percent_encode_udf(u).alias("enc_url"),
    )


def svg_sniff(html_prefix: F.Column) -> F.Column:
    """S7 magic-number fallback (main.rs:753-762): first 16 bytes
    containing '<svg' ⇒ extension 'svg' (the full `infer` table is a
    non-default feature; the svg check is the only in-code sniff)."""
    return F.when(
        F.substring(html_prefix.cast("string"), 1, 16).contains("<svg"),
        F.lit("svg"),
    )
