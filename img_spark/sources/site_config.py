"""Site-config source: the reference's ``web.json`` normalized into a
small broadcast-join table (S3, main.rs:899-903; P2 lookup main.rs:65-80).

Schema (FIXTURES.md §1.2): one row per domain — the comma-separated
``Site`` lists are exploded (main.rs:73-74) — with ``config_order``
preserving first-match-wins array order (main.rs:70-76).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SITE_CONFIG_SCHEMA = StructType(
    [
        StructField("config_order", IntegerType(), False),
        StructField("site", StringType(), False),
        StructField("img_sel", StringType(), True),
        StructField("next_sel", StringType(), True),
        StructField("album_sel", StringType(), True),
    ]
)


def load_site_config_rows(path: str) -> list:
    """Explode a web.json-shaped config file into schema rows; the path
    may be on any pyarrow.fs scheme (local, file://, s3://, hdfs://)."""
    from img_spark import fsio

    cfg = json.loads(fsio.read_bytes(path))
    return rows_from_config(cfg)


def rows_from_config(cfg: list) -> list:
    rows = []
    for order, entry in enumerate(cfg):
        sites = entry.get("Site")
        if not isinstance(sites, str):
            continue
        # split_terminator(',') + trim, matching main.rs:73-74
        for dom in sites.split(","):
            dom = dom.strip()
            if not dom:
                continue
            rows.append(
                (
                    order,
                    dom,
                    _trim(entry.get("Img")),
                    _trim(entry.get("Next")),
                    _trim(entry.get("Album")),
                )
            )
    return rows


def _trim(v):
    return v.strip() if isinstance(v, str) else None


def site_config_df(spark: SparkSession, rows_or_path) -> DataFrame:
    if isinstance(rows_or_path, str):
        rows = load_site_config_rows(rows_or_path)
    else:
        rows = rows_or_path
    return spark.createDataFrame(rows, SITE_CONFIG_SCHEMA)


def compile_config_column(config_rows: list):
    """Build the coalesce/when lookup Column once — Column objects are
    immutable expression trees, so a crawler reuses one across every
    generation instead of re-issuing O(config) py4j calls per step."""
    host = F.regexp_replace(F.col("host"), "\\s+$", "")
    cfg_type = "struct<img_sel:string,next_sel:string,album_sel:string>"
    sel_struct = F.lit(None).cast(cfg_type)
    for order, dom, img, nxt, alb in sorted(
        config_rows, key=lambda r: r[0], reverse=True
    ):
        sel_struct = F.when(
            host.endswith(F.lit(dom)),
            F.struct(
                F.lit(img).cast(StringType()).alias("img_sel"),
                F.lit(nxt).cast(StringType()).alias("next_sel"),
                F.lit(alb).cast(StringType()).alias("album_sel"),
            ),
        ).otherwise(sel_struct)
    return sel_struct


def attach_site_config(frontier: DataFrame, config_rows: list) -> DataFrame:
    """P2 config lookup (main.rs:65-80): suffix-match the host against
    each exploded domain (``host.trim_end().ends_with(domain)``), first
    config entry in file order wins.

    Scale design: the config is static and tiny (web.json: 114 entries /
    ~230 domains), so instead of a broadcast join + first-match window —
    which would shuffle the (10^10-row) frontier to deduplicate multi-
    domain matches — we compile the whole lookup into ONE coalesce/when
    column expression. That is a pure projection: zero shuffle, fully
    inside whole-stage codegen, and Catalyst constant-folds it. A
    broadcast nested-loop join would only win if the config had far more
    domains than codegen tolerates (~thousands).

    Host trimming: Rust host.trim_end() strips all trailing whitespace
    (main.rs:74); F.rtrim strips spaces only, so the compiled column
    uses a trailing-\\s+ regexp_replace (ASCII whitespace — every char a
    URL host can realistically carry). Callers in a loop should compile
    once with ``compile_config_column`` and pass the Column here.
    """
    sel_struct = (
        config_rows
        if not isinstance(config_rows, list)
        else compile_config_column(config_rows)
    )
    return (
        frontier.withColumn("__cfg", sel_struct)
        .withColumn("img_sel", F.col("__cfg.img_sel"))
        .withColumn("next_sel", F.col("__cfg.next_sel"))
        .withColumn("album_sel", F.col("__cfg.album_sel"))
        .drop("__cfg")
    )
