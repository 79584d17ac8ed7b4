"""Robots rules + per-host politeness budget (north_rule components; no
counterpart in the reference — its only politeness is the referer header
main.rs:641 and the sequential one-page-at-a-time loop main.rs:42-46).

Design for scale:
- robots is tiny → ``F.broadcast`` join; the longest-matching-prefix
  resolution runs over the per-generation CANDIDATE batch (newly
  discovered URLs), never over the full frontier — each URL is
  robots-checked exactly once, at enqueue time.
- the per-host top-K dispatch is a window ``row_number`` ordered by the
  DFS ``path`` — the idiomatic-Spark realization of the reference's
  sequential per-site loop (SURVEY.md §2.7). This is the one
  frontier-sized shuffle per generation (the crawler's "generate" step —
  same shape as Nutch's CrawlDb generate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ROBOTS_DDL = "host string, path_prefix string, allow boolean, crawl_delay double"


def robots_df(spark, rows) -> DataFrame:
    return spark.createDataFrame(rows, ROBOTS_DDL)


def apply_robots(
    candidates: DataFrame,
    robots: DataFrame,
    key_cols: tuple = ("url",),
) -> DataFrame:
    """Adds ``allowed`` (boolean, default True when no rule matches) and
    ``crawl_delay`` columns. Longest matching path_prefix wins.

    ``candidates`` must carry ``host`` and ``url``; ``key_cols`` must
    uniquely identify a candidate ROW (pass e.g. ("url", "path") when
    the same url can be discovered by several parents — otherwise the
    first-match window would nondeterministically collapse them).
    """
    pos = F.instr(F.col("url"), "://")
    rest = F.when(pos > 0, F.substring(F.col("url"), pos + 3, F.lit(1 << 30))).otherwise(
        F.col("url")
    )
    slash = F.instr(rest, "/")
    path = F.when(slash > 0, F.substring(rest, slash, F.lit(1 << 30))).otherwise(
        F.lit("/")
    )
    cand = candidates.withColumn("__path", path)
    j = cand.join(F.broadcast(robots), "host", "left").withColumn(
        "__match",
        F.col("path_prefix").isNotNull()
        & F.col("__path").startswith(F.col("path_prefix")),
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.when(F.col("__match"), F.length("path_prefix")).otherwise(-1).desc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            "allowed",
            F.when(F.col("__match"), F.col("allow")).otherwise(F.lit(True)),
        )
        .withColumn(
            "crawl_delay",
            F.when(F.col("__match"), F.col("crawl_delay")).otherwise(F.lit(0.0)),
        )
        .drop("__rn", "__match", "__path", "path_prefix", "allow")
    )


def dispatch_top_k(
    pending: DataFrame,
    host_budget: int = 1,
    batch_window_s: float = 60.0,
) -> DataFrame:
    """Adds ``dispatch`` boolean: the per-host top-K by DFS path order.
    A row-level ``crawl_delay`` (from robots) CAPS the host budget at
    ``batch_window_s / delay`` (floored at 1) — a robots throttle can
    only lower the dispatch rate, never raise it above ``host_budget``;
    rows beyond the budget stay pending and keep their path priority
    (carry-over, SURVEY.md §4.3)."""
    budget = F.when(
        F.col("crawl_delay") > 0,
        F.least(
            F.lit(host_budget),
            F.greatest(
                F.lit(1),
                F.floor(F.lit(batch_window_s) / F.col("crawl_delay")).cast("int"),
            ),
        ),
    ).otherwise(F.lit(host_budget))
    w = Window.partitionBy("host").orderBy("path", "url")
    return pending.withColumn(
        "dispatch", F.row_number().over(w) <= budget
    )
