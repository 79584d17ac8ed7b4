"""Custom stateful streaming operator: per-host crawl-rate accounting
via ``applyInPandasWithState`` over the extracted-sink stream.

This is the engine's politeness feedback signal: a Structured Streaming
query that keeps running per-host totals (pages, images, last seen
generation) as managed state across micro-batches — the
``applyInPandasWithState`` pattern the frontier's budget controller
would consume at scale. State is keyed by host, so the shuffle key
matches the politeness window's partitioning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from img_spark.streaming.metrics_stream import EXTRACTED_SCHEMA

STATE_DDL = "pages long, imgs long, last_generation int"
OUTPUT_DDL = (
    "host string, total_pages long, total_imgs long, last_generation int"
)


def _update(key, pdfs, state: GroupState):
    (host,) = key
    if state.exists:
        pages, imgs, last_gen = state.get
    else:
        pages, imgs, last_gen = 0, 0, -1
    new_pages = set()
    for pdf in pdfs:
        new_pages.update(pdf["page_url"].dropna().unique())
        imgs += int(pdf["img_url"].notna().sum())
        if len(pdf):
            last_gen = max(last_gen, int(pdf["generation"].max()))
    pages += len(new_pages)
    state.update((pages, imgs, last_gen))
    yield pd.DataFrame(
        [(host, pages, imgs, last_gen)],
        columns=["host", "total_pages", "total_imgs", "last_generation"],
    )


def host_rate_state_stream(stream: DataFrame) -> DataFrame:
    """Running per-host totals as managed streaming state."""
    return (
        stream.groupBy("host")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    spark: SparkSession,
    checkpoint_dir: str,
    sink_name: str = "host_rate_state",
):
    """Drain the current extracted deltas through the stateful operator
    into an in-memory sink; returns the sink table name."""
    src = (
        spark.readStream.schema(EXTRACTED_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(f"{checkpoint_dir}/extracted/g*")
        .select("host", "page_url", "img_url", "generation")
    )
    q = (
        host_rate_state_stream(src)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink_name
