"""Structured-Streaming metrics over the crawl's extracted sink.

The frontier loop itself cannot be a readStream (self-feedback,
SURVEY.md §7.7), but its APPEND-ONLY outputs can: the per-generation
``extracted/g*/`` parquet deltas form a file-source stream. This module
aggregates them with a real Structured Streaming query — per-host image
counts — demonstrating the streaming surface (readStream → groupBy agg →
writeStream, availableNow/continuous triggers) on the engine's own data.

At scale this runs as a separate always-on job against the checkpoint
bucket; per-host counts feed the politeness budget controller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EXTRACTED_SCHEMA = (
    "page_url string, host string, status string, dir_title string,"
    " title string, generation int, extracted_text string,"
    " img_url string, origin string"
)


def extracted_stream(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EXTRACTED_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(f"{checkpoint_dir}/extracted/g*")
    )


def host_metrics_stream(stream: DataFrame) -> DataFrame:
    """Per-host rolling counts (complete-mode aggregate)."""
    return stream.groupBy("host").agg(
        F.count(F.col("img_url")).alias("imgs"),
        F.approx_count_distinct("page_url").alias("pages"),
        F.max("generation").alias("last_generation"),
    )


def run_available_now(
    spark: SparkSession, checkpoint_dir: str, sink_name: str = "crawl_metrics"
):
    """Drain everything currently in the sink into an in-memory table
    (test/driver mode); returns the finished query's table name."""
    q = (
        host_metrics_stream(extracted_stream(spark, checkpoint_dir))
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink_name
