"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query: the full image-extraction UDF over a
                synthesized pages table at sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 and the
                training-data pipeline ops); each callable takes
                (spark, sf_dir) and returns a DataFrame.
oracle_sql()  — equivalent DuckDB SQL per query (omitted only for the
                LSH ops whose hyperplane literals are engine-internal —
                their recall is pinned in tests/test_dataops.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from img_spark.plans.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: discovered-image URL sets via the Arrow extraction UDF
    over pages synthesized from /root/testdata/sf0.001 documents."""
    from img_spark.plans.queries import q_extract_images

    return q_extract_images(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
