"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over laposte_data_engineering_jedha_spark.queries — the registry
where every SURVEY.md §2 operator registers a (spark, sf_dir) callable and
its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from laposte_data_engineering_jedha_spark import queries as q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.pipeline_delay_status(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
