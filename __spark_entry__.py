"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (star join + aggregation) at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full named registry
from ``etl_onprem_to_cloud_spark.queries`` (each Spark implementation
paired, where SQL-expressible, with a DuckDB oracle over the same
parquet tables; see that package for the column-aliasing and
decimal-aggregation conventions that make the two engines hash-compare).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_onprem_to_cloud_spark.queries import oracle_queries, spark_queries

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_onprem_to_cloud_spark.queries.relational import (
        q05_local_supplier_volume,
    )

    return q05_local_supplier_volume(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return oracle_queries()
