"""Bucketed (co-located) joins -- the shuffle-elimination strategy for
repeated fact-fact joins at 100 TB.

A join between two tables bucketed by the same key into the same bucket
count needs NO exchange: each task zips bucket i of both sides
(SortMergeJoin over pre-sorted buckets).  For a fact table joined on the
same key by many downstream queries (orders x lineitem on orderkey,
events x sessions on user_id), paying one bucketed write amortizes the
shuffle across every subsequent join.

The reference has no notion of physical layout beyond flat overwrites
(reference etl/transform.py:205); its delegated warehouse (Athena over
Glue) gets layout from partition folders only.  Bucketing is the Spark
catalog's native co-location primitive (hive-style bucket files +
metastore bucket spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``sort_cols`` defaults to ``bucket_cols`` so SortMergeJoin can skip
    its sort step entirely.
    """
    w = df.write.mode(mode).format("parquet")
    if path:
        w = w.option("path", path)
    w = w.bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs the plan contains zero Exchange nodes
    (asserted in tests/test_bucketing.py) -- the join cost is a linear
    merge per bucket.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
