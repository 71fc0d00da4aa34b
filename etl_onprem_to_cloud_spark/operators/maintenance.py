"""Table-maintenance operators: latest-wins upsert (merge) and column
profiling.

The reference's pipeline only ever overwrites whole outputs
(reference etl/transform.py:205, etl/load.py:80-84); a warehouse-grade
engine needs keyed incremental merges.  Without a transactional table
format, merge = full rewrite of the logical table, but the OPERATOR cost
is what matters at scale: one union + one keyed window shuffle, no joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Latest-wins merge: one row per key, the highest ``version_col``
    across base+updates; updates beat base on version ties.

    union + row_number over (keys, version desc, origin desc): a single
    keyed shuffle, linear in rows -- vs the naive full outer join which
    shuffles both sides AND breaks on multi-row-per-key updates.

    ``tiebreakers`` (e.g. a unique event id) extend the window order so
    two updates carrying the same key AND version still pick one
    deterministic survivor; without one, the survivor among exact
    version ties is arbitrary and reruns are not reproducible.
    """
    keys = list(keys)
    tagged = base.withColumn("__origin", F.lit(0)).unionByName(
        updates.withColumn("__origin", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(),
        F.col("__origin").desc(),
        *[F.col(t).desc() for t in tiebreakers],
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__origin")
    )


def profile_columns(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str) per column -- the ANALYZE-style statistics the
    reference leaves to the Glue crawler (reference README.md:145-182).

    Single aggregation job (every statistic is a column expression in
    ONE agg), then an unpivot; no per-column scans.
    """
    cols = list(columns or df.columns)
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__rows").alias("n_rows"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_str"),
                        F.col(f"{c}__max").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")
