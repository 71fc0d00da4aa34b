"""Top-k operators.

- Global top-k: ``orderBy().limit(k)`` -- Spark plans TakeOrderedAndProject,
  which keeps only k rows per partition then merges on the driver; no
  global sort materialization even over 100 TB.
- Per-group top-k: window row_number + filter -- one shuffle on the
  group key, heap-bounded per group.

Determinism: callers must pass a total order (include a unique
tiebreaker column) or ties at the k boundary are arbitrary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = True,
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
