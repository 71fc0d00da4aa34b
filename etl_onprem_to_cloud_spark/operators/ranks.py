"""Distributed global-order ranking without single-partition windows.

A window with an empty ``partitionBy`` executes as ONE task holding
every input row (Spark's ``WindowExec: No Partition Defined`` warning)
-- fine over a bounded stream (a global rank of 25 nation rollups), a
scale-killer over a corpus-width one (a global ntile of raw lineitem
is a single task sorting 6B rows at the third decade).  The helper
here computes the EXACT same global statistic through the repo's
block-carry idiom (queries/events.py watermark audit,
queries/learn.py ROC): rank within order-aligned blocks in parallel,
aggregate per-block counts (bounded: one row per block), run the only
global window over that bounded aggregate, and close the arithmetic
per row.  The registry-wide guard
``plans/checks.unpartitioned_corpus_windows`` +
``tests/test_plans.py`` fails any registered query that regresses to
a global corpus window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_global_ntile(
    df: DataFrame,
    block: Column,
    order_cols: list[str],
    n_buckets: int,
    out_col: str = "bucket",
) -> DataFrame:
    """Exact ``ntile(n_buckets) OVER (ORDER BY <block>, *order_cols)``
    with no global data window.

    ``block`` must be a MONOTONE function of the leading sort key --
    the key itself (curriculum difficulty score, a z-value of bounded
    domain) or ``key DIV width`` (arrival order over a growing id) --
    so that sorting by ``(block, *order_cols)`` equals the intended
    total order.  As with any ntile, a deterministic result needs the
    combined order to be a total order (unique tie-break column).

    Shape: one partitioned window (parallel at every scale), one
    per-block count aggregate, one global window over that BOUNDED
    aggregate only, a broadcast carry join, and the closed-form ntile
    bucket from the 0-based global index ``i``: with ``n`` rows and
    ``k`` buckets, the first ``n % k`` buckets get ``n DIV k + 1``
    rows (the Spark/DuckDB first-buckets-get-the-remainder contract):

        big = n DIV k + 1;  cut = (n % k) * big
        bucket(i) = i DIV big + 1                      if i < cut
                    (n % k) + (i - cut) DIV (n DIV k) + 1  otherwise

    (``n < k`` degenerates to one row per bucket through the first
    branch; the second branch's ``DIV 0`` is never selected.)
    """
    k = int(n_buckets)
    blk = df.withColumn("__blk", block)
    wl = Window.partitionBy("__blk").orderBy(*order_cols)
    loc = blk.withColumn("__rn", F.row_number().over(wl))
    btot = blk.groupBy("__blk").agg(F.count(F.lit(1)).alias("__bn"))
    wb = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    carry = btot.select(
        "__blk",
        F.coalesce(F.sum("__bn").over(wb), F.lit(0)).cast("bigint").alias("__off"),
    )
    tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    return (
        loc.join(F.broadcast(carry), "__blk")
        .crossJoin(F.broadcast(tot))
        .withColumn("__i", (F.col("__off") + F.col("__rn") - F.lit(1)).cast("bigint"))
        .withColumn(
            out_col,
            F.expr(
                f"CAST(IF(__i < (__n % {k}) * (__n DIV {k} + 1), "
                f"__i DIV (__n DIV {k} + 1), "
                f"(__n % {k}) + (__i - (__n % {k}) * (__n DIV {k} + 1)) "
                f"DIV (__n DIV {k})) + 1 AS INT)"
            ),
        )
        .drop("__blk", "__rn", "__off", "__n", "__i")
    )
