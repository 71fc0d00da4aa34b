"""Distributed global-order statistics without single-partition windows.

A window with an empty ``partitionBy`` executes as ONE task holding
every input row (Spark's ``WindowExec: No Partition Defined`` warning)
-- fine over a bounded stream (a global rank of 25 nation rollups), a
scale-killer over a corpus-width one (a global ntile of raw lineitem
is a single task sorting 6B rows at the third decade).  The helpers
here compute EXACT global order statistics (ntile, row_number,
running sums) through the repo's block-carry idiom (queries/events.py
watermark audit, queries/learn.py ROC): rank/accumulate within
order-aligned blocks in parallel, aggregate per-block partials
(bounded: one row per block), run the only global window over that
bounded aggregate, and close the arithmetic per row.

Boundedness is load-bearing twice over (ADVICE r9 medium):

* STATICALLY, the carry subtree carries an explicit ``.limit(
  max_blocks)`` value no-op, so the registry guard
  (``plans/checks.corpus_broadcast_hints`` /
  ``unpartitioned_corpus_windows``) can PROVE the global window and
  the broadcast carry bounded instead of trusting any aggregate.
* AT RUNTIME, the carried offset is poisoned with ``raise_error``
  whenever the REAL block count (counted before the limit can
  truncate) exceeds ``max_blocks`` -- a caller who blocks on a
  near-unique key gets a loud error naming the hazard, never a
  silently-truncated result or a silently-reintroduced corpus-sized
  single-task window.

``range_block`` derives a block id whose count is bounded by
CONSTRUCTION (min/max-scaled buckets of the sort key), so arbitrary
numeric sort keys -- revenue, event values, customer metrics -- get
the same treatment as fixed-domain keys like a 16-bit z-value, and
the block count stays ~constant across data decades instead of
growing with the key range (ADVICE r9 low on the arrival-order
``DIV`` block).

The registry-wide guard in ``tests/test_plans.py`` fails any
registered query that regresses to a global corpus window or an
unbounded broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default carry bound: a 64Ki-row carry broadcasts in ~1 MB at any
#: corpus size.  Callers with a tighter domain (a 16-bit z-value)
#: pass it explicitly; callers with a wider one must say so.
DEFAULT_MAX_BLOCKS = 65536


def range_block(
    df: DataFrame,
    key: Column,
    n_blocks: int = 4096,
    descending: bool = False,
    out_col: str = "__blk",
) -> DataFrame:
    """Attach a block id in ``[0, n_blocks)`` that is MONOTONE in
    ``key`` (non-decreasing for ascending order, non-increasing key ->
    non-decreasing block for ``descending=True``) with equal keys
    always in the same block -- the precondition of every blocked
    helper below, now guaranteed by construction for any non-null
    numeric/date-castable key.

    Shape: one scalar min/max aggregate over the key column (a cheap
    columnar scan), broadcast into a crossJoin, then pure arithmetic:
    ``floor((key - min) / span * n_blocks)`` clamped to the last
    block.  Block COUNT is bounded by ``n_blocks`` at any corpus size
    -- unlike ``key DIV width`` blocks, whose count grows linearly
    with the key range.  The double cast used for scaling only has to
    be monotone (equal inputs -> equal blocks), so decimal/integer
    keys of any width are safe.

    Skew note: value-concentrated keys give uneven blocks, but every
    block still processes in parallel with its siblings, and the
    in-block windows stay partitioned; perfect uniformity is not
    required, only boundedness and monotonicity.
    """
    if n_blocks < 1:
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    bounds = df.agg(
        F.min(key).cast("double").alias("__kmin"),
        F.max(key).cast("double").alias("__kmax"),
    )
    kd = key.cast("double")
    span = F.col("__kmax") - F.col("__kmin")
    asc = F.when(span <= F.lit(0.0), F.lit(0)).otherwise(
        F.least(
            F.lit(n_blocks - 1),
            F.floor((kd - F.col("__kmin")) / span * F.lit(float(n_blocks))),
        )
    ).cast("int")
    blk = (F.lit(n_blocks - 1) - asc) if descending else asc
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, blk.cast("int"))
        .drop("__kmin", "__kmax")
    )


def _guarded_carry(
    btot: DataFrame,
    block_col: str,
    max_blocks: int,
    carry_sums: dict[str, str],
    caller: str,
) -> DataFrame:
    """The bounded exclusive-prefix carry shared by every blocked
    helper: per-block partials in ``btot`` (one row per block) ->
    explicit ``.limit(max_blocks)`` (the static bound the plan guards
    prove) -> ONE global window over that bounded stream -> carried
    offsets, each poisoned with ``raise_error`` if the true pre-limit
    block count exceeds ``max_blocks`` (the runtime bound that makes
    misuse -- blocking on a near-unique key -- fail loudly instead of
    degrading to a corpus-sized carry or a truncated result).

    ``carry_sums``: ``{out_col: partial_col}``; every ``out_col`` is
    the exclusive (strictly-prior-blocks) sum of ``partial_col``.
    """
    nb = btot.agg(F.count(F.lit(1)).alias("__nb"))
    wb = Window.orderBy(block_col).rowsBetween(Window.unboundedPreceding, -1)

    def guard(col: Column) -> Column:
        return F.when(
            F.col("__nb") > max_blocks,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"{caller}: block count "
                    ),
                    F.col("__nb").cast("string"),
                    F.lit(
                        f" exceeds max_blocks={max_blocks}; the block "
                        "column must have bounded cardinality (use "
                        "range_block or raise max_blocks consciously) "
                        "-- a near-unique block key degrades to one "
                        "row per block and a corpus-sized carry"
                    ),
                )
            ),
        ).otherwise(col)

    limited = btot.crossJoin(F.broadcast(nb)).limit(max_blocks)
    cols = [F.col(block_col)]
    for out, src in carry_sums.items():
        cols.append(
            guard(
                F.coalesce(F.sum(src).over(wb), F.lit(0))
            ).alias(out)
        )
    return limited.select(*cols)


def blocked_running(
    df: DataFrame,
    block_col: str,
    order_cols: list,
    running_sums: dict[str, str | Column] | None = None,
    row_number_col: str | None = None,
    max_blocks: int = DEFAULT_MAX_BLOCKS,
) -> DataFrame:
    """Exact global running sums and/or ``row_number`` over the total
    order ``(block_col, *order_cols)`` with no global data window.

    ``block_col`` (already attached -- see :func:`range_block`) must
    be monotone in the leading sort key with equal keys in the same
    block, so the blocked order equals the intended total order.
    ``running_sums``: ``{out_col: value_col_or_expr}`` -> inclusive
    (``UNBOUNDED PRECEDING .. CURRENT ROW``) running sum of
    ``value_col``; subtract the current value for the exclusive form.
    ``row_number_col``: global 1-based row number.

    Shape: one partitioned in-block window (parallel at every scale),
    one per-block partial aggregate, the guarded bounded carry
    (:func:`_guarded_carry`), and a broadcast join to close the
    arithmetic -- identical cost model to :func:`blocked_global_ntile`.
    """
    running_sums = running_sums or {}
    if not running_sums and row_number_col is None:
        raise ValueError("nothing to compute: no sums, no row_number")
    wl = Window.partitionBy(block_col).orderBy(*order_cols)
    wrun = wl.rowsBetween(Window.unboundedPreceding, 0)

    aggs = [F.count(F.lit(1)).alias("__bn")]
    carry_spec = {}
    if row_number_col is not None:
        carry_spec["__off_rn"] = "__bn"
    for out, src in running_sums.items():
        aggs.append(F.sum(src).alias(f"__bs_{out}"))
        carry_spec[f"__off_{out}"] = f"__bs_{out}"
    btot = df.groupBy(block_col).agg(*aggs)
    carry = _guarded_carry(
        btot, block_col, max_blocks, carry_spec, "blocked_running"
    )

    out = df.join(F.broadcast(carry), block_col)
    if row_number_col is not None:
        out = out.withColumn(
            row_number_col,
            (F.col("__off_rn") + F.row_number().over(wl)).cast("bigint"),
        )
    for name in running_sums:
        out = out.withColumn(
            name, F.col(f"__off_{name}") + F.sum(running_sums[name]).over(wrun)
        )
    drop = [c for c in out.columns if c.startswith("__off_")]
    return out.drop(*drop)


def blocked_global_ntile(
    df: DataFrame,
    block: Column,
    order_cols: list,
    n_buckets: int,
    out_col: str = "bucket",
    max_blocks: int = DEFAULT_MAX_BLOCKS,
) -> DataFrame:
    """Exact ``ntile(n_buckets) OVER (ORDER BY <block>, *order_cols)``
    with no global data window.

    ``block`` must be a MONOTONE function of the leading sort key --
    the key itself (curriculum difficulty score, a z-value of bounded
    domain), ``key DIV width`` (arrival order over a growing id), or a
    :func:`range_block` column -- so that sorting by
    ``(block, *order_cols)`` equals the intended total order.  As with
    any ntile, a deterministic result needs the combined order to be a
    total order (unique tie-break column).

    ``block`` must ALSO have bounded cardinality (<= ``max_blocks``):
    the carry aggregate is one row per block and the only global
    window runs over it, so "bounded" is only true while the block
    count is.  A near-unique block key (a raw float score, a row id)
    degrades to one row per block -- a corpus-sized carry and a
    corpus-sized global window one level up.  Both bounds are
    enforced: the plan carries an explicit ``.limit(max_blocks)`` (so
    the registry guards PROVE the shape bounded) and the carried
    offset raises at runtime if the true block count exceeds
    ``max_blocks`` (so misuse fails loudly -- see ``_guarded_carry``).

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
    carry = _guarded_carry(
        btot, "__blk", max_blocks, {"__off": "__bn"}, "blocked_global_ntile"
    ).select("__blk", F.col("__off").cast("bigint").alias("__off"))
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
