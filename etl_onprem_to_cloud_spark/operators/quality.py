"""Deequ-style data-quality expectation checks.

A production ingest (the reference defends against dirty rows with
ad-hoc ``when`` re-guards and "Por si acaso" filters,
``/root/reference/etl/transform.py:139-144,199-200``) needs declared,
measurable expectations instead: each check is named, evaluated over the
full table in ONE aggregation pass, and reported as a row
``(check, violations, total, passed)`` so a pipeline can gate on it.

Scale shape: all predicate checks (completeness / set membership /
range / custom boolean) fold into a single global aggregate -- partial
aggregation map-side, one 1-row exchange, then an ``unpivot`` back to
one row per check.  No per-check scans.  Uniqueness and referential
integrity need their own shuffles by nature (a groupBy on the key and
an anti-join respectively); both are key-partitioned and
broadcast-friendly when the dimension side is small.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    """A named expectation: ``violation`` is a boolean Column that is
    true on rows BREAKING the expectation."""

    name: str
    violation: Column


def completeness(name: str, col: str) -> Check:
    return Check(name, F.col(col).isNull())


def in_set(name: str, col: str, allowed: list[str]) -> Check:
    return Check(name, ~F.col(col).isin(allowed) | F.col(col).isNull())


def in_range(name: str, col: str, lo: float, hi: float) -> Check:
    c = F.col(col)
    return Check(name, c.isNull() | (c < lo) | (c > hi))


def predicate_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all row-predicate checks in one aggregation pass.

    Output: ``check, violations, total, passed`` -- one row per check.
    The global special case of :func:`predicate_report_grouped` (empty
    group key); one code path keeps the streaming-monitor equivalence
    test honest for both shapes.
    """
    return predicate_report_grouped(df, checks, [])


def predicate_report_grouped(
    df: DataFrame, checks: list[Check], group_cols: list[str]
) -> DataFrame:
    """Per-group twin of :func:`predicate_report` -- the BATCH mirror
    of the streaming quality monitor (``streaming/quality.py``), which
    evaluates the same suite once per micro-batch: grouping a static
    table by its batch key produces exactly the report table the
    ``foreachBatch`` monitor appends to, one (group, check) row at a
    time, but in ONE keyed aggregation pass (map-side partials, one
    shuffle on the group key -- none at all when ``group_cols`` is
    empty -- then unpivot)."""
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(c.violation.cast("bigint")).alias(f"__v{i}")
        for i, c in enumerate(checks)
    ]
    wide = df.groupBy(*group_cols).agg(*aggs)
    stack_args: list[Column] = []
    for i, c in enumerate(checks):
        stack_args += [F.lit(c.name), F.col(f"__v{i}")]
    return (
        wide.select(
            *group_cols,
            F.col("__total"),
            F.stack(F.lit(len(checks)), *stack_args).alias("check", "violations"),
        )
        .select(
            *group_cols,
            "check",
            F.col("violations").cast("bigint").alias("violations"),
            F.col("__total").cast("bigint").alias("total"),
            (F.col("violations") == 0).alias("passed"),
        )
    )


def uniqueness_report(df: DataFrame, name: str, key_cols: list[str]) -> DataFrame:
    """Rows whose key occurs more than once count as violations (every
    row of a duplicated key, matching Deequ's uniqueness semantics)."""
    total = F.sum("__n").cast("bigint")
    dups = F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(F.lit(0)))
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.lit(name).alias("check"),
            dups.cast("bigint").alias("violations"),
            total.alias("total"),
            (dups == 0).alias("passed"),
        )
    )


def referential_report(
    child: DataFrame,
    name: str,
    fk: str,
    parent: DataFrame,
    pk: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Child rows whose FK has no parent PK are violations.  Set
    ``broadcast_parent=False`` when the parent key set is too large to
    broadcast; the plan degrades to a shuffled hash anti-join on the
    key -- the minimum possible work either way."""
    keys = parent.select(F.col(pk).alias("__pk")).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = child.join(keys, on=child[fk] == F.col("__pk"), how="left_anti")
    counts = child.agg(F.count(F.lit(1)).alias("__total")).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("__viol"))
    )
    return counts.select(
        F.lit(name).alias("check"),
        F.col("__viol").cast("bigint").alias("violations"),
        F.col("__total").cast("bigint").alias("total"),
        (F.col("__viol") == 0).alias("passed"),
    )
