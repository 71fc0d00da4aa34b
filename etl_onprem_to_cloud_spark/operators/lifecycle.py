"""Table-lifecycle operators: SCD Type-2 history building, snapshot
diffing, and CDC changelog application.

The reference only ever overwrites whole tables (reference
etl/transform.py:205, etl/load.py:80-84) and leaves history/versioning
to the warehouse downstream.  A native engine needs the three classic
warehouse-lifecycle primitives, each shaped for 100 TB:

- ``scd2_build``: one keyed window shuffle (lag to detect change, lead
  to close intervals) -- no self-joins, linear in input rows.
- ``table_diff``: one full-outer equi-join on the key; change detection
  is a null-safe column comparison computed inside the join projection,
  so each side is scanned once and only key columns shuffle wide.
- ``cdc_apply``: union + one keyed window (latest-wins including
  deletes) -- the same single-shuffle shape as
  operators/maintenance.merge_upsert, extended with an op column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _all_eq_null_safe(left_prefix: str, right_prefix: str, cols: Sequence[str]) -> Column:
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(f"{left_prefix}.{c}").eqNullSafe(F.col(f"{right_prefix}.{c}"))
    return cond


def scd2_build(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    attrs: Sequence[str],
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension Type 2: collapse a versioned changelog
    into attribute-change intervals.

    Input: one row per (key, version) observation carrying ``attrs``.
    Output: one row per *attribute change*, with ``valid_from`` (the
    version that introduced the values), ``valid_to`` (the version of
    the next change, NULL while current) and ``is_current``.

    Consecutive observations with identical attrs are compressed away
    (lag comparison), so a key observed 10,000 times with 3 distinct
    attribute states yields 3 rows.

    Scale shape: two window passes over the SAME partitioning
    (keys x version order) -- Catalyst plans one Exchange + one Sort and
    reuses them for both windows; no joins, no second shuffle.
    ``tiebreakers`` make the version order total when ``version_col``
    can tie (same convention as maintenance.merge_upsert).
    """
    keys = list(keys)
    attrs = list(attrs)
    order = [F.col(version_col).asc()] + [F.col(t).asc() for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)

    # First observation of a key is always a change (guarded explicitly:
    # an attr that is NULL on the first row would otherwise null-safe
    # match the NULL lag and be dropped).
    changed = F.lag(F.lit(1)).over(w).isNull()
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    compressed = df.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")

    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        compressed.withColumn("valid_from", F.col(version_col))
        .withColumn("valid_to", F.lead(version_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*keys, *attrs, "valid_from", "valid_to", "is_current")
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot diff: classify every key as insert / delete / update /
    unchanged and emit the changed rows (unchanged rows are dropped --
    at scale the diff output is the small side).

    Output columns: keys, ``change_type``, then ``<c>_old`` /
    ``<c>_new`` for each compared column.

    Scale shape: one full-outer sort-merge join on the key columns;
    the null-safe attribute comparison happens in the join projection
    (codegen), never a second pass.  Both inputs are pruned to
    keys+compare before the shuffle.
    """
    keys = list(keys)
    compare = list(compare if compare is not None else [c for c in old.columns if c not in keys])
    o = old.select(*keys, *compare).alias("o")
    n = new.select(*keys, *compare).alias("n")
    on = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c

    joined = o.join(n, cond, "full_outer")
    old_present = F.col(f"o.{keys[0]}").isNotNull()
    new_present = F.col(f"n.{keys[0]}").isNotNull()
    same_attrs = _all_eq_null_safe("o", "n", compare)

    change = (
        F.when(old_present & ~new_present, F.lit("delete"))
        .when(~old_present & new_present, F.lit("insert"))
        .when(same_attrs, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    out_keys = [F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys]
    out_vals = []
    for c in compare:
        out_vals.append(F.col(f"o.{c}").alias(f"{c}_old"))
        out_vals.append(F.col(f"n.{c}").alias(f"{c}_new"))
    return (
        joined.select(*out_keys, change.alias("change_type"), *out_vals)
        .filter(F.col("change_type") != "unchanged")
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str,
    version_col: str,
    tiebreakers: Sequence[str] = (),
    upsert_op: str = "U",
    delete_op: str = "D",
) -> DataFrame:
    """Apply an insert/update/delete changelog to a base snapshot,
    producing the post-image table.

    Semantics: per key, the highest-version row across base+changes
    wins (changes beat base on exact version ties); if the winner is a
    change row carrying ``delete_op``, the key disappears.

    Scale shape: identical to maintenance.merge_upsert -- one union +
    one keyed window shuffle; the delete filter is a post-window
    predicate, no extra join.  ``changes`` may carry multiple ops per
    key; only the latest matters, which the window handles for free.
    """
    keys = list(keys)
    data_cols = [c for c in base.columns]
    tagged_base = base.select(*data_cols).withColumn("__op", F.lit(upsert_op)).withColumn(
        "__origin", F.lit(0)
    )
    tagged_changes = changes.select(*data_cols, F.col(op_col).alias("__op")).withColumn(
        "__origin", F.lit(1)
    )
    unioned = tagged_base.unionByName(tagged_changes)
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(),
        F.col("__origin").desc(),
        *[F.col(t).desc() for t in tiebreakers],
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("__op") != delete_op))
        .drop("__rn", "__op", "__origin")
    )
