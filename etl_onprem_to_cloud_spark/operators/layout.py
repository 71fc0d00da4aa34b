"""Data-layout operators: Z-order (Morton) clustering for scan pruning.

At 100 TB the dominant cost is the scan, and the scan is only as good
as the file-level min/max statistics parquet gives the reader.  Sorting
by ONE column clusters that column but scatters every other; a Z-order
(Morton) interleave of two columns' bits gives files that are tight in
BOTH dimensions, so predicates on either column prune files.

``morton_code`` is pure integer arithmetic (mask + shift per bit,
unrolled), fully inside whole-stage codegen and bit-identical in any
engine -- the DuckDB oracle recomputes it with the same formula
(queries/scale.py builds both expression trees from one generator).

``zorder_write`` is the actual layout pass: ``repartitionByRange`` on
the code (one range-exchange; sampled bounds, so no driver sort) then
``sortWithinPartitions`` so every output file covers a contiguous
Z-range.  The reference has no layout surface at all (it writes one
unpartitioned overwrite, etl/transform.py:205); this is Ring C scale
work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def morton_code(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints.

    Bit ``b`` of ``x`` lands at position ``2b``, of ``y`` at ``2b+1``:
    ``sum_b (x & 2^b) * 2^b + (y & 2^b) * 2^(b+1)``.  Inputs must be
    pre-reduced to ``[0, 2^bits)`` (e.g. ``col % 256``) by the caller.
    """
    terms: list[Column] = []
    for b in range(bits):
        terms.append(x.bitwiseAND(F.lit(1 << b)) * F.lit(1 << b))
        terms.append(y.bitwiseAND(F.lit(1 << b)) * F.lit(1 << (b + 1)))
    code = terms[0]
    for t in terms[1:]:
        code = code + t
    return code.cast("bigint")


def morton_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical interleave as a DuckDB/ANSI SQL expression string
    (kept next to :func:`morton_code` so the two can never drift)."""
    terms = []
    for b in range(bits):
        terms.append(f"(({x} & {1 << b}) * {1 << b})")
        terms.append(f"(({y} & {1 << b}) * {1 << (b + 1)})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    num_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of two columns.

    Range-partition on the code (num_files ranges from a sample -- no
    global sort, no single-task bottleneck), sort within each partition,
    drop the helper column, write.  Each file's (x, y) min/max footer
    stats then cover a compact rectangle, so a reader filtering on
    either column skips most files.
    """
    code = morton_code(
        (F.col(x_col) % (1 << bits)).cast("int"),
        (F.col(y_col) % (1 << bits)).cast("int"),
        bits,
    )
    (
        df.withColumn("__z", code)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
