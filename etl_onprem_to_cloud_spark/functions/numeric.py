"""Numeric helpers with deterministic, engine-portable aggregation.

Summing doubles is order-dependent (Spark's partial aggregation order
differs run to run and engine to engine), which breaks exact
oracle/value-hash comparisons and makes results nondeterministic at
scale.  The engine's declared aggregate queries therefore cast inputs to
exact DECIMAL first: decimal sums are exact and order-independent, so
Spark and any ANSI engine (the DuckDB oracle, a warehouse) produce
bit-identical results.  Final values are rounded and cast back to DOUBLE
for a stable output schema.

At 100 TB this also matters operationally: money-style sums over 1e12
rows accumulate ~1e-4 absolute float error per group -- decimal
aggregation makes reruns reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    """Exact decimal view of a double column (inputs here carry <= 6
    meaningful decimal digits)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum_round(col: Column | str, alias: str, round_to: int = 2) -> Column:
    """Exact decimal sum, rounded, surfaced as DOUBLE."""
    return F.round(F.sum(dec(col)), round_to).cast("double").alias(alias)


def portable_round(col: Column, round_to: int = 4) -> Column:
    """Engine-portable round-half-up on a double, written as explicit
    IEEE ops: floor(x * 10^n + 0.5) / 10^n.

    ``F.round``/DuckDB ``round`` disagree on rare boundary doubles
    (their internal scaling differs); spelling the arithmetic out makes
    both engines execute the identical op sequence.  Negative inputs
    are deterministic but round HALF TOWARD +INF (floor(-1.5 + 0.5) =
    -1), not half-away-from-zero -- fine for the cross-engine equality
    contract (both engines run the same expression; used on negative-
    capable values by q_ttest_purchase_view's t-stat and
    q_regression_price_on_qty's slope/intercept), just not a
    round-half-up-in-magnitude.  Duck twin:
    :func:`queries._util.duck_pround`.
    """
    p = float(10**round_to)
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)


def davg_round(col: Column | str, alias: str, round_to: int = 4) -> Column:
    """avg = exact decimal sum / count, computed in double.

    Both engines derive the same exact sum, then perform the identical
    IEEE division -> identical double -> identical round.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(dec(c)).cast("double") / F.count(c).cast("double"), round_to
    ).cast("double").alias(alias)
