"""As-of (point-in-time) join -- an operator Spark lacks natively.

For each left row, attach the latest right row whose timestamp is <= the
left timestamp (direction="backward"), matching on equality keys.  The
reference system has no such operator (its only join surface is the
Athena SQL it delegates to, reference README.md:184-199); this is part
of the engine's Ring C / time-series extension surface.

Scale design: the naive formulation is a range join
(``l.ts >= r.ts`` + dedup to the max), which Catalyst plans as a
broadcast-nested-loop or a cartesian per key group -- quadratic blowup
per user at 100 TB.  Instead we use the union + ordered-window
carry-forward pattern:

1. union the two sides with aligned schemas and a ``_side`` tag
   (right=0, left=1 so an equal-timestamp right row sorts first =>
   inclusive ``>=`` semantics),
2. one shuffle: window partitioned by the equality keys, ordered by
   (ts, _side, tiebreak),
3. ``last(col, ignorenulls=True)`` carries each right payload forward,
4. keep only left rows.

Cost is a single hash shuffle + per-partition sort -- the same price as
any keyed window, linear in rows, skew-handled by AQE.  This is the
standard streaming-warehouse trick (same shape Flink uses for temporal
joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_TIE = "__asof_tie"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right payload columns of
    the most recent right row with ``right.right_ts <= left.left_ts`` and
    equal ``on`` keys (NULLs when no such row).

    ``tiebreak`` names a right column ordering equal-timestamp right rows
    (the largest wins) so results are deterministic; ``tolerance_us``
    nulls out matches older than the given microsecond gap.
    """
    on = list(on)
    right_cols = [c for c in right_cols if c not in on and c != right_ts]
    left_payload = [c for c in left.columns if c not in on and c != left_ts]

    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias(_TIE),
        *[F.col(c) for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    left_tie = (
        F.lit(None).cast(right.schema[tiebreak].dataType) if tiebreak else F.lit(0)
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        left_tie.alias(_TIE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        *[F.col(c) for c in left_payload],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS), F.col(_SIDE), F.col(_TIE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        *on,
        _TS,
        _SIDE,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
        *[F.last(F.when(F.col(_SIDE) == 0, F.col(_TS)), ignorenulls=True).over(w).alias("__match_ts")],
        *left_payload,
    )
    out = carried.filter(F.col(_SIDE) == 1)

    if tolerance_us is not None:
        too_old = (
            F.unix_micros(F.col(_TS).cast("timestamp"))
            - F.unix_micros(F.col("__match_ts").cast("timestamp"))
        ) > F.lit(tolerance_us)
        out = out.select(
            *on,
            _TS,
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in right_cols
            ],
            F.when(too_old, F.lit(None)).otherwise(F.col("__match_ts")).alias("__match_ts"),
            *left_payload,
        )

    return out.select(
        *on,
        F.col(_TS).alias(left_ts),
        F.col("__match_ts").alias(f"{right_ts}_matched"),
        *right_cols,
        *left_payload,
    )
