"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew, but two cases still need explicit salting at 100 TB:

1. **Skewed aggregation** -- AQE cannot split a hash-aggregate group.
   ``salted_agg`` runs the aggregation in two stages: a partial pass
   over (key, salt) spreading one hot key across ``salts`` reducers,
   then a cheap final pass over the partials.  Works for any
   algebraically-mergeable aggregate (sum/count/min/max here).
2. **Skewed broadcast-impossible join** -- ``salted_join`` replicates
   the small side ``salts`` times and scatters the big side's hot keys,
   so one reducer never owns a whole hot key.

Both are pure DataFrame compositions (no RDDs), so AQE/codegen still
apply to every stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, salts: int) -> DataFrame:
    """Deterministic per-row salt in [0, salts): a hash of the whole row
    rather than rand() so reruns and retries stay stable (a failed task
    re-executing with fresh rand() salts would double-count partials).

    The hash mixes in ``monotonically_increasing_id()`` (partition id +
    per-partition row index) so EXACT duplicate rows -- the common shape
    of a hot key, e.g. dedup inputs -- still spread across salts instead
    of collapsing onto one value.  That id is stable across task retries
    whenever the input's partition contents are deterministic (file
    scans are); after a non-deterministic shuffle the same caveat applies
    to any salting scheme short of a persisted key."""
    h = F.hash(*[F.col(c) for c in df.columns], F.monotonically_increasing_id())
    return df.withColumn(_SALT, F.pmod(h, F.lit(salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}.  Stage 1 aggregates by (keys + salt); stage
    2 merges partials by keys (count partials merge by SUM).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out, (col, fn) in aggs.items():
        if fn not in firsts:
            raise ValueError(f"unsupported salted aggregate: {fn}")

    salted = with_salt(df, salts)
    partial = salted.groupBy(*keys, _SALT).agg(
        *[firsts[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[mergers[fn](out).alias(out) for out, (_c, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across every salt value, join on (keys + salt).  The small side
    grows ``salts``x (it must be small-ish, just not broadcastable);
    each hot key of the big side spreads over ``salts`` reducers.

    Only inner/left/left_semi are sound: with a replicated small side,
    each UNMATCHED small-side row of a right/full outer join would be
    emitted once per salt replica (``salts`` copies), so those modes
    raise instead of silently multiplying rows."""
    on = list(on)
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} -- "
            "right/full outer would emit unmatched small-side rows once "
            "per salt replica"
        )
    big_s = with_salt(big, salts)
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return big_s.join(replicated, on + [_SALT], how).drop(_SALT)
