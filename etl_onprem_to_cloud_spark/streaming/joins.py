"""Watermarked stream-stream joins.

The missing piece between stream-static enrichment (windows.py
stream_static_enrich) and the batch as-of join (operators/asof.py):
joining two UNBOUNDED sides.  Spark buffers both sides in state; the
join is only feasible when watermarks plus a time-range condition bound
how long a row can wait for its match -- state is then
O(arrival rate x (watermark + max_delay)) per side, independent of
stream length.

``click_purchase_attribution_stream`` is the canonical shape: attribute
each purchase to every click by the same user in the preceding
``max_delay``.  Written against unbounded DataFrames but runnable on
batch ones unchanged -- which is how the test differentials it against
the batch result (tests/test_streaming_joins.py).

Both public variants share ONE builder (projection schema, watermarks,
and the range condition -- the state-eviction contract -- live in a
single place), differing only in join type and watermark optionality.

The reference has no streaming at all (its 5-minute cron is commented
out, reference dags/etl_csv_to_dwh.py:14); Ring B/C extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str,
    watermark: str | None,
    how: str,
) -> DataFrame:
    """Shared body: select/watermark both sides, range condition,
    join, output projection.  Callers fix `how` and the watermark
    contract; everything else is defined exactly once."""
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermark is not None:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (c["user_id"] == p["p_user_id"])
        & (p["purchase_ts"] >= c["click_ts"])
        & (p["purchase_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(p, cond, how).select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def click_purchase_attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Inner-join purchases to same-user clicks in the trailing window.

    Both sides get event-time watermarks (TIMESTAMP cast as in
    windows.py _with_watermark: the session runs fixed-UTC, so the cast
    from TIMESTAMP_NTZ is value-preserving); the range condition
    ``click_ts <= purchase_ts <= click_ts + max_delay`` lets Spark
    evict click state older than watermark + max_delay and purchase
    state older than watermark.

    ``watermark=None`` keeps all state forever (inner joins permit it):
    correct for any arrival order, but unbounded -- use only when the
    replay source is not time-ordered (e.g. backfills over unsorted
    files) AND the run is finite.  A production stream should always
    set a watermark; events arriving later than it are dropped, which
    is the documented trade against bounded state.
    """
    return _attribution_join(clicks, purchases, max_delay, watermark, "inner")


def click_purchase_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant: every click emits -- matched rows eagerly,
    unmatched ones (purchase columns null) only once the click's
    watermark window has passed and no match can still arrive.  That
    deferred-null semantics is what makes outer stream-stream joins
    different in kind from inner ones, and why the watermark is
    REQUIRED here (state could never be declared unmatched without a
    bound on lateness; Spark rejects the plan otherwise).

    The conversion-funnel shape: clicks that never converted within
    ``max_delay``, emitted continuously instead of by a batch sweep.
    """
    if watermark is None:
        raise ValueError(
            "outer stream-stream joins require a watermark: without a "
            "lateness bound no click could ever be declared unmatched"
        )
    return _attribution_join(
        clicks, purchases, max_delay, watermark, "left_outer"
    )
