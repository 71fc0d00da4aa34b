"""Table-maintenance queries: latest-wins merge and column profiling
(operators/maintenance.py), oracle-checked like every other entry."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.maintenance import merge_upsert, profile_columns
from ._util import cat, fmt_ts
from . import query


@query(
    "q_merge_upsert_latest_events",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, value, 0 AS origin
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT user_id, event_id, ts, value, 1 AS origin
  FROM events WHERE event_id % 2 = 1
)
SELECT user_id, event_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts,
  value
FROM tagged
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY ts DESC, origin DESC, event_id DESC) = 1
""",
    tags=("merge", "upsert", "maintenance"),
    description="Latest-wins keyed merge (operators/maintenance.merge_upsert): "
    "even events as base, odd as updates, one row per user at max ts.",
)
def q_merge_upsert_latest_events(spark, sf_dir):
    ev = cat(spark, sf_dir).events.select("user_id", "event_id", "ts", "value")
    base = ev.filter(F.col("event_id") % 2 == 0)
    updates = ev.filter(F.col("event_id") % 2 == 1)
    merged = merge_upsert(
        base, updates, keys=["user_id"], version_col="ts",
        tiebreakers=["event_id"],
    )
    return merged.select(
        "user_id", "event_id", fmt_ts("ts", "latest_ts"), "value"
    )


_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
  sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_nulls,
  count(DISTINCT {c}) AS n_distinct,
  min(CAST({c} AS VARCHAR)) AS min_str,
  max(CAST({c} AS VARCHAR)) AS max_str
FROM orders"""
    for c in _ORDER_COLS
)


@query(
    "q_profile_orders_columns",
    oracle=_PROFILE_ORACLE,
    tags=("profiling", "maintenance", "agg"),
    description="ANALYZE-style one-pass column profile of orders "
    "(operators/maintenance.profile_columns): null/distinct/min/max per "
    "column in a single aggregation job.",
)
def q_profile_orders_columns(spark, sf_dir):
    return profile_columns(cat(spark, sf_dir).orders, _ORDER_COLS)
