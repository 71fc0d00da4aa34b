"""Table-lifecycle queries: SCD2 history, snapshot diff, CDC apply
(operators/lifecycle.py), each with a DuckDB oracle.

The reference pipeline is overwrite-only (reference etl/transform.py:205,
etl/load.py:80-84); these queries declare the incremental-table surface
a warehouse-grade engine needs on top of it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.lifecycle import cdc_apply, scd2_build, table_diff
from ._util import cat, fmt_ts
from . import query


@query(
    "q_scd2_order_status_history",
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(1) OVER w IS NULL AS first_row,
         lag(o_orderstatus) OVER w AS prev_status
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
),
compressed AS (
  SELECT * FROM ordered
  WHERE first_row OR prev_status IS DISTINCT FROM o_orderstatus
)
SELECT o_custkey, o_orderstatus,
  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
  strftime(lead(o_orderdate) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
  CAST(lead(o_orderdate) OVER w2 IS NULL AS INT) AS is_current
FROM compressed
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
    tags=("scd2", "lifecycle", "window"),
    description="SCD Type-2 build (operators/lifecycle.scd2_build): compress "
    "each customer's order-status observations into change intervals with "
    "valid_from/valid_to/is_current. One keyed window shuffle, no joins.",
)
def q_scd2_order_status_history(spark, sf_dir):
    orders = cat(spark, sf_dir).orders
    hist = scd2_build(
        orders,
        keys=["o_custkey"],
        version_col="o_orderdate",
        attrs=["o_orderstatus"],
        tiebreakers=["o_orderkey"],
    )
    return hist.select(
        "o_custkey",
        "o_orderstatus",
        fmt_ts("valid_from", "valid_from"),
        fmt_ts("valid_to", "valid_to"),
        F.col("is_current").cast("int").alias("is_current"),
    )


@query(
    "q_table_diff_orders",
    oracle="""
WITH old_snap AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 <> 0
),
new_snap AS (
  SELECT o_orderkey, o_orderstatus,
    CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0
         ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 3 <> 0
)
SELECT * FROM (
  SELECT
    COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
    CASE
      WHEN n.o_orderkey IS NULL THEN 'delete'
      WHEN o.o_orderkey IS NULL THEN 'insert'
      WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
       AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
        THEN 'unchanged'
      ELSE 'update'
    END AS change_type,
    o.o_orderstatus AS o_orderstatus_old,
    n.o_orderstatus AS o_orderstatus_new,
    o.o_totalprice AS o_totalprice_old,
    n.o_totalprice AS o_totalprice_new
  FROM old_snap o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
) WHERE change_type <> 'unchanged'
""",
    tags=("diff", "lifecycle", "join"),
    description="Snapshot diff (operators/lifecycle.table_diff): classify "
    "keys as insert/delete/update between two deterministic order "
    "snapshots. One full-outer join; change test in the join projection.",
)
def q_table_diff_orders(spark, sf_dir):
    orders = cat(spark, sf_dir).orders
    old = orders.filter(F.col("o_orderkey") % 5 != 0)
    new = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 2 == 0, F.col("o_totalprice") + F.lit(1000.0)
        ).otherwise(F.col("o_totalprice")),
    )
    return table_diff(
        old, new, keys=["o_orderkey"], compare=["o_orderstatus", "o_totalprice"]
    )


@query(
    "q_cdc_apply_user_state",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type, value, 'U' AS op, 0 AS origin
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT user_id, event_id, ts, event_type, value,
    CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END, 1
  FROM events WHERE event_id % 2 = 1
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, origin DESC, event_id DESC) AS rn
  FROM tagged
)
SELECT user_id, event_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts,
  event_type, value
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
    tags=("cdc", "lifecycle", "merge"),
    description="CDC apply (operators/lifecycle.cdc_apply): even events as "
    "the base snapshot, odd events as an I/U/D changelog (every 7th is a "
    "delete); latest op per user wins, deleted users disappear. Single "
    "union + keyed window shuffle.",
)
def q_cdc_apply_user_state(spark, sf_dir):
    ev = cat(spark, sf_dir).events.select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    base = ev.filter(F.col("event_id") % 2 == 0)
    changes = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "op",
        F.when(F.col("event_id") % 7 == 0, F.lit("D")).otherwise(F.lit("U")),
    )
    applied = cdc_apply(
        base,
        changes,
        keys=["user_id"],
        op_col="op",
        version_col="ts",
        tiebreakers=["event_id"],
    )
    return applied.select(
        "user_id", "event_id", fmt_ts("ts", "latest_ts"), "event_type", "value"
    )
