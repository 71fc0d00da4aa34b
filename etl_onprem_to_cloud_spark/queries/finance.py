"""Financial-ETL allocation queries: exact proration and FIFO matching.

Reference parity note: the reference pipeline
(`/root/reference/README.md:184-199`) delegates every analytical
workload to Athena; allocation/matching queries of this family are the
bread-and-butter of the warehouse layer it feeds, so they are part of
the delegated surface this engine makes native (SURVEY.md §2b).

Cross-engine exactness discipline: every allocation runs in integer
cents / integer units end-to-end (BIGINT `DIV`/`%` on Spark, `//`/`%`
on DuckDB -- both exact, unlike floored double division above 2^52),
so the two engines produce bit-identical ledgers with no rounding
convention in play at all.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from . import query
from ._util import cat
from ..functions.numeric import portable_round

# --------------------------------------------------------------------------
# Largest-remainder proration
# --------------------------------------------------------------------------

_PRORATION_ORACLE = """
WITH base AS (
  SELECT l.l_orderkey,
    l.l_linenumber,
    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_c,
    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
shares AS (
  SELECT l_orderkey, l_linenumber, total_c, w,
    sum(w) OVER (PARTITION BY l_orderkey) AS w_tot
  FROM base
),
floored AS (
  SELECT l_orderkey, l_linenumber, total_c,
    (total_c * w) // w_tot AS floor_c,
    (total_c * w) % w_tot AS rem,
    count(*) OVER (PARTITION BY l_orderkey) AS n_items
  FROM shares
),
bumped AS (
  SELECT l_orderkey, total_c, n_items, floor_c,
    CASE WHEN row_number() OVER (
        PARTITION BY l_orderkey ORDER BY rem DESC, l_linenumber
      ) <= total_c - sum(floor_c) OVER (PARTITION BY l_orderkey)
      THEN 1 ELSE 0 END AS bump
  FROM floored
)
SELECT count(DISTINCT l_orderkey) AS n_orders,
  count(*) AS n_items,
  CAST(sum(bump) AS BIGINT) AS n_bumped,
  CAST(sum(floor_c + bump) AS BIGINT) AS alloc_total_cents,
  CAST(sum(CASE WHEN order_exact THEN 1 ELSE 0 END) AS BIGINT)
    AS n_exact_items
FROM (
  SELECT l_orderkey, floor_c, bump,
    sum(floor_c + bump) OVER (PARTITION BY l_orderkey) = total_c
      AS order_exact
  FROM bumped
)
"""


@query(
    "q_proration_largest_remainder",
    oracle=_PRORATION_ORACLE,
    tags=("finance", "allocation", "window", "exact-integer", "ring-c"),
    description=(
        "Prorate each order's total price (integer cents) across its "
        "line items proportionally to extended price using "
        "largest-remainder (Hamilton) rounding, so every order's "
        "allocated cents sum EXACTLY to its total: floor the ideal "
        "integer share total_c*w DIV sum(w), then hand the leftover "
        "cents to the largest remainders (line number breaks ties).  "
        "Emits the global reconciliation: n_exact_items must equal "
        "n_items -- the allocation invariant, checked across every "
        "order in one hash."
    ),
)
def q_proration_largest_remainder(spark, sf_dir):
    """Scale shape: every window partitions by l_orderkey, so the plan
    is ONE hash exchange on the order key reused across all four
    window/aggregation steps plus the orders broadcast-join side
    (orders is the small side per key after the join pushes only
    o_totalprice).  Products total_c*w stay < 2^63 (total < ~10^8
    cents, weight < ~10^7 cents).  `DIV`/`%` on BIGINT are exact in
    both engines; no double arithmetic anywhere."""
    c = cat(spark, sf_dir)
    base = c.lineitem.join(
        c.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("total_c"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("w"),
    )
    w_ord = Window.partitionBy("l_orderkey")
    shares = base.withColumn("w_tot", F.sum("w").over(w_ord))
    floored = shares.select(
        "l_orderkey",
        "l_linenumber",
        "total_c",
        F.expr("(total_c * w) DIV w_tot").alias("floor_c"),
        F.expr("(total_c * w) % w_tot").alias("rem"),
    )
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        F.col("rem").desc(), F.col("l_linenumber")
    )
    bumped = floored.select(
        "l_orderkey",
        "total_c",
        "floor_c",
        F.when(
            F.row_number().over(w_rank)
            <= F.col("total_c") - F.sum("floor_c").over(w_ord),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("bump"),
    )
    checked = bumped.withColumn(
        "order_exact",
        F.sum(F.col("floor_c") + F.col("bump")).over(w_ord) == F.col("total_c"),
    )
    return checked.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("bump").cast("bigint").alias("n_bumped"),
        F.sum(F.col("floor_c") + F.col("bump"))
        .cast("bigint")
        .alias("alloc_total_cents"),
        F.sum(F.when(F.col("order_exact"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact_items"),
    )


# --------------------------------------------------------------------------
# FIFO lot matching (cost of goods sold)
# --------------------------------------------------------------------------

_FIFO_ORACLE = """
WITH receipts AS (
  SELECT l_partkey,
    CAST(l_quantity AS BIGINT) AS q,
    CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)
      AS unit_c,
    sum(CAST(l_quantity AS BIGINT)) OVER (
      PARTITION BY l_partkey
      ORDER BY l_shipdate, l_orderkey, l_linenumber
    ) AS cum_q
  FROM lineitem WHERE l_returnflag <> 'R'
),
demand AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem WHERE l_returnflag = 'R'
  GROUP BY l_partkey
),
matched AS (
  SELECT r.l_partkey, d.d,
    greatest(CAST(0 AS BIGINT), least(r.q, d.d - (r.cum_q - r.q)))
      AS c_q,
    r.unit_c
  FROM receipts r JOIN demand d ON r.l_partkey = d.l_partkey
),
per_part AS (
  SELECT l_partkey AS partkey,
    any_value(d) AS demand_qty,
    CAST(sum(c_q) AS BIGINT) AS matched_qty,
    CAST(sum(c_q * unit_c) AS BIGINT) AS fifo_cogs_cents,
    CAST(sum(CASE WHEN c_q > 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_lots_touched
  FROM matched GROUP BY l_partkey
)
SELECT partkey, demand_qty, matched_qty,
  demand_qty - matched_qty AS unfilled_qty,
  fifo_cogs_cents, n_lots_touched
FROM per_part
ORDER BY demand_qty DESC, partkey LIMIT 50
"""


@query(
    "q_fifo_cost_matching",
    oracle=_FIFO_ORACLE,
    tags=("finance", "ledger", "window", "exact-integer", "ring-c"),
    description=(
        "FIFO lot matching: per part, returned quantity (returnflag "
        "'R') is consumed against supply lots (non-'R' line items) in "
        "ship-date order, and the consumed units are costed at each "
        "lot's own unit price -- first-in-first-out cost of goods "
        "sold.  The per-lot consumption is the closed form "
        "clamp(D - cum_before, 0, lot_qty) over the running supply "
        "total, so NO iterative matching is needed: one window cumsum "
        "plus a part-keyed join replaces the row-at-a-time ledger "
        "walk.  Top 50 parts by demand, integer units and cents "
        "throughout."
    ),
)
def q_fifo_cost_matching(spark, sf_dir):
    """Scale shape: the cumsum window, the demand rollup, and the join
    all key on l_partkey, so AQE reuses one hash partitioning; the
    final top-50 is a TakeOrdered, never a global sort.  Quantities
    are integral doubles (TPC-H) cast to BIGINT before any cumsum, so
    running totals are exact; the only double op is the shared
    unit-price quantization, the identical IEEE sequence in both
    engines."""
    li = cat(spark, sf_dir).lineitem
    w_cum = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    receipts = (
        li.filter(F.col("l_returnflag") != "R")
        .select(
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("q"),
            F.floor(
                F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("unit_c"),
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
        )
        .withColumn("cum_q", F.sum("q").over(w_cum))
    )
    demand = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("d"))
    )
    matched = receipts.join(demand, "l_partkey").select(
        "l_partkey",
        "d",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(F.col("q"), F.col("d") - (F.col("cum_q") - F.col("q"))),
        ).alias("c_q"),
        "unit_c",
    )
    per_part = matched.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.first("d").alias("demand_qty"),
        F.sum("c_q").cast("bigint").alias("matched_qty"),
        F.sum(F.col("c_q") * F.col("unit_c"))
        .cast("bigint")
        .alias("fifo_cogs_cents"),
        F.sum(F.when(F.col("c_q") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_lots_touched"),
    )
    return (
        per_part.select(
            "partkey",
            "demand_qty",
            "matched_qty",
            (F.col("demand_qty") - F.col("matched_qty")).alias("unfilled_qty"),
            "fifo_cogs_cents",
            "n_lots_touched",
        )
        .orderBy(F.col("demand_qty").desc(), "partkey")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Safety stock / reorder points (service-level inventory sizing)
# --------------------------------------------------------------------------

_SS_Z = "1.6448536269514722"  # z at 95% cycle service level
_SS_L = 7  # replenishment lead time, days

_SS_ORACLE = f"""
WITH d AS (
  SELECT l_partkey,
    CAST(floor(floor(epoch(l_shipdate)) / 86400) AS BIGINT) AS day,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_partkey, day
),
s AS (
  SELECT l_partkey,
    CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(q) AS BIGINT) AS sq,
    CAST(sum(q * q) AS BIGINT) AS sqq
  FROM d GROUP BY l_partkey HAVING count(*) >= 5
),
r AS (
  SELECT l_partkey, n_days,
    CAST(sq AS DOUBLE) / n_days AS mu,
    sqrt(greatest(0.0,
      (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n_days)
      / (n_days - 1))) AS sigma
  FROM s
)
SELECT l_partkey AS partkey, n_days,
  floor(mu * 1000000.0 + 0.5) / 1000000.0 AS daily_demand,
  floor({_SS_Z} * sigma * sqrt({_SS_L}.0) * 1000000.0 + 0.5)
    / 1000000.0 AS safety_stock,
  floor((mu * {_SS_L} + {_SS_Z} * sigma * sqrt({_SS_L}.0))
        * 1000000.0 + 0.5) / 1000000.0 AS reorder_point
FROM r
ORDER BY reorder_point DESC, partkey LIMIT 15
"""


@query(
    "q_safety_stock_parts",
    oracle=_SS_ORACLE,
    tags=("finance", "inventory", "ops", "ring-c"),
    description=(
        f"Service-level inventory sizing: per part, daily-demand mean "
        f"and standard deviation from exact integer sufficient "
        f"statistics over its demand days (>= 5 observed), safety "
        f"stock = z95 * sigma * sqrt(L) and reorder point = "
        f"mu*L + safety stock for a {_SS_L}-day lead time -- the 15 "
        "highest reorder points.  The inventory-planning companion of "
        "the FIFO ledger and Croston forecast: FIFO prices what "
        "happened, Croston predicts sparse demand, this sizes the "
        "buffer."
    ),
)
def q_safety_stock_parts(spark, sf_dir):
    """Two part-keyed aggregations (day rollup, then moment rollup --
    same key, one exchange reused) and a TakeOrdered(15); every
    statistic is an exact BIGINT until the final mu/sigma doubles,
    and sqrt is correctly rounded so both engines agree bit-for-bit."""
    li = cat(spark, sf_dir).lineitem
    d = (
        li.groupBy(
            "l_partkey",
            F.floor(
                F.floor(
                    F.unix_timestamp(F.col("l_shipdate").cast("timestamp"))
                ) / F.lit(86400)
            )
            .cast("bigint")
            .alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    )
    s = (
        d.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("q").cast("bigint").alias("sq"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sqq"),
        )
        .filter(F.col("n_days") >= 5)
    )
    mu = F.col("sq").cast("double") / F.col("n_days")
    sigma = F.sqrt(
        F.greatest(
            F.lit(0.0),
            (
                F.col("sqq").cast("double")
                - F.col("sq").cast("double") * F.col("sq") / F.col("n_days")
            )
            / (F.col("n_days") - 1),
        )
    )
    z = F.lit(float(_SS_Z))
    rootl = F.sqrt(F.lit(float(_SS_L)))

    def q6(c):
        return portable_round(c, 6)

    return (
        s.select(
            F.col("l_partkey").alias("partkey"),
            "n_days",
            q6(mu).alias("daily_demand"),
            q6(z * sigma * rootl).alias("safety_stock"),
            q6(mu * F.lit(_SS_L) + z * sigma * rootl).alias("reorder_point"),
        )
        .orderBy(F.desc("reorder_point"), "partkey")
        .limit(15)
    )
