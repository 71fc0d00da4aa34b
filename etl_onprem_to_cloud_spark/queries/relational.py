"""Ring B relational queries (joins, aggregations, windows, set ops,
scalar functions) -- the Athena-SQL surface the reference delegates
(reference README.md:184-199), made native.

Shapes follow the public TPC-H queries where the fixture schema allows
(Q1/Q3/Q5/Q6/Q10/Q15/Q18 analogues), plus explicit coverage queries for
every operator class in SURVEY.md section 2b.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions.numeric import davg_round, dec, dsum_round
from ..operators.joins import broadcast_dim_join, star_join
from ..operators.topk import global_top_k, top_k_per_group
from ._util import cat, fmt_date, ts_lit
from . import query

# Exact decimal views of the Q1/Q6 money expressions; see
# functions/numeric.py for why DECIMAL (order-independent exactness).
# The (1 +- x) factors are computed in double FIRST, then cast to
# DECIMAL(8,6), identically on both engines; the chained product gets an
# explicit widening cast so DuckDB stays in int128 (its (12,2)x(8,6)
# product type is DECIMAL(18,8), which overflows int64 if multiplied
# again without the cast).
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,6))"
)
_CHARGE = f"CAST({_DISC_PRICE} AS DECIMAL(24,8)) * CAST(1 + l_tax AS DECIMAL(8,6))"


def _disc_price_col():
    return dec("l_extendedprice", 12, 2) * (
        (F.lit(1.0) - F.col("l_discount")).cast("decimal(8,6)")
    )


def _charge_col():
    return _disc_price_col() * ((F.lit(1.0) + F.col("l_tax")).cast("decimal(8,6)"))


@query(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum({_CHARGE}), 2) AS DOUBLE) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "tpch"),
    description="TPC-H Q1 analogue: scan-heavy multi-aggregate rollup.",
)
def q01_pricing_summary(spark, sf_dir):
    li = cat(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_shipdate") <= ts_lit(li, "l_shipdate", "2000-12-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_round("l_quantity", "sum_qty"),
            dsum_round("l_extendedprice", "sum_base_price"),
            F.round(F.sum(_disc_price_col()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_charge_col()), 2).cast("double").alias("sum_charge"),
            davg_round("l_quantity", "avg_qty"),
            davg_round("l_extendedprice", "avg_price"),
            davg_round("l_discount", "avg_disc", round_to=6),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q03_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
  CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, orderdate, l_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk", "tpch"),
    description="TPC-H Q3 analogue: 3-way join + agg + deterministic top-10.",
)
def q03_shipping_priority(spark, sf_dir):
    c = cat(spark, sf_dir)
    orders, lineitem = c.orders, c.lineitem
    joined = (
        c.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(
            orders.filter(
                F.col("o_orderdate") < ts_lit(orders, "o_orderdate", "1998-01-01 00:00:00")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            lineitem.filter(
                F.col("l_shipdate") > ts_lit(lineitem, "l_shipdate", "1996-01-01 00:00:00")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(_disc_price_col()), 2).cast("double").alias("revenue")
    )
    return global_top_k(
        agg.select(
            "l_orderkey",
            "revenue",
            fmt_date("o_orderdate", "orderdate"),
            "o_orderpriority",
        ),
        [F.col("revenue").desc(), F.col("orderdate"), F.col("l_orderkey")],
        10,
    )


@query(
    "q05_local_supplier_volume",
    oracle=f"""
SELECT n_name,
  CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    tags=("join", "agg", "tpch", "broadcast"),
    description="TPC-H Q5 analogue: 6-way star join, dims broadcast.",
)
def q05_local_supplier_volume(spark, sf_dir):
    c = cat(spark, sf_dir)
    orders = c.orders
    ofilt = orders.filter(
        (F.col("o_orderdate") >= ts_lit(orders, "o_orderdate", "1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_lit(orders, "o_orderdate", "1998-01-01 00:00:00"))
    )
    # Fact side: lineitem |x| orders (the only fact-fact shuffle).
    # nation/region are FIXED-catalog dims and keep explicit broadcast
    # hints; customer/supplier SCALE with the corpus (SF x 150k/10k
    # rows) and get NO hint -- the r8 sf100 probe caught q18's hinted
    # customer broadcast at exponent 1.25 (15M-row build side), the
    # same never-broadcast-a-corpus-scaled-relation rule the LSH
    # verifies learned in r5.  Unhinted, the static estimator / AQE
    # still broadcasts them at every driver/bench SF (file sizes well
    # under the 10 MB threshold, plans effectively unchanged there)
    # and falls back to a skinny shuffle join at scale.
    joined = (
        c.lineitem.join(ofilt, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            c.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(c.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(_disc_price_col()), 2).cast("double").alias("revenue")
    )


@query(
    "q06_forecast_revenue",
    oracle=f"""
SELECT
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,6))), 2) AS DOUBLE) AS revenue,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24
""",
    tags=("agg", "filter", "tpch", "pushdown"),
    description="TPC-H Q6 analogue: selective filters feeding one scalar agg.",
)
def q06_forecast_revenue(spark, sf_dir):
    li = cat(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1995-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1996-01-01 00:00:00"))
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(dec("l_extendedprice", 12, 2) * dec("l_discount", 8, 6)), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
  CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
  c_acctbal, n_name
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "agg", "topk", "tpch"),
    description="TPC-H Q10 analogue: returned-item revenue by customer, top 20.",
)
def q10_returned_items(spark, sf_dir):
    c = cat(spark, sf_dir)
    orders = c.orders
    joined = (
        c.lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= ts_lit(orders, "o_orderdate", "1995-07-01 00:00:00"))
                & (F.col("o_orderdate") < ts_lit(orders, "o_orderdate", "1996-07-01 00:00:00"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # customer scales with the corpus: no broadcast hint (see q05).
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.round(F.sum(_disc_price_col()), 2).cast("double").alias("revenue")
    )
    return global_top_k(
        agg.select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name"),
        [F.col("revenue").desc(), F.col("c_custkey")],
        20,
    )


@query(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
    CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    tags=("join", "agg", "subquery", "tpch"),
    description="TPC-H Q15 analogue: scalar subquery against a derived view.",
)
def q15_top_supplier(spark, sf_dir):
    c = cat(spark, sf_dir)
    li = c.lineitem
    rev = (
        li.filter(
            (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1996-07-01 00:00:00"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_disc_price_col()), 2).cast("double").alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        # supplier scales with the corpus: no broadcast hint (see q05);
        # max_rev is one row and stays hinted.
        .join(c.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q18_large_volume_customer",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 250
)
SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    tags=("join", "agg", "having", "tpch"),
    description="TPC-H Q18 analogue: HAVING over a fact agg, joined back to dims.",
)
def q18_large_volume_customer(spark, sf_dir):
    c = cat(spark, sf_dir)
    big = (
        c.lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select(
            "l_orderkey",
            F.round(F.col("qty_dec"), 2).cast("double").alias("total_qty"),
        )
    )
    return (
        big.join(c.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        # customer scales with the corpus: no broadcast hint (see q05).
        # The r8 sf100 probe measured THIS hint at exponent 1.25
        # (hinted 15M-row broadcast build); the bare orderkey aggregate
        # above is sub-linear (0.876) and AQE broadcasts the skinny
        # qualifying-orders side instead.
        .join(c.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            fmt_date("o_orderdate", "orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


@query(
    "q_star_revenue_by_region_year",
    oracle=f"""
SELECT r_name, year(o_orderdate) AS order_year,
  CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
  count(*) AS n_lineitems
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name, year(o_orderdate)
""",
    tags=("join", "agg", "broadcast"),
    description="Full star join: fact |x| fact shuffle, customer join "
    "left to the estimator (corpus-scaled), 2 hinted catalog dims.",
)
def q_star_revenue_by_region_year(spark, sf_dir):
    """customer is NOT routed through star_join: the operator's
    contract is always-broadcast, and customer scales with the corpus
    (the table behind the r8 q18 exponent-1.25 catch).  The estimator
    still broadcasts it at driver/bench SFs; nation/region are fixed
    catalogs and keep their hints."""
    c = cat(spark, sf_dir)
    joined = star_join(
        c.lineitem.join(c.orders, F.col("o_orderkey") == F.col("l_orderkey")).join(
            c.customer, F.col("c_custkey") == F.col("o_custkey")
        ),
        [
            (c.nation, F.col("n_nationkey") == F.col("c_nationkey")),
            (c.region, F.col("r_regionkey") == F.col("n_regionkey")),
        ],
    )
    return joined.groupBy(
        "r_name", F.year("o_orderdate").alias("order_year")
    ).agg(
        F.round(F.sum(_disc_price_col()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "q_semi_join_active_customers",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
""",
    tags=("join", "semi"),
    description="Left-semi join: customers with >=1 finished order.",
)
def q_semi_join_active_customers(spark, sf_dir):
    c = cat(spark, sf_dir)
    active = c.customer.join(
        c.orders.filter(F.col("o_orderstatus") == "F"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    return active.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q_anti_join_dormant_customers",
    oracle="""
SELECT n_name, count(*) AS n_customers
FROM customer
JOIN nation ON n_nationkey = c_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
""",
    tags=("join", "anti"),
    description="Left-anti join: customers with no orders at all, by nation.",
)
def q_anti_join_dormant_customers(spark, sf_dir):
    c = cat(spark, sf_dir)
    dormant = c.customer.join(
        c.orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return (
        broadcast_dim_join(dormant, c.nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_left_join_nation_coverage",
    oracle="""
SELECT n_name, count(c_custkey) AS n_customers,
  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_acctbal
FROM nation
LEFT JOIN customer ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("join", "outer"),
    description="Left outer join preserving empty nations (count=0, sum NULL).",
)
def q_left_join_nation_coverage(spark, sf_dir):
    c = cat(spark, sf_dir)
    return (
        c.nation.join(
            c.customer, F.col("c_nationkey") == F.col("n_nationkey"), "left"
        )
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dsum_round("c_acctbal", "total_acctbal"),
        )
    )


@query(
    "q_rollup_customer_geo",
    oracle="""
SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name,
  count(*) AS n_customers,
  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("agg", "rollup"),
    description="ROLLUP hierarchy totals (region -> nation -> grand total).",
)
def q_rollup_customer_geo(spark, sf_dir):
    c = cat(spark, sf_dir)
    joined = star_join(
        c.customer,
        [
            (c.nation, F.col("n_nationkey") == F.col("c_nationkey")),
            (c.region, F.col("r_regionkey") == F.col("n_regionkey")),
        ],
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum_round("c_acctbal", "total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


@query(
    "q_cube_order_status_priority",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
  count(*) AS n_orders,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg", "cube"),
    description="CUBE over status x priority (all 4 grouping sets).",
)
def q_cube_order_status_priority(spark, sf_dir):
    c = cat(spark, sf_dir)
    return (
        c.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum_round("o_totalprice", "total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "q_grouping_sets_order_dims",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
  count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
    tags=("agg", "grouping-sets", "sql"),
    description="Explicit GROUPING SETS via spark.sql.",
)
def q_grouping_sets_order_dims(spark, sf_dir):
    cat(spark, sf_dir, register_views=True).table("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "q_count_distinct_segments",
    oracle="""
SELECT c_mktsegment,
  count(*) AS n_customers,
  count(DISTINCT c_nationkey) AS n_nations,
  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_acctbal
FROM customer
GROUP BY c_mktsegment
""",
    tags=("agg", "distinct"),
    description="Exact count_distinct alongside plain aggregates.",
)
def q_count_distinct_segments(spark, sf_dir):
    c = cat(spark, sf_dir)
    return c.customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count_distinct(F.col("c_nationkey")).alias("n_nations"),
        dsum_round("c_acctbal", "total_acctbal"),
    )


@query(
    "q_approx_count_distinct",
    oracle="""
SELECT o_orderpriority,
  count(DISTINCT o_custkey) AS exact_customers,
  count(*) AS n_orders,
  TRUE AS approx_within_tol
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "approx"),
    description="approx_count_distinct (HLL, rsd=0.02) per segment.  The HLL "
    "estimate is engine-specific, so the oracle-checked contract is a bounded "
    "relative-error flag: the Spark side emits the EXACT distinct count plus "
    "a boolean asserting |approx-exact|/exact <= 5%; DuckDB emits its exact "
    "count and literal TRUE.  A drifting sketch flips the flag and fails the "
    "hash compare.",
)
def q_approx_count_distinct(spark, sf_dir):
    c = cat(spark, sf_dir)
    exact = F.count_distinct(F.col("o_custkey"))
    approx = F.approx_count_distinct("o_custkey", rsd=0.02)
    return c.orders.groupBy("o_orderpriority").agg(
        exact.alias("exact_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.05 * exact.cast("double")
        ).alias("approx_within_tol"),
    )


@query(
    "q_setops_building_vs_finished",
    oracle="""
SELECT 'both' AS tag, c_custkey AS custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'building_only' AS tag, c_custkey AS custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
""",
    tags=("setops",),
    description="INTERSECT / EXCEPT branches, union-tagged.",
)
def q_setops_building_vs_finished(spark, sf_dir):
    c = cat(spark, sf_dir)
    building = c.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    finished = c.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    both = building.intersect(finished).select(F.lit("both").alias("tag"), "custkey")
    only = building.exceptAll(finished.distinct()).distinct().select(
        F.lit("building_only").alias("tag"), "custkey"
    )
    return both.unionByName(only)


@query(
    "q_window_rank_orders",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn,
    rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
    dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS drnk
  FROM orders
)
SELECT o_orderpriority, o_orderkey, o_totalprice, rn, rnk, drnk
FROM ranked WHERE rn <= 3
""",
    tags=("window", "rank"),
    description="Ranking window functions, top-3 per priority.",
)
def q_window_rank_orders(spark, sf_dir):
    c = cat(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        c.orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
  lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
FROM orders
""",
    tags=("window", "analytic"),
    description="lag/lead over each customer's order sequence.",
)
def q_window_lag_lead(spark, sf_dir):
    c = cat(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return c.orders.select(
        "o_custkey",
        "o_orderkey",
        fmt_date("o_orderdate", "orderdate"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "q_window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) /
    count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
FROM orders
""",
    tags=("window", "frame"),
    description="Running total + 3-row moving average (ROWS frames).",
)
def q_window_running_sum(spark, sf_dir):
    c = cat(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = w.rowsBetween(-2, Window.currentRow)
    return c.orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(running), 2)
        .cast("double")
        .alias("running_total"),
        F.round(
            F.sum(dec("o_totalprice")).over(moving).cast("double")
            / F.count(F.lit(1)).over(moving),
            4,
        ).alias("moving_avg_3"),
    )


@query(
    "q_window_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
  datediff('day', DATE '1995-01-01', o_orderdate) AS day_no,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
    PARTITION BY o_custkey ORDER BY datediff('day', DATE '1995-01-01', o_orderdate)
    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS trailing_90d_total
FROM orders
""",
    tags=("window", "range-frame"),
    description="RANGE frame: trailing-90-day spend per customer.",
)
def q_window_range_frame(spark, sf_dir):
    c = cat(spark, sf_dir)
    day_no = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    ).alias("day_no")
    df = c.orders.select("o_custkey", "o_orderkey", day_no, "o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-90, 0)
    return df.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.round(F.sum(dec("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("trailing_90d_total"),
    )


@query(
    "q_topk_orders_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
    tags=("sort", "topk"),
    description="Global top-k (TakeOrderedAndProject, no full sort).",
)
def q_topk_orders_global(spark, sf_dir):
    c = cat(spark, sf_dir)
    return global_top_k(
        c.orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", fmt_date("o_orderdate", "orderdate")
        ),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        15,
    )


@query(
    "q_topk_per_group_customer_orders",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ranked WHERE rn <= 2
""",
    tags=("window", "topk"),
    description="Per-group top-k via ranking window.",
)
def q_topk_per_group_customer_orders(spark, sf_dir):
    c = cat(spark, sf_dir)
    out = top_k_per_group(
        c.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=2,
    )
    return out.withColumn("rn", F.col("rn").cast("bigint"))


@query(
    "q_string_functions_part",
    oracle="""
SELECT p_partkey,
  upper(p_name) AS name_upper,
  lower(p_brand) AS brand_lower,
  substring(p_name, 1, 8) AS name_prefix,
  length(p_name) AS name_len,
  concat_ws('-', p_brand, p_type) AS brand_type,
  string_split(p_type, ' ')[1] AS type_first_word,
  regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
  trim(concat('  ', p_name, '  ')) AS name_trimmed,
  CAST(p_name LIKE '%steel%' AS INT) AS is_steel,
  replace(p_type, ' ', '_') AS type_snake
FROM part
""",
    tags=("scalar", "string"),
    description="String function coverage (X1-X3 parity + Ring B extras).",
)
def q_string_functions_part(spark, sf_dir):
    c = cat(spark, sf_dir)
    return c.part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_masked"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.col("p_name").like("%steel%").cast("int").alias("is_steel"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@query(
    "q_case_when_order_buckets",
    oracle="""
SELECT
  CASE
    WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
    WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
    ELSE 'cold'
  END AS urgency,
  CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS size_class,
  count(*) AS n_orders,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus IN ('F', 'O')
GROUP BY 1, 2
""",
    tags=("scalar", "case-when", "filter"),
    description="CASE WHEN chains + IN-list filter (reference F4/X4 parity, "
    "reference etl/transform.py:115-164).",
)
def q_case_when_order_buckets(spark, sf_dir):
    c = cat(spark, sf_dir)
    urgency = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
    )
    size_class = F.when(F.col("o_totalprice") > 300000, "big").otherwise("small")
    return (
        c.orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(urgency.alias("urgency"), size_class.alias("size_class"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum_round("o_totalprice", "total_price"),
        )
    )


@query(
    "q_date_functions_orders",
    oracle="""
SELECT o_orderkey,
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month,
  quarter(o_orderdate) AS order_quarter,
  day(o_orderdate) AS order_day,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
  datediff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch_start,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d
FROM orders
""",
    tags=("scalar", "date"),
    description="Date function coverage over order timestamps.",
)
def q_date_functions_orders(spark, sf_dir):
    c = cat(spark, sf_dir)
    d = F.col("o_orderdate")
    dd = d.cast("date")
    return c.orders.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        F.dayofmonth(d).alias("order_day"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(dd), "yyyy-MM-dd").alias("month_end"),
        F.datediff(dd, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.date_format(F.date_add(dd, 30), "yyyy-MM-dd").alias("plus_30d"),
    )


@query(
    "q_orders_per_month",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  count(*) AS n_orders,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1
""",
    tags=("agg", "date"),
    description="Monthly order rollup (date_trunc + agg).",
)
def q_orders_per_month(spark, sf_dir):
    c = cat(spark, sf_dir)
    return (
        c.orders.groupBy(
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "month_start"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum_round("o_totalprice", "total_price"),
        )
    )
