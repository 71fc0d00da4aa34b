"""Remaining TPC-H query analogues (Q2/Q4/Q7/Q8/Q9/Q11/Q12/Q13/Q14/
Q16/Q17/Q19/Q20/Q21/Q22), adapted to the fixture schema: there is no
``partsupp`` table and lineitem/orders lack commit/receipt dates,
shipmode, and comment columns, so supplier-part economics are derived
from observed lineitem unit prices (Q2/Q11/Q20 use revenue/quantity
through suppliers instead of availqty*supplycost) and the Q4/Q12/Q21
lateness predicates use ``l_shipdate`` vs ``o_orderdate``.  Oracle
conventions as in relational.py (exact DECIMAL aggregation, identical
aliases, pinned rounding).

Together with relational.py's Q1/Q3/Q5/Q6/Q10/Q15/Q18 this covers all
22 TPC-H query shapes, each adapted to what the fixture schema can
express.

Broadcast policy (r9 sweep, completing the r8 relational.py sweep):
``F.broadcast`` hints are reserved for FIXED catalogs (nation/region
and their filters) and BOUNDED derived relations (1-row aggregates).
supplier/part -- and any filtered subset of them -- scale linearly
with SF and carry NO hint: the r8 sf100 probe measured q18's hinted
corpus-scaled customer at exponent 1.25 (a 15M-row broadcast build)
vs 1.04 unhinted.  At driver/bench SFs the static estimator still
broadcasts these relations (file sizes well under the 10 MB
``autoBroadcastJoinThreshold``), so plans there are unchanged; at
scale the estimator falls back to a shuffle join instead of
silently building a multi-GB broadcast.  Enforced by
tests/test_plans.py::test_no_broadcast_hint_on_corpus_scaled_relation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, dsum_round
from ._util import cat, ts_lit
from . import query
from .relational import _DISC_PRICE, _disc_price_col


@query(
    "q02_min_cost_supplier",
    oracle="""
WITH eu_supp AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
),
offers AS (
  SELECT l_partkey AS partkey, s_suppkey, round(l_extendedprice / l_quantity, 6) AS unit_price
  FROM lineitem JOIN eu_supp ON s_suppkey = l_suppkey
),
best AS (
  SELECT partkey, min(unit_price) AS min_unit_price FROM offers GROUP BY partkey
),
pick AS (
  SELECT o.partkey, b.min_unit_price, min(o.s_suppkey) AS s_suppkey
  FROM offers o JOIN best b ON o.partkey = b.partkey AND o.unit_price = b.min_unit_price
  GROUP BY o.partkey, b.min_unit_price
)
SELECT p_partkey, p_brand, s_name, n_name, min_unit_price
FROM pick
JOIN part ON p_partkey = partkey
JOIN eu_supp ON eu_supp.s_suppkey = pick.s_suppkey
WHERE p_size <= 15 AND p_type = 'LARGE'
""",
    tags=("join", "agg", "tpch", "broadcast"),
    description="TPC-H Q2 analogue (no partsupp): cheapest observed "
    "lineitem unit price per part among EUROPE suppliers; ties break to "
    "the lowest suppkey for determinism.",
)
def q02_min_cost_supplier(spark, sf_dir):
    """min-per-group via a WINDOW over the offers stream, not a
    groupBy-then-join-back: the self-join shape ran two sort-merge
    joins of the corpus-width offers stream even at bench SF (the q21
    r9 lesson -- joining a fact to its own aggregate sorts the fact
    per join side at scale).  One partkey exchange now feeds the
    window, the equality filter, and the (partkey, price) pick
    aggregate without re-shuffling (partkey partitioning satisfies
    the pick grouping)."""
    c = cat(spark, sf_dir)
    eu_supp = (
        c.supplier.join(
            F.broadcast(c.nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(c.region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = c.lineitem.join(
        eu_supp, F.col("s_suppkey") == F.col("l_suppkey")
    ).select(
        F.col("l_partkey").alias("partkey"),
        "s_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit_price"),
    )
    w = Window.partitionBy("partkey")
    pick = (
        offers.withColumn("min_unit_price", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_unit_price"))
        .groupBy("partkey", "min_unit_price")
        .agg(F.min("s_suppkey").alias("pick_suppkey"))
    )
    return (
        pick.join(
            c.part.filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")),
            F.col("p_partkey") == F.col("partkey"),
        )
        .join(eu_supp, F.col("s_suppkey") == F.col("pick_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "n_name", "min_unit_price")
    )


@query(
    "q04_late_shipping_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "agg", "tpch"),
    description="TPC-H Q4 analogue: EXISTS lateness check (shipdate after "
    "orderdate stands in for commit/receipt dates) as a left-semi join.",
)
def q04_late_shipping_priority(spark, sf_dir):
    c = cat(spark, sf_dir)
    o = c.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    late = o.join(
        c.lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q07_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
  CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    year(l_shipdate) AS l_year, {_DISC_PRICE} AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) t
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=("join", "agg", "tpch"),
    description="TPC-H Q7: bidirectional nation-pair trade volume by year.",
)
def q07_volume_shipping(spark, sf_dir):
    c = cat(spark, sf_dir)
    li = c.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    n1 = F.broadcast(c.nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(c.nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")))
    joined = (
        li.join(c.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("nk1") == F.col("s_nationkey"))
        .join(n2, F.col("nk2") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.round(F.sum(_disc_price_col()), 2).cast("double").alias("revenue"))


@query(
    "q08_market_share",
    oracle=f"""
SELECT o_year,
  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE)
        / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year, {_DISC_PRICE} AS volume, n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) t
GROUP BY o_year
""",
    tags=("join", "agg", "tpch", "broadcast"),
    description="TPC-H Q8: NATION_3's share of PROMO-part revenue sold "
    "into ASIA, by order year (conditional / total decimal sums).",
)
def q08_market_share(spark, sf_dir):
    c = cat(spark, sf_dir)
    n1 = F.broadcast(c.nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1")))
    n2 = F.broadcast(c.nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")))
    joined = (
        c.lineitem.join(
            c.part.filter(F.col("p_type") == "PROMO"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(c.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("nk1") == F.col("c_nationkey"))
        .join(
            F.broadcast(c.region.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("rk1"),
        )
        .join(n2, F.col("nk2") == F.col("s_nationkey"))
    )
    vol = _disc_price_col()
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)).cast("double")
            / F.sum(vol).cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q09_product_type_profit",
    oracle=f"""
SELECT n_name AS nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name, year(o_orderdate) AS o_year,
    CAST({_DISC_PRICE} AS DECIMAL(24,8))
      - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(18,6))
        * CAST(0.8 AS DECIMAL(2,1)) AS amount
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%bolt%'
) t
GROUP BY n_name, o_year
""",
    tags=("join", "agg", "tpch"),
    description="TPC-H Q9 analogue: profit per supplier nation and year; "
    "cost modeled as 80% of retail price (no partsupp.ps_supplycost).",
)
def q09_product_type_profit(spark, sf_dir):
    c = cat(spark, sf_dir)
    amount = _disc_price_col().cast("decimal(24,8)") - (
        dec("p_retailprice", 12, 2)
        * dec("l_quantity", 18, 6)
        * F.lit(0.8).cast("decimal(2,1)")
    )
    joined = (
        c.lineitem.join(c.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            c.part.filter(F.col("p_name").like("%bolt%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(c.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c.nation), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
""",
    tags=("join", "outer", "agg", "tpch"),
    description="TPC-H Q13: orders-per-customer histogram (left join keeps "
    "zero-order customers; double aggregation).",
)
def q13_customer_order_distribution(spark, sf_dir):
    c = cat(spark, sf_dir)
    per_cust = (
        c.customer.join(
            c.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} END) AS DOUBLE)
             / CAST(sum({_DISC_PRICE}) AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
    tags=("join", "agg", "tpch", "broadcast"),
    description="TPC-H Q14: PROMO revenue percentage for one month.",
)
def q14_promo_revenue(spark, sf_dir):
    c = cat(spark, sf_dir)
    li = c.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    vol = _disc_price_col()
    return (
        li.join(c.part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q16_supplier_cnt_by_part",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
""",
    tags=("join", "agg", "distinct", "tpch"),
    description="TPC-H Q16 analogue: distinct suppliers per part attribute "
    "group, supplier-part link derived from lineitem (no partsupp).",
)
def q16_supplier_cnt_by_part(spark, sf_dir):
    c = cat(spark, sf_dir)
    p = c.part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    return (
        c.lineitem.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey AS pk,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pk = l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
""",
    tags=("join", "agg", "subquery", "tpch"),
    description="TPC-H Q17: revenue of below-20%-of-average-quantity "
    "lineitems (per-part average via exact decimal sum).",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Per-part average via a WINDOW over lineitem, not a
    groupBy-then-join-back (the q21 r9 lesson): the aggregate side is
    part-grain -- corpus-scaled at deployment -- so the join-back
    would leave broadcast range and sort the full fact; the window
    form is one partkey exchange at every scale.  The decimal-sum /
    count division happens per row but over window aggregates, so the
    value is bit-identical to the oracle's per-group computation."""
    c = cat(spark, sf_dir)
    w = Window.partitionBy("l_partkey")
    li = c.lineitem.withColumn(
        "avg_qty",
        F.sum(dec("l_quantity")).over(w).cast("double")
        / F.count("l_quantity").over(w),
    )
    return (
        li.join(
            c.part.filter(F.col("p_brand") == "Brand#23"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(dec("l_extendedprice")).cast("double") / 7.0, 2).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
SELECT CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
    tags=("join", "filter", "tpch"),
    description="TPC-H Q19: disjunctive multi-attribute predicate over a "
    "part-lineitem join (container/shipmode clauses dropped with schema).",
)
def q19_disjunctive_predicates(spark, sf_dir):
    c = cat(spark, sf_dir)
    b = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        c.lineitem.join(c.part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(b)
        .agg(F.round(F.sum(_disc_price_col()), 2).cast("double").alias("revenue"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey AS ok, max(l_shipdate) AS max_ship, count(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY l_orderkey
)
SELECT s_name, count(DISTINCT l_orderkey) AS numwait
FROM lineitem
JOIN per_order ON ok = l_orderkey
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE o_orderstatus = 'F' AND l_shipdate = max_ship AND n_supp >= 2
GROUP BY s_name
""",
    tags=("join", "agg", "subquery", "tpch", "window"),
    description="TPC-H Q21 analogue: supplier holding up multi-supplier "
    "'F' orders = owns the max shipdate (no commit/receipt dates).",
)
def q21_waiting_supplier(spark, sf_dir):
    """ONE corpus-width exchange, never join the raw fact back to its
    own aggregate: the original shape (per-order agg joined to FULL
    lineitem on (orderkey, shipdate=max)) read the r9 sf100 probe at
    exponent 1.348 with 122 GB of sort spill -- at the third decade
    the join falls out of broadcast range and sort-merge sorts all 6B
    fact rows twice.  An intermediate aggregate-then-window shape
    ((orderkey, suppkey) pre-aggregate + window) measured 2.1x faster
    (150 s) but still pushed the fact through TWO exchanges, because
    the pre-aggregate reduces almost nothing: lineitem's suppkey is
    nearly unique within an order.  Final shape: a single window over
    lineitem partitioned by orderkey -- max(shipdate) and
    size(collect_set(suppkey)) over the same window (the set lives
    only inside the window buffer, ~4 rows per order; no array ever
    crosses an exchange) -- then filter to max-date lines of
    multi-supplier orders.  Duplicate (order, supplier) winner rows
    (same supplier, two lines on the max date) survive to the final
    aggregate, whose count(DISTINCT orderkey) dedupes them by
    construction.  Re-probed post-fix: see README sf100 table."""
    c = cat(spark, sf_dir)
    w = Window.partitionBy("l_orderkey")
    winners = (
        c.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .filter(
            (F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") >= 2)
        )
        .select("l_orderkey", "l_suppkey")
    )
    return (
        winners.join(
            c.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
    )


@query(
    "q22_dormant_rich_customers",
    oracle="""
SELECT c_nationkey, count(*) AS numcust,
  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(c_acctbal)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000
  )
GROUP BY c_nationkey
""",
    tags=("join", "anti", "subquery", "agg", "tpch"),
    description="TPC-H Q22 analogue: above-average-balance customers with "
    "no large orders (>350k), grouped by nation (no phone country codes "
    "in fixture; the plain no-orders predicate is empty at sf>=0.01).",
)
def q22_dormant_rich_customers(spark, sf_dir):
    c = cat(spark, sf_dir)
    avg_bal = (
        c.customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
                "avg_bal"
            )
        )
    )
    return (
        c.customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            c.orders.filter(F.col("o_totalprice") > 350000),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum_round("c_acctbal", "totacctbal"),
        )
    )


@query(
    "q11_important_parts",
    oracle="""
WITH v AS (
  SELECT l_partkey AS partkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
  GROUP BY l_partkey
)
SELECT partkey, CAST(round(val, 2) AS DOUBLE) AS value
FROM v
WHERE val * 200 > (SELECT sum(val) FROM v)
ORDER BY value DESC, partkey
""",
    tags=("join", "agg", "subquery", "tpch"),
    description="TPC-H Q11 analogue (important stock): per-part value held "
    "by a nation group's suppliers vs a share-of-total threshold.  No "
    "partsupp in the fixtures, so value = observed lineitem revenue "
    "through those suppliers; the share test is `val * 200 > total` in "
    "exact DECIMAL on both engines (no float threshold boundary).  The "
    "global total joins back via a broadcast of a 1-row aggregate, not a "
    "driver-side collect.",
)
def q11_important_parts(spark, sf_dir):
    c = cat(spark, sf_dir)
    nations = c.nation.filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13")
    )
    supp = c.supplier.join(
        F.broadcast(nations), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey")
    per_part = (
        c.lineitem.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    total = per_part.agg(F.sum("val").alias("total_val"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val") * 200 > F.col("total_val"))
        .select(
            "partkey", F.round(F.col("val"), 2).cast("double").alias("value")
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


@query(
    "q12_shipping_lateness",
    oracle="""
SELECT
  CASE
    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 30 THEN 'under_30d'
    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 90 THEN '30_to_90d'
    ELSE 'over_90d'
  END AS lateness,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY lateness
ORDER BY lateness
""",
    tags=("join", "agg", "tpch"),
    description="TPC-H Q12 analogue (shipping modes and priority): the "
    "fixtures lack shipmode/commit/receipt dates, so lines bucket by "
    "order-to-ship lateness (datediff days) instead of shipmode, keeping "
    "Q12's priority-split conditional aggregation intact.",
)
def q12_shipping_lateness(spark, sf_dir):
    c = cat(spark, sf_dir)
    li = c.lineitem
    lines = li.filter(
        (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1997-01-01 00:00:00"))
    )
    days = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    lateness = (
        F.when(days < 30, "under_30d").when(days < 90, "30_to_90d").otherwise("over_90d")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        c.orders.join(lines, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(lateness.alias("lateness"))
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("lateness")
    )


@query(
    "q20_heavy_part_suppliers",
    oracle="""
SELECT s_suppkey, s_name,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS shipped_qty
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_name LIKE 'cold%'
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY s_suppkey, s_name
HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 400
ORDER BY s_suppkey
""",
    tags=("join", "agg", "having", "tpch"),
    description="TPC-H Q20 analogue (potential part promotion): suppliers "
    "who shipped more than a threshold quantity of 'cold%'-named parts in "
    "1996.  No partsupp availqty in the fixtures, so the Q20 half-of-"
    "shipped predicate becomes a fixed qty threshold over observed "
    "shipments; part/supplier are corpus-scaled so the estimator picks "
    "the join strategy (no hint), one shuffle on suppkey.",
)
def q20_heavy_part_suppliers(spark, sf_dir):
    c = cat(spark, sf_dir)
    li = c.lineitem
    cold_parts = c.part.filter(F.col("p_name").like("cold%")).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1997-01-01 00:00:00"))
        )
        .join(cold_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 400)
    )
    return (
        shipped.join(
            c.supplier, F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("qty"), 2).cast("double").alias("shipped_qty"),
        )
        .orderBy("s_suppkey")
    )
