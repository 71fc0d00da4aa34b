"""Ring B coverage, part 2: subqueries, outer/theta joins, math and
array scalars, statistical aggregates, pivot, explode.  Same oracle
conventions as relational.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import dec, dsum_round
from ._util import cat, duck_tokens
from . import query
from ..functions.text import tokens


@query(
    "q_full_outer_join_nation_activity",
    oracle="""
WITH cust_n AS (
  SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1
),
supp_n AS (
  SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1
)
SELECT coalesce(cust_n.nk, supp_n.nk) AS nationkey,
  coalesce(n_customers, 0) AS n_customers,
  coalesce(n_suppliers, 0) AS n_suppliers
FROM cust_n FULL OUTER JOIN supp_n ON cust_n.nk = supp_n.nk
""",
    tags=("join", "outer"),
    description="Full outer join of per-nation customer vs supplier counts.",
)
def q_full_outer_join_nation_activity(spark, sf_dir):
    c = cat(spark, sf_dir)
    cust = c.customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = c.supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    joined = cust.withColumnRenamed("nk", "cnk").join(
        supp.withColumnRenamed("nk", "snk"),
        F.col("cnk") == F.col("snk"),
        "full_outer",
    )
    return joined.select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "q_theta_join_price_bands",
    oracle="""
WITH bands AS (
  SELECT * FROM (VALUES
    ('low', 0.0, 100000.0),
    ('mid', 100000.0, 300000.0),
    ('high', 300000.0, 1000000.0)
  ) AS t(band, lo, hi)
)
SELECT band, count(*) AS n_orders,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""",
    tags=("join", "theta", "broadcast"),
    description="Non-equi (theta) join against a broadcast range-band dim.",
)
def q_theta_join_price_bands(spark, sf_dir):
    c = cat(spark, sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1000000.0)],
        ["band", "lo", "hi"],
    )
    return (
        c.orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum_round("o_totalprice", "total_price"),
        )
    )


@query(
    "q_correlated_exists_sql",
    oracle="""
SELECT n_name, count(*) AS n_big_spenders
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
GROUP BY n_name
""",
    tags=("subquery", "sql"),
    description="Correlated EXISTS subquery via spark.sql.",
)
def q_correlated_exists_sql(spark, sf_dir):
    c = cat(spark, sf_dir, register_views=True)
    c.table("customer"), c.table("nation"), c.table("orders")
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_big_spenders
        FROM customer JOIN nation ON n_nationkey = c_nationkey
        WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 400000
        )
        GROUP BY n_name
        """
    )


@query(
    "q_in_subquery_sql",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
)
GROUP BY o_orderpriority
""",
    tags=("subquery", "sql"),
    description="IN subquery (planned as a semi join).",
)
def q_in_subquery_sql(spark, sf_dir):
    c = cat(spark, sf_dir, register_views=True)
    c.table("customer"), c.table("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_scalar_subquery_sql",
    oracle="""
SELECT c_mktsegment, count(*) AS n_above_avg
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
GROUP BY c_mktsegment
""",
    tags=("subquery", "sql"),
    description="Uncorrelated scalar subquery (threshold = global avg). "
    "Comparison-only use of avg keeps float nondeterminism harmless: the "
    "predicate boundary is nowhere near any data point.",
)
def q_scalar_subquery_sql(spark, sf_dir):
    c = cat(spark, sf_dir, register_views=True)
    c.table("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_above_avg
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        GROUP BY c_mktsegment
        """
    )


@query(
    "q_math_functions_lineitem",
    oracle="""
SELECT l_orderkey, l_linenumber,
  abs(l_discount - 0.05) AS disc_dev,
  CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
  CAST(floor(l_quantity / 7) AS BIGINT) AS qty_floor7,
  round(sqrt(l_extendedprice), 6) AS price_sqrt,
  round(ln(l_extendedprice), 6) AS price_ln,
  round(log10(l_extendedprice), 6) AS price_log10,
  round(pow(1.0 + l_tax, 2), 6) AS tax_sq,
  CAST(l_quantity AS BIGINT) % 5 AS qty_mod5,
  CAST(sign(l_discount - 0.05) AS INT) AS disc_sign,
  round(exp(l_discount), 6) AS disc_exp
FROM lineitem
WHERE l_orderkey % 50 = 0
""",
    tags=("scalar", "math"),
    description="Math scalar coverage (abs/ceil/floor/sqrt/ln/log10/pow/mod/sign/exp).",
)
def q_math_functions_lineitem(spark, sf_dir):
    li = cat(spark, sf_dir).lineitem
    return li.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("qty_ceil7"),
        F.floor(F.col("l_quantity") / 7).cast("bigint").alias("qty_floor7"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
    )


@query(
    "q_minmax_by_nation",
    oracle="""
SELECT c_nationkey,
  arg_max(c_custkey, c_acctbal) AS richest_custkey,
  arg_min(c_custkey, c_acctbal) AS poorest_custkey,
  max(c_acctbal) AS max_bal,
  min(c_acctbal) AS min_bal
FROM customer
GROUP BY c_nationkey
""",
    tags=("agg", "minmax-by"),
    description="max_by/min_by (argmax) aggregates.",
)
def q_minmax_by_nation(spark, sf_dir):
    c = cat(spark, sf_dir)
    return c.customer.groupBy("c_nationkey").agg(
        F.max_by("c_custkey", "c_acctbal").alias("richest_custkey"),
        F.min_by("c_custkey", "c_acctbal").alias("poorest_custkey"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
    )


@query(
    "q_conditional_agg_orders",
    oracle="""
SELECT o_orderstatus,
  CAST(count_if(o_totalprice > 250000) AS BIGINT) AS n_big,
  CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
  bool_and(o_totalprice > 0) AS all_positive,
  bool_or(o_totalprice > 450000) AS any_huge
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "conditional"),
    description="count_if / bool_and / bool_or conditional aggregates.",
)
def q_conditional_agg_orders(spark, sf_dir):
    c = cat(spark, sf_dir)
    return c.orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 250000).alias("n_big"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 450000).alias("any_huge"),
    )


@query(
    "q_collect_sorted_regions",
    oracle="""
SELECT r_name, array_to_string(list_sort(list(n_name)), ',') AS nations
FROM nation JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name
""",
    tags=("agg", "collect"),
    description="collect_list -> sorted -> joined string (deterministic "
    "surface for an array aggregate).",
)
def q_collect_sorted_regions(spark, sf_dir):
    c = cat(spark, sf_dir)
    return (
        c.nation.join(
            F.broadcast(c.region), F.col("r_regionkey") == F.col("n_regionkey")
        )
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@query(
    "q_percentiles_orders",
    oracle="""
SELECT o_orderstatus,
  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "percentile"),
    description="Exact interpolated percentiles (median/p90/p99).",
)
def q_percentiles_orders(spark, sf_dir):
    c = cat(spark, sf_dir)
    return c.orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


# Manual moment-based statistics from exact decimal sums: deterministic
# across engines, unlike streaming stddev/corr implementations whose
# low-order bits depend on accumulation order.
_SX = "CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)"
_SXX = "CAST(sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)"
_SY = "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) ) AS DOUBLE)"
_SYY = "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
_SXY = "CAST(sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"


@query(
    "q_stats_moments_lineitem",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
    count(*) AS n,
    {_SX} AS sx, {_SXX} AS sxx, {_SY} AS sy, {_SYY} AS syy, {_SXY} AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  round((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
  round((sxy - sx * sy / n) /
        sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_qty_price
FROM s
""",
    tags=("agg", "stats"),
    description="Variance / stddev / correlation from exact decimal moments "
    "(order-independent, engine-portable; built-in streaming stddev is not).",
)
def q_stats_moments_lineitem(spark, sf_dir):
    li = cat(spark, sf_dir).lineitem
    x = dec("l_quantity")
    y = dec("l_extendedprice", 12, 2)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    return s.select(
        "l_returnflag",
        "n",
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("var_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round(
            (sxy - sx * sy / n) / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6
        ).alias("corr_qty_price"),
    )


@query(
    "q_pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f,
  CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_o,
  CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "pivot"),
    description="Pivot (orderstatus -> columns) via groupBy().pivot().",
)
def q_pivot_status_by_priority(spark, sf_dir):
    c = cat(spark, sf_dir)
    p = (
        c.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@query(
    "q_posexplode_tokens",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {duck_tokens('text', lower=False)} AS toks
  FROM documents WHERE doc_id % 100 = 0
)
SELECT doc_id,
  unnest(generate_series(0, len(toks) - 1)) AS pos,
  unnest(toks) AS token
FROM t
""",
    tags=("scalar", "array", "explode"),
    description="posexplode (LATERAL VIEW) of token arrays with 0-based position.",
)
def q_posexplode_tokens(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    return (
        docs.filter(F.col("doc_id") % 100 == 0)
        .select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token"))
    )


@query(
    "q_array_functions_docs",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {duck_tokens('text')} AS toks FROM documents
)
SELECT doc_id,
  len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_unique,
  CAST(list_contains(toks, 'spark') AS INT) AS has_spark,
  array_to_string(list_sort(list_distinct(toks))[1:5], ' ') AS first5_sorted,
  len(list_filter(toks, t -> length(t) > 4)) AS n_long,
  list_aggregate(list_transform(toks, t -> length(t)), 'max') AS max_len
FROM t
""",
    tags=("scalar", "array"),
    description="Array function coverage: size/distinct/contains/sort/slice/"
    "filter/transform/aggregate over token arrays.",
)
def q_array_functions_docs(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    toks = tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), " "
        ).alias("first5_sorted"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("bigint").alias("n_long"),
        F.array_max(F.transform(toks, lambda t: F.length(t))).alias("max_len"),
    )


@query(
    "q_map_functions_events",
    oracle="""
SELECT event_type,
  CAST(count_if(map_k = 'valcat') AS BIGINT) AS n_valcat
FROM (
  SELECT event_type,
    CASE WHEN value >= 50 THEN 'valcat' ELSE 'other' END AS map_k
  FROM events
)
GROUP BY event_type
""",
    tags=("scalar", "map"),
    description="Map-typed columns: build, look up, and aggregate on map keys "
    "(oracle checks the observable key classification).",
)
def q_map_functions_events(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    m = F.create_map(
        F.when(F.col("value") >= 50, "valcat").otherwise("other"), F.col("value")
    )
    return (
        ev.select(
            "event_type",
            F.element_at(F.map_keys(m), 1).alias("map_k"),
        )
        .groupBy("event_type")
        .agg(F.count_if(F.col("map_k") == "valcat").alias("n_valcat"))
    )


@query(
    "q_string_extract_position",
    oracle="""
SELECT p_partkey,
  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
  position('a' IN p_name) AS first_a,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  reverse(p_brand) AS brand_rev,
  left(p_name, 6) AS name_left6,
  right(p_name, 4) AS name_right4,
  repeat(p_brand, 2) AS brand_twice
FROM part
""",
    tags=("scalar", "string"),
    description="regexp_extract / position / pad / reverse / left / right / repeat.",
)
def q_string_extract_position(spark, sf_dir):
    c = cat(spark, sf_dir)
    return c.part.select(
        "p_partkey",
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.instr("p_name", "a").alias("first_a"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 6).alias("name_left6"),
        F.col("p_name").substr(F.length("p_name") - 3, F.lit(4)).alias("name_right4"),
        F.repeat("p_brand", 2).alias("brand_twice"),
    )


@query(
    "q_bitwise_ops",
    oracle="""
SELECT event_id,
  user_id & 255 AS low_byte,
  user_id | 1 AS with_flag,
  xor(user_id, event_id) AS xored,
  user_id << 2 AS shifted_l,
  user_id >> 1 AS shifted_r
FROM events WHERE event_id % 37 = 0
""",
    tags=("scalar", "bitwise"),
    description="Bitwise operator coverage.",
)
def q_bitwise_ops(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    u, e = F.col("user_id"), F.col("event_id")
    return ev.filter(e % 37 == 0).select(
        "event_id",
        u.bitwiseAND(F.lit(255)).alias("low_byte"),
        u.bitwiseOR(F.lit(1)).alias("with_flag"),
        u.bitwiseXOR(e).alias("xored"),
        F.shiftleft(u, 2).alias("shifted_l"),
        F.shiftright(u, 1).alias("shifted_r"),
    )


@query(
    "q_histogram_doc_lengths",
    oracle="""
SELECT CAST(n_chars // 100 AS BIGINT) AS bucket_100,
  count(*) AS n_docs,
  min(n_chars) AS min_chars,
  max(n_chars) AS max_chars
FROM documents
GROUP BY 1
""",
    tags=("agg", "histogram"),
    description="Fixed-width histogram buckets over doc lengths.",
)
def q_histogram_doc_lengths(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    return (
        docs.groupBy(
            F.floor(F.col("n_chars") / 100).cast("bigint").alias("bucket_100")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "q_token_doc_frequency",
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest(list_distinct({duck_tokens('text')})) AS token
  FROM documents
)
SELECT token, count(*) AS doc_freq
FROM t
GROUP BY token
ORDER BY doc_freq DESC, token
LIMIT 30
""",
    tags=("text", "ring-c", "vocab"),
    description="Token document-frequency (vocabulary building): distinct "
    "tokens per doc -> explode -> count -> top 30.",
)
def q_token_doc_frequency(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    return (
        # explode_outer dodges InferFiltersFromGenerate's double evaluation
        # of the token expression (see llm/dedup._exploded_shingles).
        docs.select(
            "doc_id",
            F.explode_outer(F.array_distinct(tokens(F.lower(F.col("text"))))).alias(
                "token"
            ),
        )
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "token")
        .limit(30)
    )


@query(
    "q_window_distribution_funcs",
    oracle="""
SELECT c_custkey, c_nationkey,
  ntile(4) OVER w AS bal_quartile,
  round(percent_rank() OVER w, 6) AS pr,
  round(cume_dist() OVER w, 6) AS cd
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
    tags=("window", "distribution"),
    description="ntile / percent_rank / cume_dist over a total per-nation "
    "order (custkey tiebreak keeps peer groups deterministic).",
)
def q_window_distribution_funcs(spark, sf_dir):
    from pyspark.sql import Window

    c = cat(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.customer.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q_window_first_last_nth",
    oracle="""
SELECT o_orderkey, o_custkey,
  first_value(o_orderkey) OVER w AS first_ok,
  last_value(o_orderkey) OVER w AS last_ok,
  nth_value(o_orderkey, 2) OVER w AS second_ok
FROM orders
WHERE o_custkey % 10 = 0
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
""",
    tags=("window", "analytic"),
    description="first_value / last_value / nth_value over the full "
    "partition frame, ordered by (orderdate, orderkey).",
)
def q_window_first_last_nth(spark, sf_dir):
    from pyspark.sql import Window

    c = cat(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.orders.filter(F.col("o_custkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@query(
    "q_approx_percentiles_orders",
    oracle="""
SELECT o_orderstatus,
  quantile_disc(o_totalprice, 0.5) AS p50_exact,
  quantile_disc(o_totalprice, 0.9) AS p90_exact,
  quantile_disc(o_totalprice, 0.99) AS p99_exact,
  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "percentile", "approx"),
    description="approx_percentile (p50/p90/p99) per order status -- the "
    "sketch path for 100 TB where exact percentiles would sort per group.  "
    "Oracle contract: exact DISCRETE percentiles (an actual data value on "
    "both engines, so no interpolation FP drift) plus per-quantile flags "
    "asserting the sketch lands within 5% relative error of exact.",
)
def q_approx_percentiles_orders(spark, sf_dir):
    c = cat(spark, sf_dir)

    def disc(p):
        return F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY o_totalprice)"
        )

    def approx(p):
        return F.approx_percentile("o_totalprice", F.lit(p), F.lit(10000))

    def ok(p):
        return (F.abs(approx(p) - disc(p)) <= 0.05 * F.abs(disc(p)))

    return c.orders.groupBy("o_orderstatus").agg(
        disc(0.5).alias("p50_exact"),
        disc(0.9).alias("p90_exact"),
        disc(0.99).alias("p99_exact"),
        ok(0.5).alias("p50_ok"),
        ok(0.9).alias("p90_ok"),
        ok(0.99).alias("p99_ok"),
    )


@query(
    "q_cross_join_region_matrix",
    oracle="""
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
WHERE a.r_name <> b.r_name
""",
    tags=("join", "cross"),
    description="Explicit cartesian product (tiny dims only; the engine "
    "treats cross joins on fact tables as plan bugs).",
)
def q_cross_join_region_matrix(spark, sf_dir):
    c = cat(spark, sf_dir)
    a = c.region.select(F.col("r_name").alias("region_a"))
    b = c.region.select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b).filter(F.col("region_a") != F.col("region_b"))


@query(
    "q_string_functions2",
    oracle="""
SELECT p_partkey,
  CAST(regexp_matches(p_name, '[0-9]+') AS INT) AS has_digit,
  translate(p_brand, '#', '-') AS brand_dashed,
  ascii(p_name) AS first_cp,
  chr(65 + CAST(p_partkey % 26 AS INT)) AS letter,
  split_part(p_type, ' ', 1) AS type_head,
  replace(p_name, ' ', '_') AS name_snake
FROM part WHERE p_partkey % 7 = 0
""",
    tags=("scalar", "string"),
    description="Second string batch: rlike / translate / ascii / chr / "
    "split_part (element of split) / replace.",
)
def q_string_functions2(spark, sf_dir):
    c = cat(spark, sf_dir)
    return c.part.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.col("p_name").rlike("[0-9]+").cast("int").alias("has_digit"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.ascii("p_name").alias("first_cp"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("letter"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@query(
    "q_null_semantics",
    oracle="""
SELECT o_orderkey,
  nullif(o_orderstatus, 'O') AS status_or_null,
  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_defaulted,
  o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0.0) AS try_div,
  CAST(o_orderstatus = 'O' AS INT) IS NOT NULL AS bool_not_null
FROM orders WHERE o_orderkey % 11 = 0
ORDER BY nullif(o_orderstatus, 'O') NULLS FIRST, o_orderkey
""",
    tags=("scalar", "null-semantics", "sort"),
    description="NULL algebra: nullif / coalesce defaults / try_divide "
    "(null, not error, on zero) / explicit NULLS FIRST ordering.",
)
def q_null_semantics(spark, sf_dir):
    c = cat(spark, sf_dir)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        c.orders.filter(F.col("o_orderkey") % 11 == 0)
        .select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("OPEN")).alias("status_defaulted"),
            F.try_divide(
                F.col("o_totalprice"), (F.col("o_orderkey") % 3).cast("double")
            ).alias("try_div"),
            (F.col("o_orderstatus") == "O").cast("int").isNotNull().alias(
                "bool_not_null"
            ),
        )
        .orderBy(F.col("status_or_null").asc_nulls_first(), "o_orderkey")
    )


@query(
    "q_union_by_name_missing",
    oracle="""
SELECT c_custkey AS entity_key, c_name AS entity_name, c_acctbal AS balance, NULL AS nationkey
FROM customer WHERE c_custkey % 100 = 0
UNION ALL BY NAME
SELECT s_suppkey AS entity_key, s_name AS entity_name, CAST(s_nationkey AS INT) AS nationkey
FROM supplier
""",
    tags=("setops", "union-by-name"),
    description="unionByName with allowMissingColumns: heterogeneous "
    "entity projections aligned by column name, absent columns null.",
)
def q_union_by_name_missing(spark, sf_dir):
    c = cat(spark, sf_dir)
    custs = c.customer.filter(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("balance"),
    )
    supps = c.supplier.select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.col("s_nationkey").cast("int").alias("nationkey"),
    )
    return custs.unionByName(supps, allowMissingColumns=True)


@query(
    "q_calendar_arithmetic",
    oracle="""
SELECT o_orderkey,
  isodow(o_orderdate) AS iso_weekday,
  week(o_orderdate) AS iso_week,
  datediff('month', DATE '1995-01-01', o_orderdate) AS months_since_start,
  strftime(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d') AS plus_2_months,
  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start
FROM orders WHERE o_orderkey % 13 = 0
""",
    tags=("scalar", "date", "calendar"),
    description="Calendar arithmetic: ISO weekday/week, month-boundary "
    "distance, calendar-aware add_months, quarter truncation.",
)
def q_calendar_arithmetic(spark, sf_dir):
    c = cat(spark, sf_dir)
    d = F.col("o_orderdate")
    return c.orders.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        (F.weekday(d) + 1).alias("iso_weekday"),
        F.weekofyear(d).alias("iso_week"),
        # month-boundary crossings since 1995-01 (matches duck datediff
        # 'month' semantics; months_between is fractional and differs)
        ((F.year(d) - 1995) * 12 + F.month(d) - 1).alias("months_since_start"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2_months"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
    )


@query(
    "q_hll_sketch_rollup",
    oracle="""
SELECT o_orderpriority,
  count(DISTINCT o_custkey) AS exact_customers,
  count(*) AS n_orders,
  TRUE AS merged_estimate_ok
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "approx", "sketch", "rollup"),
    description="Mergeable-sketch rollup -- THE incremental pattern at "
    "100 TB: per-(priority, month) HLL sketches of distinct customers "
    "are built once, then re-aggregated to priority level with "
    "hll_union_agg, never recounting the base data (a month's sketch is "
    "what an incremental pipeline would persist).  Oracle contract: "
    "exact distinct count plus a flag asserting the merged estimate "
    "lands within 5% of it -- a broken merge path flips the flag.",
)
def q_hll_sketch_rollup(spark, sf_dir):
    c = cat(spark, sf_dir).orders
    monthly = c.groupBy(
        "o_orderpriority", F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    rolled = monthly.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("n").alias("n_orders"),
    )
    exact = c.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    return (
        rolled.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_customers",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            (
                F.abs(F.col("est").cast("double") - F.col("exact_customers").cast("double"))
                <= 0.05 * F.col("exact_customers").cast("double")
            ).alias("merged_estimate_ok"),
        )
    )


@query(
    "q_rfm_segments",
    oracle="""
WITH m AS (
  SELECT o_custkey,
    max(o_orderdate) AS last_order,
    count(*) AS frequency,
    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary
  FROM orders GROUP BY o_custkey
),
s AS (
  SELECT o_custkey,
    ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
    ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
    ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM m
)
SELECT o_custkey, CAST(r_score AS INTEGER) AS r_score,
  CAST(f_score AS INTEGER) AS f_score,
  CAST(m_score AS INTEGER) AS m_score,
  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
    || CAST(m_score AS VARCHAR) AS segment
FROM s
""",
    tags=("window", "segmentation", "rfm"),
    description="RFM customer segmentation: per-customer recency/"
    "frequency/monetary reduced once, then three ntile(4) quartile "
    "scores -- the classic marketing segmentation.  Every ntile ORDER BY "
    "carries the customer key as tiebreaker, so bucket boundaries are "
    "total-ordered and engine-independent; monetary in exact DECIMAL.  "
    "Scale note: each exact ntile runs through range_block + "
    "blocked_global_ntile (the per-customer aggregate SCALES with the "
    "corpus -- 10x per decade, r10 suspect check -- so the r9 global "
    "windows were three single tasks each holding every customer); "
    "the only global windows left are over <=4096-row block carries.",
)
def q_rfm_segments(spark, sf_dir):
    from ..operators import ranks as RK

    c = cat(spark, sf_dir)
    m = c.orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("o_totalprice")).alias("monetary"),
    )
    # Exact ntile(4) per metric, each over its own descending range
    # block: blocks are monotone in the DESC sort key with equal
    # metrics in equal blocks, so the blocked total order equals the
    # window's -- value-identical buckets, no single-partition window.
    # The three ntiles run in PARALLEL off the same rollup and join on
    # the customer key (chaining them would nest each blocked plan's
    # ~4 references to its input multiplicatively); the repeated
    # rollup subtrees canonicalize, so AQE reuses their shuffle stages
    # at runtime.
    def score(key, order_col, out):
        rb = RK.range_block(
            m, key, n_blocks=4096, descending=True, out_col="__rb"
        )
        return RK.blocked_global_ntile(
            rb,
            F.col("__rb"),
            [F.col(order_col).desc(), "o_custkey"],
            4,
            out_col=out,
            max_blocks=4096,
        ).select("o_custkey", out)

    s = (
        m.select("o_custkey")
        .join(score(F.datediff(F.col("last_order"), F.lit("1970-01-01")),
                    "last_order", "r_score"), "o_custkey")
        .join(score(F.col("frequency"), "frequency", "f_score"), "o_custkey")
        .join(score(F.col("monetary"), "monetary", "m_score"), "o_custkey")
    )
    return s.select(
        "o_custkey",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )
