"""Scale-pattern queries: sketches, runtime filters, and data layout.

Three patterns that decide whether a plan survives 100 TB, each made
concrete and oracle-checked:

- count-min sketch heavy hitters (mergeable frequency sketch; the
  estimates themselves are md5-deterministic, so DuckDB recomputes the
  identical sketch -- a full value oracle, not a bounded check),
- Bloom-filter semi-join reduction (result provably equals the plain
  join; the oracle runs the plain join),
- Z-order layout locality (Morton interleave recomputed bit-for-bit by
  the oracle from a shared expression generator).

The reference delegates every aggregation to Athena (README.md:184-199)
and writes a single unpartitioned file (etl/transform.py:205); these
are Ring C / 100 TB extensions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import dsum_round
from ..operators import layout as LY
from ..operators import ranks as RK
from ..operators import sketches as SK
from ._util import cat, duck_dsum
from . import query

_CMS_DEPTH = 4
_CMS_WIDTH = 256

# DuckDB twin of operators/sketches._cell_idx for depth column/value {d}.
_DUCK_H60 = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def _duck_cell(d_expr: str, key_expr: str) -> str:
    h = _DUCK_H60.format(
        expr=f"CAST({d_expr} AS VARCHAR) || '|' || CAST({key_expr} AS VARCHAR)"
    )
    return f"({h} % {_CMS_WIDTH})"


@query(
    "q_cms_heavy_hitters",
    oracle=f"""
WITH depths AS (SELECT unnest([0, 1, 2, 3]) AS d),
exact AS (
  SELECT o_custkey, count(*) AS exact_orders FROM orders GROUP BY o_custkey
),
stats AS (SELECT avg(exact_orders) AS mean_freq FROM exact),
cells AS (
  SELECT dp.d AS d, {_duck_cell('dp.d', 'o_custkey')} AS idx, count(*) AS cnt
  FROM orders CROSS JOIN depths dp
  GROUP BY 1, 2
),
est AS (
  SELECT e.o_custkey, min(coalesce(c.cnt, 0)) AS cms_estimate
  FROM exact e CROSS JOIN depths dp
  LEFT JOIN cells c
    ON c.d = dp.d AND c.idx = {_duck_cell('dp.d', 'e.o_custkey')}
  GROUP BY e.o_custkey
)
SELECT e.o_custkey, e.exact_orders, est.cms_estimate,
  est.cms_estimate >= e.exact_orders AS overestimate_ok
FROM exact e JOIN est USING (o_custkey) CROSS JOIN stats
WHERE e.exact_orders >= 1.5 * stats.mean_freq
""",
    tags=("agg", "approx", "sketch", "heavy-hitters", "scale"),
    description=(
        "Count-min sketch heavy hitters: one shuffle reduces orders to a "
        "4x256 mergeable counter matrix; estimates (min over hash rows) "
        "are md5-deterministic, so the oracle recomputes the identical "
        "sketch and checks every estimate value, plus the one-sided "
        "error invariant estimate >= truth (operators/sketches.py)."
    ),
)
def q_cms_heavy_hitters(spark, sf_dir):
    orders = cat(spark, sf_dir).orders
    key = F.col("o_custkey").cast("string")
    cells = SK.cms_build(orders, key, _CMS_DEPTH, _CMS_WIDTH)
    exact = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_orders"))
    est = SK.cms_estimate(exact, cells, key, _CMS_DEPTH, _CMS_WIDTH)
    mean = exact.agg(F.avg("exact_orders").alias("mean_freq"))
    return (
        est.join(F.broadcast(mean))
        .filter(F.col("exact_orders") >= 1.5 * F.col("mean_freq"))
        .select(
            "o_custkey",
            "exact_orders",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_orders")).alias("overestimate_ok"),
        )
    )


@query(
    "q_bloom_semi_join_reduction",
    oracle=f"""
SELECT o.o_orderpriority,
  count(*) AS n_items,
  {duck_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 450000
GROUP BY o.o_orderpriority
""",
    tags=("join", "sketch", "runtime-filter", "scale"),
    description=(
        "Bloom-filter semi-join reduction: an 8192-bit md5 bitset of the "
        "high-value orders' keys is broadcast and applied to lineitem "
        "BEFORE the join shuffle; false positives die in the join, so "
        "the result -- and the oracle -- is exactly the plain join "
        "(operators/sketches.py bloom_semi_join)."
    ),
)
def q_bloom_semi_join_reduction(spark, sf_dir):
    c = cat(spark, sf_dir)
    hot = c.orders.filter(F.col("o_totalprice") > 450000)
    joined = SK.bloom_semi_join(c.lineitem, hot, "l_orderkey", "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum_round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
    )


_Z_BITS = 8
_Z_BUCKETS = 64


@query(
    "q_zorder_layout_stats",
    oracle=f"""
WITH z AS (
  SELECT l_orderkey, l_linenumber,
    l_partkey % 256 AS x, l_suppkey % 256 AS y,
    {LY.morton_sql('(l_partkey % 256)', '(l_suppkey % 256)', _Z_BITS)} AS zval
  FROM lineitem
),
b AS (
  SELECT x, y,
    ntile({_Z_BUCKETS}) OVER (ORDER BY zval, l_orderkey, l_linenumber) AS bucket
  FROM z
)
SELECT bucket, count(*) AS n,
  min(x) AS min_x, max(x) AS max_x,
  min(y) AS min_y, max(y) AS max_y
FROM b GROUP BY bucket
""",
    tags=("layout", "zorder", "scale"),
    description=(
        "Z-order layout locality: Morton-interleave (l_partkey, "
        "l_suppkey) low bits, carve the Z-ordered rows into 64 "
        "file-sized buckets, report each bucket's (x, y) bounding box -- "
        "tight boxes are what make parquet footer stats prune on EITHER "
        "column.  The oracle rebuilds the interleave from the same "
        "generator (operators/layout.py morton_sql); the production "
        "writer is zorder_write (range exchange, no global sort)."
    ),
)
def q_zorder_layout_stats(spark, sf_dir):
    """The global ntile runs through operators/ranks.
    blocked_global_ntile: zval has a BOUNDED domain (2^(2*bits) =
    65 536 values), so blocking on it ranks within z-cells in
    parallel and the only global window is over the <=65 536-row
    per-cell count aggregate -- no single task ever holds the
    corpus (the r9 global-window sweep; a bare Window.orderBy here
    is one task sorting all 6B lineitems at the third decade)."""
    li = cat(spark, sf_dir).lineitem
    x = (F.col("l_partkey") % 256).cast("int")
    y = (F.col("l_suppkey") % 256).cast("int")
    z = li.select(
        "l_orderkey",
        "l_linenumber",
        x.alias("x"),
        y.alias("y"),
        LY.morton_code(x, y, _Z_BITS).alias("zval"),
    )
    b = RK.blocked_global_ntile(
        z,
        F.col("zval"),
        ["l_orderkey", "l_linenumber"],
        _Z_BUCKETS,
        # zval's domain is 2^(2*bits) by construction; passing it makes
        # the carry bound exact (static .limit + runtime raise_error).
        max_blocks=1 << (2 * _Z_BITS),
    ).select("x", "y", "bucket")
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


_PRUNE_BOXES = [(0, 31, 0, 31), (100, 131, 100, 131), (200, 255, 0, 63)]
_PRUNE_BOXES_SQL = ", ".join(
    f"({i}, {x0}, {x1}, {y0}, {y1})"
    for i, (x0, x1, y0, y1) in enumerate(_PRUNE_BOXES)
)


@query(
    "q_zorder_pruning_ratio",
    oracle=f"""
WITH z AS (
  SELECT l_orderkey, l_linenumber,
    l_partkey % 256 AS x, l_suppkey % 256 AS y,
    {LY.morton_sql('(l_partkey % 256)', '(l_suppkey % 256)', _Z_BITS)} AS zval
  FROM lineitem
),
zb AS (
  SELECT x, y,
    ntile({_Z_BUCKETS}) OVER (ORDER BY zval, l_orderkey, l_linenumber) AS bucket
  FROM z
),
zs AS (
  SELECT bucket, min(x) AS min_x, max(x) AS max_x,
    min(y) AS min_y, max(y) AS max_y
  FROM zb GROUP BY bucket
),
lb AS (
  SELECT x, y,
    ntile({_Z_BUCKETS}) OVER (ORDER BY l_orderkey, l_linenumber) AS bucket
  FROM z
),
ls AS (
  SELECT bucket, min(x) AS min_x, max(x) AS max_x,
    min(y) AS min_y, max(y) AS max_y
  FROM lb GROUP BY bucket
),
boxes(box_id, x0, x1, y0, y1) AS (VALUES {_PRUNE_BOXES_SQL})
SELECT b.box_id,
  CAST((SELECT count(*) FROM zs
        WHERE zs.max_x >= b.x0 AND zs.min_x <= b.x1
          AND zs.max_y >= b.y0 AND zs.min_y <= b.y1) AS BIGINT) AS z_buckets,
  CAST((SELECT count(*) FROM ls
        WHERE ls.max_x >= b.x0 AND ls.min_x <= b.x1
          AND ls.max_y >= b.y0 AND ls.min_y <= b.y1) AS BIGINT) AS linear_buckets,
  CAST({_Z_BUCKETS} AS BIGINT) AS total_buckets
FROM boxes b ORDER BY b.box_id
""",
    tags=("layout", "zorder", "scale"),
    description=(
        "Layout effectiveness: for 3 fixed (x, y) range queries, how "
        "many of the 64 file-sized buckets must be touched under the "
        "Z-ORDERED layout vs the same data bucketed in ARRIVAL order "
        "(each bucket's bounding box is what parquet footer stats / a "
        "stats manifest would prune on).  The z layout touches a "
        "fraction; arrival order touches nearly everything -- the "
        "measured WHY of operators/layout.zorder_write + pruned_read."
    ),
)
def q_zorder_pruning_ratio(spark, sf_dir):
    """Scale shape: same single-pass bucket stats as
    q_zorder_layout_stats, twice (z-order and arrival order), each
    collapsed to 64 bounding boxes; the 3 query boxes join against
    64-row relations (broadcast both ways, cost ~0).  Both ntiles go
    through blocked_global_ntile (the r9 global-window sweep): the z
    layout blocks on the bounded-domain zval, the arrival layout on a
    range_block of l_orderkey (monotone in the sort key, so the
    blocked order IS arrival order -- and bounded at 4096 blocks at
    ANY scale, unlike the r9 DIV-width block whose count grew
    linearly with the key range)."""
    li = cat(spark, sf_dir).lineitem
    x = (F.col("l_partkey") % 256).cast("int")
    y = (F.col("l_suppkey") % 256).cast("int")
    z = li.select(
        "l_orderkey",
        "l_linenumber",
        x.alias("x"),
        y.alias("y"),
        LY.morton_code(x, y, _Z_BITS).alias("zval"),
    )

    def bucket_stats(src, block, max_blocks):
        b = RK.blocked_global_ntile(
            src, block, ["l_orderkey", "l_linenumber"], _Z_BUCKETS,
            max_blocks=max_blocks,
        )
        return (
            b.select("x", "y", "bucket")
            .groupBy("bucket")
            .agg(
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
                F.min("y").alias("min_y"),
                F.max("y").alias("max_y"),
            )
        )

    zs = bucket_stats(z, F.col("zval"), 1 << (2 * _Z_BITS))
    # Arrival order blocks on the key's VALUE RANGE, not `key DIV
    # width`: a DIV-width block count grows linearly with the key
    # range across decades (ADVICE r9), while range_block is bounded
    # by construction at any SF -- and since any monotone block of the
    # leading sort key yields the identical ntile, the values are
    # unchanged.
    za = RK.range_block(
        z, F.col("l_orderkey"), n_blocks=4096, out_col="__ablk"
    )
    ls = bucket_stats(za, F.col("__ablk"), 4096)
    boxes = spark.createDataFrame(
        [(i, *b) for i, b in enumerate(_PRUNE_BOXES)],
        "box_id: int, x0: int, x1: int, y0: int, y1: int",
    )

    def touched(stats, alias):
        hit = (
            (F.col("max_x") >= F.col("x0"))
            & (F.col("min_x") <= F.col("x1"))
            & (F.col("max_y") >= F.col("y0"))
            & (F.col("min_y") <= F.col("y1"))
        )
        return (
            boxes.join(F.broadcast(stats))
            .groupBy("box_id")
            .agg(F.sum(hit.cast("bigint")).alias(alias))
        )

    return (
        touched(zs, "z_buckets")
        .join(touched(ls, "linear_buckets"), "box_id")
        .withColumn("total_buckets", F.lit(_Z_BUCKETS).cast("bigint"))
        .orderBy("box_id")
    )
