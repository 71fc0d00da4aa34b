"""Scale-strategy operators: bucketed co-located joins must plan with
zero exchanges, and salted aggregation/join must be result-identical to
their unsalted forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed_table,
)
from etl_onprem_to_cloud_spark.operators.skew import salted_agg, salted_join
from etl_onprem_to_cloud_spark.plans import shuffle_count
from etl_onprem_to_cloud_spark.sources.io import load_table


@pytest.fixture(scope="module")
def no_broadcast(spark):
    """Force SortMergeJoin so the bucketing (not broadcast) is what
    eliminates the exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_needs_no_shuffle(spark, sf_dir, tmp_path_factory, no_broadcast):
    d = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    try:
        write_bucketed_table(
            orders, "b_orders", ["o_orderkey"], num_buckets=4, path=str(d / "o")
        )
        write_bucketed_table(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            ["o_orderkey"],
            num_buckets=4,
            path=str(d / "l"),
        )
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        assert shuffle_count(joined) == 0, "same-bucketed join must not exchange"

        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": ("l_quantity", "count"),
            "total_qty": ("l_quantity", "sum"),
            "max_price": ("l_extendedprice", "max"),
            "min_disc": ("l_discount", "min"),
        },
        salts=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        F.sum("l_quantity").alias("total_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_discount").alias("min_disc"),
    )
    got = {r.l_returnflag: (r.n, round(r.total_qty, 4), r.max_price, r.min_disc)
           for r in salted.collect()}
    want = {r.l_returnflag: (r.n, round(r.total_qty, 4), r.max_price, r.min_disc)
            for r in plain.collect()}
    assert got == want


def test_salted_agg_rejects_non_mergeable(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], {"a": ("l_quantity", "avg")})


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    salted = salted_join(orders, cust, ["o_custkey"], salts=8)
    plain = orders.join(cust, ["o_custkey"])
    assert salted.count() == plain.count()
    s = {tuple(r) for r in salted.select("o_orderkey", "c_name").collect()}
    p = {tuple(r) for r in plain.select("o_orderkey", "c_name").collect()}
    assert s == p


def test_salted_join_rejects_outer_modes(spark, sf_dir):
    # Replicated small side would emit unmatched rows once per salt
    # replica under right/full outer (ADVICE r01).
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(orders, cust, ["o_custkey"], salts=4, how=how)


def test_with_salt_spreads_exact_duplicate_rows(spark):
    # A hot key often arrives as EXACT duplicate rows; a pure row-hash
    # salt would collapse them all onto one salt value (ADVICE r01).
    from etl_onprem_to_cloud_spark.operators.skew import with_salt

    # 1024 identical rows built LINEARLY (a unionAll-doubling loop
    # squares the plan: 2^10 leaves x 32 range partitions = 32k tasks
    # of pure closure deserialization -- it stalled the whole suite).
    dupes = spark.range(1024).select(
        F.lit(42).alias("k"), F.lit("same").alias("v")
    ).repartition(8)
    n_salts = with_salt(dupes, salts=16).select("__salt").distinct().count()
    assert n_salts > 1, "identical rows must not all map to one salt"


def test_srp_adaptive_bits_keeps_occupancy_bounded(spark):
    """The r5 sf10 probe caught srp_near_dup_pairs going quadratic
    (exponent 1.91) because FIXED bucket bits let per-bucket occupancy
    grow with the corpus.  With target_occupancy set (the default),
    bits rise with n.  Raising bits RE-SLICES the plane family per
    table (table t uses planes [t*B, (t+1)*B)), so the pair set is not
    a subset of the fixed-bits run -- the real contracts are: (a)
    PRECISION 1.0 against brute force at any bits (candidates only
    gate; exact cosine decides), (b) a sane recall floor despite the
    sharper buckets, (c) bit-identical results while the governor is
    disengaged (n <= 2^bits * occupancy -- every committed oracle
    lives there)."""
    import numpy as np

    from etl_onprem_to_cloud_spark.llm.similarity import srp_near_dup_pairs

    n, dim = 3000, 8
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.hash(F.col("id") * (d + 1), F.lit(d)) % 1000 / 500.0 - 1.0)
                .cast("float")
                for d in range(dim)
            ]
        ).alias("embedding"),
    )
    rows = emb.collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    iu = np.triu_indices(n, k=1)
    exact = {
        (int(a), int(b))
        for a, b in zip(iu[0][...], iu[1][...])
        if round(cos[a, b], 6) >= 0.9
    }
    assert exact, "fixture must contain true near-dup pairs"

    fixed = {
        (r.id_a, r.id_b)
        for r in srp_near_dup_pairs(
            emb, dim=dim, threshold=0.9, target_occupancy=None
        ).collect()
    }
    adaptive = {
        (r.id_a, r.id_b)
        for r in srp_near_dup_pairs(
            emb, dim=dim, threshold=0.9, target_occupancy=10
        ).collect()
    }
    # (a) no false positives, ever -- exact cosine is the gate.
    assert fixed <= exact and adaptive <= exact
    # (b) sharper buckets trade recall for linear candidates; the trade
    # must stay bounded (8 tables keep p_collision^bits redundancy).
    assert len(adaptive) >= 0.3 * len(exact), (
        f"adaptive recall collapsed: {len(adaptive)}/{len(exact)}"
    )
    # (c) governor disengaged (n <= 2^8 * 3000) => bit-identical result.
    same = {
        (r.id_a, r.id_b)
        for r in srp_near_dup_pairs(
            emb, dim=dim, threshold=0.9, target_occupancy=n
        ).collect()
    }
    assert same == fixed, "occupancy governor must not engage below 2^bits*occ"


# ---------------------------------------------------------------------------
# blocked_global_ntile (operators/ranks.py, r9 global-window sweep)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,k", [(100, 7), (64, 64), (5, 8), (97, 4), (1, 3)])
def test_blocked_global_ntile_matches_ntile(spark, n, k):
    """Differential twin: the block-carry ntile must be row-identical
    to Spark's own global-window ntile over the same total order, for
    n % k != 0, n == k, n < k, and n == 1."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_onprem_to_cloud_spark.operators import blocked_global_ntile

    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 13).alias("score"),  # many ties -> doc_id breaks them
    )
    want = df.withColumn(
        "bucket", F.ntile(k).over(Window.orderBy("score", "id"))
    )
    got = blocked_global_ntile(df, F.col("score"), ["id"], k)
    assert sorted(map(tuple, got.select("id", "bucket").collect())) == sorted(
        map(tuple, want.select("id", "bucket").collect())
    )


def test_blocked_global_ntile_div_block(spark):
    """The DIV-width block convention (arrival order over a growing
    id) must also reproduce ntile exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_onprem_to_cloud_spark.operators import blocked_global_ntile

    df = spark.range(1000).select(F.col("id"), (F.col("id") * 7 % 999).alias("v"))
    want = df.withColumn("bucket", F.ntile(9).over(Window.orderBy("id", "v")))
    got = blocked_global_ntile(df, F.expr("id DIV 100"), ["id", "v"], 9)
    assert sorted(map(tuple, got.select("id", "bucket").collect())) == sorted(
        map(tuple, want.select("id", "bucket").collect())
    )


def test_blocked_global_ntile_raises_on_unbounded_block(spark):
    """The cardinality contract is ENFORCED, not documented (ADVICE r9
    medium): blocking on a near-unique key -- which would silently
    degrade to one row per block, i.e. a corpus-sized carry and a
    corpus-sized global window one level up -- must raise at runtime,
    naming max_blocks, instead of returning a result."""
    from pyspark.sql import functions as F

    from etl_onprem_to_cloud_spark.operators import blocked_global_ntile

    df = spark.range(500).select(F.col("id"), (F.col("id") % 7).alias("v"))
    bad = blocked_global_ntile(df, F.col("id"), ["v"], 4, max_blocks=64)
    with pytest.raises(Exception, match="max_blocks"):
        bad.collect()


def test_range_block_ntile_matches_ntile_desc(spark):
    """range_block gives a BOUNDED monotone block for any numeric sort
    key (including descending order), and any monotone block yields
    the identical ntile -- the differential twin for the r10 rewrite
    of value-ranked queries (RFM, Pareto)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_onprem_to_cloud_spark.operators import (
        blocked_global_ntile,
        range_block,
    )

    df = spark.range(713).select(
        F.col("id"), ((F.col("id") * 37) % 101).cast("double").alias("m")
    )
    want = df.withColumn(
        "b", F.ntile(4).over(Window.orderBy(F.col("m").desc(), "id"))
    )
    rb = range_block(df, F.col("m"), n_blocks=16, descending=True)
    got = blocked_global_ntile(
        rb, F.col("__blk"), [F.col("m").desc(), "id"], 4, out_col="b",
        max_blocks=16,
    )
    assert sorted(map(tuple, got.select("id", "b").collect())) == sorted(
        map(tuple, want.select("id", "b").collect())
    )


def test_blocked_running_matches_global_window(spark):
    """blocked_running's row_number + inclusive running sum must be
    row-identical to the single-task global window it replaces, with
    ties split across block boundaries impossible by construction
    (equal keys -> equal blocks)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_onprem_to_cloud_spark.operators import (
        blocked_running,
        range_block,
    )

    df = spark.range(997).select(
        F.col("id"),
        ((F.col("id") * 13) % 50).cast("double").alias("val"),
    )
    rb = range_block(df, F.col("val"), n_blocks=8)
    got = blocked_running(
        rb, "__blk", [F.col("val"), "id"],
        running_sums={"cum": "val"}, row_number_col="rn", max_blocks=8,
    ).select("id", "rn", "cum")
    w = Window.orderBy("val", "id")
    want = df.select(
        "id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("val").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
