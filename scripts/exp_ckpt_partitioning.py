#!/usr/bin/env python
"""Experiment: does localCheckpoint preserve outputPartitioning, and
does a subsequent join on that key skip the exchange on the
checkpointed side?  Decides the r11 iterative-family optimization
(pre-partition the static edge relation by the per-round join key)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.session import get_spark

spark = get_spark(app_name="exp-ckpt-part")
spark.sparkContext.setLogLevel("ERROR")

edges = (
    spark.range(0, 200_000)
    .select(
        (F.col("id") % 5000).alias("dst"),
        (F.pmod(F.xxhash64("id"), F.lit(5000))).alias("src"),
    )
)

# Variant A: checkpoint without pre-partitioning (current code shape).
ea = edges.distinct().localCheckpoint(eager=True)
# Variant B: pre-partitioned by the future join key.
eb = (
    edges.distinct()
    .repartition(spark.sparkContext.defaultParallelism, F.col("dst"))
    .localCheckpoint(eager=True)
)

labels = (
    spark.range(0, 5000)
    .select(F.col("id").alias("node"), F.col("id").alias("component"))
    .localCheckpoint(eager=True)
)

for tag, e in (("A_nopart", ea), ("B_prepart", eb)):
    j = (
        e.join(labels.hint("shuffle_hash"), e.dst == labels.node)
        .groupBy("src")
        .agg(F.min("component").alias("m"))
    )
    j.count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange hashpartitioning")
    print(f"== {tag}: executed-plan exchanges={n_ex}")
    for line in plan.splitlines():
        if "Exchange" in line or "ShuffledHashJoin" in line or "Scan ExistingRDD" in line:
            print("   ", line.strip()[:140])

# Also: does a SHUFFLE-HASH SEMI join's output partitioning survive a
# checkpoint into the NEXT round's same-key join (the k-core ordering
# question)?
keep = spark.range(0, 4000).select(F.col("id").alias("y"))
r1 = ea.withColumnRenamed("dst", "y").join(
    keep.hint("shuffle_hash"), "y", "left_semi"
).localCheckpoint(eager=True)
j2 = r1.join(keep.hint("shuffle_hash"), "y", "left_semi")
j2.count()
plan2 = j2._jdf.queryExecution().executedPlan().toString()
print("== C_semi_chain: exchanges=", plan2.count("Exchange hashpartitioning"))
for line in plan2.splitlines():
    if "Exchange" in line or "ShuffledHashJoin" in line:
        print("   ", line.strip()[:140])

spark.stop()
