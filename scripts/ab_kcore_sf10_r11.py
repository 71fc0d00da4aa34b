#!/usr/bin/env python
"""r11 interleaved sf10 A/B: the k-core inherited changes, isolated.

The post-change sf10 campaign read q_kcore_copurchase 39.5 s vs the
r10-opt record's 18.0 s on a box the LPA/Bellman rows prove comparable
(22.25 vs 22.04 / 22.37 vs 22.41).  Three legs, ONE JVM, interleaved,
isolate which inherited change regressed the decade:

  new   -- tree as-is (no static hints, lazy-ckpt+count convergence)
  hints -- new + the r10 shuffle_hash hints back on the keep-side
           semi-joins (isolates hint-drop; convergence fold kept)
  r10   -- full r10 shape: hints + eager every-round checkpoint, no
           convergence count
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from bench import calibrate  # noqa: E402
from etl_onprem_to_cloud_spark.pinned import release_pinned  # noqa: E402
from etl_onprem_to_cloud_spark.queries import QUERIES  # noqa: E402
from etl_onprem_to_cloud_spark.queries._util import cat  # noqa: E402
from etl_onprem_to_cloud_spark.queries.mining import (  # noqa: E402
    _KCORE_K,
    _KCORE_ROUNDS,
)
from etl_onprem_to_cloud_spark.session import get_spark  # noqa: E402


def kcore_variant(spark, sf_dir, hints: bool, convergence: bool):
    from etl_onprem_to_cloud_spark.operators.graph import spread_pairs_input

    li = spread_pairs_input(
        cat(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("x"), F.col("pb").alias("y"))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    prev_n = None
    for i in range(1, _KCORE_ROUNDS + 1):
        deg = (
            edges.select(F.col("x").alias("node"))
            .unionAll(edges.select(F.col("y").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        kx = keep.withColumnRenamed("node", "x")
        ky = keep.withColumnRenamed("node", "y")
        if hints:
            kx, ky = kx.hint("shuffle_hash"), ky.hint("shuffle_hash")
        edges = (
            edges.join(kx, "x", "left_semi")
            .join(ky, "y", "left_semi")
            .select("x", "y")
        )
        if i < _KCORE_ROUNDS:
            if convergence:
                edges = edges.localCheckpoint(eager=False)
                n = edges.count()
                if n == prev_n:
                    break
                prev_n = n
            else:
                edges = edges.localCheckpoint(eager=True)
    return (
        edges.select(F.col("x").alias("node"))
        .unionAll(edges.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg((F.count(F.lit(1))).cast("bigint").alias("kcore_degree"))
        .orderBy(F.desc("kcore_degree"), "node")
    )


LEGS = {
    "new": dict(hints=False, convergence=True),
    "hints": dict(hints=True, convergence=True),
    "r10": dict(hints=True, convergence=False),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf10")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    legs = (os.environ.get("SPARK_GRAFT_AB_LEGS") or "new,hints,r10").split(",")

    spark = get_spark(app_name="ab-kcore-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    for leg in legs:
        kcore_variant(spark, warm_dir, **LEGS[leg]).count()
        release_pinned()
    # Sanity: identical results across legs at the warm SF.
    base = [tuple(r) for r in kcore_variant(spark, warm_dir, **LEGS[legs[0]]).collect()]
    for leg in legs[1:]:
        got = [tuple(r) for r in kcore_variant(spark, warm_dir, **LEGS[leg]).collect()]
        assert got == base, f"leg {leg} diverges at {warm_dir}"
    py_calib, spark_calib = calibrate(spark)
    print(f"# calib py_loop {py_calib} spark_range {spark_calib}", flush=True)

    times = {leg: [] for leg in legs}
    for rep in range(reps):
        for leg in legs:
            spark.sparkContext.setJobDescription(f"kcore:{leg}:{rep}")
            t0 = time.perf_counter()
            kcore_variant(spark, sf_dir, **LEGS[leg]).count()
            dt = time.perf_counter() - t0
            release_pinned()
            times[leg].append(round(dt, 3))
            print(json.dumps({leg: times[leg]}), flush=True)
    print(json.dumps({
        "metric": "ab_kcore_sf10_r11",
        "sf_dir": sf_dir,
        "reps": reps,
        "calib": {"py_loop_sec": py_calib, "spark_range_sec": spark_calib},
        "legs": {leg: {"min": min(v), "raw": v} for leg, v in times.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
