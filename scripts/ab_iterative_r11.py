#!/usr/bin/env python
"""r11 interleaved A/B: iterative-family optimizations at sf0.1.

Legs (all in ONE JVM, interleaved, min-of-N per leg -- the repo's box
drift discipline):
  new        -- tree as-is (ckpt_partitioned + shuffle_hash hints)
  plainckpt  -- ckpt_partitioned monkeypatched to a plain eager
                localCheckpoint (isolates the partition-preserving
                checkpoint; hints stay)
  nohint     -- _node_build monkeypatched to identity (isolates the
                static shuffle_hash hint vs AQE's runtime choice;
                partitioned checkpoints stay)
  noboth     -- both patches
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrate  # noqa: E402
from etl_onprem_to_cloud_spark.pinned import release_pinned  # noqa: E402
from etl_onprem_to_cloud_spark.queries import QUERIES  # noqa: E402
from etl_onprem_to_cloud_spark.session import get_spark  # noqa: E402
from etl_onprem_to_cloud_spark.operators import layout  # noqa: E402
from etl_onprem_to_cloud_spark.queries import mining  # noqa: E402
from etl_onprem_to_cloud_spark.llm import dedup  # noqa: E402

QS = [
    "q_dedup_clusters",
    "q_dedup_clusters_star",
    "q_semantic_dedup_clusters",
    "q_lpa_communities",
    "q_bfs_hops_from_hubs",
    "q_bellman_ford_cheapest",
    "q_kcore_copurchase",
]

ORIG_CKPT = layout.ckpt_partitioned
ORIG_NB_M = mining._node_build
ORIG_NB_D = dedup._node_build


def plain_ckpt(df, key_col, num_partitions=None, storage_level=None):
    kw = {"eager": True}
    if storage_level is not None:
        kw["storageLevel"] = storage_level
    return df.localCheckpoint(**kw)


def set_leg(leg: str) -> None:
    ck = plain_ckpt if leg in ("plainckpt", "noboth") else ORIG_CKPT
    layout.ckpt_partitioned = ck
    mining.ckpt_partitioned = ck
    if leg in ("nohint", "noboth"):
        mining._node_build = lambda df: df
        dedup._node_build = lambda df: df
    else:
        mining._node_build = ORIG_NB_M
        dedup._node_build = ORIG_NB_D


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    legs = (os.environ.get("SPARK_GRAFT_AB_LEGS") or "new,plainckpt,nohint,noboth").split(",")
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or QS

    spark = get_spark(app_name="ab-iterative-r11")
    spark.sparkContext.setLogLevel("ERROR")
    for leg in legs:
        set_leg(leg)
        for name in names:
            try:
                QUERIES[name].fn(spark, warm_dir).count()
            except Exception as e:
                print(f"# warmup {name}/{leg} failed: {e}", file=sys.stderr)
            release_pinned()
    set_leg("new")
    py_calib, spark_calib = calibrate(spark)
    print(f"# calib py_loop {py_calib} spark_range {spark_calib}", flush=True)

    times: dict[str, dict[str, list[float]]] = {
        n: {leg: [] for leg in legs} for n in names
    }
    for rep in range(reps):
        for leg in legs:
            set_leg(leg)
            for name in names:
                spark.sparkContext.setJobDescription(f"ab:{name}:{leg}:{rep}")
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                release_pinned()
                times[name][leg].append(round(dt, 3))
    set_leg("new")
    out = {}
    for name in names:
        rec = {leg: min(v) for leg, v in times[name].items()}
        rec["raw"] = times[name]
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({
        "metric": "ab_iterative_r11",
        "sf_dir": sf_dir,
        "reps": reps,
        "calib": {"py_loop_sec": py_calib, "spark_range_sec": spark_calib},
        "queries": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
