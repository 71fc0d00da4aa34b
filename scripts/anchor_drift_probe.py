#!/usr/bin/env python
"""Idle-box anchor drift separation (round 8, VERDICT r7 item 3).

Round 7's count-carry verify moved three sf0.1 anchors
(q_dedup_minhash_lsh 0.74->1.49, q_ml_minhash_lsh_pairs 1.19->2.22,
q_dedup_clusters 1.52->2.68 across BENCH_DETAIL_r06/r07), and README's
dispatch note quoted different idle-box ratios (0.74->1.29) than the
committed bench rows -- the bench snapshot ran under round-automation
load while spark_range calib drifted 0.089->0.148 s (66%).  This probe
re-times exactly those three anchors on an IDLE box, best-of-3, with
the same warmup discipline as bench.py and calib attached, so the r7
anchor movement can be split into:

- count-carry fixed cost = idle-box(r8 code) - r6 row, after checking
  calib parity with the r6 snapshot, and
- box drift = r7 row - idle-box(r8 code) (same code both sides; any
  gap is load/state, not plan).

Output: one JSON line {calib, queries{name: best3_sec}}; the README
table is written from it.  Run with nothing else on the box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrate  # ONE calib definition; see its docstring

from etl_onprem_to_cloud_spark.pinned import release_pinned
from etl_onprem_to_cloud_spark.queries import QUERIES
from etl_onprem_to_cloud_spark.session import get_spark

ANCHORS = ["q_dedup_minhash_lsh", "q_ml_minhash_lsh_pairs", "q_dedup_clusters"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="anchor-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for name in ANCHORS:  # bench.py's warmup discipline
        QUERIES[name].fn(spark, warm).count()
    release_pinned()

    py_calib, spark_calib = calibrate(spark)

    timings: dict[str, float] = {}
    for name in ANCHORS:
        fn = QUERIES[name].fn
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        release_pinned()  # after all runs, like bench.py
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    print(json.dumps({
        "metric": "anchor_drift_probe",
        "sf": 0.1,
        "runs_per_query": 3,
        "calib": {"py_loop_sec": py_calib, "spark_range_sec": spark_calib},
        "queries": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
