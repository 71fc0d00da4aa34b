#!/usr/bin/env python
"""r11 interleaved A/B #2: count-carry verify hints + modularity spread.

Legs (ONE JVM, interleaved, min-of-N per leg -- the repo's box drift
discipline):
  new      -- tree as-is (static shuffle_hash on the verify builds,
              modularity edge build spread)
  novhint  -- dedup._verify_build monkeypatched to identity: the
              verify joins' strategy is left to AQE's runtime sizes
              (broadcast while the candidate side measures small,
              SMJ->SHJ via the session conversion threshold past it)
  nospread -- operators.graph spread_pairs_input patched to identity
              (isolates the r11 modularity spread; only the modularity
              row is meaningful on this leg -- the other queries reuse
              the spread from r10 paths deliberately left on)
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
from etl_onprem_to_cloud_spark.operators import graph  # noqa: E402
from etl_onprem_to_cloud_spark.llm import dedup  # noqa: E402

QS = [
    "q_dedup_minhash_lsh",
    "q_ml_minhash_lsh_pairs",
    "q_dedup_clusters",
    "q_modularity_brand_copurchase",
]

ORIG_VB = dedup._verify_build
ORIG_SPREAD = graph.spread_pairs_input


def set_leg(leg: str) -> None:
    dedup._verify_build = (lambda df: df) if leg == "novhint" else ORIG_VB
    graph.spread_pairs_input = (
        (lambda df, key_col: df) if leg == "nospread" else ORIG_SPREAD
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "4"))
    legs = (os.environ.get("SPARK_GRAFT_AB_LEGS") or "new,novhint,nospread").split(",")
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or QS

    spark = get_spark(app_name="ab-verify-r11")
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
                spark.sparkContext.setJobDescription(f"abv:{name}:{leg}:{rep}")
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
        "metric": "ab_verify_r11",
        "sf_dir": sf_dir,
        "reps": reps,
        "calib": {"py_loop_sec": py_calib, "spark_range_sec": spark_calib},
        "queries": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
