#!/usr/bin/env python
"""Containment fan-out experiment (round 8, VERDICT r7 item 1).

The r7 sf100 probe read q_dedup_containment at exponent 1.06 and
README diagnosed the ~13%-over-linear residual as ``np.lexsort``'s log
factor on a FIXED-WIDTH box: the incidence fan-out is pinned at
4 x defaultParallelism = 128 partitions, so 10x collision rows mean
10x rows per partition and n.log n costs log(10M)/log(1M) ~ 1.17x
more per row.  That diagnosis implies a falsifiable experiment the r7
round never ran: hold PER-PARTITION incidence constant across the
decade by scaling the fan-out 10x on the sf100 leg
(SPARK_GRAFT_CONTAINMENT_FANOUT=40 -> 1280 partitions, ~1M rows per
partition on both legs, llm/dedup.py's probe-only knob).  If the
residual is really the lexsort log factor, the matched-n leg lands at
exponent ~ 1.00 (predicted ~532 s: 621.7 / 1.17); if it doesn't move,
the diagnosis is wrong and README must be revised.

Three legs, cheapest first, one JVM per leg (sf100_probe's _mint /
_sweep discipline -- shuffle files outlive their query until GC):

1. sf10  @ default fan-out (mult 4,  128 partitions)  best-of-2
2. sf100 @ matched fan-out (mult 40, 1280 partitions) best-of-2
3. sf100 @ default fan-out (mult 4,  128 partitions)  single run --
   same-session reference so the exponent comparison never leans on a
   cross-round number (bench drift is +-15% box state).

Usage: python scripts/containment_fanout_probe.py
(requires the derived sf10/sf100 at /tmp -- build via sf10_probe.py /
sf100_probe.py first; /tmp is wiped between rounds).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reuse the sf100 probe's 48g heap + per-JVM discipline (import sets
# SPARK_GRAFT_DRIVER_MEM before any session exists).
from sf100_probe import SF10, SF100, _mint, _sweep  # noqa: E402

from etl_onprem_to_cloud_spark.pinned import release_pinned  # noqa: E402
from etl_onprem_to_cloud_spark.plans import execution_metrics  # noqa: E402
from etl_onprem_to_cloud_spark.queries import QUERIES  # noqa: E402
from etl_onprem_to_cloud_spark.session import get_spark  # noqa: E402

QUERY = "q_dedup_containment"

LEGS = [
    # (label, sf_dir, fanout_mult, runs)
    ("sf10_default", SF10, 4, 2),
    ("sf100_matched", SF100, 40, 2),
    ("sf100_default", SF100, 4, 1),
]


def _run_legs(spark, fn, results: dict[str, dict[str, float]]):
    """Run every leg, filling ``results``; returns the (possibly
    re-minted) session.  The caller clears the fan-out env knob in a
    ``finally`` so a leg dying here can never leave it engaged."""
    for i, (label, sf_dir, mult, runs) in enumerate(LEGS):
        if i > 0:
            spark = _mint(spark)
        os.environ["SPARK_GRAFT_CONTAINMENT_FANOUT"] = str(mult)
        try:
            fn(spark, "/root/testdata/sf0.001").count()  # warm the JVM
            release_pinned()
            _sweep(spark)
            best_t = best_m = None
            for _ in range(runs):
                t0 = time.perf_counter()
                m = execution_metrics(fn(spark, sf_dir))
                t = time.perf_counter() - t0
                if best_t is None or t < best_t:
                    best_t, best_m = t, m
                release_pinned()
                _sweep(spark)
        except Exception as e:  # noqa: BLE001 - report and continue
            release_pinned()
            results[label] = {"error": f"{type(e).__name__}: {e}"}
            print(f"| {label} | {mult} | — | FAILED | {e} |", flush=True)
            continue
        parts = mult * spark.sparkContext.defaultParallelism
        results[label] = {
            "fanout_mult": mult,
            "partitions": parts,
            "best_sec": round(best_t, 3),
            "runs": runs,
            "spill_bytes": int(best_m["spill_bytes"]),
        }
        print(
            f"| {label} | {mult} | {parts} | {best_t:.2f} | "
            f"{best_m['spill_bytes']:,} B |",
            flush=True,
        )
    return spark


def main() -> None:
    for d in (SF10, SF100):
        if not os.path.isdir(f"{d}/documents.parquet"):
            print(f"# missing derived data at {d}; build first", file=sys.stderr)
            sys.exit(1)

    spark = get_spark(app_name="containment-fanout-probe")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[QUERY].fn
    results: dict[str, dict[str, float]] = {}
    print("| leg | fan-out mult | partitions | best (s) | spill |")
    print("|---|---|---|---|---|")
    try:
        spark = _run_legs(spark, fn, results)
    finally:
        # ALWAYS clear the knob (ADVICE r8): a leg that dies mid-loop
        # must not leave the override engaged for later in-process
        # production calls.
        os.environ.pop("SPARK_GRAFT_CONTAINMENT_FANOUT", None)

    out: dict[str, object] = {"metric": "containment_fanout_probe",
                              "legs": results}
    if "best_sec" in results.get("sf10_default", {}) and "best_sec" in results.get(
        "sf100_matched", {}
    ):
        r = results["sf100_matched"]["best_sec"] / results["sf10_default"]["best_sec"]
        out["matched_ratio"] = round(r, 3)
        out["matched_exponent"] = round(math.log10(r), 3)
        print(f"# matched-n exponent: {out['matched_exponent']}", file=sys.stderr)
    if "best_sec" in results.get("sf100_default", {}) and "best_sec" in results.get(
        "sf10_default", {}
    ):
        r = results["sf100_default"]["best_sec"] / results["sf10_default"]["best_sec"]
        out["default_ratio"] = round(r, 3)
        out["default_exponent"] = round(math.log10(r), 3)
        print(f"# default-fanout exponent (same-session ref): "
              f"{out['default_exponent']}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
