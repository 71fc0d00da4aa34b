#!/usr/bin/env python
"""Round-11 optimization probe: isolate named queries at sf0.1.

Same contract as scripts/opt_probe_r10.py with two r10-ADVICE fixes:
plans land under plans/r11/, the dumped plan is taken from the SAME
DataFrame instance whose execution produced the header metrics (the
r10 version re-built the query a third time and dumped its
pre-execution plan under the executed instance's numbers), and the
per-run timings are recorded alongside the min so pin-warmed second
runs are self-documenting.

    python scripts/opt_probe_r11.py q_lpa_communities q_kcore_copurchase
    SPARK_GRAFT_PLAN_SUFFIX=before python scripts/opt_probe_r11.py q_lpa_communities
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrate  # noqa: E402
from etl_onprem_to_cloud_spark.pinned import release_pinned  # noqa: E402
from etl_onprem_to_cloud_spark.plans import (  # noqa: E402
    execution_metrics,
    explain_str,
    shuffle_count,
)
from etl_onprem_to_cloud_spark.queries import QUERIES  # noqa: E402
from etl_onprem_to_cloud_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: opt_probe_r11.py <query> [query ...]")
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )

    spark = get_spark(app_name="opt-probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            QUERIES[name].fn(spark, warm_dir).count()
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
        release_pinned()
    py_calib, spark_calib = calibrate(spark)

    out = {}
    for name in names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"opt-probe:{name}")
        per_run, n = [], 0
        df = None
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            per_run.append(round(time.perf_counter() - t0, 3))
        # ADVICE r10 fix: metrics AND the dumped plan come from the
        # same executed instance (the last timed run's df).
        m = execution_metrics(df)
        rec = {
            "sec": min(per_run),
            "runs_sec": per_run,
            "rows": n,
            "exchanges": shuffle_count(df),
            "shuffle_bytes": m["shuffle_bytes_written"],
            "shuffle_records": m["shuffle_records_written"],
            "spill_bytes": m["spill_bytes"],
            "scan_rows": m["scan_output_rows"],
        }
        if suffix:
            os.makedirs(plans_dir, exist_ok=True)
            path = os.path.join(plans_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(
                    f"# {name} @ {sf_dir} ({suffix})\n"
                    f"# sec={rec['sec']} runs={per_run} "
                    f"exchanges={rec['exchanges']} "
                    f"shuffle_bytes={rec['shuffle_bytes']} "
                    f"spill_bytes={rec['spill_bytes']} "
                    f"scan_rows={rec['scan_rows']}\n\n"
                )
                f.write(explain_str(df, "formatted"))
            rec["plan"] = path
        release_pinned()
        out[name] = rec
        print(json.dumps({name: rec}))
    print(json.dumps({
        "metric": "opt_probe_r11",
        "sf_dir": sf_dir,
        "runs": runs,
        "calib": {"py_loop_sec": py_calib, "spark_range_sec": spark_calib},
        "queries": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
