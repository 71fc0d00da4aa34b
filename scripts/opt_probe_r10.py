#!/usr/bin/env python
"""Round-10 optimization probe: isolate named queries at sf0.1.

For each name: warm at sf0.001 (JIT/codegen), then time the bench
action (plan + execute + count, SPARK_GRAFT_BENCH_RUNS runs, min) at
$SPARK_GRAFT_SF_DIR, pull executed-plan metrics (shuffle bytes/records,
spill, scan rows), and optionally write the formatted plan to
plans/r10/<name>_<suffix>.txt.

    python scripts/opt_probe_r10.py q_lpa_communities q_kcore_copurchase
    SPARK_GRAFT_PLAN_SUFFIX=before python scripts/opt_probe_r10.py q_lpa_communities

Prints one JSON line per query and a trailing summary line, with the
bench calib pair attached so numbers stay comparable across sessions.
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
        print("usage: opt_probe_r10.py <query> [query ...]")
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
    )

    spark = get_spark(app_name="opt-probe-r10")
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
        best, n = float("inf"), 0
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        df = fn(spark, sf_dir)
        m = execution_metrics(df)
        release_pinned()
        rec = {
            "sec": round(best, 3),
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
                    f"# sec={rec['sec']} exchanges={rec['exchanges']} "
                    f"shuffle_bytes={rec['shuffle_bytes']} "
                    f"spill_bytes={rec['spill_bytes']} "
                    f"scan_rows={rec['scan_rows']}\n\n"
                )
                f.write(explain_str(fn(spark, sf_dir), "formatted"))
            rec["plan"] = path
        out[name] = rec
        print(json.dumps({name: rec}))
    print(json.dumps({
        "metric": "opt_probe_r10",
        "sf_dir": sf_dir,
        "runs": runs,
        "calib": {"py_loop_sec": py_calib, "spark_range_sec": spark_calib},
        "queries": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
