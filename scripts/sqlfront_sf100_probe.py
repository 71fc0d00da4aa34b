#!/usr/bin/env python
"""SQL front-end third-decade leg (round 9, VERDICT r8 item 5).

The 70-view ``spark.sql`` modality is parity-proven at sf0.001/sf0.01
(tests/test_sql_frontend.py) and volume-rehearsed at sf0.1 -> sf1
(scripts/sqlfront_rehearsal.py), but before r9 no SQL-TEXT query had a
third-decade row: every sf100 probe ran DataFrame-built plans, leaving
one modality x decade cell untested.  This runs the heaviest portable
text -- the q09 analogue (5-way join profit rollup over 600M/6B
lineitems) -- through ``create_views`` + ``spark.sql`` at the derived
sf10 AND sf100 and reports the exponent, closing that cell: if the
view indirection broke pushdown/AQE at scale, the exponent would blow
past the DataFrame path's reading instead of matching it.

Method identical to sf100_probe.py (same 48g heap, best-of-2 per leg,
one JVM, _sweep between runs); output through the bounded hash-reduce
is unnecessary (q09's output is nations x years, ~175 rows).

Usage: python scripts/sqlfront_sf100_probe.py
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

# Import sets SPARK_GRAFT_DRIVER_MEM=48g before any session exists.
from sf100_probe import SF10, SF100, _sweep  # noqa: E402

from etl_onprem_to_cloud_spark.pinned import release_pinned  # noqa: E402
from etl_onprem_to_cloud_spark.plans import execution_metrics  # noqa: E402
from etl_onprem_to_cloud_spark.queries import QUERIES  # noqa: E402
from etl_onprem_to_cloud_spark.session import get_spark  # noqa: E402
from etl_onprem_to_cloud_spark.sqlfront import create_views  # noqa: E402

QUERY = "q09_product_type_profit"
RUNS = int(os.environ.get("SPARK_GRAFT_REHEARSAL_RUNS", "2"))


def main() -> None:
    for d in (SF10, SF100):
        if not os.path.isdir(f"{d}/lineitem.parquet"):
            print(f"# missing derived data at {d}; build first", file=sys.stderr)
            sys.exit(1)

    spark = get_spark(app_name="sqlfront-sf100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sql = QUERIES[QUERY].oracle

    # Warm the JVM on the tiny fixture through the SAME view path.
    create_views(spark, "/root/testdata/sf0.001")
    spark.sql(sql).count()
    release_pinned()
    _sweep(spark)

    results: dict[str, dict[str, float]] = {}
    for label, sf_dir in (("sf10", SF10), ("sf100", SF100)):
        create_views(spark, sf_dir)
        best_t = best_m = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            m = execution_metrics(spark.sql(sql))
            t = time.perf_counter() - t0
            if best_t is None or t < best_t:
                best_t, best_m = t, m
            release_pinned()
            _sweep(spark)
        results[label] = {
            "best_sec": round(best_t, 3),
            "runs": RUNS,
            "spill_bytes": int(best_m["spill_bytes"]),
            "shuffle_bytes": int(best_m["shuffle_bytes_written"]),
        }
        print(f"| {label} | {best_t:.2f} s | spill {best_m['spill_bytes']:,} B |",
              flush=True)

    out: dict[str, object] = {
        "metric": "sqlfront_sf100_probe",
        "query": QUERY,
        "legs": results,
    }
    r = results["sf100"]["best_sec"] / results["sf10"]["best_sec"]
    out["ratio"] = round(r, 3)
    out["exponent"] = round(math.log10(r), 3)
    print(f"# sqlfront {QUERY} exponent: {out['exponent']}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
