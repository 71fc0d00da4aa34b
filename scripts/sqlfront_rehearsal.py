#!/usr/bin/env python
"""SQL front-end at volume (VERDICT r5 item 6): the 70 portable oracle
SQL texts are parity-proven at sf0.001/sf0.01 (tests/test_sql_frontend)
and plan-proven to keep pushdown through temp views; this measures the
heaviest of them at sf0.1 AND the derived sf1 so "view indirection does
not break AQE/pushdown at volume" is a number, not an inference.

Method: run every portable text once at sf0.1 through spark.sql over
create_views, take the top N by that timing, then best-of-2 both legs
(sf0.1, sf1) and report the sf0.1->sf1 exponent (log10 ratio) plus
spill -- the same exponent convention as scripts/scale_rehearsal.py.

Usage: python scripts/sqlfront_rehearsal.py   (sf1 must exist; build it
with scripts/scale_rehearsal.py first)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from etl_onprem_to_cloud_spark.plans import execution_metrics  # noqa: E402
from etl_onprem_to_cloud_spark.queries import QUERIES  # noqa: E402
from etl_onprem_to_cloud_spark.session import get_spark  # noqa: E402
from etl_onprem_to_cloud_spark.sqlfront import create_views  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
TOP_N = int(os.environ.get("SPARK_GRAFT_SQLFRONT_TOP", "10"))


def main() -> None:
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests"),
    )
    from test_sql_frontend import SQL_PORTABLE

    if not os.path.isdir(f"{SF1}/lineitem.parquet"):
        print(f"# sf1 missing at {SF1}; run scripts/scale_rehearsal.py first",
              file=sys.stderr)
        sys.exit(1)

    spark = get_spark(app_name="sqlfront-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    # Pass 1: single timed run of every portable text at sf0.1.
    create_views(spark, SF01)
    first: dict[str, float] = {}
    for name in SQL_PORTABLE:
        sql = QUERIES[name].oracle
        t0 = time.perf_counter()
        spark.sql(sql).collect()
        first[name] = time.perf_counter() - t0
    heavies = sorted(first, key=first.get, reverse=True)[:TOP_N]
    print(f"# top {TOP_N} of {len(SQL_PORTABLE)} portable texts at sf0.1",
          file=sys.stderr)

    runs = int(os.environ.get("SPARK_GRAFT_REHEARSAL_RUNS", "2"))
    results: dict[str, dict[str, float]] = {}
    print("| sql text | sf0.1 (s) | sf1 (s) | ratio | exponent | sf1 spill |")
    print("|---|---|---|---|---|---|")
    for name in heavies:
        sql = QUERIES[name].oracle

        def timed(sf_dir):
            create_views(spark, sf_dir)
            t0 = time.perf_counter()
            m = execution_metrics(spark.sql(sql))
            return time.perf_counter() - t0, m

        t01 = min(timed(SF01)[0] for _ in range(runs))
        t1, m = min((timed(SF1) for _ in range(runs)), key=lambda r: r[0])
        exp = math.log10(t1 / t01)
        results[name] = {
            "t_sf01": round(t01, 3),
            "t_sf1": round(t1, 3),
            "exponent": round(exp, 3),
            "sf1_spill_bytes": int(m["spill_bytes"]),
        }
        flag = " **SUPER-LINEAR**" if exp > 1.0 else ""
        print(
            f"| {name} | {t01:.2f} | {t1:.2f} | {t1 / t01:.2f}x | "
            f"{exp:.2f}{flag} | {m['spill_bytes']:,} B |"
        )
    print(json.dumps(
        {"metric": "sqlfront_rehearsal", "sf_ratio": 10, "queries": results}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
