#!/usr/bin/env python
"""Dev loop: run one registered query against its DuckDB oracle and
print the first mismatch (same comparison as tests/test_oracle_parity).

    python scripts/check_query.py q_text_stats [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etl_onprem_to_cloud_spark.queries import QUERIES  # noqa: E402
from etl_onprem_to_cloud_spark.schemas import FIXTURE_TABLES  # noqa: E402
from etl_onprem_to_cloud_spark.session import get_spark  # noqa: E402


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(v):
        if v is None:
            return (0, "")
        if isinstance(v, float):
            return (1, "nan") if math.isnan(v) else (1, repr(v))
        return (1, str(v))

    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda r: [key(v) for v in r]), [columns[i] for i in order]


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if not (isinstance(a, float) and isinstance(b, float)):
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main() -> int:
    names = sys.argv[1:2]
    if not names:
        print("usage: check_query.py <name> [sf_dir]")
        return 2
    name = names[0]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spec = QUERIES[name]

    spark = get_spark(app_name="check-query")
    spark.sparkContext.setLogLevel("ERROR")
    sdf = spec.fn(spark, sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    from etl_onprem_to_cloud_spark.pinned import release_pinned

    release_pinned()

    if spec.oracle is None:
        print(f"{name}: rows-only query, {len(s_rows)} rows, cols={s_cols}")
        return 0

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    o = con.execute(spec.oracle)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        print(f"COLUMN MISMATCH spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return 1
    if len(s_rows) != len(o_rows):
        print(f"ROW COUNT MISMATCH spark={len(s_rows)} oracle={len(o_rows)}")
        return 1
    s_norm, cols = normalize(s_rows, s_cols)
    o_norm, _ = normalize(o_rows, o_cols)
    bad = 0
    for i, (sr, orow) in enumerate(zip(s_norm, o_norm)):
        for c, (sv, ov) in zip(cols, zip(sr, orow)):
            if not values_equal(sv, ov):
                print(f"row {i} col {c}: spark={sv!r} oracle={ov!r}")
                bad += 1
                if bad >= 10:
                    return 1
    print(f"{name}: OK ({len(s_rows)} rows)" if not bad else f"{name}: {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
