#!/usr/bin/env python
"""Print a stable value-hash of a registered query's result at one or
more SF dirs -- the before/after bit-identical gate for implementation
rewrites (same normalization as scripts/check_query.py: columns sorted
by name, rows sorted, repr()-stable value keys, md5 over the whole).

    python scripts/result_hash.py q_dedup_containment /root/testdata/sf0.001 ...
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_onprem_to_cloud_spark.queries import QUERIES  # noqa: E402
from etl_onprem_to_cloud_spark.pinned import release_pinned  # noqa: E402
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


def main() -> int:
    name = sys.argv[1]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.001"]
    spec = QUERIES[name]
    spark = get_spark(app_name="result-hash")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        sdf = spec.fn(spark, sf_dir)
        rows = [tuple(r) for r in sdf.collect()]
        norm, cols = normalize(rows, sdf.columns)
        h = hashlib.md5()
        h.update(repr(cols).encode())
        for r in norm:
            h.update(repr(r).encode())
        print(f"{name} {sf_dir} rows={len(norm)} hash={h.hexdigest()}")
        release_pinned()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
