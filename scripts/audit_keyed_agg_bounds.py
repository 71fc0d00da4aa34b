#!/usr/bin/env python
"""One-off audit (round 10): which registered queries' broadcast hints /
global windows are 'proved bounded' ONLY by a KEYED Aggregate over a
corpus table -- and WHAT those grouping expressions are.  Feeds the
design of the bounded-domain detector (VERDICT r9 item 3 / ADVICE r9
medium): the r9 walk stops at any Aggregate, so a groupBy on a corpus
key (l_orderkey at sf100 = 1.5B groups) passes vacuously.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_onprem_to_cloud_spark.plans import checks as C
from etl_onprem_to_cloud_spark.queries import QUERIES
from etl_onprem_to_cloud_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def suspect_aggs(root, corpus_tables):
    """Keyed Aggregates on the walk that (a) sit on a corpus path and
    (b) are the node the shipped walk stopped at.  Returns their
    grouping-expression sql strings."""
    out = []
    stack = [root]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name in ("GlobalLimit", "LocalLimit"):
            continue
        if name == "Aggregate":
            try:
                n_keys = node.groupingExpressions().size()
            except Exception:
                n_keys = -1
            if n_keys == 0:
                continue
            # keyed: does its subtree reach a corpus leaf?
            reach = []
            s2 = [node]
            while s2:
                n2 = s2.pop()
                if n2.children().size() == 0:
                    reach.extend(C._leaf_source_names(n2) & corpus_tables)
                ch2 = n2.children()
                for i in range(ch2.size()):
                    s2.append(ch2.apply(i))
            if reach:
                ges = node.groupingExpressions()
                exprs = [ges.apply(i).sql() for i in range(ges.size())]
                out.append((sorted(set(reach)), exprs))
            continue  # shipped walk stopped here; we've recorded it
        if node.children().size() == 0:
            pass
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def collect_roots(df, node_name, pred):
    roots = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.nodeName() == node_name and pred(node):
            roots.append(node.child())
        sq = node.subqueries()
        for i in range(sq.size()):
            stack.append(sq.apply(i))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return roots


def main():
    spark = get_spark(app_name="audit-keyed-agg")
    spark.sparkContext.setLogLevel("ERROR")
    n = 0
    for name, spec in QUERIES.items():
        try:
            df = spec.fn(spark, SF)
        except Exception as e:
            print(f"{name}: BUILD-ERR {e}", flush=True)
            continue
        hints = collect_roots(
            df, "ResolvedHint",
            lambda nd: "broadcast" in nd.hints().toString().lower())
        wins = collect_roots(
            df, "Window", lambda nd: nd.partitionSpec().size() == 0)
        rows = []
        for kind, roots in (("hint", hints), ("window", wins)):
            for r in roots:
                for reach, exprs in suspect_aggs(r, C.CORPUS_TABLES):
                    rows.append((kind, reach, exprs))
        if rows:
            n += 1
            print(f"== {name}")
            for kind, reach, exprs in rows:
                short = [e if len(e) < 160 else e[:157] + "..." for e in exprs]
                print(f"   {kind} over agg({reach}) keys={short}", flush=True)
    print(f"\nqueries with keyed-agg-proved bounds: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
