#!/usr/bin/env python
"""One-off audit (round 10, part 2): MEASURE each suspect keyed
Aggregate's group-count growth between sf0.001 and sf0.01 (10x rows).

A keyed Aggregate bounds a broadcast/global-window subtree only if its
group count does NOT scale with the corpus.  Static analysis cannot
separate `lang` (4 values at any SF) from `token` (Heaps growth) --
both are bare string attributes -- so the separation has to be
measured.  This prints per-(query, agg-keys) group counts at both SFs
and the ratio; ratio ~1 = bounded domain, ratio ~10 = corpus-keyed.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from etl_onprem_to_cloud_spark.plans import checks as C
from etl_onprem_to_cloud_spark.queries import QUERIES
from etl_onprem_to_cloud_spark.session import get_spark

SF_A = os.environ.get("GROWTH_SF_A", "/root/testdata/sf0.001")
SF_B = os.environ.get("GROWTH_SF_B", "/root/testdata/sf0.01")


def suspect_agg_nodes(root, corpus_tables):
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
            reach = set()
            s2 = [node]
            while s2:
                n2 = s2.pop()
                if n2.children().size() == 0:
                    reach |= C._leaf_source_names(n2) & corpus_tables
                ch2 = n2.children()
                for i in range(ch2.size()):
                    s2.append(ch2.apply(i))
            if reach:
                ges = node.groupingExpressions()
                keys = ",".join(ges.apply(i).sql() for i in range(ges.size()))
                out.append((keys, node))
            continue
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def collect_suspects(df):
    res = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        nm = node.nodeName()
        if nm == "ResolvedHint" and "broadcast" in node.hints().toString().lower():
            res += [("hint", k, n) for k, n in
                    suspect_agg_nodes(node.child(), C.CORPUS_TABLES)]
        elif nm == "Window" and node.partitionSpec().size() == 0:
            res += [("window", k, n) for k, n in
                    suspect_agg_nodes(node.child(), C.CORPUS_TABLES)]
        sq = node.subqueries()
        for i in range(sq.size()):
            stack.append(sq.apply(i))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return res


def group_counts(spark, fn, sf):
    df = fn(spark, sf)
    counts = {}
    for kind, keys, node in collect_suspects(df):
        tag = f"{kind}|{keys}"
        if tag in counts:
            continue  # same agg repeated under several roots
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, node)
        counts[tag] = DataFrame(jdf, spark).count()
    return counts


def main():
    spark = get_spark(app_name="audit-keyed-agg-growth")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for name, spec in QUERIES.items():
        try:
            ca = group_counts(spark, spec.fn, SF_A)
            if not ca:
                continue
            cb = group_counts(spark, spec.fn, SF_B)
        except Exception as e:
            print(f"{name}: ERR {type(e).__name__}: {e}", flush=True)
            continue
        for tag, a in ca.items():
            b = cb.get(tag, -1)
            r = (b / a) if a else float("inf")
            report[f"{name}::{tag}"] = (a, b, round(r, 2))
            flag = "  <-- GROWS" if r > 3.0 else ""
            print(f"{name} :: {tag[:90]} : {a} -> {b} (x{r:.2f}){flag}",
                  flush=True)
    grows = {k: v for k, v in report.items() if v[2] > 3.0}
    print(f"\nsuspect aggs: {len(report)}; growing (>3x): {len(grows)}")
    print(json.dumps(sorted({k.split('::')[0] for k in grows})))
    spark.stop()


if __name__ == "__main__":
    main()
