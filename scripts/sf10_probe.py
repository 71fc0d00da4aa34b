#!/usr/bin/env python
"""sf10 probe (VERDICT r4 item 8): one more decade for the heaviest
queries.

The sf0.1->sf1 rehearsal is routine; this derives an sf10 (100x the
driver's correctness scale, 10x the rehearsal scale) FROM THE DERIVED
sf1 (same derivation contract as scripts/scale_rehearsal.py -- never
regenerating source data) and measures the sf1->sf10 exponent for just
the top-5 heavies.  Rationale: the Adamic-Adar densification lesson
(README pathology table) -- graph workloads can change REGIME with
volume growth over a fixed catalog, so sub-linear at one decade does
not prove sub-linear at the next.

Second-decade perturbation (keeps workload density realistic instead
of giving every sf1 row 9 exact twins):

- documents: replica j > 0 suffixes every token with ``_s{j}`` --
  composed with sf1's ``_r{i}`` suffix, shingle sets stay disjoint
  across all 100 effective replicas.
- embeddings: replica j applies a deterministic Rademacher sign
  pattern sign(murmur3(dim_index, j)) per component.  Norm-preserving,
  and distinct sign patterns differ in ~half the coordinates, so
  replicas stay mutually far in cosine space (sf1 used rotations;
  composing MORE rotations would collide -- rot_i+j duplicates
  rot_{i'} whenever i+j = i' -- hence the sign-flip family here).
- events / orders / lineitem / customer: key shift j * 100M (sf1 keys
  sit below i*10M + base < 100M).
- dims: copied once -- dimensions do not scale with fact volume.

Usage:
    python scripts/sf10_probe.py           # build (if absent) + probe
    SPARK_GRAFT_SF10_ONLY=a,b python scripts/sf10_probe.py

Prints a markdown table (for README) plus one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.plans import execution_metrics
from etl_onprem_to_cloud_spark.pinned import release_pinned
from etl_onprem_to_cloud_spark.queries import QUERIES
from etl_onprem_to_cloud_spark.session import get_spark

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
REPLICAS = 10
SHIFT = 100_000_000

# The 5 heavies VERDICT r4 item 8 names: iterative graph (3), the full
# IVFPQ index, and the embedding-space dedup closure.
PROBE = [
    "q_bfs_hops_from_hubs",
    "q_ann_ivfpq_topk",
    "q_lpa_communities",
    "q_adamic_adar_linkpred",
    "q_semantic_dedup_clusters",
    # Second tier (r5 extension): everything sharing the two known
    # second-decade failure modes -- co-purchase-graph densification
    # over the FIXED 20k-part catalog (kcore / bellman / modularity /
    # item-item CF pair counts) and banded-LSH candidate growth
    # (star-CC over MinHash pairs, SRP-positive contrastive mining) --
    # plus the two heaviest remaining bench entries (DSIR, star CC).
    "q_kcore_copurchase",
    "q_bellman_ford_cheapest",
    "q_dsir_importance_resampling",
    "q_dedup_clusters_star",
    "q_contrastive_pairs",
    "q_item_item_cf",
    "q_modularity_brand_copurchase",
    # Third tier (r5 extension 2): the MinHash-dedup flagship family
    # (banded signatures over 500k documents -- the same candidate-
    # growth risk class SRP had), the min-label CC twin, the blocked
    # exact-Jaccard and containment paths, the end-to-end prep
    # pipeline, and the remaining ANN/statistics heavies.
    "q_dedup_minhash_lsh",
    "q_ml_minhash_lsh_pairs",
    "q_dedup_clusters",
    "q_dedup_ngram_jaccard_blocked",
    "q_dedup_containment",
    "q_training_data_pipeline",
    "q_kcenter_coreset_sampled",
    "q_ann_pq_adc_topk",
    "q_degree_powerlaw_alpha",
    # Fourth tier (r6 extension, VERDICT r5 item 5): everything >= ~1s
    # at sf0.1 without a probe row -- the pair-enumeration trend
    # estimator (constant-size by construction; probed for form), the
    # exact k-center (bounded collects x k rounds), the PAVA
    # recalibration and exact-rank statistics (single-partition final
    # folds over bounded aggregates), and the sortless exact
    # percentiles (value-partitioned rank counting).
    "q_theilsen_daily_trend",
    "q_kcenter_coreset",
    "q_isotonic_recalibration",
    "q_nb_roc_auc",
    "q_exact_price_percentiles",
    # Fifth tier (r10 extension): one representative per rewrite class
    # from the keyed-aggregate sweep -- the blocked shapes' first
    # decade rows.  RFM (three parallel range-blocked ntiles over the
    # per-customer rollup), Pareto (range-blocked cumulative revenue
    # over per-partkey), association rules (unhinted per-item joins +
    # limit-first top-k), Mann-Whitney (blocked rank cumsum over the
    # growing distinct-value domain), repeated spans (limit-first
    # top-k over the growing span domain).
    "q_rfm_segments",
    "q_abc_pareto_parts",
    "q_association_rules_parts",
    "q_mannwhitney_purchase_view",
    "q_repeated_spans",
]

DIMS = ["region", "nation", "supplier", "part"]
KEY_SHIFTS = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
}


def _replicate(spark, table: str) -> None:
    src = spark.read.parquet(f"{SF1}/{table}.parquet")
    outs = []
    for j in range(REPLICAS):
        rep = src
        if table == "documents":
            rep = rep.withColumn("doc_id", F.col("doc_id") + F.lit(j * SHIFT))
            if j > 0:
                toks = F.filter(F.split(F.col("text"), " +"), lambda t: t != "")
                rep = rep.withColumn(
                    "text",
                    F.concat_ws(
                        " ", F.transform(toks, lambda t: F.concat(t, F.lit(f"_s{j}")))
                    ),
                )
        elif table == "embeddings":
            rep = rep.withColumn("vec_id", F.col("vec_id") + F.lit(j * SHIFT))
            if j > 0:
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, k: F.when(
                            F.pmod(F.hash(k.cast("int"), F.lit(j)), 2) == 0, x
                        ).otherwise(-x),
                    ),
                )
        else:
            for key in KEY_SHIFTS.get(table, []):
                rep = rep.withColumn(key, F.col(key) + F.lit(j * SHIFT))
        outs.append(rep)
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    df.repartition(64).write.mode("overwrite").parquet(f"{SF10}/{table}.parquet")


def build(spark) -> None:
    for t in DIMS:
        spark.read.parquet(f"{SF1}/{t}.parquet").write.mode("overwrite").parquet(
            f"{SF10}/{t}.parquet"
        )
    for t in ["documents", "embeddings", "events", "orders", "lineitem", "customer"]:
        _replicate(spark, t)
        print(f"# built {t}", file=sys.stderr)


def main() -> None:
    probe = PROBE
    only = os.environ.get("SPARK_GRAFT_SF10_ONLY")
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        probe = [n for n in probe if n in wanted]

    if not os.path.isdir(f"{SF1}/lineitem.parquet"):
        print(f"# sf1 missing at {SF1}; run scripts/scale_rehearsal.py first",
              file=sys.stderr)
        sys.exit(1)

    spark = get_spark(app_name="sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{SF10}/lineitem.parquet"):
        print(f"# building derived sf10 at {SF10}", file=sys.stderr)
        build(spark)

    # Warm at sf0.001 (JIT/codegen), then best-of-N both legs, same
    # methodology as scale_rehearsal.py.
    warm = "/root/testdata/sf0.001"
    for name in probe:
        QUERIES[name].fn(spark, warm).count()
    release_pinned()

    runs = int(os.environ.get("SPARK_GRAFT_REHEARSAL_RUNS", "2"))
    results: dict[str, dict[str, float]] = {}
    print("| query | sf1 (s) | sf10 (s) | ratio | exponent | sf10 spill |")
    print("|---|---|---|---|---|---|")
    for name in probe:
        fn = QUERIES[name].fn

        def timed_metrics(sf_dir):
            t0 = time.perf_counter()
            m = execution_metrics(fn(spark, sf_dir))
            return time.perf_counter() - t0, m

        t1 = min(timed_metrics(SF1)[0] for _ in range(runs))
        release_pinned()
        t10, m = min(
            (timed_metrics(SF10) for _ in range(runs)), key=lambda r: r[0]
        )
        release_pinned()
        exp = math.log10(t10 / t1)
        results[name] = {
            "t_sf1": round(t1, 3),
            "t_sf10": round(t10, 3),
            "exponent": round(exp, 3),
            "sf10_spill_bytes": int(m["spill_bytes"]),
            "sf10_shuffle_bytes": int(m["shuffle_bytes_written"]),
        }
        flag = " **SUPER-LINEAR**" if exp > 1.0 else ""
        print(
            f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.2f}x | "
            f"{exp:.2f}{flag} | {m['spill_bytes']:,} B |"
        )
    print(json.dumps({"metric": "sf10_probe", "sf_ratio": 10, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
