#!/usr/bin/env python
"""sf100 probe (round 6): a THIRD decade for the flagship scale paths.

sf1 -> sf10 caught four regime changes that sf0.1 -> sf1 could not see
(quadratic LSH bucket occupancy, per-candidate vector attach,
mis-broadcast corpus-scaled relations, fixed-hash-space collapse), so
the hit rate justifies one more decade for the queries whose 100 TB
story matters most: the dedup/LSH/ANN family plus the one fixed-catalog
graph densifier.  sf100 = 10 key-shifted replicas of the derived sf10
(~17 GB parquet: 2M vectors / 600M lineitems / 5M documents), built
with a THIRD perturbation family so density stays realistic:

- documents: replica j > 0 suffixes every token with ``_t{j}`` --
  composed with sf1's ``_r{i}`` and sf10's ``_s{j}``, shingle sets
  stay disjoint across all 1000 effective replicas.
- embeddings: replica j applies a Rademacher sign pattern from a hash
  family DISTINCT from sf10's (three-arg murmur3 with a constant salt
  vs sf10's two-arg): the product of two independent Rademacher
  patterns is another Rademacher pattern, and with independent
  families the probability that two composed replicas collide in
  cosine space is ~2^-dim per pair -- negligible at 64 dims.
- events / orders / lineitem / customer: key shift j * 1e9 (sf10 keys
  sit below 1e9).
- dims: copied once -- the catalog does NOT scale, which is exactly
  the densification stress the co-purchase graph row is here for.

Known third-decade boundaries this probe exercises on purpose:
- ml_minhash's adaptive HashingTF crosses numFeatures = 2^31 at ~2.7M
  docs; the 2^30 cap (llm/similarity_ml.py) engages for the first
  time at this scale.
- containment's explicit 4x-parallelism fan-out means incidence rows
  per partition grow linearly with the corpus (~320 MB numpy buffer
  per partition here).

Usage:
    python scripts/sf100_probe.py          # build (if absent) + probe
    SPARK_GRAFT_SF100_ONLY=a,b python scripts/sf100_probe.py
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

# 48g for the third decade: in local mode the ONE driver JVM hosts all
# 32 executor threads' execution + storage memory, and the first 16g
# run died mid-probe -- q_kcore_copurchase's localCheckpoint at the
# sf10 warm leg OOM'd the heap AFTER the sf100 minhash pass had
# already pushed 74 GB through the unified region (GCLocker retries on
# ~256 MB humongous allocations, then Java heap space).  Both probe
# legs (sf10 and sf100) run under the same heap, so the exponent
# ratio stays fair; absolute seconds are not compared to the 8g bench.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
SF100 = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/spark_graft_sf100")
REPLICAS = 10
SHIFT = 1_000_000_000

# Cheapest-first so partial runs still land evidence.
PROBE = [
    # r8 extension: the end-to-end prep pipeline (dedup -> quality
    # gate -> split -> rollup in one plan) -- sub-linear through two
    # decades (0.17, 0.26), and the single row a user asking "does
    # the WHOLE pipeline hold at 100 TB" cares about most -- plus the
    # two judged first-class curation paths with no decade rows yet:
    # benchmark decontamination (corpus n-gram explode semi-joined
    # against the broadcast eval set) and the curation blend
    # (per-source percentile windows).
    "q_training_data_pipeline",
    "q_decontaminate_ngram_overlap",
    "q_curation_blend",
    # r8 extension 2: the event-stream operator family -- as-of join
    # (the custom operator Spark lacks natively), sessionization, and
    # gaps-and-islands -- all window/shuffle-by-user shapes expected
    # linear, none with a decade row before r8.
    "q_asof_join_click_attribution",
    "q_events_user_sessions",
    "q_sessions_gaps_islands",
    # r8 extension 3: the relational OLAP core at 6B lineitems --
    # the scan-agg flagship and the join-heavy group-filter join.
    "q01_pricing_summary",
    "q18_large_volume_customer",
    # r9 extension: the two heaviest queries of the completed tpch2
    # never-broadcast sweep (VERDICT r8 item 1) -- q09 (lineitem x
    # part x supplier x orders x nation profit rollup) and q21
    # (lineitem self-aggregate + orders + supplier).  Their swept
    # plans must hold the third decade the way q18's did after the
    # same fix (1.25 hinted -> 1.04 unhinted).
    "q09_product_type_profit",
    "q21_waiting_supplier",
    # r9 extension 2: q02 after its join-back-to-own-aggregate
    # rewrite (min-over-window on the corpus-width offers stream) --
    # same single-sort stress class as the fixed q21.
    "q02_min_cost_supplier",
    # r9 extension 3: the curriculum ntile after the global-window
    # sweep (blocked_global_ntile -- no single-partition corpus
    # window anywhere in the plan).
    "q_curriculum_shards",
    # r9 extension 4: the exact-cosine ANN baseline (broadcast query
    # rows x streamed corpus) -- the one ANN-family member without a
    # decade row, and a changed query this round (explicit .limit
    # bound on the query side).
    "q_ann_brute_force_topk",
    "q_dedup_minhash_lsh",
    "q_kcore_copurchase",
    "q_ann_ivfpq_topk",
    "q_semantic_dedup_clusters",
    "q_dedup_containment",
    "q_ml_minhash_lsh_pairs",
    # r10 extension: the multimodal decode path -- the one flagship
    # family with no decade row before r10 (VERDICT r9 item 4).  Both
    # are Arrow-batched mapInPandas over the binary column with zero
    # exchanges (plan-shape says embarrassingly parallel; this row is
    # the measurement): the md5 pseudo-decode stub and the real JPEG
    # codec (encode fixture + decode, two chained map stages).
    "q_multimodal_decode_features",
    "q_multimodal_jpeg_decode",
    # r10 extension 2: third-decade rows for the remaining flagship
    # families that had only sf10 evidence -- the iterative star
    # closure (O(log^2 n) rounds; does the round count or per-round
    # cost change regime at 5M docs?), the frontier-only BFS on the
    # DENSIFIED co-purchase graph (dims copied once, so degree grows
    # with SF -- the same densification stress the kcore row holds
    # at 0.76), the in-bucket contrastive-pair verify (history of
    # regime change: 1.38 + 64 GB spill before the in-bucket rewrite),
    # and the DSIR importance resampler (data-mix flagship, bounded
    # 10k-bucket shuffle by construction).
    "q_dedup_clusters_star",
    "q_bfs_hops_from_hubs",
    "q_contrastive_pairs",
    "q_dsir_importance_resampling",
    # r11 extension (VERDICT r10 item 5 names these): third-decade rows
    # for the remaining changed iterative shapes -- min-label CC over
    # minhash pairs, LPA, and the weighted Bellman-Ford relaxation --
    # after the r10/r11 loop restructures (partitioned static-edge
    # checkpoints, shuffle_hash label joins, convergence-fold rounds).
    "q_dedup_clusters",
    "q_lpa_communities",
    "q_bellman_ford_cheapest",
]

#: VERDICT r9 item 1: a fixed 1x-cores initial shuffle width makes
#: per-partition SORT size grow linearly with the corpus, and the
#: external-sort spill is the super-linear term (q21 r9: exponent
#: 1.148 / 21.5 GB spill at the default vs 0.786 / zero spill at the
#: session-prescribed 8x-cores width).  Any query whose DEFAULT-conf
#: sf100 leg spills gets a STANDING second leg at the prescribed conf
#: -- both rows are committed so the frozen anchors stay comparable
#: AND the scale-safe number is evidence, not a one-off control.
def _prescribed_conf() -> dict[str, str]:
    from etl_onprem_to_cloud_spark.session import default_parallelism

    width = 8 * default_parallelism()
    return {
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(width),
    }

# Queries whose OUTPUT is corpus-scaled (a row per session/island):
# execution_metrics materializes via executeCollect, which caps at
# spark.driver.maxResultSize (both failed at ~1 GiB on their first
# sf100 legs -- a harness artifact, not a plan property; a real
# 100 TB run writes such outputs to a sink, never a driver collect).
# These probe through a bounded hash-reduce: a global agg over
# count + sum(hash(all columns)) runs the full underlying plan on the
# same adaptive SQL path but returns ONE row.
CORPUS_OUTPUT = {
    "q_events_user_sessions",
    "q_sessions_gaps_islands",
    # decode outputs are one row per document -- same harness artifact
    # (a real run writes to a sink, never a driver collect).
    "q_multimodal_decode_features",
    "q_multimodal_jpeg_decode",
    # r10 extension 2: star clusters emit a row per doc, BFS a row per
    # reached node, contrastive a row per near-dup pair (density
    # constant by fixture construction => linear in corpus), DSIR a
    # row per resampled doc.
    "q_dedup_clusters_star",
    "q_bfs_hops_from_hubs",
    "q_contrastive_pairs",
    "q_dsir_importance_resampling",
}


def _bounded(df):
    # F.hash throws on MAP-typed columns (ADVICE r8): serialize any
    # column whose type contains a map to its canonical JSON first, so
    # a future CORPUS_OUTPUT query with a map column probes instead of
    # crashing the leg.  All other types hash natively.
    cols = [
        F.to_json(F.col(f.name)) if "map<" in f.dataType.simpleString() else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.hash(*cols)).alias("row_hash"),
    )


DIMS = ["region", "nation", "supplier", "part"]
KEY_SHIFTS = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
}


def _replicate(spark, table: str) -> None:
    src = spark.read.parquet(f"{SF10}/{table}.parquet")
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
                        " ", F.transform(toks, lambda t: F.concat(t, F.lit(f"_t{j}")))
                    ),
                )
        elif table == "embeddings":
            rep = rep.withColumn("vec_id", F.col("vec_id") + F.lit(j * SHIFT))
            if j > 0:
                # Third-arg salt picks a hash family independent of the
                # sf10 derivation's two-arg pattern (see module doc).
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, k: F.when(
                            F.pmod(
                                F.hash(k.cast("int"), F.lit(j), F.lit(100)), 2
                            )
                            == 0,
                            x,
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
    df.repartition(256).write.mode("overwrite").parquet(f"{SF100}/{table}.parquet")


def build(spark) -> None:
    for t in DIMS:
        spark.read.parquet(f"{SF10}/{t}.parquet").write.mode("overwrite").parquet(
            f"{SF100}/{t}.parquet"
        )
    for t in ["documents", "embeddings", "events", "orders", "lineitem", "customer"]:
        _replicate(spark, t)
        print(f"# built {t}", file=sys.stderr)


def _mint(old, extra_conf: dict[str, str] | None = None):
    """Stop ``old`` (dead or alive) and launch a FRESH JVM/session.

    Scraps the Py4J gateway handles so get_spark boots a new JVM with
    the same PYSPARK_SUBMIT_ARGS.  Called between queries, not just on
    failure: one probe query's shuffle + spill files survive in the
    local dirs until its JVM exits (ContextCleaner only removes them
    on GC), and the second 48g run proved the accumulation is fatal --
    minhash's 46 GB of spill was still on disk when containment's
    shuffle write hit ENOSPC, and ml_minhash's sort then could not
    even spill.  A JVM exit between queries returns the disk every
    time; ~10 s startup per query is noise at probe scale.  A fresh
    JVM also can't cascade a prior executor OOM (the 16g run lost 4
    rows through one dead gateway)."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    try:
        old.stop()
    except Exception:
        pass
    SparkContext._active_spark_context = None
    SparkContext._gateway = None
    SparkContext._jvm = None
    SparkSession._instantiatedSession = None
    SparkSession._activeSession = None
    fresh = get_spark(app_name="sf100-probe", extra_conf=extra_conf)
    fresh.sparkContext.setLogLevel("ERROR")
    return fresh


def _sweep(spark) -> None:
    """Return the PREVIOUS timed run's shuffle disk inside one JVM.

    Spark deletes a shuffle's files only after its ShuffleDependency
    is GC'd (ContextCleaner), so best-of-2 legs hold BOTH runs' files
    at once -- containment at sf100 writes ~50 GB of shuffle per leg
    and the overlap ENOSPC'd the box even with per-query JVMs.  After
    the Python-side plan references die, a JVM System.gc() lets the
    cleaner reclaim them; the short sleep gives its async thread time
    to unlink before the next leg starts writing."""
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(5)


def main() -> None:
    probe = PROBE
    only = os.environ.get("SPARK_GRAFT_SF100_ONLY")
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        probe = [n for n in probe if n in wanted]

    if not os.path.isdir(f"{SF10}/lineitem.parquet"):
        print(f"# sf10 missing at {SF10}; run scripts/sf10_probe.py first",
              file=sys.stderr)
        sys.exit(1)

    spark = get_spark(app_name="sf100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{SF100}/lineitem.parquet"):
        print(f"# building derived sf100 at {SF100}", file=sys.stderr)
        build(spark)

    warm = "/root/testdata/sf0.001"
    runs = int(os.environ.get("SPARK_GRAFT_REHEARSAL_RUNS", "2"))
    results: dict[str, dict[str, float]] = {}
    print("| query | sf10 (s) | sf100 (s) | ratio | exponent | sf100 spill |")
    print("|---|---|---|---|---|---|")
    for i, name in enumerate(probe):
        # One JVM per query (see _mint): returns the prior query's
        # shuffle/spill disk and isolates failures.  Both timed legs
        # of a query still share one JVM, so the ratio is fair.
        if i > 0:
            spark = _mint(spark)
        base_fn = QUERIES[name].fn
        if name in CORPUS_OUTPUT:
            def fn(spark, sf_dir, _f=base_fn):
                return _bounded(_f(spark, sf_dir))
        else:
            fn = base_fn

        def timed_metrics(sf_dir):
            t0 = time.perf_counter()
            m = execution_metrics(fn(spark, sf_dir))
            return time.perf_counter() - t0, m

        # One query's scale failure is a FINDING, not a reason to lose
        # the rest of the probe (the first run lost 3 rows to the
        # IVFPQ fit-cap ValueError).
        def best_of(sf_dir):
            best_t = best_m = None
            for _ in range(runs):
                t, m = timed_metrics(sf_dir)
                if best_t is None or t < best_t:
                    best_t, best_m = t, m
                release_pinned()
                _sweep(spark)  # drop this leg's shuffle files first
            return best_t, best_m

        try:
            fn(spark, warm).count()  # warm this query's fresh JVM
            release_pinned()
            t10, _ = best_of(SF10)
            t100, m = best_of(SF100)
        except Exception as e:  # noqa: BLE001 - report and continue
            release_pinned()
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"| {name} | — | FAILED | — | — | {e} |", flush=True)
            continue
        release_pinned()
        exp = math.log10(t100 / t10)
        results[name] = {
            "t_sf10": round(t10, 3),
            "t_sf100": round(t100, 3),
            "exponent": round(exp, 3),
            "sf100_spill_bytes": int(m["spill_bytes"]),
            "sf100_shuffle_bytes": int(m["shuffle_bytes_written"]),
        }
        flag = " **SUPER-LINEAR**" if exp > 1.0 else ""
        print(
            f"| {name} | {t10:.2f} | {t100:.2f} | {t100 / t10:.2f}x | "
            f"{exp:.2f}{flag} | {m['spill_bytes']:,} B |",
            flush=True,
        )
        if m["spill_bytes"] > 0:
            # Standing prescribed-conf leg (module doc above the PROBE
            # list): fresh JVM at the 8x-cores initial shuffle width,
            # same warm + best-of discipline, recorded BESIDE the
            # default row.
            conf = _prescribed_conf()
            spark = _mint(spark, extra_conf=conf)
            try:
                fn(spark, warm).count()
                release_pinned()
                p10, _ = best_of(SF10)
                p100, pm = best_of(SF100)
            except Exception as e:  # noqa: BLE001
                release_pinned()
                results[name]["prescribed_conf"] = {
                    "error": f"{type(e).__name__}: {e}"
                }
                print(f"| {name} [prescribed] | — | FAILED | — | — | {e} |",
                      flush=True)
                continue
            release_pinned()
            pexp = math.log10(p100 / p10)
            width = list(conf.values())[0]
            results[name]["prescribed_conf"] = {
                "initial_partition_num": int(width),
                "t_sf10": round(p10, 3),
                "t_sf100": round(p100, 3),
                "exponent": round(pexp, 3),
                "sf100_spill_bytes": int(pm["spill_bytes"]),
                "sf100_shuffle_bytes": int(pm["shuffle_bytes_written"]),
            }
            pflag = " **SUPER-LINEAR**" if pexp > 1.0 else ""
            print(
                f"| {name} [prescribed {width}] | {p10:.2f} | {p100:.2f} | "
                f"{p100 / p10:.2f}x | {pexp:.2f}{pflag} | "
                f"{pm['spill_bytes']:,} B |",
                flush=True,
            )
    print(json.dumps({"metric": "sf100_probe", "sf_ratio": 10, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
