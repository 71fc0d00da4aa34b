#!/usr/bin/env python
"""100x-rehearsal harness (VERDICT r2 item 8): measure how the headline
queries scale from sf0.1 to a derived sf1 (10x rows) and report the
per-query scaling exponent.

The sf1 input is DERIVED from the driver's sf0.1 parquet (never
regenerated from scratch -- TESTDATA.md forbids that): 10 replicas,
each with shifted surrogate keys, and with content PERTURBED so that
near-duplicate density stays constant instead of every row gaining 9
exact twins:

- documents: replica i > 0 suffixes every token with ``_r{i}`` --
  shingle sets across replicas are disjoint, so dedup workload per
  replica matches the original corpus (10 independent shards, which is
  what a real 10x corpus looks like), not a pathological
  10-copies-of-everything corpus.
- embeddings: replica i rotates the vector left by i components --
  norm-preserving, and rotations of high-dimensional random vectors
  are ~orthogonal, so SRP/ANN bucket occupancy per vector stays
  realistic.
- events / orders / lineitem / customer: key shift only (the
  workload there is keyed aggregation, where duplicate *content* is
  irrelevant).
- dims (region nation supplier part): copied once -- dimension tables
  do not scale with fact volume.

Usage:
    python scripts/scale_rehearsal.py            # build (if absent) + time
    SPARK_GRAFT_SF1_DIR=/tmp/my_sf1 python scripts/scale_rehearsal.py

Prints a markdown table (for PLANS.md) plus one JSON line with
{query: {"t_sf01": s, "t_sf1": s, "exponent": e}}; exponent =
log10(t_sf1 / t_sf01), so 1.0 = perfectly linear in data volume,
< 1 = fixed overhead amortizing away, > 1 = super-linear (flag).
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

# sf1 broadcast builds OOM'd the 1g default and want more headroom
# than the 8g bench sweet spot (see session.get_spark docstring).
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPLICAS = 10
SHIFT = 10_000_000

# The 10 most expensive bench queries + one relational and one
# sessionization representative.
REHEARSAL = [
    "q_srp_near_dup_pairs",
    "q_dedup_clusters_star",
    "q_dedup_clusters",
    "q_dedup_ngram_jaccard_blocked",
    "q_dedup_minhash_lsh",
    "q_ml_minhash_lsh_pairs",
    "q_dedup_containment",
    "q_training_data_pipeline",
    "q_ewma_user_values",
    "q_embedding_outliers",
    "q01_pricing_summary",
    "q_events_user_sessions",
    # Relational heavy legs (fact-fact joins + star + windows).
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q08_market_share",
    "q18_large_volume_customer",
    "q_topk_per_group_customer_orders",
    # Round-3 additions.
    "q_semantic_dedup_clusters",
    "q_embedding_quantize_int8",
    "q_vocab_coverage",
    "q_multimodal_ppm_decode",
    # Round-3 curation additions.
    "q_dedup_chunk_rewrite",
    "q_knn_label_vote",
    "q_events_value_outliers_mad",
    "q_lang_rebalance",
    "q_bm25_search",
    "q_resample_hourly_lerp",
    "q_skew_salted_join",
    # Round-3 batch 2/3 additions (mining.py).
    "q_data_quality_orders",
    "q_textrank_tokens",
    "q_bpe_pair_merges",
    "q_ngram_novelty",
    "q_sparse_tfidf_topk",
    "q_triangle_clustering",
    # Round-3 batch 4/5 additions.
    "q_kcenter_coreset",
    "q_entity_resolution_parts",
    "q_top_session_paths",
    "q_equidepth_global_prices",
    "q_abc_pareto_parts",
    "q_twap_daily_values",
    "q_ohlc_hourly_values",
    "q_ship_latency_percentiles",
    "q_dedup_method_comparison",
    # Round-4 additions: the iterative/learning heavies (Lloyd IVF,
    # k-core peeling, NB classifier, sampled k-center) plus the BRP
    # radius join, grouped quality report, and ACF.
    "q_ann_ivf_topk",
    "q_ml_brp_ann_topk",
    "q_kcenter_coreset_sampled",
    "q_nb_lang_classifier",
    "q_kcore_copurchase",
    "q_acf_hourly_counts",
    "q_quality_monitor_batch",
    "q_scd2_point_in_time_join",
    "q_hierarchy_revenue_rollup",
    "q_multitouch_attribution",
    "q_chunk_sliding_windows",
    "q_mannwhitney_purchase_view",
    "q_js_divergence_sources",
    "q_dedup_events_time_window",
    "q_cohort_ltv_curve",
    "q_retrieval_ndcg_eval",
    "q_contrastive_pairs",
    "q_k_anonymity_audit",
    "q_laspeyres_price_index",
    "q_skew_profile_orders_custkey",
    "q_retrieval_mrr_eval",
    "q_session_bounce_rate",
    "q_freshness_report",
    # r4 batch 3
    "q_multimodal_wav_decode",
    "q_kfold_balance",
    "q_bootstrap_mean_ci",
    "q_curriculum_shards",
    "q_retrieval_rrf_fusion",
    "q_classifier_kappa",
    "q_heaps_vocab_growth",
    "q_ks_drift_purchase_view",
    "q_temporal_split_audit",
    "q_chi2_type_by_dow",
    "q_km_survival_first_purchase",
    "q_item_item_cf",
    "q_association_rules_parts",
    "q_user_recs_topn",
    "q_seasonal_naive_mase",
    "q_wilson_ctr_ranking",
    "q_modularity_brand_copurchase",
    "q_seq_patterns_support",
    "q_peak_concurrent_sessions",
    "q_holt_linear_forecast",
    "q_clamped_balance_users",
    "q_user_daily_streaks",
    "q_markov_stationary_types",
    "q_interarrival_burstiness",
    "q_max_drawdown_users",
    "q_cusum_value_drift",
    "q_ann_pq_adc_topk",
    "q_ann_ivfpq_topk",
    # round-4 batch 6/7 heavies
    "q_proration_largest_remainder",
    "q_fifo_cost_matching",
    "q_nb_calibration_bins",
    "q_dsir_importance_resampling",
    "q_lpa_communities",
    "q_bfs_hops_from_hubs",
    # round-4 batch 8
    "q_neyman_allocation",
    "q_mix_shift_decomposition",
    "q_migration_checksums",
    # round-4 batch 9
    "q_snapshot_diff_cdc",
    "q_adamic_adar_linkpred",
    "q_target_encoding_oof",
    "q_theilsen_daily_trend",
    "q_l_diversity_audit",
    # round-4 batch 10
    "q_isotonic_recalibration",
    "q_nb_roc_auc",
    "q_bellman_ford_cheapest",
    # round-4 batch 11
    "q_croston_intermittent",
    "q_stl_anomaly_days",
    "q_subject_access_report",
    "q_degree_powerlaw_alpha",
    # round-4 batch 12
    "q_exact_price_percentiles",
    "q_fellegi_sunter_linkage",
    # round-4 batch 13
    "q_markov_removal_attribution",
    # round-4 batch 14
    "q_cuped_ab_readout",
    "q_forecast_backtest_horizons",
    # round-4 batch 15
    "q_ab_srm_and_ztest",
    "q_ab_mde_power",
    # round-4 batch 16
    "q_schema_drift_report",
    "q_simpsons_paradox_check",
    "q_safety_stock_parts",
    "q_price_elasticity_brand",
    # round-4 batch 18
    "q_dau_wau_stickiness",
    "q_conversion_latency",
    # round-4 batch 19
    "q_watermark_lateness_audit",
    # round-4 batch 20
    "q_anova_value_by_dow",
    "q_cramers_v_type_dow",
    # round-4 batch 21
    "q_abc_xyz_matrix",
    # round-5: real PNG decode
    "q_multimodal_png_decode",
    # round-6: real baseline-JPEG decode
    "q_multimodal_jpeg_decode",
]

DIMS = ["region", "nation", "supplier", "part"]
KEY_SHIFTS = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
}


def _replicate(spark, table: str) -> None:
    src = spark.read.parquet(f"{SRC}/{table}.parquet")
    outs = []
    for i in range(REPLICAS):
        rep = src
        if table == "documents":
            rep = rep.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
            if i > 0:
                toks = F.filter(F.split(F.col("text"), " +"), lambda t: t != "")
                rep = rep.withColumn(
                    "text",
                    F.concat_ws(
                        " ", F.transform(toks, lambda t: F.concat(t, F.lit(f"_r{i}")))
                    ),
                )
        elif table == "embeddings":
            rep = rep.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
            if i > 0:
                dim = 64
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", i + 1, dim - i),
                        F.slice("embedding", 1, i),
                    ),
                )
        else:
            for k in KEY_SHIFTS.get(table, []):
                rep = rep.withColumn(k, F.col(k) + F.lit(i * SHIFT))
        outs.append(rep)
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    df.repartition(32).write.mode("overwrite").parquet(f"{DST}/{table}.parquet")


def build() -> None:
    spark = get_spark(app_name="scale-rehearsal-build")
    spark.sparkContext.setLogLevel("ERROR")
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    for t in ["documents", "embeddings", "events", "orders", "lineitem", "customer"]:
        _replicate(spark, t)
        print(f"# built {t}", file=sys.stderr)
    spark.stop()


def _timed(action) -> float:
    t0 = time.perf_counter()
    action()
    return time.perf_counter() - t0


def _timed_metrics(action):
    t0 = time.perf_counter()
    m = action()
    return time.perf_counter() - t0, m


def main() -> None:
    global REHEARSAL
    # SPARK_GRAFT_REHEARSAL_ONLY=a,b,c restricts the run (incremental
    # rehearsal of newly added queries without re-timing the full set).
    only = os.environ.get("SPARK_GRAFT_REHEARSAL_ONLY")
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        REHEARSAL = [n for n in REHEARSAL if n in wanted]

    if not os.path.isdir(DST) or not os.path.isdir(f"{DST}/lineitem.parquet"):
        print(f"# building derived sf1 at {DST}", file=sys.stderr)
        build()

    spark = get_spark(app_name="scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm at sf0.001 so JIT/codegen are paid before timing.
    warm = "/root/testdata/sf0.001"
    for name in REHEARSAL:
        try:
            QUERIES[name].fn(spark, warm).count()
        except Exception as e:  # pragma: no cover
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    release_pinned()

    results: dict[str, dict[str, float]] = {}
    print("| query | sf0.1 (s) | sf1 (s) | ratio | exponent | sf1 spill |")
    print("|---|---|---|---|---|---|")
    runs = int(os.environ.get("SPARK_GRAFT_REHEARSAL_RUNS", "2"))
    for name in REHEARSAL:
        fn = QUERIES[name].fn
        # Best-of-N on BOTH legs (same rationale as bench.py): a single
        # host stall on either side swings the exponent by +-0.5 -- a
        # round-2 single-shot run mis-flagged SRP as super-linear (35.6s
        # vs 4.6s best-of-2) and gave star-CC a negative exponent.
        t_small = min(
            _timed(lambda: fn(spark, SRC).count()) for _ in range(runs)
        )
        release_pinned()
        # At sf1, execute through execution_metrics: one job yields both
        # the timing and the spill/shuffle evidence.  Construction stays
        # INSIDE the timer -- the iterative CC queries do their rounds
        # eagerly while the DataFrame is being built.
        t_big, m = min(
            (_timed_metrics(lambda: execution_metrics(fn(spark, DST)))
             for _ in range(runs)),
            key=lambda r: r[0],
        )
        release_pinned()
        ratio = t_big / t_small
        exp = math.log10(ratio)
        results[name] = {
            "t_sf01": round(t_small, 3),
            "t_sf1": round(t_big, 3),
            "exponent": round(exp, 3),
            "sf1_spill_bytes": int(m["spill_bytes"]),
            "sf1_shuffle_bytes": int(m["shuffle_bytes_written"]),
        }
        flag = " **SUPER-LINEAR**" if exp > 1.0 else ""
        print(
            f"| {name} | {t_small:.2f} | {t_big:.2f} | {ratio:.2f}x | "
            f"{exp:.2f}{flag} | {m['spill_bytes']:,} B |"
        )
    print(json.dumps({"metric": "scale_rehearsal", "sf_ratio": 10, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
