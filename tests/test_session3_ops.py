"""Invariant tests for the round-4 session-3 operators.

Oracle parity (tests/test_oracle_parity.py) proves Spark == DuckDB;
these tests prove both are RIGHT: algebraic invariants each operator
must satisfy regardless of engine (checksum layout-invariance, CDC
reconciliation identities, isotonic monotonicity, AUC bounds +
brute-force agreement, percentile ordering/membership, CUPED
mean-preservation, Croston/SBA relation, Fellegi-Sunter score
structure, Bellman-Ford vs BFS consistency).
"""

from __future__ import annotations

import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.queries import QUERIES


def rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_migration_checksums_layout_invariant(spark, sf_dir, tmp_path):
    """The content checksum must not move under repartition/rewrite --
    that is its entire contract as a source-vs-target gate."""
    base = rows(spark, sf_dir, "q_migration_checksums")
    alt = str(tmp_path / "alt_layout")
    os.makedirs(alt)
    for t in ["orders", "customer", "nation"]:
        (
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
            .repartition(7)
            .write.mode("overwrite")
            .parquet(os.path.join(alt, f"{t}.parquet"))
        )
    for t in [
        "region", "supplier", "part", "lineitem", "events",
        "documents", "embeddings",
    ]:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(alt, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    moved = rows(spark, alt, "q_migration_checksums")
    assert [tuple(r) for r in base] == [tuple(r) for r in moved]


def test_cdc_diff_reconciles(spark, sf_dir):
    """I/U/D/N row counts must reconcile exactly with the derived
    snapshot sizes: N+U+D = |old|, N+U+I = |new|."""
    d = {r["action"]: r for r in rows(spark, sf_dir, "q_snapshot_diff_cdc")}
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_old = orders.filter(F.col("o_orderkey") % 97 != 3).count()
    n_new = orders.filter(F.col("o_orderkey") % 89 != 5).count()
    get = lambda a: d[a]["n_rows"] if a in d else 0
    assert get("N") + get("U") + get("D") == n_old
    assert get("N") + get("U") + get("I") == n_new
    # every update is exactly the +100-cent bump
    if "U" in d:
        assert d["U"]["cents_delta"] == 100 * d["U"]["n_rows"]


def test_isotonic_output_is_monotone_and_bounded(spark, sf_dir):
    out = rows(spark, sf_dir, "q_isotonic_recalibration")
    isos = [r["iso_accuracy"] for r in out]
    assert all(0.0 <= v <= 1.0 for v in isos)
    assert isos == sorted(isos), "PAV fit must be non-decreasing in bin"


def test_roc_auc_matches_bruteforce_pairwise(spark, sf_dir):
    """The rank-sum AUC must equal the O(n^2) definition
    P(s_pos > s_neg) + 0.5 P(=) on the small fixture."""
    out = rows(spark, sf_dir, "q_nb_roc_auc")[0]
    from etl_onprem_to_cloud_spark.queries.learn import _nb_scores

    sc = (
        _nb_scores(spark, sf_dir)
        .filter(F.col("c") == "en")
        .select("true_lang", "score")
        .collect()
    )
    pos = [r["score"] for r in sc if r["true_lang"] == "en"]
    neg = [r["score"] for r in sc if r["true_lang"] != "en"]
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    brute = wins / (len(pos) * len(neg))
    assert abs(out["auc"] - brute) < 2e-6
    assert 0.0 <= out["auc"] <= 1.0


def test_exact_percentiles_ordered_and_member(spark, sf_dir):
    out = rows(spark, sf_dir, "q_exact_price_percentiles")[0]
    assert out["p50"] <= out["p90"] <= out["p99"]
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    cents = {
        r[0]
        for r in li.select(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        ).collect()
    }
    for k in ["p50", "p90", "p99"]:
        assert round(out[k] * 100) in cents, f"{k} must be an actual value"


def test_cuped_preserves_pooled_mean_and_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "q_cuped_ab_readout")
    assert len(out) == 2
    r0, r1 = out
    assert 0.0 <= r0["rho2"] <= 1.0
    # sum_a n_a*(mean_adj - mean_raw) = -theta * sum_a n_a*(xbar_a -
    # xbar) = 0 exactly; quantization leaves ~1e-6-per-term slack.
    drift = r0["n_users"] * (r0["mean_y_cuped"] - r0["mean_y"]) + r1[
        "n_users"
    ] * (r1["mean_y_cuped"] - r1["mean_y"])
    tol = 2e-6 * (r0["n_users"] + r1["n_users"])
    assert abs(drift) <= tol


def test_croston_sba_relation_and_positivity(spark, sf_dir):
    out = rows(spark, sf_dir, "q_croston_intermittent")[0]
    assert out["demand_size"] > 0 and out["mean_interval"] >= 1.0
    assert out["croston_forecast"] > 0
    assert abs(out["sba_forecast"] - 0.75 * out["croston_forecast"]) < 2e-6


def test_fellegi_sunter_scores_ranked_and_structured(spark, sf_dir):
    out = rows(spark, sf_dir, "q_fellegi_sunter_linkage")
    scores = [r["fs_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # a full-agreement pattern must outscore any pattern with a
    # disagreement in the same output (log weights: agree > disagree)
    by_pat = {}
    for r in out:
        by_pat.setdefault(r["pattern"], []).append(r["fs_score"])
    if "TNP" in by_pat and len(by_pat) > 1:
        others = [v for p, vs in by_pat.items() if p != "TNP" for v in vs]
        assert min(by_pat["TNP"]) >= max(others)


def test_bellman_ford_consistent_with_bfs_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "q_bellman_ford_cheapest")
    dists = [r["dist"] for r in out]
    assert dists[0] == 0, "the source reaches itself at cost 0"
    assert dists == sorted(dists)
    # every edge cost is 1e6 DIV support <= 500000, and within 4
    # rounds a reached node's cheapest path has <= 4 edges.
    assert all(0 <= d <= 4 * 500_000 for d in dists)


def test_stl_anomaly_output_shape(spark, sf_dir):
    out = rows(spark, sf_dir, "q_stl_anomaly_days")
    assert len(out) == 10
    devs = [abs(r["seasonal_adj_dev"]) for r in out]
    assert devs == sorted(devs, reverse=True)
    assert all(r["is_anomaly"] in (0, 1) for r in out)


def test_subject_access_cohort_is_bounded(spark, sf_dir):
    out = {r["table_name"]: r for r in rows(spark, sf_dir, "q_subject_access_report")}
    assert out["customer"]["n_rows"] <= 500
    for t in ["orders", "lineitem", "events"]:
        assert out[t]["n_subjects"] <= out["customer"]["n_rows"]


def test_anova_components_nonnegative_and_consistent(spark, sf_dir):
    out = rows(spark, sf_dir, "q_anova_value_by_dow")[0]
    assert out["n_groups"] == 7
    assert out["ss_between"] >= 0 and out["ss_within"] > 0
    assert out["f_stat"] >= 0


def test_cramers_v_bounded(spark, sf_dir):
    out = rows(spark, sf_dir, "q_cramers_v_type_dow")[0]
    assert out["chi2"] >= 0
    assert 0.0 <= out["cramers_v"] <= 1.0


def test_srm_chi2_consistent_with_counts(spark, sf_dir):
    out = rows(spark, sf_dir, "q_ab_srm_and_ztest")[0]
    n = out["n0"] + out["n1"]
    dev = out["n0"] - n / 2.0
    expect = dev * dev / (n / 2.0) * 2.0
    assert abs(out["srm_chi2"] - expect) < 2e-6
    assert out["srm_flag"] == (1 if expect > 3.841 else 0)
    assert 0.0 <= out["p0"] <= 1.0 and 0.0 <= out["p1"] <= 1.0


def test_mde_positive_and_scales_with_alpha(spark, sf_dir):
    out = rows(spark, sf_dir, "q_ab_mde_power")[0]
    assert out["mde_abs"] > 0 and out["mde_rel"] > 0
    # relative MDE must be mde_abs / mean (quantization slack)
    assert abs(out["mde_rel"] - out["mde_abs"] / out["mean_y"]) < 1e-4


def test_elasticity_r2_bounded(spark, sf_dir):
    out = rows(spark, sf_dir, "q_price_elasticity_brand")
    assert all(0.0 <= r["r2"] <= 1.0 for r in out)
    assert all(r["n"] >= 30 for r in out)


def test_stickiness_in_unit_interval(spark, sf_dir):
    out = rows(spark, sf_dir, "q_dau_wau_stickiness")
    for r in out:
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["dau"] <= r["wau"]


def test_watermark_percentiles_ordered(spark, sf_dir):
    out = rows(spark, sf_dir, "q_watermark_lateness_audit")[0]
    assert 0 <= out["p50_late_min"] <= out["p95_late_min"] <= out["p99_late_min"]
    assert 0.0 <= out["frac_beyond_1h"] <= 1.0


def test_conversion_latency_ordered(spark, sf_dir):
    out = rows(spark, sf_dir, "q_conversion_latency")[0]
    assert out["n_converted"] > 0
    assert 0 <= out["p50_sec"] <= out["p90_sec"] <= out["p99_sec"]


def test_safety_stock_components(spark, sf_dir):
    out = rows(spark, sf_dir, "q_safety_stock_parts")
    for r in out:
        assert r["safety_stock"] >= 0
        # reorder point = mu*L + SS (quantization slack)
        assert abs(
            r["reorder_point"] - (r["daily_demand"] * 7 + r["safety_stock"])
        ) < 1e-4
