"""SQL front-end parity (VERDICT r4 item 6).

The reference's users wrote ANSI SQL against Athena
(``/root/reference/README.md:184-199``); the rebuild's registry is
DataFrame-first.  This suite proves the same SQL modality works
natively: after ``sqlfront.create_views`` registers the fixture
tables as temp views, the PORTABLE subset of the registry's own
oracle SQL strings -- 70 queries spanning every TPC-H shape plus
windows, rollup/cube/grouping sets, set ops, pivot, subqueries
(scalar/IN/EXISTS), semi/anti/theta/cross joins, sketches, and the
quality report -- runs through ``spark.sql`` UNMODIFIED and matches
DuckDB value-for-value.

(The other ~220 oracles use DuckDB-specific spellings -- recursive or
generated CTEs, ``list()``, ``//`` division, typed literals -- which
is exactly why they are oracles and the Spark side is DataFrame code;
transitive parity for those is tests/test_oracle_parity.py.)

Also asserts the view layer costs nothing: a filter through a temp
view still reaches the parquet scan as a pushed filter.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_onprem_to_cloud_spark.queries import QUERIES
from etl_onprem_to_cloud_spark.schemas import FIXTURE_TABLES
from etl_onprem_to_cloud_spark.sqlfront import create_views

# Every oracle whose SQL text is engine-portable: verified to parse,
# run, and value-match on BOTH engines (scan recorded in SURVEY §8).
SQL_PORTABLE = [
    # TPC-H analogues (all 20 SQL-portable shapes).
    "q01_pricing_summary",
    "q02_min_cost_supplier",
    "q04_late_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_type_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt_by_part",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_heavy_part_suppliers",
    "q21_waiting_supplier",
    "q22_dormant_rich_customers",
    # Joins: star, semi, anti, left, full-outer, theta, cross.
    "q_star_revenue_by_region_year",
    "q_semi_join_active_customers",
    "q_anti_join_dormant_customers",
    "q_left_join_nation_coverage",
    "q_full_outer_join_nation_activity",
    "q_theta_join_price_bands",
    "q_cross_join_region_matrix",
    "q_skew_salted_join",
    "q_bloom_semi_join_reduction",
    # Aggregation: rollup/cube/grouping sets, distinct, approx, pivot,
    # conditional, moments, weighted median, top-k + others.
    "q_rollup_customer_geo",
    "q_cube_order_status_priority",
    "q_grouping_sets_order_dims",
    "q_count_distinct_segments",
    "q_approx_count_distinct",
    "q_pivot_status_by_priority",
    "q_conditional_agg_orders",
    "q_stats_moments_lineitem",
    "q_weighted_median_price",
    "q_topk_nations_with_others",
    "q_skew_salted_agg",
    "q_hll_sketch_rollup",
    # Windows.
    "q_window_rank_orders",
    "q_window_running_sum",
    "q_window_distribution_funcs",
    "q_window_first_last_nth",
    "q_topk_per_group_customer_orders",
    # Set ops / null semantics / case.
    "q_setops_building_vs_finished",
    "q_null_semantics",
    "q_case_when_order_buckets",
    # Subqueries.
    "q_correlated_exists_sql",
    "q_in_subquery_sql",
    "q_scalar_subquery_sql",
    # Scalar function surface.
    "q_math_functions_lineitem",
    "q_map_functions_events",
    # Events / sessionization-adjacent.
    "q_event_type_cooccurrence",
    "q_event_type_transitions",
    "q_events_funnel",
    "q_docs_by_source",
    # Maintenance / quality / layout / privacy.
    "q_data_quality_orders",
    "q_table_diff_orders",
    "q_incremental_rollup_merge",
    "q_zorder_layout_stats",
    "q_zorder_pruning_ratio",
    "q_gdpr_purge_audit",
    "q_quantile_normalize_prices",
    "q_psi_price_drift",
    "q_schema_drift_report",
    "q_subject_access_report",
    "q_scd2_point_in_time_join",
    "q_fifo_cost_matching",
    "q_chi2_type_by_dow",
]


@pytest.fixture(scope="module")
def sql_views(spark, sf_dir):
    return create_views(spark, sf_dir)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalized(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows), sorted(cols)


def test_create_views_registers_all_tables(spark, sql_views):
    assert set(sql_views) == set(FIXTURE_TABLES)
    for t in sql_views:
        assert spark.catalog.tableExists(t)


@pytest.mark.parametrize("name", SQL_PORTABLE)
def test_sql_text_runs_natively(name, spark, sf_dir, sql_views, duck):
    sql = QUERIES[name].oracle
    sdf = spark.sql(sql)
    s_rows, s_cols = _normalized([tuple(r) for r in sdf.collect()], sdf.columns)
    cur = duck.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows, d_cols = _normalized(cur.fetchall(), d_cols)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert s_rows == d_rows, (
        f"{name}: spark.sql over temp views diverges from DuckDB "
        f"({len(s_rows)} vs {len(d_rows)} rows)"
    )


def test_views_keep_filter_pushdown(spark, sf_dir, sql_views):
    """A temp view is a named plan, not a materialization: predicates
    written in SQL must still reach the parquet scan."""
    plan = spark.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan, plan
    # Column pruning: only the two referenced columns in ReadSchema.
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>" in plan, plan
