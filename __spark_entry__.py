"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``tidb_lightning_spark`` (see SURVEY.md §2);
this module only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tidb_lightning_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The per-round driver verify samples the first ~50 entries of
# ``queries()``, so this list rotates the verification window onto the
# STALEST names: every registry query whose most recent green row in
# CORRECTNESS_r01..r08 predates round 7 (1 from r4, 24 from r5, 24 from
# r6 — includes all of TPC-H q2-q22). Round 9 rotation: the r7/r8
# window re-verified the same 50 names twice; these 49 are the rest of
# the registry, all green in tests/test_oracle_parity.py (the identical
# DuckDB compare) and last driver-checked r4-r6. Ordered stalest-first.
_DRIVER_PRIORITY = [
    # implementation changed in r9 (sub-bucketed rank) — re-grade first
    "vocab_token_ids",
    # last driver-verified in r4
    "q21_sole_late_supplier",
    # last driver-verified in r5
    "user_key_set_ops",
    "asof_latest_order_per_event",
    "q6_forecast_revenue",
    "q10_returned_items",
    "events_json_props",
    "q4_order_priority",
    "q12_shipmode_priority",
    "q7_nation_volume",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_or_predicates",
    "q22_idle_balance",
    "events_pivot_by_type",
    "cube_orders_status_priority",
    "quantiles_by_returnflag",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q16_supplier_part_counts",
    "q20_promotion_suppliers",
    # last driver-verified in r6
    "quantiles_by_returnflag_hist",
    "corpus_pack_sequences",
    "cohort_weekly_retention",
    "dedup_incremental_vs_reference",
    "near_dup_simhash_pairs",
    "split_leakage_neardup",
    "event_transition_matrix",
    "events_hourly_anomaly",
    "doclen_quantiles_by_source",
    "embedding_norm_profile",
    "text_scrub",
    "corpus_split_assign",
    "top_bigrams",
    "split_contamination",
    "quality_repetition_filters",
    "quality_top_bigram",
    "domain_quota_sample",
    "dedup_keep_best",
    "corpus_shuffle_buckets",
    "embedding_centroids",
    "corpus_stats_by_source",
    "token_concentration",
    "minhash_calibration",
    "dedup_rate_by_source",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    driver-unverified entries first (see _DRIVER_PRIORITY)."""
    reg = Q.registry()
    ordered = [n for n in _DRIVER_PRIORITY if n in reg] + [
        n for n in reg if n not in _DRIVER_PRIORITY
    ]
    return {name: reg[name].spark for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted -> rows-only)."""
    return {
        name: spec.oracle
        for name, spec in Q.registry().items()
        if spec.oracle is not None
    }
