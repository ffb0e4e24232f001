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
# STALEST names — THE RULE (permanent, r9 verdict item 4): each round,
# set this to every registry query NOT green in the PREVIOUS round's
# CORRECTNESS_r{N}.json (i.e. the names whose latest driver check is
# two rounds old), stalest first, prepending anything whose
# implementation changed this round. The union of any two consecutive
# rounds then covers the full registry with no entry older than one
# round. Current window (r11): the 14 new/changed r11 entries first,
# then the 15 r8-vintage names the r10 verdict called out, then 25 of
# the 50 r9-vintage names — all green in tests/test_oracle_parity.py
# (the identical DuckDB compare). The remaining ~25 r9-vintage names
# rotate in at r12; with a 126-entry registry the rule is "new first,
# then stalest", the right priority order.
_DRIVER_PRIORITY = [
    # r11 NEW or CHANGED this round — grade first (kn_bigram_lm was
    # the r10 red row, now integer-exact; weighted_sample_ares moved
    # to the 20-bit exhaustively-proven ln ladder; bpe_train_merges
    # refactored for the sampled twin)
    "streaming_cdc_replay",
    "kn_bigram_lm",
    "weighted_sample_ares",
    "bpe_train_merges_sampled",
    "pmi_top_pairs",
    "kmv_distinct_setops",
    "pii_scrub_stats",
    "bpe_fertility_by_source",
    "langid_trigram_vote",
    "containment_join_pairs",
    "doc_chunk_windows",
    "hard_negative_mining",
    "attribution_position_based",
    "bpe_train_merges",
    # the 15 r8-vintage entries (r10 verdict item 3): stalest in the
    # registry — no driver check since r8
    "ngram_jaccard_vs_first_doc",
    "purchase_window_event_counts",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "rollup_events_daily",
    "sessionize_events",
    "simhash_documents",
    "split_contamination_13gram",
    "text_analysis",
    "text_token_stats",
    "top_orders",
    "top_tokens_cms",
    "vocab_top_df",
    "window_user_events",
    # r9-vintage fill for the rest of the ~50-slot window; the
    # remainder of the r9 cohort rotates in next round
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
    "quantiles_by_returnflag_hist",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q16_supplier_part_counts",
    "q20_promotion_suppliers",
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
