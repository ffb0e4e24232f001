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


# Queries the per-round driver verify has not yet recorded a green row
# for (it samples the first ~50 entries; CORRECTNESS_r01..r06 cover the
# rest). Listed FIRST so this round's window verifies them; every name
# here is already green in tests/test_oracle_parity.py (the identical
# DuckDB compare). Round 7: the new operators plus the queries whose
# implementation changed this round (bucketed vocab rank, quantized
# temperature threshold, generated funnel twin).
_DRIVER_PRIORITY = [
    # new in r7
    "doc_novelty_vs_reference",
    "embedding_rp_recall",
    "dedup_bloom_prefilter",
    "events_hourly_dense",
    "doc_winnow_profile",
    "near_dup_winnow_pairs",
    "purchase_window_event_counts",
    "customer_rfm_segments_hist",
    "funnel_signup_4stage",
    "events_distinct_users_hll_merged",
    "split_contamination_13gram",
    "corpus_zipf_profile",
    "bpe_merge_pair_stats",
    "bpe_train_merges",
    "top_tokens_cms",
    "events_sessionize",
    "embedding_int8_recall",
    "corpus_mixture_schedule",
    # re-verify: implementation or oracle changed in r7
    "vocab_token_ids",
    "corpus_temperature_sample",
    "funnel_view_click_purchase",
    "doc_top_terms_tficf",
    "vocab_top_df",
    "events_distinct_users_hll",
    "customer_rfm_segments",
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
