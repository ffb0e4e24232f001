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
# round. Current window (r10): the 16 NEW r10 operators first, then the
# registry minus CORRECTNESS_r09's 50 — all last driver-checked in r8,
# all green in tests/test_oracle_parity.py (the identical DuckDB
# compare). 16 + 49 > the ~50-slot window, so the ~15 tail names stay
# at r8 vintage until r11 — with a growing registry the two-round union
# can no longer cover everything; the rule degrades to "new first, then
# stalest", which is the right priority order.
_DRIVER_PRIORITY = [
    # new in r10 — grade first
    "weighted_sample_ares",
    "events_trailing_1h",
    "profile_orders",
    "events_grouping_sets",
    "basket_lift_pairs",
    "setjoin_prefix_jaccard",
    "attribution_linear_touch",
    "textrank_keywords",
    "kn_bigram_lm",
    "scd2_user_state",
    "dedup_exact_substrings",
    "semdedup_prune",
    "dsir_importance_select",
    "ccnet_perplexity_buckets",
    "bpe_encode_corpus",
    "bm25_retrieval_topk",
    # registry minus CORRECTNESS_r09 (last checked r8), stalest-first
    "bpe_merge_pair_stats",
    "bpe_train_merges",
    "checksum_lineitem",
    "corpus_clean_pipeline",
    "corpus_mixture_schedule",
    "corpus_temperature_sample",
    "corpus_zipf_profile",
    "customer_rfm_segments",
    "customer_rfm_segments_hist",
    "customers_without_orders",
    "dedup_bloom_prefilter",
    "dedup_exact_documents",
    "doc_novelty_vs_reference",
    "doc_rare_tokens",
    "doc_top_terms_tficf",
    "doc_winnow_profile",
    "embedding_int8_recall",
    "embedding_rp_recall",
    "events_distinct_users_hll",
    "events_distinct_users_hll_merged",
    "events_hourly_dense",
    "events_hourly_rollup",
    "events_sessionize",
    "funnel_signup_4stage",
    "funnel_view_click_purchase",
    "knn_cosine_bruteforce",
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "minhash_signatures",
    "near_dup_clusters",
    "near_dup_embeddings",
    "near_dup_embeddings_lsh",
    "near_dup_minhash_lsh",
    "near_dup_winnow_pairs",
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
