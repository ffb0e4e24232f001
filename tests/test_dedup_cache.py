"""Signature-cache lifetime API of the LSH dedup surface (r4 verdict
item 7): composing callers hold the cache via `signatures=`; derived
plans must REUSE the persisted scan, not silently recompute it."""

from __future__ import annotations

import gc

from pyspark.sql import functions as F

from tidb_lightning_spark.functions.dedup import (
    lsh_candidate_pairs,
    minhash_wide_df,
)
from tidb_lightning_spark.plans import queries as Q

from .conftest import SF_CORRECTNESS


def test_signature_handle_survives_derived_composition(spark):
    """Derive-and-drop composition: with `signatures=` the persisted
    wide-signature scan stays alive (the old GC-tied default released it
    as soon as the un-derived handle was dropped) and the derived plan
    executes against the InMemoryTableScan."""
    d = Q.load(spark, SF_CORRECTNESS, "documents").limit(200)
    sigs = minhash_wide_df(d, "doc_id", "text").persist()
    try:
        derived = (
            lsh_candidate_pairs(d, "doc_id", "text", signatures=sigs)
            .filter(F.col("est_jaccard") >= 0.5)
            .select("a", "b")
        )
        gc.collect()  # would have fired the old finalizer
        assert sigs.is_cached, "caller-owned cache was released"
        plan = derived._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, (
            "derived plan does not reuse the persisted signatures:\n"
            + plan[:2000]
        )
        rows = {(r["a"], r["b"]) for r in derived.collect()}
        # same answer as the self-managed default path
        want = {
            (r["a"], r["b"])
            for r in lsh_candidate_pairs(d, "doc_id", "text")
            .filter(F.col("est_jaccard") >= 0.5)
            .select("a", "b")
            .collect()
        }
        assert rows == want
    finally:
        sigs.unpersist()


def test_default_path_still_self_manages(spark):
    """Without `signatures=` the function persists internally and ties
    the release to the returned handle — kept alive, the cache is used;
    dropped, nothing leaks (finalizer runs without error)."""
    d = Q.load(spark, SF_CORRECTNESS, "documents").limit(100)
    res = lsh_candidate_pairs(d, "doc_id", "text")
    n = res.count()
    assert n >= 0
    del res
    gc.collect()  # finalizer must not raise


def test_identical_plan_refcount_survives_prior_handle_gc(spark):
    """Spark's cache manager is plan-keyed: dropping run #1's handle must
    NOT evict the cache run #2 of the SAME operator just populated (the
    bug made dedup_keep_best recompute its whole propagation lineage,
    measured 17x slower)."""
    from tidb_lightning_spark.functions.dedup import near_dup_clusters

    d = Q.load(spark, SF_CORRECTNESS, "documents").limit(150)
    first = near_dup_clusters(d, "doc_id", "text")
    second = near_dup_clusters(d, "doc_id", "text")
    del first
    gc.collect()  # run #1's finalizer fires; refcount must protect run #2
    cached_plans = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert cached_plans > 0, (
        "prior handle's GC evicted the identical live plan's cache"
    )
    assert second.count() > 0
    del second
    gc.collect()  # last holder: now the cache may be released


def test_composition_survives_parent_gc_without_recompute(spark):
    """A derived plan returned to a caller (join/window on top of
    near_dup_clusters) must stay cheap after the intermediate handles
    are gc'd — the dedup_keep_best composition. Since the CC loop moved
    to eager localCheckpoint, the label plan reads materialized
    checkpoint blocks (an ExistingRDD scan, lineage truncated), which
    the derived plan's JVM references keep alive — the 17x
    recompute-the-whole-loop hazard hold_cache() guarded is gone
    structurally."""
    from tidb_lightning_spark.functions.dedup import near_dup_clusters

    d = Q.load(spark, SF_CORRECTNESS, "documents").limit(150)

    def build():
        labels = near_dup_clusters(d, "doc_id", "text")
        return labels.join(d.select("doc_id", "n_chars"), "doc_id")

    composed = build()  # `labels` local is gone after return
    gc.collect()
    plan = composed._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, (
        "derived plan does not read the checkpointed labels:\n"
        + plan[:2000]
    )
    assert composed.count() > 0
