"""ANN scale paths vs the exact baseline: IVF with full probing must equal
brute force exactly; partial probing must keep reasonable recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_lightning_spark.functions.similarity import (
    knn_ivf,
    train_ivf_centroids,
)
from tidb_lightning_spark.plans import queries as Q

from .conftest import SF_CORRECTNESS

K = 5
QUERIES = lambda c: c < 10  # noqa: E731


def _pairs(df):
    return {(r["query_id"], r["rank"]): r["neighbor_id"] for r in df.collect()}


def _neighbors(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_full_probe_equals_bruteforce(spark):
    e = Q.load(spark, SF_CORRECTNESS, "embeddings")
    exact = Q.registry()["knn_cosine_bruteforce"].spark(spark, SF_CORRECTNESS)
    ivf = knn_ivf(
        e, "vec_id", "embedding", QUERIES, k=K, n_lists=8, n_probe=8
    )
    assert _pairs(ivf) == _pairs(exact)


def test_ivf_partial_probe_recall(spark):
    e = Q.load(spark, SF_CORRECTNESS, "embeddings")
    exact = _neighbors(
        Q.registry()["knn_cosine_bruteforce"].spark(spark, SF_CORRECTNESS)
    )
    approx = _neighbors(
        knn_ivf(e, "vec_id", "embedding", QUERIES, k=K, n_lists=8, n_probe=3)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_ivf_training_deterministic(spark):
    e = Q.load(spark, SF_CORRECTNESS, "embeddings")
    c1 = train_ivf_centroids(e, "vec_id", "embedding", n_lists=4, iters=1)
    c2 = train_ivf_centroids(
        e.repartition(7), "vec_id", "embedding", n_lists=4, iters=1
    )
    assert len(c1) == 4
    for a, b in zip(c1, c2):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))


def test_allpairs_block_count_invariance(spark):
    """The blocked all-pairs top-k is exact: the result is identical (bit
    for bit) whatever the block count — blocking changes placement only."""
    from tidb_lightning_spark.functions.similarity import allpairs_cosine_topk

    e = Q.load(spark, SF_CORRECTNESS, "embeddings")
    one = allpairs_cosine_topk(e, "vec_id", "embedding", k=15, n_blocks=1)
    many = allpairs_cosine_topk(e, "vec_id", "embedding", k=15, n_blocks=5)
    rows1 = [tuple(r) for r in one.collect()]
    rows5 = [tuple(r) for r in many.collect()]
    assert rows1 == rows5
    assert len(rows1) == 15


# ---------------------------------------------------------------------------
# Recall harness for the registry's ANN scale paths (r4 verdict item 2):
# the driver's CORRECTNESS gate can't hash-match approximate results, so
# these tests are the correctness signal for knn_cosine_lsh / knn_cosine_ivf.
# Everything is deterministic (md5-derived planes/seeds, no RNG), so the
# measured recalls are exact constants on the fixture corpus; the floors
# leave margin only for fixture regeneration.
# ---------------------------------------------------------------------------


def _recall(exact, approx):
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    return hits / total


def test_registry_lsh_recall_floor(spark):
    """knn_cosine_lsh exactly as registered (3 planes x 12 tables):
    measured recall@5 = 0.98 vs brute force; floor 0.8. A bucket-sign or
    table-seeding bug collapses this to ~0 and fails loudly."""
    exact = _neighbors(
        Q.registry()["knn_cosine_bruteforce"].spark(spark, SF_CORRECTNESS)
    )
    approx = _neighbors(
        Q.registry()["knn_cosine_lsh"].spark(spark, SF_CORRECTNESS)
    )
    r = _recall(exact, approx)
    assert r >= 0.8, f"LSH recall@5 regressed: {r:.2f} < 0.8"


def test_registry_ivf_recall_floor(spark):
    """knn_cosine_ivf exactly as registered (8 lists, 3 probed):
    measured recall@5 = 0.78 on the fixture; floor 0.6."""
    exact = _neighbors(
        Q.registry()["knn_cosine_bruteforce"].spark(spark, SF_CORRECTNESS)
    )
    approx = _neighbors(
        Q.registry()["knn_cosine_ivf"].spark(spark, SF_CORRECTNESS)
    )
    r = _recall(exact, approx)
    assert r >= 0.6, f"IVF recall@5 regressed: {r:.2f} < 0.6"


def test_lsh_zero_planes_degenerates_to_bruteforce(spark):
    """n_planes=0 puts every row in one bucket per table => the candidate
    set is the whole corpus and LSH must EQUAL brute force bit-for-bit
    (ranks, ids, rounded cosines) — the analog of IVF's full-probe test."""
    from tidb_lightning_spark.functions.similarity import knn_lsh

    e = Q.load(spark, SF_CORRECTNESS, "embeddings")
    exact = Q.registry()["knn_cosine_bruteforce"].spark(spark, SF_CORRECTNESS)
    degen = knn_lsh(
        e, "vec_id", "embedding", QUERIES, dim=64, k=K,
        n_planes=0, n_tables=3,
    )
    assert _pairs(degen) == _pairs(exact)
    got = {
        (r["query_id"], r["rank"]): r["cosine"] for r in degen.collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["cosine"] for r in exact.collect()
    }
    assert got == want


def test_numpy_bucket_attach_matches_catalyst_spec(spark):
    """attach_buckets_df (the Arrow fast path) must reproduce the
    bucket_expr Catalyst fold bit-for-bit — sign flips would silently
    change candidate sets while both the query and its oracle agreed."""
    from pyspark.sql import functions as F

    from tidb_lightning_spark.functions.similarity import (
        attach_buckets_df,
        bucket_expr,
    )

    e = Q.load(spark, SF_CORRECTNESS, "embeddings").limit(200)
    dim = 64
    fast = {
        (r["_id"], r["_t"]): r["_b"]
        for r in attach_buckets_df(
            e, "vec_id", "embedding", dim, n_planes=3, n_tables=4
        ).collect()
    }
    vec = F.transform("embedding", lambda x: x.cast("double"))
    spec_cols = [
        bucket_expr(vec, dim, 3, table=t).alias(f"b{t}") for t in range(4)
    ]
    for r in e.select(F.col("vec_id"), *spec_cols).collect():
        for t in range(4):
            assert fast[(r["vec_id"], t)] == r[f"b{t}"], (
                f"bucket mismatch vec {r['vec_id']} table {t}"
            )


def test_lsh_near_dup_pairs_string_ids(spark):
    """attach_buckets_df's id-type-agnostic contract must extend to the
    pair scorer: string doc ids flow through the Arrow boundary and the
    pair orientation uses the same lexicographic < as a Spark plan
    would (r5 advice: the schema was hard-coded `a long, b long`)."""
    from tidb_lightning_spark.functions.similarity import lsh_near_dup_pairs

    e = (
        Q.load(spark, SF_CORRECTNESS, "embeddings")
        .limit(80)
        .select(
            F.concat(F.lit("doc-"), F.lpad(F.col("vec_id"), 5, "0")).alias(
                "sid"
            ),
            "embedding",
        )
    )
    got = lsh_near_dup_pairs(e, "sid", "embedding", dim=64, k_top=5).collect()
    assert len(got) > 0
    for r in got:
        assert isinstance(r["a"], str) and r["a"] < r["b"]
