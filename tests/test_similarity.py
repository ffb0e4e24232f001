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
