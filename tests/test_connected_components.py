"""Bounded-round connected components (large-star/small-star).

The r5 verdict's scale caveat: min-label propagation needs one shuffle
round per link of a chain-shaped component — hundreds at PB scale. The
contraction must (a) produce the same min-reachable-id labeling and
(b) converge in O(log^2 n) alternations on the adversarial chain, not
O(diameter)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tidb_lightning_spark.functions.dedup import connected_components


def _uf_labels(n, edges):
    """Reference union-find: id -> min id of its component."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


def _run(spark, n, edges, max_rounds=25):
    nodes = spark.range(n).select(F.col("id"))
    e = spark.createDataFrame(edges, "src long, dst long")
    labels, rounds = connected_components(nodes, e, max_rounds=max_rounds)
    got = {r["id"]: r["cluster_id"] for r in labels.collect()}
    assert got == _uf_labels(n, edges)
    return rounds


def test_chain_converges_in_log_rounds(spark):
    """The adversarial topology: one 200-link chain. Propagation would
    need ~200 rounds; star contraction must stay within ~log2(n)^2
    alternations (and in practice far fewer)."""
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    rounds = _run(spark, n, edges, max_rounds=25)
    bound = int(math.log2(n)) + 2  # measured: 5-6 alternations
    assert rounds <= bound, f"chain took {rounds} rounds (> {bound})"


def test_mixed_components_and_isolates(spark):
    # two stars, one triangle-with-tail, isolated nodes 20..24
    edges = [
        (0, 1), (0, 2), (0, 3),
        (10, 11), (12, 11), (13, 10),
        (5, 6), (6, 7), (7, 5), (7, 8),
    ]
    _run(spark, 25, edges)


def test_duplicate_and_reversed_edges(spark):
    edges = [(1, 0), (0, 1), (1, 0), (2, 1), (3, 3)]
    _run(spark, 5, edges)


def test_empty_edges(spark):
    rounds = _run(spark, 6, [(5, 5)])  # self-loop only -> no real edges
    assert rounds <= 2
