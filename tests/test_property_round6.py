"""Property-based checks for round-6 machinery.

- connected_components must equal a union-find reference on arbitrary
  small graphs (duplicate edges, self-loops, isolates included).
- the histogram-quantile estimator must land within one bucket width of
  the exact interpolated percentile for arbitrary value multisets.

Example counts are capped: each example runs Spark jobs."""

from __future__ import annotations

from .conftest import slow_soak

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tidb_lightning_spark.functions.dedup import connected_components
from tidb_lightning_spark.plans.queries import _hist_quantiles

N_NODES = 16


def _uf(n, edges):
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


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, N_NODES - 1), st.integers(0, N_NODES - 1)
        ),
        max_size=30,
    )
)
@slow_soak
def test_connected_components_matches_union_find(spark, edges):
    nodes = spark.range(N_NODES).select("id")
    e = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    labels, _ = connected_components(nodes, e, max_rounds=20)
    got = {r["id"]: r["cluster_id"] for r in labels.collect()}
    assert got == _uf(N_NODES, edges)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=0.0, max_value=1000.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=3,
        max_size=80,
    )
)
def test_hist_quantiles_within_one_bucket(spark, values):
    scale = 8.0  # bucket width
    df = spark.createDataFrame([(v,) for v in values], "v double").select(
        F.lit("g").alias("k"), "v"
    )
    row = _hist_quantiles(
        df, "k", "v", scale, invert=True,
        targets={"q50": 0.5, "q90": 0.9},
    ).collect()[0]
    # the estimator's guarantee is vs the rank-ceil(p*n) ORDER STATISTIC
    # (the bucket midpoint of the bucket containing it): an INTERPOLATED
    # percentile can sit arbitrarily far inside a sparse gap between two
    # order statistics, which no histogram can bound (hypothesis found
    # [0, 0, 24]: quantile_cont(0.9)=19.2 vs order statistic 24)
    import math

    sv = sorted(values)
    for name, p in (("q50", 0.5), ("q90", 0.9)):
        k = max(1, math.ceil(p * len(sv)))
        assert abs(row[name] - sv[k - 1]) <= scale / 2, (
            name, row[name], sv[k - 1], values,
        )
    assert row["n"] == len(values)
