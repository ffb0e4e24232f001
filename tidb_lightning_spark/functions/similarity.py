"""Similarity search over embedding columns.

Brute-force cosine top-k (plans.queries.knn_cosine_bruteforce) is the
correctness baseline; this module adds the scale path: random-hyperplane
LSH bucketing. Buckets come from sign bits of dot products against
hyperplanes derived deterministically from md5 (driver-side constants), so
the plan is pure Catalyst expressions and reproducible across runs.

At 100 TB the corpus is scanned once to attach a bucket id, the self-join
happens per-bucket (candidates share all sign bits), and only candidate
pairs pay the full dot product — the classic recall/cost trade.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 12


def _plane(p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"tls-lsh:{p}:{d}".encode()).digest()
        (u,) = struct.unpack("<Q", h[:8])
        out.append(u / 2**63 - 1.0)  # uniform [-1, 1)
    return out


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def bucket_expr(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Pack sign bits of `n_planes` hyperplane dot products into an int."""
    acc = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(p, dim)])
        acc = acc + F.when(dot(vec, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_filter,
    dim: int,
    k: int = 5,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """ANN top-k: candidates share the full LSH bucket; exact cosine
    re-ranks within the bucket. Returns (query_id, neighbor_id, rank,
    cosine); queries in empty buckets simply return fewer neighbors."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
    ).withColumn("_norm", F.sqrt(dot(F.col("_v"), F.col("_v"))))
    base = base.withColumn("_bucket", bucket_expr(F.col("_v"), dim, n_planes))

    q = base.filter(query_filter(F.col("_id"))).select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
        F.col("_bucket").alias("_qbucket"),
    )
    pairs = base.join(
        F.broadcast(q),
        (F.col("_bucket") == F.col("_qbucket")) & (F.col("_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("_id").alias("neighbor_id"),
        (dot(F.col("_qv"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm"))).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("cosine"))
    )
