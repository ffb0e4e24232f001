"""Z-order clustering: multi-dimensional min/max pruning.

A PK-sorted layout prunes on the leading key only; the Z-order layout
must let parquet footer min/max prune on EVERY clustered column. The
test measures real per-file footers, not plan text."""

from __future__ import annotations

from .conftest import slow_soak

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tidb_lightning_spark.sinks.files_sink import FilesSink, write_zordered


def _overlap_fraction(table_dir: str, col: str, lo: float, hi: float) -> float:
    """Fraction of data files whose [min,max] for `col` intersects
    [lo, hi] — the files a min/max-pruning scan must read."""
    files = sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
    assert files
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        fmin = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        if fmax >= lo and fmin <= hi:
            hit += 1
    return hit / len(files)


@slow_soak
def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    n = 200_000
    df = spark.range(n).select(
        # two independent pseudo-uniform dimensions
        (F.xxhash64(F.col("id")) % 100_000).alias("x"),
        (F.xxhash64(F.col("id"), F.lit(1)) % 100_000).alias("y"),
        F.col("id").alias("payload"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"), "payload")

    wh = str(tmp_path / "wh")
    sink = FilesSink(wh)
    # force ~16 files regardless of byte size so pruning is measurable
    write_zordered(
        sink, df, "z", "t", ["x", "y"], source_bytes=16 * 96 * 1024 * 1024
    )
    zdir = sink.table_path("z", "t")
    assert len(glob.glob(os.path.join(zdir, "*.parquet"))) >= 8

    # baseline: the same data sorted by x only
    sink.write_table(
        df, "z", "xsorted", sort_columns=["x"],
        source_bytes=16 * 96 * 1024 * 1024,
    )
    xdir = sink.table_path("z", "xsorted")

    # a 10%-selective band on each dimension
    for col in ("x", "y"):
        z_frac = _overlap_fraction(zdir, col, 40_000, 50_000)
        assert z_frac < 0.8, (
            f"z-order failed to prune on {col}: {z_frac:.2f} of files hit"
        )
    # the x-sorted layout prunes x but reads ~everything for y
    assert _overlap_fraction(xdir, "x", 40_000, 50_000) < 0.5
    assert _overlap_fraction(xdir, "y", 40_000, 50_000) > 0.9

    # correctness: layout only — same rows
    zrows = spark.read.parquet(zdir).count()
    assert zrows == n
