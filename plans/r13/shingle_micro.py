#!/usr/bin/env python
"""Micro-benchmark: inline shingles(text) (tokens() re-evaluated inside
the gram lambda) vs shingled_rows (tokens materialized as a bound
column first). Single scan task at sf0.1 (documents.parquet is one
split), so the numbers are PER-TASK compute — the honest unit for a
CPU-bound codegen-boundary fix that 32-way parallelism hides at sf0.1.

Measured 2026-08-17 (3 interleaved warm reps, one JVM):
    rep0: inline 12.32s  materialized 0.51s
    rep1: inline 10.97s  materialized 0.50s
    rep2: inline 11.26s  materialized 0.40s
~22x per-task: the inline tokens() expression sits inside the
higher-order-function lambda, outside codegen's common-subexpression
elimination, so the regex tokenizer re-ran 3x per shingle element
(O(tokens * chars) per doc) — the same mechanism as the r12 langid
finding, at the shingle kernel shared by the MinHash family, setjoin
and containment.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from tidb_lightning_spark.functions.dedup import (  # noqa: E402
    shingled_rows,
    shingles,
)
from tidb_lightning_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="shingle-micro")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    ).select("doc_id", "text")

    def t(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    inline = d.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("s")
    )
    mat = shingled_rows(d, "doc_id", "text")
    t(inline)
    t(mat)
    for rep in range(3):
        a = t(inline)
        b = t(mat)
        print(f"rep{rep}: inline {a:.2f}s  materialized {b:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
