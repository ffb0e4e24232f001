#!/usr/bin/env python
"""Micro-benchmark: token_concentration's old per-distinct-token
double filter over an INLINE tokens() expression vs the r13 run-length
form over a sorted bound column. Single scan task at sf0.1 — per-task
compute, the honest unit for a codegen-CSE-boundary fix that 32-way
parallelism hides in query wall-clock at this SF.

Measured 2026-08-18 (3 interleaved warm reps, one JVM):
    rep0: old 4.75s  new 0.54s
    rep1: old 4.86s  new 0.63s
    rep2: old 5.11s  new 0.71s
~8x per-task. Mechanism: `size(filter(t, x == dd))` evaluated twice
per DISTINCT token with t inline re-ran the regex split + a full array
scan 2x per distinct token (O(n_distinct * (chars + n)) per doc); run
lengths over sort_array(t) compute the same sum of squared counts in
O(n log n) with ONE tokenization.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from tidb_lightning_spark.functions import text as TX  # noqa: E402
from tidb_lightning_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="tc-micro")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    ).select("doc_id", "text")

    t = TX.tokens(F.lower(F.col("text")))
    n = F.size(t)
    ss_old = F.aggregate(
        F.transform(
            F.array_distinct(t),
            lambda dd: F.size(F.filter(t, lambda x: x == dd)).cast(
                "long"
            )
            * F.size(F.filter(t, lambda x: x == dd)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    old = d.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        F.when(n <= 0, F.lit(0.0))
        .otherwise(
            ss_old.cast("double") / (n.cast("double") * n.cast("double"))
        )
        .alias("c"),
    )

    base = d.select(
        "doc_id",
        F.sort_array(TX.tokens(F.lower(F.col("text")))).alias("_st"),
    )
    st = F.col("_st")
    n2 = F.size(st)
    ends = F.filter(
        F.sequence(F.lit(1), F.greatest(n2, F.lit(1))),
        lambda i: (i == n2)
        | (F.try_element_at(st, i) != F.try_element_at(st, i + 1)),
    )
    ss_new = F.aggregate(
        ends,
        F.struct(F.lit(0).alias("p"), F.lit(0).cast("long").alias("s")),
        lambda acc, x: F.struct(
            x.alias("p"),
            (
                acc["s"]
                + (x - acc["p"]).cast("long")
                * (x - acc["p"]).cast("long")
            ).alias("s"),
        ),
        lambda acc: acc["s"],
    )
    new = base.select(
        "doc_id",
        n2.cast("int").alias("n_tokens"),
        F.when(n2 <= 0, F.lit(0.0))
        .otherwise(
            ss_new.cast("double")
            / (n2.cast("double") * n2.cast("double"))
        )
        .alias("c"),
    )

    def t_(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    t_(old)
    t_(new)
    for r in range(3):
        print(f"rep{r}: old {t_(old):.2f}s  new {t_(new):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
