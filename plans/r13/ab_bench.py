#!/usr/bin/env python
"""Targeted A/B timer for registry queries — same methodology as
bench.py's per-query loop (honest timer: full registry call + noop
write; one untimed warmup; median of N reps with clearCache between),
on whatever code is currently importable. Used for before/after pairs
on a quiet box.

Usage: python plans/r13/ab_bench.py LABEL q1 q2 ... [reps via
SPARK_GRAFT_BENCH_REPS, default 3]. Appends one JSON line per query to
/tmp/ab_r13.jsonl.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
sys.path.insert(0, repo)

from tidb_lightning_spark.plans import queries as Q  # noqa: E402
from tidb_lightning_spark.session import get_spark  # noqa: E402


def time_query(spec, spark, sf_dir: str) -> float:
    t0 = time.time()
    df = spec.spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark(app_name=f"tls-ab-{label}")
    spark.sparkContext.setLogLevel("ERROR")
    # same split sizing as bench.py main()
    total_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    split = max(1 * 1024 * 1024, total_bytes // (cpus * 2))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    Q.load(spark, sf_dir, "region").count()
    reg = Q.registry()
    out = open("/tmp/ab_r13.jsonl", "a")
    for name in names:
        spec = reg[name]
        spark.sparkContext.setJobDescription(f"ab:{label}:{name}")
        time_query(spec, spark, sf_dir)  # untimed warmup
        spark.catalog.clearCache()
        ts = []
        for _ in range(reps):
            ts.append(time_query(spec, spark, sf_dir))
            spark.catalog.clearCache()
        rec = {
            "label": label,
            "query": name,
            "median": round(statistics.median(ts), 4),
            "spread": [round(min(ts), 4), round(max(ts), 4)],
            "reps": reps,
        }
        print(json.dumps(rec))
        out.write(json.dumps(rec) + "\n")
        out.flush()
    spark.stop()


if __name__ == "__main__":
    main()
