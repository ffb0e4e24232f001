#!/usr/bin/env python
"""Construct/exec decomposition for registry queries: time the registry
call (driver-side plan building + eager collects) separately from the
noop-sink execution, 3 reps each, same session discipline as bench.py.

Usage: python plans/r13/decompose.py LABEL q1 q2 ...
Appends one JSON line per query to /tmp/decompose_r13.jsonl.
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


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark(app_name=f"tls-decompose-{label}")
    spark.sparkContext.setLogLevel("ERROR")
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
    out = open("/tmp/decompose_r13.jsonl", "a")
    for name in names:
        spec = reg[name]
        spark.sparkContext.setJobDescription(f"decompose:{label}:{name}")
        # untimed warmup
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        cs, es = [], []
        for _ in range(reps):
            t0 = time.time()
            df = spec.spark(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            cs.append(t1 - t0)
            es.append(t2 - t1)
            spark.catalog.clearCache()
        rec = {
            "label": label,
            "query": name,
            "construct": round(statistics.median(cs), 4),
            "exec": round(statistics.median(es), 4),
            "construct_spread": [round(min(cs), 4), round(max(cs), 4)],
            "exec_spread": [round(min(es), 4), round(max(es), 4)],
            "reps": reps,
        }
        print(json.dumps(rec))
        out.write(json.dumps(rec) + "\n")
        out.flush()
    spark.stop()


if __name__ == "__main__":
    main()
