#!/usr/bin/env python
"""Capture .explain('formatted') for named registry queries.

Usage: python plans/r13/capture_plans.py before q1_pricing_summary bpe_train_merges ...
Writes plans/r13/<query>_<tag>.txt. Eager entries (BPE trainers,
streaming_cdc_replay) EXECUTE inside the registry call; for those the
captured plan is the returned DataFrame's (the final stage), which is
still the artifact the plan-shape claims reference.
"""
from __future__ import annotations

import io
import os
import sys

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
sys.path.insert(0, repo)

from tidb_lightning_spark.plans import queries as Q  # noqa: E402
from tidb_lightning_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tls-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    for name in names:
        spec = reg[name]
        df = spec.spark(spark, sf_dir)
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(here, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
