"""Streaming HLL == batch HLL, exactly.

Register max is a commutative monoid, so draining the events table
through micro-batches must reproduce the batch sketch's registers_hit
EXACTLY and the estimate to the last integer — the strongest
batch/stream equivalence any approximate operator can offer."""

from __future__ import annotations

import os

import pytest

from tidb_lightning_spark.functions import sketch as SK
from tidb_lightning_spark.streaming import events as S

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("events_hll_stream"))


def _prepare(spark, d):
    if not os.listdir(d):
        from tidb_lightning_spark.sources.parquet_source import read_table

        ev = read_table(spark, f"{SF_SMOKE}/events.parquet")
        ev.select(*[f.name for f in S.EVENT_SCHEMA.fields]).repartition(
            6
        ).write.mode("overwrite").parquet(d)
    return d


def test_streaming_hll_equals_batch(spark, stream_dir):
    d = _prepare(spark, stream_dir)
    # one file per trigger -> 6 micro-batches; update mode emits one row
    # per (batch, group); the LAST row per group is the drained total
    stream = S.read_event_stream(spark, d, max_files_per_trigger=1)
    S.run_to_memory(
        S.streaming_distinct_users(stream), "hll_stream", "update"
    )
    rows = spark.table("hll_stream").collect()
    # the memory sink appends one row per (batch, group) in no guaranteed
    # order; the sketch is monotone (registers only grow), so the drained
    # total is each group's row with the most registers hit
    final: dict = {}
    for r in rows:
        cur = final.get(r["event_type"])
        if cur is None or r["registers_hit"] >= cur[1]:
            final[r["event_type"]] = (r["est_distinct"], r["registers_hit"])

    from tidb_lightning_spark.sources.parquet_source import read_table

    batch = {
        r["event_type"]: (r["est_distinct"], r["registers_hit"])
        for r in SK.hll_distinct(
            read_table(spark, f"{SF_SMOKE}/events.parquet"),
            "user_id",
            ["event_type"],
        ).collect()
    }
    assert set(final) == set(batch)
    for k in batch:
        assert final[k][1] == batch[k][1], f"{k}: registers_hit diverged"
        # estimator runs in Python (stream) vs JVM (batch): identical
        # formula, but ln() may differ in the last ulp -> at most one
        # integer after rounding
        assert abs(final[k][0] - batch[k][0]) <= 1, f"{k}: estimate diverged"
