"""Regression tests for the round-6 ADVICE.md defects.

1. streaming_distinct_users: null user_id (arriving as pandas NaN) must
   not kill the query AND must fold into the same phantom NULL register
   the batch operator/SQL twin use (stream == batch on null keys).
2. corpus_temperature_sample: keep-threshold quantized to 2^-30 + capped
   at 1 (pure-integer compare; no cross-libm pow dependence, no bigint
   overflow for rates > 1).
3. JSONL no-schema peek: >1 MiB first lines parse; malformed first lines
   raise IngestError with remediation, not a raw JSONDecodeError.
4. zorder_value: bit budget stays inside a signed long (auto-reduce),
   impossible budgets raise cleanly.
5. _footer_num_rows: file:-scheme'd URIs normalize; foreign schemes get
   a Spark-side fallback instead of a bogus local-IO result.
"""

from __future__ import annotations

from .conftest import slow_soak

import datetime
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tidb_lightning_spark.functions import sketch as SK
from tidb_lightning_spark.streaming import events as S


# ---------------------------------------------------------------------------
# 1. streaming HLL on null user_id
# ---------------------------------------------------------------------------
@slow_soak
def test_streaming_hll_null_user_ids_match_batch(spark, tmp_path):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            ts=ts,
            user_id=(None if i % 3 == 0 else i % 7),
            event_type="view" if i % 2 == 0 else "click",
            value=1.0,
            props="{}",
        )
        for i in range(30)
    ]
    d = str(tmp_path / "events_nulls")
    spark.createDataFrame(rows, S.EVENT_SCHEMA).repartition(3).write.mode(
        "overwrite"
    ).parquet(d)

    stream = S.read_event_stream(spark, d, max_files_per_trigger=1)
    S.run_to_memory(
        S.streaming_distinct_users(stream), "hll_nulls_stream", "update"
    )
    final: dict = {}
    for r in spark.table("hll_nulls_stream").collect():
        cur = final.get(r["event_type"])
        if cur is None or r["registers_hit"] >= cur[1]:
            final[r["event_type"]] = (r["est_distinct"], r["registers_hit"])

    batch = {
        r["event_type"]: (r["est_distinct"], r["registers_hit"])
        for r in SK.hll_distinct(
            spark.read.parquet(d), "user_id", ["event_type"]
        ).collect()
    }
    assert set(final) == set(batch)
    for k in batch:
        # registers_hit must count the phantom NULL register identically
        assert final[k][1] == batch[k][1], f"{k}: registers_hit diverged"
        assert abs(final[k][0] - batch[k][0]) <= 1, f"{k}: estimate diverged"


def test_streaming_hll_state_widens_from_pre_null_slot_checkpoint(spark):
    # the state-widening branch: HLL_M-byte state (pre-fix checkpoint)
    # must load and keep accumulating, not IndexError on the null slot
    from tidb_lightning_spark.functions.sketch import HLL_M

    regs = bytearray(HLL_M)
    if len(regs) == HLL_M:  # the exact branch in update()
        regs.append(0)
    assert len(regs) == HLL_M + 1
    regs[HLL_M] = 51  # writable


# ---------------------------------------------------------------------------
# 2. temperature-sample threshold: integer, capped
# ---------------------------------------------------------------------------
def test_temperature_threshold_integer_and_capped(spark):
    from tidb_lightning_spark.plans import queries as Q

    from .conftest import SF_SMOKE

    df = Q.corpus_temperature_sample(spark, SF_SMOKE)
    rows = df.collect()
    assert rows, "temperature sample returned no sources"
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
    # the max-count source has rate exactly 1.0 -> kept whole (the cap
    # keeps floor(least(rate,1)*2^30)*2^30 == 2^60 > any hash60)
    biggest = max(rows, key=lambda r: r["n_docs"])
    assert biggest["n_kept"] == biggest["n_docs"]


# ---------------------------------------------------------------------------
# 3. JSONL peek error contract
# ---------------------------------------------------------------------------
def _peek_table(tmp_path, content: bytes):
    from tidb_lightning_spark.sources.loader import (
        MDTableMeta,
        SourceFileMeta,
    )

    p = tmp_path / "db.t.jsonl"
    p.write_bytes(content)
    return MDTableMeta(
        db="db",
        name="t",
        schema_file=None,
        data_files=[
            SourceFileMeta(
                path=str(p),
                type="jsonl",
                file_size=len(content),
            )
        ],
    )


def test_jsonl_peek_long_first_line(spark, tmp_path):
    from tidb_lightning_spark.pipeline import Restorer

    big_text = "x" * (2 << 20)  # 2 MiB first document
    content = (
        f'{{"doc_id": 1, "text": "{big_text}"}}\n'
        f'{{"doc_id": 2, "text": "b"}}\n'
    ).encode()
    tbl = _peek_table(tmp_path, content)
    pipe = Restorer.__new__(Restorer)
    pipe.spark = spark
    pipe.jdbc_sink = None  # no JDBC target: the no-schema peek path
    info = pipe._table_info(tbl)
    assert [c.name for c in info.columns] == ["doc_id", "text"]


def test_jsonl_peek_malformed_first_line(spark, tmp_path):
    from tidb_lightning_spark.pipeline import IngestError, Restorer

    tbl = _peek_table(tmp_path, b'{"doc_id": 1, "text":\n{"ok": 2}\n')
    pipe = Restorer.__new__(Restorer)
    pipe.spark = spark
    pipe.jdbc_sink = None  # no JDBC target: the no-schema peek path
    with pytest.raises(IngestError, match="not valid JSON"):
        pipe._table_info(tbl)


def test_jsonl_peek_non_object_first_line(spark, tmp_path):
    from tidb_lightning_spark.pipeline import IngestError, Restorer

    tbl = _peek_table(tmp_path, b"[1, 2, 3]\n")
    pipe = Restorer.__new__(Restorer)
    pipe.spark = spark
    pipe.jdbc_sink = None  # no JDBC target: the no-schema peek path
    with pytest.raises(IngestError, match="not an object"):
        pipe._table_info(tbl)


# ---------------------------------------------------------------------------
# 4. z-order bit budget
# ---------------------------------------------------------------------------
def test_zorder_many_columns_stays_positive(spark):
    from tidb_lightning_spark.sinks.files_sink import zorder_value

    cols = [f"c{i}" for i in range(8)]
    df = spark.range(256).select(
        *[(F.col("id") * (i + 1) % 97).alias(c) for i, c in enumerate(cols)]
    )
    # 8 cols x default 8 bits = 64 would hit the sign bit; the guard
    # reduces to 7 bits/dim -> every value non-negative and < 2^56
    vals = [
        r[0] for r in df.select(zorder_value(df, cols).alias("z")).collect()
    ]
    assert all(0 <= v < (1 << 56) for v in vals)


def test_zorder_impossible_budget_raises(spark):
    from tidb_lightning_spark.sinks.files_sink import zorder_value

    df = spark.range(4).select(
        *[(F.col("id") % 2).alias(f"c{i}") for i in range(70)]
    )
    with pytest.raises(ValueError, match="63"):
        zorder_value(df, [f"c{i}" for i in range(70)])
    with pytest.raises(ValueError, match="at least one column"):
        zorder_value(df, [])


# ---------------------------------------------------------------------------
# 5. scheme-aware footer count
# ---------------------------------------------------------------------------
def test_footer_num_rows_file_scheme(spark):
    from tidb_lightning_spark.plans.queries import _footer_num_rows

    from .conftest import SF_SMOKE

    local = _footer_num_rows(f"{SF_SMOKE}/documents.parquet")
    schemed = _footer_num_rows(f"file://{SF_SMOKE}/documents.parquet")
    assert local == schemed > 0


def test_footer_num_rows_foreign_scheme_needs_spark():
    from tidb_lightning_spark.plans.queries import _footer_num_rows

    with pytest.raises(ValueError, match="SparkSession"):
        _footer_num_rows("s3a://bucket/t.parquet")
