"""Generated-column evaluation tests (model: reference
tests/generated_columns — FIXTURES.md F7; fixtures are our own)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb_lightning_spark.operators.gencols import translate_mysql_expr
from tidb_lightning_spark.operators.transform import transform_table
from tidb_lightning_spark.schema.ddl import parse_create_table


def test_translate_basics():
    assert translate_mysql_expr("1 + 2") == "1 + 2"
    assert translate_mysql_expr("POW(7, 8)") == "POW ( 7 , 8 )"
    assert (
        translate_mysql_expr("JSON_OBJECT('k', v)")
        == "to_json(map ( 'k' , v ) )"
    )
    assert translate_mysql_expr("WEEK(d)") == "weekofyear ( d )"
    assert translate_mysql_expr("`a-b` * 2") == "`a-b` * 2"
    assert translate_mysql_expr("CONCAT('a''b', x)") == "CONCAT ( 'a\\'b' , x )"


def test_gencol_chain_f7(spark):
    # chained gencols a -> b -> c (gencol.nested analog)
    info = parse_create_table(
        """
        CREATE TABLE nested (
            a BIGINT,
            b BIGINT AS (a * 2) STORED,
            c BIGINT AS (b * 3) STORED,
            s TEXT AS (SHA1(REPEAT('x', 3))) STORED,
            f DOUBLE AS (9 / 16) STORED,
            j TEXT AS (JSON_OBJECT('k', a)) STORED
        );
        """
    )
    df = spark.createDataFrame([("1000",), ("2",)], "_c0 string")
    out = transform_table(df, info, ["a"], "2026-01-01 00:00:00")
    rows = {r["a"]: r.asDict() for r in out.collect()}
    assert rows[1000]["b"] == 2000
    assert rows[1000]["c"] == 6000
    assert rows[2]["c"] == 12
    assert rows[2]["f"] == 0.5625
    import hashlib

    assert rows[2]["s"] == hashlib.sha1(b"xxx").hexdigest()
    assert '"k":2' in rows[2]["j"].replace(" ", "")


def test_gencol_overwrites_file_value(spark):
    # data files carry no values for stored gencols; even if present they
    # are recomputed (the reference never reads gencols from the file)
    info = parse_create_table(
        "CREATE TABLE t (a INT, d INT AS (a + 1) STORED);"
    )
    df = spark.createDataFrame([("5", "999")], "_c0 string, _c1 string")
    out = transform_table(df, info, ["a", "d"], "2026-01-01 00:00:00")
    assert out.collect()[0]["d"] == 6
