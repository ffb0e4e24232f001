"""JDBC sink policy tests (model: reference tidb_test.go REPLACE/IGNORE
semantics) — no database needed; policies are DataFrame transforms."""

from __future__ import annotations

import pytest

from tidb_lightning_spark.sinks.jdbc_sink import JDBCSink, apply_duplicate_policy


@pytest.fixture
def dup_df(spark):
    rows = [
        (1, "first", 10),
        (1, "second", 20),
        (2, "only", 30),
        (3, "a", 40),
        (3, "b", 50),
        (3, "c", 60),
    ]
    return spark.createDataFrame(rows, "id int, tag string, _tidb_rowid int")


def test_replace_keeps_last(spark, dup_df):
    out = apply_duplicate_policy(dup_df, ["id"], "replace", "_tidb_rowid")
    got = {r["id"]: r["tag"] for r in out.collect()}
    assert got == {1: "second", 2: "only", 3: "c"}


def test_ignore_keeps_first(spark, dup_df):
    out = apply_duplicate_policy(dup_df, ["id"], "ignore", "_tidb_rowid")
    got = {r["id"]: r["tag"] for r in out.collect()}
    assert got == {1: "first", 2: "only", 3: "a"}


def test_error_raises_on_dup(spark, dup_df):
    with pytest.raises(ValueError, match="duplicate primary key"):
        apply_duplicate_policy(dup_df, ["id"], "error")


def test_error_passes_when_unique(spark, dup_df):
    uniq = dup_df.dropDuplicates(["id"])
    out = apply_duplicate_policy(uniq, ["id"], "error")
    assert out.count() == 3


def test_merge_sql_shape():
    sql = JDBCSink.merge_sql("db", "t", "stg", ["id"], ["id", "a", "b"])
    assert "MERGE INTO db.t" in sql
    assert "t.id = s.id" in sql
    assert "UPDATE SET t.a = s.a, t.b = s.b" in sql


def test_jdbc_sink_against_embedded_derby(spark, dup_df, tmp_path):
    """End-to-end against a real database (reference golden tests
    backend/tidb_test.go): pyspark bundles Apache Derby, so the JDBC path
    is exercised embedded — write with each duplicate policy, read the
    target table back over JDBC, assert contents."""
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    sink = JDBCSink(url, properties=props, on_duplicate="replace")
    sink.write_table(dup_df, "APP", "t_replace", pk=["id"])
    back = spark.read.jdbc(url, "APP.t_replace", properties=props)
    assert {r["id"]: r["tag"] for r in back.collect()} == {
        1: "second", 2: "only", 3: "c"
    }

    sink = JDBCSink(url, properties=props, on_duplicate="ignore")
    sink.write_table(dup_df, "APP", "t_ignore", pk=["id"])
    back = spark.read.jdbc(url, "APP.t_ignore", properties=props)
    assert {r["id"]: r["tag"] for r in back.collect()} == {
        1: "first", 2: "only", 3: "a"
    }

    sink = JDBCSink(url, properties=props, on_duplicate="error")
    with pytest.raises(ValueError, match="duplicate primary key"):
        sink.write_table(dup_df, "APP", "t_error", pk=["id"])

    # append semantics: a second replace-write adds rows at the DB level
    # (cross-batch upsert is the merge_sql path, database-specific)
    sink = JDBCSink(url, properties=props, on_duplicate="replace")
    sink.write_table(dup_df, "APP", "t_replace", pk=["id"])
    assert (
        spark.read.jdbc(url, "APP.t_replace", properties=props).count() == 6
    )
