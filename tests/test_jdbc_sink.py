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
