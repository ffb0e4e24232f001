"""Mimics the driver's Spark-vs-DuckDB compare: row count, sorted-column
schema, order-insensitive value comparison (strict stringification — the
queries are designed to be bit-identical across engines)."""

from __future__ import annotations

import datetime
import decimal
import math


def _norm(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def normalize_rows(columns, rows):
    """-> (sorted column names, sorted list of value-tuples in that order)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = [columns[i] for i in order]
    data = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return names, data


def spark_result(df):
    rows = df.collect()
    return normalize_rows(df.columns, [tuple(r) for r in rows])


def duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return normalize_rows(cols, cur.fetchall())


def assert_matches(df, con, sql, name=""):
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
