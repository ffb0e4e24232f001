"""CSV dialect e2e tests (model: reference tests/csv, tool_135, tool_1420,
column_permutation — our own fixtures)."""

from __future__ import annotations

import os

from tidb_lightning_spark.config import Config
from tidb_lightning_spark.pipeline import Restorer


def write(path, content):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def base(tmp_path, name):
    d = str(tmp_path / "dump")
    write(f"{d}/d-schema-create.sql", "CREATE DATABASE d;")
    write(f"{d}/d.{name}-schema.sql",
          f"CREATE TABLE {name} (a INT, b TEXT, c INT, PRIMARY KEY (a));")
    return d


def run(spark, tmp_path, d, **csv_overrides):
    import dataclasses

    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target, checkpoint_enable=False
    )
    cfg.csv = dataclasses.replace(cfg.csv, **csv_overrides)
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    return target


def test_multichar_separator(spark, tmp_path):
    # tool_135 analog: '|+|' separator
    d = base(tmp_path, "t")
    write(f"{tmp_path}/dump/d.t.csv", "a|+|b|+|c\n1|+|x|+|10\n2|+|y|y|+|20\n")
    target = run(spark, tmp_path, d, separator="|+|")
    rows = {r["a"]: (r["b"], r["c"])
            for r in spark.read.parquet(f"{target}/d/t").collect()}
    assert rows == {1: ("x", 10), 2: ("y|y", 20)}


def test_single_quote_delimiter(spark, tmp_path):
    d = base(tmp_path, "t")
    write(f"{tmp_path}/dump/d.t.csv", "a,b,c\n1,'hello, world',5\n2,plain,6\n")
    target = run(spark, tmp_path, d, delimiter="'")
    rows = {r["a"]: r["b"] for r in spark.read.parquet(f"{target}/d/t").collect()}
    assert rows == {1: "hello, world", 2: "plain"}


def test_headerless_positional(spark, tmp_path):
    d = base(tmp_path, "t")
    write(f"{tmp_path}/dump/d.t.csv", "1,x,10\n2,y,20\n3,\\N,30\n")
    target = run(spark, tmp_path, d, header=False)
    rows = {r["a"]: (r["b"], r["c"])
            for r in spark.read.parquet(f"{target}/d/t").collect()}
    assert rows == {1: ("x", 10), 2: ("y", 20), 3: (None, 30)}


def test_reordered_and_partial_header(spark, tmp_path):
    # column_permutation analog: header order != schema order, one column
    # missing entirely (fills NULL since no default)
    d = base(tmp_path, "t")
    write(f"{tmp_path}/dump/d.t.csv", "c,a\n10,1\n20,2\n")
    target = run(spark, tmp_path, d)
    rows = {r["a"]: (r["b"], r["c"])
            for r in spark.read.parquet(f"{target}/d/t").collect()}
    assert rows == {1: (None, 10), 2: (None, 20)}


def test_trim_last_separator(spark, tmp_path):
    d = base(tmp_path, "t")
    write(f"{tmp_path}/dump/d.t.csv", "a,b,c,\n1,x,10,\n2,y,20,\n")
    target = run(spark, tmp_path, d, trim_last_sep=True)
    rows = {r["a"]: (r["b"], r["c"])
            for r in spark.read.parquet(f"{target}/d/t").collect()}
    assert rows == {1: ("x", 10), 2: ("y", 20)}


def test_embedded_newline_in_quoted_field(spark, tmp_path):
    # F4 escapes-torture subset: embedded newline needs multiLine (default)
    d = base(tmp_path, "t")
    write(f"{tmp_path}/dump/d.t.csv", 'a,b,c\n1,"line1\nline2",5\n')
    target = run(spark, tmp_path, d)
    rows = spark.read.parquet(f"{target}/d/t").collect()
    assert rows[0]["b"] == "line1\nline2"


def test_exotic_unicode_filenames(spark, tmp_path):
    # reference tests/exotic_filenames: unicode db/table names flow from
    # filename routing through the warehouse directory layout
    d = str(tmp_path / "dump")
    write(f"{d}/中文庫-schema-create.sql", "CREATE DATABASE `中文庫`;")
    write(f"{d}/中文庫.中文表-schema.sql",
          "CREATE TABLE `中文表` (a INT, b VARCHAR(8), PRIMARY KEY (a));")
    write(f"{d}/中文庫.中文表.csv", "a,b\n1,你好\n2,世界\n")
    target = run(spark, tmp_path, d)
    rows = {r["a"]: r["b"]
            for r in spark.read.parquet(f"{target}/中文庫/中文表").collect()}
    assert rows == {1: "你好", 2: "世界"}


def test_wide_table_256_columns(spark, tmp_path):
    # reference tests/too_many_columns: a 256-column table round-trips
    n = 256
    cols = [f"COL{i:03d}" for i in range(1, n + 1)]
    d = str(tmp_path / "dump")
    write(f"{d}/w-schema-create.sql", "CREATE DATABASE w;")
    write(f"{d}/w.t-schema.sql",
          "CREATE TABLE t (" + ", ".join(f"{c} VARCHAR(16)" for c in cols) + ");")
    write(f"{d}/w.t.csv",
          ",".join(cols) + "\n" + ",".join(str(1000 + i) for i in range(1, n + 1))
          + "\n")
    target = run(spark, tmp_path, d)
    got = spark.read.parquet(f"{target}/w/t").collect()
    assert len(got) == 1
    r = got[0]
    assert r["COL001"] == "1001" and r["COL100"] == "1100" and r["COL256"] == "1256"
