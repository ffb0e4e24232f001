"""Partitioned-table output (H4, model: reference tests/partitioned-table
+ FIXTURES.md F6) and ANALYZE column stats (L3)."""

from __future__ import annotations

import json
import os

from tidb_lightning_spark.config import Config
from tidb_lightning_spark.pipeline import Restorer


def write(path, content):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def test_range_columns_partitioned_output(spark, tmp_path):
    d = str(tmp_path / "dump")
    write(f"{d}/p-schema-create.sql", "CREATE DATABASE p;")
    write(
        f"{d}/p.t-schema.sql",
        """
        CREATE TABLE t (
            id INT, batch_date DATE NOT NULL, v INT,
            PRIMARY KEY (id, batch_date)
        ) PARTITION BY RANGE COLUMNS(batch_date) (
            PARTITION p0 VALUES LESS THAN ('2024-02-01'),
            PARTITION p1 VALUES LESS THAN MAXVALUE
        );
        """,
    )
    write(
        f"{d}/p.t.csv",
        "id,batch_date,v\n"
        "1,2024-01-05,10\n2,2024-01-05,20\n3,2024-03-01,30\n",
    )
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target, checkpoint_enable=False
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    # hive-style value directories exist
    dirs = sorted(
        x for x in os.listdir(f"{target}/p/t") if x.startswith("batch_date=")
    )
    assert len(dirs) == 2
    df = spark.read.parquet(f"{target}/p/t")
    assert df.count() == 3
    # partition pruning: reading one partition touches one directory
    one = df.filter(df.batch_date == "2024-01-05")
    assert one.count() == 2

    # ANALYZE stats recorded (analyze defaults to optional -> on)
    meta = json.load(open(f"{target}/p/t/_tls_meta.json"))
    assert "column_stats" in meta
    assert meta["column_stats"]["v"]["min"] == 10
    assert meta["column_stats"]["v"]["max"] == 30
    assert meta["column_stats"]["id"]["nulls"] == 0


def test_partition_values_roundtrip_leading_zeros(spark, tmp_path):
    """ADVICE r1: directory-name partition-type inference would read CHAR
    '00123' back as int 123, failing checksum=required on correct data;
    readback must use the declared schema."""
    d = str(tmp_path / "dump_lz")
    write(f"{d}/lz-schema-create.sql", "CREATE DATABASE lz;")
    write(
        f"{d}/lz.t-schema.sql",
        """
        CREATE TABLE t (
            id INT, code CHAR(5) NOT NULL, v INT,
            PRIMARY KEY (id, code)
        ) PARTITION BY LIST COLUMNS(code) (
            PARTITION p0 VALUES IN ('00123'),
            PARTITION p1 VALUES IN ('99000')
        );
        """,
    )
    write(f"{d}/lz.t.csv", "id,code,v\n1,00123,10\n2,99000,20\n")
    target = str(tmp_path / "wh_lz")
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target, checksum="required",
        checkpoint_enable=False,
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    codes = sorted(
        r["code"]
        for r in spark.read.schema("id INT, code STRING, v INT")
        .parquet(f"{target}/lz/t")
        .collect()
    )
    assert codes == ["00123", "99000"]
