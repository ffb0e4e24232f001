"""DDL parser tests — fixtures modeled on FIXTURES.md F1-F9 (the reference's
various_types / generated_columns / default-columns test schemas)."""

import pytest
from pyspark.sql import types as T

from tidb_lightning_spark.schema.ddl import (
    CURRENT_TIMESTAMP,
    parse_create_database,
    parse_create_table,
)


def test_precise_types_f1():
    info = parse_create_table(
        """
        CREATE TABLE precise_types (
            a BIGINT UNSIGNED NOT NULL,
            b BIGINT NOT NULL,
            c DECIMAL(21,1) NOT NULL,
            d DOUBLE NOT NULL
        );
        """
    )
    s = info.spark_schema()
    assert s["a"].dataType == T.DecimalType(20, 0)
    assert s["b"].dataType == T.LongType()
    assert s["c"].dataType == T.DecimalType(21, 1)
    assert s["d"].dataType == T.DoubleType()
    assert all(not f.nullable for f in s.fields)


def test_datetime_pk_uk_f2():
    info = parse_create_table(
        """
        CREATE TABLE `datetime` (
            `ref` INT NOT NULL,
            `pk` DATETIME(6) NOT NULL,
            `uk` TIMESTAMP(3) NOT NULL,
            PRIMARY KEY(`pk`),
            UNIQUE KEY(`uk`)
        );
        """
    )
    assert info.name == "datetime"
    assert info.primary_key == ["pk"]
    assert info.unique_keys == [["uk"]]
    s = info.spark_schema()
    assert s["pk"].dataType == T.TimestampNTZType()
    assert s["uk"].dataType == T.TimestampType()
    assert info.column("pk").primary_key


def test_enum_set_bit_json_f3():
    info = parse_create_table(
        """
        CREATE TABLE `enum-set` (
            `enum` ENUM('g00','g01','g02') NOT NULL UNIQUE,
            `set` SET('x00','x01') NOT NULL PRIMARY KEY,
            `bit` BIT(2) NOT NULL,
            `js` JSON
        );
        """
    )
    assert info.name == "enum-set"
    assert info.column("enum").mysql.members == ("g00", "g01", "g02")
    assert info.column("set").mysql.members == ("x00", "x01")
    assert info.primary_key == ["set"]
    s = info.spark_schema()
    assert s["bit"].dataType == T.LongType()
    assert s["js"].dataType == T.StringType()


def test_defaults_autoinc_f9():
    info = parse_create_table(
        """
        CREATE TABLE t (
            pk INT PRIMARY KEY AUTO_INCREMENT,
            x INT NULL,
            y INT NOT NULL DEFAULT 123,
            z DATETIME NOT NULL DEFAULT CURRENT_TIMESTAMP,
            w VARCHAR(10) DEFAULT 'ab''c'
        );
        """
    )
    assert info.column("pk").auto_increment
    assert info.primary_key == ["pk"]
    y = info.column("y")
    assert y.has_default and y.default == "123"
    assert info.column("z").default is CURRENT_TIMESTAMP
    assert info.column("w").default == "ab'c"


def test_generated_columns_f7():
    info = parse_create_table(
        """
        CREATE TABLE various_types (
            int64 BIGINT AS (1 + 2) STORED,
            string TEXT AS (SHA1(REPEAT('x', 3))) STORED,
            vcol DOUBLE GENERATED ALWAYS AS (int64 / 16) VIRTUAL
        );
        """
    )
    c = info.column("int64")
    assert c.generated_expr == "1 + 2"
    assert c.generated_stored
    assert info.column("string").generated_expr == "SHA1 ( REPEAT ( 'x' , 3 ) )"
    v = info.column("vcol")
    assert v.generated_expr is not None and not v.generated_stored


def test_partitioned_table_f6():
    info = parse_create_table(
        """
        CREATE TABLE p (
            id BIGINT,
            batch_date DATE NOT NULL,
            crt_time TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP,
            PRIMARY KEY (id, batch_date)
        ) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4
        PARTITION BY RANGE COLUMNS(batch_date) (
            PARTITION p0 VALUES LESS THAN ('2020-01-01'),
            PARTITION p1 VALUES LESS THAN MAXVALUE
        );
        """
    )
    assert info.primary_key == ["id", "batch_date"]
    assert info.partition_by is not None
    assert "RANGE" in info.partition_by
    assert info.table_options.get("engine") == "InnoDB"
    assert info.has_auto_row_id()  # composite PK -> hidden row id


def test_auto_random():
    info = parse_create_table(
        "CREATE TABLE t (id BIGINT PRIMARY KEY AUTO_RANDOM(5), v INT);"
    )
    assert info.column("id").auto_random_bits == 5
    assert not info.has_auto_row_id()


def test_keys_and_constraints_skipped():
    info = parse_create_table(
        """
        CREATE TABLE t (
            a INT,
            b INT,
            KEY idx_b (b),
            CONSTRAINT fk FOREIGN KEY (a) REFERENCES other (id),
            UNIQUE KEY uq_ab (a, b)
        );
        """
    )
    assert info.column_names == ["a", "b"]
    assert info.indexes == [["b"]]
    assert info.unique_keys == [["a", "b"]]


def test_exotic_names():
    info = parse_create_table(
        'CREATE TABLE `zr``"ew` (`?~!@#$%^&*()_+-=[]{}|,./<>?` TEXT);'
    )
    assert info.name == 'zr`"ew'
    assert info.column_names == ["?~!@#$%^&*()_+-=[]{}|,./<>?"]


def test_create_database():
    assert parse_create_database("CREATE DATABASE IF NOT EXISTS `mydb`;") == "mydb"
    assert parse_create_database("CREATE SCHEMA s") == "s"


def test_statements_with_comments():
    info = parse_create_table(
        """
        /*!40101 SET NAMES binary*/;
        -- a comment
        CREATE TABLE t (a INT COMMENT 'the a column');
        """
    )
    assert info.column("a").comment == "the a column"


def test_unsigned_ladder():
    info = parse_create_table(
        """
        CREATE TABLE t (
          a TINYINT UNSIGNED, b SMALLINT UNSIGNED, c INT UNSIGNED,
          d BIGINT UNSIGNED, e MEDIUMINT
        );
        """
    )
    s = info.spark_schema()
    assert s["a"].dataType == T.ShortType()
    assert s["b"].dataType == T.IntegerType()
    assert s["c"].dataType == T.LongType()
    assert s["d"].dataType == T.DecimalType(20, 0)
    assert s["e"].dataType == T.IntegerType()


def test_time_and_year():
    info = parse_create_table("CREATE TABLE t (d TIME, y YEAR, f FLOAT(7,4));")
    s = info.spark_schema()
    assert s["d"].dataType == T.StringType()
    assert s["y"].dataType == T.IntegerType()
    assert s["f"].dataType == T.FloatType()
