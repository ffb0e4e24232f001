"""SQL-dump parser unit tests (model: reference parser_test.go cases,
FIXTURES.md F11 statement shapes — fixtures are our own)."""

import pytest

from tidb_lightning_spark.sources.sqldump_source import (
    SQLDumpError,
    parse_insert_statements,
)


def rows(text):
    out = []
    for stmt in parse_insert_statements(text):
        out.extend(stmt.rows)
    return out


def test_multi_row_values():
    stmts = list(
        parse_insert_statements("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, NULL);")
    )
    assert len(stmts) == 1
    assert stmts[0].table == "t"
    assert stmts[0].columns is None
    assert stmts[0].rows == [["1", "a"], ["2", "b"], ["3", None]]


def test_column_list_and_qualified_name():
    stmts = list(
        parse_insert_statements(
            "INSERT INTO `db`.`tbl` (`a`, b) VALUES (1, 2);"
            "INSERT INTO db2.tbl2 VALUES (3, 4);"
        )
    )
    assert stmts[0].table == "tbl"
    assert stmts[0].columns == ["a", "b"]
    assert stmts[1].table == "tbl2"


def test_literals():
    (r,) = rows(
        "INSERT INTO t VALUES (TRUE, FALSE, NULL, -42, 18446744073709551615, "
        "1.5, 5e222, X'414243', x'ff', b'101', 0x4142);"
    )
    assert r == ["1", "0", None, "-42", "18446744073709551615",
                 "1.5", "5e222", "ABC", "\xff", "5", "AB"]


def test_string_escapes():
    (r,) = rows(r"INSERT INTO t VALUES ('a\'b', 'c''d', 'e\\f', 'g\nh');")
    assert r == ["a'b", "c'd", "e\\f", "g\nh"]


def test_multiple_statements_and_noise():
    rs = rows(
        """
        /*!40101 SET NAMES binary*/;
        -- comment line
        INSERT INTO t VALUES (1);
        # hash comment
        REPLACE INTO t VALUES (2);
        INSERT INTO t VALUE (3);
        """
    )
    assert rs == [["1"], ["2"], ["3"]]


def test_empty_tuple_and_errors():
    stmts = list(parse_insert_statements("INSERT INTO t () VALUES (), ();"))
    assert stmts[0].columns == []
    assert stmts[0].rows == [[], []]
    with pytest.raises(SQLDumpError):
        rows("INSERT INTO t SET a = 1;")
    with pytest.raises(SQLDumpError):
        rows("INSERT INTO t VALUES (1")


def test_peek_columns_statement_longer_than_window(tmp_path):
    """ADVICE r1: the first INSERT can exceed the peek read window
    (mydumper statement-size is configurable); peek must parse only the
    header, growing the window as needed, not the whole statement."""
    from tidb_lightning_spark.sources.sqldump_source import peek_columns

    p = tmp_path / "big.sql"
    rows = ",\n".join(f"({i}, '{'x' * 64}')" for i in range(4000))
    p.write_text(
        "/* header comment */\n"
        "INSERT INTO `t` (`id`, `payload`) VALUES\n" + rows + ";\n"
    )
    assert p.stat().st_size > (1 << 18)
    assert peek_columns(str(p)) == ["id", "payload"]


def test_peek_columns_positional_and_noise(tmp_path):
    from tidb_lightning_spark.sources.sqldump_source import peek_columns

    p = tmp_path / "pos.sql"
    p.write_text("SET NAMES utf8;\nINSERT INTO t VALUES (1), (2);\n")
    assert peek_columns(str(p)) is None
    empty = tmp_path / "empty.sql"
    empty.write_text("-- nothing here\n")
    assert peek_columns(str(empty)) is None
