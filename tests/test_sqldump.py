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


def _make_dump(path, n_rows, with_noise=True):
    with open(path, "w") as f:
        if with_noise:
            f.write("/*!40101 SET NAMES utf8 */;\nSET sql_mode='';\n")
        batch = []
        for i in range(n_rows):
            batch.append(f"({i}, 'val {i} with ;\\n semi', {i * 2})")
            if len(batch) == 100:
                f.write("INSERT INTO `t` (`a`, `b`, `c`) VALUES\n"
                        + ",\n".join(batch) + ";\n")
                batch = []
        if batch:
            f.write("INSERT INTO `t` (`a`, `b`, `c`) VALUES\n"
                    + ",\n".join(batch) + ";\n")


def test_split_sql_file_statement_aligned(tmp_path):
    from tidb_lightning_spark.sources.sqldump_source import split_sql_file

    p = str(tmp_path / "d.sql")
    _make_dump(p, 2000)
    import os as _os

    size = _os.path.getsize(p)
    ranges = split_sql_file(p, chunk_bytes=10_000)
    assert len(ranges) > 3
    # full, gapless coverage
    assert ranges[0][0] == 0 and ranges[-1][1] == size
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2
    # every non-zero boundary starts a statement
    with open(p, "rb") as f:
        for s, _ in ranges[1:]:
            f.seek(s)
            assert f.readline().lstrip()[:7].upper() == b"INSERT "


def test_chunked_read_matches_whole_file(spark, tmp_path):
    """Splitting a dump must change neither the parsed rows nor row-id
    uniqueness/order (reference checkpoint_chunks equivalence)."""
    from tidb_lightning_spark.sources.sqldump_source import read_sql_files

    p = str(tmp_path / "big.sql")
    _make_dump(p, 3000)

    whole = read_sql_files(spark, [p], 3, chunk_bytes=1 << 30)
    chunked = read_sql_files(spark, [p], 3, chunk_bytes=20_000)
    assert chunked.rdd.getNumPartitions() > 1
    w = sorted((r["_c0"], r["_c1"], r["_c2"]) for r in whole.collect())
    c = sorted((r["_c0"], r["_c1"], r["_c2"]) for r in chunked.collect())
    assert w == c and len(w) == 3000
    # _row_seq: unique, and ordered consistently with the data order
    seqs = {r["_c0"]: r["_row_seq"] for r in chunked.collect()}
    assert len(set(seqs.values())) == 3000
    ordered = [seqs[str(i)] for i in range(3000)]
    assert ordered == sorted(ordered)


def test_restore_split_dump_same_checksum(spark, tmp_path, monkeypatch):
    """e2e: a dump imported in >1 chunk produces the identical table
    (checksum=required passes, auto-inc ids unique) vs whole-file mode."""
    import tidb_lightning_spark.sources.sqldump_source as sq
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    d = str(tmp_path / "dump")
    import os as _os

    _os.makedirs(d, exist_ok=True)
    with open(f"{d}/s-schema-create.sql", "w") as f:
        f.write("CREATE DATABASE s;")
    with open(f"{d}/s.t-schema.sql", "w") as f:
        f.write("CREATE TABLE t (a INT, b VARCHAR(40), c INT, PRIMARY KEY (a));")
    _make_dump(f"{d}/s.t.sql", 2500, with_noise=False)

    def run(target):
        cfg = Config.from_toml(
            None, source_dir=d, target_dir=target,
            checksum="required", checkpoint_enable=False,
        )
        rep = Restorer(spark, cfg).run()
        assert rep.ok, [t.error for t in rep.tables]
        return rep.tables[0].checksum

    ck_whole = run(str(tmp_path / "wh_whole"))
    monkeypatch.setattr(sq, "SQL_CHUNK_BYTES", 15_000)
    ck_split = run(str(tmp_path / "wh_split"))
    assert ck_whole == ck_split
