"""Discovery/filter/routing tests (model: reference tests/routes,
tests/black-white-list, loader_test.go scenarios — fixtures are our own)."""

import os

import pytest

from tidb_lightning_spark.sources.loader import discover
from tidb_lightning_spark.sources.table_filter import TableFilter
from tidb_lightning_spark.sources.table_router import TableRouter


def mkfiles(root, names):
    for n in names:
        p = os.path.join(root, n)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write("-- stub\nCREATE TABLE x (a int);" if n.endswith(".sql") else "1\n")


def test_basic_discovery(tmp_path):
    mkfiles(
        tmp_path,
        [
            "db-schema-create.sql",
            "db.users-schema.sql",
            "db.users.1.csv",
            "db.users.2.csv",
            "db.orders-schema.sql",
            "db.orders.sql",
            "README.md",
        ],
    )
    res = discover(str(tmp_path))
    assert list(res.databases) == ["db"]
    db = res.databases["db"]
    assert db.schema_file.endswith("db-schema-create.sql")
    assert sorted(db.tables) == ["orders", "users"]
    users = db.tables["users"]
    assert [os.path.basename(f.path) for f in users.data_files] == [
        "db.users.1.csv",
        "db.users.2.csv",
    ]
    assert res.unrecognized == ["README.md"]


def test_filter_excludes_system_schemas(tmp_path):
    mkfiles(
        tmp_path,
        [
            "mysql-schema-create.sql",
            "mysql.user-schema.sql",
            "mysql.user.csv",
            "app-schema-create.sql",
            "app.t-schema.sql",
            "app.t.csv",
        ],
    )
    res = discover(str(tmp_path))
    assert list(res.databases) == ["app"]


def test_custom_filter(tmp_path):
    mkfiles(
        tmp_path,
        [
            "a-schema-create.sql", "a.keep-schema.sql", "a.keep.csv",
            "a.drop-schema.sql", "a.drop.csv",
        ],
    )
    res = discover(str(tmp_path), table_filter=TableFilter(["a.keep"]))
    assert sorted(res.databases["a"].tables) == ["keep"]


def test_shard_merge_routing(tmp_path):
    # mirrors the semantics pinned by reference tests/routes/run.sh
    mkfiles(
        tmp_path,
        [
            "routes_a0-schema-create.sql",
            "routes_a0.t0-schema.sql", "routes_a0.t0.1.sql", "routes_a0.t0.2.sql",
            "routes_a0.t1-schema.sql", "routes_a0.t1.1.sql",
            "routes_a1-schema-create.sql",
            "routes_a1.t2-schema.sql", "routes_a1.t2.sql",
            "routes_a1.s1-schema.sql", "routes_a1.s1.sql",
        ],
    )
    router = TableRouter(
        [
            {
                "schema-pattern": "routes_a*",
                "table-pattern": "t*",
                "target-schema": "routes_b",
                "target-table": "u",
            }
        ]
    )
    res = discover(str(tmp_path), table_router=router)
    # the merged target exists with all shard data files
    assert "routes_b" in res.databases
    u = res.databases["routes_b"].tables["u"]
    assert len(u.data_files) == 4  # t0.1 t0.2 t1.1 t2
    # non-matching table s1 stays in its source db
    assert "s1" in res.databases["routes_a1"].tables
    # routes_a0 was fully routed away -> dropped
    assert "routes_a0" not in res.databases


def test_small_table_first_order(tmp_path):
    mkfiles(tmp_path, ["d-schema-create.sql", "d.big-schema.sql", "d.small-schema.sql"])
    with open(tmp_path / "d.big.csv", "w") as f:
        f.write("x" * 1000)
    with open(tmp_path / "d.small.csv", "w") as f:
        f.write("x")
    res = discover(str(tmp_path))
    assert [t.name for t in res.sorted_tables()] == ["small", "big"]


def test_missing_schema_raises(tmp_path):
    mkfiles(tmp_path, ["d-schema-create.sql", "d.t.csv"])
    with pytest.raises(FileNotFoundError):
        discover(str(tmp_path))
    res = discover(str(tmp_path), no_schema=True)
    assert "t" in res.databases["d"].tables


def test_discover_via_hadoop_fs_scheme(spark, tmp_path):
    """Scheme'd source dirs list through the SparkSession's Hadoop
    FileSystem (the s3a:// path, exercised here with file:// — same code
    path, local connector) and must produce the identical plan to a
    plain local walk."""
    import os

    d = str(tmp_path / "dump")
    os.makedirs(f"{d}/sub", exist_ok=True)
    for name, content in [
        ("db1-schema-create.sql", "CREATE DATABASE db1;"),
        ("db1.t-schema.sql", "CREATE TABLE t (a INT);"),
        ("db1.t.csv", "a\n1\n2\n"),
        ("db1.t.001.sql", "INSERT INTO t VALUES (3);"),
    ]:
        with open(f"{d}/{name}", "w") as f:
            f.write(content)

    local = discover(d)
    remote = discover(f"file://{d}", spark=spark)
    lt = local.databases["db1"].tables["t"]
    rt = remote.databases["db1"].tables["t"]
    assert [f.path for f in lt.data_files] == [f.path for f in rt.data_files]
    assert [f.file_size for f in lt.data_files] == [
        f.file_size for f in rt.data_files
    ]
    assert rt.schema_file == lt.schema_file
    # remote scheme without a session is a clear error, not a bad walk
    import pytest as _pytest

    with _pytest.raises(ValueError, match="SparkSession"):
        discover("s3a://bucket/dump")
