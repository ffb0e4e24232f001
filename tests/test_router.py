"""File-router tests (model: reference tests/file_routing + router defaults)."""

import pytest

from tidb_lightning_spark.sources.router import FileRouter, RouteResult


@pytest.fixture(scope="module")
def default_router():
    return FileRouter.build()


@pytest.mark.parametrize(
    "path,expect",
    [
        ("db-schema-create.sql", RouteResult("db", "", "schema-schema")),
        ("db.tbl-schema.sql", RouteResult("db", "tbl", "table-schema")),
        ("db.tbl-schema-view.sql", RouteResult("db", "tbl", "view-schema")),
        ("db.tbl.sql", RouteResult("db", "tbl", "sql")),
        ("db.tbl.0001.sql", RouteResult("db", "tbl", "sql", key="0001")),
        ("db.tbl.csv", RouteResult("db", "tbl", "csv")),
        ("db.tbl.parquet", RouteResult("db", "tbl", "parquet")),
        ("nested/dir/db.tbl.42.csv", RouteResult("db", "tbl", "csv", key="42")),
        # dotted table names: non-greedy table group takes the middle
        ("db.a.b.sql", RouteResult("db", "a.b", "sql")),
        ("db-schema-trigger.sql", RouteResult("", "", "ignore")),
        ("db-schema-post.sql", RouteResult("", "", "ignore")),
        ("DB.TBL.SQL", RouteResult("DB", "TBL", "sql")),  # (?i) case folding
    ],
)
def test_default_rules(default_router, path, expect):
    assert default_router.route(path) == expect


def test_unrecognized(default_router):
    assert default_router.route("README.md") is None
    assert default_router.route("db.tbl.txt") is None


def test_custom_rules_precede_defaults():
    r = FileRouter.build(
        custom_rules=[
            {
                "pattern": r"(?i)^(?:[^/]*/)*([a-z0-9]+)/([a-z0-9]+)-table\.sql$",
                "schema": "$1",
                "table": "$2",
                "type": "table-schema",
            }
        ]
    )
    assert r.route("mydb/users-table.sql") == RouteResult(
        "mydb", "users", "table-schema"
    )
    # defaults still apply
    assert r.route("db.tbl.csv") == RouteResult("db", "tbl", "csv")


def test_path_literal_rule():
    r = FileRouter.build(
        custom_rules=[
            {"path": "ff/test.SQL", "schema": "fr", "table": "tbl", "type": "sql"}
        ],
        default_rules=False,
    )
    assert r.route("ff/test.SQL") == RouteResult("fr", "tbl", "sql")
    assert r.route("ff/test2.SQL") is None


def test_named_groups_and_literal_dollar():
    r = FileRouter.build(
        custom_rules=[
            {
                "pattern": r"^(?P<db>[a-z]+)/(?P<tbl>[a-z]+)\.csv$",
                "schema": "${db}",
                "table": "x$$_$tbl",
                "type": "csv",
            }
        ],
        default_rules=False,
    )
    assert r.route("a/b.csv") == RouteResult("a", "x$_b", "csv")


def test_compression_accepted():
    # departure from the reference: compressed sources are allowed
    r = FileRouter.build(
        custom_rules=[
            {
                "pattern": r"^([^.]+)\.([^.]+)\.csv\.(gz)$",
                "schema": "$1",
                "table": "$2",
                "type": "csv",
                "compression": "$3",
            }
        ],
        default_rules=False,
    )
    assert r.route("db.t.csv.gz") == RouteResult("db", "t", "csv", compression="gz")


def test_bad_rule_validation():
    with pytest.raises(ValueError):
        FileRouter.build(custom_rules=[{"pattern": "x", "path": "y", "type": "csv"}])
    with pytest.raises(ValueError):
        FileRouter.build(custom_rules=[{"pattern": "x"}])  # no type
