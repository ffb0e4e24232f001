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


# ---------------------------------------------------------------------------
# router_test.go mining (r12): build-time reference validation + Go
# Expand semantics
# ---------------------------------------------------------------------------

_EXPAND_PATTERN = (
    r"^(?:[^/]*/)*(?P<schema>[^/.]+)\.(?P<table_name>[^./]+)"
    r"(?:\.(?P<key>[0-9]+))?\.(?P<type>csv|sql)(?:\.(?P<cp>[A-Za-z0-9]+))?$"
)


@pytest.mark.parametrize(
    "tmpl,expect",
    [
        ("$schema", "db"),
        ("$table_name", "table"),
        ("$schema.$table_name", "db.table"),
        ("${1}", "db"),
        ("${1}_$table_name", "db_table"),
        ("${2}.schema", "table.schema"),
        ("$${2}", "${2}"),
        ("$$table_name", "$table_name"),
        ("$table_name-123", "table-123"),
        ("$$12$1$schema", "$12dbdb"),
        ("${table_name}$$2", "table$2"),
        ("${table_name}$$", "table$"),
        ("{1}$$", "{1}$"),
        ("my_table", "my_table"),
    ],
)
def test_route_expanding_reference(tmpl, expect):
    """TestRouteExpanding (router_test.go:187-221) verbatim: Go
    regexp.Expand semantics for $name/${n}/$$ in route templates."""
    r = FileRouter.build(
        custom_rules=[
            {
                "pattern": _EXPAND_PATTERN,
                "schema": "$schema",
                "table": tmpl,
                "type": "$type",
                "key": "$key",
                "compression": "$cp",
            }
        ],
        default_rules=False,
    )
    res = r.route("db.table.001.sql")
    assert res is not None
    assert res.name == expect


@pytest.mark.parametrize("tmpl", ["$1_$schema", "$schema_$table_name", "$6"])
def test_route_expanding_invalid_refs_fail_at_build(tmpl):
    """router_test.go:223-228: `$1_` is the (nonexistent) name '1_' —
    the longest word-char run — and `$6` is out of range; both are
    BUILD-time errors, never silently-empty expansions."""
    with pytest.raises(ValueError, match="invalid"):
        FileRouter.build(
            custom_rules=[
                {
                    "pattern": _EXPAND_PATTERN,
                    "schema": "$schema",
                    "table": tmpl,
                    "type": "$type",
                }
            ],
            default_rules=False,
        )


def test_route_parser_invalid_rules_reference():
    """TestRouteParser invalid set (router_test.go:31-40): unbalanced
    pattern, `$schemas` (no such name — longest-run parsing), `$4` past
    the group count."""
    bad = [
        {  # unbalanced parenthesis
            "pattern": r"^(?:[^/]*/)*(?P<schema>\.(?P<table>[^./]+).*$",
            "schema": "$test",
            "table": "$table",
            "type": "sql",
        },
        {  # $schemas parses as name 'schemas', which doesn't exist
            "pattern": r"^(?:[^/]*/)*(?P<schema>[^/.]+)\.(?P<table>[^./]+).*$",
            "schema": "$schemas",
            "table": "$table",
            "type": "sql",
        },
        {  # key references group 4 of a 3-group pattern
            "pattern": r"^(?:[^/]*/)*([^/.]+)\.([^./]+)(?:\.[0-9]+)?\.(csv|sql)",
            "schema": "$1",
            "table": "$2",
            "type": "$3",
            "key": "$4",
        },
    ]
    for rule in bad:
        with pytest.raises((ValueError, Exception)):
            FileRouter.build(custom_rules=[rule], default_rules=False)


def test_invalid_route_rule_progression():
    """TestInvalidRouteRule (router_test.go:43-72): each missing field
    errors in turn; `$schema` without the named group is refused; the
    complete rule passes; path+pattern together is refused."""
    pat = (
        r"^(?:[^/]*/)*([^/.]+)\.(?P<table>[^./]+)(?:\.(?P<key>[0-9]+))?"
        r"\.(?P<type>csv|sql)(?:\.(?P<cp>[A-Za-z0-9]+))?$"
    )
    with pytest.raises(ValueError, match="exactly one must be set"):
        FileRouter.build(custom_rules=[{}], default_rules=False)
    with pytest.raises(ValueError, match="'type'"):
        FileRouter.build(custom_rules=[{"pattern": pat}], default_rules=False)
    with pytest.raises(ValueError, match="'schema'"):
        FileRouter.build(
            custom_rules=[{"pattern": pat, "type": "$type"}], default_rules=False
        )
    with pytest.raises(ValueError, match="invalid named capture"):
        FileRouter.build(
            custom_rules=[
                {"pattern": pat, "type": "$type", "schema": "$schema", "table": "$table"}
            ],
            default_rules=False,
        )
    with pytest.raises(ValueError, match="'table'"):
        FileRouter.build(
            custom_rules=[{"pattern": pat, "type": "$type", "schema": "$1"}],
            default_rules=False,
        )
    r = FileRouter.build(
        custom_rules=[
            {"pattern": pat, "type": "$type", "schema": "$1", "table": "$table"}
        ],
        default_rules=False,
    )
    assert r.route("db.t.0001.sql") == RouteResult("db", "t", "sql", key="")
    with pytest.raises(ValueError, match="exactly one"):
        FileRouter.build(
            custom_rules=[
                {
                    "pattern": pat,
                    "path": "/tmp/1.sql",
                    "type": "$type",
                    "schema": "$1",
                    "table": "$table",
                }
            ],
            default_rules=False,
        )


def test_route_with_path_literal_dollar_and_regex_chars():
    """TestRouteWithPath (router_test.go:231-256): a `path` rule's
    fields are LITERAL (the '$1' in the table name survives, key keeps
    '$key'), and regex metacharacters in the filename don't leak."""
    fname = "myschema.(my_table$1).000.sql"
    r = FileRouter.build(
        custom_rules=[
            {
                "path": fname,
                "schema": "schema",
                "table": "my_table$1",
                "type": "sql",
                "key": "$key",
            }
        ],
        default_rules=False,
    )
    res = r.route(fname)
    assert res == RouteResult("schema", "my_table$1", "sql", key="$key")
    assert r.route(fname.replace(".", "-")) is None


def test_single_route_rule_reference_paths():
    """TestSingleRouteRule (router_test.go:74-110): matches and
    non-matches; a matching path whose expanded type is not a known
    source type is an ERROR, not a silent skip."""
    rule = {
        "pattern": (
            r"^(?:[^/]*/)*([^/.]+)\.(?P<table>[^./]+)(?:\.(?P<key>[0-9]+))?"
            r"\.(?P<type>csv|sql)(?:\.(?P<cp>[A-Za-z0-9]+))?$"
        ),
        "schema": "$1",
        "table": "$table",
        "type": "$type",
        "key": "$key",
        "compression": "$cp",
    }
    r = FileRouter.build(custom_rules=[rule], default_rules=False)
    assert r.route("my_schema.my_table.sql") == RouteResult(
        "my_schema", "my_table", "sql"
    )
    assert r.route("/test/123/my_schema.my_table.sql") == RouteResult(
        "my_schema", "my_table", "sql"
    )
    assert r.route("my_dir/my_schema.my_table.csv") == RouteResult(
        "my_schema", "my_table", "csv"
    )
    assert r.route("my_schema.my_table.0001.sql") == RouteResult(
        "my_schema", "my_table", "sql", key="0001"
    )
    for p in [
        "my_table.sql",
        "/schema/table.sql",
        "my_schema.my_table.txt",
        "my_schema.my_table.001.txt",
        "my_schema.my_table.0001-002.sql",
    ]:
        assert r.route(p) is None

    loose = dict(rule)
    loose["pattern"] = (
        r"^(?:[^/]*/)*([^/.]+)\.(?P<table>[^./]+)(?:\.(?P<key>[0-9]+))?"
        r"\.(?P<type>\w+)(?:\.(?P<cp>[A-Za-z0-9]+))?$"
    )
    r2 = FileRouter.build(custom_rules=[loose], default_rules=False)
    with pytest.raises(ValueError, match="unknown source type"):
        r2.route("my_schema.my_table.txt")
