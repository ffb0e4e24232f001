"""Property-based tests (hypothesis) for the MySQL DDL parser — the
analog of the reference's table-driven parser tests (config/parser
robustness). Driver-side pure Python, no Spark session, so hypothesis
can run hundreds of generated schemas cheaply.

Invariants pinned:
  * any generated CREATE TABLE parses without crashing;
  * every declared column comes back, in order, with the declared
    base type and nullability;
  * primary keys (inline or table-level) are captured;
  * the Spark schema materializes (every MySQL type maps);
  * exotic identifiers survive backtick quoting.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tidb_lightning_spark.schema.ddl import parse_create_table

TYPES = [
    ("TINYINT", "tinyint"),
    ("SMALLINT", "smallint"),
    ("MEDIUMINT", "mediumint"),
    ("INT", "int"),
    ("BIGINT", "bigint"),
    ("BIGINT UNSIGNED", "bigint"),
    ("FLOAT", "float"),
    ("DOUBLE", "double"),
    ("DECIMAL(10,2)", "decimal"),
    ("CHAR(3)", "char"),
    ("VARCHAR(20)", "varchar"),
    ("TEXT", "text"),
    ("BLOB", "blob"),
    ("VARBINARY(16)", "varbinary"),
    ("DATE", "date"),
    ("DATETIME", "datetime"),
    ("TIMESTAMP", "timestamp"),
    ("TIME", "time"),
    ("YEAR", "year"),
    ("BIT(8)", "bit"),
    ("ENUM('a','b','c')", "enum"),
    ("SET('x','y')", "set"),
    ("JSON", "json"),
]

ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_0123456789",
    min_size=1,
    max_size=12,
).filter(lambda s: not s[0].isdigit())

column = st.tuples(
    ident,
    st.sampled_from(TYPES),
    st.booleans(),  # NOT NULL
    st.sampled_from([None, "DEFAULT NULL", "DEFAULT '0'", "DEFAULT 0"]),
)


@st.composite
def create_table(draw):
    cols = draw(st.lists(column, min_size=1, max_size=8, unique_by=lambda c: c[0]))
    pk_idx = draw(st.integers(min_value=-1, max_value=len(cols) - 1))
    defs = []
    for i, (name, (sql_t, _), not_null, default) in enumerate(cols):
        d = f"`{name}` {sql_t}"
        if not_null:
            d += " NOT NULL"
        if default and not (not_null and default == "DEFAULT NULL"):
            d += f" {default}"
        defs.append(d)
    if pk_idx >= 0:
        defs.append(f"PRIMARY KEY (`{cols[pk_idx][0]}`)")
    ddl = f"CREATE TABLE `t` (\n  " + ",\n  ".join(defs) + "\n);"
    return ddl, cols, pk_idx


@given(create_table())
@settings(max_examples=300, deadline=None)
def test_generated_ddl_parses_and_roundtrips(case):
    ddl, cols, pk_idx = case
    info = parse_create_table(ddl)
    assert info.name == "t"
    parsed = {c.name: c for c in info.columns}
    assert [c.name for c in info.columns] == [c[0] for c in cols]
    for name, (_, base), not_null, _default in cols:
        c = parsed[name]
        assert c.mysql.base == base, (name, c.mysql.base, base)
        if not_null:
            assert not c.nullable
        c.mysql.spark_type()  # every type must map
    if pk_idx >= 0:
        assert info.primary_key == [cols[pk_idx][0]]
    info.spark_schema()  # materializes without error


@given(
    st.text(
        alphabet="abc xyz-$#@!.é中",  # exotic incl. unicode
        min_size=1,
        max_size=10,
    ).filter(lambda s: "`" not in s and s.strip())
)
@settings(max_examples=100, deadline=None)
def test_exotic_backticked_identifiers(name):
    info = parse_create_table(
        f"CREATE TABLE `{name}` (`{name}_c` INT NOT NULL);"
    )
    assert info.name == name
    assert info.columns[0].name == f"{name}_c"
