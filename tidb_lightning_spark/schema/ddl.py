"""MySQL DDL parser: CREATE TABLE/DATABASE/VIEW -> TableInfo/StructType.

The reference replays schema files through TiDB's full SQL parser
(lightning/restore/tidb.go:194-227) and gets `model.TableInfo` back from
the target (tidb.go:237-277). We are the target, so a focused
tokenizer-based parser covering the Mydumper DDL surface (FIXTURES.md
F1-F9: numeric/temporal/enum/set/bit/json types, defaults incl.
CURRENT_TIMESTAMP, AUTO_INCREMENT/AUTO_RANDOM, generated columns,
PRIMARY/UNIQUE keys, PARTITION BY) is the whole requirement.

Driver-side only; executors never see DDL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

from tidb_lightning_spark.schema.types import MySQLType

CURRENT_TIMESTAMP = object()  # sentinel default


@dataclass
class ColumnInfo:
    name: str
    mysql: MySQLType
    nullable: bool = True
    default: object | None = None  # None | str literal | CURRENT_TIMESTAMP
    has_default: bool = False
    auto_increment: bool = False
    auto_random_bits: int = 0
    generated_expr: str | None = None
    generated_stored: bool = False
    on_update_current: bool = False
    charset: str | None = None
    collation: str | None = None
    comment: str | None = None
    primary_key: bool = False  # set from inline or table-level PK
    unique: bool = False

    def spark_field(self) -> T.StructField:
        return T.StructField(self.name, self.mysql.spark_type(), self.nullable)


@dataclass
class TableInfo:
    db: str | None
    name: str
    columns: list[ColumnInfo] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    unique_keys: list[list[str]] = field(default_factory=list)
    indexes: list[list[str]] = field(default_factory=list)
    partition_by: str | None = None
    table_options: dict[str, str] = field(default_factory=dict)

    def spark_schema(self) -> T.StructType:
        return T.StructType([c.spark_field() for c in self.columns])

    def column(self, name: str) -> ColumnInfo:
        for c in self.columns:
            if c.name.lower() == name.lower():
                return c
        raise KeyError(name)

    def non_binary_collations(self) -> dict[str, str]:
        """column (or '<table>') -> declared collation, for every
        collation whose comparison semantics differ from binary. The
        warehouse compares strings by UTF-8 BINARY only (SURVEY §1.3;
        the reference honors MySQL collations end-to-end,
        restore.go:1865-1872 new_collation) — sorting or equality over
        a case/accent-insensitive collation behaves differently here,
        so ingest warns on these."""

        def nonbin(c: str | None) -> bool:
            return bool(c) and c.lower() != "binary" and not c.lower().endswith("_bin")

        out = {
            c.name: c.collation for c in self.columns if nonbin(c.collation)
        }
        tbl = self.table_options.get("collate")
        if nonbin(tbl):
            out["<table>"] = tbl
        return out

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def has_auto_row_id(self) -> bool:
        """True when the table needs a hidden row id: no integer single-col
        PK (reference: common/util.go:354-358 TableHasAutoRowID)."""
        if len(self.primary_key) != 1:
            return True
        col = self.column(self.primary_key[0])
        return not isinstance(
            col.mysql.spark_type(), (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        )


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
      `(?P<bq>(?:[^`]|``)*)`            # backquoted identifier
    | '(?P<sq>(?:[^'\\]|\\.|'')*)'      # single-quoted string
    | "(?P<dq>(?:[^"\\]|\\.|"")*)"      # double-quoted string
    | (?P<ws>\s+|/\*.*?\*/|--[^\n]*|\#[^\n]*)   # whitespace/comments
    | (?P<num>(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)  # incl. 5e222
                                  # (digits-required exponent so `5e`
                                  # still lexes as num+word)
    | (?P<punct>[(),;=])
    | (?P<word>[A-Za-z_$-￿][\w$-￿]*)  # MySQL idents
                                  # allow U+0080.. unquoted (charset.go)
    | (?P<op>[^\s])
    """,
    re.VERBOSE | re.DOTALL,
)


@dataclass(frozen=True)
class Tok:
    kind: str  # ident | string | num | punct | word | op
    text: str  # normalized: idents unescaped, words as written


def tokenize(sql: str) -> list[Tok]:
    out: list[Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN.match(sql, pos)
        if not m:
            raise ValueError(f"cannot tokenize DDL at offset {pos}: {sql[pos:pos+30]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        if m.lastgroup == "bq":
            out.append(Tok("ident", m.group("bq").replace("``", "`")))
        elif m.lastgroup == "sq":
            out.append(Tok("string", _unescape(m.group("sq"), "'")))
        elif m.lastgroup == "dq":
            out.append(Tok("string", _unescape(m.group("dq"), '"')))
        else:
            out.append(Tok(m.lastgroup, m.group()))
    return out


_ESCAPES = {
    "0": "\0", "n": "\n", "t": "\t", "r": "\r", "b": "\b",
    "Z": "\x1a", "\\": "\\", "'": "'", '"': '"', "%": "\\%", "_": "\\_",
}


def _unescape(body: str, quote: str) -> str:
    out = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        elif ch == quote and i + 1 < len(body) and body[i + 1] == quote:
            out.append(quote)
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------


class _P:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, ahead: int = 0) -> Tok | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_word(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "word" and t.text.upper() in words

    def eat_word(self, *words: str) -> bool:
        if self.at_word(*words):
            self.i += 1
            return True
        return False

    def expect_punct(self, p: str) -> None:
        t = self.next()
        if t.kind != "punct" or t.text != p:
            raise ValueError(f"expected {p!r}, got {t}")

    def ident(self) -> str:
        t = self.next()
        if t.kind not in ("ident", "word"):
            raise ValueError(f"expected identifier, got {t}")
        return t.text

    def qualified_name(self) -> tuple[str | None, str]:
        first = self.ident()
        t = self.peek()
        if t and t.kind == "op" and t.text == ".":
            self.next()
            return first, self.ident()
        return None, first

    def skip_parens(self) -> str:
        """Consume a balanced (...) group, returning its raw token text."""
        depth = 0
        parts: list[str] = []
        while True:
            t = self.next()
            if t.kind == "punct" and t.text == "(":
                depth += 1
                if depth == 1:
                    continue
            elif t.kind == "punct" and t.text == ")":
                depth -= 1
                if depth == 0:
                    return " ".join(parts)
            parts.append(_render(t))


def _render(t: Tok) -> str:
    if t.kind == "ident":
        return "`" + t.text.replace("`", "``") + "`"
    if t.kind == "string":
        return "'" + t.text.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return t.text


_TYPE_WORDS = {
    "tinyint", "smallint", "mediumint", "int", "integer", "bigint", "year",
    "float", "double", "real", "decimal", "numeric", "char", "varchar",
    "tinytext", "text", "mediumtext", "longtext", "binary", "varbinary",
    "tinyblob", "blob", "mediumblob", "longblob", "date", "datetime",
    "timestamp", "time", "bit", "enum", "set", "json", "boolean", "bool",
}


def parse_statements(sql: str) -> list[list[Tok]]:
    """Split a schema file into `;`-terminated statements (token-aware)."""
    toks = tokenize(sql)
    stmts: list[list[Tok]] = []
    cur: list[Tok] = []
    for t in toks:
        if t.kind == "punct" and t.text == ";":
            if cur:
                stmts.append(cur)
                cur = []
        else:
            cur.append(t)
    if cur:
        stmts.append(cur)
    return stmts


def parse_create_table(sql: str) -> TableInfo:
    for stmt in parse_statements(sql):
        info = _try_parse_create_table(stmt)
        if info is not None:
            return info
    raise ValueError("no CREATE TABLE statement found")


def _try_parse_create_table(toks: list[Tok]) -> TableInfo | None:
    p = _P(toks)
    if not p.eat_word("CREATE"):
        return None
    if not p.eat_word("TABLE"):
        return None
    if p.eat_word("IF"):
        p.eat_word("NOT")
        p.eat_word("EXISTS")
    db, name = p.qualified_name()
    info = TableInfo(db=db, name=name)
    p.expect_punct("(")
    while True:
        if _parse_def(p, info):
            t = p.next()
            if t.kind == "punct" and t.text == ")":
                break
            if not (t.kind == "punct" and t.text == ","):
                raise ValueError(f"expected ',' or ')', got {t}")
        else:
            break
    _parse_table_options(p, info)
    for pk in info.primary_key:
        info.column(pk).primary_key = True
    return info


def _parse_def(p: _P, info: TableInfo) -> bool:
    if p.at_word("PRIMARY"):
        p.next()
        p.eat_word("KEY")
        info.primary_key = _key_columns(p)
        _skip_index_options(p)
        return True
    if p.at_word("UNIQUE"):
        p.next()
        p.eat_word("KEY") or p.eat_word("INDEX")
        _maybe_index_name(p)
        info.unique_keys.append(_key_columns(p))
        _skip_index_options(p)
        return True
    if p.at_word("KEY", "INDEX", "FULLTEXT", "SPATIAL"):
        p.next()
        p.eat_word("KEY")
        _maybe_index_name(p)
        info.indexes.append(_key_columns(p))
        _skip_index_options(p)
        return True
    if p.at_word("CONSTRAINT", "FOREIGN", "CHECK"):
        # consume to end of this def (depth-aware)
        depth = 0
        while True:
            t = p.peek()
            if t is None:
                return True
            if t.kind == "punct" and t.text == "(":
                depth += 1
            elif t.kind == "punct" and t.text == ")":
                if depth == 0:
                    return True
                depth -= 1
            elif t.kind == "punct" and t.text == "," and depth == 0:
                return True
            p.next()
    return _parse_column(p, info)


def _skip_index_options(p: _P) -> None:
    """Consume trailing index options after a key's column list:
    USING BTREE|HASH, KEY_BLOCK_SIZE [=] n, COMMENT 'x', WITH PARSER x,
    VISIBLE/INVISIBLE (MySQL index_option grammar; reference golden
    tests/tool_241 schemas carry `KEY (...) USING BTREE`)."""
    while True:
        if p.eat_word("USING"):
            p.next()  # BTREE | HASH
        elif p.eat_word("KEY_BLOCK_SIZE"):
            t = p.peek()
            if t and t.kind == "op" and t.text == "=":
                p.next()
            elif t and t.kind == "punct" and t.text == "=":
                p.next()
            p.next()  # the size literal
        elif p.eat_word("COMMENT"):
            p.next()  # the string
        elif p.eat_word("WITH"):
            p.eat_word("PARSER")
            p.next()
        elif p.eat_word("VISIBLE") or p.eat_word("INVISIBLE"):
            pass
        else:
            return


def _maybe_index_name(p: _P) -> None:
    t = p.peek()
    if t and (t.kind == "ident" or (t.kind == "word" and t.text.lower() not in ("("))):
        if not (t.kind == "punct"):
            p.next()


def _key_columns(p: _P) -> list[str]:
    p.expect_punct("(")
    cols: list[str] = []
    while True:
        cols.append(p.ident())
        # optional prefix length / ASC / DESC
        t = p.peek()
        if t and t.kind == "punct" and t.text == "(":
            p.skip_parens()
            t = p.peek()
        while p.eat_word("ASC", "DESC"):
            t = p.peek()
        t = p.next()
        if t.kind == "punct" and t.text == ")":
            return cols
        if not (t.kind == "punct" and t.text == ","):
            raise ValueError(f"bad key column list at {t}")


def _parse_column(p: _P, info: TableInfo) -> bool:
    t = p.peek()
    if t is None or (t.kind == "punct"):
        return False
    name = p.ident()
    mysql = _parse_type(p)
    col = ColumnInfo(name=name, mysql=mysql)
    _parse_column_attrs(p, col, info)
    info.columns.append(col)
    return True


def _parse_type(p: _P) -> MySQLType:
    word = p.next()
    if word.kind != "word" or word.text.lower() not in _TYPE_WORDS:
        raise ValueError(f"unknown column type {word}")
    base = word.text.lower()
    if base in ("boolean", "bool"):
        return MySQLType("tinyint", 1)
    length = scale = None
    members: tuple[str, ...] = ()
    t = p.peek()
    if t and t.kind == "punct" and t.text == "(":
        p.next()
        if base in ("enum", "set"):
            mem = []
            while True:
                s = p.next()
                if s.kind != "string":
                    raise ValueError(f"enum/set member must be string, got {s}")
                mem.append(s.text)
                nxt = p.next()
                if nxt.kind == "punct" and nxt.text == ")":
                    break
            members = tuple(mem)
        else:
            nums = []
            while True:
                s = p.next()
                if s.kind == "num":
                    nums.append(int(float(s.text)))
                elif s.kind == "punct" and s.text == ")":
                    break
            length = nums[0] if nums else None
            scale = nums[1] if len(nums) > 1 else None
    unsigned = False
    while True:
        if p.eat_word("UNSIGNED"):
            unsigned = True
        elif p.eat_word("SIGNED", "ZEROFILL"):
            pass
        else:
            break
    return MySQLType(base, length, scale, unsigned, members)


def _parse_column_attrs(p: _P, col: ColumnInfo, info: TableInfo) -> None:
    while True:
        t = p.peek()
        if t is None or (t.kind == "punct" and t.text in (",", ")")):
            return
        if p.eat_word("NOT"):
            p.eat_word("NULL")
            col.nullable = False
        elif p.eat_word("NULL"):
            col.nullable = True
        elif p.eat_word("DEFAULT"):
            col.has_default = True
            col.default = _parse_default(p)
        elif p.eat_word("AUTO_INCREMENT"):
            col.auto_increment = True
        elif p.eat_word("AUTO_RANDOM"):
            bits = 5
            nxt = p.peek()
            if nxt and nxt.kind == "punct" and nxt.text == "(":
                bits = int(p.skip_parens() or "5")
            col.auto_random_bits = bits
        elif p.eat_word("PRIMARY"):
            p.eat_word("KEY")
            col.primary_key = True
            info.primary_key = [col.name]
        elif p.eat_word("UNIQUE"):
            p.eat_word("KEY")
            col.unique = True
            info.unique_keys.append([col.name])
        elif p.eat_word("COMMENT"):
            col.comment = p.next().text
        elif p.eat_word("CHARACTER"):
            p.eat_word("SET")
            col.charset = p.ident()
        elif p.eat_word("CHARSET"):
            col.charset = p.ident()
        elif p.eat_word("COLLATE"):
            col.collation = p.ident()
        elif p.eat_word("ON"):
            p.eat_word("UPDATE")
            if p.at_word("CURRENT_TIMESTAMP", "NOW", "LOCALTIME", "LOCALTIMESTAMP"):
                p.next()
                nxt = p.peek()
                if nxt and nxt.kind == "punct" and nxt.text == "(":
                    p.skip_parens()
                col.on_update_current = True
        elif p.eat_word("GENERATED"):
            p.eat_word("ALWAYS")
            p.eat_word("AS")
            col.generated_expr = p.skip_parens()
            col.generated_stored = p.eat_word("STORED")
            p.eat_word("VIRTUAL")
        elif p.eat_word("AS"):
            col.generated_expr = p.skip_parens()
            col.generated_stored = p.eat_word("STORED")
            p.eat_word("VIRTUAL")
        elif p.eat_word("REFERENCES"):
            p.qualified_name()
            nxt = p.peek()
            if nxt and nxt.kind == "punct" and nxt.text == "(":
                p.skip_parens()
        else:
            p.next()  # tolerate unknown attribute words


def _parse_default(p: _P):
    if p.at_word("CURRENT_TIMESTAMP", "NOW", "LOCALTIME", "LOCALTIMESTAMP"):
        p.next()
        nxt = p.peek()
        if nxt and nxt.kind == "punct" and nxt.text == "(":
            p.skip_parens()
        return CURRENT_TIMESTAMP
    if p.eat_word("NULL"):
        return None
    if p.eat_word("TRUE"):
        return "1"
    if p.eat_word("FALSE"):
        return "0"
    t = p.next()
    if t.kind == "op" and t.text == "-":
        return "-" + p.next().text
    return t.text


def _parse_table_options(p: _P, info: TableInfo) -> None:
    while True:
        t = p.peek()
        if t is None:
            return
        if p.at_word("PARTITION"):
            # capture the raw partition clause for partitionBy planning
            parts = []
            while p.peek() is not None:
                parts.append(_render(p.next()))
            info.partition_by = " ".join(parts)
            return
        if t.kind == "word":
            key = p.next().text.lower()
            nxt = p.peek()
            if nxt and nxt.kind == "punct" and nxt.text == "=":
                p.next()
                val_tok = p.peek()
                if val_tok and val_tok.kind == "punct" and val_tok.text == "(":
                    info.table_options[key] = p.skip_parens()
                else:
                    info.table_options[key] = p.next().text
            continue
        p.next()


def parse_create_database(sql: str) -> str:
    for stmt in parse_statements(sql):
        p = _P(stmt)
        if p.eat_word("CREATE") and p.eat_word("DATABASE", "SCHEMA"):
            if p.eat_word("IF"):
                p.eat_word("NOT")
                p.eat_word("EXISTS")
            return p.ident()
    raise ValueError("no CREATE DATABASE statement found")


@dataclass
class ViewInfo:
    name: str
    columns: list[str]  # explicit output column list; [] = from SELECT
    select: str  # the view body, MySQL quoting preserved


def parse_create_view(sql: str) -> ViewInfo:
    """Extract the view definition from a Mydumper `-schema-view.sql` file
    (reference: discovered at loader.go:39-46, replayed at
    restore.go:553-602; fixture shape at tests/view/data/*-schema-view.sql:
    SET statements around one
    `CREATE ALGORITHM=... DEFINER=... VIEW `v` (`cols`) AS SELECT ...;`).

    The DEFINER/ALGORITHM/SECURITY noise is discarded; the result is the
    view name, the optional explicit column list, and the raw SELECT text
    (quoting normalized later, at registration time)."""
    import re as _re

    # statement = the CREATE ... VIEW line(s) up to its terminating ';'
    m = _re.search(
        r"CREATE\b[^;]*?\bVIEW\s+"
        r"(?:`[^`]+`\s*\.\s*)?"  # optional `db`. qualifier
        r"(?:`(?P<q>[^`]+)`|(?P<p>[A-Za-z0-9_$.]+))"  # `name` or name
        r"\s*(?:\((?P<cols>[^)]*)\))?"
        r"\s*AS\s+(?P<body>.*?);[ \t]*$",
        sql,
        _re.IGNORECASE | _re.DOTALL | _re.MULTILINE,
    )
    if not m:
        raise ValueError("no CREATE VIEW statement found")
    name = m.group("q") or m.group("p")
    if "." in name and m.group("p"):
        name = name.split(".")[-1]
    cols = []
    if m.group("cols"):
        cols = [
            c.strip().strip("`").strip('"')
            for c in m.group("cols").split(",")
            if c.strip()
        ]
    return ViewInfo(name=name, columns=cols, select=m.group("body").strip())


def view_select_for_spark(select: str) -> str:
    """Normalize a MySQL view body for Spark SQL against the warehouse
    catalog convention (cli.py sql registers each table as the single
    backticked identifier `db.tbl`): qualified `db`.`tbl` references
    collapse into one backticked `db.tbl`. Backtick quoting itself is
    valid Spark SQL and is kept."""
    import re as _re

    return _re.sub(r"`([^`]+)`\s*\.\s*`([^`]+)`", r"`\1.\2`", select)
