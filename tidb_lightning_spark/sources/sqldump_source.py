"""Mydumper SQL-dump source (reference: lightning/mydump/parser.go:319-521
+ ragel lexer parser_generated.go).

Files are `INSERT INTO tbl [(cols)] VALUES (...),(...);` dumps. No Spark
reader exists for this, so it's the one place we drop to Python on the
executors — but Spark-first in shape:

    spark.read.format("text").option("wholetext", true)   # 1 row = 1 file
      -> mapInPandas(parse)                               # Arrow-batched

Mydumper writes files capped at a configured size (the reference splits
>256 MiB files only for strict CSV, region.go:236-286 — SQL files are
per-file tasks there too), so file==task parallelism matches the
reference's unit of work. Parallelism at 100 TB comes from file count.

Value domain mirrors parser.go:468-518: every scalar is emitted as a
STRING datum (typing happens at cast time, like the CSV path):
  NULL -> None, TRUE/FALSE -> '1'/'0', numbers -> literal text,
  strings -> unescaped text,
  X'..'/0x.. hex -> latin-1-decoded byte string (byte-preserving),
  b'..'/0b.. bit -> decimal integer string.

A `_row_seq` column (0-based row index within the file) rides along for
deterministic row-id assignment (SURVEY.md §2.D1).

The statement column list (if any) is read driver-side via `peek_columns`
— mydumper emits one form per file; the executor parser asserts
consistency and fails the task on mixed forms.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SQLDumpError(ValueError):
    pass


_WS = set(" \t\r\n")


@dataclass
class _Scanner:
    text: str
    pos: int = 0

    def skip_ws_comments(self) -> None:
        t, n = self.text, len(self.text)
        while self.pos < n:
            ch = t[self.pos]
            if ch in _WS:
                self.pos += 1
            elif t.startswith("--", self.pos):
                nl = t.find("\n", self.pos)
                self.pos = n if nl < 0 else nl + 1
            elif ch == "#":
                nl = t.find("\n", self.pos)
                self.pos = n if nl < 0 else nl + 1
            elif t.startswith("/*", self.pos):
                end = t.find("*/", self.pos + 2)
                if end < 0:
                    raise SQLDumpError("unterminated block comment")
                self.pos = end + 2
            else:
                return

    def eof(self) -> bool:
        self.skip_ws_comments()
        return self.pos >= len(self.text)

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def word(self) -> str:
        """Read an unquoted word (keyword or bare identifier)."""
        self.skip_ws_comments()
        start = self.pos
        t, n = self.text, len(self.text)
        while self.pos < n and (t[self.pos].isalnum() or t[self.pos] in "_$."):
            self.pos += 1
        return t[start : self.pos]

    def ident(self) -> str:
        self.skip_ws_comments()
        if self.peek() == "`":
            self.pos += 1
            out = []
            t, n = self.text, len(self.text)
            while self.pos < n:
                if t[self.pos] == "`":
                    if self.pos + 1 < n and t[self.pos + 1] == "`":
                        out.append("`")
                        self.pos += 2
                        continue
                    self.pos += 1
                    return "".join(out)
                out.append(t[self.pos])
                self.pos += 1
            raise SQLDumpError("unterminated quoted identifier")
        w = self.word()
        if not w:
            raise SQLDumpError(f"expected identifier at offset {self.pos}")
        return w

    def expect(self, ch: str) -> None:
        self.skip_ws_comments()
        if self.peek() != ch:
            raise SQLDumpError(
                f"expected {ch!r} at offset {self.pos}: "
                f"{self.text[self.pos:self.pos+30]!r}"
            )
        self.pos += 1

    def try_char(self, ch: str) -> bool:
        self.skip_ws_comments()
        if self.peek() == ch:
            self.pos += 1
            return True
        return False

    def quoted_string(self, quote: str) -> str:
        # assumes opening quote consumed; MySQL backslash + doubled-quote
        # escapes (parser.go:270-316)
        out = []
        t, n = self.text, len(self.text)
        while self.pos < n:
            ch = t[self.pos]
            if ch == "\\" and self.pos + 1 < n:
                nxt = t[self.pos + 1]
                out.append(
                    {"0": "\0", "n": "\n", "t": "\t", "r": "\r", "b": "\b",
                     "Z": "\x1a"}.get(nxt, nxt)
                )
                self.pos += 2
            elif ch == quote:
                if self.pos + 1 < n and t[self.pos + 1] == quote:
                    out.append(quote)
                    self.pos += 2
                else:
                    self.pos += 1
                    return "".join(out)
            else:
                out.append(ch)
                self.pos += 1
        raise SQLDumpError("unterminated string literal")

    def value(self) -> str | None:
        """One scalar literal -> canonical string datum (or None for NULL)."""
        self.skip_ws_comments()
        ch = self.peek()
        if ch in ("'", '"'):
            self.pos += 1
            return self.quoted_string(ch)
        if ch == "`":
            return self.ident()  # unusual but tolerated
        start = self.pos
        w = self.word()
        if not w:
            raise SQLDumpError(f"expected value at offset {self.pos}")
        u = w.upper()
        if u == "NULL":
            return None
        if u == "TRUE":
            return "1"
        if u == "FALSE":
            return "0"
        if u in ("X", "B") and self.peek() == "'":
            self.pos += 1
            body = self.quoted_string("'")
            return _hex_to_str(body) if u == "X" else _bits_to_str(body)
        if u.startswith("0X"):
            return _hex_to_str(w[2:])
        if u.startswith("0B") and set(w[2:]) <= {"0", "1"}:
            return _bits_to_str(w[2:])
        if ch in "+-":
            # sign came through word()? word() doesn't consume signs
            pass
        if w:
            return w
        raise SQLDumpError(f"bad value at offset {start}")

    def signed_number(self) -> str:
        self.skip_ws_comments()
        sign = ""
        if self.peek() in "+-":
            sign = self.text[self.pos]
            self.pos += 1
        v = self.value()
        if v is None:
            raise SQLDumpError("sign before NULL")
        return ("-" + v) if sign == "-" else v


def _hex_to_str(body: str) -> str:
    body = body.strip()
    if len(body) % 2:
        body = "0" + body
    return bytes.fromhex(body).decode("latin-1")


def _bits_to_str(body: str) -> str:
    return str(int(body, 2)) if body else "0"


@dataclass
class Statement:
    table: str
    columns: list[str] | None
    rows: list[list[str | None]]


def parse_insert_statements(text: str) -> Iterator[Statement]:
    """Yield INSERT/REPLACE statements (parser.go:346-412 dry-run grammar)."""
    sc = _Scanner(text)
    while not sc.eof():
        w = sc.word().upper()
        if w in ("INSERT", "REPLACE"):
            if sc.word().upper() != "INTO":
                raise SQLDumpError("expected INTO")
            table = sc.ident()
            if sc.try_char("."):
                table = sc.ident()  # `db`.`tbl`: keep table part
            elif "." in table:
                table = table.rsplit(".", 1)[1]  # unquoted db.tbl
            sc.skip_ws_comments()
            columns: list[str] | None = None
            if sc.peek() == "(":
                sc.expect("(")
                columns = []
                if not sc.try_char(")"):
                    while True:
                        columns.append(sc.ident())
                        if sc.try_char(","):
                            continue
                        sc.expect(")")
                        break
            kw = sc.word().upper()
            if kw == "SET":
                raise SQLDumpError("INSERT ... SET form not supported")
            if kw not in ("VALUES", "VALUE"):
                raise SQLDumpError(f"expected VALUES, got {kw!r}")
            rows: list[list[str | None]] = []
            while True:
                sc.expect("(")
                row: list[str | None] = []
                if not sc.try_char(")"):
                    while True:
                        sc.skip_ws_comments()
                        if sc.peek() in "+-":
                            row.append(sc.signed_number())
                        else:
                            row.append(sc.value())
                        if sc.try_char(","):
                            continue
                        sc.expect(")")
                        break
                rows.append(row)
                if sc.try_char(","):
                    continue
                break
            sc.try_char(";")
            yield Statement(table, columns, rows)
        else:
            # non-INSERT statement (SET, comments already skipped): skip to ';'
            end = sc.text.find(";", sc.pos)
            sc.pos = len(sc.text) if end < 0 else end + 1


class _Truncated(Exception):
    """Peek window ended mid-statement; retry with a bigger read."""


def _peek_insert_header(text: str, complete: bool) -> list[str] | None:
    """Column list of the first INSERT, parsing ONLY up to the VALUES
    keyword — never the row data, so a multi-MiB first statement (mydumper
    statement-size is configurable) costs a few KiB of parsing, not a full
    statement parse. `complete` = text covers the whole file; when False,
    any parse failure means the window clipped the header mid-token."""
    sc = _Scanner(text)
    try:
        while not sc.eof():
            w = sc.word().upper()
            if w in ("INSERT", "REPLACE"):
                if sc.word().upper() != "INTO":
                    raise SQLDumpError("expected INTO")
                sc.ident()
                if sc.try_char("."):
                    sc.ident()
                sc.skip_ws_comments()
                columns: list[str] | None = None
                if sc.peek() == "(":
                    sc.expect("(")
                    columns = []
                    if not sc.try_char(")"):
                        while True:
                            columns.append(sc.ident())
                            if sc.try_char(","):
                                continue
                            sc.expect(")")
                            break
                kw = sc.word().upper()
                if kw not in ("VALUES", "VALUE", "SET"):
                    raise SQLDumpError(f"expected VALUES, got {kw!r}")
                return columns
            # non-INSERT statement: skip to its terminator
            end = sc.text.find(";", sc.pos)
            if end < 0:
                if complete:
                    return None
                raise _Truncated()
            sc.pos = end + 1
        if not complete:
            # the window may end inside a comment/whitespace run that
            # continues into an INSERT beyond it
            raise _Truncated()
        return None
    except SQLDumpError:
        if complete:
            raise
        raise _Truncated() from None


def peek_columns(path: str, encoding: str = "utf-8") -> list[str] | None:
    """Driver-side: column list of the first INSERT (None = positional).
    Compressed dumps are peeked through the shared decompressing opener.
    The read window starts small and grows until one complete statement
    HEADER parses — immune to first statements longer than the window."""
    from tidb_lightning_spark.sources.csv_source import _decompress_open

    size = 1 << 16
    while True:
        with _decompress_open(path) as f:
            head = f.read(size)
        complete = len(head) < size
        text = head.decode(encoding, errors="replace")
        try:
            return _peek_insert_header(text, complete)
        except _Truncated:
            size *= 4


def read_sql_files(
    spark: SparkSession,
    paths: list[str],
    n_columns: int,
    encoding: str = "utf-8",
) -> DataFrame:
    """paths -> DataFrame of `_c0.._cN` strings + `_row_seq` + `_src_file`.

    All statements in a group must agree on column-list arity with
    `n_columns` (the caller derives it from peek_columns / table schema).
    """
    out_schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(n_columns)]
        + [
            T.StructField("_row_seq", T.LongType(), False),
            T.StructField("_src_file", T.StringType(), False),
        ]
    )

    from tidb_lightning_spark._shipping import ensure_shipped

    ensure_shipped(spark)
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(paths)
        .selectExpr("value", "input_file_name() as _src_file")
    )

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            for content, src in zip(pdf["value"], pdf["_src_file"]):
                seq = 0
                cols_names = [f"_c{i}" for i in range(n_columns)]
                buf: list[list] = []
                for stmt in parse_insert_statements(content):
                    for row in stmt.rows:
                        if len(row) != n_columns:
                            raise SQLDumpError(
                                f"row arity {len(row)} != expected {n_columns} "
                                f"in {src}"
                            )
                        buf.append(row + [seq, src])
                        seq += 1
                if buf:
                    yield pd.DataFrame(
                        buf, columns=cols_names + ["_row_seq", "_src_file"]
                    )

    return raw.mapInPandas(parse_batches, schema=out_schema)
