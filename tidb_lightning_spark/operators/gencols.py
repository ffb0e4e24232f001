"""MySQL expression -> Spark SQL translation for generated columns
(reference: expression.RewriteAstExpr usage at sql2kv.go:103-166; tested
surface = tests/generated_columns fixtures, FIXTURES.md F7).

Token-level rewrite: identifiers/strings/numbers pass through with Spark
quoting; function names are mapped where Spark's builtin differs. The
result is evaluated by Catalyst via F.expr — no Python at runtime.
"""

from __future__ import annotations

from tidb_lightning_spark.schema.ddl import Tok, tokenize

# MySQL function -> Spark SQL function (identical names pass through: pow,
# sha1, repeat, unhex, hex, concat, from_unixtime, aes_encrypt, abs, ceil,
# floor, round, upper, lower, length, substring, coalesce, if, nullif, ...)
_SIMPLE_FN_MAP = {
    "week": "weekofyear",
    "curdate": "current_date",
    "now": "current_timestamp",
    "sysdate": "current_timestamp",
    "day": "dayofmonth",
    "truncate": "trunc",
    "ucase": "upper",
    "lcase": "lower",
}


def translate_mysql_expr(expr: str) -> str:
    toks = tokenize(expr)
    out: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        nxt = toks[i + 1] if i + 1 < len(toks) else None
        if t.kind == "word":
            low = t.text.lower()
            is_call = nxt is not None and nxt.kind == "punct" and nxt.text == "("
            if is_call and low == "json_object":
                # JSON_OBJECT(k1, v1, ...) -> to_json(map(k1, v1, ...))
                out.append("to_json(map")
                i += 2
                out.append("(")
                depth = 1
                while i < len(toks) and depth > 0:
                    tt = toks[i]
                    if tt.kind == "punct" and tt.text == "(":
                        depth += 1
                    elif tt.kind == "punct" and tt.text == ")":
                        depth -= 1
                        if depth == 0:
                            out.append(")")
                            break
                    out.append(_render(tt))
                    i += 1
                out.append(")")
                i += 1
                continue
            if is_call and low in _SIMPLE_FN_MAP:
                out.append(_SIMPLE_FN_MAP[low])
                i += 1
                continue
            if low == "div" and not is_call:
                out.append("div")
                i += 1
                continue
            out.append(t.text)
            i += 1
            continue
        out.append(_render(t))
        i += 1
    return " ".join(out)


def _render(t: Tok) -> str:
    if t.kind == "ident":
        return "`" + t.text.replace("`", "``") + "`"
    if t.kind == "string":
        return "'" + t.text.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return t.text
