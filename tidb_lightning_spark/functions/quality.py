"""Gopher-style repetition / quality filters for training corpora
(beyond-reference surface, companion to functions/text.py).

Implements the repetition family of document-quality rules from the
public Gopher corpus-filtering recipe (Rae et al. 2021, §A1.1) plus the
C4 symbol/bullet heuristics — the standard pre-training quality gate:

  * duplicate-line fraction and duplicate-line *character* fraction
    (boilerplate pages repeat nav/footer lines);
  * duplicate-token fraction and most-common-token fraction
    (keyword-stuffed or degenerate pages);
  * symbol-to-word ratio ('#', ellipsis), bullet-line and
    ellipsis-line fractions;
  * a combined `gopher_keep` verdict with the published thresholds.

Everything is a single-stage Catalyst expression over array/lambda
builtins — per-row, no shuffle, no UDF — and every builder has an exact
DuckDB SQL twin for the driver's value-hash gate. Tokenization and the
60-bit hash are shared with functions/text.py so the whole text surface
agrees on what a "token" is.

The per-document *top bigram* statistic (which needs a per-doc argmax
over grouped counts, i.e. a shuffle) lives in plans/queries.py as
`quality_top_bigram` — it is the one repetition rule that is cheaper as
a grouped aggregation than as a per-row array fold at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tidb_lightning_spark.functions.text import SQL_TOKENS, TOKEN_WS, tokens

# ---------------------------------------------------------------------------
# line-level repetition
# ---------------------------------------------------------------------------


def doc_lines(col: Column) -> Column:
    """Non-empty lines of a document (split on \\n, '' dropped);
    null-safe — NULL text has zero lines on both engines."""
    return F.filter(
        F.split(F.coalesce(col, F.lit("")), "\n"), lambda x: x != ""
    )


def dup_line_frac(col: Column) -> Column:
    """Fraction of non-empty lines that are repeats of an earlier line:
    1 - distinct/total. 0.0 for empty/one-line docs."""
    lines = doc_lines(col)
    n = F.size(lines)
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / n.cast("double")
    )


def dup_line_char_frac(col: Column) -> Column:
    """Fraction of line-characters living in lines that occur more than
    once (the Gopher 'characters within duplicate lines' rule). Nested
    array fold: for each distinct line value with count > 1, charge
    count*len(line) characters. O(distinct*total) per row — fine, line
    counts are small and the work is per-row (scales linearly in docs).
    """
    # fold accumulators and per-line products in LONG: a document near
    # Spark's 2 GiB string cap can overflow a 32-bit sum, and the DuckDB
    # twin's list_sum computes in BIGINT/HUGEINT — the same overflow
    # class already fixed in token_concentration
    lines = doc_lines(col)
    total = F.aggregate(
        F.transform(lines, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dup_chars = F.aggregate(
        F.transform(
            F.array_distinct(lines),
            lambda d: F.when(
                F.size(F.filter(lines, lambda x: x == d)) > 1,
                F.size(F.filter(lines, lambda x: x == d)).cast("long")
                * F.length(d).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        dup_chars.cast("double") / total.cast("double")
    )


# ---------------------------------------------------------------------------
# token-level repetition
# ---------------------------------------------------------------------------


def dup_token_frac(col: Column) -> Column:
    """1 - distinct_tokens/tokens: how much of the doc is re-used words."""
    t = tokens(F.lower(col))
    n = F.size(t)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(t)).cast("double") / n.cast("double")
    )


def top_token_frac(col: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token (the
    1-gram version of Gopher's top-n-gram rule). Array fold per row."""
    t = tokens(F.lower(col))
    n = F.size(t)
    top = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda d: F.size(F.filter(t, lambda x: x == d)),
        )
    )
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        top.cast("double") / n.cast("double")
    )


# ---------------------------------------------------------------------------
# symbol / layout heuristics (C4-family)
# ---------------------------------------------------------------------------

_SYMBOL_RE = r"#|\.\.\."


def symbol_word_ratio(col: Column) -> Column:
    """(# + ellipsis occurrences) / words."""
    n_tok = F.size(tokens(col))
    syms = F.regexp_count(col, F.lit(_SYMBOL_RE))
    return syms.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")


def bullet_line_frac(col: Column) -> Column:
    """Fraction of lines that start like a bullet ('-', '*', '•')."""
    lines = doc_lines(col)
    n = F.size(lines)
    hits = F.size(F.filter(lines, lambda x: x.rlike("^" + TOKEN_WS[:-1] + "*[-*•]")))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def ellipsis_line_frac(col: Column) -> Column:
    """Fraction of lines ending in '...' (truncated scrapes)."""
    lines = doc_lines(col)
    n = F.size(lines)
    hits = F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\." + TOKEN_WS[:-1] + "*$")))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


# ---------------------------------------------------------------------------
# combined verdict (published Gopher thresholds)
# ---------------------------------------------------------------------------

GOPHER_THRESHOLDS = {
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_top_token_frac": 0.20,
    "max_symbol_word_ratio": 0.10,
    "max_bullet_line_frac": 0.90,
    "max_ellipsis_line_frac": 0.30,
    "min_words": 5,
    "max_words": 100_000,
}


def gopher_keep(col: Column) -> Column:
    """True when the document passes every repetition/layout rule.
    `min_words` is 5 (not Gopher's 50) so the verdict is non-degenerate
    on short synthetic fixtures; the threshold table is one dict."""
    th = GOPHER_THRESHOLDS
    n_tok = F.size(tokens(col))
    return (
        (dup_line_frac(col) <= th["max_dup_line_frac"])
        & (dup_line_char_frac(col) <= th["max_dup_line_char_frac"])
        & (top_token_frac(col) <= th["max_top_token_frac"])
        & (symbol_word_ratio(col) <= th["max_symbol_word_ratio"])
        & (bullet_line_frac(col) <= th["max_bullet_line_frac"])
        & (ellipsis_line_frac(col) <= th["max_ellipsis_line_frac"])
        & (n_tok >= th["min_words"])
        & (n_tok <= th["max_words"])
    )


# ---------------------------------------------------------------------------
# ANSI-SQL twins (DuckDB)
# ---------------------------------------------------------------------------

_SQL_LINES = (
    "list_filter(string_split(coalesce({col}, ''), chr(10)),"
    " x -> x != '')"
)


def sql_dup_line_frac(col: str) -> str:
    lines = _SQL_LINES.format(col=col)
    return (
        f"(CASE WHEN len({lines}) <= 1 THEN 0.0 ELSE "
        f"1.0 - CAST(len(list_distinct({lines})) AS DOUBLE) "
        f"/ CAST(len({lines}) AS DOUBLE) END)"
    )


def sql_dup_line_char_frac(col: str) -> str:
    lines = _SQL_LINES.format(col=col)
    total = f"list_sum(list_transform({lines}, x -> len(x)))"
    dup = (
        f"list_sum(list_transform(list_distinct({lines}), "
        f"d -> CASE WHEN len(list_filter({lines}, x -> x = d)) > 1 "
        f"THEN len(list_filter({lines}, x -> x = d)) * len(d) ELSE 0 END))"
    )
    return (
        f"(CASE WHEN coalesce({total}, 0) <= 0 THEN 0.0 ELSE "
        f"CAST({dup} AS DOUBLE) / CAST({total} AS DOUBLE) END)"
    )


def sql_dup_token_frac(col: str) -> str:
    t = SQL_TOKENS.format(col=f"lower({col})")
    return (
        f"(CASE WHEN len({t}) <= 0 THEN 0.0 ELSE "
        f"1.0 - CAST(len(list_distinct({t})) AS DOUBLE) "
        f"/ CAST(len({t}) AS DOUBLE) END)"
    )


def sql_top_token_frac(col: str) -> str:
    t = SQL_TOKENS.format(col=f"lower({col})")
    top = (
        f"list_max(list_transform(list_distinct({t}), "
        f"d -> len(list_filter({t}, x -> x = d))))"
    )
    return (
        f"(CASE WHEN len({t}) <= 0 THEN 0.0 ELSE "
        f"CAST({top} AS DOUBLE) / CAST(len({t}) AS DOUBLE) END)"
    )


def sql_symbol_word_ratio(col: str) -> str:
    n_tok = f"len({SQL_TOKENS.format(col=col)})"
    syms = f"len(regexp_extract_all({col}, '{_SYMBOL_RE}'))"
    return (
        f"(CAST({syms} AS DOUBLE) / CAST(greatest({n_tok}, 1) AS DOUBLE))"
    )


def sql_bullet_line_frac(col: str) -> str:
    lines = _SQL_LINES.format(col=col)
    hits = (
        f"len(list_filter({lines}, "
        f"x -> regexp_matches(x, '^{TOKEN_WS[:-1]}*[-*•]')))"
    )
    return (
        f"(CASE WHEN len({lines}) <= 0 THEN 0.0 ELSE "
        f"CAST({hits} AS DOUBLE) / CAST(len({lines}) AS DOUBLE) END)"
    )


def sql_ellipsis_line_frac(col: str) -> str:
    lines = _SQL_LINES.format(col=col)
    hits = (
        f"len(list_filter({lines}, "
        f"x -> regexp_matches(x, '\\.\\.\\.{TOKEN_WS[:-1]}*$')))"
    )
    return (
        f"(CASE WHEN len({lines}) <= 0 THEN 0.0 ELSE "
        f"CAST({hits} AS DOUBLE) / CAST(len({lines}) AS DOUBLE) END)"
    )


def sql_gopher_keep(col: str) -> str:
    th = GOPHER_THRESHOLDS
    n_tok = f"len({SQL_TOKENS.format(col=col)})"
    return (
        f"({sql_dup_line_frac(col)} <= {th['max_dup_line_frac']} "
        f"AND {sql_dup_line_char_frac(col)} <= {th['max_dup_line_char_frac']} "
        f"AND {sql_top_token_frac(col)} <= {th['max_top_token_frac']} "
        f"AND {sql_symbol_word_ratio(col)} <= {th['max_symbol_word_ratio']} "
        f"AND {sql_bullet_line_frac(col)} <= {th['max_bullet_line_frac']} "
        f"AND {sql_ellipsis_line_frac(col)} <= {th['max_ellipsis_line_frac']} "
        f"AND {n_tok} >= {th['min_words']} "
        f"AND {n_tok} <= {th['max_words']})"
    )
