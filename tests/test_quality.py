"""Gopher-style repetition filters (functions/quality.py): line-level
metrics need multi-line text, which the fixture corpus lacks — exercise
them on synthetic docs, asserting exact expected values AND Spark/DuckDB
twin agreement on the same rows."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tidb_lightning_spark.functions import quality as QL

DOCS = [
    # (doc_id, text)
    (1, "alpha beta gamma\nalpha beta gamma\nunique line here"),
    (2, "one line only"),
    (3, ""),
    (4, "- bullet a\n- bullet b\nplain line"),
    (5, "cut off here...\nanother trunc...\nfull sentence stays"),
    (6, "# # # # tags tags"),
    (7, "word word word word word other"),
    (8, "a\n\n\na"),  # empty lines dropped, duplicate 'a' lines
    (9, "the quick brown fox jumps over two lazy dogs today"),
]


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _vals(qdf, col_builder):
    rows = qdf.select("doc_id", col_builder(F.col("text")).alias("v")).collect()
    return {r.doc_id: r.v for r in rows}


def test_dup_line_frac(qdf):
    v = _vals(qdf, QL.dup_line_frac)
    assert v[1] == pytest.approx(1 - 2 / 3)  # 3 lines, 2 distinct
    assert v[2] == 0.0
    assert v[3] == 0.0
    assert v[8] == pytest.approx(0.5)  # 2 'a' lines, 1 distinct


def test_dup_line_char_frac(qdf):
    v = _vals(qdf, QL.dup_line_char_frac)
    # doc 1: two 16-char duplicate lines out of 16+16+16 = 48 chars
    assert v[1] == pytest.approx(32 / 48)
    assert v[2] == 0.0
    assert v[8] == pytest.approx(1.0)


def test_token_repetition(qdf):
    dup = _vals(qdf, QL.dup_token_frac)
    top = _vals(qdf, QL.top_token_frac)
    # doc 7: 6 tokens, 2 distinct; 'word' covers 5/6
    assert dup[7] == pytest.approx(1 - 2 / 6)
    assert top[7] == pytest.approx(5 / 6)
    assert dup[3] == 0.0 and top[3] == 0.0


def test_layout_ratios(qdf):
    bullets = _vals(qdf, QL.bullet_line_frac)
    ellipsis = _vals(qdf, QL.ellipsis_line_frac)
    symbols = _vals(qdf, QL.symbol_word_ratio)
    assert bullets[4] == pytest.approx(2 / 3)
    assert ellipsis[5] == pytest.approx(2 / 3)
    assert symbols[6] == pytest.approx(4 / 6)  # four '#' / 6 tokens


def test_gopher_keep_flags(qdf):
    v = _vals(qdf, QL.gopher_keep)
    assert v[1] is False  # dup-line heavy
    assert v[6] is False  # symbol soup
    assert v[7] is False  # top-token 5/6
    assert v[4] is False  # '-' and 'bullet' each 2/8 tokens > 0.20
    assert v[9] is True  # clean prose: all rules pass
    assert v[3] is False  # below min_words


SQL_BUILDERS = [
    ("dup_line_frac", QL.dup_line_frac, QL.sql_dup_line_frac),
    ("dup_line_char_frac", QL.dup_line_char_frac, QL.sql_dup_line_char_frac),
    ("dup_token_frac", QL.dup_token_frac, QL.sql_dup_token_frac),
    ("top_token_frac", QL.top_token_frac, QL.sql_top_token_frac),
    ("symbol_word_ratio", QL.symbol_word_ratio, QL.sql_symbol_word_ratio),
    ("bullet_line_frac", QL.bullet_line_frac, QL.sql_bullet_line_frac),
    ("ellipsis_line_frac", QL.ellipsis_line_frac, QL.sql_ellipsis_line_frac),
    ("gopher_keep", QL.gopher_keep, QL.sql_gopher_keep),
]


@pytest.mark.parametrize(
    "name,spark_fn,sql_fn", SQL_BUILDERS, ids=[b[0] for b in SQL_BUILDERS]
)
def test_sql_twins_agree_on_multiline(qdf, name, spark_fn, sql_fn):
    """Every builder's DuckDB twin must agree bit-for-bit on the
    synthetic multi-line docs (the registry parity test only sees the
    single-line fixture corpus)."""
    got = _vals(qdf, spark_fn)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    rows = con.execute(
        f"SELECT doc_id, {sql_fn('text')} FROM docs"
    ).fetchall()
    want = {r[0]: r[1] for r in rows}
    assert got == want, f"{name}: {got} != {want}"


def test_hist_quantiles_within_one_bucket_of_exact(spark):
    """quantiles_by_returnflag_hist's documented accuracy bound: every
    estimate lands within one bucket width (0.5 for quantities, 64 for
    prices) of the exact interpolated percentile."""
    import duckdb as _dd

    from tidb_lightning_spark.plans import queries as Q

    sf = "/root/testdata/sf0.01"
    got = {
        r["l_returnflag"]: r
        for r in Q.registry()["quantiles_by_returnflag_hist"]
        .spark(spark, sf)
        .collect()
    }
    con = _dd.connect()
    exact = con.execute(
        f"""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS m,
               quantile_cont(l_quantity, 0.25) AS q1,
               quantile_cont(l_quantity, 0.9) AS p90,
               quantile_cont(l_extendedprice, 0.95) AS p95
        FROM '{sf}/lineitem.parquet' GROUP BY l_returnflag
        """
    ).fetchall()
    assert len(exact) == len(got)
    for flag, m, q1, p90, p95 in exact:
        r = got[flag]
        assert abs(r["median_qty"] - m) <= 0.5
        assert abs(r["q1_qty"] - q1) <= 0.5
        assert abs(r["p90_qty"] - p90) <= 0.5
        assert abs(r["p95_price"] - p95) <= 64.0
