"""Cross-engine twin-agreement fuzz: the text/quality builders must
produce IDENTICAL values in Spark and DuckDB on adversarial inputs —
exotic whitespace (\\x0b is inside Java's \\s but not RE2's: the reason
tokenization uses an explicit class), control chars, unicode, empty and
whitespace-only strings. Deterministic corpus (seeded), one batch per
engine."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tidb_lightning_spark.functions import quality as QL
from tidb_lightning_spark.functions import text as TX

ALPHABET = (
    list("abcdefghij XYZ0123456789")
    + ["\t", "\n", "\r", "\x0b", "\f", "  ", "\n\n"]
    + ["#", "...", "-", "*", "•", "é", "ß", "中", "🙂"]
)


def _mk_docs(n=120, seed=42):
    rng = random.Random(seed)
    docs = [
        (0, ""),
        (1, " \t\n\x0b "),
        (2, "\x0bword\x0bword\x0b"),
        (200, None),  # NULL text: engines must agree (0-counts or NULL)
    ]
    for i in range(3, n):
        length = rng.randint(1, 60)
        docs.append((i, "".join(rng.choice(ALPHABET) for _ in range(length))))
    return docs


BUILDERS = [
    ("token_count", TX.token_count, lambda c: f"CAST({TX.sql_token_count(c)} AS INT)"),
    ("bpe_token_count", TX.bpe_token_count, TX.sql_bpe_token_count),
    ("fingerprint", TX.fingerprint, TX.sql_fingerprint),
    ("lang_id", TX.lang_id, TX.sql_lang_id),
    ("quality_score", TX.quality_score, TX.sql_quality_score),
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
    "name,spark_fn,sql_fn", BUILDERS, ids=[b[0] for b in BUILDERS]
)
def test_twins_agree_on_adversarial_text(spark, name, spark_fn, sql_fn):
    docs = _mk_docs()
    qdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: r.v
        for r in qdf.select(
            "doc_id", spark_fn(F.col("text")).alias("v")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, {sql_fn('text')} FROM docs"
        ).fetchall()
    }
    diffs = {
        k: (got[k], want[k], repr(dict(docs)[k]))
        for k in got
        if got[k] != want[k]
    }
    assert not diffs, f"{name}: {len(diffs)} diffs, first: {list(diffs.items())[:3]}"


def test_dedup_twins_agree_on_adversarial_text(spark):
    """The dedup surface (simhash, token Jaccard, full banded-LSH
    candidate pipeline) must also match its DuckDB twins on adversarial
    whitespace/unicode — these share tokens() but their SQL twins are
    hand-built, so a divergence would surface as a driver correctness
    failure only once fixture data got weird. NULL text is excluded:
    near-dup semantics of a NULL document are undefined (the quality
    gate upstream drops them)."""
    from tidb_lightning_spark.functions import dedup as D

    docs = [(i, t) for i, t in _mk_docs(80) if t is not None]
    # seed guaranteed near-dup pairs so the LSH pipeline has candidates
    docs += [
        (500, "alpha beta gamma delta epsilon zeta eta theta"),
        (501, "alpha beta gamma delta epsilon zeta eta iota"),
        (502, "alpha\tbeta gamma\x0bdelta epsilon zeta eta theta"),
    ]
    qdf = spark.createDataFrame(docs, ["doc_id", "text"])
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)

    # simhash
    got = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_df(qdf, "doc_id", "text").collect()
    }
    want = dict(
        con.execute(D.sql_simhash("documents", "doc_id", "text")).fetchall()
    )
    assert got == want, "simhash diverged"

    # full banded-LSH candidate pipeline (pairs + jaccard estimate)
    got_p = {
        (r["a"], r["b"]): round(r["est_jaccard"], 10)
        for r in D.lsh_candidate_pairs(qdf, "doc_id", "text").collect()
    }
    want_p = {
        (a, b): round(e, 10)
        for a, b, e in con.execute(
            D.sql_lsh_candidate_pairs("documents", "doc_id", "text")
        ).fetchall()
    }
    assert got_p == want_p, (
        f"LSH candidates diverged: {set(got_p) ^ set(want_p)}"
    )
    assert any(a == 500 and b == 501 for a, b in got_p), (
        "seeded near-dup pair not found — pipeline degenerated"
    )

    # exact token-set Jaccard twin
    from pyspark.sql import functions as F

    ref = docs[-1][1]
    got_j = {
        r["doc_id"]: round(r["j"], 12)
        for r in qdf.select(
            "doc_id",
            D.jaccard_tokens(F.col("text"), F.lit(ref)).alias("j"),
        ).collect()
    }
    want_j = {
        i: round(j, 12)
        for i, j in con.execute(
            f"SELECT doc_id, {D.sql_jaccard_tokens('text', '$ref$')} "
            "FROM documents".replace("$ref$", "'" + ref.replace("'", "''") + "'")
        ).fetchall()
    }
    assert got_j == want_j, "jaccard diverged"
