"""Invariant tests for the round-7 operators (oracle parity already
hash-verifies values; these pin semantic properties on crafted inputs
the fixture can't express)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tidb_lightning_spark.plans import queries as Q

from .conftest import SF_CORRECTNESS


def test_rfm_hist_cells_partition_customers(spark, duck):
    rows = Q.customer_rfm_segments_hist(spark, SF_CORRECTNESS).collect()
    n_customers = duck.execute(
        "SELECT count(DISTINCT o_custkey) FROM orders"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_customers
    for r in rows:
        assert 1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5


def test_zipf_profile_invariants(spark):
    r = Q.corpus_zipf_profile(spark, SF_CORRECTNESS).collect()[0]
    assert r["n_tokens"] >= r["n_types"] > 0
    assert 0.0 < r["top10_share"] <= r["top100_share"] <= 1.0
    assert 0.0 <= r["hapax_frac"] <= 1.0


def test_sessionize_known_gaps(spark, tmp_path, monkeypatch):
    """3 users: u1 has two sessions (90-min gap), u2 one session of one
    event, u3 one session of three tight events."""
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, minutes):
        return Row(
            event_id=eid,
            ts=t0 + datetime.timedelta(minutes=minutes),
            user_id=uid,
            event_type="view",
            value=1.0,
            props="{}",
        )

    from tidb_lightning_spark.streaming.events import EVENT_SCHEMA

    rows = [
        ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 100),  # gap 90 min -> 2 sess
        ev(4, 2, 0),
        ev(5, 3, 0), ev(6, 3, 5), ev(7, 3, 29),
    ]
    d = str(tmp_path / "sess_events")
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(d)
    # point the loader at the crafted table
    import tidb_lightning_spark.plans.queries as QQ

    orig = QQ.load
    monkeypatch.setattr(
        QQ,
        "load",
        lambda sp, sf, t: sp.read.parquet(d) if t == "events"
        else orig(sp, sf, t),
    )
    r = QQ.events_sessionize(spark, SF_CORRECTNESS).collect()[0]
    assert r["n_sessions"] == 4
    assert r["n_events"] == 7
    assert r["max_session_events"] == 3
    # session seconds: u1a=600, u1b=0, u2=0, u3=1740 -> mean 585
    assert r["mean_session_seconds"] == pytest.approx(585.0)


def test_int8_quantization_bounds_and_recall_range(spark):
    out = Q.embedding_int8_recall(spark, SF_CORRECTNESS).collect()
    assert len(out) == 5
    for r in out:
        assert 0 <= r["n_overlap"] <= 10
        assert 0.0 <= r["recall_at_10"] <= 1.0
    # int8 on 64-dim unit-ish vectors should retain most of the top-10
    assert sum(r["n_overlap"] for r in out) >= 35, out


def test_13gram_short_docs_never_contaminated(spark, duck):
    rows = {
        r["doc_id"]: r
        for r in Q.split_contamination_13gram(
            spark, SF_CORRECTNESS
        ).collect()
    }
    short = {
        r[0]
        for r in duck.execute(
            "SELECT doc_id FROM documents WHERE "
            "len(string_split_regex(text, '[ ]+')) < 13"
        ).fetchall()
    }
    for doc_id, r in rows.items():
        if doc_id in short:
            assert r["n_grams"] == 0 and not r["is_contaminated"]
        assert r["n_contaminated"] <= r["n_grams"]


def test_cms_estimate_never_underestimates(spark):
    for r in Q.top_tokens_cms(spark, SF_CORRECTNESS).collect():
        assert r["cms_n"] >= r["exact_n"], (
            "Count-Min must only overestimate"
        )
        assert r["inflation"] == r["cms_n"] - r["exact_n"]


def test_mixture_schedule_invariants(spark):
    rows = Q.corpus_mixture_schedule(spark, SF_CORRECTNESS).collect()
    assert rows
    assert sum(r["natural_share"] for r in rows) == pytest.approx(1.0)
    assert sum(r["target_share"] for r in rows) == pytest.approx(1.0)
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        # effective tokens = target share of the one-corpus budget
        assert r["effective_tokens"] == pytest.approx(
            r["target_share"] * total, abs=1.0
        )
        # epochs uses the UNfloored share (effective_tokens floors)
        assert r["epochs"] == pytest.approx(
            r["target_share"] * total / r["n_tokens"], rel=1e-9
        )
    # temperature < 1 damps: the largest source is subsampled, the
    # smallest upsampled, relative to natural share
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    assert big["target_share"] < big["natural_share"]
    assert small["target_share"] > small["natural_share"]
