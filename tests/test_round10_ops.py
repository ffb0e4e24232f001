"""Behavioral tests for the round-10 LLM-pipeline operators.

The oracle-parity suite already proves Spark==DuckDB on the fixture
corpus; these tests pin the SEMANTICS on planted inputs — a shared
passage is found as exactly one maximal span, an identical vector pair
prunes exactly its higher id, target-vocabulary docs outrank off-target
docs, reference-like text scores lower cross-entropy than gibberish,
and BPE encoding actually compresses a repetitive corpus.
"""

from __future__ import annotations

import pytest

from tidb_lightning_spark.plans import queries as Q

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t, lang, "src", len(t)) for i, t, lang in rows], DOC_SCHEMA
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_exact_substrings_planted_passage(spark, tmp_path):
    """A >=K-token passage shared by two docs (unique elsewhere) is
    recovered as exactly ONE maximal span per doc covering exactly the
    passage's tokens; a fully unique doc is absent from the output."""
    k = Q.EXSUB_K
    passage = " ".join(f"shared{i}" for i in range(k + 4))  # k+4 tokens
    rows = [
        (1, "alpha bravo charlie " + passage + " delta echo", "en"),
        (2, "foxtrot golf hotel india " + passage + " juliet", "en"),
        (3, "kilo lima mike november oscar papa quebec romeo sierra", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in Q.dedup_exact_substrings(spark, sf).collect()
    }
    assert set(out) == {1, 2}
    for doc_id in (1, 2):
        r = out[doc_id]
        assert r["n_spans"] == 1
        assert r["dup_tokens"] == k + 4
        assert r["longest_span"] == k + 4


def test_semdedup_identical_pair_prunes_higher_id(spark):
    """Two bit-identical vectors land in one cluster with equal centroid
    cosine; the id tie-break ranks the LOWER id first, so exactly the
    higher id is pruned at any tau <= 1."""
    from tidb_lightning_spark.functions.similarity import semdedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["keep"]
        for r in semdedup(
            df, "vec_id", "embedding", tau=0.999, n_lists=2, iters=1
        ).collect()
    }
    assert out[1] == 1
    assert out[2] == 0
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_dsir_target_vocab_outranks_offtarget(spark, tmp_path):
    """Docs written in the target ('en') slice's vocabulary carry higher
    importance weights than docs whose n-grams never occur in the
    target model — DSIR's defining property."""
    en = "alpha beta gamma delta epsilon zeta eta theta " * 4
    fr = "omega psi chi phi upsilon tau sigma rho " * 4
    rows = [(i, en, "en") for i in range(1, 4)] + [
        (i, fr, "fr") for i in range(4, 7)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r["logw"]
        for r in Q.dsir_importance_select(spark, sf).collect()
    }
    assert min(out[i] for i in (1, 2, 3)) > max(out[i] for i in (4, 5, 6))


def test_ccnet_reference_like_text_scores_lower_xent(spark, tmp_path):
    """A doc written in the reference slice's phrasing has lower
    cross-entropy (and a no-worse tercile) than out-of-model gibberish —
    the CCNet head/tail separation."""
    ref = "the cat sat on the mat and the dog sat on the rug " * 3
    rows = [
        (1, ref, "en"),
        (2, ref, "en"),
        (3, "the cat sat on the mat", "fr"),  # in-domain, non-reference
        (4, "zzq xxv qqj vvk jjx kkq zzv", "fr"),  # gibberish
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in Q.ccnet_perplexity_buckets(spark, sf).collect()
    }
    assert out[3]["xent"] < out[4]["xent"]
    assert out[3]["bucket"] <= out[4]["bucket"]
    assert out[4]["bucket"] == 3  # gibberish lands in the tail tercile


def test_bpe_encode_compresses_repetitive_corpus(spark, tmp_path):
    """BPE merges collapse a corpus dominated by one word: fewer tokens
    than characters, compression > 1, and per-doc word counts exact."""
    rows = [
        (1, "banana banana banana banana", "en"),
        (2, "banana bandana", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in Q.bpe_encode_corpus(spark, sf).collect()
    }
    assert out[1]["n_words"] == 4
    assert out[2]["n_words"] == 2
    for r in out.values():
        assert 0 < r["n_tokens"] < r["n_chars"]
        assert r["chars_per_token"] > 1.0
    # 6 merges fully collapse the dominant 6-char word: one token each
    assert out[1]["n_tokens"] == 4


def test_bm25_duplicate_doc_ranks_first(spark, tmp_path):
    """A verbatim copy of the query document is the strongest BM25
    match; an unrelated doc never outranks an overlapping one."""
    q = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, q, "en"),
        (10, q, "en"),                       # exact copy
        (11, "alpha beta unrelated words here", "en"),  # partial overlap
        (12, "nothing shared at all whatsoever", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = [
        (r["doc_id"], r["rank"])
        for r in Q.bm25_retrieval_topk(spark, sf).collect()
        if r["query_id"] == 1
    ]
    by_rank = {rank: doc for doc, rank in got}
    assert by_rank[1] == 10
    assert by_rank[2] == 11
    assert 12 not in dict(got)  # shares no term: absent, not ranked


def test_textrank_hub_token_ranks_first(spark, tmp_path):
    """A planted hub token co-occurring with every other token collects
    the most PageRank mass; rank values are the exact fixed-point
    integers (base + floored contributions), monotone in connectivity."""
    # hub appears around every spoke: "hub a hub b ... hub f hub" — the
    # trailing hub closes the chain so every spoke has identical (2-hub)
    # adjacency and hub's weighted degree dominates
    spokes = [f"spoke{i}" for i in range(6)]
    text = " ".join(x for s in spokes for x in ("hub", s)) + " hub"
    rows = [(1, text, "en")]
    sf = _write_docs(spark, tmp_path, rows)
    out = Q.textrank_keywords(spark, sf).collect()
    assert out[0]["token"] == "hub"
    assert out[0]["rank"] == 1
    # every spoke ties: identical pr, ranks broken by token name
    spoke_rows = [r for r in out if r["token"].startswith("spoke")]
    assert len({r["pr_scaled"] for r in spoke_rows}) == 1
    assert [r["token"] for r in spoke_rows] == sorted(spokes)
    # fixed-point sanity: every pr >= teleport base, hub strictly above
    base = 3 * Q.TEXTRANK_SCALE // 20
    assert all(r["pr_scaled"] >= base for r in out)
    assert out[0]["pr_scaled"] > spoke_rows[0]["pr_scaled"]


def test_kn_continuation_beats_raw_frequency(spark, tmp_path):
    """Kneser-Ney's signature: a word frequent only in ONE context
    ("francisco" after "san") gets a LOW continuation weight even though
    its raw count is high — n1l drives the backoff term, not c."""
    # "san francisco" x 6: francisco frequent, single left context.
    # "the" follows 4 distinct words: low count per bigram, high n1l.
    text = ("san francisco " * 6).strip() + (
        " over the lazy the quick the brown the"
    )
    sf = _write_docs(spark, tmp_path, [(1, text, "en")])
    rows = {(r["w1"], r["w2"]): r for r in Q.kn_bigram_lm(spark, sf).collect()}
    sf_row = rows[("san", "francisco")]
    assert sf_row["n1l"] == 1  # only ever follows "san"
    the_rows = [r for (w1, w2), r in rows.items() if w2 == "the"]
    assert the_rows and all(r["n1l"] >= 3 for r in the_rows)
    # interpolation never zero, probability bounded in (0, 1]
    for r in rows.values():
        assert 0 < r["p_scaled"] <= Q.KN_SCALE
    # per-context sanity: francisco|san dominates its context
    assert sf_row["c"] == 6 and sf_row["c1"] >= 6


def test_scd2_runs_collapse_and_intervals_chain(spark):
    """Planted event stream: consecutive same-type runs collapse into
    versioned rows whose [valid_from, valid_to) intervals chain exactly
    (next run's start closes the previous), single open current row."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    evs = [
        # user 1: view view click view -> 3 runs
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=2), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=3), 1, "view", 1.0, "{}"),
        # user 2: single event -> one current run
        (4, t0, 2, "error", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = Q.scd2_user_state(spark, d).collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["version"], r["state"], r["n_events"]) for r in u1] == [
        (1, "view", 2), (2, "click", 1), (3, "view", 1)
    ]
    # intervals chain: valid_to of run i == valid_from of run i+1
    for a, b in zip(u1, u1[1:]):
        assert a["valid_to"] == b["valid_from"]
    assert u1[-1]["valid_to"] is None and u1[-1]["is_current"] == 1
    assert all(r["is_current"] == 0 for r in u1[:-1])
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] == 1


def test_basket_lift_planted_orders(spark, tmp_path):
    """A part pair that always co-occurs ranks above pairs involving a
    ubiquitous part, with exact fixed-point lift/confidence/support;
    single-co-occurrence pairs are pruned by the min-co filter."""
    rows = []
    for ok in range(1, 7):  # orders 1-6: parts 10+20 together, plus 30
        rows += [(ok, 10), (ok, 20), (ok, 30)]
    for i, ok in enumerate(range(7, 13)):  # 30 + a one-off singleton
        rows += [(ok, 30), (ok, 40 + i)]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(f"{d}/lineitem.parquet")
    out = Q.basket_lift_pairs(spark, d).collect()
    # singleton pairs (30, 40+i) have n_ab = 1 -> pruned
    assert {(r["part_a"], r["part_b"]) for r in out} == {
        (10, 20), (10, 30), (20, 30)
    }
    top = out[0]
    # lift(10,20) = N * n_ab / (n_a * n_b) = 12*6/36 = 2.0 exactly
    assert (top["part_a"], top["part_b"]) == (10, 20)
    assert top["n_ab"] == 6 and top["n_a"] == 6 and top["n_b"] == 6
    assert top["lift_scaled"] == 2 * Q.BASKET_SCALE
    assert top["conf_ab_scaled"] == Q.BASKET_SCALE  # 6/6
    assert top["support_scaled"] == Q.BASKET_SCALE // 2  # 6/12
    # pairs with the ubiquitous part: lift exactly 1.0, ranked after
    for r in out[1:]:
        assert r["lift_scaled"] == Q.BASKET_SCALE
        assert r["n_b"] == 12  # part 30 in every order


def test_setjoin_prefix_finds_only_true_near_dup(spark, tmp_path):
    """One-token-edit docs share 5 of 7 3-shingles (J = 5/7 >= 3/5) and
    are the ONLY emitted pair, with exact intersection and fixed-point
    Jaccard; a doc sharing one COMMON shingle with doc 1 is not even a
    candidate because df-ascending prefixes hold its rarest shingles."""
    rows = [
        (1, "a b c d e f g h", "en"),
        (2, "a b c d e f g x", "en"),
        (3, "p q r s t u v w", "en"),
        (4, "a b c z1 z2 z3 z4 z5", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = Q.setjoin_prefix_jaccard(spark, sf).collect()
    assert [(r["a"], r["b"]) for r in out] == [(1, 2)]
    r = out[0]
    assert (r["n_a"], r["n_b"], r["n_common"]) == (6, 6, 5)
    assert r["jacc_scaled"] == 5 * Q.SSJ_SCALE // 7


def test_attribution_linear_credit_split(spark, tmp_path):
    """Each purchase's value splits equally across its window touches
    (integer cents, floored); strict-before and 7-day bounds hold; un-
    touched purchases land in the reconciling '(unattributed)' bucket."""
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    evs = [
        # user 1: view + click, then TWO purchases (both see both touches)
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + m, 1, "click", 1.0, "{}"),
        (2, t0 + 5 * m, 1, "purchase", 1.0, "{}"),   # 10000 -> 5000 each
        (3, t0 + 10 * m, 1, "purchase", 3.0, "{}"),  # 30000 -> 15000 each
        # user 2: no touches -> unattributed
        (4, t0, 2, "purchase", 7.0, "{}"),
        # user 3: touch 8 days earlier -> outside window -> unattributed
        (5, t0 - dt.timedelta(days=8), 3, "view", 1.0, "{}"),
        (6, t0, 3, "purchase", 2.0, "{}"),
        # user 4: touch exactly AT purchase ts -> strict < excludes it
        (7, t0, 4, "view", 1.0, "{}"),
        (8, t0, 4, "purchase", 5.0, "{}"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["touch_type"]: r.asDict() for r in
           Q.attribution_linear_touch(spark, d).collect()}
    assert set(out) == {"view", "click", "(unattributed)"}
    for t in ("view", "click"):
        assert out[t]["n_touches"] == 2
        assert out[t]["n_purchases"] == 2
        assert out[t]["credit_cents"] == 5000 + 15000
    un = out["(unattributed)"]
    assert un["n_purchases"] == 3
    assert un["credit_cents"] == 70000 + 20000 + 50000
    assert un["credit_usd"] == 14.0


def test_profile_orders_planted_stats(spark, tmp_path):
    """Planted orders table: exact null/distinct counts per column,
    BIGINT/VARCHAR bounds stringified, DOUBLE/TIMESTAMP bounds NULL."""
    import datetime as dt

    rows = [
        (1, 10, "O", 5.5, dt.datetime(2024, 1, 1), "1-URGENT"),
        (2, 10, "F", 7.5, dt.datetime(2024, 1, 2), None),
        (3, None, "O", None, None, "2-HIGH"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = {r["col_name"]: r.asDict() for r in
           Q.profile_orders(spark, d).collect()}
    assert len(out) == 6 and all(r["n_rows"] == 3 for r in out.values())
    ck = out["o_custkey"]
    assert (ck["n_nulls"], ck["n_distinct"]) == (1, 1)
    assert (ck["min_str"], ck["max_str"]) == ("10", "10")
    st = out["o_orderstatus"]
    assert (st["n_nulls"], st["n_distinct"]) == (0, 2)
    assert (st["min_str"], st["max_str"]) == ("F", "O")
    tp = out["o_totalprice"]
    assert (tp["n_nulls"], tp["n_distinct"]) == (1, 2)
    assert tp["min_str"] is None and tp["max_str"] is None
    assert out["o_orderpriority"]["n_nulls"] == 1


def test_grouping_sets_members_and_grand_total(spark, tmp_path):
    """Three grouping sets in one pass: gid 1 = per-type, gid 2 =
    per-hour, gid 3 = grand total; member sums reconcile to the total."""
    import datetime as dt

    evs = [
        (0, dt.datetime(2024, 1, 1, 10, 5), 1, "view", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 10, 35), 1, "click", 2.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 11, 5), 2, "view", 4.0, "{}"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = Q.events_grouping_sets(spark, d).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {1, 2, 3}
    types = {r["etype"]: (r["n"], r["sum_value"]) for r in by_gid[1]}
    assert types == {"view": (2, 5.0), "click": (1, 2.0)}
    hours = {r["hr"]: r["n"] for r in by_gid[2]}
    assert hours == {10: 2, 11: 1}
    (g,) = by_gid[3]
    assert (g["etype"], g["hr"], g["n"], g["sum_value"]) == (
        "(all)", -1, 3, 7.0
    )


def test_trailing_range_frame_peers_and_bounds(spark, tmp_path):
    """RANGE semantics: equal-timestamp events are frame PEERS (both
    include both, regardless of event_id order); an event exactly 1h
    earlier is inside the closed lower bound; 1h+1us is outside."""
    import datetime as dt

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    evs = [
        (0, t0 - h - us, 1, "view", 1.0, "{}"),   # just outside for e3
        (1, t0 - h, 1, "view", 2.0, "{}"),        # exactly on the bound
        (2, t0, 1, "view", 4.0, "{}"),            # tied pair...
        (3, t0, 1, "view", 8.0, "{}"),            # ...peer of e2
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["event_id"]: r.asDict() for r in
           Q.events_trailing_1h(spark, d).collect()}
    # tied events see each other (RANGE peers) + the on-bound event
    assert out[2]["n_1h"] == 3 and out[3]["n_1h"] == 3
    assert out[2]["sum_value_1h"] == out[3]["sum_value_1h"] == 14.0
    # the 1h+1us event is excluded from their frame but sees only itself
    assert out[0]["n_1h"] == 1 and out[1]["n_1h"] == 2


def test_ares_weighting_and_determinism(spark, tmp_path):
    """A-Res semantics: inclusion is weight-biased (heavy docs vastly
    overrepresented at the same hash draw), the sample is exactly k,
    and re-running yields the identical sample (replay-stable keys)."""
    # 200 docs: ids 0-99 weight 10000 (long docs), 100-199 weight 10
    rows = [
        (i, "x" * (10000 if i < 100 else 10), "en") for i in range(200)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out1 = Q.weighted_sample_ares(spark, sf).collect()
    out2 = Q.weighted_sample_ares(spark, sf).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert len(out1) == Q.ARES_K
    heavy = sum(1 for r in out1 if r["doc_id"] < 100)
    # weight ratio 1000:1 -> essentially every heavy doc beats every
    # light doc; all 100 heavy docs must be in the k=100 sample
    assert heavy >= 95
    assert [r["rank"] for r in out1] == list(range(1, Q.ARES_K + 1))
    assert all(r["key_scaled"] >= 0 for r in out1)
