"""Round-8 fixes (r7 ADVICE.md + VERDICT next-round items):

1. HLL phantom NULL-key register must not be counted into _hit — a
   saturated sketch (all real registers hit + a null key) previously
   drove zeros to -1 and, once the scaled register sum dropped below 1,
   returned a NEGATIVE cardinality. Fixed in functions/sketch.py (batch
   + vector estimator + DuckDB twin) and streaming/events.py.
2. NearDupAdmitter state compaction: per-batch `_batch_id=N` state dirs
   are folded into a `_snapshot_w=W` dir every compact_every batches —
   dir count stays bounded and admission verdicts are unchanged.
3. NearDupAdmitter raises on scheme'd state/table dirs instead of
   silently running with an empty historical side.
4. Dataset card always carries vocab_profile, degenerate (zeroed/null)
   when the corpus tokenizes to zero tokens.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from .conftest import slow_soak
from pyspark.sql import functions as F

from tidb_lightning_spark.functions import sketch as SK
from tidb_lightning_spark.streaming import curation as C

from .oracle_util import duck_result, spark_result


# --- 1. HLL phantom register -------------------------------------------


def test_hll_saturated_sketch_with_null_key_stays_positive(spark):
    """All HLL_M real registers hit at high rho + the phantom NULL slot:
    pre-fix _hit counted HLL_M + 1, zeros = -1, and with s < 1 the
    estimate went NEGATIVE. registers_hit must cap at HLL_M and the
    estimate must be a positive cardinality."""
    regs = [50] * (SK.HLL_M + 1)  # rho=50 everywhere incl. phantom -> s << 1
    df = spark.createDataFrame(
        [("g1", regs)], "g string, regs array<int>"
    )
    row = SK.hll_estimate(df, ["g"]).collect()[0]
    assert row["registers_hit"] == SK.HLL_M
    assert row["est_distinct"] > 0, (
        f"saturated sketch estimate went non-positive: {row['est_distinct']}"
    )


def test_hll_null_fold_matches_duckdb_twin(spark, tmp_path):
    """hll_distinct over a null-containing key hash-matches the DuckDB
    twin AFTER the phantom-slot fix (both engines now count(reg), i.e.
    skip the NULL register in hit while keeping its 2^-rho term in s)."""
    rows = [("a", str(i)) for i in range(500)] + [("a", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, k string")
    p = str(tmp_path / "hll_nulls.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    got = spark_result(
        SK.hll_distinct(df, "k", ["g"]).orderBy("g")
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    want = duck_result(
        con,
        SK.sql_hll_distinct("t", "k", ["g"]) + " ORDER BY g",
    )
    con.close()
    assert got == want
    # and the group whose only key is NULL reports zero real registers
    gi, hi = got[0].index("g"), got[0].index("registers_hit")
    by_g = {r[gi]: r for r in got[1]}
    assert by_g["b"][hi] == "0"  # normalize_rows stringifies values


def test_hll_direct_and_vector_agree_on_nulls(spark):
    """After the fix the direct sketch and the vector estimator still
    agree bit-for-bit on null-containing input (the r7 invariant)."""
    df = spark.createDataFrame(
        [(None,), (1,), (2,), (None,), (3,)], "user_id bigint"
    ).withColumn("g", F.lit("a"))
    direct = SK.hll_distinct(df, "user_id", ["g"]).collect()[0]
    vec = SK.hll_register_vectors(df, "user_id", ["g"])
    est = SK.hll_estimate(vec, ["g"]).collect()[0]
    assert (est["est_distinct"], est["registers_hit"]) == (
        direct["est_distinct"], direct["registers_hit"],
    )
    assert direct["registers_hit"] == 3  # phantom not counted


# --- 2/3. NearDupAdmitter compaction + scheme guard ---------------------


def _mk_batches(n_batches: int, per_batch: int = 2):
    """Deterministic doc batches: each batch has fresh docs plus, every
    3rd batch, a paraphrase (one appended word) of a much earlier doc —
    exercising the snapshot side of the historical band join."""
    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()
    batches = []
    texts = {}
    nid = 0
    for b in range(n_batches):
        rows = []
        for j in range(per_batch):
            t = " ".join(
                words[(nid * 7 + k * 3) % len(words)] + str(nid * 31 + k)
                for k in range(40)
            )
            texts[nid] = t
            rows.append((nid, t, "en", "web", len(t)))
            nid += 1
        if b % 3 == 2 and b >= 3:
            victim = (b - 3) * per_batch  # admitted several batches ago
            para = texts[victim] + " addendum"
            rows.append((90000 + b, para, "en", "web", len(para)))
        batches.append(rows)
    return batches


def _drive(spark, tmp_path, tag: str, compact_every: int, batches):
    wh = str(tmp_path / f"wh_{tag}")
    st = str(tmp_path / f"st_{tag}")
    adm = C.NearDupAdmitter(
        spark, wh, st, threshold=0.5, compact_every=compact_every,
        track_rows=True,  # rows_rewritten accounting is test-only (r10)
    )
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(rows, C.DOC_SCHEMA)
        adm.admit(df, bid)
    # r9: the output table is compacted too — per-batch globs miss the
    # folded history, so reads go through the state-aware reader
    admitted = {
        r["doc_id"]
        for r in C.read_admitted(spark, wh).select("doc_id").collect()
    }
    return admitted, st, wh, adm


@slow_soak
def test_neardup_state_compaction_bounded_and_equivalent(spark, tmp_path):
    """~50 micro-batches: with compact_every=8 the state-dir count stays
    bounded (never grows past snapshot + deltas + compact_every) while
    admission verdicts equal the uncompacted run's exactly (r7 verdict
    item 2). Paraphrases of docs admitted long before the latest
    snapshot must still be rejected — i.e. the snapshot really carries
    the folded history."""
    n = 50
    batches = _mk_batches(n)
    compacted, st_c, wh_c, _ = _drive(spark, tmp_path, "c", 8, batches)

    # bounded: ≤1 full snapshot, ≤max_deltas deltas, per-batch dirs
    # never exceed compact_every (+1 for the current batch) — for the
    # state tables AND the admitted-output table (r8 verdict item 6)
    for sub in (
        os.path.join(st_c, "bands"), os.path.join(st_c, "sigs"), wh_c
    ):
        names = os.listdir(sub)
        per_batch = [p for p in names if p.startswith("_batch_id=")]
        snaps = [p for p in names if p.startswith("_snapshot_w=")]
        deltas = [p for p in names if p.startswith("_delta_w=")]
        assert len(per_batch) <= 8 + 1, f"{sub}: {sorted(per_batch)}"
        assert len(snaps) <= 1, f"{sub}: {snaps}"
        assert len(deltas) <= 8, f"{sub}: {deltas}"
        assert snaps or deltas, f"{sub}: no compaction output"
        assert not [p for p in names if p.endswith("._tmp")]

    # every injected paraphrase was rejected, every fresh doc admitted
    paraphrase_ids = {
        r[0] for rows in batches for r in rows if r[0] >= 90000
    }
    assert paraphrase_ids, "fixture generated no paraphrases"
    assert not (paraphrase_ids & compacted)
    fresh_ids = {
        r[0] for rows in batches for r in rows if r[0] < 90000
    }
    assert fresh_ids <= compacted

    # verdict equivalence vs an uncompacted run: admission verdicts are
    # prefix-causal (batch N sees only batches < N), so comparing the
    # first 18 batches — spanning two compaction points — is exact,
    # without paying a second full 50-batch drive
    n_cmp = 18
    uncompacted, st_u, _, _ = _drive(
        spark, tmp_path, "u", 10_000, batches[:n_cmp]
    )
    ids_cmp = {r[0] for rows in batches[:n_cmp] for r in rows}
    assert (compacted & ids_cmp) == uncompacted
    for sub in ("bands", "sigs"):
        n_dirs = len(os.listdir(os.path.join(st_u, sub)))
        assert n_dirs == n_cmp  # the unbounded shape compaction removes


@slow_soak
def test_neardup_compaction_replay_is_idempotent(spark, tmp_path):
    """Replaying the batch that triggered compaction (the crash-replay
    contract: same batch_id, overwrite dirs) must neither see its own
    rows nor duplicate state: verdicts and dir layout match a
    no-replay run."""
    batches = _mk_batches(12)
    wh = str(tmp_path / "wh_r")
    st = str(tmp_path / "st_r")
    adm = C.NearDupAdmitter(spark, wh, st, threshold=0.5, compact_every=6)
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(rows, C.DOC_SCHEMA)
        adm.admit(df, bid)
        if bid == 7:  # compaction fired at bid 6; replay the next batch
            adm.admit(df, bid)
    got = {
        r["doc_id"]
        for r in C.read_admitted(spark, wh).select("doc_id").collect()
    }
    want = _drive(spark, tmp_path, "nr", 6, batches)[0]
    assert got == want


def test_neardup_admitter_rejects_schemed_uris(spark, tmp_path):
    from tidb_lightning_spark.pipeline import IngestError

    with pytest.raises(IngestError, match="URI scheme"):
        C.NearDupAdmitter(spark, str(tmp_path / "wh"), "s3a://bucket/state")
    with pytest.raises(IngestError, match="URI scheme"):
        C.NearDupAdmitter(
            spark, "hdfs://nn/warehouse", str(tmp_path / "st")
        )


# --- 4. degenerate vocab_profile ----------------------------------------


def test_dataset_card_vocab_profile_zero_tokens(spark, tmp_path, capsys):
    """A non-empty table whose text tokenizes to ZERO tokens still
    carries vocab_profile (zeroed counts, null ratios) — consumers that
    index card['vocab_profile'] must not KeyError (r7 advice)."""
    from tidb_lightning_spark import cli

    d = str(tmp_path / "dump")
    os.makedirs(d)
    # tokenization is whitespace-split, so only whitespace-only text
    # yields zero tokens
    rows = [
        {"doc_id": i, "text": "   \t  ", "source": "s0"} for i in range(5)
    ]
    with open(f"{d}/corpus.docs.jsonl", "w") as f:
        f.write("".join(json.dumps(r) + "\n" for r in rows))
    target = str(tmp_path / "wh")
    assert cli.main(
        ["run", "--source", d, "--target", target, "--no-schema"]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["report", "--target", target, "--table", "corpus.docs"]
    ) == 0
    out = capsys.readouterr().out
    card = json.loads(out[out.index("{"):])
    vp = card["vocab_profile"]
    assert vp["n_types"] == 0
    assert vp["top10_share"] is None
    assert vp["hapax_frac"] is None
