"""Round-9 fixes (r8 VERDICT items 6-7 + r8 ADVICE.md items 1-3):

1. The admitted-OUTPUT table is tier-compacted like the state tables
   (verdict item 6) and read back through `read_admitted`, which is
   exact across crashes (folded-but-undeleted dirs are skipped).
2. Tiered (LSM-style) compaction: per-batch dirs fold into `_delta_w`
   dirs; deltas merge into the full `_snapshot_w` only geometrically —
   cumulative rewrite IO is sub-quadratic in corpus size (verdict
   item 7), proven by the rows_rewritten counter vs the
   full-rewrite-every-time baseline.
3. `_gc` reclaims crash leftovers (superseded snapshots/deltas, folded
   per-batch dirs, orphaned ._tmp) at every admit (ADVICE item 1).
4. A crash between two tables' snapshot renames leaves them at
   different watermarks; the NEXT admit detects the mismatch and folds
   the lagging table immediately (ADVICE item 2).
5. State AHEAD of the streaming batch id (fresh checkpoint against a
   retained state/table dir) raises instead of silently dropping the
   whole compacted history from admission (ADVICE item 3).
"""

from __future__ import annotations

import os
import shutil

import pytest

from .conftest import slow_soak

from tidb_lightning_spark.streaming import curation as C

from .test_round8_fixes import _drive, _mk_batches


@slow_soak
def test_compaction_io_subquadratic_and_stats(spark, tmp_path):
    """rows_rewritten across 36 batches with compact_every=4 must stay
    well under the r8 full-rewrite baseline (every fold rewrites the
    whole corpus so far), and merges must be a minority of folds —
    the geometric tier rule at work (r8 verdict item 7)."""
    n = 36
    batches = _mk_batches(n)
    admitted, st, wh, adm = _drive(spark, tmp_path, "t", 4, batches)

    stats = adm.compaction_stats
    assert stats["folds"] > 0 and stats["rows_rewritten"] > 0

    # r8 baseline: a fold event fires every compact_every batches and
    # rewrites the FULL history of all three tables. Reconstruct it from
    # the actually-admitted corpus (bands = 8 rows/doc, sigs = 1,
    # output = 1 → 10 rows per admitted doc per full rewrite).
    per_batch_admitted = []
    seen = set(admitted)
    for rows in batches:
        per_batch_admitted.append(sum(1 for r in rows if r[0] in seen))
    # bands rows per admitted doc = number of LSH bands
    from tidb_lightning_spark.functions import dedup as D

    bands_per_doc = D.N_BANDS
    quad_baseline = 0
    hist = 0
    for b in range(n):
        if b > 0 and b % 4 == 0:  # fold at every 4th admit, r8 style
            quad_baseline += hist * (bands_per_doc + 2)
        hist += per_batch_admitted[b]
    assert stats["rows_rewritten"] < 0.7 * quad_baseline, (
        f"tiered compaction rewrote {stats['rows_rewritten']} rows vs "
        f"quadratic baseline {quad_baseline}"
    )
    assert stats["merges"] < stats["folds"], stats


@slow_soak
def test_gc_reclaims_crash_leftovers(spark, tmp_path):
    """Superseded snapshots, already-folded per-batch dirs, and orphan
    ._tmp dirs — the shapes a crash between rename and cleanup leaves —
    are deleted by the next admit's _gc pass (r8 ADVICE item 1), and
    admission verdicts are unaffected (the leftovers only ever held
    duplicate history)."""
    batches = _mk_batches(10)
    wh = str(tmp_path / "wh")
    st = str(tmp_path / "st")
    adm = C.NearDupAdmitter(spark, wh, st, threshold=0.5, compact_every=4)
    for bid in range(8):
        adm.admit(spark.createDataFrame(batches[bid], C.DOC_SCHEMA), bid)

    bands = os.path.join(st, "bands")
    live = C._select_state(bands)
    src = live.dirs()[0]
    # fabricate crash leftovers: a superseded full snapshot, a per-batch
    # dir below the watermark, and an orphaned ._tmp
    fakes = [
        os.path.join(bands, "_snapshot_w=1"),
        os.path.join(bands, "_batch_id=0"),
        os.path.join(bands, "_snapshot_w=9._tmp"),
    ]
    for f in fakes:
        shutil.copytree(src, f)
    assert all(os.path.isdir(f) for f in fakes)

    before = {
        r["doc_id"]
        for r in C.read_admitted(spark, wh).select("doc_id").collect()
    }
    adm.admit(spark.createDataFrame(batches[8], C.DOC_SCHEMA), 8)
    assert not any(os.path.isdir(f) for f in fakes), (
        "stale dirs survived _gc: "
        f"{[f for f in fakes if os.path.isdir(f)]}"
    )
    after = {
        r["doc_id"]
        for r in C.read_admitted(spark, wh).select("doc_id").collect()
    }
    admitted_8 = after - before
    assert admitted_8 == {r[0] for r in batches[8] if r[0] < 90000}


@slow_soak
def test_crash_between_renames_catches_up_next_admit(spark, tmp_path):
    """Kill the fold after the FIRST table's snapshot rename (bands ok,
    sigs + output not yet folded). The replayed admit must detect the
    watermark mismatch and fold the lagging tables immediately — not
    wait out another compact_every batches (r8 ADVICE item 2) — and
    verdicts must match an uncrashed run exactly."""
    batches = _mk_batches(12)
    wh = str(tmp_path / "wh")
    st = str(tmp_path / "st")
    adm = C.NearDupAdmitter(spark, wh, st, threshold=0.5, compact_every=4)
    for bid in range(4):
        adm.admit(spark.createDataFrame(batches[bid], C.DOC_SCHEMA), bid)

    real_rename = os.rename
    renames = {"n": 0}

    def crashing_rename(a, b):
        real_rename(a, b)
        renames["n"] += 1
        if renames["n"] == 1:
            raise RuntimeError("injected crash after first rename")

    os.rename = crashing_rename
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            adm.admit(
                spark.createDataFrame(batches[4], C.DOC_SCHEMA), 4
            )
    finally:
        os.rename = real_rename

    # crash shape: bands folded to w=4, sigs/output still per-batch
    w = {
        base: C._select_state(base).w_max
        for base in (os.path.join(st, "bands"), os.path.join(st, "sigs"), wh)
    }
    assert len(set(w.values())) > 1, f"crash did not split watermarks: {w}"

    # streaming replay: same batch id, then continue
    for bid in range(4, 12):
        adm.admit(spark.createDataFrame(batches[bid], C.DOC_SCHEMA), bid)
    got = {
        r["doc_id"]
        for r in C.read_admitted(spark, wh).select("doc_id").collect()
    }
    want = _drive(spark, tmp_path, "nocrash", 4, batches)[0]
    assert got == want
    # all tables re-converged to one watermark
    w2 = {
        C._select_state(base).w_max
        for base in (os.path.join(st, "bands"), os.path.join(st, "sigs"), wh)
    }
    assert len(w2) == 1, w2


@slow_soak
def test_fresh_checkpoint_against_retained_state_raises(spark, tmp_path):
    """Restarting with a RESET checkpoint (batch ids back at 0) against
    a retained state dir must raise — r8 silently skipped the
    snapshot (sw > batch_id) after its folded inputs were already
    deleted, dropping the entire compacted history from admission
    (r8 ADVICE item 3)."""
    from tidb_lightning_spark.pipeline import IngestError

    batches = _mk_batches(6)
    wh = str(tmp_path / "wh")
    st = str(tmp_path / "st")
    adm = C.NearDupAdmitter(spark, wh, st, threshold=0.5, compact_every=4)
    for bid in range(6):
        adm.admit(spark.createDataFrame(batches[bid], C.DOC_SCHEMA), bid)

    fresh = C.NearDupAdmitter(spark, wh, st, threshold=0.5, compact_every=4)
    with pytest.raises(IngestError, match="AHEAD"):
        fresh.admit(spark.createDataFrame(batches[0], C.DOC_SCHEMA), 0)


def test_read_admitted_skips_partial_current_batch(spark, tmp_path):
    """A crash mid-write leaves a per-batch dir without _SUCCESS; the
    stream will overwrite it on replay, so readers must exclude it
    rather than surface a partial batch."""
    from tidb_lightning_spark.pipeline import IngestError

    wh = str(tmp_path / "wh")
    df = spark.createDataFrame(
        [(1, "alpha", "en", "web", 5), (2, "beta", "en", "web", 4)],
        C.DOC_SCHEMA,
    )
    df.write.parquet(os.path.join(wh, "_batch_id=0"))
    partial = os.path.join(wh, "_batch_id=1")
    df.write.parquet(partial)
    os.remove(os.path.join(partial, "_SUCCESS"))

    got = {
        r["doc_id"]
        for r in C.read_admitted(spark, wh).select("doc_id").collect()
    }
    assert got == {1, 2}

    with pytest.raises(IngestError, match="no admitted batches"):
        C.read_admitted(spark, str(tmp_path / "empty"))
