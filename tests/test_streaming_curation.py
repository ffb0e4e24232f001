"""Streaming corpus curation (streaming/curation.py): per-row columns
must equal the batch text surface exactly; cross-batch dedup must keep
one doc per fingerprint across micro-batches AND across restarts on the
same checkpoint."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tidb_lightning_spark.functions import quality as QL
from tidb_lightning_spark.functions import text as TX
from tidb_lightning_spark.streaming import curation as C

from .conftest import slow_soak, SF_SMOKE


@pytest.fixture()
def doc_dir(spark, tmp_path):
    """Fixture docs re-materialized as arrival files, with a cross-file
    duplicate: file B repeats two of file A's texts under new ids."""
    from tidb_lightning_spark.sources.parquet_source import read_table

    d = str(tmp_path / "docs_stream")
    docs = read_table(spark, f"{SF_SMOKE}/documents.parquet").select(
        *[f.name for f in C.DOC_SCHEMA.fields]
    )
    a = docs.limit(30)
    a.coalesce(1).write.mode("overwrite").parquet(f"{d}/f=a")
    dup = (
        a.orderBy("doc_id")
        .limit(2)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    b = docs.orderBy(F.col("doc_id").desc()).limit(10).unionByName(dup)
    b.coalesce(1).write.mode("overwrite").parquet(f"{d}/f=b")
    return d


def _drain(spark, doc_dir, table_dir, ckpt):
    stream = C.read_document_stream(spark, doc_dir)
    curated = C.curate_stream(stream)
    from tidb_lightning_spark.streaming.events import stream_to_warehouse

    stream_to_warehouse(curated, table_dir, ckpt)
    batch_dirs = [
        p for p in os.listdir(table_dir) if p.startswith("_batch_id=")
    ] if os.path.isdir(table_dir) else []
    if not batch_dirs:
        return None
    return spark.read.parquet(
        *[f"{table_dir}/{p}" for p in batch_dirs]
    )


def test_streaming_columns_match_batch_surface(spark, doc_dir, tmp_path):
    out = _drain(
        spark, doc_dir, str(tmp_path / "wh"), str(tmp_path / "ckpt")
    )
    assert out is not None
    got = {
        r["doc_id"]: (
            r["fp"], r["lang_pred"], round(r["quality"], 10),
            r["n_tokens"], r["keep"],
        )
        for r in out.collect()
    }
    assert got, "curation dropped everything"

    batch = (
        spark.read.parquet(doc_dir)
        .select(
            "doc_id",
            TX.fingerprint(F.col("text")).alias("fp"),
            TX.lang_id(F.col("text")).alias("lang_pred"),
            TX.quality_score(F.col("text")).alias("quality"),
            TX.bpe_token_count(F.col("text")).alias("n_tokens"),
            QL.gopher_keep(F.col("text")).alias("keep"),
        )
        .collect()
    )
    want = {
        r["doc_id"]: (
            r["fp"], r["lang_pred"], round(r["quality"], 10),
            r["n_tokens"], r["keep"],
        )
        for r in batch
        if r["keep"]
    }
    for doc_id, vals in got.items():
        assert vals == want[doc_id], f"doc {doc_id} drifted from batch"


def test_streaming_dedup_one_doc_per_fp(spark, doc_dir, tmp_path):
    out = _drain(
        spark, doc_dir, str(tmp_path / "wh"), str(tmp_path / "ckpt")
    )
    rows = out.select("fp").collect()
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps)), "duplicate fingerprints survived"

    # every kept batch fingerprint is represented exactly once
    batch_fps = {
        r["fp"]
        for r in spark.read.parquet(doc_dir)
        .select(
            TX.fingerprint(F.col("text")).alias("fp"),
            QL.gopher_keep(F.col("text")).alias("keep"),
        )
        .filter("keep")
        .collect()
    }
    assert set(fps) == batch_fps


def test_dedup_state_survives_restart(spark, doc_dir, tmp_path):
    """A later file whose text duplicates an already-drained batch must
    be dropped by the SECOND drain on the same checkpoint — the dedup
    state lives in the checkpoint, not the micro-batch."""
    wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
    first = _drain(spark, doc_dir, wh, ckpt)
    n_first = first.count()
    first_ids = {r["doc_id"] for r in first.select("doc_id").collect()}

    # new file: one fresh doc + one exact duplicate of a drained text
    kept_one = (
        spark.read.parquet(doc_dir)
        .filter(F.col("doc_id").isin([int(i) for i in first_ids]))
        .orderBy("doc_id")
        .limit(1)
        .withColumn("doc_id", F.col("doc_id") + 500000)
    )
    fresh = kept_one.withColumn(
        "text",
        F.concat(F.lit("genuinely new words here today "), F.col("text")),
    ).withColumn("doc_id", F.col("doc_id") + 1)
    kept_one.unionByName(fresh).coalesce(1).write.mode("overwrite").parquet(
        f"{doc_dir}/f=c"
    )

    second = _drain(spark, doc_dir, wh, ckpt)
    new_ids = {
        r["doc_id"] for r in second.select("doc_id").collect()
    } - first_ids
    assert second.count() == n_first + 1, (
        "cross-restart dedup failed: duplicate text re-admitted"
    )
    assert all(i >= 500000 for i in new_ids) and len(new_ids) == 1


def test_cli_curate_incremental(spark, doc_dir, tmp_path, capsys):
    """`cli curate` drains only what arrived since the last run and
    reports cumulative curated rows."""
    import json as _json

    from tidb_lightning_spark import cli

    target = str(tmp_path / "curated_wh")
    rc = cli.main(["curate", "--source", doc_dir, "--target", target])
    assert rc == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["ok"] and out1["rows_total"] > 0

    # second run with nothing new: no extra rows
    rc = cli.main(["curate", "--source", doc_dir, "--target", target])
    assert rc == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows_total"] == out1["rows_total"]


# ---------------------------------------------------------------------------
# Cross-batch NEAR-dup admission (r7): band-table state survives restart
# ---------------------------------------------------------------------------
def _read_batches(spark, table_dir):
    dirs = [
        p for p in os.listdir(table_dir) if p.startswith("_batch_id=")
    ] if os.path.isdir(table_dir) else []
    if not dirs:
        return None
    return spark.read.parquet(*[f"{table_dir}/{p}" for p in dirs])


@slow_soak
def test_neardup_admission_survives_restart(spark, tmp_path):
    """A PARAPHRASED duplicate (new fingerprint, high MinHash-Jaccard)
    of a doc admitted before a restart must be rejected by the band-join
    against the persisted state; a genuinely fresh doc must pass. The
    verdicts must equal the batch dedup_incremental machinery run over
    (admitted corpus, new batch)."""
    from tidb_lightning_spark.functions import dedup as D
    from tidb_lightning_spark.sources.parquet_source import read_table

    d = str(tmp_path / "docs_nd")
    wh, ckpt, state = (
        str(tmp_path / "wh"), str(tmp_path / "ckpt"), str(tmp_path / "st")
    )
    docs = read_table(spark, f"{SF_SMOKE}/documents.parquet").select(
        *[f.name for f in C.DOC_SCHEMA.fields]
    )
    docs.orderBy("doc_id").limit(20).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/f=a")

    C.curate_to_warehouse_neardup(spark, d, wh, ckpt, state)
    first = _read_batches(spark, wh)
    admitted1 = first.select("doc_id", "text").collect()
    assert admitted1, "first drain admitted nothing"
    base = max(admitted1, key=lambda r: len(r["text"]))
    assert len(base["text"].split()) > 20, "fixture text too short"

    # paraphrase: append one word -> new fingerprint, Jaccard stays high
    para_text = base["text"] + " addendum"
    fresh_text = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronauts rehearse an entirely unrelated procedure in orbit "
        "and the committee debates whether marmalade belongs on toast "
        "every single morning without fail for reasons nobody remembers "
        "anymore but tradition demands it continue indefinitely somehow"
    )
    spark.createDataFrame(
        [
            (900001, para_text, "en", "web", len(para_text)),
            (900002, fresh_text, "en", "web", len(fresh_text)),
        ],
        C.DOC_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/f=b")

    # restart: a NEW invocation on the same checkpoint + state dirs
    C.curate_to_warehouse_neardup(spark, d, wh, ckpt, state)
    all_ids = {r["doc_id"] for r in _read_batches(spark, wh).collect()}
    assert 900002 in all_ids, "fresh doc was wrongly rejected"
    assert 900001 not in all_ids, (
        "paraphrased near-dup re-admitted after restart"
    )

    # batch equivalence: same verdicts from the batch band-join machinery
    ref = first.select("doc_id", "text")
    new = spark.read.parquet(f"{d}/f=b").select("doc_id", "text")
    sig_ref = D.minhash_wide_df(ref, "doc_id", "text")
    sig_new = D.minhash_wide_df(new, "doc_id", "text")
    cand = (
        D.band_hashes_df(sig_new, "doc_id")
        .select(F.col("doc_id").alias("_new"), "band_idx", "band_hash")
        .join(
            D.band_hashes_df(sig_ref, "doc_id").select(
                F.col("doc_id").alias("_ref"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("_new", "_ref")
        .distinct()
    )
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(D.N_MINHASH)
    )
    est = (
        cand.join(
            sig_new.select(
                F.col("doc_id").alias("_new"),
                *[
                    F.col(f"mh{j}").alias(f"a{j}")
                    for j in range(D.N_MINHASH)
                ],
            ),
            "_new",
        )
        .join(
            sig_ref.select(
                F.col("doc_id").alias("_ref"),
                *[
                    F.col(f"mh{j}").alias(f"b{j}")
                    for j in range(D.N_MINHASH)
                ],
            ),
            "_ref",
        )
        .groupBy("_new")
        .agg(
            F.max(
                matches.cast("double") / F.lit(float(D.N_MINHASH))
            ).alias("max_est")
        )
    )
    batch_dups = {
        r["_new"] for r in est.filter(F.col("max_est") >= 0.5).collect()
    }
    assert batch_dups == {900001}, (
        f"batch machinery disagrees with streaming drop set: {batch_dups}"
    )


@slow_soak
def test_cli_curate_neardup_flag(spark, tmp_path, capsys):
    """`cli curate --neardup` wires the band-table admission path; a
    paraphrase arriving in a later drain is rejected."""
    import json as _json

    from pyspark.sql import Row

    from tidb_lightning_spark import cli
    from tidb_lightning_spark.sources.parquet_source import read_table

    d = str(tmp_path / "docs_cli_nd")
    target = str(tmp_path / "nd_wh")
    docs = read_table(spark, f"{SF_SMOKE}/documents.parquet").select(
        *[f.name for f in C.DOC_SCHEMA.fields]
    )
    docs.orderBy("doc_id").limit(10).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/f=a")
    rc = cli.main(
        ["curate", "--source", d, "--target", target, "--neardup"]
    )
    assert rc == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["ok"] and out1["rows_total"] > 0
    assert os.path.isdir(os.path.join(target, "_curate_state", "bands"))

    base = max(
        spark.read.parquet(f"{target}/documents_curated").collect(),
        key=lambda r: len(r["text"]),
    )
    spark.createDataFrame(
        [Row(doc_id=777777, text=base["text"] + " coda", lang="en",
             source="web", n_chars=len(base["text"]) + 5)],
        C.DOC_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/f=b")
    rc = cli.main(
        ["curate", "--source", d, "--target", target, "--neardup"]
    )
    assert rc == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows_total"] == out1["rows_total"], (
        "paraphrase admitted through the CLI neardup path"
    )
