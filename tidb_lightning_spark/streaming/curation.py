"""Streaming corpus curation: the text-quality surface (functions/text,
functions/quality) applied to a *growing* document source — the shape a
production training-data pipeline runs between crawler output and
training shards, without waiting for a batch boundary.

Everything quality-side is the SAME Catalyst expressions the batch
queries use (gopher verdict, quality score, language ID, token counts,
fingerprint), so streaming and batch curation cannot drift — the
batch-equivalence test (tests/test_streaming_curation.py) holds by
construction for the per-row columns, and cross-batch exact dedup is the
only stateful piece.

Dedup semantics: keep the FIRST document seen per canonical fingerprint,
across micro-batches and across restarts (the dedup state lives in the
streaming checkpoint). That is the streaming analog of batch
`dedup_exact_documents` keep-min-id, with arrival order replacing id
order. State is unbounded by default — right for bounded backfills and
replays; pass `watermark_col`/`watermark` to bound it by event time for
endless feeds (duplicates separated by more than the horizon then
survive, the standard streaming-dedup tradeoff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidb_lightning_spark.functions import quality as QL
from tidb_lightning_spark.functions import text as TX

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a growing directory of parquet document
    dumps. Spark checkpoints which files each batch consumed — new files
    become exactly one new micro-batch, replayed batches re-read the
    same files (the chunk-checkpoint analog, zero custom state)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def annotate(stream: DataFrame) -> DataFrame:
    """Per-row curation columns — pure Catalyst, identical to the batch
    registry's text surface; runs inside the stream's scan stage."""
    t = F.col("text")
    return stream.select(
        "*",
        TX.fingerprint(t).alias("fp"),
        TX.lang_id(t).alias("lang_pred"),
        TX.quality_score(t).alias("quality"),
        TX.bpe_token_count(t).alias("n_tokens"),
        QL.dup_token_frac(t).alias("dup_token_frac"),
        QL.top_token_frac(t).alias("top_token_frac"),
        QL.gopher_keep(t).alias("keep"),
    )


def curate_stream(
    stream: DataFrame,
    min_quality: float = 0.0,
    watermark_col: str | None = None,
    watermark: str = "24 hours",
) -> DataFrame:
    """Quality gate + cross-batch exact dedup on the canonical
    fingerprint. Filters run BEFORE the stateful dedup so rejected docs
    never enter the state store (at 100 TB the quality gate drops a
    large fraction — state sizes to the *surviving* corpus)."""
    annotated = annotate(stream)
    gated = annotated.filter(
        F.col("keep") & (F.col("quality") >= F.lit(min_quality))
    )
    if watermark_col is not None:
        return gated.withWatermark(
            watermark_col, watermark
        ).dropDuplicatesWithinWatermark(["fp"])
    return gated.dropDuplicates(["fp"])


def curate_to_warehouse(
    spark: SparkSession,
    src_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.0,
) -> None:
    """End-to-end continuous curation: growing dump dir -> annotate ->
    gate -> cross-batch dedup -> exactly-once per-batch warehouse
    directories (same staged-batch sink as continuous restore). Call
    again as the directory grows; the checkpoint carries both the file
    offsets and the dedup state, so every document lands at most once
    across all invocations."""
    from tidb_lightning_spark.streaming.events import stream_to_warehouse

    stream = read_document_stream(spark, src_dir)
    curated = curate_stream(stream, min_quality=min_quality)
    stream_to_warehouse(curated, table_dir, checkpoint_dir)


def curate_to_warehouse_neardup(
    spark: SparkSession,
    src_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    min_quality: float = 0.0,
    threshold: float = 0.5,
) -> None:
    """Continuous curation with cross-batch NEAR-dup admission: exact
    dedup (fingerprint state in the streaming checkpoint) is followed,
    per micro-batch, by the banded-MinHash admission check the batch
    surface runs as dedup_incremental_vs_reference — the admitted
    corpus is represented by its persisted BAND TABLE + signatures
    (a few longs per doc under `state_dir`), never its text, so a
    paraphrased duplicate of anything admitted in ANY earlier batch —
    including before a restart — is rejected at the band join.

    Exactly-once discipline: output docs, band rows, and signature rows
    each land in `_batch_id=N` overwrite directories (the
    stream_to_warehouse pattern), and the historical side of the band
    join filters `_batch_id < N` — a replayed batch neither sees its own
    half-written state nor duplicates it. Within a batch, near-dup pairs
    keep the lower doc_id (the batch keep-min-id rule).

    Scale shape per batch: signatures are computed once for the batch;
    the candidate join is batch-bands x historical-bands on
    (band_idx, band_hash); signature columns join back only for
    candidates. The historical band table grows with the ADMITTED corpus
    (rejected docs never enter it) and is ordinary partitioned parquet —
    compactable offline, shared with batch jobs."""
    import os

    from tidb_lightning_spark.functions import dedup as D
    from tidb_lightning_spark.streaming.events import stream_to_warehouse

    bands_dir = os.path.join(state_dir, "bands")
    sigs_dir = os.path.join(state_dir, "sigs")
    mh_cols = [f"mh{j}" for j in range(D.N_MINHASH)]

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        sig = D.minhash_wide_df(batch_df, "doc_id", "text").persist()
        bands_new = D.band_hashes_df(sig, "doc_id")

        def _hist_dirs(base: str) -> list[str]:
            # enumerate committed earlier batches by NAME instead of
            # partition-discovering the whole dir: a crash between the
            # docs write and the state writes can leave this batch's own
            # `_batch_id=N` dir absent or half-written, and whole-dir
            # schema inference would also fail on an empty state dir
            if not os.path.isdir(base):
                return []
            out = []
            for p in os.listdir(base):
                if not p.startswith("_batch_id="):
                    continue
                try:
                    bid = int(p.split("=", 1)[1])
                except ValueError:
                    continue
                if bid < batch_id:
                    out.append(os.path.join(base, p))
            return sorted(out)

        dropped = None
        hist_band_dirs = _hist_dirs(bands_dir)
        if hist_band_dirs:
            hist_bands = spark.read.parquet(*hist_band_dirs)
            hist_sigs = spark.read.parquet(*_hist_dirs(sigs_dir))
            cand = (
                bands_new.select(
                    F.col("doc_id").alias("_new"), "band_idx", "band_hash"
                )
                .join(
                    hist_bands.select(
                        F.col("doc_id").alias("_ref"),
                        "band_idx",
                        "band_hash",
                    ),
                    ["band_idx", "band_hash"],
                )
                .select("_new", "_ref")
                .distinct()
            )
            wa = sig.select(
                F.col("doc_id").alias("_new"),
                *[F.col(c).alias(f"a{j}") for j, c in enumerate(mh_cols)],
            )
            wb = hist_sigs.select(
                F.col("doc_id").alias("_ref"),
                *[F.col(c).alias(f"b{j}") for j, c in enumerate(mh_cols)],
            )
            dropped = (
                cand.join(wa, "_new")
                .join(wb, "_ref")
                .filter(D.signature_agreement("a", "b") >= F.lit(threshold))
                .select(F.col("_new").alias("doc_id"))
                .distinct()
            )

        # within-batch near-dups: candidate pairs keep the lower doc_id
        # (signatures= reuses this batch's persisted signature scan)
        pairs = D.lsh_candidate_pairs(
            batch_df, "doc_id", "text", signatures=sig
        )
        intra = (
            pairs.filter(F.col("est_jaccard") >= F.lit(threshold))
            .select(F.col("b").alias("doc_id"))
            .distinct()
        )
        dropped = intra if dropped is None else dropped.unionByName(
            intra
        ).distinct()

        admitted = batch_df.join(dropped, "doc_id", "left_anti").persist()
        admitted.write.mode("overwrite").parquet(
            f"{table_dir}/_batch_id={batch_id}"
        )
        adm_ids = admitted.select("doc_id")
        bands_new.join(adm_ids, "doc_id").write.mode("overwrite").parquet(
            f"{bands_dir}/_batch_id={batch_id}"
        )
        sig.join(adm_ids, "doc_id").select(
            "doc_id", *mh_cols
        ).write.mode("overwrite").parquet(
            f"{sigs_dir}/_batch_id={batch_id}"
        )
        admitted.unpersist()
        sig.unpersist()

    stream = read_document_stream(spark, src_dir)
    curated = curate_stream(stream, min_quality=min_quality)
    stream_to_warehouse(
        curated, table_dir, checkpoint_dir, write_batch=admit_batch
    )
