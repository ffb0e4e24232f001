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


class NearDupAdmitter:
    """Cross-batch near-dup admission state machine for streaming
    curation — extracted from curate_to_warehouse_neardup so the
    per-batch admit logic (and the state-compaction invariants) can be
    driven directly by tests without the streaming engine.

    State layout under `state_dir` (bands/ and sigs/ each):
      - `_batch_id=N` overwrite dirs, one per admitted micro-batch
        (exactly-once: a replayed batch overwrites its own dir and the
        history filter excludes `_batch_id >= N`);
      - at most one `_snapshot_w=W` dir, covering ALL batches with
        id < W, produced by compaction every `compact_every` batches.
        Snapshots are written to a `._tmp` dir then os.rename'd
        (atomic on one filesystem), and the folded per-batch dirs are
        deleted only after BOTH bands and sigs snapshots renamed — a
        crash mid-compaction can only leave duplicate history rows,
        which the distinct'd candidate join ignores.

    Replay safety: compaction folds strictly `_batch_id < current`, so
    a replayed batch N can never find its own rows in a snapshot
    (W <= N always). Without compaction the state dir grows one dir
    per micro-batch forever and every batch pays O(batches) listing —
    quadratic over the stream's lifetime (r7 verdict item 2).
    """

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        state_dir: str,
        threshold: float = 0.5,
        compact_every: int = 16,
    ) -> None:
        import os

        from tidb_lightning_spark.functions import dedup as D
        from tidb_lightning_spark.pipeline import IngestError

        # The band/signature state is managed with local-filesystem IO
        # (os.listdir / os.rename for atomic snapshot swap); a scheme'd
        # URI would make the historical side SILENTLY empty every batch
        # — cross-batch admission degrading to intra-batch-only with no
        # error (r7 advice). Fail at construction, matching the
        # preflight_remote_scheme discipline.
        for name, p in (("state_dir", state_dir), ("table_dir", table_dir)):
            if "://" in p:
                raise IngestError(
                    f"curate_to_warehouse_neardup {name}={p!r} carries a "
                    "URI scheme, but near-dup admission state uses local "
                    "filesystem IO (atomic snapshot rename). Mount the "
                    "store locally or use a local state/table dir."
                )
        self.spark = spark
        self.table_dir = table_dir
        self.threshold = threshold
        self.compact_every = compact_every
        self.bands_dir = os.path.join(state_dir, "bands")
        self.sigs_dir = os.path.join(state_dir, "sigs")
        self._D = D
        self.mh_cols = [f"mh{j}" for j in range(D.N_MINHASH)]

    _SNAP = "_snapshot_w="

    def _list_state(self, base: str, batch_id: int):
        """(snapshot_dir_or_None, snapshot_watermark, [(bid, path)...])
        for committed state strictly before `batch_id`. Enumerates by
        NAME, never partition-discovery: a crash can leave this batch's
        own dir half-written, and an empty dir breaks schema inference."""
        import os

        if not os.path.isdir(base):
            return None, 0, []
        snap, w = None, 0
        batches = []
        for p in os.listdir(base):
            if p.startswith(self._SNAP) and not p.endswith("._tmp"):
                try:
                    sw = int(p[len(self._SNAP):])
                except ValueError:
                    continue
                # at most one snapshot survives cleanup; after a crash
                # between rename and delete, prefer the newest <= batch_id
                if w < sw <= batch_id:
                    snap, w = os.path.join(base, p), sw
            elif p.startswith("_batch_id="):
                try:
                    bid = int(p.split("=", 1)[1])
                except ValueError:
                    continue
                batches.append((bid, os.path.join(base, p)))
        # drop dirs already folded into the snapshot (not yet deleted
        # after a crash): double history would be harmless (the candidate
        # join is distinct'd) but pointless IO
        batches = sorted(
            (b, d) for b, d in batches if w <= b < batch_id
        )
        return snap, w, batches

    def _hist_dirs(self, base: str, batch_id: int) -> list[str]:
        snap, _, batches = self._list_state(base, batch_id)
        out = [snap] if snap else []
        return out + [d for _, d in batches]

    def _maybe_compact(self, batch_id: int) -> None:
        """Fold per-batch state dirs (all strictly < batch_id) plus the
        previous snapshot into one `_snapshot_w={batch_id}` dir per
        state table, when enough per-batch dirs have accumulated."""
        import os
        import shutil

        snap_b, _, batches_b = self._list_state(self.bands_dir, batch_id)
        if len(batches_b) < self.compact_every:
            return
        renamed = []
        for base, snap in (
            (self.bands_dir, snap_b),
            (self.sigs_dir, self._list_state(self.sigs_dir, batch_id)[0]),
        ):
            _, _, batches = self._list_state(base, batch_id)
            srcs = ([snap] if snap else []) + [d for _, d in batches]
            if not srcs:
                continue
            final = os.path.join(base, f"{self._SNAP}{batch_id}")
            if not os.path.isdir(final):  # replay of a crashed compaction
                tmp = final + "._tmp"
                self.spark.read.parquet(*srcs).write.mode(
                    "overwrite"
                ).parquet(tmp)
                os.rename(tmp, final)
            renamed.append((base, snap, [d for _, d in batches]))
        # delete folded inputs only after every snapshot is in place
        for base, snap, olds in renamed:
            for d in ([snap] if snap else []) + olds:
                shutil.rmtree(d, ignore_errors=True)

    def admit(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        D = self._D
        spark = self.spark
        self._maybe_compact(batch_id)
        sig = D.minhash_wide_df(batch_df, "doc_id", "text").persist()
        bands_new = D.band_hashes_df(sig, "doc_id")

        dropped = None
        hist_band_dirs = self._hist_dirs(self.bands_dir, batch_id)
        if hist_band_dirs:
            hist_bands = spark.read.parquet(*hist_band_dirs)
            hist_sigs = spark.read.parquet(
                *self._hist_dirs(self.sigs_dir, batch_id)
            )
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
                *[
                    F.col(c).alias(f"a{j}")
                    for j, c in enumerate(self.mh_cols)
                ],
            )
            wb = hist_sigs.select(
                F.col("doc_id").alias("_ref"),
                *[
                    F.col(c).alias(f"b{j}")
                    for j, c in enumerate(self.mh_cols)
                ],
            )
            dropped = (
                cand.join(wa, "_new")
                .join(wb, "_ref")
                .filter(
                    D.signature_agreement("a", "b")
                    >= F.lit(self.threshold)
                )
                .select(F.col("_new").alias("doc_id"))
                .distinct()
            )

        # within-batch near-dups: candidate pairs keep the lower doc_id
        # (signatures= reuses this batch's persisted signature scan)
        pairs = D.lsh_candidate_pairs(
            batch_df, "doc_id", "text", signatures=sig
        )
        intra = (
            pairs.filter(F.col("est_jaccard") >= F.lit(self.threshold))
            .select(F.col("b").alias("doc_id"))
            .distinct()
        )
        dropped = (
            intra
            if dropped is None
            else dropped.unionByName(intra).distinct()
        )

        admitted = batch_df.join(dropped, "doc_id", "left_anti").persist()
        admitted.write.mode("overwrite").parquet(
            f"{self.table_dir}/_batch_id={batch_id}"
        )
        adm_ids = admitted.select("doc_id")
        bands_new.join(adm_ids, "doc_id").write.mode("overwrite").parquet(
            os.path.join(self.bands_dir, f"_batch_id={batch_id}")
        )
        sig.join(adm_ids, "doc_id").select(
            "doc_id", *self.mh_cols
        ).write.mode("overwrite").parquet(
            os.path.join(self.sigs_dir, f"_batch_id={batch_id}")
        )
        admitted.unpersist()
        sig.unpersist()


def curate_to_warehouse_neardup(
    spark: SparkSession,
    src_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    min_quality: float = 0.0,
    threshold: float = 0.5,
    compact_every: int = 16,
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
    (rejected docs never enter it) and is compacted into one snapshot
    dir every `compact_every` batches (NearDupAdmitter), so per-batch
    listing cost stays O(compact_every), not O(batches)."""
    from tidb_lightning_spark.streaming.events import stream_to_warehouse

    admitter = NearDupAdmitter(
        spark,
        table_dir,
        state_dir,
        threshold=threshold,
        compact_every=compact_every,
    )
    stream = read_document_stream(spark, src_dir)
    curated = curate_stream(stream, min_quality=min_quality)
    stream_to_warehouse(
        curated, table_dir, checkpoint_dir, write_batch=admitter.admit
    )
