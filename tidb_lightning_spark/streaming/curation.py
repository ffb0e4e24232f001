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
