"""Continuous restore: the streaming twin of the batch pipeline.

The reference is strictly one-shot batch (SURVEY.md §2.O: no streaming
surface); real ingestion directories, however, GROW — dumpers land new
`db.tbl.N.csv` files while earlier ones are already loaded. This module
watches a dump directory with Structured Streaming and incrementally
restores newly-arrived data files through the SAME transform chain as
the batch path (permute -> cast -> defaults -> gencols; operators/
transform.py), with exactly-once delivery into the warehouse layout:

  * discovery/offsets: Spark's file-stream source checkpoints which
    files were consumed — the streaming analog of the chunk checkpoint
    (reference checkpoints.go) with zero custom state;
  * exactly-once: every micro-batch overwrites its own
    `_batch_id=N` subdirectory (same pattern as
    streaming/events.stream_to_warehouse) — a replayed batch rewrites
    the identical directory instead of duplicating rows;
  * row ids: each batch gets an EXACT disjoint range [base, base+rows)
    allocated from a sidecar ledger in the stream checkpoint dir —
    mirroring the batch path's per-file range reservation
    (region.go:208-286). Dense allocation (not a bit-shift scheme) keeps
    ids small enough to backfill INT/SMALLINT auto-increment columns
    without wrapping. Replay-stable: a re-run batch re-reads ITS
    recorded base from the ledger (persisted before any data write).

Readers see ordinary partitioned parquet until the first tier-compaction
fold; after that `streaming.curation.read_table` is the exact reader
(`cli sql` detects folded tables and routes through it).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from tidb_lightning_spark.schema.ddl import TableInfo
from tidb_lightning_spark.sources.csv_source import CSVConfig


def _allocate_batch_base(checkpoint_dir: str, batch_id: int, n_rows: int) -> int:
    """Disjoint per-batch row-id range from a ledger file next to the
    stream checkpoint: {"bases": {batch_id: base}, "next": N}. The ledger
    is written (atomic rename) BEFORE any data write, so a replayed batch
    finds and reuses its recorded base — the streaming analog of the
    batch path's pre-allocated chunk ranges (region.go:208-286)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "rowid_bases.json")
    state = {"bases": {}, "next": 0}
    if os.path.exists(path):
        with open(path) as f:
            state = json.load(f)
    key = str(batch_id)
    if key in state["bases"]:
        return state["bases"][key]
    base = state["next"]
    state["bases"][key] = base
    state["next"] = base + n_rows
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)
    return base


def _reader_schema(info: TableInfo, file_columns: list[str] | None) -> T.StructType:
    n = len(file_columns) if file_columns else sum(
        1 for c in info.columns if c.generated_expr is None
    )
    return T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(n)]
    )


def read_csv_stream(
    spark: SparkSession,
    source_glob: str,
    info: TableInfo,
    csv: CSVConfig | None = None,
    file_columns: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream CSV source with the MySQL dialect options of the batch
    reader (csv_source.py option mapping) and an all-string schema — the
    typed cast happens in the shared transform chain, identically to the
    batch path."""
    csv = csv or CSVConfig()
    reader = (
        spark.readStream.schema(_reader_schema(info, file_columns))
        .option("sep", csv.separator)
        .option("quote", csv.delimiter or '"')
        .option("escape", "\\" if csv.backslash_escape else '"')
        .option("nullValue", csv.null)
        .option("header", str(bool(csv.header)).lower())
        .option("mode", "PERMISSIVE")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.csv(source_glob)


def read_jsonl_stream(
    spark: SparkSession,
    source_glob: str,
    info: TableInfo,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream JSONL source (same contract as the batch jsonl branch:
    all-string DDL schema -> MySQL cast chain; missing key == SQL NULL),
    renamed to the transform chain's positional _c{i} convention."""
    from pyspark.sql import functions as F

    schema = T.StructType(
        [T.StructField(c.name, T.StringType(), True) for c in info.columns]
    )
    reader = spark.readStream.schema(schema).option("mode", "PERMISSIVE")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(source_glob).select(
        *[
            F.col(c.name).alias(f"_c{i}")
            for i, c in enumerate(info.columns)
        ]
    )


def stream_restore(
    spark: SparkSession,
    source_glob: str,
    table_dir: str,
    checkpoint_dir: str,
    info: TableInfo,
    csv: CSVConfig | None = None,
    file_columns: list[str] | None = None,
    pinned_timestamp: str = "1970-01-01 00:00:00",
    strict: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    fmt: str = "csv",
    compact_every: int | None = 16,
):
    """Incrementally restore new data files matching `source_glob` into
    `table_dir`. Each call drains everything currently available
    (trigger availableNow) and returns; re-running with the same
    `checkpoint_dir` ingests only files that arrived since — the
    continuous-restore loop. Set available_now=False for an always-on
    query (caller manages the handle). fmt: "csv" or "jsonl".

    Per-batch `_batch_id=N` dirs are tier-compacted like the generic
    streaming sink (curation.TieredCompactor) so a long-running restore
    keeps a bounded dir count; read a folded table back with
    `streaming.curation.read_table` (`cli sql` routes folded tables
    through it automatically). `compact_every=None`, or a scheme'd
    remote `table_dir`, keeps the legacy flat layout."""
    from tidb_lightning_spark.operators.transform import (
        ERR_COL,
        transform_table,
    )

    compactor = None
    if compact_every and "://" not in table_dir:
        from tidb_lightning_spark.streaming.curation import TieredCompactor

        compactor = TieredCompactor(
            spark, [table_dir], compact_every=compact_every,
            # folds re-apply the PK sort so snapshot parquet footers stay
            # range-prunable, like the per-batch dirs they replace
            sort_within=list(info.primary_key or []) or None,
        )

    if fmt == "jsonl":
        stream = read_jsonl_stream(
            spark, source_glob, info,
            max_files_per_trigger=max_files_per_trigger,
        )
        file_columns = None  # positional rename already applied
    else:
        stream = read_csv_stream(
            spark, source_glob, info, csv=csv, file_columns=file_columns,
            max_files_per_trigger=max_files_per_trigger,
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # exact disjoint range per batch; the count pass is the same one
        # dense auto-inc allocation performs on the batch path
        base = _allocate_batch_base(
            checkpoint_dir, batch_id, batch_df.count()
        )
        out = transform_table(
            batch_df,
            info,
            file_columns,
            pinned_timestamp,
            strict=strict,
            rowid_base=base,
            # the ledger reserves the EXACT range [base, base+rows) per
            # batch; dense allocation is the only id scheme that stays
            # inside it (striped monotonic ids would collide with the
            # next batch's reservation)
            force_dense=True,
        )
        if strict and ERR_COL in out.columns:
            bad = (
                out.filter(out[ERR_COL].isNotNull())
                .select(ERR_COL).limit(3).collect()
            )
            if bad:
                raise ValueError(
                    f"strict sql_mode violations in batch {batch_id}: "
                    f"columns {[r[0] for r in bad]}"
                )
        if ERR_COL in out.columns:
            out = out.drop(ERR_COL)
        sort_cols = info.primary_key or None
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        if compactor is not None:
            compactor.run(batch_id)
        out.write.mode("overwrite").parquet(f"{table_dir}/_batch_id={batch_id}")

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
        import time as _time

        for _ in range(200):
            if all(a.id != q.id for a in spark.streams.active):
                break
            _time.sleep(0.05)
    return q
