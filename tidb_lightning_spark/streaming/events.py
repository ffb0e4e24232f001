"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY.md §2.O); these are the
Spark-native stream twins of the batch operators in plans/queries.py, so a
user can run the same semantics over a live feed:

  batch events_hourly_rollup   <->  windowed_counts (tumbling window)
  batch sessionize_events      <->  sessionize (session_window, same 30-min gap)
  exact dedup                  <->  dedup_stream (dropDuplicatesWithinWatermark)
  batch per-user groupBy agg   <->  running_user_totals (applyInPandasWithState)

Late data is handled by watermarks; every operator works with
`trigger(availableNow=True)` for batch-replay and continuous triggers for
live feeds. State stores scale horizontally with shuffle partitions —
the groupBy keys (window/user/event id) are the state-partitioning keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-based event stream (each new file = a micro-batch of events)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data bound."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (same 30-min-gap semantics as the batch
    sessionize_events query)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame,
                    stream_key: str = "user_id",
                    dim_key: str = "c_custkey") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins the (small,
    broadcastable) dimension snapshot — the streaming twin of a fact-dim
    broadcast join; the static side is re-planned per batch, so a
    refreshed dim table is picked up without restarting the query."""
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], "left"
    )


def dedup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event ids within the watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (event count, value total, last-seen ts) maintained across
    micro-batches — semantics Spark's built-in windowed aggs can't
    express (unbounded, update-on-every-batch, arbitrary state).

    State is partitioned by user_id (the shuffle key), so each task owns
    a disjoint user range and the state store scales horizontally; the
    per-batch payload into Python is the Arrow-batched group delta, not
    the accumulated history.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
    )
    state_schema = "n bigint, total double, last_ts timestamp"

    def update(key, pdf_iter, state: GroupState):
        n, total, last = (state.get if state.exists else (0, 0.0, None))
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            mx = pdf["ts"].max()
            last = mx if last is None or (mx is not None and mx > last) else last
        state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain all available input into an in-memory table (tests/replay)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
