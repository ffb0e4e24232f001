"""tidb_lightning_spark — a PySpark-native bulk-ingestion + analytics engine.

Re-expresses the capabilities of pingcap/tidb-lightning (reference at
/root/reference, ~35.5k LoC Go) idiomatically on Spark DataFrames:

  discover source dir -> route files -> parse (CSV / SQL-dump / Parquet)
  -> column permutation / defaults / casts / generated columns / row-ids
  -> sorted, range-partitioned sink (parquet files or JDBC)
  -> checksum verification -> checkpoint/resume

plus the relational-query and training-data-pipeline surface the reference
lacks (joins/aggregates/windows via Spark SQL; dedup / similarity / text
analysis operators for large corpora).

Design notes (scale-first):
  * Everything is declared through the DataFrame API so Catalyst applies
    predicate pushdown / column pruning / join planning for free.
  * Shuffle-bearing operators accept explicit partitioning hints; small
    dimension joins are broadcast.
  * Python-side code only runs on the driver (config, routing, DDL) or
    inside Arrow-batched pandas UDFs (SQL-dump parsing, fingerprints).
"""

__version__ = "0.1.0"
