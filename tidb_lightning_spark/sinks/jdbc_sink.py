"""JDBC backend (reference: the `tidb` backend, lightning/backend/tidb.go —
rows are delivered to a live database instead of files).

Mapping of the reference's machinery:

  multi-row INSERT batching       -> df.write.jdbc(batchsize=...) — the
    (SplitIntoChunks, tidb.go:97)    driver binds and batches statements
  on-duplicate replace/ignore     -> PK dedup before write (within-batch),
    (tidb.go:80-88)                  keep-last for replace / keep-first
                                     for ignore, ordered by _tidb_rowid
  retryable-error classification  -> bounded retry decorator (M9,
    (SQLWithRetry util.go:103)       common/util.go:103-253)

True cross-batch upsert (ON DUPLICATE KEY UPDATE) is database-specific
SQL; the stage-and-swap pattern (write to a staging table, MERGE on the
target) is sketched in `merge_sql` for targets that support MERGE.

The policy/dedup logic is plain DataFrame work (tested without a
database); the full JDBC delivery path is exercised end-to-end against
embedded Apache Derby (bundled with pyspark) in tests/test_jdbc_sink.py,
mirroring the reference's golden-SQL backend tests (tidb_test.go).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def apply_duplicate_policy(
    df: DataFrame, pk: list[str], on_duplicate: str, order_col: str | None = None
) -> DataFrame:
    """Within-batch duplicate resolution on the PK (tidb.go:80-88).

    replace: last occurrence wins (REPLACE INTO semantics);
    ignore:  first occurrence wins (INSERT IGNORE);
    error:   any PK collision fails the load.
    Ordering is by `order_col` (row id) so "first/last" is deterministic.
    """
    if not pk or on_duplicate == "error":
        if pk:
            dups = (
                df.groupBy(*pk).count().filter(F.col("count") > 1).limit(1).collect()
            )
            if dups:
                raise ValueError(
                    f"duplicate primary key {dict((k, dups[0][k]) for k in pk)} "
                    f"with on-duplicate=error"
                )
        return df
    order = F.col(order_col) if order_col and order_col in df.columns else F.lit(0)
    direction = order.desc() if on_duplicate == "replace" else order.asc()
    w = Window.partitionBy(*pk).orderBy(direction)
    return (
        df.withColumn("_dup_rn", F.row_number().over(w))
        .filter(F.col("_dup_rn") == 1)
        .drop("_dup_rn")
    )


def with_retry(fn, attempts: int = 3, backoff_s: float = 3.0):
    """SQLWithRetry analog (3 attempts, fixed backoff)."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:  # driver classifies; we retry IO-ish errors
            last = exc
            msg = str(exc).lower()
            retryable = any(
                s in msg for s in ("timeout", "connection", "deadlock", "refused")
            )
            if not retryable or i == attempts - 1:
                raise
            log.warning("retryable JDBC error (attempt %d): %s", i + 1, exc)
            time.sleep(backoff_s)
    raise last  # pragma: no cover


@dataclass
class JDBCSink:
    url: str
    properties: dict[str, str] = field(default_factory=dict)
    on_duplicate: str = "replace"
    batchsize: int = 4096  # reference max-kv-pairs per packet (config.go:398)

    def write_table(
        self,
        df: DataFrame,
        db: str,
        table: str,
        pk: list[str] | None = None,
        order_col: str = "_tidb_rowid",
    ) -> None:
        out = apply_duplicate_policy(
            df, pk or [], self.on_duplicate, order_col=order_col
        )
        if order_col in out.columns and (not pk or order_col not in pk):
            out = out.drop(order_col)

        def do_write():
            (
                out.write.mode("append")
                .option("batchsize", str(self.batchsize))
                .jdbc(self.url, f"{db}.{table}", properties=self.properties)
            )

        with_retry(do_write)

    @staticmethod
    def rebase_auto_increment(
        spark,
        url: str,
        db: str,
        table: str,
        column: str,
        next_value: int,
        properties: dict | None = None,
        dialect: str | None = None,
    ) -> str:
        """Post-load allocator rebase (L1/D2; reference AlterAutoIncrement,
        restore/tidb.go:349-382): point the target's id generator past the
        loaded max so post-import inserts never collide with bulk-loaded
        ids. Dialect-specific DDL executed over a raw JVM JDBC connection
        (Spark's writer has no DDL surface):

            mysql/tidb: ALTER TABLE t AUTO_INCREMENT = n
            derby:      ALTER TABLE t ALTER COLUMN c RESTART WITH n
        """
        dialect = dialect or (
            "derby" if url.startswith("jdbc:derby") else "mysql"
        )
        if dialect == "derby":
            sql = (
                f"ALTER TABLE {db}.{table} ALTER COLUMN {column} "
                f"RESTART WITH {int(next_value)}"
            )
        else:
            sql = f"ALTER TABLE {db}.{table} AUTO_INCREMENT = {int(next_value)}"
        jvm = spark._jvm
        drv = (properties or {}).get("driver")
        if drv:
            jvm.java.lang.Class.forName(drv)
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            try:
                with_retry(lambda: st.execute(sql))
            finally:
                st.close()
        finally:
            conn.close()
        return sql

    @staticmethod
    def merge_sql(db: str, table: str, staging: str, pk: list[str], cols: list[str]) -> str:
        """Stage-and-merge upsert statement for MERGE-capable targets."""
        on = " AND ".join(f"t.{c} = s.{c}" for c in pk)
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c not in pk)
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {db}.{table} t USING {staging} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )
