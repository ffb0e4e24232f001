"""Regression tests for the round-2 ADVICE items closed in round 4:
ctl error-ignore semantics, SQLite checkpoint transactionality, gz dump
row-id reservation, trash-dir sweep, LSH cache release."""

from __future__ import annotations

import gzip
import os

import pytest

from tidb_lightning_spark.config import Config
from tidb_lightning_spark.pipeline import Restorer


def write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


@pytest.fixture
def small_dump(tmp_path):
    d = str(tmp_path / "dump")
    write(f"{d}/s-schema-create.sql", "CREATE DATABASE IF NOT EXISTS s;")
    write(
        f"{d}/s.t-schema.sql",
        "CREATE TABLE t (a INT PRIMARY KEY, b VARCHAR(10));",
    )
    write(f"{d}/s.t.csv", "a,b\n1,x\n2,y\n3,z\n")
    return d


def test_checkpoint_error_ignore_makes_resume_skip(spark, small_dump, tmp_path):
    """ctl --checkpoint-error-ignore must leave the table in a state the
    next run SKIPS (accept-data-as-is, reference ctl main.go:44-96).
    Before round 4 it lifted only to 'imported' while resume demanded
    'checksummed' — the next run re-imported and re-failed."""
    from tidb_lightning_spark import cli

    target = str(tmp_path / "wh")
    cfg = Config.from_toml(None, source_dir=small_dump, target_dir=target)
    r = Restorer(spark, cfg)
    rep1 = r.run()
    assert rep1.ok

    # simulate the downgrade a required-checksum failure leaves behind
    r.checkpoints.update("s", "t", "closed")
    rep2 = Restorer(spark, cfg).run()  # sanity: closed table re-imports
    assert {t.status for t in rep2.tables} == {"imported"}

    r.checkpoints.update("s", "t", "closed")
    rc = cli.main(
        ["ctl", "--target", target, "--checkpoint-error-ignore", "all"]
    )
    assert rc == 0
    rep3 = Restorer(spark, cfg).run()
    assert {t.status for t in rep3.tables} == {"skipped"}


def test_sqlite_store_concurrent_engine_updates(tmp_path):
    """Concurrent read-modify-write from multiple threads (the server +
    ctl scenario) must not lose engine records: every update now runs in
    one BEGIN IMMEDIATE transaction."""
    import threading

    from tidb_lightning_spark.checkpoints import SQLiteCheckpointStore

    store = SQLiteCheckpointStore(str(tmp_path / "cp.sqlite"))
    n_threads, n_each = 4, 15
    errs = []

    def worker(t):
        try:
            for i in range(n_each):
                store.engine_update(
                    "db", "tbl", t * 100 + i, "imported", bytes=i
                )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    engines = store.get("db", "tbl").get("engines", {})
    assert len(engines) == n_threads * n_each


def test_gz_sqldump_rowid_reservation_no_collision(spark, tmp_path):
    """Row-id ranges for compressed SQL dumps must be reserved from the
    DECOMPRESSED size: a highly-compressible gz dump previously reserved
    compressed_size // divisor ids and overran the next file's base,
    yielding duplicate auto-increment ids."""
    d = str(tmp_path / "dump")
    write(f"{d}/g-schema-create.sql", "CREATE DATABASE IF NOT EXISTS g;")
    write(
        f"{d}/g.t-schema.sql",
        "CREATE TABLE t (id BIGINT PRIMARY KEY AUTO_INCREMENT, "
        "v VARCHAR(16));",
    )
    n_rows = 2000
    for part in (1, 2):
        rows = ",\n".join(f"('r{part}')" for _ in range(n_rows))
        os.makedirs(d, exist_ok=True)
        with gzip.open(f"{d}/g.t.{part}.sql.gz", "wt") as f:
            f.write(f"INSERT INTO `t` (`v`) VALUES {rows};\n")
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(None, source_dir=d, target_dir=target)
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    out = spark.read.parquet(f"{target}/g/t")
    assert out.count() == 2 * n_rows
    assert out.select("id").distinct().count() == 2 * n_rows


def test_trash_sweep_restores_and_deletes(tmp_path):
    """A crash between Import's two renames strands `._trash_*`:
    sweep_trash deletes it when the table exists (obsolete old copy) and
    restores it when the table is gone (the trash IS the table)."""
    from tidb_lightning_spark.sinks.files_sink import FilesSink

    wh = str(tmp_path / "wh")
    sink = FilesSink(wh)

    # case 1: final missing -> restore
    t1 = os.path.join(wh, "db", "t1._trash_deadbeef")
    write(os.path.join(t1, "part-0.parquet"), "data")
    # case 2: final present -> delete trash
    write(os.path.join(wh, "db", "t2", "part-0.parquet"), "new")
    t2 = os.path.join(wh, "db", "t2._trash_cafebabe")
    write(os.path.join(t2, "part-0.parquet"), "old")

    assert sink.sweep_trash() == 2
    assert os.path.isdir(os.path.join(wh, "db", "t1"))
    assert not os.path.exists(t1)
    assert os.path.isdir(os.path.join(wh, "db", "t2"))
    assert not os.path.exists(t2)
    # idempotent
    assert sink.sweep_trash() == 0


def test_lsh_candidate_pairs_releases_cache(spark):
    """The persisted MinHash signature cache must be released once the
    caller drops the result — long-lived sessions must not accumulate
    leaked cache entries (round-2 ADVICE)."""
    import gc

    from tidb_lightning_spark.functions.dedup import lsh_candidate_pairs

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 7} jumps over dog {i % 5}")
         for i in range(200)],
        "doc_id long, text string",
    )
    result = lsh_candidate_pairs(df, "doc_id", "text")
    result.collect()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert not cm.isEmpty()  # cache in use while result is alive
    del result
    gc.collect()
    assert cm.isEmpty()
