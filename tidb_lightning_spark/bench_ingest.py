"""Ingest throughput benchmark: the reference's headline number is bulk
CSV->sorted-KV throughput (28 MiB/s ~ 100 GiB/hour, restore.go:959;
BASELINE.md). We measure the same end-to-end shape: CSV dump dir ->
Restorer pipeline (parse, permute, cast, sort by PK) -> parquet warehouse.

The CSV source is generated once per SF from the driver's lineitem parquet
(DuckDB COPY — not timed) and cached in /tmp.
"""

from __future__ import annotations

import os
import shutil

LINEITEM_DDL = """
CREATE TABLE lineitem (
    l_orderkey BIGINT NOT NULL,
    l_partkey BIGINT NOT NULL,
    l_suppkey BIGINT NOT NULL,
    l_linenumber INT NOT NULL,
    l_quantity DECIMAL(12,2) NOT NULL,
    l_extendedprice DECIMAL(12,2) NOT NULL,
    l_discount DECIMAL(12,2) NOT NULL,
    l_tax DECIMAL(12,2) NOT NULL,
    l_returnflag CHAR(1) NOT NULL,
    l_linestatus CHAR(1) NOT NULL,
    l_shipdate DATETIME NOT NULL,
    PRIMARY KEY (l_orderkey, l_linenumber)
);
"""


def _prepare_source(sf_dir: str, scale: int = 1) -> str:
    """Mydumper-style CSV dump dir generated from the SF's lineitem parquet
    (not timed). scale>1 hardlinks the base CSV into N numbered data files
    (`bench.lineitem.{i}.csv`) — the standard multi-file table layout — to
    measure fixed-cost amortization on a bigger import without new data."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    src = f"/tmp/tls_bench_src{tag}" + (f"_x{scale}" if scale > 1 else "")
    marker = os.path.join(src, "_ready")
    if os.path.exists(marker):
        return src
    import duckdb

    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "bench-schema-create.sql"), "w") as f:
        f.write("CREATE DATABASE IF NOT EXISTS bench;")
    with open(os.path.join(src, "bench.lineitem-schema.sql"), "w") as f:
        f.write(LINEITEM_DDL)
    base = _prepare_source(sf_dir) if scale > 1 else src
    if scale > 1:
        for i in range(scale):
            os.link(
                os.path.join(base, "bench.lineitem.csv"),
                os.path.join(src, f"bench.lineitem.{i:03d}.csv"),
            )
    else:
        con = duckdb.connect()
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/lineitem.parquet') TO "
            f"'{src}/bench.lineitem.csv' (FORMAT CSV, HEADER)"
        )
        con.close()
    with open(marker, "w") as f:
        f.write("ok")
    return src


def run_ingest_bench(spark, sf_dir: str, scale: int = 1) -> dict:
    import time

    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    src = _prepare_source(sf_dir, scale=scale)
    target = "/tmp/tls_bench_wh"
    shutil.rmtree(target, ignore_errors=True)
    cfg = Config.from_toml(
        None,
        source_dir=src,
        target_dir=target,
        checksum="off",  # baseline throughput excludes the verify pass
        checkpoint_enable=False,
    )
    # the reference's 28 MiB/s headline (restore.go:959) times the import
    # phase; checksum and ANALYZE are separate post-import phases there,
    # so both stay out of the timed window here too (analyze=off keeps the
    # readback at footer-metadata count, no data scan)
    cfg.analyze = "off"
    # mydumper-style CSV has no embedded newlines -> splittable scan, the
    # same condition the reference requires to split big CSVs (A11)
    import dataclasses

    cfg.csv = dataclasses.replace(cfg.csv, strict_format=True)
    csv_bytes = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".csv")
    )

    t0 = time.time()
    report = Restorer(spark, cfg).run()
    seconds = time.time() - t0
    if not report.ok:
        raise RuntimeError(f"ingest bench failed: {report.tables[0].error}")

    rows = spark.read.parquet(f"{target}/bench/lineitem").count()
    return {
        "seconds": seconds,
        "bytes": csv_bytes,
        "rows": rows,
        "mib_per_sec": csv_bytes / (1024 * 1024) / seconds,
        "rows_per_sec": rows / seconds,
    }
