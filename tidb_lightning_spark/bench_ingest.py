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


def _prepare_source(sf_dir: str, scale: int = 1, fmt: str = "csv") -> str:
    """Mydumper-style dump dir generated from the SF's lineitem parquet
    (not timed). scale>1 hardlinks the base data file into N numbered
    files (`bench.lineitem.{i}.{fmt}`) — the standard multi-file table
    layout — to measure fixed-cost amortization on a bigger import
    without new data. fmt='sql' emits mydumper INSERT dumps (the
    reference's primary format; its 28 MiB/s headline is this path)."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    # "_mrg" versions the parquet cache dir: pre-r10 /tmp caches hold the
    # single-row-group layout and would silently keep benchmarking it
    fmt_tag = f"{fmt}_mrg" if fmt == "parquet" else fmt
    src = f"/tmp/tls_bench_src{tag}_{fmt_tag}" + (
        f"_x{scale}" if scale > 1 else ""
    )
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
    base = _prepare_source(sf_dir, fmt=fmt) if scale > 1 else src
    if scale > 1:
        name = f"bench.lineitem.{fmt}"
        stem, ext = name.rsplit(".", 1)
        for i in range(scale):
            os.link(
                os.path.join(base, name),
                os.path.join(src, f"{stem}.{i:03d}.{ext}"),
            )
    elif fmt == "parquet":
        # The driver's SF parquet is ONE row group per file — indivisible
        # by maxPartitionBytes, so an xN hardlink layout caps the scan at
        # file-count parallelism and benchmarks the fixture, not the
        # engine (r9 verdict item 2). Rewrite the base file with row
        # groups proportioned like production files (~10 per file, the
        # 8-16 MiB-in-a-128 MiB-file shape), so byte-range splits engage
        # exactly as they do on real multi-row-group data. Not timed.
        import pyarrow.parquet as pq

        sp = f"{sf_dir}/lineitem.parquet"
        dst = os.path.join(src, "bench.lineitem.parquet")
        tbl = pq.read_table(sp)
        n_rgs = 10
        rows_per_rg = max(1, -(-tbl.num_rows // n_rgs))
        pq.write_table(tbl, dst, row_group_size=rows_per_rg)
    elif fmt == "sql":
        con = duckdb.connect()
        cur = con.execute(
            f"SELECT * FROM '{sf_dir}/lineitem.parquet' ORDER BY "
            f"l_orderkey, l_linenumber"
        )
        with open(os.path.join(src, "bench.lineitem.sql"), "w") as f:
            f.write("/*!40101 SET NAMES binary*/;\n")
            while True:
                rows = cur.fetchmany(1000)
                if not rows:
                    break
                vals = ",\n".join(
                    "(" + ",".join(_sql_lit(v) for v in r) + ")"
                    for r in rows
                )
                f.write(f"INSERT INTO `lineitem` VALUES\n{vals};\n")
        con.close()
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


def _sql_lit(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, (int, float, decimal.Decimal)):
        return str(v)
    if isinstance(v, datetime.datetime):
        return "'" + v.strftime("%Y-%m-%d %H:%M:%S") + "'"
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def run_ingest_bench(
    spark, sf_dir: str, scale: int = 1, fmt: str = "csv"
) -> dict:
    import time

    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    src = _prepare_source(sf_dir, scale=scale, fmt=fmt)
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
    ext = {"sql": ".sql", "parquet": ".parquet"}.get(fmt, ".csv")
    csv_bytes = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(ext) and not f.endswith("-schema.sql")
        and f != "bench-schema-create.sql"
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
