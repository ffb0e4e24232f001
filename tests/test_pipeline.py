"""End-to-end restore tests: dump dir -> Restorer -> warehouse parquet
(model: reference tests/csv, tests/default-columns, tests/routes,
tests/checkpoint* golden-query assertions — fixtures are our own)."""

from __future__ import annotations

import os

import pytest

from tidb_lightning_spark.config import Config
from tidb_lightning_spark.pipeline import Restorer


def write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


@pytest.fixture
def dump_dir(tmp_path):
    d = str(tmp_path / "dump")
    write(f"{d}/mydb-schema-create.sql", "CREATE DATABASE IF NOT EXISTS mydb;")
    write(
        f"{d}/mydb.people-schema.sql",
        """
        CREATE TABLE people (
            id INT PRIMARY KEY AUTO_INCREMENT,
            name VARCHAR(5),
            score DECIMAL(6,2) NOT NULL DEFAULT 1.5,
            flag TINYINT,
            created DATETIME NOT NULL DEFAULT CURRENT_TIMESTAMP
        );
        """,
    )
    write(
        f"{d}/mydb.people.csv",
        'name,score,flag\n"alice",10.5,1\n"bob,x",\\N,200\n"characters",3.25,-200\n',
    )
    write(
        f"{d}/mydb.kv-schema.sql",
        "CREATE TABLE kv (a BIGINT UNSIGNED NOT NULL, b TEXT, c BLOB, "
        "PRIMARY KEY (a));",
    )
    write(
        f"{d}/mydb.kv.sql",
        "INSERT INTO `kv` VALUES (18446744073709551615, 'x''y', X'414243'),\n"
        " (2, NULL, NULL), (3, 'z', 0x5A);\n",
    )
    return d


def test_end_to_end_restore(spark, dump_dir, tmp_path):
    target = str(tmp_path / "warehouse")
    cfg = Config.from_toml(None, source_dir=dump_dir, target_dir=target)
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    assert {t.table: t.status for t in rep.tables} == {
        "people": "imported",
        "kv": "imported",
    }

    people = spark.read.parquet(f"{target}/mydb/people")
    rows = {r["name"]: r.asDict() for r in people.collect()}
    assert len(rows) == 3
    # non-strict casts: overlong name truncated to 5 chars
    assert "chara" in rows
    # missing score -> NULL in file? no: \N null with NOT NULL -> default 1.5
    import decimal

    assert rows["bob,x"]["score"] == decimal.Decimal("1.50")
    # tinyint clamp 200 -> 127, -200 -> -128
    assert rows["bob,x"]["flag"] == 127
    assert rows["chara"]["flag"] == -128
    # auto-increment ids are unique and non-null
    ids = [r["id"] for r in rows.values()]
    assert len(set(ids)) == 3 and all(i is not None for i in ids)
    # pinned CURRENT_TIMESTAMP default applied
    assert all(r["created"] is not None for r in rows.values())

    kv = spark.read.parquet(f"{target}/mydb/kv")
    kvrows = {str(r["a"]): r.asDict() for r in kv.collect()}
    assert set(kvrows) == {"18446744073709551615", "2", "3"}
    assert kvrows["18446744073709551615"]["b"] == "x'y"
    assert bytes(kvrows["18446744073709551615"]["c"]) == b"ABC"
    assert bytes(kvrows["3"]["c"]) == b"Z"
    assert kvrows["2"]["b"] is None

    # sorted-by-PK output: each file internally ordered
    a_vals = [r["a"] for r in kv.orderBy("a").collect()]
    assert a_vals == sorted(a_vals)


def test_checkpoint_resume_skips(spark, dump_dir, tmp_path):
    target = str(tmp_path / "wh2")
    cfg = Config.from_toml(None, source_dir=dump_dir, target_dir=target)
    rep1 = Restorer(spark, cfg).run()
    assert rep1.ok
    rep2 = Restorer(spark, cfg).run()
    assert all(t.status == "skipped" for t in rep2.tables)
    # source change invalidates the signature -> re-import
    with open(f"{dump_dir}/mydb.kv.sql", "a") as f:
        f.write("INSERT INTO kv VALUES (9, 'new', NULL);\n")
    rep3 = Restorer(spark, cfg).run()
    statuses = {t.table: t.status for t in rep3.tables}
    assert statuses["kv"] == "imported"
    assert statuses["people"] == "skipped"
    kv = spark.read.parquet(f"{target}/mydb/kv")
    assert kv.count() == 4


def test_strict_mode_fails_on_lossy(spark, tmp_path):
    d = str(tmp_path / "dump")
    write(f"{d}/s-schema-create.sql", "CREATE DATABASE s;")
    write(f"{d}/s.t-schema.sql", "CREATE TABLE t (a TINYINT NOT NULL);")
    write(f"{d}/s.t.csv", "a\n128\n")
    target = str(tmp_path / "wh3")
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target, strict_sql_mode=True,
        checkpoint_enable=False,
    )
    rep = Restorer(spark, cfg).run()
    assert rep.tables[0].status == "failed"
    assert "strict" in rep.tables[0].error
    # staged commit aborted: the warehouse never saw the bad table
    assert not os.path.isdir(f"{target}/s/t")


def test_shard_merge_end_to_end(spark, tmp_path):
    # semantics pinned by reference tests/routes/run.sh: count=4, sum(x)=259
    d = str(tmp_path / "dump")
    write(f"{d}/routes_a0-schema-create.sql", "CREATE DATABASE routes_a0;")
    write(f"{d}/routes_a1-schema-create.sql", "CREATE DATABASE routes_a1;")
    write(f"{d}/routes_a0.t0-schema.sql", "CREATE TABLE t0 (x INT);")
    write(f"{d}/routes_a0.t0.sql", "INSERT INTO t0 VALUES (1), (2);")
    write(f"{d}/routes_a0.t1-schema.sql", "CREATE TABLE t1 (x INT);")
    write(f"{d}/routes_a0.t1.sql", "INSERT INTO t1 VALUES (4);")
    write(f"{d}/routes_a1.t2-schema.sql", "CREATE TABLE t2 (x INT);")
    write(f"{d}/routes_a1.t2.sql", "INSERT INTO t2 VALUES (252);")
    target = str(tmp_path / "wh4")
    cfg = Config.from_toml(
        None,
        source_dir=d,
        target_dir=target,
        checkpoint_enable=False,
    )
    cfg.routes = [
        {
            "schema-pattern": "routes_a*",
            "table-pattern": "t*",
            "target-schema": "routes_b",
            "target-table": "u",
        }
    ]
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    u = spark.read.parquet(f"{target}/routes_b/u")
    assert u.count() == 4
    assert sum(r["x"] for r in u.collect()) == 259


def test_cli_run_and_ctl(spark, dump_dir, tmp_path, capsys):
    from tidb_lightning_spark import cli

    target = str(tmp_path / "wh5")
    rc = cli.main(["run", "--source", dump_dir, "--target", target])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"ok": true' in out
    rc = cli.main(["ctl", "--target", target, "--checkpoint-dump"])
    assert rc == 0
    assert "`mydb`.`people`" in capsys.readouterr().out


def test_duplicate_resolution_files_backend(spark, tmp_path):
    # tidb_duplicate_data scenario analog on the files backend: the same
    # PK appears twice; replace keeps the LAST occurrence, ignore the
    # FIRST, error fails the table.
    import dataclasses as _dc

    def build(policy):
        d = str(tmp_path / f"dump_{policy}")
        os.makedirs(d, exist_ok=True)
        write(f"{d}/d-schema-create.sql", "CREATE DATABASE d;")
        write(f"{d}/d.t-schema.sql",
               "CREATE TABLE t (a INT, b VARCHAR(10), PRIMARY KEY (a));")
        write(f"{d}/d.t.csv", "a,b\n1,first\n2,only\n1,last\n")
        target = str(tmp_path / f"wh_{policy}")
        cfg = Config.from_toml(None, source_dir=d, target_dir=target,
                               checkpoint_enable=False, checksum="off",
                               duplicate_resolution=policy)
        return cfg, target

    cfg, target = build("replace")
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    rows = {r["a"]: r["b"] for r in spark.read.parquet(f"{target}/d/t").collect()}
    assert rows == {1: "last", 2: "only"}

    cfg, target = build("ignore")
    rep = Restorer(spark, cfg).run()
    assert rep.ok
    rows = {r["a"]: r["b"] for r in spark.read.parquet(f"{target}/d/t").collect()}
    assert rows == {1: "first", 2: "only"}

    cfg, target = build("error")
    rep = Restorer(spark, cfg).run()
    assert not rep.ok
    assert "duplicate primary key" in rep.tables[0].error


def test_orc_output_format(spark, tmp_path):
    d = str(tmp_path / "dump_orc")
    os.makedirs(d, exist_ok=True)
    write(f"{d}/d-schema-create.sql", "CREATE DATABASE d;")
    write(f"{d}/d.t-schema.sql",
          "CREATE TABLE t (a INT, b VARCHAR(10), PRIMARY KEY (a));")
    write(f"{d}/d.t.csv", "a,b\n1,x\n2,y\n")
    target = str(tmp_path / "wh_orc")
    cfg = Config.from_toml(None, source_dir=d, target_dir=target,
                           checkpoint_enable=False, output_format="orc")
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    rows = {r["a"]: r["b"] for r in spark.read.orc(f"{target}/d/t").collect()}
    assert rows == {1: "x", 2: "y"}


def test_resume_reverifies_unchecksummed(spark, tmp_path):
    """ADVICE r1: a table recorded `imported` but never `checksummed` must
    NOT be skipped on resume when verification is on — otherwise a failed
    checksum phase is permanently masked as `skipped`/ok."""
    d = str(tmp_path / "dump_cv")
    write(f"{d}/cv-schema-create.sql", "CREATE DATABASE cv;")
    write(f"{d}/cv.t-schema.sql",
          "CREATE TABLE t (a INT, b VARCHAR(10), PRIMARY KEY (a));")
    write(f"{d}/cv.t.csv", "a,b\n1,x\n2,y\n")
    target = str(tmp_path / "wh_cv")
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target, checksum="required"
    )
    r1 = Restorer(spark, cfg)
    rep1 = r1.run()
    assert rep1.ok
    # fully verified run -> resume skips
    rep2 = Restorer(spark, cfg).run()
    assert rep2.tables[0].status == "skipped"
    # simulate a crash between import and checksum: downgrade to imported
    r3 = Restorer(spark, cfg)
    rec = r3.checkpoints.get("cv", "t")
    r3.checkpoints.update("cv", "t", "imported", signature=rec["signature"])
    rep3 = r3.run()
    assert rep3.tables[0].status == "imported"  # re-ran, not skipped
    # with verification off, `imported` is a legitimate skip point
    cfg_off = Config.from_toml(
        None, source_dir=d, target_dir=target, checksum="off"
    )
    r4 = Restorer(spark, cfg_off)
    rec = r4.checkpoints.get("cv", "t")
    r4.checkpoints.update("cv", "t", "imported", signature=rec["signature"])
    assert Restorer(spark, cfg_off).run().tables[0].status == "skipped"


def test_sqldump_exotic_filename_rowids(spark, tmp_path):
    """ADVICE r1: input_file_name() returns a percent-encoded URI; the
    row-id base lookup must decode it or auto-increment fills go NULL for
    non-ASCII / spaced file names (CSV path was covered; this pins SQL)."""
    d = str(tmp_path / "dump_exo")
    write(f"{d}/exo-schema-create.sql", "CREATE DATABASE exo;")
    tbl = "tablé x"
    write(
        f"{d}/exo.{tbl}-schema.sql",
        "CREATE TABLE `tablé x` ("
        "id INT PRIMARY KEY AUTO_INCREMENT, v VARCHAR(10));",
    )
    write(
        f"{d}/exo.{tbl}.sql",
        "INSERT INTO `tablé x` (v) VALUES ('a'), ('b'), ('c');\n",
    )
    target = str(tmp_path / "wh_exo")
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target, checkpoint_enable=False
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    rows = spark.read.parquet(f"{target}/exo/{tbl}").collect()
    ids = sorted(r["id"] for r in rows)
    assert None not in ids and len(set(ids)) == 3
    assert ids == [1, 2, 3]


def test_parquet_rowids_resume_stable(spark, tmp_path):
    """Parquet row ids come from footer row counts + in-file row index
    (reference mydump/region.go:290-315) — identical across runs with
    different split configs, unlike monotonically_increasing_id."""
    import pandas as pd

    d = str(tmp_path / "dump_pq")
    os.makedirs(d, exist_ok=True)
    write(f"{d}/pq-schema-create.sql", "CREATE DATABASE pq;")
    write(
        f"{d}/pq.t-schema.sql",
        "CREATE TABLE t (k INT, v VARCHAR(10), PRIMARY KEY (k));",
    )
    pd.DataFrame({"k": range(0, 50), "v": [f"a{i}" for i in range(50)]}).to_parquet(
        f"{d}/pq.t.0.parquet"
    )
    pd.DataFrame({"k": range(50, 80), "v": [f"b{i}" for i in range(30)]}).to_parquet(
        f"{d}/pq.t.1.parquet"
    )

    def run_ids(split_bytes):
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
        try:
            target = str(tmp_path / f"wh_pq_{split_bytes}")
            cfg = Config.from_toml(
                None, source_dir=d, target_dir=target,
                checkpoint_enable=False, duplicate_resolution="replace",
            )
            rep = Restorer(spark, cfg).run()
            assert rep.ok, [t.error for t in rep.tables]
            from tidb_lightning_spark.sources.loader import discover
            from tidb_lightning_spark.sources.router import FileRouter
            from tidb_lightning_spark.sources.table_filter import TableFilter

            res = discover(
                d,
                file_router=FileRouter.build(cfg.file_routes, cfg.default_file_rules),
                table_filter=TableFilter(cfg.filter, cfg.case_sensitive),
                table_router=None,
                no_schema=False,
            )
            tbl = res.sorted_tables()[0]
            info = Restorer(spark, cfg)._table_info(tbl)
            df, _ = Restorer(spark, cfg)._read_and_transform(tbl, info)
            return {
                r["k"]: r["_tidb_rowid"] for r in df.select("k", "_tidb_rowid").collect()
            }
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    ids_small = run_ids(1024)        # many splits
    ids_big = run_ids(256 * 1024 * 1024)  # one split per file
    assert ids_small == ids_big
    assert len(set(ids_small.values())) == 80  # unique
    # per-file bases: file 0 rows get 1..50, file 1 rows 51..80
    assert ids_small[0] == 1 and ids_small[49] == 50
    assert ids_small[50] == 51 and ids_small[79] == 80


def test_engine_checkpoint_resume_mid_table(spark, tmp_path):
    """Chunk-level resume (reference tests/checkpoint_chunks): a run that
    dies after importing some engines of a table resumes importing ONLY
    the remainder, and the final table is checksum-identical to a clean
    single-run import."""
    from tidb_lightning_spark.sinks.files_sink import FilesSink

    d = str(tmp_path / "dump_eng")
    os.makedirs(d, exist_ok=True)
    write(f"{d}/e-schema-create.sql", "CREATE DATABASE e;")
    write(
        f"{d}/e.t-schema.sql",
        "CREATE TABLE t (a INT, b VARCHAR(20), PRIMARY KEY (a));",
    )
    for i in range(4):  # 4 data files, ~1 engine each under a tiny limit
        rows = "\n".join(f"{i * 1000 + j},val{i * 1000 + j}" for j in range(200))
        write(f"{d}/e.t.{i:03d}.csv", "a,b\n" + rows + "\n")
    sizes = [os.path.getsize(f"{d}/e.t.{i:03d}.csv") for i in range(4)]

    def make_cfg(target):
        return Config.from_toml(
            None, source_dir=d, target_dir=target,
            checksum="required", engine_bytes=max(sizes) + 10,
        )

    # clean single-shot import = golden
    golden_cfg = make_cfg(str(tmp_path / "wh_golden"))
    rep_g = Restorer(spark, golden_cfg).run()
    assert rep_g.ok, [t.error for t in rep_g.tables]

    # failpoint: die after 2 engines (reference FailIfImportedChunk)
    cfg = make_cfg(str(tmp_path / "wh_resume"))
    calls = {"n": 0}
    orig = FilesSink.write_engine

    def failing(self, df, db, table, engine, **kw):
        if calls["n"] == 2:
            raise RuntimeError("failpoint: killed after 2 engines")
        calls["n"] += 1
        return orig(self, df, db, table, engine, **kw)

    FilesSink.write_engine = failing
    try:
        rep1 = Restorer(spark, cfg).run()
    finally:
        FilesSink.write_engine = orig
    assert not rep1.ok and "failpoint" in rep1.tables[0].error

    # resume: only the remaining engines are written
    calls2 = {"n": 0}

    def counting(self, df, db, table, engine, **kw):
        calls2["n"] += 1
        calls2.setdefault("engines", []).append(engine)
        return orig(self, df, db, table, engine, **kw)

    FilesSink.write_engine = counting
    try:
        rep2 = Restorer(spark, cfg).run()
    finally:
        FilesSink.write_engine = orig
    assert rep2.ok, [t.error for t in rep2.tables]
    assert calls2["n"] == 2, f"re-imported {calls2} engines, expected 2"
    assert sorted(calls2["engines"]) == [2, 3]

    # identical content + checksum as the clean import
    assert rep2.tables[0].checksum == rep_g.tables[0].checksum
    got = sorted(
        (r["a"], r["b"])
        for r in spark.read.parquet(str(tmp_path / "wh_resume/e/t")).collect()
    )
    want = sorted(
        (r["a"], r["b"])
        for r in spark.read.parquet(str(tmp_path / "wh_golden/e/t")).collect()
    )
    assert got == want and len(got) == 800

    # third run: fully verified -> skipped
    rep3 = Restorer(spark, make_cfg(str(tmp_path / "wh_resume"))).run()
    assert rep3.tables[0].status == "skipped"


def test_pause_resume_and_error_destroy(spark, tmp_path):
    """M4/M2: the pause flag gates the run between commit units; ctl
    --checkpoint-error-destroy wipes failed tables only."""
    import threading
    import time as _time

    from tidb_lightning_spark import cli
    from tidb_lightning_spark.pipeline import Pauser

    d = str(tmp_path / "dump_p")
    write(f"{d}/p-schema-create.sql", "CREATE DATABASE p;")
    write(f"{d}/p.t-schema.sql", "CREATE TABLE t (a INT, PRIMARY KEY (a));")
    write(f"{d}/p.t.csv", "a\n1\n2\n")
    target = str(tmp_path / "wh_p")
    os.makedirs(target, exist_ok=True)

    # pause flag set -> wait_if_paused blocks until cleared
    assert cli.main(["ctl", "--target", target, "--pause"]) == 0
    p = Pauser(target, poll_s=0.05)
    released = []

    def clearer():
        _time.sleep(0.3)
        cli.main(["ctl", "--target", target, "--resume"])
        released.append(True)

    t = threading.Thread(target=clearer)
    t.start()
    t0 = _time.time()
    p.wait_if_paused()
    t.join()
    assert released and _time.time() - t0 >= 0.25

    cfg = Config.from_toml(None, source_dir=d, target_dir=target)
    rep = Restorer(spark, cfg).run()
    assert rep.ok

    # error-destroy must NOT touch a fully imported table
    assert cli.main(
        ["ctl", "--target", target, "--checkpoint-error-destroy", "all"]
    ) == 0
    assert os.path.isdir(f"{target}/p/t")
    # downgrade to failed-state and destroy
    r = Restorer(spark, cfg)
    rec = r.checkpoints.get("p", "t")
    r.checkpoints.update("p", "t", "closed", signature=rec["signature"])
    assert cli.main(
        ["ctl", "--target", target, "--checkpoint-error-destroy", "p.t"]
    ) == 0
    assert not os.path.isdir(f"{target}/p/t")
    assert Restorer(spark, cfg).checkpoints.get("p", "t") == {}


def test_ctl_compact_coalesces_files(spark, tmp_path):
    """L4: ctl --compact rewrites a many-file table into ~96 MiB-target
    sorted files with identical contents and preserved meta."""
    from tidb_lightning_spark import cli

    d = str(tmp_path / "dump_c")
    write(f"{d}/c-schema-create.sql", "CREATE DATABASE c;")
    write(f"{d}/c.t-schema.sql", "CREATE TABLE t (a INT, PRIMARY KEY (a));")
    for i in range(4):
        rows = "\n".join(str(i * 100 + j) for j in range(100))
        write(f"{d}/c.t.{i:03d}.csv", "a\n" + rows + "\n")
    target = str(tmp_path / "wh_c")
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target, checksum="off",
        engine_bytes=300,  # force one engine per file -> many output files
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    before = [
        f for f in os.listdir(f"{target}/c/t") if f.endswith(".parquet")
    ]
    assert len(before) >= 4
    want = sorted(r["a"] for r in spark.read.parquet(f"{target}/c/t").collect())

    assert cli.main(["ctl", "--target", target, "--compact", "c.t"]) == 0
    after = [
        f for f in os.listdir(f"{target}/c/t") if f.endswith(".parquet")
    ]
    assert len(after) == 1
    got = [r["a"] for r in spark.read.parquet(f"{target}/c/t").collect()]
    assert sorted(got) == want
    # sorted output: the single file is PK-ordered
    assert got == sorted(got)
    assert os.path.exists(f"{target}/c/t/_tls_meta.json")


def test_ctl_import_engine_completes_dangling_commit(spark, tmp_path):
    """A crash BETWEEN the engine's staging write and its rename-into-table
    leaves a closed-but-unimported engine; `ctl --import-engine` finishes
    the commit without re-running Spark, and a subsequent resume run skips
    it (reference dangling-engine import, tidb-lightning-ctl)."""
    import shutil as _sh

    from tidb_lightning_spark.cli import main as cli_main
    from tidb_lightning_spark.checkpoints import CheckpointStore
    from tidb_lightning_spark.sinks.files_sink import ENGINE_MANIFEST, FilesSink

    d = str(tmp_path / "dump_dang")
    os.makedirs(d, exist_ok=True)
    write(f"{d}/e-schema-create.sql", "CREATE DATABASE e;")
    write(
        f"{d}/e.t-schema.sql",
        "CREATE TABLE t (a INT, b VARCHAR(20), PRIMARY KEY (a));",
    )
    for i in range(3):
        rows = "\n".join(f"{i * 1000 + j},v{i * 1000 + j}" for j in range(200))
        write(f"{d}/e.t.{i:03d}.csv", "a,b\n" + rows + "\n")
    sizes = [os.path.getsize(f"{d}/e.t.{i:03d}.csv") for i in range(3)]
    target = str(tmp_path / "wh_dang")
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target,
        checksum="off", engine_bytes=max(sizes) + 10,
    )

    # failpoint: engine 1's staging write completes (manifest in place) but
    # the process dies before the rename loop
    orig = FilesSink.write_engine
    state = {}

    def crashing(self, df, db, table, engine, **kw):
        if engine != 1:
            return orig(self, df, db, table, engine, **kw)
        final = self.table_path(db, table)
        staging = final + "._engine1_deadbeef"
        kw_inner = dict(kw)
        df.write.mode("overwrite").parquet(staging)
        import json as _json

        with open(os.path.join(staging, ENGINE_MANIFEST), "w") as f:
            _json.dump(
                {**kw_inner["manifest"], "db": db, "table": table,
                 "engine": engine}, f,
            )
        state["staging"] = staging
        raise RuntimeError("failpoint: died before engine Import")

    FilesSink.write_engine = crashing
    try:
        rep1 = Restorer(spark, cfg).run()
    finally:
        FilesSink.write_engine = orig
    assert not rep1.ok and "failpoint" in rep1.tables[0].error
    assert os.path.isdir(state["staging"])

    # ctl completes the dangling engine
    rc = cli_main(["ctl", "--target", target, "--import-engine", "e.t"])
    assert rc == 0
    assert not os.path.exists(state["staging"])
    tbl_dir = os.path.join(target, "e", "t")
    assert any(f.startswith("engine0001-") for f in os.listdir(tbl_dir))
    rec = CheckpointStore(
        os.path.join(target, "_tls_checkpoints.json")
    ).get("e", "t")
    assert rec["engines"]["1"]["signature"]

    # resume run: engines 0 and 2 rewritten (their commit never happened),
    # engine 1 skipped because ctl recorded it
    calls = {"engines": []}

    def counting(self, df, db, table, engine, **kw):
        calls["engines"].append(engine)
        return orig(self, df, db, table, engine, **kw)

    FilesSink.write_engine = counting
    try:
        rep2 = Restorer(spark, cfg).run()
    finally:
        FilesSink.write_engine = orig
    assert rep2.ok, [t.error for t in rep2.tables]
    assert 1 not in calls["engines"]
    got = sorted(
        r["a"] for r in spark.read.parquet(tbl_dir).collect()
    )
    assert got == list(range(0, 200)) + list(range(1000, 1200)) + list(
        range(2000, 2200)
    )
    _sh.rmtree(target, ignore_errors=True)


def test_sqlite_checkpoint_driver_and_ctl_autodetect(spark, tmp_path):
    """checkpoint.driver=sqlite: same resume semantics through the
    transactional store; ctl auto-detects the sqlite flavor; two store
    handles see each other's committed state (the concurrent-access
    property the JSON driver lacks)."""
    from tidb_lightning_spark.checkpoints import (
        SQLiteCheckpointStore,
        open_checkpoint_store,
    )
    from tidb_lightning_spark.cli import main as cli_main

    d = str(tmp_path / "dump_sq")
    os.makedirs(d, exist_ok=True)
    write(f"{d}/s-schema-create.sql", "CREATE DATABASE s;")
    write(f"{d}/s.t-schema.sql", "CREATE TABLE t (a INT PRIMARY KEY, b VARCHAR(10));")
    write(f"{d}/s.t.csv", "a,b\n1,x\n2,y\n3,z\n")
    target = str(tmp_path / "wh_sq")

    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target, checksum="required",
    )
    cfg.checkpoint_driver = "sqlite"
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [t.error for t in rep.tables]
    assert os.path.exists(os.path.join(target, "_tls_checkpoints.sqlite"))
    assert not os.path.exists(os.path.join(target, "_tls_checkpoints.json"))

    # a second run skips (resume semantics intact through sqlite)
    rep2 = Restorer(spark, cfg).run()
    assert rep2.ok and rep2.tables[0].status == "skipped"

    # two independent handles observe each other's writes immediately
    a = open_checkpoint_store(target, driver="auto")
    b = open_checkpoint_store(target, driver="auto")
    assert isinstance(a, SQLiteCheckpointStore)
    a.update("s", "t2", "loaded", signature="sig-x")
    assert b.get("s", "t2")["status_name"] == "loaded"

    # ctl sees the sqlite store without being told the driver
    rc = cli_main(["ctl", "--target", target, "--checkpoint-remove", "s.t2"])
    assert rc == 0
    assert a.get("s", "t2") == {}
