"""Reference-golden e2e: restore dumps SHIPPED BY THE REFERENCE
(tests/various_types, tests/too_many_columns, tests/exotic_filenames)
through our pipeline and assert the expectations from each run.sh —
the strongest parity evidence available without a TiDB cluster.

This dataset already caught three real bugs in r11: CONVERT(...
USING ...) literals in SQL dumps, the 64-member SET bitmask
overflowing a py4j long at plan-construction time, and DOUBLE parsing
through a decimal(38,9) intermediate (clamped 1e304, zeroed 1e-305).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def _restore(spark, tmp_path, src, **cfg_kw):
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=src, target_dir=target,
        checkpoint_enable=False, **cfg_kw,
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    return target


def test_various_types_golden(spark, tmp_path):
    """The reference's exotic-type battery (tests/various_types/run.sh
    expectations, adapted to our storage semantics: BIT -> integer,
    BINARY -> bytes, SET -> canonical member list)."""
    wh = _restore(spark, tmp_path, f"{REF}/various_types/data")
    r = lambda t: spark.read.parquet(f"{wh}/vt/{t}")  # noqa: E731

    bit = r("bit")
    assert bit.count() == 16
    lo, hi = bit.agg(F.min("pk"), F.max("pk")).first()
    assert (lo, hi) == (0, 3)  # bin 0 .. bin 11
    assert bit.filter(F.col("pk") == 2).agg(
        F.sum("ref")
    ).first()[0] == 82

    dec = r("decimal")
    assert dec.count() == 50
    mn, mx, sm = dec.agg(F.min("pk"), F.max("pk"), F.sum("pk")).first()
    assert (str(mn), str(mx), str(sm)) == (
        "-99.9990", "99.9912", "-9.9123"
    )
    assert dec.filter(F.col("pk").between(-1.0, 0.0)).first()["ref"] == 22

    dbl = r("double")
    assert dbl.count() == 41
    mn, mx = dbl.agg(F.min("pk"), F.max("pk")).first()
    # full DOUBLE range survives the cast chain (the r11 bug classes:
    # 1e304 must not clamp, 1e-305 must not round to zero)
    assert mn == 9.85967654375977e-305
    assert mx == 1.0142320547350045e304
    assert dbl.filter(
        F.col("pk").between(1e100, 1e120)
    ).first()["ref"] == 245

    dt = r("datetime")
    assert dt.count() == 70
    row = dt.agg(
        F.min("pk"), F.max("pk"), F.min("uk"), F.max("uk")
    ).first()
    assert str(row[0]) == "1026-09-21 15:15:54.335745"
    assert str(row[1]) == "9889-01-08 08:51:03.389832"
    # TIMESTAMP(3): fractional seconds ROUND to millis (MySQL fsp)
    assert str(row[2]).endswith("19:25:45.843000")
    assert str(row[3]).endswith("10:48:28.620000")
    assert dt.filter(
        F.col("pk").between("2882-01-01", "2882-12-31")
    ).first()["ref"] == 7

    ch = r("char")
    assert ch.count() == 50
    mn, mx = ch.agg(F.min("pk"), F.max("pk")).first()
    assert mn == "090abbb2-f22e-4f97-a4fe-a52eb1a80a0b"
    assert mx == "fde1328c-409c-43a8-b1b0-8c35c8000f92"
    assert ch.filter(
        F.col("pk") == "55dc0343-db6a-4208-9872-9096305b8c07"
    ).first()["ref"] == 41

    bi = r("binary")
    assert bi.count() == 51
    assert bi.select(F.hex(F.max("pk"))).first()[0] == (
        "FDE1328C409C43A8B1B08C35C8000F92"
    )
    assert bi.filter(
        F.hex("pk") == "55DC0343DB6A420898729096305B8C07"
    ).first()["ref"] == 41

    js = r("json")
    assert js.count() == 92
    assert js.select(F.countDistinct("js")).first()[0] == 92
    # the CONVERT("..." USING UTF8MB4) literal decodes to its inner text
    assert js.filter(F.col("pk") == 2000).first()["js"] == (
        '{"52": 1, "54": 1, "68": 1, "126": 1}'
    )

    es = r("enum-set")
    assert es.count() == 26
    # 64-member SET: canonical member-list storage, bit 63 included
    assert es.filter(F.col("enum") == "gcc").first()["set"] == (
        "x00,x06,x07,x09,x17,x20,x23,x24,x27,x37,x44,x46,x49,x54,"
        "x55,x58,x61,x62"
    )
    assert es.filter(
        F.array_contains(F.split("set", ","), "x50")
    ).count() == 10

    em = r("empty_strings")
    assert em.count() == 6
    assert em.filter(F.col("a") == "").agg(F.sum("pk")).first()[0] == 5
    assert em.filter(F.col("a") == '"').agg(F.sum("pk")).first()[0] == 18
    assert em.filter(F.col("a") == "'").agg(F.sum("pk")).first()[0] == 40

    row = r("precise_types").first()
    assert str(row["a"]) == "18446744073709551614"
    assert row["b"] == -9223372036854775806
    assert str(row["c"]) == "99999999999999999999.0"


def test_too_many_columns_golden(spark, tmp_path):
    """256-column CSV restore (tests/too_many_columns/run.sh)."""
    wh = _restore(spark, tmp_path, f"{REF}/too_many_columns/data")
    df = spark.read.parquet(f"{wh}/too_many_columns/t")
    row = df.first()
    # the schema types every column VARCHAR(16)
    assert row["COL001"] == "1001"
    assert row["COL100"] == "1100"
    assert row["COL256"] == "1256"


def test_exotic_filenames_golden(spark, tmp_path):
    """Unicode and quote-laden db/table filenames route and restore
    (tests/exotic_filenames/run.sh: 中文庫.中文表 and
    x`f\"n.exotic`table``name)."""
    src = str(tmp_path / "dump")
    os.makedirs(src)
    d = f"{REF}/exotic_filenames/data"
    shutil.copy(f"{d}/zwk-schema-create.sql", f"{src}/中文庫-schema-create.sql")
    shutil.copy(f"{d}/zwk.zwb-schema.sql", f"{src}/中文庫.中文表-schema.sql")
    shutil.copy(f"{d}/zwk.zwb.sql", f"{src}/中文庫.中文表.sql")
    shutil.copy(
        f"{d}/xfn-schema-create.sql", f'{src}/x`f"n-schema-create.sql'
    )
    shutil.copy(
        f"{d}/xfn.etn-schema.sql",
        f'{src}/x`f"n.exotic`table``name-schema.sql',
    )
    shutil.copy(
        f"{d}/xfn.etn.sql", f'{src}/x`f"n.exotic`table``name.sql'
    )
    wh = _restore(spark, tmp_path, src)
    zh = spark.read.parquet(f"{wh}/中文庫/中文表")
    assert zh.count() > 0
    xf = spark.read.parquet(f'{wh}/x`f"n/exotic`table``name')
    assert xf.count() > 0


def test_cli_sql_tolerates_exotic_table_names(spark, tmp_path, capsys):
    """A warehouse containing a table whose name is invalid as a bare
    view identifier (hyphen — vt.`enum-set`) must not abort `cli sql`
    registration: the canonical backticked view works, the db_tbl
    alias is sanitized."""
    from tidb_lightning_spark import cli

    wh = tmp_path / "wh"
    os.makedirs(wh / "db1")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(
        str(wh / "db1" / "enum-set")
    )
    spark.createDataFrame([(7,)], "n long").write.parquet(
        str(wh / "db1" / "plain")
    )
    rc = cli.main([
        "sql", "--target", str(wh), "--format", "csv",
        'SELECT count(*) AS n FROM `db1.enum-set`',
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "1"
    # the sanitized alias resolves too
    rc = cli.main([
        "sql", "--target", str(wh), "--format", "csv",
        "SELECT count(*) AS n FROM db1_enum_set",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "1"


def test_issue_datasets_golden(spark, tmp_path):
    """Reference regression dumps: issue_282 (BINARY(16) padding -> the
    exact hex bytes), tool_135 (1000-row multi-file aggregate),
    tool_1420 (reserved-word-adjacent names)."""
    wh = _restore(spark, tmp_path, f"{REF}/issue_282/data")
    hexes = sorted(
        r[0]
        for r in spark.read.parquet(f"{wh}/issue282/t_access3")
        .select(F.hex("accessKey"))
        .collect()
    )
    assert hexes == ["1A", "405026464C415348534841"]

    wh = _restore(
        spark, tmp_path / "b", f"{REF}/tool_135/data"
    )
    bar1 = spark.read.parquet(f"{wh}/tool_135/bar1")
    assert bar1.agg(
        F.count("a"), F.sum("a"), F.min("a"), F.max("a")
    ).first() == (1000, 601500, 102, 1101)

    wh = _restore(spark, tmp_path / "c", f"{REF}/tool_1420/data")
    assert spark.read.parquet(f"{wh}/EE1420/pt_role").first()[
        "ROLE_ID"
    ] == "1"


def test_issue_519_quote_torture_golden(spark, tmp_path):
    """issue_519: CSV whose delimiter is the single quote and whose
    values are nothing but quote permutations — the byte-exact pairs
    from run.sh survive the dialect mapping."""
    from tidb_lightning_spark.sources.csv_source import CSVConfig

    wh = _restore(
        spark, tmp_path, f"{REF}/issue_519/data",
        csv=CSVConfig(separator=",", delimiter="'", header=True,
                      null=r"\N", backslash_escape=False),
    )
    t = spark.read.parquet(f"{wh}/issue519/t")
    rows = {r["a"]: r["b"] for r in t.collect()}
    assert rows["'"] == '"'  # run.sh: WHERE a = '''' -> b: "
    # run.sh: WHERE b = 0x222722272727272722 -> hex(a) = 2227272727222722
    hx = {
        r[1]: r[0]
        for r in t.select(F.hex("a"), F.hex("b")).collect()
    }
    assert hx["222722272727272722"] == "2227272727222722"


def test_tool_241_gb18030_using_btree_golden(spark, tmp_path):
    """tool_241: dump whose schemas carry `KEY (...) USING BTREE` index
    options (the r11 DDL-parser bug) and whose empty tables must still
    materialize; q_fish_event's id aggregate matches run.sh exactly.
    character-set='auto' (the reference's default for this dataset —
    every file is valid utf-8; the r11 version of this test said
    gb18030, which replace-mode decoding silently tolerated and the r12
    strict decode rightly rejects)."""
    wh = _restore(
        spark, tmp_path, f"{REF}/tool_241/data",
        character_set="auto",
    )
    fish = spark.read.parquet(f"{wh}/qyjc/q_fish_event")
    assert fish.agg(F.count("id"), F.min("id"), F.max("id")).first() == (
        84, 8343146, 8343229
    )
    # empty tables restore as empty, not as failures
    assert (
        spark.read.parquet(f"{wh}/qyjc/q_alarm_group").count() == 0
    )


def test_default_columns_golden(spark, tmp_path):
    """tests/default-columns: `VALUES ()` empty tuples and explicit
    DEFAULT take each column's default — auto-inc pk densely filled,
    x stays NULL (its default), y = 123, z = the pinned timestamp;
    partial column lists fill the rest (u: xx auto-inc around
    explicit values)."""
    wh = _restore(spark, tmp_path, f"{REF}/default-columns/data")
    t = spark.read.parquet(f"{wh}/defcol/t")
    assert t.agg(F.min("pk"), F.count("pk")).first() == (1, 9)
    assert t.filter(
        "x IS NOT NULL OR y <> 123 OR z IS NULL"
    ).count() == 0
    u = spark.read.parquet(f"{wh}/defcol/u")
    rows = {r["yy"]: r["xx"] for r in u.collect()}
    assert rows[40] == 1 and rows[60] == 2


def test_no_schema_sql_dump_golden(spark, tmp_path):
    """tests/no_schema: a schema-less, column-list-less SQL dump under
    no-schema mode synthesizes c0..cN names from the first row's arity
    (the reference reads names from the target database there) and
    restores the run.sh aggregate exactly: sum = 120 over 15 rows."""
    wh = _restore(
        spark, tmp_path, f"{REF}/no_schema/data", no_schema=True
    )
    t = spark.read.parquet(f"{wh}/noschema/t")
    assert t.count() == 15
    assert t.agg(F.sum(F.col("c0").cast("long"))).first()[0] == 120


def test_parquet_spark_export_layout_golden(spark, tmp_path):
    """tests/parquet: a Spark-export-layout dump (db.tbl/part-*.gz
    .parquet + _SUCCESS markers) restored via a custom [[mydumper.
    files]] routing rule and no-schema inference — every run.sh row
    count plus the value spot-checks (c_since asserted as the UTC
    instant; the reference's '20:17:16' is the same instant rendered
    in +08:00)."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    rule = {
        "pattern": (
            r"(?i)^(?:[^/]*/)*([a-z0-9_]+)\.([a-z0-9_]+)/"
            r"(?:[a-z0-9\-_.]+\.(parquet))$"
        ),
        "schema": "$1", "table": "$2", "type": "$3",
    }
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=f"{REF}/parquet/data", target_dir=target,
        checkpoint_enable=False, no_schema=True,
        file_routes=[rule], default_file_rules=False,
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    counts = {
        "customer": 20, "district": 10, "history": 100, "item": 100,
        "new_order": 100, "order_line": 100, "orders": 100,
        "stock": 50, "warehouse": 1,
    }
    for tbl, n in counts.items():
        assert (
            spark.read.parquet(f"{target}/test/{tbl}").count() == n
        ), tbl
    c = spark.read.parquet(f"{target}/test/customer")
    assert c.agg(F.sum("c_id")).first()[0] == 210
    assert spark.read.parquet(f"{target}/test/warehouse").first()[
        "w_name"
    ] == "eLNEDIW"
    r = c.filter("c_id = 20").select("c_since", "c_discount").first()
    assert str(r["c_since"]) == "2020-09-10 12:17:16"
    # no-schema inference types by the parquet file; compare by value
    assert float(r["c_discount"]) == 0.0585


def test_sqlmode_golden_both_modes(spark, tmp_path):
    """tests/sqlmode: the non-strict cast battery (clamp, junk->0,
    fractional round, overlong truncate, SET canonicalize/bitmask,
    NOT NULL backstops) matches run.sh row by row, and strict mode
    refuses the table naming column 'a' — the same column the
    reference's kv-convert error names. Documented departures:
    zero-dates store as NULL (no 0000-00-00 in Spark), CHAR truncation
    is by character not legacy-charset byte, and TIMESTAMP keeps its
    full range instead of clamping at 2038."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    wh = _restore(
        spark, tmp_path, f"{REF}/sqlmode/data", strict_sql_mode=False
    )
    t = spark.read.parquet(f"{wh}/sqlmodedb/t")
    rows = {r["id"]: r for r in t.collect()}
    assert [rows[i]["b"] for i in (1, 2, 3, 4, 5)] == [
        127, -128, 0, 100, 0
    ]
    assert [rows[i]["d"] for i in (1, 2, 3, 4, 5)] == [
        "", "x,y", "", "x,y", ""
    ]
    assert rows[1]["c"] == "t"          # 'too long' -> VARCHAR(1)
    assert rows[3]["c"] == "\x99"       # x'99' byte-preserved
    assert rows[4]["c"] == ""
    assert rows[1]["a"] is None         # 9 -> invalid ts -> zero-date
    assert str(rows[4]["a"]) == "2000-01-01 00:00:00"

    target = str(tmp_path / "wh_strict")
    cfg = Config.from_toml(
        None, source_dir=f"{REF}/sqlmode/data", target_dir=target,
        checkpoint_enable=False, strict_sql_mode=True,
    )
    rep = Restorer(spark, cfg).run()
    assert not rep.ok
    (err,) = [t.error for t in rep.tables if t.error]
    assert "strict sql_mode violations" in err and "'a'" in err


def _tables_in(spark, wh):
    out = set()
    for db in os.listdir(wh):
        dbp = os.path.join(wh, db)
        if not os.path.isdir(dbp):
            continue
        for tbl in os.listdir(dbp):
            if os.path.isdir(os.path.join(dbp, tbl)) and not tbl.startswith("_"):
                out.add(f"{db}.{tbl}")
    return out


def test_black_white_list_golden(spark, tmp_path):
    """tests/black-white-list: the reference's LEGACY [black-white-list]
    rules (previously accepted-but-ignored) — do-dbs regex whitelist
    keeps firstdb only; ignore-tables + do-tables keeps exactly
    {firstdb.second, seconddb.fourth}; mysql.testtable excluded by the
    BWList's own whitelists in both runs (the BWList REPLACES the -f
    filter and its system-schema defaults, loader.go:119-124)."""
    import tomllib

    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    src = f"{REF}/black-white-list/data"

    def run(toml_name, sub):
        with open(f"{REF}/black-white-list/{toml_name}", "rb") as f:
            raw = tomllib.load(f)
        target = str(tmp_path / sub)
        cfg = Config.from_toml(
            None, source_dir=src, target_dir=target,
            checkpoint_enable=False, bw_list=raw["black-white-list"],
        )
        rep = Restorer(spark, cfg).run()
        assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
        return _tables_in(spark, target)

    assert run("firstdb-only.toml", "a") == {
        "firstdb.first", "firstdb.second"
    }
    assert run("even-table-only.toml", "b") == {
        "firstdb.second", "seconddb.fourth"
    }


def test_routes_golden(spark, tmp_path):
    """tests/routes: the [[routes]] shard-merge rule folds
    routes_a{0,1}.t* into routes_b.u (count 4, sum 259) while the
    unmatched routes_a1.s1 survives untouched (sum 1296) and no t2
    remains under routes_a1."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    rule = {
        "schema-pattern": "routes_a*", "table-pattern": "t*",
        "target-schema": "routes_b", "target-table": "u",
    }
    target = str(tmp_path / "wh")
    cfg = Config.from_toml(
        None, source_dir=f"{REF}/routes/data", target_dir=target,
        checkpoint_enable=False, routes=[rule],
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    u = spark.read.parquet(f"{target}/routes_b/u")
    assert u.count() == 4
    assert u.agg(F.sum("x")).first()[0] == 259
    s1 = spark.read.parquet(f"{target}/routes_a1/s1")
    assert (s1.count(), s1.agg(F.sum("x")).first()[0]) == (1, 1296)
    assert "routes_a1.t2" not in _tables_in(spark, target)


def test_rowid_and_permutation_golden(spark, tmp_path):
    """tests/tidb_rowid (hidden-handle allocation across five table
    shapes), tests/column_permutation (36-column reordered CSV with
    exact value spot-checks) and tests/auto_random_default."""
    wh = _restore(spark, tmp_path, f"{REF}/tidb_rowid/data")
    expect = {
        "explicit_tidb_rowid": (10, 1, 10),
        "non_pk": (10, 1, 10),
        "non_pk_auto_inc": (22, 1, 22),
        "pre_rebase": (1, 1, 1),
        "specific_auto_inc": (5, 1, 5),
    }
    for tbl, (n, lo, hi) in expect.items():
        df = spark.read.parquet(f"{wh}/rowid/{tbl}")
        got = df.agg(
            F.count(F.lit(1)), F.min("_tidb_rowid"), F.max("_tidb_rowid")
        ).first()
        assert tuple(got) == (n, lo, hi), tbl

    wh = _restore(spark, tmp_path / "b", f"{REF}/column_permutation/data")
    t = spark.read.parquet(f"{wh}/perm/test_perm")
    assert t.count() == 5
    r = t.filter(
        F.col("fund_seq_no")
        == "202006100001901102016403059520200627"
    ).first()
    assert r["region_code"] == "000002" and r["credit_code"] == "33"

    wh = _restore(spark, tmp_path / "c", f"{REF}/auto_random_default/data")
    t = spark.read.parquet(f"{wh}/auto_random/t")
    assert t.count() == 6
    # auto-random ids: all assigned, all distinct (our shard bits are a
    # deterministic rowid hash — a documented departure from TiDB's
    # session-random shard, so the exact inc values differ)
    assert t.filter(F.col("id").isNull()).count() == 0
    assert t.select("id").distinct().count() == 6


# ---------------------------------------------------------------------------
# golden batch 8 (r12)
# ---------------------------------------------------------------------------


def test_character_sets_golden(spark, tmp_path):
    """tests/character_sets: the reference's full charset matrix —
    auto DETECTS per file (utf-8 then gb18030, reader.go:43-55),
    explicit charsets decode STRICTLY (utf8mb4 over gb18030 bytes must
    FAIL, never import U+FFFD mojibake), binary is the byte-preserving
    passthrough (run.sh pins the mojibake column names it produces).
    Found in r12: auto was aliased to utf-8, schema decode used
    errors='replace'."""
    import os

    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    def run(dirname, charset, sub):
        tgt = str(tmp_path / sub)
        cfg = Config.from_toml(
            None, source_dir=f"{REF}/character_sets/{dirname}",
            target_dir=tgt, checkpoint_enable=False,
            character_set=charset,
        )
        rep = Restorer(spark, cfg).run()
        if not rep.ok:
            return None
        tbl = os.listdir(f"{tgt}/charsets")[0]
        df = spark.read.parquet(f"{tgt}/charsets/{tbl}")
        pk = df.columns[0]
        return pk, df.agg(F.sum(F.col(f"`{pk}`"))).first()[0]

    # gb18030 data: auto + explicit + binary succeed (sum 267; binary
    # under the latin-1 mojibake name run.sh pins), utf8mb4 FAILS
    assert run("gb18030", "auto", "a") == ("主键", 267)
    assert run("gb18030", "gb18030", "b") == ("主键", 267)
    assert run("gb18030", "utf8mb4", "c") is None
    assert run("gb18030", "binary", "d") == ("Ö÷¼ü", 267)
    # utf8mb4 data: every mode succeeds with sum 1119; gb18030 config
    # yields exactly the mojibake name run.sh expects
    assert run("utf8mb4", "auto", "e") == ("主键", 1119)
    assert run("utf8mb4", "gb18030", "f") == ("涓婚敭", 1119)
    assert run("utf8mb4", "utf8mb4", "g") == ("主键", 1119)
    assert run("utf8mb4", "binary", "h")[1] == 1119
    # mixed-charset data: only binary succeeds (sum 5291)
    assert run("mixed", "auto", "i") is None
    assert run("mixed", "gb18030", "j") is None
    assert run("mixed", "utf8mb4", "k") is None
    assert run("mixed", "binary", "m")[1] == 5291


def test_generated_columns_golden(spark, tmp_path):
    """tests/generated_columns: chained virtual/stored gencols
    (nested a->b->c->d->e) and the various_types battery — pow, 9/16,
    5e222 (the r12 tokenizer bug: scientific literals lexed as '5'),
    sha1(repeat(x, gencol)), unhex, json_object, from_unixtime under
    @@time_zone='-08:00', and AES_ENCRYPT under
    @@block_encryption_mode='aes-256-cbc' (the r12 translation bug:
    MySQL's 3rd arg is the IV, the key is XOR-folded, and Spark
    PREPENDS the IV to CBC output where MySQL returns ciphertext
    alone). run.sh pins every value checked here."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "-08:00")
    try:
        wh = _restore(
            spark, tmp_path, f"{REF}/generated_columns/data",
            block_encryption_mode="aes-256-cbc",
        )
        nested = spark.read.parquet(f"{wh}/gencol/nested")
        r = nested.filter(F.col("a") == 100).first()
        assert (r["b"], r["c"], r["d"], r["e"]) == (101, 102, 103, 104)

        vt = spark.read.parquet(f"{wh}/gencol/various_types").first()
        assert vt["int64"] == 3
        assert int(vt["uint64"]) == 5764801
        assert vt["float32"] == 0.5625
        assert vt["float64"] == 5e222
        assert vt["string"] == "6ad8402ba6610f04d3ec5c9875489a7bc8e259c5"
        assert bytes(vt["bytes"]).hex().upper() == (
            "6AD8402BA6610F04D3EC5C9875489A7BC8E259C5"
        )
        assert str(vt["decimal"]) == "1234.5678"
        assert vt["duration"] == "1:2:3"
        assert vt["enum"] == "c"
        assert vt["bit"] == 3
        assert vt["set"] == "c"
        # timestamp(3) '1987-06-05 04:03:02.100' at -08:00 — compare the
        # instant through the session zone
        assert vt["time"].strftime("%Y-%m-%d %H:%M:%S.%f").startswith(
            "1987-06-05 12:03:02.100"
        )  # collect() renders in the driver's UTC; instant parity
        import json as _json

        assert _json.loads(vt["json"]) == {
            "6ad8402ba6610f04d3ec5c9875489a7bc8e259c5": 0.5625
        }
        assert bytes(vt["aes"]).hex().upper() == (
            "A876B03CFC8AF93D22D19E2220BD2375"
        )
        assert vt["tz"] == "1969-12-31 16:00:01"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_csv_golden(spark, tmp_path):
    """tests/csv: the reference CSV dialect battery. threads (43 rows,
    \\N nulls), escapes (backslash + doubling mixed, raw 0xFF and bare
    CR/LF bytes inside a quoted BLOB field, literal \\n\\n\\n JSON
    text), empty_strings ('\"\"\"\"' -> '\"'; empty unquoted = '', not
    NULL). Every value here is a run.sh check_contains."""
    from tidb_lightning_spark.sources.csv_source import CSVConfig

    wh = _restore(
        spark, tmp_path, f"{REF}/csv/data",
        csv=CSVConfig(
            separator=",", delimiter='"', header=False, not_null=False,
            null=r"\N", backslash_escape=True, trim_last_sep=False,
        ),
    )
    th = spark.read.parquet(f"{wh}/csv/threads")
    got = th.agg(
        F.count(F.lit(1)), F.sum("PROCESSLIST_TIME"),
        F.sum("THREAD_OS_ID"), F.count("PROCESSLIST_STATE"),
    ).first()
    assert (got[0], got[1], int(got[2]), got[3]) == (
        43, 322253, 303775702, 3
    )
    assert th.filter("PROCESSLIST_TIME IS NOT NULL").count() == 12

    esc = {r["i"]: r for r in
           spark.read.parquet(f"{wh}/csv/escapes").collect()}
    assert esc[1]["t"] == "\\" and bytes(esc[1]["b"]).hex() == "ffffffff"
    assert esc[1]["j"] == '{"?": []}'
    assert esc[2]["t"] == '"' and bytes(esc[2]["b"]).hex() == "0d0a0d0a"
    assert esc[2]["j"] == '"\\n\\n\\n"'  # literal backslash-n JSON text
    assert esc[3]["t"] == "\n" and bytes(esc[3]["b"]).hex() == "5c2c5c2c"
    assert esc[3]["j"] == '[",,,"]'

    es = {r["id"]: r for r in
          spark.read.parquet(f"{wh}/csv/empty_strings").collect()}
    assert es[3]["a"] == '"'  # quote doubling: '""""' -> '"'
    assert all(r["b"] == "" for r in es.values())  # never NULL, all ''
    assert es[1]["a"] == "" and es[4]["a"] == ""


def test_view_golden(spark, tmp_path, capsys):
    """tests/view: view replay e2e — db1.v1 over db1.tbl and db0.v2
    over db1.v1 (cross-db view-on-view) register through the warehouse
    catalog (`cli sql`) and answer run.sh's aggregates."""
    from tidb_lightning_spark import cli

    wh = _restore(spark, tmp_path, f"{REF}/view/data")
    rc = cli.main([
        "sql", "--target", wh, "--format", "csv",
        "SELECT count(*) AS c, sum(i) AS s FROM `db1.v1`",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "3,6"
    rc = cli.main([
        "sql", "--target", wh, "--format", "csv",
        "SELECT s FROM `db0.v2`",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "test1"


def test_issue_410_golden(spark, tmp_path):
    """tests/issue_410: header CSV whose 26 column names are 40-char
    identifiers; the single data row restores each column to its
    single-letter value (run.sh checks A/Y/Z)."""
    from tidb_lightning_spark.sources.csv_source import CSVConfig

    wh = _restore(
        spark, tmp_path, f"{REF}/issue_410/data",
        csv=CSVConfig(header=True),
    )
    df = spark.read.parquet(f"{wh}/issue410/row_flow_d")
    assert df.count() == 1
    r = df.first()
    a = "A123456789012345678901234567890123456789"
    y = "Y12345678901234567890123456789012345678"
    assert r[a] == "A" and r[y] == "Y" and r["Z"] == "Z"


def test_row_format_v2_golden(spark, tmp_path):
    """tests/row-format-v2: 50 rows; DISTINCT col14 = {NULL, 39}
    (run.sh) — the row-format knob itself is a TiKV storage detail with
    no Spark analog, the data contract is what's portable."""
    wh = _restore(spark, tmp_path, f"{REF}/row-format-v2/data")
    df = spark.read.parquet(f"{wh}/rowformatv2/t1")
    assert df.count() == 50
    got = {r[0] for r in df.select("col14").distinct().collect()}
    assert got == {None, 39}


def test_common_handle_golden(spark, tmp_path):
    """tests/common_handle: non-integer composite PK (s, i) — the
    clustered-index path. Fixture generated inline exactly as run.sh
    does; expectations count(*)=6, sum(i)=21, and no hidden
    _tidb_rowid (the PK IS the handle, sql2kv.go:343-355 analog)."""
    src = tmp_path / "ch.mydump"
    src.mkdir()
    (src / "ch-schema-create.sql").write_text("CREATE DATABASE ch;\n")
    (src / "ch.t-schema.sql").write_text(
        "CREATE TABLE t(s varchar(32), i INT, j TINYINT, "
        "PRIMARY KEY(s, i));\n"
    )
    (src / "ch.t.0.sql").write_text(
        'INSERT INTO t (s, i, j) VALUES\n'
        '  ("this_is_test1", 1, 1),\n'
        '  ("this_is_test2", 2, 2),\n'
        '  ("this_is_test3", 3, 3),\n'
        '  ("this_is_test4", 4, 4),\n'
        '  ("this_is_test5", 5, 5);\n'
    )
    (src / "ch.t.1.sql").write_text(
        'INSERT INTO t(s, i, j) VALUES ("another test case", 6, 6);\n'
    )
    wh = _restore(spark, tmp_path, str(src))
    df = spark.read.parquet(f"{wh}/ch/t")
    got = df.agg(F.count(F.lit(1)), F.sum("i")).first()
    assert tuple(got) == (6, 21)
    # departure note: TiDB with clustered index makes (s, i) the handle
    # (no hidden rowid); our warehouse keeps the deterministic
    # _tidb_rowid for non-integer PKs (the non-clustered default) —
    # assert it is dense and collision-free, the property Total_kvs=6
    # actually guards
    assert "_tidb_rowid" in df.columns
    assert df.select("_tidb_rowid").distinct().count() == 6


def test_source_linkfile_golden(spark, tmp_path):
    """tests/source_linkfile: a source dir of SYMLINKS to the real
    files must restore identically (run.sh generates CSVs then links
    them; 1000 rows per table)."""
    import os

    from tidb_lightning_spark.sources.csv_source import CSVConfig

    raw = tmp_path / "raw"
    src = tmp_path / "linked"
    raw.mkdir()
    src.mkdir()
    n = 1000
    (raw / "linkfiles-schema-create.sql").write_text(
        "CREATE DATABASE linkfiles;\n"
    )
    (raw / "linkfiles.t-schema.sql").write_text(
        "CREATE TABLE t(s varchar(64), i INT, j TINYINT, "
        "PRIMARY KEY(s, i));\n"
    )
    (raw / "linkfiles.t2-schema.sql").write_text(
        "CREATE TABLE t2(i INT PRIMARY KEY, s varchar(32));\n"
    )
    with open(raw / "linkfiles.t.0.csv", "w") as f:
        f.write("s,i,j\n")
        for i in range(1, n + 1):
            f.write(f'"thisisastringvalues_line{i}",{i},{i}\n')
    with open(raw / "linkfiles.t2.0.csv", "w") as f:
        f.write("i,s\n")
        for i in range(1, n + 1):
            f.write(f'{i},"test123ataettaet{i}"\n')
    for name in os.listdir(raw):
        os.symlink(raw / name, src / name)
    wh = _restore(
        spark, tmp_path, str(src), csv=CSVConfig(header=True),
    )
    assert spark.read.parquet(f"{wh}/linkfiles/t").count() == n
    assert spark.read.parquet(f"{wh}/linkfiles/t2").count() == n


def test_tool_1472_golden(spark, tmp_path):
    """tests/tool_1472 (TOOL-1420): pre-calculated auto-increment
    allocators must rebase past the loaded max even when the column is
    a TINYINT (the original bug overflowed the tinyint range while
    computing the rebase). Golden data through the JDBC backend into
    embedded Derby; run.sh's post-import inserts pin the next identity
    values: pk (rows 3,4) -> next a = 5; notpk (b values 6,9) ->
    next b = 10."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    url = f"jdbc:derby:{tmp_path}/ee1472;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    cfg = Config.from_toml(
        None,
        source_dir=f"{REF}/tool_1472/data",
        target_dir=str(tmp_path / "state"),
        backend="jdbc",
        jdbc_url=url,
        jdbc_driver=driver,
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]

    jvm = spark._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    try:
        # run.sh: insert into EE1472.pk values (); -> count 3, max 5
        st.execute('INSERT INTO EE1472.pk ("a") VALUES (DEFAULT)')
        rs = st.executeQuery(
            'SELECT count("a"), max("a") FROM EE1472.pk'
        )
        rs.next()
        assert (rs.getInt(1), rs.getInt(2)) == (3, 5)
        rs.close()
        # run.sh: insert into EE1472.notpk (a) values (3333); -> b = 10
        st.execute('INSERT INTO EE1472.notpk ("a") VALUES (3333)')
        rs = st.executeQuery(
            'SELECT "b" FROM EE1472.notpk WHERE "a" = 3333'
        )
        rs.next()
        assert rs.getInt(1) == 10
        rs.close()
    finally:
        st.close()
        conn.close()


@pytest.mark.parametrize("driver", ["file", "sqlite"])
def test_checkpoint_chunks_golden(spark, tmp_path, driver):
    """tests/checkpoint_chunks: the reference's failpoint suite over its
    own generated fixture (5 single-row-INSERT dump files x 1000 rows).
    A run is killed after every imported engine (FailIfImportedChunk
    analog); each resume advances exactly one engine; the final table
    is bit-exact (count 5000, sum 17502500 — run.sh's formula) and a
    last run is a checkpoint no-op. Parametrized over BOTH checkpoint
    drivers (reference run.sh drives mysql + file)."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer
    from tidb_lightning_spark.sinks.files_sink import FilesSink

    chunk_count, row_count = 5, 1000
    d = tmp_path / "cpch.mydump"
    d.mkdir()
    (d / "cpch_tsr-schema-create.sql").write_text(
        "CREATE DATABASE cpch_tsr;\n"
    )
    (d / "cpch_tsr.tbl-schema.sql").write_text(
        "CREATE TABLE tbl(i BIGINT UNSIGNED PRIMARY KEY);\n"
    )
    for i in range(1, chunk_count + 1):
        with open(d / f"cpch_tsr.tbl.{i}.sql", "w") as f:
            for j in range(1, row_count + 1):
                f.write(f"INSERT INTO tbl VALUES({i * row_count + j});\n")
    size = max(
        os.path.getsize(d / f"cpch_tsr.tbl.{i}.sql")
        for i in range(1, chunk_count + 1)
    )

    def make_cfg():
        cfg = Config.from_toml(
            None, source_dir=str(d),
            target_dir=str(tmp_path / "wh"),
            checksum="required", engine_bytes=size + 10,
        )
        cfg.checkpoint_driver = driver
        return cfg

    orig = FilesSink.write_engine

    def kill_after_one(self, df, db, table, engine, **kw):
        if kill_after_one.calls == 1:
            raise RuntimeError("failpoint: FailIfImportedChunk")
        kill_after_one.calls += 1
        return orig(self, df, db, table, engine, **kw)

    # each killed run advances exactly one engine; the 5th run writes
    # the last engine and completes (no further chunk to trip on)
    for step in range(1, chunk_count + 1):
        kill_after_one.calls = 0
        FilesSink.write_engine = kill_after_one
        try:
            rep = Restorer(spark, make_cfg()).run()
        finally:
            FilesSink.write_engine = orig
        if step < chunk_count:
            assert not rep.ok, f"step {step} unexpectedly completed"
            assert "failpoint" in rep.tables[0].error
        else:
            assert rep.ok, rep.tables[0].error

    t = spark.read.parquet(str(tmp_path / "wh/cpch_tsr/tbl"))
    got = t.agg(F.count("i"), F.sum("i")).first()
    want_sum = row_count * chunk_count * (
        (chunk_count + 2) * row_count + 1
    ) // 2
    assert (got[0], int(got[1])) == (chunk_count * row_count, want_sum)

    # verify_checkpoint_noop: a final run makes no new engine writes
    calls = {"n": 0}

    def counting(self, df, db, table, engine, **kw):
        calls["n"] += 1
        return orig(self, df, db, table, engine, **kw)

    FilesSink.write_engine = counting
    try:
        rep = Restorer(spark, make_cfg()).run()
    finally:
        FilesSink.write_engine = orig
    assert rep.ok and rep.tables[0].status == "skipped"
    assert calls["n"] == 0


def test_tidb_duplicate_data_golden(spark, tmp_path):
    """tests/tidb_duplicate_data: a run into a live target is killed
    after SOME rows land (FailIfImportedSomeRows), the source mutates
    old->new, and the resume's duplicate policy decides the outcome.
    replace matches run.sh exactly (both rows 'new'). DOCUMENTED
    DEPARTURE: the reference's tidb backend appends with per-row
    ON DUPLICATE semantics, so its 'ignore' keeps the partially
    imported 'old' row; our JDBC backend re-imports a changed source
    through a STAGING SWAP (idempotent bulk-load semantics,
    test_jdbc_reimport_replaces_without_duplicates), so the final
    table always holds exactly the new source's rows — asserted here
    so the departure is pinned, not silent."""
    import shutil as _sh

    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer
    from tidb_lightning_spark.sinks.jdbc_sink import JDBCSink

    src = tmp_path / "dup.mydump"
    src.mkdir()
    for f in os.listdir(f"{REF}/tidb_duplicate_data/data"):
        _sh.copy(f"{REF}/tidb_duplicate_data/data/{f}", src / f)
    url = f"jdbc:derby:{tmp_path}/dupdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    def make_cfg(policy):
        return Config.from_toml(
            None, source_dir=str(src),
            target_dir=str(tmp_path / "state"),
            backend="jdbc", jdbc_url=url, jdbc_driver=driver,
            on_duplicate=policy,
        )

    # phase 1: kill after the first write lands some rows
    orig = JDBCSink.write_table

    def fail_after_rows(self, df, info, dbtable, **kw):
        orig(self, df.limit(1), info, dbtable, **kw)
        raise RuntimeError("failpoint: FailIfImportedSomeRows")

    JDBCSink.write_table = fail_after_rows
    try:
        rep = Restorer(spark, make_cfg("replace")).run()
    finally:
        JDBCSink.write_table = orig
    assert not rep.ok

    # source mutates old -> new (run.sh's sed)
    p = src / "dup.dup.sql"
    p.write_text(p.read_text().replace("old", "new"))

    rep = Restorer(spark, make_cfg("replace")).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    props = {"driver": driver}
    back = spark.read.jdbc(url, "dup.dup", properties=props)
    rows = {r["pk"]: r["d"] for r in back.collect()}
    assert rows == {1: "new", 2: "new"}  # run.sh replace expectations


def test_partitioned_table_golden(spark, tmp_path):
    """tests/partitioned-table: PARTITION BY HASH(a) PARTITIONS 5 —
    count 8, sum(a) 277151781 (run.sh), written as a partitioned
    layout (the SHOW TABLE STATUS 'partitioned' analog is the
    partition-directory structure)."""
    wh = _restore(spark, tmp_path, f"{REF}/partitioned-table/data")
    df = spark.read.parquet(f"{wh}/partitioned/a")
    got = df.agg(F.count(F.lit(1)), F.sum("a")).first()
    assert tuple(got) == (8, 277151781)
    # HASH partitioning is physical-only here (design: the range sink
    # already spreads rows; only RANGE/LIST COLUMNS map to directory
    # layouts) — the 'Create_options: partitioned' analog is the clause
    # recorded in the table meta
    import json as _json

    meta = _json.load(open(f"{wh}/partitioned/a/_tls_meta.json"))
    assert "hash" in meta["partition_by"].lower()


def test_alter_random_golden(spark, tmp_path):
    """tests/alter_random: explicit AUTO_RANDOM ids with shard bits set
    (5764607523034234881 = shard 0b00001 over inc 1) restore VERBATIM;
    the increment parts under the 58-bit mask are exactly {1, 2, 3}
    (run.sh's `id & b'000011...1'` checks). The post-import
    INSERT-gets-inc-4 step needs a live TiDB allocator; the allocator
    rebase analog is covered by tool_1472/Derby."""
    wh = _restore(spark, tmp_path, f"{REF}/alter_random/data")
    df = spark.read.parquet(f"{wh}/alter_random/t")
    ids = sorted(r["id"] for r in df.collect())
    assert ids == [
        5764607523034234881, 7493989779944505347, 8646911284551352322
    ]
    mask = (1 << 58) - 1
    assert sorted(i & mask for i in ids) == [1, 2, 3]


def test_cmdline_override_golden(spark, tmp_path, capsys):
    """tests/cmdline_override: a config whose every connection knob is
    garbage ('xyzxyzxyz') must still import when the CLI overrides the
    source dir — CLI args take precedence over the TOML (run.sh drives
    the same import with -d; a: 15)."""
    from tidb_lightning_spark import cli

    rc = cli.main([
        "run",
        "--config", f"{REF}/cmdline_override/config.toml",
        "--source", f"{REF}/cmdline_override/data",
        "--target", str(tmp_path / "wh"),
        "--no-checkpoint",
    ])
    assert rc == 0
    df = spark.read.parquet(str(tmp_path / "wh/cmdline_override/t"))
    assert [r["a"] for r in df.collect()] == [15]


def test_file_routing_golden(spark, tmp_path, capsys):
    """tests/file_routing: custom [[mydumper.files]] rules over a
    run.sh-generated layout — per-dir schema.sql / tbl-table.sql /
    tbl-view.sql names, numbered '.sql.0' extensions, an exact-path
    rule for an uppercase ff/test.SQL, and an UNMATCHED tbl-noused.sql
    that must be ignored. run.sh: tbl count 10, sum(j) 55; view v =
    i <= 5 rows (sum 15, count 5)."""
    import shutil as _sh

    from tidb_lightning_spark import cli
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    d = tmp_path / "fr.mydump"
    (d / "fr").mkdir(parents=True)
    (d / "ff").mkdir()
    (d / "fr" / "schema.sql").write_text("CREATE DATABASE fr;\n")
    (d / "fr" / "tbl-table.sql").write_text(
        "CREATE TABLE tbl(i TINYINT PRIMARY KEY, j INT);\n"
    )
    (d / "fr" / "tbl1.sql.0").write_text(
        "INSERT INTO tbl (i, j) VALUES (1, 1),(2, 2);\n"
    )
    (d / "fr" / "tbl2.sql.0").write_text(
        "INSERT INTO tbl (i, j) VALUES (3, 3),(4, 4);\n"
    )
    (d / "fr" / "tbl.sql").write_text(
        "INSERT INTO tbl (i, j) VALUES (5, 5);\n"
    )
    (d / "tbl1.sql.1").write_text(
        "INSERT INTO tbl (i, j) VALUES (6, 6), (7, 7), (8, 8), (9, 9);\n"
    )
    (d / "ff" / "test.SQL").write_text(
        "INSERT INTO tbl (i, j) VALUES (10, 10);\n"
    )
    (d / "fr" / "tbl-noused.sql").write_text(
        "INSERT INTO tbl (i, j) VALUES (11, 11);\n"
    )
    (d / "fr" / "v-table.sql").write_text("CREATE TABLE v(i TINYINT);\n")
    (d / "fr" / "v-view.sql").write_text(
        "/*!40101 SET NAMES binary*/;\n"
        "DROP TABLE IF EXISTS `v`;\nDROP VIEW IF EXISTS `v`;\n"
        "CREATE ALGORITHM=UNDEFINED DEFINER=`root`@`1.2.3.4` "
        "SQL SECURITY DEFINER VIEW `v` (`i`) AS "
        "SELECT `i` FROM `fr`.`tbl` WHERE i <= 5;\n"
    )
    import tomllib

    with open(f"{REF}/file_routing/config.toml", "rb") as f:
        raw = tomllib.load(f)
    cfg = Config.from_toml(
        None, source_dir=str(d), target_dir=str(tmp_path / "wh"),
        checkpoint_enable=False,
        file_routes=raw["mydumper"]["files"], default_file_rules=False,
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    wh = str(tmp_path / "wh")
    tbl = spark.read.parquet(f"{wh}/fr/tbl")
    got = tbl.agg(F.count(F.lit(1)), F.sum("j")).first()
    assert tuple(got) == (10, 55)
    assert tbl.filter(F.col("i") == 11).count() == 0  # noused ignored
    rc = cli.main([
        "sql", "--target", wh, "--format", "csv",
        "SELECT sum(i) AS s, count(*) AS c FROM `fr.v`",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "15,5"


def test_error_summary_golden(spark, tmp_path):
    """tests/error_summary: a target PREPOPULATED with rows conflicting
    with tables a and c (on-duplicate=error) — the run must fail, table
    b must still be imported (sum id 28, k 32), and the error summary
    must name exactly the two failed tables. The second run with the
    dirty checkpoint must refuse those tables until
    --checkpoint-error-destroy (reference run.sh's log greps, asserted
    on RunReport instead of log text)."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    url = f"jdbc:derby:{tmp_path}/esdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE SCHEMA error_summary")
    for t, rows in (("a", "(2, 4), (6, 8)"), ("c", "(3, 9), (27, 81)")):
        st.execute(
            f'CREATE TABLE error_summary.{t} '
            f'("id" INT NOT NULL PRIMARY KEY, "k" INT NOT NULL)'
        )
        st.execute(f'INSERT INTO error_summary.{t} VALUES {rows}')
    st.close()
    conn.close()

    def make_cfg():
        return Config.from_toml(
            None, source_dir=f"{REF}/error_summary/data",
            target_dir=str(tmp_path / "state"),
            backend="jdbc", jdbc_url=url, jdbc_driver=driver,
            on_duplicate="error",
        )

    rep = Restorer(spark, make_cfg()).run()
    assert not rep.ok
    failed = {t.table for t in rep.tables if t.error}
    ok = {t.table for t in rep.tables if not t.error}
    assert failed == {"a", "c"}
    assert "b" in ok
    back = spark.read.jdbc(
        url, "error_summary.b", properties={"driver": driver}
    )
    got = back.agg(F.sum("id"), F.sum("k")).first()
    assert (got[0], got[1]) == (28, 32)


def test_checkpoint_error_destroy_golden(spark, tmp_path, capsys):
    """tests/checkpoint_error_destroy: a failing import (zero-date into
    TIMESTAMP NOT NULL under strict mode) leaves an error checkpoint;
    ctl --checkpoint-error-destroy=all clears it; importing the good
    data then succeeds with run.sh's exact row
    (x: 1999-09-09 09:09:09)."""
    import shutil as _sh

    from tidb_lightning_spark import cli
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    target = str(tmp_path / "wh")
    # run.sh swaps bad/good CONTENT at one fixed source path — keeping
    # the path stable also keeps the task checkpoint's config
    # fingerprint valid across the fail->destroy->retry cycle
    # (verifyCheckpoint would rightly refuse a CHANGED source dir)
    src = str(tmp_path / "src")

    def run(data):
        if os.path.isdir(src):
            _sh.rmtree(src)
        _sh.copytree(f"{REF}/checkpoint_error_destroy/{data}", src)
        cfg = Config.from_toml(
            None, source_dir=src, target_dir=target, strict_sql_mode=True,
        )
        return Restorer(spark, cfg).run()

    for _ in range(2):  # run.sh loops the fail+destroy cycle
        rep = run("bad-data")
        assert not rep.ok
        rc = cli.main([
            "ctl", "--target", target, "--checkpoint-error-destroy", "all",
        ])
        assert rc == 0
        capsys.readouterr()

    rep = run("good-data")
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    df = spark.read.parquet(f"{target}/cped/t")
    rows = df.collect()
    assert len(rows) == 1
    assert str(rows[0]["x"]).startswith("1999-09-09 09:09:09")


def test_examples_golden(spark, tmp_path):
    """tests/examples: the reference's shipped mydumper example dumps
    (lightning/mydump/examples — the reader_test corpus), with run.sh's
    in-place rename of table `i` to Turkish dotless `ı` (a ToUpper
    length-change trap: upper('ı')='I' and upper('ſ')='S' SHRINK byte
    length — code indexing into upper-cased names corrupts). run.sh:
    tbl_autoid 10000 distinct IDs, tbl_multi_index 10000 distinct
    Names, `ı` = one row with ſ = 🤪, report_case_high_risk = 1 row."""
    import shutil as _sh

    ex = "/root/reference/lightning/mydump/examples"
    d = tmp_path / "dump"
    d.mkdir()
    for f in os.listdir(ex):
        if f == "metadata":
            continue
        # run.sh's do_rename: the i table becomes ı
        dst = f.replace("mocker_test.i-schema", "mocker_test.ı-schema")
        if f == "mocker_test.i.sql":
            dst = "mocker_test.ı.sql"
        _sh.copy(os.path.join(ex, f), d / dst)
    wh = _restore(spark, tmp_path, str(d))
    auto = spark.read.parquet(f"{wh}/mocker_test/tbl_autoid")
    assert auto.select(F.countDistinct("ID")).first()[0] == 10000
    multi = spark.read.parquet(f"{wh}/mocker_test/tbl_multi_index")
    assert multi.select(F.countDistinct("Name")).first()[0] == 10000
    dotless = spark.read.parquet(f"{wh}/mocker_test/ı")
    rows = dotless.collect()
    assert len(rows) == 1 and rows[0]["ſ"] == "🤪"
    risk = spark.read.parquet(f"{wh}/mocker_test/report_case_high_risk")
    assert risk.count() == 1


@pytest.mark.parametrize("driver", ["file", "sqlite"])
def test_checkpoint_timestamp_golden(spark, tmp_path, driver):
    """tests/checkpoint_timestamp: CURRENT_TIMESTAMP defaults filled
    across KILLED-AND-RESUMED runs must all carry ONE timestamp — the
    reference persists the task timestamp in its checkpoint
    (TaskCheckpoint; run.sh pins COUNT(ts)=98, COUNT(DISTINCT ts)=1
    after five kill/resume steps). Found in r12: pinned_ts was stamped
    fresh per Restorer, so engines imported after a resume differed
    from those before the kill."""
    import time as _time

    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer
    from tidb_lightning_spark.sinks.files_sink import FilesSink

    d = tmp_path / "cpts.mydump"
    d.mkdir()
    (d / "cpts-schema-create.sql").write_text("create database cpts;\n")
    (d / "cpts.cpts-schema.sql").write_text(
        "create table cpts (ts datetime(6) not null default "
        "current_timestamp(6), key(ts));\n"
    )
    row14 = "insert into cpts values " + ", ".join(["()"] * 14) + ";\n"
    (d / "cpts.cpts.1.sql").write_text(row14 * 4)  # 56 rows
    (d / "cpts.cpts.2.sql").write_text(row14 * 3)  # 42 rows -> 98 total
    size = max(
        os.path.getsize(d / f"cpts.cpts.{i}.sql") for i in (1, 2)
    )

    def make_cfg():
        cfg = Config.from_toml(
            None, source_dir=str(d), target_dir=str(tmp_path / "wh"),
            engine_bytes=size + 10,
        )
        cfg.checkpoint_driver = driver
        return cfg

    orig = FilesSink.write_engine

    def kill_after_one(self, df, db, table, engine, **kw):
        if kill_after_one.calls == 1:
            raise RuntimeError("failpoint: FailIfImportedChunk")
        kill_after_one.calls += 1
        return orig(self, df, db, table, engine, **kw)

    kill_after_one.calls = 0
    FilesSink.write_engine = kill_after_one
    try:
        rep = Restorer(spark, make_cfg()).run()
    finally:
        FilesSink.write_engine = orig
    assert not rep.ok
    _time.sleep(1.2)  # a fresh strftime would now differ
    rep = Restorer(spark, make_cfg()).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]

    df = spark.read.parquet(str(tmp_path / "wh/cpts/cpts"))
    got = df.agg(
        F.count("ts").alias("a"), F.countDistinct("ts").alias("b")
    ).first()
    assert (got["a"], got["b"]) == (98, 1)
    old_ts = {r[0] for r in df.select("ts").distinct().collect()}

    # a COMPLETED task retires its meta: when file 2 later changes, the
    # re-import stamps a FRESH timestamp for the re-written engine while
    # the unchanged engine keeps its rows (engine-level resume) — the
    # table now holds exactly {old ts, fresh ts}, proving the retired
    # task meta was not inherited
    _time.sleep(1.2)
    (d / "cpts.cpts.2.sql").write_text(row14 * 4)  # signature changes
    rep = Restorer(spark, make_cfg()).run()
    assert rep.ok
    df2 = spark.read.parquet(str(tmp_path / "wh/cpts/cpts"))
    new_ts = {r[0] for r in df2.select("ts").distinct().collect()}
    assert len(new_ts) == 2 and old_ts < new_ts


def test_concurrent_restore_golden(spark, tmp_path):
    """tests/concurrent-restore: 8 one-row tables imported with
    table-concurrency > 1 — every table lands exactly once (the
    reference stresses parallel table restore; our thread-local cache
    registries are what this pins)."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer

    d = tmp_path / "restore_conc.mydump"
    d.mkdir()
    (d / "restore_conc-schema-create.sql").write_text(
        "CREATE DATABASE restore_conc;\n"
    )
    n = 8
    for i in range(1, n + 1):
        (d / f"restore_conc.tbl{i}-schema.sql").write_text(
            f"CREATE TABLE tbl{i}(i TINYINT);\n"
        )
        (d / f"restore_conc.tbl{i}.sql").write_text(
            f"INSERT INTO tbl{i} VALUES (1);\n"
        )
    cfg = Config.from_toml(
        None, source_dir=str(d), target_dir=str(tmp_path / "wh"),
        checkpoint_enable=False, table_concurrency=4,
    )
    rep = Restorer(spark, cfg).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    assert len(rep.tables) == n
    for i in range(1, n + 1):
        df = spark.read.parquet(str(tmp_path / f"wh/restore_conc/tbl{i}"))
        assert [r["i"] for r in df.collect()] == [1]


def test_checkpoint_columns_golden(spark, tmp_path):
    """tests/checkpoint_columns: a PERMUTED column list (INSERT INTO
    tbl (j, i) ...) killed mid-write resumes to the exact final state
    with no duplicates — run.sh ends at count 2 with (i,j) = (1,3),
    (2,4). Our staged JDBC commit discards the partial write, so the
    intermediate count differs (0, not 1) but the exactly-once final
    state is the same."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer
    from tidb_lightning_spark.sinks.jdbc_sink import JDBCSink

    d = tmp_path / "cp.mydump"
    d.mkdir()
    (d / "cp_tsr-schema-create.sql").write_text("CREATE DATABASE cp_tsr;\n")
    (d / "cp_tsr.tbl-schema.sql").write_text(
        "CREATE TABLE tbl(i TINYINT PRIMARY KEY, j INT);\n"
    )
    (d / "cp_tsr.tbl.sql").write_text(
        "INSERT INTO tbl (j, i) VALUES (3, 1),(4, 2);\n"
    )
    url = f"jdbc:derby:{tmp_path}/cpcol;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    def make_cfg():
        return Config.from_toml(
            None, source_dir=str(d), target_dir=str(tmp_path / "state"),
            backend="jdbc", jdbc_url=url, jdbc_driver=driver,
        )

    orig = JDBCSink.write_table

    def fail_mid_write(self, df, dbname, name, **kw):
        orig(self, df.limit(1), dbname, name, **kw)
        raise RuntimeError("failpoint: FailAfterWriteRows")

    JDBCSink.write_table = fail_mid_write
    try:
        rep = Restorer(spark, make_cfg()).run()
    finally:
        JDBCSink.write_table = orig
    assert not rep.ok

    rep = Restorer(spark, make_cfg()).run()
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    back = spark.read.jdbc(
        url, "cp_tsr.tbl", properties={"driver": driver}
    )
    rows = sorted((r["i"], r["j"]) for r in back.collect())
    assert rows == [(1, 3), (2, 4)]


def test_local_backend_golden(spark, tmp_path):
    """tests/local_backend: multi-file engines with a TRANSIENT write
    failure on the first attempt (the reference injects
    FailIngestMeta=1*return('notleader') and expects the retry wrapper
    to absorb it) — final counts a: (4, sum 10), b: (4, sum 46)."""
    from tidb_lightning_spark.config import Config
    from tidb_lightning_spark.pipeline import Restorer
    from tidb_lightning_spark.sinks.files_sink import FilesSink

    orig = FilesSink.write_engine
    state = {"failed": False}

    def fail_once(self, df, db, table, engine, **kw):
        if not state["failed"]:
            state["failed"] = True
            raise RuntimeError("failpoint: notleader (transient)")
        return orig(self, df, db, table, engine, **kw)

    FilesSink.write_engine = fail_once
    try:
        cfg = Config.from_toml(
            None, source_dir=f"{REF}/local_backend/data",
            target_dir=str(tmp_path / "wh"),
        )
        rep = Restorer(spark, cfg).run()
        if not rep.ok:
            # a hard failure on first write is allowed to fail the RUN
            # (no in-write retry on the files sink); the RESUME must
            # then finish exactly once — the reference's second scenario
            # (checkpoint-driven recovery after a failed ingest)
            rep = Restorer(spark, cfg).run()
    finally:
        FilesSink.write_engine = orig
    assert rep.ok, [(t.table, t.error) for t in rep.tables if t.error]
    a = spark.read.parquet(str(tmp_path / "wh/cpeng/a"))
    assert tuple(a.agg(F.count(F.lit(1)), F.sum("c")).first()) == (4, 10)
    b = spark.read.parquet(str(tmp_path / "wh/cpeng/b"))
    assert tuple(b.agg(F.count(F.lit(1)), F.sum("c")).first()) == (4, 46)
