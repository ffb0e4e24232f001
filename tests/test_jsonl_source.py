"""JSONL data files (beyond-reference: the LLM-corpus dump format).

Rows flow through the SAME MySQL-cast chain as CSV — JSON's native
number parsing must not diverge from the dialect semantics — and a
missing key reads as SQL NULL (indistinguishable from explicit null
under a schema'd reader). Covers: DDL-schema'd restore,
gz compression, no-schema inference from the first object's keys."""

from __future__ import annotations

import gzip
import json
import os

from tidb_lightning_spark.config import Config
from tidb_lightning_spark.pipeline import Restorer
from tidb_lightning_spark.sources.parquet_source import read_table


def write(path, content: bytes | str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(content, bytes) else "w"
    with open(path, mode) as f:
        f.write(content)


def _restore(spark, d, target, **kw):
    cfg = Config.from_toml(
        None, source_dir=d, target_dir=target,
        checkpoint_enable=False, **kw,
    )
    report = Restorer(spark, cfg).run()
    assert report.ok, report.tables
    return report


def test_jsonl_restore_with_ddl(spark, tmp_path):
    d = str(tmp_path / "dump")
    write(f"{d}/demo-schema-create.sql", "CREATE DATABASE demo;")
    write(
        f"{d}/demo.docs-schema.sql",
        "CREATE TABLE docs (id INT PRIMARY KEY, score DECIMAL(6,2),"
        " body TEXT, tag VARCHAR(10) DEFAULT 'none');",
    )
    rows = [
        {"id": 1, "score": 3.5, "body": "hello world", "tag": "a"},
        {"id": 2, "score": 400.25, "body": "unicode ok é"},  # tag absent
        # NOTE: a missing key reads as SQL NULL (a schema'd JSON reader
        # cannot distinguish absent from explicit null) — nullable
        # columns keep NULL rather than taking their DEFAULT
        {"id": 3, "score": None, "body": None, "tag": "c"},
    ]
    write(
        f"{d}/demo.docs.jsonl",
        "".join(json.dumps(r) + "\n" for r in rows),
    )
    target = str(tmp_path / "wh")
    _restore(spark, d, target)
    got = {
        r["id"]: (str(r["score"]), r["body"], r["tag"])
        for r in read_table(spark, f"{target}/demo/docs").collect()
    }
    assert got[1] == ("3.50", "hello world", "a")
    assert got[2] == ("400.25", "unicode ok é", None)
    assert got[3] == ("None", None, "c")


def test_jsonl_gz_and_multiple_files(spark, tmp_path):
    d = str(tmp_path / "dump")
    write(f"{d}/demo-schema-create.sql", "CREATE DATABASE demo;")
    write(
        f"{d}/demo.t-schema.sql",
        "CREATE TABLE t (id INT PRIMARY KEY, v INT);",
    )
    write(
        f"{d}/demo.t.000.jsonl",
        "".join(json.dumps({"id": i, "v": i * 10}) + "\n" for i in range(5)),
    )
    write(
        f"{d}/demo.t.001.jsonl.gz",
        gzip.compress(
            "".join(
                json.dumps({"id": i, "v": i * 10}) + "\n" for i in range(5, 9)
            ).encode()
        ),
    )
    target = str(tmp_path / "wh")
    rep = _restore(spark, d, target)
    out = read_table(spark, f"{target}/demo/t")
    assert out.count() == 9
    assert sorted(
        (r["id"], r["v"]) for r in out.collect()
    ) == [(i, i * 10) for i in range(9)]
    assert rep.tables[0].rows == 9


def test_jsonl_no_schema_infers_from_first_object(spark, tmp_path):
    d = str(tmp_path / "dump")
    write(
        f"{d}/raw.corpus.jsonl",
        "".join(
            json.dumps({"doc_id": str(i), "text": f"doc {i}"}) + "\n"
            for i in range(4)
        ),
    )
    target = str(tmp_path / "wh")
    _restore(spark, d, target, no_schema=True)
    out = read_table(spark, f"{target}/raw/corpus")
    # no int PK -> the _tidb_rowid handle rides along (hidden-handle rule)
    assert {"doc_id", "text"}.issubset(set(out.columns))
    assert out.count() == 4


def test_jsonl_cast_clamps_like_csv(spark, tmp_path):
    """The MySQL-semantics cast chain applies to JSON-native numbers:
    TINYINT clamps at 127 instead of wrapping or erroring."""
    d = str(tmp_path / "dump")
    write(f"{d}/demo-schema-create.sql", "CREATE DATABASE demo;")
    write(
        f"{d}/demo.t-schema.sql",
        "CREATE TABLE t (id INT PRIMARY KEY, small TINYINT);",
    )
    write(
        f"{d}/demo.t.jsonl",
        json.dumps({"id": 1, "small": 9999}) + "\n"
        + json.dumps({"id": 2, "small": -9999}) + "\n",
    )
    target = str(tmp_path / "wh")
    _restore(spark, d, target)
    got = {
        r["id"]: r["small"]
        for r in read_table(spark, f"{target}/demo/t").collect()
    }
    assert got == {1: 127, 2: -128}


def test_jsonl_continuous_restore_incremental(spark, tmp_path):
    """`cli stream` drains newly-arrived JSONL files incrementally: the
    second drain ingests only the file that appeared after the first."""
    from tidb_lightning_spark import cli

    d = str(tmp_path / "dump")
    write(f"{d}/demo-schema-create.sql", "CREATE DATABASE demo;")
    write(
        f"{d}/demo.ev-schema.sql",
        "CREATE TABLE ev (id INT PRIMARY KEY, v INT);",
    )
    write(
        f"{d}/demo.ev.000.jsonl",
        "".join(json.dumps({"id": i, "v": i}) + "\n" for i in range(3)),
    )
    target = str(tmp_path / "wh")
    assert cli.main(["stream", "--source", d, "--target", target]) == 0
    t = read_table(spark, f"{target}/demo/ev")
    assert t.count() == 3
    # a new file arrives; re-drain picks up ONLY the delta
    write(
        f"{d}/demo.ev.001.jsonl",
        "".join(json.dumps({"id": i, "v": i}) + "\n" for i in range(3, 8)),
    )
    assert cli.main(["stream", "--source", d, "--target", target]) == 0
    t = read_table(spark, f"{target}/demo/ev")
    assert t.count() == 8
    assert sorted(r["id"] for r in t.collect()) == list(range(8))


def test_cli_report_dataset_card(spark, tmp_path, capsys):
    """`cli report` publishes the dataset card for an ingested document
    table: totals, quality/dup rates, language mix, length quantiles,
    per-source stats — and persists it next to the data."""
    from tidb_lightning_spark import cli

    d = str(tmp_path / "dump")
    rows = [
        {"doc_id": i, "text": f"the quick brown fox {i} runs far", "source": f"s{i % 2}"}
        for i in range(20)
    ]
    rows.append({"doc_id": 20, "text": rows[0]["text"], "source": "s0"})
    write(
        f"{d}/corpus.docs.jsonl",
        "".join(json.dumps(r) + "\n" for r in rows),
    )
    target = str(tmp_path / "wh")
    assert cli.main(["run", "--source", d, "--target", target,
                     "--no-schema"]) == 0
    capsys.readouterr()
    assert cli.main(["report", "--target", target,
                     "--table", "corpus.docs"]) == 0
    out = capsys.readouterr().out
    card = json.loads(out[out.index("{"):])
    assert card["n_docs"] == 21
    assert card["exact_dup_rate"] > 0  # the one repeated text
    assert card["languages"].get("en", 0) > 0
    assert set(card["per_source"]) == {"s0", "s1"}
    assert card["median_chars"] is not None
    vp = card["vocab_profile"]
    assert vp["n_types"] > 0
    assert 0 < vp["top10_share"] <= vp["top100_share"] <= 1
    assert 0 <= vp["hapax_frac"] <= 1
    saved = json.load(
        open(f"{target}/corpus/docs/_tls_datacard.json")
    )
    assert saved == card


def test_ctl_stats_prints_meta(spark, tmp_path, capsys):
    from tidb_lightning_spark import cli

    d = str(tmp_path / "dump")
    write(f"{d}/demo-schema-create.sql", "CREATE DATABASE demo;")
    write(
        f"{d}/demo.t-schema.sql",
        "CREATE TABLE t (id INT PRIMARY KEY, v INT);",
    )
    write(f"{d}/demo.t.jsonl", json.dumps({"id": 1, "v": 2}) + "\n")
    target = str(tmp_path / "wh")
    assert cli.main(["run", "--source", d, "--target", target]) == 0
    capsys.readouterr()
    assert cli.main(["ctl", "--target", target, "--stats", "demo.t"]) == 0
    out = capsys.readouterr().out
    meta = json.loads(out[out.index("{"):])
    assert meta["rows"] == 1 and meta["primary_key"] == ["id"]
    # missing table -> explicit error, not a stack trace
    assert cli.main(["ctl", "--target", target, "--stats", "no.such"]) == 1
