"""Task configuration (reference: lightning/config/config.go — TOML surface
+ Adjust() validation, config.go:499-786).

Same-named TOML keys where the concept survives the Spark re-expression;
Spark-obsolete knobs (engine batching, disk quota, io pools) are accepted
but ignored so existing reference configs parse.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from typing import Any

from tidb_lightning_spark.sources.csv_source import CSVConfig


@dataclass
class Config:
    source_dir: str = ""
    target_dir: str = ""  # warehouse root for the files backend
    backend: str = "local"  # local (files) | jdbc
    output_format: str = "parquet"  # parquet | orc (files backend)
    no_schema: bool = False
    case_sensitive: bool = False
    filter: list[str] | None = None
    # [black-white-list] legacy filter rules (reference BWList); applied
    # IN ADDITION to `filter` when present
    bw_list: dict | None = None
    file_routes: list[dict] = field(default_factory=list)
    default_file_rules: bool = True
    routes: list[dict] = field(default_factory=list)
    csv: CSVConfig = field(default_factory=CSVConfig)
    character_set: str = "utf-8"
    strict_sql_mode: bool = False
    checkpoint_enable: bool = True
    # file (JSON, single-process) | sqlite (transactional, safe under
    # concurrent server-mode/ctl access) — reference checkpoint.driver
    # file/mysql analog
    checkpoint_driver: str = "file"
    checksum: str = "required"  # off | optional | required
    analyze: str = "optional"
    # MySQL @@block_encryption_mode analog for AES_ENCRYPT/AES_DECRYPT in
    # generated columns (the reference reads the live target's global at
    # restore start; the files backend has no target, so it's a config)
    block_encryption_mode: str = "aes-128-ecb"
    jdbc_url: str = ""
    jdbc_driver: str = ""  # JDBC driver class (e.g. Derby embedded)
    jdbc_table_prefix: str = ""
    on_duplicate: str = "replace"  # replace | ignore | error (jdbc backend)
    # files-backend PK-conflict resolution (reference duplicate-resolution
    # knob): none = write as-is (fastest), else resolve via on_duplicate
    # semantics before the sort-write
    duplicate_resolution: str = "none"  # none | replace | ignore | error
    # commit-unit size for chunk-level resume (reference batch-size,
    # config.go:700-709, default 100 GiB): a table whose source exceeds
    # this is imported as multiple independently-committed engines so a
    # failed run resumes from the last finished engine, not from zero
    engine_bytes: int = 100 * 1024**3
    # driver-side parallel table restores (reference
    # lightning.table-concurrency, config.go:352-408 — default 6 there).
    # Spark already parallelizes WITHIN a table across all cores, so the
    # default here is 1; raise it for many-small-tables workloads where a
    # single table can't fill the cluster
    table_concurrency: int = 1
    raw: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_toml(cls, path: str | None, **overrides) -> "Config":
        raw: dict[str, Any] = {}
        if path:
            with open(path, "rb") as f:
                raw = tomllib.load(f)
            unknown = _unknown_keys(raw)
            if unknown:
                # reference parity: lightning refuses to start when a
                # TOML key is not consumed (config.go:448-476
                # metaData.Undecoded(); tests/unused_config_keys) — a
                # typo'd knob must fail loudly, never silently default
                raise ValueError(
                    "config file contained unknown configuration "
                    "options: " + ", ".join(unknown)
                )
        cfg = cls(raw=raw)
        my = raw.get("mydumper", {})
        cfg.source_dir = my.get("data-source-dir", cfg.source_dir)
        cfg.no_schema = my.get("no-schema", cfg.no_schema)
        cfg.case_sensitive = my.get("case-sensitive", cfg.case_sensitive)
        cfg.filter = my.get("filter", cfg.filter)
        cfg.file_routes = my.get("files", cfg.file_routes)
        cfg.default_file_rules = my.get("default-file-rules", not cfg.file_routes)
        cfg.character_set = _charset(my.get("character-set", "utf8mb4"))
        csv = my.get("csv", {})
        cfg.csv = CSVConfig(
            separator=csv.get("separator", ","),
            delimiter=csv.get("delimiter", '"'),
            header=csv.get("header", True),
            not_null=csv.get("not-null", False),
            null=csv.get("null", r"\N"),
            backslash_escape=csv.get("backslash-escape", True),
            trim_last_sep=csv.get("trim-last-separator", False),
            character_set=_charset(my.get("character-set", "utf8mb4")),
            strict_format=my.get("strict-format", False),
            exact_dialect=csv.get("exact-dialect"),
        )
        cfg.routes = raw.get("routes", [])
        cfg.bw_list = raw.get("black-white-list") or None
        tikv = raw.get("tikv-importer", {})
        cfg.backend = tikv.get("backend", "local")
        cfg.output_format = tikv.get("output-format", cfg.output_format)
        cfg.on_duplicate = tikv.get("on-duplicate", cfg.on_duplicate)
        cfg.duplicate_resolution = tikv.get(
            "duplicate-resolution", cfg.duplicate_resolution
        )
        cfg.engine_bytes = _size(my.get("batch-size", cfg.engine_bytes))
        lightning = raw.get("lightning", {})
        cfg.table_concurrency = int(
            lightning.get("table-concurrency", cfg.table_concurrency)
        )
        cp = raw.get("checkpoint", {})
        cfg.checkpoint_enable = cp.get("enable", True)
        cfg.checkpoint_driver = cp.get("driver", cfg.checkpoint_driver)
        post = raw.get("post-restore", {})
        cfg.checksum = _tristate(post.get("checksum", "required"))
        cfg.analyze = _tristate(post.get("analyze", "optional"))
        tidb = raw.get("tidb", {})
        if tidb.get("sql-mode", ""):
            cfg.strict_sql_mode = "STRICT_TRANS_TABLES" in tidb["sql-mode"].upper()
        # [tidb] jdbc-url/jdbc-driver: the live-database target of the
        # jdbc/tidb backend (reference [tidb] host/port/user connection)
        cfg.jdbc_url = tidb.get("jdbc-url", cfg.jdbc_url)
        cfg.jdbc_driver = tidb.get("jdbc-driver", cfg.jdbc_driver)
        cfg.block_encryption_mode = tidb.get(
            "block-encryption-mode", cfg.block_encryption_mode
        )
        for k, v in overrides.items():
            if v is not None:
                setattr(cfg, k, v)
        if cfg.checkpoint_driver == "mysql":
            # reference name -> our analog (after overrides, which can
            # set both the driver and the backend): with a live JDBC
            # target the checkpoint lives IN that target (reference
            # MySQL driver, checkpoints.go:69-175 — resume works from a
            # new driver machine); without one, the local sqlite driver
            # is the closest database-backed analog. NOTE: in-target
            # checkpoints are invisible to local auto-detection — `ctl`
            # reaches them via --config; the HTTP server's /progress
            # endpoints (target-dir only, no config) show local stores
            # only
            cfg.checkpoint_driver = (
                "jdbc" if cfg.backend in ("tidb", "jdbc") else "sqlite"
            )
        cfg.validate()
        return cfg

    def validate(self) -> None:
        """Adjust()-style checks (config.go:499-786 subset)."""
        # normalize charset aliases on EVERY entry path (overrides and
        # direct construction included, not just the TOML reader) —
        # 'binary'/'auto'/'utf8mb4' passed raw used to LookupError deep
        # inside the sources
        self.character_set = _charset(self.character_set)
        if _charset(self.csv.character_set) != self.csv.character_set:
            import dataclasses as _dc

            self.csv = _dc.replace(
                self.csv, character_set=_charset(self.csv.character_set)
            )
        if not self.source_dir:
            raise ValueError("mydumper.data-source-dir (--source) is required")
        if self.backend not in ("local", "importer", "tidb", "jdbc", "files"):
            raise ValueError(f"invalid backend {self.backend!r}")
        if self.backend in ("tidb", "jdbc") and not self.jdbc_url:
            # never silently fall back to the files backend: a user who
            # configured a database target must get one or an error
            raise ValueError(
                "backend=jdbc/tidb requires tidb.jdbc-url (the target "
                "database's JDBC URL)"
            )
        if self.checkpoint_driver == "jdbc" and not self.jdbc_url:
            raise ValueError(
                "checkpoint.driver=jdbc stores checkpoints in the target "
                "database and requires tidb.jdbc-url"
            )
        if self.output_format not in ("parquet", "orc"):
            raise ValueError(f"invalid output-format {self.output_format!r}")
        c = self.csv
        if not c.separator:
            raise ValueError("csv.separator must not be empty")
        if c.delimiter and (
            c.separator.startswith(c.delimiter)
            or c.delimiter.startswith(c.separator)
        ):
            raise ValueError("csv.separator and csv.delimiter must not be prefixes")
        if self.routes and self.file_routes:
            raise ValueError("can't configure both [routes] and [[mydumper.files]]")
        if self.on_duplicate not in ("replace", "ignore", "error"):
            raise ValueError(f"invalid on-duplicate {self.on_duplicate!r}")
        if self.duplicate_resolution not in ("none", "replace", "ignore", "error"):
            raise ValueError(
                f"invalid duplicate-resolution {self.duplicate_resolution!r}"
            )
        if self.table_concurrency < 1:
            raise ValueError("lightning.table-concurrency must be >= 1")
        if self.bw_list and self.filter is not None:
            # reference parity (config.go:655-660): the legacy
            # [black-white-list] REPLACES mydumper.filter — defining a
            # non-default filter alongside it is a startup error, never
            # a silent intersection. An explicit filter equal to the
            # default is allowed (StringSliceEqual(Filter, DefaultFilter)).
            from tidb_lightning_spark.sources.table_filter import (
                DEFAULT_FILTER,
            )

            if list(self.filter) != DEFAULT_FILTER:
                raise ValueError(
                    "invalid config: `mydumper.filter` and "
                    "`black-white-list` cannot be simultaneously defined"
                )


# the full reference TOML surface (config.go + global.go toml tags) plus
# this repo's extensions (output-format, duplicate-resolution, jdbc-*).
# Spark-obsolete reference knobs stay listed so existing configs parse —
# "known but ignored" is parity; "unknown" is a startup error. Schema:
# key -> None (scalar leaf or free-form subtree) | dict (checked table;
# applied to each item when the value is an array of tables).
_KNOWN_KEYS: dict[str, Any] = {
    "lightning": dict.fromkeys([
        "table-concurrency", "index-concurrency", "region-concurrency",
        "io-concurrency", "check-requirements", "status-addr",
        "server-mode", "pprof-port", "meta-schema-name",
        # embedded log.Config (lightning/log/log.go:38-46 toml tags)
        "level", "file", "max-size", "max-days", "max-backups",
        # this repo's CLI-flag analogs, accepted for lenience
        "log-level", "log-file",
    ]),
    "tidb": dict.fromkeys([
        "host", "port", "user", "password", "status-port", "pd-addr",
        "sql-mode", "tls", "security", "max-allowed-packet",
        "distsql-scan-concurrency", "build-stats-concurrency",
        "index-serial-scan-concurrency", "checksum-table-concurrency",
        "log-level", "jdbc-url", "jdbc-driver", "jdbc-table-prefix",
        "block-encryption-mode",
    ]),
    "checkpoint": dict.fromkeys([
        "enable", "schema", "dsn", "driver", "keep-after-success",
    ]),
    "mydumper": {
        **dict.fromkeys([
            "read-block-size", "batch-size", "batch-import-ratio",
            "data-source-dir", "no-schema", "character-set",
            "case-sensitive", "strict-format", "max-region-size",
            "filter", "default-file-rules",
        ]),
        "csv": dict.fromkeys([
            "separator", "delimiter", "header", "trim-last-separator",
            "not-null", "null", "backslash-escape",
            # extension: force/forbid the exact MySQL-dialect lexer
            "exact-dialect",
        ]),
        # list items: FileRouteRule (config.go:270-277)
        "files": dict.fromkeys([
            "pattern", "path", "schema", "table", "type", "key",
            "compression",
        ]),
    },
    "tikv-importer": dict.fromkeys([
        "addr", "backend", "on-duplicate", "max-kv-pairs",
        "send-kv-pairs", "region-split-size", "sorted-kv-dir",
        "disk-quota", "range-concurrency", "output-format",
        "duplicate-resolution",
    ]),
    "post-restore": dict.fromkeys([
        "level-1-compact", "compact", "checksum", "analyze",
        "post-process-at-last",
    ]),
    "cron": dict.fromkeys([
        "switch-mode", "log-progress", "check-disk-quota",
    ]),
    # list items: router.TableRule
    "routes": dict.fromkeys([
        "schema-pattern", "table-pattern", "target-schema",
        "target-table",
    ]),
    "security": None,
    # tidb-tools MySQLReplicationRules surface: a typo'd key inside the
    # BWList ('do-db' for 'do-dbs') must fail loudly like any other —
    # a silently-dropped rule imports everything it meant to exclude
    "black-white-list": {
        **dict.fromkeys(["do-dbs", "ignore-dbs"]),
        "do-tables": dict.fromkeys(["db-name", "tbl-name"]),
        "ignore-tables": dict.fromkeys(["db-name", "tbl-name"]),
    },
}


def _unknown_keys(raw: dict[str, Any]) -> list[str]:
    """Dotted paths of every TOML key no consumer recognizes."""

    def walk(node: Any, schema: Any, prefix: str, out: list[str]) -> None:
        if schema is None or not isinstance(schema, dict):
            return  # leaf / free-form subtree
        if isinstance(node, list):  # array of tables: check each item
            for item in node:
                walk(item, schema, prefix, out)
            return
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            if k not in schema:
                out.append(f"{prefix}{k}")
            else:
                walk(v, schema[k], f"{prefix}{k}.", out)

    out: list[str] = []
    walk(raw, _KNOWN_KEYS, "", out)
    return out


def _charset(name: str) -> str:
    # 'auto' survives normalization: it means DETECT (utf-8 then
    # gb18030, reference mydump/reader.go:43-55), resolved per file by
    # csv_source.effective_charset — mapping it to utf-8 here broke the
    # reference's auto-on-gb18030 contract (tests/character_sets).
    # 'binary' maps to the byte-preserving latin-1 passthrough.
    return {
        "utf8": "utf-8",
        "utf8mb4": "utf-8",
        "gb18030": "gb18030",
        "gbk": "gbk",
        "latin1": "iso-8859-1",
        "binary": "iso-8859-1",
        "auto": "auto",
    }.get(name.lower(), name)


def _size(v) -> int:
    """'100GiB' / '64MB' / plain int -> bytes (config.go ByteSize)."""
    if isinstance(v, int):
        return v
    s = str(v).strip().lower().removesuffix("b").removesuffix("i")
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(float(s))


def _tristate(v) -> str:
    if isinstance(v, bool):
        return "required" if v else "off"
    v = str(v).lower()
    if v not in ("off", "optional", "required", "true", "false"):
        raise ValueError(f"invalid tristate {v!r}")
    return {"true": "required", "false": "off"}.get(v, v)
