"""Source-directory discovery (reference: lightning/mydump/loader.go).

Walks the dump directory deterministically (lexicographic, like the
reference's listFiles loader.go:205-331), routes every file
(router -> type/schema/table), applies the table filter, applies
shard-merge table routing, and produces the per-table ingest plan:

    MDDatabaseMeta{name, schema_file, tables: {name: MDTableMeta}}
    MDTableMeta{db, name, schema_file, data_files[], total_size}

Tables are ordered smallest-first for scheduling (loader.go:267-281) and a
table's data files by (sort_key, path) so row-ID allocation is stable
across runs (SURVEY.md §2.D1).

All of this is driver-side pure Python — at 100 TB the directory listing
is still tiny metadata; the data itself is only ever touched by executors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from tidb_lightning_spark.sources.router import FileRouter, RouteResult
from tidb_lightning_spark.sources.table_filter import TableFilter
from tidb_lightning_spark.sources.table_router import TableRouter


@dataclass(frozen=True)
class SourceFileMeta:
    path: str
    type: str  # table-schema | view-schema | sql | csv | parquet
    compression: str = ""
    sort_key: str = ""
    file_size: int = 0


@dataclass
class MDTableMeta:
    db: str
    name: str
    schema_file: str | None = None
    view_schema_file: str | None = None
    data_files: list[SourceFileMeta] = field(default_factory=list)

    @property
    def total_size(self) -> int:
        return sum(f.file_size for f in self.data_files)


@dataclass
class MDDatabaseMeta:
    name: str
    schema_file: str | None = None
    tables: dict[str, MDTableMeta] = field(default_factory=dict)


@dataclass
class LoadResult:
    databases: dict[str, MDDatabaseMeta]
    ignored: list[str]
    unrecognized: list[str]

    def sorted_tables(self) -> list[MDTableMeta]:
        """Small-table-first scheduling order (loader.go:267-281)."""
        out = [t for db in self.databases.values() for t in db.tables.values()]
        out.sort(key=lambda t: (t.total_size, t.db, t.name))
        return out


def _walk(source_dir: str, spark=None) -> list[tuple[str, int]]:
    """Deterministic recursive listing -> [(path, size)].

    Local paths walk the OS filesystem. A scheme'd URI (s3a://, hdfs://,
    file://, ...) lists through the Hadoop FileSystem of the active
    SparkSession (the analog of the reference's external-storage walk,
    lightning.go:273-279 + loader.go:205-331) — the same connector the
    executors will scan with, so any object store Spark can read, the
    discovery can enumerate. `file:` URIs are normalized back to plain
    local paths so every driver-side peek (schema files, CSV headers,
    SQL-dump splitting) keeps working; for genuinely remote schemes those
    peeks require the data files to be parquet/headerless-CSV or the
    stores to be mounted (see README).
    """
    if "://" not in source_dir:
        out = []
        for root, dirs, files in os.walk(source_dir):
            dirs.sort()
            for f in sorted(files):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
        return out
    if spark is None:
        raise ValueError(
            f"remote source {source_dir!r} requires a SparkSession for "
            "Hadoop FileSystem listing (discover(..., spark=spark))"
        )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(source_dir)
    fs = root.getFileSystem(conf)
    it = fs.listFiles(root, True)
    out = []
    is_file_scheme = source_dir.startswith("file:")
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if is_file_scheme:
            from tidb_lightning_spark.paths import file_uri_to_path

            p = file_uri_to_path(p)
        out.append((p, st.getLen()))
    out.sort()
    return out


def discover(
    source_dir: str,
    file_router: FileRouter | None = None,
    table_filter: TableFilter | None = None,
    table_router: TableRouter | None = None,
    no_schema: bool = False,
    spark=None,
) -> LoadResult:
    file_router = file_router or FileRouter.build()
    table_filter = table_filter or TableFilter()
    # the routing key is the path relative to the source root, '/'-separated
    if "://" in source_dir:
        base = source_dir.rstrip("/")
        from tidb_lightning_spark.paths import file_uri_to_path

        base = file_uri_to_path(base)

        def rel_of(path: str) -> str:
            return path[len(base) :].lstrip("/")

    else:

        def rel_of(path: str) -> str:
            return os.path.relpath(path, source_dir).replace(os.sep, "/")

    dbs: dict[str, MDDatabaseMeta] = {}
    ignored: list[str] = []
    unrecognized: list[str] = []

    def db_of(name: str) -> MDDatabaseMeta:
        return dbs.setdefault(name, MDDatabaseMeta(name=name))

    def table_of(db: str, name: str) -> MDTableMeta:
        return db_of(db).tables.setdefault(name, MDTableMeta(db=db, name=name))

    routed: list[tuple[str, RouteResult, int]] = []
    for path, size in _walk(source_dir, spark=spark):
        rel = rel_of(path)
        res = file_router.route(rel)
        if res is None:
            unrecognized.append(rel)
            continue
        if res.type == "ignore":
            ignored.append(rel)
            continue
        routed.append((path, res, size))

    # filter (loader.go:333-338), then shard-merge route (loader.go:340-416)
    routed_away: dict[str, int] = {}
    routed_targets: set[str] = set()  # dbs created by table routing
    merged_tables: set[tuple[str, str]] = set()  # shard-merge targets
    for path, res, size in routed:
        if res.type == "schema-schema":
            if not table_filter.match_schema(res.schema):
                ignored.append(path)
                continue
            db = db_of(res.schema)
            if db.schema_file is not None and db.schema_file != path:
                # loader.go:322-326 / loader_test TestDuplicatedDB: two
                # schema-create files for one db is a layout error
                raise ValueError(
                    f"invalid database schema file, duplicated item - "
                    f"{path}"
                )
            db.schema_file = path
            continue
        if not table_filter.match_table(res.schema, res.name):
            ignored.append(path)
            continue
        schema, name = (
            table_router.route(res.schema, res.name)
            if table_router
            else (res.schema, res.name)
        )
        if schema != res.schema:
            routed_away[res.schema] = routed_away.get(res.schema, 0) + 1
        if (schema, name) != (res.schema, res.name):
            merged_tables.add((schema, name))
            routed_targets.add(schema)
        tbl = table_of(schema, name)
        if res.type == "table-schema":
            # first shard's schema wins for a merged target (schema
            # dedup); an UNROUTED duplicate — the same db.tbl-schema.sql
            # in two dirs — is a layout error (loader_test
            # TestDuplicatedTable)
            if (
                tbl.schema_file is not None
                and (schema, name) not in merged_tables
            ):
                raise ValueError(
                    f"invalid table schema file, duplicated item - {path}"
                )
            if tbl.schema_file is None:
                tbl.schema_file = path
        elif res.type == "view-schema":
            if tbl.view_schema_file is None:
                tbl.view_schema_file = path
        else:
            tbl.data_files.append(
                SourceFileMeta(
                    path=path,
                    type=res.type,
                    compression=res.compression,
                    sort_key=res.key,
                    file_size=size,
                )
            )

    # stable data-file order per table: (sort_key numeric-aware, path)
    for db in dbs.values():
        for tbl in db.tables.values():
            tbl.data_files.sort(
                key=lambda f: (
                    int(f.sort_key) if f.sort_key.isdigit() else 0,
                    f.sort_key,
                    f.path,
                )
            )
            if not no_schema and tbl.schema_file is None and tbl.data_files:
                raise FileNotFoundError(
                    f"missing table schema file for `{tbl.db}`.`{tbl.name}` "
                    f"(set no-schema=true to infer from data)"
                )
            if (
                not no_schema
                and tbl.view_schema_file is not None
                and tbl.schema_file is None
            ):
                # loader_test TestViewNoHostTable: a -schema-view.sql
                # needs its companion table-schema placeholder
                raise FileNotFoundError(
                    f"invalid view schema file, miss host table schema "
                    f"for view '{tbl.name}'"
                )

    if not no_schema:
        # loader.go host-db checks (loader_test TestTableNoHostDB /
        # TestDataNoHostDB): every table's db needs a schema-create file
        # unless the db was materialized by table ROUTING (the router
        # target inherits existence from its sources)
        for name, db in dbs.items():
            if (
                db.tables
                and db.schema_file is None
                and name not in routed_targets
            ):
                first = next(iter(db.tables.values()))
                ref = (
                    first.schema_file
                    or first.view_schema_file
                    or (first.data_files[0].path if first.data_files else "?")
                )
                raise FileNotFoundError(
                    f"invalid schema file, cannot find db '{name}' - {ref} "
                    f"(add {name}-schema-create.sql or set no-schema=true)"
                )

    # drop source dbs fully routed away (loader.go:404-415); an empty db
    # that simply has no tables is kept
    dbs = {
        name: db
        for name, db in dbs.items()
        if db.tables or (db.schema_file and routed_away.get(name, 0) == 0)
    }
    return LoadResult(databases=dbs, ignored=ignored, unrecognized=unrecognized)
