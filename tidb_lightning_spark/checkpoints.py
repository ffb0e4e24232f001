"""Checkpoint store (reference: lightning/checkpoints/checkpoints.go).

The reference's 4-level protobuf/MySQL checkpoint machine collapses to a
per-table JSON state file because our commit unit is a whole table (the
files sink stages+renames atomically): statuses mirror
checkpoints.go:43-56 so `ctl` output reads the same.

    loaded(30) -> all_written(60) -> closed(90) -> imported(120) ->
    altered_auto_inc(150) -> checksummed(180) -> analyzed(210)

Updates are atomic (write-temp + rename) and idempotent; a re-run skips
tables at >= imported with a matching source signature and re-runs
anything earlier — the exactly-once semantics the kill-and-resume tests
pin (FIXTURES.md F12).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

STATUS = {
    "loaded": 30,
    "all_written": 60,
    "closed": 90,
    "imported": 120,
    "altered_auto_inc": 150,
    "checksummed": 180,
    "analyzed": 210,
}


class CheckpointStore:
    def __init__(self, path: str, enabled: bool = True):
        import threading

        self.path = path
        self.enabled = enabled
        # in-process mutual exclusion for table-concurrency > 1 (the
        # SQLite driver additionally serializes across processes)
        self._lock = threading.RLock()
        self._data: dict = {"version": 1, "tables": {}}
        if enabled and os.path.exists(path):
            with open(path) as f:
                self._data = json.load(f)

    def _save(self) -> None:
        if not self.enabled:
            return
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(self._data, f, indent=2)
        os.replace(tmp, self.path)

    @staticmethod
    def table_key(db: str, table: str) -> str:
        return f"`{db}`.`{table}`"

    def get(self, db: str, table: str) -> dict:
        return self._data["tables"].get(self.table_key(db, table), {})

    def status(self, db: str, table: str) -> int:
        return self.get(db, table).get("status", 0)

    def update(self, db: str, table: str, status: str, **fields) -> None:
        with self._lock:
            key = self.table_key(db, table)
            rec = self._data["tables"].setdefault(key, {})
            rec["status"] = STATUS[status]
            rec["status_name"] = status
            rec["updated_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
            rec.update(fields)
            self._save()

    def source_signature(self, data_files) -> str:
        """Change-detection key: (path, size) of every input file."""
        import hashlib

        h = hashlib.sha256()
        for f in data_files:
            h.update(f"{f.path}:{f.file_size};".encode())
        return h.hexdigest()[:16]

    def should_skip(
        self,
        db: str,
        table: str,
        signature: str,
        min_status: str = "imported",
    ) -> bool:
        """A table is skippable only once it reached `min_status` — when
        verification is on, that is `checksummed`, so a run that imported
        but failed (or never ran) the checksum phase is re-verified on
        resume instead of being silently reported ok (the reference's
        state machine re-runs every phase below the recorded status,
        checkpoints.go:43-56)."""
        rec = self.get(db, table)
        return (
            rec.get("status", 0) >= STATUS[min_status]
            and rec.get("signature") == signature
        )

    # ----- engine-level (chunk) records -------------------------------
    # The reference resumes per chunk/engine (checkpoints.go:43-56,
    # tests/checkpoint_chunks); our engine = a deterministic group of a
    # table's source files, committed independently (pipeline._plan_engines).

    def engine_done(self, db: str, table: str, engine: int, esig: str) -> bool:
        rec = self.get(db, table)
        e = rec.get("engines", {}).get(str(engine))
        return bool(e) and e.get("status") == "imported" and e.get("signature") == esig

    def engine_update(
        self, db: str, table: str, engine: int, status: str, **fields
    ) -> None:
        with self._lock:
            key = self.table_key(db, table)
            rec = self._data["tables"].setdefault(key, {})
            e = rec.setdefault("engines", {}).setdefault(str(engine), {})
            e["status"] = status
            e["updated_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
            e.update(fields)
            self._save()

    def clear_engines(self, db: str, table: str) -> None:
        with self._lock:
            rec = self._data["tables"].get(self.table_key(db, table))
            if rec and rec.pop("engines", None) is not None:
                self._save()

    def remove(self, db: str | None = None, table: str | None = None) -> int:
        with self._lock:
            if db is None:
                n = len(self._data["tables"])
                self._data["tables"] = {}
            else:
                key = self.table_key(db, table)
                n = 1 if key in self._data["tables"] else 0
                self._data["tables"].pop(key, None)
            self._save()
            return n

    def dump(self) -> dict:
        return self._data


class SQLiteCheckpointStore(CheckpointStore):
    """Database-backed checkpoint driver (reference's MySQL driver analog,
    checkpoints.go:69-175 DDL templates; ours is stdlib sqlite3).

    Same API and record shape as the JSON driver, but every operation is
    its own transaction against the DB file, so concurrent processes —
    a server-mode import and a `ctl` inspection, or two imports into the
    same warehouse — see consistent state instead of clobbering a shared
    JSON file. WAL mode keeps readers unblocked during updates."""

    def __init__(self, path: str, enabled: bool = True):
        self.path = path
        self.enabled = enabled
        if enabled:
            with self._conn() as con:
                con.execute(
                    "CREATE TABLE IF NOT EXISTS checkpoints ("
                    " key TEXT PRIMARY KEY, rec TEXT NOT NULL)"
                )

    def _conn(self):
        import sqlite3

        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        con = sqlite3.connect(self.path, timeout=30.0)
        con.execute("PRAGMA journal_mode=WAL")
        return con

    # -- storage primitives (everything else inherits) ------------------
    def get(self, db: str, table: str) -> dict:
        if not self.enabled:
            return {}
        with self._conn() as con:
            row = con.execute(
                "SELECT rec FROM checkpoints WHERE key = ?",
                (self.table_key(db, table),),
            ).fetchone()
        return json.loads(row[0]) if row else {}

    def _put(self, key: str, rec: dict) -> None:
        with self._conn() as con:
            con.execute(
                "INSERT INTO checkpoints (key, rec) VALUES (?, ?) "
                "ON CONFLICT(key) DO UPDATE SET rec = excluded.rec",
                (key, json.dumps(rec)),
            )

    def _rmw(self, key: str, mutate) -> None:
        """Read-modify-write under ONE write transaction (BEGIN IMMEDIATE
        takes the write lock before the read), so a concurrent server-mode
        import and a ctl process cannot interleave get()/put() and lose
        engine records. `mutate(rec) -> bool|None`: return False to skip
        the write."""
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            row = con.execute(
                "SELECT rec FROM checkpoints WHERE key = ?", (key,)
            ).fetchone()
            rec = json.loads(row[0]) if row else {}
            if mutate(rec) is False:
                return
            con.execute(
                "INSERT INTO checkpoints (key, rec) VALUES (?, ?) "
                "ON CONFLICT(key) DO UPDATE SET rec = excluded.rec",
                (key, json.dumps(rec)),
            )

    def update(self, db: str, table: str, status: str, **fields) -> None:
        if not self.enabled:
            return

        def mutate(rec):
            rec["status"] = STATUS[status]
            rec["status_name"] = status
            rec["updated_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
            rec.update(fields)

        self._rmw(self.table_key(db, table), mutate)

    def engine_update(
        self, db: str, table: str, engine: int, status: str, **fields
    ) -> None:
        if not self.enabled:
            return

        def mutate(rec):
            e = rec.setdefault("engines", {}).setdefault(str(engine), {})
            e["status"] = status
            e["updated_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
            e.update(fields)

        self._rmw(self.table_key(db, table), mutate)

    def clear_engines(self, db: str, table: str) -> None:
        if not self.enabled:
            return

        def mutate(rec):
            return rec.pop("engines", None) is not None

        self._rmw(self.table_key(db, table), mutate)

    def remove(self, db: str | None = None, table: str | None = None) -> int:
        if not self.enabled:
            return 0
        with self._conn() as con:
            if db is None:
                n = con.execute("SELECT count(*) FROM checkpoints").fetchone()[0]
                con.execute("DELETE FROM checkpoints")
            else:
                cur = con.execute(
                    "DELETE FROM checkpoints WHERE key = ?",
                    (self.table_key(db, table),),
                )
                n = cur.rowcount
        return n

    def dump(self) -> dict:
        if not self.enabled:
            return {"version": 1, "tables": {}}
        with self._conn() as con:
            rows = con.execute("SELECT key, rec FROM checkpoints").fetchall()
        return {
            "version": 1,
            "tables": {k: json.loads(r) for k, r in rows},
        }


class JDBCCheckpointStore(CheckpointStore):
    """Checkpoint-in-target-DB driver (the reference's MySQL checkpoint
    driver, checkpoints.go:69-175): records live in the TARGET database
    (`lightning_checkpoints.checkpoint`, one row per table, same JSON
    record shape as the file/sqlite drivers), so a resume can run from a
    DIFFERENT driver machine — the local stores die with the machine
    that started the import.

    Concurrency contract: in-process writers serialize on an RLock (the
    table-concurrency case); cross-machine access is resume-after-crash,
    not concurrent import, matching the reference's usage."""

    SCHEMA = "lightning_checkpoints"  # reference default checkpoint schema

    def __init__(self, spark, url: str, properties: dict | None = None,
                 enabled: bool = True):
        import threading

        self.spark = spark
        self.url = url
        self.properties = dict(properties or {})
        self.enabled = enabled
        self.path = f"{url} [{self.SCHEMA}.checkpoint]"  # ctl display
        self.dialect = "derby" if url.startswith("jdbc:derby") else "mysql"
        self._lock = threading.RLock()
        if enabled:
            self._init_table()

    def _conn(self):
        from tidb_lightning_spark.sinks.jdbc_sink import _jdbc_connection

        return _jdbc_connection(self.spark, self.url, self.properties)

    def _init_table(self) -> None:
        from tidb_lightning_spark.sinks.jdbc_sink import execute_ddl

        if self.dialect == "mysql":
            execute_ddl(
                self.spark, self.url,
                f"CREATE DATABASE IF NOT EXISTS {self.SCHEMA}",
                self.properties,
            )
            execute_ddl(
                self.spark, self.url,
                f"CREATE TABLE IF NOT EXISTS {self.SCHEMA}.checkpoint ("
                " k VARCHAR(191) NOT NULL PRIMARY KEY,"
                " rec LONGTEXT NOT NULL)",
                self.properties,
            )
        else:  # derby creates the schema implicitly on CREATE TABLE
            execute_ddl(
                self.spark, self.url,
                f"CREATE TABLE {self.SCHEMA}.checkpoint ("
                ' "k" VARCHAR(512) NOT NULL PRIMARY KEY,'
                ' "rec" CLOB NOT NULL)',
                self.properties,
                ignore_exists=True,
            )

    def _q(self, ident: str) -> str:
        return f"`{ident}`" if self.dialect == "mysql" else f'"{ident}"'

    # -- storage primitives (everything else inherits) ------------------
    def get(self, db: str, table: str) -> dict:
        if not self.enabled:
            return {}
        sql = (
            f"SELECT {self._q('rec')} FROM {self.SCHEMA}.checkpoint "
            f"WHERE {self._q('k')} = ?"
        )
        with self._conn() as conn:
            ps = conn.prepareStatement(sql)
            try:
                ps.setString(1, self.table_key(db, table))
                rs = ps.executeQuery()
                try:
                    if rs.next():
                        return json.loads(rs.getString(1))
                    return {}
                finally:
                    rs.close()
            finally:
                ps.close()

    def _rmw(self, key: str, mutate) -> None:
        """Read-modify-write; in-process serialization via the RLock,
        UPDATE-else-INSERT upsert (portable across derby/mysql)."""
        with self._lock, self._conn() as conn:
            ps = conn.prepareStatement(
                f"SELECT {self._q('rec')} FROM {self.SCHEMA}.checkpoint "
                f"WHERE {self._q('k')} = ?"
            )
            try:
                ps.setString(1, key)
                rs = ps.executeQuery()
                try:
                    rec = json.loads(rs.getString(1)) if rs.next() else {}
                finally:
                    rs.close()
            finally:
                ps.close()
            if mutate(rec) is False:
                return
            up = conn.prepareStatement(
                f"UPDATE {self.SCHEMA}.checkpoint SET {self._q('rec')} = ? "
                f"WHERE {self._q('k')} = ?"
            )
            try:
                up.setString(1, json.dumps(rec))
                up.setString(2, key)
                n = up.executeUpdate()
            finally:
                up.close()
            if n == 0:
                ins = conn.prepareStatement(
                    f"INSERT INTO {self.SCHEMA}.checkpoint "
                    f"({self._q('k')}, {self._q('rec')}) VALUES (?, ?)"
                )
                try:
                    ins.setString(1, key)
                    ins.setString(2, json.dumps(rec))
                    ins.executeUpdate()
                finally:
                    ins.close()

    def update(self, db: str, table: str, status: str, **fields) -> None:
        if not self.enabled:
            return

        def mutate(rec):
            rec["status"] = STATUS[status]
            rec["status_name"] = status
            rec["updated_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
            rec.update(fields)

        self._rmw(self.table_key(db, table), mutate)

    def engine_update(
        self, db: str, table: str, engine: int, status: str, **fields
    ) -> None:
        if not self.enabled:
            return

        def mutate(rec):
            e = rec.setdefault("engines", {}).setdefault(str(engine), {})
            e["status"] = status
            e["updated_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
            e.update(fields)

        self._rmw(self.table_key(db, table), mutate)

    def clear_engines(self, db: str, table: str) -> None:
        if not self.enabled:
            return

        def mutate(rec):
            return rec.pop("engines", None) is not None

        self._rmw(self.table_key(db, table), mutate)

    def remove(self, db: str | None = None, table: str | None = None) -> int:
        if not self.enabled:
            return 0
        with self._lock, self._conn() as conn:
            st = conn.createStatement()
            try:
                if db is None:
                    rs = st.executeQuery(
                        f"SELECT COUNT(*) FROM {self.SCHEMA}.checkpoint"
                    )
                    rs.next()
                    n = int(rs.getLong(1))
                    rs.close()
                    st.execute(f"DELETE FROM {self.SCHEMA}.checkpoint")
                    return n
            finally:
                st.close()
            ps = conn.prepareStatement(
                f"DELETE FROM {self.SCHEMA}.checkpoint "
                f"WHERE {self._q('k')} = ?"
            )
            try:
                ps.setString(1, self.table_key(db, table))
                return int(ps.executeUpdate())
            finally:
                ps.close()

    def dump(self) -> dict:
        if not self.enabled:
            return {"version": 1, "tables": {}}
        with self._conn() as conn:
            st = conn.createStatement()
            try:
                rs = st.executeQuery(
                    f"SELECT {self._q('k')}, {self._q('rec')} "
                    f"FROM {self.SCHEMA}.checkpoint"
                )
                tables = {}
                try:
                    while rs.next():
                        tables[rs.getString(1)] = json.loads(rs.getString(2))
                finally:
                    rs.close()
            finally:
                st.close()
        return {"version": 1, "tables": tables}


def open_checkpoint_store(
    target_dir: str,
    driver: str = "file",
    enabled: bool = True,
    spark=None,
    jdbc_url: str | None = None,
    jdbc_properties: dict | None = None,
) -> CheckpointStore:
    """Driver dispatch mirroring the reference's checkpoint.driver config
    (file / mysql -> here: file / sqlite / jdbc-in-target). Auto-detects
    an existing local store of either flavor so `ctl` works regardless
    of how the import ran; the jdbc driver needs the live session and
    target URL and is only reachable by explicit configuration."""
    if driver == "jdbc":
        if spark is None or not jdbc_url:
            raise ValueError(
                "checkpoint driver 'jdbc' needs a SparkSession and a "
                "jdbc-url (checkpoints live in the target database)"
            )
        return JDBCCheckpointStore(
            spark, jdbc_url, jdbc_properties, enabled=enabled
        )
    jpath = os.path.join(target_dir, "_tls_checkpoints.json")
    spath = os.path.join(target_dir, "_tls_checkpoints.sqlite")
    if driver == "auto":
        driver = "sqlite" if (
            os.path.exists(spath) and not os.path.exists(jpath)
        ) else "file"
    if driver == "sqlite":
        return SQLiteCheckpointStore(spath, enabled=enabled)
    if driver == "file":
        return CheckpointStore(jpath, enabled=enabled)
    raise ValueError(
        f"unknown checkpoint driver {driver!r} (file|sqlite|jdbc|auto)"
    )
