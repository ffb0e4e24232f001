"""Table allow/deny filter (reference: tidb-tools filter used at
lightning/mydump/loader.go:119-131, defaults config.go:101-109).

Rules are `db.tbl` wildcard patterns evaluated in order with
**last-match-wins** (gitignore-style); a leading ``!`` negates. Matching is
fnmatch-ish: ``*`` any run, ``?`` one char. Case-insensitive unless
``case_sensitive`` (loader.go:130 wraps with CaseInsensitive).
"""

from __future__ import annotations

import fnmatch
import re

DEFAULT_FILTER = [
    "*.*",
    "!mysql.*",
    "!sys.*",
    "!INFORMATION_SCHEMA.*",
    "!PERFORMANCE_SCHEMA.*",
    "!METRICS_SCHEMA.*",
    "!INSPECTION_SCHEMA.*",
]


class TableFilter:
    def __init__(self, rules: list[str] | None = None, case_sensitive: bool = False):
        self.case_sensitive = case_sensitive
        self._rules: list[tuple[bool, re.Pattern, re.Pattern]] = []
        for raw in rules if rules is not None else DEFAULT_FILTER:
            raw = raw.strip()
            positive = not raw.startswith("!")
            if not positive:
                raw = raw[1:]
            schema_pat, sep, table_pat = raw.partition(".")
            if not sep:
                table_pat = "*"
            flags = 0 if case_sensitive else re.IGNORECASE
            self._rules.append(
                (
                    positive,
                    re.compile(fnmatch.translate(schema_pat), flags),
                    re.compile(fnmatch.translate(table_pat), flags),
                )
            )

    def match_table(self, schema: str, table: str) -> bool:
        verdict = False
        for positive, sp, tp in self._rules:
            if sp.match(schema) and tp.match(table):
                verdict = positive
        return verdict

    def match_schema(self, schema: str) -> bool:
        verdict = False
        for positive, sp, _ in self._rules:
            if sp.match(schema):
                verdict = positive
        return verdict


class BWListFilter:
    """[black-white-list] — the reference's LEGACY filter surface
    (config.go:146 BWList -> tidb-tools MySQLReplicationRules;
    tests/black-white-list). Previously accepted-but-IGNORED, which
    silently imported everything a user meant to exclude. Semantics
    (filter.go subset the reference test exercises): db level —
    do-dbs whitelist when non-empty, else ignore-dbs blacklist; table
    level — do-tables whitelist when non-empty, else ignore-tables
    blacklist. A '~'-prefixed name is a regexp, anything else an
    exact (case-insensitive by default) name."""

    def __init__(self, raw: dict, case_sensitive: bool = False):
        flags = 0 if case_sensitive else re.IGNORECASE

        def pat(name: str) -> "re.Pattern":
            # '~' rules are UNANCHORED regexps (tidb-tools uses Go's
            # MatchString, a substring search — '~log$' must exclude
            # 'binlog'); exact names anchor both ends
            if name.startswith("~"):
                return re.compile(name[1:], flags)
            return re.compile(r"\A" + re.escape(name) + r"\Z", flags)

        self._do_dbs = [pat(x) for x in raw.get("do-dbs", [])]
        self._ignore_dbs = [pat(x) for x in raw.get("ignore-dbs", [])]

        def tbl(key: str):
            return [
                (pat(r["db-name"]), pat(r["tbl-name"]))
                for r in raw.get(key, [])
            ]

        self._do_tables = tbl("do-tables")
        self._ignore_tables = tbl("ignore-tables")

    def match_schema(self, schema: str) -> bool:
        if self._do_dbs:
            return any(p.search(schema) for p in self._do_dbs)
        return not any(p.search(schema) for p in self._ignore_dbs)

    def match_table(self, schema: str, table: str) -> bool:
        if not self.match_schema(schema):
            return False
        if self._do_tables:
            return any(
                dp.search(schema) and tp.search(table)
                for dp, tp in self._do_tables
            )
        return not any(
            dp.search(schema) and tp.search(table)
            for dp, tp in self._ignore_tables
        )


