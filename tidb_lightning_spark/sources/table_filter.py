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
