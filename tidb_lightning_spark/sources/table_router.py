"""Shard-merge table routing (reference: tidb-tools table-router driving
lightning/mydump/loader.go:340-416, test tests/routes/).

A rule maps source ``(schema, table)`` — both wildcard patterns — to a
fixed target ``(schema, table)``. First matching rule wins; no match ->
identity. Many source shards routing to one target merge into a single
table (their DataFrames union at read time).
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass


@dataclass(frozen=True)
class RouteRule:
    schema_pattern: str
    table_pattern: str
    target_schema: str
    target_table: str


class TableRouter:
    def __init__(self, rules: list[dict], case_sensitive: bool = False):
        flags = 0 if case_sensitive else re.IGNORECASE
        self._rules = [
            (
                re.compile(fnmatch.translate(r["schema-pattern"]), flags),
                re.compile(fnmatch.translate(r.get("table-pattern", "*")), flags),
                r["target-schema"],
                r.get("target-table", ""),
            )
            for r in rules
        ]

    def route(self, schema: str, table: str) -> tuple[str, str]:
        for sp, tp, target_schema, target_table in self._rules:
            if sp.match(schema) and (not table or tp.match(table)):
                # empty table-pattern targets keep the source table name
                # (schema-only routing)
                return target_schema, (target_table or table) if table else ""
        return schema, table
