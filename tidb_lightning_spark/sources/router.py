"""File routing: map a source-dir path to (schema, table, type, key, compression).

Re-expresses the reference's regex router (lightning/mydump/router.go:110-344):
  * rules are tried in order; first match wins;
  * each rule has a `pattern` (regex, searched — default rules self-anchor)
    or a `path` (exact string);
  * fields (schema/table/type/key/compression) are templates over the
    pattern's capture groups: ``$1``, ``${name}``, ``$$`` for a literal $;
  * the default Mydumper rules recognize
    ``{db}-schema-create.sql``, ``{db}.{tbl}-schema.sql``,
    ``{db}.{tbl}-schema-view.sql``, ``{db}.{tbl}[.{key}].{sql|csv|parquet|jsonl}`` (jsonl is a
    beyond-reference addition: the LLM-corpus dump format)
    and ignore trigger/post schema files.

Departure from the reference: compressed data files (.gz/.zst/...) are
*accepted* (router.go:256-273 rejects them) because Spark's readers
decompress these codecs natively (SURVEY.md §2.A9); non-splittable codecs
simply yield one task per file.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

FILE_TYPES = {
    "schema-schema",
    "table-schema",
    "view-schema",
    "sql",
    "csv",
    "parquet",
    "jsonl",
    "ignore",
}

# normalized codec names; gzip/zst are accepted aliases (router.go:88-103)
COMPRESSIONS = {
    "": "", "gz": "gz", "gzip": "gz", "lz4": "lz4",
    "zst": "zstd", "zstd": "zstd", "xz": "xz", "snappy": "snappy",
}

# Default Mydumper filename conventions (router.go:107-128).
DEFAULT_FILE_RULES: list[dict] = [
    {"pattern": r"(?i).*(-schema-trigger|-schema-post)\.sql$", "type": "ignore"},
    {
        "pattern": r"(?i)^(?:[^/]*/)*([^/.]+)-schema-create\.sql$",
        "schema": "$1",
        "table": "",
        "type": "schema-schema",
    },
    {
        "pattern": r"(?i)^(?:[^/]*/)*([^/.]+)\.(.*?)-schema\.sql$",
        "schema": "$1",
        "table": "$2",
        "type": "table-schema",
    },
    {
        "pattern": r"(?i)^(?:[^/]*/)*([^/.]+)\.(.*?)-schema-view\.sql$",
        "schema": "$1",
        "table": "$2",
        "type": "view-schema",
    },
    {
        "pattern": r"(?i)^(?:[^/]*/)*([^/.]+)\.(.*?)(?:\.([0-9]+))?\.(sql|csv|parquet|jsonl)(?:\.(\w+))?$",
        "schema": "$1",
        "table": "$2",
        "type": "$4",
        "key": "$3",
        "compression": "$5",
    },
]

# Go regexp.Expand reference syntax: $$ literal, ${name}, or $name where
# name is the LONGEST run of word chars — so `$1_` is the (nonexistent)
# name "1_", never group 1 plus a literal underscore
# (router_test.go:187-228 pins both the expansions and the rejections)
_VAR = re.compile(r"\$(?:(\$)|\{(\w+)\}|([A-Za-z0-9_]+))")


@dataclass(frozen=True)
class RouteResult:
    schema: str
    name: str
    type: str
    key: str = ""
    compression: str = ""


def _expand(template: str, m: re.Match) -> str:
    """Go regexp.Expand semantics: $1 / $name / ${name}; a valid group
    that didn't participate in the match -> ''."""

    def sub(v: re.Match) -> str:
        if v.group(1):
            return "$"
        ref = v.group(2) or v.group(3)
        try:
            idx = int(ref)
        except ValueError:
            idx = ref
        try:
            return m.group(idx) or ""
        except (IndexError, re.error):
            return ""

    return _VAR.sub(sub, template)


def _validate_template(tmpl: str, regex: re.Pattern, field: str) -> None:
    """Build-time reference check (NewFileRouter, mydump/router.go —
    router_test.go:31-40,57-63,223-228): every $ref in a route template
    must name a real capture group; `$6` past the group count and
    `$schema` with no (?P<schema>...) are config errors at startup,
    never silently-empty expansions."""
    for v in _VAR.finditer(tmpl):
        if v.group(1):
            continue  # $$ literal
        ref = v.group(2) or v.group(3)
        if ref.isdigit():
            if int(ref) > regex.groups:
                raise ValueError(
                    f"invalid capture group index '${ref}' in field "
                    f"{field!r} (pattern has {regex.groups} groups)"
                )
        elif ref not in regex.groupindex:
            raise ValueError(f"invalid named capture '${ref}' in field {field!r}")


class _Rule:
    def __init__(self, raw: dict):
        pattern = raw.get("pattern", "")
        path = raw.get("path", "")
        if bool(pattern) == bool(path):
            raise ValueError(
                "`path` and `pattern`: exactly one must be set in [[mydumper.files]]"
            )
        if path:
            pattern = re.escape(path)
            esc = lambda t: t.replace("$", "$$")  # noqa: E731
            raw = {
                **raw,
                "schema": esc(raw.get("schema", "")),
                "table": esc(raw.get("table", "")),
                "type": esc(raw.get("type", "")),
                "key": esc(raw.get("key", "")),
                "compression": esc(raw.get("compression", "")),
            }
        self.regex = re.compile(pattern)
        self.type_tmpl = raw.get("type", "")
        if not self.type_tmpl:
            raise ValueError("field 'type' match pattern can't be empty")
        self.schema_tmpl = raw.get("schema", "")
        self.table_tmpl = raw.get("table", "")
        self.key_tmpl = raw.get("key", "")
        self.compression_tmpl = raw.get("compression", "")
        if self.type_tmpl != "ignore":
            if not self.schema_tmpl:
                raise ValueError("field 'schema' match pattern can't be empty")
            if self.type_tmpl != "schema-schema" and raw.get("table") is None:
                raise ValueError("field 'table' match pattern can't be empty")
        for fname, tmpl in (
            ("type", self.type_tmpl),
            ("schema", self.schema_tmpl),
            ("table", self.table_tmpl),
            ("key", self.key_tmpl),
            ("compression", self.compression_tmpl),
        ):
            _validate_template(tmpl, self.regex, fname)

    def route(self, path: str) -> RouteResult | None:
        m = self.regex.search(path)
        if m is None:
            return None
        ftype = _expand(self.type_tmpl, m).strip().lower()
        if ftype not in FILE_TYPES:
            raise ValueError(f"unknown source type '{ftype}' for path {path!r}")
        if ftype == "ignore":
            return RouteResult("", "", "ignore")
        schema = _expand(self.schema_tmpl, m)
        table = "" if ftype == "schema-schema" else _expand(self.table_tmpl, m)
        key = _expand(self.key_tmpl, m) if self.key_tmpl else ""
        comp = (
            _expand(self.compression_tmpl, m).strip().lower()
            if self.compression_tmpl
            else ""
        )
        if comp not in COMPRESSIONS:
            raise ValueError(f"invalid compression type '{comp}'")
        return RouteResult(schema, table, ftype, key, COMPRESSIONS[comp])


@dataclass
class FileRouter:
    rules: list[_Rule] = field(default_factory=list)

    @classmethod
    def build(
        cls, custom_rules: list[dict] | None = None, default_rules: bool = True
    ) -> "FileRouter":
        raws = list(custom_rules or [])
        if default_rules:
            raws += DEFAULT_FILE_RULES
        return cls([_Rule(r) for r in raws])

    def route(self, path: str) -> RouteResult | None:
        """First matching rule wins; None -> file not recognized."""
        for rule in self.rules:
            res = rule.route(path)
            if res is not None:
                return res
        return None
