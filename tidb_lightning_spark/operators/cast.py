"""MySQL-semantics cast library (reference: table.CastValue at
lightning/backend/sql2kv.go:306-326 + SQL-mode flags session.go:186-204,
pinned by tests/sqlmode and tests/various_types — see FIXTURES.md F1/F3/F8).

Input columns are STRINGS (both CSV and SQL-dump parsers emit string
datums); this module produces typed columns per the table schema with
MySQL's non-strict coercions expressed as Catalyst expressions (no UDFs):

  * numerics: numeric-prefix extraction, round-half-up at the integer
    boundary, clamp to the type's range ('NaN' -> 0, 128 -> TINYINT 127,
    99.999 -> 100);
  * temporal: zero dates ('0000-00-00...') -> NULL (Spark has no zero
    date; the departure is documented in SURVEY.md §7), unparseable -> NULL;
  * CHAR/VARCHAR(n): truncate to n characters;
  * ENUM: member name or 1-based ordinal; invalid -> NULL ('' in MySQL);
  * SET: member list canonicalized to definition order with dedup, or a
    numeric bitmask; any invalid member -> NULL;
  * BIT(n): integer text or raw-byte string -> LongType;
  * BINARY/BLOB: utf-8 bytes for CSV text, latin-1 (byte-preserving, for
    hex literals) for SQL-dump values.

In strict mode each cast also contributes to an `_err` indicator used by
the pipeline to fail the load with row samples (the reference errors the
row at encode time).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidb_lightning_spark.schema.ddl import ColumnInfo

_NUM_PREFIX = r"^\s*([+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)"

_INT_BOUNDS = {
    "tinyint": (-128, 127, 0, 255),
    "smallint": (-32768, 32767, 0, 65535),
    "mediumint": (-8388608, 8388607, 0, 16777215),
    "int": (-2147483648, 2147483647, 0, 4294967295),
    "integer": (-2147483648, 2147483647, 0, 4294967295),
    "bigint": (-(2**63), 2**63 - 1, 0, 2**64 - 1),
    "year": (1901, 2155, 1901, 2155),
    "bit": (0, 2**63 - 1, 0, 2**63 - 1),
}


# MySQL LOAD DATA control escapes (reference mydump/parser.go:272-302:
# \\0 \\b \\n \\r \\t \\Z -> control char). The CSV lexer (univocity)
# already consumes the field-boundary escapes \\" and \\\\; the control
# sequences pass through as two literal chars and are restored here as part
# of the cast of string-family TARGET columns (numeric/temporal targets
# cannot legally hold control escapes, so fact-table hot paths pay nothing).
#
# FAST-PATH divergence vs the reference's one-pass lexer: data containing
# a LITERAL backslash immediately followed by one of 0bnrtZ (written \\\\n
# etc. in the file) is post-lexer indistinguishable from the escape
# sequence and round-trips as the control char; \\N / \\<other-letter> keep
# their backslash. Files whose sample shows doubled backslashes or doubled
# quotes are routed to the EXACT one-pass lexer instead
# (csv_source.needs_exact_dialect), which has none of these ambiguities.
MYSQL_CONTROL_UNESCAPES = [
    ("\\0", "\x00"),
    ("\\b", "\b"),
    ("\\n", "\n"),
    ("\\r", "\r"),
    ("\\t", "\t"),
    ("\\Z", "\x1a"),
    # backslash before a LITERAL newline inside a quoted field drops the
    # backslash (MySQL's unknown-escape rule; reference tests/csv
    # escapes row 2/3 carry \<LF> and \<CR> and expect the bare control)
    ("\\\n", "\n"),
    ("\\\r", "\r"),
]

STRING_FAMILY_BASES = {
    "char", "varchar", "text", "tinytext", "mediumtext", "longtext",
    "enum", "set", "json", "blob", "tinyblob", "mediumblob", "longblob",
    "binary", "varbinary",
}


def mysql_unescape_expr(col: Column) -> Column:
    """Chained literal replace (StringReplace works on UTF8String directly
    — regexp_replace pays a String conversion + Matcher allocation per
    call per row, measured ~6x this chain's cost), guarded by one
    contains() so rows without a backslash — essentially all real data —
    skip even the cheap chain."""
    u = col
    for pat, rep in MYSQL_CONTROL_UNESCAPES:
        u = F.replace(u, F.lit(pat), F.lit(rep))
    return F.when(col.contains("\\"), u).otherwise(col)


def _dec_lit(v: int) -> Column:
    return F.lit(str(v)).cast("decimal(38,9)")


def _num(col: Column) -> Column:
    """MySQL numeric-prefix parse: '99.9x' -> 99.9, junk -> 0.

    Fast path first: try_cast handles clean numerics entirely in codegen;
    coalesce short-circuits, so the regexp fallback only ever evaluates on
    rows that are actually dirty — the ingest hot loop stays regex-free.
    """
    fast = col.try_cast("decimal(38,9)")
    prefix = F.regexp_extract(col, _NUM_PREFIX, 1)
    slow = F.when(prefix == "", F.lit(0)).otherwise(prefix.cast("decimal(38,9)"))
    return F.coalesce(fast, slow)


def cast_column(
    col: Column, info: ColumnInfo, binary_encoding: str = "UTF-8"
) -> Column:
    """Non-strict MySQL cast of a string column to the schema type."""
    b = info.mysql.base
    spark_t = info.mysql.spark_type()

    if b in _INT_BOUNDS and b != "bit":
        lo_s, hi_s, lo_u, hi_u = _INT_BOUNDS[b]
        lo, hi = (lo_u, hi_u) if info.mysql.unsigned else (lo_s, hi_s)
        v = F.round(_num(col))  # MySQL rounds fractional inserts (99.999->100)
        # bounds as decimal literals: 2^64-1 exceeds a JVM long. greatest/
        # least skip NULLs in Spark, so gate on the input being non-null.
        v = F.least(F.greatest(v, _dec_lit(lo)), _dec_lit(hi))
        return F.when(col.isNull(), F.lit(None)).otherwise(v).cast(spark_t)

    if b in ("decimal", "numeric"):
        return _num(col).cast(spark_t)

    if b in ("float", "double", "real"):
        # parse DIRECTLY as double — the decimal(38,9) pipeline _num
        # uses for integer rounding cannot represent DOUBLE's range
        # (1e304 overflows it, 1e-305 rounds to 0; reference golden
        # tests/various_types vt.double caught both). MySQL semantics:
        # numeric-prefix parse, out-of-range saturates to ±DBL_MAX,
        # 'inf'/'nan' words are junk (no numeric prefix -> 0).
        # the saturation bound is the TARGET type's: a FLOAT column
        # clamps at ±FLT_MAX (MySQL stores 3.40282e38, never Infinity)
        import pyspark.sql.types as _T

        fmax = (
            3.4028234663852886e38
            if isinstance(spark_t, _T.FloatType)
            else 1.7976931348623157e308
        )
        wordy = col.rlike(r"(?i)^\s*[+-]?(inf|nan)")
        fast = F.when(~wordy, col.try_cast("double"))
        prefix = F.regexp_extract(col, _NUM_PREFIX, 1)
        sat = F.when(
            prefix.startswith("-"), F.lit(-fmax)
        ).otherwise(F.lit(fmax))
        slow = F.when(prefix == "", F.lit(0.0)).otherwise(
            F.coalesce(prefix.try_cast("double"), sat)
        )
        v = F.coalesce(fast, slow)
        v = (
            F.when(v > F.lit(fmax), F.lit(fmax))
            .when(v < F.lit(-fmax), F.lit(-fmax))
            .otherwise(v)
        )
        return F.when(col.isNull(), F.lit(None)).otherwise(v).cast(spark_t)

    if b == "date":
        return F.when(col.rlike(r"^0000-00-00"), F.lit(None)).otherwise(
            F.try_to_timestamp(col).cast(spark_t)
        )

    if b in ("datetime", "timestamp"):
        zero = col.rlike(r"^0000-00-00")
        tt = F.try_to_timestamp(col)
        # MySQL treats a bare DATETIME/TIMESTAMP as fsp=0 — fractional
        # seconds in the dump round half-up to whole seconds. The old
        # lossless-micros default for unspecified precision was a
        # checksum-visible parity gap (r12 ADVICE).
        p = info.mysql.length if info.mysql.length is not None else 0
        if 0 <= p < 6:
            # MySQL rounds fractional seconds to the column's declared
            # fsp half-up ('...45.842815' into TIMESTAMP(3) stores
            # .843 — reference golden tests/various_types vt.datetime).
            # floor((us + q/2)/q)*q via pmod = half-up at any sign.
            q = 10 ** (6 - p)
            shifted = F.unix_micros(tt) + F.lit(q // 2)
            tt = F.timestamp_micros(shifted - F.pmod(shifted, F.lit(q)))
        if b == "timestamp":
            # MySQL TIMESTAMP range is ['1970-01-01 00:00:01',
            # '2038-01-19 03:14:07.999999'] UTC — far narrower than
            # DATETIME's year 1000-9999. Out-of-range values are invalid
            # (strict errors, non-strict zeroes -> NULL here); reference
            # golden tests/checkpoint_error_destroy feeds
            # '1111-11-11 11:11:11' into TIMESTAMP NOT NULL and expects
            # the import to fail.
            us = F.unix_micros(tt)
            tt = F.when(
                (us >= F.lit(1_000_000))
                & (us <= F.lit(2147483647_999999)),
                tt,
            )
        return F.when(zero, F.lit(None)).otherwise(tt.cast(spark_t))

    if b in ("char", "varchar") and info.mysql.length:
        return F.substring(col, 1, info.mysql.length)

    if b == "enum":
        members = list(info.mysql.members)
        arr = F.array(*[F.lit(m) for m in members])
        idx = col.cast("int")
        by_ordinal = F.when(
            (idx >= 1) & (idx <= len(members)), F.element_at(arr, idx)
        )
        return (
            F.when(col.isNull(), F.lit(None))
            .when(col.rlike(r"^[0-9]+$"), by_ordinal)
            .when(F.array_contains(arr, col), col)
            .otherwise(F.lit(None))
        )

    if b == "set":
        members = list(info.mysql.members)
        arr = F.array(*[F.lit(m) for m in members])
        parts = F.split(col, ",")
        all_valid = F.forall(parts, lambda x: F.array_contains(arr, x))
        canonical = F.array_join(F.array_intersect(arr, parts), ",")
        # MySQL dumps emit 64-member SET masks as UNSIGNED decimals: a
        # value >= 2^63 (bit 63 set) fails a signed long cast. Route
        # through decimal(20,0) and fold to signed two's-complement so
        # bitwiseAND still tests the 64th member (r12 ADVICE).
        dec = col.try_cast("decimal(20,0)")
        _two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
        _two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
        mask = F.when(dec >= _two63, (dec - _two64).cast("long")).otherwise(
            dec.cast("long")
        )
        from_mask = F.concat_ws(
            ",",
            *[
                # bit 63 (a full 64-member SET, MySQL's max) doesn't fit
                # an unsigned py4j long literal: pass its SIGNED two's-
                # complement form — bitwiseAND on the signed lane tests
                # the same bit (reference golden vt.`enum-set` caught the
                # overflow at plan-construction time)
                F.when(
                    mask.bitwiseAND(
                        F.lit((1 << i) if i < 63 else -(1 << 63))
                    )
                    != 0,
                    F.lit(m),
                )
                for i, m in enumerate(members)
            ],
        )
        return (
            F.when(col.isNull(), F.lit(None))
            .when(col == "", F.lit(""))
            .when(col.rlike(r"^[0-9]+$"), from_mask)
            .when(all_valid, canonical)
            .otherwise(F.lit(None))
        )

    if b == "bit":
        raw_bytes = F.encode(col, "ISO-8859-1")
        from_bytes = F.conv(F.hex(raw_bytes), 16, 10).cast("long")
        return (
            F.when(col.isNull(), F.lit(None))
            .when(col.rlike(r"^[0-9]+$"), col.cast("long"))
            .otherwise(from_bytes)
        )

    if isinstance(spark_t, T.BinaryType):
        return F.encode(col, binary_encoding)

    if b == "time":
        return F.when(
            col.rlike(r"^-?\d{1,3}:\d{1,2}:\d{1,2}(\.\d+)?$"), col
        ).otherwise(F.lit(None))

    if b == "json":
        return col  # validated string pass-through

    return col.cast(spark_t)


_NUMERIC_SPARK_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def cast_typed_column(col: Column, src_type: T.DataType, info: ColumnInfo) -> Column:
    """MySQL-semantics cast of an already-typed (parquet) column.

    A plain Catalyst cast WRAPS on integer narrowing under non-ANSI
    semantics (int64 3000000000 into INT silently becomes a negative),
    which neither MySQL mode does: strict errors, non-strict clamps to the
    type boundary (the reference's CastValue, sql2kv.go:306-326). Numeric
    sources therefore go through the same round+clamp as the string path's
    `_num` pipeline; string sources reuse `cast_column` wholesale.
    """
    b = info.mysql.base
    spark_t = info.mysql.spark_type()
    if isinstance(src_type, T.StringType):
        return cast_column(col, info)
    if (
        b in _INT_BOUNDS
        and b != "bit"
        and isinstance(src_type, _NUMERIC_SPARK_TYPES)
    ):
        lo_s, hi_s, lo_u, hi_u = _INT_BOUNDS[b]
        lo, hi = (lo_u, hi_u) if info.mysql.unsigned else (lo_s, hi_s)
        v = F.round(col.try_cast("decimal(38,9)"))
        # a double beyond decimal(38,9) range nulls the try_cast: clamp by
        # sign (MySQL saturates at the type boundary)
        v = F.coalesce(
            v, F.when(col > 0, _dec_lit(hi)).otherwise(_dec_lit(lo))
        )
        v = F.least(F.greatest(v, _dec_lit(lo)), _dec_lit(hi))
        return F.when(col.isNull(), F.lit(None)).otherwise(v).cast(spark_t)
    if (
        b in ("char", "varchar")
        and info.mysql.length
        and not isinstance(spark_t, T.BinaryType)
    ):
        return F.substring(col.cast("string"), 1, info.mysql.length)
    return col.cast(spark_t)


def typed_violation_flag(
    col: Column, casted: Column, info: ColumnInfo, src_type: T.DataType
) -> Column:
    """Strict-mode indicator for typed (parquet) input — boolean fragment;
    the caller owns NULL-into-NOT-NULL / missing-column policy. Mirrors
    `violation_flag`'s range and length checks so a negative value into an
    unsigned column or an overlong string is flagged exactly like on the
    CSV path (reference encode-path parity)."""
    if isinstance(src_type, T.StringType):
        return _string_lossy_flag(col, casted, info)
    flag = col.isNotNull() & casted.isNull()
    b = info.mysql.base
    if (
        b in _INT_BOUNDS
        and b != "bit"
        and isinstance(src_type, _NUMERIC_SPARK_TYPES)
    ):
        lo_s, hi_s, lo_u, hi_u = _INT_BOUNDS[b]
        lo, hi = (lo_u, hi_u) if info.mysql.unsigned else (lo_s, hi_s)
        v = col.try_cast("decimal(38,9)")
        oob = v.isNull() | (v < _dec_lit(lo)) | (v > _dec_lit(hi))
        flag = flag | (col.isNotNull() & oob)
    if b in ("char", "varchar") and info.mysql.length:
        flag = flag | (F.length(col.cast("string")) > info.mysql.length)
    return flag


def _string_lossy_flag(col: Column, casted: Column, info: ColumnInfo) -> Column:
    """Lossy-input checks for string sources (boolean; excludes the
    NULL-into-NOT-NULL clause, which is policy layered on top)."""
    flag = col.isNotNull() & casted.isNull()
    b = info.mysql.base
    if b in _INT_BOUNDS or b in ("decimal", "numeric", "float", "double", "real"):
        parsed = F.regexp_extract(col, _NUM_PREFIX, 1)
        full = F.regexp_extract(col, _NUM_PREFIX + r"\s*$", 1)
        flag = flag | (col.isNotNull() & ((parsed == "") | (full == "")))
        if b in _INT_BOUNDS:
            lo_s, hi_s, lo_u, hi_u = _INT_BOUNDS[b]
            lo, hi = (
                (lo_u, hi_u) if info.mysql.unsigned else (lo_s, hi_s)
            )
            v = _num(col)
            flag = flag | (
                col.isNotNull() & ((v < _dec_lit(lo)) | (v > _dec_lit(hi)))
            )
    if b in ("char", "varchar") and info.mysql.length:
        flag = flag | (F.length(col) > info.mysql.length)
    return flag


def violation_flag(col: Column, casted: Column, info: ColumnInfo) -> Column:
    """Strict-mode indicator: input the cast would lose data on
    (zero-date, bad enum/set, out-of-range, overlong, null into NOT NULL)."""
    flag = _string_lossy_flag(col, casted, info)
    if not info.nullable:
        flag = flag | col.isNull()
    return F.when(flag, F.lit(info.name)).otherwise(F.lit(None))
