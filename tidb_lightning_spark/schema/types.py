"""MySQL type -> Spark type mapping (SURVEY.md §1.3 table).

The value domain mirrors the reference's datum kinds
(lightning/backend/sql2kv.go:174-194) re-expressed as Spark SQL types:
flat relational scalars only — no nested types exist in the model.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class MySQLType:
    base: str  # normalized lowercase base name, e.g. 'int', 'varchar'
    length: int | None = None
    scale: int | None = None
    unsigned: bool = False
    members: tuple[str, ...] = ()  # enum/set members

    def spark_type(self) -> T.DataType:
        b = self.base
        if b == "tinyint":
            # tinyint(1) is MySQL's bool idiom; keep numeric for parity
            return T.ShortType() if self.unsigned else T.ByteType()
        if b == "smallint":
            return T.IntegerType() if self.unsigned else T.ShortType()
        if b in ("mediumint", "int", "integer"):
            return T.LongType() if self.unsigned else T.IntegerType()
        if b == "bigint":
            # UNSIGNED BIGINT must hold 2^64-1 losslessly -> DECIMAL(20,0)
            return T.DecimalType(20, 0) if self.unsigned else T.LongType()
        if b == "year":
            return T.IntegerType()
        if b == "float":
            return T.FloatType()
        if b in ("double", "real"):
            return T.DoubleType()
        if b in ("decimal", "numeric"):
            return T.DecimalType(self.length or 10, self.scale or 0)
        if b in ("char", "varchar", "tinytext", "text", "mediumtext", "longtext"):
            return T.StringType()
        if b in ("binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob"):
            return T.BinaryType()
        if b == "date":
            return T.DateType()
        if b == "datetime":
            # zone-naive in MySQL -> TIMESTAMP_NTZ
            return T.TimestampNTZType()
        if b == "timestamp":
            return T.TimestampType()
        if b == "time":
            # duration datum in the reference; kept textual 'H:MM:SS'
            return T.StringType()
        if b == "bit":
            # BIT(n<=64) as integer (reference keeps a binary literal;
            # integer keeps range checks and arithmetic simple)
            return T.LongType()
        if b in ("enum", "set", "json"):
            return T.StringType()
        raise ValueError(f"unsupported MySQL type: {self.base}")
