"""LogicalType → Spark type mapping + the two enforcement gaps.

Reference: the SQL-standard logical type system of
flink-table-common/.../types/logical/ (LogicalType.java:56,
LogicalTypeRoot.java:52 in /root/reference) maps onto Spark types
almost 1:1 (SURVEY §1.6). Two roots need engine-level logic because
Spark has no equivalent:

* **TIME(p)** (TimeType.java) — Spark has no time-of-day type; the
  engine's convention is ``int`` millis-of-day (exactly Flink's
  internal representation for TIME, which stores millis-of-day in an
  int — TimestampData.java:40 neighborhood).
* **CHAR(n)/VARCHAR(n) length** (CharType.java, VarCharType.java) —
  Spark's StringType is unbounded; the reference enforces/pads
  declared lengths at sink boundaries. ``enforce_char`` /
  ``enforce_varchar`` reproduce that contract as narrow Catalyst
  expressions (rpad / substring — codegen, no Python).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# LogicalTypeRoot (LogicalTypeRoot.java:52) → Spark DataType factory.
# Parameterized types take (precision, scale) / (length) args.
_SIMPLE: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    # TIMESTAMP WITH LOCAL TIME ZONE — Spark's TimestampType IS
    # local-tz-instant semantics (LocalZonedTimestampType.java)
    "TIMESTAMP_LTZ": T.TimestampType(),
    "STRING": T.StringType(),
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
    "BYTES": T.BinaryType(),
    # TIME(p) → int millis-of-day (engine convention, see module doc)
    "TIME": T.IntegerType(),
    # INTERVAL roots (YearMonthIntervalType / DayTimeIntervalType)
    "INTERVAL_YEAR_MONTH": T.YearMonthIntervalType(),
    "INTERVAL_DAY_SECOND": T.DayTimeIntervalType(),
    "NULL": T.NullType(),
}


def flink_type_to_spark(name: str) -> T.DataType:
    """Resolve a Flink SQL type NAME (DDL string form) to the Spark
    DataType the engine uses for it. Handles parameterized forms:
    ``DECIMAL(p,s)``, ``CHAR(n)``, ``VARCHAR(n)``, ``ARRAY<t>``,
    ``MAP<k,v>``, ``MULTISET<t>``, ``ROW<a t, b t>``."""
    s = name.strip()
    up = s.upper()
    if up in _SIMPLE:
        return _SIMPLE[up]
    m = re.fullmatch(r"DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", up)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"(?:CHAR|VARCHAR)\s*\(\s*\d+\s*\)", up)
    if m:
        # length is an engine-level check (enforce_char/enforce_varchar)
        return T.StringType()
    m = re.fullmatch(r"ARRAY\s*<(.+)>", s, re.IGNORECASE | re.DOTALL)
    if m:
        return T.ArrayType(flink_type_to_spark(m.group(1)))
    m = re.fullmatch(r"MULTISET\s*<(.+)>", s, re.IGNORECASE | re.DOTALL)
    if m:
        # MULTISET<t> → MAP<t, INT> element→count (what Flink's COLLECT
        # produces; operators/aggregates.py collect_multiset)
        return T.MapType(flink_type_to_spark(m.group(1)), T.IntegerType())
    m = re.fullmatch(r"MAP\s*<(.+),(.+)>", s, re.IGNORECASE | re.DOTALL)
    if m:
        return T.MapType(
            flink_type_to_spark(m.group(1)), flink_type_to_spark(m.group(2))
        )
    m = re.fullmatch(r"ROW\s*<(.+)>", s, re.IGNORECASE | re.DOTALL)
    if m:
        fields = []
        for part in m.group(1).split(","):
            fname, ftype = part.strip().split(None, 1)
            fields.append(T.StructField(fname, flink_type_to_spark(ftype)))
        return T.StructType(fields)
    raise ValueError(f"unsupported Flink type: {name!r}")


# -- TIME(p) helpers (int millis-of-day convention) ----------------------


def time_of_day_millis(ts_col) -> Column:
    """Extract TIME-of-day (millis since midnight, int) from a
    timestamp — the engine's TIME(3) representation."""
    c = ts_col if isinstance(ts_col, Column) else F.col(ts_col)
    micros = F.unix_micros(c.cast("timestamp"))
    return ((micros % (86400 * 1_000_000)) / 1000).cast("int")


def time_millis_to_string(col) -> Column:
    """Render an int millis-of-day TIME value as 'HH:mm:ss.SSS'."""
    c = col if isinstance(col, Column) else F.col(col)
    h = F.lpad((c / 3_600_000).cast("int").cast("string"), 2, "0")
    m = F.lpad(((c % 3_600_000) / 60_000).cast("int").cast("string"), 2, "0")
    s = F.lpad(((c % 60_000) / 1000).cast("int").cast("string"), 2, "0")
    ms = F.lpad((c % 1000).cast("int").cast("string"), 3, "0")
    return F.concat_ws(":", h, m, F.concat(s, F.lit("."), ms))


# -- CHAR/VARCHAR length enforcement -------------------------------------


def enforce_char(df: DataFrame, col: str, length: int) -> DataFrame:
    """CHAR(n) sink contract (CharType.java): pad shorter strings
    with spaces to exactly n, truncate longer ones. Narrow Catalyst
    expression (rpad handles both directions)."""
    return df.withColumn(col, F.rpad(F.col(col), length, " "))


def enforce_varchar(
    df: DataFrame, col: str, length: int, error: bool = False
) -> DataFrame:
    """VARCHAR(n) sink contract (VarCharType.java): truncate to n
    (default, the reference sink behavior) or raise on overflow when
    ``error=True`` (strict mode — raise_error stays JVM-side)."""
    c = F.col(col)
    if error:
        return df.withColumn(
            col,
            F.when(
                F.length(c) > length,
                F.raise_error(
                    F.concat(
                        F.lit(f"VARCHAR({length}) overflow: "), F.substring(c, 1, 40)
                    )
                ),
            ).otherwise(c),
        )
    return df.withColumn(col, F.substring(c, 1, length))
