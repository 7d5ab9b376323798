"""Flink-named scalar functions that lack a same-name Spark builtin.

Each is a composition of built-in ``pyspark.sql.functions`` — stays
inside WholeStageCodegen, vectorizes, and needs no Python at runtime.
Reference catalog: FlinkSqlOperatorTable.java lines 114-830 (Flink
extensions) in /root/reference; runtime semantics from
SqlFunctionUtils.java / SqlDateTimeUtils.java (see SURVEY.md §2.10 for
the full name-by-name mapping — functions present in Spark under the
same name are intentionally NOT wrapped here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def split_index(col, delimiter: str, index: int) -> Column:
    """Flink SPLIT_INDEX(str, delim, idx) — idx is 0-based; NULL when
    out of range (matches SqlFunctionUtils.splitIndex)."""
    return F.get(F.split(_col(col), F.lit(delimiter), -1), index)


def is_alpha(col) -> Column:
    """Flink IS_ALPHA: true iff non-empty and all chars are letters."""
    return _col(col).rlike("^[a-zA-Z]+$")


def is_digit(col) -> Column:
    """Flink IS_DIGIT: true iff non-empty and all chars are digits."""
    return _col(col).rlike("^[0-9]+$")


def is_decimal(col) -> Column:
    """Flink IS_DECIMAL: parseable as a decimal number."""
    return _col(col).rlike(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")


def if_(cond, then, otherwise) -> Column:
    """Flink IF(cond, a, b)."""
    return F.when(_col(cond), then).otherwise(otherwise)


def hash_code(col) -> Column:
    """Flink HASH_CODE(str) → Spark murmur3 hash (different constant
    than Java's String.hashCode, same capability)."""
    return F.hash(_col(col))


def listagg(col, sep: str = ",", distinct: bool = False, sort: bool = True) -> Column:
    """Flink LISTAGG(x [, sep]) aggregate. Sorted for determinism —
    Flink's emission order is arrival order, which is not reproducible
    in a distributed shuffle; sorted output is the deterministic
    superset behavior."""
    c = _col(col)
    collected = F.collect_set(c) if distinct else F.collect_list(c)
    if sort:
        collected = F.sort_array(collected)
    return F.array_join(collected, sep)


def truncate(col, places: int = 0) -> Column:
    """Flink TRUNCATE(x, n): truncate toward zero at n decimal places."""
    c = _col(col)
    factor = F.lit(float(10**places))
    return F.when(c >= 0, F.floor(c * factor) / factor).otherwise(
        -(F.floor(-c * factor) / factor)
    )


def log2(col) -> Column:
    return F.log2(_col(col))


def regexp(col, pattern: str) -> Column:
    """Flink REGEXP(str, pattern) — partial-match predicate."""
    return _col(col).rlike(pattern)


def str_to_map(col, pair_delim: str = ",", kv_delim: str = "=") -> Column:
    return F.str_to_map(_col(col), F.lit(pair_delim), F.lit(kv_delim))


def parse_url(col, part: str, key: str | None = None) -> Column:
    if key is None:
        return F.parse_url(_col(col), F.lit(part))
    return F.parse_url(_col(col), F.lit(part), F.lit(key))


def to_base64(col) -> Column:
    return F.base64(_col(col))


def from_base64(col) -> Column:
    return F.unbase64(_col(col))


def char_length(col) -> Column:
    return F.length(_col(col))


def proctime() -> Column:
    """Flink PROCTIME() — processing-time attribute. In Spark's
    micro-batch model this is the batch-local current timestamp."""
    return F.current_timestamp()


def rand_integer(bound: int, seed: int | None = None) -> Column:
    """Flink RAND_INTEGER(bound) — uniform int in [0, bound)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * bound).cast("int")
