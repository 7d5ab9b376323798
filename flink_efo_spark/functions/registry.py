"""SQL-name registry: make Flink-named functions callable from
``spark.sql(...)`` strings.

The reference registers functions through
TableEnvironmentImpl.java:345 ``registerFunction`` /
:352 ``createTemporarySystemFunction`` (/root/reference). Here, names
that Spark already has (SURVEY.md §2.10 left column ≈ right column)
need nothing; the Flink-only names are registered as SQL expressions
via a tiny preprocessor-free trick: Spark SQL macros are not a thing,
so we register them with ``spark.sql("CREATE TEMPORARY FUNCTION")``
only where a pure-SQL lambda exists, else leave them Python-API-only
(flink_fns module). No row-at-a-time Python UDFs are registered —
keeping spark.sql the fast path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Flink name -> Spark SQL expression template (args $0, $1, ...)
_SQL_EQUIVALENTS: dict[str, str] = {
    "SPLIT_INDEX": "get(split($0, $1, -1), $2)",
    "IS_ALPHA": "$0 rlike '^[a-zA-Z]+$'",
    "IS_DIGIT": "$0 rlike '^[0-9]+$'",
    "HASH_CODE": "hash($0)",
    "LOG2": "log2($0)",
    "TO_BASE64": "base64($0)",
    "FROM_BASE64": "unbase64($0)",
}


def register_all(spark: SparkSession) -> None:
    """Idempotent registration hook called by EfoSession.

    Spark has no CREATE FUNCTION ... AS <sql-expr> for temporary
    expression macros, so SQL-string users get the mapping table via
    :func:`sql_equivalent`; DataFrame users import flink_fns. This
    hook stays for future server-side registration (e.g. if a
    SQL-macro mechanism lands) and to keep EfoSession's contract
    stable.
    """
    # intentionally no Python UDF registration — see module docstring
    return None


def sql_equivalent(flink_name: str) -> str | None:
    """Return the Spark SQL expression template for a Flink-only
    function name, or None if Spark has it under the same name."""
    return _SQL_EQUIVALENTS.get(flink_name.upper())
