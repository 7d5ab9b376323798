"""Flink SQL scalar-function surface re-expressed over PySpark.

See SURVEY.md §2.10: the reference's function catalog is
``FlinkSqlOperatorTable.java`` (Calcite standard operators + Flink
extensions); almost everything exists in ``pyspark.sql.functions``
under the same name. This package provides the residue — Flink
functions with no same-name Spark builtin — as *native column
expression compositions* (JVM-side, codegen-able; never row-at-a-time
Python UDFs).
"""

from flink_efo_spark.functions.flink_fns import (
    char_length,
    from_base64,
    hash_code,
    if_,
    is_alpha,
    is_decimal,
    is_digit,
    listagg,
    log2,
    parse_url,
    proctime,
    rand_integer,
    regexp,
    split_index,
    str_to_map,
    to_base64,
    truncate,
)

__all__ = [
    "split_index",
    "is_alpha",
    "is_digit",
    "is_decimal",
    "if_",
    "hash_code",
    "listagg",
    "truncate",
    "log2",
    "regexp",
    "str_to_map",
    "parse_url",
    "to_base64",
    "from_base64",
    "char_length",
    "proctime",
    "rand_integer",
]
