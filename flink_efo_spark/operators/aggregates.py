"""Aggregate extensions (SURVEY §2.4).

* :func:`flat_aggregate` — the reference's table aggregate
  (``flatAggregate``: StreamExecGroupTableAggregate.scala,
  GroupTableAggFunction.java, TableAggregateFunction.java in
  /root/reference): a per-key aggregate that emits MULTIPLE rows.
  Spark realization: ``applyInPandas`` over the grouped data — the
  UDF sees the whole group as a pandas frame and returns any number
  of rows.

* :func:`collect_multiset` — Flink's COLLECT aggregate returns a
  MULTISET (element → count map; MultisetType.java). Spark has no
  multiset type; the faithful mapping (SURVEY §1.6) is a count-valued
  map via built-in expressions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flat_aggregate(
    df: DataFrame,
    keys: list[str],
    fn: Callable,
    output_schema,
) -> DataFrame:
    """Table aggregate: ``fn(pdf) -> pdf`` runs once per key group and
    may return multiple rows (e.g. a custom top-2 emitter — the
    reference's canonical flatAggregate example). Keys are included in
    the group frame; the output schema is the contract."""
    return df.groupBy(*keys).applyInPandas(fn, output_schema)


def collect_multiset(col: str) -> Column:
    """Flink COLLECT → MULTISET: map of element → occurrence count,
    all built-in expressions (fold over collect_list). ``col`` is a
    column name (the expression is assembled in SQL text)."""
    # type-generic: a fold needs a typed empty map; map_from_arrays
    # over the distinct elements works for any element type
    return F.expr(
        f"map_from_arrays(array_distinct(collect_list({col})), "
        f"transform(array_distinct(collect_list({col})), "
        f"x -> size(filter(collect_list({col}), y -> y = x))))"
    )
