"""Flink-style fluent Table API shim over DataFrames.

Mirrors the PyFlink ``Table`` surface (/root/reference
flink-python/pyflink/table/table.py — select:68, filter:106, where:123,
group_by:140, distinct:157, join:171, left_outer_join:200, minus:330,
minus_all:353, union:377, union_all:398, intersect:419,
intersect_all:443, order_by:467, offset:484, fetch:507,
add_columns:605, rename_columns:642, drop_columns:659) on top of the
Spark DataFrame — each method is a 1:1 delegation, so plans stay fully
Catalyst-optimizable; ``to_df()`` exits to raw PySpark at any point.

Expressions are Spark SQL strings or Columns — the engine does not
re-implement Flink's expression DSL (Spark SQL is the expression
language here, same operator set per SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Table:
    """Fluent wrapper; immutable — every call returns a new Table."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- exits ---------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self._df

    def execute(self):
        """Collect (PyFlink's execute().collect() analog)."""
        return self._df.collect()

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    # -- projection / filter ------------------------------------------
    def select(self, *exprs: str | Column) -> "Table":
        return Table(self._df.selectExpr(*exprs) if _all_str(exprs)
                     else self._df.select(*exprs))

    def filter(self, predicate: str | Column) -> "Table":
        return Table(self._df.filter(predicate))

    where = filter

    def add_columns(self, **named_exprs: str | Column) -> "Table":
        df = self._df
        for name, e in named_exprs.items():
            df = df.withColumn(name, F.expr(e) if isinstance(e, str) else e)
        return Table(df)

    def rename_columns(self, **renames: str) -> "Table":
        df = self._df
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return Table(df)

    def drop_columns(self, *cols: str) -> "Table":
        return Table(self._df.drop(*cols))

    # -- aggregation ---------------------------------------------------
    def group_by(self, *cols: str | Column) -> "GroupedTable":
        return GroupedTable(self._df, list(cols))

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    # -- joins ---------------------------------------------------------
    def join(self, right: "Table", on: str | Column | list | None = None,
             how: str = "inner") -> "Table":
        on_ = F.expr(on) if isinstance(on, str) else on
        return Table(self._df.join(right._df, on_, how))

    def left_outer_join(self, right: "Table", on=None) -> "Table":
        return self.join(right, on, "left")

    def right_outer_join(self, right: "Table", on=None) -> "Table":
        return self.join(right, on, "right")

    def full_outer_join(self, right: "Table", on=None) -> "Table":
        return self.join(right, on, "full")

    # -- set operations ------------------------------------------------
    def union(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df))

    def minus(self, other: "Table") -> "Table":
        return Table(self._df.subtract(other._df))

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df))

    # -- sort / limit --------------------------------------------------
    def order_by(self, *cols: str | Column) -> "Table":
        return Table(self._df.orderBy(*[_sort_col(c) for c in cols]))

    def offset(self, n: int) -> "Table":
        return Table(self._df.offset(n))

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    def limit(self, n: int, offset: int = 0) -> "Table":
        df = self._df.offset(offset) if offset else self._df
        return Table(df.limit(n))


class GroupedTable:
    """Result of ``group_by`` — ``select`` evaluates aggregates
    (PyFlink GroupedTable.select semantics)."""

    def __init__(self, df: DataFrame, keys: list):
        self._df = df
        self._keys = keys

    def select(self, *aggs: str | Column) -> Table:
        aggs_ = [F.expr(a) if isinstance(a, str) else a for a in aggs]
        return Table(self._df.groupBy(*self._keys).agg(*aggs_))


def _all_str(xs) -> bool:
    return all(isinstance(x, str) for x in xs)


def _sort_col(c: str | Column) -> Column:
    """Parse 'expr [ASC|DESC]' sort strings — F.expr alone would read
    the direction keyword as a column alias (silently sorting asc)."""
    if not isinstance(c, str):
        return c
    s = c.strip()
    low = s.lower()
    if low.endswith(" desc"):
        return F.expr(s[:-5]).desc()
    if low.endswith(" asc"):
        return F.expr(s[:-4]).asc()
    return F.expr(s)
