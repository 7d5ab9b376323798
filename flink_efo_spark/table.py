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

import re

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

    def to_pandas(self):
        """PyFlink Table.to_pandas:699 — Arrow-batched driver
        collection. Driver-memory bound; harness/exploration use."""
        return self._df.toPandas()

    def get_schema(self):
        """PyFlink Table.get_schema:739 analog (Spark StructType)."""
        return self._df.schema

    def print_schema(self) -> None:
        """PyFlink Table.print_schema:748."""
        self._df.printSchema()

    def execute_insert(self, path: str, overwrite: bool = False):
        """PyFlink Table.execute_insert:754 — write to a registered
        path/table (parquet directory here; the engine's filesystem
        sink)."""
        mode = "overwrite" if overwrite else "append"
        self._df.write.mode(mode).parquet(path)

    insert_into = execute_insert

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

    def add_or_replace_columns(self, **named_exprs: str | Column) -> "Table":
        """PyFlink Table.add_or_replace_columns:623 — same as
        add_columns but an existing column of the same name is
        replaced (withColumn already has exactly that semantics)."""
        return self.add_columns(**named_exprs)

    def rename_columns(self, **renames: str) -> "Table":
        df = self._df
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return Table(df)

    def alias(self, *names: str) -> "Table":
        """PyFlink Table.alias:85 — positional rename of ALL columns."""
        if len(names) != len(self._df.columns):
            raise ValueError(
                f"alias() needs {len(self._df.columns)} names, got {len(names)}"
            )
        return Table(self._df.toDF(*names))

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

    # -- group windows (PyFlink table.window:534) ----------------------
    def window(self, descriptor: "GroupWindowDescriptor") -> "GroupWindowedTable":
        """Attach a Tumble/Slide/Session group-window descriptor
        (PyFlink Table.window, flink-python/pyflink/table/table.py:534;
        window descriptors in pyflink/table/window.py). Follow with
        ``.group_by(...)`` including the window alias, then
        ``.select(...)`` where ``<alias>.start`` / ``<alias>.end`` are
        the window bounds."""
        return GroupWindowedTable(self._df, descriptor)

    # -- over windows (PyFlink table.over_window:571) ------------------
    def over_window(self, descriptor: "Over") -> "OverWindowedTable":
        """Attach an OVER-window descriptor; ``select`` exprs may use
        ``agg(x) over <alias>`` which is rewritten to the full SQL
        OVER clause. Mirrors PyFlink Table.over_window (table.py:571,
        descriptor in pyflink/table/window.py Over)."""
        return OverWindowedTable(self._df, descriptor)

    # -- lateral joins (PyFlink table.join_lateral:279) ----------------
    def join_lateral(self, udtf_expr: str, how: str = "inner") -> "Table":
        """Correlate each row with a generator/table-function call
        (PyFlink Table.join_lateral:279 / left_outer_join_lateral:304,
        backed by StreamExecCorrelate.scala:46). ``udtf_expr`` is
        ``"fn(args) as t(c1, c2, ...)"`` (alias optional for
        single-column generators). Planned as Catalyst ``Generate`` —
        a narrow per-row expansion, no shuffle, safe at any scale."""
        fn_part, alias, cols = _parse_udtf(udtf_expr)
        spark = self._df.sparkSession
        view = f"__lateral_{abs(hash(udtf_expr)) % 10**8}"
        self._df.createOrReplaceTempView(view)
        outer = "OUTER " if how in ("left", "left_outer") else ""
        as_cols = f" AS {', '.join(cols)}" if cols else ""
        sql = (
            f"SELECT * FROM {view} "
            f"LATERAL VIEW {outer}{fn_part} {alias or 't'}{as_cols}"
        )
        return Table(spark.sql(sql))

    def left_outer_join_lateral(self, udtf_expr: str) -> "Table":
        return self.join_lateral(udtf_expr, how="left_outer")

    # -- temporal table function (Java Table API parity) ---------------
    def create_temporal_table_function(
        self, time_attr: str, primary_key: str | list[str]
    ) -> "TemporalTableFunction":
        """The reference's ``Table.createTemporalTableFunction``
        (table-common functions/TemporalTableFunction.java,
        TemporalTableFunctionImpl.java): capture this table as a
        versioned relation keyed by ``primary_key`` and versioned by
        ``time_attr``. Joining it (the reference plans
        ``LATERAL TABLE(fn(o.ts))`` through
        LogicalCorrelateToJoinFromTemporalTableFunctionRule into a
        temporal join) is exposed here as
        :meth:`TemporalTableFunction.join` — the engine's as-of join,
        identical semantics without the correlate detour."""
        return TemporalTableFunction(self._df, time_attr, primary_key)


class TemporalTableFunction:
    """Versioned-table handle returned by
    :meth:`Table.create_temporal_table_function`; ``join(probe,
    probe_time_attr)`` attaches each probe row's latest version
    (build_ts <= probe_ts), per the reference's temporal table
    function join semantics (left-open version intervals)."""

    def __init__(
        self, build: DataFrame, time_attr: str, primary_key: str | list[str]
    ):
        self._build = build
        self._time_attr = time_attr
        self._pk = (
            [primary_key] if isinstance(primary_key, str) else list(primary_key)
        )

    def join(
        self, probe: "Table | DataFrame", probe_time_attr: str, **kwargs
    ) -> "Table":
        from flink_efo_spark.operators.joins import asof_join

        pdf = probe.to_df() if isinstance(probe, Table) else probe
        return Table(
            asof_join(
                pdf,
                self._build,
                self._pk,
                probe_time_attr,
                self._time_attr,
                **kwargs,
            )
        )


class GroupedTable:
    """Result of ``group_by`` — ``select`` evaluates aggregates
    (PyFlink GroupedTable.select semantics)."""

    def __init__(self, df: DataFrame, keys: list):
        self._df = df
        self._keys = keys

    def select(self, *aggs: str | Column) -> Table:
        if _all_str(aggs) and _all_str(self._keys):
            # SQL path: Spark itself classifies grouping keys vs
            # aggregates, so keys listed in select are not duplicated
            flat: list[str] = []
            for e in aggs:
                flat.extend(p.strip() for p in _split_top_level(e) if p.strip())
            spark = self._df.sparkSession
            view = f"__gb_{abs(hash((tuple(flat), tuple(self._keys)))) % 10**8}"
            self._df.createOrReplaceTempView(view)
            return Table(
                spark.sql(
                    f"SELECT {', '.join(flat)} FROM {view} "
                    f"GROUP BY {', '.join(self._keys)}"
                )
            )
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


# ---------------------------------------------------------------------------
# Group-window descriptors — PyFlink pyflink/table/window.py (Tumble:63,
# Slide:89, Session:123) over Spark's window()/session_window() SQL fns.
# Sizes accept PyFlink-style "10.minutes" or Spark interval "10 minutes".
# ---------------------------------------------------------------------------


def _interval(s: str) -> str:
    """'10.minutes' → '10 minutes'; passthrough for Spark intervals."""
    m = re.fullmatch(r"(\d+)\.(\w+)", s.strip())
    return f"{m.group(1)} {m.group(2)}" if m else s.strip()


class GroupWindowDescriptor:
    def __init__(self, kind: str, size: str | None = None,
                 slide: str | None = None, gap: str | None = None):
        self.kind = kind
        self.size = size
        self.slide = slide
        self.gap = gap
        self.time_col: str | None = None
        self.name: str = "w"

    def on(self, time_col: str) -> "GroupWindowDescriptor":
        self.time_col = time_col
        return self

    def alias(self, name: str) -> "GroupWindowDescriptor":
        self.name = name
        return self

    def _sql_fn(self) -> tuple[str, str]:
        """Returns (window fn call, output struct name in Spark SQL)."""
        if self.kind == "tumble":
            return f"window({self.time_col}, '{self.size}')", "window"
        if self.kind == "slide":
            return (
                f"window({self.time_col}, '{self.size}', '{self.slide}')",
                "window",
            )
        # session: gap may be a fixed interval or a dynamic-gap SQL expr
        gap = (
            f"'{self.gap}'"
            if re.fullmatch(r"\d+ \w+", self.gap or "")
            else self.gap
        )
        return f"session_window({self.time_col}, {gap})", "session_window"


class Tumble:
    @staticmethod
    def over(size: str) -> GroupWindowDescriptor:
        return GroupWindowDescriptor("tumble", size=_interval(size))


class Slide:
    @staticmethod
    def over(size: str) -> "_SlideBuilder":
        return _SlideBuilder(_interval(size))


class _SlideBuilder:
    def __init__(self, size: str):
        self._size = size

    def every(self, slide: str) -> GroupWindowDescriptor:
        return GroupWindowDescriptor(
            "slide", size=self._size, slide=_interval(slide)
        )


class Session:
    @staticmethod
    def with_gap(gap: str) -> GroupWindowDescriptor:
        """Fixed gap ('30.minutes') or a dynamic-gap SQL expression over
        the row (DynamicEventTimeSessionWindows.java:47 analog — Spark's
        session_window accepts an expression gap natively)."""
        g = _interval(gap)
        return GroupWindowDescriptor("session", gap=g)


class GroupWindowedTable:
    def __init__(self, df: DataFrame, desc: GroupWindowDescriptor):
        self._df = df
        self._desc = desc

    def group_by(self, *cols: str) -> "WindowGroupedTable":
        keys: list[str] = []
        for c in cols:
            for part in (c.split(",") if isinstance(c, str) else [c]):
                part = part.strip()
                if part and part != self._desc.name:
                    keys.append(part)
        return WindowGroupedTable(self._df, self._desc, keys)


class WindowGroupedTable:
    """Grouped by (window, keys); ``select`` renders a single SQL
    GROUP BY so Spark itself resolves aggregate vs grouping exprs —
    no client-side expression classification."""

    def __init__(self, df: DataFrame, desc: GroupWindowDescriptor, keys: list[str]):
        self._df = df
        self._desc = desc
        self._keys = keys

    def select(self, *exprs: str) -> Table:
        flat: list[str] = []
        for e in exprs:
            flat.extend(p.strip() for p in _split_top_level(e) if p.strip())
        fn, struct_name = self._desc._sql_fn()
        pat = re.compile(rf"\b{re.escape(self._desc.name)}\.(start|end)\b")
        sel = [pat.sub(rf"{struct_name}.\1", e) for e in flat]
        spark = self._df.sparkSession
        view = f"__gw_{abs(hash((tuple(sel), fn))) % 10**8}"
        self._df.createOrReplaceTempView(view)
        group = ", ".join([*self._keys, fn])
        return Table(
            spark.sql(f"SELECT {', '.join(sel)} FROM {view} GROUP BY {group}")
        )


# ---------------------------------------------------------------------------
# OVER-window descriptor — PyFlink pyflink/table/window.py Over:154
# ---------------------------------------------------------------------------

_FRAME_WORDS = {
    "unbounded_range": ("RANGE", "UNBOUNDED PRECEDING"),
    "unbounded_row": ("ROWS", "UNBOUNDED PRECEDING"),
    "current_range": ("RANGE", "CURRENT ROW"),
    "current_row": ("ROWS", "CURRENT ROW"),
}


class Over:
    """Builder: ``Over.partition_by("k").order_by("ts")
    .preceding("unbounded_row").following("current_row").alias("ow")``.
    ``preceding`` also accepts "5.rows" or an interval ("10.seconds" →
    RANGE frame). Rendered as a plain SQL OVER clause, evaluated by
    Spark's native window exec (no Python)."""

    def __init__(self):
        self._partition: str = ""
        self._order: str = ""
        self._mode: str | None = None
        self._preceding: str = "UNBOUNDED PRECEDING"
        self._following: str = "CURRENT ROW"
        self.name = "ow"

    @staticmethod
    def partition_by(cols: str) -> "Over":
        o = Over()
        o._partition = cols
        return o

    @staticmethod
    def order_by_only(cols: str) -> "Over":
        return Over().order_by(cols)

    def order_by(self, cols: str) -> "Over":
        self._order = cols
        return self

    def _bound(self, spec: str, side: str) -> "Over":
        s = spec.strip().lower()
        if s in _FRAME_WORDS:
            mode, bound = _FRAME_WORDS[s]
        else:
            m = re.fullmatch(r"(\d+)\.rows", s)
            if m:
                mode, bound = "ROWS", f"{m.group(1)} {side}"
            else:
                mode, bound = "RANGE", f"INTERVAL {_interval(s)} {side}"
        self._mode = self._mode or mode
        if side == "PRECEDING":
            self._preceding = bound
        else:
            self._following = bound
        return self

    def preceding(self, spec: str) -> "Over":
        return self._bound(spec, "PRECEDING")

    def following(self, spec: str) -> "Over":
        return self._bound(spec, "FOLLOWING")

    def alias(self, name: str) -> "Over":
        self.name = name
        return self

    def _sql(self) -> str:
        parts = []
        if self._partition:
            parts.append(f"PARTITION BY {self._partition}")
        if self._order:
            parts.append(f"ORDER BY {self._order}")
        mode = self._mode or "RANGE"
        parts.append(
            f"{mode} BETWEEN {self._preceding} AND {self._following}"
        )
        return f"OVER ({' '.join(parts)})"


class OverWindowedTable:
    def __init__(self, df: DataFrame, desc: Over):
        self._df = df
        self._desc = desc

    def select(self, *exprs: str) -> Table:
        flat: list[str] = []
        for e in exprs:
            flat.extend(p.strip() for p in _split_top_level(e) if p.strip())
        pat = re.compile(rf"\bover\s+{re.escape(self._desc.name)}\b", re.I)
        sel = [pat.sub(self._desc._sql(), e) for e in flat]
        return Table(self._df.selectExpr(*sel))


def _split_top_level(s: str) -> list[str]:
    """Split on commas not inside parens/quotes (so one PyFlink-style
    'a, b, sum(c) over ow as d' string becomes select items)."""
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _parse_udtf(expr: str) -> tuple[str, str | None, list[str]]:
    """Parse "fn(args) as t(c1, c2)" / "fn(args) as (c1)" / "fn(args)"
    into (call, table alias, column names)."""
    m = re.fullmatch(
        r"(?is)\s*(.+?)\s+as\s+(?:(\w+)\s*)?\(\s*([\w\s,]+)\s*\)\s*", expr
    )
    if m:
        cols = [c.strip() for c in m.group(3).split(",") if c.strip()]
        return m.group(1), m.group(2), cols
    return expr.strip(), None, []
