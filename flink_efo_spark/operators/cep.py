"""MATCH_RECOGNIZE subset — CEP pattern matching over ordered rows.

Reference: StreamExecMatch.scala:68 + flink-libraries/flink-cep
(NFA.java, SharedBuffer.java) in /root/reference. Scope per SURVEY §7
Phase 4: **concatenation + greedy quantifiers (?, *, +), AFTER MATCH
SKIP PAST LAST ROW, FIRST/LAST/COUNT measures** — no alternation, no
complex SKIP modes (the reference's own docs mark those as the common
core).

Spark realization:

* DEFINE predicates are Spark SQL boolean expressions, evaluated
  JVM-side into one boolean column per pattern variable *before* the
  match step — predicates stay in codegen, the Python NFA only reads
  booleans. ``PREV(col)`` is supported by pre-materializing
  ``prev_<col>`` columns (``lag`` over the same partition/order).
* The match loop is a per-key ``applyInPandas`` (batch) over rows
  sorted by the order column — a backtracking greedy matcher, linear
  in rows for the supported quantifier set.
* Streaming: run inside ``foreachBatch`` per micro-batch, or over a
  bounded replay (``run_stream_to_table``); cross-batch partial-match
  state is out of scope (documented gap).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    _parse_datatype_string,
)

_QUANTS = {"?": (0, 1), "*": (0, None), "+": (1, None), "": (1, 1)}


def _parse_pattern(pattern: str) -> list[tuple[str, int, int | None]]:
    """'A B+ C?' → [(A,1,1), (B,1,None), (C,0,1)]."""
    steps = []
    for tok in pattern.split():
        m = re.fullmatch(r"([A-Za-z_]\w*)([?*+]?)", tok)
        if not m:
            raise ValueError(f"unsupported pattern token: {tok!r}")
        lo, hi = _QUANTS[m.group(2)]
        steps.append((m.group(1), lo, hi))
    return steps


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    defines: dict[str, str],
    measures: dict[str, tuple[str, str, str]],
    tiebreak: str | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE subset.

    pattern: variable sequence with greedy quantifiers, e.g.
    ``"A B+ C"``. Every variable must appear in ``defines``.

    defines: var → Spark SQL boolean expression over the row's
    columns; ``prev_<col>`` pseudo-columns give PREV() access.

    measures: out_col → (var, fn, col) with fn ∈ first|last|count
    (count ignores col). The output carries the partition keys, a
    per-partition ``match_seq``, and the measures.
    """
    import pandas as pd

    steps = _parse_pattern(pattern)
    step_vars = [v for v, _, _ in steps]
    missing = [v for v in step_vars if v not in defines]
    if missing:
        raise ValueError(f"pattern vars without DEFINE: {missing}")

    order_cols = [order_by] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_cols])

    # PREV() support: materialize prev_<col> for any column referenced
    # as prev_X in a DEFINE body
    prev_cols = sorted(
        {
            m
            for body in defines.values()
            for m in re.findall(r"prev_(\w+)", body)
        }
    )
    enriched = df
    for c in prev_cols:
        enriched = enriched.withColumn(f"prev_{c}", F.lag(c).over(w))

    # evaluate DEFINEs JVM-side into boolean flag columns
    flag_names = {}
    for var, body in defines.items():
        flag = f"__m_{var}"
        flag_names[var] = flag
        enriched = enriched.withColumn(flag, F.expr(body))

    # measures need the referenced data columns + order + flags
    meas_cols = sorted({col for _, fn, col in measures.values() if fn != "count"})
    keep = list(
        dict.fromkeys(
            partition_by + order_cols + meas_cols + list(flag_names.values())
        )
    )
    slim = enriched.select(*keep)

    out_fields = [slim.schema[k] for k in partition_by]
    out_fields.append(StructField("match_seq", LongType()))
    for out_col, (var, fn, col) in measures.items():
        if fn == "count":
            out_fields.append(StructField(out_col, LongType()))
        else:
            out_fields.append(StructField(out_col, slim.schema[col].dataType))
    out_schema = StructType(out_fields)

    flag_list = [flag_names[v] for v in step_vars]
    meas_items = list(measures.items())

    def match_one_key(pdf: "pd.DataFrame") -> list[dict]:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        flags = [pdf[f].fillna(False).to_numpy() for f in flag_list]
        n = len(pdf)
        # column arrays once per group — pdf.iloc row access per match
        # per measure is the pandas slow path
        data = {c: pdf[c].to_numpy() for c in meas_cols}
        part_vals = {k: pdf[k].iloc[0] for k in partition_by} if n else {}

        def try_match(start: int):
            """Greedy with backtracking; returns per-step row index
            lists or None."""

            def go(step_idx: int, pos: int, acc):
                if step_idx == len(steps):
                    return acc if pos > start else None
                _, lo, hi = steps[step_idx]
                fl = flags[step_idx]
                taken = []
                p = pos
                limit = n if hi is None else min(n, pos + hi)
                while p < limit and fl[p]:
                    taken.append(p)
                    p += 1
                while len(taken) >= lo:
                    res = go(step_idx + 1, pos + len(taken), acc + [list(taken)])
                    if res is not None:
                        return res
                    if not taken:
                        break
                    taken.pop()
                return None

            return go(0, start, [])

        rows = []
        seq = 0
        i = 0
        while i < n:
            m = try_match(i)
            if m is None:
                i += 1
                continue
            seq += 1
            var_rows = {step_vars[k]: m[k] for k in range(len(steps))}
            rec = dict(part_vals)
            rec["match_seq"] = seq
            for out_col, (var, fn, col) in meas_items:
                idxs = var_rows.get(var, [])
                if fn == "count":
                    rec[out_col] = len(idxs)
                elif not idxs:
                    rec[out_col] = None
                elif fn == "first":
                    rec[out_col] = data[col][idxs[0]]
                elif fn == "last":
                    rec[out_col] = data[col][idxs[-1]]
                else:
                    raise ValueError(f"unsupported measure fn: {fn}")
            rows.append(rec)
            last_row = max((ix for lst in m for ix in lst), default=i)
            i = last_row + 1  # AFTER MATCH SKIP PAST LAST ROW
        return rows

    cols = [f.name for f in out_schema.fields]

    def matcher(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # one Arrow round-trip serves MANY keys: the engine groups by a
        # hash bucket of the partition keys and iterates keys here —
        # one python call per key (5k tiny groups at sf0.1) costs more
        # than the matching itself
        rows: list[dict] = []
        for _, sub in pdf.groupby(partition_by, sort=False, dropna=False):
            rows.extend(match_one_key(sub))
        return pd.DataFrame(rows, columns=cols)

    bucket = F.pmod(F.hash(*[F.col(c) for c in partition_by]), F.lit(256))
    return (
        slim.withColumn("__bucket", bucket)
        .groupBy("__bucket")
        .applyInPandas(matcher, out_schema)
    )
