"""SQL MATCH_RECOGNIZE clause → :func:`operators.cep.match_recognize`.

The reference parses the SQL:2016 row-pattern clause through Calcite
(SqlMatchRecognize; planned by StreamExecMatch.scala:68) — a migrating
user writes::

    SELECT ... FROM t MATCH_RECOGNIZE (
      PARTITION BY k  ORDER BY ts [, tiebreak]
      MEASURES FIRST(A.col) AS x, LAST(B.col) AS y, COUNT(B.col) AS n
      [ONE ROW PER MATCH]
      [AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO FIRST|LAST V]
      PATTERN ( <pattern> )
      [WITHIN INTERVAL '<n>' <unit>]
      DEFINE V AS <condition> [, ...]
    ) [AS alias]

This module parses that clause LEXICALLY (paren/quote-aware, same
scanner primitives as dialect.py), executes the pattern through the
engine's matcher, registers the result as a temp view, and rewrites
the outer query to select from it — so the surrounding SQL (joins,
filters, ORDER BY) still runs through Spark SQL untouched.

Supported measure expressions: ``FIRST(V.col)`` / ``LAST(V.col)`` /
``COUNT(V.col | V.*)`` / bare ``V.col`` (the matched row's value —
``last`` semantics, one-row-per-match) / ``MATCH_NUMBER()``. DEFINE
conditions are Spark SQL boolean expressions over the row; variable
prefixes (``A.price``) are stripped (every variable sees the current
row, the reference's running semantics for non-aggregate refs), and
``PREV(V.col [, 1])`` maps to the engine's ``prev_col`` pseudo-columns.
``FIRST``/``LAST`` aggregates inside DEFINE are not supported — the
parser raises rather than mis-executing.

Scale: identical to the API path — the clause is sugar; the matcher
runs as the same bucketed ``applyInPandas`` plan.
"""

from __future__ import annotations

import re

from flink_efo_spark.dialect import (
    _find_close,
    _interval_us,
    _skip_quoted,
)

_MR_RE = re.compile(
    r"([A-Za-z_][\w.]*)\s+MATCH_RECOGNIZE\s*\(", re.IGNORECASE
)

_SECTIONS = [
    "PARTITION BY",
    "ORDER BY",
    "MEASURES",
    "ONE ROW PER MATCH",
    "ALL ROWS PER MATCH",
    "AFTER MATCH",
    "PATTERN",
    "WITHIN",
    "DEFINE",
]
_WS = r"\s+"
_SECTION_RE = re.compile(
    "|".join(r"\b" + s.replace(" ", _WS) + r"\b" for s in _SECTIONS),
    re.IGNORECASE,
)

_SQL_KEYWORDS = {
    "where", "group", "order", "having", "limit", "union", "except",
    "intersect", "join", "left", "right", "full", "inner", "cross", "on",
    "window", "qualify",
}


def has_match_recognize(sql: str) -> bool:
    return bool(_MR_RE.search(sql))


def _split_top(text: str, sep: str = ",") -> list[str]:
    parts, depth, last, i = [], 0, 0, 0
    while i < len(text):
        c = text[i]
        if c in ("'", '"', "`"):
            i = _skip_quoted(text, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(text[last:i])
            last = i + 1
        i += 1
    parts.append(text[last:])
    return [p.strip() for p in parts if p.strip()]


def _sections(body: str) -> dict[str, str]:
    """Split the clause body into {section keyword: text} at depth 0."""
    marks = []
    depth, i = 0, 0
    while i < len(body):
        c = body[i]
        if c in ("'", '"', "`"):
            i = _skip_quoted(body, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = _SECTION_RE.match(body, i)
            if m and not (i > 0 and (body[i - 1].isalnum() or body[i - 1] == "_")):
                marks.append((i, m.end(), " ".join(m.group(0).upper().split())))
                i = m.end()
                continue
        i += 1
    out = {}
    for j, (start, end, name) in enumerate(marks):
        nxt = marks[j + 1][0] if j + 1 < len(marks) else len(body)
        out[name] = body[end:nxt].strip()
    return out


_MEAS_FN_RE = re.compile(
    r"^(FIRST|LAST|COUNT)\s*\(\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*|\*)\s*"
    r"(?:,\s*\d+\s*)?\)$",
    re.IGNORECASE,
)
_MEAS_BARE_RE = re.compile(r"^([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)$")
_MATCH_NUM_RE = re.compile(r"^MATCH_NUMBER\s*\(\s*\)$", re.IGNORECASE)


def _parse_measures(text: str):
    """-> (measures dict for the API, match_number output name|None)."""
    measures: dict[str, tuple[str, str, str]] = {}
    match_num = None
    for item in _split_top(text):
        m = re.match(r"^(.*?)\s+AS\s+([A-Za-z_]\w*)$", item, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"MEASURES item needs 'expr AS name': {item!r}")
        expr, name = m.group(1).strip(), m.group(2)
        if _MATCH_NUM_RE.match(expr):
            match_num = name
            continue
        fm = _MEAS_FN_RE.match(expr)
        if fm:
            fn, var, col = fm.group(1).lower(), fm.group(2), fm.group(3)
            if col == "*":
                if fn != "count":
                    raise ValueError(f"{fn.upper()}(V.*) is not a measure: {item!r}")
                col = var  # count ignores the column
            measures[name] = (var, fn, col)
            continue
        bm = _MEAS_BARE_RE.match(expr)
        if bm:
            # one-row-per-match: V.col is the value on V's matched row
            # (last row of the variable, the reference's final semantics)
            measures[name] = (bm.group(1), "last", bm.group(2))
            continue
        raise ValueError(
            f"unsupported MEASURES expression: {item!r} "
            "(supported: FIRST/LAST/COUNT(V.col), V.col, MATCH_NUMBER())"
        )
    return measures, match_num


def _parse_defines(text: str, variables: set[str]) -> dict[str, str]:
    defines = {}
    for item in _split_top(text):
        m = re.match(
            r"^([A-Za-z_]\w*)\s+AS\s+(.*)$", item, re.IGNORECASE | re.DOTALL
        )
        if not m:
            raise ValueError(f"DEFINE item needs 'VAR AS cond': {item!r}")
        var, cond = m.group(1), m.group(2).strip()
        # FIRST(V.col)/LAST(V.col) navigation in DEFINE -> the
        # engine's first_V_col/last_V_col pseudo-references, resolved
        # against the in-progress binding by the batch matcher
        # (MatchCodeGenerator.scala navigation, MatchRecognizeITCase)
        cond = re.sub(
            r"\b(FIRST|LAST)\s*\(\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)"
            r"\s*\)",
            lambda mm: f"{mm.group(1).lower()}_{mm.group(2)}_{mm.group(3)}",
            cond,
            flags=re.IGNORECASE,
        )
        # PREV(V.col [, 1]) -> prev_col (the engine's pseudo-column)
        cond = re.sub(
            r"\bPREV\s*\(\s*[A-Za-z_]\w*\s*\.\s*([A-Za-z_]\w*)\s*(?:,\s*1\s*)?\)",
            r"prev_\1",
            cond,
            flags=re.IGNORECASE,
        )
        # strip variable prefixes: every variable sees the current row
        for v in variables | {var}:
            cond = re.sub(rf"\b{re.escape(v)}\s*\.\s*", "", cond)
        defines[var] = cond
    return defines


def _parse_skip(text: str) -> str:
    t = " ".join(text.upper().split())
    if t.startswith("SKIP PAST LAST ROW"):
        return "past_last_row"
    if t.startswith("SKIP TO NEXT ROW"):
        return "to_next_row"
    m = re.match(r"SKIP TO (FIRST|LAST)\s+([A-Za-z_]\w*)", t)
    if m:
        return f"to_{m.group(1).lower()}:{m.group(2)}"
    raise ValueError(f"unsupported AFTER MATCH strategy: {text!r}")


def execute_match_recognize(spark, sql: str, translate_fn):
    """Execute the first MATCH_RECOGNIZE clause in ``sql`` and run the
    rewritten outer query. ``translate_fn`` post-processes the outer
    SQL (the dialect shim)."""
    from flink_efo_spark.operators.cep import _parse_ast, match_recognize

    m = _MR_RE.search(sql)
    if m is None:
        return spark.sql(translate_fn(sql))
    src = m.group(1)
    open_idx = sql.index("(", m.end() - 1)
    close = _find_close(sql, open_idx)
    sec = _sections(sql[open_idx + 1 : close])

    if "ALL ROWS PER MATCH" in sec:
        # exact reference parity: StreamExecMatch.scala:193 throws
        # "All rows per match mode is not supported yet."
        raise ValueError(
            "ALL ROWS PER MATCH is not supported (one row per match only; "
            "the reference rejects it too)"
        )
    if "PATTERN" not in sec or "DEFINE" not in sec:
        raise ValueError("MATCH_RECOGNIZE needs PATTERN and DEFINE")
    pattern = sec["PATTERN"].strip()
    if pattern.startswith("("):
        pattern = pattern[1 : _find_close(pattern, 0)]
    _, leaves = _parse_ast(pattern)
    variables = {v for _, vs, *_ in leaves for v in vs}

    partition_by = (
        [c.strip() for c in _split_top(sec["PARTITION BY"])]
        if "PARTITION BY" in sec
        else []
    )
    if not partition_by:
        raise ValueError("MATCH_RECOGNIZE needs PARTITION BY (keyed match)")
    order_cols = (
        [c.strip() for c in _split_top(sec["ORDER BY"])]
        if "ORDER BY" in sec
        else []
    )
    if not order_cols:
        raise ValueError("MATCH_RECOGNIZE needs ORDER BY")
    if len(order_cols) > 2:
        raise ValueError("ORDER BY supports at most (time, tiebreak)")
    order_by = order_cols[0]
    tiebreak = order_cols[1] if len(order_cols) == 2 else None

    measures, match_num = (
        _parse_measures(sec["MEASURES"]) if "MEASURES" in sec else ({}, None)
    )
    defines = _parse_defines(sec["DEFINE"], variables)
    after = _parse_skip(sec["AFTER MATCH"]) if "AFTER MATCH" in sec else "past_last_row"
    within = (
        _interval_us(sec["WITHIN"].strip()) / 1e6 if "WITHIN" in sec else None
    )

    out = match_recognize(
        spark.table(src),
        partition_by,
        order_by,
        pattern=pattern,
        defines=defines,
        measures=measures,
        tiebreak=tiebreak,
        within=within,
        after_match=after,
    )
    if match_num is not None:
        out = out.withColumnRenamed("match_seq", match_num)

    # the view name must key on EVERY clause input: two clauses in one
    # statement differing only in MEASURES / AFTER MATCH / ORDER BY /
    # WITHIN would otherwise collide and both read the second's result
    # (round-5 ADVICE)
    _key = (
        src,
        pattern,
        tuple(sorted(defines.items())),
        tuple(sorted(measures.items())),
        after,
        order_by,
        tiebreak,
        within,
        match_num,
    )
    view = f"__efo_mr_{abs(hash(_key)) % 10**9}"
    out.createOrReplaceTempView(view)

    # optional alias after the clause; keep it, default to the view name
    rest = sql[close + 1 :]
    am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", rest, re.IGNORECASE)
    if am and am.group(1).lower() not in _SQL_KEYWORDS:
        alias = am.group(1)
        rest = rest[am.end() :]
    else:
        alias = view
    new_sql = f"{sql[: m.start(1)]}{view} {alias}{rest}"
    # recurse: multiple MATCH_RECOGNIZE clauses resolve one at a time
    return execute_match_recognize(spark, new_sql, translate_fn)
