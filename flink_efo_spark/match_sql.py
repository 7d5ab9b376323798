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

Supported measure expressions: ``FIRST(V.col [, n])`` /
``LAST(V.col [, n])`` (logical n-th-row offsets, NULL out of range) /
``COUNT(V.col | V.*)`` / the running folds ``SUM/MIN/MAX/AVG(V.col)``
/ bare ``V.col`` (the matched row's value — ``last`` semantics,
one-row-per-match) / ``MATCH_NUMBER()`` — plus
arbitrary SCALAR EXPRESSIONS over those atoms (``LAST(B.v) -
FIRST(A.v)``, ``COALESCE(LAST(B.v), A.v)``, CASE, any Spark scalar
function): the atoms come out of the matcher as hidden measures and
the expression runs as one Catalyst projection, so unmatched optional
variables surface as NULLs exactly like the reference's generated
measure code (MatchCodeGenerator.scala). DEFINE
conditions are Spark SQL boolean expressions over the row; variable
prefixes (``A.price``) are stripped (every variable sees the current
row, the reference's running semantics for non-aggregate refs),
``PREV(V.col [, 1])`` maps to the engine's ``prev_col`` pseudo-columns,
and ``FIRST/LAST/SUM/COUNT/AVG/MIN/MAX(V.col)`` over a bound variable
map to the matcher's binding-time navigation/fold pseudo-references
(the reference's aggregate-in-DEFINE paths, e.g.
``B AS SUM(B.price) < 100``).

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
    r"^(FIRST|LAST|COUNT|SUM|MIN|MAX|AVG)\s*\(\s*([A-Za-z_]\w*)\s*\.\s*"
    r"([A-Za-z_]\w*|\*)\s*(?:,\s*(\d+)\s*)?\)$",
    re.IGNORECASE,
)
_MEAS_BARE_RE = re.compile(r"^([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)$")
_MATCH_NUM_RE = re.compile(r"^MATCH_NUMBER\s*\(\s*\)$", re.IGNORECASE)
_CLASSIFIER_RE = re.compile(r"^CLASSIFIER\s*\(\s*\)$", re.IGNORECASE)


def _parse_measures(text: str, variables: set[str] | None = None):
    """-> (measures dict for the API, match_number output name|None,
    post_exprs: ordered {out name: Spark SQL expr} | None).

    Simple items (one FIRST/LAST/COUNT(V.col), bare V.col,
    MATCH_NUMBER()) map directly onto engine measures. COMPOUND scalar
    expressions over those atoms — ``LAST(B.v) - FIRST(A.v)``,
    ``COALESCE(LAST(B.v), A.v)``, arithmetic with MATCH_NUMBER(),
    CASE, any Spark scalar function — are supported the Spark-first
    way: each navigation atom becomes a HIDDEN engine measure
    (``__mr_e<k>``) and the surrounding expression runs as one
    Catalyst ``selectExpr`` over the match output (whole-stage
    codegen; the Python matcher only ever emits atoms). Unmatched
    optional variables surface as NULL atoms (COUNT as 0), so the
    expressions see exactly the reference's semantics
    (MatchCodeGenerator.scala generates the same null-propagating
    expression code over its measure fields). ``post_exprs`` is None
    when every item is simple — the zero-plan-change fast path."""
    variables = variables or set()
    measures: dict[str, tuple[str, str, str]] = {}
    match_num = None
    post_exprs: dict[str, str] = {}
    atom_ids: dict[tuple[str, str, str], str] = {}
    compound_seen = False

    def _atom(var: str, fn: str, col: str) -> str:
        key = (var, fn, col)
        if key not in atom_ids:
            hid = f"__mr_e{len(atom_ids)}"
            atom_ids[key] = hid
            measures[hid] = key
        return atom_ids[key]

    for item in _split_top(text):
        m = re.match(r"^(.*?)\s+AS\s+([A-Za-z_]\w*)$", item, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"MEASURES item needs 'expr AS name': {item!r}")
        expr, name = m.group(1).strip(), m.group(2)
        if _MATCH_NUM_RE.match(expr):
            match_num = name
            continue
        if _CLASSIFIER_RE.match(expr):
            # CLASSIFIER() (FlinkSqlOperatorTable.java:995): under the
            # engine's one-row-per-match output this is the name of
            # the variable that matched the final row — a dedicated
            # measure fn; var/col slots are unused.
            measures[name] = ("", "classifier", "")
            post_exprs[name] = name
            continue
        fm = _MEAS_FN_RE.match(expr)
        if fm:
            fn, var, col = fm.group(1).lower(), fm.group(2), fm.group(3)
            if fm.group(4) is not None:
                n = int(fm.group(4))
                if fn not in ("first", "last"):
                    raise ValueError(
                        f"{fn.upper()} takes no offset in MEASURES: "
                        f"{item!r}"
                    )
                if n > 0:
                    # FIRST(V.col, n): n-th-row logical navigation —
                    # the engine encodes the offset in the fn slot.
                    # n == 0 falls through on purpose: SQL:2016 defines
                    # offset 0 as the navigated row itself, i.e.
                    # FIRST(V.col, 0) === FIRST(V.col).
                    fn = f"{fn}:{n}"
            if col == "*":
                if fn != "count":
                    raise ValueError(f"{fn.upper()}(V.*) is not a measure: {item!r}")
                col = var  # count ignores the column
            measures[name] = (var, fn, col)
            post_exprs[name] = name
            continue
        bm = _MEAS_BARE_RE.match(expr)
        if bm:
            # one-row-per-match: V.col is the value on V's matched row
            # (last row of the variable, the reference's final semantics)
            measures[name] = (bm.group(1), "last", bm.group(2))
            post_exprs[name] = name
            continue
        # compound expression: swap each atom for a hidden measure and
        # keep the rest for Catalyst
        rewritten = re.sub(
            r"\bMATCH_NUMBER\s*\(\s*\)", "match_seq", expr,
            flags=re.IGNORECASE,
        )
        rewritten = re.sub(
            r"\bCLASSIFIER\s*\(\s*\)",
            lambda _mm: _atom("", "classifier", ""),
            rewritten,
            flags=re.IGNORECASE,
        )

        def _sub_fn(mm: "re.Match") -> str:
            fn, var, col = (
                mm.group(1).lower(), mm.group(2), mm.group(3)
            )
            if var not in variables:
                return mm.group(0)
            if mm.group(4) is not None:
                n = int(mm.group(4))
                if fn not in ("first", "last"):
                    raise ValueError(
                        f"{fn.upper()} takes no offset in MEASURES: "
                        f"{item!r}"
                    )
                if n > 0:
                    fn = f"{fn}:{n}"
            if col == "*":
                if fn != "count":
                    raise ValueError(
                        f"{fn.upper()}({var}.*) is not a measure: {item!r}"
                    )
                col = var
            return _atom(var, fn, col)

        rewritten = re.sub(
            r"\b(FIRST|LAST|COUNT|SUM|MIN|MAX|AVG)\s*\(\s*"
            r"([A-Za-z_]\w*)\s*\.\s*"
            r"([A-Za-z_]\w*|\*)\s*(?:,\s*(\d+)\s*)?\)",
            _sub_fn,
            rewritten,
            flags=re.IGNORECASE,
        )
        for v in sorted(variables, key=len, reverse=True):
            rewritten = re.sub(
                rf"\b{re.escape(v)}\s*\.\s*([A-Za-z_]\w*)",
                lambda mm, _v=v: _atom(_v, "last", mm.group(1)),
                rewritten,
            )
        leftover = re.search(
            r"\b(" + "|".join(re.escape(v) for v in variables) + r")\s*\."
            if variables
            else r"$^",
            rewritten,
        )
        if leftover:
            raise ValueError(
                f"unsupported MEASURES expression: {item!r} "
                "(unresolvable pattern-variable reference "
                f"{leftover.group(0)!r})"
            )
        # a running aggregate that did NOT collapse to an atom (e.g.
        # STDDEV(A.v), SUM(A.v + 1)) would reach Spark as an aggregate
        # inside a projection — refuse here with the real reason
        agg_left = re.search(
            r"\b(SUM|AVG|MIN|MAX|COUNT|FIRST|LAST|STDDEV\w*|VARIANCE"
            r"|VAR_POP|VAR_SAMP|COLLECT_LIST|COLLECT_SET|ARRAY_AGG"
            r"|LISTAGG|PERCENTILE\w*)\s*\(",
            rewritten,
            flags=re.IGNORECASE,
        )
        if agg_left:
            raise ValueError(
                f"unsupported MEASURES expression: {item!r} "
                f"({agg_left.group(1).upper()} over a non-atom argument "
                "— running aggregates support only "
                "FIRST/LAST/COUNT/SUM/MIN/MAX/AVG(V.col))"
            )
        post_exprs[name] = rewritten
        compound_seen = True
    return measures, match_num, (post_exprs if compound_seen else None)


def _parse_defines(text: str, variables: set[str]) -> dict[str, str]:
    defines = {}
    for item in _split_top(text):
        m = re.match(
            r"^([A-Za-z_]\w*)\s+AS\s+(.*)$", item, re.IGNORECASE | re.DOTALL
        )
        if not m:
            raise ValueError(f"DEFINE item needs 'VAR AS cond': {item!r}")
        var, cond = m.group(1), m.group(2).strip()
        # FIRST/LAST navigation AND the running folds
        # SUM/COUNT/AVG/MIN/MAX over V's in-progress binding in
        # DEFINE -> the engine's fn_V_col pseudo-references, resolved
        # against the binding by the batch matcher
        # (MatchCodeGenerator.scala navigation + aggregate paths,
        # MatchRecognizeITCase)
        cond = re.sub(
            r"\b(FIRST|LAST|SUM|COUNT|AVG|MIN|MAX)\s*\(\s*"
            r"([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*\)",
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

    measures, match_num, post_exprs = (
        _parse_measures(sec["MEASURES"], variables)
        if "MEASURES" in sec
        else ({}, None, None)
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
    if post_exprs is not None:
        # compound measures: the hidden navigation atoms came out of
        # the matcher; the expressions themselves run as ONE Catalyst
        # projection (whole-stage codegen), then the atoms drop
        out = out.selectExpr(
            *partition_by,
            "match_seq",
            *[f"{e} AS {n}" for n, e in post_exprs.items()],
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
        tuple(sorted(post_exprs.items())) if post_exprs else None,
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
