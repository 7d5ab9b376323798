"""MATCH_RECOGNIZE subset — CEP pattern matching over ordered rows.

Reference: StreamExecMatch.scala:68 + flink-libraries/flink-cep
(NFA.java, SharedBuffer.java:54) in /root/reference. Scope per SURVEY
§7 Phase 4, extended rounds 3-4: **concatenation + alternation groups
(``(A|B)``) + nested quantified groups (``A (B C)+ D``,
GroupPattern.java — batch) + SQL:2016 PERMUTE (batch; k! ordered
alternation) + greedy (?, *, +) and reluctant
(??, *?, +?) quantifiers, AFTER MATCH SKIP PAST LAST ROW / TO NEXT
ROW / TO FIRST|LAST <var>, FIRST/LAST/COUNT measures**. The streaming
path (round 5) matches the batch pattern surface including nested
groups — group-free patterns take a flat-step fast path; grouped
patterns run the AST backtracker with a probe-based hold test.

Spark realization:

* DEFINE predicates are Spark SQL boolean expressions, evaluated
  JVM-side into one boolean column per pattern variable *before* the
  match step — predicates stay in codegen, the Python NFA only reads
  booleans. ``PREV(col)`` is supported by pre-materializing
  ``prev_<col>`` columns (batch: ``lag`` over the partition/order;
  streaming: prev_-using DEFINEs are evaluated in the worker over the
  sorted cross-batch buffer — embedded DuckDB on the pandas frame,
  portable-SQL bodies only — with one carried context row so the row
  after an emitted match still sees its true predecessor).
* Batch: the match loop is a per-bucket ``applyInPandas`` over rows
  sorted by the order column — a backtracking greedy matcher, linear
  in rows for the supported quantifier set.
* Streaming: :func:`stream_match_recognize` keeps the per-key
  unconsumed tail in ``applyInPandasWithState`` — partial matches
  SURVIVE micro-batch boundaries (the reference's
  SharedBuffer.java:54 role). A completed match is emitted as soon
  as it is *closed* — a later buffered row failed to extend it, or
  no step has remaining capacity — mirroring the NFA's
  emit-on-no-extension behavior. A match still extendable at
  buffer end is HELD in state for the next batch (on a bounded
  replay that ends the stream, a held still-extendable match is not
  flushed — Spark has no end-of-input MAX_WATERMARK hook; patterns
  ending in a bounded concrete step, e.g. a funnel's final
  ``purchase``, close immediately and are unaffected).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

_QUANTS = {"?": (0, 1), "*": (0, None), "+": (1, None), "": (1, 1)}


def _bool_col(series) -> "object":
    """NA→False bool ndarray, avoiding pandas' ``fillna`` object-dtype
    downcasting path (deprecated in 2.2, behavior flips in 3.0)."""
    import numpy as np
    import pandas as pd

    arr = series.to_numpy()
    if arr.dtype == bool:
        return arr
    return np.where(pd.isna(arr), False, arr).astype(bool)

# flat step: (member variables, lo, hi, lazy) — lazy = non-greedy
Step = tuple[list[str], int, "int | None", bool]

# AST node (nested patterns):
#   ("var", variables, lo, hi, lazy, leaf_id)  — leaf step
#   ("group", children, lo, hi, lazy)          — quantified sub-sequence
#                                                (GroupPattern.java)


def _parse_ast(pattern: str):
    """Recursive-descent pattern parser → (ast, leaves).

    Grammar: ``pattern := element+``; ``element := atom quant?``;
    ``atom := VAR | VAR('|'VAR)+ | '(' pattern ')'``;
    ``quant := [?*+] '?'?`` (trailing ``?`` = reluctant, the
    reference's ``Quantifier.greedy`` flag off, Quantifier.java).

    ``(A|B)`` stays ONE leaf with alternation members (the NFA's
    OR-state); ``(B C)+`` is a nested GROUP — a quantified
    sub-sequence, the reference's GroupPattern
    (flink-cep/.../pattern/GroupPattern.java). ``leaves`` lists every
    var leaf in pattern order (leaf_id indexes it).
    """
    s = pattern
    pos = 0
    leaves: list[tuple] = []

    def skip_ws():
        nonlocal pos
        while pos < len(s) and s[pos].isspace():
            pos += 1

    def parse_quant():
        nonlocal pos
        lo, hi, lazy = 1, 1, False
        if pos < len(s) and s[pos] in "?*+":
            lo, hi = _QUANTS[s[pos]]
            pos += 1
            if pos < len(s) and s[pos] == "?":
                lazy = True
                pos += 1
        return lo, hi, lazy

    def parse_element():
        nonlocal pos
        skip_ws()
        pm = re.match(r"(?i)PERMUTE\s*\(", s[pos:])
        if pm:
            # SQL:2016 row-pattern PERMUTE (Calcite's
            # SqlMatchRecognize PERMUTE; the reference parses it via
            # Calcite): PERMUTE(P1, ..., Pk) matches the arguments in
            # ANY order — expanded here to an ordered alternation
            # over all k! argument orderings (lexicographic
            # preference, the standard's tie rule). Each argument may
            # itself be a quantified sequence.
            import itertools

            pos += pm.end()
            args: list[list] = []
            while True:
                seq = parse_seq()
                if not seq:
                    raise ValueError(f"empty PERMUTE argument: {pattern!r}")
                args.append(seq)
                skip_ws()
                if pos < len(s) and s[pos] == ",":
                    pos += 1
                    continue
                break
            if pos >= len(s) or s[pos] != ")":
                raise ValueError(f"unbalanced PERMUTE( in pattern: {pattern!r}")
            pos += 1
            if len(args) > 5:
                raise ValueError(
                    "PERMUTE supports at most 5 arguments (k! expansion)"
                )
            alts = [
                [node for arg in perm for node in arg]
                for perm in itertools.permutations(args)
            ]
            lo, hi, lazy = parse_quant()
            node = ("altseq", alts)
            if (lo, hi, lazy) != (1, 1, False):
                return ("group", [node], lo, hi, lazy)
            return node
        if s[pos] == "(":
            pos += 1
            inner = parse_seq()
            skip_ws()
            if pos >= len(s) or s[pos] != ")":
                raise ValueError(f"unbalanced '(' in pattern: {pattern!r}")
            pos += 1
            lo, hi, lazy = parse_quant()
            if (
                len(inner) == 1
                and inner[0][0] == "var"
                and inner[0][2:5] == (1, 1, False)
            ):
                # '(A|B)+' — an unquantified alternation leaf wrapped
                # in parens: fold the group quantifier into the leaf
                _, variables, _, _, _, leaf_id = inner[0]
                node = ("var", variables, lo, hi, lazy, leaf_id)
                leaves[leaf_id] = node
                return node
            return ("group", inner, lo, hi, lazy)
        m = re.match(r"[A-Za-z_]\w*(?:\|[A-Za-z_]\w*)*", s[pos:])
        if not m:
            raise ValueError(
                f"bad pattern at offset {pos}: {pattern!r}"
            )
        variables = m.group(0).split("|")
        pos += m.end()
        lo, hi, lazy = parse_quant()
        leaf_id = len(leaves)
        node = ("var", variables, lo, hi, lazy, leaf_id)
        leaves.append(node)
        return node

    def parse_seq():
        nodes = []
        skip_ws()
        while pos < len(s) and s[pos] not in "),":
            nodes.append(parse_element())
            skip_ws()
        return nodes

    ast = parse_seq()
    if pos != len(s):
        raise ValueError(f"trailing ')' in pattern: {pattern!r}")
    if not ast:
        raise ValueError("empty pattern")
    return ast, leaves


def _has_groups(ast) -> bool:
    return any(node[0] != "var" for node in ast)




def _match_at(ast, start: int, n: int, leaf_flags, ts=None, within=None,
              nav=None):
    """Try one match of ``ast`` anchored at row ``start``.
    Returns (end_pos, assign) with ``assign`` a list of
    (leaf_id, [row indices]) in consumption order, or None.

    ``nav``: optional DEFINE-time navigation context (FIRST/LAST of a
    bound variable, MatchCodeGenerator.scala navigation calls) —
    ``nav.check(variables, p, pos, acc)`` decides row ``p``'s
    qualification against the in-progress binding ``acc`` (+ the
    current leaf's tentative run ``pos..p``).

    Continuation-passing backtracker: sequences thread a ``cont``
    called when the sequence is exhausted, so a quantified GROUP can
    try more repetitions / stop in preference order (greedy: more
    first; reluctant: stop first) and still hand control back to the
    enclosing sequence — the NFA's branch exploration
    (flink-cep NFA.java computeNextStates) without materialized
    state sharing, which a sorted in-memory partition doesn't need.
    An empty group repetition (no rows consumed) is rejected to keep
    the search finite."""

    def within_ok(p):
        return within is None or ts[p] - ts[start] <= within

    def match_nodes(nodes, k, pos, acc, cont):
        if k == len(nodes):
            return cont(pos, acc)
        node = nodes[k]
        if node[0] == "var":
            _, variables, lo, hi, lazy, leaf_id = node
            fl = leaf_flags[leaf_id]
            run = 0
            p = pos
            limit = n if hi is None else min(n, pos + hi)
            while (
                p < limit
                and fl[p]
                and within_ok(p)
                and (nav is None or nav.check(variables, p, pos, acc))
            ):
                run += 1
                p += 1
            counts = (
                range(run, lo - 1, -1) if not lazy else range(lo, run + 1)
            )
            for c in counts:
                res = match_nodes(
                    nodes,
                    k + 1,
                    pos + c,
                    acc + [(leaf_id, list(range(pos, pos + c)))],
                    cont,
                )
                if res is not None:
                    return res
            return None
        if node[0] == "altseq":
            # PERMUTE expansion: try each argument ordering in
            # preference order; the first ordering that lets the REST
            # of the enclosing sequence match wins.
            _, alternatives = node
            for alt in alternatives:
                res = match_nodes(
                    alt,
                    0,
                    pos,
                    acc,
                    lambda p2, a2: match_nodes(nodes, k + 1, p2, a2, cont),
                )
                if res is not None:
                    return res
            return None
        _, children, lo, hi, lazy = node

        def rep(pos2, cnt, acc2):
            def stop():
                if cnt < lo:
                    return None
                return match_nodes(nodes, k + 1, pos2, acc2, cont)

            def more():
                if hi is not None and cnt >= hi:
                    return None
                return match_nodes(
                    children,
                    0,
                    pos2,
                    acc2,
                    lambda p3, a3: rep(p3, cnt + 1, a3)
                    if p3 > pos2
                    else None,
                )

            first, second = (more, stop) if not lazy else (stop, more)
            res = first()
            return res if res is not None else second()

        return rep(pos, 0, acc)

    return match_nodes(
        ast, 0, start, [], lambda p, a: (p, a) if p > start else None
    )


def _attribute_assign(assign, leaves, var_flags) -> dict[str, list[int]]:
    """Assign each consumed row to its pattern variable (first member
    of the leaf's alternation whose DEFINE held on that row)."""
    var_rows: dict[str, list[int]] = {}
    for leaf_id, idxs in assign:
        variables = leaves[leaf_id][1]
        for ix in idxs:
            for v in variables:
                if var_flags[v][ix]:
                    var_rows.setdefault(v, []).append(ix)
                    break
    for v in var_rows:
        var_rows[v].sort()
    return var_rows


def _ast_matches(
    leaf_flags, ast, leaves, n: int, ts=None, within=None,
    skip: str = "past_last_row", skip_var=None, var_flags=None, nav=None,
):
    """Yield (start, assign) matches in scan order with the AFTER
    MATCH strategies of :func:`_greedy_matches`, over the nested AST."""
    i = 0
    while i < n:
        res = _match_at(ast, i, n, leaf_flags, ts, within, nav=nav)
        if res is None:
            i += 1
            continue
        _, assign = res
        yield i, assign
        consumed = [ix for _, lst in assign for ix in lst]
        if skip == "to_next_row":
            i += 1
        elif skip.startswith(("to_first:", "to_last:")):
            var_rows = _attribute_assign(assign, leaves, var_flags).get(
                skip_var, []
            )
            if not var_rows:
                i = (max(consumed) if consumed else i) + 1
            else:
                nxt = (
                    var_rows[0]
                    if skip.startswith("to_first:")
                    else var_rows[-1]
                )
                if nxt <= i:
                    raise ValueError(
                        f"AFTER MATCH {skip} would re-enter the match "
                        "start — infinite loop"
                    )
                i = nxt
        else:
            i = (max(consumed) if consumed else i) + 1


def _greedy_matches(
    step_flags, steps: list[Step], n: int, ts=None, within=None,
    skip: str = "past_last_row", skip_var=None, var_flags=None,
):
    """Yield (start, per-step index lists) matches in scan order
    (greedy with backtracking).

    ``skip``: AFTER MATCH strategy (reference
    flink-cep AfterMatchSkipStrategy.java / NFA.java) —
    ``past_last_row`` (default: next search resumes after the match's
    last consumed row), ``to_next_row`` (resumes at start+1, so
    matches may OVERLAP — the sliding-funnel counting mode),
    ``to_first:<var>`` / ``to_last:<var>`` (resume at the first/last
    row the match ATTRIBUTED to ``<var>`` — attribution, not raw
    DEFINE flags: a row whose DEFINE also holds for ``<var>`` but
    that the match consumed as another variable does not count;
    ``skip_var``/``var_flags`` must then be given). Like the
    reference's SkipToFirstStrategy, a resume position at the match
    start would loop forever and raises.

    ``ts``/``within``: the reference's ``Pattern.within()`` NFA
    timeout (NFA.java windowTime) — a branch may only consume row
    ``p`` while ``ts[p] - ts[start] <= within``, so backtracking
    naturally finds the matches that fit the window instead of
    rejecting whole matches after the fact."""

    def try_match(start: int):
        def go(step_idx: int, pos: int, acc):
            if step_idx == len(steps):
                return acc if pos > start else None
            _, lo, hi, lazy = steps[step_idx]
            fl = step_flags[step_idx]
            run = 0
            p = pos
            limit = n if hi is None else min(n, pos + hi)
            while (
                p < limit
                and fl[p]
                and (within is None or ts[p] - ts[start] <= within)
            ):
                run += 1
                p += 1
            # greedy tries the longest take first and shrinks;
            # reluctant (lazy) tries the shortest and grows
            counts = range(run, lo - 1, -1) if not lazy else range(lo, run + 1)
            for k in counts:
                res = go(
                    step_idx + 1,
                    pos + k,
                    acc + [list(range(pos, pos + k))],
                )
                if res is not None:
                    return res
            return None

        return go(0, start, [])

    i = 0
    while i < n:
        m = try_match(i)
        if m is None:
            i += 1
            continue
        yield i, m
        if skip == "to_next_row":
            i += 1  # AFTER MATCH SKIP TO NEXT ROW: overlapping matches
        elif skip.startswith(("to_first:", "to_last:")):
            var_rows = sorted(
                _attribute(m, steps, var_flags).get(skip_var, [])
            )
            if not var_rows:
                # variable unmatched (optional step): past last row
                i = max((ix for lst in m for ix in lst), default=i) + 1
            else:
                nxt = (
                    var_rows[0]
                    if skip.startswith("to_first:")
                    else var_rows[-1]
                )
                if nxt <= i:
                    # resuming at/before the match start loops forever —
                    # the reference throws here too
                    # (AfterMatchSkipStrategy SKIP_TO_FIRST on the
                    # pattern's first element)
                    raise ValueError(
                        f"AFTER MATCH {skip} would re-enter the match "
                        "start — infinite loop"
                    )
                i = nxt
        else:
            last_row = max((ix for lst in m for ix in lst), default=i)
            i = last_row + 1  # AFTER MATCH SKIP PAST LAST ROW


def _ts_and_window(series, within):
    """(order-by values, scaled window). Datetime columns compare in
    exact int64 nanoseconds (``within`` given in seconds); numeric
    columns compare raw (``within`` in the column's own units) — no
    float rounding at the window boundary either way."""
    import numpy as np

    arr = series.to_numpy()
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[ns]").astype("int64"), int(within * 1e9)
    return arr, within


def _min_completion_bound(leaves) -> int:
    """Upper bound on the rows any minimal match completion can still
    need from an intermediate matcher state. Every supported
    quantifier has ``lo <= 1`` (?, *, +, or none), so a minimal
    completion path visits each leaf at most once — bound =
    ``len(leaves)``."""
    return len(leaves)


def _ast_probe(ast, leaves, start, n, leaf_flags, ts=None, within=None,
               future_ts=None):
    """Preference-order match at ``start`` over the buffer EXTENDED
    with hypothetical rows on which every leaf DEFINE holds, stamped
    with the earliest possible future event time — the last buffered
    row's, floored by ``future_ts`` (the current watermark in the
    order column's scaled domain) when given: rows at or below the
    watermark are dropped by the stateful operator, so no future row
    can carry an earlier time. Returns
    (probe_result_or_None, consumed_future: bool).

    Because existing rows' flags are fixed, the probe answers both
    streaming-emission questions exactly (NFA.java pending-state
    test): a COMPLETED match is final iff the probe does not consume
    a hypothetical row (the matcher's exploration over positions < n
    is identical, so the winning match only changes if it reaches
    the appended rows); a FAILED start stays dead forever iff even
    the probe fails. The probe depth covers any one-step continuation
    plus its minimal completion."""
    import numpy as np

    k = _min_completion_bound(leaves) + 1
    ext = [np.append(fl, [True] * k) for fl in leaf_flags]
    if ts is not None:
        stamp = ts[n - 1] if future_ts is None else max(ts[n - 1], future_ts)
        ts_ext = np.append(ts, [stamp] * k)
    else:
        ts_ext = None
    res = _match_at(ast, start, n + k, ext, ts_ext, within)
    if res is None:
        return None, False
    return res, any(ix >= n for _, lst in res[1] for ix in lst)


def _ast_extendable(ast, leaves, start, n, leaf_flags, ts=None, within=None,
                    future_ts=None):
    """Could FUTURE rows extend a match anchored at ``start``? (See
    :func:`_ast_probe` — this is its consumed-future bit.)"""
    _, consumed_future = _ast_probe(
        ast, leaves, start, n, leaf_flags, ts, within, future_ts
    )
    return consumed_future


def _frontier_scan(
    ast, leaves, leaf_flags, n, ts, win,
    after_match, skip_var, var_flags, finalize, future_ts=None,
):
    """One streaming pass of the overlap-capable skip modes: walk
    start positions with the batch skip semantics; classify each
    start via :func:`_ast_probe` as dead / final / unresolved and
    stop at the first unresolved one. Returns
    ``([(assign, var_rows), ...], frontier)`` — emissions in match
    order plus the buffer index the cross-batch tail starts at."""
    out = []
    i = 0
    while i < n:
        cur = _match_at(ast, i, n, leaf_flags, ts, win)
        if not finalize:
            probe, fut = _ast_probe(
                ast, leaves, i, n, leaf_flags, ts, win, future_ts
            )
            if (cur is None and probe is not None) or (
                cur is not None and fut
            ):
                return out, i  # unresolved: future rows matter
        if cur is None:
            i += 1
            continue
        _, assign = cur
        var_rows = _attribute_assign(assign, leaves, var_flags)
        out.append((assign, var_rows))
        consumed = [ix for _, lst in assign for ix in lst]
        if after_match == "to_next_row":
            i += 1
        else:  # to_first:/to_last:
            sv = var_rows.get(skip_var, [])
            if not sv:
                i = (max(consumed) if consumed else i) + 1
            else:
                nxt = (
                    sv[0] if after_match.startswith("to_first:") else sv[-1]
                )
                if nxt <= i:
                    raise ValueError(
                        f"AFTER MATCH {after_match} would re-enter the "
                        "match start — infinite loop"
                    )
                i = nxt
    return out, i


def _match_extendable(m, steps: list[Step]) -> bool:
    """Could a FUTURE row extend this completed match? True when the
    last consumed step has remaining capacity or any later
    (necessarily optional) step exists — the NFA-state test for
    whether emission must wait (reference: NFA.java pending states)."""
    last_consumed = max(
        (k for k in range(len(steps)) if m[k]), default=None
    )
    if last_consumed is None:
        return True
    _, _, hi, _ = steps[last_consumed]
    if hi is None or len(m[last_consumed]) < hi:
        return True
    return last_consumed < len(steps) - 1


def _attribute(m, steps: list[Step], var_flags) -> dict[str, list[int]]:
    """Assign each consumed row to its pattern variable (first member
    of the step's alternation whose DEFINE held on that row)."""
    var_rows: dict[str, list[int]] = {}
    for k, (variables, _, _, _) in enumerate(steps):
        for ix in m[k]:
            for v in variables:
                if var_flags[v][ix]:
                    var_rows.setdefault(v, []).append(ix)
                    break
    return var_rows


def _measure_record(var_rows, meas_items, data):
    """first|last positional (with an optional logical offset encoded
    as ``first:n`` / ``last:n`` — the reference's FIRST(A.col, n)
    n-th-row navigation, NULL when out of range), count, and the
    numeric folds sum|min|max|avg over a variable's matched rows (the
    cep_pattern._measure_value contract); unmatched variable: NULL
    (count -> 0)."""
    rec = {}
    for out_col, (var, fn, col) in meas_items:
        if fn == "classifier":
            # CLASSIFIER() under one-row-per-match FINAL semantics
            # (FlinkSqlOperatorTable.java:995 re-exports the SQL:2016
            # operator): the name of the variable that matched the
            # LAST row of the match. NULL only for an all-optional
            # empty match.
            last = [(idxs[-1], v) for v, idxs in var_rows.items() if idxs]
            rec[out_col] = max(last)[1] if last else None
            continue
        idxs = var_rows.get(var, [])
        if fn == "count":
            rec[out_col] = len(idxs)
        elif not idxs:
            rec[out_col] = None
        elif fn == "first":
            rec[out_col] = data[col][idxs[0]]
        elif fn == "last":
            rec[out_col] = data[col][idxs[-1]]
        elif fn.startswith(("first:", "last:")):
            base, off = fn.split(":")
            n = int(off)
            if n >= len(idxs):
                rec[out_col] = None
            else:
                ix = idxs[n] if base == "first" else idxs[-1 - n]
                rec[out_col] = data[col][ix]
        elif fn in ("sum", "min", "max", "avg"):
            vals = [data[col][i] for i in idxs]
            if fn == "sum":
                rec[out_col] = sum(vals)
            elif fn == "min":
                rec[out_col] = min(vals)
            elif fn == "max":
                rec[out_col] = max(vals)
            else:
                rec[out_col] = sum(vals) / len(vals)
        else:
            raise ValueError(f"unsupported measure fn: {fn}")
    return rec


def _sql_to_py(body: str) -> str:
    """Rewrite a (simple) SQL boolean expression to Python syntax for
    the DEFINE-navigation evaluator: AND/OR/NOT, '=' / '<>', TRUE /
    FALSE. Arithmetic and comparisons are shared syntax."""
    s = re.sub(r"<>", "!=", body)
    s = re.sub(r"(?<![<>!=])=(?!=)", "==", s)
    s = re.sub(r"\bAND\b", "and", s, flags=re.IGNORECASE)
    s = re.sub(r"\bOR\b", "or", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNOT\b", "not", s, flags=re.IGNORECASE)
    s = re.sub(r"\bTRUE\b", "True", s, flags=re.IGNORECASE)
    s = re.sub(r"\bFALSE\b", "False", s, flags=re.IGNORECASE)
    return s


def _nav_token_re(step_vars: list[str]) -> "re.Pattern":
    # longest var first so 'AB' wins over 'A' in first_AB_v
    alts = "|".join(
        re.escape(v) for v in sorted(step_vars, key=len, reverse=True)
    )
    return re.compile(
        rf"\b(first|last|sum|count|avg|min|max)_({alts})_(\w+)\b"
    )


class _NavCtx:
    """DEFINE-time FIRST/LAST navigation AND running aggregates
    (SUM/COUNT/AVG/MIN/MAX over the in-progress binding — the
    reference's MatchCodeGenerator.scala aggregate code paths,
    exercised by MatchRecognizeITCase's `SUM(A.price) < 30` cases): a
    pattern variable's condition may compare the current row against
    the first/last row, or a running fold, of a variable already
    bound in the IN-PROGRESS match. Evaluated per candidate row in
    the matcher (the binding is only known there) — the static,
    navigation-free DEFINEs stay JVM-side booleans as before.

    SQL running semantics: the current row is tentatively bound to
    the variable under test, so LAST(X.col) inside X's own DEFINE is
    the current row, FIRST(X.col) the start of its run, and
    SUM(X.col) includes the current row; navigation/folds over a
    variable with no bound rows yet are NULL -> condition false
    (COUNT over nothing is 0, the SQL rule).
    """

    def __init__(self, nav_bodies, leaves, pdf, leaf_var):
        self._bodies = nav_bodies  # var -> (code, plain_cols, nav_refs)
        self._leaf_var = leaf_var  # leaf_id -> single member var
        self._data = {}
        for _, (_, plain, refs) in nav_bodies.items():
            for c in plain | {r[3] for r in refs}:
                if c not in self._data:
                    self._data[c] = pdf[c].to_numpy()

    def check(self, variables, p, pos, acc) -> bool:
        body = self._bodies.get(variables[0])
        if body is None:
            return True
        code, plain, refs = body
        data = self._data
        env = {c: data[c][p] for c in plain}
        for name, kind, nav_var, nav_col in refs:
            rows = [
                ix
                for lid, lst in acc
                if self._leaf_var[lid] == nav_var
                for ix in lst
            ]
            if nav_var == variables[0]:
                rows += list(range(pos, p + 1))  # tentative run + current
            if kind == "count":
                env[name] = len(rows)  # COUNT over nothing is 0
                continue
            if not rows:
                return False  # navigation/fold over nothing is NULL
            if kind == "first":
                env[name] = data[nav_col][rows[0]]
            elif kind == "last":
                env[name] = data[nav_col][rows[-1]]
            else:
                vals = [data[nav_col][ix] for ix in rows]
                if kind == "sum":
                    env[name] = sum(vals)
                elif kind == "min":
                    env[name] = min(vals)
                elif kind == "max":
                    env[name] = max(vals)
                else:  # avg
                    env[name] = sum(vals) / len(vals)
        try:
            return bool(eval(code, {"__builtins__": {}}, env))  # noqa: S307
        except TypeError:  # NULL operand in a comparison
            return False


def _prepare(df, partition_by, order_by, pattern, defines, measures, tiebreak,
             allow_prev: bool, allow_nav: bool = False):
    """Shared DEFINE evaluation: parse the pattern, evaluate every
    DEFINE into a JVM-side boolean flag column, and project down to
    the columns the matcher needs. Returns the parsed (ast, leaves)
    pair — callers needing the flat-step view (streaming) convert via
    :func:`_flat_steps`.

    ``allow_prev``: True (batch — PREV via a lag window), False
    (reject prev_ defines), or ``"defer"`` (streaming — prev_-using
    defines are NOT evaluated JVM-side; they come back in the extra
    ``deferred`` return value as {var: body} and the worker evaluates
    them over the buffered rows, where the event-time-sorted previous
    row actually exists). With deferral, ALL source columns stay in
    ``slim`` (a deferred body may reference any of them).
    """
    ast, leaves = _parse_ast(pattern)
    step_vars = sorted({v for _, variables, *_ in leaves for v in variables})
    missing = [v for v in step_vars if v not in defines]
    if missing:
        raise ValueError(f"pattern vars without DEFINE: {missing}")

    order_cols = [order_by] + ([tiebreak] if tiebreak else [])

    # DEFINE-time FIRST/LAST navigation: first_V_col / last_V_col
    # pseudo-references (the SQL surface rewrites FIRST(V.col) to
    # these). Such DEFINEs can't be evaluated row-wise JVM-side —
    # they depend on the in-progress binding — so they become dynamic
    # conditions checked inside the matcher (_NavCtx).
    nav_re = _nav_token_re(step_vars) if step_vars else None
    nav_bodies: dict[str, tuple] = {}
    if nav_re is not None:
        for var, body in defines.items():
            refs = []
            for m in nav_re.finditer(body):
                kind, nav_var, nav_col = m.group(1), m.group(2), m.group(3)
                if nav_col not in df.columns:
                    raise ValueError(
                        f"navigation {m.group(0)!r}: column {nav_col!r} "
                        "not in the input"
                    )
                refs.append((m.group(0), kind, nav_var, nav_col))
            if not refs:
                continue
            if not allow_nav:
                raise ValueError(
                    "FIRST()/LAST() navigation in DEFINE requires the "
                    "batch matcher (match_recognize); the streaming path "
                    f"does not support it (condition: {body!r})"
                )
            code = compile(_sql_to_py(body), "<nav-define>", "eval")
            ref_names = {r[0] for r in refs}
            plain = {
                nm
                for nm in code.co_names
                if nm not in ref_names and nm in df.columns
            }
            unknown = [
                nm
                for nm in code.co_names
                if nm not in ref_names and nm not in df.columns
            ]
            if unknown:
                raise ValueError(
                    f"navigation DEFINE references unknown names {unknown} "
                    f"(condition: {body!r}) — only input columns, literals "
                    "and FIRST/LAST references are supported"
                )
            nav_bodies[var] = (code, plain, refs)
    for _, variables, *_ in leaves:
        if len(variables) > 1 and any(v in nav_bodies for v in variables):
            raise ValueError(
                "FIRST()/LAST() navigation is not supported on "
                f"alternation members: {variables}"
            )

    prev_cols = sorted(
        {m for body in defines.values() for m in re.findall(r"prev_(\w+)", body)}
    )
    deferred: dict[str, str] = {}
    enriched = df
    if prev_cols:
        if allow_prev is True:
            w = Window.partitionBy(*partition_by).orderBy(
                *[F.col(c) for c in order_cols]
            )
            for c in prev_cols:
                enriched = enriched.withColumn(f"prev_{c}", F.lag(c).over(w))
        elif allow_prev == "defer":
            deferred = {
                var: body
                for var, body in defines.items()
                if re.search(r"prev_\w+", body)
            }
        else:
            raise ValueError(
                "PREV() (prev_ columns) requires a batch frame — lag over "
                "an unbounded stream is not expressible"
            )

    flag_names = {}
    for var, body in defines.items():
        flag = f"__m_{var}"
        flag_names[var] = flag
        if var in nav_bodies:
            # whole condition rides the matcher-side dynamic check
            enriched = enriched.withColumn(flag, F.lit(True))
        elif var not in deferred:
            enriched = enriched.withColumn(flag, F.expr(body))

    meas_cols = sorted(
        {
            col
            for _, fn, col in measures.values()
            if fn not in ("count", "classifier")
        }
    )
    nav_cols = sorted(
        {c for _, plain, refs in nav_bodies.values()
         for c in plain | {r[3] for r in refs}}
    )
    keep = list(
        dict.fromkeys(
            partition_by
            + order_cols
            + meas_cols
            + nav_cols
            + (
                [c for c in df.columns]  # deferred bodies may use any col
                if deferred
                else []
            )
            + [flag_names[v] for v in flag_names if v not in deferred]
        )
    )
    slim = enriched.select(*keep)

    out_fields = [slim.schema[k] for k in partition_by]
    out_fields.append(StructField("match_seq", LongType()))
    for out_col, (var, fn, col) in measures.items():
        if fn == "count":
            out_fields.append(StructField(out_col, LongType()))
        elif fn == "classifier":
            from pyspark.sql.types import StringType

            out_fields.append(StructField(out_col, StringType()))
        elif fn == "avg":
            from pyspark.sql.types import DoubleType

            out_fields.append(StructField(out_col, DoubleType()))
        else:
            out_fields.append(StructField(out_col, slim.schema[col].dataType))
    out_schema = StructType(out_fields)
    return (
        (ast, leaves),
        order_cols,
        flag_names,
        meas_cols,
        slim,
        out_schema,
        deferred,
        nav_bodies,
    )


def _flat_steps(ast, leaves) -> list[Step]:
    """Flat-step view for the streaming state machine's fast path
    (patterns without nested groups)."""
    if _has_groups(ast):
        raise ValueError(
            "pattern has nested groups — no flat-step view "
            "(streaming routes these through the AST matcher)"
        )
    return [(v, lo, hi, lazy) for _, v, lo, hi, lazy, _ in leaves]


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    defines: dict[str, str],
    measures: dict[str, tuple[str, str, str]],
    tiebreak: str | None = None,
    within: float | None = None,
    after_match: str = "past_last_row",
) -> DataFrame:
    """MATCH_RECOGNIZE subset (batch).

    pattern: variable sequence with greedy quantifiers and alternation
    groups, e.g. ``"A (B|E)+ C"``. Every variable must appear in
    ``defines``.

    defines: var → Spark SQL boolean expression over the row's
    columns; ``prev_<col>`` pseudo-columns give PREV() access.

    measures: out_col → (var, fn, col) with fn ∈ first|last|count|
    sum|min|max|avg|classifier (count ignores col; avg emits DOUBLE;
    classifier ignores var AND col — it emits the name of the
    variable that matched the final row, SQL:2016 CLASSIFIER() under
    one-row-per-match FINAL semantics). The output
    carries the partition keys, a per-partition ``match_seq``, and
    the measures.

    within: max seconds from a match's first to last row — the
    reference's ``Pattern.within()`` (flink-cep NFA.java windowTime);
    branches that would exceed the window are pruned during search.

    after_match: AFTER MATCH SKIP strategy (reference flink-cep
    AfterMatchSkipStrategy.java) — ``past_last_row`` (default),
    ``to_next_row`` (overlapping matches, the sliding-funnel count),
    or ``to_first:<var>`` / ``to_last:<var>`` (resume at that
    variable's first/last matched row — SKIP TO FIRST/LAST <var>).
    """
    skip_var = None
    if after_match.startswith(("to_first:", "to_last:")):
        skip_var = after_match.split(":", 1)[1]
        if skip_var not in defines:
            raise ValueError(
                f"after_match variable {skip_var!r} has no DEFINE"
            )
    elif after_match not in ("past_last_row", "to_next_row"):
        raise ValueError(f"unsupported after_match: {after_match!r}")
    import pandas as pd

    (
        (ast, leaves),
        order_cols,
        flag_names,
        meas_cols,
        slim,
        out_schema,
        _,
        nav_bodies,
    ) = _prepare(
        df, partition_by, order_by, pattern, defines, measures, tiebreak,
        allow_prev=True, allow_nav=True,
    )
    meas_items = list(measures.items())
    leaf_var = {lid: variables[0] for _, variables, *_r, lid in leaves}

    def match_one_key(pdf: "pd.DataFrame") -> list[dict]:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        var_flags = {
            v: _bool_col(pdf[f]) for v, f in flag_names.items()
        }
        leaf_flags = []
        for _, variables, *_ in leaves:
            fl = var_flags[variables[0]]
            for v in variables[1:]:
                fl = fl | var_flags[v]
            leaf_flags.append(fl)
        n = len(pdf)
        data = {c: pdf[c].to_numpy() for c in meas_cols}
        part_vals = {k: pdf[k].iloc[0] for k in partition_by} if n else {}
        ts, win = (
            _ts_and_window(pdf[order_by], within)
            if within is not None
            else (None, None)
        )

        nav = (
            _NavCtx(nav_bodies, leaves, pdf, leaf_var) if nav_bodies else None
        )
        rows = []
        seq = 0
        for _start, assign in _ast_matches(
            leaf_flags, ast, leaves, n, ts, win, skip=after_match,
            skip_var=skip_var, var_flags=var_flags, nav=nav,
        ):
            seq += 1
            rec = dict(part_vals)
            rec["match_seq"] = seq
            rec.update(
                _measure_record(
                    _attribute_assign(assign, leaves, var_flags),
                    meas_items,
                    data,
                )
            )
            rows.append(rec)
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


def _eoi_epoch_ms(x) -> int:
    """Epoch-ms of an ``end_of_input_ts`` marker: a datetime (naive =
    session-UTC, matching spark.sql.session.timeZone) or a number of
    epoch seconds (the ``timestamp_seconds`` convention)."""
    import calendar
    import datetime

    if isinstance(x, datetime.datetime):
        if x.tzinfo is not None:
            return int(x.timestamp() * 1000)
        return calendar.timegm(x.timetuple()) * 1000 + x.microsecond // 1000
    return int(float(x) * 1000)


def stream_match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    defines: dict[str, str],
    measures: dict[str, tuple[str, str, str]],
    tiebreak: str | None = None,
    max_tail: int = 10_000,
    within: float | None = None,
    flush_on_timeout: bool = False,
    after_match: str = "past_last_row",
    end_of_input_ts=None,
) -> DataFrame:
    """STREAMING MATCH_RECOGNIZE with cross-batch partial-match state
    (the reference's NFA + SharedBuffer.java:54 on
    ``applyInPandasWithState``).

    after_match: every batch strategy (AfterMatchSkipStrategy.java) —
    ``past_last_row`` (default, the consuming fast path),
    ``to_next_row`` (overlapping matches), ``to_first:<var>`` /
    ``to_last:<var>``. The overlap-capable modes use a FRONTIER
    emission rule: per start position, the all-true future-row probe
    (:func:`_ast_probe`) classifies it as dead (failed, and no future
    rows can complete it — flags of existing rows are fixed), final
    (matched, probe can't change it → emit), or unresolved (held, or
    failed-but-future-completable) — emission stops at the first
    unresolved start so match order and numbering stay exactly the
    batch semantics, and the tail keeps rows from that frontier on.
    Dead prefixes advance the frontier, so no-match state drains;
    with ``within``, far-future rows kill stale viable starts through
    the probe's window check (the overlap modes skip the separate
    tail prune — a held complete match may legally contain rows older
    than the window of the newest row).

    Per key, state holds (match_seq, unconsumed tail rows). Each
    micro-batch: tail + new rows are re-sorted by event time, the
    matcher runs (flat-step fast path for group-free patterns; the
    batch AST backtracker for nested pattern groups — ``A (B C)+ D``,
    GroupPattern.java / nested cases of MatchRecognizeITCase), CLOSED
    matches emit (append mode), and the rows after the last emitted
    match — including any still-extendable held match — become the
    new tail. Whether a grouped match ending at the buffer's last row
    is closed is decided by an all-true future-row probe
    (:func:`_ast_extendable`) — exact under greedy/reluctant
    preference. ``max_tail`` hard-caps state per key (oldest rows
    dropped; the watermark analog of the reference's state TTL).

    within: ``Pattern.within()`` in seconds — besides constraining
    matches, it PRUNES tail state: a tail row older than
    ``max_seen_ts - within`` cannot co-occur in a window with any
    newer row, so it is dropped (the reference's NFA state cleanup on
    watermark advance, NFA.java windowTime). Held partial matches are
    never pruned — their rows are within the window of the newest row
    by construction. This turns unbounded no-match state into bounded
    state without ``max_tail`` heuristics.

    flush_on_timeout: watermark-driven finalization of held matches
    (the reference NFA keeps partial matches alive indefinitely —
    SharedBuffer.java — and finalizes them only when the window
    expires on watermark advance, or when the bounded source's
    Watermark.MAX_WATERMARK closes every computation). When True,
    keys holding tail state arm an event-time timeout; a timeout
    firing MID-STREAM (the watermark moved while the key idled one
    micro-batch) emits ONLY what that watermark finalizes — the
    extendability probe runs with "future rows carry event time >=
    watermark", so a held match whose ``within`` window the watermark
    has closed emits, and everything else (including the key's
    partial-match tail) STAYS in state; a key with rows in batches 1
    and 3 but none in batch 2 keeps its cross-gap matches.
    ``end_of_input_ts`` is the MAX_WATERMARK analog: once the
    watermark reaches it (e.g. driven by a far-future sentinel batch
    — ``stream_table_split(sentinel_rows=...)``), held matches are
    finalized exactly like batch ``match_recognize`` and state drops.
    Patterns without ``within`` arm their timer directly at
    ``end_of_input_ts`` (a mid-stream watermark can never finalize
    them, so idle keys cost zero Python invocations per batch);
    without BOTH ``within`` and ``end_of_input_ts`` a held match is
    never finalized (the documented reference semantics). REQUIRES
    the input to carry ``withWatermark`` (event-time timeouts).

    PREV() support: DEFINEs referencing ``prev_<col>`` are deferred to
    the worker — the event-time-sorted previous row only exists in the
    per-key buffer. Bodies are evaluated by an embedded DuckDB over
    the pandas frame (keep them to portable SQL: comparisons,
    arithmetic, AND/OR; requires duckdb importable on executors). One
    CONTEXT row (the last consumed row, never matchable) rides in
    state so the first row after an emitted match still evaluates
    PREV against its true predecessor. Within-window pruning can drop
    a context row older than the window — PREV is then NULL, exactly
    as if the predecessor had expired from NFA state.
    """
    import pandas as pd

    (
        (ast, leaves),
        order_cols,
        flag_names,
        meas_cols,
        slim,
        out_schema,
        deferred,
        _nav,
    ) = _prepare(
        df, partition_by, order_by, pattern, defines, measures, tiebreak,
        allow_prev="defer",
    )
    # flat-step fast path for group-free patterns; nested pattern
    # groups (``A (B C)+ D`` — GroupPattern.java) run the same AST
    # backtracker the batch path uses, with the probe-based hold test
    # (_ast_extendable) deciding emission vs. cross-batch hold
    skip_var = None
    if after_match.startswith(("to_first:", "to_last:")):
        skip_var = after_match.split(":", 1)[1]
        if skip_var not in defines:
            raise ValueError(f"after_match variable {skip_var!r} has no DEFINE")
    elif after_match not in ("past_last_row", "to_next_row"):
        raise ValueError(f"unsupported after_match: {after_match!r}")
    # overlap-capable skip modes always take the AST/frontier path
    # (the AST matcher handles flat patterns too)
    has_groups = _has_groups(ast)
    overlap = after_match != "past_last_row"
    steps = None if (has_groups or overlap) else _flat_steps(ast, leaves)
    meas_items = list(measures.items())
    prev_needed = sorted(
        {m for body in deferred.values() for m in re.findall(r"prev_(\w+)", body)}
    )
    if deferred:
        # streaming PREV: the previous event-time row only exists in
        # the worker's sorted (context + tail + batch) buffer, so
        # prev_-using DEFINEs are evaluated there (embedded DuckDB on
        # the pandas frame — requires duckdb on executors). A single
        # CONTEXT row (the last consumed row, flags forced off) rides
        # in state so the row after an emitted match still sees its
        # true predecessor.
        slim = slim.withColumn("__ctx", F.lit(False))
    data_cols = [c for c in slim.columns if c not in partition_by]
    # state field names are prefixed: a data column may itself be
    # called "seq"/anything, and duplicate names in the state schema
    # break the state encoder
    state_schema = StructType(
        [StructField("__seq", LongType())]
        + [
            StructField(f"__t_{c}", ArrayType(slim.schema[c].dataType))
            for c in data_cols
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    # pandas concat against an (object-dtype) empty tail upcasts ints
    # and bools to float — which the typed state encoder then silently
    # NULLs out. Cast every value back to its Spark-declared python
    # type before it enters state.
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType as _Long,
        ShortType,
    )

    from flink_efo_spark.pandas_compat import state_caster as _caster

    casters = {c: _caster(slim.schema[c].dataType) for c in data_cols}

    def _match_pass(key, allr, seq, finalize, wm_ms=None):
        """One matcher run over (tail + batch) rows. ``finalize``
        emits even a still-extendable match that ends at the data end
        (end-of-input semantics); otherwise it is held in the tail.
        ``wm_ms`` (mid-stream timeout flush): the current watermark —
        future rows must carry event time at or above it, so a held
        match whose ``within`` window the watermark closed is final
        and emits; everything still reachable stays held."""
        import numpy as np

        allr = allr.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        fut = None
        if (
            wm_ms is not None
            and within is not None
            and len(allr)
            and np.issubdtype(allr[order_by].to_numpy().dtype, np.datetime64)
        ):
            # _ts_and_window scales datetime order columns to int64 ns
            fut = wm_ms * 1_000_000
        if deferred and len(allr):
            for c in prev_needed:
                allr[f"prev_{c}"] = allr[c].shift(1)
            allr["__ri"] = range(len(allr))
            import duckdb

            sel = ", ".join(
                f"({body}) AS __m_{var}" for var, body in deferred.items()
            )
            con = duckdb.connect()
            try:
                con.register("__t", allr)
                fdf = con.execute(
                    f"SELECT __ri, {sel} FROM __t ORDER BY __ri"
                ).fetchdf()
            finally:
                con.close()
            for var in deferred:
                allr[f"__m_{var}"] = fdf[f"__m_{var}"].to_numpy()
            allr = allr.drop(columns=["__ri"])
        var_flags = {
            v: _bool_col(allr[f])
            for v, f in flag_names.items()
        }
        if deferred and "__ctx" in allr.columns:
            # context rows exist only as PREV sources — never matchable
            ctx_mask = _bool_col(allr["__ctx"])
            var_flags = {v: fl & ~ctx_mask for v, fl in var_flags.items()}
        n = len(allr)
        data = {c: allr[c].to_numpy() for c in meas_cols}
        ts, win = (
            _ts_and_window(allr[order_by], within)
            if within is not None
            else (None, None)
        )

        def emit(var_rows):
            nonlocal seq
            seq += 1
            rec = {k: key[i] for i, k in enumerate(partition_by)}
            rec["match_seq"] = seq
            rec.update(_measure_record(var_rows, meas_items, data))
            rows.append(rec)

        rows: list[dict] = []
        if overlap:
            # FRONTIER emission (overlap-capable skip modes) — see
            # _frontier_scan: emission stops at the first unresolved
            # start so match order and numbering equal the batch
            # matcher's.
            leaf_flags = []
            for _, variables, *_ in leaves:
                fl = var_flags[variables[0]]
                for v in variables[1:]:
                    fl = fl | var_flags[v]
                leaf_flags.append(fl)
            emissions, frontier = _frontier_scan(
                ast, leaves, leaf_flags, n, ts, win,
                after_match, skip_var, var_flags, finalize, fut,
            )
            for _assign, var_rows in emissions:
                emit(var_rows)
            new_tail = allr.iloc[frontier:]
            # no within-based tail prune here: a held COMPLETE match
            # may legally contain rows older than the newest row's
            # window; stale viable starts die through the probe's own
            # window check, which advances the frontier instead
            if deferred and frontier > 0:
                ctx = allr.iloc[[frontier - 1]].copy()
                ctx["__ctx"] = True
                new_tail = pd.concat([ctx, new_tail], ignore_index=True)
            if len(new_tail) > max_tail:
                new_tail = new_tail.iloc[-max_tail:]
            return rows, seq, new_tail

        if has_groups:
            leaf_flags = []
            for _, variables, *_ in leaves:
                fl = var_flags[variables[0]]
                for v in variables[1:]:
                    fl = fl | var_flags[v]
                leaf_flags.append(fl)
            matches = _ast_matches(leaf_flags, ast, leaves, n, ts, win)
        else:
            step_flags = []
            for variables, *_ in steps:
                fl = var_flags[variables[0]]
                for v in variables[1:]:
                    fl = fl | var_flags[v]
                step_flags.append(fl)
            matches = _greedy_matches(step_flags, steps, n, ts, win)

        consumed_through = -1
        for _start, m in matches:
            if has_groups:
                end = max((ix for _, lst in m for ix in lst), default=_start)
                # held is decided SOLELY by the probe: with
                # overlapping DEFINE flags the greedy backtracker can
                # return a match ending before n-1 while a longer one
                # anchored at the same start is still completable by
                # future rows — an `end == n-1` gate would emit the
                # short match as final and diverge from batch
                # semantics (round-5 ADVICE). The cheap gate survives
                # only on the flat-step fast path below, where the
                # greedy scan never backtracks past the buffer end.
                held = not finalize and _ast_extendable(
                    ast, leaves, _start, n, leaf_flags, ts, win, fut
                )
                var_rows = _attribute_assign(m, leaves, var_flags)
            else:
                end = max((ix for lst in m for ix in lst), default=_start)
                held = (
                    not finalize
                    and end == n - 1
                    and _match_extendable(m, steps)
                    # extension rows must fall inside the within
                    # window from the match start; a watermark past
                    # the window's end makes the match final
                    and (fut is None or fut <= ts[_start] + win)
                )
                var_rows = _attribute(m, steps, var_flags)
            if held:
                break  # held: future rows may extend it — keep in tail
            emit(var_rows)
            consumed_through = end
        new_tail = allr.iloc[consumed_through + 1 :]
        if within is not None and len(new_tail):
            # NFA window cleanup: rows that can no longer share a
            # within-window with any future row (future rows carry
            # ts >= max(max seen ts, watermark))
            ref = ts[n - 1] if fut is None else max(ts[n - 1], fut)
            tail_ts = ts[consumed_through + 1 :]
            new_tail = new_tail[tail_ts >= ref - win]
        if deferred and consumed_through >= 0:
            # carry the last consumed row as the PREV context for the
            # next batch's first tail row
            ctx = allr.iloc[[consumed_through]].copy()
            ctx["__ctx"] = True
            new_tail = pd.concat([ctx, new_tail], ignore_index=True)
        if len(new_tail) > max_tail:
            new_tail = new_tail.iloc[-max_tail:]
        return rows, seq, new_tail

    eoi_ms = (
        None if end_of_input_ts is None else _eoi_epoch_ms(end_of_input_ts)
    )
    if flush_on_timeout and within is None and eoi_ms is None:
        # Nothing can ever finalize a held match for a windowless
        # pattern with no end-of-input marker, so the flag would never
        # fire — surface the dead contract instead of silently holding
        # the caller's final matches in state forever.
        raise ValueError(
            "flush_on_timeout=True requires `within` or "
            "`end_of_input_ts`; a windowless pattern with no "
            "end-of-input marker can never finalize held matches"
        )

    def _save_tail(state, seq, new_tail) -> None:
        """Persist the tail and arm the flush timer ONLY when rows are
        actually held — an idle key without state costs zero Python
        invocations per micro-batch. ``within`` patterns re-arm at
        watermark+1 (windows close as the watermark moves); patterns
        without a window arm directly at ``end_of_input_ts`` (nothing
        mid-stream can ever finalize them)."""
        state.update(
            (
                int(seq),
                *([casters[c](v) for v in new_tail[c]] for c in data_cols),
            )
        )
        if not flush_on_timeout or not len(new_tail):
            return
        wm = state.getCurrentWatermarkMs()
        if within is not None:
            state.setTimeoutTimestamp(wm + 1)
        elif eoi_ms is not None:
            state.setTimeoutTimestamp(max(wm + 1, eoi_ms))
        # else: no window and no end-of-input marker — held matches
        # stay in state forever (the reference NFA keeps partial
        # matches alive until within expiry or MAX_WATERMARK)

    def _drop_late(pdf, state):
        """The reference CEP operator DROPS late events (CepOperator's
        ``timestamp > lastWatermark`` guard on processElement) —
        Spark's applyInPandasWithState does NOT filter its input by
        the watermark (verified on 4.1.2), so the harness enforces it.
        The boundary follows Spark's late rule (late = ts < watermark,
        equality survives), matching the probe's 'future rows carry
        ts >= watermark' floor exactly: nothing the probe ruled out
        can ever be delivered."""
        import numpy as np

        arr = pdf[order_by].to_numpy()
        if not np.issubdtype(arr.dtype, np.datetime64):
            return pdf
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us <= 0:
            return pdf
        keep = arr.astype("datetime64[us]").astype("int64") >= wm_us
        return pdf if keep.all() else pdf[keep]

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        if state.exists:
            st = state.get
            seq = st[0]
            tail = pd.DataFrame(
                {c: list(st[1 + i]) for i, c in enumerate(data_cols)}
            )
        else:
            seq = 0
            tail = pd.DataFrame({c: [] for c in data_cols})

        if flush_on_timeout and state.hasTimedOut:
            wm_ms = state.getCurrentWatermarkMs()
            if eoi_ms is not None and wm_ms >= eoi_ms:
                # MAX_WATERMARK finalization: no more rows can ever
                # arrive — emit held matches and drop the state
                rows = []
                if len(tail):
                    rows, _, _ = _match_pass(key, tail, seq, finalize=True)
                state.remove()
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)
                return
            # mid-stream idle-batch timeout: the watermark moved while
            # this key had no rows. Emit ONLY what the watermark
            # finalizes (probe with "future rows carry ts >= wm") and
            # PRESERVE the rest of the tail — a key with rows in
            # batches 1 and 3 but none in 2 must keep its cross-gap
            # partial matches (the b039442 fix, ported)
            rows = []
            new_tail = tail
            if len(tail):
                rows, seq, new_tail = _match_pass(
                    key, tail, seq, finalize=False, wm_ms=wm_ms
                )
            _save_tail(state, seq, new_tail)
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
            return

        frames = [p[data_cols] for p in pdfs if len(p)]
        if flush_on_timeout:
            frames = [f for f in (_drop_late(p, state) for p in frames)
                      if len(f)]
        if not frames and not len(tail):
            state.update((int(seq), *([] for _ in data_cols)))
            return
        parts = ([tail] if len(tail) else []) + frames
        allr = pd.concat(parts, ignore_index=True)
        rows, seq, new_tail = _match_pass(key, allr, seq, finalize=False)
        _save_tail(state, seq, new_tail)
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    out = slim.groupBy(*partition_by).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        "EventTimeTimeout" if flush_on_timeout else "NoTimeout",
    )
    out._efo_output_mode = "append"
    return out
