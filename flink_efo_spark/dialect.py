"""Flink SQL dialect shim: group-window syntax → Spark SQL.

The reference's SQL dialect exposes group windows as GROUP BY
functions — ``GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)`` with
auxiliary accessors ``TUMBLE_START`` / ``TUMBLE_END`` /
``TUMBLE_ROWTIME`` (FlinkSqlOperatorTable.java:1100-1180 in
/root/reference defines TUMBLE/HOP/SESSION + the _START/_END/
_ROWTIME/_PROCTIME auxiliaries; resolved in
WindowPropertiesRules / LogicalWindowAggregateRuleBase). Spark
expresses the same thing with the ``window()`` / ``session_window()``
table-generating expressions. This module rewrites the Flink surface
syntax to the Spark one so a reference user's SQL runs unchanged
through ``EfoSession.execute_sql``:

* ``TUMBLE(ts, INTERVAL '5' MINUTE)``        → ``window(ts, '5 minutes')``
* ``HOP(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)``
  (Flink arg order: time, *slide*, *size*)   → ``window(ts, '10 minutes', '5 minutes')``
  (Spark arg order: time, *size*, *slide*)
* ``SESSION(ts, INTERVAL '30' MINUTE)``      → ``session_window(ts, '30 minutes')``
* ``TUMBLE_START(...)`` / ``HOP_START(...)`` → ``window.start``
* ``TUMBLE_END(...)``   / ``HOP_END(...)``   → ``window.end``
* ``SESSION_START/END(...)``                 → ``session_window.start/.end``
* ``*_ROWTIME(...)``    → ``<w>.end - INTERVAL 1 MILLISECOND`` — the
  reference defines the window rowtime attribute as max timestamp of
  the window = end - 1ms (GroupWindowAggregate rowtime property).
* ``PROCTIME()``        → ``current_timestamp()``

The rewrite is purely lexical but paren-balanced: arguments may be
arbitrary expressions (nested calls, casts). Translation is the
identity on SQL that contains none of the dialect tokens, so it is
safe to apply unconditionally; string literals and quoted identifiers
are never rewritten (the scanner skips ``'...'``, ``"..."`` and
backtick spans).

Scale note: the output is ordinary Spark SQL over ``window()`` —
Catalyst plans it as a single hash aggregate over the window struct
(TUMBLE: 1 row per input; HOP: size/slide rows via Expand), the same
plan the native queries (queries.py q_window_*) produce. The shim
adds zero runtime cost.
"""

from __future__ import annotations

import re

# longest names first so TUMBLE_START wins over TUMBLE
_DIALECT_FNS = [
    "TUMBLE_ROWTIME", "TUMBLE_PROCTIME", "TUMBLE_START", "TUMBLE_END",
    "HOP_ROWTIME", "HOP_PROCTIME", "HOP_START", "HOP_END",
    "SESSION_ROWTIME", "SESSION_PROCTIME", "SESSION_START", "SESSION_END",
    "TUMBLE", "HOP", "SESSION", "PROCTIME",
]

_FN_RE = re.compile(
    r"\b(" + "|".join(_DIALECT_FNS) + r")\s*\(", re.IGNORECASE
)

_INTERVAL_RE = re.compile(
    r"^\s*INTERVAL\s+'([0-9]+)'\s+"
    r"(SECOND|MINUTE|HOUR|DAY)S?\s*$",
    re.IGNORECASE,
)

_PLURAL = {"second": "seconds", "minute": "minutes", "hour": "hours", "day": "days"}


def _interval_to_duration(arg: str) -> str:
    """``INTERVAL '5' MINUTE`` → ``'5 minutes'`` (Spark duration string)."""
    m = _INTERVAL_RE.match(arg)
    if not m:
        raise ValueError(
            f"unsupported interval in group-window call: {arg!r} "
            "(expected INTERVAL '<n>' SECOND|MINUTE|HOUR|DAY)"
        )
    n, unit = m.group(1), _PLURAL[m.group(2).lower()]
    return f"'{n} {unit}'"


def _skip_quoted(sql: str, i: int) -> int:
    """If sql[i] opens a quote span, return the index just past it."""
    q = sql[i]
    if q not in ("'", '"', "`"):
        return i
    j = i + 1
    while j < len(sql):
        if sql[j] == q:
            # '' inside a string is an escaped quote
            if q == "'" and j + 1 < len(sql) and sql[j + 1] == "'":
                j += 2
                continue
            return j + 1
        j += 1
    return j


def _find_close(sql: str, open_idx: int) -> int:
    """Index of the ``)`` balancing the ``(`` at ``open_idx``."""
    depth = 0
    i = open_idx
    while i < len(sql):
        c = sql[i]
        if c in ("'", '"', "`"):
            i = _skip_quoted(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parentheses in SQL")


def _split_args(argstr: str) -> list[str]:
    """Split top-level comma-separated arguments."""
    out, depth, cur, i = [], 0, [], 0
    while i < len(argstr):
        c = argstr[i]
        if c in ("'", '"', "`"):
            j = _skip_quoted(argstr, i)
            cur.append(argstr[i:j])
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur or out:
        out.append("".join(cur).strip())
    return out


def _render(fn: str, args: list[str]) -> str:
    fn = fn.upper()
    if fn == "PROCTIME":
        if args and args != [""]:
            raise ValueError("PROCTIME() takes no arguments")
        return "current_timestamp()"

    base = fn.split("_")[0]  # TUMBLE | HOP | SESSION
    aux = fn[len(base) + 1:] if "_" in fn else ""  # START | END | ROWTIME | PROCTIME

    if base == "HOP":
        if len(args) != 3:
            raise ValueError(f"{fn} expects (time, slide, size), got {len(args)} args")
        time_col, slide, size = args
        call = (
            f"window({time_col}, {_interval_to_duration(size)}, "
            f"{_interval_to_duration(slide)})"
        )
        col = "window"
    elif base == "TUMBLE":
        if len(args) != 2:
            raise ValueError(f"{fn} expects (time, size), got {len(args)} args")
        time_col, size = args
        call = f"window({time_col}, {_interval_to_duration(size)})"
        col = "window"
    else:  # SESSION
        if len(args) != 2:
            raise ValueError(f"{fn} expects (time, gap), got {len(args)} args")
        time_col, gap = args
        call = f"session_window({time_col}, {_interval_to_duration(gap)})"
        col = "session_window"

    if not aux:
        return call
    if aux == "START":
        return f"{col}.start"
    if aux == "END":
        return f"{col}.end"
    if aux in ("ROWTIME", "PROCTIME"):
        # reference: window rowtime attribute = maxTimestamp = end - 1ms
        # (TimeWindow.maxTimestamp(), flink-streaming-java/.../windowing/
        # windows/TimeWindow.java:~95); proctime attribute materializes
        # identically for downstream use in a bounded replay.
        return f"{col}.end - INTERVAL 1 MILLISECOND"
    raise ValueError(f"unknown auxiliary group-window function: {fn}")


def translate(sql: str) -> str:
    """Rewrite Flink group-window dialect SQL to Spark SQL.

    Identity when ``sql`` contains no dialect tokens; safe to call on
    every statement.
    """
    out = []
    i = 0
    while i < len(sql):
        c = sql[i]
        if c in ("'", '"', "`"):
            j = _skip_quoted(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        m = _FN_RE.match(sql, i)
        if m:
            open_idx = sql.index("(", m.end() - 1)
            close_idx = _find_close(sql, open_idx)
            inner = translate(sql[open_idx + 1:close_idx])  # nested calls
            args = _split_args(inner)
            out.append(_render(m.group(1), args))
            i = close_idx + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def has_dialect_tokens(sql: str) -> bool:
    return bool(_FN_RE.search(sql))
