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
    "TUMBLE", "HOP", "SESSION", "PROCTIME", "CUMULATE",
]

_FN_RE = re.compile(
    r"\b(" + "|".join(_DIALECT_FNS) + r")\s*\(", re.IGNORECASE
)

_TABLE_RE = re.compile(r"\bTABLE\s*\(", re.IGNORECASE)

# Flink SQL's LOCALTIME is a NILADIC keyword (SELECT LOCALTIME, no
# parens — Calcite SqlAbstractTimeFunction), but the engine registers
# it as an ordinary zero-arg SQL UDF (functions/registry.py), which
# Spark only resolves with parens. Rewrite the bare keyword to a
# call; \b keeps LOCALTIMESTAMP untouched and the lookahead skips
# already-parenthesized calls. (CURRENT_TIME / CURRENT_TIMESTAMP /
# CURRENT_DATE are niladic natively in Spark — no shim.)
_NILADIC_RE = re.compile(r"\b(LOCALTIME)\b(?!\s*\()", re.IGNORECASE)

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


_INTERVAL_US_UNITS = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _interval_us(arg: str) -> int:
    """``INTERVAL '5' MINUTE`` → 300000000 (epoch micros)."""
    m = _INTERVAL_RE.match(arg)
    if not m:
        raise ValueError(
            f"unsupported interval in window TVF call: {arg!r} "
            "(expected INTERVAL '<n>' SECOND|MINUTE|HOUR|DAY)"
        )
    return int(m.group(1)) * _INTERVAL_US_UNITS[m.group(2).lower()]


_TVF_MARK = "(SELECT * EXCEPT"

_DESCRIPTOR_RE = re.compile(r"^\s*DESCRIPTOR\s*\(\s*(.+?)\s*\)\s*$", re.IGNORECASE)


def _render_tvf(fn: str, args: list[str]) -> str:
    """Windowing TVF form — FLIP-145 window table-valued
    functions (public upstream Apache Flink >= 1.13:
    SqlTumbleTableFunction / SqlHopTableFunction /
    SqlCumulateTableFunction; the reference snapshot predates
    FLIP-145 and only has the GROUP BY group-window form, so this is
    forward-compat surface for users on newer Flink SQL):

        TUMBLE(TABLE t, DESCRIPTOR(ts), size [, offset])
        HOP(TABLE t, DESCRIPTOR(ts), slide, size [, offset])
        CUMULATE(TABLE t, DESCRIPTOR(ts), step, max_size [, offset])

    Each returns the input relation plus ``window_start``,
    ``window_end`` and ``window_time`` (= end - 1 ms, the window's
    rowtime attribute). Rendered as a plain Spark subquery: epoch
    micros floor arithmetic for the assignment, ``explode(sequence)``
    for HOP/CUMULATE multi-window membership — all whole-stage
    codegen expressions; the Expand fan-out (size/slide resp.
    max/step) is exactly the reference's per-window duplication.
    """
    fn = fn.upper()
    if len(args) < 3:
        raise ValueError(f"{fn} TVF expects (TABLE t, DESCRIPTOR(ts), intervals…)")
    src = re.sub(r"^\s*TABLE\s+", "", args[0], flags=re.IGNORECASE).strip()
    dm = _DESCRIPTOR_RE.match(args[1])
    if not dm:
        raise ValueError(f"{fn} TVF second arg must be DESCRIPTOR(<col>): {args[1]!r}")
    ts = dm.group(1)
    ivals = [_interval_us(a) for a in args[2:]]
    u = f"unix_micros(cast({ts} as timestamp_ltz))"

    def win_cols(start: str, end: str, drop: str) -> str:
        return (
            f"(SELECT * EXCEPT({drop}), timestamp_micros({start}) AS window_start, "
            f"timestamp_micros({end}) AS window_end, "
            f"timestamp_micros({end}) - INTERVAL 1 MILLISECOND AS window_time "
        )

    if fn == "TUMBLE":
        if len(ivals) not in (1, 2):
            raise ValueError("TUMBLE TVF expects size [, offset]")
        size, off = ivals[0], (ivals[1] if len(ivals) == 2 else 0)
        ws = f"(cast(floor(({u} - {off}) / {size}) * {size} as bigint) + {off})"
        return (
            win_cols("__ws", f"__ws + {size}", "__ws")
            + f"FROM (SELECT *, {ws} AS __ws FROM {src}))"
        )
    if fn == "HOP":
        if len(ivals) not in (2, 3):
            raise ValueError("HOP TVF expects slide, size [, offset]")
        slide, size, off = ivals[0], ivals[1], (ivals[2] if len(ivals) == 3 else 0)
        if size % slide != 0:
            raise ValueError("HOP TVF size must be a multiple of slide")
        n = size // slide
        a = f"(cast(floor(({u} - {off}) / {slide}) * {slide} as bigint) + {off})"
        return (
            win_cols(
                f"__a - __k * {slide}L",
                f"__a - __k * {slide}L + {size}",
                "__a, __k",
            )
            + f"FROM (SELECT *, {a} AS __a, "
            f"explode(sequence(0L, {n - 1}L)) AS __k FROM {src}))"
        )
    if fn == "CUMULATE":
        if len(ivals) not in (2, 3):
            raise ValueError("CUMULATE TVF expects step, max_size [, offset]")
        step, maxs, off = ivals[0], ivals[1], (ivals[2] if len(ivals) == 3 else 0)
        if maxs % step != 0:
            raise ValueError("CUMULATE TVF max_size must be a multiple of step")
        n = maxs // step
        w0 = f"(cast(floor(({u} - {off}) / {maxs}) * {maxs} as bigint) + {off})"
        kf = f"(cast(floor(({u} - {w0}) / {step}) as bigint) + 1)"
        return (
            win_cols("__w0", f"__w0 + __k * {step}L", "__w0, __k")
            + f"FROM (SELECT *, {w0} AS __w0, "
            f"explode(sequence({kf}, {n}L)) AS __k FROM {src}))"
        )
    raise ValueError(
        f"{fn} is not supported in windowing-TVF form (use the GROUP BY "
        "group-window syntax for SESSION, or session_window() directly)"
    )


def _render(fn: str, args: list[str]) -> str:
    fn = fn.upper()
    if fn == "PROCTIME":
        if args and args != [""]:
            raise ValueError("PROCTIME() takes no arguments")
        return "current_timestamp()"

    # windowing-TVF form: first argument is `TABLE <relation>`
    if args and re.match(r"^\s*TABLE\b", args[0], re.IGNORECASE):
        return _render_tvf(fn, args)
    if fn == "CUMULATE":
        raise ValueError(
            "CUMULATE exists only in windowing-TVF form: "
            "CUMULATE(TABLE t, DESCRIPTOR(ts), step, max_size)"
        )

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
        # `FROM TABLE(TUMBLE(...))` — the TVF wrapper. If the inside
        # translates to a rendered window subquery, drop the wrapper
        # (Spark has no TABLE() syntax); any other TABLE( text —
        # CREATE TABLE(...) column lists etc. — passes through.
        tm = _TABLE_RE.match(sql, i) if (i == 0 or not sql[i - 1].isalnum()) else None
        if tm:
            open_idx = sql.index("(", tm.end() - 1)
            close_idx = _find_close(sql, open_idx)
            inner = translate(sql[open_idx + 1:close_idx]).strip()
            if inner.startswith(_TVF_MARK):
                out.append(inner)
                i = close_idx + 1
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
        nm = (
            _NILADIC_RE.match(sql, i)
            if (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
            else None
        )
        if nm:
            out.append(nm.group(1) + "()")
            i = nm.end()
            continue
        out.append(c)
        i += 1
    return "".join(out)


def has_dialect_tokens(sql: str) -> bool:
    return bool(_FN_RE.search(sql))


# ---------------------------------------------------------------------------
# FOR SYSTEM_TIME AS OF — the reference's temporal-join SQL surface
# (flink-sql-parser SqlSnapshot; planned by
# StreamExecTemporalJoin.scala:51 / TemporalRowTimeJoinOperator.java).
# Rewritten to a versioned-interval join Spark SQL can plan natively:
# the build table gains [__vfrom, __vto) validity intervals via one
# LEAD window over its version key, and the probe's time attribute is
# range-tested against them. Catalyst plans this as an equi hash join
# on the version keys with the interval test as an inline join
# predicate — per probe row it scans that key's versions only, so the
# cost at 100 TB is one shuffle of each side on the key (the window
# reuses the build side's partitioning). The API path
# (operators/joins.py asof_join, union-sort-backfill, one shuffle
# total) remains the preferred scale path; this shim exists so a
# migrating user's temporal-join SQL runs verbatim.
# ---------------------------------------------------------------------------

_SYSTEM_TIME_RE = re.compile(
    r"\b(?P<jt>(?:LEFT\s+(?:OUTER\s+)?|INNER\s+)?JOIN)\s+"
    r"(?P<tbl>[A-Za-z_][\w.]*)\s+"
    r"FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?P<ts>[A-Za-z_][\w.]*(?:\s*\(\s*\))?)\s+"
    r"(?:AS\s+)?(?P<alias>[A-Za-z_]\w*)\s+ON\b",
    re.IGNORECASE,
)

# condition ends at the next clause keyword at paren depth 0; the
# (?!\s*\() lookahead keeps LEFT(x, 2) / RIGHT(x, 2) function calls
# inside the condition (they share a name with the join keywords)
_COND_END_RE = re.compile(
    r"\b(WHERE|GROUP|ORDER|HAVING|LIMIT|UNION|EXCEPT|INTERSECT|WINDOW"
    r"|QUALIFY|JOIN|LEFT|RIGHT|FULL|INNER|CROSS)\b(?!\s*\()",
    re.IGNORECASE,
)

_EQUI_RE = re.compile(
    r"^\s*([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)\s*$"
)


def _cond_span(sql: str, start: int) -> int:
    """End index of the ON condition starting at ``start``."""
    depth = 0
    i = start
    while i < len(sql):
        c = sql[i]
        if c in ("'", '"', "`"):
            i = _skip_quoted(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                return i
            depth -= 1
        elif depth == 0:
            m = _COND_END_RE.match(sql, i)
            if m and not (i > 0 and (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                return i
        i += 1
    return i


def _split_top_and(cond: str) -> list[str]:
    """Split a condition on top-level ANDs (paren- and quote-aware)."""
    parts, depth, last, i = [], 0, 0, 0
    up = cond.upper()
    while i < len(cond):
        c = cond[i]
        if c in ("'", '"', "`"):
            i = _skip_quoted(cond, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and up.startswith("AND", i)
            and (i == 0 or not (cond[i - 1].isalnum() or cond[i - 1] == "_"))
            and (
                i + 3 >= len(cond)
                or not (cond[i + 3].isalnum() or cond[i + 3] == "_")
            )
        ):
            parts.append(cond[last:i])
            i += 3
            last = i
            continue
        i += 1
    parts.append(cond[last:])
    return parts


def rewrite_system_time(sql, rowtime_of, primary_key_of=None) -> str:
    """Rewrite every ``JOIN t FOR SYSTEM_TIME AS OF x [AS] a ON cond``
    to a versioned-interval join.

    ``rowtime_of(table_name)`` must return the versioned table's time
    attribute — a column name, or ``(column, [tiebreak_cols])`` where
    the tiebreaks order equal-rowtime versions (the highest tiebreak
    wins; superseded ties get an empty validity interval). ``None``
    means the table has no registered rowtime → error, matching the
    reference's requirement that a temporal table declare a watermark.

    ``primary_key_of(table_name)`` (optional) returns the versioned
    table's declared PRIMARY KEY columns. When present, the LEAD
    validity window partitions by the PK ONLY — extra non-key
    equalities in the ON clause stay join predicates and do NOT
    fragment the version chains (a key whose non-key attribute
    changes across versions would otherwise leave stale rows with
    ``__vto IS NULL``). This matches the reference's PK-based
    temporal join (TemporalJoinRewriteWithUniqueKeyRule). Without a
    declared PK the rewrite falls back to extracting every
    equi-predicate on the versioned alias as the version key.

    ``AS OF PROCTIME()`` / a processing-time attribute selects the
    CURRENT latest version per key (``__vto IS NULL``) — the
    reference's proc-time temporal join collapsed to batch.
    """
    if "SYSTEM_TIME" not in sql.upper():
        return sql
    while True:
        m = _SYSTEM_TIME_RE.search(sql)
        if m is None:
            break
        tbl, alias, ts = m.group("tbl"), m.group("alias"), m.group("ts").strip()
        jt = " ".join(m.group("jt").split())
        cond_start = m.end()
        cond_end = _cond_span(sql, cond_start)
        cond = sql[cond_start:cond_end].strip()
        rt = rowtime_of(tbl)
        if rt is None:
            raise ValueError(
                f"FOR SYSTEM_TIME AS OF: table {tbl!r} has no registered "
                "rowtime — create it with a WATERMARK spec "
                "(EfoSession.create_table) or "
                "create_temporary_view(..., watermark=...)"
            )
        tiebreaks: list[str] = []
        if isinstance(rt, tuple):
            rt, tiebreaks = rt[0], list(rt[1] or [])
        pk = list(primary_key_of(tbl) or []) if primary_key_of else []
        if pk:
            # declared PRIMARY KEY wins: version chains partition by
            # the PK alone; other ON equalities remain predicates
            keys = pk
        else:
            keys = []
            for part in _split_top_and(cond):
                eq = _EQUI_RE.match(part)
                if not eq:
                    continue
                for side in (eq.group(1), eq.group(2)):
                    pre, dot, col = side.rpartition(".")
                    if dot and pre.lower() == alias.lower():
                        keys.append(col)
        if not keys:
            raise ValueError(
                "FOR SYSTEM_TIME AS OF: no equi-join key on the versioned "
                f"side found in ON condition {cond!r} — the reference "
                "requires a primary-key equality"
            )
        order = ", ".join([rt] + tiebreaks)
        sub = (
            f"(SELECT *, {rt} AS __vfrom, LEAD({rt}) OVER "
            f"(PARTITION BY {', '.join(keys)} ORDER BY {order}) AS __vto "
            f"FROM {tbl})"
        )
        if re.fullmatch(r"PROCTIME\s*\(\s*\)", ts, re.IGNORECASE):
            pred = f"{alias}.__vto IS NULL"
        else:
            pred = (
                f"{ts} >= {alias}.__vfrom "
                f"AND ({alias}.__vto IS NULL OR {ts} < {alias}.__vto)"
            )
        sql = (
            sql[: m.start()]
            + f"{jt} {sub} {alias} ON ({cond}) AND {pred}"
            + sql[cond_end:]
        )
    return sql


# ---------------------------------------------------------------------------
# LATERAL TABLE(tf(...)) — the reference's table-function correlate SQL
# (Calcite COLLECTION_TABLE; planned by StreamExecCorrelate.scala /
# BatchExecCorrelate.scala, exercised by CorrelateITCase; the fluent
# twin is table.py join_lateral). Rewritten to Spark's LATERAL VIEW:
#
#   FROM t, LATERAL TABLE(explode(parts)) AS x(word)
#     -> FROM t LATERAL VIEW explode(parts) x AS word
#   ... LEFT JOIN LATERAL TABLE(f(c)) AS x(w) ON TRUE
#     -> ... LATERAL VIEW OUTER f(c) x AS w
#
# The function inside must be a Spark generator (explode, posexplode,
# inline, stack, json_tuple, or a registered UDTF) — the same
# restriction the reference places on TableFunction registrations.
# Correlate is a NARROW operator in both engines: each input row
# expands in place, no shuffle.
# ---------------------------------------------------------------------------

_LATERAL_RE = re.compile(
    r"(?P<jt>,|\bCROSS\s+JOIN\b|\bLEFT\s+(?:OUTER\s+)?JOIN\b)\s*"
    r"(?:LATERAL\s+TABLE|(?P<unnest>UNNEST))\s*\(",
    re.IGNORECASE,
)

_LATERAL_ALIAS_RE = re.compile(
    r"\s*(?:AS\s+)?(?P<alias>[A-Za-z_]\w*)\s*(?:\((?P<cols>[^)]*)\))?",
    re.IGNORECASE,
)


def rewrite_lateral_table(sql: str) -> str:
    """Rewrite every ``LATERAL TABLE(f(...))`` correlate and every
    FROM-clause ``UNNEST(arr)`` (UnnestITCase surface — Spark SQL has
    no UNNEST join; it becomes ``explode``) to Spark's ``LATERAL
    VIEW``; identity when the tokens are absent. LEFT JOIN forms
    require the reference's mandatory ``ON TRUE`` and become
    ``LATERAL VIEW OUTER`` (unmatched rows kept with NULLs)."""
    while True:
        m = _LATERAL_RE.search(sql)
        if m is None:
            return sql
        open_idx = sql.index("(", m.end() - 1)
        close_idx = _find_close(sql, open_idx)
        inner = sql[open_idx + 1 : close_idx].strip()
        if m.group("unnest"):
            inner = f"explode({inner})"
        am = _LATERAL_ALIAS_RE.match(sql, close_idx + 1)
        if am is None or am.group("alias") is None:
            raise ValueError(
                "LATERAL TABLE requires an alias: "
                f"...{sql[m.start():close_idx + 1]}"
            )
        alias = am.group("alias")
        cols = am.group("cols")
        end = am.end()
        outer = ""
        if m.group("jt") not in (",",) and m.group("jt").upper().startswith(
            "LEFT"
        ):
            on_m = re.match(r"\s*ON\s+TRUE\b", sql[end:], re.IGNORECASE)
            if on_m is None:
                raise ValueError(
                    "LEFT JOIN LATERAL TABLE requires ON TRUE (the "
                    "reference rejects any other condition)"
                )
            end += on_m.end()
            outer = "OUTER "
        col_clause = (
            f" AS {', '.join(c.strip() for c in cols.split(','))}"
            if cols
            else ""
        )
        sql = (
            sql[: m.start()]
            + f" LATERAL VIEW {outer}{inner} {alias}{col_clause}"
            + sql[end:]
        )
