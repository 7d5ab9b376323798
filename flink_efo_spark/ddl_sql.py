"""Flink CREATE TABLE DDL (SQL text) → the engine's TableSpec catalog.

The reference parses ``CREATE TABLE t (...) WITH ('connector'=...)``
through its own SQL parser (flink-sql-parser SqlCreateTable.java:56,
WatermarkSpec via SqlWatermark, computed columns via SqlTableColumn;
options through the WITH clause into the connector factory). Spark's
DDL has none of WATERMARK / computed columns / connector options, so
``EfoSession.sql`` routes Flink-style CREATE TABLE statements here:
the statement is parsed LEXICALLY and lands in
:meth:`EfoSession.create_table` — the exact API a migrating user's
DDL text should reach.

Supported surface (the filesystem connector — the one this sandbox
can actually scan; other connectors name their API wrappers in the
error):

* physical columns — recorded but NOT enforced (parquet/orc/csv with
  a header are self-describing; the reference validates declared
  schema against the format at scan time, this engine trusts the
  file schema)
* ``col AS expr`` computed columns
* ``WATERMARK FOR ts AS ts - INTERVAL '5' SECOND`` (also the
  zero-delay ``WATERMARK FOR ts AS ts``)
* ``PRIMARY KEY (k [, ...]) NOT ENFORCED`` — recorded on the spec
  (used as the version key/tiebreak hint for temporal joins)
* ``PARTITIONED BY (col, ...)`` — recorded as an option
* ``WITH ('connector'='filesystem', 'path'=..., 'format'=...)``
* ``DROP TABLE [IF EXISTS] name``

* ``CREATE TABLE new [(extra cols...)] [WITH (...)] LIKE src
  [(INCLUDING/EXCLUDING/OVERWRITING ...)]`` — the SqlTableLike.java
  surface, merged per the reference's MergeTableLikeUtil strategies
  onto :meth:`EfoSession.create_table_like`'s spec-clone path.
"""

from __future__ import annotations

import re

from flink_efo_spark.dialect import _find_close, _skip_quoted

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"([A-Za-z_][\w.]*)\s*\(",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+(?:TEMPORARY\s+)?TABLE\s+(IF\s+EXISTS\s+)?"
    r"([A-Za-z_][\w.]*)\s*$",
    re.IGNORECASE,
)
_WATERMARK_RE = re.compile(
    r"^WATERMARK\s+FOR\s+([A-Za-z_]\w*)\s+AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_WM_DELAY_RE = re.compile(
    r"^([A-Za-z_]\w*)\s*-\s*INTERVAL\s*'(\d+)'\s*"
    r"(SECOND|MINUTE|HOUR|DAY)S?$",
    re.IGNORECASE,
)
_PK_RE = re.compile(
    r"^(?:CONSTRAINT\s+\w+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)"
    r"(?:\s+NOT\s+ENFORCED)?$",
    re.IGNORECASE,
)
_COMPUTED_RE = re.compile(
    r"^([A-Za-z_]\w*)\s+AS\s+(.+?)(?:\s+COMMENT\s+'[^']*')?$",
    re.IGNORECASE | re.DOTALL,
)
_METADATA_RE = re.compile(r"\bMETADATA\b", re.IGNORECASE)
_PARTITIONED_RE = re.compile(
    r"\bPARTITIONED\s+BY\s*\(([^)]*)\)", re.IGNORECASE
)
_WITH_RE = re.compile(r"\bWITH\s*\(", re.IGNORECASE)
_OPT_RE = re.compile(r"'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'")


def is_flink_create_table(sql: str) -> bool:
    """True for CREATE TABLE statements carrying Flink-only clauses
    (WITH options, WATERMARK, computed columns live inside the column
    list — the WITH clause is the reliable marker; plain Spark DDL
    passes through untouched)."""
    return bool(_CREATE_RE.match(sql)) and bool(_WITH_RE.search(sql))


def is_drop_table(sql: str) -> bool:
    return bool(_DROP_RE.match(sql))


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


def parse_watermark_delay(expr: str) -> tuple[str, str]:
    """``ts - INTERVAL '5' SECOND`` → (``ts``, ``"5 seconds"``);
    bare ``ts`` → zero delay."""
    expr = expr.strip()
    m = _WM_DELAY_RE.match(expr)
    if m:
        return m.group(1), f"{m.group(2)} {m.group(3).lower()}s"
    if re.fullmatch(r"[A-Za-z_]\w*", expr):
        return expr, "0 seconds"
    raise ValueError(
        f"unsupported WATERMARK expression: {expr!r} "
        "(expected '<col> - INTERVAL '<n>' <unit>' or bare '<col>')"
    )


def _parse_col_block(col_block: str):
    """The shared column-list parse: (watermark, primary_key, computed).
    Physical columns are recorded implicitly by the file schema."""
    watermark = None
    primary_key: list[str] = []
    computed: dict[str, str] = {}
    for item in _split_top(col_block):
        wm = _WATERMARK_RE.match(item)
        if wm:
            col, expr = wm.group(1), wm.group(2).strip()
            wcol, delay = parse_watermark_delay(expr)
            if wcol != col:
                raise ValueError(
                    f"WATERMARK FOR {col} must reference {col}, got {expr!r}"
                )
            watermark = (col, delay)
            continue
        pk = _PK_RE.match(item)
        if pk:
            primary_key = [c.strip().strip("`") for c in pk.group(1).split(",")]
            continue
        if _METADATA_RE.search(item):
            raise ValueError(
                f"METADATA columns are connector-specific and not "
                f"supported: {item!r}"
            )
        cm = _COMPUTED_RE.match(item)
        # 'name AS expr' is computed ONLY when 'expr' is not a bare
        # type keyword (a physical 'name TYPE' never contains AS)
        if cm and re.search(r"\sAS\s", item, re.IGNORECASE):
            computed[cm.group(1)] = cm.group(2).strip()
            continue
    return watermark, primary_key, computed


def execute_create_table(env, sql: str):
    """Parse + register via ``env.create_table``; returns the spec."""
    m = _CREATE_RE.match(sql)
    name = m.group(1)
    open_idx = sql.index("(", m.end() - 1)
    close = _find_close(sql, open_idx)
    col_block = sql[open_idx + 1 : close]
    rest = sql[close + 1 :]

    watermark, primary_key, computed = _parse_col_block(col_block)

    part_m = _PARTITIONED_RE.search(rest)
    partitioned = (
        [c.strip().strip("`") for c in part_m.group(1).split(",")]
        if part_m
        else []
    )
    wm_with = _WITH_RE.search(rest)
    if not wm_with:
        raise ValueError("Flink CREATE TABLE needs a WITH (...) clause")
    wopen = rest.index("(", wm_with.end() - 1)
    wclose = _find_close(rest, wopen)
    options = {
        k.replace("''", "'"): v.replace("''", "'")
        for k, v in _OPT_RE.findall(rest[wopen + 1 : wclose])
    }

    connector = options.pop("connector", None)
    if connector != "filesystem":
        raise ValueError(
            f"connector {connector!r} has no SQL-DDL mapping here — "
            "use the API wrappers (io.py kafka_source/jdbc_source/"
            "es_source/cassandra_source/... or EfoSession.create_table)"
        )
    path = options.pop("path", None)
    if path is None:
        raise ValueError("filesystem connector requires a 'path' option")
    fmt = options.pop("format", "parquet")
    if partitioned:
        options["partitioned_by"] = ",".join(partitioned)
    if primary_key:
        options["primary_key"] = ",".join(primary_key)
    return env.create_table(
        name,
        path,
        format=fmt,
        watermark=watermark,
        computed_columns=computed or None,
        **options,
    )


_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+([A-Za-z_][\w.]*)\s+(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_STMT_SET_RE = re.compile(
    r"^\s*EXECUTE\s+STATEMENT\s+SET\s+BEGIN\b(.*)\bEND\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def is_insert_into(sql: str) -> bool:
    return bool(_INSERT_RE.match(sql))


def is_statement_set(sql: str) -> bool:
    return bool(_STMT_SET_RE.match(sql))


def execute_insert(env, sql: str) -> None:
    """``INSERT INTO|OVERWRITE <spec-table> <query>`` — the statement
    every Flink pipeline ends with (SqlInsert via
    TableEnvironmentImpl.executeSql:646, routed to the connector
    sink). For engine-spec tables the query result is written to the
    spec's path in its format (PARTITIONED BY columns from the DDL
    applied as partitionBy); OVERWRITE maps to mode=overwrite exactly
    like the reference's INSERT OVERWRITE on filesystem tables. After
    the write the batch temp view re-registers so subsequent reads
    see the new files."""
    m = _INSERT_RE.match(sql)
    mode = "overwrite" if m.group(1).upper() == "OVERWRITE" else "append"
    name, query = m.group(2), m.group(3).strip()
    spec = env._specs.get(name)
    if spec is None:
        raise ValueError(
            f"INSERT target {name!r} is not an engine table — register it "
            "with CREATE TABLE ... WITH ('connector'='filesystem', ...)"
        )
    df = env.sql(query)
    # computed columns are derived at scan time — never stored
    df = df.drop(*[c for c in spec.computed_columns if c in df.columns])
    writer = df.write.format(spec.format).mode(mode)
    part = spec.options.get("partitioned_by")
    if part:
        writer = writer.partitionBy(*part.split(","))
    writer.save(spec.path)
    spec.scan(env.spark).createOrReplaceTempView(name)


def execute_statement_set(env, sql: str) -> None:
    """``EXECUTE STATEMENT SET BEGIN <insert>; <insert>; END`` — the
    reference's multi-sink pipeline statement (StatementSet /
    SqlExecute in the parser). Each inner INSERT runs through
    :func:`execute_insert`; the reference optimizes the set into one
    DAG with shared scans, which Spark approximates for free when the
    inserts share cached/registered inputs."""
    body = _STMT_SET_RE.match(sql).group(1)
    # quote-aware split: a ';' inside a string literal (WHERE note =
    # 'a;b') must not break an INSERT in two (round-5 ADVICE)
    stmts = _split_top(body, sep=";")
    if not stmts:
        raise ValueError("empty STATEMENT SET")
    for stmt in stmts:
        if not is_insert_into(stmt):
            raise ValueError(
                f"STATEMENT SET allows only INSERT statements: {stmt!r}"
            )
        execute_insert(env, stmt)


def execute_drop_table(env, sql: str) -> None:
    m = _DROP_RE.match(sql)
    if_exists, name = bool(m.group(1)), m.group(2)
    known = name in env._specs
    if not known and not if_exists:
        raise ValueError(f"table not found: {name!r}")
    env._specs.pop(name, None)
    env._rowtimes.pop(name, None)
    try:
        env.spark.catalog.dropTempView(name)
    except Exception:
        if not if_exists:
            raise


# ---------------------------------------------------------------------------
# CREATE VIEW / DROP VIEW / ALTER TABLE (SQL text)
# ---------------------------------------------------------------------------
# Reference parser surface: ddl/SqlCreateView.java (view name, optional
# column alias list, AS query), ddl/SqlAlterTable.java (RENAME TO +
# SET ('k'='v') options). Same lexical-DDL path as CREATE TABLE.

_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?"
    r"([A-Za-z_][\w.]*)\s*(\(([^)]*)\))?\s*AS\s+(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_VIEW_RE = re.compile(
    r"^\s*DROP\s+(?:TEMPORARY\s+)?VIEW\s+(IF\s+EXISTS\s+)?"
    r"([A-Za-z_][\w.]*)\s*$",
    re.IGNORECASE,
)
_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+RENAME\s+TO\s+"
    r"([A-Za-z_][\w.]*)\s*$",
    re.IGNORECASE,
)
_ALTER_SET_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+SET\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def is_create_view(sql: str) -> bool:
    return bool(_CREATE_VIEW_RE.match(sql))


def is_drop_view(sql: str) -> bool:
    return bool(_DROP_VIEW_RE.match(sql))


def is_alter_table(sql: str) -> bool:
    return bool(_ALTER_RENAME_RE.match(sql)) or bool(_ALTER_SET_RE.match(sql))


def execute_create_view(env, sql: str) -> None:
    """``CREATE [TEMPORARY] VIEW [IF NOT EXISTS] v [(c1, c2, ...)] AS
    query`` (SqlCreateView.java). The query runs through ``env.sql``
    so the dialect surface (group windows, temporal joins,
    MATCH_RECOGNIZE) is available inside view bodies, exactly like
    the reference's view expansion through its planner."""
    m = _CREATE_VIEW_RE.match(sql)
    if_not_exists, name = bool(m.group(1)), m.group(2)
    col_list, query = m.group(4), m.group(5).strip().rstrip(";")
    if name in env._views or name in env._specs:
        if if_not_exists:
            return
        raise ValueError(f"view or table already exists: {name!r}")
    df = env.sql(query)
    if col_list and col_list.strip():
        names = [c.strip().strip("`") for c in col_list.split(",")]
        if len(names) != len(df.columns):
            raise ValueError(
                f"CREATE VIEW {name}: {len(names)} column aliases for "
                f"{len(df.columns)} query columns"
            )
        df = df.toDF(*names)
    df.createOrReplaceTempView(name)
    env._views.add(name)


def execute_drop_view(env, sql: str) -> None:
    m = _DROP_VIEW_RE.match(sql)
    if_exists, name = bool(m.group(1)), m.group(2)
    if name not in env._views:
        if if_exists:
            return
        raise ValueError(f"view not found: {name!r}")
    env._views.discard(name)
    env.spark.catalog.dropTempView(name)


def execute_alter_table(env, sql: str) -> None:
    """``ALTER TABLE a RENAME TO b`` / ``ALTER TABLE t SET
    ('k'='v', ...)`` (SqlAlterTable.java). RENAME moves the spec and
    re-registers the scan view under the new name; SET merges the
    quoted options into the spec (the reference's connector-option
    mutation) and refreshes the scan so option-sensitive reads see
    the change."""
    m = _ALTER_RENAME_RE.match(sql)
    if m:
        old, new = m.group(1), m.group(2)
        spec = env._specs.get(old)
        if spec is None:
            raise ValueError(f"table not found: {old!r}")
        if new in env._specs or new in env._views:
            raise ValueError(f"target name already exists: {new!r}")
        env._specs[new] = spec
        del env._specs[old]
        if old in env._rowtimes:
            env._rowtimes[new] = env._rowtimes.pop(old)
        if old in env._pks:
            env._pks[new] = env._pks.pop(old)
        try:
            env.spark.catalog.dropTempView(old)
        except Exception:
            pass
        spec.scan(env.spark).createOrReplaceTempView(new)
        return
    m = _ALTER_SET_RE.match(sql)
    spec = env._specs.get(m.group(1))
    if spec is None:
        raise ValueError(f"table not found: {m.group(1)!r}")
    opts = dict(_OPT_RE.findall(m.group(2)))
    if not opts:
        raise ValueError(f"ALTER TABLE SET: no ('k'='v') options in {sql!r}")
    spec.options.update(opts)
    spec.scan(env.spark).createOrReplaceTempView(m.group(1))


# ---------------------------------------------------------------------------
# CREATE TABLE ... LIKE (SQL text)
# ---------------------------------------------------------------------------
# Reference parser surface: ddl/SqlTableLike.java (LIKE clause with
# per-feature merging strategies; defaults INCLUDING ALL OVERWRITING
# OPTIONS) merged by MergeTableLikeUtil. The engine realizes the merge
# onto EfoSession.create_table_like's spec-clone path.

_CREATE_HEAD_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(`[^`]+`|[A-Za-z_][\w.]*)",
    re.IGNORECASE,
)
_LIKE_FEATURES = (
    "CONSTRAINTS", "GENERATED", "METADATA", "OPTIONS",
    "PARTITIONS", "WATERMARKS",
)
_LIKE_OPT_RE = re.compile(
    r"\b(INCLUDING|EXCLUDING|OVERWRITING)\s+"
    r"(ALL|CONSTRAINTS|GENERATED|METADATA|OPTIONS|PARTITIONS|WATERMARKS)\b",
    re.IGNORECASE,
)


def _find_top_level_kw(sql: str, word: str) -> int:
    """Index of ``word`` as a keyword at paren-depth 0 (outside
    quotes), or -1. A hit inside the column block or an option string
    never matches — only table-level clauses do."""
    depth, i, n, w = 0, 0, len(sql), len(word)
    up = word.upper()
    while i < n:
        c = sql[i]
        if c in ("'", '"', "`"):
            i = _skip_quoted(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and sql[i : i + w].upper() == up
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
            and (i + w >= n or not (sql[i + w].isalnum() or sql[i + w] == "_"))
        ):
            return i
        i += 1
    return -1


def _find_top_level_like(sql: str) -> int:
    """Index of the table-level LIKE clause, or -1. A top-level AS
    BEFORE the LIKE means the statement is CTAS (``CREATE TABLE t AS
    SELECT ... WHERE a LIKE b``) — the LIKE there is a row predicate
    whose identifier operand would otherwise parse as a source-table
    name (SqlTableLike has no AS form, so this cannot reject real
    LIKE-DDL)."""
    pos = _find_top_level_kw(sql, "LIKE")
    if pos < 0:
        return -1
    as_pos = _find_top_level_kw(sql, "AS")
    if 0 <= as_pos < pos:
        return -1
    return pos


def create_table_like_source(sql: str) -> str | None:
    """The LIKE source table name when ``sql`` is a CREATE TABLE ...
    LIKE statement, else None. The session routes the statement here
    only when the source is an ENGINE spec table — plain Spark
    ``CREATE TABLE ... LIKE`` over catalog tables passes through."""
    s = sql.rstrip().rstrip(";")
    if not _CREATE_HEAD_RE.match(s):
        return None
    pos = _find_top_level_like(s)
    if pos < 0:
        return None
    m = re.match(r"^(`[^`]+`|[A-Za-z_][\w.]*)", s[pos + 4 :].strip())
    return m.group(1).strip("`") if m else None


def execute_create_table_like(env, sql: str):
    """Parse + merge + register via ``env.create_table``; returns the
    spec. Strategies (SqlTableLike.MergingStrategy ×
    FeatureOption): INCLUDING inherits and makes a same-feature
    redefinition an error, EXCLUDING drops the inherited feature,
    OVERWRITING (GENERATED / METADATA / OPTIONS / WATERMARKS only)
    lets the new statement win per item. Default is the reference's
    ``INCLUDING ALL OVERWRITING OPTIONS``."""
    s = sql.rstrip().rstrip(";")
    hm = _CREATE_HEAD_RE.match(s)
    name = hm.group(1).strip("`")
    pos = _find_top_level_like(s)
    head, tail = s[hm.end() : pos], s[pos + 4 :].strip()

    tm = re.match(
        r"^(`[^`]+`|[A-Za-z_][\w.]*)\s*(\(.*\))?\s*$", tail, re.DOTALL
    )
    if not tm:
        raise ValueError(f"malformed LIKE clause: {tail!r}")
    source, like_block = tm.group(1).strip("`"), tm.group(2)

    src = env._specs.get(source)
    if src is None:
        raise ValueError(f"LIKE source is not an engine table: {source!r}")

    # merging strategies: the reference's defaults, then ALL, then
    # per-feature overrides in statement order
    strat = {f: "INCLUDING" for f in _LIKE_FEATURES}
    strat["OPTIONS"] = "OVERWRITING"
    if like_block:
        body = like_block.strip()[1:-1]
        consumed = 0
        for m in _LIKE_OPT_RE.finditer(body):
            mode, feat = m.group(1).upper(), m.group(2).upper()
            consumed += 1
            if feat == "ALL":
                if mode == "OVERWRITING":
                    raise ValueError(
                        "OVERWRITING ALL is not a valid LIKE option "
                        "(SqlTableLike grammar)"
                    )
                strat = {f: mode for f in _LIKE_FEATURES}
            else:
                if mode == "OVERWRITING" and feat in (
                    "CONSTRAINTS", "PARTITIONS"
                ):
                    raise ValueError(
                        f"OVERWRITING {feat} is not allowed "
                        "(SqlTableLike.java merging-strategy table)"
                    )
                strat[feat] = mode
        if consumed == 0 and body.strip():
            raise ValueError(f"unrecognized LIKE options: {body!r}")

    # new statement's own clauses (all optional with LIKE)
    new_watermark, new_pk, new_computed = None, [], {}
    rest = head
    if head.lstrip().startswith("("):
        open_idx = head.index("(")
        close = _find_close(head, open_idx)
        new_watermark, new_pk, new_computed = _parse_col_block(
            head[open_idx + 1 : close]
        )
        rest = head[close + 1 :]
    part_m = _PARTITIONED_RE.search(rest)
    new_part = (
        [c.strip().strip("`") for c in part_m.group(1).split(",")]
        if part_m
        else []
    )
    new_options: dict[str, str] = {}
    wm_with = _WITH_RE.search(rest)
    if wm_with:
        wopen = rest.index("(", wm_with.end() - 1)
        wclose = _find_close(rest, wopen)
        new_options = {
            k.replace("''", "'"): v.replace("''", "'")
            for k, v in _OPT_RE.findall(rest[wopen + 1 : wclose])
        }

    # ---- merge (MergeTableLikeUtil semantics) ----
    # WATERMARKS
    if strat["WATERMARKS"] == "EXCLUDING":
        watermark = new_watermark
    elif new_watermark is None:
        watermark = src.watermark
    elif src.watermark is None or strat["WATERMARKS"] == "OVERWRITING":
        watermark = new_watermark
    else:
        raise ValueError(
            "there already exists a watermark spec for the base table — "
            "use OVERWRITING WATERMARKS or EXCLUDING WATERMARKS"
        )
    # GENERATED (computed columns)
    computed = (
        dict(src.computed_columns) if strat["GENERATED"] != "EXCLUDING" else {}
    )
    for c, e in new_computed.items():
        if c in computed and strat["GENERATED"] == "INCLUDING":
            raise ValueError(
                f"computed column {c!r} already exists in the base table — "
                "use OVERWRITING GENERATED or EXCLUDING GENERATED"
            )
        computed[c] = e
    # CONSTRAINTS (primary key)
    src_pk = src.options.get("primary_key")
    if strat["CONSTRAINTS"] == "EXCLUDING":
        primary_key = new_pk
    elif new_pk and src_pk:
        raise ValueError(
            "the base table already has a primary key — use "
            "EXCLUDING CONSTRAINTS to redefine it"
        )
    else:
        primary_key = new_pk or (
            [c.strip() for c in src_pk.split(",")] if src_pk else []
        )
    # PARTITIONS
    src_part = src.options.get("partitioned_by")
    if strat["PARTITIONS"] == "EXCLUDING":
        partitioned = new_part
    elif new_part and src_part:
        raise ValueError(
            "the base table already has partitions defined — use "
            "EXCLUDING PARTITIONS to redefine them"
        )
    else:
        partitioned = new_part or (src_part.split(",") if src_part else [])
    # OPTIONS (connector options incl. path/format)
    inherited = {"path": src.path, "format": src.format}
    inherited.update(
        {
            k: v
            for k, v in src.options.items()
            if k not in ("primary_key", "partitioned_by")
        }
    )
    if strat["OPTIONS"] == "EXCLUDING":
        merged = {}
    else:
        merged = dict(inherited)
    for k, v in new_options.items():
        if (
            strat["OPTIONS"] == "INCLUDING"
            and k in inherited
            and inherited[k] != v
        ):
            raise ValueError(
                f"option {k!r} already exists on the base table with a "
                f"different value ({inherited[k]!r} vs {v!r}) — use "
                "OVERWRITING OPTIONS"
            )
        merged[k] = v

    connector = merged.pop("connector", None)
    if connector is not None and connector != "filesystem":
        raise ValueError(
            f"connector {connector!r} has no SQL-DDL mapping here — "
            "use the API wrappers (io.py) or EfoSession.create_table"
        )
    path = merged.pop("path", None)
    if path is None:
        raise ValueError(
            "the merged table has no 'path' option (EXCLUDING OPTIONS "
            "requires the new WITH clause to provide one)"
        )
    fmt = merged.pop("format", "parquet")
    if partitioned:
        merged["partitioned_by"] = ",".join(partitioned)
    if primary_key:
        merged["primary_key"] = ",".join(primary_key)
    return env.create_table(
        name,
        path,
        format=fmt,
        watermark=watermark,
        computed_columns=computed or None,
        **merged,
    )
