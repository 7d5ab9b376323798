"""Join operators beyond Spark's built-in join types.

Reference semantics reproduced here (cites into /root/reference):

* **temporal / as-of join** — `FOR SYSTEM_TIME AS OF a.rowtime`:
  StreamExecTemporalJoin.scala:51, TemporalRowTimeJoinOperator.java:72.
  For each probe row, pick the latest build row with the same key and
  ``build.ts <= probe.ts``.
* **interval join** — `a.ts BETWEEN b.ts - X AND b.ts + Y`:
  StreamExecWindowJoin.scala:53, TimeBoundedStreamJoin.java:52,
  IntervalJoinOperator.java:87.

Scale design (100 TB):

``asof_join`` is implemented as the *union–sort–backfill* pattern, NOT
as a range join: tag both inputs, union them, and run one window pass
``last(build_cols, ignorenulls) OVER (PARTITION BY key ORDER BY ts)``.
Cost = exactly ONE shuffle of (|probe| + |build|) rows and one
partition-local sort — versus a key-equi range join whose worst case
is |probe| × |build-rows-per-key| intermediate pairs. The window is
rows-unbounded-preceding, which Spark evaluates streaming-ly within
the partition (no buffering of the whole frame), so skewed keys cost
sort time, not memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str | list[str],
    probe_ts: str,
    build_ts: str,
    build_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each probe row, attach the latest build row (same key,
    ``build_ts <= probe_ts``). Left-outer semantics: probe rows with
    no earlier build row get NULLs.

    tiebreak: build column that breaks equal-``build_ts`` ties
    (highest wins), making results deterministic.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if build_cols is None:
        build_cols = [c for c in build.columns if c not in keys and c != build_ts]
    # the tiebreak column must ride along in the tagged union even when
    # the caller doesn't want it in the output
    carry_cols = list(build_cols)
    if tiebreak is not None and tiebreak not in carry_cols:
        carry_cols.append(tiebreak)
    out_names = {c: (c + suffix if c in probe.columns else c) for c in build_cols}
    # also expose the matched build timestamp
    ts_out = build_ts + suffix if build_ts in probe.columns else build_ts

    # the build row rides the union as ONE struct (ts + carry cols):
    # a single last(ignorenulls) over the struct emits the WHOLE
    # latest build row atomically — backfilling columns independently
    # would mix values from different build rows whenever the latest
    # row holds a NULL in one column (TemporalRowTimeJoinOperator
    # emits whole rows, never column-wise mixtures).
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    bstruct_type = _ST(
        [_SF("__bts", build.schema[build_ts].dataType)]
        + [_SF(c, build.schema[c].dataType) for c in carry_cols]
    )
    probe_tagged = probe.select(
        *[F.col(c) for c in probe.columns],
        F.lit(1).alias("__side"),
        F.col(probe_ts).alias("__ts"),
        F.lit(None).cast(bstruct_type).alias("__b"),
    )
    build_tagged = build.select(
        *[F.col(k) for k in keys],
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in probe.columns
            if c not in keys
        ],
        F.lit(0).alias("__side"),
        F.col(build_ts).alias("__ts"),
        F.struct(
            F.col(build_ts).alias("__bts"),
            *[F.col(c).alias(c) for c in carry_cols],
        ).alias("__b"),
    )
    unioned = probe_tagged.unionByName(build_tagged)

    # __side AFTER __ts but BEFORE any tiebreak: build rows (0) must
    # sort before probe rows (1) at equal ts so last() sees them
    # (inclusive <= semantics, matching TemporalRowTimeJoinOperator);
    # probe rows carry NULL tiebreak, so tiebreak must never outrank
    # __side in the sort key.
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if tiebreak is not None:
        # among equal-ts build rows the highest tiebreak is emitted
        # last, so last() picks it (probe rows' NULL struct sorts
        # first and never outranks a build row).
        order.append(F.col("__b").getField(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("__b", ignorenulls=True).over(w).alias("__f")
    )
    result = filled.where(F.col("__side") == 1).select(
        *[F.col(c) for c in probe.columns],
        F.col("__f").getField("__bts").alias(ts_out),
        *[F.col("__f").getField(c).alias(out_names[c]) for c in build_cols],
    )
    return result


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    lower,
    upper,
    how: str = "inner",
) -> DataFrame:
    """Interval join: rows pair when keys match and
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    ``lower`` / ``upper`` are SQL interval strings ("INTERVAL 5
    MINUTES") or Columns. Batch: Catalyst plans the equi-key part as a
    hash/sort-merge join and applies the range as a post-filter — the
    shuffle is on the key only. Streaming: same expression shape is
    exactly what Structured Streaming requires to bound state for
    stream-stream joins (both sides need watermarks).
    """
    keys = [key] if isinstance(key, str) else list(key)
    lo = F.expr(lower) if isinstance(lower, str) else lower
    hi = F.expr(upper) if isinstance(upper, str) else upper
    l = left.alias("l")
    r = right.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = cond & (rts >= lts + lo) & (rts <= lts + hi)
    return l.join(r, cond, how)
