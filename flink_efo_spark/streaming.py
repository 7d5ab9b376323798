"""Streaming core: Structured Streaming equivalents of the reference's
stream-side operators.

Reference parity (cites into /root/reference):

* watermark assignment — StreamExecWatermarkAssigner.scala:46,
  WatermarkAssignerOperator.java:41 → ``with_watermark`` /
  ``stream_table(..., watermark=...)``.
* group windows (TUMBLE/HOP/SESSION) —
  StreamExecGroupWindowAggregate.scala:33, WindowOperator.java:98 →
  ``tumble_agg`` / ``hop_agg`` / ``session_agg`` (same helpers work on
  batch and streaming frames — Flink's unified-runner behavior).
* streaming dedup keep-first — StreamExecDeduplicate.scala:52,
  DeduplicateKeepFirstRowFunction.java → ``stream_dedup_keep_first``
  (built-in ``dropDuplicates`` state).
* streaming dedup keep-last — DeduplicateKeepLastRowFunction.java:36 →
  ``stream_dedup_keep_last`` (``applyInPandasWithState`` latest-wins).
* streaming Top-N — StreamExecRank.scala:52,
  AppendOnlyTopNFunction.java:48 → ``stream_top_n``
  (``applyInPandasWithState`` per-key bounded buffer).
* changelog/output-mode inference —
  FlinkChangelogModeInferenceProgram.scala:39 → ``infer_output_mode``
  (engine-level plan analysis; Catalyst has no changelog trait).
* temporal proc-time join — TemporalProcessTimeJoinOperator.java:40 →
  ``temporal_join_proctime`` (per-micro-batch broadcast snapshot via
  ``foreachBatch``).

Scale notes (100 TB / continuous):
* State lives in the RocksDB state store (session default conf) —
  keep-last and top-n state is per-key-bounded (one row / N rows), so
  state size is O(distinct keys), not O(stream).
* ``applyInPandasWithState`` moves only the grouped batch through
  Arrow; the hot built-in paths (window agg, dropDuplicates,
  stream-stream join) stay JVM-side.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable, Iterator

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

from flink_efo_spark.catalog import (
    _denull_ntz,
    _nanos_timestamp_cols,
    ensure_session_confs,
    table_path,
)


# ---------------------------------------------------------------------------
# numpy row-buffer encoding for applyInPandasWithState bodies
# ---------------------------------------------------------------------------
# The per-group fn runs once per key per micro-batch — O(keys) Python
# calls per trigger. A pandas-frame body costs ~5 ms/call in fixed
# overhead (frame construction, sort_values, concat: ~30 tiny-frame
# ops), which at 1.5k keys x 6 batches is tens of seconds of worker
# CPU per query. The helpers below keep buffered rows as bare numpy
# arrays instead: timestamps as int64 epoch-micros, numeric columns as
# float64 with NaN as the null marker (Arrow's from_pandas turns NaN
# back into SQL NULL on output), anything else as object arrays.
#
# State transport: the pickled state tuple is reconstructed JVM-side
# (Pyrolite) into an UnsafeRow of the declared state schema, so values
# must be plain Python objects — but `list.tolist()` on an int64/
# float64 array is one C loop, and NaN is a valid DOUBLE that encodes
# NULL-ness for us, so the old per-element NaN-checking casters are
# only needed for object-encoded columns.


def _np_kind(dt) -> str:
    """Buffer-encoding class for a Spark type: ``ts`` (int64
    epoch-micros), ``num`` (float64, NaN = NULL) or ``obj``
    (object-array passthrough)."""
    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        ShortType,
        TimestampType,
    )

    if isinstance(dt, TimestampType):
        return "ts"
    if isinstance(
        dt, (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    ):
        return "num"
    return "obj"


def _np_empty(kind: str) -> "np.ndarray":
    return np.empty(
        0,
        dtype=(
            np.int64 if kind == "ts" else np.float64 if kind == "num" else object
        ),
    )


def _np_series(ser, kind: str) -> "np.ndarray":
    """Arrow-delivered pandas Series -> buffer-encoded numpy array.
    One astype at most; NULLs become NaN on the ``num`` path (ints with
    nulls already arrive as float64 from Arrow)."""
    if kind == "ts":
        return ser.to_numpy().astype("datetime64[us]").astype(np.int64)
    if kind == "num":
        return ser.to_numpy(dtype=np.float64, na_value=np.nan)
    return ser.to_numpy(dtype=object)


def _np_state_list(arr: "np.ndarray", kind: str, caster) -> list:
    """Buffer array -> plain-Python list for the state encoder. The
    ``num``/``ts`` paths are a single C-level tolist(); only object
    columns pay the per-element caster."""
    if kind == "obj":
        return [caster(v) for v in arr]
    return arr.tolist()


def _np_from_state(val, kind: str) -> "np.ndarray":
    """State-decoded sequence -> buffer-encoded numpy array."""
    return np.asarray(
        val,
        dtype=(
            np.int64 if kind == "ts" else np.float64 if kind == "num" else object
        ),
    )


def _np_ffill(v: "np.ndarray", n: int) -> "np.ndarray":
    """Forward-fill NaNs in a float64 array (leading NaNs stay NaN)."""
    mask = ~np.isnan(v)
    idx = np.where(mask, np.arange(n), 0)
    np.maximum.accumulate(idx, out=idx)
    return v[idx]


def _np_sortn(arrs: list) -> "np.ndarray":
    """Stable sort permutation by the given key arrays (major key
    first). numpy lexsort unless a key is an object array (then
    None/NaT comparisons need pandas' na_position handling — cold
    path, one pandas op)."""
    if any(a.dtype == object for a in arrs):
        import pandas as pd

        frame = pd.DataFrame(dict(enumerate(arrs)))
        return (
            frame.sort_values(list(frame.columns), kind="mergesort")
            .index.to_numpy()
        )
    return np.lexsort(tuple(reversed(arrs)))


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


def stream_table(
    spark: SparkSession,
    data_dir: str,
    name: str,
    watermark: tuple[str, str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a driver parquet table as a file stream
    (micro-batch-replayed), normalizing nano timestamps exactly like
    the batch catalog so batch and stream plans see one schema.

    ``watermark=("ts", "10 minutes")`` declares the event-time
    attribute — the engine's WatermarkSpec equivalent (SURVEY §1.4).
    """
    ensure_session_confs(spark)
    path = table_path(data_dir, name)
    # readStream needs an explicit schema; derive it from the batch
    # reader (post-nanosAsLong, so nanos columns surface as long)
    batch_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(batch_schema)
    if os.path.isdir(path):
        # a directory-shaped table (Spark-written part files): stream
        # the directory itself
        stream_path = path
    else:
        # the driver's single-file layout: the file source needs a
        # directory, so stream the sf dir filtered to this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream_path = data_dir
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stream_path)
    for c in _nanos_timestamp_cols(path):
        if c in df.columns and isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    df = _denull_ntz(df)
    if watermark is not None:
        df = df.withWatermark(*watermark)
    return df


def stream_table_split(
    spark: SparkSession,
    data_dir: str,
    name: str,
    n_batches: int,
    order_col: str,
    watermark: tuple[str, str] | None = None,
    sentinel_rows: list[dict] | None = None,
) -> DataFrame:
    """Open a driver table as a DETERMINISTIC multi-micro-batch
    stream: the table is re-written as ``n_batches`` files split in
    ``order_col`` order (batch k holds the k-th time slice) and
    replayed with ``maxFilesPerTrigger=1``.

    This is the harness for operators whose semantics only show up
    ACROSS batches — watermark-gated emission (outer/anti joins),
    cross-batch keyed state — where a single-file availableNow replay
    would collapse everything into one batch and the watermark would
    never advance mid-run. The split is cached per (table, n, sf) in
    the session's temp space; file order == event-time order, so the
    watermark climbs monotonically batch to batch exactly like the
    reference's bounded-out-of-orderness source.

    ``sentinel_rows``: optional rows appended as ONE FINAL extra
    batch — the reference's end-of-input MAX_WATERMARK emission
    (StreamSource.java advances the watermark to +inf when a bounded
    source finishes; Spark's availableNow replay has no such flush,
    so watermark-gated emission — outer/anti joins, allowed-lateness
    windows — stays one batch behind). A sentinel row with an event
    time past the real maximum makes the last REAL watermark take
    effect while the sentinel's own key never joins anything. Each
    dict maps column name -> value; unlisted columns are NULL."""
    import hashlib

    ensure_session_confs(spark)
    path = table_path(data_dir, name)
    # the cache key covers the SOURCE FILES' identity (size + mtime),
    # not just the path: the split dir lives in the shared tempdir and
    # survives processes, and the driver regenerates the testdata at
    # the same path each round — a path-only key would silently replay
    # last round's data
    if os.path.isdir(path):
        src_state = sorted(
            (f, os.stat(os.path.join(path, f)).st_size,
             os.stat(os.path.join(path, f)).st_mtime_ns)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    else:
        st = os.stat(path)
        src_state = [(os.path.basename(path), st.st_size, st.st_mtime_ns)]
    key = (
        f"{os.path.abspath(path)}:{n_batches}:{order_col}"
        f":{[sorted(r.items()) for r in (sentinel_rows or [])]}"
        f":{src_state}"
    ).encode()
    tag = hashlib.md5(key).hexdigest()[:12]
    split_dir = os.path.join(
        tempfile.gettempdir(), f"efo-split-{name}-{n_batches}-{tag}"
    )
    marker = os.path.join(split_dir, "_EFO_DONE")
    if not os.path.exists(marker):
        batch = spark.read.parquet(path)
        for c in _nanos_timestamp_cols(path):
            if c in batch.columns and isinstance(
                batch.schema[c].dataType, LongType
            ):
                batch = batch.withColumn(
                    c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                )
        # order_col may be any deterministic SQL expression (a plain
        # column name is the common case); an expression DEcorrelated
        # from event time builds an out-of-order replay (late-data
        # harness)
        w = Window.orderBy(F.expr(order_col))
        split = (
            batch.withColumn("__b", F.ntile(n_batches).over(w))
            .repartition(1)
            .sortWithinPartitions(F.expr(order_col))
            .persist()
        )
        # one sequential write per slice: the file source replays in
        # modification-time order, so mtimes (and paths) must follow
        # event time — a single parallel partitioned write would leave
        # slice order up to task-finish timing
        for k in range(1, n_batches + 1):
            split.where(F.col("__b") == k).drop("__b").write.mode(
                "overwrite"
            ).parquet(os.path.join(split_dir, f"b={k}"))
        split.unpersist()
        if sentinel_rows:
            spark.createDataFrame(
                [
                    tuple(r.get(f.name) for f in batch.schema.fields)
                    for r in sentinel_rows
                ],
                batch.schema,
            ).repartition(1).write.mode("overwrite").parquet(
                os.path.join(split_dir, f"b={n_batches + 1}")
            )
        with open(marker, "w") as fh:
            fh.write("ok")
    schema = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(split_dir)
        .schema
    )
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(split_dir)
    )
    df = _denull_ntz(df)
    if watermark is not None:
        df = df.withWatermark(*watermark)
    return df


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """WatermarkSpec equivalent (WatermarkAssignerOperator.java:41):
    bounded-out-of-orderness watermark on an event-time column."""
    return df.withWatermark(ts_col, delay)


def watermark_idleness_policy(spark: SparkSession, use_max: bool = True) -> None:
    """Idle-source handling (WatermarksWithIdleness.java in the
    reference): Flink marks a source idle after a timeout so it stops
    holding back the min-aggregated watermark.

    Spark's geometry differs: a SINGLE source has one global watermark
    (max observed event time − delay), so idle *partitions* never
    stall it — the reference's per-partition problem doesn't exist
    here. The stall reappears across MULTIPLE watermarked inputs
    (union / stream-stream join), where the query watermark is the
    MIN of the inputs' by default: one idle input freezes event-time
    progress exactly like a Flink source without idleness. The
    idleness analog is the ``max`` multipleWatermarkPolicy — the
    slowest input no longer gates the others (at the cost of
    late-data risk on the idle input, the same trade
    WatermarksWithIdleness makes).
    """
    spark.conf.set(
        "spark.sql.streaming.multipleWatermarkPolicy",
        "max" if use_max else "min",
    )


# ---------------------------------------------------------------------------
# group windows (work on both batch and streaming frames)
# ---------------------------------------------------------------------------


def _windowed_agg(
    df: DataFrame, window_col: Column, keys: list[str], aggs: tuple[Column, ...]
) -> DataFrame:
    out = df.groupBy(window_col.alias("__w"), *keys).agg(*aggs)
    agg_names = [c for c in out.columns if c != "__w" and c not in keys]
    return out.select(
        F.col("__w.start").alias("w_start"),
        F.col("__w.end").alias("w_end"),
        *keys,
        *agg_names,
    )


def tumble_agg(
    df: DataFrame, ts_col: str, size: str, keys: list[str], *aggs: Column
) -> DataFrame:
    """TUMBLE window aggregate (WindowOperator.java:98, tumbling
    assigner). Emits w_start/w_end + keys + aggs."""
    return _windowed_agg(df, F.window(ts_col, size), keys, aggs)


def hop_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: list[str],
    *aggs: Column,
) -> DataFrame:
    """HOP (sliding) window aggregate."""
    return _windowed_agg(df, F.window(ts_col, size, slide), keys, aggs)


def session_agg(
    df: DataFrame, ts_col: str, gap: str | Column, keys: list[str], *aggs: Column
) -> DataFrame:
    """SESSION window aggregate (SessionWindowAssigner.java:36).

    ``gap`` may be a Column expression for a PER-ROW dynamic gap —
    the reference's DynamicEventTimeSessionWindows.java:47
    (SessionWindowTimeGapExtractor): e.g. a longer inactivity gap for
    'session_start' events. Spark's session_window accepts exactly
    this dynamic-gap form natively."""
    return _windowed_agg(df, F.session_window(ts_col, gap), keys, aggs)


_DUR_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _duration_us(s: str) -> int:
    """'5 minutes' → 300000000 (micros). Spark duration-string subset."""
    parts = s.strip().split()
    if len(parts) != 2:
        raise ValueError(f"duration must be '<n> <unit>', got {s!r}")
    n, unit = int(parts[0]), parts[1].lower().rstrip("s")
    if unit not in _DUR_US:
        raise ValueError(f"unknown duration unit in {s!r}")
    return n * _DUR_US[unit]


def _cumulate_expand(
    df: DataFrame, ts_expr: str, step_us: int, max_us: int
) -> DataFrame:
    """Explode rows to (bucket start, window index) pairs: __w0_us is
    ``ts`` floored to a max_size boundary, __k enumerates every
    cumulate window (end = __w0_us + k*step) still containing ts."""
    n = max_us // step_us
    us = f"unix_micros(cast({ts_expr} as timestamp_ltz))"
    w0 = f"(floor({us} / {max_us}) * {max_us})"
    k_first = f"(floor(({us} - {w0}) / {step_us}) + 1)"
    return df.select(
        "*",
        F.expr(f"cast({w0} as bigint)").alias("__w0_us"),
        F.explode(
            F.expr(f"sequence(cast({k_first} as bigint), {n}L)")
        ).alias("__k"),
    )


def _cumulate_finish(
    exploded: DataFrame, step_us: int, keys: list[str], aggs: tuple[Column, ...]
) -> DataFrame:
    out = exploded.groupBy(
        "__w0_us",
        (F.col("__w0_us") + F.col("__k") * F.lit(step_us)).alias("__we_us"),
        *keys,
    ).agg(*aggs)
    agg_names = [c for c in out.columns if c not in ("__w0_us", "__we_us", *keys)]
    return out.select(
        F.timestamp_micros("__w0_us").alias("w_start"),
        F.timestamp_micros("__we_us").alias("w_end"),
        *keys,
        *agg_names,
    )


def cumulate_agg(
    df: DataFrame,
    ts_col: str,
    step: str,
    max_size: str,
    keys: list[str],
    *aggs: Column,
) -> DataFrame:
    """CUMULATE window aggregate — the fourth windowing TVF of
    public upstream Apache Flink (FLIP-145, Flink >= 1.13:
    SqlCumulateTableFunction / CumulativeWindowSpec; the reference
    snapshot predates it, so this is forward-compat surface):
    expanding windows ``[w0, w0+step), [w0, w0+2·step), …,
    [w0, w0+max_size)`` with ``w0`` = ``ts`` floored to a
    ``max_size`` boundary — "running daily total, refreshed every
    step".

    Direct form: each row explodes to every cumulate window
    containing it (fan-out ≤ max_size/step — the HOP Expand shape).
    Works with ANY aggregate. For decomposable aggregates at scale
    prefer :func:`cumulate_slices` + :func:`compose_cumulate_slices`,
    which expand per *slice* instead of per row — the reference's
    slice-shared state optimization.
    """
    step_us, max_us = _duration_us(step), _duration_us(max_size)
    if max_us % step_us != 0:
        raise ValueError("max_size must be a multiple of step")
    return _cumulate_finish(
        _cumulate_expand(df, ts_col, step_us, max_us), step_us, keys, aggs
    )


def cumulate_slices(
    df: DataFrame, ts_col: str, step: str, keys: list[str], *partial_aggs: Column
) -> DataFrame:
    """Phase 1 of the sliced cumulate: TUMBLE(step) partial aggregates
    — one row per (slice, keys), the reference's per-slice state.
    Streaming-safe: on a watermarked stream this is a plain windowed
    agg in append mode (only watermark-finalized slices emit)."""
    return tumble_agg(df, ts_col, step, keys, *partial_aggs)


def compose_cumulate_slices(
    slices: DataFrame,
    step: str,
    max_size: str,
    keys: list[str],
    *merge_aggs: Column,
) -> DataFrame:
    """Phase 2 of the sliced cumulate: explode each slice-partial row
    to the cumulate windows it contributes to (every window end
    strictly after the slice start within the slice's max_size
    bucket) and merge the partials. STATELESS — runs identically over
    a batch slice table or the append-mode output of a streamed
    phase 1.

    ``merge_aggs`` combine the partial columns (sum of partial
    counts, sum of partial sums, min of partial mins, …). The shuffle
    moves one row per (slice × remaining windows) — at 100 TB that
    volume is O(#slices · max/step), independent of input row count,
    which is why this is the scale path over :func:`cumulate_agg`.
    """
    step_us, max_us = _duration_us(step), _duration_us(max_size)
    if max_us % step_us != 0:
        raise ValueError("max_size must be a multiple of step")
    return _cumulate_finish(
        _cumulate_expand(slices, "w_start", step_us, max_us),
        step_us,
        keys,
        merge_aggs,
    )


def window_early_fire(
    agg_df: DataFrame,
    window_keys: list[str],
    out_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Early-fire window emission (reference
    WindowEmitStrategy.scala:33 + R/window/triggers/: emit a window's
    CURRENT partial value on every trigger before the watermark
    closes it — so a 1 h tumble shows progress every trigger instead
    of staying silent for an hour).

    Spark wiring: the windowed aggregate runs in UPDATE output mode
    (each micro-batch re-emits every window the batch touched, with
    its cumulative-so-far value — exactly a per-trigger early fire)
    through :func:`stream_upsert_sink`; the log keeps EVERY partial
    stamped with its ``__batch_id`` and :func:`read_upsert_result`
    resolves last-writer-wins to the windows' final values.

    ``window_keys`` identify one window instance (e.g.
    ``["w_start", "event_type"]``). Pass ``agg_df`` WITHOUT a
    watermark when every partial must be kept: with one, update mode
    also finalizes-and-drops closed windows (that is the
    allowed-lateness analog, fine for production; the partial log is
    the same either way).

    Returns ``(fire_log, final)`` — the per-trigger emission log with
    ``__batch_id``, and the resolved final table. Scale: the sink
    appends O(updated windows) per trigger and the resolve is one
    window function over the log; nothing rewrites per trigger.
    """
    spark = agg_df.sparkSession
    out_dir = out_dir or os.path.join(
        tempfile.mkdtemp(prefix="efo-earlyfire-"), "data"
    )
    q = stream_upsert_sink(agg_df, window_keys, out_dir, mode="update")
    q.awaitTermination()
    fire_log = spark.read.parquet(out_dir)
    final = read_upsert_result(spark, out_dir, window_keys)
    return fire_log, final


# ---------------------------------------------------------------------------
# count windows (CountTumblingWindowAssigner.java /
# CountSlidingWindowAssigner.java; DataStream countWindow = CountTrigger
# of size N + (for slide) CountEvictor)
# ---------------------------------------------------------------------------


def count_tumble_agg(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    size: int,
    value_col: str,
) -> DataFrame:
    """BATCH count-tumbling window (CountTumblingWindowAssigner.java):
    per key, rows in ``order_by`` order are bucketed into consecutive
    groups of ``size``; only COMPLETE windows emit (the count trigger
    fires at exactly N elements — a trailing partial window never
    fires, same as the reference).

    Pure Catalyst: one window pass (row_number) + one hash aggregate.
    Output: keys + w_idx + cnt + sum_value + min_value + max_value.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    bucketed = df.withColumn(
        "w_idx", ((F.row_number().over(w) - 1) / size).cast("int")
    )
    return (
        bucketed.groupBy(*keys, "w_idx")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .where(F.col("cnt") == size)
    )


def stream_count_tumble(
    df: DataFrame,
    keys: list[str],
    size: int,
    value_col: str,
    order_by: list[str] | None = None,
) -> DataFrame:
    """STREAMING per-key count-tumbling window
    (CountTumblingWindowAssigner.java + CountTrigger.java:42 —
    DataStream ``countWindow(size)``): state carries the next window
    index plus the pending (incomplete) window's values; each
    micro-batch appends its rows (sorted by ``order_by`` within the
    batch; arrival order across batches, exactly the reference's
    count-window contract), emits every window that reaches ``size``
    elements, and keeps the remainder.

    State per key is BOUNDED: at most ``size - 1`` pending values +
    one counter (the fired windows leave state immediately).

    Output rows: keys + w_idx + cnt + sum_value + min_value +
    max_value, append mode (fired count windows are final).
    """
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
    )

    key_fields = [StructField(k, df.schema[k].dataType) for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("w_idx", IntegerType()),
            StructField("cnt", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("min_value", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("w_base", LongType()),
            StructField("pend", ArrayType(DoubleType())),
        ]
    )
    sort_cols = list(order_by) if order_by else None

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        w_base, pend = (state.get if state.exists else (0, []))
        pend = list(pend)
        # a micro-batch's group data arrives as MULTIPLE Arrow chunks
        # in arbitrary order — concatenate and sort ONCE per batch
        frames = [p for p in pdfs if len(p)]
        if frames:
            allr = pd.concat(frames, ignore_index=True)
            if sort_cols:
                allr = allr.sort_values(sort_cols, kind="mergesort")
            vals = pend + [float(x) for x in allr[value_col]]
            n_complete = len(vals) // size
            if n_complete:
                import numpy as np

                arr = np.asarray(vals[: n_complete * size]).reshape(
                    n_complete, size
                )
                out = pd.DataFrame(
                    {
                        "w_idx": (w_base + np.arange(n_complete)).astype(
                            "int32"
                        ),
                        "cnt": np.full(n_complete, size, dtype="int64"),
                        "sum_value": arr.sum(axis=1),
                        "min_value": arr.min(axis=1),
                        "max_value": arr.max(axis=1),
                    }
                )
                for i, k in enumerate(keys):
                    out.insert(i, k, key[i])
                w_base += n_complete
                yield out[[f.name for f in out_schema.fields]]
            pend = vals[n_complete * size :]
        state.update((int(w_base), list(pend)))

    out = df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
    out._efo_output_mode = "append"
    return out


def count_slide_agg(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    size: int,
    slide: int,
    value_col: str,
) -> DataFrame:
    """BATCH count-sliding window (CountSlidingWindowAssigner.java —
    DataStream ``countWindow(size, slide)``: CountTrigger of ``slide``
    + CountEvictor of ``size``): every ``slide``-th row fires a window
    of the last ≤ ``size`` rows. Pure Catalyst: one ROWS-frame window
    pass + a modulo filter. Output: keys + w_idx + cnt + sum_value."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    frame = w.rowsBetween(-(size - 1), Window.currentRow)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(frame))
        .withColumn("sum_value", F.sum(value_col).over(frame))
        .where(F.col("__rn") % slide == 0)
        .withColumn("w_idx", (F.col("__rn") / slide).cast("int"))
        .select(*keys, "w_idx", "cnt", "sum_value")
    )


def stream_count_slide(
    df: DataFrame,
    keys: list[str],
    size: int,
    slide: int,
    value_col: str,
    order_by: list[str] | None = None,
) -> DataFrame:
    """STREAMING per-key count-sliding window
    (CountSlidingWindowAssigner.java + CountTrigger.java:42 +
    CountEvictor.java): fires every ``slide`` elements with the last
    ≤ ``size`` elements. State per key is BOUNDED: total row count +
    the last ``size - 1`` values (the evictor's retention)."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
    )

    key_fields = [StructField(k, df.schema[k].dataType) for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("w_idx", IntegerType()),
            StructField("cnt", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("__total", LongType()),
            StructField("__buf", ArrayType(DoubleType())),
        ]
    )
    sort_cols = list(order_by) if order_by else None

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        total, buf = (state.get if state.exists else (0, []))
        buf = list(buf)
        frames = [p for p in pdfs if len(p)]
        if frames:
            allr = pd.concat(frames, ignore_index=True)
            if sort_cols:
                allr = allr.sort_values(sort_cols, kind="mergesort")
            base = total - len(buf)  # absolute 1-based row before A[0]+1
            a = buf + [float(x) for x in allr[value_col]]
            new_total = base + len(a)
            first_fire = ((total // slide) + 1) * slide
            recs = []
            for t in range(first_fire, new_total + 1, slide):
                start_abs = max(1, t - size + 1)
                win = a[start_abs - base - 1 : t - base]
                rec = {k: key[i] for i, k in enumerate(keys)}
                rec["w_idx"] = int(t // slide)
                rec["cnt"] = len(win)
                rec["sum_value"] = float(sum(win))
                recs.append(rec)
            total = new_total
            buf = a[-(size - 1) :] if size > 1 else []
            if recs:
                yield pd.DataFrame(
                    recs, columns=[f.name for f in out_schema.fields]
                )
        state.update((int(total), list(buf)))

    out = df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
    out._efo_output_mode = "append"
    return out


def stream_delta_window(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    threshold: float,
    delta_col: str | None = None,
    order_by: list[str] | None = None,
    purge: bool = True,
    delta_fn=None,
    evict_threshold: float | None = None,
    max_buffer: int = 100_000,
) -> DataFrame:
    """DataStream delta-triggered GLOBAL window — §2.15-style
    extension covering the reference's custom-trigger tail
    (triggers/DeltaTrigger.java:54 onElement,
    triggers/PurgingTrigger.java FIRE→FIRE_AND_PURGE,
    evictors/DeltaEvictor.java evictBefore):

    * **DeltaTrigger**: per key, state remembers the element that
      fired LAST; a new element fires when
      ``delta(last_fired, element) > threshold``. The first element
      initializes the state without firing (DeltaTrigger.java:56-59).
    * **PurgingTrigger** (``purge=True``, the common pairing): a fire
      empties the window buffer, so each emission covers the rows
      since the previous fire (inclusive of the firing row).
      ``purge=False`` keeps the raw trigger's semantics — the global
      window keeps accumulating (state capped at ``max_buffer``
      values, the TTL analog, oldest dropped).
    * **DeltaEvictor** (``evict_threshold``): before aggregating, drop
      buffered elements whose delta vs the LAST buffered element
      exceeds the evict threshold (DeltaEvictor.java:84 checks
      against the buffer's last value).

    ``delta_fn(last, current) -> float`` defaults to ``abs(a - b)``
    (the reference ships DeltaFunction as a user lambda; it runs here
    inside the pandas worker, so any Python callable works).
    Delta is measured on ``delta_col`` (default ``value_col``).

    Output per fire (append mode — fires are final): keys +
    ``fire_seq`` + ``cnt``/``sum_value``/``min_value``/``max_value``
    over the (possibly evicted) buffer + ``fire_value`` (the
    triggering element's delta value).

    Scale: state per key = one last-fired scalar + the pending buffer
    (bounded by fire frequency in purge mode, ``max_buffer`` always);
    the per-element trigger scan is a tight per-key loop inside an
    Arrow-batched worker — the same shape as the reference's
    per-element onElement path, keyed-parallel across the cluster.
    """
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType as _Long,
        StructField,
    )

    delta_col = delta_col or value_col
    fn_delta = delta_fn or (lambda a, b: abs(a - b))
    key_fields = [StructField(k, df.schema[k].dataType) for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("fire_seq", _Long()),
            StructField("cnt", _Long()),
            StructField("sum_value", DoubleType()),
            StructField("min_value", DoubleType()),
            StructField("max_value", DoubleType()),
            StructField("fire_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("__seq", _Long()),
            StructField("__last_fire", DoubleType()),
            StructField("__buf_v", ArrayType(DoubleType())),
            StructField("__buf_d", ArrayType(DoubleType())),
        ]
    )
    sort_cols = list(order_by) if order_by else None
    out_cols = [f.name for f in out_schema.fields]

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        if state.exists:
            seq, last_fire, buf_v, buf_d = state.get
            buf_v, buf_d = list(buf_v), list(buf_d)
        else:
            seq, last_fire, buf_v, buf_d = 0, None, [], []
        frames = [p for p in pdfs if len(p)]
        recs = []
        if frames:
            allr = pd.concat(frames, ignore_index=True)
            if sort_cols:
                allr = allr.sort_values(sort_cols, kind="mergesort")
            vs = [float(x) for x in allr[value_col]]
            ds = [float(x) for x in allr[delta_col]]
            for v, d in zip(vs, ds):
                buf_v.append(v)
                buf_d.append(d)
                if last_fire is None:
                    last_fire = d  # first element: CONTINUE
                    continue
                if fn_delta(last_fire, d) > threshold:
                    last_fire = d
                    wv, wd = buf_v, buf_d
                    if evict_threshold is not None:
                        # DeltaEvictor: delta vs the buffer's LAST
                        # element decides retention. The reference
                        # (evictors/DeltaEvictor.java:76) EVICTS when
                        # getDelta >= threshold, so keep is strict <.
                        tail = wd[-1]
                        keep = [
                            i
                            for i in range(len(wd))
                            if fn_delta(wd[i], tail) < evict_threshold
                        ]
                        wv = [wv[i] for i in keep]
                        wd = [wd[i] for i in keep]
                    if not wv:
                        # an evict_threshold <= delta(tail, tail) = 0
                        # evicts EVERYTHING incl. the tail (the
                        # reference evicts on >=) — an empty window
                        # fires nothing instead of crashing min()
                        if purge:
                            buf_v, buf_d = [], []
                        continue
                    seq += 1
                    rec = {k: key[i] for i, k in enumerate(keys)}
                    rec.update(
                        fire_seq=int(seq),
                        cnt=len(wv),
                        sum_value=float(sum(wv)),
                        min_value=float(min(wv)),
                        max_value=float(max(wv)),
                        fire_value=float(d),
                    )
                    recs.append(rec)
                    if purge:
                        buf_v, buf_d = [], []
            if len(buf_v) > max_buffer:
                buf_v = buf_v[-max_buffer:]
                buf_d = buf_d[-max_buffer:]
        state.update(
            (
                int(seq),
                None if last_fire is None else float(last_fire),
                list(buf_v),
                list(buf_d),
            )
        )
        if recs:
            yield pd.DataFrame(recs, columns=out_cols)

    out = df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
    out._efo_output_mode = "append"
    return out


# ---------------------------------------------------------------------------
# streaming dedup
# ---------------------------------------------------------------------------


def stream_dedup_keep_first(
    df: DataFrame,
    keys: list[str],
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Keep the FIRST arrival per key (DeduplicateKeepFirstRowFunction).
    Built-in: ``dropDuplicates`` keyed state; with a watermark the
    state is GC'd (``dropDuplicatesWithinWatermark`` semantics are the
    TTL'd variant)."""
    if watermark is not None:
        df = df.withWatermark(*watermark)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_dedup_keep_last(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """Keep the LAST (max event-time) row per key — continuously
    updated state, one row per key
    (DeduplicateKeepLastRowFunction.java:36 semantics).

    ``applyInPandasWithState``: state = the current winning row;
    each micro-batch replaces it when a later row arrives. Output
    mode must be ``update``.
    """
    import pandas as pd  # local: executors import lazily

    out_schema = df.schema
    state_schema = StructType(
        [f for f in df.schema.fields]  # winner row mirrors input schema
    )
    ts_idx = df.columns.index(ts_col)

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        best = None
        if state.exists:
            best = list(state.get)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            cand = pdf.iloc[-1]
            if best is None or cand[ts_col] >= best[ts_idx]:
                best = [cand[c] for c in pdf.columns]
        if best is not None:
            state.update(tuple(best))
            yield pd.DataFrame([best], columns=[f.name for f in out_schema.fields])

    out = df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", "NoTimeout"
    )
    out._efo_output_mode = "update"
    return out


# ---------------------------------------------------------------------------
# streaming Top-N
# ---------------------------------------------------------------------------


def stream_top_n(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    n: int,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key incremental Top-N (AppendOnlyTopNFunction.java:48): the
    state is the current top-N buffer per key; each batch merges new
    rows and re-emits the buffer. Output mode ``update`` (the
    reference emits retractions; Spark's update mode re-emits changed
    rows — SURVEY §7.4 gap note).
    """
    import pandas as pd
    from pyspark.sql.types import ArrayType

    out_schema = df.schema
    cols = df.columns
    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])
    sort_asc = [ascending] + ([True] if tiebreak else [])

    # GroupState holds ONE tuple — pack the whole top-N buffer as one
    # array per column (parallel-indexed), so state is N rows per key.
    packed = StructType()
    for f in df.schema.fields:
        packed = packed.add(f.name, ArrayType(f.dataType))

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        frames = []
        if state.exists:
            st = state.get
            frames.append(pd.DataFrame({c: list(st[i]) for i, c in enumerate(cols)}))
        frames.extend(p for p in pdfs if len(p))
        if not frames:
            return
        allrows = pd.concat(frames, ignore_index=True)
        allrows = allrows.sort_values(
            sort_cols, ascending=sort_asc, kind="mergesort"
        ).head(n)
        state.update(tuple(list(allrows[c]) for c in cols))
        yield allrows

    out = df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, packed, "update", "NoTimeout"
    )
    out._efo_output_mode = "update"
    return out


def stream_sort_limit(
    df: DataFrame,
    order_col: str,
    n: int,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Streaming GLOBAL sort-limit (StreamExecSortLimit.scala:50):
    ``ORDER BY ... LIMIT n`` over the WHOLE stream, continuously
    maintained — the keyless case stream_top_n cannot express.

    Two levels, so the single global group never sees the raw stream:

    1. a stateless ``mapInPandas`` prunes each input partition of each
       micro-batch to its local top-n (the reference's local
       SortLimit stage before the singleton exchange);
    2. the pruned rows (≤ partitions × n per batch) merge into ONE
       synthetic-key stateful top-n buffer (state = n rows total).

    Output mode ``update`` (re-emits the buffer as it improves).
    """
    import pandas as pd

    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])
    sort_asc = [ascending] + ([True] if tiebreak else [])

    def prune(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            if len(pdf):
                yield pdf.sort_values(
                    sort_cols, ascending=sort_asc, kind="mergesort"
                ).head(n)

    pruned = df.mapInPandas(prune, df.schema)
    keyed = pruned.withColumn("__g", F.lit(1))
    out = stream_top_n(keyed, ["__g"], order_col, n, ascending, tiebreak).drop(
        "__g"
    )
    out._efo_output_mode = "update"
    return out


# ---------------------------------------------------------------------------
# streaming semi / anti joins (StreamingSemiAntiJoinOperator.java:36)
# ---------------------------------------------------------------------------


def stream_semi_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    lower,
    upper,
) -> DataFrame:
    """Streaming EXISTS: left rows with a time-bounded right match.
    Built-in left-semi stream-stream join; both sides need watermarks
    (state bounded by the interval)."""
    from flink_efo_spark.operators.joins import interval_join

    return interval_join(
        left, right, key, left_ts, right_ts, lower, upper, how="left_semi"
    ).select("l.*")


def stream_anti_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    lower,
    upper,
) -> DataFrame:
    """Streaming NOT EXISTS within the time bound: left-outer
    stream-stream join + IS NULL filter (the rewrite the reference's
    planner applies for NOT EXISTS; StreamingSemiAntiJoinOperator).
    Emission waits for the watermark to close the interval."""
    from flink_efo_spark.operators.joins import interval_join

    keys = [key] if isinstance(key, str) else list(key)
    probe_cols = [f"l.{c}" for c in left.columns]
    joined = interval_join(
        left, right, key, left_ts, right_ts, lower, upper, how="left_outer"
    )
    return joined.where(F.col(f"r.{right_ts}").isNull()).select(*probe_cols)


# ---------------------------------------------------------------------------
# temporal sort (StreamExecTemporalSort.scala:50, RowTimeSortOperator)
# ---------------------------------------------------------------------------


def stream_temporal_sort(
    df: DataFrame,
    ts_col: str,
    sink: Callable[[DataFrame, int], None],
    extra_order: list[str] | None = None,
    checkpoint_dir: str | None = None,
):
    """Event-time sort, the only streaming-legal sort: each micro-batch
    is sorted by (event time, tiebreaks) before reaching the sink
    (RowTimeSortOperator semantics — ordering guaranteed per batch,
    SURVEY §7.4 gap note). Returns the started query."""
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="efo-tsort-")
    order = [ts_col] + (extra_order or [])

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(batch_df.orderBy(*order), batch_id)

    return (
        df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def split_late(
    batch_df: DataFrame, ts_col: str, watermark_ts
) -> tuple[DataFrame, DataFrame]:
    """Late-data side-output analog (WindowedStream.sideOutputLateData
    in the reference; Spark silently drops late rows): inside
    foreachBatch, split a batch into (on-time, late) against a
    watermark timestamp the caller tracks."""
    on_time = batch_df.where(F.col(ts_col) >= F.lit(watermark_ts))
    late = batch_df.where(F.col(ts_col) < F.lit(watermark_ts))
    return on_time, late


def capture_late_rows(
    src: DataFrame, ts_col: str, delay_seconds: float
) -> tuple[DataFrame, DataFrame]:
    """Late-data side output, end to end (the reference's
    ``WindowedStream.sideOutputLateData``, WindowedStream.java:117 —
    Spark has no side outputs and silently drops late rows, so the
    engine tracks the watermark itself inside foreachBatch and TEES
    late rows to their own sink instead of losing them).

    Watermark semantics mirror Spark/Flink exactly: after each batch
    the watermark becomes ``max event time seen so far −
    delay_seconds``; a row in a later batch is LATE iff its event
    time is strictly below the watermark in force when its batch is
    processed. Returns ``(on_time, late)`` as batch frames after a
    bounded availableNow replay.

    Scale: the only driver-side work per trigger is one max() scalar
    (the same aggregate Spark's own watermark tracker computes); rows
    stream straight to the two parquet sinks, O(batch) appends.
    """
    import datetime

    spark = src.sparkSession
    base = tempfile.mkdtemp(prefix="efo-late-")
    ok_dir = os.path.join(base, "ontime")
    late_dir = os.path.join(base, "late")
    state: dict = {"max_ts": None}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # harness-scalar only: one max() per trigger, never row data
        bmax = batch_df.agg(F.max(ts_col)).collect()[0][0]
        if state["max_ts"] is None:
            on_time, late = batch_df, batch_df.where(F.lit(False))
        else:
            wm = state["max_ts"] - datetime.timedelta(seconds=delay_seconds)
            on_time, late = split_late(batch_df, ts_col, wm)
        on_time.write.mode("append").parquet(ok_dir)
        late.write.mode("append").parquet(late_dir)
        if bmax is not None and (
            state["max_ts"] is None or bmax > state["max_ts"]
        ):
            state["max_ts"] = bmax

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="efo-late-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    schema = src.schema
    return (
        spark.read.schema(schema).parquet(ok_dir),
        spark.read.schema(schema).parquet(late_dir),
    )


# ---------------------------------------------------------------------------
# streaming OVER aggregation
# ---------------------------------------------------------------------------


def stream_over_unbounded(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Streaming OVER (... ROWS UNBOUNDED PRECEDING) aggregation —
    RowTimeUnboundedPrecedingFunction / ProcTimeUnboundedPrecedingFunction
    semantics (/root/reference R/over/): every input row is emitted
    with running sum / count / min / max of ``value_col`` over all
    prior rows of its key (event-time order within each batch; state
    carries the running aggregates across batches — O(1) per key).

    Output columns: input columns + running_sum / running_cnt /
    running_min / running_max.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField

    out_schema = StructType(
        df.schema.fields
        + [
            StructField("running_sum", DoubleType()),
            StructField("running_cnt", LongType()),
            StructField("running_min", DoubleType()),
            StructField("running_max", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("s", DoubleType()),
            StructField("c", LongType()),
            StructField("mn", DoubleType()),
            StructField("mx", DoubleType()),
        ]
    )

    sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        s, c, mn, mx = (state.get if state.exists else (0.0, 0, None, None))
        # concat the batch's Arrow chunks before sorting — chunk order
        # within a micro-batch is arbitrary, so per-chunk sorting
        # would process the key's rows out of event-time order
        frames = [p for p in pdfs if len(p)]
        for pdf in ([pd.concat(frames, ignore_index=True)] if frames else []):
            pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
            v = pdf[value_col].astype(float)
            csum = v.cumsum() + s
            ccnt = pd.RangeIndex(1, len(pdf) + 1) + c
            cmin = v.cummin() if mn is None else v.cummin().clip(upper=mn)
            cmax = v.cummax() if mx is None else v.cummax().clip(lower=mx)
            out = pdf.copy()
            out["running_sum"] = csum
            out["running_cnt"] = list(ccnt)
            out["running_min"] = cmin
            out["running_max"] = cmax
            s = float(csum.iloc[-1])
            c = int(ccnt[-1])
            mn = float(cmin.iloc[-1])
            mx = float(cmax.iloc[-1])
            yield out
        state.update((s, c, mn, mx))

    out = df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
    out._efo_output_mode = "append"
    return out


def stream_over_bounded(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    rows_preceding: int | None = None,
    range_preceding: str | None = None,
    tiebreak: str | None = None,
    flush_on_timeout: bool = False,
) -> DataFrame:
    """Streaming OVER with a BOUNDED preceding frame — the reference's
    RowTimeRowsBoundedPrecedingFunction.java:60 (``ROWS N PRECEDING``)
    and RowTimeRangeBoundedPrecedingFunction.java:60 (``RANGE
    INTERVAL ... PRECEDING``), both in
    flink-table-runtime-blink/.../over/ and exercised by
    OverWindowITCase. Exactly one of:

    * ``rows_preceding=N`` — each row's frame is itself + the N
      previous rows of its key in (ts, tiebreak) order (SQL ``ROWS
      BETWEEN N PRECEDING AND CURRENT ROW``).
    * ``range_preceding='1 day'`` — the frame is every row of the key
      with ``ts`` in ``[row.ts - interval, row.ts]``, INCLUSIVE both
      ends and peer-inclusive at the current timestamp (SQL ``RANGE
      BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW``), matching the
      reference's same-timestamp batching in
      RowTimeRangeBoundedPrecedingFunction#onTimer.

    WATERMARK HOLD (``flush_on_timeout=True``): the reference buffers
    rows per timestamp and only fires the aggregate once the
    watermark passes that timestamp — so every same-timestamp peer is
    known before any of them emits. The analog here: rows carrying
    the buffer's NEWEST timestamp are held in state until a later
    micro-batch brings a strictly larger timestamp (merging any
    cross-batch peers first), and an event-time timeout flushes the
    final held rows at end-of-input (drive with an input that has
    ``withWatermark`` + a far-future sentinel batch, the repo's
    MAX_WATERMARK analog). With ``flush_on_timeout=False`` (default)
    rows emit immediately — exact whenever micro-batch boundaries
    never split a timestamp tie.

    Keyed state carries only the retention horizon — the last N rows
    (ROWS) or the trailing interval of the newest timestamp (RANGE),
    plus the held newest-timestamp rows — O(frame) per key, NOT the
    full history. Micro-batches must arrive in event-time order (the
    reference drops sub-watermark rows; this harness's split replay
    guarantees ordered batches). At 100 TB the shape holds: state is
    bounded by the frame, each batch does one vectorized pass per key
    (prefix sums + monotonic deque — O(rows)), and parallelism is the
    key cardinality.

    Output columns: input + ``frame_sum`` / ``frame_cnt`` /
    ``frame_min`` / ``frame_max``.
    """
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
    )

    if (rows_preceding is None) == (range_preceding is None):
        raise ValueError(
            "exactly one of rows_preceding / range_preceding is required"
        )
    range_us = (
        int(pd.Timedelta(range_preceding).total_seconds() * 1_000_000)
        if range_preceding is not None
        else None
    )

    data_cols = df.columns
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("frame_sum", DoubleType()),
            StructField("frame_cnt", LongType()),
            StructField("frame_min", DoubleType()),
            StructField("frame_max", DoubleType()),
        ]
    )
    # buffers live in state as plain lists in the numpy row-buffer
    # encoding (module header): int64 epoch-us for timestamps, double
    # with NaN-as-NULL for numerics, the original type for the rest
    enc = {c: _np_kind(df.schema[c].dataType) for c in data_cols}
    state_schema = StructType(
        [StructField("__pend", LongType())]
        + [
            StructField(
                f"__t_{c}",
                ArrayType(LongType()) if enc[c] == "ts"
                else ArrayType(DoubleType()) if enc[c] == "num"
                else ArrayType(df.schema[c].dataType))
            for c in data_cols
        ]
    )
    sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])

    from flink_efo_spark.pandas_compat import state_caster as _caster

    obj_casters = {
        c: _caster(df.schema[c].dataType)
        for c in data_cols if enc[c] == "obj"
    }
    _empty = {c: _np_empty(enc[c]) for c in data_cols}

    # Arrow->pandas conversion runs per GROUP per column in the
    # serializer, and a tz-aware timestamp column costs ~5x any other
    # type (per-group tz localization). Feed the operator int64
    # epoch-us instead — _np_series' 'ts' path handles either
    # representation, and the output converts back to datetime64[us].
    # Only possible WITHOUT flush_on_timeout: EventTimeTimeout
    # requires the watermarked attribute to survive into the stateful
    # operator's child plan (analyzer-enforced).
    src = df
    if not flush_on_timeout:
        from pyspark.sql.types import TimestampType as _Ts

        src = df.select(*[
            F.unix_micros(F.col(c)).alias(c)
            if isinstance(df.schema[c].dataType, _Ts) else F.col(c)
            for c in df.columns
        ])

    def _frames(ts_us: "np.ndarray", v: "np.ndarray", n: int):
        """frame_sum/cnt/min/max arrays over the SORTED rows."""
        if rows_preceding is not None:
            # ROWS frame: prefix sums over NaN-zeroed values replicate
            # pandas rolling(min_periods=1) semantics — NaNs are
            # skipped, the count is of non-NaN values, an all-NaN
            # frame yields NaN
            w = rows_preceding + 1
            ok = ~np.isnan(v)
            psum = np.concatenate([[0.0], np.cumsum(np.where(ok, v, 0.0))])
            pcnt = np.concatenate([[0], np.cumsum(ok)])
            hi = np.arange(1, n + 1)
            lo = np.maximum(0, hi - w)
            fcnt = pcnt[hi] - pcnt[lo]
            fsum = psum[hi] - psum[lo]
            pad_mn = np.concatenate([np.full(w - 1, np.inf),
                                     np.where(ok, v, np.inf)])
            pad_mx = np.concatenate([np.full(w - 1, -np.inf),
                                     np.where(ok, v, -np.inf)])
            from numpy.lib.stride_tricks import sliding_window_view

            fmin = sliding_window_view(pad_mn, w).min(axis=1)
            fmax = sliding_window_view(pad_mx, w).max(axis=1)
            empty = fcnt == 0
            if empty.any():
                fsum = np.where(empty, np.nan, fsum)
                fmin = np.where(empty, np.nan, fmin)
                fmax = np.where(empty, np.nan, fmax)
            return fsum, fcnt, fmin, fmax
        # RANGE frame [ts - range, ts], peer-inclusive: lo/hi are both
        # non-decreasing over the sorted rows, so sum/cnt ride prefix
        # sums (vectorized searchsorted) and min/max a monotonic
        # deque — one O(n) pass.
        lo = np.searchsorted(ts_us, ts_us - range_us, side="left")
        hi = np.searchsorted(ts_us, ts_us, side="right")
        psum = np.concatenate([[0.0], np.cumsum(v)])
        fsum = psum[hi] - psum[lo]
        fcnt = (hi - lo).astype("int64")
        from collections import deque

        mins = np.empty(n)
        maxs = np.empty(n)
        dq_mn: deque = deque()  # indices, values increasing
        dq_mx: deque = deque()  # indices, values decreasing
        filled = 0  # deques cover indices [lo[i], filled)
        for i in range(n):
            while filled < hi[i]:
                x = v[filled]
                while dq_mn and v[dq_mn[-1]] >= x:
                    dq_mn.pop()
                dq_mn.append(filled)
                while dq_mx and v[dq_mx[-1]] <= x:
                    dq_mx.pop()
                dq_mx.append(filled)
                filled += 1
            while dq_mn and dq_mn[0] < lo[i]:
                dq_mn.popleft()
            while dq_mx and dq_mx[0] < lo[i]:
                dq_mx.popleft()
            mins[i] = v[dq_mn[0]]
            maxs[i] = v[dq_mx[0]]
        return fsum, fcnt, mins, maxs

    def _out_pdf(cols: dict, frames: tuple, sel) -> "pd.DataFrame":
        """One output DataFrame in out_schema order; timestamps are
        converted back from epoch-us on the way out."""
        fsum, fcnt, fmin, fmax = frames
        out = {}
        for c in data_cols:
            a = cols[c][sel]
            out[c] = a.astype("datetime64[us]") if enc[c] == "ts" else a
        out["frame_sum"] = fsum[sel]
        out["frame_cnt"] = fcnt[sel]
        out["frame_min"] = fmin[sel]
        out["frame_max"] = fmax[sel]
        return pd.DataFrame(out, copy=False)

    def _save(state, tail: dict, n_pending: int) -> None:
        state.update(
            (
                int(n_pending),
                *[
                    _np_state_list(tail[c], enc[c], obj_casters.get(c))
                    for c in data_cols
                ],
            )
        )
        # arm the flush timer ONLY while rows are actually pending:
        # an unconditional re-arm would deserialize, sort and re-save
        # EVERY key ever seen on EVERY micro-batch (O(total keys), a
        # scale-killer at millions of keys) — retention-context rows
        # need no timer, they are read when the key's next data
        # arrives. A previously armed timer may still fire once with
        # n_pending == 0; that pass saves without re-arming, so the
        # key then goes permanently quiet.
        if flush_on_timeout and n_pending:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        if state.exists:
            st = state.get
            n_pending = int(st[0])
            tail = {
                c: _np_from_state(st[1 + i], enc[c])
                for i, c in enumerate(data_cols)
            }
            n_tail = len(tail[ts_col])
        else:
            n_pending = 0
            tail = _empty
            n_tail = 0

        if flush_on_timeout and state.hasTimedOut:
            # the timer fires on ANY batch that advances the watermark
            # while this key is idle. Held rows (all carrying the
            # buffer's newest timestamp) release only once the
            # watermark passes that timestamp — and the retention
            # context must SURVIVE the flush: a state.remove() here
            # would make the key's next rows compute frames from an
            # empty tail (undercounted ROWS/RANGE frames after one
            # idle batch). At end-of-input the MAX_WATERMARK releases
            # everything and the re-armed timer never fires again.
            #
            # The stored tail is ALWAYS (ts, tiebreak)-sorted (the
            # save sites only ever store a sorted-row subset), so no
            # sort is needed here.
            if n_pending:
                ts_us = tail[ts_col]
                wm_us = state.getCurrentWatermarkMs() * 1000
                if ts_us[-1] <= wm_us:  # pending rows share the max ts
                    frames = _frames(ts_us, tail[value_col], n_tail)
                    sel = np.zeros(n_tail, dtype=bool)
                    sel[n_tail - n_pending:] = True
                    yield _out_pdf(tail, frames, sel)
                    n_pending = 0
            _save(state, tail, n_pending)
            return

        news = []
        for p in pdfs:
            if len(p):
                news.append({c: _np_series(p[c], enc[c]) for c in data_cols})
        if not news:
            _save(state, tail, n_pending)
            return
        n_ctx = n_tail - n_pending
        parts = ([tail] if n_tail else []) + news
        if len(parts) == 1:
            allc = parts[0]
        else:
            allc = {
                c: np.concatenate([d[c] for d in parts]) for c in data_cols
            }
        order = _np_sortn([allc[c] for c in sort_cols])
        allc = {c: v[order] for c, v in allc.items()}
        n = len(order)
        ts_us = allc[ts_col]
        frames = _frames(ts_us, allc[value_col], n)
        max_ts = ts_us[-1]
        hold = (
            ts_us == max_ts
            if flush_on_timeout
            else np.zeros(n, dtype=bool)
        )
        # ordered-batch contract: context (already emitted) rows are
        # strictly older than every pending/new row, so after the sort
        # they are exactly the first n_ctx rows
        emit = ~hold
        emit[:n_ctx] = False
        if emit.any():
            yield _out_pdf(allc, frames, emit)
        if rows_preceding is not None:
            kept_idx = np.flatnonzero(~hold)[-rows_preceding:] if rows_preceding else np.array([], dtype=int)
            keep = np.zeros(n, dtype=bool)
            keep[kept_idx] = True
            keep |= hold
        else:
            keep = ts_us >= max_ts - range_us
        _save(state, {c: v[keep] for c, v in allc.items()}, int(hold.sum()))

    out = src.groupBy(*keys).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        "EventTimeTimeout" if flush_on_timeout else "NoTimeout",
    )
    out._efo_output_mode = "append"
    return out


# ---------------------------------------------------------------------------
# temporal join (row-time, stateful) — TemporalRowTimeJoinOperator.java:72
# ---------------------------------------------------------------------------


def stream_asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    build_value: str,
    watermark_delay: str | None = None,
    max_history: int | None = None,
    build_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming row-time temporal (as-of) join: for each probe row,
    the latest build row with the same key and build_ts <= probe_ts.

    Realization of TemporalRowTimeJoinOperator.java:72 semantics on
    ``applyInPandasWithState``: both streams are tagged and unioned
    (the operator's two-input form has no Spark equivalent), grouped
    by key; state buffers the build side's (ts, value) history sorted
    by ts; each micro-batch joins that batch's probe rows against
    state + batch build rows.

    State is BOUNDED two ways (the reference registers cleanup timers
    and prunes versions below the watermark on every watermark
    advance — same contract here):

    * ``watermark_delay`` — declares a watermark on the unioned
      event-time column; each trigger prunes every build version whose
      ts is <= watermark EXCEPT the latest such version (which future
      probes with ts > watermark may still match). This is exactly
      TemporalRowTimeJoinOperator's retention rule.
    * ``max_history`` — per-key hard cap (keep the newest N versions),
      a belt-and-braces guard for watermark-less event-time columns.

    Probing is vectorized: one ``np.searchsorted`` over the sorted
    history per micro-batch, not a Python loop per probe row.

    Output: probe columns + ``asof_ts`` + ``asof_value`` (+ one
    ``asof_<c>`` per extra column in ``build_cols`` — the WHOLE
    matched build row rides along atomically, the reference's
    whole-row emit).
    """
    import pandas as pd
    from pyspark.sql.types import ArrayType, StructField, TimestampType

    btt = build.schema[build_ts].dataType
    bvt = build.schema[build_value].dataType
    ts_is_timestamp = isinstance(btt, TimestampType)
    extras = [
        c
        for c in (build_cols or [])
        if c not in (build_value, build_ts, key)
    ]

    probe_cols = [c for c in probe.columns]
    tagged_probe = probe.select(
        F.col(key).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(bvt).alias("__bv"),
        *[
            F.lit(None).cast(build.schema[c].dataType).alias(f"__bx_{c}")
            for c in extras
        ],
        F.struct(*[F.col(c) for c in probe_cols]).alias("__p"),
    )
    tagged_build = build.select(
        F.col(key).alias("__k"),
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(build_value).alias("__bv"),
        *[F.col(c).alias(f"__bx_{c}") for c in extras],
        F.lit(None).cast(tagged_probe.schema["__p"].dataType).alias("__p"),
    )
    unioned = tagged_probe.unionByName(tagged_build)
    if watermark_delay is not None:
        unioned = unioned.withWatermark("__ts", watermark_delay)

    out_schema = StructType(
        [StructField(f.name, f.dataType) for f in probe.schema.fields]
        + [StructField("asof_ts", btt), StructField("asof_value", bvt)]
        + [
            StructField(f"asof_{c}", build.schema[c].dataType)
            for c in extras
        ]
    )
    # state: parallel arrays of the build history (kept sorted by ts)
    state_schema = StructType(
        [
            StructField("ts", ArrayType(btt)),
            StructField("v", ArrayType(bvt)),
        ]
        + [
            StructField(f"x_{c}", ArrayType(build.schema[c].dataType))
            for c in extras
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def fn(k, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        hist_ts: list = []
        hist_v: list = []
        hist_x: dict = {c: [] for c in extras}
        if state.exists:
            st = state.get
            hist_ts, hist_v = list(st[0]), list(st[1])
            for i, c in enumerate(extras):
                hist_x[c] = list(st[2 + i])
        probes = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            b = pdf[pdf["__side"] == 0]
            hist_ts.extend(b["__ts"])
            hist_v.extend(b["__bv"])
            for c in extras:
                hist_x[c].extend(b[f"__bx_{c}"])
            probes.append(pdf[pdf["__side"] == 1])
        # (ts, value) sort: among equal-ts build rows the max value is
        # last, so the searchsorted probe deterministically picks it
        # (NULL values sort first, matching DESC NULLS LAST oracles)
        order = sorted(
            range(len(hist_ts)),
            key=lambda i: (
                hist_ts[i],
                hist_v[i] is not None,
                hist_v[i] if hist_v[i] is not None else 0.0,
            ),
        )
        hist_ts = [hist_ts[i] for i in order]
        hist_v = [hist_v[i] for i in order]
        for c in extras:
            hist_x[c] = [hist_x[c][i] for i in order]

        # --- state pruning (TemporalRowTimeJoinOperator.java:72's
        # cleanup-on-watermark-advance): versions at or below the
        # watermark can never be matched by a future probe EXCEPT the
        # latest one of them, which remains the as-of answer for any
        # probe ts in (version_ts, watermark+delay...]. Keep that one,
        # drop everything older.
        wm_ms = 0
        try:
            wm_ms = state.getCurrentWatermarkMs()
        except Exception:
            wm_ms = 0
        if wm_ms > 0 and ts_is_timestamp and hist_ts:
            cutoff = pd.Timestamp(wm_ms, unit="ms")
            import bisect

            # index of first version strictly above the watermark
            first_live = bisect.bisect_right(hist_ts, cutoff)
            keep_from = max(0, first_live - 1)  # retain latest <= wm
            if keep_from > 0:
                hist_ts = hist_ts[keep_from:]
                hist_v = hist_v[keep_from:]
                for c in extras:
                    hist_x[c] = hist_x[c][keep_from:]
        if max_history is not None and len(hist_ts) > max_history:
            hist_ts = hist_ts[-max_history:]
            hist_v = hist_v[-max_history:]
            for c in extras:
                hist_x[c] = hist_x[c][-max_history:]
        state.update(
            (list(hist_ts), list(hist_v))
            + tuple(list(hist_x[c]) for c in extras)
        )

        if not probes:
            return
        allp = pd.concat(probes, ignore_index=True)
        if not len(allp):
            return
        recs = pd.DataFrame(
            [
                dict(p.asDict()) if hasattr(p, "asDict") else dict(p)
                for p in allp["__p"]
            ]
        )
        if hist_ts:
            import numpy as np

            hist_ts_np = pd.Index(hist_ts).values
            idx = (
                np.searchsorted(
                    hist_ts_np, pd.Index(allp["__ts"]).values, side="right"
                )
                - 1
            )
            got = idx >= 0
            safe = np.clip(idx, 0, None)
            if ts_is_timestamp:
                picked_ts = hist_ts_np[safe].copy()
                picked_ts[~got] = np.datetime64("NaT")
            else:
                picked_ts = np.where(got, hist_ts_np[safe], None)
            picked_v = np.where(
                got, np.asarray(hist_v, dtype=object)[safe], None
            )
            recs["asof_ts"] = picked_ts
            recs["asof_value"] = picked_v
            for c in extras:
                recs[f"asof_{c}"] = np.where(
                    got, np.asarray(hist_x[c], dtype=object)[safe], None
                )
        else:
            recs["asof_ts"] = pd.NaT if ts_is_timestamp else None
            recs["asof_value"] = None
            for c in extras:
                recs[f"asof_{c}"] = None
        yield recs[out_cols]

    out = unioned.groupBy("__k").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
    out._efo_output_mode = "append"
    return out


# ---------------------------------------------------------------------------
# temporal join (proc-time snapshot)
# ---------------------------------------------------------------------------


def temporal_join_proctime(
    stream_df: DataFrame,
    dim_provider: Callable[[SparkSession], DataFrame],
    on: list[str],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
):
    """Proc-time temporal join (TemporalProcessTimeJoinOperator.java:40):
    every micro-batch joins against the dimension table AS OF that
    batch — re-evaluated via ``dim_provider`` and broadcast. The
    joined batch is handed to ``sink(batch_df, batch_id)``.

    Returns the started StreamingQuery.
    """
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="efo-tjoin-")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        dim = dim_provider(batch_df.sparkSession)
        joined = batch_df.join(F.broadcast(dim), on=on, how="left")
        sink(joined, batch_id)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# changelog / output-mode inference
# ---------------------------------------------------------------------------


def infer_output_mode(df: DataFrame) -> str:
    """Engine-level port of FlinkChangelogModeInferenceProgram.scala:39:
    decide append / update / complete from the plan shape, since
    Catalyst carries no changelog trait.

    * pure pipeline (no stateful agg) → append
    * windowed/watermarked aggregation → append (results finalize)
    * unwindowed aggregation → update (rows change as data arrives;
      `complete` only for small result cardinality — caller's call)
    * dropDuplicates → append
    """
    if not df.isStreaming:
        return "append"
    # stateful engine operators declare their sink mode explicitly
    # (applyInPandasWithState's declared mode is not recoverable from
    # the analyzed plan)
    declared = getattr(df, "_efo_output_mode", None)
    if declared is not None:
        return declared
    plan = df._jdf.queryExecution().analyzed().toString()
    has_agg = "Aggregate" in plan
    has_window = "window#" in plan or "session_window" in plan
    has_watermark = "EventTimeWatermark" in plan
    has_flatmap_state = "FlatMapGroupsInPandasWithState" in plan
    if has_flatmap_state:
        return "update"
    if has_agg and has_window and has_watermark:
        return "append"
    if has_agg:
        return "update"
    return "append"


# ---------------------------------------------------------------------------
# updatable sink (RetractableTopNFunction.java:57 / UpdatableTopNFunction
# semantics): keyed upsert into a real (parquet) sink via foreachBatch
# ---------------------------------------------------------------------------


def stream_upsert_sink(
    df: DataFrame,
    keys: list[str],
    out_dir: str,
    mode: str = "update",
    checkpoint_dir: str | None = None,
):
    """Maintain a continuously-updated keyed table in a REAL sink —
    what the reference's retract stream (-U/+U pairs,
    StreamingJoinOperator.java:38, RetractableTopNFunction.java:57)
    drives into an upserting external system.

    Plain parquet has no transactional MERGE, so this uses the
    log-structured shape every lakehouse MERGE implements underneath:
    each micro-batch OVERWRITES its own epoch directory
    ``out_dir/__batch_id=<epoch>`` (O(batch) per trigger — never
    rewrites the table), and :func:`read_upsert_result` resolves
    last-writer-wins per key at read time. Periodic
    :func:`compact_upsert` bounds read amplification. On
    Delta/Iceberg the foreachBatch body would be a single
    ``MERGE INTO`` — the operator contract is identical.

    **Exactly-once on failure/restart** (the reference's
    TwoPhaseCommitSinkFunction.java / CheckpointCoordinator contract):
    Spark's foreachBatch re-runs an epoch whose commit didn't make
    the checkpoint; because the epoch id is deterministic and the
    write targets the epoch's OWN directory with ``overwrite``, a
    replayed epoch replaces its partial output instead of appending a
    duplicate — the sink is idempotent per epoch, so
    kill-and-restart converges to the same table (test:
    tests/test_streaming.py restart test).

    Returns the started StreamingQuery (bounded via availableNow).
    """
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="efo-upsert-ckpt-")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={batch_id}")
        )

    return (
        df.writeStream.foreachBatch(upsert)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_upsert_result(
    spark: SparkSession, out_dir: str, keys: list[str]
) -> DataFrame:
    """Resolve the upsert log to the current table: per key-group, the
    rows written by the LATEST batch that touched it (update-mode
    operators re-emit the whole group per batch, so the last batch's
    rows ARE the group's current state)."""
    from pyspark.sql import Window

    log = spark.read.parquet(out_dir)
    w = Window.partitionBy(*keys)
    return (
        log.withColumn("__maxb", F.max("__batch_id").over(w))
        .where(F.col("__batch_id") == F.col("__maxb"))
        .drop("__batch_id", "__maxb")
    )


def read_changelog(
    spark: SparkSession, out_dir: str, keys: list[str]
) -> DataFrame:
    """Per-row changelog with explicit RowKind — the reference's
    retract-stream surface (RowKind.java:27-58 ``+I``/``-U``/``+U``,
    emitted by GroupAggFunction.java:43 on every group update) —
    derived from a :func:`stream_upsert_sink` log.

    Spark's update-mode operators re-emit changed key-groups but never
    expose the before-image; the upsert log has every version of every
    key stamped with its batch, so the changelog is a pure window
    derivation: per key ordered by ``__batch_id``, the first version
    is ``+I`` and each later version v emits ``-U`` (previous values)
    then ``+U`` (v). Columns: the key/value columns plus ``row_kind``
    and ``change_seq`` (batch id; within a batch ``-U`` sorts before
    ``+U`` via ``kind_order``).

    Scale: one shuffle on the key columns + a lag window — O(log) in
    the changelog length, no driver collection, no per-trigger state
    rewrite. Assumes one row per key per batch (the group-agg
    contract); composite emissions (top-n) must include the rank in
    ``keys``.
    """
    log = spark.read.parquet(out_dir)
    value_cols = [c for c in log.columns if c not in set(keys) | {"__batch_id"}]
    w = Window.partitionBy(*keys).orderBy("__batch_id")
    versions = log.withColumn("__prev", F.lag(F.struct(*value_cols)).over(w))
    after = versions.select(
        *keys,
        *value_cols,
        F.when(F.col("__prev").isNull(), F.lit("+I"))
        .otherwise(F.lit("+U"))
        .alias("row_kind"),
        F.col("__batch_id").alias("change_seq"),
        F.when(F.col("__prev").isNull(), F.lit(0)).otherwise(F.lit(2)).alias(
            "kind_order"
        ),
    )
    before = versions.where(F.col("__prev").isNotNull()).select(
        *keys,
        "__prev.*",
        F.lit("-U").alias("row_kind"),
        F.col("__batch_id").alias("change_seq"),
        F.lit(1).alias("kind_order"),
    )
    return after.unionByName(before)


def apply_changelog(changelog: DataFrame, keys: list[str]) -> DataFrame:
    """Materialize a changelog back into its final table — the sink
    side of the retract contract (ChangelogMode.java:36: a sink
    accepting +I/-U/+U reconstructs current state). Multiset
    semantics: a row version survives iff its inserts (+I/+U) exceed
    its retractions (-U/-D); no per-key ordering needed, so this is
    one hash aggregate over the full row."""
    value_cols = [
        c
        for c in changelog.columns
        if c not in {"row_kind", "change_seq", "kind_order"}
    ]
    credit = F.when(
        F.col("row_kind").isin("+I", "+U"), F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        changelog.groupBy(*value_cols)
        .agg(F.sum(credit).alias("__net"))
        .where(F.col("__net") > 0)
        .drop("__net")
    )


def incremental_agg_apply(
    prev_agg: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    count_col: str = "cnt",
    sums: dict[str, str] | None = None,
) -> DataFrame:
    """Maintain a per-key (count + sums) aggregate from a changelog
    WITHOUT rescanning the base data — the reference's continuous-
    query incremental model (GroupAggFunction.java accumulate /
    retract) as a batch delta apply:

        delta(key)  = Σ credit            (credit: +1 for +I/+U,
                      Σ credit · value             -1 for -U/-D)
        agg'(key)   = agg(key) ⊕ delta(key); keys whose count drops
                      to 0 disappear (the reference emits -D there).

    ``prev_agg`` carries ``keys + count_col + sums.keys()``;
    ``sums`` maps each aggregate column in ``prev_agg`` to the
    changelog value column feeding it. Cost: one aggregation of the
    DELTA (not the base) + one outer join against the prior aggregate
    — at 100 TB the base table is never touched, which is the whole
    point of changelog-driven maintenance.
    """
    sums = sums or {}
    credit = F.when(
        F.col("row_kind").isin("+I", "+U"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta_aggs = [F.sum(credit).alias("__dc")] + [
        F.sum(credit * F.col(src)).alias(f"__d_{out}")
        for out, src in sums.items()
    ]
    delta = changelog.groupBy(*keys).agg(*delta_aggs)
    # null-safe key match: a USING join would never pair the NULL key
    # group across the two sides (two output rows); eqNullSafe pairs
    # it like any other group (round-4 ADVICE). Alias both sides —
    # prev_agg commonly shares lineage with the changelog and the
    # dataset-column condition would be flagged as an ambiguous
    # self-join otherwise.
    p, d = prev_agg.alias("__prev"), delta.alias("__delta")

    def _pc(c: str):
        return F.col(f"__prev.`{c}`")

    def _dc(c: str):
        return F.col(f"__delta.`{c}`")

    cond = None
    for k in keys:
        c = _pc(k).eqNullSafe(_dc(k))
        cond = c if cond is None else cond & c
    joined = p.join(d, cond, "full_outer")
    key_cols = [F.coalesce(_pc(k), _dc(k)).alias(k) for k in keys]

    def _upd(prev_col: str, delta_col: str):
        # zero literal cast to the PREV column's type, result cast
        # back to it: a double 0.0 here silently promoted decimal /
        # long aggregates to double on every apply (round-4 ADVICE)
        t = prev_agg.schema[prev_col].dataType
        zero = F.lit(0).cast(t)
        return (
            F.coalesce(_pc(prev_col), zero)
            + F.coalesce(_dc(delta_col), zero)
        ).cast(t).alias(prev_col)

    out_cols = [_upd(count_col, "__dc")] + [
        _upd(out, f"__d_{out}") for out in sums
    ]
    return (
        joined.select(*key_cols, *out_cols)
        .where(F.col(count_col) > 0)
    )


def compact_upsert(spark: SparkSession, out_dir: str, keys: list[str]) -> None:
    """Rewrite the upsert log as a resolved snapshot (single batch id
    0) — the compaction that bounds read amplification on a
    long-running stream."""
    snap = read_upsert_result(spark, out_dir, keys)
    tmp = out_dir.rstrip("/") + ".compact"
    snap.write.mode("overwrite").parquet(os.path.join(tmp, "__batch_id=0"))
    import shutil

    # write-then-swap, never delete-then-move: a crash between an
    # rmtree and the move would lose the whole table; here the worst
    # case is an orphan .old/.compact dir beside an intact log
    old = out_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(out_dir, old)
    shutil.move(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)


# ---------------------------------------------------------------------------
# bounded execution helper (tests + oracle-checkable stream queries)
# ---------------------------------------------------------------------------


def run_stream_to_table(
    df: DataFrame,
    mode: str | None = None,
    name: str | None = None,
    update_keys: list[str] | None = None,
) -> DataFrame:
    """TEST/ORACLE HARNESS ONLY — executes a streaming frame to
    completion (availableNow, one bounded replay — the Flink
    bounded-stream execution equivalent) and returns the result as a
    batch DataFrame. The memory sink collects every output row onto
    the driver; user-facing pipelines should write through
    ``writeStream`` sinks or :func:`stream_upsert_sink` instead (the
    operators themselves are sink-agnostic).

    Update-mode caveat (exactly the reference's retract-stream
    contract): the memory sink APPENDS each batch's updates, so a
    multi-batch update-mode replay leaves stale per-key rows in the
    table. Pass ``update_keys`` for such queries — the run then goes
    through :func:`stream_upsert_sink` + last-writer-wins resolution
    and is correct for any trigger cadence. Without ``update_keys``,
    update-mode results are only valid for single-trigger replays
    (asserted here).
    """
    spark = df.sparkSession
    name = name or f"efo_stream_{uuid.uuid4().hex[:8]}"
    mode = mode or infer_output_mode(df)
    if mode == "update" and update_keys is not None:
        out_dir = os.path.join(
            tempfile.mkdtemp(prefix=f"efo-upsert-{name}-"), "data"
        )
        q = stream_upsert_sink(df, update_keys, out_dir, mode=mode)
        q.awaitTermination()
        return read_upsert_result(spark, out_dir, update_keys)
    checkpoint = tempfile.mkdtemp(prefix=f"efo-ckpt-{name}-")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if mode == "update":
        # single-trigger replays emit each key-group once; more than
        # one trigger means the memory table holds stale duplicates —
        # fail loudly rather than return wrong rows.
        real = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if len(real) > 1:
            raise ValueError(
                f"update-mode replay ran {len(real)} triggers with input; "
                "memory-sink results would contain stale per-key rows — "
                "pass update_keys= for a keyed-upsert resolution"
            )
    return spark.table(name)


def process_timer_sessions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str,
) -> DataFrame:
    """KeyedProcessFunction with an EVENT-TIME TIMER — the reference's
    ProcessFunction + TimerService model
    (flink-streaming-java/.../functions/KeyedProcessFunction.java +
    InternalTimerService; the canonical docs example: emit a per-key
    session summary when no event arrives for ``gap``).

    Spark realization: ``applyInPandasWithState`` with
    ``EventTimeTimeout`` — ``state.setTimeoutTimestamp(ms)`` IS the
    single per-key event-time timer (fires when the watermark passes
    it), which covers the reference's dominant one-timer-per-key
    pattern. (Spark 4's ``transformWithStateInPandas`` offers the
    richer multi-timer / multi-state / TTL surface 1:1 with the
    reference's state API, but its worker needs protobuf, absent in
    this environment — the semantics here are identical for a single
    timer.)

    A session closes EITHER when a later event of its key exceeds the
    gap (emitted inline) or when the timer at ``last_ts + gap`` fires.
    Output: ``(key, session_start_us, session_last_us, n_events)``,
    append mode; timestamps are millisecond-truncated (timer
    resolution). State: 3 longs + one pending timeout per key;
    per-batch work is a vectorized numpy segment split.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import StructField

    gap_ms = _duration_us(gap) // 1000
    key_field = df.schema[key_col]
    out_schema = StructType(
        [
            key_field,
            *[
                StructField(n, LongType())
                for n in ("session_start_us", "session_last_us", "n_events")
            ],
        ]
    )
    cols = [key_col, "session_start_us", "session_last_us", "n_events"]
    state_schema = "n long, start_ms long, last_ms long"

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            n, start_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], start_ms * 1000, last_ms * 1000, n)], columns=cols
            )
            return
        pdf = pd.concat(list(pdfs)).sort_values(ts_col)
        # unit-safe epoch-ms: Arrow may deliver the ts column as
        # datetime64[ns] OR [us] (the _epoch_us gotcha) — a bare
        # astype('int64') would be off by 1000x in the [us] case
        ms = (
            pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
            // 1000
        )
        bounds = np.flatnonzero(np.diff(ms) > gap_ms) + 1
        # interval merge of the batch's gap-segments with the stored
        # session: late events within the watermark delay may sort
        # BEFORE the stored session (or bridge into it), so the naive
        # "append batch after state" merge would regress session_last
        # and mis-split; sorting intervals by start and chaining on
        # the max-so-far last handles every arrival order
        ivals = [
            (int(s[0]), int(s[-1]), int(len(s))) for s in np.split(ms, bounds)
        ]
        if state.exists:
            n0, start0, last0 = state.get
            ivals.append((int(start0), int(last0), int(n0)))
            ivals.sort(key=lambda iv: iv[0])
        merged = [ivals[0]]
        for s, l, n in ivals[1:]:
            ps, pl, pn = merged[-1]
            if s - pl <= gap_ms:
                merged[-1] = (ps, max(pl, l), pn + n)
            else:
                merged.append((s, l, n))
        out = [(key[0], s * 1000, l * 1000, n) for s, l, n in merged[:-1]]
        start, last, n = merged[-1]
        state.update((n, start, last))
        state.setTimeoutTimestamp(last + gap_ms)
        if out:
            yield pd.DataFrame(out, columns=cols)

    out = (
        df.select(key_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    # without this, infer_output_mode maps the FlatMapGroupsInPandas
    # plan to "update" and run_stream_to_table(mode=None) starts the
    # query in an output mode Spark rejects for this operator
    out._efo_output_mode = "append"
    return out


def stream_incremental_dedup(
    src: DataFrame,
    id_col: str,
    fingerprint: Column,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Continuous-ingest corpus dedup backed by a PERSISTENT signature
    store (the streaming form of
    :func:`flink_efo_spark.operators.dedup.dedup_incremental`): each
    micro-batch is deduped within itself and against every signature
    ingested by PRIOR batches, then appends its own signatures. The
    store outlives the query — a restarted (or brand-new) query keeps
    deduping against everything already ingested, which keyed
    streaming state (`dropDuplicates`) cannot do across checkpoints.

    Exactly-once on crash-restart: batch N's survivors and signatures
    both land in ``epoch=N``-addressed dirs with overwrite (the
    epoch-dir idempotent-upsert pattern, io.py) and the store read
    EXCLUDES the current epoch, so replaying a half-finished batch
    recomputes the identical result instead of deduping the batch
    against its own first attempt.

    Scale: the store is one 32-char key per distinct document,
    partitioned by epoch; the per-batch cost is the batch's shuffle
    plus an anti-join against signatures only (bucketable at 100 TB).

    Returns the started streaming query (availableNow trigger).
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from flink_efo_spark.operators.dedup import dedup_incremental

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            store = spark.read.parquet(store_dir).where(
                F.col("epoch") != F.lit(int(batch_id))
            )
        except AnalysisException:  # first batch: store not created yet
            store = spark.createDataFrame([], "fingerprint STRING")
        fresh, sigs = dedup_incremental(
            batch_df, store, id_col, fingerprint
        )
        fresh.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={int(batch_id)}")
        )
        sigs.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"epoch={int(batch_id)}")
        )

    return (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_near_dedup(
    src: DataFrame,
    id_col: str,
    text_col: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    num_perm: int = 12,
    bands: int = 3,
    shingle_size: int = 3,
):
    """Continuous-ingest NEAR-duplicate dedup backed by a persistent
    LSH band-key store (the streaming form of
    :func:`flink_efo_spark.operators.dedup.dedup_incremental_near`,
    completing the dedup matrix: exact/near x batch/incremental/
    streaming). Identical epoch-dir idempotent-upsert protocol to
    :func:`stream_incremental_dedup`: batch N's survivors and band
    keys land in epoch-addressed dirs with overwrite and the store
    read EXCLUDES the current epoch, so a crash-replayed batch
    recomputes the identical result. The store holds distinct
    (band_idx, band_hash) pairs only — bodies are never kept, so the
    per-batch cost is the batch's own signature map plus key joins.

    Returns the started streaming query (availableNow trigger).
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from flink_efo_spark.operators.dedup import dedup_incremental_near

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            store = spark.read.parquet(store_dir).where(
                F.col("epoch") != F.lit(int(batch_id))
            )
        except AnalysisException:  # first batch: store not created yet
            store = spark.createDataFrame(
                [], "band_idx INT, band_hash BIGINT"
            )
        fresh, keys = dedup_incremental_near(
            batch_df, store, id_col, text_col,
            num_perm=num_perm, bands=bands, shingle_size=shingle_size,
        )
        fresh.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={int(batch_id)}")
        )
        keys.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"epoch={int(batch_id)}")
        )

    return (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_semantic_dedup(
    src,
    id_col: str,
    vec_col: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    centroids: list,
    threshold: float = 0.95,
    keep: str = "max_centroid_sim",
):
    """Continuous-ingest SEMANTIC dedup backed by a persistent
    survivor-vector store (the streaming form of
    :func:`flink_efo_spark.operators.similarity.
    semantic_dedup_incremental` — completing the dedup matrix's third
    row: exact/near/SEMANTIC x batch/incremental/streaming). Identical
    epoch-dir idempotent-upsert protocol to
    :func:`stream_incremental_dedup`: batch N's survivors and their
    (cluster, vec) store rows land in epoch-addressed dirs with
    overwrite and the store read EXCLUDES the current epoch, so a
    crash-replayed batch recomputes the identical result.

    ``centroids`` is the FIXED coarse quantizer (train once at
    bootstrap); per-batch cost is the batch's own cluster-local
    pairwise pass plus a batch-vs-store join co-partitioned on
    cluster.

    Returns the started streaming query (availableNow trigger).
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from flink_efo_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    def handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            store = spark.read.parquet(store_dir).where(
                F.col("epoch") != F.lit(int(batch_id))
            )
        except AnalysisException:  # first batch: store not created yet
            store = spark.createDataFrame(
                [], "cluster INT, vec ARRAY<FLOAT>"
            )
        fresh, rows = semantic_dedup_incremental(
            batch_df, store, id_col, vec_col,
            centroids=centroids, threshold=threshold, keep=keep,
        )
        fresh.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={int(batch_id)}")
        )
        rows.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"epoch={int(batch_id)}")
        )

    return (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def epoch_below(store_dir: str, before: int | None = None) -> int | None:
    """Largest ``epoch=N`` partition directory in an epoch-addressed
    store (optionally restricted to ``N < before``), or None. The
    directory layout IS the epoch index — reading it replaces a
    parquet-scan + max() Spark job per micro-batch. Epochs >= the
    running batch are excluded by the caller's ``before``, which keeps
    the crash-replay contract: a half-finished attempt of the current
    epoch is never read back."""
    try:
        names = os.listdir(store_dir)
    except FileNotFoundError:
        return None
    epochs = [
        int(n.split("=", 1)[1])
        for n in names
        if n.startswith("epoch=") and n.split("=", 1)[1].isdigit()
    ]
    if before is not None:
        epochs = [e for e in epochs if e < before]
    return max(epochs) if epochs else None


def stream_incremental_pagerank(
    src: DataFrame,
    src_col: str,
    dst_col: str,
    store_dir: str,
    ranks_dir: str,
    checkpoint_dir: str,
    n_iter_per_batch: int = 2,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
):
    """Continuous-ingest PageRank over an EVOLVING graph backed by a
    persistent edge store — the streaming Gelly row: each micro-batch
    of new edges joins the accumulated (distinct) edge set, and the
    rank snapshot is refreshed with ``n_iter_per_batch`` exact-integer
    rounds WARM-STARTED from the previous snapshot
    (operators/iterate.pagerank_warm; new vertices enter at the
    cold-start value). The store and snapshot outlive the query — a
    restarted or brand-new query keeps evolving the same ranking,
    which bounded per-query streaming state cannot do.

    Exactly-once on crash-restart (the stream_incremental_dedup
    epoch-dir pattern): batch N's edge slice and its rank snapshot
    both land in ``epoch=N``-addressed dirs with overwrite, and every
    read EXCLUDES epochs >= N — replaying a half-finished batch
    recomputes the identical snapshot instead of compounding rounds
    on top of its own first attempt.

    Determinism: snapshot_N is a pure function of the cumulative
    distinct edge multiset E_N and snapshot_{N-1} through integer
    arithmetic (one floored IEEE division on identical operands per
    contribution, pagerank's discipline) — the whole evolving-graph
    recurrence replays bit-identically in SQL with the rounds
    unrolled, so a DuckDB oracle can check the final snapshot.

    Scale: the store holds (src, dst) longs partitioned by epoch; a
    batch costs the distinct-union against the store plus
    ``n_iter_per_batch`` O(E) co-keyed rounds — the warm start is
    what keeps the per-batch round count constant instead of the
    full mixing time. Returns the started query (availableNow).
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from flink_efo_spark.operators.iterate import pagerank_warm

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch = int(batch_id)
        # localCheckpoint is load-bearing both times: batch_edges
        # feeds the union AND the end-of-batch store write, and
        # all_edges is read by every pagerank_warm consumer (nodes,
        # out-degrees, adjacency, rank init) — without the pins each
        # consumer re-runs the store scan + two distinct shuffles.
        batch_edges = (
            batch_df.select(
                F.col(src_col).cast("long").alias("src"),
                F.col(dst_col).cast("long").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        try:
            prior = spark.read.parquet(store_dir).where(
                F.col("epoch") < F.lit(epoch)
            ).select("src", "dst")
        except AnalysisException:  # first batch: store not created yet
            prior = spark.createDataFrame([], "src LONG, dst LONG")
        all_edges = (
            prior.unionByName(batch_edges).distinct()
            .localCheckpoint(eager=True)
        )
        # prior snapshot epoch from the epoch=N directory names — the
        # store layout IS the epoch index, no parquet-scan job needed
        last = epoch_below(ranks_dir, epoch)
        init = (
            spark.read.parquet(
                os.path.join(ranks_dir, f"epoch={last}")
            ).select("id", "r")
            if last is not None
            else spark.createDataFrame([], "id LONG, r LONG")
        )
        ranks = pagerank_warm(
            all_edges,
            init,
            n_iter=n_iter_per_batch,
            scale=scale,
            damp_num=damp_num,
            damp_den=damp_den,
        )
        ranks.write.mode("overwrite").parquet(
            os.path.join(ranks_dir, f"epoch={epoch}")
        )
        batch_edges.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"epoch={epoch}")
        )

    return (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_keyed_coprocess(
    data: DataFrame,
    control: DataFrame,
    partition_by: list[str],
    data_ts: str,
    control_ts: str,
    rule_cols: list[str],
    data_cols: list[str],
    tiebreak: str | None = None,
    flush_on_timeout: bool = False,
    max_buffer: int = 100_000,
) -> DataFrame:
    """Connected streams with SHARED KEYED STATE — the
    KeyedCoProcessFunction analog (flink-streaming-java/.../co/
    KeyedCoProcessFunction.java: processElement1/processElement2 over
    one keyed state; wired by DataStream.connect, DataStream.java).
    Spark has no two-input stateful operator, so both streams are
    tagged and unioned (the same realization as stream_asof_join) and
    grouped on the key into ``applyInPandasWithState``.

    Semantics (the canonical dynamic-rules co-process): control rows
    carry ``rule_cols`` updates; every data row emits with the rule
    in effect at its event time plus ``n_since_rule`` — how many data
    rows (itself included) arrived since that rule was installed. A
    data row before any control row emits NULL rules (segment 0). At
    one timestamp, control applies before data (deterministic tie
    rule; the reference is arrival-ordered, which an event-time
    program cannot be).

    Event-time correctness across batches: rows are buffered in keyed
    state and PROCESSED ONLY UP TO THE WATERMARK — a data row is
    stamped exactly when no earlier control row can still arrive
    (the reference buffers in state and drains on watermark in its
    event-time co-process examples). The walk over the emitted prefix
    is vectorized (segment ids by cumulative control count, rules
    forward-filled per segment) — no per-row Python in the hot path.
    ``flush_on_timeout`` is the MAX_WATERMARK end-of-input flush;
    ``max_buffer`` hard-caps per-key state (oldest rows dropped).

    Output: partition keys + ``data_cols`` + ``rule_<c>`` per rule
    column + ``n_since_rule``. Requires a watermark on the unioned
    event-time column (pass streams already carrying one, or rely on
    the caller's withWatermark upstream).
    """
    import pandas as pd  # noqa: F401 — pdfs frames in fn's signature
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        IntegerType,
        StructField,
        TimestampType,
    )

    if not isinstance(data.schema[data_ts].dataType, TimestampType):
        raise ValueError("stream_keyed_coprocess needs a timestamp "
                         "event-time column (watermark-gated emission)")
    d_cols = [c for c in data_cols if c not in partition_by]
    tagged_ctrl = control.select(
        *[F.col(k) for k in partition_by],
        F.col(control_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rule_cols],
        *[
            F.lit(None).cast(data.schema[c].dataType).alias(f"__d_{c}")
            for c in d_cols
        ],
        (F.lit(None).cast(data.schema[tiebreak].dataType)
         if tiebreak else F.lit(0)).alias("__tb"),
    )
    tagged_data = data.select(
        *[F.col(k) for k in partition_by],
        F.col(data_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(control.schema[c].dataType).alias(f"__r_{c}")
            for c in rule_cols
        ],
        *[F.col(c).alias(f"__d_{c}") for c in d_cols],
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
    )
    unioned = tagged_ctrl.unionByName(tagged_data)

    buf_cols = [c for c in unioned.columns if c not in partition_by]
    out_schema = StructType(
        [unioned.schema[k] for k in partition_by]
        + [StructField(c, data.schema[c].dataType) for c in d_cols]
        + [StructField(f"rule_{c}", control.schema[c].dataType)
           for c in rule_cols]
        + [StructField("n_since_rule", LongType())]
    )
    out_cols = [f.name for f in out_schema.fields]
    # buffers live in state as pickled numpy arrays (see the module
    # header: binary-opaque to the JVM); the declared element types
    # document the logical encoding — int64 epoch-us for 'ts', double
    # with NaN-as-NULL for 'num', the original type for 'obj'
    enc = {c: _np_kind(unioned.schema[c].dataType) for c in buf_cols}
    state_schema = StructType(
        [StructField(
            f"__b_{c}",
            ArrayType(LongType()) if enc[c] == "ts"
            else ArrayType(DoubleType()) if enc[c] == "num"
            else ArrayType(unioned.schema[c].dataType))
         for c in buf_cols]
        + [StructField(f"__cur_{c}", control.schema[c].dataType)
           for c in rule_cols]
        + [StructField("__has_rule", BooleanType()),
           StructField("__n_since", LongType()),
           StructField("__side_pad", IntegerType())]
    )

    n_buf = len(buf_cols)

    from flink_efo_spark.pandas_compat import state_caster as _caster

    rule_casters = {c: _caster(control.schema[c].dataType) for c in rule_cols}
    obj_casters = {
        c: _caster(unioned.schema[c].dataType)
        for c in buf_cols if enc[c] == "obj"
    }
    _empty = {c: _np_empty(enc[c]) for c in buf_cols}

    def _emit(keyvals, em: dict, n: int, cur_rule, has_rule, n_since):
        """Vectorized stamp of the watermark-cleared prefix (bare
        numpy, one output DataFrame); returns (rows-or-None, cur_rule,
        has_rule, n_since)."""
        is_ctrl = em["__side"] == 0
        is_data = ~is_ctrl
        data_cum = np.cumsum(is_data)
        filled_rules = {}
        for c in rule_cols:
            v = em[f"__r_{c}"]
            if v.dtype == object:  # cold path: non-numeric rule column
                import pandas as pd

                filled = pd.Series(v).ffill().to_numpy(dtype=object)
                if has_rule and cur_rule[c] is not None:
                    nulls = np.array([x is None for x in filled], dtype=bool)
                    filled[nulls] = cur_rule[c]
            else:
                filled = _np_ffill(v, n)
                if has_rule and cur_rule[c] is not None:
                    filled = np.where(
                        np.isnan(filled), float(cur_rule[c]), filled
                    )
            filled_rules[c] = filled
        # count of data rows within each rule segment, carrying
        # segment 0 (rows before this prefix's first control row) on
        # from the previous batches. data_cum is nondecreasing, so the
        # running max of its value AT control positions is "data rows
        # seen up to the latest control row at-or-before me".
        seg_base = np.maximum.accumulate(np.where(is_ctrl, data_cum, 0))
        n_in_seg = data_cum - seg_base
        n_in_seg[np.cumsum(is_ctrl) == 0] += n_since
        # advance the carried rule/counter. Per COLUMN, the carried
        # value is the last non-null across this prefix's control rows
        # (falling back to the previous carry) — mirroring the
        # ffill+fill used to stamp rows above: a control row that
        # sets only rule y must not wipe the carried rule x, or the
        # NEXT batch's rows would see NULL where this batch's saw 5
        # (output would depend on micro-batch cadence)
        if is_ctrl.any():
            for c in rule_cols:
                v = em[f"__r_{c}"]
                if v.dtype == object:
                    nn = [x for x in v[is_ctrl] if x is not None]
                    if nn:
                        cur_rule[c] = nn[-1]
                else:
                    nn = v[~np.isnan(v)]  # rules ride only control rows
                    if len(nn):
                        cur_rule[c] = float(nn[-1])
            has_rule = True
            last = n - 1 - int(np.argmax(is_ctrl[::-1]))
            n_since = int(data_cum[-1] - data_cum[last])
        else:
            n_since = int(n_since + data_cum[-1]) if n else n_since
        nd = int(data_cum[-1]) if n else 0
        if not nd:
            return None, cur_rule, has_rule, n_since
        import pandas as pd

        out = {k: np.full(nd, v) for k, v in keyvals.items()}
        for c in d_cols:
            out[c] = em[f"__d_{c}"][is_data]
        for c in rule_cols:
            out[f"rule_{c}"] = filled_rules[c][is_data]
        out["n_since_rule"] = n_in_seg[is_data]
        return pd.DataFrame(out, copy=False), cur_rule, has_rule, n_since

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        if state.exists:
            st = state.get
            tail = {
                c: _np_from_state(st[i], enc[c])
                for i, c in enumerate(buf_cols)
            }
            cur_rule = {c: st[n_buf + i] for i, c in enumerate(rule_cols)}
            has_rule = bool(st[n_buf + len(rule_cols)])
            n_since = int(st[n_buf + len(rule_cols) + 1] or 0)
            n_tail = len(tail["__ts"])
        else:
            tail = _empty
            cur_rule = {c: None for c in rule_cols}
            has_rule, n_since = False, 0
            n_tail = 0
        keyvals = {k: key[i] for i, k in enumerate(partition_by)}
        wm_us = state.getCurrentWatermarkMs() * 1000

        def save(hold, n_hold):
            state.update((
                *[
                    _np_state_list(hold[c], enc[c], obj_casters.get(c))
                    for c in buf_cols
                ],
                *[rule_casters[c](cur_rule[c]) for c in rule_cols],
                bool(has_rule), int(n_since), 0,
            ))
            # arm the flush timer ONLY while rows are actually held:
            # an unconditional re-arm costs one Python invocation per
            # key EVER seen per micro-batch (O(total keys) at scale).
            # Installed rules stay in state without a timer and are
            # read when the key's next data arrives; a stale timer
            # fires at most once more (empty hold -> no re-arm).
            if flush_on_timeout and n_hold:
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)

        if flush_on_timeout and state.hasTimedOut:
            # the timer fires on ANY batch that advances the watermark
            # while this key is idle — not only at end-of-input. Emit
            # only the watermark-CLEARED prefix and keep the rest (and
            # the installed rules!) in state: a state.remove() here
            # would prematurely emit above-watermark rows and erase
            # cur_rule, so keys seen again later would lose their
            # broadcast rules (the BroadcastState guarantee). At true
            # end-of-input the MAX_WATERMARK clears everything and the
            # re-armed timer simply never fires again.
            #
            # The stored tail is ALWAYS (ts, side, tb)-sorted (the save
            # sites below only ever store a sorted suffix), so the
            # watermark split is a prefix slice — no sort, no copy.
            rows = None
            k = (
                int(np.searchsorted(tail["__ts"], wm_us, side="right"))
                if n_tail else 0
            )
            if k:
                em = {c: tail[c][:k] for c in buf_cols}
                rows, cur_rule, has_rule, n_since = _emit(
                    keyvals, em, k, cur_rule, has_rule, n_since,
                )
            save({c: tail[c][k:] for c in buf_cols}, n_tail - k)
            if rows is not None:
                yield rows
            return

        news = []
        for p in pdfs:
            if len(p):
                news.append({c: _np_series(p[c], enc[c]) for c in buf_cols})
        n_new = sum(len(d["__ts"]) for d in news)
        if not n_new and not n_tail:
            save(tail, 0)
            return
        if news:
            parts = ([tail] if n_tail else []) + news
            if len(parts) == 1:
                allc = parts[0]
            else:
                allc = {
                    c: np.concatenate([d[c] for d in parts])
                    for c in buf_cols
                }
            order = _np_sortn([allc["__ts"], allc["__side"], allc["__tb"]])
            allc = {c: v[order] for c, v in allc.items()}
        else:
            allc = tail  # already sorted
        n_all = n_tail + n_new
        k = int(np.searchsorted(allc["__ts"], wm_us, side="right"))
        rows = None
        if k:
            em = {c: allc[c][:k] for c in buf_cols}
            rows, cur_rule, has_rule, n_since = _emit(
                keyvals, em, k, cur_rule, has_rule, n_since,
            )
        hold = {c: allc[c][k:] for c in buf_cols}
        n_hold = n_all - k
        if n_hold > max_buffer:
            hold = {c: v[-max_buffer:] for c, v in hold.items()}
            n_hold = max_buffer
        save(hold, n_hold)
        if rows is not None:
            yield rows

    out = unioned.groupBy(*partition_by).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        "EventTimeTimeout" if flush_on_timeout else "NoTimeout",
    )
    out._efo_output_mode = "append"
    return out


def stream_broadcast_process(
    data: DataFrame,
    control: DataFrame,
    key_col: str,
    data_ts: str,
    control_ts: str,
    rule_cols: list[str],
    data_cols: list[str],
    n_buckets: int = 32,
    tiebreak: str | None = None,
    flush_on_timeout: bool = False,
) -> DataFrame:
    """Broadcast state pattern (flink-streaming-java/.../co/
    BroadcastProcessFunction.java + BroadcastState: a small control
    stream is replicated to EVERY parallel instance, and the keyed
    main stream is evaluated against the instance-local rule state —
    DataStream.broadcast(...) wiring, DataStream.java:365-511).

    Spark-first realization: the parallel instance becomes an explicit
    BUCKET — control rows are replicated ``n_buckets`` times (a
    crossJoin with a literal bucket range: the broadcast cost is
    rules × buckets, NEVER rules × keys or rules × rows), data rows
    route to ``pmod(hash(key), n_buckets)``, and the shared-state
    machinery is :func:`stream_keyed_coprocess` keyed on the bucket.
    Every bucket sees every rule, so any data key — including keys
    first seen long after a rule was installed — is stamped with the
    rule in effect at its event time, exactly BroadcastState's
    new-key behavior that a per-key control routing cannot give.

    Output: ``__bucket`` + ``data_cols`` + ``rule_<c>`` per rule
    column + ``n_since_rule`` (per-bucket counter — meaningful as an
    instance-local statistic, the same scope Flink gives operator
    state). ``key_col`` must be in ``data_cols`` to ride through.
    """
    ctrl_rep = control.crossJoin(
        F.broadcast(
            data.sparkSession.range(n_buckets).select(
                F.col("id").cast("int").alias("__bucket")
            )
        )
    )
    data_b = data.withColumn(
        "__bucket", F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )
    return stream_keyed_coprocess(
        data_b,
        ctrl_rep,
        ["__bucket"],
        data_ts,
        control_ts,
        rule_cols=rule_cols,
        data_cols=data_cols,
        tiebreak=tiebreak,
        flush_on_timeout=flush_on_timeout,
    )


def stream_token_budget_sample(
    src: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Stateful streaming QUOTA admission: per group, admit documents
    until the group's token budget is exhausted — the streaming form
    of :func:`flink_efo_spark.operators.sampling.token_budget_sample`.
    Arrival order decides (a stream cannot see future documents), with
    the stable id-hash order breaking ties INSIDE each micro-batch, so
    a replayed batch admits the identical set. The crossing document
    is admitted (every group reaches its budget); groups without a
    budget drop at the filter, before state. State per group is ONE
    long (tokens consumed) — a quota ledger, not a buffer.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    if not budgets:
        raise ValueError("budgets must name at least one group")
    for g, b in budgets.items():
        if int(b) < 0:
            raise ValueError(f"budget for {g!r} must be >= 0: {b}")
    out_schema = StructType([src.schema[c] for c in src.columns])
    state_schema = StructType([StructField("__used", LongType())])
    cols = list(src.columns)
    bmap = {g: int(b) for g, b in budgets.items()}

    # the stable tie-break hash is computed JVM-side before the
    # stateful op (it rides into the worker as an extra input column,
    # absent from out_schema) — a per-row Python hashlib map in the
    # admission hot path would serialize ingest at scale
    filtered = src.where(F.col(group_col).isin(*bmap.keys())).withColumn(
        "__h", F.md5(F.col(id_col).cast("string"))
    )

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        used = int(state.get[0]) if state.exists else 0
        budget = bmap[key[0]]
        # Arrow may deliver one group as several chunks — the hash
        # order must apply to the WHOLE micro-batch, so concat first
        frames = [p for p in pdfs if len(p)]
        if frames and used < budget:
            pdf = pd.concat(frames, ignore_index=True)
            pdf = pdf.sort_values(["__h", id_col], kind="mergesort")
            cum = used + pdf[token_col].astype("int64").cumsum()
            keep = (cum - pdf[token_col].astype("int64")) < budget
            out = pdf[keep]
            if keep.any():
                used = int(cum[keep].max())
            if len(out):
                yield out[cols]
        state.update((used,))

    out = filtered.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
    out._efo_output_mode = "append"
    return out


def stream_curation_gate(
    src: DataFrame,
    id_col: str,
    text_col: str,
    out_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
):
    """Continuous-ingest curation gate — the streaming form of
    :func:`flink_efo_spark.operators.text.curation_funnel_report`:
    every micro-batch of documents runs the minimal curation chain
    (presence → Gopher word-count gate → full Gopher repetition
    ruleset → exact normalized dedup WITHIN the batch); surviving
    documents land in ``out_dir`` and the batch's 4-row funnel report
    lands in ``stats_dir`` — both epoch-addressed with overwrite, so
    a crash-replayed batch recomputes the identical output instead of
    double-counting (the stream_incremental_dedup epoch-dir
    exactly-once protocol). Cross-batch dedup is deliberately NOT
    this operator's job — compose with
    :func:`stream_incremental_dedup` downstream for the store-backed
    guarantee.

    Determinism: every stage flag is doc-local except the in-batch
    dedup (min-id per norm-hash, a total order), so batch N's outputs
    are a pure function of batch N's rows — an ntile replay of the
    same table yields identical stats and survivors in any engine.

    Scale: per-batch cost is the repetition ruleset's (one gram
    explode + partial-agg groupBy + co-keyed join) plus a norm-hash
    window bounded by duplicate-group size; the funnel aggregate is
    1 row unpivoted to 4. Returns the started query (availableNow).
    """
    from flink_efo_spark.operators.text import (
        _curation_stage_flags,
        curation_funnel_report,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        epoch = int(batch_id)
        batch_df = batch_df.localCheckpoint(eager=True)
        flags = _curation_stage_flags(batch_df, id_col, text_col)
        kept = batch_df.join(
            flags.where("__s4").select(id_col), id_col
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={epoch}")
        )
        report = curation_funnel_report(batch_df, id_col, text_col)
        report.write.mode("overwrite").parquet(
            os.path.join(stats_dir, f"epoch={epoch}")
        )

    return (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
