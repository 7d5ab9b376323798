"""Streaming-core tests: real micro-batch execution to completion
(availableNow trigger), results checked against batch/DuckDB
equivalents — the bounded-stream ITCase pattern
(StreamingWithStateTestBase in the reference).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_efo_spark.sources import efo_event_stream, shard_of, shard_stats
from flink_efo_spark.streaming import (
    infer_output_mode,
    run_stream_to_table,
    session_agg,
    stream_dedup_keep_first,
    stream_dedup_keep_last,
    stream_table,
    stream_top_n,
    tumble_agg,
)
from tests.conftest import SF_DIR, duck_rows, rows_of


def test_stream_tumble_agg_matches_batch(spark, ddb):
    ev = stream_table(spark, SF_DIR, "events", watermark=("ts", "10 minutes"))
    agg = tumble_agg(
        ev, "ts", "5 minutes", ["event_type"],
        F.count("*").alias("cnt"),
    )
    assert agg.isStreaming
    assert infer_output_mode(agg) == "append"
    got = run_stream_to_table(agg).select(
        F.unix_micros("w_start").alias("w_us"), "event_type", "cnt"
    )
    # append mode emits exactly the FINALIZED windows: end <= final
    # watermark (max ts - 10 min). Spark has no end-of-input
    # MAX_WATERMARK flush (SURVEY §7.4 documented gap vs Flink).
    exp = duck_rows(
        ddb,
        """
        WITH wm AS (SELECT epoch(max(ts)) - 600 AS w FROM events)
        SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000 AS w_us,
               event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
        HAVING (floor(epoch(any_value(ts)) / 300) * 300 + 300)
               <= (SELECT w FROM wm)
        """,
    )
    assert rows_of(got) == exp


def test_stream_dedup_keep_first_distinct_pairs(spark, ddb):
    ev = stream_table(spark, SF_DIR, "events")
    dd = stream_dedup_keep_first(
        ev.select("user_id", "event_type"), ["user_id", "event_type"]
    )
    got = run_stream_to_table(dd)
    exp = duck_rows(ddb, "SELECT DISTINCT user_id, event_type FROM events")
    assert rows_of(got) == exp


def test_stream_dedup_keep_last(spark, ddb):
    ev = stream_table(spark, SF_DIR, "events")
    dd = stream_dedup_keep_last(
        ev.select("user_id", "event_type", "ts", "event_id"),
        ["user_id", "event_type"],
        "ts",
    )
    assert infer_output_mode(dd) == "update"
    got = run_stream_to_table(dd).select("user_id", "event_type", "event_id")
    # oracle: latest ts per (user, type); within one availableNow batch
    # ties resolve to the last-sorted row — tiebreak on event_id is the
    # batch row with max ts then max original order; use max event_id
    # among max-ts rows for determinism
    exp = duck_rows(
        ddb,
        """
        SELECT user_id, event_type, event_id FROM (
          SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC) AS rn,
                 ts,
                 max(ts) OVER (PARTITION BY user_id, event_type) AS mts
          FROM events) WHERE ts = mts AND rn >= 1
        """,
    )
    # keep-last must pick SOME row with the max ts per key
    got_rows = set(rows_of(got))
    exp_rows = set(exp)
    assert got_rows <= exp_rows
    keys_got = {(r[0], r[1]) for r in got_rows}
    keys_exp = {(r[0], r[1]) for r in exp_rows}
    assert keys_got == keys_exp


def test_stream_top_n_matches_batch(spark, ddb):
    ev = stream_table(spark, SF_DIR, "events")
    tn = stream_top_n(
        ev.select("user_id", "event_id", "value"),
        ["user_id"], "value", 3, ascending=False, tiebreak="event_id",
    )
    got = run_stream_to_table(tn)
    exp = duck_rows(
        ddb,
        """
        SELECT user_id, event_id, value FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 3
        """,
    )
    assert rows_of(got) == exp


def test_session_agg_batch_equals_query(spark, ddb):
    # session windows on the batch frame (unified runner behavior)
    from flink_efo_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    out = session_agg(ev, "ts", "30 minutes", ["user_id"], F.count("*").alias("n"))
    assert not out.isStreaming
    assert out.columns == ["w_start", "w_end", "user_id", "n"]
    assert out.count() > 0


def test_efo_stream_shard_stats(spark, ddb):
    ev = efo_event_stream(spark, SF_DIR, num_shards=4)
    assert ev.isStreaming and "shard" in ev.columns
    stats = shard_stats(ev)
    got = run_stream_to_table(stats, mode="complete")
    rows = got.collect()
    assert 1 <= len(rows) <= 4
    total = sum(r.n_records for r in rows)
    [n_events] = ddb.execute("SELECT count(*) FROM events").fetchone()
    assert total == n_events
    # shard assignment is the portable md5 ring — cross-check one value
    from flink_efo_spark.catalog import load_table

    batch = load_table(spark, SF_DIR, "events").withColumn(
        "shard", shard_of("user_id", 4)
    )
    assert batch.select("shard").distinct().count() == len(rows)


def test_stream_semi_anti_join(spark, ddb):
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_anti_join,
        stream_semi_join,
        stream_table,
    )

    clicks = stream_table(
        spark, SF_DIR, "events", watermark=("ts", "10 minutes")
    ).where(F.col("event_type") == "click")
    errors = stream_table(
        spark, SF_DIR, "events", watermark=("ts", "10 minutes")
    ).where(F.col("event_type") == "error")
    semi = stream_semi_join(
        clicks.select("event_id", "user_id", "ts"), errors,
        "user_id", "ts", "ts", "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES",
    )
    got_semi = {r.event_id for r in run_stream_to_table(semi).collect()}
    exp_semi = {
        r[0]
        for r in ddb.execute(
            """
            SELECT a.event_id FROM events a
            WHERE a.event_type = 'click' AND EXISTS (
              SELECT 1 FROM events b
              WHERE b.event_type = 'error' AND b.user_id = a.user_id
                AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE)
            """
        ).fetchall()
    }
    assert got_semi == exp_semi

    anti = stream_anti_join(
        clicks.select("event_id", "user_id", "ts"), errors,
        "user_id", "ts", "ts", "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES",
    )
    got_anti = {r.event_id for r in run_stream_to_table(anti).collect()}
    [n_clicks] = ddb.execute(
        "SELECT count(*) FROM events WHERE event_type = 'click'"
    ).fetchone()
    # anti emission waits for the watermark: rows whose interval is not
    # yet closed at end-of-input stay in state, so got_anti is a subset
    exp_anti_full = set(
        r[0]
        for r in ddb.execute(
            """
            SELECT a.event_id FROM events a
            WHERE a.event_type = 'click' AND NOT EXISTS (
              SELECT 1 FROM events b
              WHERE b.event_type = 'error' AND b.user_id = a.user_id
                AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE)
            """
        ).fetchall()
    )
    assert got_anti <= exp_anti_full
    assert got_semi.isdisjoint(got_anti)
    assert len(got_semi | exp_anti_full) == n_clicks


def test_stream_anti_join_sentinel_flushes_tail(spark, ddb):
    """Without the MAX_WATERMARK sentinel the tail anti rows stay in
    state forever (the query watermark is the MIN over both filtered
    sides — it never passes the last click's interval). With a
    far-future click+error sentinel batch, the bounded replay matches
    batch NOT EXISTS exactly. Reference: bounded sources emit
    Watermark.MAX_WATERMARK on finish (StreamSource semantics)."""
    import datetime

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_anti_join,
        stream_table_split,
    )

    max_ts = (
        load_table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    )
    far = max_ts + datetime.timedelta(minutes=30)
    src = stream_table_split(
        spark, SF_DIR, "events", 4, "ts",
        sentinel_rows=[
            {"event_id": -1, "user_id": -1, "event_type": "click",
             "ts": far, "value": 0.0},
            {"event_id": -2, "user_id": -2, "event_type": "error",
             "ts": far, "value": 0.0},
        ],
    )
    clicks = (
        src.where(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "10 minutes")
    )
    errors = src.where(F.col("event_type") == "error").withWatermark(
        "ts", "10 minutes"
    )
    anti = stream_anti_join(
        clicks, errors,
        "user_id", "ts", "ts", "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES",
    )
    got = {
        r.event_id
        for r in run_stream_to_table(anti)
        .where(F.col("user_id") >= 0)
        .collect()
    }
    exp = {
        r[0]
        for r in ddb.execute(
            """
            SELECT a.event_id FROM events a
            WHERE a.event_type = 'click' AND NOT EXISTS (
              SELECT 1 FROM events b
              WHERE b.event_type = 'error' AND b.user_id = a.user_id
                AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE)
            """
        ).fetchall()
    }
    assert got == exp  # exact — including the tail rows


def test_stream_temporal_sort(spark):
    from flink_efo_spark.streaming import stream_table, stream_temporal_sort

    ev = stream_table(spark, SF_DIR, "events")
    seen = {}

    def sink(batch_df, batch_id):
        rows = batch_df.select("ts", "event_id").collect()
        seen[batch_id] = rows

    q = stream_temporal_sort(ev, "ts", sink, extra_order=["event_id"])
    q.awaitTermination()
    assert seen
    for rows in seen.values():
        ts_list = [(r.ts, r.event_id) for r in rows]
        assert ts_list == sorted(ts_list)


def test_split_late(spark):
    import datetime as dt

    from flink_efo_spark.streaming import split_late

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base), (2, base + dt.timedelta(hours=2))], "id int, ts timestamp"
    )
    on_time, late = split_late(df, "ts", base + dt.timedelta(hours=1))
    assert [r.id for r in on_time.collect()] == [2]
    assert [r.id for r in late.collect()] == [1]


def test_stream_asof_join_bounded(spark, ddb):
    from flink_efo_spark.streaming import run_stream_to_table, stream_asof_join, stream_table

    ev = stream_table(spark, SF_DIR, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    build = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    out = stream_asof_join(probe, build, "user_id", "ts", "ts", "value")
    got = run_stream_to_table(out).select(
        "event_id", F.round("asof_value", 4).alias("av")
    )
    exp = ddb.execute(
        """
        SELECT p.event_id, round(b.bval, 4) AS av
        FROM (SELECT * FROM events WHERE event_type = 'click') p
        LEFT JOIN LATERAL (
          SELECT b.value AS bval FROM events b
          WHERE b.event_type = 'signup' AND b.user_id = p.user_id
            AND b.ts <= p.ts
          ORDER BY b.ts DESC LIMIT 1
        ) b ON true
        """
    ).fetchall()
    exp_map = {r[0]: r[1] for r in exp}
    got_rows = got.collect()
    assert len(got_rows) == len(exp_map)
    mismatch = [r for r in got_rows if exp_map[r.event_id] != r.av]
    # equal-ts build duplicates could tie-break differently; allow none
    # here because (user_id, ts) is near-unique in the fixture
    assert not mismatch, mismatch[:3]


def test_stream_asof_join_cross_batch(spark, tmp_path):
    """Build rows arriving in an EARLIER batch must be visible to probe
    rows in a LATER batch (state carries the build history)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    b_dir = str(tmp_path / "asof_src")
    # batch 1: one build row; batch 2: one probe row after it
    spark.createDataFrame(
        [(1, base, 0, 10.0)], "k int, ts timestamp, side int, v double"
    ).coalesce(1).write.parquet(b_dir + "/f1.parquet")
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=5), 1, 0.0)],
        "k int, ts timestamp, side int, v double",
    ).coalesce(1).write.parquet(b_dir + "/f2.parquet")

    from flink_efo_spark.streaming import run_stream_to_table, stream_asof_join

    schema = spark.read.parquet(b_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(b_dir)
    )
    probe = src.where(F.col("side") == 1).select("k", "ts")
    build = src.where(F.col("side") == 0).select("k", "ts", "v")
    out = stream_asof_join(probe, build, "k", "ts", "ts", "v")
    got = run_stream_to_table(out).collect()
    assert len(got) == 1
    assert got[0].asof_value == 10.0


def test_stream_asof_join_state_bounded(spark, tmp_path):
    """With a watermark, build versions below it are pruned (except the
    latest — still the as-of answer for future probes), and with
    max_history the per-key state is hard-capped; results for in-order
    probes must be identical either way. Round-2 VERDICT item 2."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    b_dir = str(tmp_path / "asof_bounded")
    # 4 batches: build updates every batch, probe rows trail behind
    for i in range(4):
        rows = [(1, base + dt.timedelta(minutes=10 * i), 0, float(i))]
        if i >= 1:
            # probe at the time of the PREVIOUS build version
            rows.append(
                (1, base + dt.timedelta(minutes=10 * (i - 1), seconds=30), 1, 0.0)
            )
        spark.createDataFrame(
            rows, "k int, ts timestamp, side int, v double"
        ).coalesce(1).write.parquet(b_dir + f"/f{i}.parquet")

    from flink_efo_spark.streaming import run_stream_to_table, stream_asof_join

    schema = spark.read.parquet(b_dir + "/f0.parquet").schema

    def run(**kw):
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(b_dir)
        )
        probe = src.where(F.col("side") == 1).select("k", "ts")
        build = src.where(F.col("side") == 0).select("k", "ts", "v")
        out = stream_asof_join(probe, build, "k", "ts", "ts", "v", **kw)
        return sorted(
            (r.ts, r.asof_value) for r in run_stream_to_table(out).collect()
        )

    unbounded = run()
    watermarked = run(watermark_delay="5 minutes")
    capped = run(max_history=2)
    # each probe at minute 10(i-1)+0.5 must see build version i-1
    assert [v for _, v in unbounded] == [0.0, 1.0, 2.0]
    assert watermarked == unbounded
    assert capped == unbounded


def test_run_stream_to_table_update_multibatch(spark, tmp_path):
    """Update-mode + multi-trigger replay: the memory sink holds stale
    per-key rows, so run_stream_to_table must refuse without
    update_keys and resolve last-writer-wins with them (round-2
    ADVICE regression)."""
    import pytest

    src_dir = str(tmp_path / "upd_src")
    spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, v double"
    ).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        [("a", 3.0)], "k string, v double"
    ).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    from flink_efo_spark.streaming import run_stream_to_table

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema

    def agg_stream():
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
        )
        return src.groupBy("k").agg(F.sum("v").alias("s"))

    with pytest.raises(ValueError, match="update_keys"):
        run_stream_to_table(agg_stream())

    got = {
        r.k: r.s
        for r in run_stream_to_table(
            agg_stream(), update_keys=["k"]
        ).collect()
    }
    assert got == {"a": 4.0, "b": 2.0}


def test_count_tumble_stream_matches_batch(spark, tmp_path):
    """Count-tumbling windows (countWindow(3)): a multi-batch replay
    in arrival order must fire exactly the complete windows the batch
    bucketing produces, with pending partial windows carried in state
    across batches (CountTumblingWindowAssigner + CountTrigger)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    src_dir = str(tmp_path / "cw_src")
    # key 1: 5 rows over two batches -> one complete window of 3,
    # remainder 2 never fires; key 2: exactly 3 rows -> one window
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=m), float(m)) for m in (0, 1)]
        + [(2, base + dt.timedelta(minutes=m), 10.0 + m) for m in (0, 1)],
        "k int, ts timestamp, v double",
    ).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=m), float(m)) for m in (2, 3, 4)]
        + [(2, base + dt.timedelta(minutes=2), 12.0)],
        "k int, ts timestamp, v double",
    ).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    from flink_efo_spark.streaming import (
        count_tumble_agg,
        run_stream_to_table,
        stream_count_tumble,
    )

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    got = run_stream_to_table(
        stream_count_tumble(src, ["k"], 3, "v", order_by=["ts"])
    )
    batch = count_tumble_agg(
        spark.read.option("recursiveFileLookup", "true").parquet(src_dir),
        ["k"],
        ["ts"],
        3,
        "v",
    )
    key = lambda r: (r.k, r.w_idx)
    got_rows = sorted(
        ((r.k, r.w_idx, r.cnt, r.sum_value) for r in got.collect())
    )
    batch_rows = sorted(
        ((r.k, r.w_idx, r.cnt, r.sum_value) for r in batch.collect())
    )
    assert got_rows == batch_rows
    # exactly one fired window per key; partials never fire
    assert [r[0] for r in got_rows] == [1, 2]
    assert got_rows[0][2] == 3 and got_rows[1][2] == 3


def test_stream_sort_limit_multibatch(spark, tmp_path):
    """Keyless global sort-limit: the top-n buffer merges across
    micro-batches; the final update equals the batch ORDER BY/LIMIT
    (StreamExecSortLimit semantics)."""
    src_dir = str(tmp_path / "ssl_src")
    spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 1.0)], "id int, v double"
    ).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        [(4, 7.0), (5, 2.0), (6, 9.5)], "id int, v double"
    ).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    from flink_efo_spark.streaming import run_stream_to_table, stream_sort_limit

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    out = stream_sort_limit(src, "v", 3, ascending=False, tiebreak="id")
    got = run_stream_to_table(out, update_keys=[])
    assert sorted((r.id, r.v) for r in got.collect()) == [
        (2, 9.0),
        (4, 7.0),
        (6, 9.5),
    ]


def test_stream_upsert_sink_multibatch(spark, tmp_path):
    """Updatable-sink demo (RetractableTopNFunction semantics): after
    a multi-batch replay through the keyed-upsert parquet sink, the
    resolved table equals the batch answer — including after
    compaction. Round-2 VERDICT item 8."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    src_dir = str(tmp_path / "ups_src")
    # two batches of scored rows per key; top-2 per key should evolve
    spark.createDataFrame(
        [("a", base, 1.0), ("a", base, 5.0), ("b", base, 7.0)],
        "k string, ts timestamp, score double",
    ).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        [("a", base + dt.timedelta(minutes=1), 9.0),
         ("b", base + dt.timedelta(minutes=1), 3.0)],
        "k string, ts timestamp, score double",
    ).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    from flink_efo_spark.streaming import (
        compact_upsert,
        read_upsert_result,
        stream_top_n,
        stream_upsert_sink,
    )

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    topn = stream_top_n(src, ["k"], "score", n=2)
    out_dir = str(tmp_path / "ups_out")
    q = stream_upsert_sink(topn, ["k"], out_dir)
    q.awaitTermination()

    expected = {("a", 9.0), ("a", 5.0), ("b", 7.0), ("b", 3.0)}
    got = {
        (r.k, r.score)
        for r in read_upsert_result(spark, out_dir, ["k"]).collect()
    }
    assert got == expected
    compact_upsert(spark, out_dir, ["k"])
    got2 = {
        (r.k, r.score)
        for r in read_upsert_result(spark, out_dir, ["k"]).collect()
    }
    assert got2 == expected


def test_count_slide_stream_matches_batch(spark, tmp_path):
    """countWindow(size=4, slide=2): multi-batch replay fires the same
    windows as the batch ROWS-frame bucketing, with the evictor buffer
    carried across batches."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    src_dir = str(tmp_path / "cs_src")
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=m), float(m)) for m in range(3)],
        "k int, ts timestamp, v double",
    ).coalesce(1).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=m), float(m)) for m in range(3, 7)],
        "k int, ts timestamp, v double",
    ).coalesce(1).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    from flink_efo_spark.streaming import (
        count_slide_agg,
        run_stream_to_table,
        stream_count_slide,
    )

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    got = run_stream_to_table(
        stream_count_slide(src, ["k"], size=4, slide=2, value_col="v",
                           order_by=["ts"])
    )
    batch = count_slide_agg(
        spark.read.option("recursiveFileLookup", "true").parquet(src_dir),
        ["k"], ["ts"], size=4, slide=2, value_col="v",
    )
    got_rows = sorted((r.k, r.w_idx, r.cnt, r.sum_value) for r in got.collect())
    batch_rows = sorted(
        (r.k, r.w_idx, r.cnt, r.sum_value) for r in batch.collect()
    )
    assert got_rows == batch_rows
    # 7 rows, slide 2 -> fires at rows 2,4,6; early window is partial
    assert [(w, c) for _, w, c, _ in got_rows] == [(1, 2), (2, 4), (3, 4)]


def test_stream_asof_join_multi_column(spark, tmp_path):
    """stream_asof_join with build_cols: the WHOLE matched build row
    is emitted atomically — a NULL in the latest build row surfaces as
    NULL, never backfilled from an older version (whole-row emit,
    mirroring the batch asof_join contract)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    src_dir = str(tmp_path / "asof_mc")
    spark.createDataFrame(
        [
            (1, base, 0, 1.0, "old_w"),
            (1, base + dt.timedelta(minutes=5), 0, 2.0, None),
        ],
        "k int, ts timestamp, side int, v double, w string",
    ).coalesce(1).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=6), 1, 0.0, None)],
        "k int, ts timestamp, side int, v double, w string",
    ).coalesce(1).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    from flink_efo_spark.streaming import run_stream_to_table, stream_asof_join

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    probe = src.where(F.col("side") == 1).select("k", "ts")
    build = src.where(F.col("side") == 0).select("k", "ts", "v", "w")
    out = stream_asof_join(
        probe, build, "k", "ts", "ts", "v", build_cols=["w"]
    )
    [row] = run_stream_to_table(out).collect()
    assert row.asof_value == 2.0
    # latest build row's w is NULL — must NOT leak "old_w"
    assert row.asof_w is None


def test_changelog_rowkind_round_trip(spark, tmp_path):
    """RowKind changelog (RowKind.java:27-58): the upsert log of an
    update-mode agg derives +I/-U/+U rows with before-images, and
    apply_changelog reconstructs the final table from the changelog
    alone (retract multiset semantics)."""
    from flink_efo_spark.streaming import apply_changelog, read_changelog

    # hand-built upsert log: key a updated twice, key b inserted once
    log = spark.createDataFrame(
        [
            ("a", 1, 0), ("b", 10, 0),   # batch 0: inserts
            ("a", 2, 1),                  # batch 1: a updated
            ("a", 3, 2),                  # batch 2: a updated again
        ],
        "k string, v int, __batch_id int",
    )
    out = str(tmp_path / "log")
    log.write.parquet(out)
    ch = read_changelog(spark, out, ["k"]).collect()
    kinds = sorted((r.k, r.row_kind, r.v, r.change_seq) for r in ch)
    assert kinds == [
        ("a", "+I", 1, 0), ("a", "+U", 2, 1), ("a", "+U", 3, 2),
        ("a", "-U", 1, 1), ("a", "-U", 2, 2),
        ("b", "+I", 10, 0),
    ]
    # -U sorts before +U within a change_seq
    a_rows = sorted(
        ((r.change_seq, r.kind_order, r.row_kind) for r in ch if r.k == "a")
    )
    assert [k for _, _, k in a_rows] == ["+I", "-U", "+U", "-U", "+U"]
    final = {
        (r.k, r.v)
        for r in apply_changelog(
            read_changelog(spark, out, ["k"]), ["k"]
        ).collect()
    }
    assert final == {("a", 3), ("b", 10)}


def test_window_early_fire_partial_then_final(spark):
    """Early-fire emit strategy (WindowEmitStrategy.scala:33): a
    4-trigger replay emits growing partial values for the same window
    before its final value, and the resolved finals equal the batch
    windowed aggregate."""
    from flink_efo_spark.streaming import (
        stream_table_split,
        tumble_agg,
        window_early_fire,
    )

    src = stream_table_split(
        spark, SF_DIR, "events", n_batches=4, order_col="ts"
    )
    agg = tumble_agg(
        src, "ts", "1 day", ["event_type"], F.count("*").alias("cnt")
    )
    fire_log, final = window_early_fire(agg, ["w_start", "event_type"])

    # at least one window fired in >1 trigger with strictly growing
    # partials (time-sliced batches guarantee windows straddle them)
    multi = (
        fire_log.groupBy("w_start", "event_type")
        .agg(
            F.countDistinct("__batch_id").alias("fires"),
            F.max("cnt").alias("max_cnt"),
            F.min("cnt").alias("min_cnt"),
        )
        .where((F.col("fires") > 1) & (F.col("max_cnt") > F.col("min_cnt")))
    )
    assert multi.count() > 0

    batch = tumble_agg(
        spark.read.parquet(f"{SF_DIR}/events.parquet"),
        "ts", "1 day", ["event_type"], F.count("*").alias("cnt"),
    )
    got = {
        (r.w_start, r.event_type): r.cnt
        for r in final.select("w_start", "event_type", "cnt").collect()
    }
    exp = {
        (r.w_start, r.event_type): r.cnt
        for r in batch.collect()
    }
    assert got == exp


def test_late_capture_partitions_all_rows(spark):
    """Late side output (WindowedStream.sideOutputLateData): on-time
    and late sinks together hold exactly the input — nothing silently
    dropped — and every late row is below the watermark in force."""
    from flink_efo_spark.streaming import capture_late_rows, stream_table_split

    src = stream_table_split(
        spark, SF_DIR, "events", 4, "reverse(cast(event_id as string))"
    )
    on_time, late = capture_late_rows(src, "ts", 1800.0)
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    n_on, n_late = on_time.count(), late.count()
    assert n_on + n_late == total
    assert n_late > 0  # the reversed-id split really is out of order


def test_upsert_sink_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart exactly-once: a crash AFTER an epoch's sink
    write but BEFORE its checkpoint commit replays that epoch on
    restart; the epoch-directory overwrite makes the replay
    idempotent, so the final table equals the batch answer with no
    duplicates (reference TwoPhaseCommitSinkFunction.java contract)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import (
        read_upsert_result,
        stream_table_split,
        stream_upsert_sink,
    )

    src = stream_table_split(spark, SF_DIR, "events", n_batches=4, order_col="ts")
    agg = src.groupBy("event_type").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_v")
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: crash after writing epoch 1's output (the dangerous
    # window — sink write done, checkpoint commit not)
    def crashing_upsert(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={batch_id}")
        )
        if batch_id == 1:
            raise RuntimeError("injected crash after sink write")

    q1 = (
        agg.writeStream.foreachBatch(crashing_upsert)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q1.awaitTermination()

    # run 2: same checkpoint — epoch 1 replays (overwriting its
    # partial directory), epochs 2..n continue
    q2 = stream_upsert_sink(
        agg, ["event_type"], out_dir, mode="update", checkpoint_dir=ckpt
    )
    q2.awaitTermination()

    want = sorted(
        (r.event_type, r.cnt, r.sum_v)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_v"))
        .collect()
    )
    got = sorted(
        (r.event_type, r.cnt, r.sum_v)
        for r in read_upsert_result(spark, out_dir, ["event_type"]).collect()
    )
    assert got == want


def test_cumulate_direct_equals_sliced(spark):
    """The sliced two-phase cumulate (tumble partials → expand+merge)
    must equal the direct per-row expansion for decomposable aggs —
    the exactness claim of the reference's slice-shared state."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import (
        compose_cumulate_slices,
        cumulate_agg,
        cumulate_slices,
    )

    ev = load_table(spark, SF_DIR, "events")
    direct = cumulate_agg(
        ev, "ts", "15 minutes", "1 hour", ["event_type"],
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    sl = cumulate_slices(
        ev, "ts", "15 minutes", ["event_type"],
        F.count("*").alias("pcnt"), F.sum("value").alias("psum"),
    )
    sliced = compose_cumulate_slices(
        sl, "15 minutes", "1 hour", ["event_type"],
        F.sum("pcnt").alias("cnt"),
        F.round(F.sum("psum"), 2).alias("sum_value"),
    )
    key = lambda r: (r.w_start, r.w_end, r.event_type)  # noqa: E731
    got_d = sorted(map(tuple, direct.collect()))
    got_s = sorted(map(tuple, sliced.collect()))
    assert got_d == got_s
    # every bucket must hold windows of strictly increasing width with
    # monotonically non-decreasing counts (cumulate's defining shape)
    import collections

    by_bucket = collections.defaultdict(list)
    for r in direct.collect():
        by_bucket[(r.w_start, r.event_type)].append((r.w_end, r.cnt))
    for rows in by_bucket.values():
        rows.sort()
        cnts = [c for _, c in rows]
        assert cnts == sorted(cnts)


def test_cumulate_window_bounds(spark):
    """Cumulate windows share one start per max_size bucket and end on
    step boundaries, never exceeding the bucket end."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import cumulate_agg

    ev = load_table(spark, SF_DIR, "events")
    out = cumulate_agg(
        ev, "ts", "15 minutes", "1 hour", [], F.count("*").alias("cnt")
    ).collect()
    for r in out:
        span = (r.w_end - r.w_start).total_seconds()
        assert r.w_start.minute == 0 and r.w_start.second == 0
        assert span in (900.0, 1800.0, 2700.0, 3600.0)


def test_shard_split_refinement(spark):
    """Kinesis resharding model: doubling the shard count must REFINE
    the assignment — every record of parent shard s lands in child s
    or s+N (the md5-ring modulus property), so keyed state migration
    on shard split stays local, exactly like a Kinesis shard split
    (ShardConsumer/KinesisDataFetcher handle SHARD_END → children)."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.sources import shard_of

    ev = load_table(spark, SF_DIR, "events").select("user_id").distinct()
    both = ev.select(
        shard_of("user_id", 4).alias("s4"), shard_of("user_id", 8).alias("s8")
    ).distinct().collect()
    for r in both:
        assert r.s8 % 4 == r.s4


def test_shard_watermark_alignment(spark):
    """Global watermark = min over per-shard locals; lag >= 0 and 0
    for the slowest shard (WatermarkTracker.java invariants)."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.sources import shard_of, shard_watermarks

    ev = load_table(spark, SF_DIR, "events")
    stats = (
        ev.select(shard_of("user_id", 4).alias("shard"), "ts")
        .groupBy("shard")
        .agg(F.unix_micros(F.max("ts")).alias("max_ts_us"))
    )
    rows = shard_watermarks(stats, 600_000_000).collect()
    assert len(rows) == 4
    g = min(r.local_wm_us for r in rows)
    for r in rows:
        assert r.global_wm_us == g
        assert r.lag_us == r.local_wm_us - g >= 0
    assert any(r.lag_us == 0 for r in rows)


def test_stateful_topn_restart_recovers_state(spark, tmp_path):
    """applyInPandasWithState checkpoint recovery (the reference's
    keyed-state snapshot/restore, CheckpointCoordinator.java): crash
    after batch 1 of a 4-batch replay, restart from the same
    checkpoint — the per-key top-n state restores and the final
    result equals the one-shot batch answer."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import stream_table_split, stream_top_n

    src = stream_table_split(
        spark, SF_DIR, "events", n_batches=4, order_col="ts"
    )
    tn = stream_top_n(
        src.select("user_id", "event_id", "value"),
        ["user_id"],
        order_col="value",
        n=3,
        tiebreak="event_id",
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def crashing_sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={batch_id}")
        )
        if batch_id == 1:
            raise RuntimeError("injected crash after sink write")

    q1 = (
        tn.writeStream.foreachBatch(crashing_sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q1.awaitTermination()

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={batch_id}")
        )

    q2 = (
        tn.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    # last-writer-wins per (user_id, event_id): the final emission of
    # each key's top set is in the highest batch that touched it
    log = spark.read.parquet(out_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("__batch_id").desc())
    final = (
        log.withColumn("__r", F.dense_rank().over(w))
        .where(F.col("__r") == 1)
        .drop("__r", "__batch_id")
    )
    got = sorted((r.user_id, r.event_id, r.value) for r in final.collect())

    ev = load_table(spark, SF_DIR, "events")
    w2 = W.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    want = sorted(
        (r.user_id, r.event_id, r.value)
        for r in ev.select("user_id", "event_id", "value")
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= 3)
        .drop("__rn")
        .collect()
    )
    assert got == want


def test_incremental_agg_apply(spark):
    """Changelog-driven aggregate maintenance: applying the second
    half's +I delta to the first half's aggregate equals the full
    aggregate; retracting it (-D) restores the original."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import incremental_agg_apply

    ev = load_table(spark, SF_DIR, "events")
    h1 = ev.where(F.col("event_id") % 2 == 0)
    h2 = ev.where(F.col("event_id") % 2 == 1)

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("value").alias("sum_v"),
        )

    a1 = agg(h1)
    log_ins = h2.select(
        "event_type", "value", F.lit("+I").alias("row_kind")
    )
    got = incremental_agg_apply(
        a1, log_ins, ["event_type"], sums={"sum_v": "value"}
    )
    want = agg(ev)
    g = sorted((r.event_type, r.cnt, round(r.sum_v, 6)) for r in got.collect())
    w = sorted((r.event_type, r.cnt, round(r.sum_v, 6)) for r in want.collect())
    assert g == w

    # retract the same rows: back to the half-1 aggregate
    log_del = h2.select("event_type", "value", F.lit("-D").alias("row_kind"))
    back = incremental_agg_apply(
        got, log_del, ["event_type"], sums={"sum_v": "value"}
    )
    b = sorted((r.event_type, r.cnt, round(r.sum_v, 6)) for r in back.collect())
    a = sorted((r.event_type, r.cnt, round(r.sum_v, 6)) for r in a1.collect())
    assert b == a

    # a key fully retracted disappears
    one = spark.createDataFrame([("x", 1.0)], "k string, v double")
    base = one.groupBy("k").agg(
        F.count("*").cast("long").alias("cnt"), F.sum("v").alias("sum_v")
    )
    gone = incremental_agg_apply(
        base,
        one.select(F.col("k"), F.col("v"), F.lit("-D").alias("row_kind")),
        ["k"],
        sums={"sum_v": "v"},
    )
    assert gone.count() == 0

    # round-4 ADVICE: decimal sums keep their type across applies (no
    # silent promotion to double), and the NULL key group pairs as ONE
    # row through the full-outer join
    dec = spark.createDataFrame(
        [("x", "1.50"), (None, "2.25")], "k string, s string"
    ).select("k", F.col("s").cast("decimal(10,2)").alias("v"))
    base2 = dec.groupBy("k").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("v").cast("decimal(10,2)").alias("sum_v"),
    )
    log2 = spark.createDataFrame(
        [("x", "0.25", "+I"), (None, "0.75", "+I")],
        "k string, s string, row_kind string",
    ).select("k", F.col("s").cast("decimal(10,2)").alias("v"), "row_kind")
    nxt = incremental_agg_apply(base2, log2, ["k"], sums={"sum_v": "v"})
    assert nxt.schema["sum_v"].dataType == base2.schema["sum_v"].dataType
    got2 = {(r.k, r.cnt, str(r.sum_v)) for r in nxt.collect()}
    assert got2 == {(None, 2, "3.00"), ("x", 2, "1.75")}
    # a second apply keeps the schema fixed (no per-apply widening)
    again = incremental_agg_apply(nxt, log2, ["k"], sums={"sum_v": "v"})
    assert again.schema == nxt.schema


def test_timer_sessions_multibatch(spark):
    """Event-time timers across micro-batches: a 4-batch ordered
    replay must fire inactivity timers as the watermark climbs and
    produce exactly the gap-session islands whose timer the final
    watermark passed (plus every event-closed session)."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import (
        process_timer_sessions,
        run_stream_to_table,
        stream_table_split,
    )

    src = stream_table_split(
        spark, SF_DIR, "events", n_batches=4, order_col="ts",
        watermark=("ts", "10 minutes"),
    )
    got = {
        tuple(r)
        for r in run_stream_to_table(
            process_timer_sessions(src, "user_id", "ts", "30 minutes"),
            mode="append",
        ).collect()
    }

    b = load_table(spark, SF_DIR, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        b.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new",
            (
                F.col("prev").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev") > 1_800_000_000)
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new").over(w))
        .groupBy("user_id", "sid")
        .agg(
            (F.floor(F.min(F.unix_micros("ts")) / 1000) * 1000)
            .cast("long")
            .alias("session_start_us"),
            (F.floor(F.max(F.unix_micros("ts")) / 1000) * 1000)
            .cast("long")
            .alias("session_last_us"),
            F.count("*").alias("n_events"),
        )
    )
    wm_ms = b.agg(F.max(F.unix_micros("ts"))).collect()[0][0] // 1000 - 600_000
    mx = sess.groupBy("user_id").agg(F.max("session_last_us").alias("mx"))
    want = {
        tuple(r)
        for r in sess.join(mx, "user_id")
        .where(
            (F.col("session_last_us") < F.col("mx"))
            | ((F.col("session_last_us") / 1000 + 1_800_000) <= F.lit(wm_ms))
        )
        .select("user_id", "session_start_us", "session_last_us", "n_events")
        .collect()
    }
    assert got == want and len(got) > 0


def test_timer_sessions_out_of_order(spark, tmp_path):
    """Late events WITHIN the watermark delay arriving in a later
    micro-batch must merge into the stored session correctly (round-4
    ADVICE): a late event older than the stored session_last must not
    regress it, one older than session_start must extend the start,
    and a within-batch gap-split must chain against the stored
    session's interval, not only the batch's own timestamps."""
    from flink_efo_spark.streaming import (
        process_timer_sessions,
        run_stream_to_table,
    )

    # gap 5 min, watermark delay 10 min; seconds-scale event times
    rows = {
        # b0: u1 and u2 each open a session [1000s, 1060s]
        0: [("u1", 1000), ("u1", 1060), ("u2", 1000), ("u2", 1060)],
        # b1 (wm=460s): u1 gets late events 800s/990s (before the
        # stored start!) plus 1100s -> all one session [800,1100].
        # u2 gets [500s, 995s]: a within-batch gap-split whose SECOND
        # segment bridges into the stored session -> emit (500,500,1)
        # inline, state becomes [995,1060].
        1: [
            ("u1", 800),
            ("u1", 990),
            ("u1", 1100),
            ("u2", 500),
            ("u2", 995),
        ],
        # b2/b3: sentinel key advances the watermark past last+gap so
        # the inactivity timers fire (timeout processes a batch later)
        2: [("zz", 2500)],
        3: [("zz", 2600)],
    }
    src_dir = str(tmp_path / "timer_ooo")
    for i, batch in sorted(rows.items()):
        spark.createDataFrame(
            [(k, t) for k, t in batch], "user_id string, sec long"
        ).select(
            "user_id", F.timestamp_seconds("sec").alias("ts")
        ).coalesce(1).write.parquet(f"{src_dir}/b{i}.parquet")
    schema = spark.read.parquet(f"{src_dir}/b0.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
        .withWatermark("ts", "10 minutes")
    )
    got = {
        tuple(r)
        for r in run_stream_to_table(
            process_timer_sessions(src, "user_id", "ts", "5 minutes"),
            mode="append",
        ).collect()
        if r.user_id != "zz"
    }
    us = lambda s: s * 1_000_000  # noqa: E731
    assert got == {
        ("u1", us(800), us(1100), 5),
        ("u2", us(500), us(500), 1),
        ("u2", us(995), us(1060), 3),
    }


def test_delta_trigger_window_modes(spark, tmp_path):
    """DeltaTrigger/PurgingTrigger/DeltaEvictor semantics
    (triggers/DeltaTrigger.java:54, PurgingTrigger.java,
    evictors/DeltaEvictor.java) incl. cross-batch trigger state: the
    last-fired element survives the micro-batch boundary."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_delta_window,
    )

    # k1 values: 0, 5, 12(fire Δ12), 14, 30(fire Δ18), 31
    batches = [
        [("k1", 1, 0.0), ("k1", 2, 5.0)],
        [("k1", 3, 12.0), ("k1", 4, 14.0)],       # fire mid-stream
        [("k1", 5, 30.0), ("k1", 6, 31.0)],       # fire uses state
    ]
    src_dir = str(tmp_path / "delta_trig")
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "k string, seq int, v double"
        ).coalesce(1).write.parquet(f"{src_dir}/b{i}.parquet")
    schema = spark.read.parquet(f"{src_dir}/b0.parquet").schema

    def replay():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
        )

    # purge mode: each fire covers rows since the previous fire
    got = sorted(
        (r.fire_seq, r.cnt, r.sum_value, r.fire_value)
        for r in run_stream_to_table(
            stream_delta_window(
                replay(), ["k"], "v", threshold=10.0, order_by=["seq"]
            )
        ).collect()
    )
    assert got == [(1, 3, 17.0, 12.0), (2, 2, 44.0, 30.0)]

    # non-purge: the global window keeps accumulating
    got2 = sorted(
        (r.fire_seq, r.cnt, r.sum_value)
        for r in run_stream_to_table(
            stream_delta_window(
                replay(), ["k"], "v", threshold=10.0, order_by=["seq"],
                purge=False,
            )
        ).collect()
    )
    assert got2 == [(1, 3, 17.0), (2, 5, 61.0)]

    # DeltaEvictor: before aggregating, drop elements > 6.0 away from
    # the buffer's LAST element (fire 1 buffer [0,5,12] -> keep
    # [12]; fire 2 buffer [14,30] -> keep [30])
    got3 = sorted(
        (r.fire_seq, r.cnt, r.sum_value)
        for r in run_stream_to_table(
            stream_delta_window(
                replay(), ["k"], "v", threshold=10.0, order_by=["seq"],
                evict_threshold=6.0,
            )
        ).collect()
    )
    assert got3 == [(1, 1, 12.0), (2, 1, 30.0)]

    # boundary: the reference (evictors/DeltaEvictor.java:76) evicts
    # when getDelta >= threshold — an element EXACTLY threshold away
    # from the tail goes too (|5-12| = 7 with threshold 7.0)
    got3b = sorted(
        (r.fire_seq, r.cnt, r.sum_value)
        for r in run_stream_to_table(
            stream_delta_window(
                replay(), ["k"], "v", threshold=10.0, order_by=["seq"],
                evict_threshold=7.0,
            )
        ).collect()
    )
    assert got3b == [(1, 1, 12.0), (2, 1, 30.0)]

    # custom DeltaFunction (signed downward move only)
    got4 = [
        (r.fire_seq, r.fire_value)
        for r in run_stream_to_table(
            stream_delta_window(
                replay(), ["k"], "v", threshold=3.0, order_by=["seq"],
                delta_fn=lambda a, b: a - b,
            )
        ).collect()
    ]
    assert got4 == []  # values only rise: a-b never exceeds +3


def test_dedup_within_watermark_ttl(spark, tmp_path):
    """TTL'd dedup state (reference StateTtlConfig on
    DeduplicateKeepFirstRowFunction ↔ dropDuplicatesWithinWatermark):
    a duplicate arriving within the watermark horizon is dropped; one
    arriving after the key's state expired is kept again."""
    import os

    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_dedup_keep_first,
    )

    # b0: k=1 first arrival. b1: duplicate inside the horizon ->
    # dropped. b2: far-future rows advance the watermark past k=1's
    # state expiry (evicted AFTER this batch). b3: k=1 again, state
    # gone -> kept a second time.
    rows = {
        0: [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:01")],
        1: [(1, "2024-01-01 00:00:05"), (3, "2024-01-01 00:00:06")],
        # b2 advances the max event time; the watermark derived from
        # it applies from b3 on, and state eviction runs at batch end
        # — so k=1's state is gone only when b4 processes
        2: [(4, "2024-01-01 00:10:01")],
        3: [(6, "2024-01-01 00:10:02")],
        4: [(1, "2024-01-01 00:10:30"), (5, "2024-01-01 00:10:31")],
    }
    src_dir = str(tmp_path / "src")
    for b, rs in rows.items():
        spark.createDataFrame(rs, "k long, ts_s string").selectExpr(
            "k", "cast(ts_s as timestamp) as ts"
        ).repartition(1).write.mode("overwrite").parquet(
            os.path.join(src_dir, f"b={b}")
        )
    schema = "k long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    dd = stream_dedup_keep_first(stream, ["k"], watermark=("ts", "10 seconds"))
    out = run_stream_to_table(dd, mode="append")
    ks = sorted(r.k for r in out.collect())
    # k=1 emitted twice (expired state), the others once each
    assert ks == [1, 1, 2, 3, 4, 5, 6]


def test_stream_incremental_dedup_restart_exactly_once(spark, tmp_path):
    """Store-backed continuous dedup: 4 document batches (ordered by
    doc_id), crash injected on batch 1, restart with the SAME store +
    checkpoint — the union of emitted survivors equals the one-shot
    batch keep-first answer: no duplicate re-emitted, none lost, even
    though batch 1 had already appended its signatures before the
    crash."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import (
        stream_incremental_dedup,
        stream_table_split,
    )

    fp = F.md5(
        F.substring(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
            1, 80,
        )
    )
    src = stream_table_split(
        spark, SF_DIR, "documents", n_batches=4, order_col="doc_id"
    ).select("doc_id", "text")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # monkey-patch a crash into the first run's sink via a wrapper src
    crashed = {"done": False}
    import flink_efo_spark.streaming as S

    orig = S.stream_incremental_dedup

    from flink_efo_spark.operators.dedup import dedup_incremental

    def crashing(src, id_col, fingerprint, store_dir, out_dir, checkpoint_dir):
        from pyspark.errors.exceptions.captured import AnalysisException

        def handle(batch_df, batch_id):
            s = batch_df.sparkSession
            try:
                st = s.read.parquet(store_dir).where(
                    F.col("epoch") != F.lit(int(batch_id))
                )
            except AnalysisException:
                st = s.createDataFrame([], "fingerprint STRING")
            fresh, sigs = dedup_incremental(batch_df, st, id_col, fingerprint)
            fresh.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"__batch_id={int(batch_id)}")
            )
            sigs.write.mode("overwrite").parquet(
                os.path.join(store_dir, f"epoch={int(batch_id)}")
            )
            if batch_id == 1 and not crashed["done"]:
                crashed["done"] = True
                raise RuntimeError("injected crash after store append")

        return (
            src.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    q1 = crashing(src, "doc_id", fp, store, out, ckpt)
    with pytest.raises(StreamingQueryException):
        q1.awaitTermination()
    assert crashed["done"]

    q2 = orig(src, "doc_id", fp, store, out, ckpt)
    q2.awaitTermination()

    got = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )

    # batch reference: global keep-first == min doc_id per fingerprint
    # (batches are doc_id-ordered, so first arrival is the min id)
    docs = load_table(spark, SF_DIR, "documents")
    expected = sorted(
        r.doc_id
        for r in docs.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    )
    assert got == expected


def test_stream_over_bounded_frames_cross_batch(spark, tmp_path):
    """Bounded-preceding OVER state crosses micro-batch boundaries
    (RowTimeRows/RangeBoundedPrecedingFunction): for EVERY split
    point, frames spanning the boundary still see the pre-boundary
    rows — ROWS keeps the last N, RANGE the trailing interval — and
    the result equals the batch SQL window answer."""
    import datetime as dt

    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_over_bounded,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (k, seq, ts-minutes, v) — includes a ts TIE at minute 30
        ("a", 1, 0, 1.0),
        ("a", 2, 10, 5.0),
        ("a", 3, 30, 2.0),
        ("a", 4, 30, 7.0),   # peer of seq 3 (RANGE includes both ways)
        ("a", 5, 55, 4.0),
        ("a", 6, 120, 9.0),  # RANGE 30min: frame = itself only
        ("b", 7, 5, 3.0),
        ("b", 8, 20, 6.0),
    ]
    data = [
        (k, s, t0 + dt.timedelta(minutes=m), v) for k, s, m, v in rows
    ]
    schema = "k string, seq int, ts timestamp, v double"

    def batch_expect(frame_clause):
        df = spark.createDataFrame(data, schema)
        df.createOrReplaceTempView("__ovb")
        return sorted(
            tuple(r)
            for r in spark.sql(
                f"""
            SELECT k, seq, sum(v) OVER w AS fs, count(v) OVER w AS fc,
                   min(v) OVER w AS fmn, max(v) OVER w AS fmx
            FROM __ovb WINDOW w AS ({frame_clause})
            """
            ).collect()
        )

    want_rows = batch_expect(
        "PARTITION BY k ORDER BY ts, seq ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"
    )
    want_range = batch_expect(
        "PARTITION BY k ORDER BY ts RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW"
    )

    # sentinel final batch: far-future row on a non-joined key — the
    # MAX_WATERMARK analog that fires the end-of-input timeout flush
    sentinel = [("zz", 99, t0 + dt.timedelta(days=9), 0.0)]
    # splits: mid-frame (1), BETWEEN the ts-30 peers (3 — the
    # watermark-hold case), right after them (4), key boundary (6)
    for cut in (1, 3, 4, 6):
        src_dir = str(tmp_path / f"ovb_{cut}")
        for i, part in enumerate([data[:cut], data[cut:], sentinel]):
            spark.createDataFrame(part, schema).coalesce(1).write.parquet(
                f"{src_dir}/b{i}.parquet"
            )
        fschema = spark.read.parquet(f"{src_dir}/b0.parquet").schema

        def replay():
            return (
                spark.readStream.schema(fschema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(src_dir)
                .withWatermark("ts", "0 seconds")
            )

        def run(out_df):
            return sorted(
                (r.k, r.seq, r.frame_sum, r.frame_cnt, r.frame_min, r.frame_max)
                for r in run_stream_to_table(out_df).collect()
                if r.k != "zz"
            )

        got_rows = run(
            stream_over_bounded(
                replay(), ["k"], "ts", "v",
                rows_preceding=2, tiebreak="seq", flush_on_timeout=True,
            )
        )
        assert got_rows == want_rows, f"ROWS split {cut}: {got_rows}"
        got_range = run(
            stream_over_bounded(
                replay(), ["k"], "ts", "v", range_preceding="30 minutes",
                flush_on_timeout=True,
            )
        )
        assert got_range == want_range, f"RANGE split {cut}: {got_range}"


def test_keyed_coprocess_rules_cross_batch(spark, tmp_path, ddb):
    """KeyedCoProcessFunction analog (co/KeyedCoProcessFunction.java):
    control rows install per-key rules, data rows emit stamped with
    the rule in effect at their event time plus a count since the
    rule was installed — shared keyed state across two inputs,
    watermark-gated so a cross-batch control row lands before later
    data rows. Oracle: DuckDB asof (max preceding control) + windowed
    count over the same rows."""
    import datetime as dt

    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_keyed_coprocess,
    )

    t0 = dt.datetime(2024, 1, 1)
    # (user, id, side, sec, value): side 0 = control, 1 = data
    rows = [
        (1, 1, 1, 0, 5.0),      # data before any rule: NULL rule, n=1
        (1, 2, 0, 10, 100.0),   # rule A
        (1, 3, 1, 20, 6.0),     # n=1 under A
        (1, 4, 1, 30, 7.0),     # n=2 under A
        (1, 5, 0, 40, 200.0),   # rule B (crosses the batch cut)
        (1, 6, 1, 50, 8.0),     # n=1 under B
        (2, 1, 0, 0, 42.0),
        (2, 2, 1, 5, 1.0),      # n=1 under 42
        (2, 3, 1, 95, 2.0),     # n=2 under 42
    ]
    data = [
        (u, i, s, t0 + dt.timedelta(seconds=sec), v)
        for (u, i, s, sec, v) in rows
    ]
    schema = "user_id int, rid int, side int, ts timestamp, value double"
    want = [
        (1, 1, None, 1), (1, 3, 100.0, 1), (1, 4, 100.0, 2),
        (1, 6, 200.0, 1), (2, 2, 42.0, 1), (2, 3, 42.0, 2),
    ]
    sentinel = [(-1, -1, 1, t0 + dt.timedelta(days=9), 0.0)]
    for cut in (2, 4, 5, 7):
        src_dir = str(tmp_path / f"copro_{cut}")
        for i, part in enumerate([data[:cut], data[cut:], sentinel]):
            spark.createDataFrame(part, schema).coalesce(1).write.parquet(
                f"{src_dir}/b{i}.parquet"
            )
        src = (
            spark.readStream
            .schema(spark.read.parquet(f"{src_dir}/b0.parquet").schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
            .withWatermark("ts", "0 seconds")
        )
        out = stream_keyed_coprocess(
            src.where(F.col("side") == 1).select("user_id", "rid", "ts", "value"),
            src.where(F.col("side") == 0).select("user_id", "ts", "value"),
            ["user_id"],
            "ts",
            "ts",
            rule_cols=["value"],
            data_cols=["rid"],
            tiebreak="rid",
            flush_on_timeout=True,
        )
        got = sorted(
            (r.user_id, r.rid, r.rule_value, r.n_since_rule)
            for r in run_stream_to_table(out).collect()
            if r.user_id >= 0
        )
        assert got == want, f"coprocess split {cut}: {got}"


def test_broadcast_process_rule_reaches_new_key(spark, tmp_path):
    """BroadcastProcessFunction/BroadcastState: a rule installed in
    batch 0 must stamp a key whose FIRST row arrives batches later —
    per-key control routing cannot do this; bucket-replicated
    broadcast state can."""
    import datetime as dt

    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_broadcast_process,
    )

    t0 = dt.datetime(2024, 1, 1)
    # control: (side 0) global rules; data: (side 1) keyed rows —
    # user 7 first appears two batches after rule A was installed
    data = [
        (0, 0, 10.0, t0),                                  # rule A
        (1, 1, 1.0, t0 + dt.timedelta(seconds=5)),         # u1 under A
        (0, 0, 20.0, t0 + dt.timedelta(seconds=10)),       # rule B
        (7, 2, 1.0, t0 + dt.timedelta(seconds=15)),        # NEW key u7 under B
        (1, 3, 1.0, t0 + dt.timedelta(seconds=20)),        # u1 under B
    ]
    schema = "user_id int, rid int, value double, ts timestamp"
    rows = [(u, r, v, ts) for (u, r, v, ts) in data]
    sentinel = [(99, -1, 0.0, t0 + dt.timedelta(days=9))]
    src_dir = str(tmp_path / "bcast")
    # one row per batch: the rule and its consumers never share a batch
    parts = [[rows[0]], [rows[1]], [rows[2]], [rows[3]], [rows[4]], sentinel]
    for i, part in enumerate(parts):
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            f"{src_dir}/b{i}.parquet"
        )
    src = (
        spark.readStream
        .schema(spark.read.parquet(f"{src_dir}/b0.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
        .withWatermark("ts", "0 seconds")
    )
    out = stream_broadcast_process(
        src.where(F.col("user_id") > 0).select("user_id", "rid", "ts"),
        src.where(F.col("user_id") == 0).select("ts", "value"),
        key_col="user_id",
        data_ts="ts",
        control_ts="ts",
        rule_cols=["value"],
        data_cols=["user_id", "rid"],
        n_buckets=4,
        tiebreak="rid",
        flush_on_timeout=True,
    )
    got = sorted(
        (r.user_id, r.rid, r.rule_value)
        for r in run_stream_to_table(out).collect()
        if 0 < r.user_id < 99
    )
    assert got == [(1, 1, 10.0), (1, 3, 20.0), (7, 2, 20.0)]


def test_stream_incremental_near_dedup_replay_idempotent(spark, tmp_path):
    """Store-backed NEAR-dup ingest: a 3-batch replay emits the same
    survivors as applying dedup_incremental_near sequentially per
    batch; wiping the checkpoint and replaying over the SAME store is
    byte-idempotent (epoch-excluding reads + epoch-dir overwrite)."""
    import shutil

    from flink_efo_spark.operators.dedup import dedup_incremental_near
    from flink_efo_spark.streaming import (
        stream_incremental_near_dedup,
        stream_table_split,
    )

    src = stream_table_split(
        spark, SF_DIR, "documents", n_batches=3, order_col="doc_id"
    ).select("doc_id", "text")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_incremental_near_dedup(
        src, "doc_id", "text", store, out, ckpt
    )
    q.awaitTermination()
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())

    # expected: sequential batch-mode application over the same splits
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    k = (len(docs) + 2) // 3
    st = spark.createDataFrame([], "band_idx int, band_hash bigint")
    want = []
    for b in range(3):
        part = spark.createDataFrame(
            docs[b * k:(b + 1) * k], "doc_id long, text string"
        )
        if part.count() == 0:
            continue
        fresh, keys = dedup_incremental_near(part, st, "doc_id", "text")
        want += [r.doc_id for r in fresh.collect()]
        st = st.union(keys).distinct()
    assert got == sorted(want)

    # crash-replay idempotence: recomputing the LAST batch against
    # the store EXCLUDING its own epoch (exactly what a replayed
    # foreachBatch invocation reads — only the latest uncommitted
    # batch is ever replayed, even though its keys were already
    # appended before the crash) reproduces its output byte-for-byte
    del shutil
    part2 = spark.createDataFrame(
        docs[2 * k:], "doc_id long, text string"
    )
    st_replay = spark.read.parquet(store).where(F.col("epoch") != 2)
    fresh2, _ = dedup_incremental_near(part2, st_replay, "doc_id", "text")
    replayed = sorted(r.doc_id for r in fresh2.collect())
    emitted2 = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{out}/__batch_id=2").collect()
    )
    assert replayed == emitted2


def test_stream_token_budget_ledger_across_batches(spark, tmp_path):
    """Quota admission: the per-group ledger resumes across batches —
    a group that exhausts its budget in batch 0 admits nothing later,
    a group that crosses mid-batch admits the crossing doc only, and
    totals land in [budget, budget + max_tokens)."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_token_budget_sample,
    )

    rows = [
        # (doc_id, lang, toks): en budget 10 -> fills in batch 0
        (1, "en", 6), (2, "en", 6),        # batch 0: both admitted (cross)
        (3, "en", 6),                      # batch 1: rejected (ledger 12)
        # de budget 10 -> crosses in batch 1
        (11, "de", 4),                     # batch 0
        (12, "de", 4), (13, "de", 9),      # batch 1: one of them crosses
        # fr: no budget -> dropped entirely
        (21, "fr", 1),
    ]
    schema = "doc_id long, lang string, toks long"
    src_dir = str(tmp_path / "quota")
    batches = [rows[:2] + [rows[3]] + [rows[6]], [rows[2]] + rows[4:6]]
    for i, part in enumerate(batches):
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            f"{src_dir}/b{i}.parquet"
        )
    src = (
        spark.readStream
        .schema(spark.read.parquet(f"{src_dir}/b0.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    out = stream_token_budget_sample(
        src, "doc_id", "lang", "toks", {"en": 10, "de": 10}
    )
    got = sorted(
        (r.lang, r.doc_id) for r in run_stream_to_table(out).collect()
    )
    en = [d for (g, d) in got if g == "en"]
    de = [d for (g, d) in got if g == "de"]
    assert en == [1, 2]          # crossing doc admitted, later doc not
    # de: batch-0 doc always; batch-1 admission follows the hash
    # order — replay the rule to compute the expected set
    import hashlib

    toks = {11: 4, 12: 4, 13: 9}
    b1 = sorted([12, 13], key=lambda d: hashlib.md5(str(d).encode()).hexdigest())
    used, want_de = 4, [11]
    for d in b1:
        if used < 10:
            want_de.append(d)
            used += toks[d]
    assert sorted(de) == sorted(want_de)
    assert all(g != "fr" for g, _ in got)


def test_coprocess_idle_key_keeps_rule_and_context(spark, tmp_path):
    """A key idle for a whole micro-batch (while other keys advance
    the watermark and fire its flush timer) must KEEP its installed
    rule and held rows: the timed-out path releases only
    watermark-cleared rows and preserves state — a state.remove()
    there would stamp the key's later rows with a NULL rule."""
    import datetime as dt

    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_keyed_coprocess,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "user_id int, rid int, side int, ts timestamp, value double"
    batches = [
        # b0: key 1 installs a rule; key 2 chatters
        [(1, 1, 0, 0, 100.0), (2, 1, 1, 5, 0.0)],
        # b1: key 1 IDLE; key 2 advances the watermark far ahead
        [(2, 2, 1, 600, 0.0)],
        # b2: key 1's first data rows — must carry rule 100.0
        [(1, 2, 1, 700, 0.0), (1, 3, 1, 710, 0.0), (2, 3, 1, 720, 0.0)],
        # sentinel: far-future data row for both sides' watermark
        [(-1, -1, 1, 9_000_000, 0.0), (-1, -2, 0, 9_000_000, 0.0)],
    ]
    src_dir = str(tmp_path / "copro_idle")
    for i, part in enumerate(batches):
        rows = [
            (u, i2, s, t0 + dt.timedelta(seconds=sec), v)
            for (u, i2, s, sec, v) in part
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src_dir}/b{i}.parquet"
        )
    src = (
        spark.readStream
        .schema(spark.read.parquet(f"{src_dir}/b0.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
        .withWatermark("ts", "0 seconds")
    )
    out = stream_keyed_coprocess(
        src.where(F.col("side") == 1).select("user_id", "rid", "ts", "value"),
        src.where(F.col("side") == 0).select("user_id", "ts", "value"),
        ["user_id"], "ts", "ts",
        rule_cols=["value"], data_cols=["rid"], tiebreak="rid",
        flush_on_timeout=True,
    )
    got = sorted(
        (r.user_id, r.rid, r.rule_value, r.n_since_rule)
        for r in run_stream_to_table(out).collect()
        if r.user_id >= 0
    )
    assert got == [
        (1, 2, 100.0, 1), (1, 3, 100.0, 2),
        (2, 1, None, 1), (2, 2, None, 2), (2, 3, None, 3),
    ], got


def test_flush_timer_not_rearmed_for_drained_key(spark, tmp_path):
    """A key whose pending rows have all been released must NOT keep a
    flush timer armed: an unconditional re-arm would re-invoke (and
    re-save) every key ever seen on every watermark-advancing batch —
    O(total keys) per micro-batch at scale. Pinned via the per-batch
    ``numRowsUpdated`` state metric: once key A drains, a batch where
    only key B has data updates exactly ONE state row (B), not two."""
    import datetime as dt
    import json
    import tempfile

    from flink_efo_spark.streaming import stream_over_bounded

    t0 = dt.datetime(2024, 1, 1)
    schema = "k string, seq int, ts timestamp, v double"
    batches = [
        # b0: key A — seq 2 (max ts) is held pending, timer armed
        [("A", 1, 100, 1.0), ("A", 2, 110, 2.0)],
        # b1: watermark -> 110; A's timer fires, releases seq 2,
        # drains to n_pending=0 and must NOT re-arm
        [("B", 3, 200, 3.0)],
        # b2: only B has data — the old unconditional re-arm would
        # re-invoke A here (2 state updates instead of 1)
        [("B", 4, 300, 4.0)],
        # b3: far-future sentinel releases B's pending row
        [("zz", 9, 10_000, 0.0)],
    ]
    src_dir = str(tmp_path / "ovb_rearm")
    for i, part in enumerate(batches):
        rows = [
            (k, s, t0 + dt.timedelta(seconds=sec), v)
            for (k, s, sec, v) in part
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src_dir}/b{i}.parquet"
        )
    src = (
        spark.readStream
        .schema(spark.read.parquet(f"{src_dir}/b0.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
        .withWatermark("ts", "0 seconds")
    )
    out = stream_over_bounded(
        src, ["k"], "ts", "v",
        rows_preceding=1, tiebreak="seq", flush_on_timeout=True,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ovb_rearm_t")
        .outputMode("append")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="efo-rearm-")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = [json.loads(p.json) for p in q.recentProgress]
    per_batch = [
        (p["numInputRows"], p["stateOperators"][0]["numRowsUpdated"])
        for p in prog
    ]
    # batch 2 (index 2): B's single data row is the only state update —
    # drained key A is not re-entered by a watermark-only timeout
    assert per_batch[2] == (1, 1), per_batch


def test_pagerank_warm_exact_continuation(spark):
    """pagerank_warm: (a) empty snapshot == pagerank's cold start;
    (b) on a STATIC graph, warm-starting m rounds from a k-round
    snapshot equals pagerank(k+m) exactly (the integer recurrence is
    a pure function of (ranks, edges))."""
    from flink_efo_spark.operators.iterate import pagerank, pagerank_warm

    raw = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    e = spark.createDataFrame(raw, "src long, dst long")
    empty = spark.createDataFrame([], "id long, r long")

    cold = {r.id: r.r for r in pagerank(e, n_iter=2).collect()}
    warm0 = {r.id: r.r for r in pagerank_warm(e, empty, n_iter=2).collect()}
    assert warm0 == cold

    snap = pagerank(e, n_iter=2)
    cont = {
        r.id: r.r for r in pagerank_warm(e, snap, n_iter=3).collect()
    }
    full = {r.id: r.r for r in pagerank(e, n_iter=5).collect()}
    assert cont == full

    # a vertex NOT in the edge set drops out; a NEW vertex enters at
    # the cold-start value's first-round image
    e2 = spark.createDataFrame(raw + [(6, 1)], "src long, dst long")
    grown = {r.id: r.r for r in pagerank_warm(e2, snap, n_iter=1).collect()}
    assert 6 in grown


def test_stream_incremental_pagerank_recurrence(spark, tmp_path):
    """Store-backed evolving-graph PageRank: a 3-batch edge stream's
    final snapshot equals the batch replay of the recurrence
    snapshot_i = pagerank_warm(E_i, snapshot_{i-1}) over the
    cumulative distinct edge sets — and re-running the final epoch's
    handler reproduces the identical snapshot (epoch-dir
    exactly-once)."""
    import os

    from flink_efo_spark.operators.iterate import pagerank_warm
    from flink_efo_spark.streaming import stream_incremental_pagerank

    batches = [
        [(1, 2), (2, 3)],
        [(3, 1), (3, 4), (1, 2)],          # (1,2) repeats: distinct-union
        [(4, 1), (5, 1), (5, 5)],          # self-loop dropped
    ]
    src_dir = str(tmp_path / "edges_src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "s long, d long").coalesce(1).write.parquet(
            os.path.join(src_dir, f"f{i}.parquet")
        )
    schema = spark.read.parquet(os.path.join(src_dir, "f0.parquet")).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    store = str(tmp_path / "store")
    ranks_dir = str(tmp_path / "ranks")
    ckpt = str(tmp_path / "ckpt")
    q = stream_incremental_pagerank(
        src, "s", "d", store, ranks_dir, ckpt, n_iter_per_batch=2
    )
    q.awaitTermination(120)

    snaps = spark.read.parquet(ranks_dir)
    last = snaps.agg(F.max("epoch").alias("e")).collect()[0]["e"]
    got = {
        r.id: r.r
        for r in snaps.where(F.col("epoch") == last).select("id", "r").collect()
    }

    # batch replay of the recurrence (file order may not equal batch
    # order — derive the per-epoch slices from the store itself)
    store_df = spark.read.parquet(store)
    epochs = sorted(
        r.epoch for r in store_df.select("epoch").distinct().collect()
    )
    prev = spark.createDataFrame([], "id long, r long")
    cum = spark.createDataFrame([], "src long, dst long")
    for ep in epochs:
        sl = store_df.where(F.col("epoch") == ep).select("src", "dst")
        cum = cum.unionByName(sl).distinct()
        prev = pagerank_warm(cum, prev, n_iter=2)
    expected = {r.id: r.r for r in prev.collect()}
    assert got == expected
    # the stored final slice is deduped and self-loop-free
    final_slice = store_df.where(F.col("epoch") == max(epochs))
    assert final_slice.where(F.col("src") == F.col("dst")).count() == 0


def test_stream_semantic_dedup_replay_idempotent(spark, tmp_path):
    """Store-backed SEMANTIC dedup ingest: a 3-batch replay emits the
    same survivors as applying semantic_dedup_incremental sequentially
    per batch over the same fixed centroids; recomputing the last
    batch against the epoch-excluding store reproduces its output
    (the crash-replay contract shared with the exact/near twins)."""
    from flink_efo_spark.operators.similarity import (
        ivf_centroids,
        semantic_dedup_incremental,
    )
    from flink_efo_spark.streaming import (
        stream_semantic_dedup,
        stream_table_split,
    )

    emb_tbl = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = ivf_centroids(emb_tbl, "vec_id", "embedding", 6)

    src = stream_table_split(
        spark, SF_DIR, "embeddings", n_batches=3, order_col="vec_id"
    ).select("vec_id", "embedding")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_semantic_dedup(
        src, "vec_id", "embedding", store, out, ckpt,
        centroids=cents, threshold=0.3,
    )
    q.awaitTermination()
    got = sorted(r.vec_id for r in spark.read.parquet(out).collect())

    rows = emb_tbl.select("vec_id", "embedding").orderBy("vec_id").collect()
    k = (len(rows) + 2) // 3
    st = spark.createDataFrame([], "cluster INT, vec ARRAY<FLOAT>")
    want = []
    for b in range(3):
        part = spark.createDataFrame(
            [(r.vec_id, r.embedding) for r in rows[b * k:(b + 1) * k]],
            "vec_id long, embedding array<float>",
        )
        fresh, srows = semantic_dedup_incremental(
            part, st, "vec_id", "embedding",
            centroids=cents, threshold=0.3,
        )
        want += [r.vec_id for r in fresh.collect()]
        st = st.union(srows)
    assert got == sorted(want)
    assert 0 < len(got) < len(rows)  # something dropped, something kept

    # crash-replay: last batch vs the store EXCLUDING its own epoch
    part2 = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in rows[2 * k:]],
        "vec_id long, embedding array<float>",
    )
    st_replay = (
        spark.read.parquet(store)
        .where(F.col("epoch") != 2)
        .select("cluster", "vec")
    )
    fresh2, _ = semantic_dedup_incremental(
        part2, st_replay, "vec_id", "embedding",
        centroids=cents, threshold=0.3,
    )
    replayed = sorted(r.vec_id for r in fresh2.collect())
    emitted2 = sorted(
        r.vec_id
        for r in spark.read.parquet(f"{out}/__batch_id=2").collect()
    )
    assert replayed == emitted2

    # the guard: centroids are mandatory
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fixed centroids"):
        semantic_dedup_incremental(part2, st_replay, "vec_id", "embedding")


def test_stream_curation_gate_batch_parity_and_idempotence(spark, tmp_path):
    """The streaming gate's per-epoch funnel equals the batch
    curation_funnel_report computed on each ntile slice, the kept
    docs are exactly the per-batch stage-4 survivors, and a second
    run over the same split (fresh checkpoint, same dirs) overwrites
    to the identical outputs — the epoch-dir idempotence the
    crash-replay protocol relies on."""
    from flink_efo_spark.operators.text import curation_funnel_report
    from flink_efo_spark.streaming import (
        stream_curation_gate,
        stream_table_split,
    )

    def run(tag: str):
        src = stream_table_split(
            spark, SF_DIR, "documents", n_batches=3, order_col="doc_id"
        ).select("doc_id", "text")
        q = stream_curation_gate(
            src, "doc_id", "text",
            str(tmp_path / "out"), str(tmp_path / "stats"),
            str(tmp_path / f"ckpt_{tag}"),
        )
        q.awaitTermination()
        stats = sorted(
            (r.epoch, r.stage_idx, r.stage, r.docs_in, r.docs_out,
             r.tokens_out)
            for r in spark.read.parquet(str(tmp_path / "stats")).collect()
        )
        kept = sorted(
            r.doc_id
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )
        return stats, kept

    stats1, kept1 = run("a")

    # per-epoch parity with the batch operator over the same slices
    from pyspark.sql import Window
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sliced = docs.withColumn(
        "__b", F.ntile(3).over(Window.orderBy("doc_id"))
    )
    expect = []
    for b in (1, 2, 3):
        part = sliced.where(F.col("__b") == b).drop("__b")
        for r in curation_funnel_report(part, "doc_id", "text").collect():
            expect.append((b - 1, r.stage_idx, r.stage, r.docs_in,
                           r.docs_out, r.tokens_out))
    assert stats1 == sorted(expect)

    # stage-4 totals match the kept output
    total_kept = sum(d for (_, s, _, _, d, _) in stats1 if s == 4)
    assert len(kept1) == total_kept

    # idempotent overwrite: a replayed run reproduces identical files
    stats2, kept2 = run("b")
    assert stats2 == stats1 and kept2 == kept1
