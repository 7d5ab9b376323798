"""MATCH_RECOGNIZE subset tests (MatchRecognizeITCase row-set style)."""

from __future__ import annotations

from flink_efo_spark.operators.cep import match_recognize


def _events(spark, rows):
    return spark.createDataFrame(rows, "k string, seq int, et string, v double")


def test_simple_concatenation(spark):
    df = _events(
        spark,
        [
            ("u1", 1, "click", 1.0),
            ("u1", 2, "purchase", 9.0),
            ("u1", 3, "click", 1.0),
            ("u1", 4, "click", 1.0),
            ("u1", 5, "purchase", 5.0),
            ("u2", 1, "purchase", 2.0),
        ],
    )
    out = match_recognize(
        df,
        ["k"], "seq",
        pattern="A B",
        defines={"A": "et = 'click'", "B": "et = 'purchase'"},
        measures={
            "a_seq": ("A", "first", "seq"),
            "b_seq": ("B", "last", "seq"),
            "amount": ("B", "last", "v"),
        },
    )
    got = sorted((r.k, r.a_seq, r.b_seq, r.amount) for r in out.collect())
    assert got == [("u1", 1, 2, 9.0), ("u1", 4, 5, 5.0)]


def test_plus_quantifier_greedy(spark):
    # V-shape: price drops then rises (the canonical Flink CEP demo)
    df = _events(
        spark,
        [
            ("s", 1, "t", 10.0),
            ("s", 2, "t", 8.0),
            ("s", 3, "t", 6.0),
            ("s", 4, "t", 7.0),
            ("s", 5, "t", 9.0),
            ("s", 6, "t", 9.0),
        ],
    )
    out = match_recognize(
        df,
        ["k"], "seq",
        pattern="START DOWN+ UP+",
        defines={
            "START": "true",
            "DOWN": "v < prev_v",
            "UP": "v > prev_v",
        },
        measures={
            "start_seq": ("START", "first", "seq"),
            "bottom": ("DOWN", "last", "v"),
            "end_seq": ("UP", "last", "seq"),
            "n_down": ("DOWN", "count", ""),
        },
    )
    [m] = out.collect()
    assert (m.start_seq, m.bottom, m.end_seq, m.n_down) == (1, 6.0, 5, 2)


def test_optional_and_skip_past_last(spark):
    df = _events(
        spark,
        [
            ("u", 1, "a", 0.0),
            ("u", 2, "b", 0.0),
            ("u", 3, "a", 0.0),
            ("u", 4, "a", 0.0),
            ("u", 5, "b", 0.0),
        ],
    )
    out = match_recognize(
        df,
        ["k"], "seq",
        pattern="X Y?",
        defines={"X": "et = 'a'", "Y": "et = 'b'"},
        measures={"x": ("X", "first", "seq"), "y": ("Y", "last", "seq")},
    )
    got = sorted((r.x, r.y) for r in out.collect())
    # matches: (1,2), (3,None) — 4 consumed? no: greedy X at 3, Y? no b
    # at 4 → match [3], skip to 4 → X at 4, Y at 5 → (4,5)
    assert got == [(1, 2), (3, None), (4, 5)]


def test_no_match_empty(spark):
    df = _events(spark, [("u", 1, "z", 0.0)])
    out = match_recognize(
        df, ["k"], "seq", "A B",
        defines={"A": "et = 'a'", "B": "et = 'b'"},
        measures={"a": ("A", "first", "seq")},
    )
    assert out.count() == 0


def test_alternation_group(spark):
    """(B|E)+ alternation: either variable advances the step; measures
    attribute rows to the member whose DEFINE held (NFA OR-states)."""
    df = _events(
        spark,
        [
            ("u1", 1, "click", 1.0),
            ("u1", 2, "view", 2.0),
            ("u1", 3, "error", 3.0),
            ("u1", 4, "purchase", 9.0),
            ("u2", 1, "click", 1.0),
            ("u2", 2, "purchase", 4.0),
        ],
    )
    out = match_recognize(
        df,
        ["k"], "seq",
        pattern="A (B|E)* C",
        defines={
            "A": "et = 'click'",
            "B": "et = 'view'",
            "E": "et = 'error'",
            "C": "et = 'purchase'",
        },
        measures={
            "a_seq": ("A", "first", "seq"),
            "n_views": ("B", "count", "seq"),
            "n_errors": ("E", "count", "seq"),
            "c_seq": ("C", "last", "seq"),
        },
    )
    got = sorted(
        (r.k, r.a_seq, r.n_views, r.n_errors, r.c_seq) for r in out.collect()
    )
    assert got == [("u1", 1, 1, 1, 4), ("u2", 1, 0, 0, 2)]


def test_stream_match_cross_batch(spark, tmp_path):
    """A funnel spanning two micro-batches must match — partial-match
    state survives the batch boundary (SharedBuffer.java:54 role).
    Round-2 VERDICT item 6: the single-batch matcher misses this."""
    import pandas as pd

    from pyspark.sql import functions as F
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    src_dir = str(tmp_path / "cep_src")
    # batch 1 ends mid-pattern (click, view); batch 2 completes it
    spark.createDataFrame(
        [("u1", 1, "click", 1.0), ("u1", 2, "view", 2.0)],
        "k string, seq int, et string, v double",
    ).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        [("u1", 3, "purchase", 9.0), ("u2", 1, "click", 0.5)],
        "k string, seq int, et string, v double",
    ).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    out = stream_match_recognize(
        src,
        ["k"], "seq",
        pattern="A B* C",
        defines={
            "A": "et = 'click'",
            "B": "et = 'view'",
            "C": "et = 'purchase'",
        },
        measures={
            "a_seq": ("A", "first", "seq"),
            "n_mid": ("B", "count", "seq"),
            "c_seq": ("C", "last", "seq"),
        },
    )
    got = sorted(
        (r.k, r.a_seq, r.n_mid, r.c_seq)
        for r in run_stream_to_table(out).collect()
    )
    # u1's funnel spans the boundary; u2 never completes (held/no match)
    assert got == [("u1", 1, 1, 3)]


def test_stream_match_held_then_closed(spark, tmp_path):
    """A match still extendable at buffer end (trailing B+) is HELD,
    then emitted once a later row fails to extend it."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    src_dir = str(tmp_path / "cep_hold")
    spark.createDataFrame(
        [("u1", 1, "click", 1.0), ("u1", 2, "view", 2.0)],
        "k string, seq int, et string, v double",
    ).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    # the error row closes the A B+ match without joining it
    spark.createDataFrame(
        [("u1", 3, "view", 3.0), ("u1", 4, "error", 0.0)],
        "k string, seq int, et string, v double",
    ).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    out = stream_match_recognize(
        src,
        ["k"], "seq",
        pattern="A B+",
        defines={"A": "et = 'click'", "B": "et = 'view'"},
        measures={
            "a_seq": ("A", "first", "seq"),
            "n_views": ("B", "count", "seq"),
        },
    )
    got = [
        (r.k, r.a_seq, r.n_views)
        for r in run_stream_to_table(out).collect()
    ]
    # batch 1 alone would greedily emit (A, 1 view) — the hold rule
    # waits, batch 2 extends to 2 views and the error row closes it
    assert got == [("u1", 1, 2)]


def test_within_batch_rejects_slow_funnel(spark):
    """Pattern.within(): the A->B funnel only matches when B arrives
    inside the window; backtracking finds the LATER in-window A
    instead of rejecting outright."""
    rows = [
        ("u1", 0.0, "start"),   # A at t=0
        ("u1", 100.0, "done"),  # B too late for t=0, matches nothing else
        ("u2", 0.0, "start"),
        ("u2", 5.0, "done"),    # inside the 10s window
    ]
    df = spark.createDataFrame(rows, "k string, ts double, et string")
    out = match_recognize(
        df, ["k"], "ts",
        pattern="A B",
        defines={"A": "et = 'start'", "B": "et = 'done'"},
        measures={"a_ts": ("A", "first", "ts"), "b_ts": ("B", "last", "ts")},
        within=10.0,
    )
    got = {(r.k, r.a_ts, r.b_ts) for r in out.collect()}
    assert got == {("u2", 0.0, 5.0)}


def test_within_batch_backtracks_to_fitting_match(spark):
    """Greedy B+ would exceed the window; within-pruning makes the
    branch stop consuming at the window edge, still yielding the
    in-window prefix match."""
    rows = [
        ("u1", 0.0, "start"),
        ("u1", 2.0, "view"),
        ("u1", 4.0, "view"),
        ("u1", 50.0, "view"),  # outside within=10 of t=0
    ]
    df = spark.createDataFrame(rows, "k string, ts double, et string")
    out = match_recognize(
        df, ["k"], "ts",
        pattern="A B+",
        defines={"A": "et = 'start'", "B": "et = 'view'"},
        measures={"n_views": ("B", "count", "ts")},
        within=10.0,
    )
    got = [(r.k, r.n_views) for r in out.collect()]
    assert got == [("u1", 2)]


def test_within_stream_prunes_state(spark, tmp_path):
    """Streaming within: (1) an in-window cross-batch funnel still
    matches; (2) rows outside any possible window are pruned from
    tail state (bounded NFA state, not max_tail heuristics)."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    src_dir = str(tmp_path / "cep_within")
    spark.createDataFrame(
        [("u1", 0.0, "start"), ("u1", 3.0, "view"), ("u2", 0.0, "start")],
        "k string, ts double, et string",
    ).coalesce(1).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        # u1 closes in-window; u2's done is way outside the window —
        # its buffered 'start' must have been pruned, no match
        [("u1", 5.0, "done"), ("u2", 100.0, "done")],
        "k string, ts double, et string",
    ).coalesce(1).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    out = stream_match_recognize(
        src,
        ["k"], "ts",
        pattern="A B* C",
        defines={
            "A": "et = 'start'", "B": "et = 'view'", "C": "et = 'done'",
        },
        measures={"a_ts": ("A", "first", "ts"), "c_ts": ("C", "last", "ts")},
        within=10.0,
    )
    got = {(r.k, r.a_ts, r.c_ts) for r in run_stream_to_table(out).collect()}
    assert got == {("u1", 0.0, 5.0)}


def test_flush_on_timeout_finalizes_held_match(spark, tmp_path):
    """A greedy trailing quantifier (A B+) held at end-of-input:
    without flush the match never emits (Spark has no MAX_WATERMARK
    on bounded replays); with flush_on_timeout + a far-future
    sentinel batch it finalizes exactly like the batch matcher."""
    from pyspark.sql import functions as F
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    src_dir = str(tmp_path / "cep_flush")
    spark.createDataFrame(
        [("u1", 1.0, "click", 1), ("u1", 2.0, "purchase", 2),
         ("u1", 3.0, "purchase", 3)],
        "k string, ts double, et string, eid long",
    ).coalesce(1).write.parquet(src_dir + "/b1.parquet")
    # sentinel batch: far-future event time on a non-matching key
    spark.createDataFrame(
        [("__wm__", 10_000.0, "__wm__", -1)],
        "k string, ts double, et string, eid long",
    ).coalesce(1).write.parquet(src_dir + "/b2.parquet")

    def run(flush):
        schema = spark.read.parquet(src_dir + "/b1.parquet").schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
            .withColumn("ets", F.timestamp_seconds("ts"))
            .withWatermark("ets", "1 second")
            .drop("ts")
        )
        out = stream_match_recognize(
            src, ["k"], "ets",
            pattern="A B+",
            defines={"A": "et = 'click'", "B": "et = 'purchase'"},
            measures={
                "start_id": ("A", "first", "eid"),
                "n_b": ("B", "count", "eid"),
            },
            tiebreak="eid",
            flush_on_timeout=flush,
            # MAX_WATERMARK marker: below the sentinel (ts=10000),
            # above all real data (ts<=3)
            end_of_input_ts=100.0,
        )
        return {
            (r.k, r.start_id, r.n_b)
            for r in run_stream_to_table(out).collect()
        }

    assert run(False) == set()  # held forever — the documented gap
    assert run(True) == {("u1", 1, 2)}  # finalized at MAX_WATERMARK


def test_stream_match_drops_late_events(spark, tmp_path):
    """The reference CEP operator drops events at or below the last
    watermark (CepOperator.java's processElement guard); Spark's
    applyInPandasWithState delivers them, so the harness must filter —
    a late B (its ts is below the watermark another key advanced) must
    not complete a match the watermark-aware flush already treats as
    unreachable."""
    import datetime as dt

    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    t0 = dt.datetime(2024, 1, 1)
    schema = "k string, eid long, et string, ts timestamp"
    batches = [
        # b0: u1 anchors A; u2 pushes the watermark to 190
        [("u1", 1, "click", 100), ("u2", 90, "x", 200)],
        # b1: u1's B at ts=110 arrives LATE (watermark is 190) — the
        # reference drops it, so no match may ever emit
        [("u1", 2, "purchase", 110)],
        [("zz", -1, "x", 10_000)],
    ]
    src_dir = str(tmp_path / "cep_late")
    for i, part in enumerate(batches):
        rows = [
            (k, e, et, t0 + dt.timedelta(seconds=sec))
            for (k, e, et, sec) in part
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
        .withWatermark("ts", "10 seconds")
    )
    out = stream_match_recognize(
        src, ["k"], "ts",
        pattern="A B",
        defines={"A": "et = 'click'", "B": "et = 'purchase'"},
        measures={"start_id": ("A", "first", "eid")},
        tiebreak="eid",
        within=60,
        flush_on_timeout=True,
        end_of_input_ts=t0 + dt.timedelta(seconds=1000),
    )
    got = [r for r in run_stream_to_table(out).collect() if r.k == "u1"]
    assert got == [], got


def test_stream_match_idle_key_keeps_partial_tail(spark, tmp_path):
    """A key idle for a whole micro-batch (other keys advance the
    watermark and fire its flush timer) must KEEP its partial-match
    tail: the timed-out path finalizes only matches whose within
    window the watermark closed and preserves the rest — a
    state.remove() there would lose matches spanning the gap (key
    with rows in batches 1 and 3, none in batch 2)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    t0 = dt.datetime(2024, 1, 1)
    schema = "k string, eid long, et string, ts timestamp"
    batches = [
        # b0: u1 starts a match (A alone); u3 holds a greedy A B(1)
        [("u1", 1, "click", 100), ("u3", 10, "click", 100),
         ("u3", 11, "purchase", 105), ("u2", 90, "x", 105)],
        # b1: u1/u3 IDLE; u2 advances the watermark -> timers fire
        [("u2", 91, "x", 115)],
        # b2: the gap-spanning rows — u1 completes, u3 extends to B(2)
        [("u1", 2, "purchase", 110), ("u3", 12, "purchase", 110)],
        # b3: far-future sentinel pushes the watermark past EOI
        [("zz", -1, "x", 10_000)],
    ]
    src_dir = str(tmp_path / "cep_idle")
    for i, part in enumerate(batches):
        rows = [
            (k, e, et, t0 + dt.timedelta(seconds=sec))
            for (k, e, et, sec) in part
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
        .withWatermark("ts", "10 seconds")
    )
    out = stream_match_recognize(
        src, ["k"], "ts",
        pattern="A B+",
        defines={"A": "et = 'click'", "B": "et = 'purchase'"},
        measures={
            "start_id": ("A", "first", "eid"),
            "n_b": ("B", "count", "eid"),
        },
        tiebreak="eid",
        within=60,
        flush_on_timeout=True,
        end_of_input_ts=t0 + dt.timedelta(seconds=1000),
    )
    got = sorted(
        (r.k, r.start_id, r.n_b)
        for r in run_stream_to_table(out).collect()
        if not r.k.startswith(("u2", "zz"))
    )
    # the old remove-on-timeout path loses u1 entirely and truncates
    # u3 to n_b=1 (its held match was finalized at the idle batch)
    assert got == [("u1", 1, 1), ("u3", 10, 2)], got


def test_after_match_skip_to_next_row(spark):
    """AFTER MATCH SKIP TO NEXT ROW (AfterMatchSkipStrategy.java):
    overlapping emission — a run of k clicks gives k-1 pairs, vs
    floor(k/2) under the default past-last-row."""
    df = _events(
        spark,
        [
            ("u1", 1, "click", 1.0),
            ("u1", 2, "click", 1.0),
            ("u1", 3, "click", 1.0),
            ("u1", 4, "click", 1.0),
            ("u1", 5, "purchase", 1.0),
            ("u2", 1, "click", 1.0),
        ],
    )

    def pairs(mode):
        out = match_recognize(
            df,
            ["k"], "seq",
            pattern="C C",
            defines={"C": "et = 'click'"},
            measures={
                "first_seq": ("C", "first", "seq"),
                "last_seq": ("C", "last", "seq"),
            },
            after_match=mode,
        )
        return sorted((r.k, r.first_seq, r.last_seq) for r in out.collect())

    assert pairs("to_next_row") == [("u1", 1, 2), ("u1", 2, 3), ("u1", 3, 4)]
    assert pairs("past_last_row") == [("u1", 1, 2), ("u1", 3, 4)]

    import pytest

    with pytest.raises(ValueError):
        match_recognize(
            df, ["k"], "seq", pattern="C",
            defines={"C": "et = 'click'"},
            measures={"s": ("C", "first", "seq")},
            after_match="to_last",
        )


def test_reluctant_quantifier(spark):
    """Non-greedy quantifiers (Quantifier.java greedy flag off):
    ``B+?`` consumes as few rows as possible, greedy ``B+`` as many."""
    df = _events(
        spark,
        [
            ("u1", 1, "a", 1.0),
            ("u1", 2, "b", 1.0),
            ("u1", 3, "b", 1.0),
            ("u1", 4, "b", 1.0),
        ],
    )

    def n_b(pattern):
        out = match_recognize(
            df, ["k"], "seq",
            pattern=pattern,
            defines={"A": "et = 'a'", "B": "et = 'b'"},
            measures={"nb": ("B", "count", "seq")},
        )
        return [r.nb for r in out.collect()]

    assert n_b("A B+") == [3]   # greedy: all three b rows
    assert n_b("A B+?") == [1]  # reluctant: just one


def test_after_match_skip_to_first_var(spark):
    """AFTER MATCH SKIP TO FIRST <var>
    (AfterMatchSkipStrategy.java SkipToFirstStrategy): the scan
    resumes at the first row the match attributed to the variable, so
    a second match can start inside the first one."""
    df = _events(
        spark,
        [
            ("u1", 1, "a", 1.0),
            ("u1", 2, "b", 1.0),
            ("u1", 3, "b", 1.0),
            ("u1", 4, "c", 1.0),
        ],
    )

    def starts(mode):
        out = match_recognize(
            df, ["k"], "seq",
            pattern="A B+ C",
            defines={
                "A": "et = 'a' or et = 'b'",
                "B": "et = 'b'",
                "C": "et = 'c'",
            },
            measures={"start_seq": ("A", "first", "seq")},
            after_match=mode,
        )
        return sorted(r.start_seq for r in out.collect())

    assert starts("past_last_row") == [1]
    assert starts("to_first:B") == [1, 2]  # second match from first B

    import pytest

    with pytest.raises(ValueError):
        match_recognize(
            df, ["k"], "seq", pattern="A",
            defines={"A": "et = 'a'"},
            measures={"s": ("A", "first", "seq")},
            after_match="to_first:Z",
        )


def test_nested_pattern_group(spark):
    """Nested quantified groups (GroupPattern.java): ``A (B C)+ D``
    matches only complete (B C) repetitions."""
    df = _events(
        spark,
        [
            ("u1", 1, "a", 1.0),
            ("u1", 2, "b", 1.0),
            ("u1", 3, "c", 1.0),
            ("u1", 4, "b", 1.0),
            ("u1", 5, "c", 1.0),
            ("u1", 6, "d", 1.0),
            # u2: dangling b (no c) — group incomplete, no match
            ("u2", 1, "a", 1.0),
            ("u2", 2, "b", 1.0),
            ("u2", 3, "d", 1.0),
        ],
    )
    out = match_recognize(
        df, ["k"], "seq",
        pattern="A (B C)+ D",
        defines={
            "A": "et = 'a'", "B": "et = 'b'",
            "C": "et = 'c'", "D": "et = 'd'",
        },
        measures={
            "n_b": ("B", "count", "seq"),
            "n_c": ("C", "count", "seq"),
            "d_seq": ("D", "last", "seq"),
        },
    )
    got = sorted((r.k, r.n_b, r.n_c, r.d_seq) for r in out.collect())
    assert got == [("u1", 2, 2, 6)]


def test_stream_prev_define_with_context_row(spark, tmp_path):
    """Streaming PREV(): prev_-using DEFINEs evaluate in the worker
    over the sorted buffer, and the carried CONTEXT row lets the row
    right after an emitted match still see its true (consumed)
    predecessor. Classic V-pattern D+ U+ (price falls then rises),
    two consecutive matches, the second's first fall judged
    against the first match's last rise."""
    from pyspark.sql import functions as F
    from flink_efo_spark.operators.cep import (
        match_recognize,
        stream_match_recognize,
    )
    from flink_efo_spark.streaming import run_stream_to_table

    rows = [
        ("u1", 1.0, 10.0), ("u1", 2.0, 8.0), ("u1", 3.0, 6.0),
        ("u1", 4.0, 7.0), ("u1", 5.0, 9.0), ("u1", 6.0, 5.0),
        ("u1", 7.0, 4.0), ("u1", 8.0, 8.0),
    ]
    src_dir = str(tmp_path / "cep_prev")
    slices = [rows[0:3], rows[3:6], rows[6:8], [("zz", 1000.0, 0.0)]]
    for i, sl in enumerate(slices):
        spark.createDataFrame(
            sl, "k string, ts double, v double"
        ).coalesce(1).write.parquet(src_dir + f"/f{i}.parquet")

    schema = spark.read.parquet(src_dir + "/f0.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
        .withColumn("ets", F.timestamp_seconds("ts"))
        .withWatermark("ets", "1 second")
        .drop("ts")
    )
    defines = {"D": "v < prev_v", "U": "v > prev_v"}
    measures = {
        "n_d": ("D", "count", "v"),
        "n_u": ("U", "count", "v"),
        "last_u": ("U", "last", "v"),
    }
    out = stream_match_recognize(
        src, ["k"], "ets",
        pattern="D+ U+",
        defines=defines,
        measures=measures,
        flush_on_timeout=True,
        end_of_input_ts=100.0,  # below the ts=1000 sentinel, above data
    )
    got = sorted(
        (r.k, r.n_d, r.n_u, r.last_u)
        for r in run_stream_to_table(out).collect()
    )
    assert got == [("u1", 2, 1, 8.0), ("u1", 2, 2, 9.0)]

    # batch equivalence: lag-based PREV over the full partition
    batch = spark.createDataFrame(rows, "k string, ts double, v double")
    bout = match_recognize(
        batch, ["k"], "ts",
        pattern="D+ U+",
        defines=defines,
        measures=measures,
    )
    bgot = sorted((r.k, r.n_d, r.n_u, r.last_u) for r in bout.collect())
    assert bgot == got


def test_permute_matches_either_order(spark):
    """PERMUTE(A, B) matches both orderings; expansion preference is
    lexicographic (argument order first)."""
    import pandas as pd
    from flink_efo_spark.operators.cep import match_recognize

    rows = [
        # key 1: A then B            -> match
        (1, 1, "a"), (1, 2, "b"),
        # key 2: B then A            -> match
        (2, 1, "b"), (2, 2, "a"),
        # key 3: A A (no B)          -> no match
        (3, 1, "a"), (3, 2, "a"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, et string")
    out = match_recognize(
        df, ["k"], "seq",
        pattern="PERMUTE(A, B)",
        defines={"A": "et = 'a'", "B": "et = 'b'"},
        measures={"a_seq": ("A", "first", "seq"), "b_seq": ("B", "first", "seq")},
    ).toPandas().sort_values("k")
    assert list(out.k) == [1, 2]
    assert list(out.a_seq) == [1, 2]  # key2: A is the 2nd row
    assert list(out.b_seq) == [2, 1]


def test_permute_three_args_and_quantified(spark):
    """3-argument PERMUTE (6 orderings) and a quantified PERMUTE
    group."""
    from flink_efo_spark.operators.cep import match_recognize

    rows = [(1, i + 1, t) for i, t in enumerate(["c", "a", "b"])]
    df = spark.createDataFrame(rows, "k long, seq long, et string")
    out = match_recognize(
        df, ["k"], "seq",
        pattern="PERMUTE(A, B, C)",
        defines={"A": "et = 'a'", "B": "et = 'b'", "C": "et = 'c'"},
        measures={"n": ("A", "count", "seq")},
    ).toPandas()
    assert len(out) == 1
    # (A B)-permuted twice: a b b a == PERMUTE(A,B){2}
    rows2 = [(1, i + 1, t) for i, t in enumerate(["a", "b", "b", "a"])]
    df2 = spark.createDataFrame(rows2, "k long, seq long, et string")
    out2 = match_recognize(
        df2, ["k"], "seq",
        pattern="PERMUTE(A, B)+",
        defines={"A": "et = 'a'", "B": "et = 'b'"},
        measures={"n": ("A", "count", "seq")},
    ).toPandas()
    assert len(out2) == 1 and out2.n[0] == 2


def test_permute_rejected_streaming(spark):
    """_flat_steps still refuses grouped/PERMUTE patterns — streaming
    routes them through the AST matcher instead (round 5)."""
    import pytest as _pytest
    from flink_efo_spark.operators.cep import _parse_ast, _flat_steps

    ast, leaves = _parse_ast("PERMUTE(A, B)")
    with _pytest.raises(ValueError, match="no flat-step view"):
        _flat_steps(ast, leaves)


def _stream_batches(spark, tmp_path, tag, batches):
    """Write explicit per-batch parquet files and open a
    maxFilesPerTrigger=1 replay over them."""
    src_dir = str(tmp_path / tag)
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "k string, seq int, et string, v double"
        ).coalesce(1).write.parquet(f"{src_dir}/b{i:03d}.parquet")
    schema = spark.read.parquet(f"{src_dir}/b000.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )


def test_stream_nested_group_every_boundary(spark, tmp_path):
    """Streaming nested pattern groups (GroupPattern.java /
    MatchRecognizeITCase nested cases): ``A (B C)+ D`` must produce
    the batch result for EVERY possible micro-batch split point —
    partial group state (including a mid-repetition split) survives
    the boundary."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    ets = [
        "a", "b", "c", "b", "c", "d",   # match 1: 2 pairs
        "x",                              # noise
        "a", "b", "c", "d",             # match 2: 1 pair
        "a", "b", "d",                   # dangling b -> no match
    ]
    rows = [("u1", i + 1, et, 1.0) for i, et in enumerate(ets)]
    want = [("u1", 1, 2, 6), ("u1", 2, 1, 11)]  # (k, seq, n_pairs, d_seq)

    for cut in range(1, len(rows)):
        src = _stream_batches(
            spark, tmp_path, f"nested_{cut}", [rows[:cut], rows[cut:]]
        )
        out = stream_match_recognize(
            src, ["k"], "seq",
            pattern="A (B C)+ D",
            defines={
                "A": "et = 'a'", "B": "et = 'b'",
                "C": "et = 'c'", "D": "et = 'd'",
            },
            measures={
                "n_pairs": ("B", "count", "seq"),
                "d_seq": ("D", "last", "seq"),
            },
        )
        got = sorted(
            (r.k, r.match_seq, r.n_pairs, r.d_seq)
            for r in run_stream_to_table(out).collect()
        )
        assert got == want, f"split at {cut}: {got}"


def test_stream_nested_group_held_until_closed(spark, tmp_path):
    """A grouped match still extendable at buffer end (``A (B C)+``,
    trailing complete pair) must be HELD across the boundary — the
    probe-based hold test — then emitted with the extra repetition
    once a later row fails to extend it."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    batches = [
        # ends on a complete pair: greedy could still extend -> hold
        [("u1", 1, "a", 1.0), ("u1", 2, "b", 1.0), ("u1", 3, "c", 1.0)],
        # second pair, still extendable -> hold again
        [("u1", 4, "b", 1.0), ("u1", 5, "c", 1.0)],
        # non-extending row closes the match with 2 repetitions
        [("u1", 6, "x", 1.0)],
    ]
    src = _stream_batches(spark, tmp_path, "held_nested", batches)
    out = stream_match_recognize(
        src, ["k"], "seq",
        pattern="A (B C)+",
        defines={"A": "et = 'a'", "B": "et = 'b'", "C": "et = 'c'"},
        measures={
            "n_pairs": ("B", "count", "seq"),
            "last_c": ("C", "last", "seq"),
        },
    )
    got = [
        (r.k, r.n_pairs, r.last_c)
        for r in run_stream_to_table(out).collect()
    ]
    assert got == [("u1", 2, 5)]


def test_stream_nested_group_within_window(spark, tmp_path):
    """Pattern.within() (NFA.java windowTime) applies to streamed
    nested groups: a grouped match whose span would exceed the window
    never fires, and tail state prunes on window advance."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    batches = [
        # u1 completes within the 100-unit window; u2's d is too late
        [("u1", 0, "a", 1.0), ("u1", 10, "b", 1.0)],
        [("u1", 20, "c", 1.0), ("u1", 30, "d", 1.0),
         ("u2", 0, "a", 1.0), ("u2", 10, "b", 1.0)],
        [("u2", 20, "c", 1.0), ("u2", 200, "d", 1.0)],
    ]
    src = _stream_batches(spark, tmp_path, "nested_within", batches)
    out = stream_match_recognize(
        src, ["k"], "seq",
        pattern="A (B C)+ D",
        defines={
            "A": "et = 'a'", "B": "et = 'b'",
            "C": "et = 'c'", "D": "et = 'd'",
        },
        measures={
            "n_pairs": ("B", "count", "seq"),
            "d_seq": ("D", "last", "seq"),
        },
        within=100,
    )
    got = sorted(
        (r.k, r.n_pairs, r.d_seq)
        for r in run_stream_to_table(out).collect()
    )
    assert got == [("u1", 1, 30)]


def test_stream_after_match_to_next_row_every_boundary(spark, tmp_path):
    """Streaming AFTER MATCH SKIP TO NEXT ROW (overlapping matches,
    AfterMatchSkipStrategy.java) must equal the batch matcher for
    EVERY micro-batch split point — the frontier emission rule holds
    unresolved starts without reordering match numbers."""
    from flink_efo_spark.operators.cep import (
        match_recognize,
        stream_match_recognize,
    )
    from flink_efo_spark.streaming import run_stream_to_table

    ets = ["a", "a", "b", "x", "a", "b", "a", "x"]
    rows = [("u1", i + 1, et, 1.0) for i, et in enumerate(ets)]
    batch_df = spark.createDataFrame(
        rows, "k string, seq int, et string, v double"
    )
    kwargs = dict(
        pattern="A+ B",
        defines={"A": "et = 'a'", "B": "et = 'b'"},
        measures={
            "a_first": ("A", "first", "seq"),
            "b_seq": ("B", "last", "seq"),
        },
    )
    want = sorted(
        (r.k, r.match_seq, r.a_first, r.b_seq)
        for r in match_recognize(
            batch_df, ["k"], "seq", after_match="to_next_row", **kwargs
        ).collect()
    )
    assert len(want) == 3  # starts 1,2 -> b@3; a@5 -> b@6; a@7 dangles
    for cut in range(1, len(rows)):
        src = _stream_batches(
            spark, tmp_path, f"overlap_{cut}", [rows[:cut], rows[cut:]]
        )
        got = sorted(
            (r.k, r.match_seq, r.a_first, r.b_seq)
            for r in run_stream_to_table(
                stream_match_recognize(
                    src, ["k"], "seq", after_match="to_next_row", **kwargs
                )
            ).collect()
        )
        assert got == want, f"split at {cut}: {got}"


def test_stream_after_match_to_first_var(spark, tmp_path):
    """Streaming SKIP TO FIRST <var>: resume at the first B row of the
    emitted match, across a batch boundary."""
    from flink_efo_spark.operators.cep import (
        match_recognize,
        stream_match_recognize,
    )
    from flink_efo_spark.streaming import run_stream_to_table

    ets = ["a", "b", "b", "a", "b", "x"]
    rows = [("u1", i + 1, et, 1.0) for i, et in enumerate(ets)]
    batch_df = spark.createDataFrame(
        rows, "k string, seq int, et string, v double"
    )
    kwargs = dict(
        pattern="A B+",
        defines={"A": "et = 'a'", "B": "et = 'b'"},
        measures={
            "a_seq": ("A", "first", "seq"),
            "n_b": ("B", "count", "seq"),
        },
    )
    want = sorted(
        (r.match_seq, r.a_seq, r.n_b)
        for r in match_recognize(
            batch_df, ["k"], "seq", after_match="to_first:B", **kwargs
        ).collect()
    )
    for cut in (2, 3, 4, 5):
        src = _stream_batches(
            spark, tmp_path, f"tofirst_{cut}", [rows[:cut], rows[cut:]]
        )
        got = sorted(
            (r.match_seq, r.a_seq, r.n_b)
            for r in run_stream_to_table(
                stream_match_recognize(
                    src, ["k"], "seq", after_match="to_first:B", **kwargs
                )
            ).collect()
        )
        assert got == want, f"split at {cut}: {got} != {want}"


def test_stream_permute_cross_batch(spark, tmp_path):
    """Streaming PERMUTE (alternation-of-sequences AST) — a P·S·E /
    P·E·S triple split across batches matches either order."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    batches = [
        [("u1", 1, "p", 1.0), ("u1", 2, "e", 1.0)],
        [("u1", 3, "s", 1.0), ("u2", 1, "p", 1.0)],
        [("u2", 2, "s", 1.0), ("u2", 3, "e", 1.0)],
    ]
    src = _stream_batches(spark, tmp_path, "permute_stream", batches)
    out = stream_match_recognize(
        src, ["k"], "seq",
        pattern="P PERMUTE(S, E)",
        defines={"P": "et = 'p'", "S": "et = 's'", "E": "et = 'e'"},
        measures={
            "p_seq": ("P", "first", "seq"),
            "s_seq": ("S", "first", "seq"),
            "e_seq": ("E", "first", "seq"),
        },
    )
    got = sorted(
        (r.k, r.p_seq, r.s_seq, r.e_seq)
        for r in run_stream_to_table(out).collect()
    )
    assert got == [("u1", 1, 3, 2), ("u2", 1, 2, 3)]


def test_stream_overlap_define_holds_short_match(spark, tmp_path):
    """Overlapping DEFINE flags (D's predicate also satisfies B's):
    the greedy backtracker can return a match ending BEFORE the
    buffer end (one pair + D mid-buffer) while the pair chain runs to
    the boundary. That short match must be HELD, not emitted — batch
    semantics over the full stream prefers the longer match once
    future rows arrive (round-5 ADVICE: the `end == n-1` gate emitted
    it as final). held is decided solely by the _ast_extendable
    probe."""
    from flink_efo_spark.operators.cep import (
        match_recognize,
        stream_match_recognize,
    )
    from flink_efo_spark.streaming import run_stream_to_table

    ets = ["a", "b", "c", "d", "c", "d", "x"]
    rows = [("u1", i + 1, et, 1.0) for i, et in enumerate(ets)]
    defines = {
        "A": "et = 'a'",
        "B": "et = 'b' OR et = 'd'",  # overlaps D
        "C": "et = 'c'",
        "D": "et = 'd'",
    }
    measures = {
        "n_pairs": ("B", "count", "seq"),
        "d_seq": ("D", "last", "seq"),
    }
    batch = match_recognize(
        spark.createDataFrame(rows, "k string, seq int, et string, v double"),
        ["k"], "seq",
        pattern="A (B C)+ D",
        defines=defines,
        measures=measures,
    )
    want = sorted(
        (r.k, r.n_pairs, r.d_seq) for r in batch.collect()
    )
    # full-stream greedy: pairs (b2,c3),(d4,c5) then D = d6
    assert want == [("u1", 2, 6)]

    for cut in range(1, len(rows)):
        src = _stream_batches(
            spark, tmp_path, f"ovl_{cut}", [rows[:cut], rows[cut:]]
        )
        out = stream_match_recognize(
            src, ["k"], "seq",
            pattern="A (B C)+ D",
            defines=defines,
            measures=measures,
        )
        got = sorted(
            (r.k, r.n_pairs, r.d_seq)
            for r in run_stream_to_table(out).collect()
        )
        assert got == want, f"split at {cut}: {got}"


def test_define_navigation_first_last(spark):
    """FIRST/LAST navigation inside DEFINE (MatchCodeGenerator.scala
    navigation, MatchRecognizeITCase): conditions resolve against the
    in-progress binding — including SQL running semantics where the
    current row is tentatively bound to its own variable — and the
    streaming path rejects navigation with a clear error."""
    from flink_efo_spark.operators.cep import match_recognize

    rows = [
        ("u1", 1, "a", 10.0),
        ("u1", 2, "b", 12.0),
        ("u1", 3, "b", 15.0),
        ("u1", 4, "c", 1.0),
        ("u1", 5, "a", 5.0),
        ("u1", 6, "c", 2.0),
        ("u2", 1, "a", 3.0),
        ("u2", 2, "b", 2.0),  # fails v > FIRST(A.v): blocks C -> no match
        ("u2", 3, "c", 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, seq int, et string, v double")
    out = match_recognize(
        df, ["k"], "seq",
        pattern="A B* C",
        defines={
            "A": "et = 'a'",
            "B": "et = 'b' AND v > first_A_v",
            "C": "et = 'c'",
        },
        measures={
            "a_seq": ("A", "first", "seq"),
            "n_b": ("B", "count", "seq"),
            "c_seq": ("C", "last", "seq"),
        },
    )
    got = sorted((r.k, r.a_seq, r.n_b, r.c_seq) for r in out.collect())
    assert got == [("u1", 1, 2, 4), ("u1", 5, 0, 6)]

    # LAST self-navigation: running semantics make LAST(U.v) the
    # current row, so the OR arm decides; navigation over an unbound
    # variable is NULL -> false
    rows2 = [("u1", i, "x", v) for i, v in enumerate([1.0, 3.0, 5.0], 1)]
    df2 = spark.createDataFrame(rows2, "k string, seq int, et string, v double")
    out2 = match_recognize(
        df2, ["k"], "seq",
        pattern="S U+",
        defines={"S": "TRUE", "U": "v > last_S_v"},
        measures={"s_seq": ("S", "first", "seq"), "n_u": ("U", "count", "seq")},
    )
    assert [(r.s_seq, r.n_u) for r in out2.collect()] == [(1, 2)]

    # streaming rejects navigation DEFINEs loudly
    import pytest as _pytest

    from flink_efo_spark.operators.cep import stream_match_recognize

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("'k' AS k", "CAST(value AS INT) AS seq",
                    "'x' AS et", "CAST(value AS DOUBLE) AS v")
    )
    with _pytest.raises(ValueError, match="batch matcher"):
        stream_match_recognize(
            src, ["k"], "seq",
            pattern="A B",
            defines={"A": "TRUE", "B": "v > first_A_v"},
            measures={"n": ("B", "count", "seq")},
        )


def test_flush_on_timeout_requires_window_or_eoi(spark):
    """ADVICE r8: flush_on_timeout on a windowless pattern with no
    end_of_input_ts can never fire (the conditional-arming fix means
    no timer is ever set) — the dead contract must raise loudly, not
    silently hold the caller's final matches forever."""
    import pytest

    from flink_efo_spark.operators.cep import stream_match_recognize

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("'k' AS k", "CAST(value AS INT) AS seq",
                    "'x' AS et", "CAST(value AS DOUBLE) AS v")
    )
    with pytest.raises(ValueError, match="flush_on_timeout"):
        stream_match_recognize(
            src, ["k"], "seq",
            pattern="A B",
            defines={"A": "TRUE", "B": "TRUE"},
            measures={"n": ("B", "count", "seq")},
            flush_on_timeout=True,
        )
    # either finalization path re-legitimizes the flag
    stream_match_recognize(
        src, ["k"], "seq",
        pattern="A B",
        defines={"A": "TRUE", "B": "TRUE"},
        measures={"n": ("B", "count", "seq")},
        flush_on_timeout=True,
        within=10.0,
    )
    stream_match_recognize(
        src, ["k"], "seq",
        pattern="A B",
        defines={"A": "TRUE", "B": "TRUE"},
        measures={"n": ("B", "count", "seq")},
        flush_on_timeout=True,
        end_of_input_ts=1e9,
    )


def test_stream_match_classifier(spark, tmp_path):
    """CLASSIFIER() through the STREAMING matcher: the measure rides
    _measure_record there too, and the alternation tail makes it
    differ per match across micro-batches."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table

    src_dir = str(tmp_path / "cep_cls")
    spark.createDataFrame(
        [("u1", 1, "a", 1.0), ("u1", 2, "b", 2.0)],
        "k string, seq int, et string, v double",
    ).coalesce(1).write.parquet(src_dir + "/f1.parquet")
    spark.createDataFrame(
        [("u1", 3, "a", 3.0), ("u1", 4, "c", 4.0)],
        "k string, seq int, et string, v double",
    ).coalesce(1).write.parquet(src_dir + "/f2.parquet")

    schema = spark.read.parquet(src_dir + "/f1.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    out = stream_match_recognize(
        src,
        ["k"], "seq",
        pattern="A (B|C)",
        defines={"A": "et = 'a'", "B": "et = 'b'", "C": "et = 'c'"},
        measures={
            "who": ("", "classifier", ""),
            "a_seq": ("A", "first", "seq"),
        },
    )
    got = sorted(
        (r.who, r.a_seq) for r in run_stream_to_table(out).collect()
    )
    assert got == [("B", 1), ("C", 3)]
