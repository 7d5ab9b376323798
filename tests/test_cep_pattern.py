"""flink-cep Pattern API tests (CEPITCase / NFAITCase row-set style:
flink-libraries/flink-cep/src/test/java/org/apache/flink/cep/).

Each case drives a small fixed event sequence through
``cep_pattern_select`` and asserts the exact emitted match set —
negative patterns, consuming strategies, quantifiers, after-match
skip, until(), and the timed-out side output."""

from __future__ import annotations

import pytest

from flink_efo_spark.operators.cep_pattern import CepPattern, cep_pattern_select


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, event_id int, event_type string, ts double"
    )


def _run(spark, rows, pat, measures, **kw):
    out = cep_pattern_select(
        _df(spark, rows), pat, ["user_id"], "ts", measures,
        tiebreak="event_id", **kw
    )
    return sorted(tuple(r) for r in out.collect())


V, C, P, E, S = "view", "click", "purchase", "error", "signup"


def test_not_followed_by_blocks_and_passes(spark):
    rows = [
        (1, 1, V, 0.0), (1, 2, C, 10.0),            # clean: match
        (2, 1, V, 0.0), (2, 2, P, 5.0), (2, 3, C, 9.0),  # purchase first: dead
    ]
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .not_followed_by("nb").where(f"event_type = '{P}'")
           .followed_by("c").where(f"event_type = '{C}'"))
    got = _run(spark, rows, pat,
               {"a_id": ("a", "first", "event_id"),
                "c_id": ("c", "first", "event_id")})
    assert got == [(1, 1, 1, 2)]


def test_not_followed_by_after_the_click_is_fine(spark):
    rows = [(1, 1, V, 0.0), (1, 2, C, 5.0), (1, 3, P, 9.0)]
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .not_followed_by("nb").where(f"event_type = '{P}'")
           .followed_by("c").where(f"event_type = '{C}'"))
    got = _run(spark, rows, pat, {"c_id": ("c", "first", "event_id")})
    assert got == [(1, 1, 2)]


def test_not_next_strict_gap(spark):
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .not_next("x").where(f"event_type = '{P}'")
           .followed_by("c").where(f"event_type = '{C}'"))
    ok = [(1, 1, V, 0.0), (1, 2, C, 1.0)]
    dead = [(1, 1, V, 0.0), (1, 2, P, 1.0), (1, 3, C, 2.0)]
    assert _run(spark, ok, pat, {"c": ("c", "first", "event_id")}) == [(1, 1, 2)]
    assert _run(spark, dead, pat, {"c": ("c", "first", "event_id")}) == []


def test_followed_by_takes_first_match_only(spark):
    rows = [(1, 1, V, 0.0), (1, 2, C, 1.0), (1, 3, C, 2.0)]
    fb = (CepPattern.begin("a").where(f"event_type = '{V}'")
          .followed_by("c").where(f"event_type = '{C}'"))
    any_ = (CepPattern.begin("a").where(f"event_type = '{V}'")
            .followed_by_any("c").where(f"event_type = '{C}'"))
    assert _run(spark, rows, fb, {"c": ("c", "first", "event_id")}) == [(1, 1, 2)]
    assert _run(spark, rows, any_, {"c": ("c", "first", "event_id")}) == [
        (1, 1, 2), (1, 2, 3)]


def test_next_requires_adjacency(spark):
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .next("c").where(f"event_type = '{C}'"))
    adjacent = [(1, 1, V, 0.0), (1, 2, C, 1.0)]
    gapped = [(1, 1, V, 0.0), (1, 2, E, 1.0), (1, 3, C, 2.0)]
    assert _run(spark, adjacent, pat, {"c": ("c", "first", "event_id")}) == [
        (1, 1, 2)]
    assert _run(spark, gapped, pat, {"c": ("c", "first", "event_id")}) == []


def test_times_consecutive_overlapping_anchors(spark):
    rows = [(1, i, C, float(i)) for i in range(1, 4)] + [(1, 4, P, 4.0)]
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .times(2).consecutive()
           .followed_by("p").where(f"event_type = '{P}'"))
    got = _run(spark, rows, pat,
               {"c1": ("c", "first", "event_id"),
                "c2": ("c", "last", "event_id")})
    assert got == [(1, 1, 1, 2), (1, 2, 2, 3)]


def test_one_or_more_emits_every_prefix(spark):
    rows = [(1, i, C, float(i)) for i in range(1, 4)] + [(1, 4, P, 4.0)]
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .one_or_more().consecutive()
           .followed_by("p").where(f"event_type = '{P}'"))
    got = _run(spark, rows, pat,
               {"c1": ("c", "first", "event_id"),
                "n": ("c", "count", "event_id")})
    assert sorted((r[2], r[3]) for r in got) == [
        (1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 1)]


def test_greedy_keeps_longest_run_per_anchor(spark):
    rows = [(1, i, C, float(i)) for i in range(1, 4)] + [(1, 4, P, 4.0)]
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .one_or_more().consecutive().greedy()
           .followed_by("p").where(f"event_type = '{P}'"))
    got = _run(spark, rows, pat,
               {"c1": ("c", "first", "event_id"),
                "n": ("c", "count", "event_id")})
    assert sorted((r[2], r[3]) for r in got) == [(1, 3), (2, 2), (3, 1)]


def test_until_stops_the_loop(spark):
    rows = [(1, 1, C, 1.0), (1, 2, C, 2.0), (1, 3, E, 3.0),
            (1, 4, C, 4.0), (1, 5, P, 5.0)]
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .one_or_more().greedy().until(f"event_type = '{E}'")
           .followed_by("p").where(f"event_type = '{P}'"))
    got = _run(spark, rows, pat,
               {"c1": ("c", "first", "event_id"),
                "n": ("c", "count", "event_id")})
    # anchors 1 and 2 stop at the error; anchor 4 runs to the purchase
    assert sorted((r[2], r[3]) for r in got) == [(1, 2), (2, 1), (4, 1)]


def test_optional_stage(spark):
    rows = [(1, 1, V, 0.0), (1, 2, P, 1.0),
            (2, 1, V, 0.0), (2, 2, C, 1.0), (2, 3, P, 2.0)]
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .followed_by("c").where(f"event_type = '{C}'").optional()
           .followed_by("p").where(f"event_type = '{P}'"))
    got = _run(spark, rows, pat,
               {"n_c": ("c", "count", "event_id"),
                "p": ("p", "first", "event_id")})
    # user 2 matches both with and without the optional click
    # (NoSkip); the with-click match sorts first — its consumed index
    # tuple (0,1,2) precedes (0,2) lexicographically
    assert got == [(1, 1, 0, 2), (2, 1, 1, 3), (2, 2, 0, 3)]


def test_within_prunes_and_times_out(spark):
    rows = [(1, 1, V, 0.0), (1, 2, P, 20.0),   # outside the window
            (2, 1, V, 0.0), (2, 2, P, 5.0)]    # inside
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .followed_by("b").where(f"event_type = '{P}'").within(10))
    got = _run(spark, rows, pat,
               {"a": ("a", "first", "event_id"),
                "b": ("b", "first", "event_id")},
               emit_timeouts=True)
    assert got == [(1, 1, 1, None, True), (2, 1, 1, 2, False)]


def test_after_match_skip_strategies(spark):
    rows = [(1, i, C, float(i)) for i in range(1, 4)]
    base = {"c1": ("c", "first", "event_id"), "c2": ("c", "last", "event_id")}
    no_skip = (CepPattern.begin("c").where(f"event_type = '{C}'")
               .times(2).consecutive())
    assert _run(spark, rows, no_skip, base) == [(1, 1, 1, 2), (1, 2, 2, 3)]
    skip_past = (CepPattern.begin("c", after_match="skip_past_last_event")
                 .where(f"event_type = '{C}'").times(2).consecutive())
    assert _run(spark, rows, skip_past, base) == [(1, 1, 1, 2)]


def test_skip_to_next_one_match_per_start(spark):
    rows = [(1, 1, V, 0.0), (1, 2, C, 1.0), (1, 3, C, 2.0)]
    pat = (CepPattern.begin("a", after_match="skip_to_next")
           .where(f"event_type = '{V}'")
           .followed_by_any("c").where(f"event_type = '{C}'"))
    got = _run(spark, rows, pat, {"c": ("c", "first", "event_id")})
    assert got == [(1, 1, 2)]


def test_malformed_patterns_rejected(spark):
    with pytest.raises(ValueError, match="last part"):
        cep_pattern_select(
            _df(spark, [(1, 1, V, 0.0)]),
            (CepPattern.begin("a").where("true")
             .not_followed_by("b").where("true")),
            ["user_id"], "ts", {"a": ("a", "first", "event_id")},
        )
    with pytest.raises(ValueError, match="optional"):
        CepPattern.begin("a").where("true").not_next("b").where("true").optional()
    with pytest.raises(ValueError, match="quantifier"):
        CepPattern.begin("a").where("true").not_next("b").where("true").times(2)
    with pytest.raises(ValueError, match="duplicate"):
        CepPattern.begin("a").where("true").followed_by("a")
    with pytest.raises(ValueError, match="within"):
        cep_pattern_select(
            _df(spark, [(1, 1, V, 0.0)]),
            CepPattern.begin("a").where("true"),
            ["user_id"], "ts", {"a": ("a", "first", "event_id")},
            emit_timeouts=True,
        )


def test_or_condition(spark):
    rows = [(1, 1, V, 0.0), (1, 2, E, 1.0), (2, 1, S, 0.0), (2, 2, E, 1.0)]
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .or_(f"event_type = '{S}'")
           .followed_by("e").where(f"event_type = '{E}'"))
    got = _run(spark, rows, pat, {"e": ("e", "first", "event_id")})
    assert got == [(1, 1, 2), (2, 1, 2)]


def test_chained_where_is_and(spark):
    """Pattern.java:174 — where().where() wraps in RichAndCondition:
    both conditions must hold. A view with event_id 1 fails the
    second conjunct; only user 2's view (event_id 2) starts a match."""
    rows = [(1, 1, V, 0.0), (1, 3, E, 1.0), (2, 2, V, 0.0), (2, 4, E, 1.0)]
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .where("event_id >= 2")
           .followed_by("e").where(f"event_type = '{E}'"))
    got = _run(spark, rows, pat, {"e": ("e", "first", "event_id")})
    assert got == [(2, 1, 4)]


def test_where_and_or_left_fold(spark):
    """where(a).where(b).or_(c) ⇒ (a AND b) OR c (the reference's
    left fold); a subsequent where(d) ANDs over the whole OR."""
    rows = [
        (1, 1, V, 0.0),   # view but id<2: fails (a AND b), not signup: dead
        (2, 2, V, 0.0),   # view, id>=2: (a AND b) holds
        (3, 1, S, 0.0),   # signup: c holds even with id<2
        (4, 2, E, 0.0),   # neither: dead
    ]
    pat = CepPattern.begin("a").where(f"event_type = '{V}'") \
        .where("event_id >= 2").or_(f"event_type = '{S}'")
    got = _run(spark, rows, pat, {"a": ("a", "first", "event_id")})
    assert got == [(2, 1, 2), (3, 1, 1)]

    # trailing where() ANDs over the accumulated OR: keep only id = 1
    pat2 = CepPattern.begin("a").where(f"event_type = '{V}'") \
        .where("event_id >= 2").or_(f"event_type = '{S}'") \
        .where("event_id = 1")
    got2 = _run(spark, rows, pat2, {"a": ("a", "first", "event_id")})
    assert got2 == [(3, 1, 1)]


# -- streaming (CepOperator.java keyed NFA state on micro-batches) ----


def _stream_batch_parity(spark, tmp_path, rows, pat, measures, cuts, tag,
                         emit_timeouts=False):
    """Replay ``rows`` split at each cut (plus a far-future sentinel
    batch firing the MAX_WATERMARK flush) and assert the streaming
    output equals the batch operator row-for-row (match_seq excluded —
    per-key emission order differs when timeouts interleave).

    Parity target: the streaming harness drops late events exactly like
    the reference CepOperator (``timestamp > lastWatermark`` guard), so
    a cut that puts a row BELOW the prior batch's max event time (0 s
    watermark delay) removes that row from the expected set too — the
    batch oracle runs per cut on the watermark-surviving subset (late =
    ts < watermark; equality survives, Spark's rule)."""
    import datetime as dt

    from flink_efo_spark.operators.cep_pattern import (
        cep_pattern_select,
        stream_cep_pattern_select,
    )
    from flink_efo_spark.streaming import run_stream_to_table

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (u, i, et, t0 + dt.timedelta(seconds=s)) for (u, i, et, s) in rows
    ]
    schema = "user_id int, event_id int, event_type string, ts timestamp"
    out_cols = [c for c in ["user_id"] + list(measures)
                + (["timed_out"] if emit_timeouts else [])]
    sentinel = [(-1, -1, "__wm__", t0 + dt.timedelta(days=9))]
    for cut in cuts:
        wm = max((r[3] for r in data[:cut]), default=None)
        survivors = data[:cut] + [
            r for r in data[cut:] if wm is None or r[3] >= wm
        ]
        want = sorted(
            tuple(r[c] for c in out_cols)
            for r in cep_pattern_select(
                spark.createDataFrame(survivors, schema), pat, ["user_id"],
                "ts", measures, tiebreak="event_id",
                emit_timeouts=emit_timeouts,
            ).collect()
        )
        src_dir = str(tmp_path / f"cep_{tag}_{cut}")
        for i, part in enumerate([data[:cut], data[cut:], sentinel]):
            spark.createDataFrame(part, schema).coalesce(1).write.parquet(
                f"{src_dir}/b{i}.parquet"
            )
        fschema = spark.read.parquet(f"{src_dir}/b0.parquet").schema
        src = (
            spark.readStream.schema(fschema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
            .withWatermark("ts", "0 seconds")
        )
        out = stream_cep_pattern_select(
            src, pat, ["user_id"], "ts", measures, tiebreak="event_id",
            emit_timeouts=emit_timeouts, flush_on_timeout=True,
            # r9: a windowless pattern + flush_on_timeout now REQUIRES
            # an explicit end-of-input marker (the dead-contract guard)
            # — day 8 sits above every real event and below the
            # sentinel's day-9 watermark that fires the timer
            end_of_input_ts=t0 + dt.timedelta(days=8),
        )
        got = sorted(
            tuple(r[c] for c in out_cols)
            for r in run_stream_to_table(out).collect()
            if r.user_id >= 0
        )
        assert got == want, f"{tag} split {cut}: {got} != {want}"


def test_stream_pattern_idle_key_keeps_partial_tail(spark, tmp_path):
    """A key idle for a whole micro-batch (other keys advance the
    watermark and fire its flush timer) must KEEP its partial-match
    anchors: the timed-out path resolves only anchors whose within
    window the watermark closed — a state.remove() there would lose
    a match spanning the gap (rows in batches 1 and 3, none in 2)."""
    import datetime as dt

    from flink_efo_spark.operators.cep_pattern import (
        CepPattern,
        stream_cep_pattern_select,
    )
    from flink_efo_spark.streaming import run_stream_to_table

    t0 = dt.datetime(2024, 1, 1)
    schema = "user_id int, event_id int, event_type string, ts timestamp"
    batches = [
        # b0: key 1 anchors a view; key 2 chatters
        [(1, 1, V, 100), (2, 90, E, 105)],
        # b1: key 1 IDLE; key 2 advances the watermark -> timer fires
        [(2, 91, E, 115)],
        # b2: the gap-spanning purchase completes key 1's match
        [(1, 2, P, 110)],
        # b3: far-future sentinel pushes the watermark past EOI
        [(-1, -9, E, 10_000)],
    ]
    src_dir = str(tmp_path / "cep_pat_idle")
    for i, part in enumerate(batches):
        rows = [
            (u, e, et, t0 + dt.timedelta(seconds=s))
            for (u, e, et, s) in part
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
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .followed_by("b").where(f"event_type = '{P}'")
           .within(60))
    out = stream_cep_pattern_select(
        src, pat, ["user_id"], "ts",
        {"view_id": ("a", "first", "event_id"),
         "purchase_id": ("b", "first", "event_id")},
        tiebreak="event_id",
        flush_on_timeout=True,
        end_of_input_ts=t0 + dt.timedelta(seconds=1000),
    )
    got = sorted(
        (r.user_id, r.view_id, r.purchase_id)
        for r in run_stream_to_table(out).collect()
        if r.user_id == 1
    )
    # the old remove-on-timeout path dropped key 1's anchored view at
    # the idle batch, so the cross-gap match never emitted
    assert got == [(1, 1, 2)], got


def test_stream_pattern_notfollowed_cross_batch(spark, tmp_path):
    rows = [
        (1, 1, V, 0), (1, 2, E, 100), (1, 3, C, 200),       # match
        (2, 1, V, 0), (2, 2, P, 100), (2, 3, C, 200),       # ban kills
        (3, 1, V, 0), (3, 2, C, 2500),                      # window expires
        (4, 1, V, 0), (4, 2, C, 500), (4, 3, P, 600),       # match (ban after)
    ]
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .not_followed_by("nb").where(f"event_type = '{P}'")
           .followed_by("c").where(f"event_type = '{C}'")
           .within(1800))
    _stream_batch_parity(
        spark, tmp_path, rows, pat,
        {"view_id": ("a", "first", "event_id"),
         "click_id": ("c", "first", "event_id")},
        cuts=(1, 2, 5, 8), tag="nf",
    )


def test_stream_pattern_timeout_cross_batch(spark, tmp_path):
    rows = [
        (1, 1, V, 0), (1, 2, P, 100),         # match inside window
        (2, 1, V, 0), (2, 2, P, 2000),        # first purchase too late
        (3, 1, V, 0), (3, 2, E, 50),          # no purchase at all
    ]
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .followed_by("b").where(f"event_type = '{P}'")
           .within(900))
    _stream_batch_parity(
        spark, tmp_path, rows, pat,
        {"view_id": ("a", "first", "event_id"),
         "purchase_id": ("b", "first", "event_id")},
        cuts=(1, 3, 4), tag="to", emit_timeouts=True,
    )


def test_stream_pattern_greedy_loop_held_across_batches(spark, tmp_path):
    # the click run crosses every cut; greedy must hold the anchor
    # open until the until() boundary arrives in a later batch
    rows = [
        (1, 1, C, 0), (1, 2, C, 10), (1, 3, C, 20),
        (1, 4, E, 30), (1, 5, P, 40),
        (2, 1, C, 0), (2, 2, P, 10), (2, 3, C, 20), (2, 4, P, 30),
    ]
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .one_or_more().greedy()
           .until(f"event_type IN ('{E}', '{P}')")
           .followed_by("p").where(f"event_type = '{P}'"))
    _stream_batch_parity(
        spark, tmp_path, rows, pat,
        {"first_click": ("c", "first", "event_id"),
         "n_clicks": ("c", "count", "event_id"),
         "purchase_id": ("p", "first", "event_id")},
        cuts=(1, 2, 4, 6, 7), tag="gl",
    )


def test_stream_pattern_rejects_cross_anchor_skip(spark):
    from flink_efo_spark.operators.cep_pattern import stream_cep_pattern_select

    with pytest.raises(ValueError, match="batch-only"):
        stream_cep_pattern_select(
            _df(spark, [(1, 1, V, 0.0)]),
            CepPattern.begin("a", after_match="skip_past_last_event")
            .where("true"),
            ["user_id"], "ts", {"a": ("a", "first", "event_id")},
        )


def test_allow_combinations_enumerates_subsets(spark):
    # SKIP_TILL_ANY inner contiguity (Pattern.java:441): the loop may
    # skip MATCHING events too, so every order-preserving click subset
    # anchored at its first element feeds the next stage
    rows = [(1, 1, C, 1.0), (1, 2, C, 2.0), (1, 3, C, 3.0), (1, 4, P, 4.0)]
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .times(2).allow_combinations()
           .followed_by("p").where(f"event_type = '{P}'"))
    got = _run(spark, rows, pat,
               {"c1": ("c", "first", "event_id"),
                "c2": ("c", "last", "event_id")})
    assert sorted((r[2], r[3]) for r in got) == [(1, 2), (1, 3), (2, 3)]


def test_times_or_more_lower_bound(spark):
    rows = [(1, 1, C, 1.0), (1, 2, C, 2.0), (1, 3, C, 3.0), (1, 4, P, 4.0)]
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .times_or_more(2).consecutive().greedy()
           .followed_by("p").where(f"event_type = '{P}'"))
    got = _run(spark, rows, pat, {"n": ("c", "count", "event_id")})
    # anchors 1 and 2 reach the >=2 bound; anchor 3 cannot
    assert sorted(r[2] for r in got) == [2, 3]


# -- iterative conditions (IterativeCondition.java ctx navigation) ----


def _vdf(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, event_id int, event_type string, ts double, value double"
    )


def test_iterative_condition_references_prior_stage(spark):
    rows = [
        (1, 1, V, 0.0, 10.0), (1, 2, P, 1.0, 5.0),   # too small — skipped
        (1, 3, P, 2.0, 25.0),                        # first > 2x the view
        (2, 1, V, 0.0, 10.0), (2, 2, P, 1.0, 15.0),  # never exceeds 2x
    ]
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .followed_by("b")
           .where(f"event_type = '{P}' AND value > 2 * last_a_value"))
    out = cep_pattern_select(
        _vdf(spark, rows), pat, ["user_id"], "ts",
        {"view_id": ("a", "first", "event_id"),
         "purchase_id": ("b", "first", "event_id")},
        tiebreak="event_id",
    )
    got = sorted((r.user_id, r.view_id, r.purchase_id) for r in out.collect())
    # SKIP_TILL_NEXT skips the non-matching small purchase and takes
    # the first one satisfying the binding-dependent condition
    assert got == [(1, 1, 3)]


def test_iterative_self_loop_ascending_run(spark):
    rows = [
        (1, 1, C, 0.0, 1.0), (1, 2, C, 1.0, 3.0), (1, 3, C, 2.0, 2.0),
        (1, 4, P, 3.0, 0.0),
    ]
    # strictly ascending consecutive click run; count_c = 0 admits the
    # first element (navigation over an empty binding is NULL)
    pat = (CepPattern.begin("c")
           .where(f"event_type = '{C}' AND "
                  "(count_c = 0 OR value > last_c_value)")
           .one_or_more().consecutive().greedy()
           .followed_by("p").where(f"event_type = '{P}'"))
    out = cep_pattern_select(
        _vdf(spark, rows), pat, ["user_id"], "ts",
        {"c1": ("c", "first", "event_id"), "n": ("c", "count", "event_id")},
        tiebreak="event_id",
    )
    got = sorted((r.c1, r.n) for r in out.collect())
    # anchor 1: [1,3] ascends then 2 breaks it; anchors 2,3: runs of
    # lengths 1 (3 not > 3's prior? 2: [3->2] not ascending) — anchor 2
    # takes [2] alone (next value 2.0 < 3.0), anchor 3 takes [3]
    assert got == [(1, 2), (2, 1), (3, 1)]


def test_iterative_rejected_on_not_stage_and_until(spark):
    with pytest.raises(ValueError, match="NOT stages"):
        cep_pattern_select(
            _vdf(spark, [(1, 1, V, 0.0, 1.0)]),
            (CepPattern.begin("a").where("true")
             .not_followed_by("nb").where("value > last_a_value")
             .followed_by("c").where("true")),
            ["user_id"], "ts", {"a": ("a", "first", "event_id")},
        )
    with pytest.raises(ValueError, match="static"):
        cep_pattern_select(
            _vdf(spark, [(1, 1, V, 0.0, 1.0)]),
            (CepPattern.begin("a").where("true").one_or_more()
             .until("value > first_a_value")),
            ["user_id"], "ts", {"a": ("a", "first", "event_id")},
        )


def test_stream_iterative_condition_cross_batch(spark, tmp_path):
    import datetime as dt

    from flink_efo_spark.operators.cep_pattern import (
        cep_pattern_select,
        stream_cep_pattern_select,
    )
    from flink_efo_spark.streaming import run_stream_to_table

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, V, 0, 10.0), (1, 2, P, 100, 5.0), (1, 3, P, 200, 25.0),
        (2, 1, V, 0, 10.0), (2, 2, P, 100, 30.0),
    ]
    data = [(u, i, et, t0 + dt.timedelta(seconds=s), v)
            for (u, i, et, s, v) in rows]
    schema = ("user_id int, event_id int, event_type string, "
              "ts timestamp, value double")
    pat = (CepPattern.begin("a").where(f"event_type = '{V}'")
           .followed_by("b")
           .where(f"event_type = '{P}' AND value > 2 * last_a_value")
           .within(900))
    measures = {"view_id": ("a", "first", "event_id"),
                "purchase_id": ("b", "first", "event_id")}
    sentinel = [(-1, -1, "__wm__", t0 + dt.timedelta(days=9), 0.0)]
    for cut in (2, 3):
        # the batch oracle runs on the watermark-surviving subset — the
        # harness drops late rows exactly like the reference CepOperator
        wm = max(r[3] for r in data[:cut])
        survivors = data[:cut] + [r for r in data[cut:] if r[3] >= wm]
        want = sorted(
            (r.user_id, r.view_id, r.purchase_id, r.timed_out)
            for r in cep_pattern_select(
                spark.createDataFrame(survivors, schema), pat, ["user_id"],
                "ts", measures, tiebreak="event_id", emit_timeouts=True,
            ).collect()
        )
        src_dir = str(tmp_path / f"cep_iter_{cut}")
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
        out = stream_cep_pattern_select(
            src, pat, ["user_id"], "ts", measures, tiebreak="event_id",
            emit_timeouts=True, flush_on_timeout=True,
        )
        got = sorted(
            (r.user_id, r.view_id, r.purchase_id, r.timed_out)
            for r in run_stream_to_table(out).collect()
            if r.user_id >= 0
        )
        assert got == want, f"iterative split {cut}: {got} != {want}"


# -- GroupPattern: quantified sub-sequences (GroupPattern.java) -------


def test_group_times_two_pairs_then_error(spark):
    rows = [(1, 1, S, 0.0), (1, 2, C, 1.0), (1, 3, V, 2.0), (1, 4, P, 3.0),
            (1, 5, C, 4.0), (1, 6, P, 5.0), (1, 7, E, 6.0)]
    body = (CepPattern.begin("b").where(f"event_type = '{C}'")
            .followed_by("c").where(f"event_type = '{P}'"))
    pat = (CepPattern.begin("a").where(f"event_type = '{S}'")
           .followed_by_group(body).times(2)
           .followed_by("d").where(f"event_type = '{E}'"))
    got = _run(spark, rows, pat,
               {"n_pairs": ("b", "count", "event_id"),
                "b1": ("b", "first", "event_id"),
                "c2": ("c", "last", "event_id"),
                "d": ("d", "first", "event_id")})
    assert got == [(1, 1, 2, 2, 6, 7)]


def test_group_one_or_more_emits_prefixes_and_greedy_suppresses(spark):
    rows = [(1, 1, S, 0.0), (1, 2, C, 1.0), (1, 3, P, 2.0),
            (1, 4, C, 3.0), (1, 5, P, 4.0), (1, 6, E, 5.0)]
    body = (CepPattern.begin("b").where(f"event_type = '{C}'")
            .followed_by("c").where(f"event_type = '{P}'"))

    def build(greedy):
        p = (CepPattern.begin("a").where(f"event_type = '{S}'")
             .followed_by_group(body).one_or_more())
        if greedy:
            p = p.greedy()
        return p.followed_by("d").where(f"event_type = '{E}'")

    meas = {"n_pairs": ("b", "count", "event_id")}
    # default: both the 1-pair prefix and the 2-pair run complete
    assert sorted(r[2] for r in _run(spark, rows, build(False), meas)) == [1, 2]
    # greedy: only the maximal run
    assert [r[2] for r in _run(spark, rows, build(True), meas)] == [2]


def test_group_strict_entry(spark):
    body = (CepPattern.begin("b").where(f"event_type = '{C}'")
            .followed_by("c").where(f"event_type = '{P}'"))
    pat = (CepPattern.begin("a").where(f"event_type = '{S}'")
           .next_group(body))
    adjacent = [(1, 1, S, 0.0), (1, 2, C, 1.0), (1, 3, P, 2.0)]
    gapped = [(1, 1, S, 0.0), (1, 2, E, 1.0), (1, 3, C, 2.0), (1, 4, P, 3.0)]
    meas = {"c": ("c", "first", "event_id")}
    assert _run(spark, adjacent, pat, meas) == [(1, 1, 3)]
    assert _run(spark, gapped, pat, meas) == []


def test_group_body_failure_kills_relaxed_entry(spark):
    # SKIP_TILL_NEXT on the group: can't skip an event matching the
    # HEAD — if the body then fails, the branch dies (stop state)
    rows = [(1, 1, S, 0.0), (1, 2, C, 1.0),           # head matches, no P
            (1, 3, C, 2.0)]                            # later head — unreachable
    body = (CepPattern.begin("b").where(f"event_type = '{C}'")
            .next("c").where(f"event_type = '{P}'"))  # strict body: fails
    pat = (CepPattern.begin("a").where(f"event_type = '{S}'")
           .followed_by_group(body))
    assert _run(spark, rows, pat, {"c": ("c", "first", "event_id")}) == []


def test_group_within_window_applies_across_elements(spark):
    rows = [(1, 1, S, 0.0), (1, 2, C, 1.0), (1, 3, P, 2.0),
            (1, 4, C, 50.0), (1, 5, P, 51.0), (1, 6, E, 52.0)]
    body = (CepPattern.begin("b").where(f"event_type = '{C}'")
            .followed_by("c").where(f"event_type = '{P}'"))
    pat = (CepPattern.begin("a").where(f"event_type = '{S}'")
           .followed_by_group(body).one_or_more().greedy()
           .followed_by("d").where(f"event_type = '{E}'")
           .within(10))
    # the second pair and the error sit outside the 10s window
    assert _run(spark, rows, pat,
                {"n": ("b", "count", "event_id")}) == []


def test_group_validation(spark):
    body = CepPattern.begin("b").where("true")
    with pytest.raises(ValueError, match="group's BODY"):
        CepPattern.begin("a").where("true").followed_by_group(body).where("x")
    with pytest.raises(ValueError, match="duplicate"):
        CepPattern.begin("b").where("true").followed_by_group(body)


def test_aggregate_measures_over_loop_rows(spark):
    rows = [(1, 1, C, 1.0, 2.0), (1, 2, C, 2.0, 4.0), (1, 3, C, 3.0, 6.0),
            (1, 4, P, 4.0, 0.0)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, event_type string, ts double, "
              "value double"
    )
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .one_or_more().consecutive().greedy()
           .followed_by("p").where(f"event_type = '{P}'"))
    out = cep_pattern_select(
        df, pat, ["user_id"], "ts",
        {"n": ("c", "count", "event_id"),
         "v_sum": ("c", "sum", "value"),
         "v_min": ("c", "min", "value"),
         "v_max": ("c", "max", "value"),
         "v_avg": ("c", "avg", "value")},
        tiebreak="event_id",
    )
    got = sorted((r.n, r.v_sum, r.v_min, r.v_max, r.v_avg)
                 for r in out.collect())
    assert got == [(1, 6.0, 6.0, 6.0, 6.0),
                   (2, 10.0, 4.0, 6.0, 5.0),
                   (3, 12.0, 2.0, 6.0, 4.0)]


def test_group_optional_and_until(spark):
    body = (CepPattern.begin("b").where(f"event_type = '{C}'")
            .followed_by("c").where(f"event_type = '{P}'"))
    # optional group: matches both with and without the pair
    pat = (CepPattern.begin("a").where(f"event_type = '{S}'")
           .followed_by_group(body).optional()
           .followed_by("d").where(f"event_type = '{E}'"))
    rows = [(1, 1, S, 0.0), (1, 2, C, 1.0), (1, 3, P, 2.0), (1, 4, E, 3.0)]
    got = _run(spark, rows, pat, {"n": ("b", "count", "event_id"),
                                  "d": ("d", "first", "event_id")})
    assert sorted((r[2], r[3]) for r in got) == [(0, 4), (1, 4)]
    # until on a group loop: the error boundary stops repetition
    pat2 = (CepPattern.begin("a").where(f"event_type = '{S}'")
            .followed_by_group(body).one_or_more().greedy()
            .until(f"event_type = '{E}'")
            .followed_by("d").where(f"event_type = '{E}'"))
    rows2 = [(1, 1, S, 0.0), (1, 2, C, 1.0), (1, 3, P, 2.0),
             (1, 4, E, 3.0), (1, 5, C, 4.0), (1, 6, P, 5.0),
             (1, 7, E, 6.0)]
    got2 = _run(spark, rows2, pat2, {"n": ("b", "count", "event_id"),
                                     "d": ("d", "first", "event_id")})
    # the loop stops at error 4 (until), d takes it; the post-error
    # pair never joins the first signup's chain
    assert sorted((r[2], r[3]) for r in got2) == [(1, 4)]


def test_stream_flush_on_timeout_requires_window_or_eoi(spark):
    """Same dead-contract guard as cep.stream_match_recognize: a
    windowless CepPattern + flush_on_timeout + no end_of_input_ts can
    never finalize, so the call raises."""
    from flink_efo_spark.operators.cep_pattern import (
        stream_cep_pattern_select,
    )

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("1 AS user_id", "CAST(value AS INT) AS event_id",
                    "'view' AS event_type", "CAST(value AS DOUBLE) AS ts")
    )
    pat = (CepPattern.begin("a").where("event_type = 'view'")
           .followed_by("c").where("event_type = 'click'"))
    with pytest.raises(ValueError, match="flush_on_timeout"):
        stream_cep_pattern_select(
            src, pat, ["user_id"], "ts",
            {"a": ("a", "first", "event_id")},
            flush_on_timeout=True,
        )
    # a within() window re-legitimizes the flag
    stream_cep_pattern_select(
        src, pat.within(100.0), ["user_id"], "ts",
        {"a": ("a", "first", "event_id")},
        flush_on_timeout=True,
    )


def test_measure_offsets_pattern_api(spark):
    """first:n / last:n logical-offset measures (FIRST(A.col, n)) on
    the Pattern API path: n-th row from either end, NULL out of
    range."""
    rows = [(1, 1, C, 1.0), (1, 2, C, 2.0), (1, 3, C, 3.0),
            (1, 4, P, 4.0)]
    pat = (CepPattern.begin("c").where(f"event_type = '{C}'")
           .one_or_more().greedy().consecutive()
           .followed_by("p").where(f"event_type = '{P}'"))
    got = _run(spark, rows, pat,
               {"c_second": ("c", "first:1", "event_id"),
                "c_penult": ("c", "last:1", "event_id"),
                "c_far": ("c", "first:9", "event_id"),
                "n": ("c", "count", "event_id")})
    full = [r for r in got if r[-1] == 3]
    # row = (user_id, match_seq, c_second, c_penult, c_far, n)
    assert [(r[2], r[3], r[4]) for r in full] == [(2, 2, None)]
