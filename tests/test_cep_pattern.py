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
