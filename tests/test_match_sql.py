"""SQL MATCH_RECOGNIZE clause (match_sql.py) — the reference's
Calcite SqlMatchRecognize surface (StreamExecMatch.scala:68) routed
through the engine matcher."""

from __future__ import annotations

import pytest


def _env(spark):
    from flink_efo_spark.session import EfoSession

    return EfoSession(spark)


def _mk(spark, rows):
    spark.createDataFrame(
        rows, "k string, seq int, et string, v double"
    ).createOrReplaceTempView("__mr_t")


def test_sql_match_recognize_full_clause(spark):
    """PARTITION/ORDER/MEASURES (FIRST/LAST/COUNT/bare/MATCH_NUMBER)
    /AFTER MATCH/PATTERN with quantifier/DEFINE in one statement."""
    _mk(
        spark,
        [
            ("u1", 1, "a", 10.0),
            ("u1", 2, "b", 2.0),
            ("u1", 3, "b", 3.0),
            ("u1", 4, "c", 9.0),
            ("u1", 5, "a", 1.0),
            ("u1", 6, "c", 2.0),
            ("u2", 1, "a", 5.0),
            ("u2", 2, "c", 6.0),
        ],
    )
    out = _env(spark).sql(
        """
        SELECT k, m, a_seq, n_b, c_val
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES MATCH_NUMBER() AS m,
                   FIRST(A.seq) AS a_seq,
                   COUNT(B.seq) AS n_b,
                   C.v AS c_val
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B* C)
          DEFINE A AS A.et = 'a',
                 B AS B.et = 'b',
                 C AS C.et = 'c'
        )
        """
    )
    got = sorted((r.k, r.m, r.a_seq, r.n_b, r.c_val) for r in out.collect())
    assert got == [
        ("u1", 1, 1, 2, 9.0),
        ("u1", 2, 5, 0, 2.0),
        ("u2", 1, 1, 0, 6.0),
    ]


def test_sql_match_recognize_skip_and_alias(spark):
    """SKIP TO NEXT ROW (overlapping matches) and the clause alias
    usable in the outer query."""
    _mk(
        spark,
        [("u1", 1, "a", 1.0), ("u1", 2, "a", 1.0), ("u1", 3, "b", 1.0)],
    )
    out = _env(spark).sql(
        """
        SELECT r.k, r.a_seq
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES FIRST(A.seq) AS a_seq
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A+ B)
          DEFINE A AS A.et = 'a', B AS B.et = 'b'
        ) AS r
        WHERE r.k = 'u1'
        """
    )
    assert sorted(r.a_seq for r in out.collect()) == [1, 2]


def test_sql_match_recognize_prev_define(spark):
    """PREV(V.col) inside DEFINE maps to the engine's prev_ columns."""
    _mk(
        spark,
        [
            ("u1", 1, "x", 1.0),
            ("u1", 2, "x", 5.0),   # up
            ("u1", 3, "x", 2.0),   # down -> D
        ],
    )
    out = _env(spark).sql(
        """
        SELECT k, d_seq FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES LAST(D.seq) AS d_seq
          PATTERN (D)
          DEFINE D AS D.v < PREV(D.v)
        )
        """
    )
    assert [r.d_seq for r in out.collect()] == [3]


def test_sql_match_recognize_errors(spark):
    _mk(spark, [("u1", 1, "a", 1.0)])
    env = _env(spark)
    with pytest.raises(ValueError, match="ALL ROWS PER MATCH"):
        env.sql(
            "SELECT * FROM __mr_t MATCH_RECOGNIZE (PARTITION BY k "
            "ORDER BY seq ALL ROWS PER MATCH PATTERN (A) DEFINE A AS A.et = 'a')"
        )
    with pytest.raises(ValueError, match="PARTITION BY"):
        env.sql(
            "SELECT * FROM __mr_t MATCH_RECOGNIZE (ORDER BY seq "
            "PATTERN (A) DEFINE A AS A.et = 'a')"
        )
    # round-9: SUM(A.v) became a supported running fold; STDDEV and
    # aggregates over non-atom arguments stay refused with the reason
    with pytest.raises(ValueError, match="unsupported MEASURES"):
        env.sql(
            "SELECT * FROM __mr_t MATCH_RECOGNIZE (PARTITION BY k "
            "ORDER BY seq MEASURES STDDEV(A.v) AS s PATTERN (A) "
            "DEFINE A AS A.et = 'a')"
        )
    with pytest.raises(ValueError, match="unsupported MEASURES"):
        env.sql(
            "SELECT * FROM __mr_t MATCH_RECOGNIZE (PARTITION BY k "
            "ORDER BY seq MEASURES SUM(A.v + 1) AS s PATTERN (A) "
            "DEFINE A AS A.et = 'a')"
        )


def test_sql_two_clauses_differ_only_in_measures(spark):
    """Two MATCH_RECOGNIZE clauses in ONE statement that differ only
    in MEASURES must resolve to DIFFERENT temp views — the view name
    keys on every clause input, not just (src, pattern, defines)
    (round-5 ADVICE: the old hash collided and both aliases read the
    second clause's result)."""
    _mk(
        spark,
        [
            ("u1", 1, "a", 10.0),
            ("u1", 2, "b", 2.0),
            ("u1", 3, "c", 9.0),
        ],
    )
    out = _env(spark).sql(
        """
        SELECT m1.k, m1.a_seq, m2.c_val
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES FIRST(A.seq) AS a_seq
          PATTERN (A B C)
          DEFINE A AS A.et = 'a', B AS B.et = 'b', C AS C.et = 'c'
        ) AS m1
        JOIN __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES C.v AS c_val
          PATTERN (A B C)
          DEFINE A AS A.et = 'a', B AS B.et = 'b', C AS C.et = 'c'
        ) AS m2
        ON m1.k = m2.k
        """
    )
    got = [(r.k, r.a_seq, r.c_val) for r in out.collect()]
    assert got == [("u1", 1, 9.0)]


def test_sql_first_last_in_define(spark):
    """FIRST(V.col)/LAST(V.col) in the DEFINE clause parse to the
    engine's navigation pseudo-references and match the hand-computed
    binding-dependent result."""
    _mk(
        spark,
        [
            ("u1", 1, "a", 10.0),
            ("u1", 2, "b", 12.0),
            ("u1", 3, "b", 15.0),
            ("u1", 4, "c", 1.0),
        ],
    )
    out = _env(spark).sql(
        """
        SELECT k, n_b, last_b FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES COUNT(B.seq) AS n_b, LAST(B.seq) AS last_b
          PATTERN (A B+ C)
          DEFINE A AS A.et = 'a',
                 B AS B.et = 'b' AND B.v > FIRST(A.v),
                 C AS C.et = 'c'
        )
        """
    )
    assert [(r.k, r.n_b, r.last_b) for r in out.collect()] == [("u1", 2, 3)]


def test_sql_measures_compound_expressions(spark):
    """Round-9: MEASURES scalar expressions over navigation atoms —
    arithmetic across variables, COALESCE over an UNMATCHED optional
    variable (NULL atom, the reference's generated-code semantics),
    CASE, MATCH_NUMBER() arithmetic. Atoms come out of the matcher;
    the expressions run as one Catalyst projection."""
    _mk(
        spark,
        [
            ("u1", 1, "a", 10.0),
            ("u1", 2, "b", 2.0),
            ("u1", 3, "b", 3.0),
            ("u1", 4, "c", 9.0),
            ("u1", 5, "a", 1.0),
            ("u1", 6, "c", 2.0),
        ],
    )
    out = _env(spark).sql(
        """
        SELECT k, delta, b_or_a, kind, m2
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES LAST(C.v) - FIRST(A.v) AS delta,
                   COALESCE(LAST(B.v), A.v) AS b_or_a,
                   CASE WHEN COUNT(B.seq) > 0 THEN 'with_b'
                        ELSE 'no_b' END AS kind,
                   MATCH_NUMBER() * 10 AS m2
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B* C)
          DEFINE A AS A.et = 'a',
                 B AS B.et = 'b',
                 C AS C.et = 'c'
        )
        """
    )
    got = sorted(tuple(r) for r in out.collect())
    # match 1: A=seq1(10.0) B=2,3(last 3.0) C=seq4(9.0)
    # match 2: A=seq5(1.0) B unmatched -> COALESCE falls to A.v, C=seq6
    assert got == [
        ("u1", -1.0, 3.0, "with_b", 10),
        ("u1", 1.0, 1.0, "no_b", 20),
    ]
    # hidden atom columns must not leak into the output schema
    assert not [c for c in out.columns if c.startswith("__mr_e")]


def test_sql_measures_mixed_simple_and_compound(spark):
    """Simple atoms keep their direct engine mapping when a compound
    item is present; output column order follows the MEASURES list."""
    _mk(spark, [("u1", 1, "a", 4.0), ("u1", 2, "c", 6.0)])
    out = _env(spark).sql(
        """
        SELECT * FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES FIRST(A.v) AS a_v,
                   (LAST(C.v) + FIRST(A.v)) / 2 AS mid
          PATTERN (A C)
          DEFINE A AS A.et = 'a', C AS C.et = 'c'
        )
        """
    )
    rows = out.collect()
    assert out.columns == ["k", "match_seq", "a_v", "mid"]
    assert [(r.a_v, r.mid) for r in rows] == [(4.0, 5.0)]


def test_sql_measures_first_last_offsets(spark):
    """FIRST(V.col, n) / LAST(V.col, n) logical row offsets (the
    reference's n-th-row navigation): in-range offsets pick the n-th
    row from either end, out-of-range yields NULL, and offsets on
    non-navigation functions are refused."""
    _mk(
        spark,
        [
            ("u1", 1, "a", 4.0),
            ("u1", 2, "b", 10.0),
            ("u1", 3, "b", 20.0),
            ("u1", 4, "b", 30.0),
            ("u1", 5, "c", 6.0),
        ],
    )
    out = _env(spark).sql(
        """
        SELECT k, b1, bl1, b9, span
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES FIRST(B.v, 1) AS b1,
                   LAST(B.v, 1) AS bl1,
                   FIRST(B.v, 9) AS b9,
                   LAST(B.v, 1) - FIRST(B.v, 1) AS span
          PATTERN (A B* C)
          DEFINE A AS A.et = 'a', B AS B.et = 'b', C AS C.et = 'c'
        )
        """
    )
    got = [tuple(r) for r in out.collect()]
    # B rows are v=10,20,30: first offset 1 -> 20, last offset 1 -> 20,
    # offset 9 out of range -> NULL
    assert got == [("u1", 20.0, 20.0, None, 0.0)]
    with pytest.raises(ValueError, match="offset"):
        _env(spark).sql(
            """
            SELECT * FROM __mr_t MATCH_RECOGNIZE (
              PARTITION BY k ORDER BY seq
              MEASURES SUM(B.v, 1) AS x
              PATTERN (A B* C)
              DEFINE A AS A.et = 'a', B AS B.et = 'b', C AS C.et = 'c'
            )
            """
        )


def test_sql_define_running_aggregates(spark):
    """Running aggregates over the in-progress binding inside DEFINE
    (the reference's `B AS SUM(B.price) < 30` MatchRecognizeITCase
    family): the loop admits rows only while the running sum stays
    within bound; COUNT caps run length."""
    _mk(
        spark,
        [
            ("u1", 1, "a", 0.0),
            ("u1", 2, "b", 10.0),
            ("u1", 3, "b", 15.0),
            ("u1", 4, "b", 99.0),   # would push SUM over 30 -> stops B
            ("u1", 5, "c", 1.0),
        ],
    )
    out = _env(spark).sql(
        """
        SELECT k, n_b, s_b
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES COUNT(B.seq) AS n_b, SUM(B.v) AS s_b
          PATTERN (A B* C)
          DEFINE A AS A.et = 'a',
                 B AS B.et = 'b' AND SUM(B.v) <= 30,
                 C AS C.et = 'c'
        )
        """
    )
    # B admits v=10 (sum 10) and v=15 (sum 25); v=99 would make 124.
    # With B* reluctant-free greedy semantics the match still needs C,
    # and row 4 fails B's define, so the b-run is rows 2,3 only --
    # but then row 4 ('b') must match C ('c') which it does not, so
    # the anchor resolves with B = rows 2,3 only if C can follow later
    got = [tuple(r) for r in out.collect()]
    assert got == []  # row 4 blocks A..C contiguity: no match

    # drop the blocker: now the capped run matches through to C
    _mk(
        spark,
        [
            ("u1", 1, "a", 0.0),
            ("u1", 2, "b", 10.0),
            ("u1", 3, "b", 15.0),
            ("u1", 4, "c", 1.0),
        ],
    )
    out2 = _env(spark).sql(
        """
        SELECT k, n_b, s_b
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES COUNT(B.seq) AS n_b, SUM(B.v) AS s_b
          PATTERN (A B* C)
          DEFINE A AS A.et = 'a',
                 B AS B.et = 'b' AND SUM(B.v) <= 20,
                 C AS C.et = 'c'
        )
        """
    )
    # SUM cap 20 admits only v=10 (sum 10; adding 15 -> 25 > 20), so
    # the b-run is row 2 alone -- but row 3 is 'b', breaking strict
    # contiguity to C: no match either. Cap 30 admits both:
    got2 = [tuple(r) for r in out2.collect()]
    assert got2 == []
    out3 = _env(spark).sql(
        """
        SELECT k, n_b, s_b
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES COUNT(B.seq) AS n_b, SUM(B.v) AS s_b
          PATTERN (A B* C)
          DEFINE A AS A.et = 'a',
                 B AS B.et = 'b' AND SUM(B.v) <= 30,
                 C AS C.et = 'c'
        )
        """
    )
    assert [tuple(r) for r in out3.collect()] == [("u1", 2, 25.0)]


def test_sql_measures_running_folds(spark):
    """Round-9: SUM/MIN/MAX/AVG(V.col) running folds — simple form
    and inside compound expressions (the reference's running
    aggregates over a quantified variable's rows)."""
    _mk(
        spark,
        [
            ("u1", 1, "a", 10.0),
            ("u1", 2, "b", 2.0),
            ("u1", 3, "b", 4.0),
            ("u1", 4, "c", 9.0),
        ],
    )
    out = _env(spark).sql(
        """
        SELECT k, s, lo, hi, mean, share
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES SUM(B.v) AS s,
                   MIN(B.v) AS lo,
                   MAX(B.v) AS hi,
                   AVG(B.v) AS mean,
                   SUM(B.v) / (FIRST(A.v) + LAST(C.v)) AS share
          PATTERN (A B+ C)
          DEFINE A AS A.et = 'a', B AS B.et = 'b', C AS C.et = 'c'
        )
        """
    )
    got = [tuple(r) for r in out.collect()]
    assert got == [("u1", 6.0, 2.0, 4.0, 3.0, 6.0 / 19.0)]


def test_sql_measures_classifier(spark):
    """CLASSIFIER() (FlinkSqlOperatorTable.java:995): the name of the
    variable matching the final row. The alternation-tail pattern
    makes it differ per match; the compound case routes through a
    hidden atom + Catalyst projection."""
    _mk(
        spark,
        [
            ("u1", 1, "a", 10.0),
            ("u1", 2, "b", 2.0),   # match 1 ends on B
            ("u1", 3, "a", 1.0),
            ("u1", 4, "c", 9.0),   # match 2 ends on C
            ("u2", 1, "a", 5.0),
            ("u2", 2, "b", 6.0),   # ends on B
        ],
    )
    out = _env(spark).sql(
        """
        SELECT k, m, who, tagged
        FROM __mr_t MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES MATCH_NUMBER() AS m,
                   CLASSIFIER() AS who,
                   concat(CLASSIFIER(), ':', cast(FIRST(A.seq) as string))
                     AS tagged
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A (B|C))
          DEFINE A AS A.et = 'a',
                 B AS B.et = 'b',
                 C AS C.et = 'c'
        )
        """
    )
    got = sorted((r.k, r.m, r.who, r.tagged) for r in out.collect())
    assert got == [
        ("u1", 1, "B", "B:1"),
        ("u1", 2, "C", "C:3"),
        ("u2", 1, "B", "B:1"),
    ]
    assert dict(out.dtypes)["who"] == "string"


def test_api_measures_classifier(spark):
    """Engine-level classifier measure: quantified tail — the last
    matched row belongs to the quantified variable."""
    from flink_efo_spark.operators.cep import match_recognize

    df = spark.createDataFrame(
        [
            ("u1", 1, "a", 1.0),
            ("u1", 2, "b", 2.0),
            ("u1", 3, "b", 3.0),
            ("u1", 4, "a", 4.0),   # second match: bare A (B*)
        ],
        "k string, seq int, et string, v double",
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by="seq",
        pattern="A B*",
        defines={"A": "et = 'a'", "B": "et = 'b'"},
        measures={
            "who": ("", "classifier", ""),
            "a_seq": ("A", "first", "seq"),
        },
    )
    got = sorted((r.who, r.a_seq) for r in out.collect())
    assert got == [("A", 4), ("B", 1)]
