"""Differential property tests for the CEP Pattern enumerator.

An INDEPENDENT brute-force oracle states each consuming strategy's
semantics declaratively (subset enumeration + validity predicates —
no shared code with the recursive backtracker) and hypothesis drives
random small event sequences through both. Mirrors the reference's
NFAITCase randomized coverage (flink-cep/src/test/.../nfa/NFAITCase.java).
Runs engine-side on the raw enumerator (no Spark session needed)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_efo_spark.operators.cep_pattern import (
    CepPattern,
    _enumerate_key,
)

BOOLS = st.lists(st.booleans(), min_size=3, max_size=8)


def _mk(n, picks):
    a = np.zeros(n, dtype=bool)
    for p in picks:
        a[p % n] = True
    return a


def _brute_two_stage(n, ts, fa, fb, fn_, strat, win, use_not):
    """Declarative A (notFollowedBy N)? -> B semantics."""
    out = set()
    for i in range(n):
        if not fa[i]:
            continue
        if strat == "strict":
            js = [i + 1] if i + 1 < n and fb[i + 1] else []
        else:
            js = [k for k in range(i + 1, n) if fb[k]]
            if strat == "skip_till_next":
                js = js[:1]
        for j in js:
            if win is not None and ts[j] - ts[i] > win:
                continue
            # a skipped-past ban event kills the waiting branch even
            # when it also matches B — only the branch that CONSUMES
            # it survives (NFA stop state vs take edge)
            if use_not and any(fn_[k] for k in range(i + 1, j)):
                continue
            out.add((i, j))
    return out


def _brute_loop(n, ts, fa, funtil, fb, lo, hi, inner, greedy, win):
    """Declarative A{lo,hi;inner}(until)? followedBy B semantics:
    enumerate every element tuple by its contiguity rule, attach the
    SKIP_TILL_NEXT B continuation, then apply the greedy suppression
    rule (drop a match if a completing proper prefix-extension
    exists)."""
    complete = set()
    for i in range(n):
        if not fa[i]:
            continue
        elems_list = []

        def gen(elems):
            if len(elems) >= lo:
                elems_list.append(tuple(elems))
            if hi is not None and len(elems) >= hi:
                return
            last = elems[-1]
            for k in range(last + 1, n):
                if win is not None and ts[k] - ts[i] > win:
                    break
                if funtil is not None and funtil[k]:
                    break
                if inner == "strict" and k != last + 1:
                    break
                if fa[k]:
                    gen(elems + [k])
                    if inner != "skip_till_any":
                        break
                elif inner == "strict":
                    break

        gen([i])
        for E in elems_list:
            last = E[-1]
            js = [k for k in range(last + 1, n) if fb[k]][:1]
            for j in js:
                if win is not None and ts[j] - ts[i] > win:
                    continue
                complete.add((i, E, j))
    if greedy:
        complete = {
            (i, E, j)
            for (i, E, j) in complete
            if not any(
                i2 == i and len(E2) > len(E) and E2[: len(E)] == E
                for (i2, E2, _j2) in complete
            )
        }
    return complete


def _engine(stages_pat, n, ts, flags, untils, win):
    stages = stages_pat._validated()
    matches, _ = _enumerate_key(
        n, ts, flags, untils, stages, win, False
    )
    return matches


@given(
    a=BOOLS,
    picks_b=st.lists(st.integers(0, 20), max_size=6),
    picks_n=st.lists(st.integers(0, 20), max_size=4),
    strat=st.sampled_from(["strict", "skip_till_next", "skip_till_any"]),
    use_not=st.booleans(),
    win=st.sampled_from([None, 1, 2, 4]),
)
@settings(max_examples=250, deadline=None)
def test_two_stage_strategies_match_brute_force(
    a, picks_b, picks_n, strat, use_not, win
):
    n = len(a)
    fa = np.array(a, dtype=bool)
    fb = _mk(n, picks_b)
    fn_ = _mk(n, picks_n)
    ts = np.arange(n, dtype="int64")

    pat = CepPattern.begin("a").where("x")
    if use_not:
        pat = pat.not_followed_by("nb").where("x")
    if strat == "strict":
        pat = pat.next("b").where("x")
    elif strat == "skip_till_next":
        pat = pat.followed_by("b").where("x")
    else:
        pat = pat.followed_by_any("b").where("x")
    if win is not None:
        pat = pat.within(win)

    flags = [fa] + ([fn_] if use_not else []) + [fb]
    untils = [None] * len(flags)
    got = {
        (m[2]["a"][0], m[2]["b"][0])
        for m in _engine(pat, n, ts, flags, untils, win)
    }
    want = _brute_two_stage(n, ts, fa, fb, fn_, strat, win, use_not)
    assert got == want


@given(
    a=BOOLS,
    picks_b=st.lists(st.integers(0, 20), max_size=5),
    picks_u=st.lists(st.integers(0, 20), max_size=3),
    lo=st.integers(1, 3),
    extra=st.integers(0, 2),
    unbounded=st.booleans(),
    inner=st.sampled_from(["strict", "skip_till_next", "skip_till_any"]),
    greedy=st.booleans(),
    use_until=st.booleans(),
    win=st.sampled_from([None, 2, 5]),
)
@settings(max_examples=250, deadline=None)
def test_loop_quantifiers_match_brute_force(
    a, picks_b, picks_u, lo, extra, unbounded, inner, greedy, use_until, win
):
    n = len(a)
    fa = np.array(a, dtype=bool)
    fb = _mk(n, picks_b)
    fu = _mk(n, picks_u)
    ts = np.arange(n, dtype="int64")
    hi = None if unbounded else lo + extra

    pat = CepPattern.begin("c").where("x")
    pat = pat.times_or_more(lo) if hi is None else pat.times(lo, hi)
    if inner == "strict":
        pat = pat.consecutive()
    elif inner == "skip_till_any":
        pat = pat.allow_combinations()
    if greedy:
        pat = pat.greedy()
    if use_until:
        pat = pat.until("x")
    pat = pat.followed_by("p").where("x")
    if win is not None:
        pat = pat.within(win)

    flags = [fa, fb]
    untils = [fu if use_until else None, None]
    got = {
        (m[2]["c"][0], tuple(m[2]["c"]), m[2]["p"][0])
        for m in _engine(pat, n, ts, flags, untils, win)
    }
    want = _brute_loop(
        n, ts, fa, fu if use_until else None, fb, lo, hi, inner, greedy, win
    )
    assert got == want


def _brute_group(n, ts, fb, fc, fd, lo, hi, inner, greedy, win):
    """Declarative GroupPattern semantics: (b followedBy c){lo,hi}
    followedBy d, anchored at the first b. An element is (j_b, j_c)
    with j_c the FIRST c after j_b (relaxed body; a body failure on a
    head-matching entry kills the branch unless inner is
    skip_till_any, which may skip matching heads)."""
    complete = set()
    for i in range(n):
        if not fb[i]:
            continue

        def in_win(k):
            return win is None or ts[k] - ts[i] <= win

        def body(j_b):
            for k in range(j_b + 1, n):
                if not in_win(k):
                    return None
                if fc[k]:
                    return k
            return None

        seqs = []

        def gen(elems, prev_end):
            if len(elems) >= lo:
                seqs.append(tuple(elems))
            if hi is not None and len(elems) >= hi:
                return
            # next element entry per inner contiguity
            cands = []
            for k in range(prev_end + 1, n):
                if not in_win(k):
                    break
                if inner == "strict" and k != prev_end + 1:
                    break
                if fb[k]:
                    cands.append(k)
                    if inner != "skip_till_any":
                        break
                elif inner == "strict":
                    break
            for j_b in cands:
                j_c = body(j_b)
                if j_c is not None:
                    gen(elems + [(j_b, j_c)], j_c)
                # relaxed/strict: a head-matching entry whose body
                # fails stops the loop (can't be skipped) — cands had
                # only one entry anyway

        e0 = body(i)
        if e0 is None:
            continue
        gen([(i, e0)], e0)
        for E in seqs:
            last = E[-1][1]
            ds = [k for k in range(last + 1, n) if fd[k]][:1]
            for d in ds:
                if in_win(d):
                    complete.add((i, E, d))
    if greedy:
        complete = {
            (i, E, d)
            for (i, E, d) in complete
            if not any(
                i2 == i and len(E2) > len(E) and E2[: len(E)] == E
                for (i2, E2, _d2) in complete
            )
        }
    return complete


@given(
    b=BOOLS,
    picks_c=st.lists(st.integers(0, 20), max_size=6),
    picks_d=st.lists(st.integers(0, 20), max_size=4),
    lo=st.integers(1, 2),
    extra=st.integers(0, 1),
    unbounded=st.booleans(),
    inner=st.sampled_from(["strict", "skip_till_next", "skip_till_any"]),
    greedy=st.booleans(),
    win=st.sampled_from([None, 3, 6]),
)
@settings(max_examples=250, deadline=None)
def test_group_pattern_matches_brute_force(
    b, picks_c, picks_d, lo, extra, unbounded, inner, greedy, win
):
    n = len(b)
    fb = np.array(b, dtype=bool)
    fc = _mk(n, picks_c)
    fd = _mk(n, picks_d)
    ts = np.arange(n, dtype="int64")
    hi = None if unbounded else lo + extra

    body = (CepPattern.begin("b").where("x")
            .followed_by("c").where("x"))
    pat = CepPattern.begin_group(body)
    pat = pat.times_or_more(lo) if hi is None else pat.times(lo, hi)
    if inner == "strict":
        pat = pat.consecutive()
    elif inner == "skip_till_any":
        pat = pat.allow_combinations()
    if greedy:
        pat = pat.greedy()
    pat = pat.followed_by("d").where("x")
    if win is not None:
        pat = pat.within(win)

    stages = pat._validated()
    flags = [fb, fc, fd]  # slot order: b, c, d
    matches, _ = _enumerate_key(n, ts, flags, [], stages, win, False)
    got = {
        (m[2]["b"][0],
         tuple(zip(m[2]["b"], m[2]["c"])),
         m[2]["d"][0])
        for m in matches
    }
    want = _brute_group(n, ts, fb, fc, fd, lo, hi, inner, greedy, win)
    assert got == want
