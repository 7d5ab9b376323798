"""flink-cep Pattern API analog — the library surface that is NOT
expressible in MATCH_RECOGNIZE.

The reference ships a standalone CEP library
(flink-libraries/flink-cep) whose fluent ``Pattern`` builder
(pattern/Pattern.java:129 ``begin``, :262 ``next``, :273 ``notNext``,
:291 ``followedBy``, :304 ``notFollowedBy``, :322 ``followedByAny``,
:333 ``optional``, :352 ``oneOrMore``, :367 ``greedy``, :382/:400
``times``, :420 ``timesOrMore``, :441 ``allowCombinations``, :480
``consecutive``, :220 ``until``, :245 ``within``) compiles to an NFA
(nfa/compiler/NFACompiler.java) with five consuming strategies
(pattern/Quantifier.java ``ConsumingStrategy``: STRICT,
SKIP_TILL_NEXT, SKIP_TILL_ANY, NOT_NEXT, NOT_FOLLOW). Negative
patterns (``notNext`` / ``notFollowedBy``) and timed-out-partial-match
output (PatternTimeoutFunction.java, fired when the ``within`` window
expires — NFA.java ``advanceTime`` pruning) have NO MATCH_RECOGNIZE
equivalent, so this module is a separate engine path rather than a
rewrite onto :mod:`flink_efo_spark.operators.cep`.

Spark-first shape: every stage condition (and ``until``) is a Spark
SQL boolean expression evaluated JVM-side into a flag column —
whole-stage-codegen, touching each row once — and only the boolean
flags plus the measure columns reach the Python side. The per-key
match enumeration runs inside ``applyInPandas`` over index arrays
(Arrow-batched, no per-row Python UDF). At 100 TB the plan is one
hash shuffle on the partition key; per-key state is the key's event
buffer, the same bound the reference's keyed NFA holds in RocksDB.

Semantics notes (each mirrors a documented reference rule):

* ``notFollowedBy`` may not end a pattern (NFACompiler.java:151
  throws MalformedPatternException) and NOT patterns accept no
  quantifier (Quantifier.java:102 forbids optional; looping NOTs are
  rejected by Pattern.java's quantifier guards).
* A ban from ``notFollowedBy(B)`` applies to events STRICTLY between
  the previous consumed event and the next consumed one. An event
  matching both the ban and the following stage's condition can be
  CONSUMED by the stage (its take edge fires), but any branch that
  skips past it dies — the stop state prunes waiting branches, so
  under followedByAny no later alternative survives such an event.
* ``followedBy`` = SKIP_TILL_NEXT: non-matching events are skipped
  but a matching event cannot be skipped, so the FIRST match is the
  only continuation. ``followedByAny`` = SKIP_TILL_ANY branches on
  every later match.
* Looping stages default to emitting every prefix length >= lo (the
  documented a b+ -> {a b1}, {a b1 b2} behavior); ``greedy()``
  suppresses a shorter prefix whenever the longer one still completes
  the whole pattern.
* Timeouts exist only under ``within``: a partial match is reported
  timed-out when the window expires before completion (bounded input
  ends with a MAX_WATERMARK flush, so end-of-input also expires every
  open window — CEPOperator's final watermark handling).

GroupPattern (``Pattern.begin(Pattern)`` — pattern/GroupPattern.java,
quantified SUB-SEQUENCES) is supported via ``begin_group`` /
``followed_by_group`` / ``next_group`` / ``followed_by_any_group``:
an element of a quantified group is a full body match, entered
through the group's consuming strategy on the body HEAD (exactly how
NFACompiler inlines a group), and repetitions follow the group's
inner contiguity / until / greedy rules.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, BooleanType

__all__ = ["CepPattern", "cep_pattern_select", "stream_cep_pattern_select"]


def _bool_col(series) -> "object":
    """NA→False bool ndarray, avoiding pandas' ``fillna`` object-dtype
    downcasting path (deprecated in 2.2, behavior flips in 3.0)."""
    import numpy as np
    import pandas as pd

    arr = series.to_numpy()
    if arr.dtype == bool:
        return arr
    return np.where(pd.isna(arr), False, arr).astype(bool)

# consuming strategies (pattern/Quantifier.java ConsumingStrategy)
_STRICT = "strict"            # next()
_RELAXED = "skip_till_next"   # followedBy()
_ANY = "skip_till_any"        # followedByAny()
_NOT_NEXT = "not_next"        # notNext()
_NOT_FOLLOW = "not_follow"    # notFollowedBy()


@dataclass
class _Stage:
    name: str
    strategy: str
    # [(op, sql_bool)] left-folded by _cond_expr: the first op is
    # ignored, "AND" entries come from where() (RichAndCondition),
    # "OR" entries from or_() (RichOrCondition) — Pattern.java:174,190
    conds: list[tuple[str, str]] = field(default_factory=list)
    lo: int = 1
    hi: int | None = 1          # None = unbounded
    inner: str = _RELAXED       # loop contiguity: strict|skip_till_next|skip_till_any
    greedy: bool = False
    optional: bool = False
    until: str | None = None
    group: list | None = None   # GroupPattern body (sub-stages)
    slot: int | None = None     # flag-column index (condition stages)
    uslot: int | None = None    # until-column index

    @property
    def is_not(self) -> bool:
        return self.strategy in (_NOT_NEXT, _NOT_FOLLOW)


def _cond_expr(conds: list[tuple[str, str]]) -> str:
    """Fold a stage's condition chain into one SQL boolean, exactly
    the reference's left fold (Pattern.java where():174 wraps the
    current condition in RichAndCondition, or():190 in
    RichOrCondition): ``where(a).where(b).or_(c)`` ⇒
    ``((a) AND (b)) OR (c)`` and a later ``where(d)`` ANDs over the
    whole accumulated expression."""
    expr = f"({conds[0][1]})"
    for op, c in conds[1:]:
        expr = f"({expr} {op} ({c}))"
    return expr


def _flatten(stages) -> list["_Stage"]:
    """Depth-first list of condition-bearing stages (group bodies
    inlined; group shells excluded — they carry no condition)."""
    out = []
    for s in stages:
        if s.group is not None:
            out.extend(_flatten(s.group))
        else:
            out.append(s)
    return out


def _until_stages(stages) -> list["_Stage"]:
    out = []
    for s in stages:
        if s.until is not None:
            out.append(s)
        if s.group is not None:
            out.extend(_until_stages(s.group))
    return out


def _min_rows(stages) -> int:
    """Rows a minimal completion can consume (probe padding bound)."""
    return sum(
        0 if s.is_not
        else max(s.lo, 1) * (_min_rows(s.group) if s.group else 1)
        for s in stages
    )


def _head(st: "_Stage") -> "_Stage":
    """The stage whose condition gates an element's FIRST event —
    NFACompiler applies the group's consuming strategy to the head of
    the compiled body."""
    s = st
    while s.group is not None:
        s = s.group[0]
    return s


class CepPattern:
    """Fluent builder mirroring pattern/Pattern.java. Conditions are
    Spark SQL boolean expressions over the input's columns (the
    reference's SimpleCondition); they may also navigate the
    in-progress binding via ``first_<stage>_<col>`` /
    ``last_<stage>_<col>`` / ``count_<stage>`` pseudo-columns — the
    IterativeCondition surface (IterativeCondition.java ``filter(
    event, ctx)`` with ``ctx.getEventsForPattern``), evaluated
    matcher-side per candidate (see :func:`_dynamic_specs`)."""

    def __init__(self, stages: list[_Stage], within_s: float | None = None,
                 after_match: str = "no_skip"):
        self._stages = stages
        self._within = within_s
        self._after_match = after_match

    # -- construction -------------------------------------------------
    @staticmethod
    def begin(name: str, after_match: str = "no_skip") -> "CepPattern":
        """Pattern.java:129; ``after_match`` ∈ no_skip | skip_to_next |
        skip_past_last_event | skip_to_first:<stage> | skip_to_last:<stage>
        (aftermatch/AfterMatchSkipStrategy.java)."""
        return CepPattern([_Stage(name, _RELAXED)], after_match=after_match)

    def _append(self, name: str, strategy: str) -> "CepPattern":
        if any(s.name == name for s in self._stages):
            raise ValueError(f"duplicate pattern name {name!r} "
                             "(NFACompiler checkPatternNameUniqueness)")
        return CepPattern(self._stages + [_Stage(name, strategy)],
                          self._within, self._after_match)

    def next(self, name: str) -> "CepPattern":
        return self._append(name, _STRICT)

    def followed_by(self, name: str) -> "CepPattern":
        return self._append(name, _RELAXED)

    def followed_by_any(self, name: str) -> "CepPattern":
        return self._append(name, _ANY)

    def not_next(self, name: str) -> "CepPattern":
        return self._append(name, _NOT_NEXT)

    def not_followed_by(self, name: str) -> "CepPattern":
        return self._append(name, _NOT_FOLLOW)

    # -- group patterns (GroupPattern.java:494-542: quantifiable
    # sub-sequences; the group's consuming strategy gates its head) --
    @staticmethod
    def begin_group(sub: "CepPattern",
                    after_match: str = "no_skip") -> "CepPattern":
        return CepPattern(
            [_Stage("__grp0", _RELAXED, group=list(sub._stages))],
            sub._within, after_match,
        )

    def _append_group(self, sub: "CepPattern", strategy: str) -> "CepPattern":
        names = {f.name for f in _flatten(self._stages)} | {
            s.name for s in self._stages
        }
        for f in _flatten(sub._stages):
            if f.name in names:
                raise ValueError(f"duplicate pattern name {f.name!r} "
                                 "(NFACompiler checkPatternNameUniqueness)")
        g = _Stage(f"__grp{len(self._stages)}", strategy,
                   group=list(sub._stages))
        return CepPattern(self._stages + [g], self._within,
                          self._after_match)

    def followed_by_group(self, sub: "CepPattern") -> "CepPattern":
        return self._append_group(sub, _RELAXED)

    def next_group(self, sub: "CepPattern") -> "CepPattern":
        return self._append_group(sub, _STRICT)

    def followed_by_any_group(self, sub: "CepPattern") -> "CepPattern":
        return self._append_group(sub, _ANY)

    # -- stage modifiers (apply to the last stage) --------------------
    def _mod(self, **kw) -> "CepPattern":
        stages = [
            _Stage(**{**vars(s)}) for s in self._stages
        ]
        last = stages[-1]
        for k, v in kw.items():
            setattr(last, k, v)
        return CepPattern(stages, self._within, self._after_match)

    def _cond(self, op: str, cond: str) -> "CepPattern":
        if self._stages[-1].group is not None:
            raise ValueError("conditions attach to a group's BODY stages, "
                             "not the group itself (GroupPattern.java)")
        return self._mod(conds=self._stages[-1].conds + [(op, cond)])

    def where(self, cond: str) -> "CepPattern":
        """Pattern.java:174 — chained where() calls AND together
        (RichAndCondition over the accumulated condition)."""
        return self._cond("AND", cond)

    def or_(self, cond: str) -> "CepPattern":
        """Pattern.java:190 — or_() ORs against the accumulated
        condition (RichOrCondition), so ``where(a).where(b).or_(c)``
        is ``(a AND b) OR c``."""
        return self._cond("OR", cond)

    def _quantify(self, lo: int, hi: int | None) -> "CepPattern":
        if self._stages[-1].is_not:
            raise ValueError("NOT patterns accept no quantifier "
                             "(Quantifier.java looping/times guards)")
        return self._mod(lo=lo, hi=hi)

    def one_or_more(self) -> "CepPattern":
        return self._quantify(1, None)

    def times(self, lo: int, hi: int | None = None) -> "CepPattern":
        return self._quantify(lo, lo if hi is None else hi)

    def times_or_more(self, lo: int) -> "CepPattern":
        return self._quantify(lo, None)

    def optional(self) -> "CepPattern":
        if self._stages[-1].is_not:
            raise ValueError("NOT pattern cannot be optional "
                             "(Quantifier.java:102)")
        return self._mod(optional=True)

    def greedy(self) -> "CepPattern":
        return self._mod(greedy=True)

    def consecutive(self) -> "CepPattern":
        return self._mod(inner=_STRICT)

    def allow_combinations(self) -> "CepPattern":
        return self._mod(inner=_ANY)

    def until(self, cond: str) -> "CepPattern":
        return self._mod(until=cond)

    def within(self, seconds: float) -> "CepPattern":
        return CepPattern(self._stages, float(seconds), self._after_match)

    # -- validation (NFACompiler.compileFactory) ----------------------
    def _validated(self) -> list[_Stage]:
        stages = self._stages

        def check(seq_l, top):
            if not seq_l:
                raise ValueError("empty pattern/group body")
            if seq_l[-1].strategy == _NOT_FOLLOW:
                raise ValueError(
                    "NotFollowedBy is not supported as a last part of a "
                    "Pattern! (NFACompiler.java:151)"
                )
            if seq_l[0].is_not:
                raise ValueError("a pattern/group begins with a consuming "
                                 "stage, not a NOT stage")
            for s in seq_l:
                if s.group is not None:
                    check(s.group, False)
                elif not s.conds:
                    raise ValueError(
                        f"stage {s.name!r} has no where() condition"
                    )
                if s.lo < 0 or (s.hi is not None and s.hi < s.lo):
                    raise ValueError(
                        f"stage {s.name!r}: bad times({s.lo},{s.hi})"
                    )

        check(stages, True)
        for slot, s in enumerate(_flatten(stages)):
            s.slot = slot
        for uslot, s in enumerate(_until_stages(stages)):
            s.uslot = uslot
        return stages


def _run_start(start, n, ts, flags, untils, stages, win, want_timeouts,
               matches, timeouts, dyns=None):
    """Enumerate every match anchored at ``start`` (the run's first
    consumed event is exactly ``start``), appending to ``matches`` as
    (start, consumed_tuple, {stage: [idx...]}) and timed-out partials
    to ``timeouts`` keyed (start, assignment). Timeouts are reported
    only when ``win`` is set (no window => the reference never calls
    the timeout fn); a partial that ran out of buffered events counts
    too — bounded input ends in a MAX_WATERMARK flush that expires
    every open window.

    ``flags``/``dyns`` are indexed by stage SLOT and ``untils`` by
    USLOT (see ``CepPattern._validated``); ``stages`` is the
    structured top-level list — a group stage's element is matched by
    recursing into its body with the entry position pinned, which is
    what lets GroupPattern sub-sequences ride the same machinery
    (continuation-passing ``do_stage``)."""
    flat = _flatten(stages)

    def record_timeout(acc):
        if not want_timeouts or win is None:
            return
        if not any(acc.values()):
            return  # nothing consumed yet — no partial match exists
        key = (start, tuple((s.name, tuple(acc[s.name])) for s in flat))
        timeouts.setdefault(key, {k: list(v) for k, v in acc.items()})

    def expired(j) -> bool:
        return win is not None and ts[j] - ts[start] > win

    def smatch(st, j, acc, elems=()) -> bool:
        """Full condition at ``j``: static flag AND (for iterative
        conditions) the dynamic part against the current binding."""
        if not flags[st.slot][j]:
            return False
        dyn = dyns[st.slot] if dyns is not None else None
        return dyn is None or dyn(j, acc, elems, st.name)

    def entry_gen(st, strategy, prev_end, pin, bans, acc, on_timeout):
        """Positions where an element of ``st`` may start, honoring
        the consuming strategy, pending notFollowedBy bans (a ban
        event kills every branch that skips past it — stop state),
        the within window, and the anchor pin (NoSkip enumerates each
        start exactly once by pinning the run's first consumption)."""
        head = _head(st)

        def banned(k) -> bool:
            return any(flags[b][k] for b in bans)

        if pin is not None:
            if strategy == _STRICT and pin != prev_end + 1:
                return
            if pin < n and not expired(pin) and smatch(head, pin, acc):
                yield pin
            return
        if strategy == _STRICT:
            j = prev_end + 1
            if j < n and not expired(j) and smatch(head, j, acc):
                yield j  # the gap is empty — bans are vacuous
            return
        j = prev_end + 1
        while j < n:
            if expired(j):
                on_timeout()
                return
            hit = smatch(head, j, acc)
            if hit:
                yield j
                if strategy == _RELAXED:
                    return  # SKIP_TILL_NEXT: can't skip a match
            if banned(j):
                return  # stop state kills branches skipping past j
            j += 1
        on_timeout()  # ran out of events with the stage still open

    def do_stage(stages_l, si, prev_end, bans, acc, pin, cont) -> bool:
        """Advance through ``stages_l`` from ``si``; ``cont(end, acc)``
        fires at sequence end. Returns True iff >= 1 complete match
        was recorded down this branch (drives greedy())."""
        if si == len(stages_l):
            return cont(prev_end, acc)
        st = stages_l[si]

        if st.strategy == _NOT_NEXT:
            j = prev_end + 1
            if j < n and flags[st.slot][j]:
                return False  # the very next event matches — branch dies
            # no consumption; bans stay pending for the next consumer
            return do_stage(stages_l, si + 1, prev_end, bans, acc, pin, cont)

        if st.strategy == _NOT_FOLLOW:
            return do_stage(stages_l, si + 1, prev_end, bans + [st.slot],
                            acc, pin, cont)

        any_hit = False
        # optional / lo==0: the skip branch consumes nothing (the pin
        # — the run anchor — passes to the next consuming stage)
        if st.optional or st.lo == 0:
            if do_stage(stages_l, si + 1, prev_end, bans, dict(acc),
                        pin, cont):
                any_hit = True

        is_loop = not (st.hi == 1 and st.lo <= 1)

        def after_elem_seq(end, acc2) -> bool:
            return do_stage(stages_l, si + 1, end, [], acc2, None, cont)

        def one_element(j, acc_in, elems, elem_cont) -> bool:
            """Consume ONE element of ``st`` whose first event is at
            ``j``; ``elem_cont(end, acc)``. For a group the element
            is a full body match (entry pinned at j)."""
            if st.group is not None:
                return do_stage(st.group, 0, j - 1, [], acc_in, j,
                                elem_cont)
            if not smatch(st, j, acc_in,
                          tuple(e for e, _ in elems)):
                return False
            acc2 = dict(acc_in)
            acc2[st.name] = acc_in.get(st.name, []) + [j]
            return elem_cont(j, acc2)

        def loop_from(first_j) -> bool:
            """Quantified stage: elements per inner contiguity, until,
            greedy preference, and the emit-every-prefix default."""

            def advance(end, acc_cur, elems) -> bool:
                count = len(elems)
                can_stop = count >= max(st.lo, 1)

                def stop() -> bool:
                    return after_elem_seq(end, acc_cur)

                if st.hi is not None and count >= st.hi:
                    return stop() if can_stop else False

                def gen_next():
                    j = end + 1
                    head = _head(st)
                    while j < n:
                        if expired(j):
                            record_timeout(acc_cur)
                            return
                        if (st.uslot is not None
                                and untils[st.uslot][j]):
                            return  # until(): loop stops accepting
                        hit = smatch(head, j, acc_cur,
                                     tuple(e for e, _ in elems))
                        if hit:
                            yield j
                            if st.inner != _ANY:
                                return
                        if st.inner == _STRICT:
                            return
                        j += 1
                    record_timeout(acc_cur)  # open mid-loop at data end

                def take(j) -> bool:
                    return one_element(
                        j, acc_cur, elems,
                        lambda e2, a2: advance(e2, a2, elems + [(j, e2)]),
                    )

                got = False
                if st.greedy:
                    extended = False
                    for j in gen_next():
                        if take(j):
                            extended = True
                            got = True
                    if not extended and can_stop:
                        got = stop() or got
                else:
                    if can_stop:
                        got = stop() or got
                    for j in gen_next():
                        got = take(j) or got
                return got

            return one_element(
                first_j, acc, [],
                lambda e, a: advance(e, a, [(first_j, e)]),
            )

        def on_timeout():
            record_timeout(acc)

        for j in entry_gen(st, st.strategy, prev_end, pin, bans, acc,
                           on_timeout):
            if is_loop:
                if loop_from(j):
                    any_hit = True
            else:
                if one_element(j, acc, [], after_elem_seq):
                    any_hit = True
        return any_hit

    def final_cont(prev_end, acc) -> bool:
        consumed = tuple(ix for s in flat for ix in acc[s.name])
        matches.append(
            (start, consumed, {k: list(v) for k, v in acc.items()})
        )
        return True

    init = {s.name: [] for s in flat}
    do_stage(stages, 0, start - 1, [], init, start, final_cont)


def _enumerate_key(n, ts, flags, untils, stages, win, want_timeouts,
                   dyns=None):
    """All matches + timed-out partials over one key's index space
    (every anchor, NoSkip)."""
    matches: list[tuple[int, tuple, dict]] = []
    timeouts: dict[tuple, dict] = {}
    for start in range(n):
        _run_start(start, n, ts, flags, untils, stages, win,
                   want_timeouts, matches, timeouts, dyns)
    return matches, timeouts


def _dyn_token_re(stage_names):
    alts = "|".join(
        re.escape(s) for s in sorted(stage_names, key=len, reverse=True)
    )
    return re.compile(
        rf"\b(first|last)_({alts})_(\w+)\b|\bcount_({alts})\b"
    )


def _dynamic_specs(stages, df_columns):
    """Iterative conditions (IterativeCondition.java — filter(event,
    ctx) with ctx.getEventsForPattern): a stage condition may
    reference the IN-PROGRESS binding via ``first_<stage>_<col>`` /
    ``last_<stage>_<col>`` / ``count_<stage>`` pseudo-columns (the
    same navigation surface the MATCH_RECOGNIZE DEFINE path exposes).
    Such conditions cannot be row-wise JVM booleans — they are
    compiled here and evaluated per candidate inside the matcher.
    Self-references see the elements accepted SO FAR (exclusive of
    the candidate); navigation over an empty binding is NULL, so
    guard first elements with ``count_<self> = 0 OR ...``. Returns a
    per-stage list of None (static) or (code, plain_cols, refs)."""
    from flink_efo_spark.operators.cep import _sql_to_py

    flat = _flatten(stages)
    rx = _dyn_token_re([s.name for s in flat])
    specs = []
    for s in flat:
        cond = _cond_expr(s.conds)
        refs = []
        for m in rx.finditer(cond):
            if m.group(4) is not None:
                refs.append((m.group(0), "count", m.group(4), None))
            else:
                refs.append((m.group(0), m.group(1), m.group(2), m.group(3)))
        if not refs:
            specs.append(None)
            continue
        if s.is_not:
            raise ValueError(
                f"stage {s.name!r}: iterative conditions are not supported "
                "on NOT stages (their ban/adjacency checks are vectorized)"
            )
        for tok, kind, _sv, scol in refs:
            if scol is not None and scol not in df_columns:
                raise ValueError(
                    f"navigation {tok!r}: column {scol!r} not in the input"
                )
        code = compile(_sql_to_py(cond), "<cep-iterative>", "eval")
        ref_names = {r[0] for r in refs}
        plain = {
            nm for nm in code.co_names
            if nm not in ref_names and nm in df_columns
        }
        unknown = [
            nm for nm in code.co_names
            if nm not in ref_names and nm not in df_columns
        ]
        if unknown:
            raise ValueError(
                f"stage {s.name!r}: iterative condition references unknown "
                f"names {unknown} — only input columns, literals and "
                "first_/last_/count_ navigation are supported"
            )
        specs.append((code, plain, refs))
    for s in _until_stages(stages):
        if rx.search(s.until):
            raise ValueError(
                f"stage {s.name!r}: until() must be a static condition"
            )
    return specs


def _make_dyns(specs, pdf, n_real):
    """Bind compiled iterative conditions to one key's column arrays
    (``pdf``: a pandas frame, or a dict of numpy arrays on the
    streaming path). Candidates at index >= n_real (the streaming
    hold probe's hypothetical future rows) match unconditionally —
    the probe asks whether ANY future row could continue the branch."""
    import numpy as np

    if not any(spec is not None for spec in specs):
        return None
    data: dict = {}
    for spec in specs:
        if spec is None:
            continue
        _, plain, refs = spec
        for c in plain | {r[3] for r in refs if r[3] is not None}:
            if c not in data:
                col = pdf[c]
                data[c] = (
                    col if isinstance(col, np.ndarray) else col.to_numpy()
                )
    fns = []
    for spec in specs:
        if spec is None:
            fns.append(None)
            continue
        code, plain, refs = spec

        def make(code=code, plain=plain, refs=refs):
            def d(j, acc, elems, self_name):
                if j >= n_real:
                    return True
                env = {c: data[c][j] for c in plain}
                for tok, kind, sv, scol in refs:
                    rows = (
                        list(elems) if sv == self_name
                        else list(acc.get(sv) or [])
                    )
                    if kind == "count":
                        env[tok] = len(rows)
                    elif not rows:
                        env[tok] = None  # NULL: comparisons raise -> False
                    else:
                        env[tok] = data[scol][
                            rows[0] if kind == "first" else rows[-1]
                        ]
                try:
                    return bool(eval(code, {"__builtins__": {}}, env))  # noqa: S307
                except TypeError:  # NULL operand in a comparison
                    return False
            return d

        fns.append(make())
    return fns


def _measure_value(fn, rows_of, col_series):
    """Measure over a stage's matched rows (PatternSelectFunction
    receives the full per-stage event list — Map<String, List<T>>):
    first|last positional, count, and the numeric folds sum|min|max|
    avg. Absent stage: NULL (count -> 0). ``col_series`` may be a
    pandas Series or a bare numpy array (streaming path)."""
    import numpy as np

    if fn == "count":
        return len(rows_of)
    if not rows_of:
        return None
    at = (
        col_series.__getitem__
        if isinstance(col_series, np.ndarray)
        else col_series.iloc.__getitem__
    )
    if fn == "first":
        return at(rows_of[0])
    if fn == "last":
        return at(rows_of[-1])
    if fn.startswith(("first:", "last:")):
        # logical offset (FIRST(A.col, n)); NULL when out of range
        base, off = fn.split(":")
        n = int(off)
        if n >= len(rows_of):
            return None
        return at(rows_of[n] if base == "first" else rows_of[-1 - n])
    vals = [at(ix) for ix in rows_of]
    if fn == "sum":
        return sum(vals)
    if fn == "min":
        return min(vals)
    if fn == "max":
        return max(vals)
    if fn == "avg":
        return sum(vals) / len(vals)
    raise ValueError(f"unknown measure fn {fn!r}")


def _assign_key(stages, assign) -> tuple:
    return tuple((s.name, tuple(assign[s.name])) for s in stages)


def _prefilter_expr(stages, specs, flag_cols, until_cols):
    """JVM-side row prefilter: when every contiguity rule is RELAXED
    (no next()/notNext()/consecutive()), an event matching NO stage
    flag and no until() is invisible to the matcher — every skip-till
    scan steps over it and no adjacency test can see it — so it is
    dropped BEFORE the shuffle and the Arrow transfer (at scale the
    predicate pushes into the parquet scan). Any strict-contiguity
    stage disables the filter: adjacency depends on unmatched
    neighbors. Iterative-condition stages have flag columns pinned
    True, so their rows always survive. Returns a Column or None."""
    def strictish(seq_l) -> bool:
        return any(
            s.strategy in (_STRICT, _NOT_NEXT)
            or (s.hi != 1 and s.inner == _STRICT)
            or (s.group is not None and strictish(s.group))
            for s in seq_l
        )

    if strictish(stages):
        return None
    preds = [F.col(c) for c in flag_cols] + [
        F.col(c) for c in until_cols if c
    ]
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _probe_arrays(n, ts, flags, untils, stages, future_ts=None):
    """Buffer extended with hypothetical all-matching future rows
    (flags True, untils False, event time = the last real row's — the
    earliest any future row can carry, floored by ``future_ts`` when
    given: the stateful operator drops rows below the watermark, so no
    future row can carry an earlier event time). If enumeration over
    the extension produces a different match set for a start than the
    real buffer does, future rows can still change that start's
    output: open branches complete through the probe rows, greedy
    loops extend into them, and a notNext holding beyond the buffer
    end gets killed by them — each difference is exactly a reason to
    hold."""
    import numpy as np

    k = _min_rows(stages) + 1
    flags_ext = [np.append(f, [True] * k) for f in flags]
    untils_ext = [
        np.append(u, [False] * k) if u is not None else None for u in untils
    ]
    if n:
        stamp = ts[n - 1] if future_ts is None else max(ts[n - 1], future_ts)
        ts_ext = np.append(ts, [stamp] * k)
    else:
        ts_ext = ts
    return n + k, ts_ext, flags_ext, untils_ext


def _prune_after_match(matches, after_match, stages):
    """aftermatch/AfterMatchSkipStrategy.java pruning over the
    start-ordered match list."""
    matches.sort(key=lambda m: (m[0], m[1]))
    # defensive dedupe: optional() combined with times(0, n) reaches
    # the same assignment via two skip branches
    uniq, seen = [], set()
    for m in matches:
        k = (m[0], tuple((name, tuple(rows)) for name, rows in sorted(m[2].items())))
        if k not in seen:
            seen.add(k)
            uniq.append(m)
    matches = uniq
    if after_match == "no_skip":
        return matches
    if after_match == "skip_to_next":
        out, seen = [], set()
        for m in matches:
            if m[0] not in seen:
                seen.add(m[0])
                out.append(m)
        return out
    if after_match == "skip_past_last_event":
        out, threshold = [], -1
        for m in matches:
            if m[0] > threshold:
                out.append(m)
                threshold = max(threshold, max(m[1]))
        return out
    kind, _, stage_name = after_match.partition(":")
    if kind in ("skip_to_first", "skip_to_last") and stage_name:
        out, threshold = [], -1
        for m in matches:
            if m[0] <= threshold:
                continue
            out.append(m)
            rows = m[2].get(stage_name) or []
            if not rows:
                continue
            anchor = min(rows) if kind == "skip_to_first" else max(rows)
            if anchor <= m[0]:
                # reference throws on a strategy that would re-enter
                # the match start (SKIP_TO_FIRST on the first element)
                raise ValueError(
                    f"AFTER MATCH {after_match} would re-enter the match start"
                )
            threshold = max(threshold, anchor - 1)
        return out
    raise ValueError(f"unknown after_match strategy {after_match!r}")


def cep_pattern_select(
    df: DataFrame,
    pattern: CepPattern,
    partition_by: list[str],
    order_by: str,
    measures: dict[str, tuple[str, str, str]],
    tiebreak: str | None = None,
    emit_timeouts: bool = False,
) -> DataFrame:
    """Run a CEP library pattern (CEP.java ``CEP.pattern`` +
    PatternStream select/flatSelect) over a batch DataFrame.

    measures: out_col -> (stage, fn, col), fn ∈ first|last|count.
    Output: partition keys, ``match_seq`` (per-key emission order),
    the measures, and — when ``emit_timeouts`` — a ``timed_out``
    boolean marking partial matches whose ``within`` window expired
    before completion (PatternTimeoutFunction.java; absent-stage
    measures are NULL, counts 0). Timeout rows sort after full
    matches in the per-key sequence."""
    import pandas as pd

    stages = pattern._validated()
    win = pattern._within
    after_match = pattern._after_match
    if emit_timeouts and win is None:
        raise ValueError("timeouts need within() — the reference only "
                         "times out windowed patterns")

    order_cols = [order_by] + ([tiebreak] if tiebreak else [])
    flat = _flatten(stages)
    specs = _dynamic_specs(stages, df.columns)
    enriched = df
    flag_cols = []
    for s in flat:  # one flag column per SLOT (group bodies inlined)
        fc = f"__cep_f{s.slot}"
        flag_cols.append(fc)
        cond = _cond_expr(s.conds)
        # iterative conditions evaluate in the matcher: static flag True
        enriched = enriched.withColumn(
            fc, F.lit(True) if specs[s.slot] is not None else F.expr(cond)
        )
    until_cols = []
    for s in _until_stages(stages):
        uc = f"__cep_u{s.uslot}"
        until_cols.append(uc)
        enriched = enriched.withColumn(uc, F.expr(s.until))

    meas_cols = sorted({col for _, fn, col in measures.values() if fn != "count"})
    dyn_cols = sorted({
        c
        for spec in specs if spec is not None
        for c in spec[1] | {r[3] for r in spec[2] if r[3] is not None}
    })
    keep = list(dict.fromkeys(
        partition_by + order_cols + meas_cols + dyn_cols
        + flag_cols + until_cols
    ))
    slim = enriched.select(*keep)
    pf = _prefilter_expr(stages, specs, flag_cols, until_cols)
    if pf is not None:
        slim = slim.where(pf)

    out_fields = [slim.schema[k] for k in partition_by]
    out_fields.append(StructField("match_seq", LongType()))
    for out_col, (stage, fn, col) in measures.items():
        if stage not in {s.name for s in flat}:
            raise ValueError(f"measure {out_col!r}: unknown stage {stage!r}")
        if fn == "count":
            out_fields.append(StructField(out_col, LongType()))
        elif fn == "avg":
            from pyspark.sql.types import DoubleType

            out_fields.append(StructField(out_col, DoubleType()))
        else:
            out_fields.append(StructField(out_col, slim.schema[col].dataType))
    if emit_timeouts:
        out_fields.append(StructField("timed_out", BooleanType()))
    out_schema = StructType(out_fields)

    stage_list = stages  # capture plain dataclasses (picklable)
    flat_list = flat     # flat view: assign-dict keys / measure names
    meas_items = list(measures.items())

    def match_key(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from flink_efo_spark.operators.cep import _ts_and_window

        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        keyvals = {k: pdf[k].iloc[0] for k in partition_by}
        ts, w = (_ts_and_window(pdf[order_by], win) if win is not None
                 else (pdf[order_by].to_numpy(), None))
        flags = [pdf[fc].to_numpy(dtype=bool) for fc in flag_cols]
        untils = [pdf[uc].to_numpy(dtype=bool) for uc in until_cols]
        matches, touts = _enumerate_key(
            n, ts, flags, untils, stage_list, w, emit_timeouts,
            _make_dyns(specs, pdf, n),
        )
        matches = _prune_after_match(matches, after_match, flat_list)
        if emit_timeouts:
            # a partial that was ALSO completed by some match is not a
            # timeout for that branch; distinct branches may still
            # time out — the reference reports each pruned partial.
            done = {(m[0], _assign_key(flat_list, m[2])) for m in matches}
        rows = []
        for seq, (_, _, assign) in enumerate(matches, start=1):
            row = dict(keyvals)
            row["match_seq"] = seq
            for out_col, (stage, fn, col) in meas_items:
                rows_of = assign.get(stage) or []
                row[out_col] = _measure_value(fn, rows_of, pdf[col])
            if emit_timeouts:
                row["timed_out"] = False
            rows.append(row)
        if emit_timeouts:
            seq = len(rows)
            for key, assign in sorted(touts.items()):
                if key in done:
                    continue
                seq += 1
                row = dict(keyvals)
                row["match_seq"] = seq
                for out_col, (stage, fn, col) in meas_items:
                    rows_of = assign.get(stage) or []
                    row[out_col] = _measure_value(fn, rows_of, pdf[col])
                row["timed_out"] = True
                rows.append(row)
        if not rows:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        return pd.DataFrame(rows)

    # the explicit keyed repartition is LOAD-BEARING, not redundant:
    # with a bare groupBy, AQE coalesces the (small-bytes) exchange to
    # ~1 partition and SERIALIZES the CPU-heavy Arrow/Python matcher
    # stage (measured +3 s at sf0.1); pinning the width keeps the
    # matcher keyed-parallel. At 100 TB the shuffle is large enough
    # that AQE would keep the width anyway — the pin just also covers
    # the small end, same rationale as catalog.ensure_min_parallelism.
    width = df.sparkSession.sparkContext.defaultParallelism
    return (
        slim.repartition(width, *[F.col(c) for c in partition_by])
        .groupBy(*partition_by)
        .applyInPandas(match_key, schema=out_schema)
    )


def stream_cep_pattern_select(
    df: DataFrame,
    pattern: CepPattern,
    partition_by: list[str],
    order_by: str,
    measures: dict[str, tuple[str, str, str]],
    tiebreak: str | None = None,
    emit_timeouts: bool = False,
    flush_on_timeout: bool = False,
    max_tail: int = 10_000,
    end_of_input_ts=None,
) -> DataFrame:
    """STREAMING Pattern API — the CEP library's native habitat
    (operator/CepOperator.java keeps per-key NFA state and fires
    PatternTimeoutFunction when the within window expires on watermark
    advance; here the state is the key's unresolved-suffix buffer on
    ``applyInPandasWithState``).

    Emission uses a per-start FRONTIER rule: anchors are resolved in
    event-time order, and an anchor's output (its matches, then its
    expired partials when ``emit_timeouts``) is emitted only once NO
    future row can change it. The hold test compares the anchor's
    match set against enumeration over a probe buffer extended with
    all-matching future rows (:func:`_probe_arrays`): open branches,
    extendable greedy loops, pending followedByAny alternatives, and
    a notNext check hanging past the buffer end all surface as a
    probe/base difference. Emission stops at the first held anchor;
    rows from it onward are the new tail (anchors only consume rows
    at/after themselves, so earlier rows are droppable). With
    ``within``, held anchors expire as newer batches arrive — their
    partials emit timed-out and the tail drains; ``max_tail`` is the
    state-TTL backstop. ``flush_on_timeout`` arms an event-time timer
    for keys HOLDING state; a timeout firing mid-stream (watermark
    moved while the key idled a micro-batch) re-runs the frontier with
    "future rows carry event time >= watermark" — anchors whose
    ``within`` window that watermark closed resolve (matches and
    timed-out partials emit), everything else STAYS in state, so a key
    with rows in batches 1 and 3 but none in 2 keeps its cross-gap
    matches. ``end_of_input_ts`` is the MAX_WATERMARK finalization
    (drive it with a far-future sentinel batch): once the watermark
    reaches it, held anchors finalize and the bounded replay equals
    :func:`cep_pattern_select` row-for-row. Windowless patterns arm
    their timer directly at ``end_of_input_ts`` (mid-stream watermarks
    can never resolve them — idle held keys cost zero Python
    invocations per batch).

    after_match: ``no_skip`` and ``skip_to_next`` (both anchor-local).
    The cross-anchor strategies (skip_past_last_event / to_first /
    to_last) suppress matches based on PREVIOUSLY EMITTED ones and are
    supported on the batch path only.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        BooleanType as _Bool,
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType as _Long,
        ShortType,
    )

    stages = pattern._validated()
    win = pattern._within
    after_match = pattern._after_match
    if after_match not in ("no_skip", "skip_to_next"):
        raise ValueError(
            f"streaming supports after_match no_skip|skip_to_next, "
            f"got {after_match!r} (cross-anchor strategies are batch-only)"
        )
    if emit_timeouts and win is None:
        raise ValueError("timeouts need within() — the reference only "
                         "times out windowed patterns")

    order_cols = [order_by] + ([tiebreak] if tiebreak else [])
    flat = _flatten(stages)
    specs = _dynamic_specs(stages, df.columns)
    enriched = df
    flag_cols = []
    for s in flat:  # one flag column per SLOT (group bodies inlined)
        fc = f"__cep_f{s.slot}"
        flag_cols.append(fc)
        enriched = enriched.withColumn(
            fc,
            F.lit(True) if specs[s.slot] is not None
            else F.expr(_cond_expr(s.conds)),
        )
    until_cols = []
    for s in _until_stages(stages):
        uc = f"__cep_u{s.uslot}"
        until_cols.append(uc)
        enriched = enriched.withColumn(uc, F.expr(s.until))

    meas_cols = sorted({col for _, fn, col in measures.values() if fn != "count"})
    dyn_cols = sorted({
        c
        for spec in specs if spec is not None
        for c in spec[1] | {r[3] for r in spec[2] if r[3] is not None}
    })
    keep = list(dict.fromkeys(
        partition_by + order_cols + meas_cols + dyn_cols
        + flag_cols + until_cols
    ))
    slim = enriched.select(*keep)
    if win is None:
        # with a window, expiry signals ride on EVERY newer row's
        # timestamp (held anchors drain as rows arrive) — only the
        # windowless stream can drop invisible rows
        pf = _prefilter_expr(stages, specs, flag_cols, until_cols)
        if pf is not None:
            slim = slim.where(pf)

    out_fields = [slim.schema[k] for k in partition_by]
    out_fields.append(StructField("match_seq", LongType()))
    for out_col, (stage, fn, col) in measures.items():
        if stage not in {s.name for s in flat}:
            raise ValueError(f"measure {out_col!r}: unknown stage {stage!r}")
        if fn == "count":
            out_fields.append(StructField(out_col, LongType()))
        elif fn == "avg":
            from pyspark.sql.types import DoubleType

            out_fields.append(StructField(out_col, DoubleType()))
        else:
            out_fields.append(StructField(out_col, slim.schema[col].dataType))
    if emit_timeouts:
        out_fields.append(StructField("timed_out", BooleanType()))
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_schema.fields]

    from flink_efo_spark.streaming import (
        _np_empty,
        _np_from_state,
        _np_kind,
        _np_series,
        _np_sortn,
        _np_state_list,
    )

    data_cols = [c for c in slim.columns if c not in partition_by]
    # buffers ride keyed state in the numpy row-buffer encoding
    # (streaming.py module header): int64 epoch-us timestamps, double
    # with NaN-as-NULL numerics, original type otherwise
    enc = {c: _np_kind(slim.schema[c].dataType) for c in data_cols}
    for c in flag_cols + until_cols:
        # DEFINE/UNTIL flags are consumed as NA-as-False booleans and
        # never emitted — ride them as float64 (NaN = NULL) so the
        # state round-trip and _bool_arr stay vectorized
        enc[c] = "num"
    state_schema = StructType(
        [StructField("__seq", LongType())]
        + [
            StructField(
                f"__t_{c}",
                ArrayType(_Long()) if enc[c] == "ts"
                else ArrayType(DoubleType()) if enc[c] == "num"
                else ArrayType(slim.schema[c].dataType))
            for c in data_cols
        ]
    )

    from flink_efo_spark.pandas_compat import state_caster as _caster

    obj_casters = {
        c: _caster(slim.schema[c].dataType)
        for c in data_cols if enc[c] == "obj"
    }
    _empty = {c: _np_empty(enc[c]) for c in data_cols}
    stage_list = stages
    flat_list = flat
    meas_items = list(measures.items())

    def _measure_row(keyvals, seq, assign, cols, timed_out=None):
        row = dict(keyvals)
        row["match_seq"] = seq
        for out_col, (stage, fn, col) in meas_items:
            rows_of = assign.get(stage) or []
            row[out_col] = _measure_value(fn, rows_of, cols[col])
        if timed_out is not None:
            row["timed_out"] = timed_out
        return row

    def _bool_arr(arr):
        """NA-as-False bool view of a buffer-encoded column (float64
        with NaN nulls, or an object array)."""
        import numpy as np

        if arr.dtype == bool:
            return arr
        if arr.dtype == object:
            return np.array(
                [bool(x) if x is not None else False for x in arr],
                dtype=bool,
            )
        out = arr == 1.0  # NaN compares False — exactly NA-as-False
        return out

    def _pass(key, allc, n, seq, finalize, wm_ms=None):
        import numpy as np

        if n > 1:
            order = _np_sortn([allc[c] for c in order_cols])
            allc = {c: v[order] for c, v in allc.items()}
        keyvals = {k: key[i] for i, k in enumerate(partition_by)}
        # order/window domain: int64 epoch-us for timestamp order
        # columns (the buffer encoding — the old path compared ns,
        # same information at micros precision), raw values otherwise
        # (``within`` then reads in the column's own units)
        if enc[order_by] == "ts":
            ts = allc[order_by]
            w = int(win * 1_000_000) if win is not None else None
        else:
            ts = allc[order_by]
            w = win
        fut = None
        if wm_ms is not None and win is not None and n and enc[order_by] == "ts":
            fut = wm_ms * 1000
        flags = [_bool_arr(allc[fc]) for fc in flag_cols]
        untils = [_bool_arr(allc[uc]) for uc in until_cols]
        matches: list = []
        touts: dict = {}
        frontier = n
        dyns = _make_dyns(specs, allc, n)
        if finalize:
            for s0 in range(n):
                _run_start(s0, n, ts, flags, untils, stage_list, w,
                           emit_timeouts, matches, touts, dyns)
        else:
            pn, pts, pflags, puntils = (
                _probe_arrays(n, ts, flags, untils, stage_list, fut) if n else
                (0, ts, flags, untils)
            )
            for s0 in range(n):
                base_m: list = []
                _run_start(s0, n, ts, flags, untils, stage_list, w,
                           emit_timeouts, base_m, touts, dyns)
                probe_m: list = []
                _run_start(s0, pn, pts, pflags, puntils, stage_list, w,
                           False, probe_m, {}, dyns)
                if (
                    {_assign_key(flat_list, m[2]) for m in probe_m}
                    != {_assign_key(flat_list, m[2]) for m in base_m}
                ):
                    frontier = s0
                    break
                matches.extend(base_m)
            else:
                frontier = n
        matches = _prune_after_match(matches, "no_skip", flat_list)
        if after_match == "skip_to_next":
            kept, seen = [], set()
            for m in matches:
                if m[0] not in seen:
                    seen.add(m[0])
                    kept.append(m)
            matches = kept
        rows = []
        for _, _, assign in matches:
            seq += 1
            rows.append(_measure_row(
                keyvals, seq, assign, allc,
                False if emit_timeouts else None,
            ))
        if emit_timeouts:
            done = {(m[0], _assign_key(flat_list, m[2])) for m in matches}
            for tkey, assign in sorted(touts.items()):
                if tkey in done or (not finalize and tkey[0] >= frontier):
                    continue
                seq += 1
                rows.append(_measure_row(keyvals, seq, assign, allc, True))
        start = max(frontier, n - max_tail)
        new_tail = {c: v[start:] for c, v in allc.items()}
        return rows, seq, new_tail, n - start

    from flink_efo_spark.operators.cep import _eoi_epoch_ms

    eoi_ms = (
        None if end_of_input_ts is None else _eoi_epoch_ms(end_of_input_ts)
    )
    if flush_on_timeout and win is None and eoi_ms is None:
        # Same dead-contract guard as cep.stream_match_recognize: with
        # neither a within window nor an end-of-input marker the flush
        # timer never arms, so the flag can never fire.
        raise ValueError(
            "flush_on_timeout=True requires a within() window or "
            "`end_of_input_ts`; otherwise held matches can never "
            "finalize"
        )

    def _save_tail(state, seq, new_tail, n_tail) -> None:
        """Persist the tail; arm the flush timer ONLY when rows are
        actually held (idle keys without state cost zero Python
        invocations per batch). ``within`` patterns re-arm at
        watermark+1; windowless ones arm directly at the end-of-input
        marker."""
        state.update(
            (
                int(seq),
                *[
                    _np_state_list(new_tail[c], enc[c], obj_casters.get(c))
                    for c in data_cols
                ],
            )
        )
        if not flush_on_timeout or not n_tail:
            return
        wm = state.getCurrentWatermarkMs()
        if win is not None:
            state.setTimeoutTimestamp(wm + 1)
        elif eoi_ms is not None:
            state.setTimeoutTimestamp(max(wm + 1, eoi_ms))
        # else: no window and no end-of-input marker — held anchors
        # stay in state forever (reference NFA semantics)

    def _drop_late(cols, n, state):
        """CepOperator.java drops late events (its ``timestamp >
        lastWatermark`` processElement guard); Spark's
        applyInPandasWithState does NOT filter its input by the
        watermark (verified on 4.1.2), so the harness enforces it.
        Late = ts < watermark (Spark's rule; equality survives) —
        the probe's 'future rows >= watermark' floor exactly."""
        if enc[order_by] != "ts":
            return cols, n
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us <= 0:
            return cols, n
        keep = cols[order_by] >= wm_us
        if keep.all():
            return cols, n
        return {c: v[keep] for c, v in cols.items()}, int(keep.sum())

    def fn(key, pdfs, state):
        if state.exists:
            st = state.get
            seq = st[0]
            tail = {
                c: _np_from_state(st[1 + i], enc[c])
                for i, c in enumerate(data_cols)
            }
            n_tail = len(tail[order_by])
        else:
            seq = 0
            tail = _empty
            n_tail = 0

        if flush_on_timeout and state.hasTimedOut:
            wm_ms = state.getCurrentWatermarkMs()
            if eoi_ms is not None and wm_ms >= eoi_ms:
                # MAX_WATERMARK finalization — emit and drop state
                rows = []
                if n_tail:
                    rows, _, _, _ = _pass(
                        key, tail, n_tail, seq, finalize=True
                    )
                state.remove()
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)
                return
            # mid-stream idle-batch timeout: resolve only the anchors
            # this watermark finalizes and PRESERVE the rest — a key
            # with rows in batches 1 and 3 but none in 2 must keep its
            # cross-gap partial matches (the b039442 fix, ported)
            rows = []
            new_tail, nt = tail, n_tail
            if n_tail:
                rows, seq, new_tail, nt = _pass(
                    key, tail, n_tail, seq, finalize=False, wm_ms=wm_ms
                )
            _save_tail(state, seq, new_tail, nt)
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
            return

        news = []
        n_new = 0
        for p in pdfs:
            if not len(p):
                continue
            cols = {c: _np_series(p[c], enc[c]) for c in data_cols}
            nn = len(cols[order_by])
            if flush_on_timeout:
                cols, nn = _drop_late(cols, nn, state)
            if nn:
                news.append(cols)
                n_new += nn
        if not n_new and not n_tail:
            state.update((int(seq), *([] for _ in data_cols)))
            return
        parts = ([tail] if n_tail else []) + news
        if len(parts) == 1:
            allc = parts[0]
        else:
            allc = {
                c: np.concatenate([d[c] for d in parts]) for c in data_cols
            }
        rows, seq, new_tail, nt = _pass(
            key, allc, n_tail + n_new, seq, finalize=False
        )
        _save_tail(state, seq, new_tail, nt)
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    out = slim.groupBy(*partition_by).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        "EventTimeTimeout" if flush_on_timeout else "NoTimeout",
    )
    out._efo_output_mode = "append"
    return out
