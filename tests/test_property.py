"""Property-based testing (hypothesis) for the custom operators whose
semantics are NOT delegated to Catalyst — as-of join and top-n —
against a brute-force python oracle. The reference's own suite has no
randomized testing (SURVEY §5); this exceeds it.

Examples are kept small and few: each example is a Spark job.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_efo_spark.operators.joins import asof_join
from flink_efo_spark.operators.topn import top_n

T0 = dt.datetime(2024, 1, 1)

keys = st.integers(min_value=0, max_value=3)
ts_off = st.integers(min_value=0, max_value=20)

probe_rows = st.lists(st.tuples(keys, ts_off), min_size=0, max_size=8)
build_rows = st.lists(
    st.tuples(keys, ts_off, st.integers(min_value=0, max_value=100)),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(probe=probe_rows, build=build_rows)
def test_asof_join_matches_bruteforce(spark, probe, build):
    pdf = spark.createDataFrame(
        [(k, T0 + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(probe)]
        or [(None, None, None)],
        "k int, ts timestamp, pid int",
    ).where(F.col("pid").isNotNull())
    bdf = spark.createDataFrame(
        [
            (k, T0 + dt.timedelta(minutes=m), v, i)
            for i, (k, m, v) in enumerate(build)
        ]
        or [(None, None, None, None)],
        "k int, ts timestamp, v int, bid int",
    ).where(F.col("bid").isNotNull())

    out = asof_join(
        pdf, bdf, "k", "ts", "ts", build_cols=["v"], tiebreak="bid"
    ).collect()

    # brute force: latest build row with same key, ts <= probe ts,
    # ties by highest bid
    def expect(k, m):
        cands = [
            (bm, bid, v)
            for (bk, bm, v, bid) in [
                (bk, bm, v, i) for i, (bk, bm, v) in enumerate(build)
            ]
            if bk == k and bm <= m
        ]
        if not cands:
            return None
        return max(cands)[2]

    got = {r.pid: r.v for r in out}
    assert len(got) == len(probe)
    for i, (k, m) in enumerate(probe):
        assert got[i] == expect(k, m), (i, k, m, got[i], expect(k, m))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(keys, st.integers(min_value=-50, max_value=50)),
        min_size=0,
        max_size=12,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_top_n_matches_bruteforce(spark, rows, n):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)] or [(None, None, None)],
        "k int, v int, rid int",
    ).where(F.col("rid").isNotNull())
    out = top_n(df, ["k"], [F.col("v").desc(), F.col("rid").asc()], n).collect()

    expected = {}
    for i, (k, v) in enumerate(rows):
        expected.setdefault(k, []).append((-v, i))
    exp_ids = set()
    for k, lst in expected.items():
        for rank, (_, i) in enumerate(sorted(lst)[:n], 1):
            exp_ids.add((k, i, rank))
    got = {(r.k, r.rid, r.rn) for r in out}
    assert got == exp_ids


# -- CEP matcher equivalence: AST path vs legacy flat-step path ----------
# The batch matcher moved to _ast_matches (nested-group capable); on FLAT
# patterns it must agree exactly with the streaming _greedy_matches state
# machine. Pure python — no Spark job per example, so examples are cheap.

cep_patterns = st.sampled_from(
    ["A B", "A B+", "A B* C", "A (B|C)+ D?", "A+ B", "A B? C+", "A B+?"]
)
cep_rows = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
)


@settings(max_examples=200, deadline=None)
@given(pattern=cep_patterns, rows=cep_rows)
def test_ast_matcher_equals_flat_matcher(pattern, rows):
    import numpy as np

    from flink_efo_spark.operators.cep import (
        _ast_matches,
        _flat_steps,
        _greedy_matches,
        _parse_ast,
    )

    ast, leaves = _parse_ast(pattern)
    steps = _flat_steps(ast, leaves)
    n = len(rows)
    var_flags = {
        v: np.array([r == v.lower() for r in rows], dtype=bool)
        for v in "ABCD"
    }
    leaf_flags = []
    for _, variables, *_ in leaves:
        fl = var_flags[variables[0]]
        for v in variables[1:]:
            fl = fl | var_flags[v]
        leaf_flags.append(fl)

    flat = [
        (start, [list(ix) for ix in m])
        for start, m in _greedy_matches(leaf_flags, steps, n)
    ]
    astm = [
        (start, assign)
        for start, assign in _ast_matches(leaf_flags, ast, leaves, n)
    ]
    # same match starts, same consumed rows per leaf step, same order
    assert [s for s, _ in flat] == [s for s, _ in astm]
    for (_, m), (_, assign) in zip(flat, astm):
        per_leaf = {lid: ix for lid, ix in assign}
        for k in range(len(steps)):
            assert m[k] == per_leaf.get(k, [])


ev_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # key
        st.integers(min_value=0, max_value=7200),       # seconds offset
        st.integers(min_value=-50, max_value=50),       # value
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ev_rows)
def test_cumulate_sliced_equals_bruteforce(spark, rows):
    """Sliced cumulate == brute-force per-row window enumeration for
    arbitrary timestamps (step 15 min, max 1 h)."""
    from flink_efo_spark.streaming import (
        compose_cumulate_slices,
        cumulate_slices,
    )

    df = spark.createDataFrame(
        [
            (k, T0 + dt.timedelta(seconds=s), float(v))
            for (k, s, v) in rows
        ],
        "k int, ts timestamp, v double",
    )
    sl = cumulate_slices(
        df, "ts", "15 minutes", ["k"],
        F.count("*").alias("pc"), F.sum("v").alias("ps"),
    )
    got = {
        (r.w_start, r.w_end, r.k): (r.cnt, round(r.sv, 6))
        for r in compose_cumulate_slices(
            sl, "15 minutes", "1 hour", ["k"],
            F.sum("pc").alias("cnt"), F.round(F.sum("ps"), 6).alias("sv"),
        ).collect()
    }

    step, mx = 900, 3600
    want: dict = {}
    for (k, s, v) in rows:
        w0 = (s // mx) * mx
        k_first = (s - w0) // step + 1
        for j in range(k_first, mx // step + 1):
            key = (
                T0 + dt.timedelta(seconds=w0),
                T0 + dt.timedelta(seconds=w0 + j * step),
                k,
            )
            c, sv = want.get(key, (0, 0.0))
            want[key] = (c + 1, sv + v)
    want = {k2: (c, round(sv, 6)) for k2, (c, sv) in want.items()}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=1, max_size=8,
        ),
        min_size=1, max_size=6,
    )
)
def test_bm25_matches_bruteforce(spark, texts):
    """BM25 scores == a direct python computation of the Okapi/Lucene
    formula for arbitrary tiny corpora."""
    import math

    from flink_efo_spark.operators.text import bm25_scores

    docs = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    q = ["alpha", "gamma"]
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, "doc_id", "text", q).collect()}

    n = len(docs)
    dls = [len(ws) for ws in texts]
    avgdl = sum(dls) / n
    dfreq = {t: sum(1 for ws in texts if t in ws) for t in q}
    want = {}
    for i, ws in enumerate(texts):
        s = 0.0
        for t in q:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
        if s > 0:
            want[i] = round(s, 6)
    assert got == want


# Streaming frontier emission (overlap-capable AFTER MATCH modes) must
# reproduce the batch matcher's match set for ANY sequence of buffer
# splits. Pure python — drives the shipped _frontier_scan directly.

frontier_patterns = st.sampled_from(
    ["A+ B", "A B", "A B* C", "A (B C)+ D", "A B+?", "(A|B)+ C"]
)
frontier_rows = st.lists(
    st.sampled_from(["a", "b", "c", "d", "x"]), min_size=1, max_size=14
)


@settings(max_examples=150, deadline=None)
@given(
    pattern=frontier_patterns,
    rows=frontier_rows,
    cut_seed=st.integers(min_value=0, max_value=10**6),
)
def test_frontier_scan_split_equals_batch(pattern, rows, cut_seed):
    import numpy as np

    from flink_efo_spark.operators.cep import (
        _ast_matches,
        _attribute_assign,
        _frontier_scan,
        _parse_ast,
    )

    ast, leaves = _parse_ast(pattern)
    n_all = len(rows)
    # two deterministic cut points derived from the seed
    c1 = cut_seed % (n_all + 1)
    c2 = c1 + (cut_seed // 7) % (n_all + 1 - c1)
    batches = [rows[:c1], rows[c1:c2], rows[c2:]]

    def flags(rs):
        vf = {
            v: np.array([r == v.lower() for r in rs], dtype=bool)
            for v in "ABCD"
        }
        lf = []
        for _, variables, *_ in leaves:
            fl = vf[variables[0]]
            for v in variables[1:]:
                fl = fl | vf[v]
            lf.append(fl)
        return vf, lf

    def sig(var_rows, base_rows):
        # content signature: per-variable matched row letters+offsets
        return tuple(
            (v, tuple(base_rows[i] for i in ixs))
            for v, ixs in sorted(var_rows.items())
        )

    # batch reference: full buffer, finalize (end of input flushes)
    vf_all, lf_all = flags(rows)
    want = []
    for _start, assign in _ast_matches(
        lf_all, ast, leaves, n_all, skip="to_next_row", var_flags=vf_all
    ):
        want.append(sig(_attribute_assign(assign, leaves, vf_all), rows))

    # streaming: replay batches through the shipped frontier scan,
    # carrying the tail; finalize on the last batch
    got = []
    tail: list[str] = []
    for bi, batch in enumerate(batches):
        buf = tail + list(batch)
        vf, lf = flags(buf)
        emissions, frontier = _frontier_scan(
            ast, leaves, lf, len(buf), None, None,
            "to_next_row", None, vf, finalize=(bi == len(batches) - 1),
        )
        for assign, var_rows in emissions:
            got.append(sig(var_rows, buf))
        tail = buf[frontier:]

    assert got == want, (pattern, rows, batches, got, want)


# ---------------------------------------------------------------------------
# Delta-iteration BFS vs a pure-Python reference
# ---------------------------------------------------------------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists, depth=st.integers(1, 4))
def test_bfs_distances_matches_reference(spark, edges, depth):
    """bfs_distances (operators/iterate.py delta iteration) agrees
    with a driver-side BFS on random small digraphs at every depth
    cap."""
    from collections import deque

    from flink_efo_spark.operators.iterate import bfs_distances

    start = edges[0][0]
    # python reference: unit-weight BFS with depth cap
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    expected = {start: 0}
    dq = deque([start])
    while dq:
        n = dq.popleft()
        if expected[n] >= depth:
            continue
        for m in sorted(adj.get(n, ())):
            if m not in expected:
                expected[m] = expected[n] + 1
                dq.append(m)

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        (r.node, r.dist)
        for r in bfs_distances(df, "src", "dst", [start], depth).collect()
    }
    assert got == set(expected.items())


weighted_edge_lists = st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 10), st.integers(1, 9)),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=weighted_edge_lists, rounds=st.integers(1, 4))
def test_sssp_matches_reference(spark, edges, rounds):
    """sssp_distances (frontier Bellman-Ford) agrees with a plain
    driver-side Bellman-Ford at every round cap on random weighted
    digraphs (parallel edges + self-loops included)."""
    from flink_efo_spark.operators.iterate import sssp_distances

    start = edges[0][0]
    dist = {start: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, 1 << 60):
                nxt[d] = dist[s] + w
        dist = nxt

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT, w BIGINT")
    got = {
        (r.node, r.dist)
        for r in sssp_distances(df, "src", "dst", "w", start, rounds).collect()
    }
    assert got == set(dist.items())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists, rounds=st.integers(1, 3))
def test_label_propagation_matches_reference(spark, edges, rounds):
    """label_propagation agrees with a driver-side synchronous sweep
    of the Gelly-exact semantics (most frequent in-neighbor label
    seeded by the vertex's OWN label at frequency 1, ties to the
    HIGHEST label; only message-receivers scatter next round) on
    random digraphs."""
    from flink_efo_spark.operators.iterate import label_propagation

    nodes = {n for e in edges for n in e}
    lab = {n: n for n in nodes}
    active = set(nodes)
    for _ in range(rounds):
        freq: dict = {}
        for s, d in edges:
            if s in active:
                freq.setdefault(d, {}).setdefault(lab[s], 0)
                freq[d][lab[s]] += 1
        nxt = dict(lab)
        for d, fl in freq.items():
            fl = dict(fl)
            fl[lab[d]] = max(fl.get(lab[d], 0), 1)
            nxt[d] = max(fl.items(), key=lambda kv: (kv[1], kv[0]))[0]
        lab = nxt
        active = set(freq)

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        (r.id, r.label)
        for r in label_propagation(df, "src", "dst", rounds).collect()
    }
    assert got == set(lab.items())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_triangle_enumerate_matches_bruteforce(spark, edges):
    """triangle_enumerate emits exactly the brute-force canonical
    triangle set (degree ties, parallel/reversed edges, self-loops)."""
    from itertools import combinations

    from flink_efo_spark.operators.iterate import triangle_enumerate

    eset = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    nodes = sorted({n for e in eset for n in e})
    expected = {
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    }

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        tuple(r) for r in triangle_enumerate(df, "src", "dst").collect()
    }
    assert got == expected


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_vertex_centric_cc_matches_union_find(spark, edges):
    """The Pregel harness (iterate.vertex_centric) with the
    GSAConnectedComponents hooks equals a python union-find on random
    graphs — including self-loops, duplicate edges and multi-component
    shapes (max_rounds = vertex count bounds any diameter)."""
    from flink_efo_spark.operators.iterate import vertex_centric

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {x: find(x) for x in parent}

    e = spark.createDataFrame(edges, "src long, dst long")
    und = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    verts = (
        und.select(F.col("src").alias("id"))
        .union(und.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("value"))
    )
    out = vertex_centric(
        verts,
        und,
        send_msg=F.col("value"),
        combine_msg=F.min,
        apply_fn=F.least,
        max_rounds=len(want) + 1,
    )
    got = {r.id: r.value for r in out.collect()}
    assert got == want


# --- round-9c curation operators -----------------------------------

_vec_sets = st.lists(
    st.lists(
        st.integers(min_value=-3, max_value=3).map(float),
        min_size=4, max_size=4,
    ).filter(lambda v: any(x != 0.0 for x in v)),
    min_size=4, max_size=24,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=_vec_sets)
def test_semantic_dedup_survivors_independent(spark, vecs):
    """For ANY input, two survivors of the same cluster are never
    within the threshold of each other (the later one would have been
    dropped against the earlier one — the SemDeDup drop rule's
    defining invariant), and every input id comes out exactly once
    across survivors+dropped."""
    import math

    from flink_efo_spark.operators.similarity import semantic_dedup

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    tau = 0.9
    out = semantic_dedup(df, "vec_id", n_clusters=3, threshold=tau)
    got = [(r.vec_id, r.cluster) for r in out.collect()]
    assert len({i for i, _ in got}) == len(got) <= len(rows)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return num / (na * nb)

    by_cluster = {}
    for i, c in got:
        by_cluster.setdefault(c, []).append(i)
    for members in by_cluster.values():
        for a in members:
            for b in members:
                if a < b:
                    assert cos(vecs[a], vecs[b]) < tau, (a, b)


def test_dsir_identity_target_is_zero(spark):
    """target == raw ⇒ every bucket's log ratio is EXACTLY zero (the
    two ln() arguments are identical expressions over identical
    counts), hence every document weight is exactly 0 — the
    integer-quantized design makes this an equality, not a
    tolerance."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.sampling import (
        dsir_importance,
        dsir_log_ratios,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    ratios = dsir_log_ratios(docs, docs, "text", num_buckets=128)
    assert ratios.where(F.col("micro_log_ratio") != 0).count() == 0
    w = dsir_importance(docs, "doc_id", "text", ratios, num_buckets=128)
    assert w.where(F.col("weight_micro") != 0).count() == 0


def test_dsir_contract_guards(spark):
    """The fit/score num_buckets contract is validated (a mismatch
    would silently drop grams hashing past the ratio spine), and
    NULL-text docs are excluded from the scored output — the same set
    the gram-CTE-based DuckDB oracles produce."""
    import pytest

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.sampling import (
        dsir_importance,
        dsir_log_ratios,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    ratios = dsir_log_ratios(docs, docs, "text", num_buckets=64)
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_importance(docs, "doc_id", "text", ratios, num_buckets=128)

    aug = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(-1, None)], schema=docs.select("doc_id", "text").schema
        )
    )
    w = dsir_importance(aug, "doc_id", "text", ratios, num_buckets=64)
    assert w.where(F.col("doc_id") == -1).count() == 0
    assert w.count() == docs.count()


_span_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]),
        min_size=1, max_size=12,
    ),
    min_size=1, max_size=6,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(docs=_span_docs)
def test_span_positions_and_cut_bruteforce(spark, docs):
    """duplicate_span_positions / cut_duplicate_spans vs a literal
    python replay (windows, >=2-distinct-doc spans, positions, the
    adjacent/overlap interval merge, and the token cut) — the
    gaps-and-islands boundary cases a hand test can miss."""
    from flink_efo_spark.operators.dedup import (
        cut_duplicate_spans,
        duplicate_span_positions,
    )

    W = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    spans: dict = {}
    for did, toks in enumerate(docs):
        for i in range(len(toks) - W + 1):
            spans.setdefault(" ".join(toks[i:i + W]), set()).add(did)
    dup = {s for s, ds in spans.items() if len(ds) >= 2}

    want_iv = []
    want_cut = {}
    for did, toks in enumerate(docs):
        pos = [
            i + 1
            for i in range(len(toks) - W + 1)
            if " ".join(toks[i:i + W]) in dup
        ]
        ivs = []
        cur = None
        for p in pos:
            if cur is not None and p <= cur[1] + W:
                cur[1] = p
            else:
                if cur is not None:
                    ivs.append((cur[0], cur[1] + W - 1))
                cur = [p, p]
        if cur is not None:
            ivs.append((cur[0], cur[1] + W - 1))
        want_iv += [(did, a, b) for a, b in ivs]
        covered = set()
        for a, b in ivs:
            covered.update(range(a, b + 1))
        kept = [t for i, t in enumerate(toks, 1) if i not in covered]
        want_cut[did] = (" ".join(kept), len(toks), len(covered))

    got_iv = sorted(
        (r.doc_id, r.token_start, r.token_end)
        for r in duplicate_span_positions(
            df, "doc_id", "text", window=W, min_docs=2
        ).collect()
    )
    assert got_iv == sorted(want_iv)

    got_cut = {
        r.doc_id: (r.clean_text, r.n_tokens, r.removed_tokens)
        for r in cut_duplicate_spans(
            df, "doc_id", "text", window=W, min_docs=2
        ).collect()
    }
    assert got_cut == want_cut


# --- round-10b curation operators vs python brute force ---

_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "longword"]),
    min_size=0,
    max_size=24,
)
_docsets = st.lists(_words, min_size=1, max_size=5)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docsets, seq_len=st.integers(min_value=1, max_value=7))
def test_pack_sequences_matches_bruteforce(spark, docs, seq_len):
    """pack_sequences' segment map equals a python replay of the
    spec: md5-ordered concat, fixed windows, per-doc segments."""
    import hashlib

    from flink_efo_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(
        (r.doc_id, r.seq_id, r.doc_offset, r.seq_offset, r.seg_len)
        for r in pack_sequences(
            df, "doc_id", "text", seq_len=seq_len
        ).collect()
    )

    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i)
        for i, _ in rows
    )
    ntok = {i: len(ws) for (i, _), ws in zip(rows, docs)}
    expect, pos = [], 0
    for _, i in order:
        n = ntok[i]
        if n == 0:
            continue
        start, end = pos, pos + n
        for w in range(start // seq_len, (end - 1) // seq_len + 1):
            lo = max(start, w * seq_len)
            hi = min(end, (w + 1) * seq_len)
            expect.append((i, w, lo - start, lo - w * seq_len, hi - lo))
        pos = end
    assert got == sorted(expect)


_rep_text = st.lists(
    st.sampled_from(["x", "y", "zz", "www"]),
    min_size=0,
    max_size=18,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_rep_text, min_size=1, max_size=4))
def test_gopher_repetition_metrics_match_bruteforce(spark, docs):
    """The dup-n-gram char sums (total-minus-distinct identity) and
    top-n-gram coverage (max count*chars over repeated grams) equal
    a python replay."""
    from flink_efo_spark.operators.text import gopher_repetition_flags

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in gopher_repetition_flags(
        df, "doc_id", "text").collect()}

    for (i, text), ws in zip(rows, docs):
        words = [w for w in text.split() if w]
        for n in (5, 10):
            grams = [" ".join(words[j:j + n])
                     for j in range(len(words) - n + 1)]
            dup = sum(len(g) for g in grams) - sum(
                len(g) for g in set(grams))
            assert got[i][f"dup{n}_chars"] == dup, (i, n)
        for n in (2, 4):
            grams = [" ".join(words[j:j + n])
                     for j in range(len(words) - n + 1)]
            from collections import Counter
            cnt = Counter(grams)
            cover = max(
                (c * len(g) for g, c in cnt.items() if c >= 2),
                default=0,
            )
            assert got[i][f"top{n}_cover"] == cover, (i, n)
