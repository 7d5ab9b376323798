"""Connected-components duplicate clustering (operators/clustering.py).

Reference frame: the pipeline stage after MinHash/SimHash pair
generation — transitive closure so one doc per dup group survives.
"""

from __future__ import annotations

from flink_efo_spark.operators.clustering import (
    connected_components,
    dup_cluster_stats,
)


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, ["a", "b"])
    out = connected_components(df, "a", "b")
    return {r["node"]: r["cluster_id"] for r in out.collect()}


def test_two_disjoint_clusters(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_to_min(spark):
    # worst-case chain: label must propagate the full diameter
    chain = [(i, i + 1) for i in range(1, 12)]
    got = _cc(spark, chain)
    assert set(got.values()) == {1}
    assert len(got) == 12


def test_edge_direction_irrelevant(spark):
    # pairs arrive in arbitrary order/direction from the LSH stage
    got = _cc(spark, [(5, 2), (2, 9), (9, 5), (7, 9)])
    assert got == {2: 2, 5: 2, 9: 2, 7: 2}


def test_self_pairs_ignored(spark):
    got = _cc(spark, [(4, 4), (4, 6)])
    assert got == {4: 4, 6: 4}


def test_cluster_stats_keep_rule(spark):
    df = spark.createDataFrame([(3, 1), (3, 7), (20, 21)], ["a", "b"])
    stats = {
        r["cluster_id"]: (r["cluster_size"], r["keep_id"])
        for r in dup_cluster_stats(df, "a", "b").collect()
    }
    assert stats == {1: (3, 1), 20: (2, 20)}


def test_delta_iterate_bfs_fixed_graph(spark):
    """bfs_distances on a hand-built graph: a path 1-2-3-4-5 with a
    shortcut 1-4 — distances must take the shortcut, depth cap must
    truncate, and unreachable nodes must be absent."""
    from flink_efo_spark.operators.iterate import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (9, 10)],
        "src BIGINT, dst BIGINT",
    )
    # undirected
    edges = edges.union(edges.selectExpr("dst AS src", "src AS dst"))
    got = {
        (r.node, r.dist)
        for r in bfs_distances(edges, "src", "dst", [1], max_depth=2).collect()
    }
    assert got == {(1, 0), (2, 1), (4, 1), (3, 2), (5, 2)}  # 9,10 unreachable


def test_delta_iterate_workset_empties(spark):
    """delta_iterate stops when the step yields an empty workset
    (before max_rounds) and returns the accumulated solution."""
    from pyspark.sql import functions as F

    from flink_efo_spark.operators.iterate import delta_iterate

    init = spark.createDataFrame([(0, 0)], "node BIGINT, dist BIGINT")
    calls = []

    def step(sol, ws):
        calls.append(1)
        nxt = ws.select(
            (F.col("node") + 1).alias("node"), (F.col("dist") + 1).alias("dist")
        ).where(F.col("node") <= 2)
        return sol.unionByName(nxt), nxt

    out = delta_iterate(init, init, step, max_rounds=50)
    assert sorted((r.node, r.dist) for r in out.collect()) == [
        (0, 0), (1, 1), (2, 2),
    ]
    assert len(calls) == 3  # rounds 1..2 produce, round 3 empties


def test_pagerank_matches_python_reference(spark):
    """3-round exact-integer PageRank == a driver-side replay on a
    small digraph (dangling node included: it contributes nothing,
    receives base only if nothing points at it)."""
    from flink_efo_spark.operators.iterate import pagerank

    # node 4 has an out-edge but no in-edges: it must settle at base
    raw = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = {r.id: r.r for r in pagerank(df, n_iter=3).collect()}

    nodes = {n for e in raw for n in e}
    outd = {}
    for s, _ in raw:
        outd[s] = outd.get(s, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        nxt = {n: 150_000 for n in nodes}
        for s, d in raw:
            nxt[d] += (r[s] * 85) // (100 * outd[s])
        r = nxt
    assert got == r


def test_pagerank_repartition_invariant(spark):
    from flink_efo_spark.operators.iterate import pagerank

    raw = [((i * 7) % 23, (i * 11) % 23) for i in range(60)]
    df = spark.createDataFrame(raw, "src long, dst long")
    a = sorted(map(tuple, pagerank(df, n_iter=2).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(17), n_iter=2).collect()))
    assert a == b


def test_label_propagation_matches_python_reference(spark):
    """Gelly LabelPropagation semantics on a fixed digraph, replayed
    by a driver-side reference: per round a vertex arg-maxes
    (count, label) over its in-neighbor labels UNIONed with its OWN
    label at frequency 1 (UpdateVertexLabel's incumbent — a lone
    SMALLER in-neighbor label cannot displace it: node 7 below), and
    only vertices that received a message send next round (node 8
    has no in-edges — its label reaches node 4 in round 1 only)."""
    from flink_efo_spark.operators.iterate import label_propagation

    raw = [(1, 2), (3, 2), (3, 4), (2, 4), (4, 1), (5, 1), (6, 6),
           (1, 7), (8, 4)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = {r.id: r.label for r in label_propagation(df, n_iter=3).collect()}

    nodes = {n for e in raw for n in e}
    lab = {n: n for n in nodes}
    active = set(nodes)
    for _ in range(3):
        freq: dict = {}
        for s, d in raw:
            if s in active:
                freq.setdefault(d, {}).setdefault(lab[s], 0)
                freq[d][lab[s]] += 1
        nxt = dict(lab)
        for d, fl in freq.items():
            # incumbent: the vertex's own label seeds the contest at
            # frequency 1; winner = most frequent, ties to highest
            fl = dict(fl)
            fl[lab[d]] = max(fl.get(lab[d], 0), 1)
            nxt[d] = max(fl.items(), key=lambda kv: (kv[1], kv[0]))[0]
        lab = nxt
        active = set(freq)  # only message-receivers scatter next round
    assert got == lab
    # the incumbent case concretely (round 1, before greater labels
    # cascade): 7's lone in-neighbor label (1) is smaller, so 7 keeps
    # its own label — the old arg-max-over-messages variant adopted 1
    got1 = {r.id: r.label for r in label_propagation(df, n_iter=1).collect()}
    assert got1[7] == 7


def test_label_propagation_repartition_invariant(spark):
    from flink_efo_spark.operators.iterate import label_propagation

    raw = [((i * 5) % 19, (i * 13) % 19) for i in range(50)]
    df = spark.createDataFrame(raw, "src long, dst long")
    a = sorted(map(tuple, label_propagation(df, n_iter=2).collect()))
    b = sorted(
        map(tuple, label_propagation(df.repartition(13), n_iter=2).collect())
    )
    assert a == b


def test_sssp_matches_bellman_ford(spark):
    """Gelly SingleSourceShortestPaths semantics: frontier-driven
    Bellman-Ford; after k rounds = exact min dist over <= k edges."""
    from flink_efo_spark.operators.iterate import sssp_distances

    # weighted digraph with a longer-but-later-improving path:
    # 1->2 (10), 1->3 (1), 3->2 (2)  => dist(2) improves 10 -> 3
    raw = [(1, 2, 10), (1, 3, 1), (3, 2, 2), (2, 4, 1), (5, 1, 7),
           (1, 2, 99)]  # parallel edge: min weight wins
    df = spark.createDataFrame(raw, "src long, dst long, w long")

    def bf(k):
        dist = {1: 0}
        for _ in range(k):
            nxt = dict(dist)
            for s, d, w in raw:
                if s in dist and dist[s] + w < nxt.get(d, 1 << 60):
                    nxt[d] = dist[s] + w
            dist = nxt
        return dist

    for k in (1, 2, 3, 4):
        got = {
            r.node: r.dist
            for r in sssp_distances(df, "src", "dst", "w", 1, k).collect()
        }
        assert got == bf(k), f"round {k}"


def test_triangle_enumerate_fixed_graph(spark):
    """Each triangle exactly once as (a < b < c); reversed/duplicate
    edges and self-loops are canonicalized away."""
    from flink_efo_spark.operators.iterate import triangle_enumerate

    # triangles: (1,2,3), (2,3,4); plus a dangling edge and noise
    raw = [(1, 2), (2, 3), (3, 1), (2, 4), (3, 4), (4, 5),
           (2, 1), (3, 3), (1, 2)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = sorted(
        tuple(r) for r in triangle_enumerate(df, "src", "dst").collect()
    )
    assert got == [(1, 2, 3), (2, 3, 4)]


def test_triangle_enumerate_complete_graph(spark):
    """K5 has C(5,3)=10 triangles — the degree-tie path (all degrees
    equal) must still emit each exactly once."""
    from itertools import combinations

    from flink_efo_spark.operators.iterate import triangle_enumerate

    raw = [(a, b) for a, b in combinations(range(1, 6), 2)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = sorted(
        tuple(r) for r in triangle_enumerate(df, "src", "dst").collect()
    )
    assert got == sorted(combinations(range(1, 6), 3))


def test_jaccard_index_matches_python_reference(spark):
    """Gelly JaccardIndex semantics (library/similarity/
    JaccardIndex.java) on a fixed undirected graph: every pair with a
    shared neighbor, shared = |N(a) ∩ N(b)|, distinct = |N(a) ∪ N(b)|;
    duplicate edges / self-loops in the input are canonicalized away."""
    from flink_efo_spark.operators.iterate import jaccard_index

    raw = [(1, 2), (1, 3), (2, 3), (3, 4), (2, 1), (4, 4), (2, 4)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = {
        (r.v0, r.v1): (r.shared_count, r.distinct_count, round(r.jaccard, 9))
        for r in jaccard_index(df).collect()
    }

    nbr: dict = {}
    for s, d in raw:
        if s == d:
            continue
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    want = {}
    ns = sorted(nbr)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            sh = len(nbr[a] & nbr[b])
            if sh:
                di = len(nbr[a] | nbr[b])
                want[(a, b)] = (sh, di, round(sh / di, 9))
    assert got == want


def test_adamic_adar_matches_python_reference(spark):
    """Gelly AdamicAdar semantics (library/similarity/AdamicAdar.java):
    score(a, b) = sum over shared neighbors w of 1/ln(deg(w))."""
    import math

    from flink_efo_spark.operators.iterate import adamic_adar

    raw = [(1, 2), (1, 3), (2, 3), (3, 4), (2, 4), (4, 5), (1, 5)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = {
        (r.v0, r.v1): round(r.score, 9) for r in adamic_adar(df).collect()
    }

    nbr: dict = {}
    for s, d in raw:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    want = {}
    ns = sorted(nbr)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            shared = nbr[a] & nbr[b]
            if shared:
                want[(a, b)] = round(
                    sum(1.0 / math.log(len(nbr[w])) for w in shared), 9
                )
    assert got == want


def test_graph_similarity_repartition_invariant(spark):
    from flink_efo_spark.operators.iterate import adamic_adar, jaccard_index

    raw = [((i * 7) % 17, (i * 5 + 1) % 17) for i in range(40)]
    df = spark.createDataFrame(raw, "src long, dst long")
    a = sorted(map(tuple, jaccard_index(df).collect()))
    b = sorted(map(tuple, jaccard_index(df.repartition(11)).collect()))
    assert a == b
    c = sorted((r.v0, r.v1, round(r.score, 9)) for r in adamic_adar(df).collect())
    d = sorted(
        (r.v0, r.v1, round(r.score, 9))
        for r in adamic_adar(df.repartition(11)).collect()
    )
    assert c == d


def test_hits_matches_python_reference(spark):
    """Gelly HITS semantics (library/linkanalysis/HITS.java), replayed
    exactly: initial authority = in-degree (hub 0, non-normalized);
    per round hub(u) = sum auth over out-edge targets, auth(v) = sum
    of the still-un-normalized hub over in-edge sources, then a joint
    L2 normalization (missing side of the full outer join = 0)."""
    import math

    from flink_efo_spark.operators.iterate import hits

    raw = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 2), (5, 4)]
    df = spark.createDataFrame(raw, "src long, dst long")

    def reference(edges, n_iter):
        auth = {}
        for _, d in edges:
            auth[d] = auth.get(d, 0.0) + 1.0
        hub: dict = {}
        for _ in range(n_iter):
            hub = {}
            for s, d in edges:
                if d in auth:
                    hub[s] = hub.get(s, 0.0) + auth[d]
            auth = {}
            for s, d in edges:
                if s in hub:
                    auth[d] = auth.get(d, 0.0) + hub[s]
            nh = math.sqrt(sum(x * x for x in hub.values()))
            na = math.sqrt(sum(x * x for x in auth.values()))
            ids = set(hub) | set(auth)
            hub = {i: hub.get(i, 0.0) / nh for i in ids}
            auth = {i: auth.get(i, 0.0) / na for i in ids}
        return {i: (round(hub[i], 9), round(auth[i], 9)) for i in ids}

    for n_iter in (1, 3):
        got = {
            r.id: (round(r.hub, 9), round(r.authority, 9))
            for r in hits(df, n_iter=n_iter).collect()
        }
        assert got == reference(raw, n_iter), f"n_iter={n_iter}"


def test_hits_repartition_invariant(spark):
    from flink_efo_spark.operators.iterate import hits

    raw = [((i * 7) % 13, (i * 5 + 1) % 13) for i in range(30)]
    df = spark.createDataFrame(raw, "src long, dst long")
    a = sorted(
        (r.id, round(r.hub, 6), round(r.authority, 6))
        for r in hits(df, n_iter=2).collect()
    )
    b = sorted(
        (r.id, round(r.hub, 6), round(r.authority, 6))
        for r in hits(df.repartition(7), n_iter=2).collect()
    )
    assert a == b


def test_local_clustering_coefficient_matches_python_reference(spark):
    """Gelly undirected LocalClusteringCoefficient semantics: per
    vertex (degree, #triangles containing it); score = triangles /
    C(degree, 2), NULL for degree <= 1 (the reference's NaN). K4 plus
    a pendant: the attachment vertex 4 has degree 4 but only the 3
    K4-internal neighbor edges -> 3/6, the pendant 5 has degree 1 ->
    NULL; everything checked against a brute-force reference below;
    duplicate/reversed edges and self-loops canonicalize away."""
    from itertools import combinations

    from flink_efo_spark.operators.iterate import local_clustering_coefficient

    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
           (2, 1), (5, 5)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = {
        r.id: (
            r.degree,
            r.triangle_count,
            None if r.coefficient is None else round(r.coefficient, 9),
        )
        for r in local_clustering_coefficient(df).collect()
    }

    nbr: dict = {}
    for s, d in raw:
        if s == d:
            continue
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    want = {}
    for v, ns in nbr.items():
        tri = sum(
            1 for a, b in combinations(sorted(ns), 2) if b in nbr.get(a, ())
        )
        deg = len(ns)
        pairs = deg * (deg - 1) // 2
        want[v] = (deg, tri, round(tri / pairs, 9) if pairs else None)
    assert got == want


def test_community_detection_matches_python_reference(spark):
    """Gelly CommunityDetection semantics (library/
    CommunityDetection.java): undirected weighted messages
    (label, score*w); winner = highest summed score, ties to the
    LOWEST label (TreeMap ascending + strict >); new score = winner's
    highest single message score, minus delta/superstep on a label
    change; scatter-gather activation (senders = last round's
    receivers)."""
    from flink_efo_spark.operators.iterate import community_detection

    raw = [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0), (4, 5, 3.0),
           (5, 1, 1.0), (2, 4, 0.5), (6, 7, 1.0)]
    df = spark.createDataFrame(raw, "src long, dst long, w double")

    def reference(n_iter, delta):
        adj = []
        for s, d, w in raw:
            adj.append((s, d, w))
            adj.append((d, s, w))
        vs = sorted({v for s, d, _ in raw for v in (s, d)})
        state = {v: (v, 1.0) for v in vs}
        act = set(vs)
        for k in range(1, n_iter + 1):
            msgs: dict = {}
            for s, d, w in adj:
                if s in act:
                    lbl, sc = state[s]
                    msgs.setdefault(d, []).append((lbl, sc * w))
            new_state = dict(state)
            new_act = set()
            for v, ms in msgs.items():
                sums: dict = {}
                maxs: dict = {}
                for lbl, s in ms:
                    sums[lbl] = sums.get(lbl, 0.0) + s
                    maxs[lbl] = max(maxs.get(lbl, float("-inf")), s)
                win = min(sums, key=lambda lb: (-sums[lb], lb))
                hs = maxs[win]
                if win != state[v][0]:
                    hs -= delta / k
                new_state[v] = (win, hs)
                new_act.add(v)
            state, act = new_state, new_act
        return {v: lbl for v, (lbl, _) in state.items()}

    for n_iter in (1, 3):
        got = {
            r.id: r.label
            for r in community_detection(
                df, weight="w", n_iter=n_iter
            ).collect()
        }
        assert got == reference(n_iter, 0.5), f"n_iter={n_iter}"


def test_summarize_graph_matches_reference_example(spark):
    """Summarization.java's own javadoc example, with the documented
    'any member' representative pinned to the minimum member id."""
    from flink_efo_spark.operators.iterate import summarize_graph

    vs = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "B"), (3, "B")], "id long, value string"
    )
    es = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)],
        "src long, dst long",
    )
    sv, se = summarize_graph(vs, es)
    assert {(r.id, r.value, r["count"]) for r in sv.collect()} == {
        (0, "A", 2), (2, "B", 2)
    }
    assert {(r.src, r.dst, r["count"]) for r in se.collect()} == {
        (0, 0, 2), (2, 2, 2), (0, 2, 1), (2, 0, 1)
    }


def test_global_and_average_clustering_coefficient(spark):
    """GlobalClusteringCoefficient: 3*triangles / sum-of-C(deg,2)
    triplets; AverageClusteringCoefficient: local scores of deg>1
    vertices summed over ALL vertices. Brute-forced on K4+pendant."""
    from itertools import combinations

    from flink_efo_spark.operators.iterate import (
        average_clustering_coefficient,
        global_clustering_coefficient,
    )

    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(raw, "src long, dst long")
    nbr: dict = {}
    for s, d in raw:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    tri_total = sum(
        1
        for a, b, c in combinations(sorted(nbr), 3)
        if b in nbr[a] and c in nbr[a] and c in nbr[b]
    )
    triplets = sum(len(ns) * (len(ns) - 1) // 2 for ns in nbr.values())

    g = global_clustering_coefficient(df).collect()[0]
    assert (g.triplet_count, g.triangle_count) == (triplets, tri_total)
    assert round(g.coefficient, 9) == round(3 * tri_total / triplets, 9)

    local_sum = 0.0
    for v, ns in nbr.items():
        deg = len(ns)
        if deg > 1:
            t = sum(
                1
                for a, b in combinations(sorted(ns), 2)
                if b in nbr.get(a, ())
            )
            local_sum += t / (deg * (deg - 1) / 2)
    a = average_clustering_coefficient(df).collect()[0]
    assert a.vertex_count == len(nbr)
    assert round(a.average_coefficient, 9) == round(local_sum / len(nbr), 9)


def test_triadic_census_matches_brute_force(spark):
    """TriadicCensus.java's closed form == brute-force enumeration of
    all vertex triples on K4+pendant plus an extra disjoint edge."""
    from itertools import combinations

    from flink_efo_spark.operators.iterate import triadic_census

    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
           (6, 7)]
    df = spark.createDataFrame(raw, "src long, dst long")
    es = {tuple(sorted(e)) for e in raw}
    vs = sorted({v for e in raw for v in e})
    want = [0, 0, 0, 0]
    for t in combinations(vs, 3):
        k = sum(
            1 for a, b in combinations(t, 2) if (a, b) in es
        )
        want[k] += 1
    r = triadic_census(df).collect()[0]
    assert [int(r.t0), int(r.t1), int(r.t2), int(r.t3)] == want


def test_bipartite_projection_matches_reference_semantics(spark):
    """BipartiteGraph.java projection semantics: one projected edge
    per (ordered distinct pair, shared counterpart) — a multigraph in
    both directions, with the two incident edge values (simple) and
    the connecting vertex (full)."""
    from flink_efo_spark.operators.iterate import bipartite_projection

    raw = [(1, 10, "a"), (2, 10, "b"), (3, 10, "c"), (1, 20, "d"),
           (2, 20, "e"), (4, 30, "f")]
    df = spark.createDataFrame(raw, "top long, bottom long, ev string")

    got = sorted(
        (r.src, r.dst, r.link, r.ev0, r.ev1)
        for r in bipartite_projection(
            df, edge_value="ev", side="top", full=True
        ).collect()
    )
    want = sorted(
        (a, b, k, e1, e2)
        for (a, k, e1) in [(t, bo, e) for t, bo, e in raw]
        for (b, k2, e2) in [(t, bo, e) for t, bo, e in raw]
        if k == k2 and a != b
    )
    assert got == want

    # bottom projection, simple: 10-20 share tops 1 and 2 -> two
    # parallel edges each direction; 30 shares nothing
    bot = sorted(
        (r.src, r.dst)
        for r in bipartite_projection(df, side="bottom").collect()
    )
    assert bot == [(10, 20), (10, 20), (20, 10), (20, 10)]


def test_vertex_metrics_matches_brute_force(spark):
    from flink_efo_spark.operators.iterate import vertex_metrics

    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (2, 1), (5, 5)]
    df = spark.createDataFrame(raw, "src long, dst long")
    nbr: dict = {}
    for s, d in raw:
        if s == d:
            continue
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    degs = {v: len(ns) for v, ns in nbr.items()}
    r = vertex_metrics(df).collect()[0]
    assert r.vertex_count == len(nbr)
    assert r.edge_count == sum(degs.values()) // 2
    assert r.triplet_count == sum(d * (d - 1) // 2 for d in degs.values())
    assert r.maximum_degree == max(degs.values())
    assert r.maximum_triplets == max(
        d * (d - 1) // 2 for d in degs.values()
    )


def test_similarity_max_pivot_degree_cut(spark):
    """max_pivot_degree excludes hub pivots from pair generation:
    default None stays exact (reference semantics); with the cut, a
    hub's pairs disappear while low-degree pivots still contribute,
    and Jaccard's union denominator stays the exact degrees."""
    from flink_efo_spark.operators.iterate import adamic_adar, jaccard_index

    # hub 99 connects 1..4; besides, 1-2 share low-degree pivot 5
    raw = [(99, 1), (99, 2), (99, 3), (99, 4), (5, 1), (5, 2)]
    df = spark.createDataFrame(raw, "src long, dst long")

    exact = {
        (r.v0, r.v1): (r.shared_count, r.distinct_count)
        for r in jaccard_index(df).collect()
    }
    assert exact[(1, 2)] == (2, 2)      # pivots 99 and 5; N(1)=N(2)={99,5}
    assert (3, 4) in exact              # via hub only

    cut = {
        (r.v0, r.v1): (r.shared_count, r.distinct_count)
        for r in jaccard_index(df, max_pivot_degree=2).collect()
    }
    assert (3, 4) not in cut            # hub fan-out removed
    assert cut[(1, 2)] == (1, 3)        # shared drops to pivot 5 only;
                                        # distinct = deg sum - shared
                                        # overestimates the union, so
                                        # jaccard is a lower bound

    aa = {
        (r.v0, r.v1)
        for r in adamic_adar(df, max_pivot_degree=2).collect()
    }
    assert (3, 4) not in aa and (1, 2) in aa


def test_directed_clustering_family_matches_brute_force(spark):
    """Directed LCC (clustering/directed/LocalClusteringCoefficient:
    directed edges between distinct neighbors over deg*(deg-1), the
    bitmask-2-credit semantics), directed ACC, and directed
    VertexMetrics (uni/bidirectional halved sums, distinct-neighbor
    triplets) against brute force on a graph with one bidirectional
    pair."""
    from itertools import combinations

    from flink_efo_spark.operators.iterate import (
        average_clustering_coefficient_directed,
        local_clustering_coefficient_directed,
        vertex_metrics_directed,
    )

    raw = [(1, 2), (2, 1), (1, 3), (3, 2), (2, 4), (4, 5), (5, 4),
           (1, 1)]
    df = spark.createDataFrame(raw, "src long, dst long")
    ded = {(s, d) for s, d in raw if s != d}
    nbr: dict = {}
    for s, d in ded:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)

    want_lcc = {}
    for v, ns in nbr.items():
        cnt = sum(
            ((a, b) in ded) + ((b, a) in ded)
            for a, b in combinations(sorted(ns), 2)
        )
        deg = len(ns)
        want_lcc[v] = (
            deg,
            cnt,
            round(cnt / (deg * (deg - 1)), 9) if deg > 1 else None,
        )
    got = {
        r.id: (
            r.degree,
            r.directed_edge_count,
            None if r.coefficient is None else round(r.coefficient, 9),
        )
        for r in local_clustering_coefficient_directed(df).collect()
    }
    assert got == want_lcc

    acc = average_clustering_coefficient_directed(df).collect()[0]
    want_sum = sum(c for _, _, c in want_lcc.values() if c is not None)
    assert acc.vertex_count == len(nbr)
    assert round(acc.average_coefficient, 9) == round(
        want_sum / len(nbr), 9
    )

    m = vertex_metrics_directed(df).collect()[0]
    outs = {v: {d for s, d in ded if s == v} for v in nbr}
    ins = {v: {s for s, d in ded if d == v} for v in nbr}
    bidir_pairs = {
        (min(s, d), max(s, d)) for s, d in ded if (d, s) in ded
    }
    und = {(min(s, d), max(s, d)) for s, d in ded}
    assert m.vertex_count == len(nbr)
    assert m.bidirectional_edge_count == len(bidir_pairs)
    assert m.unidirectional_edge_count == len(und) - len(bidir_pairs)
    assert m.triplet_count == sum(
        len(ns) * (len(ns) - 1) // 2 for ns in nbr.values()
    )
    assert m.maximum_degree == max(len(ns) for ns in nbr.values())
    assert m.maximum_out_degree == max(len(outs[v]) for v in nbr)
    assert m.maximum_in_degree == max(len(ins[v]) for v in nbr)
    assert m.maximum_triplets == max(
        len(ns) * (len(ns) - 1) // 2 for ns in nbr.values()
    )


def test_edge_metrics_matches_brute_force(spark):
    """EdgeMetrics.java: per vertex, low = incident edges where it is
    the lower-(degree, id) endpoint; triangle triplets = C(low, 2),
    rectangle triplets = C(low, 2) + low*high; global sums and maxes.
    The triangle-triplet sum must equal the actual 2-path fan-out of
    the compact-forward orientation."""
    from flink_efo_spark.operators.iterate import edge_metrics

    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
           (2, 1)]
    df = spark.createDataFrame(raw, "src long, dst long")
    es = {(min(s, d), max(s, d)) for s, d in raw if s != d}
    deg: dict = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    low = {v: 0 for v in deg}
    for a, b in es:
        lo = a if (deg[a], a) < (deg[b], b) else b
        low[lo] += 1
    tri = {v: low[v] * (low[v] - 1) // 2 for v in deg}
    rect = {v: tri[v] + low[v] * (deg[v] - low[v]) for v in deg}
    r = edge_metrics(df).collect()[0]
    assert r.triangle_triplet_count == sum(tri.values())
    assert r.rectangle_triplet_count == sum(rect.values())
    assert r.maximum_triangle_triplets == max(tri.values())
    assert r.maximum_rectangle_triplets == max(rect.values())


def test_directed_triadic_census_matches_brute_force(spark):
    """Directed TriadicCensus.java: the 16 Batagelj-Mrvar classes.
    Ground truth enumerates ALL vertex triples and classifies each
    through the labeled-triad type table (the public table the
    reference cites); the operator under test derives 9 of the 16
    classes ARITHMETICALLY from degrees and edge counts, so agreement
    checks that closed form, not just the table."""
    from itertools import combinations

    from flink_efo_spark.operators.iterate import (
        _TRIAD_TYPE_TABLE,
        triadic_census_directed,
    )

    raw = [(1, 2), (2, 1), (1, 3), (3, 2), (2, 4), (4, 5), (5, 4),
           (5, 1), (3, 4), (6, 7), (1, 4), (4, 1), (2, 3), (7, 8),
           (8, 6), (5, 3)]
    df = spark.createDataFrame(raw, "src long, dst long")
    ded = {(s, d) for s, d in raw if s != d}
    vs = sorted({v for e in ded for v in e})

    def group(x, y):
        return 2 * ((x, y) in ded) + ((y, x) in ded)

    counts = [0] * 17
    for a, b, c in combinations(vs, 3):
        mask = group(a, b) * 16 + group(a, c) * 4 + group(b, c)
        counts[_TRIAD_TYPE_TABLE[mask]] += 1

    labels = ["t003", "t012", "t102", "t021d", "t021u", "t021c",
              "t111d", "t111u", "t030t", "t030c", "t201", "t120d",
              "t120u", "t120c", "t210", "t300"]
    r = triadic_census_directed(df).collect()[0]
    got = [int(r[lbl]) for lbl in labels]
    assert got == counts[1:], dict(zip(labels, zip(got, counts[1:])))
    assert sum(got) == len(vs) * (len(vs) - 1) * (len(vs) - 2) // 6


def test_hits_rejects_zero_iterations(spark):
    """Reference parity (HITS.java Preconditions.checkArgument
    iterations > 0): n_iter < 1 raises ValueError instead of an
    AnalysisException on the missing hub column."""
    import pytest

    from flink_efo_spark.operators.iterate import hits

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        hits(df, n_iter=0)


def test_vertex_centric_reproduces_gsa_connected_components(spark):
    """The pregel/VertexCentricIteration.java programming model via
    iterate.vertex_centric reproduces GSAConnectedComponents.java:
    gather = neighbor value, sum = min, apply = min(current, gathered)
    on the symmetrized edge set; converges to the min vertex id per
    weakly-connected component."""
    from pyspark.sql import functions as F

    from flink_efo_spark.operators.iterate import vertex_centric

    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} via
    # self-loop-free isolation is impossible (edge list), so {20,21}
    raw = [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (21, 20)]
    e = spark.createDataFrame(raw, "src long, dst long")
    und = e.union(e.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst")))
    v = (und.select(F.col("src").alias("id"))
         .union(und.select(F.col("dst").alias("id")))
         .distinct()
         .select("id", F.col("id").alias("value")))
    out = vertex_centric(
        v, und,
        send_msg=F.col("value"),
        combine_msg=F.min,
        apply_fn=F.least,
        max_rounds=10,
    )
    got = {r.id: r.value for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_gather_sum_apply_sssp_matches_reference(spark):
    """GSASingleSourceShortestPaths.java via iterate.gather_sum_apply:
    gather = source distance + edge weight, sum = min, apply =
    min(current, candidate); unreachable vertices keep Infinity (the
    reference's InitVerticesMapper seed)."""
    import math

    from pyspark.sql import functions as F

    from flink_efo_spark.operators.iterate import gather_sum_apply

    raw = [(1, 2, 1.0), (1, 3, 4.0), (2, 3, 1.5), (3, 4, 1.0),
           (4, 2, 0.25), (5, 6, 1.0)]  # 5,6 unreachable from 1
    e = spark.createDataFrame(raw, "src long, dst long, w double")
    v = (e.select(F.col("src").alias("id"))
         .union(e.select(F.col("dst").alias("id")))
         .distinct()
         .select(
             "id",
             F.when(F.col("id") == 1, F.lit(0.0))
             .otherwise(F.lit(float("inf"))).alias("value")))
    out = gather_sum_apply(
        v, e,
        gather=F.col("value") + F.col("w"),
        sum_fn=F.min,
        apply_fn=F.least,
        max_rounds=10,
    )
    got = {r.id: r.value for r in out.collect()}
    assert got[1] == 0.0 and got[2] == 1.0 and got[3] == 2.5
    assert got[4] == 3.5
    assert math.isinf(got[5]) and math.isinf(got[6])


def test_triangle_listing_bitmask_matches_brute_force(spark):
    """Directed TriangleListing (clustering/directed/
    TriangleListing.java): per-triangle 6-bit masks vs a brute-force
    enumeration, and the mask histogram classified through the
    Batagelj-Mrvar table equals triadic_census_directed's closed-triad
    row on the same graph."""
    from itertools import combinations

    from flink_efo_spark.operators.iterate import (
        _TRIAD_TYPE_TABLE,
        _TRIANGLE_CLASSES,
        triadic_census_directed,
        triangle_listing,
    )

    # all direction flavors: uni fwd, uni rev, mutual; plus a dupe and
    # a self-loop that must be normalized away
    raw = [(1, 2), (2, 3), (1, 3), (3, 1),          # tri 1-2-3, mixed
           (4, 5), (5, 4), (5, 6), (6, 4),          # tri 4-5-6
           (7, 8), (8, 9), (9, 7),                  # 3-cycle 7-8-9
           (1, 2), (4, 4)]                          # dupe + self-loop
    df = spark.createDataFrame(raw, "src long, dst long")

    edges = {(s, d) for s, d in raw if s != d}

    def group(u, v):  # 2-bit group for ID-ordered pair (u < v)
        return ((u, v) in edges) * 2 + ((v, u) in edges)

    verts = sorted({x for e in edges for x in e})
    expected = {}
    for a, b, c in combinations(verts, 3):
        if group(a, b) and group(a, c) and group(b, c):
            expected[(a, b, c)] = (
                group(a, b) * 16 + group(a, c) * 4 + group(b, c)
            )

    rows = triangle_listing(df).collect()
    got = {
        (r.vertex_id_0, r.vertex_id_1, r.vertex_id_2): r.bitmask
        for r in rows
    }
    assert got == expected
    assert len(rows) == len(got)  # one row per triangle, no permutes

    # census cross-check on the closed classes
    hist: dict = {}
    for mask in got.values():
        lbl = _TRIANGLE_CLASSES[_TRIAD_TYPE_TABLE[mask]]
        hist[lbl] = hist.get(lbl, 0) + 1
    census = triadic_census_directed(df).collect()[0]
    for lbl in ("030t", "030c", "120d", "120u", "120c", "210", "300"):
        assert int(census[f"t{lbl}"]) == hist.get(lbl, 0), lbl


def test_scatter_gather_alias_sssp(spark):
    """The spargel naming (ScatterGatherIteration.java) runs the same
    dataflow: SSSP via scatter_gather equals the GSA run."""
    from pyspark.sql import functions as F

    from flink_efo_spark.operators.iterate import (
        gather_sum_apply,
        scatter_gather,
    )

    raw = [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 5.0)]
    e = spark.createDataFrame(raw, "src long, dst long, w double")
    v = (e.select(F.col("src").alias("id"))
         .union(e.select(F.col("dst").alias("id")))
         .distinct()
         .select("id", F.when(F.col("id") == 1, 0.0)
                 .otherwise(float("inf")).alias("value")))
    a = {r.id: r.value for r in scatter_gather(
        v, e, F.col("value") + F.col("w"), F.min, F.least, 5).collect()}
    b = {r.id: r.value for r in gather_sum_apply(
        v, e, F.col("value") + F.col("w"), F.min, F.least, 5).collect()}
    assert a == b == {1: 0.0, 2: 1.0, 3: 3.0}
