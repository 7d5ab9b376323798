"""Gelly graph generators (operators/generators.py) vs brute-force
python edge sets — the reference generator tests
(flink-gelly/src/test/java/.../generator/*Test.java) assert the same
fixed small graphs."""

from __future__ import annotations

import pytest

from flink_efo_spark.operators.generators import (
    circulant_graph,
    complete_graph,
    cycle_graph,
    echo_graph,
    empty_graph,
    grid_graph,
    hypercube_graph,
    path_graph,
    rmat_graph,
    singleton_edge_graph,
    star_graph,
)


def _edges(pair):
    v, e = pair
    return (
        sorted(r.id for r in v.collect()),
        sorted((r.src, r.dst) for r in e.collect()),
    )


def test_complete_graph(spark):
    n = 5
    verts, edges = _edges(complete_graph(spark, n))
    assert verts == list(range(n))
    assert edges == sorted(
        (i, j) for i in range(n) for j in range(n) if i != j
    )


def test_circulant_graph_ranges(spark):
    # offsets {1, 2, 4} on 7 vertices via two ranges
    verts, edges = _edges(circulant_graph(spark, 7, [(1, 2), (4, 1)]))
    assert verts == list(range(7))
    assert edges == sorted(
        (i, (i + j) % 7) for i in range(7) for j in (1, 2, 4)
    )


def test_circulant_graph_preconditions(spark):
    with pytest.raises(ValueError, match="offset"):
        circulant_graph(spark, 5, [(0, 1)])
    with pytest.raises(ValueError, match="length"):
        circulant_graph(spark, 5, [(3, 3)])
    with pytest.raises(ValueError, match="Overlapping"):
        circulant_graph(spark, 7, [(1, 3), (2, 1)])


def test_echo_graph(spark):
    # the reference's parity rule: exactly one of (n, degree) even
    with pytest.raises(ValueError, match="even"):
        echo_graph(spark, 6, 2)
    verts, edges = _edges(echo_graph(spark, 5, 2))
    # circulant range ((5-2+1)/2, 2) = offsets {2, 3}
    assert edges == sorted(
        (i, (i + j) % 5) for i in range(5) for j in (2, 3)
    )


def test_cycle_and_path_graph(spark):
    _, cyc = _edges(cycle_graph(spark, 5))
    want = sorted(
        [(i, (i + 1) % 5) for i in range(5)]
        + [(i, (i - 1) % 5) for i in range(5)]
    )
    assert cyc == want
    _, path = _edges(path_graph(spark, 4))
    assert path == sorted(
        [(i, i + 1) for i in range(3)] + [(i + 1, i) for i in range(3)]
    )


def test_grid_graph_wrap_size2_duplicates(spark):
    # the reference documents duplicate edges when a wrapped dimension
    # has size 2 (wrap edge == the +/-1 edge)
    _, edges = _edges(grid_graph(spark, [(2, True)]))
    assert edges == [(0, 1), (0, 1), (1, 0), (1, 0)]


def test_grid_graph_2d(spark):
    _, edges = _edges(grid_graph(spark, [(2, False), (3, False)]))

    def neighbors():
        for r in range(2):
            for col in range(3):
                v = r * 3 + col
                if r > 0:
                    yield (v, v - 3)
                if r < 1:
                    yield (v, v + 3)
                if col > 0:
                    yield (v, v - 1)
                if col < 2:
                    yield (v, v + 1)

    assert edges == sorted(neighbors())


def test_hypercube_graph(spark):
    _, edges = _edges(hypercube_graph(spark, 3))
    want = sorted(
        (v, v ^ (1 << bit)) for v in range(8) for bit in range(3)
    )
    assert edges == want


def test_star_graph(spark):
    verts, edges = _edges(star_graph(spark, 4))
    assert verts == [0, 1, 2, 3]
    assert edges == sorted(
        [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    )


def test_singleton_edge_graph(spark):
    verts, edges = _edges(singleton_edge_graph(spark, 3))
    assert verts == list(range(6))
    assert edges == sorted(
        [(2 * i, 2 * i + 1) for i in range(3)]
        + [(2 * i + 1, 2 * i) for i in range(3)]
    )


def test_empty_graph(spark):
    verts, edges = _edges(empty_graph(spark, 3))
    assert verts == [0, 1, 2] and edges == []


def test_rmat_graph_shape_and_determinism(spark):
    v1, e1 = rmat_graph(spark, vertex_count=100, edge_count=500, seed=7)
    v2, e2 = rmat_graph(spark, vertex_count=100, edge_count=500, seed=7)
    rows1 = sorted((r.src, r.dst) for r in e1.collect())
    rows2 = sorted((r.src, r.dst) for r in e2.collect())
    assert rows1 == rows2  # seed-deterministic across runs
    assert len(rows1) == 500
    n = 128  # 2^ceil(log2(100))
    assert v1.count() == n
    assert all(0 <= s < n and 0 <= d < n for s, d in rows1)
    # a different seed moves the edges
    e3 = rmat_graph(spark, 100, 500, seed=8)[1]
    assert sorted((r.src, r.dst) for r in e3.collect()) != rows1
    # power-law skew: with Graph500 constants the low quadrant
    # dominates, so vertex 0's out-degree far exceeds the mean
    from collections import Counter

    deg = Counter(s for s, _ in rows1)
    assert deg[0] > 3 * (500 / n)


def test_rmat_repartition_invariant(spark):
    e = rmat_graph(spark, 64, 200, seed=3)[1]
    a = sorted((r.src, r.dst) for r in e.collect())
    b = sorted((r.src, r.dst) for r in e.repartition(13).collect())
    assert a == b
