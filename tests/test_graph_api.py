"""Gelly Graph API surface (operators/graph.py vs Graph.java) — the
reference's GraphOperationsITCase / JoinWithVerticesITCase /
ReduceOnEdgesMethodsITCase fixed-graph style."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_efo_spark.operators.graph import ALL, IN, OUT, Graph


def _g(spark):
    v = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id long, value long"
    )
    e = spark.createDataFrame(
        [(1, 2, 12), (2, 3, 23), (3, 1, 31), (3, 4, 34)],
        "src long, dst long, value long",
    )
    return Graph(v, e)


def _vs(g):
    return sorted((r.id, r.value) for r in g.vertices.collect())


def _es(g):
    return sorted((r.src, r.dst, r.value) for r in g.edges.collect())


def test_from_edges_and_validate(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    g = Graph.from_edges(e, vertex_value=F.col("id") * 100)
    assert _vs(g) == [(1, 100), (2, 200), (3, 300)]
    assert g.validate()
    bad = Graph(
        spark.createDataFrame([(1,)], "id long"),
        spark.createDataFrame([(1, 9)], "src long, dst long"),
    )
    assert not bad.validate()


def test_map_translate_join(spark):
    g = _g(spark)
    assert _vs(g.map_vertices(F.col("value") + 1)) == [
        (1, 11), (2, 21), (3, 31), (4, 41)]
    assert _es(g.map_edges(F.col("value") * 2))[0] == (1, 2, 24)
    t = g.translate_graph_ids(lambda c: c + 100)
    assert _vs(t)[0] == (101, 10) and _es(t)[0] == (101, 102, 12)
    j = g.join_with_vertices(
        spark.createDataFrame([(1, 5), (9, 9)], "id long, val long"),
        lambda old, new: old + new,
    )
    # unmatched vertices keep their value; unknown input ids ignored
    assert _vs(j) == [(1, 15), (2, 20), (3, 30), (4, 40)]
    je = g.join_with_edges_on_source(
        spark.createDataFrame([(3, 1000)], "id long, val long"),
        lambda old, new: old + new,
    )
    assert _es(je) == [(1, 2, 12), (2, 3, 23), (3, 1, 1031), (3, 4, 1034)]


def test_filters_and_subgraph(spark):
    g = _g(spark)
    fv = g.filter_on_vertices(F.col("id") != 4)
    # edge (3,4) loses an endpoint and is dropped
    assert _es(fv) == [(1, 2, 12), (2, 3, 23), (3, 1, 31)]
    fe = g.filter_on_edges(F.col("value") > 20)
    assert _vs(fe) == _vs(g)  # vertices untouched
    assert _es(fe) == [(2, 3, 23), (3, 1, 31), (3, 4, 34)]
    sg = g.subgraph(F.col("id") <= 3, F.col("value") != 23)
    assert _es(sg) == [(1, 2, 12), (3, 1, 31)]


def test_degrees_include_isolated(spark):
    v = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    e = spark.createDataFrame([(1, 2, None)], "src long, dst long, value string")
    g = Graph(v, e)
    assert sorted(tuple(r) for r in g.out_degrees().collect()) == [
        (1, 1), (2, 0), (3, 0)]
    assert sorted(tuple(r) for r in g.in_degrees().collect()) == [
        (1, 0), (2, 1), (3, 0)]
    assert sorted(tuple(r) for r in g.get_degrees().collect()) == [
        (1, 1), (2, 1), (3, 0)]


def test_undirected_reverse_triplets(spark):
    g = _g(spark)
    assert len(_es(g.get_undirected())) == 8  # duplicates kept
    assert _es(g.reverse())[0] == (1, 3, 31)
    trip = sorted(
        tuple(r) for r in g.get_triplets().collect()
    )
    assert (1, 2, 10, 20, 12) in trip and len(trip) == 4


def test_mutations(spark):
    g = _g(spark)
    av = g.add_vertices(
        spark.createDataFrame([(4, 999), (5, 50)], "id long, value long")
    )
    # existing id 4 keeps its old value (the reference's rule)
    assert _vs(av) == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]
    rv = g.remove_vertices(spark.createDataFrame([(3,)], "id long"))
    assert _vs(rv) == [(1, 10), (2, 20), (4, 40)]
    assert _es(rv) == [(1, 2, 12)]  # 3's incident edges dropped
    ae = g.add_edges(
        spark.createDataFrame(
            [(4, 1, 41), (9, 1, 91)], "src long, dst long, value long"
        )
    )
    # the (9, 1) edge has no source vertex -> not added
    assert _es(ae) == [(1, 2, 12), (2, 3, 23), (3, 1, 31), (3, 4, 34),
                       (4, 1, 41)]
    re_ = g.remove_edges(spark.createDataFrame([(3, 1)], "src long, dst long"))
    assert _es(re_) == [(1, 2, 12), (2, 3, 23), (3, 4, 34)]


def test_union_difference_intersect(spark):
    g = _g(spark)
    other = Graph(
        spark.createDataFrame([(3, 33), (5, 50)], "id long, value long"),
        spark.createDataFrame(
            [(3, 1, 31), (3, 1, 31), (5, 3, 53)],
            "src long, dst long, value long",
        ),
    )
    u = g.union(other)
    assert len(_vs(u)) == 5  # distinct vertices
    assert len(_es(u)) == 7  # edge multiset maintained
    d = g.difference(other)
    assert _vs(d) == [(1, 10), (2, 20), (4, 40)]
    assert _es(d) == [(1, 2, 12)]
    i1 = g.intersect(other, distinct_edges=True)
    assert _es(i1) == [(3, 1, 31)]
    assert sorted(r.id for r in i1.vertices.collect()) == [1, 3]
    i2 = g.intersect(other, distinct_edges=False)
    # one matching pair (left has 1 copy, right 2): both pair members
    # emitted -> multiplicity 2 * min(1, 2) = 2
    assert _es(i2) == [(3, 1, 31), (3, 1, 31)]


def test_reduce_on_edges_and_neighbors(spark):
    g = _g(spark)
    out_min = {
        r.id: r.reduced for r in g.reduce_on_edges(F.min, OUT).collect()
    }
    assert out_min == {1: 12, 2: 23, 3: 31}
    in_max = {
        r.id: r.reduced for r in g.reduce_on_edges(F.max, IN).collect()
    }
    assert in_max == {1: 31, 2: 12, 3: 23, 4: 34}
    all_sum = {
        r.id: r.reduced for r in g.reduce_on_edges(F.sum, ALL).collect()
    }
    assert all_sum == {1: 43, 2: 35, 3: 88, 4: 34}
    nb = {
        r.id: r.reduced
        for r in g.reduce_on_neighbors(F.sum, ALL).collect()
    }
    # neighbors of 3: in {2}, out {1, 4} -> 20 + 10 + 40
    assert nb[3] == 70 and nb[4] == 30
    with pytest.raises(ValueError, match="direction"):
        g.reduce_on_edges(F.min, "sideways")


def test_run_vertex_centric_on_graph(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (5, 6), (6, 5)],
        "src long, dst long",
    )
    g = Graph.from_edges(e, vertex_value=F.col("id"))
    cc = g.run_vertex_centric(
        send_msg=F.col("value"),
        combine_msg=F.min,
        apply_fn=F.least,
        max_rounds=10,
    )
    assert _vs(cc) == [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)]
