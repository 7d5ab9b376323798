"""The Gelly ``Graph`` API surface
(flink-gelly/.../graph/Graph.java) as a thin, immutable wrapper over
two DataFrames — ``vertices (id, value)`` and ``edges (src, dst,
value)`` — so a program written against Gelly's Graph methods ports
line for line. Hooks are Catalyst Column expressions (mapVertices'
MapFunction becomes a Column over the vertex row, etc.), so every
method stays a declarative plan: nothing here collects, loops, or
leaves whole-stage codegen.

Method-by-method reference parity (file: Graph.java):

* ``from_data_set`` / ``from_edges``  — fromDataSet:161,211 (vertex
  init from edge endpoints when only edges are given)
* ``map_vertices`` / ``map_edges``    — mapVertices:528, mapEdges:578
* ``translate_graph_ids``             — translateGraphIds:630
* ``join_with_vertices`` / ``join_with_edges`` /
  ``join_with_edges_on_source`` / ``..._on_target``
                                      — joinWith*:674-848 (unmatched
                                        rows keep their value)
* ``subgraph`` / ``filter_on_vertices`` / ``filter_on_edges``
                                      — subgraph:867, filterOn*:888,907
* ``out_degrees`` / ``in_degrees`` / ``get_degrees``
                                      — outDegrees:926 etc. (vertices
                                        with no edges report 0)
* ``get_undirected`` / ``reverse``    — getUndirected:985 (duplicate
                                        edges kept), reverse:1308
* ``get_triplets``                    — getTriplets:483
* ``add_vertices`` / ``remove_vertices`` / ``add_edges`` /
  ``remove_edges``                    — addVertices:1379 (existing ids
                                        win), removeVertices:1485 (and
                                        incident edges), addEdges:1430,
                                        removeEdges:1571 (by (src,dst))
* ``union`` / ``difference`` / ``intersect``
                                      — union:1599 (vertices distinct,
                                        edge multiset), difference:1623,
                                        intersect:1647 (distinct or
                                        2*min-multiplicity pairwise)
* ``reduce_on_edges`` / ``reduce_on_neighbors``
                                      — reduceOnEdges/Neighbors with
                                        EdgeDirection IN|OUT|ALL
* ``run_vertex_centric`` / ``run_gather_sum_apply``
                                      — runVertexCentricIteration:1825,
                                        runGatherSumApplyIteration:1778
                                        (delegate to iterate.py)
* ``validate``                        — validate:446 with
                                        InvalidVertexIdsValidator
                                        (edge ids must be vertex ids)
* ``number_of_vertices`` / ``number_of_edges`` / ``get_vertex_ids`` /
  ``get_edge_ids``                    — 1316-1345
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IN, OUT, ALL = "in", "out", "all"  # EdgeDirection.java


def _with_value(df: DataFrame, cols: list[str]) -> DataFrame:
    """Normalize to the expected columns, adding a NULL value column
    (Gelly's NullValue) when absent."""
    if "value" not in df.columns:
        df = df.withColumn("value", F.lit(None))
    return df.select(*cols)


class Graph:
    """Immutable (vertices, edges) pair with the Gelly method surface.

    vertices: ``(id, value)``; edges: ``(src, dst, value)`` — a
    missing ``value`` column is added as NULL (NullValue payloads).
    """

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        self.vertices = _with_value(vertices, ["id", "value"])
        self.edges = _with_value(edges, ["src", "dst", "value"])

    # -- construction -------------------------------------------------
    @staticmethod
    def from_data_set(vertices: DataFrame, edges: DataFrame) -> "Graph":
        return Graph(vertices, edges)

    @staticmethod
    def from_edges(
        edges: DataFrame, vertex_value: Column | None = None
    ) -> "Graph":
        """fromDataSet(edges, [vertexValueInitializer]): vertices are
        the distinct edge endpoints; ``vertex_value`` is a Column over
        ``id`` (the MapFunction<K, VV> initializer), default NULL."""
        e = _with_value(edges, ["src", "dst", "value"])
        v = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        v = v.select(
            "id",
            (vertex_value if vertex_value is not None else F.lit(None)).alias(
                "value"
            ),
        )
        return Graph(v, e)

    # -- transforms ---------------------------------------------------
    def map_vertices(self, new_value: Column) -> "Graph":
        return Graph(
            self.vertices.select("id", new_value.alias("value")), self.edges
        )

    def map_edges(self, new_value: Column) -> "Graph":
        return Graph(
            self.vertices,
            self.edges.select("src", "dst", new_value.alias("value")),
        )

    def translate_graph_ids(self, fn: Callable[[Column], Column]) -> "Graph":
        return Graph(
            self.vertices.select(
                fn(F.col("id")).alias("id"), "value"
            ),
            self.edges.select(
                fn(F.col("src")).alias("src"),
                fn(F.col("dst")).alias("dst"),
                "value",
            ),
        )

    def join_with_vertices(
        self, inputs: DataFrame, merge: Callable[[Column, Column], Column]
    ) -> "Graph":
        """inputs: (id, val); matched vertices get merge(value, val),
        unmatched keep their value (the reference's coGroup rule)."""
        j = self.vertices.join(
            inputs.select(F.col("id"), F.col("val").alias("__in")),
            "id",
            "left",
        )
        v = j.select(
            "id",
            F.when(
                F.col("__in").isNotNull(),
                merge(F.col("value"), F.col("__in")),
            )
            .otherwise(F.col("value"))
            .alias("value"),
        )
        return Graph(v, self.edges)

    def _join_edges(self, inputs, merge, keys) -> "Graph":
        j = self.edges.join(inputs, keys, "left")
        e = j.select(
            "src",
            "dst",
            F.when(
                F.col("__in").isNotNull(),
                merge(F.col("value"), F.col("__in")),
            )
            .otherwise(F.col("value"))
            .alias("value"),
        )
        return Graph(self.vertices, e)

    def join_with_edges(
        self, inputs: DataFrame, merge: Callable[[Column, Column], Column]
    ) -> "Graph":
        """inputs: (src, dst, val)."""
        return self._join_edges(
            inputs.select("src", "dst", F.col("val").alias("__in")),
            merge,
            ["src", "dst"],
        )

    def join_with_edges_on_source(
        self, inputs: DataFrame, merge: Callable[[Column, Column], Column]
    ) -> "Graph":
        """inputs: (id, val) joined on the edge source."""
        return self._join_edges(
            inputs.select(
                F.col("id").alias("src"), F.col("val").alias("__in")
            ),
            merge,
            ["src"],
        )

    def join_with_edges_on_target(
        self, inputs: DataFrame, merge: Callable[[Column, Column], Column]
    ) -> "Graph":
        return self._join_edges(
            inputs.select(
                F.col("id").alias("dst"), F.col("val").alias("__in")
            ),
            merge,
            ["dst"],
        )

    # -- filters ------------------------------------------------------
    def _edges_with_both_endpoints(self, vertices: DataFrame) -> DataFrame:
        ids = vertices.select("id")
        return (
            self.edges.join(
                ids.select(F.col("id").alias("src")), "src", "left_semi"
            ).join(ids.select(F.col("id").alias("dst")), "dst", "left_semi")
        ).select("src", "dst", "value")

    def subgraph(
        self, vertex_filter: Column, edge_filter: Column
    ) -> "Graph":
        v = self.vertices.where(vertex_filter)
        g = Graph(v, self.edges.where(edge_filter))
        return Graph(v, g._edges_with_both_endpoints(v))

    def filter_on_vertices(self, vertex_filter: Column) -> "Graph":
        v = self.vertices.where(vertex_filter)
        return Graph(v, self._edges_with_both_endpoints(v))

    def filter_on_edges(self, edge_filter: Column) -> "Graph":
        return Graph(self.vertices, self.edges.where(edge_filter))

    # -- degrees ------------------------------------------------------
    def _degrees(self, keys: list[str]) -> DataFrame:
        parts = [
            self.edges.select(F.col(k).alias("id")) for k in keys
        ]
        ids = parts[0]
        for p in parts[1:]:
            ids = ids.unionAll(p)
        counts = ids.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
        return (
            self.vertices.select("id")
            .join(counts, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("degree"), F.lit(0))
                .cast("long")
                .alias("degree"),
            )
        )

    def out_degrees(self) -> DataFrame:
        return self._degrees(["src"])

    def in_degrees(self) -> DataFrame:
        return self._degrees(["dst"])

    def get_degrees(self) -> DataFrame:
        return self._degrees(["src", "dst"])

    # -- structure ----------------------------------------------------
    def get_undirected(self) -> "Graph":
        rev = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "value"
        )
        return Graph(self.vertices, self.edges.unionAll(rev))

    def reverse(self) -> "Graph":
        return Graph(
            self.vertices,
            self.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "value"
            ),
        )

    def get_triplets(self) -> DataFrame:
        sv = self.vertices.select(
            F.col("id").alias("src"), F.col("value").alias("src_value")
        )
        dv = self.vertices.select(
            F.col("id").alias("dst"), F.col("value").alias("dst_value")
        )
        return (
            self.edges.join(sv, "src")
            .join(dv, "dst")
            .select(
                "src",
                "dst",
                "src_value",
                "dst_value",
                F.col("value").alias("edge_value"),
            )
        )

    # -- mutations ----------------------------------------------------
    def add_vertices(self, new_vertices: DataFrame) -> "Graph":
        """addVertices: a vertex whose id already exists is IGNORED
        (the reference's union + distinct-on-id keeps the existing)."""
        nv = _with_value(new_vertices, ["id", "value"]).join(
            self.vertices.select("id"), "id", "left_anti"
        )
        return Graph(self.vertices.unionByName(nv), self.edges)

    def remove_vertices(self, to_remove: DataFrame) -> "Graph":
        ids = to_remove.select("id")
        v = self.vertices.join(ids, "id", "left_anti")
        e = (
            self.edges.join(
                ids.select(F.col("id").alias("src")), "src", "left_anti"
            ).join(ids.select(F.col("id").alias("dst")), "dst", "left_anti")
        ).select("src", "dst", "value")
        return Graph(v, e)

    def add_edges(self, new_edges: DataFrame) -> "Graph":
        """addEdges: edge endpoints must already be vertices (the
        reference joins against the vertex set); the edge multiset
        grows by the matching rows."""
        ne = _with_value(new_edges, ["src", "dst", "value"])
        ne = ne.join(
            self.vertices.select(F.col("id").alias("src")),
            "src",
            "left_semi",
        ).join(
            self.vertices.select(F.col("id").alias("dst")),
            "dst",
            "left_semi",
        ).select("src", "dst", "value")
        return Graph(self.vertices, self.edges.unionByName(ne))

    def remove_edges(self, to_remove: DataFrame) -> "Graph":
        """removeEdges: every edge matching a (src, dst) pair in the
        removal set is dropped (values ignored — the reference
        coGroups on fields 0,1)."""
        return Graph(
            self.vertices,
            self.edges.join(
                to_remove.select("src", "dst").distinct(),
                ["src", "dst"],
                "left_anti",
            ),
        )

    # -- set operations ------------------------------------------------
    def union(self, other: "Graph") -> "Graph":
        """union: distinct vertices, duplicate edges MAINTAINED."""
        return Graph(
            self.vertices.unionByName(other.vertices).dropDuplicates(["id"]),
            self.edges.unionByName(other.edges),
        )

    def difference(self, other: "Graph") -> "Graph":
        """difference: remove the other graph's vertices and their
        incident edges (the reference delegates to removeVertices)."""
        return self.remove_vertices(other.vertices)

    def intersect(self, other: "Graph", distinct_edges: bool) -> "Graph":
        """intersect: edges equal on (src, dst, value). distinct=True
        keeps one edge per matching triple; False emits each matched
        PAIR twice — multiplicity 2*min(left count, right count), the
        reference's MatchingEdgeReducer. Output vertices derive from
        the edge endpoints with NULL values (fromDataSet(edges))."""
        key = ["src", "dst", "value"]
        if distinct_edges:
            e = (
                self.edges.join(other.edges, key, "left_semi")
                .distinct()
                .select(*key)
            )
        else:
            lc = self.edges.groupBy(key).agg(F.count(F.lit(1)).alias("__l"))
            rc = other.edges.groupBy(key).agg(
                F.count(F.lit(1)).alias("__r")
            )
            e = (
                lc.join(rc, key)
                .select(
                    *key,
                    (F.least(F.col("__l"), F.col("__r")) * 2).alias("__n"),
                )
                .select(
                    *key,
                    F.explode(
                        F.sequence(F.lit(1), F.col("__n"))
                    ).alias("__i"),
                )
                .select(*key)
            )
        return Graph.from_edges(e)

    # -- neighborhood reductions ----------------------------------------
    def _per_vertex(self, direction: str, value_col: Column) -> DataFrame:
        """(id, __v) rows per incident edge in the given direction."""
        out = self.edges.select(
            F.col("src").alias("id"), value_col.alias("__v")
        )
        inn = self.edges.select(
            F.col("dst").alias("id"), value_col.alias("__v")
        )
        if direction == OUT:
            return out
        if direction == IN:
            return inn
        if direction == ALL:
            return out.unionAll(inn)
        raise ValueError(f"Illegal edge direction: {direction!r}")

    def reduce_on_edges(self, agg: Callable, direction: str) -> DataFrame:
        """reduceOnEdges: per-vertex reduction over incident EDGE
        values in the direction (IN = edges pointing at the vertex,
        OUT = leaving it, ALL = both). ``agg`` is an aggregate fn
        (e.g. F.min — ReduceEdgesFunction's associative closure).
        Returns (id, reduced)."""
        return (
            self._per_vertex(direction, F.col("value"))
            .groupBy("id")
            .agg(agg(F.col("__v")).alias("reduced"))
        )

    def reduce_on_neighbors(self, agg: Callable, direction: str) -> DataFrame:
        """reduceOnNeighbors: per-vertex reduction over NEIGHBOR
        VERTEX values. Direction IN reduces over in-neighbors (the
        sources of in-edges), OUT over out-neighbors, ALL both."""
        out = self.edges.select(
            F.col("src").alias("id"), F.col("dst").alias("__n")
        )
        inn = self.edges.select(
            F.col("dst").alias("id"), F.col("src").alias("__n")
        )
        if direction == OUT:
            pairs = out
        elif direction == IN:
            pairs = inn
        elif direction == ALL:
            pairs = out.unionAll(inn)
        else:
            raise ValueError(f"Illegal edge direction: {direction!r}")
        withv = pairs.join(
            self.vertices.select(
                F.col("id").alias("__n"), F.col("value").alias("__v")
            ),
            "__n",
        )
        return withv.groupBy("id").agg(agg(F.col("__v")).alias("reduced"))

    # -- iterations -----------------------------------------------------
    def run_vertex_centric(
        self, send_msg, combine_msg, apply_fn, max_rounds: int
    ) -> "Graph":
        """runVertexCentricIteration: the pregel model over this
        graph's (id, value) vertices and edges — delegates to
        operators/iterate.vertex_centric; returns the graph with
        updated vertex values."""
        from flink_efo_spark.operators.iterate import vertex_centric

        out = vertex_centric(
            self.vertices.select("id", "value"),
            self.edges.select("src", "dst"),
            send_msg,
            combine_msg,
            apply_fn,
            max_rounds,
        )
        return Graph(out, self.edges)

    def run_gather_sum_apply(
        self, gather, sum_fn, apply_fn, max_rounds: int
    ) -> "Graph":
        """runGatherSumApplyIteration — same dataflow (see
        iterate.gather_sum_apply)."""
        return self.run_vertex_centric(gather, sum_fn, apply_fn, max_rounds)

    # -- metadata -------------------------------------------------------
    def number_of_vertices(self) -> int:
        return self.vertices.count()

    def number_of_edges(self) -> int:
        return self.edges.count()

    def get_vertex_ids(self) -> DataFrame:
        return self.vertices.select("id")

    def get_edge_ids(self) -> DataFrame:
        return self.edges.select("src", "dst")

    def validate(self) -> bool:
        """InvalidVertexIdsValidator.java: every edge endpoint must be
        a vertex id."""
        ids = self.vertices.select("id")
        dangling = (
            self.edges.select(F.col("src").alias("id"))
            .unionAll(self.edges.select(F.col("dst").alias("id")))
            .join(ids, "id", "left_anti")
        )
        return dangling.take(1) == []
