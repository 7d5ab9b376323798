"""Round-9 staging: corpus queries + DuckDB oracles for the round-8
Gelly graph operators (operators/iterate.py — HITS, community
detection, neighborhood similarity, clustering metrics, censuses,
summarization, bipartite projections).

Registered in the corpus since round 9 (queries.py's
``_register_graph_queries`` merges ``GRAPH_QUERIES``/``GRAPH_ORACLES``
into ``QUERIES``/``ORACLES``). Every pair is engine-vs-DuckDB verified
by ``tests/test_graph_oracles.py`` (the verify_local comparison,
including the 9-decimal float normalization) at sf0.001 and sf0.01.

Inputs are the corpus's standard graphs:

* the supplier CO-OCCURRENCE graph (suppliers sharing an order on
  quantity>45 lines — triangle-rich, moderate degrees; the
  ``triangle_enum`` corpus query's graph), canonical ``u < v``;
* its MIXED DIRECTED variant: each co-occurrence edge directed
  low→high, plus the reverse direction where ``(u+v) % 3 = 0`` —
  a deterministic blend of uni- and bidirectional edges for the
  directed analytics.

Determinism notes (why these hash-match across engines):

* every ordering/LIMIT uses exact-integer keys (never a raw double);
* hits runs 2 rounds — round-1 sums are integer-valued doubles
  (exact in IEEE), round-2 sums are order-dependent only below 1e-15
  relative, far inside the harness's round-to-9-decimals
  normalization; emitted scores are rounded to 6 decimals in BOTH
  engines;
* community_detection's score arithmetic over 2 rounds stays in
  small dyadic rationals (weights are small ints, delta adjustments
  are 0.5/k for k=1,2), so label decisions compare EXACT doubles;
* census counts are cast to BIGINT here (they fit at corpus scale;
  the operators keep DECIMAL(38,0) for 100 TB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_efo_spark.catalog import load_table

GRAPH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
GRAPH_ORACLES: dict[str, str] = {}

_COOC_SQL = """
    q AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
          WHERE l_quantity > 45),
    e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
          FROM q a JOIN q b ON a.l_orderkey = b.l_orderkey
                           AND a.l_suppkey < b.l_suppkey)
"""

_MIXED_SQL = _COOC_SQL + """,
    de AS (SELECT u AS s, v AS d FROM e
           UNION ALL
           SELECT v, u FROM e WHERE (u + v) % 3 = 0)
"""


def _q(name: str, oracle: str):
    def deco(fn):
        GRAPH_QUERIES[name] = fn
        GRAPH_ORACLES[name] = oracle
        return fn

    return deco


def _cooc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-occurrence graph, canonical src < dst (the
    triangle_enum corpus graph)."""
    q = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = q.alias("a"), q.alias("b")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").cast("long").alias("src"),
            F.col("b.l_suppkey").cast("long").alias("dst"),
        )
        .distinct()
        # Pin the derived edges: every consumer is a multi-pass graph
        # algorithm (degrees + neighborhood joins + per-round
        # frontiers), and without the pin the lineitem self-join +
        # distinct lineage re-executes once per consumer (guide §5).
        # O(E) key-only rows; coalesce bounds the pinned partition
        # count to the core count (checkpoint materializes the
        # pre-AQE fan-out — 256 near-empty partitions otherwise).
        .coalesce(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )


def _mixed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed directed variant: low->high always, plus the reverse
    where (u+v) % 3 = 0 (deterministic uni/bidirectional blend)."""
    e = _cooc_edges(spark, sf_dir)
    return e.unionAll(
        e.where((F.col("src") + F.col("dst")) % 3 == 0).select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )


@_q(
    "jaccard_pairs",
    f"""
    WITH {_COOC_SQL},
    nbrs AS (SELECT u AS w, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM nbrs GROUP BY w),
    shared AS (
      SELECT a.n AS v0, b.n AS v1, CAST(count(*) AS BIGINT) AS shared_count
      FROM nbrs a JOIN nbrs b ON a.w = b.w AND a.n < b.n
      GROUP BY a.n, b.n)
    SELECT CAST(s.v0 AS BIGINT) AS v0, CAST(s.v1 AS BIGINT) AS v1,
           s.shared_count,
           da.d + db.d - s.shared_count AS distinct_count,
           CAST(s.shared_count AS DOUBLE)
             / CAST(da.d + db.d - s.shared_count AS DOUBLE) AS jaccard
    FROM shared s JOIN deg da ON da.w = s.v0 JOIN deg db ON db.w = s.v1
    ORDER BY s.shared_count DESC,
             da.d + db.d - s.shared_count ASC, v0, v1
    LIMIT 200
    """,
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly JaccardIndex (library/similarity/JaccardIndex.java via
    operators/iterate.jaccard_index) on the co-occurrence graph: top
    200 pairs by exact-integer keys (shared desc, union asc, ids)."""
    from flink_efo_spark.operators.iterate import jaccard_index

    out = jaccard_index(_cooc_edges(spark, sf_dir))
    return (
        out.orderBy(
            F.col("shared_count").desc(),
            F.col("distinct_count").asc(),
            "v0",
            "v1",
        )
        .limit(200)
        .select(
            F.col("v0").cast("long").alias("v0"),
            F.col("v1").cast("long").alias("v1"),
            "shared_count",
            "distinct_count",
            "jaccard",
        )
    )


@_q(
    "adamic_adar_pairs",
    f"""
    WITH {_COOC_SQL},
    nbrs AS (SELECT u AS w, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM nbrs GROUP BY w),
    wtd AS (SELECT n.w, n.n, 1.0 / ln(CAST(deg.d AS DOUBLE)) AS iw
            FROM nbrs n JOIN deg ON deg.w = n.w),
    pairs AS (
      SELECT a.n AS v0, b.n AS v1,
             CAST(count(*) AS BIGINT) AS shared_count, sum(a.iw) AS s
      FROM wtd a JOIN wtd b ON a.w = b.w AND a.n < b.n
      GROUP BY a.n, b.n)
    SELECT CAST(v0 AS BIGINT) AS v0, CAST(v1 AS BIGINT) AS v1,
           shared_count, round(s, 6) AS score
    FROM pairs
    ORDER BY shared_count DESC, v0, v1
    LIMIT 200
    """,
)
def q_adamic_adar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly AdamicAdar (library/similarity/AdamicAdar.java) top-200
    by (shared desc, ids); scores rounded to 6 decimals both sides
    (libm ln may differ in the last ulp across engines)."""
    from flink_efo_spark.operators.iterate import adamic_adar, jaccard_index

    aa = adamic_adar(_cooc_edges(spark, sf_dir))
    sh = jaccard_index(_cooc_edges(spark, sf_dir)).select(
        "v0", "v1", "shared_count"
    )
    return (
        aa.join(sh, ["v0", "v1"])
        .orderBy(F.col("shared_count").desc(), "v0", "v1")
        .limit(200)
        .select(
            F.col("v0").cast("long").alias("v0"),
            F.col("v1").cast("long").alias("v1"),
            "shared_count",
            F.round("score", 6).alias("score"),
        )
    )


@_q(
    "hits_scores",
    f"""
    WITH {_MIXED_SQL},
    a0 AS (SELECT d AS id, CAST(count(*) AS DOUBLE) AS auth
           FROM de GROUP BY d),
    h1 AS (SELECT de.s AS id, sum(a0.auth) AS hub
           FROM de JOIN a0 ON a0.id = de.d GROUP BY de.s),
    a1 AS (SELECT de.d AS id, sum(h1.hub) AS auth
           FROM de JOIN h1 ON h1.id = de.s GROUP BY de.d),
    n1 AS (SELECT sqrt(sum(hub*hub)) AS nh FROM h1),
    m1 AS (SELECT sqrt(sum(auth*auth)) AS na FROM a1),
    s1 AS (SELECT coalesce(h1.id, a1.id) AS id,
                  coalesce(h1.hub, 0) / n1.nh AS hub,
                  coalesce(a1.auth, 0) / m1.na AS auth
           FROM h1 FULL OUTER JOIN a1 ON h1.id = a1.id, n1, m1),
    h2 AS (SELECT de.s AS id, sum(s1.auth) AS hub
           FROM de JOIN s1 ON s1.id = de.d GROUP BY de.s),
    a2 AS (SELECT de.d AS id, sum(h2.hub) AS auth
           FROM de JOIN h2 ON h2.id = de.s GROUP BY de.d),
    n2 AS (SELECT sqrt(sum(hub*hub)) AS nh FROM h2),
    m2 AS (SELECT sqrt(sum(auth*auth)) AS na FROM a2)
    SELECT CAST(coalesce(h2.id, a2.id) AS BIGINT) AS id,
           round(coalesce(h2.hub, 0) / n2.nh, 6) AS hub,
           round(coalesce(a2.auth, 0) / m2.na, 6) AS authority
    FROM h2 FULL OUTER JOIN a2 ON h2.id = a2.id, n2, m2
    """,
)
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly HITS (library/linkanalysis/HITS.java via
    operators/iterate.hits), 2 rounds on the mixed directed graph;
    scores rounded to 6 decimals (round-2 float-sum order differences
    sit at ~1e-15, far under the rounding)."""
    from flink_efo_spark.operators.iterate import hits

    out = hits(_mixed_edges(spark, sf_dir), n_iter=2)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


@_q(
    "community_labels",
    f"""
    WITH {_COOC_SQL},
    adj AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e),
    v0 AS (SELECT DISTINCT s AS id FROM adj),
    st0 AS (SELECT id, CAST(id AS BIGINT) AS lbl, 1.0 AS sc FROM v0),
    -- round 1 (delta/1 = 0.5)
    m1 AS (SELECT adj.d AS id, st0.lbl, sum(st0.sc) AS c, max(st0.sc) AS m
           FROM adj JOIN st0 ON st0.id = adj.s GROUP BY adj.d, st0.lbl),
    w1 AS (SELECT id, lbl AS nl, m AS nm FROM (
             SELECT id, lbl, m, row_number() OVER (
               PARTITION BY id ORDER BY c DESC, lbl ASC) AS rn FROM m1)
           WHERE rn = 1),
    st1 AS (SELECT st0.id,
                   coalesce(w1.nl, st0.lbl) AS lbl,
                   CASE WHEN w1.nl IS NULL THEN st0.sc
                        WHEN w1.nl <> st0.lbl THEN w1.nm - 0.5
                        ELSE w1.nm END AS sc
            FROM st0 LEFT JOIN w1 ON w1.id = st0.id),
    -- round 2 (delta/2 = 0.25); every vertex has an edge, so the
    -- scatter-gather activation never prunes on this graph
    m2 AS (SELECT adj.d AS id, st1.lbl, sum(st1.sc) AS c, max(st1.sc) AS m
           FROM adj JOIN st1 ON st1.id = adj.s GROUP BY adj.d, st1.lbl),
    w2 AS (SELECT id, lbl AS nl, m AS nm FROM (
             SELECT id, lbl, m, row_number() OVER (
               PARTITION BY id ORDER BY c DESC, lbl ASC) AS rn FROM m2)
           WHERE rn = 1)
    SELECT CAST(st1.id AS BIGINT) AS id,
           CAST(coalesce(w2.nl, st1.lbl) AS BIGINT) AS label
    FROM st1 LEFT JOIN w2 ON w2.id = st1.id
    """,
)
def q_community_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly CommunityDetection (library/CommunityDetection.java via
    operators/iterate.community_detection), 2 rounds, unit weights;
    the 2-round score arithmetic stays in exact dyadic doubles, so
    labels replay exactly in SQL (rank over (sum DESC, label ASC) = highest
    summed score, ties to the lowest label)."""
    from flink_efo_spark.operators.iterate import community_detection

    out = community_detection(_cooc_edges(spark, sf_dir), n_iter=2)
    return out.select(F.col("id").cast("long").alias("id"), "label")


@_q(
    "clustering_metrics",
    f"""
    WITH {_COOC_SQL},
    nbrs AS (SELECT u AS w, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM nbrs GROUP BY w),
    tri AS (SELECT count(*) AS t
            FROM e ab JOIN e bc ON bc.u = ab.v
                      JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
    vm AS (SELECT CAST(count(*) AS BIGINT) AS vc,
                  CAST(sum(d)/2 AS BIGINT) AS ec,
                  CAST(sum(d*(d-1)/2) AS BIGINT) AS tpl,
                  CAST(max(d) AS BIGINT) AS maxd,
                  CAST(max(d*(d-1)/2) AS BIGINT) AS maxt
           FROM deg),
    pertri AS (SELECT a AS id FROM (SELECT ab.u AS a, ab.v AS b, bc.v AS c
               FROM e ab JOIN e bc ON bc.u = ab.v
                         JOIN e ac ON ac.u = ab.u AND ac.v = bc.v) t
               UNION ALL SELECT b FROM (SELECT ab.u AS a, ab.v AS b,
               bc.v AS c FROM e ab JOIN e bc ON bc.u = ab.v
                         JOIN e ac ON ac.u = ab.u AND ac.v = bc.v) t
               UNION ALL SELECT c FROM (SELECT ab.u AS a, ab.v AS b,
               bc.v AS c FROM e ab JOIN e bc ON bc.u = ab.v
                         JOIN e ac ON ac.u = ab.u AND ac.v = bc.v) t),
    tc AS (SELECT id, CAST(count(*) AS BIGINT) AS t FROM pertri GROUP BY id),
    lcc AS (SELECT deg.w AS id, deg.d,
                   coalesce(tc.t, 0) AS t
            FROM deg LEFT JOIN tc ON tc.id = deg.w),
    acc AS (SELECT CAST(count(*) AS BIGINT) AS vc,
                   sum(CASE WHEN d > 1
                       THEN CAST(t AS DOUBLE)/(d*(d-1)/2.0) END)
                     / count(*) AS avg_coeff
            FROM lcc)
    SELECT vm.tpl AS triplet_count,
           CAST(tri.t AS BIGINT) AS triangle_count,
           CAST(3*tri.t AS DOUBLE)/CAST(vm.tpl AS DOUBLE) AS global_coeff,
           acc.vc AS vertex_count, round(acc.avg_coeff, 6) AS average_coeff,
           vm.ec AS edge_count, vm.maxd AS maximum_degree,
           vm.maxt AS maximum_triplets
    FROM vm, tri, acc
    """,
)
def q_clustering_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly undirected clustering metrics + vertex metrics in one row
    (clustering/undirected/Global+AverageClusteringCoefficient,
    metric/undirected/VertexMetrics via operators/iterate)."""
    from flink_efo_spark.operators.iterate import (
        average_clustering_coefficient,
        global_clustering_coefficient,
        vertex_metrics,
    )

    e = _cooc_edges(spark, sf_dir)
    g = global_clustering_coefficient(e).select(
        "triplet_count",
        "triangle_count",
        F.col("coefficient").alias("global_coeff"),
    )
    a = average_clustering_coefficient(e).select(
        "vertex_count",
        # order-dependent float sum over ~1e3 per-vertex doubles —
        # round to 6 like hits_scores so partial-agg order can't flip
        # the harness's 9-decimal normalization boundary
        F.round("average_coefficient", 6).alias("average_coeff"),
    )
    m = vertex_metrics(e).select(
        "edge_count", "maximum_degree", "maximum_triplets"
    )
    return g.crossJoin(a).crossJoin(m)


@_q(
    "edge_metrics_row",
    f"""
    WITH {_COOC_SQL},
    nbrs AS (SELECT u AS w, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM nbrs GROUP BY w),
    low AS (SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u
                        ELSE e.v END AS id
            FROM e JOIN deg du ON du.w = e.u JOIN deg dv ON dv.w = e.v),
    lc AS (SELECT id, CAST(count(*) AS BIGINT) AS lo FROM low GROUP BY id),
    pv AS (SELECT deg.w, deg.d, coalesce(lc.lo, 0) AS lo
           FROM deg LEFT JOIN lc ON lc.id = deg.w)
    SELECT CAST(sum(lo*(lo-1)/2) AS BIGINT) AS triangle_triplet_count,
           CAST(sum(lo*(lo-1)/2 + lo*(d-lo)) AS BIGINT)
             AS rectangle_triplet_count,
           CAST(max(lo*(lo-1)/2) AS BIGINT) AS maximum_triangle_triplets,
           CAST(max(lo*(lo-1)/2 + lo*(d-lo)) AS BIGINT)
             AS maximum_rectangle_triplets
    FROM pv
    """,
)
def q_edge_metrics_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly EdgeMetrics (metric/undirected/EdgeMetrics.java via
    operators/iterate.edge_metrics) — the triangle-listing 2-path
    cost predictor as one row."""
    from flink_efo_spark.operators.iterate import edge_metrics

    return edge_metrics(_cooc_edges(spark, sf_dir))


@_q(
    "summary_graph_edges",
    f"""
    WITH {_COOC_SQL},
    sv AS (SELECT s_suppkey AS id, s_nationkey AS val FROM supplier),
    grp AS (SELECT val, CAST(min(id) AS BIGINT) AS rep,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM sv GROUP BY val),
    rm AS (SELECT sv.id, grp.rep FROM sv JOIN grp ON grp.val = sv.val)
    SELECT CAST(rs.rep AS BIGINT) AS src, CAST(rd.rep AS BIGINT) AS dst,
           CAST(count(*) AS BIGINT) AS n_edges
    FROM e JOIN rm rs ON rs.id = e.u JOIN rm rd ON rd.id = e.v
    GROUP BY rs.rep, rd.rep
    """,
)
def q_summary_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly Summarization (library/Summarization.java via
    operators/iterate.summarize_graph): suppliers grouped by nation,
    summary edges of the co-occurrence graph with counts (min-member
    representative)."""
    from flink_efo_spark.operators.iterate import summarize_graph

    sv = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id"),
        F.col("s_nationkey").alias("value"),
    )
    _, se = summarize_graph(sv, _cooc_edges(spark, sf_dir))
    return se.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("count").cast("long").alias("n_edges"),
    )


@_q(
    "triadic_census_undirected",
    f"""
    WITH {_COOC_SQL},
    nbrs AS (SELECT u AS w, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM nbrs GROUP BY w),
    vm AS (SELECT CAST(count(*) AS BIGINT) AS vc,
                  CAST(sum(d)/2 AS BIGINT) AS ec,
                  CAST(sum(d*(d-1)/2) AS BIGINT) AS tpl FROM deg),
    tri AS (SELECT CAST(count(*) AS BIGINT) AS t
            FROM e ab JOIN e bc ON bc.u = ab.v
                      JOIN e ac ON ac.u = ab.u AND ac.v = bc.v)
    SELECT CAST(vc*(vc-1)*(vc-2)/6
                - (ec*(vc-2) - 2*(tpl - 3*t) - 3*t)
                - (tpl - 3*t) - t AS BIGINT) AS t0,
           CAST(ec*(vc-2) - 2*(tpl - 3*t) - 3*t AS BIGINT) AS t1,
           CAST(tpl - 3*t AS BIGINT) AS t2,
           t AS t3
    FROM vm, tri
    """,
)
def q_triadic_census_undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly undirected TriadicCensus (clustering/undirected/
    TriadicCensus.java via operators/iterate.triadic_census); counts
    cast to BIGINT (they fit at corpus scale; the operator keeps
    DECIMAL(38,0) for the 100 TB domain)."""
    from flink_efo_spark.operators.iterate import triadic_census

    out = triadic_census(_cooc_edges(spark, sf_dir))
    return out.select(
        *[F.col(c).cast("long").alias(c) for c in ("t0", "t1", "t2", "t3")]
    )


@_q(
    "bipartite_projection_top",
    """
    WITH e0 AS (SELECT DISTINCT o.o_custkey AS t, l.l_suppkey AS b
                FROM orders o JOIN lineitem l
                  ON o.o_orderkey = l.l_orderkey
                WHERE l.l_quantity > 45)
    SELECT CAST(a.t AS BIGINT) AS src, CAST(x.t AS BIGINT) AS dst,
           CAST(count(*) AS BIGINT) AS n_links
    FROM e0 a JOIN e0 x ON a.b = x.b AND a.t <> x.t
    GROUP BY a.t, x.t
    ORDER BY n_links DESC, src, dst
    LIMIT 200
    """,
)
def q_bipartite_projection_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly bipartite top-projection (bipartite/BipartiteGraph.java
    projectionTopSimple via operators/iterate.bipartite_projection):
    customers sharing a high-quantity supplier, aggregated to
    (pair, shared-counterpart count), top 200 by exact keys."""
    from flink_efo_spark.operators.iterate import bipartite_projection

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") > 45
    )
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("top"),
            F.col("l_suppkey").cast("long").alias("bottom"),
        )
        .distinct()
        # pinned: the projection self-joins e0, and without the pin
        # the orders⋈lineitem distinct lineage executes once per
        # join side (guide §5); coalesce bounds the pinned partition
        # count (checkpoint materializes the pre-AQE fan-out)
        .coalesce(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    proj = bipartite_projection(e0, side="top")
    return (
        proj.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .orderBy(F.col("n_links").desc(), "src", "dst")
        .limit(200)
    )


@_q(
    "lcc_topn",
    f"""
    WITH {_COOC_SQL},
    nbrs AS (SELECT u AS w, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM nbrs GROUP BY w),
    tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
            FROM e ab JOIN e bc ON bc.u = ab.v
                      JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
    pertri AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri),
    tc AS (SELECT id, CAST(count(*) AS BIGINT) AS t
           FROM pertri GROUP BY id)
    SELECT CAST(deg.w AS BIGINT) AS id, deg.d AS degree,
           coalesce(tc.t, 0) AS triangle_count,
           CASE WHEN deg.d > 1 THEN
             CAST(coalesce(tc.t, 0) AS DOUBLE) / (deg.d*(deg.d-1)/2.0)
           END AS coefficient
    FROM deg LEFT JOIN tc ON tc.id = deg.w
    ORDER BY coalesce(tc.t, 0) DESC, deg.d ASC, id
    LIMIT 100
    """,
)
def q_lcc_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly undirected LocalClusteringCoefficient (clustering/
    undirected/LocalClusteringCoefficient.java via operators/
    iterate.local_clustering_coefficient): top 100 by exact-integer
    keys (triangle count desc, degree asc, id)."""
    from flink_efo_spark.operators.iterate import (
        local_clustering_coefficient,
    )

    out = local_clustering_coefficient(_cooc_edges(spark, sf_dir))
    return (
        out.orderBy(
            F.col("triangle_count").desc(), F.col("degree").asc(), "id"
        )
        .limit(100)
        .select(
            F.col("id").cast("long").alias("id"),
            "degree",
            "triangle_count",
            "coefficient",
        )
    )


def _census_case() -> str:
    """CASE expression mapping a 6-bit labeled-triad mask to its
    triangle class label, generated from the same public
    Batagelj-Mrvar table the operator uses."""
    from flink_efo_spark.operators.iterate import (
        _TRIAD_TYPE_TABLE,
        _TRIANGLE_CLASSES,
    )

    whens = "\n".join(
        f"        WHEN {mask} THEN '{_TRIANGLE_CLASSES[cls]}'"
        for mask, cls in enumerate(_TRIAD_TYPE_TABLE)
        if cls in _TRIANGLE_CLASSES
    )
    return f"CASE mask\n{whens}\n        END"


_DIRECTED_CENSUS_SQL = f"""
    WITH {_MIXED_SQL},
    ded AS (SELECT DISTINCT s, d FROM de WHERE s <> d),
    ce AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v FROM ded),
    outd AS (SELECT s AS id, CAST(count(*) AS BIGINT) AS o
             FROM ded GROUP BY s),
    ind AS (SELECT d AS id, CAST(count(*) AS BIGINT) AS i
            FROM ded GROUP BY d),
    nb AS (SELECT u AS id FROM ce UNION ALL SELECT v FROM ce),
    deg AS (SELECT id, CAST(count(*) AS BIGINT) AS dg FROM nb GROUP BY id),
    pv AS (SELECT deg.dg - coalesce(ind.i, 0) AS uas,
                  deg.dg - coalesce(outd.o, 0) AS uat,
                  coalesce(ind.i, 0) + coalesce(outd.o, 0) - deg.dg AS bid
           FROM deg LEFT JOIN outd ON outd.id = deg.id
                    LEFT JOIN ind ON ind.id = deg.id),
    vm AS (SELECT CAST(count(*) AS BIGINT) AS vc,
                  CAST(sum(uas + uat)/2 AS BIGINT) AS uec,
                  CAST(sum(bid)/2 AS BIGINT) AS bec,
                  CAST(sum(uas*(uas-1)/2) AS BIGINT) AS p021d,
                  CAST(sum(uat*(uat-1)/2) AS BIGINT) AS p021u,
                  CAST(sum(uas*uat) AS BIGINT) AS p021c,
                  CAST(sum(uat*bid) AS BIGINT) AS p111d,
                  CAST(sum(uas*bid) AS BIGINT) AS p111u,
                  CAST(sum(bid*(bid-1)/2) AS BIGINT) AS p201
           FROM pv),
    dirs AS (SELECT least(s, d) AS pu, greatest(s, d) AS pv,
                    max(CASE WHEN s < d THEN 1 ELSE 0 END)*2
                    + max(CASE WHEN s > d THEN 1 ELSE 0 END) AS m
             FROM ded GROUP BY least(s, d), greatest(s, d)),
    tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
            FROM ce ab JOIN ce bc ON bc.u = ab.v
                       JOIN ce ac ON ac.u = ab.u AND ac.v = bc.v),
    masks AS (SELECT dab.m*16 + dac.m*4 + dbc.m AS mask
              FROM tri JOIN dirs dab ON dab.pu = tri.a AND dab.pv = tri.b
                       JOIN dirs dac ON dac.pu = tri.a AND dac.pv = tri.c
                       JOIN dirs dbc ON dbc.pu = tri.b AND dbc.pv = tri.c),
    lbls AS (SELECT {{census_case}} AS lbl FROM masks),
    tc AS (SELECT
             CAST(coalesce(sum(CASE WHEN lbl='030t' THEN 1 END),0) AS BIGINT) AS c030t,
             CAST(coalesce(sum(CASE WHEN lbl='030c' THEN 1 END),0) AS BIGINT) AS c030c,
             CAST(coalesce(sum(CASE WHEN lbl='120d' THEN 1 END),0) AS BIGINT) AS c120d,
             CAST(coalesce(sum(CASE WHEN lbl='120u' THEN 1 END),0) AS BIGINT) AS c120u,
             CAST(coalesce(sum(CASE WHEN lbl='120c' THEN 1 END),0) AS BIGINT) AS c120c,
             CAST(coalesce(sum(CASE WHEN lbl='210' THEN 1 END),0) AS BIGINT) AS c210,
             CAST(coalesce(sum(CASE WHEN lbl='300' THEN 1 END),0) AS BIGINT) AS c300
           FROM lbls),
    adj AS (SELECT vc, uec, bec,
                   p201 - 3*c300 - c210 AS t201,
                   p111d - c210 - c120c - 2*c120d AS t111d,
                   p111u - c210 - c120c - 2*c120u AS t111u,
                   p021c - c120c - 3*c030c - c030t AS t021c,
                   p021u - c120u - c030t AS t021u,
                   p021d - c120d - c030t AS t021d,
                   c030t, c030c, c120d, c120u, c120c, c210, c300
            FROM vm, tc),
    fin AS (SELECT *,
                   bec*(vc-2) - t111d - t111u - 2*t201
                     - c120d - c120u - c120c - 2*c210 - 3*c300 AS e102,
                   uec*(vc-2) - 2*(t021d + t021u + t021c)
                     - t111d - t111u - 3*c030t - 3*c030c
                     - 2*(c120d + c120u + c120c) - c210 AS e012
            FROM adj)
    SELECT CAST(vc*(vc-1)*(vc-2)/6 - e012 - e102
                - t021d - t021u - t021c - t111d - t111u
                - c030t - c030c - t201 - c120d - c120u - c120c
                - c210 - c300 AS BIGINT) AS t003,
           CAST(e012 AS BIGINT) AS t012, CAST(e102 AS BIGINT) AS t102,
           CAST(t021d AS BIGINT) AS t021d, CAST(t021u AS BIGINT) AS t021u,
           CAST(t021c AS BIGINT) AS t021c, CAST(t111d AS BIGINT) AS t111d,
           CAST(t111u AS BIGINT) AS t111u, c030t AS t030t, c030c AS t030c,
           CAST(t201 AS BIGINT) AS t201, c120d AS t120d, c120u AS t120u,
           c120c AS t120c, c210 AS t210, c300 AS t300
    FROM fin
"""


@_q(
    "directed_census_row",
    _DIRECTED_CENSUS_SQL.format(census_case=_census_case()),
)
def q_directed_census_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly directed TriadicCensus (clustering/directed/
    TriadicCensus.java via operators/iterate.triadic_census_directed)
    on the mixed directed graph; all 16 classes as BIGINT (they fit
    at corpus scale; the operator keeps DECIMAL(38,0))."""
    from flink_efo_spark.operators.iterate import triadic_census_directed

    out = triadic_census_directed(_mixed_edges(spark, sf_dir))
    return out.select(
        *[F.col(c).cast("long").alias(c) for c in out.columns]
    )


@_q(
    "directed_clustering_row",
    f"""
    WITH {_MIXED_SQL},
    ded AS (SELECT DISTINCT s, d FROM de WHERE s <> d),
    ce AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v FROM ded),
    outd AS (SELECT s AS id, CAST(count(*) AS BIGINT) AS o
             FROM ded GROUP BY s),
    ind AS (SELECT d AS id, CAST(count(*) AS BIGINT) AS i
            FROM ded GROUP BY d),
    nb AS (SELECT u AS id FROM ce UNION ALL SELECT v FROM ce),
    deg AS (SELECT id, CAST(count(*) AS BIGINT) AS dg FROM nb GROUP BY id),
    dc AS (SELECT least(s, d) AS pu, greatest(s, d) AS pv,
                  CAST(count(*) AS BIGINT) AS c
           FROM ded GROUP BY least(s, d), greatest(s, d)),
    tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
            FROM ce ab JOIN ce bc ON bc.u = ab.v
                       JOIN ce ac ON ac.u = ab.u AND ac.v = bc.v),
    sides AS (SELECT a AS id, b AS pu, c AS pv FROM tri
              UNION ALL SELECT b, a, c FROM tri
              UNION ALL SELECT c, a, b FROM tri),
    cnt AS (SELECT sides.id, CAST(sum(dc.c) AS BIGINT) AS t
            FROM sides JOIN dc ON dc.pu = sides.pu AND dc.pv = sides.pv
            GROUP BY sides.id),
    lcc AS (SELECT deg.id, deg.dg, coalesce(cnt.t, 0) AS t
            FROM deg LEFT JOIN cnt ON cnt.id = deg.id),
    acc AS (SELECT CAST(count(*) AS BIGINT) AS vc,
                   sum(CASE WHEN dg > 1
                       THEN CAST(t AS DOUBLE)/(dg*(dg-1)) END)
                     / count(*) AS avg_coeff
            FROM lcc),
    pv AS (SELECT deg.dg, coalesce(outd.o, 0) AS o, coalesce(ind.i, 0) AS i
           FROM deg LEFT JOIN outd ON outd.id = deg.id
                    LEFT JOIN ind ON ind.id = deg.id),
    vm AS (SELECT CAST(sum(dg - (i + o - dg))/2 AS BIGINT) AS uni_edges,
                  CAST(sum(i + o - dg)/2 AS BIGINT) AS bidir_edges,
                  CAST(max(o) AS BIGINT) AS max_out,
                  CAST(max(i) AS BIGINT) AS max_in
           FROM pv)
    SELECT acc.vc AS vertex_count,
           round(acc.avg_coeff, 6) AS average_coefficient,
           vm.uni_edges AS unidirectional_edge_count,
           vm.bidir_edges AS bidirectional_edge_count,
           vm.max_out AS maximum_out_degree, vm.max_in AS maximum_in_degree
    FROM acc, vm
    """,
)
def q_directed_clustering_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly directed AverageClusteringCoefficient + directed
    VertexMetrics in one row (clustering/directed/ and
    metric/directed/ via operators/iterate) on the mixed graph."""
    from flink_efo_spark.operators.iterate import (
        average_clustering_coefficient_directed,
        vertex_metrics_directed,
    )

    e = _mixed_edges(spark, sf_dir)
    a = average_clustering_coefficient_directed(e).select(
        "vertex_count",
        # same 6-decimal discipline as the undirected average
        F.round("average_coefficient", 6).alias("average_coefficient"),
    )
    m = vertex_metrics_directed(e).select(
        "unidirectional_edge_count",
        "bidirectional_edge_count",
        "maximum_out_degree",
        "maximum_in_degree",
    )
    return a.crossJoin(m)
