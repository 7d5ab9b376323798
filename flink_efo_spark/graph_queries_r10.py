"""Round-10 staging: corpus queries + DuckDB oracles for the round-9
depth operators — directed triangle_listing, the
vertex_centric/gather_sum_apply programming model
(operators/iterate.py), the store-backed evolving-graph PageRank
(streaming.stream_incremental_pagerank + iterate.pagerank_warm), and
the Gelly graph generators (operators/generators.py).

REGISTERED in ``__spark_entry__.queries()`` since round 10
(queries.py ``_register_staged_r10``), after a staging round at the
two-scale gate: every pair here is engine-vs-DuckDB verified by
``tests/test_graph_oracles_r10.py`` (the verify_local comparison)
at sf0.001 and sf0.01.

Determinism: every query orders/limits on exact-integer keys only
(ranks are exact micro-rank integers, masks/ids exact ints).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_efo_spark.graph_queries import (
    _COOC_SQL,
    _MIXED_SQL,
    _cooc_edges,
    _mixed_edges,
)

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn

    return deco


@_q(
    "triangle_listing_masks",
    f"""
    WITH {_MIXED_SQL},
    ded AS (SELECT DISTINCT s, d FROM de WHERE s <> d),
    ce AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v FROM ded),
    dirs AS (SELECT least(s, d) AS pu, greatest(s, d) AS pv,
                    max(CASE WHEN s < d THEN 1 ELSE 0 END)*2
                    + max(CASE WHEN s > d THEN 1 ELSE 0 END) AS m
             FROM ded GROUP BY least(s, d), greatest(s, d)),
    tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
            FROM ce ab JOIN ce bc ON bc.u = ab.v
                       JOIN ce ac ON ac.u = ab.u AND ac.v = bc.v)
    SELECT CAST(tri.a AS BIGINT) AS vertex_id_0,
           CAST(tri.b AS BIGINT) AS vertex_id_1,
           CAST(tri.c AS BIGINT) AS vertex_id_2,
           CAST(dab.m*16 + dac.m*4 + dbc.m AS INT) AS bitmask
    FROM tri JOIN dirs dab ON dab.pu = tri.a AND dab.pv = tri.b
             JOIN dirs dac ON dac.pu = tri.a AND dac.pv = tri.c
             JOIN dirs dbc ON dbc.pu = tri.b AND dbc.pv = tri.c
    ORDER BY vertex_id_0, vertex_id_1, vertex_id_2
    LIMIT 500
    """,
)
def q_triangle_listing_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly directed TriangleListing (clustering/directed/
    TriangleListing.java via operators/iterate.triangle_listing) on
    the mixed directed graph: the first 500 triangles by ID-canonical
    vertex order with their 6-bit direction bitmasks."""
    from flink_efo_spark.operators.iterate import triangle_listing

    out = triangle_listing(_mixed_edges(spark, sf_dir))
    return (
        out.orderBy("vertex_id_0", "vertex_id_1", "vertex_id_2")
        .limit(500)
        .select(
            F.col("vertex_id_0").cast("long").alias("vertex_id_0"),
            F.col("vertex_id_1").cast("long").alias("vertex_id_1"),
            F.col("vertex_id_2").cast("long").alias("vertex_id_2"),
            "bitmask",
        )
    )


@_q(
    "vertex_centric_components",
    f"""
    WITH RECURSIVE {_COOC_SQL},
    adj AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e),
    reach AS (
      SELECT DISTINCT s AS v, s AS m FROM adj
      UNION
      SELECT adj.d, reach.m FROM reach JOIN adj ON adj.s = reach.v)
    SELECT CAST(v AS BIGINT) AS id, CAST(min(m) AS BIGINT) AS component
    FROM reach GROUP BY v
    """,
)
def q_vertex_centric_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GSAConnectedComponents.java through the vertex-centric
    programming model (pregel/VertexCentricIteration.java via
    operators/iterate.vertex_centric): min-id weakly-connected
    components of the co-occurrence graph. Oracle: DuckDB recursive
    transitive reachability + min over reachable ancestors."""
    from flink_efo_spark.operators.iterate import vertex_centric

    e = _cooc_edges(spark, sf_dir)
    und = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    v = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("value"))
    )
    out = vertex_centric(
        v,
        und,
        send_msg=F.col("value"),
        combine_msg=F.min,
        apply_fn=F.least,
        max_rounds=30,
    )
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("value").cast("long").alias("component"),
    )


@_q(
    "stream_evolving_pagerank",
    f"""
    WITH {_MIXED_SQL},
    sl AS (SELECT s AS src, d AS dst, (s*31 + d) % 3 AS k FROM de),
    e1 AS (SELECT src, dst FROM sl WHERE k = 0),
    e2 AS (SELECT src, dst FROM sl WHERE k <= 1),
    e3 AS (SELECT src, dst FROM sl),
    -- epoch 1: one exact-integer round from the cold start (1e6)
    n1 AS (SELECT DISTINCT src AS id FROM e1 UNION SELECT dst FROM e1),
    o1 AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e1 GROUP BY src),
    c1 AS (SELECT e.dst AS id,
                  sum(CAST(floor((1000000 * 85) / (100.0 * o.od))
                      AS BIGINT)) AS sc
           FROM e1 e JOIN o1 o ON o.src = e.src GROUP BY e.dst),
    r1 AS (SELECT n.id, CAST(150000 + coalesce(c1.sc, 0) AS BIGINT) AS r
           FROM n1 n LEFT JOIN c1 ON c1.id = n.id),
    -- epoch 2: warm start (new vertices at 1e6) over e1 UNION slice 1
    n2 AS (SELECT DISTINCT src AS id FROM e2 UNION SELECT dst FROM e2),
    i2 AS (SELECT n.id, CAST(coalesce(r1.r, 1000000) AS BIGINT) AS r
           FROM n2 n LEFT JOIN r1 ON r1.id = n.id),
    o2 AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e2 GROUP BY src),
    c2 AS (SELECT e.dst AS id,
                  sum(CAST(floor((p.r * 85) / (100.0 * o.od))
                      AS BIGINT)) AS sc
           FROM e2 e JOIN i2 p ON p.id = e.src
                     JOIN o2 o ON o.src = e.src GROUP BY e.dst),
    r2 AS (SELECT n.id, CAST(150000 + coalesce(c2.sc, 0) AS BIGINT) AS r
           FROM n2 n LEFT JOIN c2 ON c2.id = n.id),
    -- epoch 3: warm start over the full edge set
    n3 AS (SELECT DISTINCT src AS id FROM e3 UNION SELECT dst FROM e3),
    i3 AS (SELECT n.id, CAST(coalesce(r2.r, 1000000) AS BIGINT) AS r
           FROM n3 n LEFT JOIN r2 ON r2.id = n.id),
    o3 AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e3 GROUP BY src),
    c3 AS (SELECT e.dst AS id,
                  sum(CAST(floor((p.r * 85) / (100.0 * o.od))
                      AS BIGINT)) AS sc
           FROM e3 e JOIN i3 p ON p.id = e.src
                     JOIN o3 o ON o.src = e.src GROUP BY e.dst),
    r3 AS (SELECT n.id, CAST(150000 + coalesce(c3.sc, 0) AS BIGINT) AS r
           FROM n3 n LEFT JOIN c3 ON c3.id = n.id)
    SELECT CAST(id AS BIGINT) AS node_id, r AS rank_e6 FROM r3
    ORDER BY rank_e6 DESC, node_id LIMIT 50
    """,
)
def q_stream_evolving_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING evolving-graph PageRank (streaming.py
    stream_incremental_pagerank + operators/iterate.pagerank_warm):
    the mixed directed graph arrives as 3 deterministic edge slices
    ((src*31+dst) % 3, replayed oldest-file-first); each micro-batch
    distinct-unions the persistent edge store and refreshes the rank
    snapshot with ONE exact-integer round warm-started from the prior
    epoch's snapshot (new vertices at the cold-start value). The
    oracle replays the 3-epoch recurrence unrolled. Top-50 by
    (rank desc, id)."""
    import os
    import tempfile

    from flink_efo_spark.streaming import (
        epoch_below,
        stream_incremental_pagerank,
    )

    # localCheckpoint: the three slice writes each re-ran the whole
    # co-occurrence join otherwise (3x the dominant setup cost); the
    # pin computes it once and the slices filter 3x over the
    # materialized rows. Sequential single-file writes stay — the
    # file source replays in mtime order, which must be slice order.
    e = _mixed_edges(spark, sf_dir).localCheckpoint(eager=True)
    base = tempfile.mkdtemp(prefix="efo_evopr_")
    src_dir = os.path.join(base, "src")
    for k in range(3):
        e.where(
            F.pmod(F.col("src") * 31 + F.col("dst"), F.lit(3)) == k
        ).coalesce(1).write.parquet(os.path.join(src_dir, f"f{k}.parquet"))
    schema = spark.read.parquet(os.path.join(src_dir, "f0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    q = stream_incremental_pagerank(
        stream,
        "src",
        "dst",
        store_dir=os.path.join(base, "store"),
        ranks_dir=os.path.join(base, "ranks"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        n_iter_per_batch=1,
    )
    q.awaitTermination()
    # last epoch from the partition-dir names (streaming.epoch_below)
    # and a direct read of that one epoch dir — no discovery scan of
    # every epoch, no max() job
    last = epoch_below(os.path.join(base, "ranks"))
    return (
        spark.read.parquet(os.path.join(base, "ranks", f"epoch={last}"))
        .select(
            F.col("id").cast("long").alias("node_id"),
            F.col("r").alias("rank_e6"),
        )
        .orderBy(F.col("rank_e6").desc(), "node_id")
        .limit(50)
    )


@_q(
    "gen_circulant_components",
    """
    WITH v AS (SELECT CAST(range AS BIGINT) AS id FROM range(0, 48))
    SELECT id, CAST(id % 2 AS BIGINT) AS component FROM v
    """,
)
def q_gen_circulant_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gelly generator x iteration-model composition: a circulant
    graph (generator/CirculantGraph.java via
    operators/generators.circulant_graph, n=48, offsets {2, 4, 6} —
    all even, so the even and odd vertices form two weakly-connected
    components a few hops wide) run through the vertex_centric Pregel
    harness with the GSAConnectedComponents hooks. Oracle:
    component = parity (min even id 0, min odd id 1). Input tables
    unused by design — generators are self-contained."""
    from flink_efo_spark.operators.generators import circulant_graph
    from flink_efo_spark.operators.iterate import vertex_centric

    verts, edges = circulant_graph(
        spark, 48, [(2, 1), (4, 1), (6, 1)]
    )
    und = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = vertex_centric(
        verts.select("id", F.col("id").alias("value")),
        und,
        send_msg=F.col("value"),
        combine_msg=F.min,
        apply_fn=F.least,
        max_rounds=20,
    )
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("value").cast("long").alias("component"),
    )


@_q(
    "gen_grid_edges",
    """
    WITH v AS (SELECT CAST(range AS BIGINT) AS id FROM range(0, 30)),
    -- dims [(6, wrap), (5, no wrap)]: increments 5 and 1
    -- (// is DuckDB integer division; / would be float)
    d1m AS (SELECT id AS src, id - 5 AS dst FROM v WHERE id // 5 > 0),
    d1mw AS (SELECT id, id + 25 FROM v WHERE id // 5 = 0),
    d1p AS (SELECT id, id + 5 FROM v WHERE id // 5 < 5),
    d1pw AS (SELECT id, id - 25 FROM v WHERE id // 5 = 5),
    d2m AS (SELECT id, id - 1 FROM v WHERE id % 5 > 0),
    d2p AS (SELECT id, id + 1 FROM v WHERE id % 5 < 4),
    uni AS (SELECT * FROM d1m UNION ALL SELECT * FROM d1mw
            UNION ALL SELECT * FROM d1p UNION ALL SELECT * FROM d1pw
            UNION ALL SELECT * FROM d2m UNION ALL SELECT * FROM d2p)
    SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
           CAST(count(*) AS BIGINT) AS n
    FROM uni GROUP BY src, dst
    ORDER BY src, dst
    """,
)
def q_gen_grid_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelly GridGraph (generator/GridGraph.java via
    operators/generators.grid_graph): the 6(wrapped)x5 lattice's edge
    multiset grouped to (src, dst, multiplicity) — the oracle
    replays the per-dimension +/- increment arithmetic in SQL."""
    from flink_efo_spark.operators.generators import grid_graph

    _, edges = grid_graph(spark, [(6, True), (5, False)])
    return (
        edges.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("src", "dst")
    )
