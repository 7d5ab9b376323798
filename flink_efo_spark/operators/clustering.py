"""Duplicate-group clustering: connected components over a pair list.

A near-dup pipeline (MinHash/SimHash/embedding-cosine) emits *pairs*;
to deduplicate a corpus you need *clusters* — the transitive closure
of pairs — so one representative per cluster survives. The reference
descopes general iterations (SURVEY §2.11; Flink's DataSet iterations
live in flink-java/.../IterativeDataSet.java:42), but duplicate
clustering is a bounded, data-driven special case every training-data
pipeline needs, so it is first-class here.

Algorithm: iterative min-label propagation (the "hash-to-min" /
large-star flavor of map-reduce connected components, cf. Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14):

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until a fixed point. Convergence takes O(log d) rounds on
pathological chains and 1-2 rounds on real near-dup clusters (which
are tiny and dense — dup groups, not social graphs).

100 TB design notes:

* State per round is ``(node, label)`` — two longs — NEVER document
  bodies; edges are ``(src, dst)`` pairs from the LSH stage.
* Each round is one shuffle on node id (the groupBy-min); the edge
  relation is re-joined per round and should be persisted by the
  caller if it was expensive to produce.
* ``localCheckpoint`` truncates the lineage each round so the plan
  does not grow with iteration count (the classic iterative-Spark
  trap); on a cluster use ``spark.sparkContext.setCheckpointDir`` +
  ``checkpoint(eager=True)`` for fault-tolerant truncation instead.
* The convergence test is a single count() of changed labels — one
  lightweight action per round, unavoidable for a data-dependent
  fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str,
    dst_col: str,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of the undirected graph given by
    ``pairs`` → ``(node, cluster_id)`` where ``cluster_id`` is the
    smallest node id reachable from ``node``.

    Only nodes that appear in at least one pair are returned
    (isolated nodes are their own singleton cluster by definition —
    callers join survivors back against the corpus).
    """
    src, dst = F.col(src_col), F.col(dst_col)
    # undirected: keep each edge once, smaller id first
    edges = (
        pairs.select(
            F.least(src, dst).alias("__src"), F.greatest(src, dst).alias("__dst")
        )
        .where(F.col("__src") != F.col("__dst"))
        .distinct()
    )
    # materialize the BIDIRECTIONAL adjacency once so each round is a
    # single join (not separate fwd/bwd joins): both orientations via
    # ONE explode (a union of two shuffled branches would double the
    # partition count — measured 512 partitions of tiny tasks), then
    # hash-partition on node and persist: the cached partitioning
    # satisfies every round's join requirement, so only the (small)
    # label side shuffles per round.
    adj = (
        edges.selectExpr(
            "explode(array(struct(__src AS node, __dst AS nbr), "
            "struct(__dst AS node, __src AS nbr))) AS __e"
        )
        .select("__e.node", "__e.nbr")
        .repartition("node")
        .persist()
    )

    n_adj = adj.count()  # materialization barrier + round sizing
    labels = (
        adj.select("node")
        .distinct()
        .select("node", F.col("node").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )

    def _label_sum(lab: DataFrame) -> int:
        # min-label propagation only ever DECREASES labels, so the
        # fixpoint test is "sum of labels unchanged" — one cheap agg
        # over the checkpointed label table instead of a self-join +
        # count per round
        return lab.agg(F.sum("cluster_id")).collect()[0][0] or 0

    from flink_efo_spark.operators.iterate import round_shuffle_scope

    prev_sum = _label_sum(labels)
    with round_shuffle_scope(pairs.sparkSession, n_adj):
        for _ in range(max_iter):
            # propagate labels across each (directed) adjacency edge
            prop = adj.join(labels, "node").select(
                F.col("nbr").alias("node"), "cluster_id"
            )
            labels = (
                labels.unionByName(prop)
                .groupBy("node")
                .agg(F.min("cluster_id").alias("cluster_id"))
                .localCheckpoint(eager=True)
            )
            new_sum = _label_sum(labels)
            if new_sum == prev_sum:
                break
            prev_sum = new_sum

    adj.unpersist()
    return labels


def dup_cluster_stats(
    pairs: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Per-cluster stats: ``(cluster_id, cluster_size, keep_id)``
    where ``keep_id`` is the surviving representative (min id — same
    rule as :func:`flink_efo_spark.operators.dedup.dedup_exact`)."""
    cc = connected_components(pairs, src_col, dst_col)
    return cc.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"),
        F.min("node").alias("keep_id"),
    )
