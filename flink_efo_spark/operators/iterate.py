"""Bounded delta iterations: the workset-driven iteration pattern.

Mirrors the reference's DataSet delta iterations
(flink-java/src/main/java/org/apache/flink/api/java/operators/
DeltaIteration.java:46 — solution set + workset, the step function
produces the next workset and solution updates; iteration terminates
when the workset is empty or max iterations hit; bulk variant in
IterativeDataSet.java:42). SURVEY §2.11 descopes *streaming*
iterations; the bounded batch form is what training-data pipelines
actually use (transitive closures, reachability, label propagation),
so it is first-class here: a generic ``delta_iterate`` plus BFS
shortest-distances built on it (clustering.py's connected components
is the other instance of the pattern).

100 TB design notes (same discipline as clustering.py):

* Solution and workset carry only ``(key, value)`` longs — never
  payload rows; the (big, static) edge relation is hash-partitioned
  on the join key and persisted ONCE, so each round shuffles only the
  frontier, which delta iterations keep shrinking.
* ``localCheckpoint`` per round truncates lineage (the iterative-
  Spark plan-growth trap); on a cluster use a checkpoint dir for
  fault-tolerant truncation.
* Convergence is one ``isEmpty``-style count() on the (small) delta
  per round — the same single lightweight action the reference's
  workset-empty test performs
  (DeltaIteration terminates on empty workset).
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INIT_PARTS_KEY = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


@contextmanager
def round_shuffle_scope(
    spark,
    n_rows: int,
    bytes_per_row: int = 32,
    target_bytes: int = 64 << 20,
):
    """Bound the pre-coalesce shuffle fan-out of the per-round jobs to
    the iteration's OWN measured size (guide §2.2: size reduce
    partitions to the data, not to a global constant). The session
    default initialPartitionNum is sized for full-table scans; an
    iteration round shuffles O(E)/O(frontier) payload-free longs whose
    exact row count is known once the adjacency is materialized, and
    paying the full map-bucket fan-out + AQE coalesce planning per
    round is pure per-round overhead (measured 15-30% of the round
    wall on the bench graphs). The value derives from the row count,
    so a 100 TB edge set gets MORE initial partitions than the session
    default while a bounded graph gets the cluster parallelism floor.
    Runtime SQL conf, restored on exit."""
    want = max(
        spark.sparkContext.defaultParallelism,
        (int(n_rows) * bytes_per_row + target_bytes - 1) // target_bytes,
    )
    try:
        old = spark.conf.get(_INIT_PARTS_KEY)
    except Exception:
        old = None
    spark.conf.set(_INIT_PARTS_KEY, str(want))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_INIT_PARTS_KEY)
        else:
            spark.conf.set(_INIT_PARTS_KEY, old)


def delta_iterate(
    solution: DataFrame,
    workset: DataFrame,
    step: Callable[[DataFrame, DataFrame], tuple[DataFrame, DataFrame]],
    max_rounds: int,
    checkpoint_solution: bool = False,
) -> DataFrame:
    """Run a workset-driven iteration: ``step(solution, workset) ->
    (new_solution, new_workset)`` until the workset is empty or
    ``max_rounds`` is reached. Returns the final solution set.

    The caller's ``step`` owns the join/aggregate semantics; this
    harness owns lineage truncation and the termination protocol —
    the split DeltaIteration.java draws between the iteration
    operator and the user's step function.

    Only the (small, shrinking) workset is materialized per round by
    default: when the step builds its solution as unions of prior
    worksets — the common delta pattern — the solution's lineage is
    already a flat union of checkpointed deltas, and re-materializing
    the whole growing solution every round costs O(rounds × solution)
    for nothing (with the step-side delta checkpoint + broadcast
    frontier: 10.9 s → ~5 s on the sf0.1 BFS bench row). Pass
    ``checkpoint_solution=True`` for steps whose solution lineage
    grows in DEPTH per round (e.g. label overwrites) rather than
    breadth.
    """
    def _materialized(df: DataFrame) -> bool:
        # a step that already localCheckpointed its workset (every
        # delta step in this repo does — the checkpoint must sit
        # INSIDE the step so the returned solution union references
        # the materialized delta) leaves a bare LogicalRDD scan;
        # re-checkpointing that is one wasted full-scan job per round
        try:
            plan = df._jdf.queryExecution().analyzed()
            return plan.getClass().getSimpleName() == "LogicalRDD"
        except Exception:
            return False

    if not _materialized(workset):
        workset = workset.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        if not workset.take(1):
            break
        solution, workset = step(solution, workset)
        if checkpoint_solution:
            solution = solution.localCheckpoint(eager=True)
        if not _materialized(workset):
            workset = workset.localCheckpoint(eager=True)
    return solution


def bfs_distances(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    start: list[int],
    max_depth: int,
) -> DataFrame:
    """Unit-weight shortest distances from ``start`` nodes over the
    DIRECTED edge relation → ``(node, dist)`` with ``dist <=
    max_depth``. The classic delta iteration: the workset is the
    frontier (nodes whose distance improved last round), so each
    round joins only the frontier against the partitioned adjacency.
    """
    adj = (
        edges.select(
            F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
        )
        .distinct()
        .repartition("__src")
        .persist()
    )
    # count doubles as the persist's materialization barrier and
    # feeds the round-shuffle sizing below
    n_edges = adj.count()
    spark = edges.sparkSession
    init = spark.createDataFrame(
        [(int(n), 0) for n in start], "node BIGINT, dist BIGINT"
    )

    def step(sol: DataFrame, ws: DataFrame):
        # the frontier is small by construction (each node enters it
        # at most once) — broadcast it so a round never reshuffles
        # the adjacency; on a cluster-scale graph swap the broadcast
        # for a shuffle-hash join that reuses adj's partitioning
        cand = (
            adj.join(F.broadcast(ws), F.col("__src") == F.col("node"))
            .select(
                F.col("__dst").alias("node"),
                (F.col("dist") + 1).alias("dist"),
            )
            .where(F.col("dist") <= max_depth)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # delta = candidates not already settled (BFS: any settled
        # node has a <= distance, so an anti join is the improvement
        # test). Checkpoint HERE so the returned solution union holds
        # the materialized delta, not its plan — otherwise every later
        # round re-executes this round's join inside the union.
        delta = cand.join(sol.select("node"), "node", "left_anti").localCheckpoint(
            eager=True
        )
        return sol.unionByName(delta), delta

    with round_shuffle_scope(spark, n_edges):
        result = delta_iterate(init, init, step, max_rounds=max_depth + 1)
    adj.unpersist()
    return result


def vertex_centric(
    vertices: DataFrame,
    edges: DataFrame,
    send_msg,
    combine_msg: Callable,
    apply_fn: Callable,
    max_rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """The vertex-centric (Pregel) programming model as a declarative
    harness over :func:`delta_iterate` — the reference's
    flink-gelly/.../pregel/VertexCentricIteration.java (ComputeFunction
    + MessageCombiner), with the scatter-gather and gather-sum-apply
    models (spargel/ScatterGatherIteration.java,
    gsa/GatherSumApplyIteration.java) expressible through the same
    three hooks; :func:`gather_sum_apply` is the GSA-named alias.

    Spark-first contract — the hooks are Catalyst Column expressions,
    not per-row functions, so every superstep stays in whole-stage
    codegen (no Python in the loop):

    * ``vertices``: (id, value) — the solution set;
    * ``edges``: (src, dst, [edge-value columns]) — messages flow
      along out-edges;
    * ``send_msg``: Column over the (active-source ⋈ edge) frame —
      sees the source's ``value`` plus every edge column; its result
      is the message delivered to ``dst`` (ScatterFunction /
      ComputeFunction.sendMessageTo along getEdges());
    * ``combine_msg``: aggregate fn (e.g. ``F.min``) reducing a
      target's inbox to one combined message (MessageCombiner — with
      Column algebra a combiner always exists, which is why the inbox
      iterator never materializes);
    * ``apply_fn``: ``(current_value, combined_msg) -> Column`` — the
      new vertex value (GatherFunction.updateVertex / ApplyFunction).

    Superstep semantics match the reference's convergence rule for
    value-driven algorithms (GSAConnectedComponents /
    GSASingleSourceShortestPaths, whose compute functions send only
    on improvement): round 1 every vertex is active; a vertex that
    receives messages re-runs apply; it is active in round k+1 —
    i.e. re-sends along its out-edges — iff its value CHANGED in
    round k. Termination: no active vertices (the empty-workset test)
    or ``max_rounds`` (the reference's maxIterations).

    Scale shape (the delta_iterate discipline): the edge relation is
    hash-partitioned on src and persisted ONCE; a superstep shuffles
    the (small, shrinking) active set into the co-partitioned join,
    one groupBy(dst) combine, one join against the solution on id —
    O(E_active + V) payload-free rows; the changed-delta
    localCheckpoints per round (lineage truncation) and the solution
    overwrite checkpoints via ``checkpoint_solution=True`` (label-
    overwrite lineage grows in depth, per delta_iterate's contract).

    Returns the final (id, value) solution set.
    """
    edge_cols = [c for c in edges.columns if c not in (src, dst)]
    adj = (
        edges.select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__vcdst"),
            *edge_cols,
        )
        .repartition("__src")
        .persist()
    )
    n_edges = adj.count()  # materialization barrier + round sizing
    init = vertices.select(F.col("id"), F.col("value"))

    def step(sol: DataFrame, ws: DataFrame):
        msgs = (
            adj.join(
                ws.select(F.col("id").alias("__src"), "value"), "__src"
            )
            .select(F.col("__vcdst").alias("id"), send_msg.alias("__msg"))
            .groupBy("id")
            .agg(combine_msg(F.col("__msg")).alias("__msg"))
        )
        # only message recipients run apply (the Pregel activation
        # rule); the null-safe inequality keeps null-valued vertices
        # from re-activating forever
        delta = (
            sol.join(msgs, "id")
            .select(
                "id",
                F.col("value").alias("__old"),
                apply_fn(F.col("value"), F.col("__msg")).alias("value"),
            )
            .where(~F.col("value").eqNullSafe(F.col("__old")))
            .select("id", "value")
            .localCheckpoint(eager=True)
        )
        new_sol = (
            sol.join(
                delta.select("id", F.col("value").alias("__new")),
                "id",
                "left",
            )
            .select(
                "id",
                F.coalesce(F.col("__new"), F.col("value")).alias("value"),
            )
        )
        return new_sol, delta

    with round_shuffle_scope(edges.sparkSession, n_edges):
        result = delta_iterate(
            init, init, step, max_rounds=max_rounds, checkpoint_solution=True
        )
    adj.unpersist()
    return result


def gather_sum_apply(
    vertices: DataFrame,
    edges: DataFrame,
    gather,
    sum_fn: Callable,
    apply_fn: Callable,
    max_rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Gather-sum-apply naming for :func:`vertex_centric` — the
    reference's Graph.runGatherSumApplyIteration (flink-gelly/.../gsa/
    GatherSumApplyIteration.java; library twins
    GSAConnectedComponents.java / GSASingleSourceShortestPaths.java).
    ``gather`` is the per-neighbor Column (GatherFunction), ``sum_fn``
    the pairwise reduction as an aggregate (SumFunction — Column
    aggregates are its associative closure), ``apply_fn`` the vertex
    update (ApplyFunction). GSA gathers over IN-neighbors of each
    vertex, which is the message flow along out-edges — the identical
    dataflow, so this is a pure rename."""
    return vertex_centric(
        vertices, edges, gather, sum_fn, apply_fn, max_rounds, src, dst
    )


def scatter_gather(
    vertices: DataFrame,
    edges: DataFrame,
    scatter,
    combine_msg: Callable,
    gather_fn: Callable,
    max_rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Scatter-gather naming for :func:`vertex_centric` — the
    reference's spargel model (flink-gelly/.../spargel/
    ScatterGatherIteration.java: ScatterFunction sends messages along
    the updated vertices' out-edges, GatherFunction folds the inbox
    into the new vertex value). ``scatter`` is the per-edge message
    Column (ScatterFunction.sendMessages), ``combine_msg`` the inbox
    reduction, ``gather_fn`` the (value, combined) update
    (GatherFunction.updateVertex). Identical dataflow to the pregel
    and GSA forms — one implementation, three reference names."""
    return vertex_centric(
        vertices, edges, scatter, combine_msg, gather_fn, max_rounds,
        src, dst,
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Bulk-iteration PageRank (the IterativeDataSet.java:42 bulk
    variant next to delta_iterate's workset form; Flink's own
    PageRank example is the reference's canonical bulk iteration) in
    the corpus's exact-integer discipline: ranks are integers at
    ``scale`` (start = scale), one round computes

        r'(v) = scale*(1-d) + sum_{(u,v) in E} floor(r(u)*85 / (100*outdeg(u)))

    with d = damp_num/damp_den. Every operation is a BIGINT product
    plus ONE IEEE division under floor on identical operands, so
    rounds are bit-identical across engines/partitionings and a
    DuckDB oracle can replay the whole recursion unrolled. Dangling
    nodes (no out-edges) drop their mass — documented simplification,
    same choice as the classic MapReduce formulation.

    Scale shape: the edge relation joined with out-degrees is
    hash-partitioned on src and persisted ONCE; each round is one
    co-partitioned ranks⋈edges join plus one groupBy(dst) shuffle of
    (dst, contrib) longs — O(E) per round, payload-free; ranks are
    localCheckpointed per round (lineage truncation, the
    iterate.py discipline)."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .persist()
    )
    ranks = nodes.select("id", F.lit(scale).cast("long").alias("r"))
    ranks = _pr_rounds(
        nodes, edges, src, dst, ranks, n_iter, scale, damp_num, damp_den
    )
    nodes.unpersist()
    return ranks


def _pr_rounds(
    nodes: DataFrame,
    edges: DataFrame,
    src: str,
    dst: str,
    ranks: DataFrame,
    n_iter: int,
    scale: int,
    damp_num: int,
    damp_den: int,
) -> DataFrame:
    """The exact-integer PageRank round loop shared by :func:`pagerank`
    (cold start = ``scale`` everywhere) and :func:`pagerank_warm`
    (snapshot start). ``ranks`` is (id, r BIGINT) covering every node."""
    outd = edges.groupBy(src).agg(F.count(F.lit(1)).alias("od"))
    adj = (
        edges.join(outd, src)
        .select(F.col(src).alias("__sid"), F.col(dst).alias("id"), "od")
        .repartition(F.col("__sid"))
        .persist()
    )
    n_edges = adj.count()  # materialization barrier + round sizing
    base = scale * (damp_den - damp_num) // damp_den
    with round_shuffle_scope(nodes.sparkSession, n_edges):
        ranks = _pr_loop(
            nodes, ranks, adj, n_iter, scale, base, damp_num, damp_den
        )
    adj.unpersist()
    return ranks


def _pr_loop(nodes, ranks, adj, n_iter, scale, base, damp_num, damp_den):
    for _ in range(n_iter):
        contrib = (
            adj.join(
                ranks.select(F.col("id").alias("__sid"), "r"), "__sid"
            )
            .select(
                "id",
                F.floor(
                    F.col("r") * F.lit(damp_num)
                    / (F.lit(damp_den) * F.col("od"))
                )
                .cast("long")
                .alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("sc"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base).cast("long") + F.coalesce(F.col("sc"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_warm(
    edges: DataFrame,
    init_ranks: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 2,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """:func:`pagerank`'s exact-integer rounds WARM-STARTED from a
    prior snapshot ``init_ranks`` (id, r) — the incremental-graph
    recurrence: vertices of ``edges`` absent from the snapshot start
    at ``scale`` (the cold-start value), snapshot rows for vertices no
    longer in the graph drop out. Runs exactly ``n_iter`` rounds, so
    the evolving-graph sequence snapshot_i = pagerank_warm(E_i,
    snapshot_{i-1}) is fully deterministic and oracle-replayable —
    the streaming operator's contract
    (streaming.stream_incremental_pagerank).

    Scale shape: identical to pagerank (one co-partitioned join + one
    groupBy(dst) of longs per round); the warm start is what makes
    per-batch refresh affordable — a handful of rounds over the grown
    graph instead of a from-scratch recomputation whose round count
    must cover the full mixing time."""
    if n_iter < 1:
        raise ValueError("pagerank_warm requires n_iter >= 1")
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .persist()
    )
    ranks = (
        nodes.join(
            init_ranks.select("id", F.col("r").alias("__r0")), "id", "left"
        )
        .select(
            "id",
            F.coalesce(F.col("__r0"), F.lit(scale))
            .cast("long")
            .alias("r"),
        )
    )
    ranks = _pr_rounds(
        nodes, edges, src, dst, ranks, n_iter, scale, damp_num, damp_den
    )
    nodes.unpersist()
    return ranks


def sssp_distances(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    source: int,
    max_rounds: int,
) -> DataFrame:
    """Single-source shortest paths over a weighted directed edge
    relation — the Gelly library algorithm (flink-gelly/.../library/
    SingleSourceShortestPaths.java, a scatter-gather iteration):
    Bellman-Ford with a frontier workset, so after ``max_rounds``
    rounds the solution holds the exact min distance over paths of
    ≤ ``max_rounds`` edges (a DuckDB oracle replays the rounds
    unrolled; with integer weights every round is exact). Returns
    (node, dist) for reached nodes.

    Unlike BFS, an improvement can revisit a settled node, so the
    solution is re-built per round (min-merge) and checkpointed
    (``checkpoint_solution`` — the lineage grows in depth here).
    Scale shape: adjacency hash-partitioned on src and persisted
    once; a round shuffles only the improvement frontier plus one
    groupBy(node) min. Unlike BFS (where each node enters the
    frontier at most once, so the frontier shrinks monotonically),
    Bellman-Ford's improvement frontier can approach O(V) in middle
    rounds and nodes re-enter it — so the frontier join carries NO
    broadcast hint: AQE sizes each round's localCheckpointed frontier
    at runtime and picks broadcast only when it actually fits."""
    adj = (
        edges.select(
            F.col(src_col).alias("__src"),
            F.col(dst_col).alias("__dst"),
            F.col(weight_col).cast("long").alias("__w"),
        )
        .groupBy("__src", "__dst")
        .agg(F.min("__w").alias("__w"))
        .repartition("__src")
        .persist()
    )
    n_edges = adj.count()  # materialization barrier + round sizing
    spark = edges.sparkSession
    init = spark.createDataFrame(
        [(int(source), 0)], "node BIGINT, dist BIGINT"
    )

    def step(sol: DataFrame, ws: DataFrame):
        cand = (
            # no F.broadcast (unlike BFS): the mid-round Bellman-Ford
            # frontier is not small-bounded — it can cover much of the
            # graph and nodes re-enter it; the hint would bypass AQE's
            # size check and OOM the driver at scale. AQE re-plans
            # from the frontier's true (checkpointed) size each round.
            adj.join(ws, F.col("__src") == F.col("node"))
            .select(
                F.col("__dst").alias("node"),
                (F.col("dist") + F.col("__w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # improvement test: strictly better than the settled distance
        # (or an unreached node) — Bellman-Ford's relaxation
        improved = (
            cand.join(
                sol.select("node", F.col("dist").alias("__old")),
                "node",
                "left",
            )
            .where(F.col("__old").isNull() | (F.col("dist") < F.col("__old")))
            .select("node", "dist")
            .localCheckpoint(eager=True)
        )
        merged = (
            sol.unionByName(improved)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        return merged, improved

    with round_shuffle_scope(spark, n_edges):
        result = delta_iterate(
            init, init, step, max_rounds=max_rounds, checkpoint_solution=True
        )
    adj.unpersist()
    return result


def triangle_enumerate(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Enumerate each triangle of the UNDIRECTED graph exactly once —
    the Gelly library algorithm (flink-gelly/.../library/
    TriangleEnumerator.java, whose flatMaps implement the same
    degree-ordered 'compact-forward' scheme). Returns (a, b, c) with
    a < b < c.

    Scale shape: edges are canonicalized + deduped, then ORIENTED
    from the lower-(degree, id) endpoint to the higher — so a node's
    out-degree is O(sqrt(E)) and the 2-path self-join (the only
    quadratic step) is bounded per pivot; the closing-edge check is a
    plain equi-join against the canonical edge set. Every step is a
    hash shuffle on a key — no cross joins, no driver state."""
    u, v = F.col("__u"), F.col("__v")
    # localCheckpoint (not persist): the canonical edge set feeds three
    # consumers in the LAZY result plan, so a persist could never be
    # safely unpersisted before the caller's action — checkpointing
    # materializes it once and lets GC reclaim the blocks when the
    # result goes out of scope (the module's sibling discipline)
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("__u"),
            F.greatest(F.col(src), F.col(dst)).alias("__v"),
        )
        .where(u < v)  # drops self-loops
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        canon.select(u.alias("__n"))
        .unionAll(canon.select(v.alias("__n")))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    with_deg = (
        canon.join(deg.withColumnRenamed("__n", "__u"), "__u")
        .withColumnRenamed("__d", "__du")
        .join(deg.withColumnRenamed("__n", "__v"), "__v")
        .withColumnRenamed("__d", "__dv")
    )
    lower_first = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (u < v)
    )
    oriented = with_deg.select(
        F.when(lower_first, u).otherwise(v).alias("__x"),
        F.when(lower_first, v).otherwise(u).alias("__y"),
    )
    o1 = oriented.select(F.col("__x"), F.col("__y").alias("__y1"))
    o2 = oriented.select(F.col("__x"), F.col("__y").alias("__y2"))
    paths = o1.join(o2, "__x").where(F.col("__y1") < F.col("__y2"))
    tri = paths.join(
        canon,
        (F.col("__y1") == u) & (F.col("__y2") == v),
    )
    abc = F.array_sort(F.array("__x", "__y1", "__y2"))
    out = tri.select(
        abc[0].alias("a"), abc[1].alias("b"), abc[2].alias("c")
    )
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 2,
) -> DataFrame:
    """Community detection by label propagation — the Gelly library
    algorithm (flink-libraries/flink-gelly/.../library/
    LabelPropagation.java), replayed exactly:

    * labels start as the vertex id;
    * UpdateVertexLabel seeds the frequency contest with the vertex's
      OWN current label at frequency 1 — a lone in-neighbor label
      (count 1) displaces it only if strictly GREATER, while any
      label with count >= 2 always wins; frequency ties go to the
      highest label. All of that collapses to one arg-max over
      (count, label) on the in-neighbor counts UNIONed with a
      per-vertex (own label, 1) incumbent row;
    * scatter-gather activation: ``updateVertex`` runs (and always
      calls ``setNewVertexValue``) only for vertices that RECEIVED a
      message, so round k+1's senders are exactly the vertices with
      >= 1 in-message in round k (round 1: everyone). A vertex with
      no in-edges sends its label once and then goes quiet.

    Runs a fixed ``n_iter`` rounds (Gelly's maxIterations). Fully
    deterministic, so a DuckDB oracle replays the rounds unrolled.
    Returns (id, label).

    Scale shape (the pagerank discipline): the edge relation is
    hash-partitioned on src and persisted ONCE; a round is one
    co-partitioned labels⋈edges join plus one groupBy(dst, label)
    count and one arg-max per dst over counts + O(V) incumbent rows —
    O(E + V) shuffled longs per round, payload-free; labels
    localCheckpoint per round (lineage truncation)."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .persist()
    )
    adj = (
        edges.select(F.col(src).alias("__sid"), F.col(dst).alias("id"))
        .repartition(F.col("__sid"))
        .persist()
    )
    n_edges = adj.count()  # materialization barrier + round sizing
    labels = nodes.select(
        "id", F.col("id").cast("long").alias("label")
    ).withColumn("__act", F.lit(True))
    with round_shuffle_scope(edges.sparkSession, n_edges):
        labels = _lp_rounds(adj, labels, n_iter)
    nodes.unpersist()
    adj.unpersist()
    return labels.select("id", "label")


def _lp_rounds(adj: DataFrame, labels: DataFrame, n_iter: int) -> DataFrame:
    for _ in range(n_iter):
        senders = labels.where(F.col("__act")).select(
            F.col("id").alias("__sid"), "label"
        )
        counts = (
            adj.join(senders, "__sid")
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("__m", F.lit(True))
        )
        # the incumbent row: the vertex's own label at frequency 1
        # (UpdateVertexLabel's mostFrequentLabel/maxFrequency seed).
        # Vertices receiving no messages keep their label through it
        # and deactivate (max(__m) = false)
        incumbent = labels.select(
            "id",
            "label",
            F.lit(1).cast("long").alias("c"),
            F.lit(False).alias("__m"),
        )
        labels = (
            counts.unionByName(incumbent)
            .groupBy("id")
            .agg(
                F.max(F.struct(F.col("c"), F.col("label")))["label"].alias(
                    "label"
                ),
                F.max(F.col("__m")).alias("__act"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def _canonical_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical (u < v) deduped edge set of an undirected simple
    graph — self-loops dropped (the Gelly similarity algorithms
    require a simple undirected input). localCheckpoint: the set feeds
    multiple consumers in the lazy result plan (triangle_enumerate's
    discipline)."""
    u, v = F.col("__u"), F.col("__v")
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("__u"),
            F.greatest(F.col(src), F.col(dst)).alias("__v"),
        )
        .where(u < v)
        .distinct()
        .localCheckpoint(eager=True)
    )


def jaccard_index(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_pivot_degree: "int | None" = None,
) -> DataFrame:
    """Jaccard similarity of vertex NEIGHBORHOODS — the Gelly library
    algorithm (flink-gelly/.../library/similarity/JaccardIndex.java):
    for every vertex pair with at least one shared neighbor, emit
    ``shared`` = |N(a) ∩ N(b)| and ``distinct`` = |N(a) ∪ N(b)| =
    deg(a) + deg(b) - shared; the index is shared/distinct in (0, 1].
    Input is treated as a simple undirected graph (edges are
    canonicalized, deduped, self-loops dropped). Returns
    (v0, v1, shared_count, distinct_count, jaccard) with v0 < v1 —
    exactly the non-zero coefficients, like the reference.

    Scale shape: pair generation is the 2-path fan-out — each vertex w
    emits its neighbor pairs, Σ deg(w)² rows total, the same bound the
    reference pays (its ``groupSize`` chunking only balances tasks;
    here the pivot shuffle is AQE-skew-splittable). Everything after
    is one groupBy(pair) count plus two co-keyed degree joins — no
    cross join, no driver state, doubles only in the final ratio.

    ``max_pivot_degree`` (default None = exact, the reference
    semantics) EXCLUDES pivots with more than that many neighbors from
    pair generation — the standard celebrity-node cut for quadratic
    neighborhood ops: on a graph whose hubs approach O(V) degree the
    exact fan-out is Θ(V²) and no engine survives it, so production
    similarity prunes hubs. Shared counts become lower bounds, the
    deg(a)+deg(b)-shared union term correspondingly an upper bound
    (degrees stay exact), so the reported jaccard is a LOWER bound of
    the true index."""
    canon = _canonical_undirected(edges, src, dst)
    u, v = F.col("__u"), F.col("__v")
    # symmetric neighbor relation: pivot w -> neighbor n
    nbrs = canon.select(u.alias("__w"), v.alias("__n")).unionAll(
        canon.select(v.alias("__w"), u.alias("__n"))
    )
    deg = nbrs.groupBy("__w").agg(F.count(F.lit(1)).alias("__d"))
    fan = nbrs
    if max_pivot_degree is not None:
        fan = nbrs.join(
            deg.where(F.col("__d") <= int(max_pivot_degree)).select("__w"),
            "__w",
        )
    a = fan.select("__w", F.col("__n").alias("__a"))
    b = fan.select("__w", F.col("__n").alias("__b"))
    shared = (
        a.join(b, "__w")
        .where(F.col("__a") < F.col("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("shared_count"))
    )
    return (
        shared.join(deg.withColumnRenamed("__w", "__a"), "__a")
        .withColumnRenamed("__d", "__da")
        .join(deg.withColumnRenamed("__w", "__b"), "__b")
        .withColumnRenamed("__d", "__db")
        .select(
            F.col("__a").alias("v0"),
            F.col("__b").alias("v1"),
            "shared_count",
            (F.col("__da") + F.col("__db") - F.col("shared_count")).alias(
                "distinct_count"
            ),
            F.try_divide(
                F.col("shared_count").cast("double"),
                (F.col("__da") + F.col("__db") - F.col("shared_count"))
                .cast("double"),
            ).alias("jaccard"),
        )
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_pivot_degree: "int | None" = None,
) -> DataFrame:
    """Adamic-Adar link-prediction score — the Gelly library algorithm
    (flink-gelly/.../library/similarity/AdamicAdar.java): for every
    vertex pair with at least one shared neighbor w, score =
    Σ_w 1/ln(deg(w)) (high-degree shared neighbors count less).
    Simple undirected input, same canonicalization as
    :func:`jaccard_index`. Returns (v0, v1, score) with v0 < v1.

    Scale shape: identical 2-path fan-out as Jaccard, but each pivot's
    weight 1/ln(deg) is joined BEFORE the pair fan-out (one narrow
    column rides the Σ deg² rows) and the pair aggregation is a plain
    double sum — one shuffle on the pair key. Degree-1 pivots
    (ln(1)=0) cannot produce pairs, so the weight is never infinite.

    ``max_pivot_degree``: same opt-in celebrity-node cut as
    :func:`jaccard_index` (default None = exact); Adamic-Adar is the
    better candidate for it — a hub pivot's own weight 1/ln(deg) is
    already near zero, so dropping hubs barely moves scores while
    removing the Θ(hub-degree²) fan-out."""
    canon = _canonical_undirected(edges, src, dst)
    u, v = F.col("__u"), F.col("__v")
    nbrs = canon.select(u.alias("__w"), v.alias("__n")).unionAll(
        canon.select(v.alias("__w"), u.alias("__n"))
    )
    deg = nbrs.groupBy("__w").agg(F.count(F.lit(1)).alias("__d"))
    if max_pivot_degree is not None:
        deg = deg.where(F.col("__d") <= int(max_pivot_degree))
    weighted = nbrs.join(deg, "__w").select(
        "__w",
        "__n",
        F.try_divide(F.lit(1.0), F.log(F.col("__d").cast("double"))).alias(
            "__iw"
        ),
    )
    a = weighted.select("__w", F.col("__n").alias("__a"), "__iw")
    b = weighted.select("__w", F.col("__n").alias("__b"))
    return (
        a.join(b, "__w")
        .where(F.col("__a") < F.col("__b"))
        .groupBy("__a", "__b")
        .agg(F.sum("__iw").alias("score"))
        .select(
            F.col("__a").alias("v0"), F.col("__b").alias("v1"), "score"
        )
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
) -> DataFrame:
    """Hyperlink-Induced Topic Search — the Gelly library algorithm
    (flink-gelly/.../library/linkanalysis/HITS.java), replayed on its
    DIRECTED edge multiset:

    * scores start on the vertices that appear as an edge target
      (``InitializeScores`` maps each edge to its target with hub 0,
      authority 1, then sums): initial authority = in-degree,
      non-normalized;
    * one round: hub(u) = Σ authority over u's out-edge targets;
      authority(v) = Σ of that round's still-UN-normalized hub over
      v's in-edge sources (``Authority`` consumes ``hubbiness``, not
      the normalized join); then both relations are jointly
      L2-normalized through their full outer join
      (``JoinAndNormalizeHubAndAuthority`` with the two squared-sum
      broadcast sets) — a missing side is 0.

    Runs a fixed ``n_iter`` rounds (the iteration-count constructor;
    the convergence-threshold variant is a stopping rule over the same
    rounds). Zero norms (degenerate inputs) yield NULL rather than the
    reference's NaN. Returns (id, hub, authority).

    Scale shape (the label_propagation discipline): the edge relation
    is persisted once; a round is two co-keyed edge⋈score joins + two
    groupBy sums (O(E) doubles each), two 1-row squared-sum aggregates
    that ride a broadcast cross join (never collected), and one full
    outer join on id; scores localCheckpoint per round (lineage
    truncation). No driver state, no cross join wider than 1 row.
    """
    if n_iter < 1:
        # reference parity: HITS.java's Preconditions.checkArgument
        # (iterations > 0). With 0 rounds the initial frame has no hub
        # column and the final select would raise AnalysisException.
        raise ValueError("hits requires n_iter >= 1")
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).persist()
    n_edges = e.count()  # materialization barrier + round sizing
    scores = e.groupBy(F.col("__d").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("authority")
    )
    with round_shuffle_scope(edges.sparkSession, n_edges):
        scores = _hits_rounds(e, scores, n_iter)
    e.unpersist()
    return scores.select("id", "hub", "authority")


def _hits_rounds(e: DataFrame, scores: DataFrame, n_iter: int) -> DataFrame:
    for _ in range(n_iter):
        # hub feeds three consumers (authority, its norm, the final
        # join) and authority two — materialize each once per round or
        # the hub subtree re-executes up to 4x (localCheckpoint, the
        # module discipline; measured 20.8 s -> 7.6 s at the 10x graph)
        hub = (
            e.join(
                scores.select(F.col("id").alias("__d"), "authority"), "__d"
            )
            .groupBy(F.col("__s").alias("id"))
            .agg(F.sum("authority").alias("hub"))
            .localCheckpoint(eager=True)
        )
        auth = (
            e.join(hub.select(F.col("id").alias("__s"), "hub"), "__s")
            .groupBy(F.col("__d").alias("id"))
            .agg(F.sum("hub").alias("authority"))
            .localCheckpoint(eager=True)
        )
        norms = hub.agg(
            F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("__nh")
        ).crossJoin(
            auth.agg(
                F.sqrt(
                    F.sum(F.col("authority") * F.col("authority"))
                ).alias("__na")
            )
        )
        scores = (
            hub.join(auth, "id", "full_outer")
            .crossJoin(F.broadcast(norms))
            .select(
                "id",
                F.try_divide(
                    F.coalesce(F.col("hub"), F.lit(0.0)), F.col("__nh")
                ).alias("hub"),
                F.try_divide(
                    F.coalesce(F.col("authority"), F.lit(0.0)),
                    F.col("__na"),
                ).alias("authority"),
            )
            .localCheckpoint(eager=True)
        )
    return scores


def local_clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient of the UNDIRECTED simple graph —
    the Gelly library algorithm (flink-gelly/.../library/clustering/
    undirected/LocalClusteringCoefficient.java): per vertex, degree
    and the number of triangles containing it (equivalently, edges
    between its neighbors); the score divides the triangle count by
    the ``deg*(deg-1)/2`` potential neighbor pairs. Vertices of degree
    <= 1 score NULL (the reference's NaN). Zero-degree vertices cannot
    exist here (vertices are induced from edges), matching
    ``setIncludeZeroDegreeVertices(false)``. Returns
    (id, degree, triangle_count, coefficient).

    Scale shape: riding :func:`triangle_enumerate`'s degree-oriented
    compact-forward listing (the only quadratic step is bounded per
    pivot), the rest is one explode + two co-keyed aggregations —
    O(V + #triangles) rows shuffled."""
    canon = _canonical_undirected(edges, src, dst)
    deg = (
        canon.select(F.col("__u").alias("id"))
        .unionAll(canon.select(F.col("__v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri_per_v = (
        triangle_enumerate(canon, "__u", "__v")
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangle_count"))
    )
    joined = deg.join(tri_per_v, "id", "left").select(
        "id",
        "degree",
        F.coalesce(F.col("triangle_count"), F.lit(0)).alias(
            "triangle_count"
        ),
    )
    return joined.select(
        "id",
        "degree",
        "triangle_count",
        F.try_divide(
            F.col("triangle_count").cast("double"),
            (F.col("degree") * (F.col("degree") - 1) / 2).cast("double"),
        ).alias("coefficient"),
    )


def community_detection(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: "str | None" = None,
    n_iter: int = 3,
    delta: float = 0.5,
    labels: "DataFrame | None" = None,
) -> DataFrame:
    """Community detection with hop attenuation — the Gelly library
    algorithm (flink-gelly/.../library/CommunityDetection.java, the
    Leung et al. real-time community detection paper), replayed
    exactly on the UNDIRECTED weighted multigraph (``getUndirected``
    duplicates every directed edge reversed, no dedup):

    * state = (label, score), initial label = the vertex id (or the
      optional ``labels`` (id, label) relation — the reference takes
      the vertex value), initial score 1.0;
    * every active vertex sends (label, score * edge weight) along
      each incident edge; a vertex that received >= 1 message adopts
      the received label with the highest SUMMED score — equal sums go
      to the LOWEST label (``VertexLabelUpdater`` scans a ``TreeMap``
      ascending with a strict ``>``) — and re-scores it to that
      label's highest SINGLE message score, minus ``delta/superstep``
      when the label changed;
    * scatter-gather activation, exactly :func:`label_propagation`'s:
      round k+1's senders are the vertices that received a message in
      round k (round 1: everyone); message-less vertices keep their
      state and go quiet.

    Runs fixed ``n_iter`` rounds (the reference's maxIterations cap;
    its no-vertex-updated convergence stop is a subset). Labels must
    be numeric (the reference's are longs). Returns (id, label).

    Scale shape: identical to :func:`label_propagation` — one
    co-keyed edges⋈senders join, one groupBy(id, label) sum/max, one
    arg-min-struct per id, one left join back to O(V) state rows;
    O(E) doubles per round, state localCheckpointed per round."""
    w = F.col(weight) if weight else F.lit(1.0)
    adj = (
        edges.select(
            F.col(src).alias("__sid"),
            F.col(dst).alias("id"),
            w.cast("double").alias("__w"),
        )
        .unionAll(
            edges.select(
                F.col(dst).alias("__sid"),
                F.col(src).alias("id"),
                w.cast("double").alias("__w"),
            )
        )
        .repartition(F.col("__sid"))
        .persist()
    )
    if labels is not None:
        state = labels.select(
            "id", F.col("label").cast("long").alias("label")
        )
    else:
        state = (
            adj.select(F.col("id"))
            .distinct()
            .select("id", F.col("id").cast("long").alias("label"))
        )
    state = state.select(
        "id", "label", F.lit(1.0).alias("score"), F.lit(True).alias("__act")
    )
    n_adj = adj.count()  # materialization barrier + round sizing
    with round_shuffle_scope(edges.sparkSession, n_adj):
        state = _cd_rounds(adj, state, n_iter, delta)
    adj.unpersist()
    return state.select("id", "label")


def _cd_rounds(
    adj: DataFrame, state: DataFrame, n_iter: int, delta: float
) -> DataFrame:
    for k in range(1, n_iter + 1):
        senders = state.where(F.col("__act")).select(
            F.col("id").alias("__sid"), "label", "score"
        )
        per_label = (
            adj.join(senders, "__sid")
            .select("id", "label", (F.col("score") * F.col("__w")).alias("__s"))
            .groupBy("id", "label")
            .agg(F.sum("__s").alias("__c"), F.max("__s").alias("__m"))
        )
        win = (
            per_label.groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__c")).alias("nc"),
                        F.col("label").alias("l"),
                        F.col("__m").alias("m"),
                    )
                ).alias("__w")
            )
            .select(
                "id",
                F.col("__w.l").alias("__nl"),
                F.col("__w.m").alias("__nm"),
            )
        )
        state = (
            state.join(win, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("__nl"), F.col("label")).alias("label"),
                F.when(
                    F.col("__nl").isNull(), F.col("score")
                ).otherwise(
                    F.col("__nm")
                    - F.when(
                        F.col("__nl") != F.col("label"), F.lit(delta / k)
                    ).otherwise(F.lit(0.0))
                ).alias("score"),
                F.col("__nl").isNotNull().alias("__act"),
            )
            .localCheckpoint(eager=True)
        )
    return state


def summarize_graph(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    value_col: str = "value",
    src: str = "src",
    dst: str = "dst",
    edge_value: "str | None" = None,
) -> "tuple[DataFrame, DataFrame]":
    """Graph summarization — the Gelly library algorithm
    (flink-gelly/.../library/Summarization.java): vertices sharing a
    value collapse into one summary vertex (count attached); edges
    collapse per (source group, target group, edge value) with counts
    (a group's self-edge aggregates its internal edges). The
    reference picks an arbitrary group member as the representative
    id ('guaranteed ... one of the represented vertex identifiers');
    this picks the MINIMUM member id, a deterministic member. Returns
    ``(summary_vertices, summary_edges)`` =
    ((id, value, count), (src, dst[, edge value], count)).

    Scale shape: one groupBy(value) min+count, one broadcast-eligible
    rep map joined twice onto edges (co-keyed on vertex id), one
    groupBy on the summary-edge key — three shuffles total, no
    iteration, no driver state."""
    groups = vertices.groupBy(F.col(value_col)).agg(
        F.min(F.col(id_col)).alias("__rep"),
        F.count(F.lit(1)).alias("count"),
    )
    sum_vertices = groups.select(
        F.col("__rep").alias(id_col), value_col, "count"
    )
    rep_map = vertices.join(
        groups.select(value_col, "__rep"), value_col
    ).select(F.col(id_col).alias("__vid"), "__rep")
    ev = [F.col(edge_value)] if edge_value else []
    mapped = (
        edges.join(rep_map.withColumnRenamed("__vid", src), src)
        .withColumnRenamed("__rep", "__rs")
        .join(rep_map.withColumnRenamed("__vid", dst), dst)
        .withColumnRenamed("__rep", "__rd")
    )
    sum_edges = (
        mapped.groupBy(
            F.col("__rs").alias(src), F.col("__rd").alias(dst), *ev
        )
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return sum_vertices, sum_edges


def global_clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global clustering coefficient of the undirected simple graph —
    the Gelly library algorithm (flink-gelly/.../library/clustering/
    undirected/GlobalClusteringCoefficient.java): triplets =
    Σ_v C(deg(v), 2), score = (3 * triangle listing count) / triplets
    (each triangle closes three triplets); NULL when the graph has no
    triplets (the reference's NaN). Returns one row
    (triplet_count, triangle_count, coefficient)."""
    canon = _canonical_undirected(edges, src, dst)
    deg = (
        canon.select(F.col("__u").alias("id"))
        .unionAll(canon.select(F.col("__v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    triplets = deg.agg(
        F.coalesce(
            F.sum(F.col("__d") * (F.col("__d") - 1) / 2), F.lit(0.0)
        ).cast("long").alias("triplet_count")
    )
    tris = triangle_enumerate(canon, "__u", "__v").agg(
        F.count(F.lit(1)).alias("triangle_count")
    )
    return triplets.crossJoin(tris).select(
        "triplet_count",
        "triangle_count",
        F.try_divide(
            (3 * F.col("triangle_count")).cast("double"),
            F.col("triplet_count").cast("double"),
        ).alias("coefficient"),
    )


def average_clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Average clustering coefficient — the Gelly library algorithm
    (flink-gelly/.../library/clustering/undirected/
    AverageClusteringCoefficient.java): the local coefficient summed
    over vertices with degree > 1 (degree-1 scores are undefined and
    contribute 0), divided by the count of ALL vertices. Returns one
    row (vertex_count, average_coefficient)."""
    local = local_clustering_coefficient(edges, src, dst)
    return local.agg(
        F.count(F.lit(1)).alias("vertex_count"),
        F.try_divide(
            F.coalesce(
                F.sum(F.when(F.col("degree") > 1, F.col("coefficient"))),
                F.lit(0.0),
            ),
            F.count(F.lit(1)).cast("double"),
        ).alias("average_coefficient"),
    )


def triadic_census(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Triadic census of the undirected simple graph — the Gelly
    analytic (flink-gelly/.../library/clustering/undirected/
    TriadicCensus.java): counts of vertex triples connected by 0, 1,
    2, or 3 edges, in the reference's exact closed form over four
    scalar metrics (it uses BigInteger; DECIMAL(38,0) here, since
    C(V,3) = V(V-1)(V-2)/6 exceeds 2^63 once V > ~3.8e6 — any web
    graph blows a BIGINT immediately):

        t3 = triangles
        t2 = triplets - 3*t3
        t1 = E*(V-2) - 2*t2 - 3*t3
        t0 = C(V,3) - t1 - t2 - t3

    Vertices are edge-induced (isolated vertices can't exist here;
    the reference's VertexMetrics counts them from the vertex set).
    Returns one row (t0, t1, t2, t3) as DECIMAL(38,0).

    Scale shape: one canonical edge set feeding three O(E) aggregates
    plus the triangle listing; the census itself is arithmetic over
    four 1-row relations cross-joined (broadcast, never collected)."""
    canon = _canonical_undirected(edges, src, dst)
    deg = (
        canon.select(F.col("__u").alias("id"))
        .unionAll(canon.select(F.col("__v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    dec = "decimal(38,0)"
    vm = deg.agg(
        F.count(F.lit(1)).cast(dec).alias("__v"),
        F.coalesce(
            F.sum((F.col("__d") * (F.col("__d") - 1) / 2).cast("long")),
            F.lit(0),
        ).cast(dec).alias("__triplets"),
    )
    em = canon.agg(F.count(F.lit(1)).cast(dec).alias("__e"))
    tm = triangle_enumerate(canon, "__u", "__v").agg(
        F.count(F.lit(1)).cast(dec).alias("__t")
    )
    t3 = F.col("__t")
    t2 = F.col("__triplets") - 3 * t3
    t1 = F.col("__e") * (F.col("__v") - 2) - 2 * t2 - 3 * t3
    t0 = (
        F.col("__v") * (F.col("__v") - 1) * (F.col("__v") - 2) / 6
    ).cast(dec) - t1 - t2 - t3
    return (
        vm.crossJoin(em)
        .crossJoin(tm)
        .select(
            t0.cast(dec).alias("t0"),
            t1.cast(dec).alias("t1"),
            t2.cast(dec).alias("t2"),
            t3.cast(dec).alias("t3"),
        )
    )


def bipartite_projection(
    edges: DataFrame,
    top: str = "top",
    bottom: str = "bottom",
    edge_value: "str | None" = None,
    side: str = "top",
    full: bool = False,
) -> DataFrame:
    """Bipartite graph projection — the Gelly bipartite API
    (flink-gelly/.../bipartite/BipartiteGraph.java
    projectionTopSimple/Full, projectionBottomSimple/Full): project
    onto the ``side`` vertex set by self-joining the edge list on the
    OTHER side; every pair of distinct ``side`` vertices sharing a
    counterpart yields one projected edge PER shared counterpart (a
    multigraph, both directions — the reference's flat join emits
    (first, second) and (second, first)). ``simple`` carries the two
    incident edge values (ev0, ev1) when ``edge_value`` is given;
    ``full=True`` additionally carries the connecting intermediate
    vertex id (the reference's Projection also packs the three vertex
    VALUES — value columns ride along the same join if the caller
    pre-joins them). Returns (src, dst[, link][, ev0, ev1]).

    Scale shape: one self-equi-join on the counterpart key —
    Σ deg(counterpart)² output rows, the reference's own bound; a
    popular counterpart is a skewed join key that AQE skew-splits. No
    cross join; nothing on the driver."""
    if side not in ("top", "bottom"):
        raise ValueError(f"side must be 'top' or 'bottom', got {side!r}")
    keep, other = (top, bottom) if side == "top" else (bottom, top)
    ev = [F.col(edge_value)] if edge_value else []
    a = edges.select(
        F.col(other).alias("__k"),
        F.col(keep).alias("__a"),
        *[c.alias("ev0") for c in ev],
    )
    b = edges.select(
        F.col(other).alias("__k"),
        F.col(keep).alias("__b"),
        *[c.alias("ev1") for c in ev],
    )
    out_cols = [F.col("__a").alias("src"), F.col("__b").alias("dst")]
    if full:
        out_cols.append(F.col("__k").alias("link"))
    if edge_value:
        out_cols += [F.col("ev0"), F.col("ev1")]
    return (
        a.join(b, "__k")
        .where(F.col("__a") != F.col("__b"))
        .select(*out_cols)
    )


def vertex_metrics(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Undirected graph metrics — the Gelly analytic
    (flink-gelly/.../library/metric/undirected/VertexMetrics.java) on
    the canonical simple graph: vertex count, edge count, triplet
    count (Σ C(deg, 2)), maximum degree, and maximum per-vertex
    triplet count. Vertices are edge-induced (the reference counts
    isolated vertices from its vertex set). One row.

    Scale shape: one canonical edge set, one degree aggregation, five
    scalar aggregates — two shuffles, nothing iterative."""
    canon = _canonical_undirected(edges, src, dst)
    deg = (
        canon.select(F.col("__u").alias("id"))
        .unionAll(canon.select(F.col("__v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    tpl = (F.col("__d") * (F.col("__d") - 1) / 2).cast("long")
    return deg.agg(
        F.count(F.lit(1)).alias("vertex_count"),
        (F.sum("__d") / 2).cast("long").alias("edge_count"),
        F.coalesce(F.sum(tpl), F.lit(0)).alias("triplet_count"),
        F.coalesce(F.max("__d"), F.lit(0)).alias("maximum_degree"),
        F.coalesce(F.max(tpl), F.lit(0)).alias("maximum_triplets"),
    )


def local_clustering_coefficient_directed(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Directed local clustering coefficient — the Gelly library
    algorithm (flink-gelly/.../library/clustering/directed/
    LocalClusteringCoefficient.java): per vertex, the count of
    DIRECTED edges between its (distinct) neighbors over the
    ``deg*(deg-1)`` potential directed neighbor edges. The reference's
    ``SplitTriangles`` credits a vertex 2 when the opposite pair of a
    listed triangle is connected in both directions (its bitmask
    test), 1 otherwise — equivalently: per canonical neighbor pair,
    the number of directions present. Degree <= 1 scores NULL (the
    reference's NaN). Returns (id, degree, directed_edge_count,
    coefficient).

    Scale shape: the triangle listing is the undirected support's
    degree-oriented one; the direction count is one groupBy over the
    deduped directed edges joined once onto the exploded
    (vertex, opposite pair) rows — O(V + #triangles) extra."""
    ded = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(F.col("__s") != F.col("__d"))
        .distinct()
    )
    canon = _canonical_undirected(ded, "__s", "__d")
    deg = (
        canon.select(F.col("__u").alias("id"))
        .unionAll(canon.select(F.col("__v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    dircnt = (
        ded.select(
            F.least("__s", "__d").alias("__pu"),
            F.greatest("__s", "__d").alias("__pv"),
        )
        .groupBy("__pu", "__pv")
        .agg(F.count(F.lit(1)).alias("__dc"))
    )
    tri = triangle_enumerate(canon, "__u", "__v")
    # (vertex, opposite pair) — a < b < c keeps pu < pv in all three
    sides = (
        tri.select(F.col("a").alias("id"), F.col("b").alias("__pu"),
                   F.col("c").alias("__pv"))
        .unionAll(tri.select(F.col("b").alias("id"), F.col("a").alias("__pu"),
                             F.col("c").alias("__pv")))
        .unionAll(tri.select(F.col("c").alias("id"), F.col("a").alias("__pu"),
                             F.col("b").alias("__pv")))
    )
    cnt = (
        sides.join(dircnt, ["__pu", "__pv"])
        .groupBy("id")
        .agg(F.sum("__dc").alias("directed_edge_count"))
    )
    return (
        deg.join(cnt, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce(F.col("directed_edge_count"), F.lit(0)).alias(
                "directed_edge_count"
            ),
            F.try_divide(
                F.coalesce(F.col("directed_edge_count"), F.lit(0)).cast(
                    "double"
                ),
                (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            ).alias("coefficient"),
        )
    )


def average_clustering_coefficient_directed(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Directed average clustering coefficient (flink-gelly/.../
    clustering/directed/AverageClusteringCoefficient.java): directed
    local scores of deg>1 vertices summed, divided by the count of
    ALL vertices. One row (vertex_count, average_coefficient).

    (The directed GLOBAL coefficient is NOT implemented separately:
    the reference computes it as 3*triangles / sum-of-C(deg,2) with
    degree = distinct neighbors, which is exactly
    :func:`global_clustering_coefficient` of the undirected
    support.)"""
    local = local_clustering_coefficient_directed(edges, src, dst)
    return local.agg(
        F.count(F.lit(1)).alias("vertex_count"),
        F.try_divide(
            F.coalesce(
                F.sum(F.when(F.col("degree") > 1, F.col("coefficient"))),
                F.lit(0.0),
            ),
            F.count(F.lit(1)).cast("double"),
        ).alias("average_coefficient"),
    )


def vertex_metrics_directed(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Directed graph metrics — the Gelly analytic
    (flink-gelly/.../library/metric/directed/VertexMetrics.java) on
    the deduped directed simple graph: vertex count, unidirectional /
    bidirectional edge counts (per-vertex ``out+in-degree`` overlap,
    summed and halved like the reference's helper), triplet count
    (Σ C(deg, 2) over distinct-neighbor degrees), and the maximum
    degree / out-degree / in-degree / per-vertex triplets. One row."""
    ded = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(F.col("__s") != F.col("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outd = ded.groupBy(F.col("__s").alias("id")).agg(
        F.count(F.lit(1)).alias("__out")
    )
    ind = ded.groupBy(F.col("__d").alias("id")).agg(
        F.count(F.lit(1)).alias("__in")
    )
    deg = (
        ded.select(
            F.least("__s", "__d").alias("__u"),
            F.greatest("__s", "__d").alias("__v"),
        )
        .distinct()
        .select(F.explode(F.array("__u", "__v")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    per_v = (
        deg.join(outd, "id", "left")
        .join(ind, "id", "left")
        .select(
            "id",
            "__deg",
            F.coalesce(F.col("__out"), F.lit(0)).alias("__out"),
            F.coalesce(F.col("__in"), F.lit(0)).alias("__in"),
        )
        .withColumn(
            "__bidir", F.col("__out") + F.col("__in") - F.col("__deg")
        )
        .withColumn("__tpl", (F.col("__deg") * (F.col("__deg") - 1) / 2).cast("long"))
    )
    return per_v.agg(
        F.count(F.lit(1)).alias("vertex_count"),
        ((F.sum(F.col("__deg") - F.col("__bidir"))) / 2)
        .cast("long")
        .alias("unidirectional_edge_count"),
        (F.sum("__bidir") / 2).cast("long").alias(
            "bidirectional_edge_count"
        ),
        F.coalesce(F.sum("__tpl"), F.lit(0)).alias("triplet_count"),
        F.coalesce(F.max("__deg"), F.lit(0)).alias("maximum_degree"),
        F.coalesce(F.max("__out"), F.lit(0)).alias("maximum_out_degree"),
        F.coalesce(F.max("__in"), F.lit(0)).alias("maximum_in_degree"),
        F.coalesce(F.max("__tpl"), F.lit(0)).alias("maximum_triplets"),
    )


def edge_metrics(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Undirected edge metrics — the Gelly analytic
    (flink-gelly/.../library/metric/undirected/EdgeMetrics.java): per
    vertex, ``low`` = its incident edges where it is the LOWER
    (degree, id)-ordered endpoint (exactly the compact-forward
    orientation :func:`triangle_enumerate` uses), then
    triangle triplets = C(low, 2) and rectangle triplets =
    C(low, 2) + low*high, summed and maxed globally. One row
    (triangle_triplet_count, rectangle_triplet_count,
    maximum_triangle_triplets, maximum_rectangle_triplets).

    This IS the cost predictor for the triangle listing: the sum of
    triangle triplets is the exact row count of its 2-path self-join,
    and the maximum is the worst pivot — run it before a 100 TB
    triangle/similarity job to size (or cap) the quadratic stage.

    (The reference's DIRECTED EdgeMetrics computes the same two
    formulas over distinct-neighbor degrees and the same
    lower-(degree, id) orientation, which is exactly this function on
    the directed graph's undirected support — one implementation
    serves both, like the directed global clustering coefficient.)"""
    canon = _canonical_undirected(edges, src, dst)
    u, v = F.col("__u"), F.col("__v")
    deg = (
        canon.select(u.alias("id"))
        .unionAll(canon.select(v.alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    with_deg = (
        canon.join(deg.withColumnRenamed("id", "__u"), "__u")
        .withColumnRenamed("__d", "__du")
        .join(deg.withColumnRenamed("id", "__v"), "__v")
        .withColumnRenamed("__d", "__dv")
    )
    lower_first = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (u < v)
    )
    low = (
        with_deg.select(
            F.when(lower_first, u).otherwise(v).alias("id")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__low"))
    )
    per_v = deg.join(low, "id", "left").select(
        "id",
        "__d",
        F.coalesce(F.col("__low"), F.lit(0)).alias("__low"),
    )
    tri_t = (F.col("__low") * (F.col("__low") - 1) / 2).cast("long")
    rect_t = (
        tri_t + F.col("__low") * (F.col("__d") - F.col("__low"))
    ).cast("long")
    return per_v.agg(
        F.coalesce(F.sum(tri_t), F.lit(0)).alias("triangle_triplet_count"),
        F.coalesce(F.sum(rect_t), F.lit(0)).alias(
            "rectangle_triplet_count"
        ),
        F.coalesce(F.max(tri_t), F.lit(0)).alias(
            "maximum_triangle_triplets"
        ),
        F.coalesce(F.max(rect_t), F.lit(0)).alias(
            "maximum_rectangle_triplets"
        ),
    )


# Batagelj-Mrvar labeled-triad type table (public literature; the
# reference cites it at clustering/directed/TriadicCensus.java:202):
# index = 6-bit mask (f0f1|f0f2|f1f2 pair groups, 2 bits each,
# 0b10 = lower->higher positional edge, 0b01 = reverse), value = triad
# class 1..16.
_TRIAD_TYPE_TABLE = [
    1, 2, 2, 3, 2, 4, 6, 8,
    2, 6, 5, 7, 3, 8, 7, 11,
    2, 6, 4, 8, 5, 9, 9, 13,
    6, 10, 9, 14, 7, 14, 12, 15,
    2, 5, 6, 7, 6, 9, 10, 14,
    4, 9, 9, 12, 8, 13, 14, 15,
    3, 7, 8, 11, 7, 12, 14, 15,
    8, 14, 13, 15, 11, 15, 15, 16,
]
# triangle classes (all three pairs connected): class -> result label
_TRIANGLE_CLASSES = {9: "030t", 10: "030c", 12: "120d", 13: "120u",
                     14: "120c", 15: "210", 16: "300"}


def _directed_triangle_masks(ded: DataFrame, canon: DataFrame) -> DataFrame:
    """Per-triangle 6-bit direction masks over the deduped directed
    edge set ``ded`` (columns __s, __d) and its canonical undirected
    support ``canon`` (columns __u, __v): returns (a, b, c, __mask)
    with a < b < c by ID and ``__mask = m_ab*16 + m_ac*4 + m_bc``,
    where each 2-bit pair group is 0b10 if the low→high directed edge
    exists and 0b01 if the high→low edge exists — the reference's
    EdgeOrder.FORWARD/REVERSE encoding (flink-gelly/.../library/
    clustering/directed/TriangleListing.java's bitmask, its
    OrderByID flattening). Shared by triangle_listing (which emits
    the rows) and triadic_census_directed (which classifies the
    masks through the Batagelj-Mrvar type table)."""
    dirs = (
        ded.select(
            F.least("__s", "__d").alias("__pu"),
            F.greatest("__s", "__d").alias("__pv"),
            (F.col("__s") < F.col("__d")).alias("__isf"),
        )
        .groupBy("__pu", "__pv")
        .agg(
            (
                F.max(F.col("__isf").cast("int")) * 2
                + F.max((~F.col("__isf")).cast("int"))
            ).alias("__m")
        )
    )
    tri = triangle_enumerate(canon, "__u", "__v")
    return (
        tri.join(
            dirs.select(F.col("__pu").alias("a"), F.col("__pv").alias("b"),
                        F.col("__m").alias("__mab")),
            ["a", "b"],
        )
        .join(
            dirs.select(F.col("__pu").alias("a"), F.col("__pv").alias("c"),
                        F.col("__m").alias("__mac")),
            ["a", "c"],
        )
        .join(
            dirs.select(F.col("__pu").alias("b"), F.col("__pv").alias("c"),
                        F.col("__m").alias("__mbc")),
            ["b", "c"],
        )
        .select(
            "a",
            "b",
            "c",
            (
                F.col("__mab") * 16 + F.col("__mac") * 4 + F.col("__mbc")
            ).alias("__mask"),
        )
    )


def triangle_listing(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """DIRECTED triangle listing — the Gelly library algorithm
    (flink-gelly/.../library/clustering/directed/TriangleListing.java):
    one row per distinct triangle of the undirected support with the
    6-bit bitmask of the six potential directed edges connecting the
    three vertices. Duplicate edges and self-loops are deduped/dropped
    first (the reference requires a simple input; this normalizes).

    Returns (vertex_id_0, vertex_id_1, vertex_id_2, bitmask) with
    vertex_id_0 < vertex_id_1 < vertex_id_2 by ID and
    ``bitmask = m01 << 4 | m02 << 2 | m12``; each 2-bit group is
    0b10 when the low→high edge exists and 0b01 when the high→low
    edge exists (EdgeOrder.FORWARD/REVERSE). Deliberate normalization
    vs the reference: its Result orders the vertices by DEGREE (an
    artifact of the skew-minimizing triplet generation, with
    setPermuteResults to emit all 6 orderings); ID-canonical order is
    deterministic and self-describing, and any permutation is a
    column swap + the reference's own bit rotation.

    Scale shape: triangle_enumerate's degree-oriented listing (the
    only quadratic step bounded per pivot) plus three co-keyed joins
    against the per-pair direction flags — O(#triangles) rows out,
    no step beyond what triadic_census_directed already pays for."""
    ded = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(F.col("__s") != F.col("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    canon = _canonical_undirected(ded, "__s", "__d")
    return _directed_triangle_masks(ded, canon).select(
        F.col("a").alias("vertex_id_0"),
        F.col("b").alias("vertex_id_1"),
        F.col("c").alias("vertex_id_2"),
        F.col("__mask").cast("int").alias("bitmask"),
    )


def triadic_census_directed(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """DIRECTED triadic census — the Gelly analytic
    (flink-gelly/.../library/clustering/directed/TriadicCensus.java):
    the 16 Batagelj-Mrvar triad classes, computed the reference's way —
    per-vertex degree combinatorics give the open-triplet classes
    (021d/u/c from unidirectional out/in splits, 111d/u and 201 from
    the bidirectional overlap), the degree-oriented triangle listing
    plus per-pair direction flags classifies the closed triads
    through the labeled-triad type table, and the single-edge /
    empty classes fall out arithmetically in DECIMAL(38,0) (the
    reference uses BigInteger — C(V,3) overflows BIGINT past ~3.8M
    vertices). One row, the reference's Result order:
    (t003, t012, t102, t021d, t021u, t021c, t111d, t111u, t030t,
    t030c, t201, t120d, t120u, t120c, t210, t300).

    Scale shape: one deduped directed edge relation feeding a degree
    aggregation (O(E)), the triangle listing (its quadratic step
    degree-bounded), three co-keyed pair-flag joins on the triangles,
    and 1-row cross joins for the closed-form arithmetic — no step
    beyond the machinery triangle_enumerate already pays for."""
    dec = "decimal(38,0)"
    ded = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(F.col("__s") != F.col("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outd = ded.groupBy(F.col("__s").alias("id")).agg(
        F.count(F.lit(1)).alias("__out")
    )
    ind = ded.groupBy(F.col("__d").alias("id")).agg(
        F.count(F.lit(1)).alias("__in")
    )
    canon = _canonical_undirected(ded, "__s", "__d")
    deg = (
        canon.select(F.col("__u").alias("id"))
        .unionAll(canon.select(F.col("__v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    per_v = (
        deg.join(outd, "id", "left")
        .join(ind, "id", "left")
        .select(
            (F.col("__deg") - F.coalesce(F.col("__in"), F.lit(0))).alias(
                "__uas"
            ),
            (F.col("__deg") - F.coalesce(F.col("__out"), F.lit(0))).alias(
                "__uat"
            ),
            (
                F.coalesce(F.col("__in"), F.lit(0))
                + F.coalesce(F.col("__out"), F.lit(0))
                - F.col("__deg")
            ).alias("__bid"),
        )
    )
    c2 = lambda c: (F.col(c) * (F.col(c) - 1) / 2).cast("long")  # noqa: E731
    vm = per_v.agg(
        F.count(F.lit(1)).cast(dec).alias("__v"),
        (F.sum(F.col("__uas") + F.col("__uat")) / 2).cast(dec).alias("__uec"),
        (F.sum("__bid") / 2).cast(dec).alias("__bec"),
        F.coalesce(F.sum(c2("__uas")), F.lit(0)).cast(dec).alias("__t021d"),
        F.coalesce(F.sum(c2("__uat")), F.lit(0)).cast(dec).alias("__t021u"),
        F.coalesce(F.sum(F.col("__uas") * F.col("__uat")), F.lit(0))
        .cast(dec).alias("__t021c"),
        F.coalesce(F.sum(F.col("__uat") * F.col("__bid")), F.lit(0))
        .cast(dec).alias("__t111d"),
        F.coalesce(F.sum(F.col("__uas") * F.col("__bid")), F.lit(0))
        .cast(dec).alias("__t111u"),
        F.coalesce(F.sum(c2("__bid")), F.lit(0)).cast(dec).alias("__t201"),
    )
    with_mask = _directed_triangle_masks(ded, canon).select("__mask")
    label_expr = F.lit("?")
    for mask, cls in enumerate(_TRIAD_TYPE_TABLE):
        if cls in _TRIANGLE_CLASSES:
            label_expr = F.when(
                F.col("__mask") == mask, F.lit(_TRIANGLE_CLASSES[cls])
            ).otherwise(label_expr)
    tcounts = with_mask.select(label_expr.alias("__lbl")).agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("__lbl") == lbl, 1)), F.lit(0)
            ).cast(dec).alias(f"__tri{lbl}")
            for lbl in ("030t", "030c", "120d", "120u", "120c", "210", "300")
        ]
    )
    j = vm.crossJoin(F.broadcast(tcounts))
    # open triplets, triangle-deducted (the reference's exact order)
    t201 = F.col("__t201") - 3 * F.col("__tri300") - F.col("__tri210")
    t111d = (
        F.col("__t111d") - F.col("__tri210") - F.col("__tri120c")
        - 2 * F.col("__tri120d")
    )
    t111u = (
        F.col("__t111u") - F.col("__tri210") - F.col("__tri120c")
        - 2 * F.col("__tri120u")
    )
    t021c = (
        F.col("__t021c") - F.col("__tri120c") - 3 * F.col("__tri030c")
        - F.col("__tri030t")
    )
    t021u = F.col("__t021u") - F.col("__tri120u") - F.col("__tri030t")
    t021d = F.col("__t021d") - F.col("__tri120d") - F.col("__tri030t")
    e102 = (
        F.col("__bec") * (F.col("__v") - 2) - t111d - t111u - 2 * t201
        - F.col("__tri120d") - F.col("__tri120u") - F.col("__tri120c")
        - 2 * F.col("__tri210") - 3 * F.col("__tri300")
    )
    e012 = (
        F.col("__uec") * (F.col("__v") - 2)
        - 2 * (t021d + t021u + t021c) - t111d - t111u
        - 3 * F.col("__tri030t") - 3 * F.col("__tri030c")
        - 2 * (F.col("__tri120d") + F.col("__tri120u") + F.col("__tri120c"))
        - F.col("__tri210")
    )
    t003 = (
        (F.col("__v") * (F.col("__v") - 1) * (F.col("__v") - 2) / 6).cast(dec)
        - e012 - e102 - t021d - t021u - t021c - t111d - t111u
        - F.col("__tri030t") - F.col("__tri030c") - t201
        - F.col("__tri120d") - F.col("__tri120u") - F.col("__tri120c")
        - F.col("__tri210") - F.col("__tri300")
    )
    return j.select(
        t003.cast(dec).alias("t003"),
        e012.cast(dec).alias("t012"),
        e102.cast(dec).alias("t102"),
        t021d.cast(dec).alias("t021d"),
        t021u.cast(dec).alias("t021u"),
        t021c.cast(dec).alias("t021c"),
        t111d.cast(dec).alias("t111d"),
        t111u.cast(dec).alias("t111u"),
        F.col("__tri030t").alias("t030t"),
        F.col("__tri030c").alias("t030c"),
        t201.cast(dec).alias("t201"),
        F.col("__tri120d").alias("t120d"),
        F.col("__tri120u").alias("t120u"),
        F.col("__tri120c").alias("t120c"),
        F.col("__tri210").alias("t210"),
        F.col("__tri300").alias("t300"),
    )
