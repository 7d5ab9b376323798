"""Gelly graph generators (flink-gelly/.../graph/generator/*.java) as
pure Catalyst constructions: every generator is ``spark.range``
arithmetic — no joins, no driver-side loops over vertices, no literal
arrays proportional to the graph — so a 2^40-vertex graph is exactly
as declarable as a 10-vertex one and materializes with full scan
parallelism.

Each generator returns ``(vertices, edges)``: vertices ``(id BIGINT)``
and directed edges ``(src BIGINT, dst BIGINT)`` — the Gelly
``Graph.fromDataSet`` pair with NullValue vertex/edge payloads
dropped. Edge multisets replicate the reference flatMaps exactly
(including the documented duplicate edges a wrap-around dimension of
size 2 emits).

Reference map:

* circulant_graph    — CirculantGraph.java (LinkVertexToOffsets)
* complete_graph     — CompleteGraph.java  (circulant range (1, n-1))
* echo_graph         — EchoGraph.java      (circulant, one centered range)
* grid_graph         — GridGraph.java      (per-dimension +/- increment)
* cycle_graph        — CycleGraph.java     (grid, one wrapped dimension)
* path_graph         — PathGraph.java      (grid, one unwrapped dimension)
* hypercube_graph    — HypercubeGraph.java (grid, d dimensions of 2)
* star_graph         — StarGraph.java      (center 0 <-> each leaf)
* singleton_edge_graph — SingletonEdgeGraph.java (isolated 2-paths)
* empty_graph        — EmptyGraph.java     (vertices only)
* rmat_graph         — RMatGraph.java      (recursive-matrix power law)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def vertex_sequence(spark: SparkSession, n: int) -> DataFrame:
    """GraphGeneratorUtils.vertexSequence: vertices 0..n-1."""
    return spark.range(int(n)).select(F.col("id"))


def circulant_graph(
    spark: SparkSession, n: int, ranges: list[tuple[int, int]]
) -> tuple[DataFrame, DataFrame]:
    """Oriented graph where vertex i links to (i + j) % n for every
    offset j in every (offset, length) range — CirculantGraph.java,
    with its preconditions (offset >= 1, length <= n - offset,
    non-overlapping ranges).

    Scale shape: one ``spark.range(n * k)`` (k = total offsets) with
    the ordinal-to-offset map as a CASE chain over the FEW configured
    ranges — per-row arithmetic, no join, no k-sized literals."""
    if n < 2:
        raise ValueError("Vertex count must be at least 2")
    srt = sorted((int(o), int(ln)) for o, ln in ranges)
    if not srt:
        raise ValueError("at least one offset range is required")
    cum = 0
    prev_end = None
    cases: list[tuple[int, int]] = []  # (cumulative start ordinal, offset)
    for off, ln in srt:
        if off < 1:
            raise ValueError("Range offset must be at least 1")
        if ln > n - off:
            raise ValueError(
                "Range length must not be greater than the vertex count "
                "minus the range offset."
            )
        if prev_end is not None and off < prev_end:
            raise ValueError(f"Overlapping ranges at offset {off}")
        prev_end = off + ln
        cases.append((cum, off))
        cum += ln
    k = cum
    ordinal = F.col("id") % k
    # ordinal o in [start_i, start_i + len_i) -> offset_i + (o - start_i);
    # build ascending so the HIGHEST start is the outermost when()
    expr = None
    for start, off in cases:
        branch = ordinal - F.lit(start) + F.lit(off)
        expr = branch if expr is None else F.when(
            ordinal >= F.lit(start), branch
        ).otherwise(expr)
    src = (F.col("id") / k).cast("long")
    edges = spark.range(int(n) * k).select(
        src.alias("src"),
        ((src + expr) % F.lit(int(n))).cast("long").alias("dst"),
    )
    return vertex_sequence(spark, n), edges


def complete_graph(
    spark: SparkSession, n: int
) -> tuple[DataFrame, DataFrame]:
    """Every distinct ordered pair — CompleteGraph.java delegates to
    the circulant range (1, n-1)."""
    return circulant_graph(spark, n, [(1, n - 1)])


def echo_graph(
    spark: SparkSession, n: int, degree: int
) -> tuple[DataFrame, DataFrame]:
    """Every vertex linked to the ``degree`` vertices 'farthest' from
    it — EchoGraph.java's single circulant range centered at n/2,
    with its parity precondition (exactly one of n, degree even)."""
    if degree < 1:
        raise ValueError("Vertex degree must be at least 1")
    if degree >= n:
        raise ValueError("Vertex degree must be less than the vertex count.")
    if not ((n % 2 == 0) ^ (degree % 2 == 0)):
        raise ValueError(
            "Vertex count or vertex degree must be an even number "
            "but not both."
        )
    return circulant_graph(spark, n, [((n - degree + 1) // 2, degree)])


def grid_graph(
    spark: SparkSession, dims: list[tuple[int, bool]]
) -> tuple[DataFrame, DataFrame]:
    """Lattice over the given ``(size, wrap_endpoints)`` dimensions —
    GridGraph.java's flatMap: within each dimension a vertex links to
    its +/- increment neighbors, and a wrapped dimension links its two
    endpoints (for size 2 that duplicates the +/-1 edges — the
    reference's documented multigraph behavior, replicated).

    Scale shape: at most 2 filtered selects per (dimension, direction)
    over one ``spark.range(prod sizes)`` union — dimensions are few,
    rows never collected."""
    if not dims:
        raise ValueError("at least one dimension is required")
    total = 1
    for size, _ in dims:
        if size < 2:
            raise ValueError("Dimension size must be at least 2")
        total *= int(size)
    vid = F.col("id")
    parts: list[DataFrame] = []
    base = spark.range(total)
    increment = total
    for size, wrap in dims:
        size = int(size)
        increment //= size
        index = (vid / increment).cast("long") % size
        minus = base.where(index > 0).select(
            vid.alias("src"), (vid - increment).alias("dst")
        )
        minus_wrap = base.where((index == 0) & F.lit(bool(wrap))).select(
            vid.alias("src"), (vid + increment * (size - 1)).alias("dst")
        )
        plus = base.where(index < size - 1).select(
            vid.alias("src"), (vid + increment).alias("dst")
        )
        plus_wrap = base.where(
            (index == size - 1) & F.lit(bool(wrap))
        ).select(
            vid.alias("src"), (vid - increment * (size - 1)).alias("dst")
        )
        parts += [minus, minus_wrap, plus, plus_wrap]
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionAll(p)
    return vertex_sequence(spark, total), edges


def cycle_graph(spark: SparkSession, n: int) -> tuple[DataFrame, DataFrame]:
    """CycleGraph.java: one wrapped grid dimension."""
    if n < 2:
        raise ValueError("Vertex count must be at least 2")
    return grid_graph(spark, [(n, True)])


def path_graph(spark: SparkSession, n: int) -> tuple[DataFrame, DataFrame]:
    """PathGraph.java: one unwrapped grid dimension."""
    if n < 2:
        raise ValueError("Vertex count must be at least 2")
    return grid_graph(spark, [(n, False)])


def hypercube_graph(
    spark: SparkSession, dimensions: int
) -> tuple[DataFrame, DataFrame]:
    """HypercubeGraph.java: d grid dimensions of size 2."""
    if dimensions < 1:
        raise ValueError("Dimensions must be at least 1")
    return grid_graph(spark, [(2, False)] * dimensions)


def star_graph(spark: SparkSession, n: int) -> tuple[DataFrame, DataFrame]:
    """StarGraph.java: center vertex 0 linked to and from every leaf."""
    if n < 2:
        raise ValueError("Vertex count must be at least 2")
    leaves = spark.range(1, int(n))
    edges = leaves.select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    ).unionAll(
        leaves.select(
            F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
        )
    )
    return vertex_sequence(spark, n), edges


def singleton_edge_graph(
    spark: SparkSession, vertex_pair_count: int
) -> tuple[DataFrame, DataFrame]:
    """SingletonEdgeGraph.java: isolated two-paths — vertex 2i links
    to 2i+1 and back."""
    if vertex_pair_count < 1:
        raise ValueError("Vertex pair count must be at least 1")
    n = 2 * int(vertex_pair_count)
    vid = F.col("id")
    edges = spark.range(n).select(
        vid.alias("src"),
        F.when(vid % 2 == 0, vid + 1).otherwise(vid - 1).alias("dst"),
    )
    return vertex_sequence(spark, n), edges


def empty_graph(spark: SparkSession, n: int) -> tuple[DataFrame, DataFrame]:
    """EmptyGraph.java: vertices, no edges."""
    return (
        vertex_sequence(spark, n),
        spark.createDataFrame([], "src BIGINT, dst BIGINT"),
    )


def rmat_graph(
    spark: SparkSession,
    vertex_count: int,
    edge_count: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Directed power-law multigraph via the stochastic Recursive
    Matrix model — RMatGraph.java (defaults A=0.57, B=C=0.19, the
    Graph500 constants; A=B=C=0.25 emulates Erdős-Rényi). The vertex
    id space is 2^ceil(log2(vertex_count)), the reference's own
    rounding.

    Spark-first determinism: the reference draws from a seeded
    Mersenne twister per edge block; here each (edge, level) decision
    is a uniform draw derived from ``xxhash64(seed, edge_id, level)``
    — same model and distribution, reproducible across runs and
    partitionings from the seed alone (the reference's exact bit
    stream is an implementation artifact of its JDK RNG, not a
    semantic). Noise mode is not implemented (off by default in the
    reference too).

    Scale shape: one ``spark.range(edge_count)`` with ``scale``
    levels of hash + threshold arithmetic folded into the projection
    — wholly codegen'd, no join, no state."""
    if vertex_count < 1:
        raise ValueError("Vertex count must be at least 1")
    if edge_count < 1:
        raise ValueError("Edge count must be at least 1")
    if not (a >= 0 and b >= 0 and c >= 0 and a + b + c <= 1.0):
        raise ValueError(
            "RMat parameters A, B, and C must be non-negative and sum "
            "to less than or equal to one"
        )
    scale = max(1, int(vertex_count - 1).bit_length())
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        h = F.xxhash64(F.lit(int(seed)), F.col("id"), F.lit(lvl))
        # uniform [0, 1) from the low 53 bits (exact in a double)
        u = F.pmod(h, F.lit(2**53)).cast("double") / F.lit(float(2**53))
        sbit = (u >= F.lit(float(a + b))).cast("long")
        dbit = (
            (u >= F.lit(float(a))) & (u < F.lit(float(a + b)))
            | (u >= F.lit(float(a + b + c)))
        ).cast("long")
        src = src * 2 + sbit
        dst = dst * 2 + dbit
    edges = spark.range(int(edge_count)).select(
        src.alias("src"), dst.alias("dst")
    )
    return vertex_sequence(spark, 2**scale), edges
