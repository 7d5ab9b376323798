"""Data-layout operators: multi-dimensional (z-order) clustering and
bucketed co-located joins — the scan- and shuffle-elimination half of
the 100 TB design.

A §2.15 beyond-reference extension: the reference's batch sources are
consumed as-written (SURVEY §2.1), but a 100 TB table's LAYOUT decides
how much of it a selective query reads. Two standard techniques:

* **Z-order clustering** (`zorder_key` / `write_zorder_layout` /
  `zorder_range_scan`): interleave the bits of coarse per-dimension
  grid cells into one clustering key and partition the files by it.
  A multi-dimensional range predicate then selects only the z-cells
  whose grid boxes overlap the query box — visible to Spark as
  PARTITION pruning (PartitionFilters in the scan), so non-matching
  files are never opened. The exact predicate still applies on top,
  so results are identical to a full scan. Same layout idea as the
  corpus's persisted IVF index (similarity.py: partitionBy(cell) +
  partition-filter pruning), generalized to relational range queries.

* **Bucketed joins** (`write_bucketed` / `bucketed_join`): persist
  both join sides bucketed (and sorted) on the join key with the same
  bucket count; the sort-merge join then consumes the bucketed scans
  DIRECTLY — no Exchange on either side (plan-pinned by test). At
  100 TB this converts every repeated fact-fact join on the bucket
  key from a full shuffle into a local merge.

All cell math reuses the exact-integer binning arguments from
operators/sketches.py (floor of one IEEE division on exact-integer
operands), so layouts are deterministic and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def grid_cell(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Coarse grid cell of an integral column over [lo, hi): an
    integer in [0, 2^bits) — literally hist_sketch's binning
    (sketches._bin_expr) with bins = 2^bits, so the write-side cell
    assignment, the histogram family, and the driver-side box
    enumeration all share ONE clamp-then-bin formula (a value clamped
    AFTER the multiply could overflow to the wrong edge cell and
    diverge from zorder_cells_for_box's exact Python ints)."""
    from flink_efo_spark.operators.sketches import _bin_expr, _check_domain

    _check_domain(lo, hi, 1 << bits)
    return _bin_expr(col, lo, hi, 1 << bits)


def zorder_key(cells: list[Column], bits: int) -> Column:
    """Interleave the low `bits` bits of each cell column (Morton
    order): dimension i contributes its bit b at output position
    b * ndims + i. Pure Catalyst bit arithmetic — a narrow codegen
    map, no shuffle."""
    nd = len(cells)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cells):
            # (c & 2^b) is 0 or 2^b; multiplying by 2^(b*(nd-1)+i)
            # lands the bit at output position b*nd + i
            z = z.bitwiseOR(
                c.cast("long").bitwiseAND(F.lit(1 << b))
                * F.lit(1 << (b * (nd - 1) + i))
            )
    return z


def _z_interleave_py(cell_ids: tuple[int, ...], bits: int) -> int:
    nd = len(cell_ids)
    z = 0
    for b in range(bits):
        for i, c in enumerate(cell_ids):
            z |= ((c >> b) & 1) << (b * nd + i)
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    specs: list[tuple[str, int, int]],
    bits: int = 3,
) -> None:
    """Cluster `df` by the z-order of the spec'd dimensions
    ((col, lo, hi) each, 2^bits cells per dimension) and write parquet
    partitioned by the z-cell. One shuffle (the partitionBy write),
    then every future multi-dimensional range scan prunes at the
    directory level."""
    cells = [grid_cell(F.col(c), lo, hi, bits) for (c, lo, hi) in specs]
    out = df.withColumn("z_cell", zorder_key(cells, bits))
    # repartition on the cell so each cell writes ONE file instead of
    # one per upstream task — the small-files half of layout hygiene
    out.repartition(F.col("z_cell")).write.mode("overwrite").partitionBy(
        "z_cell"
    ).parquet(path)


def zorder_cells_for_box(
    specs: list[tuple[str, int, int]],
    box: list[tuple[int, int]],
    bits: int = 3,
) -> list[int]:
    """The z-cells whose grid boxes overlap the query box
    [(q_lo, q_hi) per dimension] — the driver-side product of per-dim
    cell ranges, bounded by the grid size (2^(bits*ndims)), never by
    the data."""
    cells = 1 << bits
    ranges = []
    for (_, lo, hi), (q_lo, q_hi) in zip(specs, box):
        width = hi - lo
        # EXACTLY grid_cell's clamp-then-bin formula in Python ints
        # (floor division) — any drift between the write-side cell and
        # this enumeration silently drops rows from a pruned scan
        b_lo = (min(hi, max(lo, q_lo)) - lo) * cells // width
        b_hi = (min(hi, max(lo, q_hi)) - lo) * cells // width
        c_lo = max(0, min(cells - 1, b_lo))
        c_hi = max(0, min(cells - 1, b_hi))
        ranges.append(range(c_lo, c_hi + 1))

    out: list[int] = []

    def rec(i: int, acc: tuple[int, ...]) -> None:
        if i == len(ranges):
            out.append(_z_interleave_py(acc, bits))
            return
        for c in ranges[i]:
            rec(i + 1, acc + (c,))

    rec(0, ())
    return sorted(out)


def zorder_range_scan(
    spark: SparkSession,
    path: str,
    specs: list[tuple[str, int, int]],
    box: list[tuple[int, int]],
    bits: int = 3,
) -> DataFrame:
    """Read a z-ordered layout with a multi-dimensional range
    predicate: partition-prune to the overlapping z-cells, then apply
    the exact predicate — identical rows to a full scan, a fraction
    of the files opened."""
    zs = zorder_cells_for_box(specs, box, bits)
    df = spark.read.parquet(path).where(F.col("z_cell").isin(zs))
    for (c, _, _), (q_lo, q_hi) in zip(specs, box):
        df = df.where((F.col(c) >= q_lo) & (F.col(c) <= q_hi))
    return df.drop("z_cell")


# ---------------------------------------------------------------------------
# Bucketed co-located joins
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int,
) -> None:
    """Persist `df` as an external bucketed+sorted table: rows are
    hash-bucketed on `key` into n_buckets files per write task and
    sorted within each bucket — the one-time shuffle that every
    subsequent join on `key` skips."""
    (
        # pre-partitioning on the key aligns write tasks with bucket
        # ids (same Murmur3 hash), so each bucket lands in ONE file
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
    hint: str | None = None,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key: the
    scans report the bucket partitioning, so a sort-merge join runs
    with NO Exchange on either side (pinned by test_layout.py).
    `hint='merge'` models the 100 TB case where neither side
    broadcasts — at test scale AQE would otherwise broadcast the
    small side and hide the exchange-free property being pinned."""
    lt = spark.table(left_table)
    if hint:
        lt = lt.hint(hint)
    rt = spark.table(right_table).withColumnRenamed(key, f"__r_{key}")
    out = lt.join(rt, lt[key] == rt[f"__r_{key}"], how)
    # right/full outer: unmatched right rows have a NULL left key —
    # coalesce the two key columns before dropping the renamed one so
    # every output row keeps its join key
    return out.withColumn(
        key, F.coalesce(lt[key], rt[f"__r_{key}"])
    ).drop(f"__r_{key}")
