"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
queries over unbounded key domains.

A §2.15 beyond-reference extension in the same family as the corpus's
HLL distinct rollups (queries.py q_hll_distinct_rollup): where HLL
answers "how many distinct", count-min answers "how often does THIS
key occur" in O(depth x width) memory with a one-sided error —
estimates never undercount, and overcount by at most eps*N with
probability 1-delta (Cormode & Muthukrishnan 2005; width = ceil(e/eps),
depth = ceil(ln 1/delta)).

Scale shape: the sketch build is ONE pass — depth (j, w) cells per
row, aggregated with map-side combine, so the shuffle carries at most
depth x width x partitions combiner rows regardless of input size; the
finished sketch is depth x width rows (KBs) and broadcasts into any
lookup join. Merging shards/windows is cell-wise addition (the sketch
is a linear transform of the input), so per-partition or per-window
sketches roll up without touching raw data again.

Determinism: the row hash is the corpus's portable md5 idiom
(first 15 hex chars -> BIGINT — identical in Spark and DuckDB), and
the depth hash functions are fixed affine maps modulo a 31-bit prime
in exact BIGINT arithmetic — so the whole sketch is bit-identical
across engines, partitionings, and row orders, and a DuckDB oracle
can rebuild it cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit prime: h % P < 2^31, A[j] < 2^5 => A[j]*h' + B[j] < 2^37,
# exact in BIGINT on both engines (no overflow, no float)
P = 1_000_000_007
A = (3, 7, 11, 13, 17, 19, 23, 29)
B = (1, 5, 9, 15, 21, 27, 33, 39)


def _h64(col: Column) -> Column:
    """Portable string->int hash (dedup.py's md5 idiom)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % P


def _cell(h: Column, j: int, width: int) -> Column:
    return ((F.lit(A[j]) * h + F.lit(B[j])) % P) % width


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: returns (j, w, cnt) — depth x width cells
    (absent cells are zero). One pass, map-side combine, bounded
    shuffle."""
    assert 1 <= depth <= len(A)
    h = _h64(F.col(key_col))
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("j"),
                    _cell(h, j, width).alias("w"),
                )
                for j in range(depth)
            ]
        )
    ).alias("c")
    return (
        df.select(cells)
        .select("c.j", "c.w")
        .groupBy("j", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for a key relation: est = min_j sketch[j][h_j]
    — the classic count-min read. The sketch side is depth x width
    rows, so it broadcasts; missing cells count as zero via the
    left join + coalesce."""
    h = _h64(F.col(key_col))
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        _cell(h, j, width).alias("w"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.j", "c.w")
    return (
        probes.join(F.broadcast(sketch), ["j", "w"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
