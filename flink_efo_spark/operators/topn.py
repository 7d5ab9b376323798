"""Top-N per key (reference: StreamExecRank.scala:52,
AbstractTopNFunction.java:51, AppendOnlyTopNFunction.java:48 in
/root/reference — the `ROW_NUMBER() OVER (...) <= N` pattern that
FlinkLogicalRankRule detects).

Batch: expressed as row_number + filter. Spark ≥3.5 rewrites this to
``WindowGroupLimit`` — a partial per-partition top-N before the
shuffle plus a final top-N after — i.e. the same two-phase pruning the
reference's rank operator does, applied automatically. At 100 TB this
means each map task ships at most N rows per key instead of all rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n: int,
    rank_col: str = "rn",
    keep_rank: bool = True,
    method: str = "row_number",
) -> DataFrame:
    """Keep the top ``n`` rows per key.

    method: "row_number" (exactly n), "rank" or "dense_rank"
    (ties included) — mirroring the reference's RankType.
    """
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        method
    ]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, fn().over(w)).where(F.col(rank_col) <= n)
    return out if keep_rank else out.drop(rank_col)
