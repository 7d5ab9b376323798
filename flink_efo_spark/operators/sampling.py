"""Deterministic corpus-mixing samplers.

A 100 TB training-data pipeline fixes its source mixture by POLICY
(e.g. 50% en, 25% de, ...) and must draw it reproducibly: the same
document set on every run, retry, engine, and partitioning. These
samplers hash a stable id into [0, 65536) (first 4 hex chars of md5 —
the same portable-hash convention as the dedup family) and keep a row
iff its hash falls under the group's rate — a narrow, shuffle-free
map whose predicate fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mixture_sample", "token_budget_sample"]


def _hash16(id_col: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int")


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group deterministic Bernoulli sample: keep a row iff
    ``hash16(id) < floor(rate[group] * 65536)``. Groups absent from
    ``rates`` use ``default_rate``. Rates are exact multiples of
    1/65536 after flooring, so the draw replays identically in any
    engine (the oracle replicates it verbatim). Zero shuffle; at
    scale the CASE predicate pushes into the scan stage."""
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {g!r} out of [0,1]: {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate out of [0,1]: {default_rate}")
    cut = F.lit(int(default_rate * 65536))
    for g, r in rates.items():
        cut = F.when(F.col(group_col) == g, int(r * 65536)).otherwise(cut)
    return df.where(_hash16(id_col) < cut)


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    budgets: dict[str, int],
    n_buckets: int = 256,
) -> DataFrame:
    """Budgeted mixture: per group, draw documents in the stable hash
    order until the group's TOKEN budget is reached (training mixes
    are specified in tokens, not document counts). A document that
    crosses the boundary is included — every group reaches at least
    its budget when it has the tokens. Groups without a budget are
    dropped. The hash order makes the draw reproducible and
    engine-replayable.

    Scale design (100 TB): training mixes have ~5-20 groups, so a
    cumulative sum over ``Window.partitionBy(group)`` would sort an
    ENTIRE group in one task — terabytes per task. Instead the
    per-group prefix sum is computed hierarchically, the same
    decomposition as :func:`flink_efo_spark.operators.packing.
    pack_shards`:

    1. bucket = leading hex byte(s) of the md5 order key, so buckets
       split each group's hash order into contiguous ranges;
    2. within-(group, bucket) cumulative sums — a window whose
       partition count is ``n_groups * n_buckets`` tasks, each over
       ~1/n_buckets of a group;
    3. per-(group, bucket) totals → bucket offsets via a window
       partitioned BY GROUP over ≤ ``n_buckets`` tiny rows per group;
    4. broadcast-join offsets back; group-cumsum = offset + local.

    The order key (md5, id) is unchanged, so the admitted set is
    IDENTICAL to the naive single-window formulation — only the
    prefix-sum computation splits.
    """
    if not budgets:
        raise ValueError("budgets must name at least one group")
    for g, b in budgets.items():
        if int(b) < 0:
            raise ValueError(f"budget for {g!r} must be >= 0: {b}")
    hex_chars = {16: 1, 256: 2, 4096: 3, 65536: 4}.get(n_buckets)
    if hex_chars is None:
        raise ValueError("n_buckets must be one of 16, 256, 4096, 65536")

    budget = F.lit(None).cast("long")
    for g, b in budgets.items():
        budget = F.when(F.col(group_col) == g, int(b)).otherwise(budget)

    # NULL ids get the empty order key: they sort FIRST (deterministic)
    # and share bucket '' — a NULL md5 would otherwise fall out of the
    # equi-join on (group, bucket) and be silently dropped
    keyed = (
        df.withColumn("__budget", budget)
        .where(F.col("__budget").isNotNull())
        .withColumn(
            "__okey",
            F.coalesce(F.md5(F.col(id_col).cast("string")), F.lit("")),
        )
        .withColumn("__bucket", F.substring("__okey", 1, hex_chars))
    )

    w_in = (
        Window.partitionBy(group_col, "__bucket")
        .orderBy("__okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = keyed.withColumn(
        "__cum_in", F.sum(F.col(token_col).cast("long")).over(w_in)
    )

    totals = keyed.groupBy(group_col, "__bucket").agg(
        F.sum(F.col(token_col).cast("long")).alias("__tot")
    )
    # per-group window over <= n_buckets tiny total rows — bounded by
    # construction, never the data itself
    w_b = (
        Window.partitionBy(group_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        group_col,
        "__bucket",
        F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__offset"),
    )

    return (
        local.join(F.broadcast(offsets), [group_col, "__bucket"])
        .withColumn("__cum", F.col("__offset") + F.col("__cum_in"))
        .where(F.col("__cum") - F.col(token_col) < F.col("__budget"))
        .select(*df.columns)
    )
