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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mixture_sample"]


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
) -> DataFrame:
    """Budgeted mixture: per group, draw documents in the stable hash
    order until the group's TOKEN budget is reached (training mixes
    are specified in tokens, not document counts). A document that
    crosses the boundary is included — every group reaches at least
    its budget when it has the tokens. Groups without a budget are
    dropped. One shuffle per the group window (cumulative sum), then
    a filter; the hash order makes the draw reproducible and
    engine-replayable."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(None).cast("long")
    for g, b in budgets.items():
        budget = F.when(F.col(group_col) == g, int(b)).otherwise(budget)
    return (
        df.withColumn("__cum", F.sum(F.col(token_col)).over(w))
        .withColumn("__budget", budget)
        .where(
            F.col("__budget").isNotNull()
            & (F.col("__cum") - F.col(token_col) < F.col("__budget"))
        )
        .drop("__cum", "__budget")
    )
