"""Skew mitigation: salted joins and salted distinct aggregation.

Reference context: the reference's runtime re-balances skew only by
static parallelism choice (its hash partitioner,
R/partitioner/BinaryHashPartitioner, has no hot-key splitting); on
Spark, AQE's skew-join splitting (session default
``spark.sql.adaptive.skewJoin.enabled=true``) handles most cases at
runtime. These operators are the EXPLICIT tools for the cases AQE
cannot fix:

* ``salted_join`` — AQE splits skewed *partitions of the probe side*,
  but when one join key holds a significant share of ALL rows the
  matching build rows still sit in one task's hash table and every
  probe row of that key routes to it. Salting replicates the build
  row k ways and fans the probe rows over the k copies — the hot key
  becomes k tasks.
* ``salted_count_distinct`` — a distinct aggregate shuffles every
  (key, value) pair to the key's single reducer; a hot key's reducer
  receives its entire value set. Salting by a hash of the VALUE keeps
  the per-reducer value sets disjoint, so partial distinct counts sum
  exactly.

Both are algebraic identities — results equal the unsalted plan
row-for-row (pytest-asserted) — so they are safe to apply blindly to
a known-hot pipeline stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the build side replicated ``salt`` ways and probe
    rows fanned across the copies.

    Use when ONE key dominates the probe side (power-law keys): the
    hot key's probe rows spread over ``salt`` tasks instead of one.
    Build-side cost is a deliberate ×``salt`` replication — right
    when the build side is small-ish but above the broadcast
    threshold (broadcast would be the first choice below it).

    The probe salt is per-row arbitrary (any value gives a correct
    join — every (key, salt) pair exists on the build side), so a
    cheap nondeterministic spread is fine and adds no shuffle of its
    own.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            "salted_join supports inner/left joins (right/full would "
            "duplicate unmatched build rows across salts)"
        )
    p = probe.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    )
    b = build.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    )
    out = p.join(b, on + ["__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt: int = 64,
) -> DataFrame:
    """Exact ``count(DISTINCT value)`` per key with the value space
    salted ``salt`` ways: phase 1 computes per-(key, value-hash-salt)
    partial distinct counts — each reducer sees a DISJOINT slice of
    the hot key's value set — phase 2 sums the partials. Disjointness
    makes the sum exact (this is an identity, not a sketch; use
    hll_sketch_agg when approximate is acceptable and merge costs
    matter more).

    Output: keys + ``n_distinct``.
    """
    ph1 = (
        df.select(*keys, F.col(value_col))
        .withColumn(
            "__vsalt",
            F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt)).cast("int"),
        )
        .groupBy(*keys, "__vsalt")
        .agg(F.count_distinct(F.col(value_col)).alias("__pc"))
    )
    return ph1.groupBy(*keys).agg(F.sum("__pc").alias("n_distinct"))


def key_skew_profile(
    df: DataFrame, keys: list[str], top: int = 20
) -> DataFrame:
    """Diagnostic: per-key row counts for the ``top`` heaviest keys
    plus each key's share of the total — the number you read before
    choosing broadcast / AQE / salting. One aggregation, no collect.
    """
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )
