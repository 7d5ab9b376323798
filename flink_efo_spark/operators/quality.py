"""Data-quality constraint auditing — the validation pass a training
pipeline runs before (and after) every expensive stage.

Reference context: the reference validates NOT NULL / type constraints
at sink time per column (its table schema enforcement,
flink-table-common TableSchema / NOT NULL enforcement in
SinkCodeGenerator); batch pipelines additionally need corpus-level
audits (uniqueness, referential integrity, ranges) that no per-row
check can express. Everything here is plain aggregations —
shuffle-on-key or scan-only — so a 100 TB audit costs one pass.

API shape: each check is declarative ``(name, kind, params)``;
``constraint_audit`` runs all of them in as few jobs as the kinds
allow and returns one row per check: ``(constraint_name,
violations, total, ok)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column null counts in ONE scan (conditional aggregates —
    no per-column jobs)."""
    total = F.count("*").alias("total")
    aggs = [
        F.count_if(F.col(c).isNull()).alias(c) for c in cols
    ]
    row = df.agg(total, *aggs)
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    return row.selectExpr(
        f"stack({len(cols)}, {stack}) as (col, violations)", "total"
    ).select(
        F.concat(F.lit("not_null:"), F.col("col")).alias("constraint_name"),
        F.col("violations").cast("bigint").alias("violations"),
        F.col("total").cast("bigint").alias("total"),
        (F.col("violations") == 0).alias("ok"),
    )


def unique_key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows participating in a duplicated key (0 when the key is
    unique). One shuffle on the key."""
    dup_rows = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") > 1)
        .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("violations"))
    )
    total = df.count()
    name = "unique:" + ",".join(keys)
    return dup_rows.select(
        F.lit(name).alias("constraint_name"),
        F.col("violations").cast("bigint").alias("violations"),
        F.lit(total).cast("bigint").alias("total"),
        (F.col("violations") == 0).alias("ok"),
    )


def foreign_key_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose non-null key has no parent (orphans) — a
    left-anti join; Catalyst broadcasts the parent when small."""
    orphans = (
        child.where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .count()
    )
    total = child.count()
    name = f"fk:{child_key}"
    import pyspark.sql.types as T  # noqa: F401

    spark = child.sparkSession
    return spark.createDataFrame(
        [(name, orphans, total, orphans == 0)],
        "constraint_name string, violations bigint, total bigint, ok boolean",
    )


def range_violations(
    df: DataFrame, col: str, lo=None, hi=None
) -> DataFrame:
    """Non-null values outside [lo, hi] (either bound optional)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    row = df.agg(
        F.count("*").alias("total"),
        F.count_if(F.col(col).isNotNull() & cond).alias("violations"),
    )
    return row.select(
        F.lit(f"range:{col}").alias("constraint_name"),
        F.col("violations").cast("bigint").alias("violations"),
        F.col("total").cast("bigint").alias("total"),
        (F.col("violations") == 0).alias("ok"),
    )


def constraint_audit(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict[str, tuple] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Run a declared constraint set and union the audit rows.

    ``foreign_keys``: list of (child_key, parent_df, parent_key).
    """
    parts: list[DataFrame] = []
    if not_null:
        parts.append(not_null_violations(df, not_null))
    for keys in unique or []:
        parts.append(unique_key_violations(df, keys))
    for col, (lo, hi) in (ranges or {}).items():
        parts.append(range_violations(df, col, lo, hi))
    for child_key, parent, parent_key in foreign_keys or []:
        parts.append(foreign_key_violations(df, child_key, parent, parent_key))
    if not parts:
        raise ValueError("no constraints declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
