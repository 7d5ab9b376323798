"""Constraint-audit operators (operators/quality.py): each check must
count injected violations exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_efo_spark.operators.quality import (
    constraint_audit,
    foreign_key_violations,
    not_null_violations,
    range_violations,
    unique_key_violations,
)


def test_audit_counts_injected_violations(spark):
    rows = [
        (1, "a", 5.0),
        (1, "a", 6.0),   # duplicate key (1, 'a') -> 2 violating rows
        (2, None, 50.0),  # null name; value out of range
        (3, "c", None),   # null value ignored by range check
        (9, "d", 7.0),    # orphan key vs parent
    ]
    df = spark.createDataFrame(rows, "id long, name string, v double")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "id long")

    nn = {r.constraint_name: r for r in not_null_violations(df, ["name", "v"]).collect()}
    assert nn["not_null:name"].violations == 1 and not nn["not_null:name"].ok
    assert nn["not_null:v"].violations == 1

    uq = unique_key_violations(df, ["id", "name"]).collect()[0]
    assert uq.violations == 2 and not uq.ok

    rg = range_violations(df, "v", 0, 10).collect()[0]
    assert rg.violations == 1 and rg.total == 5

    fk = foreign_key_violations(df, "id", parent, "id").collect()[0]
    assert fk.violations == 1 and not fk.ok

    audit = constraint_audit(
        df,
        not_null=["name"],
        unique=[["id", "name"]],
        ranges={"v": (0, 10)},
        foreign_keys=[("id", parent, "id")],
    ).collect()
    assert len(audit) == 4
    assert {r.constraint_name for r in audit} == {
        "not_null:name", "unique:id,name", "range:v", "fk:id",
    }


def test_audit_clean_table_all_ok(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    audit = constraint_audit(
        df, not_null=["id", "name"], unique=[["id"]]
    ).collect()
    assert all(r.ok and r.violations == 0 for r in audit)
