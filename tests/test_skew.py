"""Skew mitigation operators (operators/skew.py): salted join and
salted distinct aggregation must be algebraic identities with the
unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_efo_spark.catalog import load_table
from flink_efo_spark.operators.skew import (
    key_skew_profile,
    salted_count_distinct,
    salted_join,
)
from tests.conftest import SF_DIR


def test_salted_join_equals_plain(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = sorted(
        (r.event_id, r.c_mktsegment)
        for r in ev.join(cust, "user_id", "inner").collect()
    )
    salted = sorted(
        (r.event_id, r.c_mktsegment)
        for r in salted_join(ev, cust, ["user_id"], salt=8).collect()
    )
    assert salted == plain

    plain_l = sorted(
        (r.event_id, r.c_mktsegment)
        for r in ev.join(cust, "user_id", "left").collect()
    )
    salted_l = sorted(
        (r.event_id, r.c_mktsegment)
        for r in salted_join(ev, cust, ["user_id"], salt=8, how="left").collect()
    )
    assert salted_l == plain_l


def test_salted_count_distinct_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = {
        (r.event_type): r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        (r.event_type): r.n_distinct
        for r in salted_count_distinct(ev, ["event_type"], "user_id", salt=16).collect()
    }
    assert salted == plain


def test_key_skew_profile(spark):
    ev = load_table(spark, SF_DIR, "events")
    prof = key_skew_profile(ev, ["event_type"], top=3).collect()
    assert len(prof) == 3
    assert prof[0].n_rows >= prof[1].n_rows >= prof[2].n_rows
    assert all(0 < r.share <= 1 for r in prof)
