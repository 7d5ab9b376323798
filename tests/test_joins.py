"""Operator unit tests: as-of join and interval join edge cases.

Mirrors the reference's TemporalJoinITCase / JoinITCase row-set style
(SURVEY §5), with the equal-timestamp inclusive-<= case the reference's
TemporalRowTimeJoinOperator guarantees (round 1 regression).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_efo_spark.operators.joins import asof_join, interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_equal_ts_inclusive(spark):
    """A build row AT the probe timestamp must match (<= semantics)."""
    probe = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(5)), (2, _ts(10))], "k int, ts timestamp"
    )
    build = spark.createDataFrame(
        [(1, _ts(10), "at10"), (1, _ts(4), "at4"), (2, _ts(11), "at11")],
        "k int, ts timestamp, v string",
    )
    out = asof_join(probe, build, "k", "ts", "ts", build_cols=["v"])
    got = {(r.k, r.ts.minute): r.v for r in out.collect()}
    assert got[(1, 10)] == "at10"  # equal-ts match taken
    assert got[(1, 5)] == "at4"  # latest earlier row
    assert got[(2, 10)] is None  # build only in the future → NULL


def test_asof_whole_row_backfill(spark):
    """A NULL in one column of the LATEST build row must surface as
    NULL — never be backfilled from an older build row (the reference
    emits whole rows: TemporalRowTimeJoinOperator, never column-wise
    mixtures). Round-2 ADVICE regression."""
    probe = spark.createDataFrame([(1, _ts(10))], "k int, ts timestamp")
    build = spark.createDataFrame(
        [(1, _ts(1), "old_v", "old_w"), (1, _ts(5), None, "new_w")],
        "k int, ts timestamp, v string, w string",
    )
    out = asof_join(probe, build, "k", "ts", "ts", build_cols=["v", "w"])
    [row] = out.collect()
    # latest build row is (_ts(5), NULL, "new_w"): v must be NULL,
    # NOT "old_v" leaked from the _ts(1) row
    assert row.v is None
    assert row.w == "new_w"


def test_asof_tiebreak_highest_wins(spark):
    """Equal build timestamps: the highest tiebreak value wins, and a
    probe at the same instant still sees the build rows."""
    probe = spark.createDataFrame([(1, _ts(10))], "k int, ts timestamp")
    build = spark.createDataFrame(
        [(1, _ts(10), 1, "first"), (1, _ts(10), 2, "second")],
        "k int, ts timestamp, seq int, v string",
    )
    out = asof_join(
        probe, build, "k", "ts", "ts", build_cols=["v"], tiebreak="seq"
    )
    [row] = out.collect()
    assert row.v == "second"


def test_asof_tiebreak_not_in_build_cols(spark):
    """tiebreak column outside build_cols must not crash (round-2 fix)."""
    probe = spark.createDataFrame([(1, _ts(10))], "k int, ts timestamp")
    build = spark.createDataFrame(
        [(1, _ts(9), 7, "x")], "k int, ts timestamp, seq int, v string"
    )
    out = asof_join(
        probe, build, "k", "ts", "ts", build_cols=["v"], tiebreak="seq"
    )
    [row] = out.collect()
    assert row.v == "x"
    assert "seq" not in out.columns


def test_interval_join_bounds(spark):
    left = spark.createDataFrame([(1, _ts(0), "l0")], "k int, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, _ts(0), "r0"), (1, _ts(5), "r5"), (1, _ts(6), "r6"), (2, _ts(1), "rx")],
        "k int, ts timestamp, rv string",
    )
    out = interval_join(
        left, right, "k", "ts", "ts",
        "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES",
    )
    got = sorted(r["rv"] for r in out.select(F.col("r.rv")).collect())
    assert got == ["r0", "r5"]  # inclusive bounds, r6 outside, rx key-mismatch


def test_lookup_cache_cuts_external_calls(spark):
    """JdbcLookupOptions cache semantics: within TTL, repeated keys
    never reach the store; results stay identical to uncached; LRU
    bounds the entry count."""
    import pandas as pd

    from flink_efo_spark.operators.lookup import (
        _LookupCache,
        lookup_join_batched,
    )

    fetched_keys = spark.sparkContext.accumulator(0)

    def store(keys):
        fetched_keys.add(len(keys))
        return {k: {"name": f"n{k}"} for k in keys if k % 2 == 0}

    # single partition so one task's cache sees every batch
    probe = spark.createDataFrame(
        [(i % 5,) for i in range(100)], "k long"
    ).repartition(1)
    out = lookup_join_batched(
        probe, store, "k", [("name", "string")],
        cache_max_rows=10, cache_ttl_s=60,
    ).collect()
    assert len(out) == 100
    for r in out:
        assert (r.name == f"n{r.k}") if r.k % 2 == 0 else (r.name is None)
    assert fetched_keys.value == 5  # 5 distinct keys, each fetched once

    # LRU eviction + TTL expiry unit behavior
    c = _LookupCache(max_rows=2, ttl_s=None)
    c.put({1: "a", 2: "b"}, [1, 2])
    c.put({3: "c"}, [3])          # evicts key 1
    cached, need = c.split([1, 2, 3])
    assert set(need) == {1} and set(cached) == {2, 3}

    import time as _time

    c2 = _LookupCache(max_rows=10, ttl_s=0.01)
    c2.put({7: "x"}, [7])
    _time.sleep(0.05)
    cached2, need2 = c2.split([7])
    assert need2 == [7] and cached2 == {}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both join sides on the key (the 100 TB co-located
    join layout; the reference's static hash redistribution planned
    once at write time) removes BOTH Exchanges from the join — the
    physical plan must contain no shuffle."""
    from flink_efo_spark.catalog import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS __bkt_orders")
    spark.sql("DROP TABLE IF EXISTS __bkt_lineitem")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("__bkt_orders"))
        (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable("__bkt_lineitem"))
        joined = (
            spark.table("__bkt_lineitem")
            .join(
                spark.table("__bkt_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .count()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part
        # results still correct
        want = {
            (r.o_orderpriority, r["count"])
            for r in lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            ).groupBy("o_orderpriority").count().collect()
        }
        got = {(r.o_orderpriority, r["count"]) for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS __bkt_orders")
        spark.sql("DROP TABLE IF EXISTS __bkt_lineitem")


def test_dim_snapshot_client_bound_and_lookup(spark):
    """The fixture seam: snapshots a small dim into a thread-safe
    lookup_fn; refuses dims over max_rows instead of silently
    shipping a huge dict."""
    import pytest
    from pyspark.sql import functions as F

    from flink_efo_spark.operators.lookup import dim_snapshot_client

    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    fn = dim_snapshot_client(dim, "k", ["v"], max_rows=100)
    assert fn([3, 7, 999]) == {3: {"v": 6}, 7: {"v": 14}}
    with pytest.raises(ValueError, match="snapshot fixture bound"):
        dim_snapshot_client(dim, "k", ["v"], max_rows=99)
