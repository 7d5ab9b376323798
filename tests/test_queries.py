"""End-to-end: every queries() entry matches its DuckDB oracle at
sf0.001 — the same check the driver runs at sf0.01 (CORRECTNESS gate).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_dtype_parity, duck_rows, rows_of

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_vs_oracle(name, spark, ddb):
    df = _QUERIES[name](spark, SF_DIR)
    scols = sorted(df.columns)
    srows = rows_of(df.select(*scols))
    if name not in _ORACLES:
        assert len(srows) >= 0  # rows-only check: the plan executes
        return
    res = ddb.execute(_ORACLES[name])
    dcols = sorted(d[0] for d in res.description)
    assert scols == dcols, f"column mismatch: {scols} vs {dcols}"
    # driver-hash dtype gate: equal values in different pandas dtypes
    # (DuckDB HUGEINT/DECIMAL -> float64 vs Spark int64) hash-mismatch
    assert_dtype_parity(ddb, _ORACLES[name], df)
    drows = duck_rows(ddb, f"SELECT {', '.join(dcols)} FROM ({_ORACLES[name]})")
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert srows == drows


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["o_orderkey", "revenue", "orderdate_us"]


def test_lookup_join_async_concurrent(spark):
    """Async lookup join (AsyncLookupJoinRunner ORDERED mode): chunked
    lookups run CONCURRENTLY (call intervals overlap) and results
    merge back correctly with left-join NULLs."""
    import time

    probe = spark.range(0, 40).withColumnRenamed("id", "k").repartition(1)

    def slow_lookup(keys):
        t0 = time.monotonic()
        time.sleep(0.15)
        t1 = time.monotonic()
        return {
            k: {"v": f"dim_{k}", "call_start": t0, "call_end": t1}
            for k in keys
            if k % 2 == 0  # odd keys miss -> NULLs
        }

    from flink_efo_spark.operators.lookup import lookup_join_async

    out = lookup_join_async(
        probe,
        slow_lookup,
        "k",
        [("v", "string"), ("call_start", "double"), ("call_end", "double")],
        capacity=8,
        batch_size=5,
    ).collect()
    got = {r.k: r.v for r in out}
    assert got[2] == "dim_2" and got[1] is None
    # 8 chunks of 5 keys; with capacity 8 their [start, end] intervals
    # must overlap — serial execution would be strictly disjoint
    intervals = sorted(
        {(r.call_start, r.call_end) for r in out if r.call_start is not None}
    )
    assert len(intervals) == 8
    overlaps = sum(
        1
        for (s1, e1), (s2, _) in zip(intervals, intervals[1:])
        if s2 < e1
    )
    assert overlaps >= 4  # concurrent in-flight lookups, not serial


def test_registry_count_and_staging_isolation():
    """The registered corpus is pinned at 318 (round 10) and the
    round-11 staging pairs are NOT yet registered — the staging
    cadence that keeps the driver's never-checked sample draining
    cleanly. Bump the pin in the round that merges a staging module."""
    from flink_efo_spark.curation_queries_r11 import STAGED_QUERIES
    from flink_efo_spark.queries import ORACLES, QUERIES

    assert len(QUERIES) == 318
    assert set(ORACLES) == set(QUERIES)
    leaked = set(STAGED_QUERIES) & set(QUERIES)
    assert not leaked, f"staged names already registered: {leaked}"
