"""Property-based testing (hypothesis) for the custom operators whose
semantics are NOT delegated to Catalyst — as-of join and top-n —
against a brute-force python oracle. The reference's own suite has no
randomized testing (SURVEY §5); this exceeds it.

Examples are kept small and few: each example is a Spark job.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_efo_spark.operators.joins import asof_join
from flink_efo_spark.operators.topn import top_n

T0 = dt.datetime(2024, 1, 1)

keys = st.integers(min_value=0, max_value=3)
ts_off = st.integers(min_value=0, max_value=20)

probe_rows = st.lists(st.tuples(keys, ts_off), min_size=0, max_size=8)
build_rows = st.lists(
    st.tuples(keys, ts_off, st.integers(min_value=0, max_value=100)),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(probe=probe_rows, build=build_rows)
def test_asof_join_matches_bruteforce(spark, probe, build):
    pdf = spark.createDataFrame(
        [(k, T0 + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(probe)]
        or [(None, None, None)],
        "k int, ts timestamp, pid int",
    ).where(F.col("pid").isNotNull())
    bdf = spark.createDataFrame(
        [
            (k, T0 + dt.timedelta(minutes=m), v, i)
            for i, (k, m, v) in enumerate(build)
        ]
        or [(None, None, None, None)],
        "k int, ts timestamp, v int, bid int",
    ).where(F.col("bid").isNotNull())

    out = asof_join(
        pdf, bdf, "k", "ts", "ts", build_cols=["v"], tiebreak="bid"
    ).collect()

    # brute force: latest build row with same key, ts <= probe ts,
    # ties by highest bid
    def expect(k, m):
        cands = [
            (bm, bid, v)
            for (bk, bm, v, bid) in [
                (bk, bm, v, i) for i, (bk, bm, v) in enumerate(build)
            ]
            if bk == k and bm <= m
        ]
        if not cands:
            return None
        return max(cands)[2]

    got = {r.pid: r.v for r in out}
    assert len(got) == len(probe)
    for i, (k, m) in enumerate(probe):
        assert got[i] == expect(k, m), (i, k, m, got[i], expect(k, m))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(keys, st.integers(min_value=-50, max_value=50)),
        min_size=0,
        max_size=12,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_top_n_matches_bruteforce(spark, rows, n):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)] or [(None, None, None)],
        "k int, v int, rid int",
    ).where(F.col("rid").isNotNull())
    out = top_n(df, ["k"], [F.col("v").desc(), F.col("rid").asc()], n).collect()

    expected = {}
    for i, (k, v) in enumerate(rows):
        expected.setdefault(k, []).append((-v, i))
    exp_ids = set()
    for k, lst in expected.items():
        for rank, (_, i) in enumerate(sorted(lst)[:n], 1):
            exp_ids.add((k, i, rank))
    got = {(r.k, r.rid, r.rn) for r in out}
    assert got == exp_ids
