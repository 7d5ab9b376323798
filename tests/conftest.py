"""Shared fixtures: one SparkSession per test run + a DuckDB oracle.

Mirrors the reference's ITCase pattern (SURVEY §5:
runtime/stream/sql/*ITCase.scala drive small fixed row sets through an
operator and compare sorted result rows) — here the expected side is
DuckDB executing equivalent SQL on the same rows.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from flink_efo_spark.session import get_spark

    s = get_spark("flink-efo-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def _sort_key(row):
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in row)


def rows_of(df) -> list[tuple]:
    """Sorted, normalized row set of a Spark DataFrame (None-safe)."""
    return sorted((tuple(_norm(v) for v in r) for r in df.collect()), key=_sort_key)


def duck_rows(con, sql: str) -> list[tuple]:
    return sorted(
        (tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()),
        key=_sort_key,
    )


def _norm(v):
    import math

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v
