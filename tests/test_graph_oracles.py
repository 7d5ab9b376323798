"""Graph-corpus oracle gate (the round-9 staging gate, kept as a
regression suite): every graph_queries.py (engine, oracle) pair must
hash-match DuckDB under the verify_local comparison rules (columns
sorted by name, rows sorted, floats rounded to 9 decimals). Run with
SPARK_GRAFT_SF_DIR_SMALL=/root/testdata/sf0.01 for the driver's SF."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from flink_efo_spark.graph_queries import GRAPH_ORACLES, GRAPH_QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (v is None, str(type(v)), v if v is not None else 0) for v in row
    )


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key
    ), [cols[i] for i in order]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{path}')"
            )
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(GRAPH_QUERIES))
def test_graph_oracle_pair(spark, con, name):
    sdf = GRAPH_QUERIES[name](spark, SF_DIR)
    srows, scols = _rowset(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = con.execute(GRAPH_ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows, ocols = _rowset(ocols, res.fetchall())
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, (name, i, a, b)
