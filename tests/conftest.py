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


def _duck_kind(t: str) -> str:
    """Pandas dtype *kind* a DuckDB column lands as under fetch_df —
    the representation the driver hashes. HUGEINT (DuckDB's sum(int)
    type) and DECIMAL fetch as float64: an oracle emitting either for
    a Spark bigint/long column hashes differently despite equal
    values (the round-5 tpch_q12 red)."""
    t = t.upper()
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "UNION", "LIST")):
        return "O"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "i"
    if t in ("HUGEINT", "UHUGEINT", "FLOAT", "DOUBLE", "REAL") or t.startswith(
        "DECIMAL"
    ):
        return "f"
    if t.startswith("TIMESTAMP") or t == "DATETIME":
        return "M"
    if t == "DATE":
        return "D"
    if t == "BOOLEAN":
        return "b"
    return "O"


def _spark_kind(s: str) -> str:
    """Pandas dtype kind a Spark column lands as under toPandas
    (simpleString input). DecimalType arrives as object(Decimal) —
    deliberately distinct from DuckDB DECIMAL's float64."""
    if s.startswith(("array", "map", "struct")):
        return "O"
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if s in ("float", "double"):
        return "f"
    if s in ("timestamp", "timestamp_ntz"):
        return "M"
    if s == "date":
        return "D"
    if s == "boolean":
        return "b"
    return "O"


def assert_dtype_parity(con, sql: str, sdf) -> None:
    """Driver-hash dtype gate: per column (matched by name), the
    DuckDB oracle must land in pandas with the same dtype kind as the
    Spark result, else equal values still hash differently in
    CORRECTNESS (int64 643 vs float64 643.0). Schema-level — no data
    fetched, and immune to null-driven int->float promotion (which
    hits both sides equally)."""
    dtypes = {
        name: typ for name, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    for f in sdf.schema.fields:
        if f.name not in dtypes:
            continue  # column-name parity is asserted elsewhere
        dk = _duck_kind(dtypes[f.name])
        sk = _spark_kind(f.dataType.simpleString())
        assert dk == sk, (
            f"dtype-kind mismatch on {f.name!r}: oracle {dtypes[f.name]} "
            f"(pandas kind {dk}) vs spark {f.dataType.simpleString()} "
            f"(pandas kind {sk}) — equal values would hash differently; "
            f"CAST the oracle column (e.g. HUGEINT sums -> CAST(... AS BIGINT))"
        )
