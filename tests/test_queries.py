"""End-to-end: every queries() entry matches its DuckDB oracle at
sf0.001 — the same check the driver runs at sf0.01 (CORRECTNESS gate).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, duck_rows, rows_of

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
    drows = duck_rows(ddb, f"SELECT {', '.join(dcols)} FROM ({_ORACLES[name]})")
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert srows == drows


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["o_orderkey", "revenue", "orderdate_us"]
