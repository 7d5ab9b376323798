"""Round-11 staging gate for the span-remediation queries (the
test_curation_oracles_r10.py pattern): every curation_queries_r11.py
(engine, oracle) pair must hash-match DuckDB under the verify_local
comparison rules (columns sorted by name, rows sorted, floats rounded
to 9 decimals) BEFORE round 11 registers them in the driver corpus.
Run with SPARK_GRAFT_SF_DIR_SMALL=/root/testdata/sf0.01 for the
driver's SF."""

from __future__ import annotations

import pytest

from flink_efo_spark.curation_queries_r11 import (
    STAGED_ORACLES,
    STAGED_QUERIES,
)
from tests.test_graph_oracles import (  # noqa: F401  (con is a fixture)
    SF_DIR,
    _rowset,
    con,
)


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_matches_oracle(spark, con, name):
    sdf = STAGED_QUERIES[name](spark, SF_DIR)
    got, got_cols = _rowset(sdf.columns, sdf.collect())
    res = con.execute(STAGED_ORACLES[name])
    exp, exp_cols = _rowset(
        [d[0] for d in res.description], res.fetchall()
    )
    assert got_cols == exp_cols
    assert len(got) == len(exp)
    assert got == exp
