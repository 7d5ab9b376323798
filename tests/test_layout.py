"""Data-layout operator invariants (operators/layout.py): z-order
clustering must never change results (pruning is files-only), the
cell enumeration must cover every cell a matching row can live in,
and bucketed joins must be exchange-free on the join key.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from flink_efo_spark.operators.layout import (
    _z_interleave_py,
    bucketed_join,
    grid_cell,
    write_bucketed,
    write_zorder_layout,
    zorder_cells_for_box,
    zorder_key,
    zorder_range_scan,
)

from tests.conftest import SF_DIR


def test_zorder_key_matches_python_interleave(spark):
    """Catalyst bit interleave == the python reference for every cell
    pair in a 2^4 x 2^4 grid."""
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=4).alias("z")
    )
    for r in out.collect():
        assert r.z == _z_interleave_py((r.a, r.b), 4), (r.a, r.b, r.z)


def test_zorder_scan_equals_full_scan(spark):
    """Identity: the pruned z-order scan returns exactly the rows a
    plain filtered scan returns, and its PartitionFilters prune to a
    strict subset of cells."""
    rows = [((i * 17) % 1000, (i * 31) % 1000, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "x long, y long, rid long")
    path = tempfile.mkdtemp(prefix="efo-ztest-") + "/t"
    specs = [("x", 0, 1000), ("y", 0, 1000)]
    write_zorder_layout(df, path, specs, bits=3)
    box = [(100, 340), (500, 740)]
    got = zorder_range_scan(spark, path, specs, box, bits=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [z_cell" in plan
    got_ids = sorted(r.rid for r in got.collect())
    want_ids = sorted(
        r.rid
        for r in df.where(
            (F.col("x").between(100, 340)) & (F.col("y").between(500, 740))
        ).collect()
    )
    assert got_ids == want_ids and len(got_ids) > 0
    # the scan's partition filter is exactly the enumerated cell set,
    # a strict subset of the 64-cell grid
    import re

    m = re.search(r"PartitionFilters: \[z_cell#\d+ IN \(([\d,]+)\)", plan)
    assert m is not None
    listed = sorted(int(c) for c in m.group(1).split(","))
    assert listed == zorder_cells_for_box(specs, box, bits=3)
    assert len(listed) < 64


def test_zorder_box_cells_cover_data_cells(spark):
    """Every cell that holds an in-box row is in the enumerated cell
    set (no false pruning), including at box/domain edges."""
    rows = [(x, y) for x in range(0, 100, 7) for y in range(0, 100, 11)]
    df = spark.createDataFrame(rows, "x long, y long")
    specs = [("x", 0, 96), ("y", 0, 96)]  # domain NOT covering all data
    box = [(90, 99), (0, 40)]
    listed = set(zorder_cells_for_box(specs, box, bits=3))
    in_box = df.where(
        (F.col("x").between(90, 99)) & (F.col("y").between(0, 40))
    )
    data_cells = {
        r.z
        for r in in_box.select(
            zorder_key(
                [grid_cell(F.col(c), lo, hi, 3) for (c, lo, hi) in specs], 3
            ).alias("z")
        ).collect()
    }
    assert data_cells <= listed, (data_cells, listed)


def test_bucketed_join_equals_plain_join_and_no_join_exchange(spark):
    """Bucketed join == plain join, and the merge-hinted SMJ consumes
    the bucketed scans with no Exchange on either side."""
    left = spark.createDataFrame(
        [(i % 50, i) for i in range(400)], "k long, lid long"
    )
    right = spark.createDataFrame(
        [(i % 50, i * 10) for i in range(300)], "k long, rv long"
    )
    tag = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix="efo-btest-")
    write_bucketed(left, f"efo_t_l_{tag}", base + "/l", "k", 4)
    write_bucketed(right, f"efo_t_r_{tag}", base + "/r", "k", 4)
    j = bucketed_join(
        spark, f"efo_t_l_{tag}", f"efo_t_r_{tag}", "k", hint="merge"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    got = sorted((r.lid, r.rv) for r in j.collect())
    want = sorted(
        (r.lid, r.rv)
        for r in left.join(right.withColumnRenamed("k", "k2"),
                           F.col("k") == F.col("k2")).collect()
    )
    assert got == want and len(got) > 0


def test_corpus_bucketed_join_single_agg_exchange(spark):
    """The corpus query's only exchange is the final aggregation —
    the orders-lineitem join itself rides the bucket layout."""
    from flink_efo_spark.queries import QUERIES

    df = QUERIES["bucketed_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
