"""Token-budget shard packing (operators/packing.py)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def assignments(spark):
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.packing import pack_shards

    docs = load_table(spark, SF_DIR, "documents")
    return pack_shards(docs, "doc_id", "text", shard_tokens=2000).collect()


def test_every_doc_assigned_once(spark, assignments):
    from flink_efo_spark.catalog import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(assignments) == n_docs
    assert len({r.doc_id for r in assignments}) == n_docs


def test_positions_are_contiguous(assignments):
    rows = sorted(assignments, key=lambda r: r.start_pos)
    pos = 0
    for r in rows:
        assert r.start_pos == pos
        pos += r.n_tokens


def test_shard_budget_bound(assignments):
    # shard total <= budget + (overflow of its last doc - 1): a shard
    # only exceeds 2000 because the doc STARTING before the boundary
    # is not split
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in assignments:
        by_shard[r.shard_id].append(r)
    max_doc = max(r.n_tokens for r in assignments)
    for shard, rows in by_shard.items():
        total = sum(r.n_tokens for r in rows)
        assert total < 2000 + max_doc
        # every doc STARTS inside its shard's token range
        for r in rows:
            assert r.start_pos // 2000 == shard


def test_bucket_count_validation(spark):
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.packing import pack_shards

    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError):
        pack_shards(docs, "doc_id", "text", 2000, n_buckets=100)


def test_bucketing_invariant_to_n_buckets(spark):
    """The hierarchical prefix sum must give the same global positions
    for any bucket fan-out (16 vs 256)."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.packing import pack_shards

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    a = {
        r.doc_id: (r.start_pos, r.shard_id)
        for r in pack_shards(docs, "doc_id", "text", 2000, n_buckets=16).collect()
    }
    b = {
        r.doc_id: (r.start_pos, r.shard_id)
        for r in pack_shards(docs, "doc_id", "text", 2000, n_buckets=256).collect()
    }
    assert a == b
