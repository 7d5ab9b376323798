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


def test_pack_sequences_tiling(spark):
    """Segment map invariants: every sequence is tiled to exactly
    seq_len tokens (except the tail), every doc's segments cover
    [0, n_tokens) contiguously, zero-token docs emit nothing, and
    the layout order matches pack_shards' (same global positions)."""
    import collections

    from flink_efo_spark.operators.packing import (
        pack_sequences,
        pack_shards,
    )

    rows = [(i, "tok " * n) for i, n in enumerate([3, 10, 0, 7, 25, 1])]
    rows.append((9, None))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    segs = pack_sequences(df, "doc_id", "text", seq_len=8).collect()

    assert {s.doc_id for s in segs} == {0, 1, 3, 4, 5}
    total = sum(s.seg_len for s in segs)
    assert total == 3 + 10 + 7 + 25 + 1
    per_seq = collections.Counter()
    for s in segs:
        per_seq[s.seq_id] += s.seg_len
    last = max(per_seq)
    for k, v in per_seq.items():
        assert v == 8 or (k == last and v == total - 8 * last)
    per_doc = collections.defaultdict(list)
    for s in segs:
        per_doc[s.doc_id].append((s.doc_offset, s.seg_len, s.seq_id,
                                  s.seq_offset))
    for d, ivs in sorted(per_doc.items()):
        ivs.sort()
        p = 0
        for o, l, q, qo in ivs:
            assert o == p
            assert 0 <= qo and qo + l <= 8
            p = o + l
        assert p == dict((r[0], len((r[1] or "").split())) for r in rows)[d]

    # same global layout as pack_shards: doc start positions agree
    starts = {
        r.doc_id: r.start_pos
        for r in pack_shards(df, "doc_id", "text", shard_tokens=8).collect()
        if r.n_tokens and r.n_tokens > 0
    }
    firsts = {
        d: min(s.seq_id * 8 + s.seq_offset for s in segs if s.doc_id == d)
        for d in per_doc
    }
    assert firsts == starts

    import pytest as _pt
    with _pt.raises(ValueError, match="seq_len"):
        pack_sequences(df, "doc_id", "text", seq_len=0)


def test_sequence_manifest(spark):
    """Every sequence is full except exactly the last one (unless the
    total is a multiple of seq_len); doc counts match the segment
    map."""
    from flink_efo_spark.operators.packing import (
        pack_sequences,
        sequence_manifest,
    )

    rows = [(i, "tok " * n) for i, n in enumerate([3, 10, 7, 25, 1])]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    segs = pack_sequences(df, "doc_id", "text", seq_len=8)
    man = {r.seq_id: r for r in sequence_manifest(segs, 8).collect()}

    total = 3 + 10 + 7 + 25 + 1  # 46
    assert sum(r.filled_tokens for r in man.values()) == total
    last = max(man)
    for sid, r in man.items():
        assert r.is_full == (sid != last or total % 8 == 0)
        assert r.filled_tokens == (8 if sid != last else total - 8 * last)

    import pytest as _pt
    with _pt.raises(ValueError, match="seq_len"):
        sequence_manifest(segs, 0)
