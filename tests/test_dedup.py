"""Dedup operator unit tests incl. the short-document edge case that
crashed round 1 (_shingles_expr on docs with < shingle_size tokens).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_efo_spark.operators.dedup import (
    dedup_exact,
    dedup_keep_first,
    dedup_keep_last,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    shingle_sets,
    simhash_near_duplicates,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "a"),
    (2, "the quick brown fox jumps over the lazy cat", "a"),
    (3, "completely different text about spark engines here", "a"),
    (4, "hi", "a"),  # shorter than shingle_size → must not crash
    (5, "", "a"),  # empty doc
    (6, "the quick brown fox jumps over the lazy dog", "a"),  # exact dup of 1
]
SCHEMA = "doc_id int, text string, source string"


def test_shingles_short_docs_no_crash(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    out = shingle_sets(df, "doc_id", "text", shingle_size=3).collect()
    ids = {r.doc_id for r in out}
    assert 4 not in ids and 5 not in ids  # short docs dropped, not crashed
    assert 1 in ids


def test_minhash_finds_near_dups(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    pairs = minhash_near_duplicates(
        df, "doc_id", "text", threshold=0.5, num_perm=12, bands=12
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 6) in got  # exact dup → jaccard 1.0
    assert (1, 2) in got  # one-word change → high jaccard
    assert all((a, b) != (1, 3) for a, b in got)


def test_ngram_jaccard_blocked(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    pairs = ngram_jaccard_pairs(
        df, "doc_id", "text", block_by="source", threshold=0.99
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 6)}


def test_simhash_near_dups(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    pairs = simhash_near_duplicates(df, "doc_id", "text", max_hamming=3).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 6) in got
    hamming = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert hamming[(1, 6)] == 0


def test_dedup_exact_keeps_smallest_id(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    out = dedup_exact(df, "doc_id", "text").collect()
    by_id = {r.doc_id: r for r in out}
    assert 6 not in by_id and 1 in by_id
    assert by_id[1].group_size == 2


def test_keep_first_last(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 1, "x")],
        "k int, seq int, v string",
    )
    first = dedup_keep_first(df, ["k"], [F.col("seq")]).collect()
    last = dedup_keep_last(df, ["k"], [F.col("seq")]).collect()
    assert {(r.k, r.v) for r in first} == {(1, "a"), (2, "x")}
    assert {(r.k, r.v) for r in last} == {(1, "c"), (2, "x")}


def test_dedup_incremental_two_batches(spark):
    """The incremental protocol end-to-end: batch 2 is deduped
    against the store as appended by batch 1 — a duplicate of a
    batch-1 survivor is dropped even though it never shared a batch
    with it."""
    from pyspark.sql import functions as F

    from flink_efo_spark.operators.dedup import dedup_incremental

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    fp = F.md5(F.lower(F.col("text")))
    store = docs([]).select(fp.alias("fingerprint")).limit(0)

    b1 = docs([(1, "Alpha"), (2, "alpha"), (3, "beta")])
    s1, sig1 = dedup_incremental(b1, store, "doc_id", fp)
    got1 = {(r.doc_id, r.group_size) for r in s1.collect()}
    assert got1 == {(1, 2), (3, 1)}  # keep-first within batch

    store = store.unionByName(sig1)
    b2 = docs([(10, "ALPHA"), (11, "gamma"), (12, "Gamma")])
    s2, sig2 = dedup_incremental(b2, store, "doc_id", fp)
    got2 = {(r.doc_id, r.group_size) for r in s2.collect()}
    assert got2 == {(11, 2)}  # 10 seen in store; 12 loses to 11
    assert sig2.count() == 1


def test_incremental_near_dedup_band_store(spark):
    """dedup_incremental_near: near-dup of a stored doc is dropped
    via the band store alone (no bodies), a within-batch later
    near-dup is dropped by the earlier one, unrelated and too-short
    docs survive, and the returned keys extend the store."""
    from flink_efo_spark.operators.dedup import dedup_incremental_near

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "sleepy")
    other = "completely different words about spark engines and rivers flowing"
    epoch0 = spark.createDataFrame([(0, base)], "doc_id long, text string")
    empty = spark.createDataFrame([], "band_idx int, band_hash bigint")
    surv0, store = dedup_incremental_near(epoch0, empty, "doc_id", "text")
    assert [r.doc_id for r in surv0.collect()] == [0]
    assert store.count() == 3  # one key per band

    epoch1 = spark.createDataFrame(
        [(1, near),          # near-dup of stored doc 0 -> dropped
         (3, other),         # unrelated -> survives
         (5, other + " x"),  # near-dup of 3 (earlier in batch) -> dropped
         (7, "ab")],         # too short for shingles -> survives
        "doc_id long, text string",
    )
    surv1, keys1 = dedup_incremental_near(epoch1, store, "doc_id", "text")
    assert sorted(r.doc_id for r in surv1.collect()) == [3, 7]
    # keys of ALL batch docs (incl. dropped) feed the next increment
    assert keys1.count() >= 3


def test_duplicate_spans_and_stats(spark):
    """Hand-built boilerplate case: docs 1 and 2 share a verbatim
    6-token passage, doc 3 is unique, doc 4 is too short for any
    window. duplicate_spans finds exactly the shared spans;
    span_dup_stats profiles every doc (zeros + NULL fraction for the
    short one)."""
    from flink_efo_spark.operators.dedup import (
        duplicate_spans,
        span_dup_stats,
    )

    shared = "all rights reserved see license for details"  # 7 tokens
    rows = [
        (1, f"alpha beta {shared}"),
        (2, f"{shared} gamma delta"),
        (3, "completely unrelated text with no overlap at all here"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    dup = duplicate_spans(df, "doc_id", "text", window=6, min_docs=2)
    got = {(r.fingerprint, r.n_docs, r.n_occurrences) for r in dup.collect()}
    # the 7-token shared passage contributes its two 6-token windows,
    # each present once in each doc
    assert len(got) == 2
    assert all(nd == 2 and nocc == 2 for _, nd, nocc in got)

    st = {r.doc_id: r for r in span_dup_stats(df, "doc_id", "text",
                                              window=6).collect()}
    assert len(st) == 4
    # doc1: 9 tokens -> 4 windows, 2 of them shared
    assert (st[1].n_windows, st[1].dup_windows) == (4, 2)
    assert abs(st[1].dup_fraction - 0.5) < 1e-12
    assert (st[2].n_windows, st[2].dup_windows) == (4, 2)
    assert st[3].dup_windows == 0
    assert st[4].n_windows == 0 and st[4].dup_fraction is None


def test_duplicate_span_positions_and_cut(spark):
    """The remediation half (Lee et al. 2021): positions are merged
    maximal token intervals, and cut_duplicate_spans removes exactly
    the covered tokens — including BOTH occurrences of a passage
    repeated inside one document (the no-array_distinct property)."""
    from flink_efo_spark.operators.dedup import (
        cut_duplicate_spans,
        duplicate_span_positions,
    )

    shared = "all rights reserved see license for details"  # 7 tokens
    rows = [
        (1, f"alpha beta {shared}"),
        (2, f"{shared} gamma delta"),
        (3, "completely unrelated text with no overlap at all here"),
        (4, "too short"),
        (5, f"{shared} zz {shared}"),  # internal repeat: cut both
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    pos = duplicate_span_positions(df, "doc_id", "text", window=6, min_docs=2)
    got = sorted((r.doc_id, r.token_start, r.token_end) for r in pos.collect())
    assert got == [(1, 3, 9), (2, 1, 7), (5, 1, 7), (5, 9, 15)]

    # merge invariance under partitioning
    pos2 = duplicate_span_positions(
        df.repartition(5, "doc_id"), "doc_id", "text", window=6, min_docs=2
    )
    assert sorted(
        (r.doc_id, r.token_start, r.token_end) for r in pos2.collect()
    ) == got

    cut = {r.doc_id: r for r in cut_duplicate_spans(
        df, "doc_id", "text", window=6, min_docs=2).collect()}
    assert len(cut) == 6
    assert (cut[1].clean_text, cut[1].n_tokens, cut[1].removed_tokens) == (
        "alpha beta", 9, 7)
    assert (cut[2].clean_text, cut[2].removed_tokens) == ("gamma delta", 7)
    assert cut[3].removed_tokens == 0
    assert cut[3].clean_text == rows[2][1]
    assert (cut[4].clean_text, cut[4].n_tokens) == ("too short", 2)
    assert (cut[5].clean_text, cut[5].n_tokens, cut[5].removed_tokens) == (
        "zz", 15, 14)
    assert cut[6].clean_text is None and cut[6].n_tokens == 0
    assert cut[6].removed_tokens == 0


def test_span_ops_guards(spark):
    import pytest

    from flink_efo_spark.operators.dedup import (
        duplicate_span_positions,
        duplicate_spans,
        span_dup_stats,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError, match="window"):
        duplicate_spans(df, "doc_id", "text", window=0)
    with pytest.raises(ValueError, match="min_docs"):
        duplicate_spans(df, "doc_id", "text", min_docs=0)
    with pytest.raises(ValueError, match="window"):
        span_dup_stats(df, "doc_id", "text", window=0)
    with pytest.raises(ValueError, match="window"):
        duplicate_span_positions(df, "doc_id", "text", window=0)
    with pytest.raises(ValueError, match="min_docs"):
        duplicate_span_positions(df, "doc_id", "text", min_docs=0)


def test_boilerplate_topk(spark):
    """Hand-built boilerplate: a license span shared by 3 docs ranks
    above a 2-doc span; unique text never appears; ordering and the
    cut line are deterministic; example_span is the min surface
    form."""
    from flink_efo_spark.operators.dedup import boilerplate_topk

    lic = "all rights reserved by the example corp"
    pair = "this span appears in exactly two docs"
    rows = [
        (1, f"alpha beta {lic} gamma"),
        (2, f"{lic} delta epsilon"),
        (3, f"zeta {lic} eta"),
        (4, f"unique text one with no repeats at all here {pair}"),
        (5, f"totally different words again and again okay {pair}"),
        (6, "nothing shared in this document whatsoever right now"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = boilerplate_topk(df, "doc_id", "text", window=7, k=10).collect()

    assert got, "expected shared spans"
    by_span = {r.example_span: r for r in got}
    assert lic in by_span and by_span[lic].n_docs == 3
    assert pair in by_span and by_span[pair].n_docs == 2
    assert all(r.n_docs >= 2 for r in got)
    # the cut keeps the globally best rows (row order itself is not
    # part of the contract — consumers sort)
    k2 = boilerplate_topk(df, "doc_id", "text", window=7, k=2).collect()
    best = sorted(
        ((-r.n_docs, -r.n_occurrences, r.fingerprint) for r in got)
    )[:2]
    assert sorted(
        (-r.n_docs, -r.n_occurrences, r.fingerprint) for r in k2
    ) == best

    top1 = boilerplate_topk(df, "doc_id", "text", window=7, k=1).collect()
    assert len(top1) == 1 and top1[0].n_docs == 3

    import pytest as _pt
    with _pt.raises(ValueError, match="window"):
        boilerplate_topk(df, "doc_id", "text", window=0)
    with _pt.raises(ValueError, match="k must"):
        boilerplate_topk(df, "doc_id", "text", k=0)
