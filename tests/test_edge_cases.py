"""Edge-case hardening: NULL keys, empty inputs, unicode text —
the corner rows a 100 TB corpus always contains.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_efo_spark.operators.dedup import (
    dedup_exact,
    minhash_near_duplicates,
    shingle_sets,
)
from flink_efo_spark.operators.joins import asof_join, interval_join
from flink_efo_spark.operators.text import lang_id, token_stats
from flink_efo_spark.operators.topn import top_n

T0 = dt.datetime(2024, 1, 1)


def test_asof_join_null_key_rows(spark):
    probe = spark.createDataFrame(
        [(None, T0), (1, T0)], "k int, ts timestamp"
    )
    build = spark.createDataFrame(
        [(1, T0, "x"), (None, T0, "n")], "k int, ts timestamp, v string"
    )
    out = asof_join(probe, build, "k", "ts", "ts", build_cols=["v"]).collect()
    got = {r.k: r.v for r in out}
    assert got[1] == "x"
    # NULL keys group together under partitionBy (SQL GROUP BY NULL
    # semantics) — they match the NULL-key build row, not crash
    assert None in got


def test_interval_join_null_key_drops(spark):
    left = spark.createDataFrame([(None, T0, 1)], "k int, ts timestamp, id int")
    right = spark.createDataFrame([(None, T0, 2)], "k int, ts timestamp, id int")
    out = interval_join(
        left, right, "k", "ts", "ts", "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES"
    )
    # equi-join on NULL never matches (SQL semantics)
    assert out.count() == 0


def test_empty_input_operators(spark):
    empty_docs = spark.createDataFrame([], "doc_id int, text string")
    assert shingle_sets(empty_docs, "doc_id", "text").count() == 0
    assert dedup_exact(empty_docs, "doc_id", "text").count() == 0
    assert (
        minhash_near_duplicates(empty_docs, "doc_id", "text").count() == 0
    )
    assert token_stats(empty_docs, "doc_id", "text").count() == 0
    empty_orders = spark.createDataFrame([], "k int, v double")
    assert top_n(empty_orders, ["k"], [F.col("v").desc()], 3).count() == 0


def test_null_text_rows(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "real text here three words")], "doc_id int, text string"
    )
    # null text → no shingles, not a crash
    ids = {r.doc_id for r in shingle_sets(docs, "doc_id", "text").collect()}
    assert ids == {2}
    stats = {r.doc_id: r.n_tokens for r in token_stats(docs, "doc_id", "text").collect()}
    assert stats[2] == 5 and (stats[1] is None or stats[1] == 0)


def test_unicode_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "héllo wörld ünïcode tokens überall da"),
            (2, "日本語 テキスト の 処理 も 動く"),
            (3, "emoji 🙂 in 🙂 the 🙂 stream"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in token_stats(docs, "doc_id", "text").collect()}
    assert out[1].n_tokens == 6
    assert out[2].n_tokens == 6
    assert out[3].n_tokens == 7
    # lang_id must not crash on non-latin text; 'und' is acceptable
    langs = {r.doc_id: r.lang_guess for r in lang_id(docs, "doc_id", "text").collect()}
    assert langs[2] == "und"
    # shingles survive unicode round-trip
    sh = shingle_sets(docs, "doc_id", "text", shingle_size=2)
    assert sh.count() == 3


def test_dedup_exact_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, ""), (3, None), (4, "x")], "doc_id int, text string"
    )
    out = dedup_exact(docs, "doc_id", "text").collect()
    by_fp = {r.doc_id: r.group_size for r in out}
    assert by_fp.get(1) == 2  # both empty strings collapse
    assert 4 in by_fp
    # null text → null fingerprint group (kept, size 1)
    assert 3 in by_fp
