"""Text-analysis operator tests."""

from __future__ import annotations

from flink_efo_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    quality_stats,
    token_stats,
)

DOCS = [
    (1, "the quick brown fox is in the barn for it"),
    (2, "der hund ist nicht mit der katze und das ist gut"),
    (3, "12345 !!! ???"),
    (4, ""),
]
SCHEMA = "doc_id int, text string"


def test_token_stats(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    rows = {r.doc_id: r for r in token_stats(df, "doc_id", "text").collect()}
    assert rows[1].n_tokens == 10
    assert rows[1].n_types == 9  # 'the' twice
    assert rows[4].n_tokens == 0
    assert rows[3].bpe_tokens == 7  # one number run + 6 punct chars


def test_lang_id(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    rows = {r.doc_id: r.lang_guess for r in lang_id(df, "doc_id", "text").collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "und" and rows[4] == "und"


def test_quality_stats_bounds(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    for r in quality_stats(df, "doc_id", "text").collect():
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0


def test_doc_fingerprint_equal_docs_share_min(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z z z q q")],
        SCHEMA,
    )
    rows = {r.doc_id: r.fp_min for r in doc_fingerprint(df, "doc_id", "text").collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
