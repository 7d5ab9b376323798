"""JDBC upsert sink (io.jdbc_upsert_sink) — sqlite-backed round trips.

Reference: JdbcUpsertTableSink.java + TableJdbcUpsertOutputFormat in
flink-connectors/flink-connector-jdbc (buffered upsert statements,
key-overwrite materialization of an update stream).
"""

from __future__ import annotations

import sqlite3

import pytest

from flink_efo_spark.io import _upsert_statement, jdbc_upsert_sink
from tests.conftest import SF_DIR


def _connector(path):
    # module-level closure over a plain string: picklable for executors
    def connect():
        return sqlite3.connect(path, timeout=60)

    return connect


def test_upsert_statement_dialects():
    s = _upsert_statement("t", ["k", "a", "b"], ["k"], "sqlite")
    assert s == (
        "INSERT INTO t (k, a, b) VALUES (?, ?, ?) "
        "ON CONFLICT (k) DO UPDATE SET a = excluded.a, b = excluded.b"
    )
    m = _upsert_statement("t", ["k", "a"], ["k"], "mysql")
    assert "ON DUPLICATE KEY UPDATE a = VALUES(a)" in m
    with pytest.raises(ValueError):
        _upsert_statement("t", ["k"], ["k"], "oracle")


def test_batch_upsert_overwrites_by_key(spark, tmp_path):
    db = str(tmp_path / "up.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT)")

    df1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    jdbc_upsert_sink(df1, "kv", ["k"], _connector(db))
    df2 = spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string")
    jdbc_upsert_sink(df2, "kv", ["k"], _connector(db))

    with sqlite3.connect(db) as c:
        rows = sorted(c.execute("SELECT k, v FROM kv").fetchall())
    assert rows == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_streaming_update_agg_converges_to_batch(spark, tmp_path):
    """Update-mode streaming count per user, upserted by key → final
    sqlite table equals the batch groupBy result (the reference's
    upsert-sink materialization guarantee)."""
    from pyspark.sql import functions as F

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.streaming import stream_table

    db = str(tmp_path / "agg.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE per_user (user_id INTEGER PRIMARY KEY, cnt INTEGER)")

    ev = stream_table(spark, SF_DIR, "events")
    agg = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    q = jdbc_upsert_sink(
        agg,
        "per_user",
        ["user_id"],
        _connector(db),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)

    want = sorted(
        (r.user_id, r.cnt)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    with sqlite3.connect(db) as c:
        got = sorted(c.execute("SELECT user_id, cnt FROM per_user").fetchall())
    assert got == want
