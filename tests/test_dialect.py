"""Flink SQL group-window dialect shim (dialect.py).

Reference surface: FlinkSqlOperatorTable.java:1100-1180 (TUMBLE/HOP/
SESSION group-window functions + _START/_END/_ROWTIME/_PROCTIME
auxiliaries); semantics per WindowAggregateITCase.scala in
/root/reference.
"""

from __future__ import annotations

import pytest

from flink_efo_spark.dialect import translate, has_dialect_tokens


def test_translate_tumble():
    out = translate(
        "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) AS s, count(*) "
        "FROM e GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)"
    )
    assert out == (
        "SELECT window.start AS s, count(*) "
        "FROM e GROUP BY window(ts, '5 minutes')"
    )


def test_translate_hop_swaps_slide_size():
    # Flink arg order is (time, slide, size); Spark is (time, size, slide)
    out = translate("GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)")
    assert out == "GROUP BY window(ts, '10 minutes', '5 minutes')"


def test_translate_session_and_rowtime():
    out = translate(
        "SELECT SESSION_ROWTIME(ts, INTERVAL '30' MINUTE) "
        "FROM e GROUP BY SESSION(ts, INTERVAL '30' MINUTE)"
    )
    assert "session_window.end - INTERVAL 1 MILLISECOND" in out
    assert "GROUP BY session_window(ts, '30 minutes')" in out


def test_translate_proctime():
    assert translate("SELECT PROCTIME() AS p") == "SELECT current_timestamp() AS p"


def test_identity_on_plain_sql():
    sql = "SELECT a, count(*) FROM t WHERE b = 'TUMBLE(x)' GROUP BY a"
    assert translate(sql) == sql  # string literal untouched
    assert not has_dialect_tokens("SELECT 1")


def test_nested_expression_args():
    out = translate("GROUP BY TUMBLE(CAST(ts AS TIMESTAMP), INTERVAL '1' HOUR)")
    assert out == "GROUP BY window(CAST(ts AS TIMESTAMP), '1 hours')"


def test_quoted_identifier_not_rewritten():
    sql = 'SELECT "TUMBLE" FROM t'
    assert translate(sql) == sql


def test_bad_interval_raises():
    with pytest.raises(ValueError):
        translate("GROUP BY TUMBLE(ts, INTERVAL '1-2' YEAR TO MONTH)")


def test_end_to_end_tumble_matches_native_window(spark):
    """Dialect SQL result == native DataFrame window() result."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.session import EfoSession
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    env = EfoSession(spark)
    events = load_table(spark, SF_DIR, "events")
    events.createOrReplaceTempView("__dlt_events")

    got = env.execute_sql(
        """
        SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE) AS w_start,
               count(*) AS cnt
        FROM __dlt_events
        GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE)
        """
    )
    want = (
        events.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "cnt")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# ---------------------------------------------------------------------------
# windowing TVFs (FLIP-145: SqlTumbleTableFunction / SqlHopTableFunction /
# SqlCumulateTableFunction in FlinkSqlOperatorTable.java)
# ---------------------------------------------------------------------------


def test_tvf_tumble_renders_subquery():
    out = translate(
        "SELECT window_start, count(*) FROM "
        "TABLE(TUMBLE(TABLE e, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) "
        "GROUP BY window_start"
    )
    assert "TABLE(" not in out
    assert "window_start" in out and "window_end" in out and "window_time" in out
    assert "600000000" in out  # 10 min in micros


def test_tvf_hop_membership(spark):
    """Every row must land in size/slide HOP windows, each containing
    the row's timestamp."""
    from flink_efo_spark.session import EfoSession
    from flink_efo_spark.catalog import load_table
    from tests.conftest import SF_DIR

    env = EfoSession(spark)
    load_table(spark, SF_DIR, "events").limit(200).createOrReplaceTempView(
        "__tvf_ev"
    )
    rows = env.execute_sql(
        "SELECT event_id, ts, window_start, window_end FROM "
        "TABLE(HOP(TABLE __tvf_ev, DESCRIPTOR(ts), "
        "INTERVAL '5' MINUTE, INTERVAL '10' MINUTE))"
    ).collect()
    by_event = {}
    for r in rows:
        assert r.window_start <= r.ts < r.window_end
        assert (r.window_end - r.window_start).total_seconds() == 600
        by_event.setdefault(r.event_id, 0)
        by_event[r.event_id] += 1
    assert set(by_event.values()) == {2}  # size/slide = 2 windows per row


def test_tvf_cumulate_requires_tvf_form():
    with pytest.raises(ValueError, match="windowing-TVF form"):
        translate("GROUP BY CUMULATE(ts, INTERVAL '5' MINUTE)")


def test_tvf_session_rejected():
    with pytest.raises(ValueError, match="not supported in windowing-TVF"):
        translate(
            "SELECT * FROM TABLE(SESSION(TABLE e, DESCRIPTOR(ts), "
            "INTERVAL '5' MINUTE))"
        )


def test_tvf_tumble_offset(spark):
    """Optional offset arg shifts window alignment (Flink TVF offset)."""
    from flink_efo_spark.session import EfoSession
    from flink_efo_spark.catalog import load_table
    from tests.conftest import SF_DIR

    env = EfoSession(spark)
    load_table(spark, SF_DIR, "events").limit(50).createOrReplaceTempView(
        "__tvf_ev2"
    )
    rows = env.execute_sql(
        "SELECT ts, window_start FROM "
        "TABLE(TUMBLE(TABLE __tvf_ev2, DESCRIPTOR(ts), "
        "INTERVAL '10' MINUTE, INTERVAL '1' MINUTE))"
    ).collect()
    for r in rows:
        assert r.window_start.minute % 10 == 1
        assert r.window_start <= r.ts


def test_create_table_passthrough():
    """TABLE( in DDL column lists must NOT be touched by the TVF
    unwrapper."""
    sql = "CREATE TABLE(a INT, b STRING)"
    assert translate(sql) == sql


def test_rewrite_system_time_rowtime():
    """FOR SYSTEM_TIME AS OF <rowtime> (SqlSnapshot;
    StreamExecTemporalJoin.scala:51) becomes a versioned-interval
    join: LEAD validity windows on the build side + a range test."""
    from flink_efo_spark.dialect import rewrite_system_time

    sql = (
        "SELECT o.id, r.rate FROM orders o "
        "JOIN rates FOR SYSTEM_TIME AS OF o.order_time AS r "
        "ON o.currency = r.currency WHERE o.id > 0"
    )
    out = rewrite_system_time(sql, lambda t: "rate_time" if t == "rates" else None)
    assert "SYSTEM_TIME" not in out.upper()
    assert "LEAD(rate_time) OVER (PARTITION BY currency ORDER BY rate_time)" in out
    assert "o.order_time >= r.__vfrom" in out
    assert "(r.__vto IS NULL OR o.order_time < r.__vto)" in out
    assert out.endswith("WHERE o.id > 0")
    # identity on SQL without the token
    plain = "SELECT * FROM t JOIN u ON t.k = u.k"
    assert rewrite_system_time(plain, lambda t: None) == plain


def test_rewrite_system_time_proctime_and_errors():
    from flink_efo_spark.dialect import rewrite_system_time

    sql = (
        "SELECT * FROM o JOIN rates FOR SYSTEM_TIME AS OF PROCTIME() r "
        "ON o.cur = r.cur"
    )
    out = rewrite_system_time(sql, lambda t: ("rt", ["seq"]))
    assert "r.__vto IS NULL" in out and "ORDER BY rt, seq" in out
    with pytest.raises(ValueError, match="no registered rowtime"):
        rewrite_system_time(sql, lambda t: None)
    bad = (
        "SELECT * FROM o JOIN rates FOR SYSTEM_TIME AS OF o.ts r "
        "ON o.x < r.y"
    )
    with pytest.raises(ValueError, match="no equi-join key"):
        rewrite_system_time(bad, lambda t: "rt")
    # LEFT(x, 2) inside the condition is a function call, not a join
    # keyword — the condition span must include it
    fn_cond = (
        "SELECT * FROM o JOIN rates FOR SYSTEM_TIME AS OF o.ts AS r "
        "ON o.cur = r.cur AND LEFT(o.cur, 2) = 'EU' WHERE o.id > 0"
    )
    out2 = rewrite_system_time(fn_cond, lambda t: "rt")
    assert "LEFT(o.cur, 2) = 'EU'" in out2
    assert out2.endswith("WHERE o.id > 0")


def test_system_time_join_end_to_end(spark):
    """The reference's temporal-join SQL runs verbatim through
    EfoSession.sql and matches the exact as-of result, including the
    equal-rowtime tie (highest tiebreak version wins) and the
    inner-join drop of probe rows before any version."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(spark)
    rates = spark.createDataFrame(
        [
            ("EUR", 1.10, 100, 1),
            ("EUR", 1.20, 200, 2),
            ("EUR", 1.25, 200, 3),  # tie at t=200: seq 3 supersedes
            ("USD", 1.00, 150, 4),
        ],
        "currency string, rate double, rt long, seq long",
    )
    orders = spark.createDataFrame(
        [
            (1, "EUR", 50),   # before any EUR version -> dropped
            (2, "EUR", 100),  # exactly at v1 -> 1.10
            (3, "EUR", 199),  # still v1 -> 1.10
            (4, "EUR", 200),  # tie point -> seq-3 version, 1.25
            (5, "EUR", 999),  # latest -> 1.25
            (6, "USD", 160),  # -> 1.00
            (7, "JPY", 500),  # no versions at all -> dropped
        ],
        "id long, currency string, ot long",
    )
    env.create_temporary_view("__st_orders", orders)
    env.create_temporary_view(
        "__st_rates", rates, watermark="rt", version_tiebreak=["seq"]
    )
    got = sorted(
        (r.id, r.rate)
        for r in env.sql(
            "SELECT o.id, r.rate FROM __st_orders o "
            "JOIN __st_rates FOR SYSTEM_TIME AS OF o.ot AS r "
            "ON o.currency = r.currency"
        ).collect()
    )
    assert got == [(2, 1.10), (3, 1.10), (4, 1.25), (5, 1.25), (6, 1.00)]
    # proc-time form: current latest version per key
    got2 = sorted(
        (r.id, r.rate)
        for r in env.sql(
            "SELECT o.id, r.rate FROM __st_orders o "
            "JOIN __st_rates FOR SYSTEM_TIME AS OF PROCTIME() AS r "
            "ON o.currency = r.currency"
        ).collect()
    )
    assert got2 == [
        (1, 1.25), (2, 1.25), (3, 1.25), (4, 1.25), (5, 1.25), (6, 1.00),
    ]


def test_system_time_join_pk_partitions_version_chain(spark):
    """A declared PRIMARY KEY partitions the LEAD validity window by
    the PK ALONE: an extra non-key equality in the ON clause (here
    region) must stay a join predicate, NOT fragment the version
    chain (round-5 ADVICE: equi-key extraction left the superseded
    (EUR, EU) row with __vto IS NULL — a stale open version)."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(spark)
    rates = spark.createDataFrame(
        [
            ("EUR", "EU", 1.10, 100),  # v1: region EU
            ("EUR", "US", 1.20, 200),  # v2 changes the NON-KEY region
        ],
        "currency string, region string, rate double, rt long",
    )
    orders = spark.createDataFrame(
        [
            (1, "EUR", "EU", 300),  # as-of 300 -> v2; region EU != US -> drop
            (2, "EUR", "US", 300),  # as-of 300 -> v2, region matches -> 1.20
            (3, "EUR", "EU", 150),  # as-of 150 -> v1, region matches -> 1.10
        ],
        "id long, currency string, region string, ot long",
    )
    env.create_temporary_view("__pk_orders", orders)
    env.create_temporary_view(
        "__pk_rates", rates, watermark="rt", primary_key="currency"
    )
    got = sorted(
        (r.id, r.rate)
        for r in env.sql(
            "SELECT o.id, r.rate FROM __pk_orders o "
            "JOIN __pk_rates FOR SYSTEM_TIME AS OF o.ot AS r "
            "ON o.currency = r.currency AND o.region = r.region"
        ).collect()
    )
    # order 1 must NOT see the stale open v1: with the buggy
    # per-equality partitioning it would get (1, 1.10)
    assert got == [(2, 1.20), (3, 1.10)]


def test_lateral_table_rewrite_forms():
    """LATERAL TABLE -> LATERAL VIEW: comma/CROSS JOIN inner forms,
    LEFT JOIN ... ON TRUE -> OUTER, multi-column aliases, identity on
    plain SQL, and the reference's mandatory-ON-TRUE rejection."""
    import pytest

    from flink_efo_spark.dialect import rewrite_lateral_table as rl

    assert (
        rl("SELECT w FROM t, LATERAL TABLE(explode(a)) AS x(w)")
        == "SELECT w FROM t LATERAL VIEW explode(a) x AS w"
    )
    out = rl("SELECT 1 FROM t CROSS JOIN LATERAL TABLE(posexplode(a)) x(p, v)")
    assert "LATERAL VIEW posexplode(a) x AS p, v" in out
    out = rl("SELECT w FROM t LEFT JOIN LATERAL TABLE(explode(a)) AS x(w) ON TRUE")
    assert "LATERAL VIEW OUTER explode(a) x AS w" in out
    assert rl("SELECT * FROM t JOIN u ON t.k = u.k") == "SELECT * FROM t JOIN u ON t.k = u.k"
    with pytest.raises(ValueError, match="ON TRUE"):
        rl("SELECT w FROM t LEFT JOIN LATERAL TABLE(explode(a)) AS x(w) ON t.k = x.w")
    with pytest.raises(ValueError, match="alias"):
        rl("SELECT w FROM t, LATERAL TABLE(explode(a))")


def test_lateral_table_left_join_keeps_empty_rows(spark):
    """LEFT JOIN LATERAL TABLE ... ON TRUE preserves rows whose
    table-function expansion is empty (OUTER semantics) — the
    CorrelateITCase left-correlate contract."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(spark)
    spark.createDataFrame(
        [(1, ["a", "b"]), (2, [])], "id int, arr array<string>"
    ).createOrReplaceTempView("__efo_lat_t")
    rows = sorted(
        (r.id, r.w)
        for r in env.sql(
            "SELECT id, x.w FROM __efo_lat_t "
            "LEFT JOIN LATERAL TABLE(explode(arr)) AS x(w) ON TRUE"
        ).collect()
    )
    assert rows == [(1, "a"), (1, "b"), (2, None)]


def test_unnest_join_rewrite_and_execution(spark):
    """FROM-clause UNNEST (UnnestITCase) rewrites to LATERAL VIEW
    explode and runs end-to-end, OUTER form preserving empty arrays."""
    from flink_efo_spark.dialect import rewrite_lateral_table as rl
    from flink_efo_spark.session import EfoSession

    assert (
        rl("SELECT id, tag FROM t, UNNEST(tags) AS x(tag)")
        == "SELECT id, tag FROM t LATERAL VIEW explode(tags) x AS tag"
    )
    env = EfoSession(spark)
    spark.createDataFrame(
        [(1, ["x", "y"]), (2, [])], "id int, tags array<string>"
    ).createOrReplaceTempView("__efo_unnest_t")
    rows = sorted(
        (r.id, r.tag)
        for r in env.sql(
            "SELECT id, x.tag FROM __efo_unnest_t "
            "CROSS JOIN UNNEST(tags) AS x(tag)"
        ).collect()
    )
    assert rows == [(1, "x"), (1, "y")]
    rows = sorted(
        (r.id, r.tag)
        for r in env.sql(
            "SELECT id, x.tag FROM __efo_unnest_t "
            "LEFT JOIN UNNEST(tags) AS x(tag) ON TRUE"
        ).collect()
    )
    assert rows == [(1, "x"), (1, "y"), (2, None)]


def test_explain_plan_for(spark):
    """Flink's EXPLAIN PLAN FOR <stmt> (SqlRichExplain) runs as
    Spark EXPLAIN, with dialect constructs inside the statement."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(spark)
    spark.createDataFrame(
        [(1, ["x"])], "id int, tags array<string>"
    ).createOrReplaceTempView("__efo_expl_t")
    out = env.sql(
        "EXPLAIN PLAN FOR SELECT id, x.tag FROM __efo_expl_t "
        "CROSS JOIN UNNEST(tags) AS x(tag)"
    ).collect()
    assert len(out) == 1 and "Generate" in out[0][0] or "explode" in out[0][0]
