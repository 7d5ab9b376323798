"""Flink CREATE TABLE DDL text (ddl_sql.py) — SqlCreateTable.java:56
surface: WATERMARK, computed columns, PRIMARY KEY NOT ENFORCED,
PARTITIONED BY, WITH options, DROP TABLE."""

from __future__ import annotations

import pytest


def _env(spark):
    from flink_efo_spark.session import EfoSession

    return EfoSession(spark)


def _write_events(spark, tmp_path):
    path = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 3.0), (3, "a", 4.0)],
        "id long, et string, v double",
    ).write.mode("overwrite").parquet(path)
    return path


def test_create_table_ddl_roundtrip(spark, tmp_path):
    env = _env(spark)
    path = _write_events(spark, tmp_path)
    r = env.sql(
        f"""
        CREATE TABLE __ddl_t1 (
          id BIGINT,
          et STRING,
          v DOUBLE,
          v2 AS v * 10,
          PRIMARY KEY (id) NOT ENFORCED
        ) PARTITIONED BY (et) WITH (
          'connector' = 'filesystem',
          'path' = '{path}',
          'format' = 'parquet'
        )
        """
    ).collect()
    assert r[0].result == "OK"
    got = sorted(
        (x.et, x.s) for x in env.sql(
            "SELECT et, sum(v2) AS s FROM __ddl_t1 GROUP BY et"
        ).collect()
    )
    assert got == [("a", 60.0), ("b", 30.0)]
    spec = env._specs["__ddl_t1"]
    assert spec.computed_columns == {"v2": "v * 10"}
    assert spec.options["primary_key"] == "id"
    assert spec.options["partitioned_by"] == "et"
    # DROP removes spec + view; IF EXISTS is a no-op afterwards
    env.sql("DROP TABLE __ddl_t1")
    assert "__ddl_t1" not in env._specs


def test_create_table_ddl_watermark_parse(spark, tmp_path):
    from flink_efo_spark.ddl_sql import parse_watermark_delay

    assert parse_watermark_delay("ts - INTERVAL '5' SECOND") == (
        "ts", "5 seconds"
    )
    assert parse_watermark_delay("ts - INTERVAL '10' MINUTE") == (
        "ts", "10 minutes"
    )
    assert parse_watermark_delay("ts") == ("ts", "0 seconds")
    with pytest.raises(ValueError, match="WATERMARK"):
        parse_watermark_delay("CAST(ts AS TIMESTAMP)")

    env = _env(spark)
    path = _write_events(spark, tmp_path)
    env.sql(
        f"""
        CREATE TABLE __ddl_t2 (
          id BIGINT, et STRING, v DOUBLE, ts TIMESTAMP(3),
          WATERMARK FOR ts AS ts - INTERVAL '7' SECOND
        ) WITH ('connector' = 'filesystem', 'path' = '{path}')
        """
    )
    assert env._specs["__ddl_t2"].watermark == ("ts", "7 seconds")
    # the watermark also registers the table for FOR SYSTEM_TIME AS OF
    assert env._rowtime_of("__ddl_t2") == "ts"


def test_insert_into_and_statement_set(spark, tmp_path):
    """INSERT INTO / INSERT OVERWRITE on engine-spec tables write the
    spec's files (SqlInsert via executeSql); EXECUTE STATEMENT SET
    runs multiple inserts (the reference's multi-sink pipeline)."""
    env = _env(spark)
    src = _write_events(spark, tmp_path)
    out_a = str(tmp_path / "out_a.parquet")
    out_b = str(tmp_path / "out_b.parquet")
    env.sql(
        f"CREATE TABLE __ins_src (id BIGINT, et STRING, v DOUBLE) WITH "
        f"('connector' = 'filesystem', 'path' = '{src}')"
    )
    env.sql(
        f"CREATE TABLE __ins_a (et STRING, s DOUBLE) WITH "
        f"('connector' = 'filesystem', 'path' = '{out_a}')"
    )
    env.sql(
        f"CREATE TABLE __ins_b (id BIGINT, v DOUBLE) WITH "
        f"('connector' = 'filesystem', 'path' = '{out_b}')"
    )
    env.sql(
        "INSERT INTO __ins_a "
        "SELECT et, sum(v) AS s FROM __ins_src GROUP BY et"
    )
    got = sorted((r.et, r.s) for r in env.sql("SELECT * FROM __ins_a").collect())
    assert got == [("a", 6.0), ("b", 3.0)]
    # append semantics: a second INSERT INTO doubles the rows
    env.sql(
        "INSERT INTO __ins_a "
        "SELECT et, sum(v) AS s FROM __ins_src GROUP BY et"
    )
    assert env.sql("SELECT count(*) AS c FROM __ins_a").collect()[0].c == 4
    # INSERT OVERWRITE resets
    env.sql(
        "INSERT OVERWRITE __ins_a "
        "SELECT et, sum(v) AS s FROM __ins_src GROUP BY et"
    )
    assert env.sql("SELECT count(*) AS c FROM __ins_a").collect()[0].c == 2

    env.sql(
        """
        EXECUTE STATEMENT SET BEGIN
          INSERT OVERWRITE __ins_a SELECT et, sum(v) AS s FROM __ins_src GROUP BY et;
          INSERT INTO __ins_b SELECT id, v FROM __ins_src WHERE v > 2.5;
        END
        """
    )
    assert env.sql("SELECT count(*) AS c FROM __ins_a").collect()[0].c == 2
    got_b = sorted(r.id for r in env.sql("SELECT * FROM __ins_b").collect())
    assert got_b == [2, 3]

    import pytest as _pytest

    # inserts into unknown (non-spec) targets pass through to native
    # Spark SQL and fail with ITS resolution error
    with _pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|cannot be found"):
        env.sql("INSERT INTO __nope SELECT 1")
    with _pytest.raises(ValueError, match="only INSERT"):
        env.sql(
            "EXECUTE STATEMENT SET BEGIN SELECT 1; END"
        )


def test_create_table_ddl_errors(spark, tmp_path):
    env = _env(spark)
    path = _write_events(spark, tmp_path)
    with pytest.raises(ValueError, match="no SQL-DDL mapping"):
        env.sql(
            "CREATE TABLE __ddl_bad (id BIGINT) WITH "
            "('connector' = 'kafka', 'topic' = 't')"
        )
    with pytest.raises(ValueError, match="'path'"):
        env.sql(
            "CREATE TABLE __ddl_bad (id BIGINT) WITH "
            "('connector' = 'filesystem')"
        )
    with pytest.raises(ValueError, match="METADATA"):
        env.sql(
            f"CREATE TABLE __ddl_bad (id BIGINT, "
            f"ts TIMESTAMP(3) METADATA FROM 'timestamp') WITH "
            f"('connector' = 'filesystem', 'path' = '{path}')"
        )
    # plain Spark DDL (no WITH clause) passes through untouched
    env.sql("CREATE TABLE __ddl_spark_native (a INT) USING parquet")
    spark.sql("DROP TABLE __ddl_spark_native")


def test_statement_set_semicolon_in_literal(spark, tmp_path):
    """A ';' inside a string literal must not split an inner INSERT
    in two (round-5 ADVICE: the raw split rejected the second half as
    a non-INSERT fragment)."""
    env = _env(spark)
    src = _write_events(spark, tmp_path)
    out = str(tmp_path / "out_semi.parquet")
    env.sql(
        f"CREATE TABLE __semi_src (id BIGINT, et STRING, v DOUBLE) WITH "
        f"('connector' = 'filesystem', 'path' = '{src}')"
    )
    env.sql(
        f"CREATE TABLE __semi_out (id BIGINT) WITH "
        f"('connector' = 'filesystem', 'path' = '{out}')"
    )
    env.sql(
        """
        EXECUTE STATEMENT SET BEGIN
          INSERT OVERWRITE __semi_out
            SELECT id FROM __semi_src WHERE et <> 'a;b';
          INSERT INTO __semi_out SELECT id FROM __semi_src WHERE v > 99;
        END
        """
    )
    got = sorted(r.id for r in env.sql("SELECT * FROM __semi_out").collect())
    # no et equals 'a;b', so the first INSERT keeps all three rows;
    # the second adds none
    assert got == [1, 2, 3]


def test_create_view_and_alter_table(spark, tmp_path):
    """CREATE VIEW (column alias list, IF NOT EXISTS, DROP VIEW) and
    ALTER TABLE (RENAME TO with spec/rowtime/pk bookkeeping, SET
    options) as SQL text — reference parser ddl/SqlCreateView.java +
    ddl/SqlAlterTable.java."""
    env = _env(spark)
    src = _write_events(spark, tmp_path)
    env.sql(
        f"""
        CREATE TABLE __vddl_t (
          id BIGINT, et STRING, v DOUBLE,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'filesystem', 'path' = '{src}')
        """
    )
    env.sql("ALTER TABLE __vddl_t RENAME TO __vddl_t2")
    assert "__vddl_t" not in env._specs and "__vddl_t2" in env._specs
    assert env._pk_of("__vddl_t2") == ["id"]
    with pytest.raises(Exception):
        env.sql("SELECT * FROM __vddl_t").collect()  # old name gone

    env.sql(
        "CREATE VIEW __vddl_v (etype, total) AS "
        "SELECT et, sum(v) FROM __vddl_t2 GROUP BY et"
    )
    got = sorted(
        (r.etype, r.total) for r in env.sql("SELECT * FROM __vddl_v").collect()
    )
    assert got == [("a", 6.0), ("b", 3.0)]
    # duplicate create fails; IF NOT EXISTS is a no-op
    with pytest.raises(ValueError, match="already exists"):
        env.sql("CREATE VIEW __vddl_v AS SELECT 1")
    env.sql("CREATE VIEW IF NOT EXISTS __vddl_v AS SELECT 1")
    assert env.sql("SELECT count(*) AS c FROM __vddl_v").collect()[0].c == 2

    # SET options merges into the spec
    env.sql("ALTER TABLE __vddl_t2 SET ('custom.opt' = 'x')")
    assert env._specs["__vddl_t2"].options.get("custom.opt") == "x"

    env.sql("DROP VIEW __vddl_v")
    with pytest.raises(Exception):
        env.sql("SELECT * FROM __vddl_v").collect()
    # no longer engine-tracked -> passes through to native Spark DDL,
    # which raises ITS not-found error
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|cannot be found"):
        env.sql("DROP VIEW __vddl_v")


def test_create_table_like_ignores_ctas_predicate():
    """A CTAS whose SELECT carries a WHERE ... LIKE at paren depth 0
    must not parse as LIKE-DDL: the LIKE operand there is a column (or
    pattern literal), not a source table — the old check matched the
    identifier and either mis-executed or raised on the WITH clause."""
    from flink_efo_spark.ddl_sql import create_table_like_source

    assert create_table_like_source(
        "CREATE TABLE t AS SELECT * FROM src WHERE a LIKE b"
    ) is None
    assert create_table_like_source(
        "CREATE TABLE t AS SELECT * FROM src WHERE a LIKE 'x%'"
    ) is None
    # real LIKE-DDL still parses (incl. a column block whose computed
    # column uses AS inside the parens)
    assert create_table_like_source("CREATE TABLE t LIKE s") == "s"
    assert create_table_like_source(
        "CREATE TABLE t (v2 AS v + 1) LIKE s (INCLUDING ALL)"
    ) == "s"


def test_create_table_like_sql(spark, tmp_path):
    """SqlTableLike.java surface: defaults (INCLUDING ALL OVERWRITING
    OPTIONS), EXCLUDING toggles, INCLUDING-conflict errors."""
    env = _env(spark)
    path = _write_events(spark, tmp_path)
    env.sql(
        f"""
        CREATE TABLE __like_src (
          id BIGINT, et STRING, v DOUBLE,
          v2 AS v * 10,
          PRIMARY KEY (id) NOT ENFORCED
        ) PARTITIONED BY (et) WITH (
          'connector' = 'filesystem', 'path' = '{path}',
          'format' = 'parquet', 'scan.tag' = 'base'
        )
        """
    )

    # bare LIKE: full clone (default INCLUDING ALL OVERWRITING OPTIONS)
    env.sql("CREATE TABLE __like_a LIKE __like_src")
    a = env._specs["__like_a"]
    assert a.path == path and a.format == "parquet"
    assert a.computed_columns == {"v2": "v * 10"}
    assert a.options["primary_key"] == "id"
    assert a.options["partitioned_by"] == "et"
    assert a.options["scan.tag"] == "base"
    got = env.sql("SELECT sum(v2) AS s FROM __like_a").collect()[0].s
    assert got == 90.0

    # default OVERWRITING OPTIONS: the new WITH wins on conflicts
    env.sql(
        "CREATE TABLE __like_b WITH ('scan.tag' = 'override') "
        "LIKE __like_src"
    )
    assert env._specs["__like_b"].options["scan.tag"] == "override"

    # new computed column merges alongside inherited ones
    env.sql("CREATE TABLE __like_c (v3 AS v + 1) LIKE __like_src")
    assert env._specs["__like_c"].computed_columns == {
        "v2": "v * 10", "v3": "v + 1"
    }

    # EXCLUDING toggles drop the inherited features
    env.sql(
        "CREATE TABLE __like_d LIKE __like_src "
        "(EXCLUDING CONSTRAINTS EXCLUDING PARTITIONS EXCLUDING GENERATED)"
    )
    d = env._specs["__like_d"]
    assert not d.computed_columns
    assert "primary_key" not in d.options
    assert "partitioned_by" not in d.options

    # INCLUDING OPTIONS: same-key different-value conflicts error
    with pytest.raises(ValueError, match="OVERWRITING OPTIONS"):
        env.sql(
            "CREATE TABLE __like_e WITH ('scan.tag' = 'x') "
            "LIKE __like_src (INCLUDING OPTIONS)"
        )
    # INCLUDING GENERATED: redefining an inherited computed col errors
    with pytest.raises(ValueError, match="OVERWRITING GENERATED"):
        env.sql("CREATE TABLE __like_f (v2 AS v * 99) LIKE __like_src")
    # OVERWRITING GENERATED: the new definition wins
    env.sql(
        "CREATE TABLE __like_g (v2 AS v * 100) LIKE __like_src "
        "(OVERWRITING GENERATED)"
    )
    assert env._specs["__like_g"].computed_columns["v2"] == "v * 100"

    # EXCLUDING ALL: nothing inherited — the WITH clause must re-supply
    # the connector surface
    with pytest.raises(ValueError, match="path"):
        env.sql("CREATE TABLE __like_h LIKE __like_src (EXCLUDING ALL)")
    env.sql(
        f"CREATE TABLE __like_h WITH ('connector'='filesystem', "
        f"'path'='{path}') LIKE __like_src (EXCLUDING ALL)"
    )
    h = env._specs["__like_h"]
    assert h.watermark is None and not h.computed_columns

    # grammar guards
    with pytest.raises(ValueError, match="OVERWRITING ALL"):
        env.sql("CREATE TABLE __like_i LIKE __like_src (OVERWRITING ALL)")
    with pytest.raises(ValueError, match="OVERWRITING CONSTRAINTS"):
        env.sql(
            "CREATE TABLE __like_j LIKE __like_src (OVERWRITING CONSTRAINTS)"
        )

    # watermark inheritance + OVERWRITING WATERMARKS
    tpath = str(tmp_path / "ts.parquet")
    spark.sql(
        "SELECT id, timestamp'2024-01-01 00:00:00' + make_interval"
        "(0,0,0,0,0,0,id) AS ts FROM range(5)"
    ).write.mode("overwrite").parquet(tpath)
    env.sql(
        f"""
        CREATE TABLE __like_wm_src (
          id BIGINT, ts TIMESTAMP,
          WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem', 'path'='{tpath}')
        """
    )
    env.sql("CREATE TABLE __like_wm1 LIKE __like_wm_src")
    assert env._specs["__like_wm1"].watermark == ("ts", "5 seconds")
    with pytest.raises(ValueError, match="watermark"):
        env.sql(
            "CREATE TABLE __like_wm2 (WATERMARK FOR ts AS ts) "
            "LIKE __like_wm_src"
        )
    env.sql(
        "CREATE TABLE __like_wm2 (WATERMARK FOR ts AS ts) "
        "LIKE __like_wm_src (OVERWRITING WATERMARKS)"
    )
    assert env._specs["__like_wm2"].watermark == ("ts", "0 seconds")
    env.sql(
        "CREATE TABLE __like_wm3 LIKE __like_wm_src (EXCLUDING WATERMARKS)"
    )
    assert env._specs["__like_wm3"].watermark is None


def test_create_table_like_unknown_source_refused(spark, tmp_path):
    """A Flink-style CREATE TABLE ... WITH (...) LIKE over a source
    that is not an engine table must error, not silently drop the
    LIKE clause; plain Spark LIKE DDL (no WITH) still passes through
    to spark.sql."""
    env = _env(spark)
    path = _write_events(spark, tmp_path)
    with pytest.raises(ValueError, match="not an\\s+engine table"):
        env.sql(
            f"CREATE TABLE __like_x WITH ('connector'='filesystem', "
            f"'path'='{path}') LIKE __no_such_table"
        )


def test_create_table_like_backquoted_source(spark, tmp_path):
    """Backquoted identifiers must resolve to the engine spec instead
    of bypassing the LIKE route (and silently dropping inheritance)."""
    env = _env(spark)
    path = _write_events(spark, tmp_path)
    env.sql(
        f"""
        CREATE TABLE __like_bq_src (v2 AS v * 2) WITH (
          'connector' = 'filesystem', 'path' = '{path}'
        )
        """
    )
    env.sql("CREATE TABLE `__like_bq_t` LIKE `__like_bq_src`")
    assert env._specs["__like_bq_t"].computed_columns == {"v2": "v * 2"}
