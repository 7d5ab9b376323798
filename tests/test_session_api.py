"""EfoSession surface tests: SQL-name function registry, fluent Table
API, VALUES, UDF/UDTF registration (SURVEY §2.10/2.12/2.13).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_efo_spark.session import EfoSession
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def env(spark):
    env = EfoSession(spark)
    env.register_dir(SF_DIR)
    return env


def test_flink_sql_names_work(env):
    row = env.sql(
        """
        SELECT SPLIT_INDEX('a,b,c', ',', 1) AS si,
               SPLIT_INDEX('a,b,c', ',', 9) AS si_oob,
               IS_ALPHA('abc') AS ia, IS_ALPHA('a1') AS ia2,
               IS_DIGIT('123') AS idg, IS_DECIMAL('-3.5') AS idc,
               REGEXP('foobar', 'o+b') AS re,  -- same-name Spark builtin
               TRUNCATE(-1.239, 2) AS tr,
               TO_BASE64(CAST('hi' AS BINARY)) AS b64,
               CAST(FROM_BASE64('aGk=') AS STRING) AS unb64,
               CONVERT_TZ('2024-01-01 00:00:00', 'UTC', 'Asia/Tokyo') AS ctz,
               IS_JSON_VALUE('{"a": 1}') AS jv,
               IS_JSON_OBJECT('[1]') AS jo,
               IS_JSON_ARRAY('[1]') AS ja,
               IS_JSON_SCALAR('3.5') AS js,
               IS_NOT_JSON_VALUE('nope') AS njv,
               IS_NOT_JSON_ARRAY('{"a": 1}') AS nja
        """
    ).first()
    assert row.si == "b" and row.si_oob is None
    assert row.ia and not row.ia2 and row.idg and row.idc
    assert row.re
    assert row.tr == -1.23
    assert row.b64 == "aGk=" and row.unb64 == "hi"
    assert row.ctz == "2024-01-01 09:00:00"
    assert row.jv and not row.jo
    assert row.ja and row.js and row.njv and row.nja


def test_split_index_literal_delimiter(env):
    """SPLIT_INDEX must treat the delimiter as a LITERAL (the
    reference's splitByWholeSeparatorPreserveAllTokens), not a regex —
    '.', '|', '+' are the silent-corruption cases."""
    row = env.sql(
        """
        SELECT SPLIT_INDEX('a.b.c', '.', 0) AS dot,
               SPLIT_INDEX('a|b|c', '|', 1) AS pipe,
               SPLIT_INDEX('a+b+c', '+', 2) AS plus,
               SPLIT_INDEX('x(y)z', '(', 1) AS paren
        """
    ).first()
    assert row.dot == "a"
    assert row.pipe == "b"
    assert row.plus == "c"
    assert row.paren == "y)z"


def test_hash_code_java_semantics(env):
    """HASH_CODE = Math.abs(String.hashCode()) per
    SqlFunctionUtils.java:894 — including the Integer.MIN_VALUE
    edge where Math.abs is a no-op."""
    row = env.sql(
        """
        SELECT HASH_CODE('hello') AS h1,
               HASH_CODE('') AS h2,
               HASH_CODE('polygenelubricants') AS h3,
               HASH_CODE('a') AS h4,
               HASH_CODE('Ab') AS h5
        """
    ).first()
    assert row.h1 == 99162322  # "hello".hashCode()
    assert row.h2 == 0
    # "polygenelubricants".hashCode() == Integer.MIN_VALUE; abs keeps it
    assert row.h3 == -2147483648
    assert row.h4 == 97
    assert row.h5 == 2113  # 'A'*31 + 'b'


def test_fluent_table_api(env, ddb):
    got = (
        env.from_path("customer")
        .filter("c_acctbal > 1000")
        .group_by("c_mktsegment")
        .select("c_mktsegment", "count(*) AS n", "round(avg(c_acctbal), 4) AS b")
        .order_by("n DESC", "c_mktsegment")
        .fetch(3)
        .execute()
    )
    exp = ddb.execute(
        """
        SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 4) AS b
        FROM customer WHERE c_acctbal > 1000
        GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment LIMIT 3
        """
    ).fetchall()
    assert [(r.c_mktsegment, r.n, r.b) for r in got] == exp


def test_fluent_join_and_setops(env):
    nation = env.from_path("nation")
    region = env.from_path("region")
    joined = (
        nation.join(region, "n_regionkey = r_regionkey")
        .select("n_name", "r_name")
    )
    assert len(joined.execute()) == 25
    a = nation.select("n_regionkey")
    assert len(a.union(a).execute()) == 5  # distinct union
    assert len(a.union_all(a).execute()) == 50
    assert len(a.minus_all(a).execute()) == 0


def test_from_elements_values(env):
    t = env.from_elements([(1, "a"), (2, "b")], "id int, name string")
    assert sorted((r.id, r.name) for r in t.execute()) == [(1, "a"), (2, "b")]


def test_register_python_udf(env):
    env.register_function("py_double_it", lambda x: x * 2, "int")
    assert env.sql("SELECT py_double_it(21) AS v").first().v == 42


def test_register_udtf(env):
    from pyspark.sql.functions import udtf

    class Explode3:
        def eval(self, n: int):
            for i in range(3):
                yield (n + i,)

    env.register_table_function("explode3", udtf(Explode3, returnType="v int"))
    vals = [r.v for r in env.sql("SELECT * FROM explode3(10)").collect()]
    assert vals == [10, 11, 12]


def test_create_table_ddl_with_watermark(env, tmp_path):
    src = env.spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 2.0), (2, "2024-01-01 00:10:00", 3.0)],
        "id int, ts_str string, v double",
    )
    p = str(tmp_path / "ddl_tbl")
    src.write.mode("overwrite").parquet(p)
    env.create_table(
        "ddl_tbl", p,
        watermark=("ts", "5 minutes"),
        computed_columns={"ts": "cast(ts_str as timestamp)", "v2": "v * 2"},
    )
    # batch view has the computed columns
    rows = env.sql("SELECT id, v2 FROM ddl_tbl ORDER BY id").collect()
    assert [(r.id, r.v2) for r in rows] == [(1, 4.0), (2, 6.0)]
    # streaming scan carries the watermark
    sdf = env.stream("ddl_tbl")
    assert sdf.isStreaming
    assert "EventTimeWatermark" in sdf._jdf.queryExecution().analyzed().toString()
    assert env.describe_table("ddl_tbl").count() > 0


def test_statement_set_multi_sink(env, tmp_path):
    ss = env.create_statement_set()
    base = ss.share(
        env.spark.range(100).withColumnRenamed("id", "n")
    )
    evens = base.filter("n % 2 = 0")
    big = base.filter("n >= 90")
    p1, p2 = str(tmp_path / "evens"), str(tmp_path / "big")
    ss.add_insert(p1, evens).add_insert(p2, big).execute()
    assert env.spark.read.parquet(p1).count() == 50
    assert env.spark.read.parquet(p2).count() == 10


def test_create_table_like_and_alter(env, tmp_path):
    """CREATE TABLE LIKE clones spec (schema/options/watermark/computed
    columns); ALTER TABLE mutates options/columns and renames
    (SqlTableLike.java / SqlAlterTable.java residue)."""
    src = env.spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 2.0)], "id int, ts_str string, v double"
    )
    p1 = str(tmp_path / "base_tbl")
    src.write.mode("overwrite").parquet(p1)
    env.create_table(
        "base_tbl", p1,
        watermark=("ts", "5 minutes"),
        computed_columns={"ts": "cast(ts_str as timestamp)", "v2": "v * 2"},
    )
    # LIKE: same spec over a second path
    p2 = str(tmp_path / "like_tbl")
    env.spark.createDataFrame(
        [(9, "2024-02-01 00:00:00", 5.0)], "id int, ts_str string, v double"
    ).write.mode("overwrite").parquet(p2)
    spec = env.create_table_like("like_tbl", "base_tbl", path=p2)
    assert spec.watermark == ("ts", "5 minutes")
    [row] = env.sql("SELECT id, v2 FROM like_tbl").collect()
    assert (row.id, row.v2) == (9, 10.0)
    # EXCLUDING watermark
    spec2 = env.create_table_like(
        "like_nowm", "base_tbl", path=p2, including_watermark=False
    )
    assert spec2.watermark is None

    # ALTER: add a computed column, then rename
    env.alter_table("like_tbl", add_computed_columns={"v3": "v * 3"})
    [row] = env.sql("SELECT v3 FROM like_tbl").collect()
    assert row.v3 == 15.0
    env.alter_table("like_tbl", rename_to="like_renamed")
    assert env.sql("SELECT count(*) AS n FROM like_renamed").first().n == 1
    # dropped computed column disappears from the view
    env.alter_table("like_renamed", drop_columns=["v3"])
    assert "v3" not in env.table("like_renamed").columns


def test_show_functions_and_views(env):
    fns = {r[0].lower() for r in env.show_functions().collect()}
    # Spark builtin + engine-registered Flink residue both listed
    assert "concat" in fns
    assert "split_index" in fns and "hash_code" in fns
    views = env.show_views()
    assert "viewName" in views.columns or "namespace" in views.columns


def test_partition_ddl(env, tmp_path):
    """ADD/DROP/SHOW PARTITIONS residue (SqlAddPartitions.java /
    SqlDropPartitions.java): Hive-style k=v directories with
    partition discovery on rescan."""
    p = str(tmp_path / "part_tbl")
    env.spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id int, pt string"
    ).write.partitionBy("pt").parquet(p)
    env.create_table("part_tbl", p)
    parts = [r.partition for r in env.show_partitions("part_tbl").collect()]
    assert parts == ["pt=a", "pt=b"]
    assert env.sql("SELECT count(*) AS n FROM part_tbl").first().n == 3

    env.add_partition(
        "part_tbl", {"pt": "c"},
        env.spark.createDataFrame([(9,)], "id int"),
    )
    assert env.sql(
        "SELECT count(*) AS n FROM part_tbl WHERE pt = 'c'"
    ).first().n == 1
    env.drop_partition("part_tbl", {"pt": "a"})
    assert env.sql("SELECT count(*) AS n FROM part_tbl").first().n == 2
    parts = [r.partition for r in env.show_partitions("part_tbl").collect()]
    assert parts == ["pt=b", "pt=c"]


def test_watermark_idleness_policy(env):
    from flink_efo_spark.streaming import watermark_idleness_policy

    watermark_idleness_policy(env.spark, use_max=True)
    assert (
        env.spark.conf.get("spark.sql.streaming.multipleWatermarkPolicy")
        == "max"
    )
    watermark_idleness_policy(env.spark, use_max=False)
    assert (
        env.spark.conf.get("spark.sql.streaming.multipleWatermarkPolicy")
        == "min"
    )


# -- group windows / over windows / lateral joins (round 4) ------------


def test_table_api_tumble_window(env, spark):
    from flink_efo_spark.table import Table, Tumble

    ev = Table(env.table("events"))
    got = (
        ev.window(Tumble.over("5.minutes").on("ts").alias("w"))
        .group_by("w, event_type")
        .select(
            "event_type, w.start as ws, count(*) as cnt, "
            "round(sum(value), 2) as sv"
        )
        .to_df()
    )
    # compare against the direct DataFrame formulation
    from pyspark.sql import functions as F

    direct = (
        env.table("events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sv"))
        .select("event_type", F.col("w.start").alias("ws"), "cnt", "sv")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))


def test_table_api_slide_and_session(env):
    from flink_efo_spark.table import Session, Slide, Table

    ev = Table(env.table("events"))
    hop = (
        ev.window(Slide.over("10.minutes").every("5.minutes").on("ts").alias("w"))
        .group_by("w")
        .select("w.start as ws, count(*) as cnt")
        .to_df()
    )
    assert hop.count() > 0
    sess = (
        ev.filter("user_id = 1")
        .window(Session.with_gap("30.minutes").on("ts").alias("s"))
        .group_by("s")
        .select("s.start as ss, s.end as se, count(*) as cnt")
        .to_df()
    )
    rows = sess.collect()
    assert rows and all(r.ss <= r.se for r in rows)


def test_table_api_over_window(env):
    from flink_efo_spark.table import Over, Table

    ev = Table(env.table("events")).filter("user_id <= 3")
    got = (
        ev.over_window(
            Over.partition_by("user_id").order_by("ts")
            .preceding("unbounded_row").alias("ow")
        )
        .select(
            "user_id, ts, sum(value) over ow as running, "
            "count(*) over ow as n"
        )
        .to_df()
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    direct = ev.to_df().select(
        "user_id", "ts",
        F.sum("value").over(w).alias("running"),
        F.count("*").over(w).alias("n"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))


def test_table_api_rows_preceding_frame(env):
    from flink_efo_spark.table import Over, Table

    ev = Table(env.table("events")).filter("user_id = 2")
    got = (
        ev.over_window(
            Over.partition_by("user_id").order_by("ts")
            .preceding("2.rows").following("current_row").alias("ow")
        )
        .select("ts, avg(value) over ow as ma3")
        .to_df()
    )
    assert got.count() == ev.to_df().count()


def test_table_api_join_lateral(env):
    from flink_efo_spark.table import Table

    docs = Table(env.table("documents")).select(
        "doc_id", "split(text, ' ') as words"
    )
    inner = docs.join_lateral("explode(words) as t(word)").to_df()
    assert "word" in inner.columns
    n_inner = inner.count()
    assert n_inner > 0
    # left_outer keeps rows whose generator yields nothing
    outer = (
        Table(env.table("documents"))
        .select("doc_id", "filter(split(text, ' '), x -> false) as words")
        .left_outer_join_lateral("explode(words) as t(word)")
        .to_df()
    )
    assert outer.count() == env.table("documents").count()
    assert outer.filter("word is not null").count() == 0


def test_flink_type_mapping():
    """LogicalType → Spark DataType mapping (SURVEY §1.6)."""
    from pyspark.sql import types as T

    from flink_efo_spark.types import flink_type_to_spark as f2s

    assert f2s("BIGINT") == T.LongType()
    assert f2s("DECIMAL(10,2)") == T.DecimalType(10, 2)
    assert f2s("VARCHAR(5)") == T.StringType()
    assert f2s("TIME") == T.IntegerType()  # millis-of-day convention
    assert f2s("ARRAY<DOUBLE>") == T.ArrayType(T.DoubleType())
    assert f2s("MULTISET<STRING>") == T.MapType(T.StringType(), T.IntegerType())
    assert f2s("MAP<STRING, BIGINT>") == T.MapType(T.StringType(), T.LongType())
    row = f2s("ROW<a INT, b STRING>")
    assert [fl.name for fl in row.fields] == ["a", "b"]
    import pytest

    with pytest.raises(ValueError):
        f2s("GEOMETRY")


def test_time_and_char_enforcement(spark):
    """TIME millis-of-day + CHAR/VARCHAR length contracts."""
    from flink_efo_spark.types import (
        enforce_char,
        enforce_varchar,
        time_millis_to_string,
        time_of_day_millis,
    )

    df = spark.createDataFrame(
        [("2024-01-02 03:04:05.678", "ab"), ("2024-01-02 23:59:59.999", "abcdef")],
        "ts string, s string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = df.select(
        time_of_day_millis("ts").alias("tm"),
        time_millis_to_string(time_of_day_millis("ts")).alias("tstr"),
    ).collect()
    assert out[0].tm == 3 * 3600000 + 4 * 60000 + 5678
    assert out[0].tstr == "03:04:05.678"
    assert out[1].tstr == "23:59:59.999"

    padded = enforce_char(df, "s", 4).select("s").collect()
    assert [r.s for r in padded] == ["ab  ", "abcd"]
    trunc = enforce_varchar(df, "s", 3).select("s").collect()
    assert [r.s for r in trunc] == ["ab", "abc"]
    import pytest

    with pytest.raises(Exception, match="overflow"):
        enforce_varchar(df, "s", 3, error=True).collect()


def test_hive_catalog_round_trip(tmp_path):
    """Hive catalog (reference flink-connector-hive HiveCatalog):
    persistent saveAsTable through the bundled Hive metastore, read
    back via spark.table + catalog listing. Hive support must be
    chosen at JVM startup, so this runs in a subprocess instead of
    the shared session fixture."""
    import subprocess
    import sys

    script = f"""
import os
os.environ["SPARK_GRAFT_CPUS"] = "2"
from flink_efo_spark.session import get_spark
spark = get_spark("hive-test", hive=True, warehouse_dir={str(tmp_path)!r})
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
spark.sql("CREATE DATABASE IF NOT EXISTS efo_db")
spark.range(10).selectExpr("id", "id * 3 AS v").write.mode(
    "overwrite"
).saveAsTable("efo_db.t_hive")
back = spark.table("efo_db.t_hive")
assert back.count() == 10
assert back.agg({{"v": "sum"}}).collect()[0][0] == 135
assert any(t.name == "t_hive" for t in spark.catalog.listTables("efo_db"))
print("HIVE_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "HIVE_OK" in out.stdout, out.stderr[-2000:]


def test_sha_family_sql_names(spark):
    """SHA224/256/384/512 (FlinkSqlOperatorTable) — known digests for
    'abc' (FIPS 180-2 test vectors) via the registered SQL names."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(spark)
    row = env.sql(
        "SELECT SHA224('abc') AS a, SHA256('abc') AS b, "
        "length(SHA384('abc')) AS c, length(SHA512('abc')) AS d"
    ).collect()[0]
    assert row.a == "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7"
    assert row.b == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert (row.c, row.d) == (96, 128)


def test_table_surface_methods(spark):
    """PyFlink Table surface completions: alias (positional rename),
    add_or_replace_columns, get_schema/to_pandas exits."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.table import Table

    t = Table(load_table(spark, SF_DIR, "region"))
    r = t.alias("rk", "rn")
    assert r.to_df().columns == ["rk", "rn"]
    r2 = t.add_or_replace_columns(r_name="upper(r_name)")
    assert r2.to_df().columns == t.to_df().columns
    assert r2.to_df().selectExpr("max(r_name = upper(r_name))").collect()[0][0]
    assert len(t.get_schema().fields) == 2
    assert len(t.to_pandas()) == t.to_df().count()


def test_temporal_table_function_join(spark, ddb):
    """createTemporalTableFunction analog: joining the versioned
    rates table attaches each order's latest rate version — checked
    against a DuckDB ASOF JOIN on the same frames."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.table import Table
    import pandas as pd

    ev = load_table(spark, SF_DIR, "events")
    # versions: per-user 'signup' events are the versioned build side
    rates = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("value").alias("rate")
    )
    probes = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    fn = Table(rates).create_temporal_table_function("ts", "user_id")
    out = fn.join(Table(probes), "ts", tiebreak="rate").to_df()
    got = {
        (r.event_id): (None if r.rate is None else round(r.rate, 6))
        for r in out.collect()
    }
    duck = ddb.execute(
        """
        SELECT p.event_id, r.value AS rate
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click') p
        ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value
                        FROM events WHERE event_type = 'signup'
                        GROUP BY user_id, ts) r
          ON p.user_id = r.user_id AND p.ts >= r.ts
        """
    ).fetchall()
    want = {e: (None if v is None else round(v, 6)) for e, v in duck}
    assert got == want


def test_week_and_localtime_fns(spark):
    """WEEK / LOCALTIME residue registrations: ISO week values and a
    millis-of-day LOCALTIME consistent with the engine TIME
    convention (types.py)."""
    from flink_efo_spark.functions.registry import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT WEEK(DATE '1996-01-04') AS w1, WEEK(DATE '1996-12-31') AS w2, "
        "LOCALTIME() AS lt"
    ).collect()[0]
    assert r.w1 == 1 and r.w2 == 1  # ISO: Dec 31 1996 is week 1 of 1997
    assert 0 <= r.lt < 86_400_000
    # bare niladic keyword, Flink SQL form (round-4 ADVICE): the
    # dialect shim rewrites it to the registered zero-arg call
    from flink_efo_spark.dialect import translate

    assert translate("SELECT LOCALTIME, LOCALTIMESTAMP") == (
        "SELECT LOCALTIME(), LOCALTIMESTAMP"
    )
    r2 = spark.sql(translate("SELECT LOCALTIME AS lt")).collect()[0]
    assert 0 <= r2.lt < 86_400_000
