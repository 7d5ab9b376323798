"""Query corpus: one named query per implemented operator family.

This is the engine's demonstration + correctness surface. Every entry
has a Spark implementation (``QUERIES[name]`` — a callable
``(spark, sf_dir) -> DataFrame``) and, where SQL-expressible, a
DuckDB oracle (``ORACLES[name]``) producing identical column names
and values. The driver hash-compares them at sf0.01
(CORRECTNESS_r{N}.json); ``bench.py`` times a headline subset at
sf0.1.

Conventions for cross-engine hash stability:

* every computed column is aliased identically on both sides;
* double aggregates are ``round(x, 2..6)`` on both sides;
* timestamps that flow into results are emitted as epoch **micros**
  (bigint) — no tz/representation ambiguity (`unix_micros` ↔
  `epoch_us`);
* ties in top-n / limit queries are always broken by a unique key.

Reference parity cites (files under /root/reference): each query
names the exec node / ITCase family it mirrors, e.g. hash_agg ↔
BatchExecHashAggregate.scala + AggregateITCase.scala.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_efo_spark.catalog import load_table
from flink_efo_spark.operators.dedup import (
    dedup_exact,
    dedup_keep_first,
    dedup_keep_last,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from flink_efo_spark.operators.joins import asof_join, interval_join
from flink_efo_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from flink_efo_spark.operators.text import (
    _EMAIL_RE,
    _IP_RE,
    _PHONE_RE,
    bm25_scores,
    doc_fingerprint,
    lang_id,
    ngram_contamination,
    normalize_text,
    pii_scrub,
    quality_stats,
    token_stats,
)
from flink_efo_spark.operators.topn import top_n
from flink_efo_spark.functions import flink_fns as ff


class _T:
    """Lazy per-query table loader (nanos-normalizing, see catalog)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _us(col) -> Column:
    """Epoch micros of a timestamp column regardless of NTZ/LTZ flavor
    (session tz is UTC, so NTZ→LTZ cast is identity and this matches
    DuckDB's ``epoch_us`` on naive timestamps)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.unix_micros(c.cast("timestamp_ltz"))


def _money(col) -> Column:
    """round(x, 2) with deterministic HALF_UP tie behavior identical
    across engines: floor(x*100 + 0.5)/100 on IEEE doubles (positive
    domain). Spark's round() and DuckDB's round() disagree on ties."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.floor(c * 100 + F.lit(0.5)) / 100


_MONEY_SQL = "floor(({x}) * 100 + 0.5) / 100"


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from flink_efo_spark.catalog import ensure_session_confs

            ensure_session_confs(spark)
            return fn(_T(spark, sf_dir))

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# §2.2 Calc — fused project + filter
# (StreamExecCalc.scala:39 / BatchExecCalc.scala:38; CalcITCase)
# ---------------------------------------------------------------------------


@_q(
    "calc",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue,
           upper(l_returnflag) AS flag_u
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 10
    """,
)
def q_calc(t: _T) -> DataFrame:
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 10)
        ).select(
            "l_orderkey",
            "l_linenumber",
            _money(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.upper("l_returnflag").alias("flag_u"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 hash aggregation — TPC-H Q1 pricing summary
# (BatchExecHashAggregate.scala:43; AggregateITCase)
# ---------------------------------------------------------------------------


@_q(
    "hash_agg",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_hash_agg(t: _T) -> DataFrame:
    return (
        t.lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 inner join + agg + top-n — TPC-H Q3 shape (flagship)
# (BatchExecHashJoin.scala:53; JoinITCase)
# ---------------------------------------------------------------------------


@_q(
    "join_inner_agg",
    """
    SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue,
           epoch_us(o.o_orderdate) AS orderdate_us
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def q_join_inner_agg(t: _T) -> DataFrame:
    return (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders.where(F.col("o_orderstatus") == "O"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey", "revenue", _us("o_orderdate").alias("orderdate_us")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.3 left outer join — TPC-H Q13 customer order-count distribution
# ---------------------------------------------------------------------------


@_q(
    "join_left_outer",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_join_left_outer(t: _T) -> DataFrame:
    per_cust = (
        t.customer.join(
            t.orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# §2.3 semi / anti joins
# (StreamingSemiAntiJoinOperator.java:36; SemiAntiJoinStreamITCase)
# ---------------------------------------------------------------------------


@_q(
    "join_semi",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R'
                    AND l.l_quantity > 45)
    """,
)
def q_join_semi(t: _T) -> DataFrame:
    flagged = t.lineitem.where(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45)
    )
    return (
        t.supplier.join(
            flagged, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        ).select("s_suppkey", "s_name")
    )


@_q(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(t: _T) -> DataFrame:
    return (
        t.customer.join(
            t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        ).select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# §2.3 broadcast dimension join (BatchExecHashJoinRule.canBroadcast)
# ---------------------------------------------------------------------------


@_q(
    "broadcast_dim_join",
    """
    SELECT r.r_name, count(*) AS n_customers,
           round(avg(c.c_acctbal), 4) AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_broadcast_dim_join(t: _T) -> DataFrame:
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 GROUPING SETS / ROLLUP / CUBE (DecomposeGroupingSetsRule)
# ---------------------------------------------------------------------------


@_q(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup_agg(t: _T) -> DataFrame:
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
            F.grouping_id().cast("int").alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("cnt"),
        )
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")


@_q(
    "cube_agg",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus, o_orderpriority) AS INT) AS gid,
           count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_agg(t: _T) -> DataFrame:
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority").agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    ).select("o_orderstatus", "o_orderpriority", "gid", "cnt", "sum_price")


# ---------------------------------------------------------------------------
# §2.6 batch OVER windows — ROWS frame, rank, lag
# (BatchExecOverAggregate.scala:73; OverWindowITCase)
# ---------------------------------------------------------------------------


@_q(
    "over_window",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           CAST(rank() OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             AS INT) AS price_rank,
           round(lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
             AS prev_price
    FROM orders WHERE o_custkey < 100
    """,
)
def q_over_window(t: _T) -> DataFrame:
    time_w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lag_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    rank_w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t.orders.where(F.col("o_custkey") < 100).select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(time_w), 2).alias("running_total"),
        F.rank().over(rank_w).cast("int").alias("price_rank"),
        F.round(F.lag("o_totalprice").over(lag_w), 2).alias("prev_price"),
    )


# ---------------------------------------------------------------------------
# §2.7 Top-N per key (StreamExecRank.scala:52; RankITCase)
# ---------------------------------------------------------------------------


@_q(
    "top_n",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_top_n(t: _T) -> DataFrame:
    return top_n(
        t.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    ).withColumn("rn", F.col("rn").cast("int"))


# ---------------------------------------------------------------------------
# §2.7 dedup keep-first / keep-last
# (StreamExecDeduplicate.scala:52, DeduplicateKeep{First,Last}RowFunction)
# ---------------------------------------------------------------------------


@_q(
    "dedup_keep_first",
    """
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_dedup_keep_first(t: _T) -> DataFrame:
    return dedup_keep_first(
        t.events.select("user_id", "event_type", "event_id", "ts", "value"),
        ["user_id", "event_type"],
        [F.col("ts"), F.col("event_id")],
    ).select(
        "user_id", "event_type", "event_id",
        F.unix_micros("ts").alias("ts_us"), "value",
    )


@_q(
    "dedup_keep_last",
    """
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_dedup_keep_last(t: _T) -> DataFrame:
    return dedup_keep_last(
        t.events.select("user_id", "event_type", "event_id", "ts", "value"),
        ["user_id", "event_type"],
        [F.col("ts"), F.col("event_id")],
    ).select(
        "user_id", "event_type", "event_id",
        F.unix_micros("ts").alias("ts_us"), "value",
    )


# ---------------------------------------------------------------------------
# §2.3 interval join (TimeBoundedStreamJoin.java:52; IntervalJoinOperator)
# ---------------------------------------------------------------------------


@_q(
    "interval_join",
    """
    SELECT a.event_id AS click_id, b.event_id AS error_id,
           a.user_id AS user_id,
           epoch_us(a.ts) AS click_ts_us, epoch_us(b.ts) AS error_ts_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'error'
    """,
)
def q_interval_join(t: _T) -> DataFrame:
    ev = t.events
    clicks = ev.where(F.col("event_type") == "click")
    errors = ev.where(F.col("event_type") == "error")
    joined = interval_join(
        clicks, errors, "user_id", "ts", "ts",
        "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES",
    )
    return joined.select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
        F.col("l.user_id").alias("user_id"),
        F.unix_micros("l.ts").alias("click_ts_us"),
        F.unix_micros("r.ts").alias("error_ts_us"),
    )


# ---------------------------------------------------------------------------
# §2.3 temporal / as-of join (TemporalRowTimeJoinOperator.java:72)
# ---------------------------------------------------------------------------


@_q(
    "asof_join",
    """
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           b.bts_us AS signup_ts_us, b.bval AS signup_value
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    LEFT JOIN LATERAL (
      SELECT epoch_us(b.ts) AS bts_us, b.value AS bval
      FROM events b
      WHERE b.event_type = 'signup' AND b.user_id = p.user_id
        AND b.ts <= p.ts
      ORDER BY b.ts DESC, b.event_id DESC LIMIT 1
    ) b ON true
    """,
)
def q_asof_join(t: _T) -> DataFrame:
    ev = t.events
    probe = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    build = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        probe,
        build.withColumnRenamed("event_id", "b_event_id"),
        "user_id",
        "ts",
        "ts",
        build_cols=["value"],
        tiebreak="b_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("ts_asof").alias("signup_ts_us"),
        F.col("value").alias("signup_value"),
    )


# ---------------------------------------------------------------------------
# §2.9 set operations (ReplaceIntersectWithSemiJoinRule etc.)
# ---------------------------------------------------------------------------


@_q(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_intersect(t: _T) -> DataFrame:
    o = t.orders
    return (
        o.where(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .intersect(o.where(F.col("o_orderstatus") == "F").select("o_custkey"))
    )


@_q(
    "set_except_all",
    """
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def q_set_except_all(t: _T) -> DataFrame:
    l = t.lineitem
    return (
        l.where(F.col("l_returnflag") == "R")
        .select("l_suppkey")
        .exceptAll(l.where(F.col("l_returnflag") == "A").select("l_suppkey"))
    )


# ---------------------------------------------------------------------------
# §2.8 sort / limit / offset (BatchExecSortLimit.scala:52; SortITCase)
# ---------------------------------------------------------------------------


@_q(
    "sort_limit_offset",
    """
    SELECT o_orderkey, o_totalprice, epoch_us(o_orderdate) AS orderdate_us
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15 OFFSET 5
    """,
)
def q_sort_limit_offset(t: _T) -> DataFrame:
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(
            "o_orderkey",
            "o_totalprice",
            _us("o_orderdate").alias("orderdate_us"),
        )
        .offset(5)
        .limit(15)
    )


# ---------------------------------------------------------------------------
# §2.2 UNNEST / Correlate (LogicalUnnestRule.scala; UnnestITCase)
# ---------------------------------------------------------------------------


@_q(
    "unnest_tokens",
    """
    SELECT doc_id, CAST(pos - 1 AS INT) AS pos, tok
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents WHERE doc_id < 20)
    """,
)
def q_unnest_tokens(t: _T) -> DataFrame:
    return (
        t.documents.where(F.col("doc_id") < 20)
        .select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .withColumn("pos", F.col("pos").cast("int"))
        .select("doc_id", "pos", "tok")
    )


# ---------------------------------------------------------------------------
# §2.10 scalar function surface (FlinkSqlOperatorTable.java:114-830)
# one row-set exercising ~18 functions incl. the Flink-only shims
# ---------------------------------------------------------------------------


@_q(
    "scalar_fns",
    """
    SELECT doc_id,
           string_split(source, 'c')[2] AS split_idx,
           source ~ '^[a-zA-Z]+$' AS is_alpha_src,
           source ~ '^[0-9]+$' AS is_digit_src,
           lpad(source, 8, '*') AS lp, rpad(source, 8, '#') AS rp,
           reverse(source) AS rev,
           upper(lang) AS lang_u, lower(source) AS src_l,
           substr(text, 1, 10) AS prefix10,
           left(text, 4) AS l4, right(source, 2) AS r2,
           repeat(lang, 3) AS lang3,
           replace(source, 'src', 'S') AS repl,
           CAST(strpos(text, 'table') AS INT) AS pos_table,
           regexp_extract(source, '([0-9]+)', 1) AS src_num,
           md5(source) AS src_md5,
           length(text) AS len_text,
           concat_ws('|', lang, source) AS cw,
           trim(' ' || source || ' ') AS trimmed
    FROM documents WHERE doc_id < 50
    """,
)
def q_scalar_fns(t: _T) -> DataFrame:
    d = t.documents.where(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        ff.split_index("source", "c", 1).alias("split_idx"),
        ff.is_alpha("source").alias("is_alpha_src"),
        ff.is_digit("source").alias("is_digit_src"),
        F.lpad("source", 8, "*").alias("lp"),
        F.rpad("source", 8, "#").alias("rp"),
        F.reverse("source").alias("rev"),
        F.upper("lang").alias("lang_u"),
        F.lower("source").alias("src_l"),
        F.substring("text", 1, 10).alias("prefix10"),
        F.expr("left(text, 4)").alias("l4"),
        F.expr("right(source, 2)").alias("r2"),
        F.repeat("lang", 3).alias("lang3"),
        F.expr("replace(source, 'src', 'S')").alias("repl"),
        F.locate("table", F.col("text").cast("string")).cast("int").alias("pos_table"),
        F.regexp_extract("source", "([0-9]+)", 1).alias("src_num"),
        F.md5("source").alias("src_md5"),
        F.length("text").cast("bigint").alias("len_text"),
        F.concat_ws("|", "lang", "source").alias("cw"),
        F.trim(F.concat(F.lit(" "), F.col("source"), F.lit(" "))).alias("trimmed"),
    )


# ---------------------------------------------------------------------------
# §2.4 agg function set: LISTAGG / FIRST_VALUE / LAST_VALUE analogs
# (AggFunctionFactory.scala:64-135)
# ---------------------------------------------------------------------------


@_q(
    "agg_fn_set",
    """
    SELECT n.n_name,
           string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment)
             AS segments,
           min_by(c.c_name, c.c_custkey) AS first_cust,
           max_by(c.c_name, c.c_custkey) AS last_cust,
           count(DISTINCT c.c_mktsegment) AS n_segments,
           round(stddev_samp(c.c_acctbal), 4) AS bal_stddev,
           round(var_pop(c.c_acctbal), 4) AS bal_varpop
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_agg_fn_set(t: _T) -> DataFrame:
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            ff.listagg("c_mktsegment", ",", distinct=True).alias("segments"),
            F.min_by("c_name", "c_custkey").alias("first_cust"),
            F.max_by("c_name", "c_custkey").alias("last_cust"),
            F.count_distinct("c_mktsegment").alias("n_segments"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("bal_stddev"),
            F.round(F.var_pop("c_acctbal"), 4).alias("bal_varpop"),
        )
    )


# ---------------------------------------------------------------------------
# §2.5 group windows: TUMBLE / HOP / SESSION over bounded events
# (WindowOperator.java:98; WindowAggregateITCase)
# ---------------------------------------------------------------------------


@_q(
    "window_tumble",
    """
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000 AS w_start_us,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_window_tumble(t: _T) -> DataFrame:
    return (
        t.events.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros("w.start").alias("w_start_us"),
            "event_type", "cnt", "sum_value",
        )
    )


@_q(
    "window_hop",
    """
    SELECT w_start * 1000000 AS w_start_us,
           count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM (
      SELECT unnest([CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - 300,
                     CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)]) AS w_start,
             value
      FROM events)
    GROUP BY w_start
    """,
)
def q_window_hop(t: _T) -> DataFrame:
    return (
        t.events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.unix_micros("w.start").alias("w_start_us"), "cnt", "sum_value")
    )


@_q(
    "window_session",
    """
    SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 1800000000 AS session_end_us,
           count(*) AS n_events
    FROM (
      SELECT user_id, ts,
             sum(CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
        FROM events))
    GROUP BY user_id, session_id
    """,
)
def q_window_session(t: _T) -> DataFrame:
    return (
        t.events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


@_q(
    "window_dedup",
    """
    SELECT w_start_us, user_id, event_id, round(value, 2) AS value
    FROM (
      SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000
               AS w_start_us,
             user_id, event_id, value,
             row_number() OVER (
               PARTITION BY CAST(floor(epoch(ts) / 300) AS BIGINT), user_id
               ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_window_dedup(t: _T) -> DataFrame:
    """Window deduplication (upstream Flink's
    StreamExecWindowDeduplicate, the windowing-TVF family member next
    to window join/rank; the snapshot has only the global
    Deduplicate): keep the FIRST row per (tumble window, key). One
    window function over the window-start expression — the same
    WindowGroupLimit-able shape as top-n."""
    ws = (F.floor(_us("ts") / F.lit(300_000_000)) * F.lit(300_000_000)).cast(
        "bigint"
    )
    w = Window.partitionBy(ws, F.col("user_id")).orderBy("ts", "event_id")
    return (
        t.events.withColumn("__ws", ws)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__ws").alias("w_start_us"),
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
        )
    )


@_q(
    "window_cumulate",
    """
    SELECT w0 * 1000000 AS w_start_us,
           (w0 + k * 900) * 1000000 AS w_end_us,
           event_type, count(*) AS cnt,
           round(sum(value), 2) AS sum_value
    FROM (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w0,
             unnest(generate_series(
               CAST(floor((epoch(ts) - floor(epoch(ts) / 3600) * 3600) / 900)
                    AS BIGINT) + 1, 4)) AS k,
             event_type, value
      FROM events)
    GROUP BY 1, 2, 3
    """,
)
def q_window_cumulate(t: _T) -> DataFrame:
    """CUMULATE windows (FLIP-145 windowing TVF of public upstream
    Flink >= 1.13 — the reference snapshot predates it): running
    per-hour totals refreshed every 15 minutes. Runs the SLICED
    two-phase plan (streaming.py cumulate_slices +
    compose_cumulate_slices): tumble-slice partials, then a per-slice
    expand + merge — input rows shuffle once into slices; only slice
    partials fan out. The oracle expands per row (the direct
    definition), proving the slice decomposition exact."""
    from flink_efo_spark.streaming import (
        compose_cumulate_slices,
        cumulate_slices,
    )

    sl = cumulate_slices(
        t.events,
        "ts",
        "15 minutes",
        ["event_type"],
        F.count("*").alias("pcnt"),
        F.sum("value").alias("psum"),
    )
    out = compose_cumulate_slices(
        sl,
        "15 minutes",
        "1 hour",
        ["event_type"],
        F.sum("pcnt").alias("cnt"),
        F.round(F.sum("psum"), 2).alias("sum_value"),
    )
    return out.select(
        F.unix_micros("w_start").alias("w_start_us"),
        F.unix_micros("w_end").alias("w_end_us"),
        "event_type",
        "cnt",
        "sum_value",
    )


@_q(
    "stream_cumulate",
    """
    WITH wm AS (SELECT epoch(max(ts)) - 600 AS w FROM events),
    sl AS (
      SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS s_start,
             event_type, count(*) AS pcnt, sum(value) AS psum
      FROM events GROUP BY 1, 2
      HAVING (floor(epoch(any_value(ts)) / 900) * 900 + 900)
               <= (SELECT w FROM wm))
    SELECT CAST(floor(s_start / 3600) * 3600 AS BIGINT) * 1000000
             AS w_start_us,
           (CAST(floor(s_start / 3600) * 3600 AS BIGINT) + k * 900) * 1000000
             AS w_end_us,
           event_type, CAST(sum(pcnt) AS BIGINT) AS cnt,
           round(sum(psum), 2) AS sum_value
    FROM (
      SELECT *, unnest(generate_series(
        CAST(floor((s_start - floor(s_start / 3600) * 3600) / 900)
             AS BIGINT) + 1, 4)) AS k
      FROM sl)
    GROUP BY 1, 2, 3
    """,
)
def q_stream_cumulate(t: _T) -> DataFrame:
    """Streaming CUMULATE: phase 1 is a watermarked tumble-slice agg
    (append mode — only slices the watermark finalized emit, the
    reference's slice state); phase 2 is the STATELESS slice→window
    expand+merge over the emitted slices. State is one partial row
    per (slice, key) regardless of how many cumulate windows the
    slice feeds — the reference cumulate's shared-slice-state design
    re-expressed on Structured Streaming."""
    from flink_efo_spark.streaming import (
        compose_cumulate_slices,
        cumulate_slices,
        run_stream_to_table,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes"))
    sl = cumulate_slices(
        ev,
        "ts",
        "15 minutes",
        ["event_type"],
        F.count("*").alias("pcnt"),
        F.sum("value").alias("psum"),
    )
    slices = run_stream_to_table(sl)
    out = compose_cumulate_slices(
        slices,
        "15 minutes",
        "1 hour",
        ["event_type"],
        F.sum("pcnt").alias("cnt"),
        F.round(F.sum("psum"), 2).alias("sum_value"),
    )
    return out.select(
        F.unix_micros("w_start").alias("w_start_us"),
        F.unix_micros("w_end").alias("w_end_us"),
        "event_type",
        "cnt",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# JSON props extraction (event props column)
# ---------------------------------------------------------------------------


@_q(
    "json_extract",
    """
    SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_json_extract(t: _T) -> DataFrame:
    return (
        t.events.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
    )


# ---------------------------------------------------------------------------
# north star: exact dedup / minhash / ngram jaccard / simhash
# ---------------------------------------------------------------------------


@_q(
    "dedup_exact",
    """
    SELECT doc_id, fingerprint, group_size
    FROM (
      SELECT doc_id, fingerprint,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY fingerprint) AS group_size
      FROM (SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                     AS fingerprint
            FROM documents))
    WHERE rn = 1
    """,
)
def q_dedup_exact(t: _T) -> DataFrame:
    return dedup_exact(t.documents, "doc_id", "text").select(
        "doc_id", "fingerprint", "group_size"
    )


_SHINGLE_CTE = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
               ELSE [] END) AS shingles
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
            FROM documents)
    )
"""


@_q(
    "minhash_pairs",
    _SHINGLE_CTE
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
      AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.6
    """,
)
def q_minhash_pairs(t: _T) -> DataFrame:
    return minhash_near_duplicates(
        t.documents, "doc_id", "text",
        threshold=0.6, num_perm=12, bands=12, shingle_size=3,
    )


@_q(
    "ngram_jaccard",
    _SHINGLE_CTE.replace("FROM documents)", "FROM documents)")
    + """
    , shs AS (
      SELECT s.doc_id, d.source, s.shingles
      FROM sh s JOIN documents d ON s.doc_id = d.doc_id
      WHERE len(s.shingles) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
    FROM shs a JOIN shs b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.3
    """,
)
def q_ngram_jaccard(t: _T) -> DataFrame:
    return ngram_jaccard_pairs(
        t.documents, "doc_id", "text", block_by="source",
        threshold=0.3, shingle_size=3,
    ).select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# north star: similarity search over embeddings
# ---------------------------------------------------------------------------


@_q(
    "cosine_topk",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
      FROM embeddings)
    SELECT vec_id, neighbor_id, round(score, 6) AS score, CAST(rank AS INT) AS rank
    FROM (
      SELECT q.vec_id, c.vec_id AS neighbor_id,
             list_dot_product(q.e, c.e) / (q.n * c.n) AS score,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_dot_product(q.e, c.e) / (q.n * c.n)
                                  DESC, c.vec_id) AS rank
      FROM (SELECT * FROM v WHERE vec_id < 10) q
      JOIN v c ON c.vec_id != q.vec_id)
    WHERE rank <= 5
    """,
)
def q_cosine_topk(t: _T) -> DataFrame:
    emb = t.embeddings
    out = cosine_topk(
        emb.where(F.col("vec_id") < 10), emb, "vec_id", "vec_id",
        vec_col="embedding", k=5,
    )
    return out.select(
        "vec_id", "neighbor_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def _lsh_planes_values(dim: int, num_planes: int, seed: int) -> str:
    """The LSH hyperplanes as DuckDB VALUES rows. The planes are
    deterministic seeded literals (similarity._hyperplanes), so the
    ENTIRE approximate algorithm — signatures, banding, candidate
    generation, exact re-score — is reproducible in the oracle: the
    'approximate' query is exactly hash-checkable."""
    from flink_efo_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, num_planes, seed)
    return ",\n".join(
        f"({j}, [{', '.join(repr(x) for x in p)}])"
        for j, p in enumerate(planes)
    )


_LSH_ORACLE = f"""
    WITH planes(pid, pv) AS (VALUES {_lsh_planes_values(64, 32, 42)}),
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
      FROM embeddings),
    sig AS (
      SELECT v.vec_id,
             list(CASE WHEN list_dot_product(v.e, p.pv) >= 0
                       THEN 1 ELSE 0 END ORDER BY p.pid) AS bits
      FROM v, planes p GROUP BY v.vec_id),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
      FROM sig a JOIN sig b ON a.vec_id != b.vec_id AND (
        list_slice(a.bits, 1, 8) = list_slice(b.bits, 1, 8) OR
        list_slice(a.bits, 9, 16) = list_slice(b.bits, 9, 16) OR
        list_slice(a.bits, 17, 24) = list_slice(b.bits, 17, 24) OR
        list_slice(a.bits, 25, 32) = list_slice(b.bits, 25, 32))),
    scored AS (
      SELECT c.vec_id, c.neighbor_id,
             list_dot_product(q.e, t.e) / (q.n * t.n) AS score
      FROM cand c
      JOIN v q ON q.vec_id = c.vec_id
      JOIN v t ON t.vec_id = c.neighbor_id)
    SELECT vec_id, neighbor_id, round(score, 6) AS score,
           CAST(rank AS INT) AS rank
    FROM (SELECT vec_id, neighbor_id, score,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY score DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """


@_q("lsh_cosine_topk", _LSH_ORACLE)
def q_lsh_cosine_topk(t: _T) -> DataFrame:
    """ANN via random-hyperplane LSH — EXACTLY oracle-checked: the
    hyperplanes are seeded literals, so DuckDB replays the full
    signature→band→candidate→re-score pipeline and the row sets must
    match bit-for-bit (round-2 VERDICT item 3: no no_oracle rows)."""
    out = lsh_cosine_topk(t.embeddings, "vec_id", "embedding", dim=64, k=5)
    return out.select(
        "vec_id", "neighbor_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


_IVF_ORACLE = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
      FROM embeddings),
    cents AS (
      SELECT (row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)) - 1 AS cid,
             e AS ce, n AS cn
      FROM v
      QUALIFY row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
    assign AS (
      SELECT vec_id AS neighbor_id, cid AS cell, e, n FROM (
        SELECT v.vec_id, c.cid, v.e, v.n,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.e, c.ce) / (v.n * c.cn) DESC,
                          c.cid) AS rn
        FROM v CROSS JOIN cents c) WHERE rn = 1),
    probe AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT q.vec_id, c.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.e, c.ce) / (q.n * c.cn) DESC,
                          c.cid) AS rn
        FROM (SELECT * FROM v WHERE vec_id < 10) q CROSS JOIN cents c)
      WHERE rn <= 4),
    scored AS (
      SELECT p.vec_id, a.neighbor_id,
             list_dot_product(q.e, a.e) / (q.n * a.n) AS score
      FROM probe p
      JOIN assign a ON a.cell = p.cell AND a.neighbor_id != p.vec_id
      JOIN v q ON q.vec_id = p.vec_id)
    SELECT vec_id, neighbor_id, round(score, 6) AS score,
           CAST(rank AS INT) AS rank
    FROM (SELECT vec_id, neighbor_id, score,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY score DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """


@_q("ivf_cosine_topk", _IVF_ORACLE)
def q_ivf_cosine_topk(t: _T) -> DataFrame:
    """IVF ANN (the second approximate path next to LSH) — EXACTLY
    oracle-checked: centroids are a deterministic md5-ordered sample,
    so DuckDB replays centroid selection, cell assignment, nprobe
    probing, and exact re-scoring; the row sets must match
    bit-for-bit."""
    from flink_efo_spark.operators.similarity import ivf_cosine_topk

    emb = t.embeddings
    out = ivf_cosine_topk(
        emb.where(F.col("vec_id") < 10), emb, "vec_id", "vec_id",
        vec_col="embedding", k=5, n_cells=16, nprobe=4,
    )
    return out.select(
        "vec_id", "neighbor_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


@_q("ivf_index_topk", _IVF_ORACLE)
def q_ivf_index_topk(t: _T) -> DataFrame:
    """Persisted IVF index (FAISS IndexIVF layout as a
    partitionBy("cell") parquet table): build once, then query with
    STATIC partition pruning — the probed cells become an IN
    predicate on the partition column and only those files scan.
    Same centroid/tie contract as ivf_cosine_topk, so the identical
    oracle hash-checks the whole build-write-prune-query path."""
    import tempfile

    from flink_efo_spark.operators.similarity import (
        ivf_build_index,
        ivf_query_index,
    )

    emb = t.embeddings
    idx_dir = tempfile.mkdtemp(prefix="efo-ivf-index-")
    ivf_build_index(emb, "vec_id", idx_dir, n_cells=16)
    out = ivf_query_index(
        t.spark, idx_dir, emb.where(F.col("vec_id") < 10), "vec_id",
        k=5, nprobe=4,
    )
    return out.select(
        "vec_id", "neighbor_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


@_q(
    "embedding_near_dup",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
      FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.e, b.e) / (a.n * b.n), 6) AS score
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.4
    """,
)
def q_embedding_near_dup(t: _T) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the embedding-space
    dedup family member). This corpus is near-random, so the driver
    entry runs the EXHAUSTIVE verify path (threshold 0.4 — real
    near-dup corpora use >= 0.9 where the LSH path's recall is high;
    the LSH path is pytest-proven on clustered vectors)."""
    from flink_efo_spark.operators.similarity import embedding_near_duplicates

    out = embedding_near_duplicates(
        t.embeddings, "vec_id", "embedding", threshold=0.4, exhaustive=True
    )
    return out.select(
        "id_a", "id_b", F.round("score", 6).alias("score")
    )


@_q(
    "lsh_recall",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
      FROM embeddings),
    truth AS (
      SELECT q.vec_id, c.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
                ORDER BY list_dot_product(q.e, c.e) / (q.n * c.n) DESC,
                         c.vec_id) AS rank
      FROM v q JOIN v c ON c.vec_id != q.vec_id)
    SELECT CAST(count(*) AS BIGINT) AS n_truth, true AS recall_ge_090
    FROM truth WHERE rank <= 5
    """,
)
def q_lsh_recall(t: _T) -> DataFrame:
    """LSH recall contract: approximate top-k must find >= 90% of the
    exact top-k pairs. The oracle recomputes the exact ground-truth
    count and asserts `true` — if recall regresses below 0.9 the hash
    mismatch turns this row red.

    Config note: this corpus is near-random (median true-neighbor
    cosine ~0.32), the hardest regime for hyperplane LSH, so the
    recall-tuned config is 24 planes / 12 bands of 2 bits (measured
    recall 0.993 here). Real near-dup corpora (cosine >= 0.8) keep
    the default 8-bit bands and their much stronger pruning — the
    bands/planes knobs ARE the recall/cost dial, and this query is
    the harness that measures where a given corpus sits."""
    emb = t.embeddings
    truth = cosine_topk(
        emb, emb, "vec_id", "vec_id", vec_col="embedding", k=5
    ).select("vec_id", "neighbor_id")
    approx = lsh_cosine_topk(
        emb, "vec_id", "embedding", dim=64, k=5, num_planes=24, bands=12
    ).select("vec_id", "neighbor_id")
    marked = truth.join(
        approx.withColumn("__hit", F.lit(1)), ["vec_id", "neighbor_id"], "left"
    )
    return marked.agg(
        F.count("*").alias("n_truth"),
        (F.sum(F.coalesce("__hit", F.lit(0))) / F.count("*") >= 0.9).alias(
            "recall_ge_090"
        ),
    )


# ---------------------------------------------------------------------------
# north star: text analysis
# ---------------------------------------------------------------------------

_TOKS_DD = "list_filter(string_split_regex(trim(lower(text)), ' +'), t -> t != '')"


@_q(
    "token_stats",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len({_TOKS_DD}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_TOKS_DD})) AS BIGINT) AS n_types,
           round(CAST(list_sum(list_transform({_TOKS_DD}, t -> length(t)))
                 AS DOUBLE) / greatest(len({_TOKS_DD}), 1), 4) AS avg_token_len,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))
                AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def q_token_stats(t: _T) -> DataFrame:
    return token_stats(t.documents, "doc_id", "text")


@_q(
    "repetition_stats",
    f"""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN len({_TOKS_DD}) >= 3 THEN
               list_transform(range(1, len({_TOKS_DD}) - 1),
                 i -> array_to_string(({_TOKS_DD})[i:i+2], ' '))
             ELSE [] END AS ngrams
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ngrams) AS BIGINT) AS n_ngrams,
           CAST(len(list_distinct(ngrams)) AS BIGINT) AS n_distinct_ngrams,
           CASE WHEN len(ngrams) = 0 THEN 0.0
                ELSE round(1.0 - CAST(len(list_distinct(ngrams)) AS DOUBLE)
                           / len(ngrams), 4)
           END AS rep_ratio
    FROM g
    """,
)
def q_repetition_stats(t: _T) -> DataFrame:
    """Duplicate-3-gram repetition ratio per document — the
    boilerplate / degenerate-text quality filter
    (operators/text.py repetition_stats)."""
    from flink_efo_spark.operators.text import repetition_stats

    return repetition_stats(t.documents, "doc_id", "text", n=3)


@_q(
    "lang_id",
    """
    WITH scores AS (
      SELECT doc_id,
        len(list_filter(list_filter(string_split_regex(trim(lower(text)), ' +'),
            t -> t != ''), t -> list_contains(['the','and','of','to','a','in','is','that','for','it'], t))) AS s_en,
        len(list_filter(list_filter(string_split_regex(trim(lower(text)), ' +'),
            t -> t != ''), t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','von','zu'], t))) AS s_de,
        len(list_filter(list_filter(string_split_regex(trim(lower(text)), ' +'),
            t -> t != ''), t -> list_contains(['le','la','les','et','est','un','une','dans','pour','que'], t))) AS s_fr,
        len(list_filter(list_filter(string_split_regex(trim(lower(text)), ' +'),
            t -> t != ''), t -> list_contains(['el','la','los','y','es','un','una','en','por','que'], t))) AS s_es
      FROM documents)
    SELECT doc_id,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_guess,
           CAST(greatest(s_de, s_en, s_es, s_fr) AS BIGINT) AS lang_hits
    FROM scores
    """,
)
def q_lang_id(t: _T) -> DataFrame:
    return lang_id(t.documents, "doc_id", "text")


@_q(
    "quality_stats",
    f"""
    SELECT doc_id,
      round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)) AS DOUBLE)
            / greatest(length(text), 1), 4) AS punct_ratio,
      round(CAST(len(regexp_extract_all(text, '[0-9]', 0)) AS DOUBLE)
            / greatest(length(text), 1), 4) AS digit_ratio,
      round(CAST(len(list_filter({_TOKS_DD},
            t -> list_contains(['the','and','of','to','a','in','is','that','for','it'], t)))
            AS DOUBLE) / greatest(len({_TOKS_DD}), 1), 4) AS stopword_ratio,
      round(0.4 * least(CAST(len({_TOKS_DD}) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * least((CAST(len(list_filter({_TOKS_DD},
              t -> list_contains(['the','and','of','to','a','in','is','that','for','it'], t)))
              AS DOUBLE) / greatest(len({_TOKS_DD}), 1)) * 5, 1.0)
          + 0.3 * (1.0 - least((CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0))
              AS DOUBLE) / greatest(length(text), 1)) * 10, 1.0)), 4)
        AS quality_score
    FROM documents
    """,
)
def q_quality_stats(t: _T) -> DataFrame:
    return quality_stats(t.documents, "doc_id", "text")


@_q(
    "doc_fingerprint",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
               ELSE [] END) AS shingles
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
            FROM documents))
    SELECT doc_id,
           list_min(list_transform(shingles,
             s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS fp_min,
           CAST(len(shingles) AS BIGINT) AS fp_count
    FROM sh
    """,
)
def q_doc_fingerprint(t: _T) -> DataFrame:
    return doc_fingerprint(t.documents, "doc_id", "text", shingle_size=3)


@_q(
    "dedup_normalized",
    """
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
      FROM documents)
    SELECT md5(norm_text) AS norm_hash, min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM n GROUP BY norm_hash
    """,
)
def q_dedup_normalized(t: _T) -> DataFrame:
    """Normalized exact dedup: casefold + punctuation-strip +
    whitespace-collapse, then group on the md5 of the normalized body
    (operators/text.py normalize_text). Catches the case/punctuation
    near-identicals raw-hash dedup (dedup_exact) misses; shuffles the
    32-char hash only."""
    n = normalize_text(t.documents, "doc_id", "text")
    return n.groupBy("norm_hash").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_dups"),
    )


_PII_SYNTH_SQL = """
      SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS text
      FROM documents
"""


@_q(
    "pii_scrub",
    f"""
    WITH p AS ({_PII_SYNTH_SQL}),
    c AS (
      SELECT doc_id, text,
             regexp_replace(regexp_replace(regexp_replace(text,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IP_RE}', '<IP>', 'g') AS clean
      FROM p)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(text, '{_IP_RE}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(clean,
             '({_EMAIL_RE})|({_PHONE_RE})|({_IP_RE})')) AS BIGINT)
             AS n_residual,
           md5(clean) AS clean_hash
    FROM c
    """,
)
def q_pii_scrub(t: _T) -> DataFrame:
    """PII redaction over the corpus (operators/text.py pii_scrub).
    The synthetic corpus carries no real PII, so deterministic PII is
    injected per doc (email + phone + IP derived from doc_id) before
    scrubbing — the oracle injects the identical text, and
    ``n_residual`` proves the redaction left nothing behind."""
    d = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        d.cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 7) % 256).cast("string"),
    )
    seeded = t.documents.select(d, pii_text.alias("text"))
    return pii_scrub(seeded, "doc_id", "text")


@_q(
    "ngram_contamination",
    _SHINGLE_CTE
    + """
    , ev AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh
             WHERE doc_id % 97 = 0)
    , co AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
             WHERE doc_id % 97 != 0)
    SELECT co.doc_id, CAST(count(*) AS BIGINT) AS hit_ngrams
    FROM co JOIN ev USING (shingle)
    GROUP BY co.doc_id
    """,
)
def q_ngram_contamination(t: _T) -> DataFrame:
    """Benchmark decontamination (operators/text.py
    ngram_contamination): every 97th doc stands in for the eval set;
    corpus docs sharing any word 3-gram with it are flagged with
    their distinct-collision count. Eval shingles are broadcast — the
    corpus is never shuffled until the final (doc_id, count) agg."""
    docs = t.documents
    ev = docs.where(F.col("doc_id") % 97 == 0)
    co = docs.where(F.col("doc_id") % 97 != 0)
    return ngram_contamination(co, ev, "doc_id", "text", shingle_size=3)


# ---------------------------------------------------------------------------
# simhash signatures (rows-only unless the chunked oracle proves out)
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    hash64 = "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)"
    chunk_exprs = []
    for c in range(4):
        bit_terms = " + ".join(
            f"(CASE WHEN list_sum(list_transform(shingles, "
            f"s -> 2 * (({hash64} >> {c * 16 + i}) & 1) - 1)) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(16)
        )
        chunk_exprs.append(f"CAST({bit_terms} AS BIGINT) AS sim_c{c}")
    cols = ", ".join(chunk_exprs)
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
               ELSE [] END) AS shingles
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
            FROM documents))
    SELECT doc_id, {cols} FROM sh WHERE len(shingles) > 0
    """


@_q("simhash_signatures", _simhash_oracle())
def q_simhash_signatures(t: _T) -> DataFrame:
    return simhash_signatures(t.documents, "doc_id", "text", shingle_size=3)


# ---------------------------------------------------------------------------
# VALUES literal rows (StreamExecValues.scala:39)
# ---------------------------------------------------------------------------


@_q(
    "values_literal",
    """
    SELECT * FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', NULL))
      t(id, name, score)
    """,
)
def q_values_literal(t: _T) -> DataFrame:
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    return t.spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)], schema
    )


# ---------------------------------------------------------------------------
# §2.10/2.13 SQL-name function registry through spark.sql
# (TableEnvironmentImpl.registerFunction:345; FlinkSqlOperatorTable residue)
# ---------------------------------------------------------------------------


@_q(
    "flink_sql_fns",
    r"""
    SELECT doc_id,
           string_split(source, 'c')[2] AS si,
           source ~ '^[a-zA-Z]+$' AS ia,
           source ~ '^[0-9]+$' AS idg,
           regexp_matches(source, '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$') AS idc,
           floor(n_chars / 7.0 * 100) / 100 AS tr,
           base64(encode(source)) AS b64,
           source AS rt
    FROM documents WHERE doc_id < 50
    """,
)
def q_flink_sql_fns(t: _T) -> DataFrame:
    """Flink SQL names resolved through spark.sql — proves the
    registry registers real (codegen-inlined) SQL UDFs, not shims."""
    from flink_efo_spark.functions.registry import register_all

    register_all(t.spark)
    t.documents.createOrReplaceTempView("__efo_documents")
    return t.spark.sql(
        """
        SELECT doc_id,
               SPLIT_INDEX(source, 'c', 1) AS si,
               IS_ALPHA(source) AS ia,
               IS_DIGIT(source) AS idg,
               IS_DECIMAL(source) AS idc,
               TRUNCATE(n_chars / 7.0, 2) AS tr,
               TO_BASE64(CAST(source AS BINARY)) AS b64,
               CAST(FROM_BASE64(TO_BASE64(CAST(source AS BINARY))) AS STRING) AS rt
        FROM __efo_documents WHERE doc_id < 50
        """
    )


@_q(
    "json_predicates",
    """
    SELECT event_id,
           json_valid(s) AS is_val,
           json_valid(s) AND ltrim(s) LIKE '{%' AS is_obj,
           json_valid(s) AND ltrim(s) LIKE '[%' AS is_arr,
           json_valid(s) AND ltrim(s) NOT LIKE '{%'
             AND ltrim(s) NOT LIKE '[%' AS is_scalar,
           NOT json_valid(s) AS not_val
    FROM (
      SELECT event_id,
             CASE CAST(event_id % 4 AS INT)
               WHEN 0 THEN props
               WHEN 1 THEN substr(props, 1, length(props) - 1)
               WHEN 2 THEN concat('[', props, ',', props, ']')
               ELSE '12.5'
             END AS s
      FROM events WHERE event_id < 2000 AND props IS NOT NULL
    )
    """,
)
def q_json_predicates(t: _T) -> DataFrame:
    """IS [NOT] JSON predicates (FlinkSqlOperatorTable.java:1007-1014:
    IS_JSON_VALUE/OBJECT/ARRAY/SCALAR and NOT twins) over a mix of
    valid objects, truncated (malformed) strings, wrapped arrays and
    bare scalars derived from events.props. try_parse_json validity +
    first-non-space-char kind — all codegen-inlined SQL UDFs, no
    Python on the data path."""
    from flink_efo_spark.functions.registry import register_all

    register_all(t.spark)
    t.events.createOrReplaceTempView("__efo_events")
    return t.spark.sql(
        """
        SELECT event_id,
               IS_JSON_VALUE(s) AS is_val,
               IS_JSON_OBJECT(s) AS is_obj,
               IS_JSON_ARRAY(s) AS is_arr,
               IS_JSON_SCALAR(s) AS is_scalar,
               NOT IS_JSON_VALUE(s) AS not_val
        FROM (
          SELECT event_id,
                 CASE CAST(event_id % 4 AS INT)
                   WHEN 0 THEN props
                   WHEN 1 THEN substr(props, 1, length(props) - 1)
                   WHEN 2 THEN concat('[', props, ',', props, ']')
                   ELSE '12.5'
                 END AS s
          FROM __efo_events WHERE event_id < 2000 AND props IS NOT NULL
        )
        """
    )


@_q(
    "python_udf_calc",
    """
    SELECT event_id,
           CAST(floor(value * 2) AS BIGINT) + length(event_type) AS py_val
    FROM events WHERE event_id < 1000
    """,
)
def q_python_udf_calc(t: _T) -> DataFrame:
    """Python calc path (StreamExecPythonCalc.scala /
    PythonScalarFunctionOperator.java:43): an Arrow-batched pandas_udf
    in the projection — the engine's vectorized Python escape hatch
    (row-at-a-time udf() exists but is the documented slow path)."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: queries.py uses `from __future__ import
    # annotations`, which stringifies them and breaks pandas_udf's
    # signature inference — the explicit returnType carries the type
    def _py_calc(et, v):
        import numpy as np

        return np.floor(v * 2).astype("int64") + et.str.len().astype("int64")

    py_calc = pandas_udf(_py_calc, "bigint")

    return (
        t.events.where(F.col("event_id") < 1000)
        .select(
            "event_id", py_calc(F.col("event_type"), F.col("value")).alias("py_val")
        )
    )


@_q(
    "partitioned_sink",
    """
    SELECT event_type, count(*) AS cnt,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_partitioned_sink(t: _T) -> DataFrame:
    """Batch sink round-trip (BatchExecSink / FileSystemTableSink:
    partitioned directory write): events written hive-partitioned by
    event_type, read back through the partition-discovering scan, and
    re-aggregated — must equal the source aggregate. At scale the
    partitioned layout is what makes downstream `WHERE event_type=`
    scans partition-pruned."""
    import tempfile

    from flink_efo_spark.io import read_table, write_table

    out = tempfile.mkdtemp(prefix="efo-psink-") + "/data"
    write_table(
        t.events.select("event_type", "value"),
        out,
        partition_by=["event_type"],
        mode="overwrite",
    )
    back = read_table(t.spark, out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )


@_q(
    "ddl_sql",
    """
    SELECT event_type, count(*) AS cnt,
           round(sum(value * 2), 2) AS sum_x2
    FROM events GROUP BY event_type
    """,
)
def q_ddl_sql(t: _T) -> DataFrame:
    """The reference's CREATE TABLE DDL TEXT run verbatim
    (SqlCreateTable.java:56 + SqlWatermark + computed columns +
    PRIMARY KEY NOT ENFORCED + WITH options → ddl_sql.py): declare
    events as a filesystem table with a watermark, a computed column
    and a primary key, then aggregate through the registered table."""
    from flink_efo_spark.catalog import table_path
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    env.sql(
        f"""
        CREATE TABLE __efo_ddl_sql_ev (
          event_id BIGINT,
          user_id BIGINT,
          event_type STRING,
          value DOUBLE,
          ts TIMESTAMP(3),
          value_x2 AS value * 2,
          WATERMARK FOR ts AS ts - INTERVAL '10' SECOND,
          PRIMARY KEY (event_id) NOT ENFORCED
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{table_path(t.sf_dir, "events")}',
          'format' = 'parquet'
        )
        """
    )
    return env.sql(
        """
        SELECT event_type, count(*) AS cnt,
               round(sum(value_x2), 2) AS sum_x2
        FROM __efo_ddl_sql_ev GROUP BY event_type
        """
    )


@_q(
    "ddl_view",
    """
    SELECT event_type AS etype, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sumv
    FROM events GROUP BY event_type
    """,
)
def q_ddl_view(t: _T) -> DataFrame:
    """CREATE VIEW / ALTER TABLE as SQL TEXT (reference parser
    ddl/SqlCreateView.java + ddl/SqlAlterTable.java → ddl_sql.py):
    declare the events table via DDL, RENAME it, then define a view
    with a column alias list over the renamed table and query through
    the view — the full lexical-DDL round trip."""
    from flink_efo_spark.catalog import table_path
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    env.sql(
        f"""
        CREATE TABLE __efo_vddl_ev (
          event_id BIGINT, user_id BIGINT, event_type STRING,
          value DOUBLE, ts TIMESTAMP(3)
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{table_path(t.sf_dir, "events")}',
          'format' = 'parquet'
        )
        """
    )
    env.sql("ALTER TABLE __efo_vddl_ev RENAME TO __efo_vddl_events")
    env.sql("DROP VIEW IF EXISTS __efo_vddl_v")
    env.sql(
        """
        CREATE VIEW __efo_vddl_v (etype, n, sumv) AS
        SELECT event_type, CAST(count(*) AS BIGINT),
               round(sum(value), 2)
        FROM __efo_vddl_events GROUP BY event_type
        """
    )
    return env.sql("SELECT etype, n, sumv FROM __efo_vddl_v")


@_q(
    "ddl_like",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value * 2), 2) AS sum_x2,
           round(sum(value * 3), 2) AS sum_x3
    FROM events GROUP BY event_type
    """,
)
def q_ddl_like(t: _T) -> DataFrame:
    """CREATE TABLE ... LIKE as SQL TEXT (reference parser
    ddl/SqlTableLike.java, merge semantics MergeTableLikeUtil →
    ddl_sql.execute_create_table_like): declare a base table with a
    computed column, derive a second table via LIKE that inherits it
    and adds another (default INCLUDING ALL OVERWRITING OPTIONS),
    then query through the derived table so both the inherited and
    the new computed column must resolve."""
    from flink_efo_spark.catalog import table_path
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    env.sql(
        f"""
        CREATE TABLE __efo_like_base (
          event_id BIGINT, user_id BIGINT, event_type STRING,
          value DOUBLE, ts TIMESTAMP(3),
          value_x2 AS value * 2,
          PRIMARY KEY (event_id) NOT ENFORCED
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{table_path(t.sf_dir, "events")}',
          'format' = 'parquet'
        )
        """
    )
    env.sql(
        "CREATE TABLE __efo_like_derived (value_x3 AS value * 3) "
        "LIKE __efo_like_base"
    )
    return env.sql(
        """
        SELECT event_type, count(*) AS n,
               round(sum(value_x2), 2) AS sum_x2,
               round(sum(value_x3), 2) AS sum_x3
        FROM __efo_like_derived GROUP BY event_type
        """
    )


@_q(
    "datagen_sequence_agg",
    """
    SELECT id % 10 AS bucket, CAST(sum(id) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM range(1, 1001) t(id) GROUP BY 1
    """,
)
def q_datagen_sequence_agg(t: _T) -> DataFrame:
    """datagen SEQUENCE source (the reference's datagen connector
    with 'fields.<f>.kind' = 'sequence' — DataGeneratorSource +
    SequenceGenerator): a bounded deterministic 1..1000 stream,
    grouped-aggregated across its micro-batches in update mode. The
    oracle generates the same sequence with DuckDB's range()."""
    from flink_efo_spark.io import datagen_sequence
    from flink_efo_spark.streaming import run_stream_to_table

    src = datagen_sequence(t.spark, 1, 1000)
    agg = src.groupBy((F.col("id") % 10).alias("bucket")).agg(
        F.sum("id").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return run_stream_to_table(agg, mode="update", update_keys=["bucket"])


@_q(
    "stream_temporal_sort",
    """
    WITH o AS (
      SELECT event_id, ts,
             ntile(3) OVER (ORDER BY ts) AS b
      FROM events
    )
    SELECT CAST(b - 1 AS BIGINT) AS batch_id,
           CAST(row_number() OVER (PARTITION BY b ORDER BY ts, event_id)
                AS BIGINT) AS pos,
           event_id
    FROM o
    """,
)
def q_stream_temporal_sort(t: _T) -> DataFrame:
    """Streaming temporal (event-time) sort
    (RowTimeSortOperator/StreamExecTemporalSort — streaming.py
    stream_temporal_sort): each micro-batch reaches the sink in
    (ts, event_id) order; the recorded (batch_id, in-batch position)
    pairs must equal the oracle's ntile-slice + per-slice sort. This
    is the bounded-stream sort contract the reference guarantees (it
    sorts rows below each watermark advance; the batch here IS the
    watermark span)."""
    import tempfile

    from flink_efo_spark.streaming import (
        stream_table_split,
        stream_temporal_sort,
    )

    ev = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=3, order_col="ts"
    ).select("event_id", "ts")
    out_dir = tempfile.mkdtemp(prefix="efo-tsort-q-")
    from pyspark.sql import Window as _W

    def sink(batch_df, batch_id):
        # batch_df arrives sorted; stamp the order explicitly so the
        # parquet round-trip cannot lose it
        w = _W.orderBy("ts", "event_id")
        (
            batch_df.withColumn("pos", F.row_number().over(w).cast("bigint"))
            .withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
            .select("batch_id", "pos", "event_id")
            .write.mode("append")
            .parquet(out_dir)
        )

    q = stream_temporal_sort(ev, "ts", sink, extra_order=["event_id"])
    q.awaitTermination()
    return t.spark.read.parquet(out_dir)


@_q(
    "proctime_temporal_join",
    """
    SELECT e.event_id, e.user_id, c.c_name
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_proctime_temporal_join(t: _T) -> DataFrame:
    """Proc-time temporal join
    (TemporalProcessTimeJoinOperator.java:40 — streaming.py
    temporal_join_proctime): every micro-batch joins the CURRENT
    dimension snapshot, re-read and broadcast per batch. With a
    static dim the result equals the plain left join (the oracle);
    the per-batch re-read is the proc-time semantics — the pytest
    suite pins the changing-dim behavior."""
    import tempfile

    from flink_efo_spark.catalog import table_path
    from flink_efo_spark.streaming import (
        stream_table_split,
        temporal_join_proctime,
    )

    ev = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=3, order_col="ts"
    ).select("event_id", "user_id")
    cust_path = table_path(t.sf_dir, "customer")
    out_dir = tempfile.mkdtemp(prefix="efo-tjoin-q-")

    def dim_provider(spark):
        return (
            spark.read.parquet(cust_path)
            .select(F.col("c_custkey").alias("user_id"), "c_name")
        )

    def sink(batch_df, batch_id):
        batch_df.select("event_id", "user_id", "c_name").write.mode(
            "append"
        ).parquet(out_dir)

    q = temporal_join_proctime(ev, dim_provider, on=["user_id"], sink=sink)
    q.awaitTermination()
    return t.spark.read.parquet(out_dir)


@_q(
    "async_lookup_join",
    """
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def q_async_lookup_join(t: _T) -> DataFrame:
    """ASYNC lookup join (AsyncLookupJoinRunner.java:52 +
    AsyncWaitOperator ORDERED mode — operators/lookup.py
    lookup_join_async): up to `capacity` concurrent lookup chunks in
    flight per task against an external-store STAND-IN built through
    lookup.py's documented fixture seam (dim_snapshot_client — a
    bounded driver-dict snapshot of customer; production passes a
    real external client there, nothing is collected). Results must
    equal the plain left join — ORDERED mode preserves row
    identity."""
    from flink_efo_spark.operators.lookup import (
        dim_snapshot_client,
        lookup_join_async,
    )

    # fixture bound sized for the full TPC-H range this corpus can
    # meet (customer = 150k rows/SF; sf10 = 1.5M): the guard still
    # refuses absurd snapshots without turning the query red at
    # driver/bench scale factors
    lookup_fn = dim_snapshot_client(
        t.customer, "c_custkey", ["c_name", "c_mktsegment"],
        max_rows=2_000_000,
    )

    probe = t.orders.where(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_custkey"
    )
    return lookup_join_async(
        probe,
        lookup_fn,
        "o_custkey",
        [("c_name", "string"), ("c_mktsegment", "string")],
        capacity=4,
        batch_size=64,
    ).select("o_orderkey", "c_name", "c_mktsegment")


@_q(
    "ddl_catalog",
    """
    SELECT * FROM (VALUES
      ('event_id', 'bigint'), ('ts', 'timestamp'), ('user_id', 'bigint'),
      ('event_type', 'string'), ('value', 'double'), ('props', 'string'),
      ('value_x2', 'double')
    ) t(col_name, data_type) ORDER BY col_name
    """,
)
def q_ddl_catalog(t: _T) -> DataFrame:
    """Catalog/DDL surface (SURVEY §2.14, SqlCreateTable.java:56 +
    SqlTableLike.java): engine CREATE TABLE with a computed column and
    a watermark spec, cloned via CREATE TABLE ... LIKE, then DESCRIBE
    — the clone must carry the source's full schema including the
    computed column."""
    from flink_efo_spark.catalog import table_path
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    env.create_table(
        "__efo_ddl_ev",
        table_path(t.sf_dir, "events"),
        watermark=("ts", "10 minutes"),
        computed_columns={"value_x2": "value * 2"},
    )
    env.create_table_like("__efo_ddl_ev2", "__efo_ddl_ev")
    return (
        env.sql("DESCRIBE __efo_ddl_ev2")
        .select("col_name", "data_type")
        .orderBy("col_name")
    )


# ---------------------------------------------------------------------------
# §2.5/2.7/2.11 streaming: real micro-batch runs (availableNow) over the
# bounded events stream — StreamExecGroupWindowAggregate /
# StreamExecDeduplicate / StreamExecRank + the EFO source analog
# ---------------------------------------------------------------------------


@_q(
    "stream_tumble",
    """
    WITH wm AS (SELECT epoch(max(ts)) - 600 AS w FROM events)
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000 AS w_start_us,
           event_type, count(*) AS cnt
    FROM events GROUP BY 1, 2
    HAVING (floor(epoch(any_value(ts)) / 300) * 300 + 300) <= (SELECT w FROM wm)
    """,
)
def q_stream_tumble(t: _T) -> DataFrame:
    """Streaming tumble agg, append mode: emits exactly the windows
    finalized by the watermark (max ts - 10 min); Spark has no
    end-of-input MAX_WATERMARK flush (documented gap, SURVEY §7.4)."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_table,
        tumble_agg,
    )

    ev = stream_table(t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes"))
    agg = tumble_agg(ev, "ts", "5 minutes", ["event_type"], F.count("*").alias("cnt"))
    return run_stream_to_table(agg).select(
        F.unix_micros("w_start").alias("w_start_us"), "event_type", "cnt"
    )


@_q(
    "stream_dedup_first",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup_first(t: _T) -> DataFrame:
    """Streaming dedup keep-first (dropDuplicates keyed state) on a
    projection functionally determined by the key — deterministic
    under any arrival order."""
    from flink_efo_spark.streaming import run_stream_to_table, stream_dedup_keep_first, stream_table

    ev = stream_table(t.spark, t.sf_dir, "events")
    dd = stream_dedup_keep_first(
        ev.select("user_id", "event_type"), ["user_id", "event_type"]
    )
    return run_stream_to_table(dd)


@_q(
    "stream_top_n",
    """
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events) WHERE rn <= 3
    """,
)
def q_stream_top_n(t: _T) -> DataFrame:
    """Streaming per-key Top-N via applyInPandasWithState
    (AppendOnlyTopNFunction semantics, bounded per-key state)."""
    from flink_efo_spark.streaming import run_stream_to_table, stream_table, stream_top_n

    ev = stream_table(t.spark, t.sf_dir, "events")
    tn = stream_top_n(
        ev.select("user_id", "event_id", "value"),
        ["user_id"], "value", 3, ascending=False, tiebreak="event_id",
    )
    return run_stream_to_table(tn)


@_q(
    "efo_shard_stats",
    """
    SELECT CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                     AS BIGINT) % 4 AS INT) AS shard,
           count(*) AS n_records,
           epoch_us(max(ts)) AS max_ts_us, epoch_us(min(ts)) AS min_ts_us
    FROM events GROUP BY 1
    """,
)
def q_efo_shard_stats(t: _T) -> DataFrame:
    """EFO-analog sharded stream: per-shard consumption accounting
    (KinesisDataFetcher / ShardConsumer observability surface)."""
    from flink_efo_spark.sources import efo_event_stream
    from flink_efo_spark.streaming import run_stream_to_table

    ev = efo_event_stream(t.spark, t.sf_dir, num_shards=4)
    stats = ev.groupBy("shard").agg(
        F.count("*").alias("n_records"),
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
        F.unix_micros(F.min("ts")).alias("min_ts_us"),
    )
    return run_stream_to_table(stats, mode="complete")


@_q(
    "efo_watermark_alignment",
    """
    WITH s AS (
      SELECT CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                       AS BIGINT) % 4 AS INT) AS shard,
             epoch_us(max(ts)) - 600000000 AS local_wm_us
      FROM events GROUP BY 1)
    SELECT shard, local_wm_us,
           min(local_wm_us) OVER () AS global_wm_us,
           local_wm_us - min(local_wm_us) OVER () AS lag_us
    FROM s
    """,
)
def q_efo_watermark_alignment(t: _T) -> DataFrame:
    """Cross-shard watermark alignment — the fork's WatermarkTracker /
    JobManagerWatermarkTracker (flink-connector-kinesis-v2/.../util/):
    per-shard local watermarks aggregated to the global minimum, with
    each shard's head-start lag — the pacing signal the EFO consumer
    uses to keep fast shards from running away from slow ones."""
    from flink_efo_spark.sources import efo_event_stream, shard_watermarks
    from flink_efo_spark.streaming import run_stream_to_table

    ev = efo_event_stream(t.spark, t.sf_dir, num_shards=4)
    stats = ev.groupBy("shard").agg(
        F.unix_micros(F.max("ts")).alias("max_ts_us")
    )
    batch_stats = run_stream_to_table(stats, mode="complete")
    return shard_watermarks(batch_stats, 600_000_000)


# ---------------------------------------------------------------------------
# §2.3 lookup join / §2.4 table aggregate + MULTISET / §2.6 streaming OVER /
# multimodal plumbing
# ---------------------------------------------------------------------------


@_q(
    "lookup_join_dim",
    """
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def q_lookup_join_dim(t: _T) -> DataFrame:
    """Lookup join against a dimension snapshot (LookupJoinRunner
    semantics; broadcast per SURVEY §2.3)."""
    from flink_efo_spark.operators.lookup import lookup_join

    probe = t.orders.where(F.col("o_totalprice") > 400000).select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey")
    )
    dim = t.customer.select("c_custkey", "c_name", "c_mktsegment")
    return lookup_join(probe, dim, on=["c_custkey"]).select(
        "o_orderkey",
        F.col("c_custkey").alias("o_custkey"),
        "c_name",
        "c_mktsegment",
    )


@_q(
    "flat_agg_top2",
    """
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) WHERE rn <= 2
    """,
)
def q_flat_agg_top2(t: _T) -> DataFrame:
    """Table aggregate (flatAggregate): per-key UDF emitting multiple
    rows — the reference's canonical Top2 example
    (GroupTableAggFunction.java)."""
    from flink_efo_spark.operators.aggregates import flat_aggregate

    def top2(pdf):
        return pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).head(2)

    return flat_aggregate(
        t.customer.select("c_nationkey", "c_custkey", "c_acctbal"),
        ["c_nationkey"],
        top2,
        "c_nationkey int, c_custkey bigint, c_acctbal double",
    )


@_q(
    "collect_multiset_agg",
    """
    SELECT user_id,
           string_agg(et || ':' || CAST(cnt AS VARCHAR), ',' ORDER BY et)
             AS type_counts
    FROM (SELECT user_id, event_type AS et, count(*) AS cnt
          FROM events GROUP BY 1, 2)
    GROUP BY user_id
    """,
)
def q_collect_multiset_agg(t: _T) -> DataFrame:
    """Flink COLLECT → MULTISET (MultisetType.java): count-valued map,
    serialized to a sorted entries string for cross-engine hashing.
    Two-level aggregation (partial counts map-side) — never a
    quadratic per-group list scan."""
    from flink_efo_spark.operators.aggregates import multiset_agg

    return (
        multiset_agg(
            t.events.select("user_id", "event_type"),
            ["user_id"],
            "event_type",
            "ms",
        )
        .select(
            "user_id",
            F.expr(
                "concat_ws(',', transform(array_sort(map_entries(ms)), "
                "e -> concat(e.key, ':', cast(e.value as string))))"
            ).alias("type_counts"),
        )
    )


@_q(
    "stream_over_running",
    """
    SELECT user_id, event_id, running_cnt, round(running_sum, 4) AS rs
    FROM (
      SELECT user_id, event_id,
             count(*) OVER w AS running_cnt,
             sum(value) OVER w AS running_sum
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING))
    """,
)
def q_stream_over_running(t: _T) -> DataFrame:
    """Streaming OVER aggregation (RowTimeUnboundedPrecedingFunction):
    per-row running aggregates via keyed state."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_over_unbounded,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events")
    over = stream_over_unbounded(
        ev.select("user_id", "event_id", "ts", "value"),
        ["user_id"], "ts", "value", tiebreak="event_id",
    )
    return run_stream_to_table(over).select(
        "user_id", "event_id", "running_cnt",
        F.round("running_sum", 4).alias("rs"),
    )


@_q(
    "media_pipeline",
    """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           CAST(('0x' || substr(md5(text), 1, 4)) AS INT) AS f0_u16,
           CAST(('0x' || substr(md5(text), 5, 4)) AS INT) AS f1_u16
    FROM documents WHERE doc_id < 100
    """,
)
def q_media_pipeline(t: _T) -> DataFrame:
    """Multimodal plumbing over binary columns: metadata extraction +
    (stubbed, deterministic) feature decode — the mapInPandas batch
    shape a real codec pipeline uses, oracle-checked end to end."""
    from flink_efo_spark.operators.multimodal import decode_image, media_metadata

    docs = t.documents.where(F.col("doc_id") < 100).select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    with_meta = media_metadata(docs)
    feats = decode_image(with_meta, fake=True, feature_dim=2)
    # features are float32; recover the exact u16 the fake decoder
    # derived (error << 0.5 ULP) so the oracle compare is integral
    return feats.select(
        "doc_id",
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
        F.round(F.element_at("features", 1) * 65535).cast("int").alias("f0_u16"),
        F.round(F.element_at("features", 2) * 65535).cast("int").alias("f1_u16"),
    )


@_q(
    "match_recognize_funnel",
    """
    SELECT user_id, prev_id AS click_id, event_id AS purchase_id
    FROM (SELECT user_id, event_id, event_type,
                 lag(event_type) OVER w AS prev_et,
                 lag(event_id) OVER w AS prev_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE event_type = 'purchase' AND prev_et = 'click'
    """,
)
def q_match_recognize_funnel(t: _T) -> DataFrame:
    """MATCH_RECOGNIZE subset (StreamExecMatch.scala:68): adjacent
    click→purchase funnel per user. Length-2 concatenation matches are
    provably non-overlapping, so the lag-based SQL oracle is exact."""
    from flink_efo_spark.operators.cep import match_recognize

    out = match_recognize(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="A B",
        defines={"A": "event_type = 'click'", "B": "event_type = 'purchase'"},
        measures={
            "click_id": ("A", "first", "event_id"),
            "purchase_id": ("B", "last", "event_id"),
        },
        tiebreak="event_id",
    )
    return out.select("user_id", "click_id", "purchase_id")


@_q(
    "sql_match_recognize",
    """
    SELECT user_id, click_id, purchase_id
    FROM (SELECT user_id, prev_id AS click_id, event_id AS purchase_id
          FROM (SELECT user_id, event_id, event_type, ts,
                       lag(event_type) OVER w AS prev_et,
                       lag(event_id) OVER w AS prev_id,
                       lag(ts) OVER w AS prev_ts
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          WHERE event_type = 'purchase' AND prev_et = 'click'
            AND epoch_us(ts) - epoch_us(prev_ts)
                  <= CAST(3600 AS BIGINT) * 1000000)
    """,
)
def q_sql_match_recognize(t: _T) -> DataFrame:
    """The reference's SQL:2016 MATCH_RECOGNIZE clause run VERBATIM
    (Calcite SqlMatchRecognize → StreamExecMatch.scala:68; here
    match_sql.py parses the clause and routes it through the engine
    matcher): adjacent click→purchase funnel with WITHIN, the full
    clause surface — PARTITION BY / ORDER BY / MEASURES / AFTER MATCH
    / PATTERN / WITHIN / DEFINE — in one statement."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    t.events.select(
        "user_id", "event_id", "event_type", "ts"
    ).createOrReplaceTempView("__efo_mr_events")
    return env.execute_sql(
        """
        SELECT user_id, click_id, purchase_id
        FROM __efo_mr_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS click_id,
                   LAST(B.event_id) AS purchase_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B)
          WITHIN INTERVAL '1' HOUR
          DEFINE A AS A.event_type = 'click',
                 B AS B.event_type = 'purchase'
        )
        """
    )


@_q(
    "sql_match_first_last",
    """
    WITH o AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), a AS (
      SELECT user_id, event_id AS a_id, rn AS a_rn, value AS a_v
      FROM o WHERE event_type = 'signup'
    ), stops AS (
      SELECT a.user_id, a.a_id, a.a_rn,
             min(CASE WHEN NOT (o.event_type = 'click' AND o.value > a.a_v)
                      THEN o.rn END) AS stop_rn,
             max(o.rn) AS max_rn
      FROM a JOIN o ON o.user_id = a.user_id AND o.rn > a.a_rn
      GROUP BY 1, 2, 3
    ), res AS (
      SELECT user_id, a_id, a_rn,
             CAST(coalesce(stop_rn - a_rn - 1, max_rn - a_rn) AS BIGINT)
               AS n_b,
             a_rn + coalesce(stop_rn - a_rn - 1, max_rn - a_rn) AS last_rn
      FROM stops
    )
    SELECT r.user_id, r.a_id, r.n_b, o.event_id AS last_b
    FROM res r JOIN o ON o.user_id = r.user_id AND o.rn = r.last_rn
    WHERE r.n_b >= 1
    """,
)
def q_sql_match_first_last(t: _T) -> DataFrame:
    """FIRST()/LAST() NAVIGATION INSIDE DEFINE (the reference's
    MatchCodeGenerator.scala navigation calls, MatchRecognizeITCase
    DEFINE-navigation cases): B's condition compares each candidate
    row against FIRST(A.value) — a lookup into the in-progress match
    binding, not a row-local predicate. Pattern ``A B+``: a signup
    followed by a maximal run of clicks, each click's value above the
    signup's. The oracle replays the run scan with window SQL (first
    non-qualifying row ends the run)."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    t.events.select(
        "user_id", "event_id", "event_type", "ts", "value"
    ).createOrReplaceTempView("__efo_mr_nav_events")
    return env.execute_sql(
        """
        SELECT user_id, a_id, n_b, last_b
        FROM __efo_mr_nav_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS a_id,
                   COUNT(B.event_id) AS n_b,
                   LAST(B.event_id) AS last_b
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          DEFINE A AS A.event_type = 'signup',
                 B AS B.event_type = 'click' AND B.value > FIRST(A.value)
        )
        """
    )


@_q(
    "funnel_within",
    """
    SELECT user_id, prev_id AS click_id, event_id AS purchase_id
    FROM (SELECT user_id, event_id, event_type, ts,
                 lag(event_type) OVER w AS prev_et,
                 lag(event_id) OVER w AS prev_id,
                 lag(ts) OVER w AS prev_ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE event_type = 'purchase' AND prev_et = 'click'
      AND epoch_us(ts) - epoch_us(prev_ts) <= 120 * 1000000
    """,
)
def q_funnel_within(t: _T) -> DataFrame:
    """MATCH_RECOGNIZE with Pattern.within() (flink-cep NFA.java
    windowTime): the click→purchase funnel only matches when the
    purchase lands within 120 s of the click. For a length-2 adjacent
    pattern the lag-based oracle plus an exact microsecond gap filter
    reproduces the NFA window semantics."""
    from flink_efo_spark.operators.cep import match_recognize

    out = match_recognize(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="A B",
        defines={"A": "event_type = 'click'", "B": "event_type = 'purchase'"},
        measures={
            "click_id": ("A", "first", "event_id"),
            "purchase_id": ("B", "last", "event_id"),
        },
        tiebreak="event_id",
        within=120.0,
    )
    return out.select("user_id", "click_id", "purchase_id")


@_q(
    "cep_skip_to_next",
    """
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS match_seq,
           event_id AS first_id, nxt_id AS last_id
    FROM (SELECT user_id, event_id, ts, event_type,
                 lead(event_type) OVER w AS nxt_type,
                 lead(event_id) OVER w AS nxt_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE event_type = 'click' AND nxt_type = 'click'
    """,
)
def q_cep_skip_to_next(t: _T) -> DataFrame:
    """AFTER MATCH SKIP TO NEXT ROW (flink-cep
    AfterMatchSkipStrategy.java, the most-used non-default mode):
    consecutive click pairs per user with OVERLAPPING emission — a
    click run of length k yields k-1 matches (past-last-row would
    yield floor(k/2)). The lead-based oracle enumerates every adjacent
    click pair, exactly the to_next_row match set."""
    from flink_efo_spark.operators.cep import match_recognize

    out = match_recognize(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="C C",
        defines={"C": "event_type = 'click'"},
        measures={
            "first_id": ("C", "first", "event_id"),
            "last_id": ("C", "last", "event_id"),
        },
        tiebreak="event_id",
        after_match="to_next_row",
    )
    return out.select("user_id", "match_seq", "first_id", "last_id")


@_q(
    "cep_nested_pairs",
    """
    WITH ordered AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER w AS rn,
             lead(event_type) OVER w AS nxt,
             lead(event_id) OVER w AS nxt_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), pairs AS (
      SELECT user_id, rn, event_id AS click_id, nxt_id AS purch_id
      FROM ordered WHERE event_type = 'click' AND nxt = 'purchase'
    ), islands AS (
      SELECT *, rn - 2 * row_number()
                  OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM pairs
    )
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY min(rn)) AS BIGINT)
             AS match_seq,
           count(*) AS n_pairs,
           arg_min(click_id, rn) AS first_click,
           arg_max(purch_id, rn) AS last_purchase
    FROM islands GROUP BY user_id, grp
    """,
)
def q_cep_nested_pairs(t: _T) -> DataFrame:
    """Nested quantified pattern group (flink-cep GroupPattern.java):
    ``(A B)+`` — maximal runs of strictly adjacent click→purchase
    pairs per user, consumed greedily. Pair starts can never overlap
    (a pair's second row is a purchase, so it cannot begin the next
    pair), which makes the matches exactly the gaps-and-islands of
    adjacent pairs — the SQL oracle groups pair rows by
    ``rn - 2*row_number()`` and aggregates per island."""
    from flink_efo_spark.operators.cep import match_recognize

    out = match_recognize(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="(A B)+",
        defines={"A": "event_type = 'click'", "B": "event_type = 'purchase'"},
        measures={
            "n_pairs": ("A", "count", "event_id"),
            "first_click": ("A", "first", "event_id"),
            "last_purchase": ("B", "last", "event_id"),
        },
        tiebreak="event_id",
    )
    return out.select(
        "user_id", "match_seq", "n_pairs", "first_click", "last_purchase"
    )


@_q(
    "cep_permute_triples",
    """
    SELECT user_id, event_id AS p_id,
           CASE WHEN t1 = 'signup' THEN id1 ELSE id2 END AS signup_id,
           CASE WHEN t1 = 'error' THEN id1 ELSE id2 END AS error_id
    FROM (SELECT user_id, event_id, event_type,
                 lead(event_type) OVER w AS t1, lead(event_id) OVER w AS id1,
                 lead(event_type, 2) OVER w AS t2, lead(event_id, 2) OVER w AS id2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE event_type = 'purchase'
      AND ((t1 = 'signup' AND t2 = 'error')
           OR (t1 = 'error' AND t2 = 'signup'))
    """,
)
def q_cep_permute_triples(t: _T) -> DataFrame:
    """SQL:2016 row-pattern PERMUTE (Calcite SqlMatchRecognize, the
    reference's MATCH_RECOGNIZE parser path): ``P PERMUTE(S, E)`` —
    a purchase followed by a signup and an error in EITHER order.
    Expanded to an ordered alternation over the 2! orderings. The
    purchase anchor makes candidate triples non-overlapping, so the
    oracle is a plain two-step lead enumeration."""
    from flink_efo_spark.operators.cep import match_recognize

    out = match_recognize(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="P PERMUTE(S, E)",
        defines={
            "P": "event_type = 'purchase'",
            "S": "event_type = 'signup'",
            "E": "event_type = 'error'",
        },
        measures={
            "p_id": ("P", "first", "event_id"),
            "signup_id": ("S", "first", "event_id"),
            "error_id": ("E", "first", "event_id"),
        },
        tiebreak="event_id",
    )
    return out.select("user_id", "p_id", "signup_id", "error_id")


@_q(
    "stream_interval_join",
    """
    SELECT a.event_id AS click_id, b.event_id AS error_id,
           a.user_id AS user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'error'
    """,
)
def q_stream_interval_join(t: _T) -> DataFrame:
    """STREAM-stream interval join (StreamExecWindowJoin.scala:53 /
    TimeBoundedStreamJoin.java:52): watermarks on both sides bound the
    state; the same interval_join operator drives batch and stream."""
    from flink_efo_spark.operators.joins import interval_join
    from flink_efo_spark.streaming import run_stream_to_table, stream_table

    ev_l = stream_table(
        t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes")
    ).where(F.col("event_type") == "click")
    ev_r = stream_table(
        t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes")
    ).where(F.col("event_type") == "error")
    joined = interval_join(
        ev_l, ev_r, "user_id", "ts", "ts",
        "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES",
    )
    out = joined.select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
        F.col("l.user_id").alias("user_id"),
    )
    return run_stream_to_table(out)


# ---------------------------------------------------------------------------
# subquery shapes (FlinkSubQueryRemoveRule / decorrelation, SURVEY §4.1) and
# CASE aggregation — classic TPC-H shapes the reference's corpus exercises
# ---------------------------------------------------------------------------


@_q(
    "scalar_subquery",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0)
      AND c_custkey % 7 = 0
    """,
)
def q_scalar_subquery(t: _T) -> DataFrame:
    """Scalar subquery in a predicate (TPC-H Q22 shape) — Catalyst
    plans the subquery as a broadcast scalar value."""
    t.customer.createOrReplaceTempView("__efo_customer")
    return t.spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM __efo_customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM __efo_customer
                           WHERE c_acctbal > 0.0)
          AND c_custkey % 7 = 0
        """
    )


@_q(
    "exists_correlated",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48)
    GROUP BY o.o_orderpriority
    """,
)
def q_exists_correlated(t: _T) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) — rewritten to a semi join
    by Catalyst (the reference: FlinkSubQueryRemoveRule)."""
    t.orders.createOrReplaceTempView("__efo_orders")
    t.lineitem.createOrReplaceTempView("__efo_lineitem")
    return t.spark.sql(
        """
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM __efo_orders o
        WHERE EXISTS (
          SELECT 1 FROM __efo_lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48)
        GROUP BY o.o_orderpriority
        """
    )


@_q(
    "case_agg",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4)
             AS promo_revenue_pct,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity > 30
    """,
)
def q_case_agg(t: _T) -> DataFrame:
    """CASE inside aggregates + LIKE predicate (TPC-H Q14 shape)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        t.lineitem.where(F.col("l_quantity") > 30)
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@_q(
    "stream_group_agg",
    """
    SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_stream_group_agg(t: _T) -> DataFrame:
    """Streaming unwindowed group aggregation in UPDATE mode
    (StreamExecGroupAggregate.scala:52 / GroupAggFunction.java:43):
    continuously-updated per-key aggregates; the bounded replay's
    final update equals the batch result."""
    from flink_efo_spark.streaming import (
        infer_output_mode,
        run_stream_to_table,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    assert infer_output_mode(agg) == "update"
    return run_stream_to_table(agg)


@_q(
    "stream_upsert_changelog",
    """
    SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_stream_upsert_changelog(t: _T) -> DataFrame:
    """Changelog/retraction round-trip THROUGH A REAL SINK: the
    update-mode group aggregate (the reference's retract stream,
    GroupAggFunction.java:43 emitting -U/+U) is driven through the
    log-structured parquet upsert sink (stream_upsert_sink) over a
    GENUINE multi-batch replay (the source is re-laid-out as 4 files,
    maxFilesPerTrigger=1 → 4 triggers, each re-emitting updated
    groups), then resolved last-writer-wins. The final table must
    equal the batch GROUP BY — the end-to-end proof that a user gets
    a correct continuously-updated sink, not just a correct in-memory
    harness result."""
    import tempfile

    from flink_efo_spark.streaming import run_stream_to_table

    src_dir = tempfile.mkdtemp(prefix="efo-chlog-src-") + "/data"
    t.events.select("event_type", "value").repartition(4).write.parquet(src_dir)
    schema = t.spark.read.parquet(src_dir).schema
    src = (
        t.spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = src.groupBy("event_type").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    return run_stream_to_table(agg, update_keys=["event_type"])


@_q(
    "debezium_decode",
    """
    WITH o AS (
      SELECT user_id, value, row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, '+I' AS row_kind, CAST(1 AS BIGINT) AS n_rows,
           round(sum(CASE WHEN rn = 1 THEN value END), 2) AS sum_v
    FROM o GROUP BY user_id
    UNION ALL
    SELECT user_id, '-U', CAST(max(n) - 1 AS BIGINT),
           round(sum(CASE WHEN rn < n THEN value END), 2)
    FROM o GROUP BY user_id HAVING max(n) > 1
    UNION ALL
    SELECT user_id, '+U', CAST(max(n) - 1 AS BIGINT),
           round(sum(CASE WHEN rn > 1 THEN value END), 2)
    FROM o GROUP BY user_id HAVING max(n) > 1
    """,
)
def q_debezium_decode(t: _T) -> DataFrame:
    """Debezium CDC JSON format (flink-formats/flink-json
    debezium/DebeziumJsonDeserializationSchema.java): a per-user
    value-update CDC log is SERIALIZED to Debezium JSON (first event
    = op 'c', later = op 'u' carrying the before-image) and decoded
    back through ``io.debezium_json_decode`` into +I/-U/+U changelog
    rows. The oracle computes the expected decoded aggregate straight
    from the spec (first value = +I; all-but-last = -U befores;
    all-but-first = +U afters), so the JSON round-trip and op mapping
    are hash-checked end-to-end."""
    from flink_efo_spark.io import debezium_json_decode

    w = "PARTITION BY user_id ORDER BY ts, event_id"
    src = t.events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.expr(f"lag(value) OVER ({w})").alias("__pv"),
    )
    msgs = src.select(
        F.expr(
            "to_json(named_struct("
            "'before', CASE WHEN __pv IS NULL THEN NULL "
            "ELSE named_struct('user_id', user_id, 'v', __pv) END, "
            "'after', named_struct('user_id', user_id, 'v', value), "
            "'op', CASE WHEN __pv IS NULL THEN 'c' ELSE 'u' END))"
        ).alias("value")
    )
    decoded = debezium_json_decode(msgs, "value", "user_id BIGINT, v DOUBLE")
    return decoded.groupBy("user_id", "row_kind").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("v"), 2).alias("sum_v"),
    )


@_q(
    "timer_sessions",
    """
    WITH o AS (
      SELECT user_id, ts,
             sum(new) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS sid
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))),
    s AS (
      SELECT user_id, sid,
             CAST(floor(epoch_us(min(ts)) / 1000) * 1000 AS BIGINT)
               AS session_start_us,
             CAST(floor(epoch_us(max(ts)) / 1000) * 1000 AS BIGINT)
               AS session_last_us,
             count(*) AS n_events
      FROM o GROUP BY user_id, sid),
    wm AS (SELECT CAST(floor(max(epoch_us(ts)) / 1000) AS BIGINT) - 600000
             AS w FROM events),
    m AS (SELECT user_id, max(session_last_us) AS mx FROM s GROUP BY user_id)
    SELECT s.user_id, session_start_us, session_last_us, n_events
    FROM s JOIN m USING (user_id), wm
    WHERE session_last_us < mx
       OR (session_last_us / 1000 + 1800000) <= wm.w
    """,
)
def q_timer_sessions(t: _T) -> DataFrame:
    """ProcessFunction + event-time timer (KeyedProcessFunction.java +
    InternalTimerService — the reference's canonical timer example):
    per-key session summaries emitted when the inactivity timer at
    last_ts + gap fires, or inline when a later event exceeds the
    gap. The oracle replays both emission rules: every non-final
    session per key, plus the final one iff the end-of-replay
    watermark passed its timer."""
    from flink_efo_spark.streaming import (
        process_timer_sessions,
        run_stream_to_table,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes"))
    out = process_timer_sessions(ev, "user_id", "ts", "30 minutes")
    return run_stream_to_table(out, mode="append")


@_q(
    "canal_decode",
    """
    WITH o AS (
      SELECT user_id, value, row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, '+I' AS row_kind, CAST(1 AS BIGINT) AS n_rows,
           round(sum(CASE WHEN rn = 1 THEN value END), 2) AS sum_v
    FROM o GROUP BY user_id
    UNION ALL
    SELECT user_id, '-U', CAST(max(n) - 1 AS BIGINT),
           round(sum(CASE WHEN rn < n THEN value END), 2)
    FROM o GROUP BY user_id HAVING max(n) > 1
    UNION ALL
    SELECT user_id, '+U', CAST(max(n) - 1 AS BIGINT),
           round(sum(CASE WHEN rn > 1 THEN value END), 2)
    FROM o GROUP BY user_id HAVING max(n) > 1
    """,
)
def q_canal_decode(t: _T) -> DataFrame:
    """Canal CDC JSON (flink-formats/flink-json
    canal/CanalJsonDeserializationSchema.java): the same per-user CDC
    log as debezium_decode, serialized in Canal's batch shape —
    data/old arrays with the partial-old before-image (only the
    changed field present; the decoder's coalesce(old, data) merge
    restores it) — and decoded back to +I/-U/+U rows. Same direct-
    from-spec oracle as the Debezium twin."""
    from flink_efo_spark.io import canal_json_decode

    w = "PARTITION BY user_id ORDER BY ts, event_id"
    src = t.events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.expr(f"lag(value) OVER ({w})").alias("__pv"),
    )
    msgs = src.select(
        F.expr(
            "to_json(named_struct("
            "'data', array(named_struct('user_id', user_id, 'v', value)), "
            # Canal's old array holds ONLY changed fields: v, not the key
            "'old', CASE WHEN __pv IS NULL THEN NULL ELSE "
            "array(named_struct('user_id', cast(null as bigint), 'v', __pv)) END, "
            "'type', CASE WHEN __pv IS NULL THEN 'INSERT' ELSE 'UPDATE' END))"
        ).alias("value")
    )
    decoded = canal_json_decode(msgs, "value", "user_id BIGINT, v DOUBLE")
    return decoded.groupBy("user_id", "row_kind").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("v"), 2).alias("sum_v"),
    )


@_q(
    "stream_changelog",
    """
    SELECT event_type, cnt, sum_value FROM (
      SELECT event_type, count(*) AS cnt,
             round(sum(value), 4) AS sum_value
      FROM events GROUP BY event_type
    ) ORDER BY event_type
    """,
)
def q_stream_changelog(t: _T) -> DataFrame:
    """Explicit RowKind changelog surface (RowKind.java:27-58,
    GroupAggFunction.java:43): an update-mode group aggregate is
    replayed over a DETERMINISTIC 4-batch time-sliced stream, its
    upsert log is derived into +I/-U/+U rows with before-images
    (read_changelog), and the final table is reconstructed FROM THE
    CHANGELOG ALONE via retract multiset semantics (apply_changelog).
    Equality with the batch GROUP BY proves the whole retract
    round-trip: emit → log → changelog → materialize."""
    import os
    import tempfile

    from flink_efo_spark.streaming import (
        apply_changelog,
        read_changelog,
        stream_table_split,
        stream_upsert_sink,
    )

    src = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=4, order_col="ts"
    )
    agg = src.groupBy("event_type").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    out_dir = os.path.join(tempfile.mkdtemp(prefix="efo-chlog-"), "data")
    q = stream_upsert_sink(agg, ["event_type"], out_dir, mode="update")
    q.awaitTermination()
    changelog = read_changelog(t.spark, out_dir, ["event_type"])
    return (
        apply_changelog(changelog, ["event_type"])
        .select("event_type", "cnt", "sum_value")
        .orderBy("event_type")
    )


@_q(
    "stream_early_fire",
    """
    SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) * 1000000
             AS w_start_us,
           event_type, count(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_early_fire(t: _T) -> DataFrame:
    """Early-fire window emission (WindowEmitStrategy.scala:33 +
    R/window/triggers/): a 1-day tumble over a 4-trigger time-sliced
    replay runs in UPDATE mode through the upsert sink, so every
    trigger emits the windows' cumulative-so-far partials (the
    early fires); last-writer-wins resolution yields the final
    values, which must equal the batch windowed aggregate. The fire
    log is asserted non-trivial (some window fired more than once) —
    the partial-emission behavior itself, not just the final state."""
    from flink_efo_spark.streaming import (
        stream_table_split,
        tumble_agg,
        window_early_fire,
    )

    src = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=4, order_col="ts"
    )
    agg = tumble_agg(
        src, "ts", "1 day", ["event_type"], F.count("*").alias("cnt")
    )
    fire_log, final = window_early_fire(agg, ["w_start", "event_type"])
    n_multi = (
        fire_log.groupBy("w_start", "event_type")
        .agg(F.countDistinct("__batch_id").alias("fires"))
        .where(F.col("fires") > 1)
        .count()
    )
    if n_multi == 0:
        raise AssertionError(
            "early-fire replay produced no multi-trigger window — "
            "partial emission is not happening"
        )
    return final.select(
        _us("w_start").alias("w_start_us"), "event_type", "cnt"
    )


@_q(
    "stream_asof_join",
    """
    SELECT p.event_id, round(b.bval, 4) AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    LEFT JOIN LATERAL (
      SELECT b.value AS bval FROM events b
      WHERE b.event_type = 'signup' AND b.user_id = p.user_id
        AND b.ts <= p.ts
      ORDER BY b.ts DESC, b.value DESC LIMIT 1
    ) b ON true
    """,
)
def q_stream_asof_join(t: _T) -> DataFrame:
    """STREAMING row-time temporal join
    (TemporalRowTimeJoinOperator.java:72): build-side history buffered
    in keyed state across micro-batches; probe rows match as-of their
    event time."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_asof_join,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    build = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    out = stream_asof_join(probe, build, "user_id", "ts", "ts", "value")
    return run_stream_to_table(out).select(
        "event_id", F.round("asof_value", 4).alias("asof_value")
    )


@_q(
    "stream_session",
    """
    WITH sess AS (
      SELECT user_id, min(ts) AS s_start, max(ts) AS s_end,
             count(*) AS n_events
      FROM (
        SELECT user_id, ts,
               sum(CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        FROM (SELECT user_id, ts, event_id,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_ts
              FROM events))
      GROUP BY user_id, sid),
    wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
    SELECT user_id, epoch_us(s_start) AS session_start_us,
           CAST(n_events AS BIGINT) AS n_events
    FROM sess
    WHERE s_end + INTERVAL 30 MINUTE <= (SELECT w FROM wm)
    """,
)
def q_stream_session(t: _T) -> DataFrame:
    """STREAMING session windows (SessionWindowAssigner.java:36 with
    merging): append mode emits exactly the sessions closed by the
    final watermark (session end = last event + gap)."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        session_agg,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes"))
    agg = session_agg(ev, "ts", "30 minutes", ["user_id"], F.count("*").alias("n_events"))
    return run_stream_to_table(agg).select(
        "user_id",
        F.unix_micros("w_start").alias("session_start_us"),
        "n_events",
    )


@_q(
    "decimal_arith",
    """
    SELECT id,
           CAST(CAST(a AS DECIMAL(12,2)) + CAST(b AS DECIMAL(12,2)) AS VARCHAR)
             AS s,
           CAST(CAST(CAST(a AS DECIMAL(12,2)) * CAST(b AS DECIMAL(12,2))
                AS DECIMAL(20,4)) AS VARCHAR) AS p,
           CAST(CAST(round(CAST(a AS DECIMAL(12,2)) / 3, 4) AS DECIMAL(20,4))
                AS VARCHAR) AS q
    FROM (VALUES (1, '1234567.89', '0.01'),
                 (2, '-0.05', '99.99'),
                 (3, '0.10', '0.20')) t(id, a, b)
    """,
)
def q_decimal_arith(t: _T) -> DataFrame:
    """DECIMAL(p,s) arithmetic (DecimalITCase; SURVEY §1.3) — exact
    fixed-point results serialized as strings for cross-engine
    comparison."""
    rows = [(1, "1234567.89", "0.01"), (2, "-0.05", "99.99"), (3, "0.10", "0.20")]
    df = t.spark.createDataFrame(rows, "id int, a string, b string")
    a = F.col("a").cast("decimal(12,2)")
    b = F.col("b").cast("decimal(12,2)")
    return df.select(
        "id",
        (a + b).cast("string").alias("s"),
        (a * b).cast("decimal(20,4)").cast("string").alias("p"),
        F.round(a / 3, 4).cast("decimal(20,4)").cast("string").alias("q"),
    )


@_q(
    "over_range_frame",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW), 4)
             AS rolling_30m,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_30m
    FROM events
    """,
)
def q_over_range_frame(t: _T) -> DataFrame:
    """RANGE frame over-window (BatchExecOverAggregate.scala:73,
    RangeSlidingOverFrame): rolling 30-minute window keyed on the
    event-time value, exact frame-spec mapping to Spark rangeBetween."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_seconds(F.col("ts")))
        .rangeBetween(-1800, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("rolling_30m"),
        F.count("*").over(w).alias("n_30m"),
    )


@_q(
    "stream_hop",
    """
    WITH wm AS (SELECT epoch(max(ts)) - 600 AS w FROM events)
    SELECT w_start * 1000000 AS w_start_us, count(*) AS cnt
    FROM (
      SELECT unnest([CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - 300,
                     CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)]) AS w_start
      FROM events)
    GROUP BY w_start
    HAVING w_start + 600 <= (SELECT w FROM wm)
    """,
)
def q_stream_hop(t: _T) -> DataFrame:
    """STREAMING HOP (sliding) windows, append mode: emits windows
    finalized by the final watermark (window end <= max_ts - delay)."""
    from flink_efo_spark.streaming import hop_agg, run_stream_to_table, stream_table

    ev = stream_table(t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes"))
    agg = hop_agg(ev, "ts", "10 minutes", "5 minutes", [], F.count("*").alias("cnt"))
    return run_stream_to_table(agg).select(
        F.unix_micros("w_start").alias("w_start_us"), "cnt"
    )


@_q(
    "tpch_q5_local_supplier",
    """
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1994-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(t: _T) -> DataFrame:
    """TPC-H Q5 shape: six-way join with a dimension chain — exercises
    join reordering / broadcast selection across fact + dims."""
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q10_returns",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(t: _T) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking."""
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t.lineitem.where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_q(
    "tpch_q3_shipping",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           epoch_us(o.o_orderdate) AS o_orderdate_us
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(t: _T) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dim filter
    (c_mktsegment) → join fact chain → agg → top-N. The customer
    filter is pushed to the scan and the filtered customer side is
    the small one — AQE broadcast-joins it against orders; lineitem's
    shipdate predicate prunes before the join."""
    return (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(
            t.lineitem.where(
                F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp_ltz")).alias(
                "o_orderdate_us"
            ),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_q(
    "tpch_q6_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(t: _T) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue): pure scan-filter-aggregate;
    every predicate reaches the parquet scan (PushedFilters) and the
    whole plan is one codegen stage with a partial/final agg pair —
    the canonical 'no shuffle but one row' query."""
    return t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


@_q(
    "tpch_q1_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(t: _T) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical scan-heavy hash
    aggregate (BatchExecHashAggregate.scala) — filter pushed to the
    parquet scan, map-side partial aggregation, 6 aggregates in one
    pass."""
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        t.lineitem.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "tpch_q18_large_orders",
    """
    SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS total,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
    """,
)
def q_tpch_q18(t: _T) -> DataFrame:
    """TPC-H Q18 shape: large-quantity orders via an IN (grouped
    HAVING) subquery — Catalyst plans the subquery as a left-semi
    aggregate join; the big lineitem join shuffles on orderkey only."""
    li = t.lineitem
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .where(F.col("__sq") > 250)
        .select("l_orderkey")
    )
    li2 = t.lineitem  # fresh scan for the detail join (self-join safe)
    return (
        t.orders.join(big, F.col("o_orderkey") == big["l_orderkey"], "left_semi")
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(li2, F.col("o_orderkey") == li2["l_orderkey"])
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# §2.5 count windows (CountTumblingWindowAssigner.java, CountTrigger.java)
# and dynamic-gap sessions (DynamicEventTimeSessionWindows.java:47)
# ---------------------------------------------------------------------------


@_q(
    "count_window_agg",
    """
    WITH o AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) - 1 AS rn
      FROM events)
    SELECT user_id, CAST(floor(rn / 5) AS INT) AS w_idx,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(value), 4) AS sum_value
    FROM o GROUP BY user_id, w_idx HAVING count(*) = 5
    """,
)
def q_count_window_agg(t: _T) -> DataFrame:
    """Streaming per-key count-tumbling window (DataStream
    ``countWindow(5)``: CountTumblingWindowAssigner.java +
    CountTrigger.java:42): windows fire at exactly 5 elements;
    the trailing partial window never fires. Oracle buckets by
    row_number — the batch ground truth of arrival-order counting."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_count_tumble,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events")
    out = stream_count_tumble(
        ev.select("user_id", "ts", "event_id", "value"),
        ["user_id"],
        5,
        "value",
        order_by=["ts", "event_id"],
    )
    return run_stream_to_table(out).select(
        "user_id", "w_idx", "cnt", F.round("sum_value", 4).alias("sum_value")
    )


@_q(
    "count_slide_agg",
    """
    WITH o AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS c,
             sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s
      FROM events)
    SELECT user_id, CAST(rn / 2 AS INT) AS w_idx, CAST(c AS BIGINT) AS cnt,
           round(s, 4) AS sum_value
    FROM o WHERE rn % 2 = 0
    """,
)
def q_count_slide_agg(t: _T) -> DataFrame:
    """Streaming count-SLIDING window (DataStream ``countWindow(5, 2)``:
    CountSlidingWindowAssigner + CountTrigger(2) + CountEvictor(5)):
    every 2nd row fires the last ≤5 rows. Oracle = ROWS-frame window
    + modulo filter."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_count_slide,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events")
    out = stream_count_slide(
        ev.select("user_id", "ts", "event_id", "value"),
        ["user_id"],
        size=5,
        slide=2,
        value_col="value",
        order_by=["ts", "event_id"],
    )
    return run_stream_to_table(out).select(
        "user_id", "w_idx", "cnt", F.round("sum_value", 4).alias("sum_value")
    )


@_q(
    "window_session_dynamic",
    """
    WITH e AS (
      SELECT user_id, ts, value, event_id,
             ts + CASE WHEN event_type = 'click' THEN INTERVAL 30 MINUTE
                       ELSE INTERVAL 10 MINUTE END AS w_end
      FROM events),
    m AS (
      SELECT *, max(w_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM e),
    s AS (
      SELECT *, sum(CASE WHEN prev_max IS NULL OR ts > prev_max
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      FROM m)
    SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def q_window_session_dynamic(t: _T) -> DataFrame:
    """Dynamic-gap session windows
    (DynamicEventTimeSessionWindows.java:47 /
    SessionWindowTimeGapExtractor): the inactivity gap is a PER-ROW
    expression — 30 min after a click, 10 min otherwise. Spark's
    session_window takes the gap as a Column natively; the oracle
    sessionizes with a running max of per-row window ends."""
    from flink_efo_spark.streaming import session_agg

    # session_window's dynamic gap must be CalendarIntervalType —
    # make_interval, not the (DayTimeInterval-typed) interval literal
    gap = F.expr(
        "case when event_type = 'click' then make_interval(0,0,0,0,0,30,0) "
        "else make_interval(0,0,0,0,0,10,0) end"
    )
    out = session_agg(
        t.events,
        "ts",
        gap,
        ["user_id"],
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return out.select(
        "user_id",
        _us("w_start").alias("session_start_us"),
        "n_events",
        "sum_value",
    )


@_q(
    "stream_match_funnel",
    """
    SELECT user_id, prev_id AS click_id, event_id AS purchase_id
    FROM (SELECT user_id, event_id, event_type,
                 lag(event_type) OVER w AS prev_et,
                 lag(event_id) OVER w AS prev_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE event_type = 'purchase' AND prev_et = 'click'
    """,
)
def q_stream_match_funnel(t: _T) -> DataFrame:
    """STREAMING MATCH_RECOGNIZE (StreamExecMatch.scala:68 + NFA.java /
    SharedBuffer.java:54): per-key partial-match state survives
    micro-batch boundaries; the bounded replay matches the batch
    funnel exactly."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import run_stream_to_table, stream_table

    ev = stream_table(t.spark, t.sf_dir, "events")
    out = stream_match_recognize(
        ev.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="A B",
        defines={"A": "event_type = 'click'", "B": "event_type = 'purchase'"},
        measures={
            "click_id": ("A", "first", "event_id"),
            "purchase_id": ("B", "last", "event_id"),
        },
        tiebreak="event_id",
    )
    return run_stream_to_table(out).select(
        "user_id", "click_id", "purchase_id"
    )


@_q(
    "stream_match_nested",
    """
    WITH ordered AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER w AS rn,
             lead(event_type) OVER w AS nxt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), pairs AS (
      SELECT user_id, rn FROM ordered
      WHERE event_type = 'click' AND nxt = 'purchase'
    ), islands AS (
      SELECT user_id, rn,
             rn - 2 * row_number()
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM pairs
    ), chains AS (
      SELECT user_id, min(rn) AS s, count(*) AS m
      FROM islands GROUP BY user_id, grp
    )
    SELECT c.user_id,
           CAST(row_number() OVER (PARTITION BY c.user_id ORDER BY c.s)
                AS BIGINT) AS match_seq,
           c.m AS n_pairs, a.event_id AS signup_id, d.event_id AS error_id
    FROM chains c
    JOIN ordered a ON a.user_id = c.user_id AND a.rn = c.s - 1
                   AND a.event_type = 'signup'
    JOIN ordered d ON d.user_id = c.user_id AND d.rn = c.s + 2 * c.m
                   AND d.event_type = 'error'
    """,
)
def q_stream_match_nested(t: _T) -> DataFrame:
    """STREAMING MATCH_RECOGNIZE with a NESTED quantified pattern
    group — ``A (B C)+ D`` (flink-cep GroupPattern.java, the nested
    cases of MatchRecognizeITCase; NFA.java + SharedBuffer.java:54
    keep partial nested matches alive across input) — on a 2-batch
    event-time replay, so partial GROUP state crosses micro-batch
    boundaries. The oracle enumerates maximal adjacent click→purchase
    chains (gaps-and-islands) anchored by an immediately-preceding
    signup and an immediately-following error; greedy consumption
    makes the maximal chain the unique match."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_table_split,
    )

    ev = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=2, order_col="ts"
    )
    out = stream_match_recognize(
        ev.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="A (B C)+ D",
        defines={
            "A": "event_type = 'signup'",
            "B": "event_type = 'click'",
            "C": "event_type = 'purchase'",
            "D": "event_type = 'error'",
        },
        measures={
            "n_pairs": ("B", "count", "event_id"),
            "signup_id": ("A", "first", "event_id"),
            "error_id": ("D", "last", "event_id"),
        },
        tiebreak="event_id",
    )
    return run_stream_to_table(out).select(
        "user_id", "match_seq", "n_pairs", "signup_id", "error_id"
    )


@_q(
    "delta_trigger_window",
    """
    WITH RECURSIVE ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), walk AS (
      SELECT user_id, rn, value, value AS last_fire, FALSE AS fired
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.value,
             CASE WHEN abs(o.value - w.last_fire) > 60.0 THEN o.value
                  ELSE w.last_fire END,
             abs(o.value - w.last_fire) > 60.0
      FROM ordered o JOIN walk w
        ON o.user_id = w.user_id AND o.rn = w.rn + 1
    ), seg AS (
      SELECT user_id, rn, value, fired,
             count(*) FILTER (WHERE fired) OVER (
               PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seg_id
      FROM walk
    ), agg AS (
      SELECT user_id, seg_id, count(*) AS cnt,
             round(sum(value), 4) AS sum_value,
             round(min(value), 4) AS min_value,
             round(max(value), 4) AS max_value,
             bool_or(fired) AS has_fire,
             max(CASE WHEN fired THEN value END) AS fire_value
      FROM seg GROUP BY user_id, seg_id
    )
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY seg_id)
                AS BIGINT) AS fire_seq,
           cnt, sum_value, min_value, max_value,
           round(fire_value, 4) AS fire_value
    FROM agg WHERE has_fire
    """,
)
def q_delta_trigger_window(t: _T) -> DataFrame:
    """Delta-triggered purging global window (§2.15 extension for the
    reference's custom-trigger tail: DeltaTrigger.java:54 wrapped in
    PurgingTrigger.java): per user, a row fires when its value moved
    more than 60.0 from the LAST firing row's value; each fire emits
    the aggregate of the rows since the previous fire and purges. The
    DuckDB oracle replays the same per-element trigger scan as a
    recursive CTE (last_fire is inherently sequential state)."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_delta_window,
        stream_table_split,
    )

    ev = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=2, order_col="ts"
    )
    out = stream_delta_window(
        ev.select("user_id", "event_id", "ts", "value"),
        ["user_id"],
        "value",
        threshold=60.0,
        order_by=["ts", "event_id"],
        purge=True,
    )
    return run_stream_to_table(out).select(
        "user_id",
        "fire_seq",
        "cnt",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        F.round("fire_value", 4).alias("fire_value"),
    )


@_q(
    "stream_over_rows_bounded",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER w, 4)  AS frame_sum,
           count(value) OVER w          AS frame_cnt,
           round(min(value) OVER w, 4)  AS frame_min,
           round(max(value) OVER w, 4)  AS frame_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    """,
)
def q_stream_over_rows_bounded(t: _T) -> DataFrame:
    """Streaming OVER with a bounded ROWS frame
    (RowTimeRowsBoundedPrecedingFunction.java:60, OverWindowITCase):
    every event is emitted with sum/count/min/max over itself + the 5
    previous rows of its user, with the ring-buffer state crossing
    micro-batch boundaries. Keyed state is O(frame), not O(history)."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_over_bounded,
        stream_table_split,
    )

    ev = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=2, order_col="ts"
    )
    out = stream_over_bounded(
        ev.select("user_id", "event_id", "ts", "value"),
        ["user_id"],
        "ts",
        "value",
        rows_preceding=5,
        tiebreak="event_id",
    )
    return run_stream_to_table(out).select(
        "user_id",
        "event_id",
        F.round("frame_sum", 4).alias("frame_sum"),
        "frame_cnt",
        F.round("frame_min", 4).alias("frame_min"),
        F.round("frame_max", 4).alias("frame_max"),
    )


@_q(
    "stream_over_range_bounded",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER w, 4)  AS frame_sum,
           count(value) OVER w          AS frame_cnt,
           round(min(value) OVER w, 4)  AS frame_min,
           round(max(value) OVER w, 4)  AS frame_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)
    """,
)
def q_stream_over_range_bounded(t: _T) -> DataFrame:
    """Streaming OVER with a bounded RANGE frame
    (RowTimeRangeBoundedPrecedingFunction.java:60, OverWindowITCase):
    each event aggregates every row of its user within the trailing
    1-day interval [ts - 1d, ts], inclusive and peer-inclusive —
    the reference's same-timestamp batching. State retains only the
    trailing interval of the newest timestamp per key."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_over_bounded,
        stream_table_split,
    )

    ev = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=2, order_col="ts"
    )
    out = stream_over_bounded(
        ev.select("user_id", "event_id", "ts", "value"),
        ["user_id"],
        "ts",
        "value",
        range_preceding="1 day",
    )
    return run_stream_to_table(out).select(
        "user_id",
        "event_id",
        F.round("frame_sum", 4).alias("frame_sum"),
        "frame_cnt",
        F.round("frame_min", 4).alias("frame_min"),
        F.round("frame_max", 4).alias("frame_max"),
    )


@_q(
    "stream_match_overlap",
    """
    WITH o AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), c AS (
      SELECT user_id, event_id, rn,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
               AS grp
      FROM o WHERE event_type = 'click'
    ), runs AS (
      SELECT user_id, grp, max(rn) AS end_rn FROM c GROUP BY user_id, grp
    ), p AS (
      SELECT user_id, event_id AS purchase_id, rn
      FROM o WHERE event_type = 'purchase'
    )
    SELECT c.user_id,
           CAST(row_number() OVER (PARTITION BY c.user_id ORDER BY c.rn)
                AS BIGINT) AS match_seq,
           c.event_id AS first_click, p.purchase_id
    FROM c
    JOIN runs r ON r.user_id = c.user_id AND r.grp = c.grp
    JOIN p ON p.user_id = c.user_id AND p.rn = r.end_rn + 1
    """,
)
def q_stream_match_overlap(t: _T) -> DataFrame:
    """STREAMING AFTER MATCH SKIP TO NEXT ROW — OVERLAPPING matches
    (AfterMatchSkipStrategy.java SKIP_TO_NEXT_ROW; the sliding-funnel
    counting mode) on a 3-batch replay: ``A+ B`` with A=click,
    B=purchase emits one match per click of each click-run that ends
    at a purchase. The frontier emission rule (operators/cep.py) must
    reproduce the batch match set and numbering across micro-batch
    boundaries; the oracle enumerates click-runs (gaps-and-islands)
    joined to their terminating purchase."""
    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_table_split,
    )

    ev = stream_table_split(
        t.spark, t.sf_dir, "events", n_batches=3, order_col="ts"
    )
    out = stream_match_recognize(
        ev.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="A+ B",
        defines={"A": "event_type = 'click'", "B": "event_type = 'purchase'"},
        measures={
            "first_click": ("A", "first", "event_id"),
            "purchase_id": ("B", "last", "event_id"),
        },
        tiebreak="event_id",
        after_match="to_next_row",
    )
    return run_stream_to_table(out).select(
        "user_id", "match_seq", "first_click", "purchase_id"
    )


@_q(
    "stream_sort_limit",
    """
    SELECT event_id, user_id, round(value, 4) AS value
    FROM events ORDER BY value DESC, event_id LIMIT 15
    """,
)
def q_stream_sort_limit(t: _T) -> DataFrame:
    """Streaming GLOBAL sort-limit (StreamExecSortLimit.scala:50):
    keyless ORDER BY ... LIMIT n continuously maintained — local
    per-partition prune, then a single top-n buffer."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_sort_limit,
        stream_table,
    )

    ev = stream_table(t.spark, t.sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    out = stream_sort_limit(ev, "value", 15, ascending=False, tiebreak="event_id")
    return run_stream_to_table(out).select(
        "event_id", "user_id", F.round("value", 4).alias("value")
    )


@_q(
    "stream_semi_join",
    """
    SELECT a.event_id, a.user_id
    FROM events a
    WHERE a.event_type = 'click' AND EXISTS (
      SELECT 1 FROM events b
      WHERE b.event_type = 'error' AND b.user_id = a.user_id
        AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE)
    """,
)
def q_stream_semi_join(t: _T) -> DataFrame:
    """STREAMING time-bounded EXISTS (StreamingSemiAntiJoinOperator in
    the reference; here the built-in left-semi stream-stream interval
    join). Semi emission is match-driven — no watermark wait — so the
    bounded replay matches the batch EXISTS exactly."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_semi_join,
        stream_table,
    )

    clicks = stream_table(
        t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes")
    ).where(F.col("event_type") == "click")
    errors = stream_table(
        t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes")
    ).where(F.col("event_type") == "error")
    out = stream_semi_join(
        clicks.select("event_id", "user_id", "ts"), errors,
        "user_id", "ts", "ts", "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES",
    )
    return run_stream_to_table(out).select("event_id", "user_id")


@_q(
    "stream_anti_join",
    """
    SELECT a.event_id, a.user_id
    FROM events a
    WHERE a.event_type = 'click' AND NOT EXISTS (
      SELECT 1 FROM events b
      WHERE b.event_type = 'error' AND b.user_id = a.user_id
        AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE)
    """,
)
def q_stream_anti_join(t: _T) -> DataFrame:
    """STREAMING time-bounded NOT EXISTS — the hard streaming case:
    anti rows only emit once the watermark closes their interval, and
    the query watermark is the MIN over both (filtered) inputs, so a
    bounded replay alone never closes the tail (the last click's
    interval needs a watermark past every side's final event). The
    reference solves this with a MAX_WATERMARK emitted when a bounded
    source finishes (StreamSource / bounded-stream semantics); the
    analog here is a sentinel batch (stream_table_split sentinel_rows)
    carrying one far-future click AND error on non-joinable keys —
    after it, the engine's final no-data flush batch evicts and emits
    every real anti row, making the bounded replay match batch NOT
    EXISTS exactly."""
    import datetime

    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_anti_join,
        stream_table_split,
    )

    max_ts = t.events.agg(F.max("ts")).collect()[0][0]
    far = max_ts + datetime.timedelta(minutes=30)
    src = stream_table_split(
        t.spark, t.sf_dir, "events", 4, "ts",
        sentinel_rows=[
            {"event_id": -1, "user_id": -1, "event_type": "click",
             "ts": far, "value": 0.0},
            {"event_id": -2, "user_id": -2, "event_type": "error",
             "ts": far, "value": 0.0},
        ],
    )
    clicks = (
        src.where(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "10 minutes")
    )
    errors = src.where(F.col("event_type") == "error").withWatermark(
        "ts", "10 minutes"
    )
    out = stream_anti_join(
        clicks, errors,
        "user_id", "ts", "ts", "INTERVAL 0 MINUTES", "INTERVAL 5 MINUTES",
    )
    return (
        run_stream_to_table(out)
        .where(F.col("user_id") >= 0)
        .select("event_id", "user_id")
    )


@_q(
    "stream_late_capture",
    """
    WITH b AS (
      SELECT *, ntile(4) OVER (ORDER BY reverse(CAST(event_id AS VARCHAR)))
        AS bk FROM events
    ), bm AS (
      SELECT bk, max(ts) AS mx FROM b GROUP BY bk
    ), pm AS (
      SELECT bk, max(mx) OVER (ORDER BY bk
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_mx
      FROM bm
    )
    SELECT b.event_type, count(*) AS n_late
    FROM b JOIN pm USING (bk)
    WHERE pm.prior_mx IS NOT NULL
      AND epoch_us(b.ts) < epoch_us(pm.prior_mx) - 1800 * 1000000
    GROUP BY b.event_type
    """,
)
def q_stream_late_capture(t: _T) -> DataFrame:
    """Late-data SIDE OUTPUT (WindowedStream.sideOutputLateData,
    WindowedStream.java:117): the events stream is replayed in 4
    batches split by REVERSED event-id digits — decorrelated from
    event time, so every batch mixes old and new timestamps — the
    engine tracks the watermark (max seen ts − 30 min) across
    batches, and rows below it are TEED to the late sink instead of
    silently dropped. The oracle replays the same batch assignment
    (ntile over the reversed id) and watermark recurrence in SQL."""
    from flink_efo_spark.streaming import capture_late_rows, stream_table_split

    src = stream_table_split(
        t.spark, t.sf_dir, "events", 4,
        "reverse(cast(event_id as string))",
    )
    _, late = capture_late_rows(src, "ts", 1800.0)
    return late.groupBy("event_type").agg(F.count("*").alias("n_late"))


@_q(
    "stream_prev_vpattern",
    """
    WITH c AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN value < lag(value) OVER w THEN 'D'
                  WHEN value > lag(value) OVER w THEN 'U'
                  ELSE 'N' END AS cls,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT *, rn - row_number()
                  OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp
      FROM c
    ), islands AS (
      SELECT user_id, cls, min(rn) AS srn, max(rn) AS ern,
             count(*) AS len
      FROM runs GROUP BY user_id, cls, grp
    ), paired AS (
      SELECT i.user_id, i.srn, i.len AS n_down, j.len AS n_up
      FROM islands i JOIN islands j
        ON i.user_id = j.user_id AND j.srn = i.ern + 1
       AND i.cls = 'D' AND j.cls = 'U'
    )
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY srn)
                AS BIGINT) AS match_seq,
           CAST(n_down AS BIGINT) AS n_down,
           CAST(n_up AS BIGINT) AS n_up
    FROM paired
    """,
)
def q_stream_prev_vpattern(t: _T) -> DataFrame:
    """STREAMING PREV(): the classic V-pattern ``D+ U+`` (value falls
    then rises, DEFINEs referencing ``prev_value``) over a 4-trigger
    replay with end-of-input flush. prev evaluation happens in the
    stateful worker over the sorted cross-batch buffer with a carried
    context row, so a fall judged against a PREVIOUSLY-CONSUMED rise
    still matches. Greedy D+/U+ consume whole runs, so matches are
    exactly adjacent (fall-run, rise-run) island pairs — the SQL
    oracle pairs lag-classified islands."""
    import datetime

    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_table_split,
    )

    max_ts = t.events.agg(F.max("ts")).collect()[0][0]
    src = stream_table_split(
        t.spark, t.sf_dir, "events", 4, "ts",
        watermark=("ts", "10 minutes"),
        sentinel_rows=[
            {"event_id": -1, "user_id": -1, "event_type": "__wm__",
             "ts": max_ts + datetime.timedelta(minutes=30), "value": 0.0}
        ],
    )
    out = stream_match_recognize(
        src.select("user_id", "event_id", "value", "ts"),
        ["user_id"],
        "ts",
        pattern="D+ U+",
        defines={"D": "value < prev_value", "U": "value > prev_value"},
        measures={
            "n_down": ("D", "count", "event_id"),
            "n_up": ("U", "count", "event_id"),
        },
        tiebreak="event_id",
        flush_on_timeout=True,
        # MAX_WATERMARK analog: the sentinel batch (max_ts+30min, 10min
        # delay => final watermark max_ts+20min) is the only thing past
        # this marker; mid-stream watermarks stay below max_ts
        end_of_input_ts=max_ts + datetime.timedelta(minutes=1),
    )
    return run_stream_to_table(out).select(
        "user_id", "match_seq", "n_down", "n_up"
    )


@_q(
    "stream_match_flush",
    """
    WITH o AS (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER w AS rn, lead(event_type) OVER w AS nxt
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT c.user_id, c.event_id AS start_id,
           CAST(COALESCE((SELECT min(x.rn) FROM o x
                          WHERE x.user_id = c.user_id AND x.rn > c.rn
                            AND x.event_type <> 'purchase'),
                         (SELECT max(y.rn) + 1 FROM o y
                          WHERE y.user_id = c.user_id))
                - c.rn - 1 AS BIGINT) AS n_purchases
    FROM o c WHERE c.event_type = 'click' AND c.nxt = 'purchase'
    """,
)
def q_stream_match_flush(t: _T) -> DataFrame:
    """STREAMING CEP with a GREEDY trailing quantifier (``A B+``) and
    end-of-input finalization: a purchase run at a key's data end is a
    held, still-extendable match — the reference closes it when the
    bounded source emits MAX_WATERMARK (NFA windowTime/stop semantics);
    here an event-time timeout per key plus a far-future sentinel
    batch finalizes every held match, so the bounded replay equals the
    batch matcher. Oracle: gaps-and-islands SQL (click followed by its
    maximal consecutive-purchase run)."""
    import datetime

    from flink_efo_spark.operators.cep import stream_match_recognize
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_table_split,
    )

    max_ts = t.events.agg(F.max("ts")).collect()[0][0]
    src = stream_table_split(
        t.spark, t.sf_dir, "events", 4, "ts",
        watermark=("ts", "10 minutes"),
        sentinel_rows=[
            {"event_id": -1, "user_id": -1, "event_type": "__wm__",
             "ts": max_ts + datetime.timedelta(minutes=30), "value": 0.0}
        ],
    )
    out = stream_match_recognize(
        src.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "ts",
        pattern="A B+",
        defines={"A": "event_type = 'click'", "B": "event_type = 'purchase'"},
        measures={
            "start_id": ("A", "first", "event_id"),
            "n_purchases": ("B", "count", "event_id"),
        },
        tiebreak="event_id",
        flush_on_timeout=True,
        # no within() on this pattern, so held greedy matches finalize
        # ONLY at the MAX_WATERMARK marker (timer arms directly at it —
        # idle keys cost nothing per batch)
        end_of_input_ts=max_ts + datetime.timedelta(minutes=1),
    )
    return (
        run_stream_to_table(out)
        .where(F.col("user_id") >= 0)
        .select("user_id", "start_id", "n_purchases")
    )


# ---------------------------------------------------------------------------
# TPC-H round 3b: Q7/Q13/Q14/Q15/Q17 shapes (the reference's batch SQL
# corpus exercises these in flink-table-planner-blink ITCases; tables
# here lack partsupp/shipmode/phone so shapes are adapted, noted per
# query)
# ---------------------------------------------------------------------------


@_q(
    "tpch_q7_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(t: _T) -> DataFrame:
    """TPC-H Q7 shape (nation-pair volume): 5-way join where the two
    nation sides broadcast, the OR-of-pairs predicate prunes after the
    dim joins, and the fact chain shuffles on its join keys only."""
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t.supplier.join(t.lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q13_custdist",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q_tpch_q13(t: _T) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with an extra non-equi conjunct, double aggregation. The
    second groupBy keys on the first agg's output — tiny shuffle."""
    return (
        t.customer.join(
            t.orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@_q(
    "tpch_q14_promo",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                   THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q_tpch_q14(t: _T) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share): conditional aggregate
    over a fact ⋈ broadcast-dim join; shipdate range reaches the
    parquet scan."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@_q(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_tpch_q15(t: _T) -> DataFrame:
    """TPC-H Q15 shape (top supplier): revenue CTE + scalar max
    subquery. Revenue is rounded to cents BEFORE the max-compare so
    the float equality is exact across engines. Catalyst broadcasts
    the one-row max."""
    t.lineitem.createOrReplaceTempView("__efo_lineitem")
    t.supplier.createOrReplaceTempView("__efo_supplier")
    return t.spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
          FROM __efo_lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM __efo_supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        """
    )


@_q(
    "tpch_q17_small_qty",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey,
                 round(0.2 * avg(l_quantity), 6) AS qty_bar
          FROM lineitem GROUP BY l_partkey) a
      ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.qty_bar
    """,
)
def q_tpch_q17(t: _T) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): correlated avg
    subquery decorrelated into a per-part aggregate self-join —
    exactly what Catalyst/the Blink planner do. The avg threshold is
    rounded (6 dp) on both sides so the float `<` never straddles
    engine-specific summation noise."""
    per_part = (
        t.lineitem.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg(F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_bar"))
    )
    return (
        t.lineitem.join(
            F.broadcast(t.part.where(F.col("p_brand") == "Brand#1")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(per_part, F.col("a_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_bar"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# LLM-pipeline round 3b: duplicate clustering (transitive closure of
# near-dup pairs), deterministic sampling, exact quantiles, embedding
# norms, TimeEvictor window shape
# ---------------------------------------------------------------------------

_PAIRS_SQL = """
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
        AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.6),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b AS s, id_a AS d FROM pairs),
    reach(a, b) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s),
    cc AS (
      SELECT a AS node, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a)
"""


@_q(
    "dup_clusters",
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + ", "
    + _PAIRS_SQL
    + """
    SELECT node, cluster_id FROM cc
    """,
)
def q_dup_clusters(t: _T) -> DataFrame:
    """Duplicate-group clustering: connected components (iterative
    min-label propagation, operators/clustering.py) over the
    MinHash-LSH near-dup pairs. The oracle computes the same
    transitive closure with a recursive CTE over exact-Jaccard pairs
    — so LSH recall AND the fixed-point are both hash-checked."""
    from flink_efo_spark.operators.clustering import connected_components

    pairs = minhash_near_duplicates(
        t.documents, "doc_id", "text",
        threshold=0.6, num_perm=12, bands=12, shingle_size=3,
    )
    return connected_components(pairs, "id_a", "id_b")


@_q(
    "dup_cluster_stats",
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + ", "
    + _PAIRS_SQL
    + """
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
           min(node) AS keep_id
    FROM cc GROUP BY cluster_id
    """,
)
def q_dup_cluster_stats(t: _T) -> DataFrame:
    """Per-cluster dedup decision: size + surviving representative
    (min id, the same keep rule as dedup_exact)."""
    from flink_efo_spark.operators.clustering import dup_cluster_stats

    pairs = minhash_near_duplicates(
        t.documents, "doc_id", "text",
        threshold=0.6, num_perm=12, bands=12, shingle_size=3,
    )
    return dup_cluster_stats(pairs, "id_a", "id_b")


@_q(
    "dedup_survivors",
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + ", "
    + _PAIRS_SQL
    + """
    SELECT d.doc_id, d.lang
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM cc WHERE node != cluster_id)
    """,
)
def q_dedup_survivors(t: _T) -> DataFrame:
    """The end-to-end near-dup dedup pipeline a training-data build
    actually runs: MinHash-LSH pairs → connected components → keep the
    min-id representative per cluster → anti-join the corpus against
    the non-representatives. Each stage shuffles ids/labels only —
    document bodies move zero times after shingling."""
    from flink_efo_spark.operators.clustering import connected_components

    docs = t.documents
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text",
        threshold=0.6, num_perm=12, bands=12, shingle_size=3,
    )
    cc = connected_components(pairs, "id_a", "id_b")
    losers = cc.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select("doc_id", "lang")


@_q(
    "sample_hash_bucket",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    """,
)
def q_sample_hash_bucket(t: _T) -> DataFrame:
    """Deterministic ~25% corpus sample: first hex digit of
    md5(doc_id) < 4. Unlike rand()-based sampling this is stable
    across runs/engines/retries — the property a reproducible
    training-data pipeline needs — and it is a narrow, shuffle-free
    map that scales embarrassingly."""
    return t.documents.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3"
        )
    ).select("doc_id", "lang")


@_q(
    "stratified_sample",
    """
    SELECT doc_id, lang, CAST(rn AS INT) AS rn
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents)
    WHERE rn <= 20
    """,
)
def q_stratified_sample(t: _T) -> DataFrame:
    """Deterministic stratified sample: fixed-size per-stratum (lang)
    draw ordered by a content-independent hash — reproducible
    reservoir-style sampling. Physical shape: one shuffle on the
    stratum key, WindowGroupLimit prunes to 20 per group map-side."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        t.documents.select(
            "doc_id", "lang", F.row_number().over(w).cast("int").alias("rn")
        )
        .where(F.col("rn") <= 20)
    )


@_q(
    "token_quantiles",
    """
    SELECT lang,
           round(quantile_cont(n_chars, 0.5), 4) AS p50,
           round(quantile_cont(n_chars, 0.9), 4) AS p90,
           round(quantile_cont(n_chars, 0.99), 4) AS p99,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def q_token_quantiles(t: _T) -> DataFrame:
    """Exact length quantiles per language (corpus length profile —
    the stats a tokenizer-budget planner reads). Spark `percentile`
    and DuckDB `quantile_cont` both use continuous interpolation, so
    values hash-match exactly. At 100 TB swap `percentile` for
    `percentile_approx` (t-digest sketch, map-side mergeable) — the
    exact version shuffles every group's values to one reducer."""
    return t.documents.groupBy("lang").agg(
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 4).alias("p99"),
        F.count("*").alias("n_docs"),
    )


@_q(
    "embedding_norm_stats",
    """
    SELECT label,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
             AS avg_norm,
           count(*) AS n_vecs
    FROM embeddings
    GROUP BY label
    """,
)
def q_embedding_norm_stats(t: _T) -> DataFrame:
    """Per-label embedding L2-norm profile via built-in higher-order
    functions (F.aggregate fold — JVM-side, no Python): the sanity
    check an embedding pipeline runs before cosine math (detects
    unnormalized / degenerate batches)."""
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return t.embeddings.groupBy("label").agg(
        F.round(F.avg(norm), 6).alias("avg_norm"),
        F.count("*").alias("n_vecs"),
    )


@_q(
    "chunk_documents",
    """
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split(trim(lower(text)), ' '),
                         t -> t <> '') AS ts
      FROM documents),
    c AS (
      SELECT doc_id,
             unnest(generate_series(0,
               greatest(CAST(ceil((len(ts) - 8) / 24.0) AS INT), 1) - 1))
               AS chunk_id,
             ts
      FROM tk WHERE len(ts) > 0)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(ts[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(ts[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
             AS chunk_text,
           CAST(chunk_id * 24 AS BIGINT) AS tok_start
    FROM c
    """,
)
def q_chunk_documents(t: _T) -> DataFrame:
    """Token-budget document chunking with overlap (32-token chunks,
    8-token overlap) — the pre-tokenization windowing step of a
    training/RAG corpus build; operators/packing.py packs what this
    emits. Narrow map, explode fan-out = ceil(tokens/stride)."""
    from flink_efo_spark.operators.text import chunk_documents

    return chunk_documents(
        t.documents, "doc_id", "text", chunk_tokens=32, overlap=8
    )


@_q(
    "quantize_embeddings",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e),
    q AS (
      SELECT vec_id, scale, v,
             list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
               AS codes
      FROM s),
    r AS (
      SELECT vec_id, scale, codes, v,
             list_transform(codes, c -> c * scale) AS recon
      FROM q)
    SELECT vec_id, round(scale, 8) AS scale,
           array_to_string(codes, ' ') AS codes_str,
           round(1.0 - list_dot_product(v, recon)
                   / (sqrt(list_dot_product(v, v))
                      * sqrt(list_dot_product(recon, recon))), 8) AS cos_error
    FROM r
    """,
)
def q_quantize_embeddings(t: _T) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column with
    a per-vector reconstruction-cosine error column — the compression
    step before ANN indexing at 100 TB (4× byte cut, SIMD-able int8
    dot products). Exact cross-engine: round-half-up codes and an
    in-order fold for the dot products. Codes emitted as a joined
    string (chunk_documents precedent) — the driver's oracle harness
    cannot canonicalize array-valued cells."""
    from flink_efo_spark.operators.similarity import quantize_embeddings

    q = quantize_embeddings(t.embeddings, "vec_id", "embedding")
    return q.select(
        "vec_id",
        "scale",
        F.expr(
            "array_join(transform(codes, c -> cast(c as string)), ' ')"
        ).alias("codes_str"),
        "cos_error",
    )


@_q(
    "bm25_scores",
    """
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split(trim(lower(text)), ' '),
                         t -> t <> '') AS ts
      FROM documents),
    d AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl, ts FROM tk),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
    tf AS (
      SELECT doc_id, t AS term, CAST(count(*) AS DOUBLE) AS tf,
             any_value(dl) AS dl
      FROM (SELECT doc_id, dl, unnest(ts) AS t FROM d)
      WHERE t IN ('scan', 'merge', 'window')
      GROUP BY doc_id, t),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)
    SELECT doc_id,
           round(sum(ln((n - df + 0.5) / (df + 0.5) + 1)
                     * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
             AS bm25
    FROM tf JOIN dfreq USING (term), stats
    GROUP BY doc_id
    """,
)
def q_bm25_scores(t: _T) -> DataFrame:
    """Okapi BM25 (Lucene idf variant) of the corpus against a 3-term
    query — retrieval-grade corpus selection. Only query-term
    postings shuffle; corpus constants broadcast as one row."""
    return bm25_scores(
        t.documents, "doc_id", "text", ["scan", "merge", "window"]
    )


@_q(
    "hybrid_rrf_search",
    """
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split(trim(lower(text)), ' '),
                         t -> t <> '') AS ts
      FROM documents),
    d AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl, ts FROM tk),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
    tf AS (
      SELECT doc_id, t AS term, CAST(count(*) AS DOUBLE) AS tf,
             any_value(dl) AS dl
      FROM (SELECT doc_id, dl, unnest(ts) AS t FROM d)
      WHERE t IN ('scan', 'merge', 'window')
      GROUP BY doc_id, t),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    bm AS (
      SELECT doc_id,
             round(sum(ln((n - df + 0.5) / (df + 0.5) + 1)
                       * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))),
                   6) AS bm25
      FROM tf JOIN dfreq USING (term), stats
      GROUP BY doc_id),
    bmr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM bm),
    q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = 0),
    cs AS (
      SELECT vec_id AS doc_id,
             round(list_dot_product(ev, qv)
                     / (sqrt(list_dot_product(ev, ev))
                        * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
      FROM (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
            FROM embeddings), q),
    csr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS r
      FROM cs),
    u AS (
      SELECT doc_id, r FROM bmr WHERE r <= 50
      UNION ALL
      SELECT doc_id, r FROM csr WHERE r <= 50)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
           round(sum(1.0 / (60 + r)), 8) AS rrf_score
    FROM u GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 20
    """,
)
def q_hybrid_rrf_search(t: _T) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.):
    the lexical BM25 list and the embedding-cosine list (query =
    vector 0) fused as Σ 1/(60+rank) over each list's top 50 — the
    RAG / query-based corpus-selection composition the engine's
    scorers exist for. Scores are rounded(6) BEFORE ranking so rank
    boundaries are engine-stable; ties break on doc_id."""
    from flink_efo_spark.operators.retrieval import rrf_fuse
    from flink_efo_spark.operators.text import bm25_scores

    bm = bm25_scores(t.documents, "doc_id", "text", ["scan", "merge", "window"])

    emb = t.embeddings
    e = "transform(embedding, x -> cast(x as double))"
    qv = F.broadcast(
        emb.where(F.col("vec_id") == 0).select(F.expr(e).alias("__qv"))
    )
    dot = (
        "aggregate(zip_with(__ev, __qv, (a, b) -> a * b), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nrm = (
        "sqrt(aggregate(transform({v}, x -> x * x), "
        "cast(0.0 as double), (acc, y) -> acc + y))"
    )
    cos = emb.select(
        "vec_id", F.expr(e).alias("__ev")
    ).crossJoin(qv).select(
        "vec_id",
        F.round(
            F.expr(
                f"{dot} / ({nrm.format(v='__ev')} * {nrm.format(v='__qv')})"
            ),
            6,
        ).alias("cos_sim"),
    )
    fused = rrf_fuse(
        [(bm, "doc_id", "bm25"), (cos, "vec_id", "cos_sim")],
        k=60,
        top=50,
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    ).limit(20)


@_q(
    "incremental_agg",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           round(sum(value), 2) AS sum_v
    FROM events GROUP BY event_type
    """,
)
def q_incremental_agg(t: _T) -> DataFrame:
    """Changelog-driven aggregate maintenance (reference
    GroupAggFunction.java accumulate/retract — the continuous-query
    model): the first half's aggregate plus the second half's +I
    changelog delta must equal the full-table aggregate, computed
    WITHOUT rescanning the first half. The oracle is the full
    aggregate."""
    from flink_efo_spark.streaming import incremental_agg_apply

    ev = t.events
    h1 = ev.where(F.col("event_id") % 2 == 0)
    h2 = ev.where(F.col("event_id") % 2 == 1)
    base = h1.groupBy("event_type").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("value").alias("sum_v"),
    )
    log = h2.select("event_type", "value", F.lit("+I").alias("row_kind"))
    out = incremental_agg_apply(
        base, log, ["event_type"], sums={"sum_v": "value"}
    )
    return out.select(
        "event_type", "cnt", F.round("sum_v", 2).alias("sum_v")
    )


@_q(
    "constraint_audit",
    """
    SELECT 'not_null:l_orderkey' AS constraint_name,
           CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS violations,
           CAST(count(*) AS BIGINT) AS total,
           count(*) FILTER (l_orderkey IS NULL) = 0 AS ok
    FROM lineitem
    UNION ALL
    SELECT 'not_null:l_shipdate',
           CAST(count(*) FILTER (l_shipdate IS NULL) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) FILTER (l_shipdate IS NULL) = 0
    FROM lineitem
    UNION ALL
    SELECT 'unique:l_orderkey,l_linenumber',
           CAST(coalesce(sum(n) FILTER (n > 1), 0) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           coalesce(sum(n) FILTER (n > 1), 0) = 0
    FROM (SELECT count(*) AS n FROM lineitem
          GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'range:l_quantity',
           CAST(count(*) FILTER (l_quantity IS NOT NULL
                 AND (l_quantity < 1 OR l_quantity > 40)) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) FILTER (l_quantity IS NOT NULL
                 AND (l_quantity < 1 OR l_quantity > 40)) = 0
    FROM lineitem
    UNION ALL
    SELECT 'fk:l_orderkey',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_orderkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           (SELECT count(*) FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) = 0
    """,
)
def q_constraint_audit(t: _T) -> DataFrame:
    """Declarative data-quality audit (operators/quality.py): NOT
    NULL, composite-key uniqueness, value range, and referential
    integrity in one pass-per-kind over lineitem/orders — the
    validation gate a 100 TB pipeline runs between stages. The
    range:l_quantity check is deliberately tight (1..40 vs TPC-H's
    1..50) so the audit demonstrably counts real violations."""
    from flink_efo_spark.operators.quality import constraint_audit

    return constraint_audit(
        t.lineitem,
        not_null=["l_orderkey", "l_shipdate"],
        unique=[["l_orderkey", "l_linenumber"]],
        ranges={"l_quantity": (1, 40)},
        foreign_keys=[("l_orderkey", t.orders, "o_orderkey")],
    )


@_q(
    "salted_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def q_salted_distinct_users(t: _T) -> DataFrame:
    """Hot-key-safe exact distinct (operators/skew.py
    salted_count_distinct): the value space salts 16 ways so no
    reducer ever holds a hot key's whole value set; disjoint slices
    make the partial-distinct sum exact — proven by the plain
    count(DISTINCT) oracle."""
    from flink_efo_spark.operators.skew import salted_count_distinct

    return salted_count_distinct(t.events, ["event_type"], "user_id", salt=16)


@_q(
    "hll_distinct_rollup",
    """
    SELECT CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day_no,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS within_2pct
    FROM events GROUP BY 1
    """,
)
def q_hll_distinct_rollup(t: _T) -> DataFrame:
    """Mergeable distinct-count sketches — the 100 TB rollup pattern:
    build an HLL sketch per fine grain (day × event_type), then roll
    up to coarse grains by UNIONING SKETCHES (hll_union_agg), never
    re-scanning raw data. The reference side is Flink's
    approx-distinct support (its planner maps APPROX_COUNT_DISTINCT to
    HLL-based agg; FlinkSqlOperatorTable APPROX_COUNT_DISTINCT).

    lgConfigK=14 → ~0.65 % standard error; the query emits a 2 %
    accuracy gate per day against the exact distinct. The oracle
    asserts the gate holds (`true` by construction), so any estimator
    regression hash-fails. At 100 TB only the exact side would be
    dropped — sketches shuffle ~16 KB per group vs every user_id."""
    ev = t.events.select(
        (F.unix_micros(F.date_trunc("day", F.col("ts").cast("timestamp_ltz")))
         / F.lit(86_400_000_000)).cast("bigint").alias("day_no"),
        "event_type",
        "user_id",
    )
    sketches = ev.groupBy("day_no", "event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    day_est = sketches.groupBy("day_no").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("day_no").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return day_est.join(exact, "day_no").select(
        "day_no",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(0.02)
        ).alias("within_2pct"),
    )


@_q(
    "window_time_evictor",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us,
           event_type, count(*) AS n_kept, round(sum(value), 4) AS sum_value
    FROM events
    WHERE minute(ts) >= 45
    GROUP BY 1, 2
    """,
)
def q_window_time_evictor(t: _T) -> DataFrame:
    """TimeEvictor shape (flink-streaming-java/.../evictors/
    TimeEvictor.java): 1h tumbling windows that aggregate only the
    final 15 minutes of elements — eviction happens before the
    aggregate fires. Batch-expressible as a pre-agg filter, which is
    exactly how Spark should run it (predicate reaches the scan;
    state never holds evicted rows)."""
    return (
        t.events.where(F.minute("ts") >= 45)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("__w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            _us("__w").alias("w_start_us"), "event_type", "n_kept", "sum_value"
        )
    )


# ---------------------------------------------------------------------------
# TPC-H round 3c: the remaining query shapes (Q2/Q4/Q8/Q9/Q11/Q12/Q16/
# Q19/Q20/Q21/Q22), completing the 22-query sweep the reference's batch
# SQL planner covers (flink-table-planner-blink ITCases + the Blink
# TPC-H e2e suite). The testdata schema has no partsupp and trims some
# columns (no l_shipmode/l_commitdate/l_receiptdate, no c_phone), so
# shapes that need them are adapted: partsupp is emulated as the
# per-(part, supplier) aggregate of lineitem, "late" is
# l_shipdate > o_orderdate, and Q22's country code is c_custkey % 7.
# The OPERATOR shape (correlated min, EXISTS-semi, disjunctive join
# pushdown, nested IN, double-negation decorrelation, anti + scalar
# subquery) is preserved exactly.
# ---------------------------------------------------------------------------


@_q(
    "tpch_q4_priority",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(t: _T) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): correlated EXISTS
    decorrelated to a left-semi join with a non-equi conjunct
    (l_shipdate > o_orderdate), then a tiny group-by. The date range
    prunes orders at the scan; the semi join never materializes
    lineitem columns."""
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return (
        o.join(
            t.lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@_q(
    "tpch_q2_min_cost",
    """
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2),
    eu AS (
      SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type
    FROM eu e JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size <= 15
      AND e.ps_supplycost = (SELECT min(e2.ps_supplycost) FROM eu e2
                             WHERE e2.ps_partkey = e.ps_partkey)
    """,
)
def q_tpch_q2(t: _T) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated MIN
    subquery is decorrelated to a window min over the part key — one
    shuffle on ps_partkey instead of a rejoin of the whole subquery
    (the reference planner rewrites it to a self-join aggregate;
    BatchExecOverAggregate covers the window form). partsupp is
    emulated as the per-(part,supplier) min unit price from lineitem —
    min() over identically-computed IEEE divisions, so the equality
    filter is exact across engines."""
    ps = t.lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        )
    )
    eu = (
        ps.join(
            F.broadcast(t.supplier), F.col("s_suppkey") == F.col("ps_suppkey")
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    best = eu.withColumn("__min_cost", F.min("ps_supplycost").over(w)).where(
        F.col("ps_supplycost") == F.col("__min_cost")
    )
    return best.join(
        F.broadcast(t.part.where(F.col("p_size") <= 15)),
        F.col("p_partkey") == F.col("ps_partkey"),
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")


@_q(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                          ELSE 0 END) / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY')
    GROUP BY o_year
    """,
)
def q_tpch_q8(t: _T) -> DataFrame:
    """TPC-H Q8 shape (national market share): 8-way join — fact chain
    shuffles on its keys, all five dimension sides broadcast — then a
    conditional-aggregate ratio per year. The p_type filter reaches
    the part scan and prunes the fact join early."""
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(
            F.broadcast(t.part.where(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n1_rk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@_q(
    "tpch_q9_profit",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_type IN ('PROMO', 'ECONOMY'))
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9(t: _T) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation/year): fact chain
    ⋈ three broadcast dims, arithmetic profit expression, two-key
    rollup-free aggregate. supplycost is emulated as
    0.6 × p_retailprice (no partsupp in the testdata); the join/agg
    shape is unchanged."""
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t.lineitem.join(
            F.broadcast(t.part.where(F.col("p_type").isin("PROMO", "ECONOMY"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@_q(
    "tpch_q11_important_value",
    """
    WITH v AS (
      SELECT l.l_partkey, sum(l.l_extendedprice) AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l.l_partkey)
    SELECT l_partkey, round(value, 2) AS value
    FROM v
    WHERE value > (SELECT sum(value) * 0.001 FROM v)
    """,
)
def q_tpch_q11(t: _T) -> DataFrame:
    """TPC-H Q11 shape (important stock value): aggregate + scalar
    subquery over the SAME aggregate in the HAVING. Spark computes the
    per-part value once, derives the global threshold from it, and
    broadcasts the single-row threshold back — the fact is read once
    (the reference planner reuses the agg via a Reused exchange)."""
    v = (
        t.lineitem.join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(
                t.nation.where(
                    F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    thresh = v.agg((F.sum("value") * 0.001).alias("__t"))
    return (
        v.join(F.broadcast(thresh))
        .where(F.col("value") > F.col("__t"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


@_q(
    "tpch_q12_shipmode",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12(t: _T) -> DataFrame:
    """TPC-H Q12 shape (shipping priority split): fact-fact join with
    a post-join non-equi conjunct, conditional counts by category.
    l_linestatus stands in for the absent l_shipmode; "late" is
    l_shipdate > o_orderdate. Integer counts — no fp drift."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_q(
    "tpch_q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(t: _T) -> DataFrame:
    """TPC-H Q16 shape (supplier count by part attrs): NOT IN
    decorrelated to a broadcast anti join (complaint suppliers →
    negative-balance suppliers here), negated + IN-list part filters
    pushed to the broadcast side, COUNT DISTINCT aggregate."""
    bad = t.supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t.part.where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        t.lineitem.join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "tpch_q19_disjunctive",
    """
    SELECT {money} AS revenue
    FROM (
      SELECT sum(l.l_extendedprice * (1 - l.l_discount)) AS x
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
             AND l.l_quantity BETWEEN 1 AND 20)
         OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 5 AND 20
             AND l.l_quantity BETWEEN 10 AND 30)
         OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 40
             AND l.l_quantity BETWEEN 20 AND 50))
    """.format(money=_MONEY_SQL.format(x="x")),
)
def q_tpch_q19(t: _T) -> DataFrame:
    """TPC-H Q19 shape (disjunctive predicate revenue): OR of
    conjunctive brand/size/quantity clauses across the join. Catalyst
    extracts the common join key and pushes the residual disjunction
    post-join; the per-side implied filters (brand IN (...),
    quantity/size ranges) are derived and pushed to both scans
    (the reference planner does the same via RexSimplify)."""
    c = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(5, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(10, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .where(c)
        .agg(
            _money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@_q(
    "tpch_q20_part_promotion",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_type = 'PROMO')
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 50)
    """,
)
def q_tpch_q20(t: _T) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): nested IN
    subqueries — part filter IN-pushed into the lineitem aggregate
    (broadcast semi), HAVING on the grouped sum, outer IN as a second
    semi join. Both INs become left-semi joins; no subquery is
    re-evaluated per row."""
    promo = t.part.where(F.col("p_type") == "PROMO").select("p_partkey")
    heavy = (
        t.lineitem.where(
            F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
        )
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .where(F.col("__q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return t.supplier.join(
        F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


@_q(
    "tpch_q21_waiting",
    """
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'),
    stats AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM lo GROUP BY l_orderkey)
    SELECT s.s_name, count(*) AS numwait
    FROM lo
    JOIN stats ON stats.l_orderkey = lo.l_orderkey
    JOIN supplier s ON s.s_suppkey = lo.l_suppkey
    WHERE lo.late AND stats.n_supp > 1 AND stats.n_late = 1
    GROUP BY s.s_name
    """,
)
def q_tpch_q21(t: _T) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    supplier) double-negation, decorrelated the way the reference
    planner does — per-order supplier/late-supplier distinct counts
    joined back, so each correlated subquery costs one aggregate
    instead of a per-row probe. "late" adapts to
    l_shipdate > o_orderdate (no l_commitdate/l_receiptdate)."""
    lo = (
        t.lineitem.join(
            t.orders.where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate")).alias("late"),
        )
    )
    stats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        lo.where("late")
        .join(stats.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)), "l_orderkey")
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@_q(
    "tpch_q22_global_sales",
    """
    SELECT cntrycode, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT CAST(c.c_custkey % 7 AS INT) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE CAST(c.c_custkey % 7 AS INT) IN (1, 3, 5)
        AND c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >=
                              TIMESTAMP '2000-01-01 00:00:00'))
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(t: _T) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar AVG subquery
    broadcast as a 1-row threshold, NOT EXISTS as a left-anti join
    against orders, group by a derived code (c_custkey % 7 stands in
    for the absent phone prefix). The anti side is "orders since
    2000" (every synthetic customer has SOME order, so the classic
    no-orders predicate would be vacuously empty — lapsed customers
    keep the anti join non-trivial)."""
    avg_bal = t.customer.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    code = (F.col("c_custkey") % 7).cast("int")
    return (
        t.customer.where(code.isin(1, 3, 5))
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(
            t.orders.where(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The smoke-check query (driver's ``entry``): Q3-shaped
    customer ⋈ orders ⋈ lineitem filter + agg + top-n."""
    return QUERIES["join_inner_agg"](spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.13b StreamExecGroupWindowTableAggregate — windowed flatAggregate
# ---------------------------------------------------------------------------


@_q(
    "window_flat_agg",
    """
    SELECT w_start_us, user_id, event_id, round(value, 4) AS value FROM (
      SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, user_id,
             event_id, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events) WHERE rn <= 2
    """,
)
def q_window_flat_agg(t: _T) -> DataFrame:
    """Windowed table aggregate (StreamExecGroupWindowTableAggregate.scala
    in /root/reference — flatAggregate per group window): for every
    (1h tumble, user) group a Top2 emitter returns MULTIPLE rows.
    Spark realization per SURVEY §2.13b: ``applyInPandas`` over
    ``groupBy(window_start, key)`` — the group frame is the window
    pane, the UDF is the reference's canonical Top2
    TableAggregateFunction. Scale: shuffles once on (window, key);
    panes are bounded by the window span, so group frames stay small
    at any total volume. (A pure-Catalyst rank()<=2 plan is the
    faster batch path — this entry exists to exercise the
    flatAggregate surface itself.)"""
    from flink_efo_spark.operators.aggregates import flat_aggregate

    ev = t.events.select(
        _us(F.date_trunc("hour", F.col("ts"))).alias("w_start_us"),
        "user_id",
        "event_id",
        "value",
    )

    def top2(pdf):
        return pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(2)

    return flat_aggregate(
        ev,
        ["w_start_us", "user_id"],
        top2,
        "w_start_us bigint, user_id bigint, event_id bigint, value double",
    ).select(
        "w_start_us", "user_id", "event_id", F.round("value", 4).alias("value")
    )


# ---------------------------------------------------------------------------
# §2.10 scalar surface, part 3: math + datetime functions
# (FlinkSqlOperatorTable.java:166-255 — LOG/LOG2/BIN/HEX/SINH/COSH/
#  TANH/E/PI plus the std math set; SqlDateTimeUtils.java — DATE_FORMAT
#  / UNIX_TIMESTAMP / FROM_UNIXTIME / EXTRACT)
# ---------------------------------------------------------------------------


@_q(
    "math_time_fns",
    """
    SELECT event_id,
           round(log(2, value + 1), 6)            AS log2v,
           round(log2(value + 1), 6)              AS l2,
           bin(event_id)                          AS b2,
           hex(event_id)                          AS hx,
           ascii(event_type)                      AS asc0,
           chr(CAST(65 + event_id % 26 AS INT))   AS ch,
           round((exp(value/100) - exp(-value/100)) / 2, 6) AS sh,
           round((exp(value/100) + exp(-value/100)) / 2, 6) AS coshv,
           round((exp(value/50) - 1) / (exp(value/50) + 1), 6) AS th,
           round(degrees(value / 100), 6)         AS deg,
           round(radians(value), 6)               AS rad,
           round(atan2(value, value + 1), 6)      AS at2,
           CAST(sign(value - 50) AS DOUBLE)       AS sgn,
           round(sqrt(value), 6)                  AS sq,
           round(pow(value, 2), 4)                AS p2,
           CAST(factorial(CAST(event_id % 6 AS INT)) AS BIGINT) AS fact,
           round(greatest(value, 50.0), 2)        AS gr,
           round(least(value, 50.0), 2)           AS le,
           levenshtein(event_type, 'click')       AS lev,
           CAST(instr(event_type, 'c') AS BIGINT) AS ins,
           translate(event_type, 'ck', 'xy')      AS tr,
           strftime(ts, '%Y-%m-%d %H:%M')         AS dfmt,
           CAST(floor(epoch(ts)) AS BIGINT)       AS unix_s,
           extract(dow FROM ts)                   AS dow0,
           extract(hour FROM ts)                  AS hr
    FROM events WHERE event_id < 300
    """,
)
def q_math_time_fns(t: _T) -> DataFrame:
    """§2.10 math + datetime surface via built-in Catalyst expressions
    (FlinkSqlOperatorTable.java math extensions; SqlDateTimeUtils.java
    DATE_FORMAT/UNIX_TIMESTAMP/EXTRACT in /root/reference). Hyperbolic
    fns are compared through their exp() identities because the oracle
    engine lacks sinh/cosh/tanh — same doubles either way after
    round(…, 6). Narrow map over a pushed-down filter: zero shuffles,
    whole-stage codegen end to end."""
    ev = t.events.where(F.col("event_id") < 300)
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.log(2.0, v + 1), 6).alias("log2v"),
        F.round(F.log2(v + 1), 6).alias("l2"),
        F.bin("event_id").alias("b2"),
        F.hex("event_id").alias("hx"),
        F.ascii("event_type").alias("asc0"),
        F.chr(F.lit(65) + F.col("event_id") % 26).alias("ch"),
        F.round(F.sinh(v / 100), 6).alias("sh"),
        F.round(F.cosh(v / 100), 6).alias("coshv"),
        F.round(F.tanh(v / 100), 6).alias("th"),
        F.round(F.degrees(v / 100), 6).alias("deg"),
        F.round(F.radians(v), 6).alias("rad"),
        F.round(F.atan2(v, v + 1), 6).alias("at2"),
        F.signum(v - 50).alias("sgn"),
        F.round(F.sqrt(v), 6).alias("sq"),
        F.round(F.pow(v, 2), 4).alias("p2"),
        F.factorial((F.col("event_id") % 6).cast("int")).alias("fact"),
        F.round(F.greatest(v, F.lit(50.0)), 2).alias("gr"),
        F.round(F.least(v, F.lit(50.0)), 2).alias("le"),
        F.levenshtein("event_type", F.lit("click")).alias("lev"),
        F.instr("event_type", "c").cast("bigint").alias("ins"),
        F.translate("event_type", "ck", "xy").alias("tr"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("dfmt"),
        F.unix_timestamp("ts").alias("unix_s"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow0"),
        F.hour("ts").cast("bigint").alias("hr"),
    )


@_q(
    "url_map_fns",
    """
    SELECT doc_id,
           source || '.example.com'                          AS host,
           '/' || lang || '/' || CAST(doc_id AS VARCHAR)     AS path,
           'q=' || lang || '&page=' || CAST(doc_id % 5 AS VARCHAR) AS query,
           lang                                              AS q_param,
           'https'                                           AS proto,
           upper(substr(lang, 1, 1)) || substr(lang, 2)      AS lang_ic,
           substr(source, 1, 1) || 'XX' || substr(source, 4) AS src_ov,
           CAST(instr(source, 'rc') AS INT)                  AS pos_rc,
           'lang=' || lang || ',n=' || CAST(n_chars AS VARCHAR) AS map_ser,
           lang                                              AS m_lang,
           CAST(n_chars AS VARCHAR)                          AS m_n
    FROM documents WHERE doc_id < 100
    """,
)
def q_url_map_fns(t: _T) -> DataFrame:
    """§2.10 PARSE_URL + STR_TO_MAP (FlinkSqlOperatorTable PARSE_URL /
    STR_TO_MAP; runtime SqlFunctionUtils.parseUrl / strToMap in
    /root/reference): the engine builds a URL and a kv-string from
    document fields, then round-trips them through Spark's parse_url
    and str_to_map built-ins. The oracle reconstructs each extracted
    component directly from the same fields — so the built-ins'
    HOST/PATH/QUERY/param extraction and map parsing are value-checked
    without needing those functions in the oracle engine."""
    d = t.documents.where(F.col("doc_id") < 100)
    url = F.concat(
        F.lit("https://"),
        F.col("source"), F.lit(".example.com"),
        F.lit("/"), F.col("lang"), F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="), F.col("lang"),
        F.lit("&page="), (F.col("doc_id") % 5).cast("string"),
    )
    kv = F.concat(
        F.lit("lang="), F.col("lang"),
        F.lit(",n="), F.col("n_chars").cast("string"),
    )
    m = F.expr("str_to_map(__kv, ',', '=')")
    return (
        d.withColumn("__url", url)
        .withColumn("__kv", kv)
        .select(
            "doc_id",
            F.parse_url("__url", F.lit("HOST")).alias("host"),
            F.parse_url("__url", F.lit("PATH")).alias("path"),
            F.parse_url("__url", F.lit("QUERY")).alias("query"),
            F.parse_url("__url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
            F.parse_url("__url", F.lit("PROTOCOL")).alias("proto"),
            F.initcap("lang").alias("lang_ic"),
            F.overlay("source", F.lit("XX"), F.lit(2), F.lit(2)).alias("src_ov"),
            F.expr("position('rc' in source)").cast("int").alias("pos_rc"),
            F.expr(
                "concat_ws(',', transform(array_sort(map_entries("
                "str_to_map(__kv, ',', '='))), e -> concat(e.key, '=', e.value)))"
            ).alias("map_ser"),
            m.getItem("lang").alias("m_lang"),
            m.getItem("n").alias("m_n"),
        )
    )


# ---------------------------------------------------------------------------
# §2.13 fluent Table API end-to-end: group-window + over-window + lateral
# (PyFlink table.py window:534 / over_window:571 / join_lateral:279;
#  GroupWindowITCase / OverWindowITCase / CorrelateITCase). The fluent shim
# delegates to the same Catalyst plans as the DataFrame queries — this entry
# proves the SURFACE through the oracle gate, not new physics.
# ---------------------------------------------------------------------------


@_q(
    "table_api_pipeline",
    """
    SELECT event_type,
           CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) * 1000000 AS w_start_us,
           count(*) AS cnt, round(sum(value), 2) AS sum_v
    FROM events
    WHERE value > 10
    GROUP BY 1, 2
    """,
)
def q_table_api_pipeline(t: _T) -> DataFrame:
    from flink_efo_spark.table import Table, Tumble

    return (
        Table(t.events)
        .filter("value > 10")
        .window(Tumble.over("10.minutes").on("ts").alias("w"))
        .group_by("w, event_type")
        .select(
            "event_type, unix_micros(w.start) as w_start_us, "
            "count(*) as cnt, round(sum(value), 2) as sum_v"
        )
        .to_df()
    )


@_q(
    "table_api_over_lateral",
    """
    SELECT user_id, word, count(*) AS cnt
    FROM (
      SELECT user_id, unnest(string_split(event_type, '_')) AS word
      FROM events WHERE user_id <= 50
    )
    GROUP BY user_id, word
    """,
)
def q_table_api_over_lateral(t: _T) -> DataFrame:
    from flink_efo_spark.table import Table

    return (
        Table(t.events)
        .filter("user_id <= 50")
        .select("user_id", "split(event_type, '_') as parts")
        .join_lateral("explode(parts) as t(word)")
        .group_by("user_id", "word")
        .select("user_id", "word", "count(*) as cnt")
        .to_df()
    )


# ---------------------------------------------------------------------------
# Flink SQL group-window dialect (FlinkSqlOperatorTable.java:1100-1180
# TUMBLE/HOP/SESSION + _START/_END/_ROWTIME auxiliaries): the dialect
# shim (dialect.py) rewrites the reference's SQL surface to Spark
# window()/session_window() — these queries run the FLINK-SYNTAX text
# end-to-end through EfoSession.execute_sql.
# ---------------------------------------------------------------------------


@_q(
    "dialect_tumble",
    """
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000 AS w_start_us,
           (CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) + 300) * 1000000 - 1000
             AS w_rowtime_us,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_dialect_tumble(t: _T) -> DataFrame:
    """Flink-dialect TUMBLE group window run verbatim through the SQL
    shim; TUMBLE_ROWTIME checks the end-1ms rowtime property
    (TimeWindow.maxTimestamp())."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    t.events.createOrReplaceTempView("__efo_dialect_events")
    df = env.execute_sql(
        """
        SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) AS w_start,
               TUMBLE_ROWTIME(ts, INTERVAL '5' MINUTE) AS w_rowtime,
               event_type, count(*) AS cnt,
               round(sum(value), 2) AS sum_value
        FROM __efo_dialect_events
        GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE), event_type
        """
    )
    return df.select(
        _us("w_start").alias("w_start_us"),
        _us("w_rowtime").alias("w_rowtime_us"),
        "event_type", "cnt", "sum_value",
    )


@_q(
    "dialect_hop",
    """
    SELECT w_start * 1000000 AS w_start_us,
           (w_start + 600) * 1000000 AS w_end_us,
           count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM (
      SELECT unnest([CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - 300,
                     CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)]) AS w_start,
             value
      FROM events)
    GROUP BY w_start
    """,
)
def q_dialect_hop(t: _T) -> DataFrame:
    """Flink-dialect HOP: note the reference's (time, slide, size) arg
    order — the shim swaps to Spark's (time, size, slide)."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    t.events.createOrReplaceTempView("__efo_dialect_events")
    df = env.execute_sql(
        """
        SELECT HOP_START(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE) AS w_start,
               HOP_END(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE) AS w_end,
               count(*) AS cnt, round(sum(value), 2) AS sum_value
        FROM __efo_dialect_events
        GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)
        """
    )
    return df.select(
        _us("w_start").alias("w_start_us"),
        _us("w_end").alias("w_end_us"),
        "cnt", "sum_value",
    )


@_q(
    "dialect_session",
    """
    SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 1800000000 AS session_end_us,
           count(*) AS n_events
    FROM (
      SELECT user_id, ts,
             sum(CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
        FROM events))
    GROUP BY user_id, session_id
    """,
)
def q_dialect_session(t: _T) -> DataFrame:
    """Flink-dialect SESSION group window through the SQL shim."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    t.events.createOrReplaceTempView("__efo_dialect_events")
    df = env.execute_sql(
        """
        SELECT user_id,
               SESSION_START(ts, INTERVAL '30' MINUTE) AS s_start,
               SESSION_END(ts, INTERVAL '30' MINUTE) AS s_end,
               count(*) AS n_events
        FROM __efo_dialect_events
        GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id
        """
    )
    return df.select(
        "user_id",
        _us("s_start").alias("session_start_us"),
        _us("s_end").alias("session_end_us"),
        "n_events",
    )


@_q(
    "dialect_asof",
    """
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           b.bval AS signup_value
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    JOIN LATERAL (
      SELECT b.value AS bval
      FROM events b
      WHERE b.event_type = 'signup' AND b.user_id = p.user_id
        AND b.ts <= p.ts
      ORDER BY b.ts DESC, b.event_id DESC LIMIT 1
    ) b ON true
    """,
)
def q_dialect_asof(t: _T) -> DataFrame:
    """The reference's temporal-join SQL — ``JOIN v FOR SYSTEM_TIME
    AS OF p.ts`` (SqlSnapshot parser node, planned by
    StreamExecTemporalJoin.scala:51 /
    TemporalRowTimeJoinOperator.java:72) — run VERBATIM through the
    dialect shim (dialect.py rewrite_system_time): each click joins
    the latest signup version of its user at click time; clicks
    before any signup drop (inner temporal join)."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    env.create_temporary_view(
        "__efo_st_clicks", t.events.where(F.col("event_type") == "click")
    )
    env.create_temporary_view(
        "__efo_st_signups",
        t.events.where(F.col("event_type") == "signup"),
        watermark=("ts", "10 seconds"),
        version_tiebreak=["event_id"],
    )
    df = env.execute_sql(
        """
        SELECT p.event_id, p.user_id, p.ts, r.value AS signup_value
        FROM __efo_st_clicks p
        JOIN __efo_st_signups FOR SYSTEM_TIME AS OF p.ts AS r
        ON p.user_id = r.user_id
        """
    )
    return df.select(
        "event_id", "user_id", _us("ts").alias("ts_us"), "signup_value"
    )


@_q(
    "dialect_tvf_tumble",
    """
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) * 1000000 AS w_start_us,
           (CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) + 600) * 1000000 - 1000
             AS w_time_us,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_dialect_tvf_tumble(t: _T) -> DataFrame:
    """Windowing-TVF syntax (FLIP-145, public upstream Flink >= 1.13
    — not in the reference snapshot) run verbatim through the shim:
    ``FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), size))`` with the
    TVF's window_start/window_end/window_time result columns."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    t.events.createOrReplaceTempView("__efo_dialect_events")
    df = env.execute_sql(
        """
        SELECT window_start, window_time, event_type,
               count(*) AS cnt, round(sum(value), 2) AS sum_value
        FROM TABLE(TUMBLE(TABLE __efo_dialect_events, DESCRIPTOR(ts),
                          INTERVAL '10' MINUTE))
        GROUP BY window_start, window_time, event_type
        """
    )
    return df.select(
        _us("window_start").alias("w_start_us"),
        _us("window_time").alias("w_time_us"),
        "event_type", "cnt", "sum_value",
    )


@_q(
    "dialect_tvf_cumulate",
    """
    SELECT w0 * 1000000 AS w_start_us,
           (w0 + k * 900) * 1000000 AS w_end_us,
           count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w0,
             unnest(generate_series(
               CAST(floor((epoch(ts) - floor(epoch(ts) / 3600) * 3600) / 900)
                    AS BIGINT) + 1, 4)) AS k,
             value
      FROM events)
    GROUP BY 1, 2
    """,
)
def q_dialect_tvf_cumulate(t: _T) -> DataFrame:
    """CUMULATE windowing TVF (FLIP-145 upstream syntax) through
    the shim — the TVF renders to an
    explode(sequence)-based expand, the same plan family as the
    native cumulate operator (streaming.py cumulate_agg)."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    t.events.createOrReplaceTempView("__efo_dialect_events")
    df = env.execute_sql(
        """
        SELECT window_start, window_end,
               count(*) AS cnt, round(sum(value), 2) AS sum_value
        FROM TABLE(CUMULATE(TABLE __efo_dialect_events, DESCRIPTOR(ts),
                            INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
        GROUP BY window_start, window_end
        """
    )
    return df.select(
        _us("window_start").alias("w_start_us"),
        _us("window_end").alias("w_end_us"),
        "cnt", "sum_value",
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: token-budget shard packing (operators/packing.py) —
# deterministic corpus shuffle + fixed-token-budget shard assignment,
# hierarchical (bucketed) prefix sum instead of a global sort.
# ---------------------------------------------------------------------------


@_q(
    "pack_shards",
    f"""
    SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start_pos,
           CAST(floor((sum(n_tokens) OVER w - n_tokens) / 2000.0) AS BIGINT)
             AS shard_id
    FROM (SELECT doc_id, CAST(len({{toks}}) AS BIGINT) AS n_tokens,
                 md5(CAST(doc_id AS VARCHAR)) AS okey
          FROM documents)
    WINDOW w AS (ORDER BY okey, doc_id)
    """.format(toks=_TOKS_DD),
)
def q_pack_shards(t: _T) -> DataFrame:
    """Per-document shard assignment; the oracle's global ORDER BY
    window is exactly what the operator decomposes into bucketed
    prefix sums (packing.py module docstring)."""
    from flink_efo_spark.operators.packing import pack_shards

    return pack_shards(t.documents, "doc_id", "text", shard_tokens=2000)


@_q(
    "shard_manifest",
    f"""
    SELECT shard_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(start_pos) AS first_pos,
           max(start_pos + n_tokens) AS end_pos
    FROM (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start_pos,
             CAST(floor((sum(n_tokens) OVER w - n_tokens) / 2000.0) AS BIGINT)
               AS shard_id
      FROM (SELECT doc_id, CAST(len({{toks}}) AS BIGINT) AS n_tokens,
                   md5(CAST(doc_id AS VARCHAR)) AS okey
            FROM documents)
      WINDOW w AS (ORDER BY okey, doc_id))
    GROUP BY shard_id
    """.format(toks=_TOKS_DD),
)
def q_shard_manifest(t: _T) -> DataFrame:
    """Shard-level manifest (docs, token totals, span) a trainer would
    consume; checks the budget bound end-to-end."""
    from flink_efo_spark.operators.packing import pack_shards, shard_manifest

    return shard_manifest(
        pack_shards(t.documents, "doc_id", "text", shard_tokens=2000)
    )


# ---------------------------------------------------------------------------
# §2.10 residue: SHA family, FIRST_VALUE/LAST_VALUE, TIMESTAMPADD/DIFF
# (FlinkSqlOperatorTable SHA224..SHA512, FIRST_VALUE/LAST_VALUE aggs,
# Calcite TIMESTAMP_ADD/TIMESTAMP_DIFF)
# ---------------------------------------------------------------------------


@_q(
    "sha_timestamp_fns",
    """
    SELECT event_id,
           sha256(event_type) AS sha_256,
           56 AS sha224_len, 96 AS sha384_len, 128 AS sha512_len,
           epoch_us(ts + INTERVAL 90 MINUTE) AS ts_plus_us,
           date_diff('minute', TIMESTAMP '2020-01-01 00:00:00',
                     ts) AS mins_since,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER w AS last_v
    FROM events
    WHERE event_id < 2000
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_sha_timestamp_fns(t: _T) -> DataFrame:
    """SHA224/256/384/512 SQL names (registry → sha2), TIMESTAMPADD /
    TIMESTAMPDIFF, FIRST_VALUE/LAST_VALUE over a deterministic frame.
    DuckDB lacks sha224/384/512, so those legs are checked by digest
    LENGTH (the width IS the function identity here) while sha256
    compares full digests cross-engine."""
    from flink_efo_spark.functions.registry import register_all

    register_all(t.spark)
    t.events.createOrReplaceTempView("__efo_fn_events")
    return t.spark.sql(
        """
        SELECT event_id,
               SHA256(event_type) AS sha_256,
               length(SHA224(event_type)) AS sha224_len,
               length(SHA384(event_type)) AS sha384_len,
               length(SHA512(event_type)) AS sha512_len,
               unix_micros(cast(timestampadd(MINUTE, 90, ts)
                           as timestamp_ltz)) AS ts_plus_us,
               timestampdiff(MINUTE, TIMESTAMP '2020-01-01 00:00:00',
                             ts) AS mins_since,
               first_value(value) OVER w AS first_v,
               last_value(value) OVER w AS last_v
        FROM __efo_fn_events
        WHERE event_id < 2000
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


# TPC-DS corpus (derived star schema): registers tpcds_* entries into
# QUERIES/ORACLES on import. Import sits at module tail so the helpers
# above (_q, _T, _money) exist when tpcds's decorators run.
import flink_efo_spark.tpcds  # noqa: E402,F401  (registration side effect)


@_q(
    "delta_iteration_bfs",
    """
    WITH RECURSIVE e1 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1),
    bfs AS (
      SELECT CAST(3 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
      UNION
      SELECT e.dst AS node, b.dist + 1 AS dist
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < 4)
    SELECT node, min(dist) AS dist FROM bfs GROUP BY node
    """,
)
def q_delta_iteration_bfs(t: _T) -> DataFrame:
    """§2.11 iterations, delta (workset) form (reference
    flink-java/.../operators/DeltaIteration.java:46): unit-weight BFS
    distances over the customer↔supplier purchase graph (nodes
    2·custkey / 2·suppkey+1, start = supplier 1, depth ≤ 4). Each
    round joins only the shrinking frontier against the partitioned
    adjacency — the workset discipline that makes iterative closure
    feasible at corpus scale. Oracle: DuckDB recursive CTE with
    UNION-distinct level dedup."""
    from flink_efo_spark.operators.iterate import bfs_distances

    li, o = t.lineitem, t.orders
    # both directions from ONE scan via explode (clustering.py's
    # adjacency trick); bfs_distances dedups, so no pre-distinct
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .selectExpr(
            "explode(array(struct(a AS src, b AS dst), "
            "struct(b AS src, a AS dst))) AS e"
        )
        .select("e.src", "e.dst")
    )
    return bfs_distances(edges, "src", "dst", start=[3], max_depth=4)


@_q(
    "incremental_dedup",
    r"""
    WITH f AS (
      SELECT doc_id,
             md5(substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                 1, 80)) AS fingerprint
      FROM documents),
    seen AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id % 2 = 0),
    surv AS (
      SELECT doc_id, fingerprint,
             row_number() OVER (PARTITION BY fingerprint
                                ORDER BY doc_id) AS rn,
             CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT)
               AS group_size
      FROM f WHERE doc_id % 2 = 1)
    SELECT doc_id, fingerprint, group_size
    FROM surv s
    WHERE rn = 1
      AND NOT EXISTS (SELECT 1 FROM seen WHERE seen.fingerprint = s.fingerprint)
    """,
)
def q_incremental_dedup(t: _T) -> DataFrame:
    """Incremental corpus dedup (operators/dedup.py
    dedup_incremental): the even-doc_id half plays the existing
    corpus — reduced to its SIGNATURE STORE only — and the odd half
    is the new batch, deduped within itself (keep-first) and against
    the store via a left-anti join on the 32-char key. Fingerprint =
    md5 of the 80-char normalized prefix (boilerplate-tolerant
    equivalence), which the synthetic corpus actually collides on.
    The continuous-ingest shape every training-data pipeline runs:
    old text is never rescanned."""
    from flink_efo_spark.operators.dedup import dedup_incremental

    docs = t.documents
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = F.md5(F.substring(norm, 1, 80))
    seen = (
        docs.where(F.col("doc_id") % 2 == 0)
        .select(fp.alias("fingerprint"))
        .distinct()
    )
    new_batch = docs.where(F.col("doc_id") % 2 == 1)
    fresh, _new_sigs = dedup_incremental(new_batch, seen, "doc_id", fp)
    return fresh.select("doc_id", "fingerprint", "group_size")


@_q(
    "stream_incremental_dedup",
    r"""
    SELECT doc_id FROM (
      SELECT doc_id,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM (SELECT doc_id,
                   md5(substr(regexp_replace(lower(trim(text)), '\s+',
                       ' ', 'g'), 1, 80)) AS fp
            FROM documents))
    WHERE rn = 1
    """,
)
def q_stream_incremental_dedup(t: _T) -> DataFrame:
    """Store-backed continuous dedup (streaming.py
    stream_incremental_dedup): the documents table replayed as 4
    doc_id-ordered micro-batches, each deduped within itself and
    against the PERSISTENT signature store appended by prior batches
    (epoch-dir idempotent writes — exactly-once across restarts,
    pytest-proven). First arrival per fingerprint == min doc_id, so
    the exact oracle is the batch keep-first answer."""
    import tempfile

    from flink_efo_spark.streaming import (
        stream_incremental_dedup,
        stream_table_split,
    )

    fp = F.md5(
        F.substring(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
            1, 80,
        )
    )
    src = stream_table_split(
        t.spark, t.sf_dir, "documents", n_batches=4, order_col="doc_id"
    ).select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="efo_incr_dedup_")
    q = stream_incremental_dedup(
        src, "doc_id", fp,
        store_dir=f"{base}/store", out_dir=f"{base}/out",
        checkpoint_dir=f"{base}/ckpt",
    )
    q.awaitTermination()
    return t.spark.read.parquet(f"{base}/out").select("doc_id")


@_q(
    "kmeans_embeddings",
    """
    WITH emb AS (
      SELECT vec_id AS id,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS v
      FROM embeddings),
    init_ids AS (
      SELECT vec_id AS id,
             CAST(rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
      FROM embeddings ORDER BY vec_id LIMIT 4),
    c0 AS (
      SELECT cid, pos, v FROM emb JOIN init_ids USING (id)),
    d1 AS (
      SELECT e.id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dd
      FROM emb e JOIN c0 c USING (pos) GROUP BY e.id, c.cid),
    a1 AS (
      SELECT id, cid FROM (
        SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY dd, cid) AS rn
        FROM d1) WHERE rn = 1),
    c1u AS (
      SELECT a1.cid, e.pos,
             CAST(floor(sum(e.v) / count(*)) AS BIGINT) AS v
      FROM emb e JOIN a1 ON e.id = a1.id GROUP BY a1.cid, e.pos),
    c1 AS (
      SELECT c0.cid, c0.pos, coalesce(c1u.v, c0.v) AS v
      FROM c0 LEFT JOIN c1u ON c0.cid = c1u.cid AND c0.pos = c1u.pos),
    d2 AS (
      SELECT e.id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dd
      FROM emb e JOIN c1 c USING (pos) GROUP BY e.id, c.cid),
    a2 AS (
      SELECT id, cid FROM (
        SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY dd, cid) AS rn
        FROM d2) WHERE rn = 1),
    c2u AS (
      SELECT a2.cid, e.pos,
             CAST(floor(sum(e.v) / count(*)) AS BIGINT) AS v
      FROM emb e JOIN a2 ON e.id = a2.id GROUP BY a2.cid, e.pos),
    c2 AS (
      SELECT c1.cid, c1.pos, coalesce(c2u.v, c1.v) AS v
      FROM c1 LEFT JOIN c2u ON c1.cid = c2u.cid AND c1.pos = c2u.pos),
    sz AS (
      SELECT cid, CAST(count(*) AS BIGINT) AS size FROM a2 GROUP BY cid)
    SELECT c2.cid, c2.pos,
           round(c2.v / 1000000.0, 6) AS cent_val,
           coalesce(sz.size, 0) AS size
    FROM c2 LEFT JOIN sz ON c2.cid = sz.cid
    """,
)
def q_kmeans_embeddings(t: _T) -> DataFrame:
    """Deterministic k-means training over the embeddings table
    (k=4, 2 Lloyd iterations) — the DuckDB oracle replays the entire
    training loop in SQL (quantize -> exact integer distances ->
    argmin with cid tie-break -> floor(sum/count) centroid update,
    twice), which is only possible because every step is exact
    integer arithmetic. Completes the IVF story: ivf_centroids
    samples, kmeans_train trains."""
    from flink_efo_spark.operators.similarity import kmeans_train

    return kmeans_train(
        t.embeddings, "vec_id", "embedding", k=4, n_iter=2
    )


@_q(
    "cms_heavy_hitters",
    """
    WITH tf AS (
      SELECT t AS token FROM (
        SELECT unnest(string_split(trim(lower(text)), ' ')) AS t
        FROM documents) WHERE t <> ''),
    hj AS (SELECT * FROM (VALUES (0, 3, 1), (1, 7, 5), (2, 11, 9),
                                 (3, 13, 15)) t(j, a, b)),
    h AS (
      SELECT token,
             CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT)
               % 1000000007 AS hv
      FROM tf),
    sk AS (
      SELECT j, ((a * hv + b) % 1000000007) % 64 AS w,
             CAST(count(*) AS BIGINT) AS cnt
      FROM h CROSS JOIN hj GROUP BY 1, 2),
    exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM tf GROUP BY token HAVING count(*) >= 20),
    probes AS (
      SELECT e.token, e.exact_cnt, hj.j,
             ((hj.a * (CAST(concat('0x', substr(md5(e.token), 1, 15))
                            AS BIGINT) % 1000000007) + hj.b)
              % 1000000007) % 64 AS w
      FROM exact e CROSS JOIN hj)
    SELECT p.token, p.exact_cnt,
           CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_cnt
    FROM probes p LEFT JOIN sk ON p.j = sk.j AND p.w = sk.w
    GROUP BY p.token, p.exact_cnt
    """,
)
def q_cms_heavy_hitters(t: _T) -> DataFrame:
    """Count-min sketch heavy hitters over document tokens: build a
    4x64 sketch in one bounded-shuffle pass, then read back the
    frequent tokens' estimates next to their exact counts — the
    one-sided guarantee (est >= exact, bounded overcount) is visible
    in the output. The DuckDB oracle rebuilds the sketch
    cell-for-cell (portable md5 hash + exact affine maps), proving
    the summary itself is engine-independent, not just its answers."""
    from flink_efo_spark.operators.sketches import cms_estimate, cms_sketch

    tokens = t.documents.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias("token")
    ).where(F.col("token") != "")
    sketch = cms_sketch(tokens, "token", depth=4, width=64)
    exact = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .where(F.col("exact_cnt") >= 20)
    )
    est = cms_estimate(sketch, exact.select("token"), "token", depth=4, width=64)
    return exact.join(est, "token").select(
        "token", "exact_cnt", F.col("est_cnt").cast("long").alias("est_cnt")
    )


@_q(
    "hist_quantiles",
    """
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
      FROM lineitem),
    sk AS (
      SELECT LEAST(219, GREATEST(0,
               CAST(floor((c - 90000) * 220 / 10500000) AS BIGINT))) AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1),
    cum AS (
      SELECT bin,
             CAST(sum(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS n
      FROM sk),
    q AS (
      SELECT unnest(CAST([100, 250, 500, 750, 900, 990] AS BIGINT[]))
               AS q_permille),
    hit AS (
      SELECT q_permille, MIN(bin) AS bin
      FROM cum CROSS JOIN q
      WHERE cum >= (q_permille * n + 999) // 1000
      GROUP BY q_permille)
    SELECT q_permille, bin,
           CAST(90000 + (bin * 10500000) // 220 AS BIGINT) AS est_lo,
           CAST(90000 + ((bin + 1) * 10500000 + 219) // 220 AS BIGINT) AS est_hi
    FROM hit
    """,
)
def q_hist_quantiles(t: _T) -> DataFrame:
    """Equi-width histogram quantile sketch over lineitem extended
    price (cents grid, domain [90000, 10590000), 220 bins): one
    bounded-shuffle pass builds the <= 220-row sketch, then the
    read-back reports p10/p25/p50/p75/p90/p99 as [est_lo, est_hi)
    bin bounds — error <= one bin width, fully deterministic (exact
    integer bin math + portable IEEE division), so the DuckDB oracle
    rebuilds sketch AND read-back bit-for-bit. The mergeable,
    engine-portable counterpart to approx_percentile's opaque
    summary (operators/sketches.py hist_sketch)."""
    from flink_efo_spark.operators.sketches import hist_quantiles, hist_sketch

    cents = t.lineitem.select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("c")
    )
    sk = hist_sketch(cents, "c", lo=90000, hi=10590000, bins=220)
    return hist_quantiles(
        sk, [100, 250, 500, 750, 900, 990], lo=90000, hi=10590000, bins=220
    )


@_q(
    "hist_group_quantiles",
    """
    WITH v AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
      FROM lineitem),
    sk AS (
      SELECT l_returnflag,
             LEAST(219, GREATEST(0,
               CAST(floor((c - 90000) * 220 / 10500000) AS BIGINT))) AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1, 2),
    cum AS (
      SELECT l_returnflag, bin,
             CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      FROM sk),
    q AS (
      SELECT unnest(CAST([250, 500, 900] AS BIGINT[])) AS q_permille),
    hit AS (
      SELECT l_returnflag, q_permille, MIN(bin) AS bin
      FROM cum CROSS JOIN q
      WHERE cum >= (q_permille * n + 999) // 1000
      GROUP BY l_returnflag, q_permille)
    SELECT l_returnflag, q_permille, bin,
           CAST(90000 + (bin * 10500000) // 220 AS BIGINT) AS est_lo,
           CAST(90000 + ((bin + 1) * 10500000 + 219) // 220 AS BIGINT) AS est_hi
    FROM hit
    """,
)
def q_hist_group_quantiles(t: _T) -> DataFrame:
    """Per-group histogram quantiles (operators/sketches.py
    hist_sketch_by/hist_quantiles_by): one pass builds a sketch PER
    l_returnflag, and the read-back windows partition by the group —
    no single-partition stage at any group count. p25/p50/p90 of
    extended price per return flag, bit-stable vs the oracle."""
    from flink_efo_spark.operators.sketches import (
        hist_quantiles_by,
        hist_sketch_by,
    )

    cents = t.lineitem.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("c"),
    )
    sk = hist_sketch_by(
        cents, ["l_returnflag"], "c", lo=90000, hi=10590000, bins=220
    )
    return hist_quantiles_by(
        sk, ["l_returnflag"], [250, 500, 900], lo=90000, hi=10590000, bins=220
    )


@_q(
    "bloom_prefilter_join",
    """
    SELECT CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT)
             AS order_month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
    GROUP BY 1
    """,
)
def q_bloom_prefilter_join(t: _T) -> DataFrame:
    """Bloom-prefiltered fact-dim join (runtime-filter idiom): the
    selective customer slice's key set becomes a 4096-bit Bloom
    filter whose set bits broadcast as three LEFT SEMI probes, so
    orders rows that cannot join are dropped BEFORE the (merge-hinted,
    modeling a non-broadcastable dim) shuffle join. No false
    negatives + the real join removes false positives => the result
    is EXACTLY the plain join, which is the oracle; only the shuffled
    fact bytes change (operators/sketches.py bloom_prefilter_join).
    Mirrors the reference's lookup-join motivation (SURVEY §2.3) at
    the physical-plan level."""
    from flink_efo_spark.operators.sketches import bloom_prefilter_join

    dim = t.customer.where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    ).select("c_custkey")
    joined = bloom_prefilter_join(
        t.orders, dim.hint("merge"), "o_custkey", "c_custkey", m=4096, k=3
    )
    return joined.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("long")
        .alias("revenue_cents"),
    )


@_q(
    "stream_cms_hitters",
    """
    WITH wm AS (SELECT epoch(max(ts)) - 600 AS w FROM events),
    fin AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
      WHERE floor(epoch(ts) / 86400) * 86400 + 86400 <= (SELECT w FROM wm)),
    hj AS (SELECT * FROM (VALUES (0, 3, 1), (1, 7, 5), (2, 11, 9),
                                 (3, 13, 15)) t(j, a, b)),
    h AS (
      SELECT k, CAST(concat('0x', substr(md5(k), 1, 15)) AS BIGINT)
                  % 1000000007 AS hv
      FROM fin),
    sk AS (
      SELECT j, ((a * hv + b) % 1000000007) % 64 AS w,
             CAST(count(*) AS BIGINT) AS cnt
      FROM h CROSS JOIN hj GROUP BY 1, 2),
    probes AS (
      SELECT unnest(CAST([0, 3, 7, 11, 14] AS BIGINT[])) AS user_id),
    pp AS (
      SELECT p.user_id, hj.j,
             ((hj.a * (CAST(concat('0x',
                 substr(md5(CAST(p.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 1000000007) + hj.b) % 1000000007) % 64 AS w
      FROM probes p CROSS JOIN hj)
    SELECT pp.user_id, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_cnt
    FROM pp LEFT JOIN sk ON pp.j = sk.j AND pp.w = sk.w
    GROUP BY pp.user_id
    """,
)
def q_stream_cms_hitters(t: _T) -> DataFrame:
    """Streaming count-min: a 4x64 sketch PER day window built as a
    windowed streaming aggregation over exploded sketch cells, then
    the finalized windows' sketches merged cell-wise into one global
    sketch probed for fixed users. By linearity the merged sketch
    equals a batch sketch over the finalized-window events — exactly
    what the oracle rebuilds (same watermark-finalization predicate
    as stream_tumble). The mergeable-sketch rollup story, live on the
    streaming engine (operators/sketches.py + streaming.tumble_agg)."""
    from flink_efo_spark.operators.sketches import _cell, _h64, cms_estimate
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_table,
        tumble_agg,
    )

    ev = stream_table(
        t.spark, t.sf_dir, "events", watermark=("ts", "10 minutes")
    )
    h = _h64(F.col("user_id").cast("string"))
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("j"),
                    _cell(h, j, 64).alias("w"),
                )
                for j in range(4)
            ]
        )
    ).alias("c")
    ev2 = ev.select("ts", cells).select("ts", "c.j", "c.w")
    agg = tumble_agg(ev2, "ts", "1 day", ["j", "w"], F.count("*").alias("cnt"))
    wins = run_stream_to_table(agg)
    merged = wins.groupBy("j", "w").agg(F.sum("cnt").alias("cnt"))
    probes = t.spark.createDataFrame(
        [(u,) for u in [0, 3, 7, 11, 14]], "user_id long"
    ).select(F.col("user_id").cast("string").alias("uk"))
    est = cms_estimate(merged, probes, "uk", depth=4, width=64)
    return est.select(
        F.col("uk").cast("long").alias("user_id"),
        F.col("est_cnt").cast("long").alias("est_cnt"),
    )


@_q(
    "zorder_range_scan",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    WHERE datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            BETWEEN 9500 AND 9800
      AND CAST(round(o_totalprice * 100, 0) AS BIGINT)
            BETWEEN 5000000 AND 30000000
    GROUP BY o_orderpriority
    """,
)
def q_zorder_range_scan(t: _T) -> DataFrame:
    """Z-order clustered layout + pruned multi-dimensional range scan
    (operators/layout.py): orders are clustered by the Morton
    interleave of (order epoch-day, price-cents) grid cells and
    written partitioned by z-cell; the (10-month x 100k-200k) query
    box then reads ONLY the overlapping z-cells — partition pruning
    the plan shows as PartitionFilters (test-pinned) — before the
    exact predicate. Results are identical to a full scan, which is
    the oracle. The relational generalization of the persisted IVF
    index's partition-filter design."""
    import tempfile

    from flink_efo_spark.operators.layout import (
        write_zorder_layout,
        zorder_range_scan,
    )

    path = tempfile.mkdtemp(prefix="efo-zorder-") + "/orders"
    src = t.orders.withColumn(
        "o_day",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long"),
    ).withColumn(
        "o_price_cents",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint"),
    )
    specs = [("o_day", 9100, 11600), ("o_price_cents", 0, 50000000)]
    write_zorder_layout(src, path, specs, bits=3)
    hits = zorder_range_scan(
        t.spark, path, specs,
        box=[(9500, 9800), (5000000, 30000000)], bits=3,
    )
    return hits.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_price_cents").cast("long").alias("revenue_cents"),
    )


@_q(
    "bucketed_join",
    """
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 10000, 0) AS BIGINT)) AS BIGINT)
             AS revenue_e4
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def q_bucketed_join(t: _T) -> DataFrame:
    """Bucketed co-located fact-fact join (operators/layout.py):
    orders and lineitem are persisted bucketed+sorted on the order
    key with the same bucket count, and the join consumes the bucket
    partitioning directly — a sort-merge join with NO Exchange on
    either side (plan-pinned by test_layout.py). The one-time write
    shuffle amortizes over every subsequent join on the key — the
    100 TB answer to repeated fact-fact joins. Results equal the
    plain join, which is the oracle."""
    import tempfile
    import uuid

    from flink_efo_spark.operators.layout import bucketed_join, write_bucketed

    tag = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix="efo-bucket-")
    write_bucketed(
        t.orders.select("o_orderkey", "o_orderdate"),
        f"efo_b_orders_{tag}", base + "/orders", "o_orderkey", 8,
    )
    write_bucketed(
        t.lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
            ).cast("bigint").alias("rev_e4"),
        ),
        f"efo_b_lineitem_{tag}", base + "/lineitem", "o_orderkey", 8,
    )
    j = bucketed_join(
        t.spark, f"efo_b_orders_{tag}", f"efo_b_lineitem_{tag}", "o_orderkey",
        hint="merge",
    )
    return j.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev_e4").cast("long").alias("revenue_e4"),
    )


@_q(
    "pq_adc_topk",
    """
    WITH emb AS (
      SELECT vec_id AS id,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS v
      FROM embeddings),
    embs AS (SELECT id, pos, pos // 16 AS sub, v FROM emb),
    init_ids AS (
      SELECT vec_id AS id,
             CAST(rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
      FROM embeddings ORDER BY vec_id LIMIT 4),
    c0 AS (
      SELECT i.cid, e.sub, e.pos, e.v
      FROM embs e JOIN init_ids i ON e.id = i.id),
    d1 AS (
      SELECT e.id, e.sub, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dd
      FROM embs e JOIN c0 c ON e.pos = c.pos
      GROUP BY e.id, e.sub, c.cid),
    a1 AS (
      SELECT id, sub, cid FROM (
        SELECT id, sub, cid,
               row_number() OVER (PARTITION BY id, sub
                                  ORDER BY dd, cid) AS rn
        FROM d1) WHERE rn = 1),
    c1u AS (
      SELECT a1.cid, e.sub, e.pos,
             CAST(floor(sum(e.v) / count(*)) AS BIGINT) AS v
      FROM embs e JOIN a1 ON e.id = a1.id AND e.sub = a1.sub
      GROUP BY a1.cid, e.sub, e.pos),
    c1 AS (
      SELECT c0.cid, c0.sub, c0.pos, coalesce(c1u.v, c0.v) AS v
      FROM c0 LEFT JOIN c1u ON c0.cid = c1u.cid AND c0.pos = c1u.pos),
    d2 AS (
      SELECT e.id, e.sub, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dd
      FROM embs e JOIN c1 c ON e.pos = c.pos
      GROUP BY e.id, e.sub, c.cid),
    code AS (
      SELECT id, sub, cid FROM (
        SELECT id, sub, cid,
               row_number() OVER (PARTITION BY id, sub
                                  ORDER BY dd, cid) AS rn
        FROM d2) WHERE rn = 1),
    q AS (
      SELECT pos,
             CAST(floor((((pos * 37) % 100 - 50) / 250.0) * 1000000)
                  AS BIGINT) AS qv
      FROM (SELECT unnest(range(64)) AS pos)),
    lut AS (
      SELECT c.cid, c.sub, sum((q.qv - c.v) * (q.qv - c.v)) AS dd
      FROM c1 c JOIN q ON c.pos = q.pos
      GROUP BY c.cid, c.sub),
    adc AS (
      SELECT code.id, CAST(sum(lut.dd) AS BIGINT) AS adc_dist
      FROM code JOIN lut ON code.cid = lut.cid AND code.sub = lut.sub
      GROUP BY code.id)
    SELECT id AS vec_id, adc_dist FROM adc
    ORDER BY adc_dist, vec_id LIMIT 10
    """,
)
def q_pq_adc_topk(t: _T) -> DataFrame:
    """Product quantization ANN (Jegou et al. 2011,
    operators/similarity.py pq_train/pq_encode/pq_adc_topk): 4
    subspaces x 16 dims, k=4 codewords each trained with the
    exact-integer kmeans_train on the sliced embeddings; the corpus
    compresses to 4 codes/vector; the formula-generated query vector
    scores by ADC — a k x n_sub integer lookup table embedded as
    literals, n_sub array lookups per row, global top-10 with id
    tie-break. Every stage is exact integer arithmetic, so the DuckDB
    oracle replays training, encoding, AND the ADC ranking."""
    from flink_efo_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = t.embeddings
    books = pq_train(
        emb, "vec_id", "embedding", dim=64, n_sub=4, k=4, n_iter=1
    )
    codes = pq_encode(emb, "vec_id", "embedding", books)
    query = [((p * 37) % 100 - 50) / 250.0 for p in range(64)]
    return pq_adc_topk(codes, "vec_id", books, query, topk=10)


@_q(
    "corpus_pipeline",
    """
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
      FROM documents),
    kept AS (
      SELECT doc_id, nt FROM (
        SELECT doc_id, nt,
               row_number() OVER (PARTITION BY md5(nt)
                                  ORDER BY doc_id) AS rn
        FROM n) WHERE rn = 1),
    q AS (
      SELECT doc_id, list_filter(string_split(nt, ' '), t -> t <> '') AS ts
      FROM kept WHERE len(string_split(nt, ' ')) >= 10),
    c AS (
      SELECT doc_id,
             unnest(generate_series(0,
               greatest(CAST(ceil((len(ts) - 8) / 24.0) AS INT), 1) - 1))
               AS chunk_id,
             ts
      FROM q WHERE len(ts) > 0),
    ch AS (
      SELECT doc_id * 100000 + chunk_id AS chunk_key,
             CAST(len(ts[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS BIGINT)
               AS n_tokens
      FROM c),
    p AS (
      SELECT chunk_key, n_tokens,
             CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start_pos,
             CAST(floor((sum(n_tokens) OVER w - n_tokens) / 2000.0) AS BIGINT)
               AS shard_id
      FROM (SELECT chunk_key, n_tokens,
                   md5(CAST(chunk_key AS VARCHAR)) AS okey
            FROM ch)
      WINDOW w AS (ORDER BY okey, chunk_key))
    SELECT shard_id, count(*) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(start_pos) AS first_pos,
           CAST(max(start_pos + n_tokens) AS BIGINT) AS end_pos
    FROM p GROUP BY shard_id
    """,
)
def q_corpus_pipeline(t: _T) -> DataFrame:
    """The composed LLM-corpus build, end to end in ONE plan:
    normalize -> normalized exact dedup keep-first -> quality gate
    (>= 10 tokens) -> 32/8 token chunking -> 2000-token shard packing
    -> shard manifest. Every stage is an existing corpus operator
    (text.normalize_text, dedup.dedup_keep_first,
    text.chunk_documents, packing.pack_shards/shard_manifest) and the
    oracle replays the whole chain — demonstrating the stages compose
    without materialization barriers: narrow maps + one hash-shuffle
    (dedup) + explode + the bucketed prefix-sum pack."""
    from flink_efo_spark.operators.dedup import dedup_keep_first
    from flink_efo_spark.operators.packing import pack_shards, shard_manifest
    from flink_efo_spark.operators.text import chunk_documents, normalize_text

    norm = normalize_text(t.documents, "doc_id", "text")
    kept = dedup_keep_first(norm, ["norm_hash"], [F.col("doc_id")])
    quality = kept.where(F.size(F.split("norm_text", " ")) >= 10)
    chunks = chunk_documents(
        quality, "doc_id", "norm_text", chunk_tokens=32, overlap=8
    )
    ck = chunks.withColumn(
        "chunk_key", F.col("doc_id") * 100000 + F.col("chunk_id")
    )
    pack = pack_shards(ck, "chunk_key", "chunk_text", shard_tokens=2000)
    return shard_manifest(pack).select(
        "shard_id",
        F.col("n_docs").alias("n_chunks"),
        "total_tokens",
        "first_pos",
        "end_pos",
    )


@_q(
    "dialect_lateral",
    """
    WITH tf AS (
      SELECT t AS word FROM (
        SELECT unnest(string_split(trim(lower(text)), ' ')) AS t
        FROM documents) WHERE t <> '')
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM tf GROUP BY word HAVING count(*) >= 20
    ORDER BY cnt DESC, word LIMIT 20
    """,
)
def q_dialect_lateral(t: _T) -> DataFrame:
    """Flink LATERAL TABLE correlate SQL run verbatim through the
    dialect shim (dialect.rewrite_lateral_table -> Spark LATERAL
    VIEW; reference: Calcite COLLECTION_TABLE planned by
    Stream/BatchExecCorrelate, CorrelateITCase). Narrow expansion —
    no shuffle until the count aggregation."""
    from flink_efo_spark.session import EfoSession

    env = EfoSession(t.spark)
    t.documents.createOrReplaceTempView("__efo_lat_docs")
    return env.execute_sql(
        """
        SELECT t.word, CAST(count(*) AS BIGINT) AS cnt
        FROM __efo_lat_docs d,
             LATERAL TABLE(explode(split(trim(lower(d.text)), ' ')))
               AS t(word)
        WHERE t.word <> ''
        GROUP BY t.word HAVING count(*) >= 20
        ORDER BY cnt DESC, word LIMIT 20
        """
    )


def _co_purchase_edges(t: _T, weighted: bool = False) -> DataFrame:
    """Bidirectional customer<->supplier co-purchase graph shared by
    the graph-library queries (suppliers offset by 1e6 to disjoint
    the id spaces; optional deterministic integer weight (c+s)%7+1).
    Each query's embedded oracle derives the same graph in SQL."""
    orders, lineitem = t.orders, t.lineitem
    e0 = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1000000).alias("s"),
        )
        .distinct()
    )
    fwd = [F.col("c").alias("src"), F.col("s").alias("dst")]
    rev = [F.col("s").alias("src"), F.col("c").alias("dst")]
    if weighted:
        w = (F.col("c") + F.col("s")) % 7 + 1
        fwd.append(w.alias("w"))
        rev.append(w.alias("w"))
    # Pin the derived edge relation: every consumer is an iterative
    # algorithm that reads edges 3+ times (node set, out-degrees,
    # adjacency, per-round joins), and without the pin the
    # orders⋈lineitem distinct lineage re-executes per consumer
    # (guide §5 — cut lineage / compute shared inputs once). Edge
    # rows are O(distinct (cust, supp)) keys, payload-free. The
    # coalesce bounds the pinned partition count to the cluster's
    # core count (checkpoint materializes the pre-AQE fan-out, which
    # would otherwise pin 256 near-empty partitions into every
    # iteration round's stages; narrow merge, no shuffle).
    spark = e0.sparkSession
    return (
        e0.select(*fwd)
        .union(e0.select(*rev))
        .coalesce(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )


@_q(
    "pagerank_topn",
    """
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM e0
              UNION ALL SELECT s, c FROM e0),
    nodes AS (SELECT DISTINCT src AS id FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    outd AS (SELECT src, CAST(count(*) AS BIGINT) AS od
             FROM edges GROUP BY src),
    r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
    c1 AS (
      SELECT e.dst AS id,
             sum(CAST(floor((p.r * 85) / (100 * o.od)) AS BIGINT)) AS sc
      FROM edges e JOIN r0 p ON p.id = e.src JOIN outd o ON o.src = e.src
      GROUP BY e.dst),
    r1 AS (SELECT n.id, CAST(150000 + coalesce(c1.sc, 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN c1 ON c1.id = n.id),
    c2 AS (
      SELECT e.dst AS id,
             sum(CAST(floor((p.r * 85) / (100 * o.od)) AS BIGINT)) AS sc
      FROM edges e JOIN r1 p ON p.id = e.src JOIN outd o ON o.src = e.src
      GROUP BY e.dst),
    r2 AS (SELECT n.id, CAST(150000 + coalesce(c2.sc, 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN c2 ON c2.id = n.id),
    c3 AS (
      SELECT e.dst AS id,
             sum(CAST(floor((p.r * 85) / (100 * o.od)) AS BIGINT)) AS sc
      FROM edges e JOIN r2 p ON p.id = e.src JOIN outd o ON o.src = e.src
      GROUP BY e.dst),
    r3 AS (SELECT n.id, CAST(150000 + coalesce(c3.sc, 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN c3 ON c3.id = n.id)
    SELECT id AS node_id, r AS rank_e6 FROM r3
    ORDER BY rank_e6 DESC, node_id LIMIT 20
    """,
)
def q_pagerank_topn(t: _T) -> DataFrame:
    """Bulk-iteration PageRank (operators/iterate.py pagerank — the
    IterativeDataSet bulk form next to delta_iterate) over the
    bidirectional customer<->supplier co-purchase graph (suppliers
    offset by 1e6), 3 rounds at damping 0.85 in exact micro-rank
    integers — the DuckDB oracle replays the recursion unrolled.
    Top-20 hubs with node-id tie-break."""
    from flink_efo_spark.operators.iterate import pagerank

    ranks = pagerank(_co_purchase_edges(t), "src", "dst", n_iter=3)
    return (
        ranks.select(F.col("id").alias("node_id"), F.col("r").alias("rank_e6"))
        .orderBy(F.col("rank_e6").desc(), "node_id")
        .limit(20)
    )


@_q(
    "label_propagation",
    """
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM e0
              UNION ALL SELECT s, c FROM e0),
    nodes AS (SELECT DISTINCT src AS id FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    l0 AS (SELECT id, CAST(id AS BIGINT) AS label FROM nodes),
    m1 AS (SELECT e.dst AS id, p.label, count(*) AS cnt
           FROM edges e JOIN l0 p ON p.id = e.src GROUP BY e.dst, p.label),
    u1 AS (SELECT id, label, cnt FROM m1
           UNION ALL SELECT id, label, 1 AS cnt FROM l0),
    l1 AS (SELECT id, label FROM (
             SELECT id, label, row_number() OVER (
               PARTITION BY id ORDER BY cnt DESC, label DESC) AS rn
             FROM u1) WHERE rn = 1),
    m2 AS (SELECT e.dst AS id, p.label, count(*) AS cnt
           FROM edges e JOIN l1 p ON p.id = e.src GROUP BY e.dst, p.label),
    u2 AS (SELECT id, label, cnt FROM m2
           UNION ALL SELECT id, label, 1 AS cnt FROM l1),
    l2 AS (SELECT id, label FROM (
             SELECT id, label, row_number() OVER (
               PARTITION BY id ORDER BY cnt DESC, label DESC) AS rn
             FROM u2) WHERE rn = 1)
    SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members
    FROM l2 GROUP BY label
    ORDER BY n_members DESC, community LIMIT 20
    """,
)
def q_label_propagation(t: _T) -> DataFrame:
    """Gelly label propagation (flink-gelly library/
    LabelPropagation.java via operators/iterate.py label_propagation)
    over the bidirectional co-purchase graph: 2 synchronous rounds,
    labels seeded with the vertex id, each vertex arg-maxing
    (count, label) over its in-neighbor labels UNIONed with its own
    label at frequency 1 (UpdateVertexLabel's incumbent seed — a lone
    smaller neighbor label cannot displace the vertex's own). The
    oracle replays both rounds unrolled with the same incumbent union.
    Gelly's scatter activation (only message-receivers send next
    round) is vacuous here: the bidirectional edge set gives every
    vertex in-degree >= 1, so all vertices stay active. Top-20
    communities by size."""
    from flink_efo_spark.operators.iterate import label_propagation

    labels = label_propagation(_co_purchase_edges(t), "src", "dst", n_iter=2)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.col("n_members").desc(), "community")
        .limit(20)
    )


@_q(
    "sssp_distances",
    """
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (
      SELECT c AS src, s AS dst, (c + s) % 7 + 1 AS w FROM e0
      UNION ALL SELECT s, c, (c + s) % 7 + 1 FROM e0),
    d0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
    d1 AS (SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d0
             UNION ALL
             SELECT e.dst, d.dist + e.w FROM edges e
             JOIN d0 d ON d.node = e.src) GROUP BY node),
    d2 AS (SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d1
             UNION ALL
             SELECT e.dst, d.dist + e.w FROM edges e
             JOIN d1 d ON d.node = e.src) GROUP BY node),
    d3 AS (SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d2
             UNION ALL
             SELECT e.dst, d.dist + e.w FROM edges e
             JOIN d2 d ON d.node = e.src) GROUP BY node)
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
    FROM d3
    """,
)
def q_sssp_distances(t: _T) -> DataFrame:
    """Gelly single-source shortest paths (flink-gelly library/
    SingleSourceShortestPaths.java via operators/iterate.py
    sssp_distances): frontier-driven Bellman-Ford, 3 rounds from
    customer 1 over the weighted bidirectional co-purchase graph
    (integer weights (c+s)%7+1 — every round exact, so the DuckDB
    oracle replays the relaxations unrolled)."""
    from flink_efo_spark.operators.iterate import sssp_distances

    return sssp_distances(
        _co_purchase_edges(t, weighted=True),
        "src", "dst", "w", source=1, max_rounds=3,
    )


@_q(
    "triangle_enum",
    """
    WITH q AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
               WHERE l_quantity > 45),
    e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
          FROM q a JOIN q b ON a.l_orderkey = b.l_orderkey
                           AND a.l_suppkey < b.l_suppkey),
    tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
            FROM e ab JOIN e bc ON bc.u = ab.v
                      JOIN e ac ON ac.u = ab.u AND ac.v = bc.v)
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c,
           CAST(count(*) OVER () AS BIGINT) AS n_triangles
    FROM tri ORDER BY a, b, c LIMIT 50
    """,
)
def q_triangle_enum(t: _T) -> DataFrame:
    """Gelly triangle enumeration (flink-gelly library/
    TriangleEnumerator.java via operators/iterate.py
    triangle_enumerate — the degree-ordered compact-forward scheme,
    each triangle exactly once) over the supplier co-occurrence graph
    (suppliers sharing an order on high-quantity lines). First 50
    triangles lexicographically + the global count; the oracle
    enumerates naively — cheap at oracle scale, while the operator's
    degree orientation bounds the 2-path join at 100 TB."""
    from flink_efo_spark.operators.iterate import triangle_enumerate

    q = (
        t.lineitem.where(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = q.alias("a"), q.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
    )
    tri = triangle_enumerate(edges, "src", "dst")
    from pyspark.sql import Window

    return (
        tri.select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("c").cast("long").alias("c"),
            F.count(F.lit(1)).over(
                Window.partitionBy()
            ).cast("long").alias("n_triangles"),
        )
        .orderBy("a", "b", "c")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# flink-cep Pattern API (flink-libraries/flink-cep) — the library
# surface MATCH_RECOGNIZE cannot express: negative patterns
# (notNext/notFollowedBy, Pattern.java:273/:304), followedByAny
# branching (:322), until() (:220), and timed-out-partial output
# (PatternTimeoutFunction.java). operators/cep_pattern.py.
# ---------------------------------------------------------------------------


@_q(
    "cep_pattern_notfollowed",
    """
    WITH a AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS a_us
               FROM events WHERE event_type = 'view'),
    c0 AS (
      SELECT a.user_id, a.view_id, a.a_us,
             e.event_id AS click_id, epoch_us(e.ts) AS c_us,
             row_number() OVER (PARTITION BY a.user_id, a.view_id
                                ORDER BY e.ts, e.event_id) AS rn
      FROM a JOIN events e
        ON e.user_id = a.user_id AND e.event_type = 'click'
       AND epoch_us(e.ts) > a.a_us
       AND epoch_us(e.ts) <= a.a_us + CAST(1800 AS BIGINT) * 1000000),
    c AS (SELECT * FROM c0 WHERE rn = 1)
    SELECT user_id, view_id, click_id FROM c
    WHERE NOT EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        AND epoch_us(p.ts) > c.a_us AND epoch_us(p.ts) < c.c_us)
    """,
)
def q_cep_pattern_notfollowed(t: _T) -> DataFrame:
    """``begin(view).notFollowedBy(purchase).followedBy(click)
    .within(30min)`` — NOT_FOLLOW is a stop state (NFACompiler stop
    transitions): a purchase arriving between the view and its first
    subsequent click kills the branch. SKIP_TILL_NEXT on the click
    means the FIRST click is the only continuation, which is what
    makes the SQL oracle exact (first in-window click, then an
    anti-check on intervening purchases)."""
    from flink_efo_spark.operators.cep_pattern import (
        CepPattern,
        cep_pattern_select,
    )

    pat = (
        CepPattern.begin("a").where("event_type = 'view'")
        .not_followed_by("nb").where("event_type = 'purchase'")
        .followed_by("c").where("event_type = 'click'")
        .within(1800)
    )
    out = cep_pattern_select(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        pat,
        ["user_id"],
        "ts",
        {
            "view_id": ("a", "first", "event_id"),
            "click_id": ("c", "first", "event_id"),
        },
        tiebreak="event_id",
    )
    return out.select("user_id", "view_id", "click_id")


@_q(
    "cep_pattern_timeout",
    """
    WITH a AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS a_us
               FROM events WHERE event_type = 'view'),
    p0 AS (
      SELECT a.user_id, a.view_id, e.event_id AS purchase_id,
             row_number() OVER (PARTITION BY a.user_id, a.view_id
                                ORDER BY e.ts, e.event_id) AS rn
      FROM a JOIN events e
        ON e.user_id = a.user_id AND e.event_type = 'purchase'
       AND epoch_us(e.ts) > a.a_us
       AND epoch_us(e.ts) <= a.a_us + CAST(900 AS BIGINT) * 1000000)
    SELECT user_id, view_id, purchase_id, FALSE AS timed_out
    FROM p0 WHERE rn = 1
    UNION ALL
    SELECT a.user_id, a.view_id, CAST(NULL AS BIGINT), TRUE
    FROM a
    WHERE NOT EXISTS (
      SELECT 1 FROM events e
      WHERE e.user_id = a.user_id AND e.event_type = 'purchase'
        AND epoch_us(e.ts) > a.a_us
        AND epoch_us(e.ts) <= a.a_us + CAST(900 AS BIGINT) * 1000000)
    """,
)
def q_cep_pattern_timeout(t: _T) -> DataFrame:
    """``begin(view).followedBy(purchase).within(15min)`` with the
    timed-out side output (PatternTimeoutFunction.java): every view
    either matches its first in-window purchase or is reported as a
    timed-out partial when the window expires (bounded input ends in
    a MAX_WATERMARK flush, so end-of-input expires every open
    window). One row per view, ``timed_out`` flagging which path."""
    from flink_efo_spark.operators.cep_pattern import (
        CepPattern,
        cep_pattern_select,
    )

    pat = (
        CepPattern.begin("a").where("event_type = 'view'")
        .followed_by("b").where("event_type = 'purchase'")
        .within(900)
    )
    out = cep_pattern_select(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        pat,
        ["user_id"],
        "ts",
        {
            "view_id": ("a", "first", "event_id"),
            "purchase_id": ("b", "first", "event_id"),
        },
        tiebreak="event_id",
        emit_timeouts=True,
    )
    return out.select("user_id", "view_id", "purchase_id", "timed_out")


@_q(
    "cep_pattern_consecutive",
    """
    WITH o AS (SELECT user_id, event_id, event_type, ts,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    t3 AS (
      SELECT o1.user_id, o1.event_id AS first_err, o3.rn AS rn3
      FROM o o1
      JOIN o o2 ON o2.user_id = o1.user_id AND o2.rn = o1.rn + 1
      JOIN o o3 ON o3.user_id = o1.user_id AND o3.rn = o1.rn + 2
      WHERE o1.event_type = 'error' AND o2.event_type = 'error'
        AND o3.event_type = 'error'),
    s0 AS (
      SELECT t3.user_id, t3.first_err, s.event_id AS signup_id,
             row_number() OVER (PARTITION BY t3.user_id, t3.first_err
                                ORDER BY s.rn) AS rn
      FROM t3 JOIN o s
        ON s.user_id = t3.user_id AND s.event_type = 'signup'
       AND s.rn > t3.rn3)
    SELECT user_id, first_err, signup_id FROM s0 WHERE rn = 1
    """,
)
def q_cep_pattern_consecutive(t: _T) -> DataFrame:
    """``begin(error).times(3).consecutive().followedBy(signup)`` —
    times() with STRICT inner contiguity (Pattern.java:382/:480):
    three back-to-back errors in the per-user event order, then the
    first signup after the run. NoSkip (the library default) emits
    every anchor of an overlapping error run, exactly what the
    rn-self-join oracle enumerates."""
    from flink_efo_spark.operators.cep_pattern import (
        CepPattern,
        cep_pattern_select,
    )

    pat = (
        CepPattern.begin("e").where("event_type = 'error'")
        .times(3).consecutive()
        .followed_by("s").where("event_type = 'signup'")
    )
    out = cep_pattern_select(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        pat,
        ["user_id"],
        "ts",
        {
            "first_err": ("e", "first", "event_id"),
            "signup_id": ("s", "first", "event_id"),
        },
        tiebreak="event_id",
    )
    return out.select("user_id", "first_err", "signup_id")


@_q(
    "cep_pattern_greedy_until",
    """
    WITH o AS (SELECT user_id, event_id, event_type, ts,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    c AS (SELECT user_id, event_id, rn FROM o WHERE event_type = 'click'),
    b AS (
      SELECT c.user_id, c.event_id AS first_click, c.rn AS rn1,
             (SELECT min(u.rn) FROM o u
              WHERE u.user_id = c.user_id AND u.rn > c.rn
                AND u.event_type IN ('error', 'purchase')) AS stop_rn
      FROM c),
    l AS (
      SELECT b.user_id, b.first_click, max(c2.rn) AS last_rn,
             CAST(count(*) AS BIGINT) AS n_clicks
      FROM b JOIN c c2
        ON c2.user_id = b.user_id AND c2.rn >= b.rn1
       AND (b.stop_rn IS NULL OR c2.rn < b.stop_rn)
      GROUP BY b.user_id, b.first_click),
    p0 AS (
      SELECT l.user_id, l.first_click, l.n_clicks,
             p.event_id AS purchase_id,
             row_number() OVER (PARTITION BY l.user_id, l.first_click
                                ORDER BY p.rn) AS rn
      FROM l JOIN o p
        ON p.user_id = l.user_id AND p.event_type = 'purchase'
       AND p.rn > l.last_rn)
    SELECT user_id, first_click, n_clicks, purchase_id
    FROM p0 WHERE rn = 1
    """,
)
def q_cep_pattern_greedy_until(t: _T) -> DataFrame:
    """``begin(click).oneOrMore().greedy().until(error|purchase)
    .followedBy(purchase)`` — greedy looping (Pattern.java:367) with
    an until() boundary (:220): from each anchor click, consume every
    click up to the first error-or-purchase, then take the first
    purchase after the run. Because until() also covers the purchase
    type, no loop gap can hide a purchase, so greedy never backtracks
    and the islands-style SQL oracle is exact."""
    from flink_efo_spark.operators.cep_pattern import (
        CepPattern,
        cep_pattern_select,
    )

    pat = (
        CepPattern.begin("c").where("event_type = 'click'")
        .one_or_more().greedy()
        .until("event_type IN ('error', 'purchase')")
        .followed_by("p").where("event_type = 'purchase'")
    )
    out = cep_pattern_select(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        pat,
        ["user_id"],
        "ts",
        {
            "first_click": ("c", "first", "event_id"),
            "n_clicks": ("c", "count", "event_id"),
            "purchase_id": ("p", "first", "event_id"),
        },
        tiebreak="event_id",
    )
    return out.select("user_id", "first_click", "n_clicks", "purchase_id")


@_q(
    "stream_cep_pattern",
    """
    WITH a AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS a_us
               FROM events WHERE event_type = 'view'),
    p0 AS (
      SELECT a.user_id, a.view_id, e.event_id AS purchase_id,
             row_number() OVER (PARTITION BY a.user_id, a.view_id
                                ORDER BY e.ts, e.event_id) AS rn
      FROM a JOIN events e
        ON e.user_id = a.user_id AND e.event_type = 'purchase'
       AND epoch_us(e.ts) > a.a_us
       AND epoch_us(e.ts) <= a.a_us + CAST(900 AS BIGINT) * 1000000)
    SELECT user_id, view_id, purchase_id, FALSE AS timed_out
    FROM p0 WHERE rn = 1
    UNION ALL
    SELECT a.user_id, a.view_id, CAST(NULL AS BIGINT), TRUE
    FROM a
    WHERE NOT EXISTS (
      SELECT 1 FROM events e
      WHERE e.user_id = a.user_id AND e.event_type = 'purchase'
        AND epoch_us(e.ts) > a.a_us
        AND epoch_us(e.ts) <= a.a_us + CAST(900 AS BIGINT) * 1000000)
    """,
)
def q_stream_cep_pattern(t: _T) -> DataFrame:
    """STREAMING Pattern API (operator/CepOperator.java keyed NFA
    state + PatternTimeoutFunction on watermark-expired windows):
    ``begin(view).followedBy(purchase).within(15min)`` over a 2-batch
    event-time replay with emit_timeouts — matches and timed-out
    partials emit per the frontier rule as anchors resolve across
    micro-batches, and the far-future sentinel fires the
    MAX_WATERMARK flush so the bounded replay equals the batch
    operator (same oracle as ``cep_pattern_timeout``)."""
    import datetime

    from flink_efo_spark.operators.cep_pattern import (
        CepPattern,
        stream_cep_pattern_select,
    )
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_table_split,
    )

    max_ts = t.events.agg(F.max("ts")).collect()[0][0]
    src = stream_table_split(
        t.spark, t.sf_dir, "events", 2, "ts",
        watermark=("ts", "10 minutes"),
        sentinel_rows=[
            {"event_id": -1, "user_id": -1, "event_type": "__wm__",
             "ts": max_ts + datetime.timedelta(hours=2), "value": 0.0}
        ],
    )
    pat = (
        CepPattern.begin("a").where("event_type = 'view'")
        .followed_by("b").where("event_type = 'purchase'")
        .within(900)
    )
    out = stream_cep_pattern_select(
        src.select("user_id", "event_id", "event_type", "ts"),
        pat,
        ["user_id"],
        "ts",
        {
            "view_id": ("a", "first", "event_id"),
            "purchase_id": ("b", "first", "event_id"),
        },
        tiebreak="event_id",
        emit_timeouts=True,
        flush_on_timeout=True,
        # MAX_WATERMARK analog (sentinel at max_ts+2h, 10min delay);
        # mid-stream idle timeouts resolve only watermark-closed
        # 15-minute windows and preserve every open anchor
        end_of_input_ts=max_ts + datetime.timedelta(minutes=1),
    )
    return (
        run_stream_to_table(out)
        .where(F.col("user_id") >= 0)
        .select("user_id", "view_id", "purchase_id", "timed_out")
    )


@_q(
    "cep_pattern_iterative",
    """
    WITH a AS (SELECT user_id, event_id AS view_id, value AS a_value,
                      epoch_us(ts) AS a_us
               FROM events WHERE event_type = 'view'),
    p0 AS (
      SELECT a.user_id, a.view_id, e.event_id AS purchase_id,
             row_number() OVER (PARTITION BY a.user_id, a.view_id
                                ORDER BY e.ts, e.event_id) AS rn
      FROM a JOIN events e
        ON e.user_id = a.user_id AND e.event_type = 'purchase'
       AND epoch_us(e.ts) > a.a_us
       AND e.value > 2 * a.a_value)
    SELECT user_id, view_id, purchase_id FROM p0 WHERE rn = 1
    """,
)
def q_cep_pattern_iterative(t: _T) -> DataFrame:
    """Iterative condition (IterativeCondition.java — ``filter(event,
    ctx)`` navigating ``ctx.getEventsForPattern``): the purchase
    stage's condition compares the candidate's value against the
    BOUND view's (``last_a_value``), so it cannot be a row-wise
    flag — the matcher evaluates it against the in-progress binding.
    SKIP_TILL_NEXT then takes the FIRST purchase satisfying the
    binding-dependent predicate, which the rn=1-over-filtered-join
    oracle reproduces exactly (identical IEEE ``value > 2*a_value``
    comparison both sides)."""
    from flink_efo_spark.operators.cep_pattern import (
        CepPattern,
        cep_pattern_select,
    )

    pat = (
        CepPattern.begin("a").where("event_type = 'view'")
        .followed_by("b")
        .where("event_type = 'purchase' AND value > 2 * last_a_value")
    )
    out = cep_pattern_select(
        t.events.select("user_id", "event_id", "event_type", "ts", "value"),
        pat,
        ["user_id"],
        "ts",
        {
            "view_id": ("a", "first", "event_id"),
            "purchase_id": ("b", "first", "event_id"),
        },
        tiebreak="event_id",
    )
    return out.select("user_id", "view_id", "purchase_id")


@_q(
    "stream_coprocess_rules",
    """
    WITH o AS (SELECT user_id, event_id, event_type, value,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    d AS (SELECT user_id, event_id, rn FROM o WHERE event_type = 'click'),
    c AS (SELECT user_id, value, rn FROM o WHERE event_type = 'signup'),
    j AS (
      SELECT d.user_id, d.event_id, d.rn,
             (SELECT max(c.rn) FROM c
              WHERE c.user_id = d.user_id AND c.rn < d.rn) AS rule_rn
      FROM d)
    SELECT j.user_id, j.event_id, c.value AS rule_value,
           CAST(row_number() OVER (PARTITION BY j.user_id, j.rule_rn
                                   ORDER BY j.rn) AS BIGINT)
             AS n_since_rule
    FROM j LEFT JOIN c
      ON c.user_id = j.user_id AND c.rn = j.rule_rn
    """,
)
def q_stream_coprocess_rules(t: _T) -> DataFrame:
    """Connected streams with shared keyed state
    (co/KeyedCoProcessFunction.java via DataStream.connect): signup
    events install a per-user rule value, click events emit stamped
    with the rule in effect at their event time plus a count since
    that rule was installed — a two-input keyed state machine with
    watermark-gated event-time emission, run over a 2-batch replay so
    rules cross micro-batch boundaries. Oracle: asof (max preceding
    signup) + windowed count per (user, rule) segment."""
    import datetime

    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_keyed_coprocess,
        stream_table_split,
    )

    max_ts = t.events.agg(F.max("ts")).collect()[0][0]
    # the sentinels must PASS each branch's event_type filter (the
    # filter pushes below the watermark node, so a '__wm__'-typed row
    # would never advance this operator's watermark and held rows at
    # the last real timestamps could never release); user_id=-1 keeps
    # them out of the result via the final user_id >= 0 filter
    src = stream_table_split(
        t.spark, t.sf_dir, "events", 2, "ts",
        watermark=("ts", "10 minutes"),
        sentinel_rows=[
            {"event_id": -1, "user_id": -1, "event_type": "click",
             "ts": max_ts + datetime.timedelta(hours=2), "value": 0.0},
            {"event_id": -2, "user_id": -1, "event_type": "signup",
             "ts": max_ts + datetime.timedelta(hours=2), "value": 0.0},
        ],
    )
    out = stream_keyed_coprocess(
        src.where(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts", "value"
        ),
        src.where(F.col("event_type") == "signup").select(
            "user_id", "ts", "value"
        ),
        ["user_id"],
        "ts",
        "ts",
        rule_cols=["value"],
        data_cols=["event_id"],
        tiebreak="event_id",
        flush_on_timeout=True,
    )
    return (
        run_stream_to_table(out)
        .where(F.col("user_id") >= 0)
        .select("user_id", "event_id", "rule_value", "n_since_rule")
    )


@_q(
    "stream_broadcast_rules",
    """
    WITH o AS (SELECT event_id, user_id, event_type, ts, value,
                      row_number() OVER (ORDER BY ts, event_id) AS rn
               FROM events),
    d AS (SELECT event_id, user_id, rn FROM o WHERE event_type = 'click'),
    c AS (SELECT value, rn FROM o WHERE event_type = 'error'),
    j AS (SELECT d.event_id, d.user_id,
                 (SELECT max(c.rn) FROM c WHERE c.rn < d.rn) AS rule_rn
          FROM d)
    SELECT j.user_id, j.event_id, c.value AS rule_value
    FROM j LEFT JOIN c ON c.rn = j.rule_rn
    """,
)
def q_stream_broadcast_rules(t: _T) -> DataFrame:
    """Broadcast state pattern (co/BroadcastProcessFunction.java +
    BroadcastState): error events install a GLOBAL rule value that
    must reach every key — including users whose first click arrives
    long after the rule — so control rows are replicated per bucket
    (instance), never per key. Each click emits stamped with the
    global rule in effect at its event time, across a 4-batch replay.
    Oracle: global asof (latest error before the click in the total
    event order)."""
    import datetime

    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_broadcast_process,
        stream_table_split,
    )

    max_ts = t.events.agg(F.max("ts")).collect()[0][0]
    src = stream_table_split(
        t.spark, t.sf_dir, "events", 4, "ts",
        watermark=("ts", "10 minutes"),
        sentinel_rows=[
            {"event_id": -1, "user_id": -1, "event_type": "click",
             "ts": max_ts + datetime.timedelta(hours=2), "value": 0.0}
        ],
    )
    out = stream_broadcast_process(
        src.where(
            (F.col("event_type") == "click") | (F.col("user_id") < 0)
        ).select("user_id", "event_id", "ts", "value"),
        src.where(F.col("event_type") == "error").select("ts", "value"),
        key_col="user_id",
        data_ts="ts",
        control_ts="ts",
        rule_cols=["value"],
        data_cols=["user_id", "event_id"],
        n_buckets=8,
        tiebreak="event_id",
        flush_on_timeout=True,
    )
    return (
        run_stream_to_table(out)
        .where(F.col("user_id") >= 0)
        .select("user_id", "event_id", "rule_value")
    )


@_q(
    "cep_pattern_group",
    """
    WITH o AS (SELECT user_id, event_id, event_type,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    s AS (SELECT user_id, event_id AS signup_id, rn FROM o
          WHERE event_type = 'signup'),
    w1 AS (SELECT s.*,
                  (SELECT min(x.rn) FROM o x
                   WHERE x.user_id = s.user_id AND x.rn > s.rn
                     AND x.event_type = 'click') AS rb1
           FROM s),
    w2 AS (SELECT w1.*,
                  (SELECT min(x.rn) FROM o x
                   WHERE x.user_id = w1.user_id AND x.rn > w1.rb1
                     AND x.event_type = 'purchase') AS rc1
           FROM w1 WHERE rb1 IS NOT NULL),
    w3 AS (SELECT w2.*,
                  (SELECT min(x.rn) FROM o x
                   WHERE x.user_id = w2.user_id AND x.rn > w2.rc1
                     AND x.event_type = 'click') AS rb2
           FROM w2 WHERE rc1 IS NOT NULL),
    w4 AS (SELECT w3.*,
                  (SELECT min(x.rn) FROM o x
                   WHERE x.user_id = w3.user_id AND x.rn > w3.rb2
                     AND x.event_type = 'purchase') AS rc2
           FROM w3 WHERE rb2 IS NOT NULL),
    w5 AS (SELECT w4.*,
                  (SELECT min(x.rn) FROM o x
                   WHERE x.user_id = w4.user_id AND x.rn > w4.rc2
                     AND x.event_type = 'error') AS rd
           FROM w4 WHERE rc2 IS NOT NULL)
    SELECT w5.user_id, w5.signup_id,
           ob.event_id AS first_click, oc.event_id AS last_purchase,
           od.event_id AS error_id
    FROM w5
    JOIN o ob ON ob.user_id = w5.user_id AND ob.rn = w5.rb1
    JOIN o oc ON oc.user_id = w5.user_id AND oc.rn = w5.rc2
    JOIN o od ON od.user_id = w5.user_id AND od.rn = w5.rd
    WHERE w5.rd IS NOT NULL
    """,
)
def q_cep_pattern_group(t: _T) -> DataFrame:
    """GroupPattern (pattern/GroupPattern.java — ``Pattern.begin(
    Pattern)`` quantified SUB-SEQUENCES, compiled inline by
    NFACompiler with the group's consuming strategy on the body
    head): ``signup followedBy (click followedBy purchase).times(2)
    followedBy error``. Every step is a SKIP_TILL_NEXT first-match,
    so the whole chain is deterministic per signup anchor and the
    chained min-rn subquery oracle reproduces it exactly."""
    from flink_efo_spark.operators.cep_pattern import (
        CepPattern,
        cep_pattern_select,
    )

    body = (
        CepPattern.begin("b").where("event_type = 'click'")
        .followed_by("c").where("event_type = 'purchase'")
    )
    pat = (
        CepPattern.begin("a").where("event_type = 'signup'")
        .followed_by_group(body).times(2)
        .followed_by("d").where("event_type = 'error'")
    )
    out = cep_pattern_select(
        t.events.select("user_id", "event_id", "event_type", "ts"),
        pat,
        ["user_id"],
        "ts",
        {
            "signup_id": ("a", "first", "event_id"),
            "first_click": ("b", "first", "event_id"),
            "last_purchase": ("c", "last", "event_id"),
            "error_id": ("d", "first", "event_id"),
        },
        tiebreak="event_id",
    )
    return out.select(
        "user_id", "signup_id", "first_click", "last_purchase", "error_id"
    )


_INC_NEAR_SIGS = ", ".join(
    f"list_min(list_transform(hs, h -> "
    f"(({2 * j + 1} * h + {104729 * j + 12345}) % 2147483647))) AS s{j}"
    for j in range(12)
)
# band key b = the joined 4-slice of the signature; string equality of
# the slices == equality of the engine's md5-prefix band hashes
# (modulo a ~2^-60 md5-collision class, same one minhash_pairs accepts)
_INC_NEAR_BANDS = ", ".join(
    "array_to_string(["
    + ", ".join(f"s{4 * b + r}" for r in range(4))
    + f"], '_') AS b{b}"
    for b in range(3)
)
_INC_NEAR_EQ = " OR ".join(f"e.b{b} = d.b{b}" for b in range(3))


@_q(
    "incremental_near_dedup",
    f"""
    WITH t AS (SELECT doc_id, n_chars, doc_id % 2 AS epoch,
                      string_split(trim(lower(text)), ' ') AS t
               FROM documents),
    sh AS (SELECT doc_id, n_chars, epoch,
                  list_distinct(CASE WHEN len(t) >= 3
                    THEN [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)]
                    ELSE [] END) AS shingles
           FROM t),
    hs AS (SELECT doc_id, n_chars, epoch,
                  list_transform(shingles, s ->
                    CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                      % 2147483647) AS hs
           FROM sh WHERE len(shingles) > 0),
    sig0 AS (SELECT doc_id, n_chars, epoch, {_INC_NEAR_SIGS} FROM hs),
    sig AS (SELECT doc_id, n_chars, epoch, {_INC_NEAR_BANDS} FROM sig0),
    dup AS (SELECT d.doc_id FROM sig d
            WHERE d.epoch = 1 AND EXISTS (
              SELECT 1 FROM sig e
              WHERE (e.epoch = 0
                     OR (e.epoch = 1 AND e.doc_id < d.doc_id))
                AND ({_INC_NEAR_EQ})))
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id % 2 = 1
      AND doc_id NOT IN (SELECT doc_id FROM dup)
    """,
)
def q_incremental_near_dedup(t: _T) -> DataFrame:
    """Incremental NEAR-duplicate dedup against an LSH band-key store
    (dedup.py dedup_incremental_near): even-id documents build the
    store (their distinct band keys — historical bodies never kept or
    rescanned), odd-id documents then dedup against the store plus
    earlier docs of their own batch. Banded-MinHash collision (3
    bands x 4 rows, effective Jaccard threshold ~0.75) IS the
    equivalence; the oracle replays the exact integer signature
    pipeline (portable md5-prefix hash, affine permutations mod
    2^31-1) and the same order-deterministic decision rule."""
    from flink_efo_spark.operators.dedup import dedup_incremental_near

    docs = t.documents
    epoch0 = docs.where(F.col("doc_id") % 2 == 0)
    epoch1 = docs.where(F.col("doc_id") % 2 == 1)
    empty_store = t.spark.createDataFrame(
        [], "band_idx int, band_hash bigint"
    )
    _, store = dedup_incremental_near(epoch0, empty_store, "doc_id", "text")
    survivors, _ = dedup_incremental_near(epoch1, store, "doc_id", "text")
    return survivors.select("doc_id", "n_chars")


@_q(
    "mixture_sample",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               AS BIGINT)
          < CASE lang WHEN 'en' THEN 32768 WHEN 'de' THEN 16384
                      WHEN 'fr' THEN 6553 ELSE 3276 END
    """,
)
def q_mixture_sample(t: _T) -> DataFrame:
    """Deterministic source-mixture sampling (operators/sampling.py):
    per-language keep rates (50% en, 25% de, 10% fr, 5% rest) drawn by
    a stable id hash — the reproducible data-mixing primitive of a
    training corpus pipeline. Narrow map, no shuffle, predicate fused
    into the scan; identical draw in any engine."""
    from flink_efo_spark.operators.sampling import mixture_sample

    return mixture_sample(
        t.documents, "doc_id", "lang",
        {"en": 0.5, "de": 0.25, "fr": 0.1},
        default_rate=0.05,
    ).select("doc_id", "lang", "n_chars")


@_q(
    "token_budget_sample",
    """
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             sum(n_chars) OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum,
             CASE lang WHEN 'en' THEN 20000 WHEN 'de' THEN 8000
                       WHEN 'zh' THEN 5000 END AS budget
      FROM documents)
    WHERE budget IS NOT NULL AND cum - n_chars < budget
    """,
)
def q_token_budget_sample(t: _T) -> DataFrame:
    """Budgeted mixture sampling (operators/sampling.py
    token_budget_sample): per-language TOKEN budgets (char proxy)
    drawn in stable hash order — training mixes are specified in
    tokens, and the draw must replay identically across runs and
    engines. The per-group prefix sum runs as a two-level
    (group, hex-bucket) decomposition — n_groups × 256 tasks, never
    one task per group — with the identical admitted set (the oracle
    replays the naive single-window SQL); groups without a budget
    drop."""
    from flink_efo_spark.operators.sampling import token_budget_sample

    return token_budget_sample(
        t.documents, "doc_id", "lang", "n_chars",
        {"en": 20000, "de": 8000, "zh": 5000},
    ).select("doc_id", "lang", "n_chars")


@_q(
    "dedup_keep_best",
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + ", "
    + _PAIRS_SQL
    + """
    , best AS (
      SELECT cluster_id, node AS keep_id FROM (
        SELECT c.cluster_id, c.node,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rn
        FROM cc c JOIN documents d ON d.doc_id = c.node)
      WHERE rn = 1)
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (
      SELECT c.node FROM cc c JOIN best b ON b.cluster_id = c.cluster_id
      WHERE c.node != b.keep_id)
    """,
)
def q_dedup_keep_best(t: _T) -> DataFrame:
    """Canonical selection per near-dup cluster: instead of the min-id
    survivor (dedup_survivors), keep the LONGEST document per cluster
    (n_chars, doc_id-min tiebreak) — the keep-best heuristic real
    corpus builds use (a longer page usually subsumes its
    boilerplate-trimmed duplicates). Pipeline: MinHash-LSH pairs →
    connected components → per-cluster arg-max → anti-join; bodies
    shuffle zero times after shingling."""
    from flink_efo_spark.operators.clustering import connected_components
    from flink_efo_spark.operators.dedup import minhash_near_duplicates

    docs = t.documents
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text",
        threshold=0.6, num_perm=12, bands=12, shingle_size=3,
    )
    cc = connected_components(pairs, "id_a", "id_b")
    best = (
        cc.join(docs.select("doc_id", "n_chars"),
                cc.node == F.col("doc_id"))
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                "node", F.struct(F.col("n_chars"), -F.col("doc_id"))
            ).alias("keep_id")
        )
    )
    losers = (
        cc.join(F.broadcast(best), "cluster_id")
        .where(F.col("node") != F.col("keep_id"))
        .select(F.col("node").alias("doc_id"))
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


@_q(
    "stream_token_budget",
    """
    WITH o AS (SELECT doc_id, lang, n_chars,
                      ntile(3) OVER (ORDER BY doc_id) AS b,
                      md5(CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    w AS (SELECT doc_id, lang, n_chars,
                 sum(n_chars) OVER (PARTITION BY lang
                                    ORDER BY b, h, doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS cum,
                 CASE lang WHEN 'en' THEN 20000 WHEN 'de' THEN 8000
                           WHEN 'zh' THEN 5000 END AS budget
          FROM o)
    SELECT doc_id, lang, n_chars FROM w
    WHERE budget IS NOT NULL AND cum - n_chars < budget
    """,
)
def q_stream_token_budget(t: _T) -> DataFrame:
    """STREAMING quota admission (stream_token_budget_sample): per-
    language token budgets enforced across a 3-batch replay with ONE
    long of state per group (a quota ledger, not a buffer). Arrival
    order decides, id-hash order inside each batch — the oracle
    reproduces the batching with ntile(3) over the split order and a
    (batch, hash) window cumsum."""
    from flink_efo_spark.streaming import (
        run_stream_to_table,
        stream_table_split,
        stream_token_budget_sample,
    )

    src = stream_table_split(
        t.spark, t.sf_dir, "documents", 3, "doc_id"
    ).select("doc_id", "lang", "n_chars")
    out = stream_token_budget_sample(
        src, "doc_id", "lang", "n_chars",
        {"en": 20000, "de": 8000, "zh": 5000},
    )
    return run_stream_to_table(out).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# Gelly graph-operator corpus (round-8 staging -> registered round 9):
# the 12 (engine, DuckDB-oracle) pairs for the iterate.py library tail
# — similarity, HITS, community detection, clustering metrics and
# censuses (both directions), summarization, bipartite projections,
# vertex/edge metrics. Each pair was verified against DuckDB at
# sf0.001 AND sf0.01 under the driver's comparison rules by
# tests/test_graph_oracles.py before registration.


def _register_graph_queries() -> None:
    from flink_efo_spark.catalog import ensure_session_confs
    from flink_efo_spark.graph_queries import GRAPH_ORACLES, GRAPH_QUERIES

    for name, fn in GRAPH_QUERIES.items():
        def wrapped(
            spark: SparkSession, sf_dir: str, _fn=fn
        ) -> DataFrame:
            ensure_session_confs(spark)
            return _fn(spark, sf_dir)

        QUERIES[name] = wrapped
        ORACLES[name] = GRAPH_ORACLES[name]


_register_graph_queries()


# ---------------------------------------------------------------------------
# Round-10 registration of the round-9 staging modules: 5 graph rows
# (generators, masked triangle listing, the Pregel vertex-centric
# harness, evolving-graph streaming PageRank) from graph_queries_r10
# and 7 curation rows (SemDeDup semantic dedup x3, DSIR importance
# resampling, exact-substring span dedup x2, the composed
# boilerplate-filter -> DSIR pipeline) from curation_queries_r10.
# Each pair was verified against DuckDB at sf0.001 AND sf0.01 under
# the driver's comparison rules (tests/test_graph_oracles_r10.py,
# tests/test_curation_oracles_r10.py) before this merge.


def _register_staged_r10() -> None:
    from flink_efo_spark.catalog import ensure_session_confs

    for modname in ("graph_queries_r10", "curation_queries_r10"):
        mod = __import__(
            f"flink_efo_spark.{modname}", fromlist=["STAGED_QUERIES"]
        )
        for name, fn in mod.STAGED_QUERIES.items():
            def wrapped(
                spark: SparkSession, sf_dir: str, _fn=fn
            ) -> DataFrame:
                ensure_session_confs(spark)
                return _fn(spark, sf_dir)

            QUERIES[name] = wrapped
            ORACLES[name] = mod.STAGED_ORACLES[name]


_register_staged_r10()
