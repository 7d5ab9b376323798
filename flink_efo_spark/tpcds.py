"""TPC-DS-shaped star schema + query corpus over the TPC-H base tables.

The reference proves its relational planner on the full 103-query
TPC-DS corpus (flink-end-to-end-tests/flink-tpcds-test/
TpcdsTestProgram.java:49, schema/TpcdsSchemaProvider.java, answer
comparison in utils/TpcdsResultComparator.java). The driver fixtures
here are TPC-H-shaped, so this module derives the TPC-DS star schema
— three sales-channel facts, their returns, and the conformed
dimensions — deterministically from the TPC-H tables, then
re-expresses a structurally representative slice of the TPC-DS
corpus over it: star joins, correlated scalar subqueries, CTE
self-joins, cross-channel UNION ALL, ROLLUP + windowed rank,
semi/anti subqueries, and scalar-subquery grids.

Derivation (identical on the Spark and DuckDB sides):

* channel split — ``l_linenumber % 3``: 0 → store_sales,
  1 → catalog_sales, 2 → web_sales; each fact is the
  lineitem ⋈ orders projection with channel-prefixed columns;
* returns — the channel's rows with ``l_returnflag = 'R'``;
* date_dim — distinct order + ship dates with year/moy/qoy/dom;
* item ← part, customer_dim ← customer, customer_address ←
  nation ⋈ region, store/warehouse ← supplier ⋈ nation.

Scale: the dimensions are tiny at any SF (dates ≈ few thousand rows,
item/store bounded by the base dims) — AQE broadcasts every dim join,
so each star query is one shuffle on its group-by key. The facts are
narrow projections of the lineitem ⋈ orders join; at 100 TB you would
materialize them once (partitioned by sold_date, bucketed by item_sk)
instead of re-deriving per query — the queries below only depend on
the fact *schema*, not on how the rows got there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_efo_spark.queries import _q, _T

_C = F.col


def _exact_avg(c, scale: int):
    """Cross-engine bit-stable average of a fixed-point column: snap
    each value to an exact integer at ``scale`` (cent) precision,
    sum as BIGINT (exact, order-independent), divide by the exact
    BIGINT count, then round to one unit. Every intermediate is
    identical on Spark and DuckDB, so boundary values cannot flip —
    unlike round(avg(x), k), where the engines' double sums differ in
    the last ulp exactly where ties live."""
    ints = F.round(c * scale, 0).cast("bigint")
    return F.floor(F.sum(ints) / F.count(F.lit(1)) + F.lit(0.5)) / scale


def _exact_avg_sql(x: str, scale: int) -> str:
    return (
        f"floor(sum(CAST(round(({x}) * {scale}, 0) AS BIGINT))"
        f" / count(*) + 0.5) / {scale}"
    )


def _year_range(c, y0: int, y1: int | None = None):
    """year(c) ∈ [y0, y1] as a half-open range predicate on the date
    column itself. Unlike ``year(c) == Y`` (opaque to the scan), the
    range survives Catalyst's cast-unwrapping into the parquet scan's
    PushedFilters (guide §6) — identical rows (the session TZ is
    pinned UTC, so cast(ts as date) truncation and the range agree),
    but at scale the scan prunes row groups instead of decoding every
    date value."""
    lo = F.lit(f"{y0}-01-01").cast("date")
    hi = F.lit(f"{(y1 if y1 is not None else y0) + 1}-01-01").cast("date")
    return (c >= lo) & (c < hi)


def _cents(c, scale: int = 10000):
    """Exact BIGINT snap of a fixed-point double column (×scale).

    The base money columns are exact 2-decimal values, so products
    like net_paid are exact 4-decimal values: ×10000 rounds to the
    SAME integer on both engines (no .5 ties possible off the fixed
    grid), and BIGINT sums are exact and order-independent. This is
    what makes every money aggregate below bit-stable — round(sum(x),
    2) on raw double sums sits exactly ON the half-cent boundary
    whenever the true sum ends in .xx5 (P≈1/100 per output value with
    4-decimal addends), and the engines' different summation orders
    then flip the rounded output intermittently."""
    return F.round(c * scale, 0).cast("bigint")


def _exact_money_sum(c, scale: int = 10000):
    """sum(c) rounded to cents, bit-stable: exact integer sum, one
    IEEE division + floor on identical operands."""
    return F.floor(F.sum(_cents(c, scale)) / (scale // 100) + F.lit(0.5)) / 100


def _ems_sql(x: str, scale: int = 10000) -> str:
    return (
        f"floor(sum(CAST(round(({x}) * {scale}, 0) AS BIGINT))"
        f" / {scale // 100} + 0.5) / 100"
    )


# ---------------------------------------------------------------------------
# Derived star schema: DuckDB CTE text (oracle side)
# ---------------------------------------------------------------------------

def _fact_sql(prefix: str, channel: int, loc: str, order: str) -> str:
    p = prefix
    return f"""
    SELECT CAST(o.o_orderdate AS DATE) AS {p}sold_date,
           CAST(l.l_shipdate AS DATE)  AS {p}ship_date,
           l.l_partkey  AS {p}item_sk,
           o.o_custkey  AS {p}customer_sk,
           l.l_suppkey  AS {p}{loc},
           l.l_orderkey AS {p}{order},
           l.l_quantity AS {p}quantity,
           l.l_extendedprice AS {p}ext_list_price,
           l.l_extendedprice * (1 - l.l_discount) AS {p}net_paid,
           l.l_extendedprice * l.l_discount AS {p}ext_discount_amt,
           l.l_extendedprice * l.l_tax AS {p}ext_ship_cost,
           l.l_extendedprice * (1 - l.l_discount) - l.l_extendedprice * 0.8
             AS {p}net_profit,
           l.l_returnflag AS {p}return_flag
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_linenumber % 3 = {channel}
    """


def _returns_sql(prefix: str, channel: int, loc: str, order: str) -> str:
    p = prefix
    return f"""
    SELECT CAST(l.l_shipdate AS DATE) AS {p}returned_date,
           l.l_partkey  AS {p}item_sk,
           o.o_custkey  AS {p}customer_sk,
           l.l_suppkey  AS {p}{loc},
           l.l_orderkey AS {p}{order},
           l.l_quantity AS {p}return_quantity,
           l.l_extendedprice * (1 - l.l_discount) AS {p}return_amt
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_linenumber % 3 = {channel} AND l.l_returnflag = 'R'
    """


_CTE: dict[str, str] = {
    "date_dim": """
    SELECT d_date,
           CAST(EXTRACT(YEAR FROM d_date) AS BIGINT) AS d_year,
           CAST(EXTRACT(MONTH FROM d_date) AS BIGINT) AS d_moy,
           CAST(EXTRACT(QUARTER FROM d_date) AS BIGINT) AS d_qoy,
           CAST(EXTRACT(DAY FROM d_date) AS BIGINT) AS d_dom
    FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d_date FROM orders
          UNION
          SELECT DISTINCT CAST(l_shipdate AS DATE) AS d_date FROM lineitem) dates
    """,
    "item": """
    SELECT p_partkey AS i_item_sk,
           p_name AS i_item_desc,
           p_brand AS i_brand,
           p_type AS i_category,
           p_brand AS i_class,
           p_size AS i_size,
           p_retailprice AS i_current_price,
           CAST(p_partkey % 50 AS BIGINT) AS i_manufact_id
    FROM part
    """,
    "customer_dim": """
    SELECT c_custkey AS c_customer_sk,
           c_name AS c_customer_id,
           CAST(c_nationkey AS BIGINT) AS c_current_addr_sk,
           c_mktsegment AS c_segment,
           CASE WHEN c_acctbal > 5000 THEN 'Y' ELSE 'N' END AS c_preferred_flag
    FROM customer
    """,
    "customer_address": """
    SELECT CAST(n_nationkey AS BIGINT) AS ca_address_sk,
           n_name AS ca_state,
           r_name AS ca_country
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    "store": """
    SELECT s_suppkey AS s_store_sk,
           s_name AS s_store_name,
           n_name AS s_state,
           CAST(s_nationkey % 10 AS BIGINT) AS s_market_id
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
    "store_sales": _fact_sql("ss_", 0, "store_sk", "ticket_number"),
    "catalog_sales": _fact_sql("cs_", 1, "warehouse_sk", "order_number"),
    "web_sales": _fact_sql("ws_", 2, "warehouse_sk", "order_number"),
    "store_returns": _returns_sql("sr_", 0, "store_sk", "ticket_number"),
    "catalog_returns": _returns_sql("cr_", 1, "warehouse_sk", "order_number"),
    "web_returns": _returns_sql("wr_", 2, "warehouse_sk", "order_number"),
}


def _with(sql: str, *tables: str, extra: str | None = None) -> str:
    """Assemble ``WITH <derived CTEs>[, extra] <sql>`` for the oracle."""
    parts = [f"{t} AS ({_CTE[t]})" for t in tables]
    if extra:
        parts.append(extra)
    return "WITH " + ",\n".join(parts) + "\n" + sql


# ---------------------------------------------------------------------------
# Derived star schema: DataFrame builders (Spark side)
# ---------------------------------------------------------------------------


class _DS:
    """TPC-DS view layer over a ``_T`` base-table loader. Every
    builder mirrors the matching ``_CTE`` SQL text exactly; the
    oracle gate (tests/test_tpcds.py + the driver) holds the two in
    lock-step."""

    def __init__(self, t: _T):
        self.t = t

    def _fact(self, channel: int, p: str, loc: str, order: str) -> DataFrame:
        l, o = self.t.lineitem, self.t.orders
        net = _C("l_extendedprice") * (1 - _C("l_discount"))
        return (
            l.where(_C("l_linenumber") % 3 == channel)
            .join(o, _C("l_orderkey") == _C("o_orderkey"))
            .select(
                _C("o_orderdate").cast("date").alias(p + "sold_date"),
                _C("l_shipdate").cast("date").alias(p + "ship_date"),
                _C("l_partkey").alias(p + "item_sk"),
                _C("o_custkey").alias(p + "customer_sk"),
                _C("l_suppkey").alias(p + loc),
                _C("l_orderkey").alias(p + order),
                _C("l_quantity").alias(p + "quantity"),
                _C("l_extendedprice").alias(p + "ext_list_price"),
                net.alias(p + "net_paid"),
                (_C("l_extendedprice") * _C("l_discount")).alias(
                    p + "ext_discount_amt"
                ),
                (_C("l_extendedprice") * _C("l_tax")).alias(p + "ext_ship_cost"),
                (net - _C("l_extendedprice") * 0.8).alias(p + "net_profit"),
                _C("l_returnflag").alias(p + "return_flag"),
            )
        )

    def _returns(self, channel: int, p: str, loc: str, order: str) -> DataFrame:
        l, o = self.t.lineitem, self.t.orders
        return (
            l.where((_C("l_linenumber") % 3 == channel) & (_C("l_returnflag") == "R"))
            .join(o, _C("l_orderkey") == _C("o_orderkey"))
            .select(
                _C("l_shipdate").cast("date").alias(p + "returned_date"),
                _C("l_partkey").alias(p + "item_sk"),
                _C("o_custkey").alias(p + "customer_sk"),
                _C("l_suppkey").alias(p + loc),
                _C("l_orderkey").alias(p + order),
                _C("l_quantity").alias(p + "return_quantity"),
                (_C("l_extendedprice") * (1 - _C("l_discount"))).alias(
                    p + "return_amt"
                ),
            )
        )

    def _returns_slim(self, channel: int, p: str, loc: str, order: str) -> DataFrame:
        """``_returns`` minus the orders join: every returns column
        except ``<p>customer_sk`` is a pure lineitem expression, and
        the derivation's inner orders join is row-preserving (every
        l_orderkey has exactly one order), so consumers that never
        touch customer_sk get identical rows one join cheaper —
        Catalyst cannot eliminate the unused inner join itself
        because it does not know the FK (guide §2.4)."""
        l = self.t.lineitem
        return (
            l.where(
                (_C("l_linenumber") % 3 == channel)
                & (_C("l_returnflag") == "R")
            )
            .select(
                _C("l_shipdate").cast("date").alias(p + "returned_date"),
                _C("l_partkey").alias(p + "item_sk"),
                _C("l_suppkey").alias(p + loc),
                _C("l_orderkey").alias(p + order),
                _C("l_quantity").alias(p + "return_quantity"),
                (_C("l_extendedprice") * (1 - _C("l_discount"))).alias(
                    p + "return_amt"
                ),
            )
        )

    @property
    def store_returns_slim(self) -> DataFrame:
        return self._returns_slim(0, "sr_", "store_sk", "ticket_number")

    @property
    def catalog_returns_slim(self) -> DataFrame:
        return self._returns_slim(1, "cr_", "warehouse_sk", "order_number")

    @property
    def web_returns_slim(self) -> DataFrame:
        return self._returns_slim(2, "wr_", "warehouse_sk", "order_number")

    @property
    def store_sales(self) -> DataFrame:
        return self._fact(0, "ss_", "store_sk", "ticket_number")

    @property
    def catalog_sales(self) -> DataFrame:
        return self._fact(1, "cs_", "warehouse_sk", "order_number")

    @property
    def web_sales(self) -> DataFrame:
        return self._fact(2, "ws_", "warehouse_sk", "order_number")

    @property
    def store_returns(self) -> DataFrame:
        return self._returns(0, "sr_", "store_sk", "ticket_number")

    @property
    def catalog_returns(self) -> DataFrame:
        return self._returns(1, "cr_", "warehouse_sk", "order_number")

    @property
    def web_returns(self) -> DataFrame:
        return self._returns(2, "wr_", "warehouse_sk", "order_number")

    @property
    def date_dim(self) -> DataFrame:
        # Deliberately NOT memoized/checkpointed: the derivation stays
        # inline in each consumer's plan so Catalyst pushes the
        # query's d_year/d_moy/d_date predicates and column pruning
        # THROUGH the distinct+union into the base scans. An eager
        # pinned copy was measured 2x slower on the date-heavy
        # queries (q64 5.6 -> 10.5 s) because every consumer then
        # pays the full unpruned derivation up front.
        dates = (
            self.t.orders.select(_C("o_orderdate").cast("date").alias("d_date"))
            .union(self.t.lineitem.select(_C("l_shipdate").cast("date").alias("d_date")))
            .distinct()
        )
        return dates.select(
            "d_date",
            F.year("d_date").cast("bigint").alias("d_year"),
            F.month("d_date").cast("bigint").alias("d_moy"),
            F.quarter("d_date").cast("bigint").alias("d_qoy"),
            F.dayofmonth("d_date").cast("bigint").alias("d_dom"),
        )

    @property
    def item(self) -> DataFrame:
        return self.t.part.select(
            _C("p_partkey").alias("i_item_sk"),
            _C("p_name").alias("i_item_desc"),
            _C("p_brand").alias("i_brand"),
            _C("p_type").alias("i_category"),
            _C("p_brand").alias("i_class"),
            _C("p_size").alias("i_size"),
            _C("p_retailprice").alias("i_current_price"),
            (_C("p_partkey") % 50).cast("bigint").alias("i_manufact_id"),
        )

    @property
    def customer_dim(self) -> DataFrame:
        return self.t.customer.select(
            _C("c_custkey").alias("c_customer_sk"),
            _C("c_name").alias("c_customer_id"),
            _C("c_nationkey").cast("bigint").alias("c_current_addr_sk"),
            _C("c_mktsegment").alias("c_segment"),
            F.when(_C("c_acctbal") > 5000, "Y").otherwise("N").alias(
                "c_preferred_flag"
            ),
        )

    @property
    def customer_address(self) -> DataFrame:
        return (
            self.t.nation.join(
                self.t.region, _C("n_regionkey") == _C("r_regionkey")
            ).select(
                _C("n_nationkey").cast("bigint").alias("ca_address_sk"),
                _C("n_name").alias("ca_state"),
                _C("r_name").alias("ca_country"),
            )
        )

    @property
    def store(self) -> DataFrame:
        return (
            self.t.supplier.join(
                self.t.nation, _C("s_nationkey") == _C("n_nationkey")
            ).select(
                _C("s_suppkey").alias("s_store_sk"),
                _C("s_name").alias("s_store_name"),
                _C("n_name").alias("s_state"),
                (_C("s_nationkey") % 10).cast("bigint").alias("s_market_id"),
            )
        )


def _ds_q(name: str, oracle: str):
    """Register a TPC-DS query: the wrapped fn takes a ``_DS`` view
    layer instead of the raw ``_T``."""

    def deco(fn):
        @_q(name, oracle)
        def wrapped(t: _T) -> DataFrame:
            return fn(_DS(t))

        wrapped.__doc__ = fn.__doc__
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


@_ds_q(
    "tpcds_q3",
    _with(
        f"""
    SELECT d_year, i_brand,
           {_ems_sql('ss_net_paid')} AS sum_agg
    FROM store_sales
    JOIN date_dim ON ss_sold_date = d_date
    JOIN item ON ss_item_sk = i_item_sk
    WHERE i_manufact_id < 10 AND d_moy = 11
    GROUP BY d_year, i_brand
    ORDER BY d_year, sum_agg DESC, i_brand
    LIMIT 10
    """,
        "store_sales", "date_dim", "item",
    ),
)
def q_tpcds_q3(ds: _DS) -> DataFrame:
    """TPC-DS Q3 (tpcds-tool/query/query3.sql shape): the canonical
    star join — fact vs two broadcastable dims, agg by year/brand,
    deterministic top-n. AQE broadcasts date_dim and item, so the
    only shuffle is the (d_year, i_brand) aggregation."""
    return (
        ds.store_sales.where(F.month(_C("ss_sold_date")) == 11)
        .withColumn("d_year", F.year(_C("ss_sold_date")).cast("bigint"))
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .where(_C("i_manufact_id") < 10)
        .groupBy("d_year", "i_brand")
        .agg(_exact_money_sum(_C("ss_net_paid")).alias("sum_agg"))
        .orderBy(_C("d_year"), _C("sum_agg").desc(), _C("i_brand"))
        .limit(10)
    )


@_ds_q(
    "tpcds_q6",
    _with(
        """
    SELECT ca_state, CAST(count(*) AS BIGINT) AS cnt
    FROM customer_address
    JOIN customer_dim ON ca_address_sk = c_current_addr_sk
    JOIN store_sales ON c_customer_sk = ss_customer_sk
    JOIN date_dim ON ss_sold_date = d_date
    JOIN item ON ss_item_sk = i_item_sk
    WHERE d_year = 1998
      AND i_current_price > 1.005 *
        (SELECT avg(j.i_current_price) FROM item j
         WHERE j.i_category = item.i_category)
    GROUP BY ca_state
    HAVING count(*) >= 2
    ORDER BY cnt, ca_state
    """,
        "customer_address", "customer_dim", "store_sales", "date_dim", "item",
    ),
)
def q_tpcds_q6(ds: _DS) -> DataFrame:
    """TPC-DS Q6: customers' states buying items priced above their
    category average (threshold 1.005× here — the spec's 1.2× empties
    the derived corpus's price distribution at this scale) — the
    correlated scalar subquery decorrelates to a per-category avg
    aggregate joined back to item (exactly what Catalyst/DuckDB both
    plan); dims broadcast, one shuffle on ca_state."""
    item = ds.item
    cat_avg = item.groupBy("i_category").agg(
        F.avg("i_current_price").alias("__avg_price")
    )
    pricey = item.join(cat_avg, "i_category").where(
        _C("i_current_price") > 1.005 * _C("__avg_price")
    )
    return (
        ds.customer_address.join(
            ds.customer_dim, _C("ca_address_sk") == _C("c_current_addr_sk")
        )
        .join(
            ds.store_sales.where(_year_range(_C("ss_sold_date"), 1998)),
            _C("c_customer_sk") == _C("ss_customer_sk"),
        )
        .join(pricey, _C("ss_item_sk") == _C("i_item_sk"))
        .groupBy("ca_state")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(_C("cnt") >= 2)
    )


@_ds_q(
    "tpcds_q7",
    _with(
        f"""
    SELECT i_item_desc,
           {_exact_avg_sql('ss_quantity', 100)} AS agg1,
           {_exact_avg_sql('ss_ext_list_price', 100)} AS agg2,
           {_exact_avg_sql('ss_ext_discount_amt', 10000)} AS agg3,
           {_exact_avg_sql('ss_net_paid', 10000)} AS agg4
    FROM store_sales
    JOIN customer_dim ON ss_customer_sk = c_customer_sk
    JOIN date_dim ON ss_sold_date = d_date
    JOIN item ON ss_item_sk = i_item_sk
    WHERE c_segment = 'BUILDING' AND d_year = 1999
    GROUP BY i_item_desc
    ORDER BY i_item_desc
    LIMIT 100
    """,
        "store_sales", "customer_dim", "date_dim", "item",
    ),
)
def q_tpcds_q7(ds: _DS) -> DataFrame:
    """TPC-DS Q7 shape (demographics → market segment): four avgs per
    item for one buyer segment + year. Segment/date filters reach the
    fact via broadcast dim joins before the item agg."""
    return (
        ds.store_sales.join(
            ds.customer_dim, _C("ss_customer_sk") == _C("c_customer_sk")
        )
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .where(
            (_C("c_segment") == "BUILDING")
            & _year_range(_C("ss_sold_date"), 1999)
        )
        .groupBy("i_item_desc")
        .agg(
            _exact_avg(_C("ss_quantity"), 100).alias("agg1"),
            _exact_avg(_C("ss_ext_list_price"), 100).alias("agg2"),
            _exact_avg(_C("ss_ext_discount_amt"), 10000).alias("agg3"),
            _exact_avg(_C("ss_net_paid"), 10000).alias("agg4"),
        )
        .orderBy("i_item_desc")
        .limit(100)
    )


@_ds_q(
    "tpcds_q15",
    _with(
        f"""
    SELECT ca_state, {_ems_sql('cs_net_paid')} AS sum_paid
    FROM catalog_sales
    JOIN customer_dim ON cs_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN date_dim ON cs_sold_date = d_date
    WHERE (ca_country = 'EUROPE' OR cs_net_paid > 1500)
      AND d_qoy = 1 AND d_year = 2000
    GROUP BY ca_state
    """,
        "catalog_sales", "customer_dim", "customer_address", "date_dim",
    ),
)
def q_tpcds_q15(ds: _DS) -> DataFrame:
    """TPC-DS Q15: catalog revenue by buyer state for one quarter,
    with a disjunctive geography-or-big-ticket filter that cannot be
    pushed below the address join — the planner must keep it above
    the (broadcast) dim joins."""
    return (
        ds.catalog_sales.join(
            ds.customer_dim, _C("cs_customer_sk") == _C("c_customer_sk")
        )
        .join(ds.customer_address, _C("c_current_addr_sk") == _C("ca_address_sk"))
        .where(
            # the date_dim join read no d_* column beyond the quarter
            # gate — pushed as the equivalent Q1-2000 date range
            ((_C("ca_country") == "EUROPE") | (_C("cs_net_paid") > 1500))
            & (_C("cs_sold_date") >= F.lit("2000-01-01").cast("date"))
            & (_C("cs_sold_date") < F.lit("2000-04-01").cast("date"))
        )
        .groupBy("ca_state")
        .agg(_exact_money_sum(_C("cs_net_paid")).alias("sum_paid"))
    )


@_ds_q(
    "tpcds_q19",
    _with(
        f"""
    SELECT i_brand, {_ems_sql('ss_net_paid')} AS ext_price
    FROM date_dim
    JOIN store_sales ON d_date = ss_sold_date
    JOIN item ON ss_item_sk = i_item_sk
    JOIN customer_dim ON ss_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN store ON ss_store_sk = s_store_sk
    WHERE i_manufact_id BETWEEN 10 AND 30
      AND d_moy = 11 AND d_year = 1999
      AND ca_state <> s_state
    GROUP BY i_brand
    ORDER BY ext_price DESC, i_brand
    LIMIT 20
    """,
        "date_dim", "store_sales", "item", "customer_dim",
        "customer_address", "store",
    ),
)
def q_tpcds_q19(ds: _DS) -> DataFrame:
    """TPC-DS Q19: brand revenue from customers shopping outside
    their home state — a five-dim star with a cross-dimension
    inequality (ca_state <> s_state) that only binds after both
    address and store are joined."""
    # the date_dim join reads no d_* column beyond the month gate —
    # replaced by the equivalent pushed date range (November 1999)
    return (
        ds.store_sales.where(
            (_C("ss_sold_date") >= F.lit("1999-11-01").cast("date"))
            & (_C("ss_sold_date") < F.lit("1999-12-01").cast("date"))
        )
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .join(ds.customer_dim, _C("ss_customer_sk") == _C("c_customer_sk"))
        .join(ds.customer_address, _C("c_current_addr_sk") == _C("ca_address_sk"))
        .join(ds.store, _C("ss_store_sk") == _C("s_store_sk"))
        .where(
            _C("i_manufact_id").between(10, 30)
            & (_C("ca_state") != _C("s_state"))
        )
        .groupBy("i_brand")
        .agg(_exact_money_sum(_C("ss_net_paid")).alias("ext_price"))
        .orderBy(_C("ext_price").desc(), _C("i_brand"))
        .limit(20)
    )


@_ds_q(
    "tpcds_q23",
    _with(
        f"""
    SELECT {_ems_sql('cs_net_paid')} AS total_sales
    FROM catalog_sales
    WHERE cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
      AND cs_customer_sk IN (
        SELECT customer_sk FROM best_ss_customer
        WHERE ssales > 0.5 * (SELECT max(ssales) FROM best_ss_customer))
    """,
        "store_sales", "catalog_sales", "date_dim",
        extra="""
    frequent_ss_items AS (
      SELECT ss_item_sk AS item_sk
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year IN (1998, 1999)
      GROUP BY ss_item_sk HAVING count(*) > 4),
    best_ss_customer AS (
      SELECT ss_customer_sk AS customer_sk, sum(ss_net_paid) AS ssales
      FROM store_sales GROUP BY ss_customer_sk)
    """,
    ),
)
def q_tpcds_q23(ds: _DS) -> DataFrame:
    """TPC-DS Q23 (lite): catalog revenue restricted to frequently
    store-sold items and top-spending store customers. The scalar
    max(ssales) is a 1-row broadcast aggregate (no collect); both IN
    subqueries become left-semi joins."""
    ss = ds.store_sales
    # the date_dim join reads no d_* column — pushed year range
    frequent = (
        ss.where(_year_range(_C("ss_sold_date"), 1998, 1999))
        .groupBy("ss_item_sk")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(_C("__cnt") > 4)
        .select(_C("ss_item_sk").alias("item_sk"))
    )
    # NOTE: pinning best (localCheckpoint) was measured SLOWER here
    # (1.25->1.43 s): both consumers reuse the aggregate's exchange,
    # so the pin only adds a materialization barrier — left unpinned
    best = ss.groupBy("ss_customer_sk").agg(
        F.sum("ss_net_paid").alias("ssales")
    )
    max_sales = best.agg(F.max("ssales").alias("__max_ssales"))
    top_customers = (
        best.join(F.broadcast(max_sales))
        .where(_C("ssales") > 0.5 * _C("__max_ssales"))
        .select(_C("ss_customer_sk").alias("customer_sk"))
    )
    return (
        ds.catalog_sales.join(
            frequent, _C("cs_item_sk") == _C("item_sk"), "left_semi"
        )
        .join(top_customers, _C("cs_customer_sk") == _C("customer_sk"), "left_semi")
        .agg(_exact_money_sum(_C("cs_net_paid")).alias("total_sales"))
    )


@_ds_q(
    "tpcds_q25",
    _with(
        f"""
    SELECT i_item_desc, s_store_name,
           {_ems_sql('ss_net_profit')} AS store_profit,
           {_ems_sql('sr_return_amt')} AS return_amt,
           {_ems_sql('cs_net_profit')} AS catalog_profit
    FROM store_sales
    JOIN store_returns
      ON ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
     AND ss_ticket_number = sr_ticket_number
    JOIN catalog_sales
      ON sr_customer_sk = cs_customer_sk AND sr_item_sk = cs_item_sk
    JOIN item ON ss_item_sk = i_item_sk
    JOIN store ON ss_store_sk = s_store_sk
    JOIN date_dim d1 ON ss_sold_date = d1.d_date
    JOIN date_dim d2 ON sr_returned_date = d2.d_date
    JOIN date_dim d3 ON cs_sold_date = d3.d_date
    WHERE d1.d_year BETWEEN 1996 AND 2000 AND d2.d_year BETWEEN 1996 AND 2000
      AND d3.d_year BETWEEN 1996 AND 2000
    GROUP BY i_item_desc, s_store_name
    ORDER BY i_item_desc, s_store_name
    LIMIT 100
    """,
        "store_sales", "store_returns", "catalog_sales", "item", "store",
        "date_dim",
    ),
)
def q_tpcds_q25(ds: _DS) -> DataFrame:
    """TPC-DS Q25: buy-in-store → return → re-buy-by-catalog. The
    oracle keeps the textbook multi-fact chain with date_dim joined
    three times; the Spark plan exploits the derivation facts the
    optimizer cannot see: every fact date is in date_dim by
    construction and d_date is unique, so each date_dim alias join +
    d_year filter is exactly a year() predicate pushed into the base
    scan (no date_dim derivation at all); the ss⋈sr customer-key
    equality is implied by the ticket key (same order ⇒ same
    customer), so the returns side is the lineitem-only slim
    derivation — one orders join fewer. 3 date_dim derivations
    (each 2 scans + a distinct) + 1 orders join removed; the fact
    aggregates are per-row pair sums, unchanged."""
    ss = ds.store_sales.where(
        _year_range(_C("ss_sold_date"), 1996, 2000)
    )
    sr = ds.store_returns_slim.where(
        _year_range(_C("sr_returned_date"), 1996, 2000)
    )
    cs = ds.catalog_sales.where(
        _year_range(_C("cs_sold_date"), 1996, 2000)
    )
    return (
        ss.join(
            sr,
            (_C("ss_item_sk") == _C("sr_item_sk"))
            & (_C("ss_ticket_number") == _C("sr_ticket_number")),
        )
        .join(
            cs,
            (_C("ss_customer_sk") == _C("cs_customer_sk"))
            & (_C("sr_item_sk") == _C("cs_item_sk")),
        )
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .join(ds.store, _C("ss_store_sk") == _C("s_store_sk"))
        .groupBy("i_item_desc", "s_store_name")
        .agg(
            _exact_money_sum(_C("ss_net_profit")).alias("store_profit"),
            _exact_money_sum(_C("sr_return_amt")).alias("return_amt"),
            _exact_money_sum(_C("cs_net_profit")).alias("catalog_profit"),
        )
        .orderBy("i_item_desc", "s_store_name")
        .limit(100)
    )


@_ds_q(
    "tpcds_q36",
    _with(
        """
    SELECT round(profit / paid, 6) AS gross_margin,
           i_category, i_class,
           g_cat + g_class AS lochierarchy,
           CAST(rank() OVER (
             PARTITION BY g_cat + g_class,
                          CASE WHEN g_class = 0 THEN i_category END
             ORDER BY profit / paid,
                      i_category NULLS FIRST, i_class NULLS FIRST)
             AS BIGINT) AS rank_within
    FROM (
      SELECT CAST(GROUPING(i_category) AS BIGINT) AS g_cat,
             CAST(GROUPING(i_class) AS BIGINT) AS g_class,
             i_category, i_class,
             sum(CAST(round(ss_net_profit * 10000, 0) AS BIGINT)) AS profit,
             sum(CAST(round(ss_ext_list_price * 10000, 0) AS BIGINT)) AS paid
      FROM store_sales
      JOIN date_dim ON ss_sold_date = d_date
      JOIN item ON ss_item_sk = i_item_sk
      WHERE d_year = 2000
      GROUP BY ROLLUP(i_category, i_class)) agg
    """,
        "store_sales", "date_dim", "item",
    ),
)
def q_tpcds_q36(ds: _DS) -> DataFrame:
    """TPC-DS Q36: gross margin over ROLLUP(category, class) with a
    rank() window partitioned by hierarchy level — Expand (grouping
    sets) feeding a window over the aggregated (tiny) result."""
    agg = (
        ds.store_sales.where(_year_range(_C("ss_sold_date"), 2000))
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .rollup("i_category", "i_class")
        .agg(
            F.grouping("i_category").cast("bigint").alias("g_cat"),
            F.grouping("i_class").cast("bigint").alias("g_class"),
            F.sum(_cents(_C("ss_net_profit"))).alias("profit"),
            F.sum(_cents(_C("ss_ext_list_price"))).alias("paid"),
        )
    )
    w = Window.partitionBy(
        _C("g_cat") + _C("g_class"),
        F.when(_C("g_class") == 0, _C("i_category")),
    ).orderBy(
        (_C("profit") / _C("paid")).asc(),
        _C("i_category").asc_nulls_first(),
        _C("i_class").asc_nulls_first(),
    )
    return agg.select(
        F.round(_C("profit") / _C("paid"), 6).alias("gross_margin"),
        "i_category",
        "i_class",
        (_C("g_cat") + _C("g_class")).alias("lochierarchy"),
        F.rank().over(w).cast("bigint").alias("rank_within"),
    )


@_ds_q(
    "tpcds_q56",
    _with(
        f"""
    SELECT brand, floor(sum(total_cents) / 100 + 0.5) / 100 AS total_sales
    FROM (SELECT * FROM sstot UNION ALL SELECT * FROM cstot
          UNION ALL SELECT * FROM wstot) x
    GROUP BY brand
    """,
        "store_sales", "catalog_sales", "web_sales", "item", "date_dim",
        extra="""
    sstot AS (
      SELECT i_brand AS brand,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM store_sales JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE i_category = 'PROMO' AND d_year = 2000
      GROUP BY i_brand),
    cstot AS (
      SELECT i_brand AS brand,
             sum(CAST(round(cs_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM catalog_sales JOIN item ON cs_item_sk = i_item_sk
      JOIN date_dim ON cs_sold_date = d_date
      WHERE i_category = 'PROMO' AND d_year = 2000
      GROUP BY i_brand),
    wstot AS (
      SELECT i_brand AS brand,
             sum(CAST(round(ws_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM web_sales JOIN item ON ws_item_sk = i_item_sk
      JOIN date_dim ON ws_sold_date = d_date
      WHERE i_category = 'PROMO' AND d_year = 2000
      GROUP BY i_brand)
    """,
    ),
)
def q_tpcds_q56(ds: _DS) -> DataFrame:
    """TPC-DS Q56/Q33/Q60 family: per-brand revenue for one category
    summed across all three channels. The oracle keeps the textbook
    three star aggs UNION ALL'd + re-agg; since the final agg SUMS the
    per-channel sums, the channel split contributes nothing — the
    three facts partition ONE lineitem scan, each fact's sold_date is
    its o_orderdate (the date_dim join is a pushed year range), and
    net_paid is the same lineitem expression in every channel. One
    lineitem⋈orders pass + one groupBy(brand) instead of 3 fact⋈dim
    star joins + a union + a re-agg shuffle; identical exact-cent
    totals by associativity of the BIGINT sum."""
    l, o = ds.t.lineitem, ds.t.orders
    net = _cents(_C("l_extendedprice") * (1 - _C("l_discount")))
    return (
        l.select("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
        .join(
            o.where(
                _year_range(_C("o_orderdate").cast("date"), 2000)
            ).select("o_orderkey"),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .join(
            F.broadcast(ds.item.where(_C("i_category") == "PROMO")),
            _C("l_partkey") == _C("i_item_sk"),
        )
        .groupBy(_C("i_brand").alias("brand"))
        .agg(
            (F.floor(F.sum(net) / 100 + F.lit(0.5)) / 100).alias(
                "total_sales"
            )
        )
    )


@_ds_q(
    "tpcds_q59",
    _with(
        """
    SELECT y1.s_store_name, y1.d_moy,
           round(y1.sales / y2.sales, 4) AS yoy
    FROM mss y1
    JOIN mss y2
      ON y1.s_store_name = y2.s_store_name AND y1.d_moy = y2.d_moy
     AND y1.d_year = y2.d_year + 1
    WHERE y1.d_year = 1999
    """,
        "store_sales", "date_dim", "store",
        extra="""
    mss AS (
      SELECT s_store_name, d_year, d_moy,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS sales
      FROM store_sales
      JOIN date_dim ON ss_sold_date = d_date
      JOIN store ON ss_store_sk = s_store_sk
      GROUP BY s_store_name, d_year, d_moy)
    """,
    ),
)
def q_tpcds_q59(ds: _DS) -> DataFrame:
    """TPC-DS Q59 shape: period-over-period store revenue — one
    monthly-sales CTE self-joined on (store, month) across adjacent
    years. Spark reuses the aggregated exchange for both sides."""
    # d_year/d_moy are functions of the 1:1-joined date — projected
    mss = (
        ds.store_sales.withColumn(
            "d_year", F.year(_C("ss_sold_date")).cast("bigint")
        )
        .withColumn("d_moy", F.month(_C("ss_sold_date")).cast("bigint"))
        .join(ds.store, _C("ss_store_sk") == _C("s_store_sk"))
        .groupBy("s_store_name", "d_year", "d_moy")
        .agg(F.sum(_cents(_C("ss_net_paid"))).alias("sales"))
    )
    y1 = mss.select(
        _C("s_store_name"), _C("d_year"), _C("d_moy"), _C("sales").alias("__s1")
    )
    y2 = mss.select(
        _C("s_store_name").alias("__name2"),
        _C("d_year").alias("__year2"),
        _C("d_moy").alias("__moy2"),
        _C("sales").alias("__s2"),
    )
    return (
        y1.join(
            y2,
            (_C("s_store_name") == _C("__name2"))
            & (_C("d_moy") == _C("__moy2"))
            & (_C("d_year") == _C("__year2") + 1),
        )
        .where(_C("d_year") == 1999)
        .select(
            "s_store_name",
            "d_moy",
            F.round(_C("__s1") / _C("__s2"), 4).alias("yoy"),
        )
    )


@_ds_q(
    "tpcds_q65",
    _with(
        f"""
    SELECT s_store_name, i_item_desc,
           floor(sa.revenue / 100 + 0.5) / 100 AS revenue
    FROM sa
    JOIN sb ON sa.ss_store_sk = sb.store_sk AND sa.revenue <= 0.5 * sb.ave
    JOIN store ON sa.ss_store_sk = s_store_sk
    JOIN item ON sa.ss_item_sk = i_item_sk
    ORDER BY s_store_name, i_item_desc, revenue
    LIMIT 100
    """,
        "store_sales", "store", "item",
        extra="""
    sa AS (
      SELECT ss_store_sk, ss_item_sk,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS revenue
      FROM store_sales GROUP BY ss_store_sk, ss_item_sk),
    sb AS (
      SELECT ss_store_sk AS store_sk, avg(revenue) AS ave
      FROM sa GROUP BY ss_store_sk)
    """,
    ),
)
def q_tpcds_q65(ds: _DS) -> DataFrame:
    """TPC-DS Q65: items underperforming their store's average item
    revenue — two-level reaggregation (store×item, then store) joined
    back on the store key; the second level is tiny and broadcasts."""
    sa = ds.store_sales.groupBy("ss_store_sk", "ss_item_sk").agg(
        F.sum(_cents(_C("ss_net_paid"))).alias("revenue")
    )
    sb = sa.groupBy(_C("ss_store_sk").alias("store_sk")).agg(
        F.avg("revenue").alias("ave")
    )
    return (
        sa.join(
            F.broadcast(sb),
            (_C("ss_store_sk") == _C("store_sk"))
            & (_C("revenue") <= 0.5 * _C("ave")),
        )
        .join(ds.store, _C("ss_store_sk") == _C("s_store_sk"))
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .select(
            "s_store_name",
            "i_item_desc",
            (F.floor(_C("revenue") / 100 + F.lit(0.5)) / 100).alias("revenue"),
        )
        .orderBy("s_store_name", "i_item_desc", "revenue")
        .limit(100)
    )


@_ds_q(
    "tpcds_q73",
    _with(
        """
    SELECT c_customer_id, cnt
    FROM dj JOIN customer_dim ON customer_sk = c_customer_sk
    WHERE cnt BETWEEN 2 AND 5
    """,
        "store_sales", "date_dim", "customer_dim",
        extra="""
    dj AS (
      SELECT ss_customer_sk AS customer_sk, ss_ticket_number,
             CAST(count(*) AS BIGINT) AS cnt
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year IN (1998, 1999)
      GROUP BY ss_customer_sk, ss_ticket_number)
    """,
    ),
)
def q_tpcds_q73(ds: _DS) -> DataFrame:
    """TPC-DS Q73/Q68 shape: per-ticket line counts, customers whose
    tickets fall in a size band. The HAVING-band agg keys on
    (customer, ticket) so the shuffle is on the fact's natural
    key; the customer join is a broadcast."""
    # the date_dim join reads no d_* column beyond the year filter —
    # replaced by the equivalent pushed date range
    dj = (
        ds.store_sales.where(_year_range(_C("ss_sold_date"), 1998, 1999))
        .groupBy(
            _C("ss_customer_sk").alias("customer_sk"), _C("ss_ticket_number")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        dj.join(ds.customer_dim, _C("customer_sk") == _C("c_customer_sk"))
        .where(_C("cnt").between(2, 5))
        .select("c_customer_id", "cnt")
    )


@_ds_q(
    "tpcds_q74",
    _with(
        """
    SELECT ts1.customer_sk AS customer_sk
    FROM year_total ts1
    JOIN year_total ts2 ON ts1.customer_sk = ts2.customer_sk
    JOIN year_total tw1 ON ts1.customer_sk = tw1.customer_sk
    JOIN year_total tw2 ON ts1.customer_sk = tw2.customer_sk
    WHERE ts1.sale_type = 's' AND ts2.sale_type = 's'
      AND tw1.sale_type = 'w' AND tw2.sale_type = 'w'
      AND ts1.yr = 1999 AND ts2.yr = 2000
      AND tw1.yr = 1999 AND tw2.yr = 2000
      AND ts1.year_total > 0 AND tw1.year_total > 0
      AND tw2.year_total / tw1.year_total > ts2.year_total / ts1.year_total
    """,
        "store_sales", "web_sales", "date_dim",
        extra="""
    year_total AS (
      SELECT ss_customer_sk AS customer_sk, d_year AS yr,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS year_total,
             's' AS sale_type
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year IN (1999, 2000)
      GROUP BY ss_customer_sk, d_year
      UNION ALL
      SELECT ws_customer_sk AS customer_sk, d_year AS yr,
             sum(CAST(round(ws_net_paid * 10000, 0) AS BIGINT)) AS year_total,
             'w' AS sale_type
      FROM web_sales JOIN date_dim ON ws_sold_date = d_date
      WHERE d_year IN (1999, 2000)
      GROUP BY ws_customer_sk, d_year)
    """,
    ),
)
def q_tpcds_q74(ds: _DS) -> DataFrame:
    """TPC-DS Q74/Q11: customers whose web spend grew faster than
    their store spend year-over-year. The oracle keeps the textbook
    union'd year_total CTE 4-way self-joined on customer_sk; the
    Spark plan uses the q87/q4 fusion facts (the channel facts
    partition ONE lineitem scan; the date_dim join is a pushed year
    range; the orders join is 1:1) to pivot all four probes out of a
    single lineitem⋈orders pass grouped once by customer: each
    (channel, year) quadrant becomes a conditional exact-cent sum,
    and the inner 4-way join's presence requirement is the quadrant's
    non-NULL sum (a customer row exists in the CTE iff it has ≥1 row
    in that channel-year). 1 fact scan + 1 key shuffle instead of 2
    fact⋈dim joins + a union + 4 join probes."""
    l, o = ds.t.lineitem, ds.t.orders
    net = _cents(_C("l_extendedprice") * (1 - _C("l_discount")))
    ch = _C("l_linenumber") % 3
    yr = F.year(_C("o_orderdate").cast("date"))

    def quadrant(c: int, y: int):
        return F.sum(F.when((ch == c) & (yr == y), net))

    return (
        l.where(ch != 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .join(
            o.where(
                _year_range(_C("o_orderdate").cast("date"), 1999, 2000)
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .groupBy(_C("o_custkey").alias("customer_sk"))
        .agg(
            quadrant(0, 1999).alias("__s1"),
            quadrant(0, 2000).alias("__s2"),
            quadrant(2, 1999).alias("__w1"),
            quadrant(2, 2000).alias("__w2"),
        )
        .where(
            _C("__s1").isNotNull()
            & _C("__s2").isNotNull()
            & _C("__w1").isNotNull()
            & _C("__w2").isNotNull()
            & (_C("__s1") > 0)
            & (_C("__w1") > 0)
            & (_C("__w2") / _C("__w1") > _C("__s2") / _C("__s1"))
        )
        .select("customer_sk")
    )


@_ds_q(
    "tpcds_q76",
    _with(
        f"""
    SELECT channel, i_category, d_year,
           CAST(count(*) AS BIGINT) AS sales_cnt,
           {_ems_sql('ext')} AS sales_amt
    FROM (
      SELECT 'store' AS channel, ss_item_sk AS item_sk,
             ss_sold_date AS sold_date, ss_ext_list_price AS ext
      FROM store_sales
      UNION ALL
      SELECT 'web' AS channel, ws_item_sk AS item_sk,
             ws_sold_date AS sold_date, ws_ext_list_price AS ext
      FROM web_sales
      UNION ALL
      SELECT 'catalog' AS channel, cs_item_sk AS item_sk,
             cs_sold_date AS sold_date, cs_ext_list_price AS ext
      FROM catalog_sales) ch
    JOIN item ON item_sk = i_item_sk
    JOIN date_dim ON sold_date = d_date
    GROUP BY channel, i_category, d_year
    """,
        "store_sales", "web_sales", "catalog_sales", "item", "date_dim",
    ),
)
def q_tpcds_q76(ds: _DS) -> DataFrame:
    """TPC-DS Q76 shape: all three channels tagged and UNION ALL'd
    before a shared dim join + (channel, category, year) agg — the
    dims join once against the unioned stream, not per channel."""

    # The three channel facts partition ONE lineitem scan by
    # l_linenumber % 3 with no residual filter, so their UNION ALL is
    # the WHOLE lineitem⋈orders relation tagged by channel; the
    # date_dim join supplies only d_year = year(sold_date) (1:1 on a
    # date that is in date_dim by construction). One pass + one
    # groupBy shuffle instead of 3 fact derivations + a dim join
    # (the oracle keeps the textbook union). ext_list_price is
    # l_extendedprice verbatim, sold_date is o_orderdate.
    l, o = ds.t.lineitem, ds.t.orders
    channel = (
        F.when(_C("l_linenumber") % 3 == 0, "store")
        .when(_C("l_linenumber") % 3 == 1, "catalog")
        .otherwise("web")
    )
    return (
        l.select(
            "l_orderkey",
            channel.alias("channel"),
            _C("l_partkey").alias("item_sk"),
            _C("l_extendedprice").alias("ext"),
        )
        .join(
            o.select("o_orderkey", "o_orderdate"),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .join(ds.item, _C("item_sk") == _C("i_item_sk"))
        .groupBy(
            "channel",
            "i_category",
            F.year(_C("o_orderdate").cast("date")).cast("bigint").alias("d_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("sales_cnt"),
            _exact_money_sum(_C("ext")).alias("sales_amt"),
        )
    )


@_ds_q(
    "tpcds_q88",
    _with(
        """
    SELECT * FROM
      (SELECT CAST(count(*) AS BIGINT) AS h1 FROM store_sales
       WHERE ss_quantity BETWEEN 1 AND 10) s1,
      (SELECT CAST(count(*) AS BIGINT) AS h2 FROM store_sales
       WHERE ss_quantity BETWEEN 11 AND 20) s2,
      (SELECT CAST(count(*) AS BIGINT) AS h3 FROM store_sales
       WHERE ss_quantity BETWEEN 21 AND 30) s3,
      (SELECT CAST(count(*) AS BIGINT) AS h4 FROM store_sales
       WHERE ss_quantity BETWEEN 31 AND 50) s4
    """,
        "store_sales",
    ),
)
def q_tpcds_q88(ds: _DS) -> DataFrame:
    """TPC-DS Q88 shape: a grid of bucket counts. The literal SQL is
    N scans cross-joined; the Spark plan is deliberately better — one
    conditional-aggregation pass over the fact (1 scan instead of 4,
    the rewrite you would want at 100 TB). Same single-row result."""

    def bucket(lo, hi, name):
        return F.sum(
            F.when(_C("ss_quantity").between(lo, hi), 1).otherwise(0)
        ).cast("bigint").alias(name)

    return ds.store_sales.agg(
        bucket(1, 10, "h1"),
        bucket(11, 20, "h2"),
        bucket(21, 30, "h3"),
        bucket(31, 50, "h4"),
    )


@_ds_q(
    "tpcds_q93",
    _with(
        f"""
    SELECT ss_customer_sk AS customer_sk,
           {_ems_sql('act_sales')} AS sumsales
    FROM (
      SELECT ss_customer_sk,
             CASE WHEN sr_ticket_number IS NOT NULL
                  THEN (ss_quantity - sr_return_quantity)
                       * (ss_net_paid / ss_quantity)
                  ELSE ss_net_paid END AS act_sales
      FROM store_sales
      LEFT JOIN store_returns
        ON ss_item_sk = sr_item_sk
       AND ss_ticket_number = sr_ticket_number
       AND ss_customer_sk = sr_customer_sk) t
    GROUP BY ss_customer_sk
    ORDER BY sumsales, customer_sk
    LIMIT 100
    """,
        "store_sales", "store_returns",
    ),
)
def q_tpcds_q93(ds: _DS) -> DataFrame:
    """TPC-DS Q93: net revenue per customer after netting out
    returned quantity — fact LEFT JOIN its returns on the ticket
    key, CASE on the null-extended side, reaggregate. The returns
    side is the lineitem-only slim derivation: the customer-key
    equality in the join is implied by the ticket key (same order ⇒
    same customer), so dropping it — and the orders join that
    produced sr_customer_sk — matches exactly the same rows one
    lineitem⋈orders join cheaper (the oracle keeps the textbook
    3-key join)."""
    act = F.when(
        _C("sr_ticket_number").isNotNull(),
        (_C("ss_quantity") - _C("sr_return_quantity"))
        * (_C("ss_net_paid") / _C("ss_quantity")),
    ).otherwise(_C("ss_net_paid"))
    return (
        ds.store_sales.join(
            ds.store_returns_slim,
            (_C("ss_item_sk") == _C("sr_item_sk"))
            & (_C("ss_ticket_number") == _C("sr_ticket_number")),
            "left",
        )
        .select(_C("ss_customer_sk").alias("customer_sk"), act.alias("act_sales"))
        .groupBy("customer_sk")
        .agg(_exact_money_sum(_C("act_sales")).alias("sumsales"))
        .orderBy("sumsales", "customer_sk")
        .limit(100)
    )


@_ds_q(
    "tpcds_q95",
    _with(
        f"""
    SELECT CAST(count(DISTINCT ws_order_number) AS BIGINT) AS order_count,
           {_ems_sql('ws_ext_ship_cost')} AS total_shipping_cost,
           {_ems_sql('ws_net_profit')} AS total_net_profit
    FROM web_sales
    JOIN date_dim ON ws_ship_date = d_date
    WHERE d_year = 2000
      AND ws_order_number IN (SELECT order_number FROM ws_wh)
      AND ws_order_number NOT IN
        (SELECT wr_order_number FROM web_returns)
    """,
        "web_sales", "web_returns", "date_dim",
        extra="""
    ws_wh AS (
      SELECT DISTINCT ws1.ws_order_number AS order_number
      FROM web_sales ws1 JOIN web_sales ws2
        ON ws1.ws_order_number = ws2.ws_order_number
      WHERE ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
    """,
    ),
)
def q_tpcds_q95(ds: _DS) -> DataFrame:
    """TPC-DS Q95: web orders shipped from ≥2 warehouses with no
    returns — fact self-join for the multi-warehouse set, then a
    semi + anti join pair feeding one global aggregate."""
    ws = ds.web_sales
    ws2 = ws.select(
        _C("ws_order_number").alias("__on2"),
        _C("ws_warehouse_sk").alias("__wh2"),
    )
    multi_wh = (
        ws.join(
            ws2,
            (_C("ws_order_number") == _C("__on2"))
            & (_C("ws_warehouse_sk") != _C("__wh2")),
        )
        .select(_C("ws_order_number").alias("order_number"))
        .distinct()
    )
    return (
        ws.join(ds.date_dim, _C("ws_ship_date") == _C("d_date"))
        .where(_C("d_year") == 2000)
        .join(multi_wh, _C("ws_order_number") == _C("order_number"), "left_semi")
        .join(
            ds.web_returns_slim.select("wr_order_number"),
            _C("ws_order_number") == _C("wr_order_number"),
            "left_anti",
        )
        .agg(
            F.count_distinct(_C("ws_order_number")).cast("bigint").alias("order_count"),
            _exact_money_sum(_C("ws_ext_ship_cost")).alias("total_shipping_cost"),
            _exact_money_sum(_C("ws_net_profit")).alias("total_net_profit"),
        )
    )


@_ds_q(
    "tpcds_q1",
    _with(
        """
    SELECT c_customer_id
    FROM ctr ctr1
    JOIN store ON ctr1.ctr_store_sk = s_store_sk
    JOIN customer_dim ON ctr1.ctr_customer_sk = c_customer_sk
    WHERE ctr1.ctr_total_return > 1.2 *
      (SELECT avg(ctr_total_return) FROM ctr ctr2
       WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
    ORDER BY c_customer_id
    LIMIT 100
    """,
        "store_returns", "date_dim", "store", "customer_dim",
        extra="""
    ctr AS (
      SELECT sr_customer_sk AS ctr_customer_sk,
             sr_store_sk AS ctr_store_sk,
             sum(CAST(round(sr_return_amt * 10000, 0) AS BIGINT))
               AS ctr_total_return
      FROM store_returns JOIN date_dim ON sr_returned_date = d_date
      WHERE d_year = 2000
      GROUP BY sr_customer_sk, sr_store_sk)
    """,
    ),
)
def q_tpcds_q1(ds: _DS) -> DataFrame:
    """TPC-DS Q1: customers returning >1.2× their store's average —
    a correlated avg over a CTE, decorrelated into a per-store avg
    (10 rows → broadcast) joined back to the per-customer returns."""
    ctr = (
        ds.store_returns.where(_year_range(_C("sr_returned_date"), 2000))
        .groupBy(
            _C("sr_customer_sk").alias("ctr_customer_sk"),
            _C("sr_store_sk").alias("ctr_store_sk"),
        )
        .agg(F.sum(_cents(_C("sr_return_amt"))).alias("ctr_total_return"))
    )
    store_avg = ctr.groupBy(_C("ctr_store_sk").alias("__avg_store_sk")).agg(
        F.avg("ctr_total_return").alias("__store_avg")
    )
    return (
        ctr.join(F.broadcast(store_avg), _C("ctr_store_sk") == _C("__avg_store_sk"))
        .where(_C("ctr_total_return") > 1.2 * _C("__store_avg"))
        .join(ds.store, _C("ctr_store_sk") == _C("s_store_sk"))
        .join(ds.customer_dim, _C("ctr_customer_sk") == _C("c_customer_sk"))
        .select("c_customer_id")
        .orderBy("c_customer_id")
        .limit(100)
    )


@_ds_q(
    "tpcds_q42",
    _with(
        f"""
    SELECT d_year, i_category,
           {_ems_sql('ss_net_paid')} AS sum_sales
    FROM date_dim
    JOIN store_sales ON d_date = ss_sold_date
    JOIN item ON ss_item_sk = i_item_sk
    WHERE d_moy = 12
    GROUP BY d_year, i_category
    """,
        "date_dim", "store_sales", "item",
    ),
)
def q_tpcds_q42(ds: _DS) -> DataFrame:
    """TPC-DS Q42/Q52: category revenue for one calendar month across
    years — the minimal star probe (scan + two broadcast dims + one
    agg shuffle) used to sanity-check plan shape."""
    return (
        ds.store_sales.where(F.month(_C("ss_sold_date")) == 12)
        .withColumn("d_year", F.year(_C("ss_sold_date")).cast("bigint"))
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .groupBy("d_year", "i_category")
        .agg(_exact_money_sum(_C("ss_net_paid")).alias("sum_sales"))
    )


@_ds_q(
    "tpcds_q14",
    _with(
        f"""
    SELECT i_category, CAST(count(*) AS BIGINT) AS cnt,
           {_ems_sql('ss_net_paid')} AS sales
    FROM store_sales
    JOIN item ON ss_item_sk = i_item_sk
    JOIN date_dim ON ss_sold_date = d_date
    WHERE d_year = 2000
      AND ss_item_sk IN (SELECT item_sk FROM cross_items)
    GROUP BY i_category
    """,
        "store_sales", "catalog_sales", "web_sales", "item", "date_dim",
        extra="""
    cross_items AS (
      SELECT ss_item_sk AS item_sk FROM (
        SELECT ss_item_sk FROM store_sales
        INTERSECT
        SELECT cs_item_sk FROM catalog_sales
        INTERSECT
        SELECT ws_item_sk FROM web_sales) ci)
    """,
    ),
)
def q_tpcds_q14(ds: _DS) -> DataFrame:
    """TPC-DS Q14 (cross_items half): items sold through ALL three
    channels via INTERSECT, gating a store-channel category rollup.
    The oracle keeps the textbook INTERSECT chain; the Spark plan
    exploits the derivation (the q87 fusion facts): each channel's
    item set is just the l_partkey values of one l_linenumber % 3
    slice — no orders join supplies anything — so the 3-way INTERSECT
    is ONE lineitem scan grouped by partkey with per-channel presence
    flags (1 scan + 1 shuffle instead of 3 lineitem⋈orders joins + 2
    intersect shuffle-dedups). The fact leg's date_dim join reads no
    d_* column and is replaced by the pushed year range."""
    l = ds.t.lineitem
    ch = _C("l_linenumber") % 3
    cross_items = (
        l.select(_C("l_partkey").alias("item_sk"), ch.alias("__ch"))
        .groupBy("item_sk")
        .agg(
            F.max(_C("__ch") == 0).alias("__s"),
            F.max(_C("__ch") == 1).alias("__c"),
            F.max(_C("__ch") == 2).alias("__w"),
        )
        .where(_C("__s") & _C("__c") & _C("__w"))
        .select("item_sk")
    )
    return (
        ds.store_sales.where(_year_range(_C("ss_sold_date"), 2000))
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .join(cross_items, _C("ss_item_sk") == _C("item_sk"), "left_semi")
        .groupBy("i_category")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _exact_money_sum(_C("ss_net_paid")).alias("sales"),
        )
    )


@_ds_q(
    "tpcds_q31",
    _with(
        """
    SELECT ss1.state,
           round(CAST(ss2.cents AS DOUBLE) / ss1.cents, 6) AS store_q1_q2,
           round(CAST(ws2.cents AS DOUBLE) / ws1.cents, 6) AS web_q1_q2
    FROM ss_q ss1
    JOIN ss_q ss2 ON ss1.state = ss2.state
    JOIN ws_q ws1 ON ss1.state = ws1.state
    JOIN ws_q ws2 ON ss1.state = ws2.state
    WHERE ss1.qoy = 1 AND ss2.qoy = 2 AND ws1.qoy = 1 AND ws2.qoy = 2
      AND ss1.cents > 0 AND ws1.cents > 0
      AND CAST(ws2.cents AS DOUBLE) / ws1.cents
          > CAST(ss2.cents AS DOUBLE) / ss1.cents
    """,
        "store_sales", "web_sales", "customer_dim", "customer_address",
        "date_dim",
        extra="""
    ss_q AS (
      SELECT ca_state AS state, d_qoy AS qoy,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS cents
      FROM store_sales
      JOIN customer_dim ON ss_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 2000 GROUP BY ca_state, d_qoy),
    ws_q AS (
      SELECT ca_state AS state, d_qoy AS qoy,
             sum(CAST(round(ws_net_paid * 10000, 0) AS BIGINT)) AS cents
      FROM web_sales
      JOIN customer_dim ON ws_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      JOIN date_dim ON ws_sold_date = d_date
      WHERE d_year = 2000 GROUP BY ca_state, d_qoy)
    """,
    ),
)
def q_tpcds_q31(ds: _DS) -> DataFrame:
    """TPC-DS Q31 shape: states where web revenue grew faster than
    store revenue quarter-over-quarter. The oracle keeps the textbook
    two per-channel quarterly CTEs probed twice each; the Spark plan
    pivots all four probes out of ONE lineitem⋈orders pass (the q74
    fusion: channels partition the lineitem scan; qoy 1-2 of 2000 is
    a pushed Jan-Jun date range; quarter/state are functions of the
    joined row): groupBy(state) with a conditional exact-cent sum per
    (channel, quarter) quadrant, presence = non-NULL sum (a CTE row
    exists iff the quadrant has ≥1 row). 1 fact scan + 1 key shuffle
    instead of 2 fact⋈3-dim star joins + 4 join probes."""
    l, o = ds.t.lineitem, ds.t.orders
    net = _cents(_C("l_extendedprice") * (1 - _C("l_discount")))
    ch = _C("l_linenumber") % 3
    q = F.quarter(_C("o_orderdate").cast("date"))

    def quadrant(c: int, qoy: int):
        return F.sum(F.when((ch == c) & (q == qoy), net))

    orders_h1 = o.where(
        (_C("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (_C("o_orderdate") < F.lit("2000-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    return (
        l.where(ch != 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .join(orders_h1, _C("l_orderkey") == _C("o_orderkey"))
        .join(
            F.broadcast(ds.customer_dim),
            _C("o_custkey") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .groupBy(_C("ca_state").alias("state"))
        .agg(
            quadrant(0, 1).alias("__ss1"),
            quadrant(0, 2).alias("__ss2"),
            quadrant(2, 1).alias("__ws1"),
            quadrant(2, 2).alias("__ws2"),
        )
        .where(
            _C("__ss1").isNotNull()
            & _C("__ss2").isNotNull()
            & _C("__ws1").isNotNull()
            & _C("__ws2").isNotNull()
            & (_C("__ss1") > 0)
            & (_C("__ws1") > 0)
            & (_C("__ws2") / _C("__ws1") > _C("__ss2") / _C("__ss1"))
        )
        .select(
            "state",
            F.round(_C("__ss2") / _C("__ss1"), 6).alias("store_q1_q2"),
            F.round(_C("__ws2") / _C("__ws1"), 6).alias("web_q1_q2"),
        )
    )


@_ds_q(
    "tpcds_q47",
    _with(
        """
    SELECT i_brand, s_store_name, d_year, d_moy,
           floor(sum_cents / 100 + 0.5) / 100 AS sum_sales,
           floor(avg_monthly / 100 + 0.5) / 100 AS avg_monthly_sales,
           floor(prev_cents / 100 + 0.5) / 100 AS psum,
           floor(next_cents / 100 + 0.5) / 100 AS nsum
    FROM (
      SELECT i_brand, s_store_name, d_year, d_moy, sum_cents,
             sum(sum_cents) OVER (PARTITION BY i_brand, s_store_name, d_year)
               * 1.0 /
             count(sum_cents) OVER (PARTITION BY i_brand, s_store_name, d_year)
               AS avg_monthly,
             lag(sum_cents) OVER (PARTITION BY i_brand, s_store_name
                                  ORDER BY d_year, d_moy) AS prev_cents,
             lead(sum_cents) OVER (PARTITION BY i_brand, s_store_name
                                   ORDER BY d_year, d_moy) AS next_cents
      FROM v1) v2
    WHERE d_year = 1999
      AND abs(sum_cents - avg_monthly) / avg_monthly > 0.1
      AND prev_cents IS NOT NULL AND next_cents IS NOT NULL
    """,
        "store_sales", "date_dim", "item", "store",
        extra="""
    v1 AS (
      SELECT i_brand, s_store_name, d_year, d_moy,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS sum_cents
      FROM store_sales
      JOIN date_dim ON ss_sold_date = d_date
      JOIN item ON ss_item_sk = i_item_sk
      JOIN store ON ss_store_sk = s_store_sk
      GROUP BY i_brand, s_store_name, d_year, d_moy)
    """,
    ),
)
def q_tpcds_q47(ds: _DS) -> DataFrame:
    """TPC-DS Q47: months deviating >10% from the brand-store yearly
    average, with neighbor months via lag/lead — aggregation feeding
    three window functions over two different partitionings. The
    yearly average is sum/count of exact-cent BIGINTs so the
    deviation predicate cannot flip between engines."""
    # the date_dim join is 1:1 on a date present by construction and
    # supplies only d_year/d_moy — projected directly instead
    v1 = (
        ds.store_sales.withColumn(
            "d_year", F.year(_C("ss_sold_date")).cast("bigint")
        )
        .withColumn("d_moy", F.month(_C("ss_sold_date")).cast("bigint"))
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .join(ds.store, _C("ss_store_sk") == _C("s_store_sk"))
        .groupBy("i_brand", "s_store_name", "d_year", "d_moy")
        .agg(F.sum(_cents(_C("ss_net_paid"))).alias("sum_cents"))
    )
    wy = Window.partitionBy("i_brand", "s_store_name", "d_year")
    wm = Window.partitionBy("i_brand", "s_store_name").orderBy("d_year", "d_moy")
    v2 = v1.select(
        "i_brand", "s_store_name", "d_year", "d_moy", "sum_cents",
        (F.sum("sum_cents").over(wy) * 1.0 / F.count("sum_cents").over(wy)).alias(
            "avg_monthly"
        ),
        F.lag("sum_cents").over(wm).alias("prev_cents"),
        F.lead("sum_cents").over(wm).alias("next_cents"),
    )
    return (
        v2.where(
            (_C("d_year") == 1999)
            & (F.abs(_C("sum_cents") - _C("avg_monthly")) / _C("avg_monthly") > 0.1)
            & _C("prev_cents").isNotNull()
            & _C("next_cents").isNotNull()
        )
        .select(
            "i_brand", "s_store_name", "d_year", "d_moy",
            (F.floor(_C("sum_cents") / 100 + F.lit(0.5)) / 100).alias("sum_sales"),
            (F.floor(_C("avg_monthly") / 100 + F.lit(0.5)) / 100).alias(
                "avg_monthly_sales"
            ),
            (F.floor(_C("prev_cents") / 100 + F.lit(0.5)) / 100).alias("psum"),
            (F.floor(_C("next_cents") / 100 + F.lit(0.5)) / 100).alias("nsum"),
        )
    )


@_ds_q(
    "tpcds_q51",
    _with(
        """
    SELECT item_sk,
           CAST(EXTRACT(YEAR FROM dt) * 10000 + EXTRACT(MONTH FROM dt) * 100
                + EXTRACT(DAY FROM dt) AS BIGINT) AS dt_key,
           floor(web_c / 100 + 0.5) / 100 AS web_cumulative,
           floor(store_c / 100 + 0.5) / 100 AS store_cumulative
    FROM (
      SELECT item_sk, dt,
             max(web_cume) OVER (PARTITION BY item_sk ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_c,
             max(store_cume) OVER (PARTITION BY item_sk ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_c
      FROM (
        SELECT COALESCE(w.item_sk, s.item_sk) AS item_sk,
               COALESCE(w.dt, s.dt) AS dt,
               w.cume AS web_cume, s.cume AS store_cume
        FROM web_v w FULL OUTER JOIN store_v s
          ON w.item_sk = s.item_sk AND w.dt = s.dt) x) y
    WHERE web_c > store_c
    """,
        "web_sales", "store_sales",
        extra="""
    web_d AS (
      SELECT ws_item_sk AS item_sk, ws_sold_date AS dt,
             sum(CAST(round(ws_net_paid * 10000, 0) AS BIGINT)) AS cents
      FROM web_sales GROUP BY ws_item_sk, ws_sold_date),
    web_v AS (
      SELECT item_sk, dt,
             sum(cents) OVER (PARTITION BY item_sk ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
      FROM web_d),
    store_d AS (
      SELECT ss_item_sk AS item_sk, ss_sold_date AS dt,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS cents
      FROM store_sales GROUP BY ss_item_sk, ss_sold_date),
    store_v AS (
      SELECT item_sk, dt,
             sum(cents) OVER (PARTITION BY item_sk ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
      FROM store_d)
    """,
    ),
)
def q_tpcds_q51(ds: _DS) -> DataFrame:
    """TPC-DS Q51: days where an item's cumulative web revenue
    overtakes its cumulative store revenue — per-channel running sums
    FULL OUTER joined on (item, day), then running max to carry each
    channel's last seen cumulative across the other channel's days.
    All cumulative state is exact BIGINT cents, so the overtake
    predicate is bit-stable."""

    # Fused single-pass form (the oracle keeps the textbook per-channel
    # CTEs + FULL OUTER + running max). The two channels are the
    # l_linenumber % 3 ∈ {0, 2} slices of ONE lineitem⋈orders relation,
    # so the per-channel daily sums are conditional aggregates of one
    # groupBy(item, day), whose row set IS the full-outer union of the
    # channel day sets. The carry-forward running max equals a running
    # sum that skips the other channel's days: daily cents are ≥ 0
    # (net_paid = price·(1−disc) ≥ 0), so each channel's cumulative is
    # nondecreasing and max-so-far = last non-NULL = sum-so-far
    # (NULL while the channel has no day yet — both forms agree).
    # 1 fact scan + 1 pair shuffle + 1 window instead of 2 fact
    # derivations + 2 groupBys + 2 cume windows + a full-outer + 2
    # max windows.
    l, o = ds.t.lineitem, ds.t.orders
    ch = _C("l_linenumber") % 3
    cents = _cents(_C("l_extendedprice") * (1 - _C("l_discount")))
    daily = (
        l.where(ch != 1)
        .select(
            "l_orderkey", "l_partkey",
            F.when(ch == 2, cents).alias("__webc"),
            F.when(ch == 0, cents).alias("__storec"),
        )
        .join(
            o.select("o_orderkey", "o_orderdate"),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .groupBy(
            _C("l_partkey").alias("item_sk"),
            _C("o_orderdate").cast("date").alias("dt"),
        )
        .agg(
            F.sum("__webc").alias("__web_d"),
            F.sum("__storec").alias("__store_d"),
        )
    )
    w = (
        Window.partitionBy("item_sk")
        .orderBy("dt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = daily.select(
        "item_sk", "dt",
        F.sum("__web_d").over(w).alias("web_c"),
        F.sum("__store_d").over(w).alias("store_c"),
    )
    return y.where(_C("web_c") > _C("store_c")).select(
        "item_sk",
        (
            F.year("dt").cast("bigint") * 10000
            + F.month("dt").cast("bigint") * 100
            + F.dayofmonth("dt").cast("bigint")
        ).alias("dt_key"),
        (F.floor(_C("web_c") / 100 + F.lit(0.5)) / 100).alias("web_cumulative"),
        (F.floor(_C("store_c") / 100 + F.lit(0.5)) / 100).alias("store_cumulative"),
    )


@_ds_q(
    "tpcds_q75",
    _with(
        """
    SELECT curr.i_brand,
           CAST(prev.sales_cnt AS BIGINT) AS prev_cnt,
           CAST(curr.sales_cnt AS BIGINT) AS curr_cnt,
           floor(prev.amt_cents / 100 + 0.5) / 100 AS prev_amt,
           floor(curr.amt_cents / 100 + 0.5) / 100 AS curr_amt
    FROM all_sales curr
    JOIN all_sales prev
      ON curr.i_brand = prev.i_brand AND curr.d_year = prev.d_year + 1
    WHERE curr.d_year = 2000 AND curr.sales_cnt < prev.sales_cnt
    """,
        "store_sales", "store_returns", "catalog_sales", "catalog_returns",
        "web_sales", "web_returns", "item", "date_dim",
        extra="""
    sales_detail AS (
      SELECT ss_sold_date AS sold_date, ss_item_sk AS item_sk,
             CAST(round(ss_quantity
               - COALESCE(sr_return_quantity, 0), 0) AS BIGINT) AS qty,
             CAST(round((ss_net_paid - COALESCE(sr_return_amt, 0)) * 10000, 0)
               AS BIGINT) AS cents
      FROM store_sales LEFT JOIN store_returns
        ON ss_item_sk = sr_item_sk AND ss_ticket_number = sr_ticket_number
       AND ss_customer_sk = sr_customer_sk
      UNION ALL
      SELECT cs_sold_date, cs_item_sk,
             CAST(round(cs_quantity
               - COALESCE(cr_return_quantity, 0), 0) AS BIGINT),
             CAST(round((cs_net_paid - COALESCE(cr_return_amt, 0)) * 10000, 0)
               AS BIGINT)
      FROM catalog_sales LEFT JOIN catalog_returns
        ON cs_item_sk = cr_item_sk AND cs_order_number = cr_order_number
       AND cs_customer_sk = cr_customer_sk
      UNION ALL
      SELECT ws_sold_date, ws_item_sk,
             CAST(round(ws_quantity
               - COALESCE(wr_return_quantity, 0), 0) AS BIGINT),
             CAST(round((ws_net_paid - COALESCE(wr_return_amt, 0)) * 10000, 0)
               AS BIGINT)
      FROM web_sales LEFT JOIN web_returns
        ON ws_item_sk = wr_item_sk AND ws_order_number = wr_order_number
       AND ws_customer_sk = wr_customer_sk),
    all_sales AS (
      SELECT d_year, i_brand,
             sum(qty) AS sales_cnt, sum(cents) AS amt_cents
      FROM sales_detail
      JOIN item ON item_sk = i_item_sk
      JOIN date_dim ON sold_date = d_date
      GROUP BY d_year, i_brand)
    """,
    ),
)
def q_tpcds_q75(ds: _DS) -> DataFrame:
    """TPC-DS Q75: brands whose net-of-returns unit sales declined
    year-over-year — three channel facts LEFT JOINed to their returns,
    UNION ALL'd, aggregated, then self-joined on adjacent years. Net
    quantities and amounts are exact BIGINTs end to end."""

    # Fused sales_detail (oracle keeps the textbook per-channel fact
    # LEFT JOIN returns CTEs): each channel's returns table is the
    # R-flagged subset of the same lineitem slice and the customer-
    # key equality is implied by the order key, so the three
    # fact⋈returns joins ARE one lineitem self-join on (channel,
    # order, item) — the per-pair round((paid−amt)·1e4) is NOT linear
    # in its operands, so the exact pair rows are kept (no
    # pre-aggregation), but the six orders derivations collapse to a
    # single year-lookup join on the pair rows. 2 lineitem scans +
    # 1 orders scan vs 6 lineitem + 6 orders scans and 3 fan-out
    # joins over 6-column derived facts.
    l, o = ds.t.lineitem, ds.t.orders
    net = _C("l_extendedprice") * (1 - _C("l_discount"))
    ch = _C("l_linenumber") % 3
    sales = l.select(
        ch.alias("__ch"),
        _C("l_orderkey").alias("__ok"),
        _C("l_partkey").alias("item_sk"),
        _C("l_quantity").alias("__sq"),
        net.alias("__spaid"),
    )
    rets = l.where(_C("l_returnflag") == "R").select(
        ch.alias("__rch"),
        _C("l_orderkey").alias("__rok"),
        _C("l_partkey").alias("__rpk"),
        _C("l_quantity").alias("__rq"),
        net.alias("__ramt"),
    )
    sd = (
        sales.join(
            rets,
            (_C("__ch") == _C("__rch"))
            & (_C("__ok") == _C("__rok"))
            & (_C("item_sk") == _C("__rpk")),
            "left",
        )
        .select(
            "__ok",
            "item_sk",
            F.round(_C("__sq") - F.coalesce(_C("__rq"), F.lit(0)), 0)
            .cast("bigint")
            .alias("qty"),
            F.round(
                (_C("__spaid") - F.coalesce(_C("__ramt"), F.lit(0))) * 10000, 0
            ).cast("bigint").alias("cents"),
        )
    )
    years = o.select(
        _C("o_orderkey").alias("__yok"),
        F.year(_C("o_orderdate").cast("date")).cast("bigint").alias("d_year"),
    )
    all_sales = (
        sd.join(ds.item, _C("item_sk") == _C("i_item_sk"))
        .join(years, _C("__ok") == _C("__yok"))
        .groupBy("d_year", "i_brand")
        .agg(F.sum("qty").alias("sales_cnt"), F.sum("cents").alias("amt_cents"))
    )
    prev = all_sales.select(
        _C("i_brand").alias("__p_brand"), _C("d_year").alias("__p_year"),
        _C("sales_cnt").alias("prev_cnt"), _C("amt_cents").alias("__p_cents"),
    )
    return (
        all_sales.join(
            prev,
            (_C("i_brand") == _C("__p_brand"))
            & (_C("d_year") == _C("__p_year") + 1),
        )
        .where((_C("d_year") == 2000) & (_C("sales_cnt") < _C("prev_cnt")))
        .select(
            "i_brand", "prev_cnt",
            _C("sales_cnt").alias("curr_cnt"),
            (F.floor(_C("__p_cents") / 100 + F.lit(0.5)) / 100).alias("prev_amt"),
            (F.floor(_C("amt_cents") / 100 + F.lit(0.5)) / 100).alias("curr_amt"),
        )
    )


@_ds_q(
    "tpcds_q90",
    _with(
        """
    SELECT round(CAST(small_cnt AS DOUBLE) / big_cnt, 6) AS qty_ratio,
           small_cnt, big_cnt
    FROM
      (SELECT CAST(count(*) AS BIGINT) AS small_cnt FROM store_sales
       WHERE ss_quantity BETWEEN 1 AND 15) a,
      (SELECT CAST(count(*) AS BIGINT) AS big_cnt FROM store_sales
       WHERE ss_quantity BETWEEN 36 AND 50) b
    """,
        "store_sales",
    ),
)
def q_tpcds_q90(ds: _DS) -> DataFrame:
    """TPC-DS Q90 shape: ratio of two bucket counts. Like q88, the
    literal SQL is two scans cross-joined; the Spark plan is one
    conditional-aggregation pass (the 100 TB rewrite). Counts are
    exact, so the ratio is bit-stable."""
    agg = ds.store_sales.agg(
        F.sum(F.when(_C("ss_quantity").between(1, 15), 1).otherwise(0))
        .cast("bigint")
        .alias("small_cnt"),
        F.sum(F.when(_C("ss_quantity").between(36, 50), 1).otherwise(0))
        .cast("bigint")
        .alias("big_cnt"),
    )
    return agg.select(
        F.round(_C("small_cnt") / _C("big_cnt"), 6).alias("qty_ratio"),
        "small_cnt",
        "big_cnt",
    )


@_ds_q(
    "tpcds_q87",
    _with(
        """
    SELECT CAST(count(*) AS BIGINT) AS store_only_customers
    FROM (
      SELECT DISTINCT ss_customer_sk AS customer_sk
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 2000
      EXCEPT
      SELECT DISTINCT cs_customer_sk AS customer_sk
      FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
      WHERE d_year = 2000
      EXCEPT
      SELECT DISTINCT ws_customer_sk AS customer_sk
      FROM web_sales JOIN date_dim ON ws_sold_date = d_date
      WHERE d_year = 2000) hot
    """,
        "store_sales", "catalog_sales", "web_sales", "date_dim",
    ),
)
def q_tpcds_q87(ds: _DS) -> DataFrame:
    """TPC-DS Q87: customers who bought in-store but through no other
    channel that year. The oracle keeps the textbook EXCEPT chain;
    the Spark plan exploits what the optimizer cannot see — the three
    channel facts partition ONE lineitem scan by l_linenumber % 3,
    every fact sold_date is an o_orderdate (so the date_dim equi-join
    against the distinct derived dates is exactly a year filter), and
    orders.o_orderkey is a key (the fact's orders join is 1:1) — to
    fuse the whole thing into one lineitem⋈orders pass with a channel
    tag plus one groupBy(custkey) computing per-channel presence
    flags. Store-only = flag(store) AND NOT flag(catalog|web): the
    same set the EXCEPT chain yields, at 1 fact scan + 1 key shuffle
    instead of 3 fact⋈dim joins + 3 distincts + 2 EXCEPT shuffles."""
    l, o = ds.t.lineitem, ds.t.orders
    flags = (
        l.select("l_orderkey", (_C("l_linenumber") % 3).alias("__ch"))
        .join(
            o.where(_year_range(_C("o_orderdate").cast("date"), 2000)).select(
                "o_orderkey", "o_custkey"
            ),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.max(_C("__ch") == 0).alias("__s"),
            F.max(_C("__ch") == 1).alias("__c"),
            F.max(_C("__ch") == 2).alias("__w"),
        )
        .where(_C("__s") & ~_C("__c") & ~_C("__w"))
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("store_only_customers")
    )


def _q49_channel_sql(fact: str, ret: str, p: str, rp: str, order: str) -> str:
    return f"""
      SELECT '{fact}' AS channel, {p}item_sk AS item_sk,
             round(CAST(sum(CAST(round(COALESCE({rp}return_amt, 0) * 10000, 0)
                     AS BIGINT)) AS DOUBLE)
                   / sum(CAST(round({p}net_paid * 10000, 0) AS BIGINT)),
                   6) AS return_ratio
      FROM {fact}_sales LEFT JOIN {fact}_returns
        ON {p}item_sk = {rp}item_sk AND {p}{order} = {rp}{order}
       AND {p}customer_sk = {rp}customer_sk
      GROUP BY {p}item_sk
      HAVING sum(CAST(round(COALESCE({rp}return_amt, 0) * 10000, 0)
               AS BIGINT)) > 0
    """


@_ds_q(
    "tpcds_q49",
    _with(
        f"""
    SELECT channel, item_sk, return_ratio,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT channel, item_sk, return_ratio,
             rank() OVER (PARTITION BY channel
                          ORDER BY return_ratio DESC, item_sk) AS rnk
      FROM (
        {_q49_channel_sql('store', 'returns', 'ss_', 'sr_', 'ticket_number')}
        UNION ALL
        {_q49_channel_sql('catalog', 'returns', 'cs_', 'cr_', 'order_number')}
        UNION ALL
        {_q49_channel_sql('web', 'returns', 'ws_', 'wr_', 'order_number')}) r) t
    WHERE rnk <= 10
    """,
        "store_sales", "store_returns", "catalog_sales", "catalog_returns",
        "web_sales", "web_returns",
    ),
)
def q_tpcds_q49(ds: _DS) -> DataFrame:
    """TPC-DS Q49: worst return ratios per channel — per-channel
    item-level returns/sales ratio (exact-cent BIGINTs, so the ratio
    and its rank order are bit-stable), ranked within each channel,
    top 10 of the three channels UNION ALL'd.

    Fused plan (the oracle keeps the textbook per-channel fact LEFT
    JOIN returns): each channel's returns table is the R-flagged
    SUBSET of the same lineitem slice, the customer-key equality in
    the join is implied by the order key (o_custkey is functionally
    determined by o_orderkey), and no orders column survives into
    the aggregates — so the three fact⋈returns joins collapse into
    ONE lineitem scan with two stacked aggregations. Per join group
    g = (channel, order, item) the pair-sum decomposes exactly
    (cents() is applied per VALUE, so the sums are linear):

        Σ_pairs cents(return_amt)  = n_rows(g) · Σ_{R rows} cents(net)
        Σ_pairs cents(net_paid)    = max(n_ret(g), 1) · Σ_all cents(net)

    (return_amt and net_paid are the same l_extendedprice·(1−l_disc)
    expression in the derived schema). 1 scan + 2 key shuffles vs
    6 fact/returns derivations (each a lineitem⋈orders join) + 3
    channel joins; no orders scan at all."""
    l = ds.t.lineitem
    net_c = _cents(_C("l_extendedprice") * (1 - _C("l_discount")))
    per_group = (
        l.select(
            (_C("l_linenumber") % 3).alias("__ch"),
            _C("l_orderkey").alias("__ok"),
            _C("l_partkey").alias("item_sk"),
            net_c.alias("__net_c"),
            (_C("l_returnflag") == "R").alias("__isr"),
        )
        .groupBy("__ch", "__ok", "item_sk")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(_C("__isr"), 1)).alias("__nr"),
            F.sum("__net_c").alias("__net_sum"),
            F.sum(F.when(_C("__isr"), _C("__net_c"))).alias("__ret_sum"),
        )
    )
    unioned = (
        per_group.groupBy("__ch", "item_sk")
        .agg(
            F.sum(
                _C("__n") * F.coalesce(_C("__ret_sum"), F.lit(0))
            ).alias("__ret"),
            F.sum(
                F.greatest(_C("__nr"), F.lit(1)) * _C("__net_sum")
            ).alias("__sales"),
        )
        .where(_C("__ret") > 0)
        .select(
            F.element_at(
                F.array(F.lit("store"), F.lit("catalog"), F.lit("web")),
                (_C("__ch") + 1).cast("int"),
            ).alias("channel"),
            "item_sk",
            F.round(_C("__ret") / _C("__sales"), 6).alias("return_ratio"),
        )
    )
    w = Window.partitionBy("channel").orderBy(
        _C("return_ratio").desc(), _C("item_sk")
    )
    return (
        unioned.select(
            "channel", "item_sk", "return_ratio",
            F.rank().over(w).cast("bigint").alias("rnk"),
        )
        .where(_C("rnk") <= 10)
    )


@_ds_q(
    "tpcds_q64",
    _with(
        """
    SELECT cs1.product_name, cs1.store_name, cs1.b_state, cs1.syear,
           cs2.b_state AS b_state2,
           cs1.cnt, cs1.s1, cs2.s1 AS s2, cs2.cnt AS cnt2
    FROM cross_sales cs1
    JOIN cross_sales cs2
      ON cs1.item_sk = cs2.item_sk AND cs1.store_name = cs2.store_name
     AND cs2.syear = cs1.syear + 1
    WHERE cs1.syear = 1998 AND cs2.cnt <= cs1.cnt
    """,
        "store_sales", "store_returns", "catalog_sales", "catalog_returns",
        "date_dim", "store", "customer_dim", "customer_address", "item",
        extra="""
    cs_ui AS (
      SELECT cs_item_sk AS ui_item_sk
      FROM catalog_sales LEFT JOIN catalog_returns
        ON cs_item_sk = cr_item_sk AND cs_order_number = cr_order_number
       AND cs_customer_sk = cr_customer_sk
      GROUP BY cs_item_sk
      HAVING sum(CAST(round(cs_net_paid * 10000, 0) AS BIGINT))
             > 3 * sum(COALESCE(CAST(round(cr_return_amt * 10000, 0)
                                     AS BIGINT), 0))),
    cross_sales AS (
      SELECT i_item_desc AS product_name, i_item_sk AS item_sk,
             s_store_name AS store_name, ca_state AS b_state,
             d_year AS syear, CAST(count(*) AS BIGINT) AS cnt,
             floor(sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT))
                   / 100 + 0.5) / 100 AS s1
      FROM store_sales
      JOIN cs_ui ON ss_item_sk = ui_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      JOIN store ON ss_store_sk = s_store_sk
      JOIN customer_dim ON ss_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      JOIN item ON ss_item_sk = i_item_sk
      GROUP BY i_item_desc, i_item_sk, s_store_name, ca_state, d_year)
    """,
    ),
)
def q_tpcds_q64(ds: _DS) -> DataFrame:
    """TPC-DS Q64 shape (the corpus's heaviest join tree): items with
    healthy catalog margins (sale > 3× refund, exact-cent HAVING over
    a fact-fact join), their store sales expanded through five
    dimensions, aggregated per (item, store, buyer-state, year), then
    the CTE self-joined on adjacent years where repeat volume did not
    grow. Exercises Catalyst's join reordering across 8 relations +
    aggregate reuse across the self-join."""
    # cs_ui fused to one lineitem pass (oracle keeps the textbook
    # fact LEFT JOIN returns): catalog_returns is the R-flagged
    # subset of the same catalog lineitem slice, the customer-key
    # join equality is implied by the order key, and the HAVING sums
    # are per-VALUE cents — so the join collapses into two stacked
    # aggregations, exactly the q49 decomposition:
    #   Σ_pairs cents(cs_net_paid)   = max(n_ret(g),1)·Σ_all cents(net)
    #   Σ_pairs cents(cr_return_amt) = n_rows(g)·Σ_{R rows} cents(net)
    # per join group g = (order, item). No orders scan, no fact-fact
    # shuffle join.
    l = ds.t.lineitem
    net_c = _cents(_C("l_extendedprice") * (1 - _C("l_discount")))
    cs_grp = (
        l.where(_C("l_linenumber") % 3 == 1)
        .select(
            _C("l_orderkey").alias("__ok"),
            _C("l_partkey").alias("ui_item_sk"),
            net_c.alias("__net_c"),
            (_C("l_returnflag") == "R").alias("__isr"),
        )
        .groupBy("__ok", "ui_item_sk")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(_C("__isr"), 1)).alias("__nr"),
            F.sum("__net_c").alias("__net_sum"),
            F.sum(F.when(_C("__isr"), _C("__net_c"))).alias("__ret_sum"),
        )
    )
    cs_ui = (
        cs_grp.groupBy("ui_item_sk")
        .agg(
            F.sum(
                F.greatest(_C("__nr"), F.lit(1)) * _C("__net_sum")
            ).alias("__sale"),
            F.sum(
                _C("__n") * F.coalesce(_C("__ret_sum"), F.lit(0))
            ).alias("__refund"),
        )
        .where(_C("__sale") > 3 * _C("__refund"))
        .select("ui_item_sk")
    )
    cross_sales = (
        ds.store_sales.join(cs_ui, _C("ss_item_sk") == _C("ui_item_sk"))
        .join(ds.date_dim, _C("ss_sold_date") == _C("d_date"))
        .join(ds.store, _C("ss_store_sk") == _C("s_store_sk"))
        .join(ds.customer_dim, _C("ss_customer_sk") == _C("c_customer_sk"))
        .join(ds.customer_address, _C("c_current_addr_sk") == _C("ca_address_sk"))
        .join(ds.item, _C("ss_item_sk") == _C("i_item_sk"))
        .groupBy(
            _C("i_item_desc").alias("product_name"),
            _C("i_item_sk").alias("item_sk"),
            _C("s_store_name").alias("store_name"),
            _C("ca_state").alias("b_state"),
            _C("d_year").alias("syear"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (
                F.floor(F.sum(_cents(_C("ss_net_paid"))) / 100 + F.lit(0.5)) / 100
            ).alias("s1"),
        )
    )
    # The adjacent-year self-join reads cross_sales twice; the join +
    # WHERE restrict it to syear ∈ {1998, 1999} (cs1.syear = 1998,
    # cs2.syear = cs1.syear + 1), so pin exactly that two-year slice
    # once (guide §5 — the CTE is a small per-(item, store, state,
    # year) decision table) instead of re-deriving the whole 8-way
    # join tree per side.
    cross_sales = (
        cross_sales.where(_C("syear").isin(1998, 1999))
        .coalesce(ds.t.spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    cs2 = cross_sales.select(
        _C("item_sk").alias("__i2"), _C("store_name").alias("__st2"),
        _C("b_state").alias("__b2"), _C("syear").alias("__y2"),
        _C("cnt").alias("cnt2"), _C("s1").alias("s2"),
    )
    return (
        cross_sales.join(
            cs2,
            (_C("item_sk") == _C("__i2"))
            & (_C("store_name") == _C("__st2"))
            & (_C("__y2") == _C("syear") + 1),
        )
        .where((_C("syear") == 1998) & (_C("cnt2") <= _C("cnt")))
        .select(
            "product_name", "store_name", "b_state",
            _C("__b2").alias("b_state2"), "syear",
            "cnt", "s1", "s2", "cnt2",
        )
    )


@_ds_q(
    "tpcds_q2",
    _with(
        """
    SELECT a.d_moy AS moy, a.s AS sum_y1, b.s AS sum_y2,
           round(b.s / a.s, 4) AS ratio
    FROM msums a JOIN msums b ON a.d_moy = b.d_moy
    WHERE a.d_year = 1997 AND b.d_year = 1998
    """,
        "web_sales", "catalog_sales", "date_dim",
        extra=f"""
    wscs AS (
      SELECT ws_sold_date AS sold_date, ws_net_paid AS net_paid
      FROM web_sales
      UNION ALL
      SELECT cs_sold_date, cs_net_paid FROM catalog_sales
    ), msums AS (
      SELECT d_year, d_moy, {_ems_sql('net_paid')} AS s
      FROM wscs JOIN date_dim ON sold_date = d_date
      GROUP BY d_year, d_moy
    )""",
    ),
)
def q_tpcds_q2(ds: _DS) -> DataFrame:
    """TPC-DS Q2 shape (query2.sql): web+catalog union rolled up to
    calendar periods, then the period sums of one year self-joined
    against the NEXT year's same period for the growth ratio. The
    oracle keeps the textbook union + self-join; the Spark plan uses
    the fusion facts (web+catalog = the l_linenumber % 3 != 0 slice
    of ONE lineitem scan; sold_date = o_orderdate, so the date_dim
    join is a pushed two-year range and d_moy = month(o_orderdate))
    to pivot both years out of one groupBy(moy): per-year exact money
    sums as conditional aggregates, inner-join presence = non-NULL.
    1 fact scan + 1 shuffle instead of 2 fact derivations + a union +
    a dim join + a self-join."""
    l, o = ds.t.lineitem, ds.t.orders
    cents = _cents(_C("l_extendedprice") * (1 - _C("l_discount")))
    yr = F.year(_C("o_orderdate").cast("date"))

    def money(y: int):
        c = F.sum(F.when(yr == y, cents))
        return F.floor(c / 100 + F.lit(0.5)) / 100

    return (
        l.where(_C("l_linenumber") % 3 != 0)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            o.where(
                _year_range(_C("o_orderdate").cast("date"), 1997, 1998)
            ).select("o_orderkey", "o_orderdate"),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .groupBy(
            F.month(_C("o_orderdate").cast("date")).cast("bigint").alias("moy")
        )
        .agg(money(1997).alias("sum_y1"), money(1998).alias("sum_y2"))
        .where(_C("sum_y1").isNotNull() & _C("sum_y2").isNotNull())
        .select(
            "moy", "sum_y1", "sum_y2",
            F.round(_C("sum_y2") / _C("sum_y1"), 4).alias("ratio"),
        )
    )


_Q4_YT_SQL = """
    year_total AS (
      SELECT ss_customer_sk AS customer_sk, d_year,
             's' AS channel,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year IN (1997, 1998)
      GROUP BY ss_customer_sk, d_year
      UNION ALL
      SELECT cs_customer_sk, d_year, 'c',
             sum(CAST(round(cs_net_paid * 10000, 0) AS BIGINT))
      FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
      WHERE d_year IN (1997, 1998)
      GROUP BY cs_customer_sk, d_year
      UNION ALL
      SELECT ws_customer_sk, d_year, 'w',
             sum(CAST(round(ws_net_paid * 10000, 0) AS BIGINT))
      FROM web_sales JOIN date_dim ON ws_sold_date = d_date
      WHERE d_year IN (1997, 1998)
      GROUP BY ws_customer_sk, d_year
    )
"""


def _q4_year_total(ds: _DS) -> DataFrame:
    """Per-customer exact-cent yearly totals for the three channels
    (TPC-DS q4/q11 year_total CTE).

    Fused single-pass form: the three channel facts partition ONE
    lineitem scan by l_linenumber % 3, each fact's sold_date is its
    o_orderdate (so the date_dim join against the distinct derived
    dates reduces to a year filter), and the orders join is 1:1 on
    the o_orderkey key — so the 3-fact union is one lineitem⋈orders
    pass tagged with the channel letter, and the three per-channel
    groupBys become ONE groupBy(customer_sk, d_year, channel). Same
    rows, same exact-cent sums; 1 fact scan + 1 shuffle instead of 3
    fact⋈dim joins + 3 aggregations."""
    l, o = ds.t.lineitem, ds.t.orders
    net = _C("l_extendedprice") * (1 - _C("l_discount"))
    ch = (
        F.when(_C("l_linenumber") % 3 == 0, "s")
        .when(_C("l_linenumber") % 3 == 1, "c")
        .otherwise("w")
    )
    d = _C("o_orderdate").cast("date")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .join(
            o.where(_year_range(_C("o_orderdate").cast("date"), 1997, 1998))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .groupBy(
            _C("o_custkey").alias("customer_sk"),
            F.year(d).cast("bigint").alias("d_year"),
            ch.alias("channel"),
        )
        .agg(F.sum(_cents(net)).alias("total_cents"))
        .select("customer_sk", "d_year", "channel", "total_cents")
    )


@_ds_q(
    "tpcds_q4",
    _with(
        """
    SELECT s1.customer_sk AS customer_sk
    FROM year_total s1
    JOIN year_total s2 ON s1.customer_sk = s2.customer_sk
    JOIN year_total c1 ON s1.customer_sk = c1.customer_sk
    JOIN year_total c2 ON s1.customer_sk = c2.customer_sk
    JOIN year_total w1 ON s1.customer_sk = w1.customer_sk
    JOIN year_total w2 ON s1.customer_sk = w2.customer_sk
    WHERE s1.channel = 's' AND s1.d_year = 1997
      AND s2.channel = 's' AND s2.d_year = 1998
      AND c1.channel = 'c' AND c1.d_year = 1997
      AND c2.channel = 'c' AND c2.d_year = 1998
      AND w1.channel = 'w' AND w1.d_year = 1997
      AND w2.channel = 'w' AND w2.d_year = 1998
      AND s1.total_cents > 0 AND c1.total_cents > 0 AND w1.total_cents > 0
      AND CAST(c2.total_cents AS DOUBLE) * CAST(s1.total_cents AS DOUBLE)
        > CAST(s2.total_cents AS DOUBLE) * CAST(c1.total_cents AS DOUBLE)
      AND CAST(c2.total_cents AS DOUBLE) * CAST(w1.total_cents AS DOUBLE)
        > CAST(w2.total_cents AS DOUBLE) * CAST(c1.total_cents AS DOUBLE)
    """,
        "store_sales", "catalog_sales", "web_sales", "date_dim",
        extra=_Q4_YT_SQL,
    ),
)
def q_tpcds_q4(ds: _DS) -> DataFrame:
    """TPC-DS Q4 (query4.sql): customer lifetime value — the
    year_total CTE self-joined SIX ways picks customers whose
    catalog-channel growth from 1997 to 1998 beats both their store
    and web growth. The oracle keeps the textbook 6-way self-join;
    the Spark plan instead PIVOTS the six (channel, year) legs into
    one conditional aggregation per customer — one shuffle on
    customer_sk total instead of six self-join shuffles, the same
    single-pass trade as q88 and the right plan at 100 TB. Growth
    comparison is cross-multiplication in DOUBLE: the operands are
    identical exact-cent integers on both engines, so the IEEE
    products (and the comparison) are bit-identical — and immune to
    the BIGINT overflow exact integer products would hit."""
    yt = _q4_year_total(ds)

    def leg(ch, yr):
        return F.sum(
            F.when(
                (_C("channel") == ch) & (_C("d_year") == yr),
                _C("total_cents"),
            )
        )

    wide = yt.groupBy("customer_sk").agg(
        leg("s", 1997).alias("__s1_t"),
        leg("s", 1998).alias("__s2_t"),
        leg("c", 1997).alias("__c1_t"),
        leg("c", 1998).alias("__c2_t"),
        leg("w", 1997).alias("__w1_t"),
        leg("w", 1998).alias("__w2_t"),
    )
    present = [
        _C(c).isNotNull()
        for c in ("__s1_t", "__s2_t", "__c1_t", "__c2_t", "__w1_t", "__w2_t")
    ]
    cond = present[0]
    for p in present[1:]:
        cond = cond & p
    return (
        wide.where(cond)
        .where(
            (_C("__s1_t") > 0) & (_C("__c1_t") > 0) & (_C("__w1_t") > 0)
            & (
                _C("__c2_t").cast("double") * _C("__s1_t").cast("double")
                > _C("__s2_t").cast("double") * _C("__c1_t").cast("double")
            )
            & (
                _C("__c2_t").cast("double") * _C("__w1_t").cast("double")
                > _C("__w2_t").cast("double") * _C("__c1_t").cast("double")
            )
        )
        .select(_C("customer_sk"))
    )


@_ds_q(
    "tpcds_q10",
    _with(
        """
    SELECT c_segment, c_preferred_flag, CAST(count(*) AS BIGINT) AS cnt
    FROM customer_dim c
    JOIN customer_address ON ca_address_sk = c_current_addr_sk
    WHERE ca_country IN ('EUROPE', 'ASIA')
      AND EXISTS (
        SELECT 1 FROM store_sales JOIN date_dim ON ss_sold_date = d_date
        WHERE ss_customer_sk = c.c_customer_sk
          AND d_year = 1997 AND d_qoy <= 2)
      AND (EXISTS (
             SELECT 1 FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
             WHERE cs_customer_sk = c.c_customer_sk
               AND d_year = 1997 AND d_qoy <= 2)
           OR EXISTS (
             SELECT 1 FROM web_sales JOIN date_dim ON ws_sold_date = d_date
             WHERE ws_customer_sk = c.c_customer_sk
               AND d_year = 1997 AND d_qoy <= 2))
    GROUP BY c_segment, c_preferred_flag
    """,
        "customer_dim", "customer_address", "store_sales", "catalog_sales",
        "web_sales", "date_dim",
    ),
)
def q_tpcds_q10(ds: _DS) -> DataFrame:
    """TPC-DS Q10 (query10.sql): the EXISTS grid — customers in
    selected countries who bought in-store AND through (catalog OR
    web) in the same half-year, counted by demographic cell. The OR
    of two EXISTS becomes a semi-join against the UNION of the two
    channels' customer keys (set semantics make union-then-semi
    exactly OR-of-EXISTS); both semi-join builds are
    already-distinct key sets, far smaller than the facts."""
    # the q35 fusion: the three channel EXISTS probes fall out of ONE
    # lineitem⋈orders pass grouped by customer (year 1997, qoy <= 2 is
    # the pushed Jan-Jun range) — has_store = any channel-0 row,
    # has_cw = any channel-1/2 row; 1 fact scan + 1 key shuffle
    # instead of 3 fact⋈dim joins + a union + 2 semi-join builds
    l, o = ds.t.lineitem, ds.t.orders
    h1 = o.where(
        (_C("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (_C("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    flags = (
        l.select("l_orderkey", (_C("l_linenumber") % 3).alias("__ch"))
        .join(h1, _C("l_orderkey") == _C("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.max(_C("__ch") == 0).alias("__s"),
            F.max(_C("__ch") != 0).alias("__cw"),
        )
        .where(_C("__s") & _C("__cw"))
        .select("o_custkey")
    )
    return (
        ds.customer_dim.join(
            F.broadcast(
                ds.customer_address.where(
                    _C("ca_country").isin("EUROPE", "ASIA")
                )
            ),
            _C("ca_address_sk") == _C("c_current_addr_sk"),
        )
        .join(flags, _C("c_customer_sk") == _C("o_custkey"), "left_semi")
        .groupBy("c_segment", "c_preferred_flag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@_ds_q(
    "tpcds_q11",
    _with(
        """
    SELECT s1.customer_sk AS customer_sk, c_preferred_flag
    FROM year_total s1
    JOIN year_total s2 ON s1.customer_sk = s2.customer_sk
    JOIN year_total w1 ON s1.customer_sk = w1.customer_sk
    JOIN year_total w2 ON s1.customer_sk = w2.customer_sk
    JOIN customer_dim ON c_customer_sk = s1.customer_sk
    WHERE s1.channel = 's' AND s1.d_year = 1997
      AND s2.channel = 's' AND s2.d_year = 1998
      AND w1.channel = 'w' AND w1.d_year = 1997
      AND w2.channel = 'w' AND w2.d_year = 1998
      AND s1.total_cents > 0 AND w1.total_cents > 0
      AND CAST(w2.total_cents AS DOUBLE) * CAST(s1.total_cents AS DOUBLE)
        > CAST(s2.total_cents AS DOUBLE) * CAST(w1.total_cents AS DOUBLE)
    """,
        "store_sales", "catalog_sales", "web_sales", "date_dim",
        "customer_dim",
        extra=_Q4_YT_SQL,
    ),
)
def q_tpcds_q11(ds: _DS) -> DataFrame:
    """TPC-DS Q11 (query11.sql): the two-channel variant of the LTV
    window — customers whose web growth 1997→1998 beats their store
    growth, carrying a customer attribute. Same single-pass pivot
    plan as q4 (one shuffle on customer_sk, conditional sums), the
    dim joined broadcast after the filter."""
    yt = _q4_year_total(ds)

    def leg(ch, yr):
        return F.sum(
            F.when(
                (_C("channel") == ch) & (_C("d_year") == yr),
                _C("total_cents"),
            )
        )

    wide = (
        yt.where(_C("channel").isin("s", "w"))
        .groupBy("customer_sk")
        .agg(
            leg("s", 1997).alias("__s1_t"),
            leg("s", 1998).alias("__s2_t"),
            leg("w", 1997).alias("__w1_t"),
            leg("w", 1998).alias("__w2_t"),
        )
    )
    qual = wide.where(
        _C("__s1_t").isNotNull() & _C("__s2_t").isNotNull()
        & _C("__w1_t").isNotNull() & _C("__w2_t").isNotNull()
        & (_C("__s1_t") > 0) & (_C("__w1_t") > 0)
        & (
            _C("__w2_t").cast("double") * _C("__s1_t").cast("double")
            > _C("__s2_t").cast("double") * _C("__w1_t").cast("double")
        )
    )
    return qual.join(
        ds.customer_dim, _C("customer_sk") == _C("c_customer_sk")
    ).select("customer_sk", "c_preferred_flag")


@_ds_q(
    "tpcds_q16",
    _with(
        f"""
    SELECT CAST(count(DISTINCT cs1.cs_order_number) AS BIGINT)
             AS order_count,
           {_ems_sql('cs1.cs_ext_ship_cost')} AS total_shipping_cost,
           {_ems_sql('cs1.cs_net_paid')} AS total_net_paid
    FROM catalog_sales cs1
    JOIN date_dim ON cs1.cs_ship_date = d_date
    WHERE d_year = 1997 AND d_moy <= 3
      AND EXISTS (
        SELECT 1 FROM catalog_sales cs2
        WHERE cs2.cs_order_number = cs1.cs_order_number
          AND cs2.cs_warehouse_sk <> cs1.cs_warehouse_sk)
      AND NOT EXISTS (
        SELECT 1 FROM catalog_returns cr
        WHERE cr.cr_order_number = cs1.cs_order_number)
    """,
        "catalog_sales", "catalog_returns", "date_dim",
    ),
)
def q_tpcds_q16(ds: _DS) -> DataFrame:
    """TPC-DS Q16 (query16.sql): catalog orders shipped in a quarter
    from MORE than one warehouse with NO returns — correlated EXISTS
    (same order, different warehouse) + NOT EXISTS (returns), then
    count(DISTINCT order) with exact-cent sums. The multi-warehouse
    EXISTS decorrelates to a per-order warehouse-count aggregate
    semi-joined back (count > 1 <=> a different-warehouse row
    exists); NOT EXISTS is a left-anti join on order_number. All
    three shuffles ride the natural order_number key."""
    cs = ds.catalog_sales
    multi_wh = (
        cs.groupBy("cs_order_number")
        .agg(F.countDistinct("cs_warehouse_sk").alias("__nwh"))
        .where(_C("__nwh") > 1)
        .select(_C("cs_order_number").alias("__ok"))
    )
    dd = ds.date_dim.where((_C("d_year") == 1997) & (_C("d_moy") <= 3))
    return (
        cs.join(F.broadcast(dd), _C("cs_ship_date") == _C("d_date"))
        .join(multi_wh, _C("cs_order_number") == _C("__ok"), "left_semi")
        .join(
            ds.catalog_returns_slim.select(
                _C("cr_order_number").alias("__rk")
            ),
            _C("cs_order_number") == _C("__rk"),
            "left_anti",
        )
        .agg(
            F.countDistinct("cs_order_number").alias("order_count"),
            _exact_money_sum(_C("cs_ext_ship_cost")).alias(
                "total_shipping_cost"
            ),
            _exact_money_sum(_C("cs_net_paid")).alias("total_net_paid"),
        )
    )


@_ds_q(
    "tpcds_q27",
    _with(
        f"""
    SELECT i_category, s_state,
           CAST(grouping(s_state) AS BIGINT) AS g_state,
           {_exact_avg_sql('ss_quantity', 100)} AS agg1,
           {_ems_sql('ss_net_paid')} AS agg2
    FROM store_sales
    JOIN date_dim ON ss_sold_date = d_date
    JOIN item ON ss_item_sk = i_item_sk
    JOIN store ON ss_store_sk = s_store_sk
    WHERE d_year = 1997 AND i_manufact_id < 20
    GROUP BY ROLLUP(i_category, s_state)
    """,
        "store_sales", "date_dim", "item", "store",
    ),
)
def q_tpcds_q27(ds: _DS) -> DataFrame:
    """TPC-DS Q27 (query27.sql): the rollup grid — store sales by
    item category and store state with ROLLUP subtotals and a
    GROUPING() marker column. Expand/rollup is one shuffle; all three
    dims broadcast. Averages use the exact-integer avg so subtotal
    rows (bigger sums) stay bit-stable."""
    return (
        ds.store_sales.where(_year_range(_C("ss_sold_date"), 1997))
        .join(
            F.broadcast(ds.item.where(_C("i_manufact_id") < 20)),
            _C("ss_item_sk") == _C("i_item_sk"),
        )
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .rollup("i_category", "s_state")
        .agg(
            F.grouping("s_state").cast("bigint").alias("g_state"),
            _exact_avg(_C("ss_quantity"), 100).alias("agg1"),
            _exact_money_sum(_C("ss_net_paid")).alias("agg2"),
        )
        .select("i_category", "s_state", "g_state", "agg1", "agg2")
    )


@_ds_q(
    "tpcds_q35",
    _with(
        """
    SELECT ca_state, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(n_store) AS BIGINT) AS sum_store,
           CAST(max(n_store) AS BIGINT) AS max_store,
           floor(sum(n_store) * 100 / count(*) + 0.5) / 100 AS avg_store
    FROM (
      SELECT c.c_customer_sk, ca_state,
             (SELECT count(*) FROM store_sales
              JOIN date_dim ON ss_sold_date = d_date
              WHERE ss_customer_sk = c.c_customer_sk
                AND d_year = 1997) AS n_store
      FROM customer_dim c
      JOIN customer_address ON ca_address_sk = c_current_addr_sk
      WHERE EXISTS (
          SELECT 1 FROM store_sales JOIN date_dim ON ss_sold_date = d_date
          WHERE ss_customer_sk = c.c_customer_sk AND d_year = 1997)
        AND (EXISTS (
               SELECT 1 FROM web_sales JOIN date_dim ON ws_sold_date = d_date
               WHERE ws_customer_sk = c.c_customer_sk AND d_year = 1997)
             OR EXISTS (
               SELECT 1 FROM catalog_sales
               JOIN date_dim ON cs_sold_date = d_date
               WHERE cs_customer_sk = c.c_customer_sk AND d_year = 1997))
    )
    GROUP BY ca_state
    """,
        "customer_dim", "customer_address", "store_sales", "web_sales",
        "catalog_sales", "date_dim",
    ),
)
def q_tpcds_q35(ds: _DS) -> DataFrame:
    """TPC-DS Q35 (query35.sql): the EXISTS grid with per-customer
    correlated statistics — qualifying customers (store AND (web OR
    catalog) activity in the year) rolled up by state with
    count/sum/max/avg of their store-purchase counts. The correlated
    scalar count decorrelates to ONE per-customer aggregate joined
    back (inner — qualification already guarantees presence); the
    OR-of-EXISTS is a semi-join against the channel-key union. The
    exact avg divides integer sums (floor pattern) so both engines
    agree bit-for-bit."""
    # Fused per-customer stats: the three channel facts partition ONE
    # lineitem scan by l_linenumber % 3 and the date_dim equi-join
    # against the distinct derived dates is exactly a year filter on
    # o_orderdate — so the store count, the store EXISTS, and the
    # web-OR-catalog EXISTS all fall out of one lineitem⋈orders pass
    # grouped by customer: n_store = count of channel-0 rows (>0 ≡
    # the inner per_cust join), has_or = any channel-1/2 row (≡ the
    # OR-of-EXISTS semi join). 1 fact scan + 1 key shuffle instead of
    # 3 fact⋈dim joins + a union + 2 join passes.
    l, o = ds.t.lineitem, ds.t.orders
    cust_stats = (
        l.select("l_orderkey", (_C("l_linenumber") % 3).alias("__ch"))
        .join(
            o.where(_year_range(_C("o_orderdate").cast("date"), 1997)).select(
                "o_orderkey", "o_custkey"
            ),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .groupBy(_C("o_custkey").alias("__ck"))
        .agg(
            F.count(F.when(_C("__ch") == 0, 1)).alias("n_store"),
            F.max(_C("__ch") != 0).alias("__has_or"),
        )
        .where((_C("n_store") > 0) & _C("__has_or"))
    )
    return (
        ds.customer_dim.join(
            F.broadcast(ds.customer_address),
            _C("ca_address_sk") == _C("c_current_addr_sk"),
        )
        .join(cust_stats, _C("c_customer_sk") == _C("__ck"))
        .groupBy("ca_state")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_store").alias("sum_store"),
            F.max("n_store").alias("max_store"),
            (
                F.floor(F.sum("n_store") * 100 / F.count(F.lit(1)) + F.lit(0.5))
                / 100
            ).alias("avg_store"),
        )
    )


@_ds_q(
    "tpcds_q67",
    _with(
        f"""
    SELECT * FROM (
      SELECT i_category, i_class, i_brand, s_store_name,
             {_ems_sql('ss_net_paid')} AS sumsales,
             rank() OVER (PARTITION BY i_category
                          ORDER BY {_ems_sql('ss_net_paid')} DESC) AS rk
      FROM store_sales
      JOIN date_dim ON ss_sold_date = d_date
      JOIN item ON ss_item_sk = i_item_sk
      JOIN store ON ss_store_sk = s_store_sk
      WHERE d_year = 1997
      GROUP BY ROLLUP(i_category, i_class, i_brand, s_store_name)
    ) WHERE rk <= 3
    """,
        "store_sales", "date_dim", "item", "store",
    ),
)
def q_tpcds_q67(ds: _DS) -> DataFrame:
    """TPC-DS Q67 (query67.sql): the big rollup + windowed-rank grid
    — store sales rolled up over the full category/class/brand/store
    hierarchy, then rank() within each i_category partition (NULL
    partitions from the rollup rank among themselves, the original's
    semantics) keeping the top 3 per partition. rank() over the
    exact-cent sums ties identically on both engines. One
    expand-shuffle for the rollup, one window shuffle on i_category.
    The date_dim join reads no d_* column and every ss_sold_date is
    in date_dim by construction (d_date unique), so it is replaced by
    the equivalent year() predicate pushed into the orders scan — the
    date_dim derivation (2 scans + a distinct) drops out of the plan
    (the oracle keeps the textbook dim join)."""
    grid = (
        ds.store_sales.where(_year_range(_C("ss_sold_date"), 1997))
        .join(F.broadcast(ds.item), _C("ss_item_sk") == _C("i_item_sk"))
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .rollup("i_category", "i_class", "i_brand", "s_store_name")
        .agg(_exact_money_sum(_C("ss_net_paid")).alias("sumsales"))
    )
    w = Window.partitionBy("i_category").orderBy(_C("sumsales").desc())
    return (
        grid.withColumn("rk", F.rank().over(w).cast("bigint"))
        .where(_C("rk") <= 3)
        .select("i_category", "i_class", "i_brand", "s_store_name",
                "sumsales", "rk")
    )


@_ds_q(
    "tpcds_q97",
    _with(
        """
    SELECT CAST(sum(CASE WHEN s_ck IS NOT NULL AND c_ck IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
           CAST(sum(CASE WHEN s_ck IS NULL AND c_ck IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
           CAST(sum(CASE WHEN s_ck IS NOT NULL AND c_ck IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
    FROM (
      SELECT ssci.customer_sk AS s_ck, csci.customer_sk AS c_ck
      FROM (SELECT DISTINCT ss_customer_sk AS customer_sk,
                            ss_item_sk AS item_sk
            FROM store_sales JOIN date_dim ON ss_sold_date = d_date
            WHERE d_year = 1997) ssci
      FULL OUTER JOIN
           (SELECT DISTINCT cs_customer_sk AS customer_sk,
                            cs_item_sk AS item_sk
            FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
            WHERE d_year = 1997) csci
      ON ssci.customer_sk = csci.customer_sk
         AND ssci.item_sk = csci.item_sk
    )
    """,
        "store_sales", "catalog_sales", "date_dim",
    ),
)
def q_tpcds_q97(ds: _DS) -> DataFrame:
    """TPC-DS Q97 (query97.sql): cross-channel (customer, item)
    overlap — store-only / catalog-only / both counts. The oracle
    keeps the textbook two-distinct + FULL OUTER JOIN; the Spark plan
    exploits what the optimizer cannot see (the q87 fusion): the two
    channel facts partition ONE lineitem scan by l_linenumber % 3,
    every fact sold_date is an o_orderdate (the date_dim equi-join is
    exactly a year filter pushed into the orders scan), and keys are
    never NULL — so the overlap falls out of one lineitem⋈orders pass
    grouped by (customer, item) with per-channel presence flags:
    1 fact scan + 1 pair-key shuffle instead of 2 fact⋈dim joins +
    2 distinct shuffles + a full-outer shuffle."""
    l, o = ds.t.lineitem, ds.t.orders
    flags = (
        l.where(_C("l_linenumber") % 3 <= 1)
        .select(
            "l_orderkey", "l_partkey", (_C("l_linenumber") % 3).alias("__ch")
        )
        .join(
            o.where(_year_range(_C("o_orderdate").cast("date"), 1997)).select(
                "o_orderkey", "o_custkey"
            ),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .groupBy("o_custkey", "l_partkey")
        .agg(
            F.max(_C("__ch") == 0).alias("__s"),
            F.max(_C("__ch") == 1).alias("__c"),
        )
    )
    return flags.agg(
        F.sum(F.when(_C("__s") & ~_C("__c"), 1).otherwise(0)).alias(
            "store_only"
        ),
        F.sum(F.when(~_C("__s") & _C("__c"), 1).otherwise(0)).alias(
            "catalog_only"
        ),
        F.sum(F.when(_C("__s") & _C("__c"), 1).otherwise(0)).alias(
            "store_and_catalog"
        ),
    )


@_ds_q(
    "tpcds_q5",
    _with(
        f"""
    SELECT channel,
           CAST(grouping(channel) AS BIGINT) AS g,
           {_ems_sql('sales')} AS sales,
           {_ems_sql('ret')} AS returns_amt,
           {_ems_sql('profit')} AS profit
    FROM (
      SELECT 'store' AS channel, ss_sold_date AS d,
             ss_net_paid AS sales, CAST(NULL AS DOUBLE) AS ret,
             ss_net_profit AS profit
      FROM store_sales
      UNION ALL
      SELECT 'store', sr_returned_date, CAST(NULL AS DOUBLE),
             sr_return_amt, CAST(NULL AS DOUBLE)
      FROM store_returns
      UNION ALL
      SELECT 'catalog', cs_sold_date, cs_net_paid, CAST(NULL AS DOUBLE),
             cs_net_profit
      FROM catalog_sales
      UNION ALL
      SELECT 'catalog', cr_returned_date, CAST(NULL AS DOUBLE),
             cr_return_amt, CAST(NULL AS DOUBLE)
      FROM catalog_returns
      UNION ALL
      SELECT 'web', ws_sold_date, ws_net_paid, CAST(NULL AS DOUBLE),
             ws_net_profit
      FROM web_sales
      UNION ALL
      SELECT 'web', wr_returned_date, CAST(NULL AS DOUBLE),
             wr_return_amt, CAST(NULL AS DOUBLE)
      FROM web_returns
    ) x JOIN date_dim ON d = d_date
    WHERE d_year = 1997 AND d_moy <= 6
    GROUP BY ROLLUP(channel)
    """,
        "store_sales", "store_returns", "catalog_sales", "catalog_returns",
        "web_sales", "web_returns", "date_dim",
    ),
)
def q_tpcds_q5(ds: _DS) -> DataFrame:
    """TPC-DS Q5 (query5.sql): the channel profit-and-loss report —
    sales and returns of all three channels UNION ALLed into one
    tagged relation, date-filtered, rolled up by channel with a
    grand-total row. One union scan pass, dims broadcast, a single
    Expand+agg shuffle; NULL slots keep each measure exact under the
    cent-sum (sum skips NULLs identically on both engines)."""
    def sales_leg(fact, p, tag):
        return fact.select(
            F.lit(tag).alias("channel"),
            _C(p + "sold_date").alias("d"),
            _C(p + "net_paid").alias("sales"),
            F.lit(None).cast("double").alias("ret"),
            _C(p + "net_profit").alias("profit"),
        )

    def ret_leg(fact, p, tag):
        return fact.select(
            F.lit(tag).alias("channel"),
            _C(p + "returned_date").alias("d"),
            F.lit(None).cast("double").alias("sales"),
            _C(p + "return_amt").alias("ret"),
            F.lit(None).cast("double").alias("profit"),
        )

    x = (
        sales_leg(ds.store_sales, "ss_", "store")
        .unionAll(ret_leg(ds.store_returns_slim, "sr_", "store"))
        .unionAll(sales_leg(ds.catalog_sales, "cs_", "catalog"))
        .unionAll(ret_leg(ds.catalog_returns_slim, "cr_", "catalog"))
        .unionAll(sales_leg(ds.web_sales, "ws_", "web"))
        .unionAll(ret_leg(ds.web_returns_slim, "wr_", "web"))
    )
    dd = ds.date_dim.where((_C("d_year") == 1997) & (_C("d_moy") <= 6))
    return (
        x.join(F.broadcast(dd), _C("d") == _C("d_date"))
        .rollup("channel")
        .agg(
            F.grouping("channel").cast("bigint").alias("g"),
            _exact_money_sum(_C("sales")).alias("sales"),
            _exact_money_sum(_C("ret")).alias("returns_amt"),
            _exact_money_sum(_C("profit")).alias("profit"),
        )
        .select("channel", "g", "sales", "returns_amt", "profit")
    )


@_ds_q(
    "tpcds_q9",
    _with(
        f"""
    SELECT
      CASE WHEN (SELECT count(*) FROM store_sales
                 WHERE ss_quantity BETWEEN 1 AND 10) > 50
           THEN (SELECT {_ems_sql('ss_ext_list_price')} FROM store_sales
                 WHERE ss_quantity BETWEEN 1 AND 10)
           ELSE (SELECT {_ems_sql('ss_net_paid')} FROM store_sales
                 WHERE ss_quantity BETWEEN 1 AND 10) END AS bucket1,
      CASE WHEN (SELECT count(*) FROM store_sales
                 WHERE ss_quantity BETWEEN 11 AND 20) > 50
           THEN (SELECT {_ems_sql('ss_ext_list_price')} FROM store_sales
                 WHERE ss_quantity BETWEEN 11 AND 20)
           ELSE (SELECT {_ems_sql('ss_net_paid')} FROM store_sales
                 WHERE ss_quantity BETWEEN 11 AND 20) END AS bucket2,
      CASE WHEN (SELECT count(*) FROM store_sales
                 WHERE ss_quantity BETWEEN 21 AND 30) > 50
           THEN (SELECT {_ems_sql('ss_ext_list_price')} FROM store_sales
                 WHERE ss_quantity BETWEEN 21 AND 30)
           ELSE (SELECT {_ems_sql('ss_net_paid')} FROM store_sales
                 WHERE ss_quantity BETWEEN 21 AND 30) END AS bucket3
    """,
        "store_sales",
    ),
)
def q_tpcds_q9(ds: _DS) -> DataFrame:
    """TPC-DS Q9 (query9.sql): the scalar-subquery CASE grid — per
    quantity bucket, pick one of two exact-cent sums depending on the
    bucket's row count. The oracle spells out six scalar subqueries;
    the Spark plan computes ALL bucket aggregates in ONE conditional
    pass over store_sales (the q88 single-scan trade) and assembles
    the CASEs from that single row."""
    ss = ds.store_sales

    def b(lo, hi):
        return _C("ss_quantity").between(lo, hi)

    aggs = []
    for i, (lo, hi) in enumerate([(1, 10), (11, 20), (21, 30)], 1):
        aggs += [
            F.count(F.when(b(lo, hi), 1)).alias(f"__n{i}"),
            (
                F.floor(
                    F.sum(F.when(b(lo, hi), _cents(_C("ss_ext_list_price"))))
                    / 100
                    + F.lit(0.5)
                )
                / 100
            ).alias(f"__lp{i}"),
            (
                F.floor(
                    F.sum(F.when(b(lo, hi), _cents(_C("ss_net_paid")))) / 100
                    + F.lit(0.5)
                )
                / 100
            ).alias(f"__np{i}"),
        ]
    one = ss.agg(*aggs)
    return one.select(
        *[
            F.when(_C(f"__n{i}") > 50, _C(f"__lp{i}"))
            .otherwise(_C(f"__np{i}"))
            .alias(f"bucket{i}")
            for i in (1, 2, 3)
        ]
    )


@_ds_q(
    "tpcds_q13",
    _with(
        f"""
    SELECT {_exact_avg_sql('ss_quantity', 100)} AS avg_qty,
           {_ems_sql('ss_net_paid')} AS sum_paid,
           CAST(count(*) AS BIGINT) AS cnt
    FROM store_sales
    JOIN customer_dim ON ss_customer_sk = c_customer_sk
    JOIN date_dim ON ss_sold_date = d_date
    WHERE d_year = 1997
      AND ((c_segment = 'BUILDING' AND c_preferred_flag = 'Y'
            AND ss_quantity BETWEEN 1 AND 20)
        OR (c_segment = 'AUTOMOBILE' AND c_preferred_flag = 'N'
            AND ss_quantity BETWEEN 21 AND 40)
        OR (c_segment = 'MACHINERY' AND ss_quantity BETWEEN 41 AND 50))
    """,
        "store_sales", "customer_dim", "date_dim",
    ),
)
def q_tpcds_q13(ds: _DS) -> DataFrame:
    """TPC-DS Q13 (query13.sql): the disjunctive-predicate grid — a
    three-arm OR over (segment, preference, quantity band) pairs
    demographic attributes with fact measures. The OR stays ONE join
    + filter (no union-of-three-scans): customer_dim broadcasts, the
    predicate evaluates post-join in codegen, one global agg."""
    return (
        ds.store_sales.join(
            F.broadcast(ds.customer_dim),
            _C("ss_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ss_sold_date") == _C("d_date"),
        )
        .where(
            (
                (_C("c_segment") == "BUILDING")
                & (_C("c_preferred_flag") == "Y")
                & _C("ss_quantity").between(1, 20)
            )
            | (
                (_C("c_segment") == "AUTOMOBILE")
                & (_C("c_preferred_flag") == "N")
                & _C("ss_quantity").between(21, 40)
            )
            | (
                (_C("c_segment") == "MACHINERY")
                & _C("ss_quantity").between(41, 50)
            )
        )
        .agg(
            _exact_avg(_C("ss_quantity"), 100).alias("avg_qty"),
            _exact_money_sum(_C("ss_net_paid")).alias("sum_paid"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@_ds_q(
    "tpcds_q28",
    _with(
        """
    SELECT b1.cnt AS cnt1, b1.avg_lp AS avg1, b1.nd AS nd1,
           b2.cnt AS cnt2, b2.avg_lp AS avg2, b2.nd AS nd2,
           b3.cnt AS cnt3, b3.avg_lp AS avg3, b3.nd AS nd3
    FROM
      (SELECT CAST(count(*) AS BIGINT) AS cnt,
              floor(sum(CAST(round(ss_ext_list_price * 10000, 0) AS BIGINT))
                    / count(*) / 100.0 + 0.5) / 100 AS avg_lp,
              CAST(count(DISTINCT ss_ext_list_price) AS BIGINT) AS nd
       FROM store_sales WHERE ss_quantity BETWEEN 1 AND 15) b1,
      (SELECT CAST(count(*) AS BIGINT) AS cnt,
              floor(sum(CAST(round(ss_ext_list_price * 10000, 0) AS BIGINT))
                    / count(*) / 100.0 + 0.5) / 100 AS avg_lp,
              CAST(count(DISTINCT ss_ext_list_price) AS BIGINT) AS nd
       FROM store_sales WHERE ss_quantity BETWEEN 16 AND 30) b2,
      (SELECT CAST(count(*) AS BIGINT) AS cnt,
              floor(sum(CAST(round(ss_ext_list_price * 10000, 0) AS BIGINT))
                    / count(*) / 100.0 + 0.5) / 100 AS avg_lp,
              CAST(count(DISTINCT ss_ext_list_price) AS BIGINT) AS nd
       FROM store_sales WHERE ss_quantity BETWEEN 31 AND 50) b3
    """,
        "store_sales",
    ),
)
def q_tpcds_q28(ds: _DS) -> DataFrame:
    """TPC-DS Q28 (query28.sql): the bucket-statistics grid —
    count / exact average / count-distinct of list price for three
    quantity bands, cross-joined into one row. The oracle's three
    scans collapse to ONE pass with conditional aggregates (the
    count(DISTINCT CASE ...) form rides Spark's expand-based distinct
    aggregation — still a single scan of the fact)."""
    ss = ds.store_sales
    aggs = []
    for i, (lo, hi) in enumerate([(1, 15), (16, 30), (31, 50)], 1):
        inb = _C("ss_quantity").between(lo, hi)
        cents = F.when(inb, _cents(_C("ss_ext_list_price")))
        aggs += [
            F.count(F.when(inb, 1)).alias(f"cnt{i}"),
            (
                F.floor(
                    F.sum(cents) / F.count(F.when(inb, 1)) / 100.0 + F.lit(0.5)
                )
                / 100
            ).alias(f"avg{i}"),
            F.countDistinct(F.when(inb, _C("ss_ext_list_price"))).alias(
                f"nd{i}"
            ),
        ]
    return ss.agg(*aggs).select(
        "cnt1", "avg1", "nd1", "cnt2", "avg2", "nd2", "cnt3", "avg3", "nd3"
    )


@_ds_q(
    "tpcds_q78",
    _with(
        """
    SELECT item_sk, q1, q2,
           round(CAST(q2 AS DOUBLE) / CAST(q1 AS DOUBLE), 4) AS growth
    FROM (
      SELECT a.ss_item_sk AS item_sk,
             CAST(sum(CASE WHEN d_year = 1997 THEN ss_q END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN d_year = 1998 THEN ss_q END) AS BIGINT) AS q2
      FROM (
        SELECT ss_item_sk, ss_sold_date,
               CAST(ss_quantity AS BIGINT) AS ss_q
        FROM store_sales
        LEFT JOIN store_returns
          ON ss_ticket_number = sr_ticket_number
         AND ss_item_sk = sr_item_sk
        WHERE sr_ticket_number IS NULL
      ) a JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year IN (1997, 1998)
      GROUP BY a.ss_item_sk
    )
    WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q1 > 0
    """,
        "store_sales", "store_returns", "date_dim",
    ),
)
def q_tpcds_q78(ds: _DS) -> DataFrame:
    """TPC-DS Q78 (query78.sql shape): year-over-year item quantity
    growth counting ONLY unreturned sales — the returns-exclusion is
    a LEFT JOIN + null-check (planned as one co-partitioned join on
    (ticket, item)), then a single conditional-sum pass replaces the
    original's per-year CTE self-join. Output: items sold both years
    with their growth ratio (exact integer quantities; the ratio is
    one IEEE division of identical operands)."""
    unret = (
        ds.store_sales.join(
            ds.store_returns_slim.select(
                _C("sr_ticket_number").alias("__rt"),
                _C("sr_item_sk").alias("__ri"),
            ),
            (_C("ss_ticket_number") == _C("__rt"))
            & (_C("ss_item_sk") == _C("__ri")),
            "left_anti",
        )
    )
    wide = (
        unret.join(
            F.broadcast(ds.date_dim.where(_C("d_year").isin(1997, 1998))),
            _C("ss_sold_date") == _C("d_date"),
        )
        .groupBy(_C("ss_item_sk").alias("item_sk"))
        .agg(
            F.sum(
                F.when(_C("d_year") == 1997, _C("ss_quantity").cast("bigint"))
            ).alias("q1"),
            F.sum(
                F.when(_C("d_year") == 1998, _C("ss_quantity").cast("bigint"))
            ).alias("q2"),
        )
    )
    return (
        wide.where(
            _C("q1").isNotNull() & _C("q2").isNotNull() & (_C("q1") > 0)
        )
        .select(
            "item_sk", "q1", "q2",
            F.round(_C("q2").cast("double") / _C("q1").cast("double"), 4).alias(
                "growth"
            ),
        )
    )


@_ds_q(
    "tpcds_q92",
    _with(
        """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           floor(sum(CAST(round(ws_ext_discount_amt * 10000, 0) AS BIGINT))
                 / 100 + 0.5) / 100 AS excess_discount
    FROM web_sales ws
    JOIN date_dim ON ws_sold_date = d_date
    WHERE d_year = 1997
      AND CAST(round(ws_ext_discount_amt * 10000, 0) AS BIGINT) > 1.3 * (
        SELECT sum(CAST(round(w2.ws_ext_discount_amt * 10000, 0) AS BIGINT))
               * 1.0 / count(*)
        FROM web_sales w2
        JOIN date_dim d2 ON w2.ws_sold_date = d2.d_date
        WHERE d2.d_year = 1997 AND w2.ws_item_sk = ws.ws_item_sk)
    """,
        "web_sales", "date_dim",
    ),
)
def q_tpcds_q92(ds: _DS) -> DataFrame:
    """TPC-DS Q92 (query92.sql): excess web discount — rows whose
    discount exceeds 1.3x their ITEM's average discount for the year.
    The correlated scalar average decorrelates to one per-item
    aggregate joined back (both engines plan exactly this). The
    threshold compares exact-cent integers through identical double
    arithmetic (sum_cents/count * 1.3), so the boundary cannot flip
    between engines."""
    dd = ds.date_dim.where(_C("d_year") == 1997)
    ws = ds.web_sales.join(
        F.broadcast(dd), _C("ws_sold_date") == _C("d_date")
    ).select(
        "ws_item_sk",
        _cents(_C("ws_ext_discount_amt")).alias("__dc"),
    )
    per_item = ws.groupBy(_C("ws_item_sk").alias("__ik")).agg(
        (F.sum("__dc") * 1.0 / F.count(F.lit(1))).alias("__avg_dc")
    )
    return (
        ws.join(per_item, _C("ws_item_sk") == _C("__ik"))
        .where(_C("__dc") > 1.3 * _C("__avg_dc"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.floor(F.sum("__dc") / 100 + F.lit(0.5)) / 100).alias(
                "excess_discount"
            ),
        )
    )


@_ds_q(
    "tpcds_q34",
    _with(
        """
    SELECT c_customer_id, ticket, cnt
    FROM (
      SELECT ss_customer_sk AS cust, ss_ticket_number AS ticket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997
      GROUP BY ss_customer_sk, ss_ticket_number
      HAVING count(*) BETWEEN 2 AND 3
    ) b JOIN customer_dim ON c_customer_sk = cust
    """,
        "store_sales", "date_dim", "customer_dim",
    ),
)
def q_tpcds_q34(ds: _DS) -> DataFrame:
    """TPC-DS Q34 (query34.sql shape): basket analysis — tickets with
    an item count inside a band, joined back to the customer. One
    shuffle on (customer, ticket) for the HAVING aggregate; the
    customer dim joins broadcast AFTER the aggregate (tickets-in-band
    is far smaller than the fact)."""
    baskets = (
        ds.store_sales.join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ss_sold_date") == _C("d_date"),
        )
        .groupBy(
            _C("ss_customer_sk").alias("cust"),
            _C("ss_ticket_number").alias("ticket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(_C("cnt").between(2, 3))
    )
    return baskets.join(
        F.broadcast(ds.customer_dim), _C("c_customer_sk") == _C("cust")
    ).select("c_customer_id", "ticket", "cnt")


@_ds_q(
    "tpcds_q46",
    _with(
        f"""
    SELECT cust, ticket, {_ems_sql('ss_net_paid')} AS amt
    FROM (
      SELECT ss_customer_sk AS cust, ss_ticket_number AS ticket,
             ss_net_paid
      FROM store_sales
      JOIN date_dim ON ss_sold_date = d_date
      JOIN store ON ss_store_sk = s_store_sk
      JOIN customer_dim ON ss_customer_sk = c_customer_sk
      JOIN customer_address ON ca_address_sk = c_current_addr_sk
      WHERE d_year = 1997 AND ca_state <> s_state
    ) GROUP BY cust, ticket
    """,
        "store_sales", "date_dim", "store", "customer_dim",
        "customer_address",
    ),
)
def q_tpcds_q46(ds: _DS) -> DataFrame:
    """TPC-DS Q46 (query46.sql shape): out-of-state baskets — sales
    where the customer's address state differs from the store's,
    summed per ticket. Four broadcast dims feed one codegen'd filter;
    the only shuffle is the (customer, ticket) aggregate."""
    return (
        ds.store_sales.join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ss_sold_date") == _C("d_date"),
        )
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .join(
            F.broadcast(ds.customer_dim),
            _C("ss_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("ca_address_sk") == _C("c_current_addr_sk"),
        )
        .where(_C("ca_state") != _C("s_state"))
        .groupBy(
            _C("ss_customer_sk").alias("cust"),
            _C("ss_ticket_number").alias("ticket"),
        )
        .agg(_exact_money_sum(_C("ss_net_paid")).alias("amt"))
    )


@_ds_q(
    "tpcds_q61",
    _with(
        """
    SELECT promo_cents, total_cents,
           round(CAST(promo_cents AS DOUBLE)
                 / CAST(total_cents AS DOUBLE) * 100, 4) AS promo_pct
    FROM (
      SELECT CAST(sum(CASE WHEN i_manufact_id < 5
                      THEN CAST(round(ss_net_paid * 10000, 0) AS BIGINT)
                      END) AS BIGINT) AS promo_cents,
             CAST(sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT))
                  AS BIGINT) AS total_cents
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997
    )
    """,
        "store_sales", "item", "date_dim",
    ),
)
def q_tpcds_q61(ds: _DS) -> DataFrame:
    """TPC-DS Q61 (query61.sql shape): promotional revenue share —
    the original's two scalar-subquery scans (promo sales, all sales)
    collapse to ONE conditional-aggregate pass; the percentage is one
    IEEE division of identical exact-cent operands."""
    return (
        ds.store_sales.join(
            F.broadcast(ds.item), _C("ss_item_sk") == _C("i_item_sk")
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ss_sold_date") == _C("d_date"),
        )
        .agg(
            F.sum(
                F.when(_C("i_manufact_id") < 5, _cents(_C("ss_net_paid")))
            ).alias("promo_cents"),
            F.sum(_cents(_C("ss_net_paid"))).alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.round(
                _C("promo_cents").cast("double")
                / _C("total_cents").cast("double")
                * 100,
                4,
            ).alias("promo_pct"),
        )
    )


@_ds_q(
    "tpcds_q62",
    _with(
        """
    SELECT cs_warehouse_sk AS warehouse_sk,
           CAST(sum(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS d30,
           CAST(sum(CASE WHEN lag > 30 AND lag <= 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS d60,
           CAST(sum(CASE WHEN lag > 60 AND lag <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS d90,
           CAST(sum(CASE WHEN lag > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS d_more
    FROM (
      SELECT cs_warehouse_sk,
             date_diff('day', cs_sold_date, cs_ship_date) AS lag
      FROM catalog_sales
      JOIN date_dim ON cs_sold_date = d_date
      WHERE d_year = 1997
    )
    GROUP BY cs_warehouse_sk
    """,
        "catalog_sales", "date_dim",
    ),
)
def q_tpcds_q62(ds: _DS) -> DataFrame:
    """TPC-DS Q62 (query62.sql): shipping-latency bucket matrix —
    days between order and ship bucketed into 30-day bands, counted
    per warehouse. Pure date arithmetic in codegen (datediff is
    integer-exact on both engines), one shuffle on warehouse_sk."""
    lag = F.datediff(_C("cs_ship_date"), _C("cs_sold_date"))
    return (
        ds.catalog_sales.join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("cs_sold_date") == _C("d_date"),
        )
        .select(_C("cs_warehouse_sk").alias("warehouse_sk"), lag.alias("lag"))
        .groupBy("warehouse_sk")
        .agg(
            F.sum(F.when(_C("lag") <= 30, 1).otherwise(0)).alias("d30"),
            F.sum(
                F.when((_C("lag") > 30) & (_C("lag") <= 60), 1).otherwise(0)
            ).alias("d60"),
            F.sum(
                F.when((_C("lag") > 60) & (_C("lag") <= 90), 1).otherwise(0)
            ).alias("d90"),
            F.sum(F.when(_C("lag") > 90, 1).otherwise(0)).alias("d_more"),
        )
    )


@_ds_q(
    "tpcds_q58",
    _with(
        """
    SELECT item_sk,
           floor(ss_c / 100.0 + 0.5) / 100 AS ss_rev,
           floor(cs_c / 100.0 + 0.5) / 100 AS cs_rev,
           floor(ws_c / 100.0 + 0.5) / 100 AS ws_rev
    FROM (
      SELECT item_sk,
             CAST(sum(CASE WHEN ch = 's' THEN cents END) AS BIGINT) AS ss_c,
             CAST(sum(CASE WHEN ch = 'c' THEN cents END) AS BIGINT) AS cs_c,
             CAST(sum(CASE WHEN ch = 'w' THEN cents END) AS BIGINT) AS ws_c
      FROM (
        SELECT ss_item_sk AS item_sk, ss_sold_date AS d, 's' AS ch,
               CAST(round(ss_net_paid * 10000, 0) AS BIGINT) AS cents
        FROM store_sales
        UNION ALL
        SELECT cs_item_sk, cs_sold_date, 'c',
               CAST(round(cs_net_paid * 10000, 0) AS BIGINT)
        FROM catalog_sales
        UNION ALL
        SELECT ws_item_sk, ws_sold_date, 'w',
               CAST(round(ws_net_paid * 10000, 0) AS BIGINT)
        FROM web_sales
      ) u JOIN date_dim ON d = d_date
      WHERE d_year = 1997
      GROUP BY item_sk
    )
    WHERE ss_c IS NOT NULL AND cs_c IS NOT NULL AND ws_c IS NOT NULL
      AND CAST(ss_c AS DOUBLE)
            BETWEEN 0.5 * (ss_c + cs_c + ws_c) / 3.0
                AND 1.5 * (ss_c + cs_c + ws_c) / 3.0
      AND CAST(cs_c AS DOUBLE)
            BETWEEN 0.5 * (ss_c + cs_c + ws_c) / 3.0
                AND 1.5 * (ss_c + cs_c + ws_c) / 3.0
      AND CAST(ws_c AS DOUBLE)
            BETWEEN 0.5 * (ss_c + cs_c + ws_c) / 3.0
                AND 1.5 * (ss_c + cs_c + ws_c) / 3.0
    """,
        "store_sales", "catalog_sales", "web_sales", "date_dim",
    ),
)
def q_tpcds_q58(ds: _DS) -> DataFrame:
    """TPC-DS Q58 (query58.sql): items whose revenue is BALANCED
    across all three channels (each within 50-150% of the three-way
    average). The original's three CTE scans + 3-way join collapse to
    one tagged union + one conditional-sum pass per item; the
    tolerance band compares exact-cent integers through identical
    double arithmetic. One shuffle on item_sk."""
    def leg(fact, p, tag):
        return fact.select(
            _C(p + "item_sk").alias("item_sk"),
            _C(p + "sold_date").alias("d"),
            F.lit(tag).alias("ch"),
            _cents(_C(p + "net_paid")).alias("cents"),
        )

    u = (
        leg(ds.store_sales, "ss_", "s")
        .unionAll(leg(ds.catalog_sales, "cs_", "c"))
        .unionAll(leg(ds.web_sales, "ws_", "w"))
    )
    wide = (
        u.join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("d") == _C("d_date"),
        )
        .groupBy("item_sk")
        .agg(
            F.sum(F.when(_C("ch") == "s", _C("cents"))).alias("ss_c"),
            F.sum(F.when(_C("ch") == "c", _C("cents"))).alias("cs_c"),
            F.sum(F.when(_C("ch") == "w", _C("cents"))).alias("ws_c"),
        )
    )
    avg3 = (_C("ss_c") + _C("cs_c") + _C("ws_c")) / 3.0

    def inband(c):
        return _C(c).cast("double").between(0.5 * avg3, 1.5 * avg3)

    return (
        wide.where(
            _C("ss_c").isNotNull()
            & _C("cs_c").isNotNull()
            & _C("ws_c").isNotNull()
            & inband("ss_c")
            & inband("cs_c")
            & inband("ws_c")
        )
        .select(
            "item_sk",
            (F.floor(_C("ss_c") / 100.0 + F.lit(0.5)) / 100).alias("ss_rev"),
            (F.floor(_C("cs_c") / 100.0 + F.lit(0.5)) / 100).alias("cs_rev"),
            (F.floor(_C("ws_c") / 100.0 + F.lit(0.5)) / 100).alias("ws_rev"),
        )
    )


@_ds_q(
    "tpcds_q66",
    _with(
        "SELECT warehouse_sk, "
        + ", ".join(
            f"floor(coalesce(m{m}, 0) / 100.0 + 0.5) / 100 AS m{m}_paid"
            for m in range(1, 13)
        )
        + """
    FROM (
      SELECT ws_warehouse_sk AS warehouse_sk,
    """
        + ", ".join(
            f"CAST(sum(CASE WHEN d_moy = {m} THEN "
            f"CAST(round(ws_net_paid * 10000, 0) AS BIGINT) END) AS BIGINT)"
            f" AS m{m}"
            for m in range(1, 13)
        )
        + """
      FROM web_sales JOIN date_dim ON ws_sold_date = d_date
      WHERE d_year = 1997
      GROUP BY ws_warehouse_sk
    )
    """,
        "web_sales", "date_dim",
    ),
)
def q_tpcds_q66(ds: _DS) -> DataFrame:
    """TPC-DS Q66 (query66.sql shape): the monthly pivot grid — web
    revenue per warehouse unrolled into 12 month columns in one
    conditional-aggregation pass (the original's 12 CASE sums),
    exact cents throughout. One shuffle on warehouse_sk."""
    aggs = [
        F.sum(
            F.when(_C("d_moy") == m, _cents(_C("ws_net_paid")))
        ).alias(f"__m{m}")
        for m in range(1, 13)
    ]
    wide = (
        ds.web_sales.join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ws_sold_date") == _C("d_date"),
        )
        .groupBy(_C("ws_warehouse_sk").alias("warehouse_sk"))
        .agg(*aggs)
    )
    return wide.select(
        "warehouse_sk",
        *[
            (
                F.floor(
                    F.coalesce(_C(f"__m{m}"), F.lit(0)) / 100.0 + F.lit(0.5)
                )
                / 100
            ).alias(f"m{m}_paid")
            for m in range(1, 13)
        ],
    )


@_ds_q(
    "tpcds_q69",
    _with(
        """
    SELECT c_segment, CAST(count(*) AS BIGINT) AS cnt
    FROM customer_dim c
    WHERE EXISTS (
        SELECT 1 FROM store_sales JOIN date_dim ON ss_sold_date = d_date
        WHERE ss_customer_sk = c.c_customer_sk AND d_year = 1997)
      AND NOT EXISTS (
        SELECT 1 FROM web_sales JOIN date_dim ON ws_sold_date = d_date
        WHERE ws_customer_sk = c.c_customer_sk AND d_year = 1997)
      AND NOT EXISTS (
        SELECT 1 FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
        WHERE cs_customer_sk = c.c_customer_sk AND d_year = 1997)
    GROUP BY c_segment
    """,
        "customer_dim", "store_sales", "web_sales", "catalog_sales",
        "date_dim",
    ),
)
def q_tpcds_q69(ds: _DS) -> DataFrame:
    """TPC-DS Q69 (query69.sql): store-ONLY shoppers — EXISTS(store)
    AND NOT EXISTS(web) AND NOT EXISTS(catalog), counted per segment.
    One semi-join + two anti-joins against per-channel distinct key
    sets (the NOT-EXISTS complement of q10's grid)."""
    dd = ds.date_dim.where(_C("d_year") == 1997)

    def keys(fact, p):
        return fact.join(
            F.broadcast(dd), _C(p + "sold_date") == _C("d_date")
        ).select(_C(p + "customer_sk").alias("k"))

    return (
        ds.customer_dim.join(
            keys(ds.store_sales, "ss_"),
            _C("c_customer_sk") == _C("k"),
            "left_semi",
        )
        .join(
            keys(ds.web_sales, "ws_"),
            _C("c_customer_sk") == _C("k"),
            "left_anti",
        )
        .join(
            keys(ds.catalog_sales, "cs_"),
            _C("c_customer_sk") == _C("k"),
            "left_anti",
        )
        .groupBy("c_segment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@_ds_q(
    "tpcds_q89",
    _with(
        """
    SELECT i_category, i_brand, d_moy,
           floor(m_c / 100.0 + 0.5) / 100 AS month_paid,
           round(avg_c / 10000.0, 4) AS avg_month_paid
    FROM (
      SELECT i_category, i_brand, d_moy,
             m_c,
             avg(CAST(m_c AS DOUBLE))
               OVER (PARTITION BY i_category, i_brand) AS avg_c
      FROM (
        SELECT i_category, i_brand, d_moy,
               CAST(sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT))
                    AS BIGINT) AS m_c
        FROM store_sales
        JOIN item ON ss_item_sk = i_item_sk
        JOIN date_dim ON ss_sold_date = d_date
        WHERE d_year = 1997 AND i_manufact_id < 15
        GROUP BY i_category, i_brand, d_moy
      )
    )
    WHERE avg_c > 0
      AND abs(CAST(m_c AS DOUBLE) - avg_c) / avg_c > 0.3
    """,
        "store_sales", "item", "date_dim",
    ),
)
def q_tpcds_q89(ds: _DS) -> DataFrame:
    """TPC-DS Q89 (query89.sql): monthly revenue vs the brand's
    yearly average — months deviating more than 30% from their
    (category, brand) mean. The window avg rides the monthly
    aggregate (tiny relation), deviation arithmetic is identical
    double ops over exact-cent sums. One agg shuffle + one window
    shuffle on (category, brand)."""
    monthly = (
        ds.store_sales.join(
            F.broadcast(ds.item.where(_C("i_manufact_id") < 15)),
            _C("ss_item_sk") == _C("i_item_sk"),
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ss_sold_date") == _C("d_date"),
        )
        .groupBy("i_category", "i_brand", "d_moy")
        .agg(F.sum(_cents(_C("ss_net_paid"))).alias("m_c"))
    )
    w = Window.partitionBy("i_category", "i_brand")
    return (
        monthly.withColumn("avg_c", F.avg(_C("m_c").cast("double")).over(w))
        .where(
            (_C("avg_c") > 0)
            & (
                F.abs(_C("m_c").cast("double") - _C("avg_c")) / _C("avg_c")
                > 0.3
            )
        )
        .select(
            "i_category", "i_brand", "d_moy",
            (F.floor(_C("m_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "month_paid"
            ),
            F.round(_C("avg_c") / 10000.0, 4).alias("avg_month_paid"),
        )
    )


@_ds_q(
    "tpcds_q43",
    _with(
        """
    SELECT s_store_name,
    """
        + ", ".join(
            f"floor(coalesce(sum(CASE WHEN dow = {d} THEN "
            f"CAST(round(ss_net_paid * 10000, 0) AS BIGINT) END), 0)"
            f" / 100.0 + 0.5) / 100 AS dow{d}_paid"
            for d in range(7)
        )
        + """
    FROM (
      SELECT s_store_name, ss_net_paid,
             date_diff('day', DATE '1995-01-01', ss_sold_date) % 7 AS dow
      FROM store_sales
      JOIN store ON ss_store_sk = s_store_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997
    )
    GROUP BY s_store_name
    """,
        "store_sales", "store", "date_dim",
    ),
)
def q_tpcds_q43(ds: _DS) -> DataFrame:
    """TPC-DS Q43 (query43.sql): the day-of-week revenue matrix per
    store — 7 conditional exact-cent sums in one pass. Day-of-week is
    days-since-a-known-Sunday mod 7 (identical integer arithmetic on
    both engines; the engines' native dayofweek() disagree on
    numbering, so neither is used)."""
    dow = F.datediff(_C("ss_sold_date"), F.lit("1995-01-01").cast("date")) % 7
    aggs = [
        (
            F.floor(
                F.coalesce(
                    F.sum(F.when(_C("dow") == d, _cents(_C("ss_net_paid")))),
                    F.lit(0),
                )
                / 100.0
                + F.lit(0.5)
            )
            / 100
        ).alias(f"dow{d}_paid")
        for d in range(7)
    ]
    return (
        ds.store_sales.join(
            F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk")
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ss_sold_date") == _C("d_date"),
        )
        .withColumn("dow", dow)
        .groupBy("s_store_name")
        .agg(*aggs)
    )


@_ds_q(
    "tpcds_q44",
    _with(
        """
    SELECT CAST(best_rk AS BIGINT) AS rk, 'best' AS side,
           i_item_desc
    FROM ranked JOIN item ON i_item_sk = item_sk
    WHERE best_rk <= 10
    UNION ALL
    SELECT CAST(worst_rk AS BIGINT), 'worst', i_item_desc
    FROM ranked JOIN item ON i_item_sk = item_sk
    WHERE worst_rk <= 10
    """,
        "store_sales", "date_dim", "item",
        extra="""
    perf AS (
      SELECT ss_item_sk AS item_sk,
             CAST(sum(CAST(round(ss_net_profit * 10000, 0) AS BIGINT))
                  AS BIGINT) AS profit_c
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997
      GROUP BY ss_item_sk
    ), ranked AS (
      SELECT item_sk,
             rank() OVER (ORDER BY profit_c DESC, item_sk) AS best_rk,
             rank() OVER (ORDER BY profit_c ASC, item_sk) AS worst_rk
      FROM perf
    )""",
    ),
)
def q_tpcds_q44(ds: _DS) -> DataFrame:
    """TPC-DS Q44 (query44.sql): best AND worst performing items —
    one profit aggregate per item, TWO opposite-direction ranks over
    it (deterministic: exact-cent profit + item tiebreak), top-10 of
    each unioned with the item dim joined broadcast at the end (20
    rows, not the fact)."""
    perf = (
        ds.store_sales.join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ss_sold_date") == _C("d_date"),
        )
        .groupBy(_C("ss_item_sk").alias("item_sk"))
        .agg(F.sum(_cents(_C("ss_net_profit"))).alias("profit_c"))
    )
    ranked = perf.select(
        "item_sk",
        F.rank()
        .over(Window.orderBy(_C("profit_c").desc(), _C("item_sk")))
        .alias("best_rk"),
        F.rank()
        .over(Window.orderBy(_C("profit_c").asc(), _C("item_sk")))
        .alias("worst_rk"),
    )
    item = F.broadcast(ds.item)
    best = (
        ranked.where(_C("best_rk") <= 10)
        .join(item, _C("i_item_sk") == _C("item_sk"))
        .select(
            _C("best_rk").cast("bigint").alias("rk"),
            F.lit("best").alias("side"),
            "i_item_desc",
        )
    )
    worst = (
        ranked.where(_C("worst_rk") <= 10)
        .join(item, _C("i_item_sk") == _C("item_sk"))
        .select(
            _C("worst_rk").cast("bigint").alias("rk"),
            F.lit("worst").alias("side"),
            "i_item_desc",
        )
    )
    return best.unionAll(worst)


@_ds_q(
    "tpcds_q45",
    _with(
        f"""
    SELECT ca_state, {_ems_sql('ws_net_paid')} AS amt
    FROM web_sales
    JOIN date_dim ON ws_sold_date = d_date
    JOIN customer_dim ON ws_customer_sk = c_customer_sk
    JOIN customer_address ON ca_address_sk = c_current_addr_sk
    WHERE d_year = 1997
      AND (ca_state IN ('FRANCE', 'GERMANY', 'CHINA')
           OR ws_item_sk IN (SELECT i_item_sk FROM item
                             WHERE i_manufact_id = 7))
    GROUP BY ca_state
    """,
        "web_sales", "date_dim", "customer_dim", "customer_address", "item",
    ),
)
def q_tpcds_q45(ds: _DS) -> DataFrame:
    """TPC-DS Q45 (query45.sql): revenue by state where the row
    qualifies EITHER by geography OR by an IN-subquery over items.
    An OR mixing a local predicate with a semi-join cannot stay a
    semi-join — the marker-join pattern: broadcast-join a 1-column
    flag from the (tiny, filtered) item set, then one codegen'd OR
    filter. No union-of-two-scans, no correlated EXISTS."""
    special = (
        ds.item.where(_C("i_manufact_id") == 7)
        .select(_C("i_item_sk").alias("__sp_item"))
        .withColumn("__special", F.lit(1))
    )
    return (
        ds.web_sales.join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ws_sold_date") == _C("d_date"),
        )
        .join(
            F.broadcast(ds.customer_dim),
            _C("ws_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("ca_address_sk") == _C("c_current_addr_sk"),
        )
        .join(
            F.broadcast(special), _C("ws_item_sk") == _C("__sp_item"), "left"
        )
        .where(
            _C("ca_state").isin("FRANCE", "GERMANY", "CHINA")
            | _C("__special").isNotNull()
        )
        .groupBy("ca_state")
        .agg(_exact_money_sum(_C("ws_net_paid")).alias("amt"))
    )


@_ds_q(
    "tpcds_q50",
    _with(
        """
    SELECT s_store_name,
           CAST(sum(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS d30,
           CAST(sum(CASE WHEN lag > 30 AND lag <= 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS d60,
           CAST(sum(CASE WHEN lag > 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS d_more
    FROM (
      SELECT s_store_name,
             date_diff('day', ss_sold_date, sr_returned_date) AS lag
      FROM store_sales
      JOIN store_returns ON ss_ticket_number = sr_ticket_number
                        AND ss_item_sk = sr_item_sk
      JOIN store ON ss_store_sk = s_store_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997
    )
    GROUP BY s_store_name
    """,
        "store_sales", "store_returns", "store", "date_dim",
    ),
)
def q_tpcds_q50(ds: _DS) -> DataFrame:
    """TPC-DS Q50 (query50.sql): sale→return latency buckets per
    store — the sales-to-returns join rides the natural (ticket,
    item) key (both sides co-partition on it), then exact datediff
    bucketing in one agg pass."""
    return (
        ds.store_sales.join(
            ds.store_returns_slim,
            (_C("ss_ticket_number") == _C("sr_ticket_number"))
            & (_C("ss_item_sk") == _C("sr_item_sk")),
        )
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ss_sold_date") == _C("d_date"),
        )
        .withColumn(
            "lag", F.datediff(_C("sr_returned_date"), _C("ss_sold_date"))
        )
        .groupBy("s_store_name")
        .agg(
            F.sum(F.when(_C("lag") <= 30, 1).otherwise(0)).alias("d30"),
            F.sum(
                F.when((_C("lag") > 30) & (_C("lag") <= 60), 1).otherwise(0)
            ).alias("d60"),
            F.sum(F.when(_C("lag") > 60, 1).otherwise(0)).alias("d_more"),
        )
    )


@_ds_q(
    "tpcds_q54",
    _with(
        """
    SELECT segment, CAST(count(*) AS BIGINT) AS num_customers
    FROM (
      SELECT c, CAST(floor(rev_c / 5000000.0) AS BIGINT) AS segment
      FROM (
        SELECT ss_customer_sk AS c,
               CAST(sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM store_sales
        JOIN date_dim ON ss_sold_date = d_date
        WHERE d_year = 1997 AND d_qoy >= 3
          AND ss_customer_sk IN (
            SELECT cs_customer_sk
            FROM catalog_sales
            JOIN item ON cs_item_sk = i_item_sk
            JOIN date_dim d1 ON cs_sold_date = d1.d_date
            WHERE i_manufact_id = 3 AND d1.d_year = 1997 AND d1.d_qoy <= 2
            UNION
            SELECT ws_customer_sk
            FROM web_sales
            JOIN item ON ws_item_sk = i_item_sk
            JOIN date_dim d2 ON ws_sold_date = d2.d_date
            WHERE i_manufact_id = 3 AND d2.d_year = 1997 AND d2.d_qoy <= 2)
        GROUP BY ss_customer_sk
      )
    )
    GROUP BY segment
    """,
        "store_sales", "catalog_sales", "web_sales", "item", "date_dim",
    ),
)
def q_tpcds_q54(ds: _DS) -> DataFrame:
    """TPC-DS Q54 (query54.sql): the purchase-path cohort — customers
    who bought a target manufacturer's items through catalog OR web
    in H1, segmented by their H2 in-store revenue into $500 bands and
    counted per band. Cohort = semi-join against the unioned key
    sets; segmentation = integer floor of exact cents (band edges
    cannot flip between engines)."""
    dd1 = ds.date_dim.where((_C("d_year") == 1997) & (_C("d_qoy") <= 2))
    item3 = F.broadcast(ds.item.where(_C("i_manufact_id") == 3))
    cohort = (
        ds.catalog_sales.join(item3, _C("cs_item_sk") == _C("i_item_sk"))
        .join(F.broadcast(dd1), _C("cs_sold_date") == _C("d_date"))
        .select(_C("cs_customer_sk").alias("k"))
        .unionAll(
            ds.web_sales.join(item3, _C("ws_item_sk") == _C("i_item_sk"))
            .join(F.broadcast(dd1), _C("ws_sold_date") == _C("d_date"))
            .select(_C("ws_customer_sk").alias("k"))
        )
    )
    dd2 = ds.date_dim.where((_C("d_year") == 1997) & (_C("d_qoy") >= 3))
    return (
        ds.store_sales.join(
            F.broadcast(dd2), _C("ss_sold_date") == _C("d_date")
        )
        .join(cohort, _C("ss_customer_sk") == _C("k"), "left_semi")
        .groupBy(_C("ss_customer_sk").alias("c"))
        .agg(F.sum(_cents(_C("ss_net_paid"))).alias("rev_c"))
        .select(
            F.floor(_C("rev_c") / 5000000.0).cast("bigint").alias("segment")
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("num_customers"))
    )


@_ds_q(
    "tpcds_q98",
    _with(
        """
    SELECT i_item_sk, i_class,
           floor(rev_c / 100.0 + 0.5) / 100 AS itemrevenue,
           round(CAST(rev_c AS DOUBLE) * 100
                 / sum(CAST(rev_c AS DOUBLE)) OVER (PARTITION BY i_class),
                 4) AS revenueratio
    FROM (
      SELECT i_item_sk, i_class,
             CAST(sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997 AND d_moy <= 2 AND i_manufact_id < 10
      GROUP BY i_item_sk, i_class
    )
    """,
        "store_sales", "item", "date_dim",
    ),
)
def q_tpcds_q98(ds: _DS) -> DataFrame:
    """TPC-DS Q98 (query98.sql): item revenue share within its class
    — per-item exact-cent revenue, then a class-partition window sum
    for the ratio. The window rides the small aggregated relation;
    the ratio is identical double arithmetic over exact integers on
    both engines."""
    rev = (
        ds.store_sales.join(
            F.broadcast(
                ds.item.where(_C("i_manufact_id") < 10)
            ),
            _C("ss_item_sk") == _C("i_item_sk"),
        )
        .join(
            F.broadcast(
                ds.date_dim.where(
                    (_C("d_year") == 1997) & (_C("d_moy") <= 2)
                )
            ),
            _C("ss_sold_date") == _C("d_date"),
        )
        .groupBy("i_item_sk", "i_class")
        .agg(F.sum(_cents(_C("ss_net_paid"))).alias("rev_c"))
    )
    w = Window.partitionBy("i_class")
    return rev.select(
        "i_item_sk",
        "i_class",
        (F.floor(_C("rev_c") / 100.0 + F.lit(0.5)) / 100).alias("itemrevenue"),
        F.round(
            _C("rev_c").cast("double")
            * 100
            / F.sum(_C("rev_c").cast("double")).over(w),
            4,
        ).alias("revenueratio"),
    )


@_ds_q(
    "tpcds_q17",
    _with(
        """
    SELECT i_category,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(ss_q) * 100.0 / count(*) + 0.5) / 100 AS qty_avg,
           round(sqrt((count(*) * sum(ss_q2) - sum(ss_q) * sum(ss_q))
                      / (CAST(count(*) AS DOUBLE)
                         * (count(*) - 1))), 4) AS qty_stdev
    FROM (
      SELECT i_category,
             CAST(ss_quantity AS BIGINT) AS ss_q,
             CAST(ss_quantity AS BIGINT) * CAST(ss_quantity AS BIGINT)
               AS ss_q2
      FROM store_sales
      JOIN store_returns ON ss_ticket_number = sr_ticket_number
                        AND ss_item_sk = sr_item_sk
      JOIN catalog_sales ON sr_customer_sk = cs_customer_sk
                        AND sr_item_sk = cs_item_sk
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997
    )
    GROUP BY i_category
    HAVING count(*) > 1
    """,
        "store_sales", "store_returns", "catalog_sales", "item", "date_dim",
    ),
)
def q_tpcds_q17(ds: _DS) -> DataFrame:
    """TPC-DS Q17 (query17.sql): the three-fact chain — store sale →
    its return → the customer's catalog re-purchase of the same item
    — with quantity statistics per category. Stddev is computed from
    exact integer sums via the closed formula
    sqrt((n·Σx² − (Σx)²) / (n(n−1))) — native stddev() accumulates in
    engine-specific order and drifts in the last ulp; identical
    integer operands + identical double ops cannot. The fact-fact
    joins ride natural keys ((ticket, item) then (customer, item));
    dims broadcast."""
    chained = (
        # slim returns (customer key implied by the ticket: the cs
        # join probes ss_customer_sk instead of the orders-derived
        # sr_customer_sk) and the column-free date_dim join becomes
        # the pushed year range — one orders join + one dim
        # derivation fewer, identical rows
        ds.store_sales.where(_year_range(_C("ss_sold_date"), 1997))
        .join(
            ds.store_returns_slim,
            (_C("ss_ticket_number") == _C("sr_ticket_number"))
            & (_C("ss_item_sk") == _C("sr_item_sk")),
        )
        .join(
            ds.catalog_sales,
            (_C("ss_customer_sk") == _C("cs_customer_sk"))
            & (_C("sr_item_sk") == _C("cs_item_sk")),
        )
        .join(F.broadcast(ds.item), _C("ss_item_sk") == _C("i_item_sk"))
        .select(
            "i_category",
            _C("ss_quantity").cast("bigint").alias("ss_q"),
            (
                _C("ss_quantity").cast("bigint")
                * _C("ss_quantity").cast("bigint")
            ).alias("ss_q2"),
        )
    )
    n = F.count(F.lit(1))
    sq = F.sum("ss_q")
    sq2 = F.sum("ss_q2")
    return (
        chained.groupBy("i_category")
        .agg(
            n.alias("n"),
            (F.floor(sq * 100.0 / n + F.lit(0.5)) / 100).alias("qty_avg"),
            F.round(
                F.sqrt(
                    (n * sq2 - sq * sq)
                    / (n.cast("double") * (n - F.lit(1)))
                ),
                4,
            ).alias("qty_stdev"),
        )
        .where(_C("n") > 1)
    )


@_ds_q(
    "tpcds_q30",
    _with(
        """
    SELECT c, floor(amt_c / 100.0 + 0.5) / 100 AS return_amt
    FROM (
      SELECT c, st, amt_c,
             avg(CAST(amt_c AS DOUBLE)) OVER (PARTITION BY st) AS st_avg
      FROM (
        SELECT wr_customer_sk AS c, ca_state AS st,
               CAST(sum(CAST(round(wr_return_amt * 10000, 0) AS BIGINT))
                    AS BIGINT) AS amt_c
        FROM web_returns
        JOIN customer_dim ON wr_customer_sk = c_customer_sk
        JOIN customer_address ON ca_address_sk = c_current_addr_sk
        JOIN date_dim ON wr_returned_date = d_date
        WHERE d_year = 1997
        GROUP BY wr_customer_sk, ca_state
      )
    )
    WHERE CAST(amt_c AS DOUBLE) > 1.2 * st_avg
    """,
        "web_returns", "customer_dim", "customer_address", "date_dim",
    ),
)
def q_tpcds_q30(ds: _DS) -> DataFrame:
    """TPC-DS Q30 (query30.sql): heavy returners — customers whose
    yearly web-return total exceeds 1.2x their state's average. The
    original's correlated scalar average becomes a window avg over
    the per-customer aggregate (tiny relation); the threshold is
    identical double arithmetic over exact cents."""
    per_cust = (
        ds.web_returns.join(
            F.broadcast(ds.customer_dim),
            _C("wr_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("ca_address_sk") == _C("c_current_addr_sk"),
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("wr_returned_date") == _C("d_date"),
        )
        .groupBy(
            _C("wr_customer_sk").alias("c"), _C("ca_state").alias("st")
        )
        .agg(F.sum(_cents(_C("wr_return_amt"))).alias("amt_c"))
    )
    w = Window.partitionBy("st")
    return (
        per_cust.withColumn(
            "st_avg", F.avg(_C("amt_c").cast("double")).over(w)
        )
        .where(_C("amt_c").cast("double") > 1.2 * _C("st_avg"))
        .select(
            "c",
            (F.floor(_C("amt_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "return_amt"
            ),
        )
    )


@_ds_q(
    "tpcds_q38",
    _with(
        """
    SELECT CAST(count(*) AS BIGINT) AS hot_customers
    FROM (
      SELECT ss_customer_sk AS c, ss_sold_date AS d
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997
      INTERSECT
      SELECT cs_customer_sk, cs_sold_date
      FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
      WHERE d_year = 1997
      INTERSECT
      SELECT ws_customer_sk, ws_sold_date
      FROM web_sales JOIN date_dim ON ws_sold_date = d_date
      WHERE d_year = 1997
    )
    """,
        "store_sales", "catalog_sales", "web_sales", "date_dim",
    ),
)
def q_tpcds_q38(ds: _DS) -> DataFrame:
    """TPC-DS Q38 (query38.sql): tri-channel INTERSECT — (customer,
    day) pairs that appear in ALL three channels, counted. Spark's
    intersect plans as distinct + semi-joins on the pair key; the
    distincts collapse the facts before any join."""
    # the q87/q97 fusion: each channel's (customer, day) set is one
    # l_linenumber % 3 slice of the SAME lineitem⋈orders relation and
    # the date_dim join is a pushed year range — so the 3-way
    # INTERSECT is one pass grouped by (customer, day) with
    # per-channel presence flags (1 fact scan + 1 pair-key shuffle
    # instead of 3 fact⋈dim joins + 2 intersect shuffle-dedups); the
    # oracle keeps the textbook INTERSECT chain
    l, o = ds.t.lineitem, ds.t.orders
    ch = _C("l_linenumber") % 3
    flags = (
        l.select("l_orderkey", ch.alias("__ch"))
        .join(
            o.where(
                _year_range(_C("o_orderdate").cast("date"), 1997)
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max(_C("__ch") == 0).alias("__s"),
            F.max(_C("__ch") == 1).alias("__c"),
            F.max(_C("__ch") == 2).alias("__w"),
        )
        .where(_C("__s") & _C("__c") & _C("__w"))
    )
    return flags.agg(F.count(F.lit(1)).alias("hot_customers"))


@_ds_q(
    "tpcds_q40",
    _with(
        """
    SELECT cs_warehouse_sk AS warehouse_sk,
           floor(coalesce(sum(CASE WHEN before_pivot THEN net_c END), 0)
                 / 100.0 + 0.5) / 100 AS sales_before,
           floor(coalesce(sum(CASE WHEN NOT before_pivot THEN net_c END), 0)
                 / 100.0 + 0.5) / 100 AS sales_after
    FROM (
      SELECT cs_warehouse_sk,
             cs_sold_date < DATE '1997-07-01' AS before_pivot,
             CAST(round(cs_net_paid * 10000, 0) AS BIGINT)
               - coalesce(CAST(round(cr_return_amt * 10000, 0) AS BIGINT), 0)
               AS net_c
      FROM catalog_sales
      LEFT JOIN catalog_returns
        ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
      JOIN date_dim ON cs_sold_date = d_date
      WHERE d_year = 1997
    )
    GROUP BY cs_warehouse_sk
    """,
        "catalog_sales", "catalog_returns", "date_dim",
    ),
)
def q_tpcds_q40(ds: _DS) -> DataFrame:
    """TPC-DS Q40 (query40.sql): warehouse net sales before/after a
    pivot date, refunds netted via LEFT JOIN to returns on the
    natural (order, item) key. Exact-cent netting (NULL-safe
    coalesce) and one conditional-sum pass per warehouse."""
    net = (
        _cents(_C("cs_net_paid"))
        - F.coalesce(_cents(_C("cr_return_amt")), F.lit(0))
    )
    return (
        ds.catalog_sales.join(
            ds.catalog_returns_slim.select(
                _C("cr_order_number"), _C("cr_item_sk"), _C("cr_return_amt")
            ),
            (_C("cs_order_number") == _C("cr_order_number"))
            & (_C("cs_item_sk") == _C("cr_item_sk")),
            "left",
        )
        .where(_year_range(_C("cs_sold_date"), 1997))
        .select(
            _C("cs_warehouse_sk").alias("warehouse_sk"),
            (_C("cs_sold_date") < F.lit("1997-07-01").cast("date")).alias(
                "before_pivot"
            ),
            net.alias("net_c"),
        )
        .groupBy("warehouse_sk")
        .agg(
            (
                F.floor(
                    F.coalesce(
                        F.sum(F.when(_C("before_pivot"), _C("net_c"))),
                        F.lit(0),
                    )
                    / 100.0
                    + F.lit(0.5)
                )
                / 100
            ).alias("sales_before"),
            (
                F.floor(
                    F.coalesce(
                        F.sum(F.when(~_C("before_pivot"), _C("net_c"))),
                        F.lit(0),
                    )
                    / 100.0
                    + F.lit(0.5)
                )
                / 100
            ).alias("sales_after"),
        )
    )


def _revenue_ratio_q(name, qnum, fact_name, prefix, cats, d_lo, d_hi):
    """Shared builder for the Q12/Q20/Q98 revenue-share family: the
    three reference queries (query12.sql, query20.sql, query98.sql)
    are the same template instantiated per channel — per-item revenue
    inside a category slice and date window, plus the item's share of
    its class via a class-partition window sum."""
    cats_sql = ", ".join(f"'{c}'" for c in cats)
    oracle = _with(
        f"""
    SELECT i_item_sk, i_category, i_class,
           floor(rev_c / 100.0 + 0.5) / 100 AS itemrevenue,
           round(CAST(rev_c AS DOUBLE) * 100
                 / sum(CAST(rev_c AS DOUBLE)) OVER (PARTITION BY i_class),
                 4) AS revenueratio
    FROM (
      SELECT i_item_sk, i_category, i_class,
             CAST(sum(CAST(round({prefix}net_paid * 10000, 0) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM {fact_name}
      JOIN item ON {prefix}item_sk = i_item_sk
      JOIN date_dim ON {prefix}sold_date = d_date
      WHERE i_category IN ({cats_sql})
        AND d_date BETWEEN DATE '{d_lo}' AND DATE '{d_hi}'
      GROUP BY i_item_sk, i_category, i_class
    )
    """,
        fact_name, "item", "date_dim",
    )

    @_ds_q(name, oracle)
    def q(ds: _DS) -> DataFrame:
        rev = (
            getattr(ds, fact_name)
            .join(
                F.broadcast(ds.item.where(_C("i_category").isin(*cats))),
                _C(prefix + "item_sk") == _C("i_item_sk"),
            )
            .join(
                F.broadcast(
                    ds.date_dim.where(
                        _C("d_date").between(d_lo, d_hi)
                    )
                ),
                _C(prefix + "sold_date") == _C("d_date"),
            )
            .groupBy("i_item_sk", "i_category", "i_class")
            .agg(F.sum(_cents(_C(prefix + "net_paid"))).alias("rev_c"))
        )
        w = Window.partitionBy("i_class")
        return rev.select(
            "i_item_sk",
            "i_category",
            "i_class",
            (F.floor(_C("rev_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "itemrevenue"
            ),
            F.round(
                _C("rev_c").cast("double")
                * 100
                / F.sum(_C("rev_c").cast("double")).over(w),
                4,
            ).alias("revenueratio"),
        )

    q.__doc__ = (
        f"TPC-DS Q{qnum} (query{qnum}.sql): the {fact_name} channel "
        "instance of the revenue-share template — item revenue in a "
        "category slice and 30-day window, plus its share of the "
        "class via a class-partition window sum over the aggregated "
        "(tiny) relation. Dims broadcast; one shuffle on the item key."
    )
    return q


q_tpcds_q12 = _revenue_ratio_q(
    "tpcds_q12", 12, "web_sales", "ws_",
    ("PROMO", "ECONOMY", "SMALL"), "1997-02-01", "1997-03-03",
)
q_tpcds_q20 = _revenue_ratio_q(
    "tpcds_q20", 20, "catalog_sales", "cs_",
    ("STANDARD", "MEDIUM", "LARGE"), "1998-05-01", "1998-05-31",
)


@_ds_q(
    "tpcds_q21",
    _with(
        """
    SELECT w_name, i_item_sk, inv_before, inv_after
    FROM (
      SELECT s_store_name AS w_name, i_item_sk,
             CAST(coalesce(sum(CASE WHEN cs_sold_date < DATE '1997-07-01'
                                    THEN q END), 0) AS BIGINT) AS inv_before,
             CAST(coalesce(sum(CASE WHEN cs_sold_date >= DATE '1997-07-01'
                                    THEN q END), 0) AS BIGINT) AS inv_after
      FROM (
        SELECT cs_warehouse_sk, cs_item_sk, cs_sold_date,
               CAST(cs_quantity AS BIGINT) AS q
        FROM catalog_sales
        WHERE cs_sold_date BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
      )
      JOIN store ON cs_warehouse_sk = s_store_sk
      JOIN item ON cs_item_sk = i_item_sk
      WHERE i_current_price BETWEEN 900 AND 920
      GROUP BY s_store_name, i_item_sk
    )
    WHERE inv_before > 0
      AND CAST(inv_after AS DOUBLE) / inv_before BETWEEN 2.0 / 3.0 AND 1.5
    """,
        "catalog_sales", "store", "item",
    ),
)
def q_tpcds_q21(ds: _DS) -> DataFrame:
    """TPC-DS Q21 (query21.sql): warehouse stock balance around a
    pivot date — per (warehouse, item) quantity before/after, kept
    when the after/before ratio stays within [2/3, 3/2]. The
    reference's inventory fact maps to catalog_sales quantities (the
    derived schema has no inventory snapshots); the warehouse
    dimension is the supplier-derived store view. One conditional-sum
    pass; the ratio filter rides the aggregated relation."""
    q = (
        ds.catalog_sales.where(
            _C("cs_sold_date").between("1996-01-01", "1998-12-31")
        )
        .select("cs_warehouse_sk", "cs_item_sk", "cs_sold_date",
                _C("cs_quantity").cast("bigint").alias("q"))
        .join(
            F.broadcast(ds.store),
            _C("cs_warehouse_sk") == _C("s_store_sk"),
        )
        .join(
            F.broadcast(
                ds.item.where(_C("i_current_price").between(900, 920))
            ),
            _C("cs_item_sk") == _C("i_item_sk"),
        )
        .groupBy(_C("s_store_name").alias("w_name"), _C("i_item_sk"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        _C("cs_sold_date") < F.lit("1997-07-01").cast("date"),
                        _C("q"),
                    )
                ),
                F.lit(0),
            ).alias("inv_before"),
            F.coalesce(
                F.sum(
                    F.when(
                        _C("cs_sold_date") >= F.lit("1997-07-01").cast("date"),
                        _C("q"),
                    )
                ),
                F.lit(0),
            ).alias("inv_after"),
        )
    )
    ratio = _C("inv_after").cast("double") / _C("inv_before")
    return q.where(
        (_C("inv_before") > 0) & ratio.between(2.0 / 3.0, 1.5)
    ).select("w_name", "i_item_sk", "inv_before", "inv_after")


@_ds_q(
    "tpcds_q22",
    _with(
        """
    SELECT i_item_desc, i_brand, i_class, i_category,
           floor(sum(CAST(cs_quantity AS BIGINT)) * 100.0 / count(*) + 0.5)
             / 100 AS qoh
    FROM catalog_sales
    JOIN date_dim ON cs_sold_date = d_date
    JOIN item ON cs_item_sk = i_item_sk
    WHERE d_year = 1998
    GROUP BY ROLLUP (i_item_desc, i_brand, i_class, i_category)
    """,
        "catalog_sales", "date_dim", "item",
    ),
)
def q_tpcds_q22(ds: _DS) -> DataFrame:
    """TPC-DS Q22 (query22.sql): average quantity on hand over a
    four-level item ROLLUP (desc -> brand -> class -> category). The
    reference reads the inventory fact; the derived schema maps it to
    catalog_sales quantities over a year. Spark's rollup plans one
    Expand + single shuffle; the average is the exact-integer-sum
    formulation so every grouping level is bit-stable."""
    return (
        ds.catalog_sales.where(_year_range(_C("cs_sold_date"), 1998))
        .join(F.broadcast(ds.item), _C("cs_item_sk") == _C("i_item_sk"))
        .rollup("i_item_desc", "i_brand", "i_class", "i_category")
        .agg(
            (
                F.floor(
                    F.sum(_C("cs_quantity").cast("bigint"))
                    * 100.0
                    / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / 100
            ).alias("qoh")
        )
    )


@_ds_q(
    "tpcds_q26",
    _with(
        f"""
    SELECT i_item_sk,
           {_exact_avg_sql('cs_quantity', 100)} AS agg1,
           {_exact_avg_sql('cs_ext_list_price', 10000)} AS agg2,
           {_exact_avg_sql('cs_ext_discount_amt', 10000)} AS agg3,
           {_exact_avg_sql('cs_net_paid', 10000)} AS agg4
    FROM catalog_sales
    JOIN customer_dim ON cs_customer_sk = c_customer_sk
    JOIN date_dim ON cs_sold_date = d_date
    JOIN item ON cs_item_sk = i_item_sk
    WHERE c_segment = 'BUILDING' AND c_preferred_flag = 'Y'
      AND d_year = 1998
    GROUP BY i_item_sk
    """,
        "catalog_sales", "customer_dim", "date_dim", "item",
    ),
)
def q_tpcds_q26(ds: _DS) -> DataFrame:
    """TPC-DS Q26 (query26.sql): per-item averages of quantity,
    list price, coupon (discount) amount, and sales price for a
    demographic slice of catalog buyers. The reference's
    customer_demographics filters map to the derived customer_dim
    flags (segment + preferred). All four averages use the
    exact-integer-sum formulation; dims broadcast, one shuffle on
    the item key."""
    return (
        ds.catalog_sales.join(
            F.broadcast(
                ds.customer_dim.where(
                    (_C("c_segment") == "BUILDING")
                    & (_C("c_preferred_flag") == "Y")
                )
            ),
            _C("cs_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1998)),
            _C("cs_sold_date") == _C("d_date"),
        )
        .join(F.broadcast(ds.item), _C("cs_item_sk") == _C("i_item_sk"))
        .groupBy("i_item_sk")
        .agg(
            _exact_avg(_C("cs_quantity"), 100).alias("agg1"),
            _exact_avg(_C("cs_ext_list_price"), 10000).alias("agg2"),
            _exact_avg(_C("cs_ext_discount_amt"), 10000).alias("agg3"),
            _exact_avg(_C("cs_net_paid"), 10000).alias("agg4"),
        )
    )


@_ds_q(
    "tpcds_q32",
    _with(
        """
    SELECT floor(coalesce(sum(disc_c), 0) / 100.0 + 0.5) / 100
             AS excess_discount_amount
    FROM (
      SELECT cs_item_sk,
             CAST(round(cs_ext_discount_amt * 10000, 0) AS BIGINT) AS disc_c
      FROM catalog_sales
      JOIN item ON cs_item_sk = i_item_sk
      JOIN date_dim ON cs_sold_date = d_date
      WHERE i_manufact_id = 7
        AND d_date BETWEEN DATE '1998-01-27' AND DATE '1998-04-27'
    ) f
    JOIN (
      SELECT cs_item_sk AS avg_item,
             avg(CAST(round(cs_ext_discount_amt * 10000, 0) AS BIGINT))
               AS avg_disc_c
      FROM catalog_sales
      JOIN date_dim ON cs_sold_date = d_date
      WHERE d_date BETWEEN DATE '1998-01-27' AND DATE '1998-04-27'
      GROUP BY cs_item_sk
    ) a ON f.cs_item_sk = a.avg_item
    WHERE CAST(disc_c AS DOUBLE) > 1.3 * avg_disc_c
    """,
        "catalog_sales", "item", "date_dim",
    ),
)
def q_tpcds_q32(ds: _DS) -> DataFrame:
    """TPC-DS Q32 (query32.sql): excess discount — the total of
    catalog discounts that exceed 1.3x the item's own average
    discount in the same 90-day window. The correlated scalar
    subquery decorrelates to a per-item avg aggregate joined back
    (exactly how both optimizers plan it). The threshold compare is
    identical double arithmetic over exact cent integers; dims
    broadcast, the fact-fact join rides the item key."""
    dd = F.broadcast(
        ds.date_dim.where(_C("d_date").between("1998-01-27", "1998-04-27"))
    )
    window_cs = ds.catalog_sales.join(
        dd, _C("cs_sold_date") == _C("d_date")
    ).select("cs_item_sk", _cents(_C("cs_ext_discount_amt")).alias("disc_c"))
    per_item_avg = window_cs.groupBy(
        _C("cs_item_sk").alias("avg_item")
    ).agg(F.avg("disc_c").alias("avg_disc_c"))
    filtered = (
        window_cs.join(
            F.broadcast(ds.item.where(_C("i_manufact_id") == 7)),
            _C("cs_item_sk") == _C("i_item_sk"),
        )
        .join(per_item_avg, _C("cs_item_sk") == _C("avg_item"))
        .where(_C("disc_c").cast("double") > 1.3 * _C("avg_disc_c"))
    )
    return filtered.agg(
        (
            F.floor(
                F.coalesce(F.sum("disc_c"), F.lit(0)) / 100.0 + F.lit(0.5)
            )
            / 100
        ).alias("excess_discount_amount")
    )


def _inventory_slice_q(name, qnum, fact_name, prefix, price_lo, price_hi,
                       manufacts, d_lo, d_hi, qty_lo, qty_hi):
    """Shared builder for the Q37/Q82 twins (query37.sql store
    variant query82.sql): items in a price/manufacturer slice with
    channel activity in a date window and an on-hand-quantity band.
    The reference's inventory fact maps to the channel fact's
    quantities (the derived schema keeps no stock snapshots)."""
    m_sql = ", ".join(str(m) for m in manufacts)
    oracle = _with(
        f"""
    SELECT i_item_sk, i_item_desc, i_current_price
    FROM item
    JOIN {fact_name} ON {prefix}item_sk = i_item_sk
    JOIN date_dim ON {prefix}sold_date = d_date
    WHERE i_current_price BETWEEN {price_lo} AND {price_hi}
      AND i_manufact_id IN ({m_sql})
      AND d_date BETWEEN DATE '{d_lo}' AND DATE '{d_hi}'
      AND {prefix}quantity BETWEEN {qty_lo} AND {qty_hi}
    GROUP BY i_item_sk, i_item_desc, i_current_price
    """,
        "item", fact_name, "date_dim",
    )

    @_ds_q(name, oracle)
    def q(ds: _DS) -> DataFrame:
        return (
            getattr(ds, fact_name)
            .where(_C(prefix + "quantity").between(qty_lo, qty_hi))
            .join(
                F.broadcast(
                    ds.item.where(
                        _C("i_current_price").between(price_lo, price_hi)
                        & _C("i_manufact_id").isin(*manufacts)
                    )
                ),
                _C(prefix + "item_sk") == _C("i_item_sk"),
            )
            .join(
                F.broadcast(ds.date_dim.where(_C("d_date").between(d_lo, d_hi))),
                _C(prefix + "sold_date") == _C("d_date"),
            )
            .groupBy("i_item_sk", "i_item_desc", "i_current_price")
            .agg(F.count(F.lit(1)).alias("_n"))
            .drop("_n")
        )

    q.__doc__ = (
        f"TPC-DS Q{qnum} (query{qnum}.sql): items in a price and "
        f"manufacturer slice that moved {qty_lo}-{qty_hi} units through "
        f"the {fact_name} channel inside a date window — the item-level "
        "distinct via groupBy so the fact join stays a semi-style "
        "existence probe; all dims broadcast."
    )
    return q


q_tpcds_q37 = _inventory_slice_q(
    "tpcds_q37", 37, "catalog_sales", "cs_", 900, 912,
    (7, 19, 23, 42), "1997-02-01", "1997-04-02", 10, 40,
)
q_tpcds_q82 = _inventory_slice_q(
    "tpcds_q82", 82, "store_sales", "ss_", 905, 918,
    (3, 11, 30, 44), "1998-05-01", "1998-06-30", 25, 50,
)


@_ds_q(
    "tpcds_q39",
    _with(
        """
    SELECT c1.w AS warehouse_sk, c1.moy AS moy1, c2.moy AS moy2,
           round(c1.mean, 4) AS mean1, round(c1.cov, 4) AS cov1,
           round(c2.mean, 4) AS mean2, round(c2.cov, 4) AS cov2
    FROM (
      SELECT w, moy, CAST(s AS DOUBLE) / n AS mean,
             sqrt((n * s2 - s * s) / (CAST(n AS DOUBLE) * (n - 1)))
               / (CAST(s AS DOUBLE) / n) AS cov
      FROM (
        SELECT cs_warehouse_sk AS w, d_moy AS moy,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(cs_quantity AS BIGINT)) AS s,
               sum(CAST(cs_quantity AS BIGINT)
                   * CAST(cs_quantity AS BIGINT)) AS s2
        FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
        WHERE d_year = 1997
        GROUP BY cs_warehouse_sk, d_moy
        HAVING count(*) > 1
      )
    ) c1
    JOIN (
      SELECT w, moy, CAST(s AS DOUBLE) / n AS mean,
             sqrt((n * s2 - s * s) / (CAST(n AS DOUBLE) * (n - 1)))
               / (CAST(s AS DOUBLE) / n) AS cov
      FROM (
        SELECT cs_warehouse_sk AS w, d_moy AS moy,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(cs_quantity AS BIGINT)) AS s,
               sum(CAST(cs_quantity AS BIGINT)
                   * CAST(cs_quantity AS BIGINT)) AS s2
        FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
        WHERE d_year = 1997
        GROUP BY cs_warehouse_sk, d_moy
        HAVING count(*) > 1
      )
    ) c2 ON c1.w = c2.w AND c1.moy = 1 AND c2.moy = 2
    WHERE c1.cov > 0.3 AND c2.cov > 0.3
    """,
        "catalog_sales", "date_dim",
    ),
)
def q_tpcds_q39(ds: _DS) -> DataFrame:
    """TPC-DS Q39 (query39a.sql): warehouse demand volatility — the
    coefficient of variation of monthly quantities per warehouse,
    self-joined across consecutive months to find sustained
    volatility. Stddev uses the closed exact-integer-sum formula (see
    q17) so the cov threshold cannot flip between engines; the
    month-1/month-2 self-join rides the tiny aggregated relation."""
    base = (
        ds.catalog_sales.where(_year_range(_C("cs_sold_date"), 1997))
        .groupBy(
            _C("cs_warehouse_sk").alias("w"),
            F.month(_C("cs_sold_date")).cast("bigint").alias("moy"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(_C("cs_quantity").cast("bigint")).alias("s"),
            F.sum(
                _C("cs_quantity").cast("bigint")
                * _C("cs_quantity").cast("bigint")
            ).alias("s2"),
        )
        .where(_C("n") > 1)
    )
    mean = _C("s").cast("double") / _C("n")
    cov = (
        F.sqrt(
            (_C("n") * _C("s2") - _C("s") * _C("s"))
            / (_C("n").cast("double") * (_C("n") - F.lit(1)))
        )
        / mean
    )
    inv = base.select("w", "moy", mean.alias("mean"), cov.alias("cov")).where(
        _C("cov") > 0.3
    )
    c1 = inv.where(_C("moy") == 1).alias("c1")
    c2 = inv.where(_C("moy") == 2).alias("c2")
    return c1.join(c2, _C("c1.w") == _C("c2.w")).select(
        _C("c1.w").alias("warehouse_sk"),
        _C("c1.moy").alias("moy1"),
        _C("c2.moy").alias("moy2"),
        F.round(_C("c1.mean"), 4).alias("mean1"),
        F.round(_C("c1.cov"), 4).alias("cov1"),
        F.round(_C("c2.mean"), 4).alias("mean2"),
        F.round(_C("c2.cov"), 4).alias("cov2"),
    )


@_ds_q(
    "tpcds_q41",
    _with(
        """
    SELECT DISTINCT i_item_desc
    FROM item i1
    JOIN (
      SELECT i_manufact_id AS m, CAST(count(*) AS BIGINT) AS item_cnt
      FROM item
      WHERE (i_category = 'PROMO' AND i_size BETWEEN 1 AND 10)
         OR (i_category = 'STANDARD' AND i_size BETWEEN 20 AND 30)
         OR (i_category = 'ECONOMY' AND i_size BETWEEN 35 AND 50)
      GROUP BY i_manufact_id
    ) g ON i1.i_manufact_id = g.m
    WHERE i1.i_manufact_id BETWEEN 10 AND 30 AND g.item_cnt > 0
    """,
        "item",
    ),
)
def q_tpcds_q41(ds: _DS) -> DataFrame:
    """TPC-DS Q41 (query41.sql): product names whose manufacturer
    also makes items matching an OR-grid of attribute combinations —
    the correlated count(*) subquery decorrelates to a per-manufacturer
    conditional count joined back (the grid over color/units/size maps
    to the derived schema's category/size attributes)."""
    grid = (
        ((_C("i_category") == "PROMO") & _C("i_size").between(1, 10))
        | ((_C("i_category") == "STANDARD") & _C("i_size").between(20, 30))
        | ((_C("i_category") == "ECONOMY") & _C("i_size").between(35, 50))
    )
    per_man = (
        ds.item.where(grid)
        .groupBy(_C("i_manufact_id").alias("m"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("item_cnt"))
    )
    return (
        ds.item.where(_C("i_manufact_id").between(10, 30))
        .join(F.broadcast(per_man), _C("i_manufact_id") == _C("m"))
        .where(_C("item_cnt") > 0)
        .select("i_item_desc")
        .distinct()
    )


@_ds_q(
    "tpcds_q48",
    _with(
        """
    SELECT CAST(sum(CAST(ss_quantity AS BIGINT)) AS BIGINT) AS qty_total
    FROM store_sales
    JOIN customer_dim ON ss_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN date_dim ON ss_sold_date = d_date
    WHERE d_year BETWEEN 1996 AND 1998
      AND ((c_segment = 'AUTOMOBILE' AND ss_net_paid BETWEEN 0 AND 40000)
        OR (c_segment = 'BUILDING' AND ss_net_paid BETWEEN 10000 AND 60000)
        OR (c_segment = 'MACHINERY' AND ss_net_paid BETWEEN 20000 AND 100000))
      AND ((ca_state IN ('NATION_0','NATION_1','NATION_2','NATION_3',
                         'NATION_4')
              AND ss_quantity BETWEEN 1 AND 25)
        OR (ca_state IN ('NATION_5','NATION_8','NATION_9','NATION_12',
                         'NATION_15')
              AND ss_quantity BETWEEN 10 AND 40)
        OR (ca_state IN ('NATION_11','NATION_18','NATION_20','NATION_22',
                         'NATION_24')
              AND ss_quantity BETWEEN 25 AND 50))
    """,
        "store_sales", "customer_dim", "customer_address", "date_dim",
    ),
)
def q_tpcds_q48(ds: _DS) -> DataFrame:
    """TPC-DS Q48 (query48.sql): total store quantity under an OR of
    (demographic-slice x price-band) conjuncts AND an OR of
    (state-list x quantity-band) conjuncts — the classic
    multi-disjunct scan filter. Everything folds into one Catalyst
    predicate on the fact scan; dims broadcast; single global agg."""
    seg_band = (
        ((_C("c_segment") == "AUTOMOBILE") & _C("ss_net_paid").between(0, 40000))
        | ((_C("c_segment") == "BUILDING")
           & _C("ss_net_paid").between(10000, 60000))
        | ((_C("c_segment") == "MACHINERY")
           & _C("ss_net_paid").between(20000, 100000))
    )
    geo_band = (
        (_C("ca_state").isin("NATION_0", "NATION_1", "NATION_2", "NATION_3",
                             "NATION_4")
         & _C("ss_quantity").between(1, 25))
        | (_C("ca_state").isin("NATION_5", "NATION_8", "NATION_9",
                               "NATION_12", "NATION_15")
           & _C("ss_quantity").between(10, 40))
        | (_C("ca_state").isin("NATION_11", "NATION_18", "NATION_20",
                               "NATION_22", "NATION_24")
           & _C("ss_quantity").between(25, 50))
    )
    return (
        ds.store_sales.join(
            F.broadcast(ds.customer_dim),
            _C("ss_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year").between(1996, 1998))),
            _C("ss_sold_date") == _C("d_date"),
        )
        .where(seg_band & geo_band)
        .agg(
            F.sum(_C("ss_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty_total")
        )
    )


def _brand_ext_price_q(name, qnum, m_lo, m_hi, year, moy, with_year):
    """Shared builder for the Q52/Q55 twins: monthly brand revenue
    star agg (query52.sql groups by year too; query55.sql doesn't)."""
    year_col = "d_year, " if with_year else ""
    oracle = _with(
        f"""
    SELECT {year_col}i_brand,
           {_ems_sql('ss_ext_list_price')} AS ext_price
    FROM store_sales
    JOIN date_dim ON ss_sold_date = d_date
    JOIN item ON ss_item_sk = i_item_sk
    WHERE i_manufact_id BETWEEN {m_lo} AND {m_hi}
      AND d_moy = {moy} AND d_year = {year}
    GROUP BY {year_col}i_brand
    """,
        "store_sales", "date_dim", "item",
    )

    @_ds_q(name, oracle)
    def q(ds: _DS) -> DataFrame:
        keys = (["d_year"] if with_year else []) + ["i_brand"]
        return (
            ds.store_sales.join(
                F.broadcast(
                    ds.date_dim.where(
                        (_C("d_moy") == moy) & (_C("d_year") == year)
                    )
                ),
                _C("ss_sold_date") == _C("d_date"),
            )
            .join(
                F.broadcast(
                    ds.item.where(_C("i_manufact_id").between(m_lo, m_hi))
                ),
                _C("ss_item_sk") == _C("i_item_sk"),
            )
            .groupBy(*keys)
            .agg(_exact_money_sum(_C("ss_ext_list_price")).alias("ext_price"))
        )

    q.__doc__ = (
        f"TPC-DS Q{qnum} (query{qnum}.sql): one-month brand revenue "
        "star agg for a manufacturer slice — both dims broadcast, one "
        "shuffle on the brand key."
    )
    return q


q_tpcds_q52 = _brand_ext_price_q("tpcds_q52", 52, 10, 19, 1997, 12, True)
q_tpcds_q55 = _brand_ext_price_q("tpcds_q55", 55, 20, 29, 1996, 11, False)


def _manufact_deviation_q(name, qnum, fact_name, prefix, period_col, year,
                          grid_sql, grid_col):
    """Shared builder for the Q53/Q63 twins: per-manufacturer
    periodic sales vs the manufacturer's average over the year
    (query53.sql quarterly, query63.sql monthly), keeping periods
    deviating more than 10% from the mean."""
    oracle = _with(
        f"""
    SELECT i_manufact_id, {period_col},
           floor(sum_c / 100.0 + 0.5) / 100 AS sum_sales,
           round(avg_c / 10000.0, 4) AS avg_periodic_sales
    FROM (
      SELECT i_manufact_id, {period_col}, sum_c,
             sum(sum_c) OVER (PARTITION BY i_manufact_id)
               / CAST(count(*) OVER (PARTITION BY i_manufact_id) AS DOUBLE)
               AS avg_c
      FROM (
        SELECT i_manufact_id, {period_col},
               sum(CAST(round({prefix}net_paid * 10000, 0) AS BIGINT))
                 AS sum_c
        FROM {fact_name}
        JOIN date_dim ON {prefix}sold_date = d_date
        JOIN item ON {prefix}item_sk = i_item_sk
        WHERE d_year = {year} AND ({grid_sql})
        GROUP BY i_manufact_id, {period_col}
      )
    )
    WHERE avg_c > 0 AND abs(sum_c - avg_c) / avg_c > 0.1
    """,
        fact_name, "date_dim", "item",
    )

    @_ds_q(name, oracle)
    def q(ds: _DS) -> DataFrame:
        # pushed year range; the period column is a function of the
        # 1:1-joined date — projected instead of joined
        period_fn = F.quarter if period_col == "d_qoy" else F.month
        per_period = (
            getattr(ds, fact_name)
            .where(_year_range(_C(prefix + "sold_date"), year))
            .withColumn(
                period_col,
                period_fn(_C(prefix + "sold_date")).cast("bigint"),
            )
            .join(
                F.broadcast(ds.item.where(grid_col())),
                _C(prefix + "item_sk") == _C("i_item_sk"),
            )
            .groupBy("i_manufact_id", period_col)
            .agg(F.sum(_cents(_C(prefix + "net_paid"))).alias("sum_c"))
        )
        w = Window.partitionBy("i_manufact_id")
        avg_c = (
            F.sum("sum_c").over(w)
            / F.count(F.lit(1)).over(w).cast("double")
        )
        return (
            per_period.withColumn("avg_c", avg_c)
            .where(
                (_C("avg_c") > 0)
                & (F.abs(_C("sum_c") - _C("avg_c")) / _C("avg_c") > 0.1)
            )
            .select(
                "i_manufact_id",
                period_col,
                (F.floor(_C("sum_c") / 100.0 + F.lit(0.5)) / 100).alias(
                    "sum_sales"
                ),
                F.round(_C("avg_c") / 10000.0, 4).alias(
                    "avg_periodic_sales"
                ),
            )
        )

    q.__doc__ = (
        f"TPC-DS Q{qnum} (query{qnum}.sql): per-manufacturer "
        f"{period_col} sales vs the manufacturer's own average — a "
        "window avg over the aggregated relation, keeping >10% "
        "deviations. Exact-cent sums feed identical double window "
        "arithmetic on both engines."
    )
    return q


q_tpcds_q53 = _manufact_deviation_q(
    "tpcds_q53", 53, "store_sales", "ss_", "d_qoy", 1997,
    "(i_category IN ('PROMO', 'STANDARD') AND i_size BETWEEN 1 AND 25)"
    " OR (i_category IN ('ECONOMY', 'SMALL') AND i_size BETWEEN 26 AND 50)",
    lambda: ((F.col("i_category").isin("PROMO", "STANDARD")
              & F.col("i_size").between(1, 25))
             | (F.col("i_category").isin("ECONOMY", "SMALL")
                & F.col("i_size").between(26, 50))),
)
q_tpcds_q63 = _manufact_deviation_q(
    "tpcds_q63", 63, "web_sales", "ws_", "d_moy", 1998,
    "(i_category IN ('LARGE', 'MEDIUM') AND i_size BETWEEN 1 AND 30)"
    " OR (i_category IN ('PROMO', 'ECONOMY') AND i_size BETWEEN 10 AND 50)",
    lambda: ((F.col("i_category").isin("LARGE", "MEDIUM")
              & F.col("i_size").between(1, 30))
             | (F.col("i_category").isin("PROMO", "ECONOMY")
                & F.col("i_size").between(10, 50))),
)


@_ds_q(
    "tpcds_q57",
    _with(
        """
    SELECT i_category, i_brand, s_store_name, d_year, d_moy,
           floor(sum_cents / 100 + 0.5) / 100 AS sum_sales,
           floor(avg_monthly / 100 + 0.5) / 100 AS avg_monthly_sales,
           floor(prev_cents / 100 + 0.5) / 100 AS psum,
           floor(next_cents / 100 + 0.5) / 100 AS nsum
    FROM (
      SELECT i_category, i_brand, s_store_name, d_year, d_moy, sum_cents,
             sum(sum_cents) OVER
               (PARTITION BY i_category, i_brand, s_store_name, d_year)
               * 1.0 /
             count(sum_cents) OVER
               (PARTITION BY i_category, i_brand, s_store_name, d_year)
               AS avg_monthly,
             lag(sum_cents) OVER (PARTITION BY i_category, i_brand,
                                  s_store_name
                                  ORDER BY d_year, d_moy) AS prev_cents,
             lead(sum_cents) OVER (PARTITION BY i_category, i_brand,
                                   s_store_name
                                   ORDER BY d_year, d_moy) AS next_cents
      FROM v1) v2
    WHERE d_year = 1997
      AND abs(sum_cents - avg_monthly) / avg_monthly > 0.1
      AND prev_cents IS NOT NULL AND next_cents IS NOT NULL
    """,
        "catalog_sales", "date_dim", "item", "store",
        extra="""
    v1 AS (
      SELECT i_category, i_brand, s_store_name, d_year, d_moy,
             sum(CAST(round(cs_net_paid * 10000, 0) AS BIGINT)) AS sum_cents
      FROM catalog_sales
      JOIN date_dim ON cs_sold_date = d_date
      JOIN item ON cs_item_sk = i_item_sk
      JOIN store ON cs_warehouse_sk = s_store_sk
      GROUP BY i_category, i_brand, s_store_name, d_year, d_moy)
    """,
    ),
)
def q_tpcds_q57(ds: _DS) -> DataFrame:
    """TPC-DS Q57 (query57.sql): the catalog-channel twin of Q47 —
    months deviating >10% from the category/brand/warehouse yearly
    average with lag/lead neighbors (the reference's call_center maps
    to the supplier-derived warehouse dim). Same two-window shape
    over the aggregated relation; exact-cent sums keep the deviation
    predicate bit-stable."""
    # the date_dim join is 1:1 on a date present by construction and
    # supplies only d_year/d_moy — projected directly instead
    v1 = (
        ds.catalog_sales.withColumn(
            "d_year", F.year(_C("cs_sold_date")).cast("bigint")
        )
        .withColumn("d_moy", F.month(_C("cs_sold_date")).cast("bigint"))
        .join(ds.item, _C("cs_item_sk") == _C("i_item_sk"))
        .join(ds.store, _C("cs_warehouse_sk") == _C("s_store_sk"))
        .groupBy("i_category", "i_brand", "s_store_name", "d_year", "d_moy")
        .agg(F.sum(_cents(_C("cs_net_paid"))).alias("sum_cents"))
    )
    wy = Window.partitionBy("i_category", "i_brand", "s_store_name", "d_year")
    wm = Window.partitionBy("i_category", "i_brand", "s_store_name").orderBy(
        "d_year", "d_moy"
    )
    v2 = v1.select(
        "i_category", "i_brand", "s_store_name", "d_year", "d_moy",
        "sum_cents",
        (F.sum("sum_cents").over(wy) * 1.0
         / F.count("sum_cents").over(wy)).alias("avg_monthly"),
        F.lag("sum_cents").over(wm).alias("prev_cents"),
        F.lead("sum_cents").over(wm).alias("next_cents"),
    )
    return (
        v2.where(
            (_C("d_year") == 1997)
            & (F.abs(_C("sum_cents") - _C("avg_monthly")) / _C("avg_monthly")
               > 0.1)
            & _C("prev_cents").isNotNull()
            & _C("next_cents").isNotNull()
        )
        .select(
            "i_category", "i_brand", "s_store_name", "d_year", "d_moy",
            (F.floor(_C("sum_cents") / 100 + F.lit(0.5)) / 100).alias(
                "sum_sales"
            ),
            (F.floor(_C("avg_monthly") / 100 + F.lit(0.5)) / 100).alias(
                "avg_monthly_sales"
            ),
            (F.floor(_C("prev_cents") / 100 + F.lit(0.5)) / 100).alias("psum"),
            (F.floor(_C("next_cents") / 100 + F.lit(0.5)) / 100).alias("nsum"),
        )
    )


@_ds_q(
    "tpcds_q60",
    _with(
        """
    SELECT item_sk, floor(sum(total_cents) / 100.0 + 0.5) / 100
             AS total_sales
    FROM (SELECT * FROM sst UNION ALL SELECT * FROM cst
          UNION ALL SELECT * FROM wst)
    GROUP BY item_sk
    """,
        "store_sales", "catalog_sales", "web_sales", "item", "date_dim",
        "customer_dim", "customer_address",
        extra="""
    sst AS (
      SELECT ss_item_sk AS item_sk,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      JOIN customer_dim ON ss_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE i_category = 'ECONOMY' AND d_year = 1997 AND d_moy = 9
        AND ca_country = 'AMERICA'
      GROUP BY ss_item_sk),
    cst AS (
      SELECT cs_item_sk AS item_sk,
             sum(CAST(round(cs_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM catalog_sales
      JOIN item ON cs_item_sk = i_item_sk
      JOIN date_dim ON cs_sold_date = d_date
      JOIN customer_dim ON cs_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE i_category = 'ECONOMY' AND d_year = 1997 AND d_moy = 9
        AND ca_country = 'AMERICA'
      GROUP BY cs_item_sk),
    wst AS (
      SELECT ws_item_sk AS item_sk,
             sum(CAST(round(ws_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM web_sales
      JOIN item ON ws_item_sk = i_item_sk
      JOIN date_dim ON ws_sold_date = d_date
      JOIN customer_dim ON ws_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE i_category = 'ECONOMY' AND d_year = 1997 AND d_moy = 9
        AND ca_country = 'AMERICA'
      GROUP BY ws_item_sk)
    """,
    ),
)
def q_tpcds_q60(ds: _DS) -> DataFrame:
    """TPC-DS Q60 (query60.sql): per-item revenue for one category
    and month across all three channels for customers in one region
    (the reference's gmt_offset filter maps to ca_country) — three
    star aggs UNION ALL'd then re-aggregated, the Q33/Q56/Q60
    family's item-level member."""

    def chan(fact, p):
        return (
            fact.join(
                F.broadcast(ds.item.where(_C("i_category") == "ECONOMY")),
                _C(p + "item_sk") == _C("i_item_sk"),
            )
            .join(
                F.broadcast(
                    ds.date_dim.where(
                        (_C("d_year") == 1997) & (_C("d_moy") == 9)
                    )
                ),
                _C(p + "sold_date") == _C("d_date"),
            )
            .join(
                F.broadcast(ds.customer_dim),
                _C(p + "customer_sk") == _C("c_customer_sk"),
            )
            .join(
                F.broadcast(
                    ds.customer_address.where(_C("ca_country") == "AMERICA")
                ),
                _C("c_current_addr_sk") == _C("ca_address_sk"),
            )
            .groupBy(_C(p + "item_sk").alias("item_sk"))
            .agg(F.sum(_cents(_C(p + "net_paid"))).alias("total_cents"))
        )

    unioned = (
        chan(ds.store_sales, "ss_")
        .unionByName(chan(ds.catalog_sales, "cs_"))
        .unionByName(chan(ds.web_sales, "ws_"))
    )
    return unioned.groupBy("item_sk").agg(
        (F.floor(F.sum("total_cents") / 100.0 + F.lit(0.5)) / 100).alias(
            "total_sales"
        )
    )


@_ds_q(
    "tpcds_q68",
    _with(
        """
    SELECT c_customer_id, ca_state AS current_state, bought_state,
           ticket,
           floor(price_c / 100.0 + 0.5) / 100 AS extended_price,
           floor(ship_c / 100.0 + 0.5) / 100 AS extended_ship,
           floor(list_c / 100.0 + 0.5) / 100 AS list_price
    FROM (
      SELECT ss_ticket_number AS ticket, ss_customer_sk AS cust,
             s_state AS bought_state,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS price_c,
             sum(CAST(round(ss_ext_ship_cost * 10000, 0) AS BIGINT))
               AS ship_c,
             sum(CAST(round(ss_ext_list_price * 10000, 0) AS BIGINT))
               AS list_c
      FROM store_sales
      JOIN date_dim ON ss_sold_date = d_date
      JOIN store ON ss_store_sk = s_store_sk
      WHERE d_dom BETWEEN 1 AND 2 AND d_year IN (1996, 1997, 1998)
        AND s_market_id IN (1, 2, 3)
      GROUP BY ss_ticket_number, ss_customer_sk, s_state
    ) dn
    JOIN customer_dim ON cust = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    WHERE ca_state <> bought_state
    """,
        "store_sales", "date_dim", "store", "customer_dim",
        "customer_address",
    ),
)
def q_tpcds_q68(ds: _DS) -> DataFrame:
    """TPC-DS Q68 (query68.sql): per-ticket purchase totals on
    month-start days in selected store markets, for customers whose
    current state differs from where they bought (the reference's
    city pair maps to states). Ticket-level agg first (natural key
    shuffle), then the small customer/address dims join the
    aggregated relation."""
    dn = (
        ds.store_sales.join(
            F.broadcast(
                ds.date_dim.where(
                    _C("d_dom").between(1, 2)
                    & _C("d_year").isin(1996, 1997, 1998)
                )
            ),
            _C("ss_sold_date") == _C("d_date"),
        )
        .join(
            F.broadcast(ds.store.where(_C("s_market_id").isin(1, 2, 3))),
            _C("ss_store_sk") == _C("s_store_sk"),
        )
        .groupBy(
            _C("ss_ticket_number").alias("ticket"),
            _C("ss_customer_sk").alias("cust"),
            _C("s_state").alias("bought_state"),
        )
        .agg(
            F.sum(_cents(_C("ss_net_paid"))).alias("price_c"),
            F.sum(_cents(_C("ss_ext_ship_cost"))).alias("ship_c"),
            F.sum(_cents(_C("ss_ext_list_price"))).alias("list_c"),
        )
    )
    return (
        dn.join(
            F.broadcast(ds.customer_dim), _C("cust") == _C("c_customer_sk")
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .where(_C("ca_state") != _C("bought_state"))
        .select(
            "c_customer_id",
            _C("ca_state").alias("current_state"),
            "bought_state",
            "ticket",
            (F.floor(_C("price_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "extended_price"
            ),
            (F.floor(_C("ship_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "extended_ship"
            ),
            (F.floor(_C("list_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "list_price"
            ),
        )
    )


@_ds_q(
    "tpcds_q70",
    _with(
        """
    SELECT floor(profit_c / 100.0 + 0.5) / 100 AS total_sum,
           st, store_name, lochierarchy, rank_within_parent
    FROM (
      SELECT sum(net_c) AS profit_c,
             s_state AS st, s_store_name AS store_name,
             grouping(s_state) + grouping(s_store_name) AS lochierarchy,
             rank() OVER (
               PARTITION BY grouping(s_state) + grouping(s_store_name),
                 CASE WHEN grouping(s_store_name) = 0 THEN s_state END
               ORDER BY sum(net_c) DESC) AS rank_within_parent
      FROM (
        SELECT CAST(round(ss_net_profit * 10000, 0) AS BIGINT) AS net_c,
               s_state, s_store_name
        FROM store_sales
        JOIN date_dim ON ss_sold_date = d_date
        JOIN store ON ss_store_sk = s_store_sk
        WHERE d_year = 1997
          AND s_state IN (
            SELECT st FROM (
              SELECT s_state AS st,
                     rank() OVER (ORDER BY
                       sum(CAST(round(ss_net_profit * 10000, 0) AS BIGINT))
                       DESC) AS ranking
              FROM store_sales
              JOIN date_dim ON ss_sold_date = d_date
              JOIN store ON ss_store_sk = s_store_sk
              WHERE d_year = 1997
              GROUP BY s_state)
            WHERE ranking <= 5)
      )
      GROUP BY ROLLUP (s_state, s_store_name)
    )
    """,
        "store_sales", "date_dim", "store",
    ),
)
def q_tpcds_q70(ds: _DS) -> DataFrame:
    """TPC-DS Q70 (query70.sql): profit rollup over the store
    geography hierarchy, restricted to the five most profitable
    states (windowed-rank semi-join), with rank-within-parent across
    grouping levels via grouping()-keyed window partitions. Both the
    semi-join input and the rollup ride one (state, store) shuffle;
    exact-cent profit keeps ranks stable."""
    # the date_dim join reads no d_* column — pushed year range
    joined = (
        ds.store_sales.where(_year_range(_C("ss_sold_date"), 1997))
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .select(
            _cents(_C("ss_net_profit")).alias("net_c"),
            "s_state",
            "s_store_name",
        )
    )
    top5 = (
        joined.groupBy(_C("s_state").alias("st"))
        .agg(F.sum("net_c").alias("p"))
        .select(
            "st", F.rank().over(Window.orderBy(_C("p").desc())).alias("rk")
        )
        .where(_C("rk") <= 5)
        .select("st")
    )
    rolled = (
        joined.join(
            F.broadcast(top5), _C("s_state") == _C("st"), "left_semi"
        )
        .rollup("s_state", "s_store_name")
        .agg(
            F.sum("net_c").alias("profit_c"),
            (F.grouping("s_state") + F.grouping("s_store_name")).alias(
                "lochierarchy"
            ),
            F.grouping("s_store_name").alias("_g_store"),
        )
    )
    wr = Window.partitionBy(
        "lochierarchy",
        F.when(_C("_g_store") == 0, _C("s_state")),
    ).orderBy(_C("profit_c").desc())
    return rolled.select(
        (F.floor(_C("profit_c") / 100.0 + F.lit(0.5)) / 100).alias(
            "total_sum"
        ),
        _C("s_state").alias("st"),
        _C("s_store_name").alias("store_name"),
        "lochierarchy",
        F.rank().over(wr).alias("rank_within_parent"),
    )


@_ds_q(
    "tpcds_q71",
    _with(
        """
    SELECT i_brand, d_dom,
           floor(sum(price_c) / 100.0 + 0.5) / 100 AS ext_price
    FROM (
      SELECT ws_item_sk AS item_sk, ws_sold_date AS sold_date,
             CAST(round(ws_ext_list_price * 10000, 0) AS BIGINT) AS price_c
      FROM web_sales
      UNION ALL
      SELECT cs_item_sk, cs_sold_date,
             CAST(round(cs_ext_list_price * 10000, 0) AS BIGINT)
      FROM catalog_sales
      UNION ALL
      SELECT ss_item_sk, ss_sold_date,
             CAST(round(ss_ext_list_price * 10000, 0) AS BIGINT)
      FROM store_sales
    ) tmp
    JOIN item ON item_sk = i_item_sk
    JOIN date_dim ON sold_date = d_date
    WHERE i_manufact_id BETWEEN 0 AND 9 AND d_moy = 11 AND d_year = 1997
    GROUP BY i_brand, d_dom
    """,
        "web_sales", "catalog_sales", "store_sales", "item", "date_dim",
    ),
)
def q_tpcds_q71(ds: _DS) -> DataFrame:
    """TPC-DS Q71 (query71.sql): brand revenue by time-of-purchase
    across all three channels UNION ALL'd before the dim joins (the
    reference's hour/minute maps to day-of-month — the derived schema
    has no time dim). The union is projection-only (no shuffle);
    dims broadcast onto it; one shuffle on (brand, dom)."""

    def chan(fact, p):
        return fact.select(
            _C(p + "item_sk").alias("item_sk"),
            _C(p + "sold_date").alias("sold_date"),
            _cents(_C(p + "ext_list_price")).alias("price_c"),
        )

    unioned = (
        chan(ds.web_sales, "ws_")
        .unionByName(chan(ds.catalog_sales, "cs_"))
        .unionByName(chan(ds.store_sales, "ss_"))
    )
    return (
        unioned.join(
            F.broadcast(ds.item.where(_C("i_manufact_id").between(0, 9))),
            _C("item_sk") == _C("i_item_sk"),
        )
        .join(
            F.broadcast(
                ds.date_dim.where((_C("d_moy") == 11) & (_C("d_year") == 1997))
            ),
            _C("sold_date") == _C("d_date"),
        )
        .groupBy("i_brand", "d_dom")
        .agg(
            (F.floor(F.sum("price_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "ext_price"
            )
        )
    )


@_ds_q(
    "tpcds_q72",
    _with(
        """
    SELECT i_item_desc, s_store_name AS warehouse_name, wk,
           CAST(sum(CASE WHEN returned THEN 0 ELSE 1 END) AS BIGINT)
             AS not_returned,
           CAST(sum(CASE WHEN returned THEN 1 ELSE 0 END) AS BIGINT)
             AS returned,
           CAST(count(*) AS BIGINT) AS total_cnt
    FROM (
      SELECT cs_item_sk, cs_warehouse_sk, cs_order_number,
             EXTRACT(WEEK FROM cs_sold_date) AS wk, cs_quantity
      FROM catalog_sales
      WHERE EXTRACT(YEAR FROM cs_sold_date) = 1997
        AND cs_ship_date > cs_sold_date + INTERVAL '5' DAY
    ) c
    JOIN (
      SELECT DISTINCT ws_item_sk, EXTRACT(WEEK FROM ws_sold_date) AS wwk,
             ws_quantity
      FROM web_sales WHERE EXTRACT(YEAR FROM ws_sold_date) = 1997
    ) w ON ws_item_sk = cs_item_sk AND wwk = wk
       AND ws_quantity < cs_quantity
    JOIN item ON cs_item_sk = i_item_sk
    JOIN store ON cs_warehouse_sk = s_store_sk
    LEFT JOIN (SELECT DISTINCT cr_item_sk, cr_order_number
               FROM catalog_returns) r
      ON cr_item_sk = cs_item_sk AND cr_order_number = cs_order_number
    CROSS JOIN LATERAL (SELECT cr_order_number IS NOT NULL AS returned) x
    GROUP BY i_item_desc, s_store_name, wk
    """,
        "catalog_sales", "web_sales", "item", "store", "catalog_returns",
    ),
)
def q_tpcds_q72(ds: _DS) -> DataFrame:
    """TPC-DS Q72 (query72.sql): late-shipping catalog orders whose
    same-week web demand undercut them — the reference's
    inventory-shortfall week-aligned join maps to a catalog-web
    fact-fact join on (item, week), plus ship>sold+5d lateness and a
    LEFT JOIN to returns splitting the counts. The fact-fact join
    rides the natural (item, week) key; dims broadcast."""
    c = (
        ds.catalog_sales.where(
            _year_range(_C("cs_sold_date"), 1997)
            & (_C("cs_ship_date") > F.date_add(_C("cs_sold_date"), 5))
        )
        .select(
            "cs_item_sk", "cs_warehouse_sk", "cs_order_number",
            F.weekofyear("cs_sold_date").alias("wk"), "cs_quantity",
        )
    )
    w = (
        ds.web_sales.where(_year_range(_C("ws_sold_date"), 1997))
        .select(
            "ws_item_sk",
            F.weekofyear("ws_sold_date").alias("wwk"),
            "ws_quantity",
        )
        .distinct()
    )
    r = ds.catalog_returns_slim.select("cr_item_sk", "cr_order_number").distinct()
    return (
        c.join(
            w,
            (_C("ws_item_sk") == _C("cs_item_sk"))
            & (_C("wwk") == _C("wk"))
            & (_C("ws_quantity") < _C("cs_quantity")),
        )
        .join(F.broadcast(ds.item), _C("cs_item_sk") == _C("i_item_sk"))
        .join(F.broadcast(ds.store), _C("cs_warehouse_sk") == _C("s_store_sk"))
        .join(
            r,
            (_C("cr_item_sk") == _C("cs_item_sk"))
            & (_C("cr_order_number") == _C("cs_order_number")),
            "left",
        )
        .withColumn("returned", _C("cr_order_number").isNotNull())
        .groupBy(
            "i_item_desc", _C("s_store_name").alias("warehouse_name"), "wk"
        )
        .agg(
            F.sum(F.when(_C("returned"), 0).otherwise(1))
            .cast("bigint")
            .alias("not_returned"),
            F.sum(F.when(_C("returned"), 1).otherwise(0))
            .cast("bigint")
            .alias("returned"),
            F.count(F.lit(1)).cast("bigint").alias("total_cnt"),
        )
    )


@_ds_q(
    "tpcds_q29",
    _with(
        """
    SELECT i_item_sk, s_store_name,
           CAST(sum(ss_q) AS BIGINT) AS store_sales_quantity,
           CAST(sum(sr_q) AS BIGINT) AS store_returns_quantity,
           CAST(sum(cs_q) AS BIGINT) AS catalog_sales_quantity
    FROM (
      SELECT ss_item_sk AS isk, ss_store_sk,
             CAST(ss_quantity AS BIGINT) AS ss_q,
             CAST(sr_return_quantity AS BIGINT) AS sr_q,
             CAST(cs_quantity AS BIGINT) AS cs_q
      FROM store_sales
      JOIN store_returns ON ss_ticket_number = sr_ticket_number
                        AND ss_item_sk = sr_item_sk
      JOIN catalog_sales ON sr_customer_sk = cs_customer_sk
                        AND sr_item_sk = cs_item_sk
      JOIN date_dim d1 ON ss_sold_date = d1.d_date
      JOIN date_dim d2 ON sr_returned_date = d2.d_date
      JOIN date_dim d3 ON cs_sold_date = d3.d_date
      WHERE d1.d_year = 1995
        AND d2.d_year IN (1995, 1996)
        AND d3.d_year IN (1995, 1996, 1997)
    )
    JOIN item ON isk = i_item_sk
    JOIN store ON ss_store_sk = s_store_sk
    GROUP BY i_item_sk, s_store_name
    """,
        "store_sales", "store_returns", "catalog_sales", "date_dim",
        "item", "store",
    ),
)
def q_tpcds_q29(ds: _DS) -> DataFrame:
    """TPC-DS Q29 (query29.sql): quantity flow through the
    sale->return->catalog-repurchase chain with three date_dim roles
    (1995 sale, return within 2 years, repurchase within 3 years).
    Same natural-key fact-fact chain as q17; exact BIGINT quantity
    sums; all three date roles broadcast."""
    # the three date_dim roles read no d_* column — each is a pushed
    # year range on its fact date; slim returns (customer key implied
    # by the ticket, probed via ss_customer_sk)
    return (
        ds.store_sales.where(_year_range(_C("ss_sold_date"), 1995))
        .join(
            ds.store_returns_slim.where(
                _year_range(_C("sr_returned_date"), 1995, 1996)
            ),
            (_C("ss_ticket_number") == _C("sr_ticket_number"))
            & (_C("ss_item_sk") == _C("sr_item_sk")),
        )
        .join(
            ds.catalog_sales.where(
                _year_range(_C("cs_sold_date"), 1995, 1997)
            ),
            (_C("ss_customer_sk") == _C("cs_customer_sk"))
            & (_C("sr_item_sk") == _C("cs_item_sk")),
        )
        .join(F.broadcast(ds.item), _C("ss_item_sk") == _C("i_item_sk"))
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .groupBy("i_item_sk", "s_store_name")
        .agg(
            F.sum(_C("ss_quantity").cast("bigint"))
            .cast("bigint")
            .alias("store_sales_quantity"),
            F.sum(_C("sr_return_quantity").cast("bigint"))
            .cast("bigint")
            .alias("store_returns_quantity"),
            F.sum(_C("cs_quantity").cast("bigint"))
            .cast("bigint")
            .alias("catalog_sales_quantity"),
        )
    )


@_ds_q(
    "tpcds_q33",
    _with(
        """
    SELECT i_manufact_id,
           floor(sum(total_cents) / 100.0 + 0.5) / 100 AS total_sales
    FROM (SELECT * FROM sst UNION ALL SELECT * FROM cst
          UNION ALL SELECT * FROM wst)
    GROUP BY i_manufact_id
    """,
        "store_sales", "catalog_sales", "web_sales", "item", "date_dim",
        "customer_dim", "customer_address",
        extra="""
    manufs AS (
      SELECT DISTINCT i_manufact_id FROM item WHERE i_category = 'PROMO'),
    sst AS (
      SELECT i_manufact_id,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      JOIN customer_dim ON ss_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE i_manufact_id IN (SELECT i_manufact_id FROM manufs)
        AND d_year = 1998 AND d_moy = 5 AND ca_country = 'ASIA'
      GROUP BY i_manufact_id),
    cst AS (
      SELECT i_manufact_id,
             sum(CAST(round(cs_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM catalog_sales
      JOIN item ON cs_item_sk = i_item_sk
      JOIN date_dim ON cs_sold_date = d_date
      JOIN customer_dim ON cs_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE i_manufact_id IN (SELECT i_manufact_id FROM manufs)
        AND d_year = 1998 AND d_moy = 5 AND ca_country = 'ASIA'
      GROUP BY i_manufact_id),
    wst AS (
      SELECT i_manufact_id,
             sum(CAST(round(ws_net_paid * 10000, 0) AS BIGINT)) AS total_cents
      FROM web_sales
      JOIN item ON ws_item_sk = i_item_sk
      JOIN date_dim ON ws_sold_date = d_date
      JOIN customer_dim ON ws_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE i_manufact_id IN (SELECT i_manufact_id FROM manufs)
        AND d_year = 1998 AND d_moy = 5 AND ca_country = 'ASIA'
      GROUP BY i_manufact_id)
    """,
    ),
)
def q_tpcds_q33(ds: _DS) -> DataFrame:
    """TPC-DS Q33 (query33.sql): per-manufacturer revenue across all
    three channels for manufacturers who make one category, customers
    in one region — the manufacturer-level member of the Q33/Q56/Q60
    family with its IN-subquery manufacturer restriction (a semi-join
    against the tiny distinct manufacturer set)."""
    manufs = (
        ds.item.where(_C("i_category") == "PROMO")
        .select("i_manufact_id")
        .distinct()
    )

    def chan(fact, p):
        return (
            fact.join(
                F.broadcast(
                    ds.item.join(
                        F.broadcast(manufs), "i_manufact_id", "left_semi"
                    )
                ),
                _C(p + "item_sk") == _C("i_item_sk"),
            )
            .join(
                F.broadcast(
                    ds.date_dim.where(
                        (_C("d_year") == 1998) & (_C("d_moy") == 5)
                    )
                ),
                _C(p + "sold_date") == _C("d_date"),
            )
            .join(
                F.broadcast(ds.customer_dim),
                _C(p + "customer_sk") == _C("c_customer_sk"),
            )
            .join(
                F.broadcast(
                    ds.customer_address.where(_C("ca_country") == "ASIA")
                ),
                _C("c_current_addr_sk") == _C("ca_address_sk"),
            )
            .groupBy("i_manufact_id")
            .agg(F.sum(_cents(_C(p + "net_paid"))).alias("total_cents"))
        )

    unioned = (
        chan(ds.store_sales, "ss_")
        .unionByName(chan(ds.catalog_sales, "cs_"))
        .unionByName(chan(ds.web_sales, "ws_"))
    )
    return unioned.groupBy("i_manufact_id").agg(
        (F.floor(F.sum("total_cents") / 100.0 + F.lit(0.5)) / 100).alias(
            "total_sales"
        )
    )


@_ds_q(
    "tpcds_q81",
    _with(
        """
    SELECT c_customer_id, st,
           floor(amt_c / 100.0 + 0.5) / 100 AS return_amt
    FROM (
      SELECT c, st, amt_c,
             avg(CAST(amt_c AS DOUBLE)) OVER (PARTITION BY st) AS st_avg
      FROM (
        SELECT cr_customer_sk AS c, ca_state AS st,
               CAST(sum(CAST(round(cr_return_amt * 10000, 0) AS BIGINT))
                    AS BIGINT) AS amt_c
        FROM catalog_returns
        JOIN customer_dim ON cr_customer_sk = c_customer_sk
        JOIN customer_address ON ca_address_sk = c_current_addr_sk
        JOIN date_dim ON cr_returned_date = d_date
        WHERE d_year = 1998
        GROUP BY cr_customer_sk, ca_state
      )
    ) x
    JOIN customer_dim ON c = c_customer_sk
    WHERE CAST(amt_c AS DOUBLE) > 1.2 * st_avg
      AND st IN ('NATION_0', 'NATION_5', 'NATION_10', 'NATION_15',
                 'NATION_20')
    """,
        "catalog_returns", "customer_dim", "customer_address", "date_dim",
    ),
)
def q_tpcds_q81(ds: _DS) -> DataFrame:
    """TPC-DS Q81 (query81.sql): the catalog twin of Q30 — heavy
    catalog returners vs 1.2x their state average, with customer
    detail output and a state slice. The correlated average
    decorrelates to a window over the per-customer aggregate."""
    per_cust = (
        ds.catalog_returns.join(
            F.broadcast(ds.customer_dim),
            _C("cr_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("ca_address_sk") == _C("c_current_addr_sk"),
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1998)),
            _C("cr_returned_date") == _C("d_date"),
        )
        .groupBy(
            _C("cr_customer_sk").alias("c"), _C("ca_state").alias("st")
        )
        .agg(F.sum(_cents(_C("cr_return_amt"))).alias("amt_c"))
    )
    w = Window.partitionBy("st")
    heavy = (
        per_cust.withColumn(
            "st_avg", F.avg(_C("amt_c").cast("double")).over(w)
        )
        .where(
            (_C("amt_c").cast("double") > 1.2 * _C("st_avg"))
            & _C("st").isin(
                "NATION_0", "NATION_5", "NATION_10", "NATION_15", "NATION_20"
            )
        )
    )
    return heavy.join(
        F.broadcast(ds.customer_dim), _C("c") == _C("c_customer_sk")
    ).select(
        "c_customer_id",
        "st",
        (F.floor(_C("amt_c") / 100.0 + F.lit(0.5)) / 100).alias("return_amt"),
    )


@_ds_q(
    "tpcds_q86",
    _with(
        """
    SELECT floor(paid_c / 100.0 + 0.5) / 100 AS total_sum,
           cat, cls, lochierarchy, rank_within_parent
    FROM (
      SELECT sum(net_c) AS paid_c,
             i_category AS cat, i_class AS cls,
             grouping(i_category) + grouping(i_class) AS lochierarchy,
             rank() OVER (
               PARTITION BY grouping(i_category) + grouping(i_class),
                 CASE WHEN grouping(i_class) = 0 THEN i_category END
               ORDER BY sum(net_c) DESC) AS rank_within_parent
      FROM (
        SELECT CAST(round(ws_net_paid * 10000, 0) AS BIGINT) AS net_c,
               i_category, i_class
        FROM web_sales
        JOIN date_dim ON ws_sold_date = d_date
        JOIN item ON ws_item_sk = i_item_sk
        WHERE d_year = 1997
      )
      GROUP BY ROLLUP (i_category, i_class)
    )
    """,
        "web_sales", "date_dim", "item",
    ),
)
def q_tpcds_q86(ds: _DS) -> DataFrame:
    """TPC-DS Q86 (query86.sql): web revenue rolled up the item
    hierarchy (class -> category -> grand total) with
    rank-within-parent via grouping()-keyed window partitions — the
    item-side twin of Q70 without the semi-join."""
    joined = (
        ds.web_sales.join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("ws_sold_date") == _C("d_date"),
        )
        .join(F.broadcast(ds.item), _C("ws_item_sk") == _C("i_item_sk"))
        .select(
            _cents(_C("ws_net_paid")).alias("net_c"),
            "i_category",
            "i_class",
        )
    )
    rolled = joined.rollup("i_category", "i_class").agg(
        F.sum("net_c").alias("paid_c"),
        (F.grouping("i_category") + F.grouping("i_class")).alias(
            "lochierarchy"
        ),
        F.grouping("i_class").alias("_g_cls"),
    )
    wr = Window.partitionBy(
        "lochierarchy", F.when(_C("_g_cls") == 0, _C("i_category"))
    ).orderBy(_C("paid_c").desc())
    return rolled.select(
        (F.floor(_C("paid_c") / 100.0 + F.lit(0.5)) / 100).alias("total_sum"),
        _C("i_category").alias("cat"),
        _C("i_class").alias("cls"),
        "lochierarchy",
        F.rank().over(wr).alias("rank_within_parent"),
    )


@_ds_q(
    "tpcds_q91",
    _with(
        """
    SELECT s_store_name AS warehouse_name, s_state,
           floor(sum(CAST(round(cr_return_amt * 10000, 0) AS BIGINT))
                 / 100.0 + 0.5) / 100 AS returns_loss
    FROM catalog_returns
    JOIN store ON cr_warehouse_sk = s_store_sk
    JOIN date_dim ON cr_returned_date = d_date
    JOIN customer_dim ON cr_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    WHERE d_year = 1995
      AND c_preferred_flag = 'Y'
      AND c_segment IN ('FURNITURE', 'MACHINERY', 'AUTOMOBILE')
      AND ca_country = 'EUROPE'
    GROUP BY s_store_name, s_state
    """,
        "catalog_returns", "store", "date_dim", "customer_dim",
        "customer_address",
    ),
)
def q_tpcds_q91(ds: _DS) -> DataFrame:
    """TPC-DS Q91 (query91.sql): yearly catalog return losses per
    warehouse for a demographic slice (the reference's call_center +
    demographics map to the warehouse dim + customer_dim flags).
    Pure star agg: every dim broadcasts, one shuffle on the
    warehouse key."""
    return (
        ds.catalog_returns.join(
            F.broadcast(ds.store), _C("cr_warehouse_sk") == _C("s_store_sk")
        )
        .join(
            F.broadcast(
                ds.date_dim.where(_C("d_year") == 1995)
            ),
            _C("cr_returned_date") == _C("d_date"),
        )
        .join(
            F.broadcast(
                ds.customer_dim.where(
                    (_C("c_preferred_flag") == "Y")
                    & _C("c_segment").isin(
                        "FURNITURE", "MACHINERY", "AUTOMOBILE"
                    )
                )
            ),
            _C("cr_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(
                ds.customer_address.where(_C("ca_country") == "EUROPE")
            ),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .groupBy(_C("s_store_name").alias("warehouse_name"), _C("s_state"))
        .agg(
            (
                F.floor(
                    F.sum(_cents(_C("cr_return_amt"))) / 100.0 + F.lit(0.5)
                )
                / 100
            ).alias("returns_loss")
        )
    )


@_ds_q(
    "tpcds_q96",
    _with(
        """
    SELECT CAST(count(*) AS BIGINT) AS cnt
    FROM store_sales
    JOIN store ON ss_store_sk = s_store_sk
    WHERE date_diff('day', DATE '1995-01-01', ss_sold_date) % 7 = 1
      AND ss_quantity BETWEEN 45 AND 50
      AND s_market_id = 5
    """,
        "store_sales", "store",
    ),
)
def q_tpcds_q96(ds: _DS) -> DataFrame:
    """TPC-DS Q96 (query96.sql): a bare selective count — bulk
    Monday purchases in one store market (the reference's
    time-of-day/household filters map to day-of-week + quantity
    band). Day-of-week is days-since-a-known-epoch mod 7, the same
    engine-neutral arithmetic as Q43."""
    dow = F.datediff(_C("ss_sold_date"), F.lit("1995-01-01").cast("date")) % 7
    return (
        ds.store_sales.join(
            F.broadcast(ds.store.where(_C("s_market_id") == 5)),
            _C("ss_store_sk") == _C("s_store_sk"),
        )
        .where((dow == 1) & _C("ss_quantity").between(45, 50))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


@_ds_q(
    "tpcds_q8",
    _with(
        """
    SELECT s_store_name,
           floor(sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT))
                 / 100.0 + 0.5) / 100 AS net_paid
    FROM store_sales
    JOIN date_dim ON ss_sold_date = d_date
    JOIN store ON ss_store_sk = s_store_sk
    WHERE d_qoy = 2 AND d_year = 1997
      AND substr(s_state, 1, 8) IN (
        SELECT substr(st, 1, 8) FROM (
          SELECT st FROM (VALUES ('NATION_0'),('NATION_2'),('NATION_4'),
            ('NATION_6'),('NATION_8'),('NATION_10'),('NATION_11'),
            ('NATION_12'),('NATION_14'),('NATION_16'),('NATION_17'),
            ('NATION_18'),('NATION_20'),('NATION_22'),('NATION_24')
          ) t(st)
          INTERSECT
          SELECT ca_state FROM customer_dim
          JOIN customer_address ON c_current_addr_sk = ca_address_sk
          WHERE c_preferred_flag = 'Y'
          GROUP BY ca_state HAVING count(*) > 3))
    GROUP BY s_store_name
    """,
        "store_sales", "date_dim", "store", "customer_dim",
        "customer_address",
    ),
)
def q_tpcds_q8(ds: _DS) -> DataFrame:
    """TPC-DS Q8 (query8.sql): quarterly store revenue limited to
    stores whose state prefix appears in BOTH a literal state list
    AND the states with enough preferred customers — the INTERSECT of
    a VALUES relation with a HAVING-filtered aggregate, semi-joined
    into the star on a computed prefix key (the reference's zip-prefix
    maps to the state-name prefix)."""
    literal = (
        ds.t.nation.select(_C("n_name").alias("st"))
        .where(
            _C("st").isin(
                "NATION_0", "NATION_2", "NATION_4", "NATION_6", "NATION_8",
                "NATION_10", "NATION_11", "NATION_12", "NATION_14",
                "NATION_16", "NATION_17", "NATION_18", "NATION_20",
                "NATION_22", "NATION_24",
            )
        )
        .distinct()
    )
    pref = (
        ds.customer_dim.where(_C("c_preferred_flag") == "Y")
        .join(
            F.broadcast(ds.customer_address),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .groupBy(_C("ca_state").alias("st"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(_C("n") > 3)
        .select("st")
    )
    v1 = literal.intersect(pref).select(
        F.substring("st", 1, 8).alias("st8")
    ).distinct()
    return (
        ds.store_sales.join(
            F.broadcast(
                ds.date_dim.where((_C("d_qoy") == 2) & (_C("d_year") == 1997))
            ),
            _C("ss_sold_date") == _C("d_date"),
        )
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .join(
            F.broadcast(v1),
            F.substring("s_state", 1, 8) == _C("st8"),
            "left_semi",
        )
        .groupBy("s_store_name")
        .agg(_exact_money_sum(_C("ss_net_paid")).alias("net_paid"))
    )


@_ds_q(
    "tpcds_q77",
    _with(
        """
    SELECT channel, id,
           floor(sum(sales_c) / 100.0 + 0.5) / 100 AS sales,
           floor(sum(ret_c) / 100.0 + 0.5) / 100 AS returns,
           floor(sum(prof_c) / 100.0 + 0.5) / 100 AS profit
    FROM (
      SELECT 'store channel' AS channel, ss.sk AS id, sales_c,
             coalesce(ret_c, 0) AS ret_c,
             prof_c - coalesce(ret_c, 0) AS prof_c
      FROM ss LEFT JOIN sr ON ss.sk = sr.sk
      UNION ALL
      SELECT 'catalog channel', coalesce(cs.sk, cr.sk),
             coalesce(sales_c, 0), coalesce(ret_c, 0),
             coalesce(prof_c, 0) - coalesce(ret_c, 0)
      FROM cs FULL OUTER JOIN cr ON cs.sk = cr.sk
      UNION ALL
      SELECT 'web channel', ws.sk, sales_c, coalesce(ret_c, 0),
             prof_c - coalesce(ret_c, 0)
      FROM ws LEFT JOIN wr ON ws.sk = wr.sk
    )
    GROUP BY ROLLUP (channel, id)
    """,
        "store_sales", "store_returns", "catalog_sales", "catalog_returns",
        "web_sales", "web_returns",
        extra="""
    ss AS (
      SELECT ss_store_sk AS sk,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS sales_c,
             sum(CAST(round(ss_net_profit * 10000, 0) AS BIGINT)) AS prof_c
      FROM store_sales
      WHERE ss_sold_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
      GROUP BY ss_store_sk),
    sr AS (
      SELECT sr_store_sk AS sk,
             sum(CAST(round(sr_return_amt * 10000, 0) AS BIGINT)) AS ret_c
      FROM store_returns
      WHERE sr_returned_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
      GROUP BY sr_store_sk),
    cs AS (
      SELECT cs_warehouse_sk AS sk,
             sum(CAST(round(cs_net_paid * 10000, 0) AS BIGINT)) AS sales_c,
             sum(CAST(round(cs_net_profit * 10000, 0) AS BIGINT)) AS prof_c
      FROM catalog_sales
      WHERE cs_sold_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
      GROUP BY cs_warehouse_sk),
    cr AS (
      SELECT cr_warehouse_sk AS sk,
             sum(CAST(round(cr_return_amt * 10000, 0) AS BIGINT)) AS ret_c
      FROM catalog_returns
      WHERE cr_returned_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
      GROUP BY cr_warehouse_sk),
    ws AS (
      SELECT ws_warehouse_sk AS sk,
             sum(CAST(round(ws_net_paid * 10000, 0) AS BIGINT)) AS sales_c,
             sum(CAST(round(ws_net_profit * 10000, 0) AS BIGINT)) AS prof_c
      FROM web_sales
      WHERE ws_sold_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
      GROUP BY ws_warehouse_sk),
    wr AS (
      SELECT wr_warehouse_sk AS sk,
             sum(CAST(round(wr_return_amt * 10000, 0) AS BIGINT)) AS ret_c
      FROM web_returns
      WHERE wr_returned_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
      GROUP BY wr_warehouse_sk)
    """,
    ),
)
def q_tpcds_q77(ds: _DS) -> DataFrame:
    """TPC-DS Q77 (query77.sql): the cross-channel P&L — per-channel
    sales/returns/profit in one month (store: LEFT JOIN returns;
    catalog: FULL OUTER, returns can exist without sales at a
    warehouse; web: LEFT JOIN), UNION ALL'd and rolled up over
    (channel, location). Six tiny aggregates feed the rollup; the
    only fact-scan shuffles are the six per-location aggs."""
    lo, hi = "1995-03-01", "1995-03-31"

    def sales_agg(fact, p, loc):
        return (
            fact.where(_C(p + "sold_date").between(lo, hi))
            .groupBy(_C(p + loc).alias("sk"))
            .agg(
                F.sum(_cents(_C(p + "net_paid"))).alias("sales_c"),
                F.sum(_cents(_C(p + "net_profit"))).alias("prof_c"),
            )
        )

    def ret_agg(fact, p, loc):
        return (
            fact.where(_C(p + "returned_date").between(lo, hi))
            .groupBy(_C(p + loc).alias("rk"))
            .agg(F.sum(_cents(_C(p + "return_amt"))).alias("ret_c"))
        )

    ss = sales_agg(ds.store_sales, "ss_", "store_sk")
    sr = ret_agg(ds.store_returns_slim, "sr_", "store_sk")
    cs = sales_agg(ds.catalog_sales, "cs_", "warehouse_sk")
    cr = ret_agg(ds.catalog_returns_slim, "cr_", "warehouse_sk")
    ws = sales_agg(ds.web_sales, "ws_", "warehouse_sk")
    wr = ret_agg(ds.web_returns_slim, "wr_", "warehouse_sk")

    store = ss.join(sr, _C("sk") == _C("rk"), "left").select(
        F.lit("store channel").alias("channel"),
        _C("sk").alias("id"),
        _C("sales_c"),
        F.coalesce(_C("ret_c"), F.lit(0)).alias("ret_c"),
        (_C("prof_c") - F.coalesce(_C("ret_c"), F.lit(0))).alias("prof_c"),
    )
    catalog = cs.join(cr, _C("sk") == _C("rk"), "full_outer").select(
        F.lit("catalog channel").alias("channel"),
        F.coalesce(_C("sk"), _C("rk")).alias("id"),
        F.coalesce(_C("sales_c"), F.lit(0)).alias("sales_c"),
        F.coalesce(_C("ret_c"), F.lit(0)).alias("ret_c"),
        (
            F.coalesce(_C("prof_c"), F.lit(0))
            - F.coalesce(_C("ret_c"), F.lit(0))
        ).alias("prof_c"),
    )
    web = ws.join(wr, _C("sk") == _C("rk"), "left").select(
        F.lit("web channel").alias("channel"),
        _C("sk").alias("id"),
        _C("sales_c"),
        F.coalesce(_C("ret_c"), F.lit(0)).alias("ret_c"),
        (_C("prof_c") - F.coalesce(_C("ret_c"), F.lit(0))).alias("prof_c"),
    )
    return (
        store.unionByName(catalog)
        .unionByName(web)
        .rollup("channel", "id")
        .agg(
            (F.floor(F.sum("sales_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "sales"
            ),
            (F.floor(F.sum("ret_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "returns"
            ),
            (F.floor(F.sum("prof_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "profit"
            ),
        )
    )


@_ds_q(
    "tpcds_q80",
    _with(
        """
    SELECT channel, id,
           floor(sum(sales_c) / 100.0 + 0.5) / 100 AS sales,
           floor(sum(ret_c) / 100.0 + 0.5) / 100 AS returns,
           floor(sum(prof_c) / 100.0 + 0.5) / 100 AS profit
    FROM (
      SELECT 'store channel' AS channel, s_store_name AS id,
             CAST(round(ss_net_paid * 10000, 0) AS BIGINT) AS sales_c,
             coalesce(CAST(round(sr_return_amt * 10000, 0) AS BIGINT), 0)
               AS ret_c,
             CAST(round(ss_net_profit * 10000, 0) AS BIGINT)
               - coalesce(CAST(round(sr_return_amt * 10000, 0) AS BIGINT), 0)
               AS prof_c
      FROM store_sales
      LEFT JOIN store_returns ON ss_item_sk = sr_item_sk
                             AND ss_ticket_number = sr_ticket_number
      JOIN store ON ss_store_sk = s_store_sk
      JOIN item ON ss_item_sk = i_item_sk
      WHERE ss_sold_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
        AND i_current_price > 905
      UNION ALL
      SELECT 'catalog channel', st.s_store_name,
             CAST(round(cs_net_paid * 10000, 0) AS BIGINT),
             coalesce(CAST(round(cr_return_amt * 10000, 0) AS BIGINT), 0),
             CAST(round(cs_net_profit * 10000, 0) AS BIGINT)
               - coalesce(CAST(round(cr_return_amt * 10000, 0) AS BIGINT), 0)
      FROM catalog_sales
      LEFT JOIN catalog_returns ON cs_item_sk = cr_item_sk
                               AND cs_order_number = cr_order_number
      JOIN store st ON cs_warehouse_sk = st.s_store_sk
      JOIN item ON cs_item_sk = i_item_sk
      WHERE cs_sold_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
        AND i_current_price > 905
      UNION ALL
      SELECT 'web channel', sw.s_store_name,
             CAST(round(ws_net_paid * 10000, 0) AS BIGINT),
             coalesce(CAST(round(wr_return_amt * 10000, 0) AS BIGINT), 0),
             CAST(round(ws_net_profit * 10000, 0) AS BIGINT)
               - coalesce(CAST(round(wr_return_amt * 10000, 0) AS BIGINT), 0)
      FROM web_sales
      LEFT JOIN web_returns ON ws_item_sk = wr_item_sk
                           AND ws_order_number = wr_order_number
      JOIN store sw ON ws_warehouse_sk = sw.s_store_sk
      JOIN item ON ws_item_sk = i_item_sk
      WHERE ws_sold_date BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
        AND i_current_price > 905
    )
    GROUP BY ROLLUP (channel, id)
    """,
        "store_sales", "store_returns", "catalog_sales", "catalog_returns",
        "web_sales", "web_returns", "store", "item",
    ),
)
def q_tpcds_q80(ds: _DS) -> DataFrame:
    """TPC-DS Q80 (query80.sql): line-level cross-channel P&L — each
    channel LEFT JOINs its returns on the natural line key, filters
    to pricey items, and the union rolls up over (channel, location
    name). Unlike Q77's pre-aggregated P&L, the returns netting here
    happens per line before any aggregation."""
    lo, hi = "1995-03-01", "1995-03-31"
    pricey = ds.item.where(_C("i_current_price") > 905).select("i_item_sk")

    # Fused plan (oracle keeps the textbook per-channel CTEs): each
    # channel's returns table is the R-flagged subset of the same
    # lineitem slice and the rollup only ever SUMS the per-pair
    # columns, so the three fact⋈returns joins collapse to one
    # lineitem pass LEFT-joined to a pre-aggregated returns summary
    # keyed (channel, order, item) — per sales row s with n matching
    # returns the pair-sums are
    #     Σ sales_c = max(n,1)·cents(net_paid_s)
    #     Σ ret_c   = Σ_{R rows in g} cents(return_amt)
    #     Σ prof_c  = max(n,1)·cents(net_profit_s) − Σ ret_c
    # (cents() per VALUE ⇒ linear). The returns side needs no orders
    # or date filter, the sales side joins orders once (March-1995
    # keys only): 2 lineitem scans + 1 orders scan + 1 narrow join
    # vs 6 fact/returns derivations (6 lineitem + 6 orders scans) +
    # 3 fan-out channel joins.
    l, o = ds.t.lineitem, ds.t.orders
    net = _C("l_extendedprice") * (1 - _C("l_discount"))
    prof = net - _C("l_extendedprice") * 0.8
    ch = _C("l_linenumber") % 3
    rg = (
        l.where(_C("l_returnflag") == "R")
        .select(
            ch.alias("__rch"),
            _C("l_orderkey").alias("__rok"),
            _C("l_partkey").alias("__rpk"),
            _cents(net).alias("__ret_c"),
        )
        .groupBy("__rch", "__rok", "__rpk")
        .agg(
            F.count(F.lit(1)).alias("__nr"),
            F.sum("__ret_c").alias("__ret_sum"),
        )
    )
    unioned = (
        l.select(
            ch.alias("__ch"),
            "l_orderkey",
            _C("l_partkey").alias("__pk"),
            _C("l_suppkey").alias("__loc"),
            _cents(net).alias("__paid_c"),
            _cents(prof).alias("__prof_c"),
        )
        .join(
            o.where(_C("o_orderdate").cast("date").between(lo, hi)).select(
                "o_orderkey"
            ),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .join(
            rg,
            (_C("__ch") == _C("__rch"))
            & (_C("l_orderkey") == _C("__rok"))
            & (_C("__pk") == _C("__rpk")),
            "left",
        )
        .join(F.broadcast(ds.store), _C("__loc") == _C("s_store_sk"))
        .join(F.broadcast(pricey), _C("__pk") == _C("i_item_sk"))
        .select(
            F.element_at(
                F.array(
                    F.lit("store channel"),
                    F.lit("catalog channel"),
                    F.lit("web channel"),
                ),
                (_C("__ch") + 1).cast("int"),
            ).alias("channel"),
            _C("s_store_name").alias("id"),
            (
                F.greatest(F.coalesce(_C("__nr"), F.lit(0)), F.lit(1))
                * _C("__paid_c")
            ).alias("sales_c"),
            F.coalesce(_C("__ret_sum"), F.lit(0)).alias("ret_c"),
            (
                F.greatest(F.coalesce(_C("__nr"), F.lit(0)), F.lit(1))
                * _C("__prof_c")
                - F.coalesce(_C("__ret_sum"), F.lit(0))
            ).alias("prof_c"),
        )
    )
    return unioned.rollup("channel", "id").agg(
        (F.floor(F.sum("sales_c") / 100.0 + F.lit(0.5)) / 100).alias("sales"),
        (F.floor(F.sum("ret_c") / 100.0 + F.lit(0.5)) / 100).alias("returns"),
        (F.floor(F.sum("prof_c") / 100.0 + F.lit(0.5)) / 100).alias("profit"),
    )


@_ds_q(
    "tpcds_q83",
    _with(
        """
    SELECT sr.item_sk AS item_sk,
           sr_qty, cr_qty, wr_qty,
           round(sr_qty * 100.0 / ((sr_qty + cr_qty + wr_qty) / 3.0), 4)
             AS sr_dev,
           round(cr_qty * 100.0 / ((sr_qty + cr_qty + wr_qty) / 3.0), 4)
             AS cr_dev,
           round(wr_qty * 100.0 / ((sr_qty + cr_qty + wr_qty) / 3.0), 4)
             AS wr_dev
    FROM sr JOIN cr ON sr.item_sk = cr.item_sk
    JOIN wr ON sr.item_sk = wr.item_sk
    """,
        "store_returns", "catalog_returns", "web_returns", "date_dim",
        extra="""
    months AS (
      SELECT DISTINCT d_moy, d_year FROM date_dim
      WHERE d_date IN (DATE '1995-02-10', DATE '1995-06-20',
                       DATE '1995-09-15')),
    sr AS (
      SELECT sr_item_sk AS item_sk,
             CAST(sum(CAST(sr_return_quantity AS BIGINT)) AS BIGINT)
               AS sr_qty
      FROM store_returns
      JOIN date_dim ON sr_returned_date = d_date
      JOIN months USING (d_moy, d_year)
      GROUP BY sr_item_sk),
    cr AS (
      SELECT cr_item_sk AS item_sk,
             CAST(sum(CAST(cr_return_quantity AS BIGINT)) AS BIGINT)
               AS cr_qty
      FROM catalog_returns
      JOIN date_dim ON cr_returned_date = d_date
      JOIN months USING (d_moy, d_year)
      GROUP BY cr_item_sk),
    wr AS (
      SELECT wr_item_sk AS item_sk,
             CAST(sum(CAST(wr_return_quantity AS BIGINT)) AS BIGINT)
               AS wr_qty
      FROM web_returns
      JOIN date_dim ON wr_returned_date = d_date
      JOIN months USING (d_moy, d_year)
      GROUP BY wr_item_sk)
    """,
    ),
)
def q_tpcds_q83(ds: _DS) -> DataFrame:
    """TPC-DS Q83 (query83.sql): items returned through ALL three
    channels in the calendar periods containing three chosen dates
    (the reference's week_seq subquery maps to month periods), with
    each channel's share of the three-channel average. Three tiny
    per-item return aggs inner-joined on the item key."""
    # the chosen dates are literals, so the months CTE is the
    # constant set {(1995,2), (1995,6), (1995,9)} and the dd equi-join
    # (1:1 on a date present by construction) is exactly a month-range
    # predicate on the return date — both date_dim derivations drop
    # out of the plan; slim returns (no customer column is read)
    def in_months(c):
        pred = None
        for m in (2, 6, 9):
            lo = F.lit(f"1995-{m:02d}-01").cast("date")
            hi = F.lit(f"1995-{m + 1:02d}-01").cast("date")
            leg = (c >= lo) & (c < hi)
            pred = leg if pred is None else (pred | leg)
        return pred

    def chan(rets, p, out):
        return (
            rets.where(in_months(_C(p + "returned_date")))
            .groupBy(_C(p + "item_sk").alias("item_sk"))
            .agg(
                F.sum(_C(p + "return_quantity").cast("bigint"))
                .cast("bigint")
                .alias(out)
            )
        )

    sr = chan(ds.store_returns_slim, "sr_", "sr_qty")
    cr = chan(ds.catalog_returns_slim, "cr_", "cr_qty")
    wr = chan(ds.web_returns_slim, "wr_", "wr_qty")
    joined = sr.join(cr, "item_sk").join(wr, "item_sk")
    avg3 = (_C("sr_qty") + _C("cr_qty") + _C("wr_qty")) / 3.0
    return joined.select(
        "item_sk", "sr_qty", "cr_qty", "wr_qty",
        F.round(_C("sr_qty") * 100.0 / avg3, 4).alias("sr_dev"),
        F.round(_C("cr_qty") * 100.0 / avg3, 4).alias("cr_dev"),
        F.round(_C("wr_qty") * 100.0 / avg3, 4).alias("wr_dev"),
    )


@_ds_q(
    "tpcds_q94",
    _with(
        """
    SELECT CAST(count(DISTINCT ord) AS BIGINT) AS order_count,
           floor(coalesce(sum(ship_c), 0) / 100.0 + 0.5) / 100
             AS total_shipping_cost,
           floor(coalesce(sum(prof_c), 0) / 100.0 + 0.5) / 100
             AS total_net_profit
    FROM (
      SELECT ws_order_number AS ord,
             CAST(round(ws_ext_ship_cost * 10000, 0) AS BIGINT) AS ship_c,
             CAST(round(ws_net_profit * 10000, 0) AS BIGINT) AS prof_c
      FROM web_sales ws1
      JOIN customer_dim ON ws_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE ws_ship_date BETWEEN DATE '1995-02-01' AND DATE '1995-04-02'
        AND ca_country = 'AMERICA'
        AND ws_order_number IN (
          SELECT ws_order_number FROM web_sales
          GROUP BY ws_order_number
          HAVING count(DISTINCT ws_warehouse_sk) > 1)
        AND NOT EXISTS (
          SELECT 1 FROM web_returns
          WHERE wr_order_number = ws1.ws_order_number)
    )
    """,
        "web_sales", "web_returns", "customer_dim", "customer_address",
    ),
)
def q_tpcds_q94(ds: _DS) -> DataFrame:
    """TPC-DS Q94 (query94.sql): web orders shipped in a 60-day
    window to one region, split across more than one warehouse
    (EXISTS a different-warehouse line -> distinct-count semi-join)
    and never returned (anti-join). count(DISTINCT order) plus
    exact-cent cost sums."""
    # the multi-warehouse probe reads only lineitem columns (order =
    # l_orderkey, warehouse = l_suppkey), so it skips the fact's
    # orders join entirely
    multi_wh = (
        ds.t.lineitem.where(_C("l_linenumber") % 3 == 2)
        .groupBy(_C("l_orderkey").alias("ws_order_number"))
        .agg(F.countDistinct("l_suppkey").alias("nw"))
        .where(_C("nw") > 1)
        .select("ws_order_number")
    )
    base = (
        ds.web_sales.where(
            _C("ws_ship_date").between("1995-02-01", "1995-04-02")
        )
        .join(
            F.broadcast(ds.customer_dim),
            _C("ws_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(
                ds.customer_address.where(_C("ca_country") == "AMERICA")
            ),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .join(multi_wh, "ws_order_number", "left_semi")
        .join(
            ds.web_returns_slim.select(
                _C("wr_order_number").alias("ws_order_number")
            ),
            "ws_order_number",
            "left_anti",
        )
    )
    return base.select(
        _C("ws_order_number").alias("ord"),
        _cents(_C("ws_ext_ship_cost")).alias("ship_c"),
        _cents(_C("ws_net_profit")).alias("prof_c"),
    ).agg(
        F.countDistinct("ord").cast("bigint").alias("order_count"),
        (
            F.floor(
                F.coalesce(F.sum("ship_c"), F.lit(0)) / 100.0 + F.lit(0.5)
            )
            / 100
        ).alias("total_shipping_cost"),
        (
            F.floor(
                F.coalesce(F.sum("prof_c"), F.lit(0)) / 100.0 + F.lit(0.5)
            )
            / 100
        ).alias("total_net_profit"),
    )


@_ds_q(
    "tpcds_q99",
    _with(
        """
    SELECT s_store_name AS warehouse_name, d_moy,
           CAST(sum(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS d30,
           CAST(sum(CASE WHEN lag > 30 AND lag <= 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS d60,
           CAST(sum(CASE WHEN lag > 60 AND lag <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS d90,
           CAST(sum(CASE WHEN lag > 90 AND lag <= 120 THEN 1 ELSE 0 END)
                AS BIGINT) AS d120,
           CAST(sum(CASE WHEN lag > 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS d120plus
    FROM (
      SELECT ws_warehouse_sk, ws_sold_date,
             date_diff('day', ws_sold_date, ws_ship_date) AS lag
      FROM web_sales
      WHERE EXTRACT(YEAR FROM ws_ship_date) = 1997
    )
    JOIN store ON ws_warehouse_sk = s_store_sk
    JOIN date_dim ON ws_sold_date = d_date
    GROUP BY s_store_name, d_moy
    """,
        "web_sales", "store", "date_dim",
    ),
)
def q_tpcds_q99(ds: _DS) -> DataFrame:
    """TPC-DS Q99 (query99.sql): the shipping-latency bucket matrix
    per warehouse and order month for the web channel (Q62 covers
    catalog) — five conditional counts in one pass over the
    ship-year slice; the warehouse and date dims broadcast."""
    lag = F.datediff(_C("ws_ship_date"), _C("ws_sold_date"))
    return (
        ds.web_sales.where(_year_range(_C("ws_ship_date"), 1997))
        .select("ws_warehouse_sk", "ws_sold_date", lag.alias("lag"))
        .join(F.broadcast(ds.store), _C("ws_warehouse_sk") == _C("s_store_sk"))
        .join(F.broadcast(ds.date_dim), _C("ws_sold_date") == _C("d_date"))
        .groupBy(_C("s_store_name").alias("warehouse_name"), _C("d_moy"))
        .agg(
            F.sum(F.when(_C("lag") <= 30, 1).otherwise(0))
            .cast("bigint")
            .alias("d30"),
            F.sum(F.when((_C("lag") > 30) & (_C("lag") <= 60), 1).otherwise(0))
            .cast("bigint")
            .alias("d60"),
            F.sum(F.when((_C("lag") > 60) & (_C("lag") <= 90), 1).otherwise(0))
            .cast("bigint")
            .alias("d90"),
            F.sum(
                F.when((_C("lag") > 90) & (_C("lag") <= 120), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("d120"),
            F.sum(F.when(_C("lag") > 120, 1).otherwise(0))
            .cast("bigint")
            .alias("d120plus"),
        )
    )


@_ds_q(
    "tpcds_q18",
    _with(
        f"""
    SELECT ca_country, ca_state,
           {_exact_avg_sql('cs_quantity', 100)} AS agg1,
           {_exact_avg_sql('cs_ext_list_price', 10000)} AS agg2,
           {_exact_avg_sql('cs_ext_discount_amt', 10000)} AS agg3,
           {_exact_avg_sql('cs_net_paid', 10000)} AS agg4
    FROM catalog_sales
    JOIN customer_dim ON cs_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN date_dim ON cs_sold_date = d_date
    WHERE d_year = 1997
      AND c_customer_sk % 12 IN (0, 1, 5, 7, 8, 11)
      AND c_segment IN ('BUILDING', 'HOUSEHOLD')
    GROUP BY ROLLUP (ca_country, ca_state)
    """,
        "catalog_sales", "customer_dim", "customer_address", "date_dim",
    ),
)
def q_tpcds_q18(ds: _DS) -> DataFrame:
    """TPC-DS Q18 (query18.sql): catalog purchase averages for a
    demographic slice (the reference's birth-month list maps to a
    customer-key residue class, its cd filters to segment), rolled up
    the geography hierarchy. Four exact-integer-sum averages per
    rollup level in one Expand pass."""
    return (
        ds.catalog_sales.join(
            F.broadcast(
                ds.customer_dim.where(
                    (_C("c_customer_sk") % 12).isin(0, 1, 5, 7, 8, 11)
                    & _C("c_segment").isin("BUILDING", "HOUSEHOLD")
                )
            ),
            _C("cs_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1997)),
            _C("cs_sold_date") == _C("d_date"),
        )
        .rollup("ca_country", "ca_state")
        .agg(
            _exact_avg(_C("cs_quantity"), 100).alias("agg1"),
            _exact_avg(_C("cs_ext_list_price"), 10000).alias("agg2"),
            _exact_avg(_C("cs_ext_discount_amt"), 10000).alias("agg3"),
            _exact_avg(_C("cs_net_paid"), 10000).alias("agg4"),
        )
    )


@_ds_q(
    "tpcds_q24",
    _with(
        """
    SELECT cust, store_name,
           floor(paid_c / 100.0 + 0.5) / 100 AS paid
    FROM (
      SELECT cust, store_name, sum(netpaid_c) AS paid_c
      FROM ssales
      WHERE sz BETWEEN 1 AND 10
      GROUP BY cust, store_name
    )
    WHERE CAST(paid_c AS DOUBLE) >
      (SELECT 0.05 * avg(CAST(netpaid_c AS DOUBLE)) FROM ssales)
    """,
        "store_sales", "store_returns", "store", "item", "customer_dim",
        "customer_address",
        extra="""
    ssales AS (
      SELECT c_customer_id AS cust, s_store_name AS store_name,
             i_size AS sz,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS netpaid_c
      FROM store_sales
      JOIN store_returns ON ss_ticket_number = sr_ticket_number
                        AND ss_item_sk = sr_item_sk
      JOIN store ON ss_store_sk = s_store_sk
      JOIN item ON ss_item_sk = i_item_sk
      JOIN customer_dim ON ss_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE s_state = ca_state
      GROUP BY c_customer_id, s_store_name, i_size)
    """,
    ),
)
def q_tpcds_q24(ds: _DS) -> DataFrame:
    """TPC-DS Q24 (query24a.sql): returned store purchases by
    customers who live in the store's state, grouped with item size
    (the reference's color), then filtered to small sizes and kept
    only when the customer-store total beats 5% of the corpus-wide
    average — an uncorrelated scalar subquery broadcast as a 1-row
    build (the same constant-size BNLJ shape as Q23)."""
    ssales = (
        ds.store_sales.join(
            # slim returns: only the (ticket, item) join keys are read
            ds.store_returns_slim,
            (_C("ss_ticket_number") == _C("sr_ticket_number"))
            & (_C("ss_item_sk") == _C("sr_item_sk")),
        )
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .join(F.broadcast(ds.item), _C("ss_item_sk") == _C("i_item_sk"))
        .join(
            F.broadcast(ds.customer_dim),
            _C("ss_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .where(_C("s_state") == _C("ca_state"))
        .groupBy(
            _C("c_customer_id").alias("cust"),
            _C("s_store_name").alias("store_name"),
            _C("i_size").alias("sz"),
        )
        .agg(F.sum(_cents(_C("ss_net_paid"))).alias("netpaid_c"))
    )
    # ssales feeds both the scalar threshold and the main leg: pin the
    # small per-(customer, store, size) decision table once (guide §5)
    # instead of re-executing the 6-way join lineage per consumer
    ssales = ssales.coalesce(
        ds.t.spark.sparkContext.defaultParallelism
    ).localCheckpoint(eager=True)
    threshold = ssales.agg(
        (0.05 * F.avg(_C("netpaid_c").cast("double"))).alias("thr")
    )
    return (
        ssales.where(_C("sz").between(1, 10))
        .groupBy("cust", "store_name")
        .agg(F.sum("netpaid_c").alias("paid_c"))
        .join(F.broadcast(threshold))
        .where(_C("paid_c").cast("double") > _C("thr"))
        .select(
            "cust", "store_name",
            (F.floor(_C("paid_c") / 100.0 + F.lit(0.5)) / 100).alias("paid"),
        )
    )


@_ds_q(
    "tpcds_q79",
    _with(
        """
    SELECT c_customer_id, s_state, ticket,
           floor(amt_c / 100.0 + 0.5) / 100 AS coupon_amt,
           floor(prof_c / 100.0 + 0.5) / 100 AS profit
    FROM (
      SELECT ss_ticket_number AS ticket, ss_customer_sk AS cust,
             s_state,
             sum(CAST(round(ss_ext_discount_amt * 10000, 0) AS BIGINT))
               AS amt_c,
             sum(CAST(round(ss_net_profit * 10000, 0) AS BIGINT)) AS prof_c
      FROM store_sales
      JOIN date_dim ON ss_sold_date = d_date
      JOIN store ON ss_store_sk = s_store_sk
      WHERE date_diff('day', DATE '1995-01-01', ss_sold_date) % 7 = 1
        AND d_year IN (1996, 1997, 1998)
        AND s_market_id BETWEEN 2 AND 7
      GROUP BY ss_ticket_number, ss_customer_sk, s_state
    )
    JOIN customer_dim ON cust = c_customer_sk
    WHERE c_preferred_flag = 'Y' OR c_segment = 'AUTOMOBILE'
    """,
        "store_sales", "date_dim", "store", "customer_dim",
    ),
)
def q_tpcds_q79(ds: _DS) -> DataFrame:
    """TPC-DS Q79 (query79.sql): per-ticket Monday coupon totals and
    profit in mid-market stores for a household slice (the
    reference's hd filters map to preferred/segment flags; Monday is
    the engine-neutral epoch-mod-7 arithmetic from Q43). Ticket-level
    natural-key agg, then the customer dim joins the aggregate."""
    dow = F.datediff(_C("ss_sold_date"), F.lit("1995-01-01").cast("date")) % 7
    tickets = (
        ds.store_sales.join(
            F.broadcast(
                ds.date_dim.where(_C("d_year").isin(1996, 1997, 1998))
            ),
            _C("ss_sold_date") == _C("d_date"),
        )
        .join(
            F.broadcast(ds.store.where(_C("s_market_id").between(2, 7))),
            _C("ss_store_sk") == _C("s_store_sk"),
        )
        .where(dow == 1)
        .groupBy(
            _C("ss_ticket_number").alias("ticket"),
            _C("ss_customer_sk").alias("cust"),
            _C("s_state"),
        )
        .agg(
            F.sum(_cents(_C("ss_ext_discount_amt"))).alias("amt_c"),
            F.sum(_cents(_C("ss_net_profit"))).alias("prof_c"),
        )
    )
    return (
        tickets.join(
            F.broadcast(
                ds.customer_dim.where(
                    (_C("c_preferred_flag") == "Y")
                    | (_C("c_segment") == "AUTOMOBILE")
                )
            ),
            _C("cust") == _C("c_customer_sk"),
        )
        .select(
            "c_customer_id", "s_state", "ticket",
            (F.floor(_C("amt_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "coupon_amt"
            ),
            (F.floor(_C("prof_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "profit"
            ),
        )
    )


@_ds_q(
    "tpcds_q84",
    _with(
        """
    SELECT DISTINCT c_customer_id AS customer_id, ca_state
    FROM customer_dim
    JOIN customer ON c_customer_sk = c_custkey
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    WHERE ca_country = 'EUROPE'
      AND c_acctbal BETWEEN 1000 AND 6000
      AND c_customer_sk IN (SELECT sr_customer_sk FROM store_returns)
    """,
        "customer_dim", "customer_address", "store_returns",
    ),
)
def q_tpcds_q84(ds: _DS) -> DataFrame:
    """TPC-DS Q84 (query84.sql): the customer lookup through the
    demographics/income-band chain (mapped to the base customer's
    account-balance band) restricted to customers with store returns
    — a dimension-only join tree plus a fact semi-join."""
    return (
        ds.customer_dim.join(
            ds.t.customer.select("c_custkey", "c_acctbal"),
            _C("c_customer_sk") == _C("c_custkey"),
        )
        .join(
            F.broadcast(
                ds.customer_address.where(_C("ca_country") == "EUROPE")
            ),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .where(_C("c_acctbal").between(1000, 6000))
        .join(
            ds.store_returns.select(
                _C("sr_customer_sk").alias("c_customer_sk")
            ),
            "c_customer_sk",
            "left_semi",
        )
        .select(_C("c_customer_id").alias("customer_id"), _C("ca_state"))
        .distinct()
    )


@_ds_q(
    "tpcds_q85",
    _with(
        f"""
    SELECT c_segment,
           {_exact_avg_sql('ws_quantity', 100)} AS avg_quantity,
           {_exact_avg_sql('wr_return_amt', 10000)} AS avg_refund
    FROM web_sales
    JOIN web_returns ON ws_item_sk = wr_item_sk
                    AND ws_order_number = wr_order_number
    JOIN customer_dim ON wr_customer_sk = c_customer_sk
    JOIN customer_address ON c_current_addr_sk = ca_address_sk
    JOIN date_dim ON ws_sold_date = d_date
    WHERE d_year = 1995
      AND ((c_segment IN ('BUILDING', 'MACHINERY')
              AND ws_net_paid BETWEEN 0 AND 40000)
        OR (c_segment IN ('AUTOMOBILE', 'HOUSEHOLD')
              AND ws_net_paid BETWEEN 20000 AND 80000)
        OR (c_segment = 'FURNITURE'
              AND ws_net_paid BETWEEN 40000 AND 120000))
      AND ((ca_country = 'AMERICA' AND ws_quantity BETWEEN 1 AND 30)
        OR (ca_country = 'EUROPE' AND ws_quantity BETWEEN 10 AND 40)
        OR (ca_country IN ('ASIA', 'AFRICA', 'MIDDLE EAST')
              AND ws_quantity BETWEEN 20 AND 50))
    GROUP BY c_segment
    """,
        "web_sales", "web_returns", "customer_dim", "customer_address",
        "date_dim",
    ),
)
def q_tpcds_q85(ds: _DS) -> DataFrame:
    """TPC-DS Q85 (query85.sql): web returns under paired OR-grids —
    (demographic x price band) AND (geography x quantity band) — with
    per-segment averages of quantity and refund (the reference's
    reason dim and double-demographics map to the derived segment and
    returning-customer flags). The sales-returns join rides the
    natural (item, order) key; both grids fold into one Catalyst
    predicate."""
    seg_band = (
        (_C("c_segment").isin("BUILDING", "MACHINERY")
         & _C("ws_net_paid").between(0, 40000))
        | (_C("c_segment").isin("AUTOMOBILE", "HOUSEHOLD")
           & _C("ws_net_paid").between(20000, 80000))
        | ((_C("c_segment") == "FURNITURE")
           & _C("ws_net_paid").between(40000, 120000))
    )
    geo_band = (
        ((_C("ca_country") == "AMERICA") & _C("ws_quantity").between(1, 30))
        | ((_C("ca_country") == "EUROPE")
           & _C("ws_quantity").between(10, 40))
        | (_C("ca_country").isin("ASIA", "AFRICA", "MIDDLE EAST")
           & _C("ws_quantity").between(20, 50))
    )
    return (
        ds.web_sales.join(
            ds.web_returns,
            (_C("ws_item_sk") == _C("wr_item_sk"))
            & (_C("ws_order_number") == _C("wr_order_number")),
        )
        .join(
            F.broadcast(ds.customer_dim),
            _C("wr_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .join(
            F.broadcast(ds.date_dim.where(_C("d_year") == 1995)),
            _C("ws_sold_date") == _C("d_date"),
        )
        .where(seg_band & geo_band)
        .groupBy("c_segment")
        .agg(
            _exact_avg(_C("ws_quantity"), 100).alias("avg_quantity"),
            _exact_avg(_C("wr_return_amt"), 10000).alias("avg_refund"),
        )
    )


@_ds_q(
    "tpcds_q14b",
    _with(
        """
    SELECT ty.brand, ty.cls,
           floor(ty.cents / 100.0 + 0.5) / 100 AS this_year,
           floor(ly.cents / 100.0 + 0.5) / 100 AS last_year
    FROM week_sales ty
    JOIN week_sales_ly ly ON ty.brand = ly.brand AND ty.cls = ly.cls
    WHERE CAST(ty.cents AS DOUBLE)
            > (SELECT avg_c FROM avg_sales)
    """,
        "store_sales", "catalog_sales", "web_sales", "item", "date_dim",
        extra="""
    cross_bcc AS (
      SELECT i_brand AS brand, i_class AS cls, i_category AS cat FROM (
        SELECT i_brand, i_class, i_category
        FROM store_sales JOIN item ON ss_item_sk = i_item_sk
        INTERSECT
        SELECT i_brand, i_class, i_category
        FROM catalog_sales JOIN item ON cs_item_sk = i_item_sk
        INTERSECT
        SELECT i_brand, i_class, i_category
        FROM web_sales JOIN item ON ws_item_sk = i_item_sk) x),
    avg_sales AS (
      SELECT avg(CAST(round(paid * 10000, 0) AS BIGINT)) AS avg_c FROM (
        SELECT ss_net_paid AS paid FROM store_sales
        UNION ALL SELECT cs_net_paid FROM catalog_sales
        UNION ALL SELECT ws_net_paid FROM web_sales) u),
    week_sales AS (
      SELECT i_brand AS brand, i_class AS cls,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS cents
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1997 AND d_moy = 12
        AND EXISTS (SELECT 1 FROM cross_bcc
                    WHERE brand = i_brand AND cls = i_class
                      AND cat = i_category)
      GROUP BY i_brand, i_class),
    week_sales_ly AS (
      SELECT i_brand AS brand, i_class AS cls,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS cents
      FROM store_sales
      JOIN item ON ss_item_sk = i_item_sk
      JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year = 1996 AND d_moy = 12
        AND EXISTS (SELECT 1 FROM cross_bcc
                    WHERE brand = i_brand AND cls = i_class
                      AND cat = i_category)
      GROUP BY i_brand, i_class)
    """,
    ),
)
def q_tpcds_q14b(ds: _DS) -> DataFrame:
    """TPC-DS Q14b (query14b.sql): the week-over-week half of Q14 —
    brand/class sales for the same December period this year vs last,
    restricted to (brand, class, category) combos sold through ALL
    three channels (INTERSECT at the hierarchy level, unlike Q14a's
    item level), thresholded by the corpus-wide average sale (1-row
    broadcast aggregate)."""

    # Fused plan (oracle keeps the textbook CTEs): the three channel
    # facts partition ONE lineitem scan by l_linenumber % 3 and their
    # orders join is 1:1 on the o_orderkey key, so
    #   * cross_bcc's 3-way INTERSECT = one lineitem⋈item pass per
    #     (brand, class, category) requiring all 3 channel tags —
    #     and it needs no orders columns at all;
    #   * avg_sales' 3-fact union = every lineitem row, so the 1-row
    #     average reads lineitem alone (net_paid is a pure lineitem
    #     expression);
    #   * the two week_sales years (store channel, Dec 1997 vs Dec
    #     1996) = ONE store-slice pass grouped by (brand, cls, year)
    #     then pivoted — the date_dim join against the distinct
    #     derived dates is exactly a year+month filter on sold_date.
    # 3 lineitem scans + 1 orders scan total, vs 8 fact derivations
    # (each a lineitem⋈orders join) + 2 date_dim derivations before.
    l, o = ds.t.lineitem, ds.t.orders
    net = _C("l_extendedprice") * (1 - _C("l_discount"))
    cross_bcc = (
        l.select("l_partkey", (_C("l_linenumber") % 3).alias("__ch"))
        .join(F.broadcast(ds.item), _C("l_partkey") == _C("i_item_sk"))
        .groupBy("i_brand", "i_class", "i_category")
        .agg(F.count_distinct(_C("__ch")).alias("__nch"))
        .where(_C("__nch") == 3)
        .select("i_brand", "i_class", "i_category")
    )
    avg_sales = l.select(_cents(net).alias("c")).agg(F.avg("c").alias("avg_c"))

    d = _C("o_orderdate").cast("date")
    weeks = (
        l.where(_C("l_linenumber") % 3 == 0)
        .select("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
        .join(
            o.where(
                (F.month(_C("o_orderdate").cast("date")) == 12)
                & _year_range(_C("o_orderdate").cast("date"), 1996, 1997)
            ).select("o_orderkey", "o_orderdate"),
            _C("l_orderkey") == _C("o_orderkey"),
        )
        .join(F.broadcast(ds.item), _C("l_partkey") == _C("i_item_sk"))
        .join(
            F.broadcast(
                cross_bcc.withColumnRenamed("i_brand", "b")
                .withColumnRenamed("i_class", "c")
                .withColumnRenamed("i_category", "ct")
            ),
            (_C("i_brand") == _C("b"))
            & (_C("i_class") == _C("c"))
            & (_C("i_category") == _C("ct")),
            "left_semi",
        )
        .groupBy(_C("i_brand").alias("brand"), _C("i_class").alias("cls"))
        .agg(
            F.sum(F.when(F.year(d) == 1997, _cents(net))).alias("__ty_c"),
            F.sum(F.when(F.year(d) == 1996, _cents(net))).alias("__ly_c"),
        )
        .where(_C("__ty_c").isNotNull() & _C("__ly_c").isNotNull())
    )
    return (
        weeks.join(F.broadcast(avg_sales))
        .where(_C("__ty_c").cast("double") > _C("avg_c"))
        .select(
            "brand",
            "cls",
            (F.floor(_C("__ty_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "this_year"
            ),
            (F.floor(_C("__ly_c") / 100.0 + F.lit(0.5)) / 100).alias(
                "last_year"
            ),
        )
    )


@_ds_q(
    "tpcds_q23b",
    _with(
        f"""
    SELECT cust, floor(sum(cents) / 100.0 + 0.5) / 100 AS sales
    FROM (
      SELECT c_customer_id AS cust,
             CAST(round(cs_net_paid * 10000, 0) AS BIGINT) AS cents
      FROM catalog_sales
      JOIN customer_dim ON cs_customer_sk = c_customer_sk
      WHERE cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND cs_customer_sk IN (
          SELECT customer_sk FROM best_ss_customer
          WHERE ssales > 0.5 * (SELECT max(ssales) FROM best_ss_customer))
      UNION ALL
      SELECT c_customer_id,
             CAST(round(ws_net_paid * 10000, 0) AS BIGINT)
      FROM web_sales
      JOIN customer_dim ON ws_customer_sk = c_customer_sk
      WHERE ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_customer_sk IN (
          SELECT customer_sk FROM best_ss_customer
          WHERE ssales > 0.5 * (SELECT max(ssales) FROM best_ss_customer))
    )
    GROUP BY cust
    """,
        "store_sales", "catalog_sales", "web_sales", "date_dim",
        "customer_dim",
        extra="""
    frequent_ss_items AS (
      SELECT ss_item_sk AS item_sk
      FROM store_sales JOIN date_dim ON ss_sold_date = d_date
      WHERE d_year IN (1998, 1999)
      GROUP BY ss_item_sk HAVING count(*) > 4),
    best_ss_customer AS (
      SELECT ss_customer_sk AS customer_sk, sum(ss_net_paid) AS ssales
      FROM store_sales GROUP BY ss_customer_sk)
    """,
    ),
)
def q_tpcds_q23b(ds: _DS) -> DataFrame:
    """TPC-DS Q23b (query23b.sql): the named-customer half of Q23 —
    catalog and web spending of the best store customers on
    frequently store-sold items, per customer. Same semi-join gates
    as Q23a plus the 1-row max broadcast; the channel union happens
    before the final customer agg."""
    ss = ds.store_sales
    # the date_dim join reads no d_* column — pushed year range
    frequent = (
        ss.where(_year_range(_C("ss_sold_date"), 1998, 1999))
        .groupBy("ss_item_sk")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(_C("__cnt") > 4)
        .select(_C("ss_item_sk").alias("item_sk"))
    )
    # pinning best measured slower (see q23a) — left unpinned
    best = ss.groupBy("ss_customer_sk").agg(
        F.sum("ss_net_paid").alias("ssales")
    )
    max_sales = best.agg(F.max("ssales").alias("__max_ssales"))
    top_customers = (
        best.join(F.broadcast(max_sales))
        .where(_C("ssales") > 0.5 * _C("__max_ssales"))
        .select(_C("ss_customer_sk").alias("customer_sk"))
    )

    def chan(fact, p):
        return (
            fact.join(
                frequent, _C(p + "item_sk") == _C("item_sk"), "left_semi"
            )
            .join(
                top_customers,
                _C(p + "customer_sk") == _C("customer_sk"),
                "left_semi",
            )
            .join(
                F.broadcast(ds.customer_dim),
                _C(p + "customer_sk") == _C("c_customer_sk"),
            )
            .select(
                _C("c_customer_id").alias("cust"),
                _cents(_C(p + "net_paid")).alias("cents"),
            )
        )

    return (
        chan(ds.catalog_sales, "cs_")
        .unionByName(chan(ds.web_sales, "ws_"))
        .groupBy("cust")
        .agg(
            (F.floor(F.sum("cents") / 100.0 + F.lit(0.5)) / 100).alias(
                "sales"
            )
        )
    )


@_ds_q(
    "tpcds_q24b",
    _with(
        """
    SELECT cust, store_name,
           floor(paid_c / 100.0 + 0.5) / 100 AS paid
    FROM (
      SELECT cust, store_name, sum(netpaid_c) AS paid_c
      FROM ssales
      WHERE sz BETWEEN 40 AND 50
      GROUP BY cust, store_name
    )
    WHERE CAST(paid_c AS DOUBLE) >
      (SELECT 0.05 * avg(CAST(netpaid_c AS DOUBLE)) FROM ssales)
    """,
        "store_sales", "store_returns", "store", "item", "customer_dim",
        "customer_address",
        extra="""
    ssales AS (
      SELECT c_customer_id AS cust, s_store_name AS store_name,
             i_size AS sz,
             sum(CAST(round(ss_net_paid * 10000, 0) AS BIGINT)) AS netpaid_c
      FROM store_sales
      JOIN store_returns ON ss_ticket_number = sr_ticket_number
                        AND ss_item_sk = sr_item_sk
      JOIN store ON ss_store_sk = s_store_sk
      JOIN item ON ss_item_sk = i_item_sk
      JOIN customer_dim ON ss_customer_sk = c_customer_sk
      JOIN customer_address ON c_current_addr_sk = ca_address_sk
      WHERE s_state = ca_state
      GROUP BY c_customer_id, s_store_name, i_size)
    """,
    ),
)
def q_tpcds_q24b(ds: _DS) -> DataFrame:
    """TPC-DS Q24b (query24b.sql): the sibling slice of Q24a — the
    identical returned-purchase CTE filtered to the large size band
    instead (the reference's two variants differ only in color).
    Same 1-row scalar-average broadcast threshold."""
    ssales = (
        ds.store_sales.join(
            # slim returns: only the (ticket, item) join keys are read
            ds.store_returns_slim,
            (_C("ss_ticket_number") == _C("sr_ticket_number"))
            & (_C("ss_item_sk") == _C("sr_item_sk")),
        )
        .join(F.broadcast(ds.store), _C("ss_store_sk") == _C("s_store_sk"))
        .join(F.broadcast(ds.item), _C("ss_item_sk") == _C("i_item_sk"))
        .join(
            F.broadcast(ds.customer_dim),
            _C("ss_customer_sk") == _C("c_customer_sk"),
        )
        .join(
            F.broadcast(ds.customer_address),
            _C("c_current_addr_sk") == _C("ca_address_sk"),
        )
        .where(_C("s_state") == _C("ca_state"))
        .groupBy(
            _C("c_customer_id").alias("cust"),
            _C("s_store_name").alias("store_name"),
            _C("i_size").alias("sz"),
        )
        .agg(F.sum(_cents(_C("ss_net_paid"))).alias("netpaid_c"))
    )
    # ssales feeds both the scalar threshold and the main leg: pin the
    # small per-(customer, store, size) decision table once (guide §5)
    # instead of re-executing the 6-way join lineage per consumer
    ssales = ssales.coalesce(
        ds.t.spark.sparkContext.defaultParallelism
    ).localCheckpoint(eager=True)
    threshold = ssales.agg(
        (0.05 * F.avg(_C("netpaid_c").cast("double"))).alias("thr")
    )
    return (
        ssales.where(_C("sz").between(40, 50))
        .groupBy("cust", "store_name")
        .agg(F.sum("netpaid_c").alias("paid_c"))
        .join(F.broadcast(threshold))
        .where(_C("paid_c").cast("double") > _C("thr"))
        .select(
            "cust", "store_name",
            (F.floor(_C("paid_c") / 100.0 + F.lit(0.5)) / 100).alias("paid"),
        )
    )


@_ds_q(
    "tpcds_q39b",
    _with(
        """
    SELECT c1.w AS warehouse_sk, c1.moy AS moy1, c2.moy AS moy2,
           round(c1.mean, 4) AS mean1, round(c1.cov, 4) AS cov1,
           round(c2.mean, 4) AS mean2, round(c2.cov, 4) AS cov2
    FROM inv c1
    JOIN inv c2 ON c1.w = c2.w AND c1.moy = 1 AND c2.moy = 2
    WHERE c1.cov > 0.4 AND c2.cov > 0.3
    """,
        "catalog_sales", "date_dim",
        extra="""
    base AS (
      SELECT cs_warehouse_sk AS w, d_moy AS moy,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(cs_quantity AS BIGINT)) AS s,
             sum(CAST(cs_quantity AS BIGINT)
                 * CAST(cs_quantity AS BIGINT)) AS s2
      FROM catalog_sales JOIN date_dim ON cs_sold_date = d_date
      WHERE d_year = 1997
      GROUP BY cs_warehouse_sk, d_moy
      HAVING count(*) > 1),
    inv AS (
      SELECT w, moy, CAST(s AS DOUBLE) / n AS mean,
             sqrt((n * s2 - s * s) / (CAST(n AS DOUBLE) * (n - 1)))
               / (CAST(s AS DOUBLE) / n) AS cov
      FROM base)
    """,
    ),
)
def q_tpcds_q39b(ds: _DS) -> DataFrame:
    """TPC-DS Q39b (query39b.sql): Q39a with the stricter first-month
    volatility gate (the reference's variants differ only in the
    added cov >= 1.5 filter on the first month)."""
    base = (
        ds.catalog_sales.where(_year_range(_C("cs_sold_date"), 1997))
        .groupBy(
            _C("cs_warehouse_sk").alias("w"),
            F.month(_C("cs_sold_date")).cast("bigint").alias("moy"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(_C("cs_quantity").cast("bigint")).alias("s"),
            F.sum(
                _C("cs_quantity").cast("bigint")
                * _C("cs_quantity").cast("bigint")
            ).alias("s2"),
        )
        .where(_C("n") > 1)
    )
    mean = _C("s").cast("double") / _C("n")
    cov = (
        F.sqrt(
            (_C("n") * _C("s2") - _C("s") * _C("s"))
            / (_C("n").cast("double") * (_C("n") - F.lit(1)))
        )
        / mean
    )
    inv = base.select("w", "moy", mean.alias("mean"), cov.alias("cov"))
    c1 = inv.where((_C("moy") == 1) & (_C("cov") > 0.4)).alias("c1")
    c2 = inv.where((_C("moy") == 2) & (_C("cov") > 0.3)).alias("c2")
    return c1.join(c2, _C("c1.w") == _C("c2.w")).select(
        _C("c1.w").alias("warehouse_sk"),
        _C("c1.moy").alias("moy1"),
        _C("c2.moy").alias("moy2"),
        F.round(_C("c1.mean"), 4).alias("mean1"),
        F.round(_C("c1.cov"), 4).alias("cov1"),
        F.round(_C("c2.mean"), 4).alias("mean2"),
        F.round(_C("c2.cov"), 4).alias("cov2"),
    )
