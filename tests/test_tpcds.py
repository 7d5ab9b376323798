"""Structural invariants of the derived TPC-DS star schema.

The per-query value checks live in test_queries.py (every tpcds_*
entry runs against its DuckDB oracle there, same as the driver's
CORRECTNESS gate). These tests pin the derivation itself — the
properties every query relies on — so a schema-drift regression fails
here with a readable message instead of as 19 opaque hash mismatches.
Mirrors the reference's schema fixture (flink-end-to-end-tests/
flink-tpcds-test/schema/TpcdsSchemaProvider.java).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_efo_spark.queries import _T
from flink_efo_spark.tpcds import _CTE, _DS
from tests.conftest import SF_DIR


def _ds(spark):
    return _DS(_T(spark, SF_DIR))


def test_channels_partition_lineitem(spark):
    """store/catalog/web facts partition lineitem rows exactly."""
    ds = _ds(spark)
    n_line = _T(spark, SF_DIR).lineitem.count()
    counts = [
        ds.store_sales.count(),
        ds.catalog_sales.count(),
        ds.web_sales.count(),
    ]
    assert sum(counts) == n_line
    assert all(c > 0 for c in counts)


def test_returns_subset_of_channel(spark):
    """Every return row matches exactly one fact row of its channel
    (join on the full ticket key is 1:1, no fan-out)."""
    ds = _ds(spark)
    sr, ss = ds.store_returns, ds.store_sales
    n_sr = sr.count()
    joined = ss.join(
        sr,
        (F.col("ss_item_sk") == F.col("sr_item_sk"))
        & (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
        & (F.col("ss_customer_sk") == F.col("sr_customer_sk"))
        & (F.col("ss_quantity") == F.col("sr_return_quantity")),
    ).count()
    assert joined >= n_sr  # every return finds its sale
    # returned rows are exactly the channel's 'R' rows
    assert n_sr == ss.where(F.col("ss_return_flag") == "R").count()


def test_date_dim_covers_fact_dates(spark):
    """Joining a fact to date_dim on sold/ship date loses no rows —
    the dim was built from the union of order and ship dates."""
    ds = _ds(spark)
    ss = ds.store_sales
    dd = ds.date_dim
    n = ss.count()
    assert ss.join(dd, F.col("ss_sold_date") == F.col("d_date")).count() == n
    assert ss.join(dd, F.col("ss_ship_date") == F.col("d_date")).count() == n


def test_date_dim_unique(spark):
    ds = _ds(spark)
    dd = ds.date_dim
    assert dd.count() == dd.select("d_date").distinct().count()


def test_dims_keyed(spark):
    """Dimension keys are unique (joins against them never fan out)."""
    ds = _ds(spark)
    for df, key in [
        (ds.item, "i_item_sk"),
        (ds.customer_dim, "c_customer_sk"),
        (ds.customer_address, "ca_address_sk"),
        (ds.store, "s_store_sk"),
    ]:
        assert df.count() == df.select(key).distinct().count()


def test_cte_and_dataframe_agree(spark, ddb):
    """The DuckDB CTE text and the Spark builders produce identical
    relations — the lock-step contract every oracle depends on."""
    from tests.conftest import duck_rows, rows_of

    ds = _ds(spark)
    for name in ["date_dim", "item", "customer_dim", "customer_address",
                 "store", "store_sales", "store_returns"]:
        sdf = getattr(ds, name)
        cols = sorted(sdf.columns)
        srows = rows_of(sdf.select(*cols))
        drows = duck_rows(
            ddb, f"SELECT {', '.join(cols)} FROM ({_CTE[name]})"
        )
        assert srows == drows, f"derived table {name} drifted"
