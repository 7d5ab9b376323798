"""Catalog: register parquet directories as queryable tables.

Reference equivalent: ``GenericInMemoryCatalog`` + `CREATE TABLE ...
WITH ('connector'='filesystem','format'='parquet')` DDL
(flink-table/flink-sql-parser/.../ddl/SqlCreateTable.java:56,
flink-table-runtime-blink/.../filesystem/FileSystemTableFactory.java in
/root/reference). In Spark the filesystem connector is
``spark.read.parquet`` — scans are vectorized, filters and projections
are pushed to the parquet reader by Catalyst (SURVEY.md §4.1), so a
query touching 2 of 16 columns at 100 TB reads only those column
chunks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# the driver-generated TPC-H-ish star schema + pipeline tables
KNOWN_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(data_dir: str, name: str) -> str:
    return os.path.join(data_dir, f"{name}.parquet")


def load_table(spark: SparkSession, data_dir: str, name: str) -> DataFrame:
    """Read one parquet table. No caching: Catalyst prunes per query."""
    return spark.read.parquet(table_path(data_dir, name))


def register_tables(
    spark: SparkSession, data_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register every table in ``data_dir`` as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in tables or KNOWN_TABLES:
        path = table_path(data_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
