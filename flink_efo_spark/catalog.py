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
from pyspark.sql import functions as F

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


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) in ``path``.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (set by the engine
    session) such columns surface as raw nano longs. We detect them
    from the footer so the catalog can cast to micros — exactly the
    truncation DuckDB applies reading the same file, keeping engine
    and oracle bit-identical.
    """
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def force_utc_process_tz() -> None:
    """Pin the DRIVER PROCESS timezone to UTC. ``DataFrame.collect()``
    converts timestamps to the driver process's LOCAL timezone (the
    session timeZone conf does not change that conversion), and
    several operators interpret collected naive datetimes as UTC
    (e.g. cep._eoi_epoch_ms). On a non-UTC driver those markers would
    shift by the UTC offset — eastward offsets make end-of-input
    unreachable, westward ones finalize early. Process-global and
    driver-only by design: executors never run collect()."""
    import time

    if os.environ.get("TZ") != "UTC":
        os.environ["TZ"] = "UTC"
        if hasattr(time, "tzset"):
            time.tzset()


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the runtime-settable confs the engine's semantics depend on
    on a session the engine did NOT create (e.g. the driver's vanilla
    session): nanos-parquet readability and deterministic UTC time.
    Both are runtime SQL confs — safe to set on a live session."""
    force_utc_process_tz()
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Parquet micros timestamps without the UTC-adjusted flag would
        # otherwise infer TIMESTAMP_NTZ (Spark >= 3.4), which
        # unix_micros()/withWatermark() reject. Event-time semantics in
        # this engine are instant-based (reference TimestampData is
        # epoch millis+nanos, TimestampData.java:40) — read as TIMESTAMP.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass  # locked down (cluster ACLs) — engine sessions set these at build


def _denull_ntz(df: DataFrame) -> DataFrame:
    """Belt-and-braces for sessions where the inferTimestampNTZ conf is
    locked (managed clusters): cast any TIMESTAMP_NTZ column to
    ``timestamp``. Session timezone is UTC, so the cast is the identity
    on the underlying micros value."""
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, data_dir: str, name: str) -> DataFrame:
    """Read one parquet table, normalizing nanosecond timestamps to
    Spark ``timestamp`` (micros). No caching: Catalyst prunes per query."""
    ensure_session_confs(spark)
    path = table_path(data_dir, name)
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        if c in df.columns:
            # integer `div`, not `/`: nano longs exceed double's exact
            # integer range, so float division could round the micros
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return _denull_ntz(df)


class TableSpec:
    """Engine-level DDL record (SURVEY §2.14): Spark has no DDL syntax
    for WATERMARK or computed columns (SqlCreateTable.java:56,
    WatermarkSpec.java:36 in the reference) — the engine records them
    here and applies them at scan time (batch: computed columns only;
    stream: + withWatermark)."""

    def __init__(
        self,
        name: str,
        path: str,
        format: str = "parquet",
        watermark: tuple[str, str] | None = None,
        computed_columns: dict[str, str] | None = None,
        options: dict | None = None,
    ):
        self.name = name
        self.path = path
        self.format = format
        self.watermark = watermark
        self.computed_columns = computed_columns or {}
        self.options = options or {}

    def scan(self, spark: SparkSession, streaming: bool = False) -> DataFrame:
        from pyspark.sql import functions as F

        ensure_session_confs(spark)
        if streaming:
            schema = spark.read.format(self.format).load(self.path).schema
            df = (
                spark.readStream.schema(schema)
                .format(self.format)
                .options(**self.options)
                .load(self.path)
            )
        else:
            df = spark.read.format(self.format).options(**self.options).load(self.path)
        df = _denull_ntz(df)
        for col, expr in self.computed_columns.items():
            df = df.withColumn(col, F.expr(expr))
        if streaming and self.watermark is not None:
            df = df.withWatermark(*self.watermark)
        return df


def register_tables(
    spark: SparkSession, data_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register every table in ``data_dir`` as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in tables or KNOWN_TABLES:
        path = table_path(data_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, data_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def ensure_min_parallelism(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Give a CPU-heavy per-row stage a parallelism floor.

    Small single-row-group parquet files scan as ONE split no matter
    what ``maxPartitionBytes`` says (splits land on row-group
    boundaries), so an expression-heavy map stage (md5 shingling,
    signature math) runs on one core while the rest of the cluster
    idles. Repartitioning first trades one narrow shuffle of the
    projected input for full-width map parallelism — measured 4x on
    the sf0.1 MinHash pipeline.

    At scale this is a NO-OP by construction: a 100 TB table scans as
    thousands of splits, which is >= the default parallelism, so the
    gate fails and no shuffle is added. Only narrow inputs (small
    dims, single-file local runs, a filtered subquery that collapsed
    to few partitions) are widened.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
