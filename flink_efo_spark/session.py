"""Session factory.

Mirrors the role of the reference's ``TableEnvironment``
(flink-table-api-java/.../internal/TableEnvironmentImpl.java:626 in
/root/reference) — the single entry object that owns configuration,
catalog and SQL execution — but delegates everything below the API to
Spark/Catalyst.

Scale notes (100 TB target):
* AQE on — runtime re-planning replaces Flink's static
  ``TABLE_OPTIMIZER_BROADCAST_JOIN_THRESHOLD`` decision
  (BatchExecHashJoinRule.scala:171-181) and adds skew-join splitting.
* ``spark.sql.shuffle.partitions`` is only the *initial* number; with
  AQE coalescing enabled the effective partition count follows data
  size, so the same code runs at sf0.001 and at 100 TB.
* Arrow enabled for the (rare) pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Engine defaults. Anything the caller sets explicitly wins.
_DEFAULT_CONFS: dict[str, str] = {
    # deterministic time semantics (oracle comparisons run in UTC)
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing, skew-join handling, dynamic broadcast
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDF / applyInPandas paths
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # broadcast threshold: reference defaults to 1 MB
    # (BatchExecHashJoinRule.scala:181); Spark's 10 MB default is the
    # better choice on modern hardware — keep it, raise AQE's local
    # shuffle reader usage instead.
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    # read-side parallelism: 128 MB splits are right for the 100 TB
    # target (smaller splits would flood the scheduler)
    "spark.sql.files.maxPartitionBytes": "134217728",
    # state store for streaming stateful operators
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    # Parquet TIMESTAMP(NANOS) (the driver's events.ts) has no Spark
    # type; read as long and let the catalog cast to micros (the same
    # truncation DuckDB applies when it reads nanos into TIMESTAMP).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # shuffle.partitions is only the FLOOR under AQE: initialPartitionNum
    # sets the pre-coalesce fan-out, so the same code keeps full initial
    # parallelism at 100 TB while AQE coalesces small stages down.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
}


def get_spark(app_name: str = "flink-efo-spark", **confs: str) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults applied.

    Local test runs honor ``SPARK_GRAFT_CPUS`` (default 32) for
    ``local[N]``; on a real cluster the master comes from the
    environment and this is a no-op.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if not os.environ.get("SPARK_MASTER") and not os.environ.get("MASTER"):
        builder = builder.master(f"local[{cpus}]")
    merged = dict(_DEFAULT_CONFS)
    merged.update(confs)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


class EfoSession:
    """Engine facade: catalog registration + SQL + fluent table access.

    Role-equivalent of the reference's TableEnvironment
    (TableEnvironmentImpl.java:345 registerFunction, :626 sqlQuery,
    :646 executeSql) — but ``sql()`` here IS Spark SQL: the parser,
    analyzer, optimizer and codegen are Catalyst's.
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        from flink_efo_spark.functions.registry import register_all

        register_all(self.spark)

    def register_dir(self, data_dir: str, tables: list[str] | None = None) -> None:
        from flink_efo_spark.catalog import register_tables

        register_tables(self.spark, data_dir, tables)

    def sql(self, query: str):
        return self.spark.sql(query)

    def table(self, name: str):
        return self.spark.table(name)
