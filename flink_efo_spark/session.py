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
import re

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
    # Parquet micros without the UTC-adjusted flag must read as
    # TIMESTAMP, not TIMESTAMP_NTZ: unix_micros()/withWatermark()
    # reject NTZ, and the engine's event-time model is instant-based
    # (reference TimestampData.java:40 is epoch millis+nanos).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # shuffle.partitions is only the FLOOR under AQE: initialPartitionNum
    # sets the pre-coalesce fan-out, so the same code keeps full initial
    # parallelism at 100 TB while AQE coalesces small stages down.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
}


def get_spark(
    app_name: str = "flink-efo-spark",
    hive: bool = False,
    warehouse_dir: str | None = None,
    **confs: str,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults applied.

    Local test runs honor ``SPARK_GRAFT_CPUS`` (default 32) for
    ``local[N]``; on a real cluster the master comes from the
    environment and this is a no-op.

    ``hive=True`` enables the Hive catalog (the reference's
    HiveCatalog, flink-connectors/flink-connector-hive): persistent
    databases/tables through a metastore, `saveAsTable`/`spark.table`
    round-trips surviving session restarts. Spark bundles the Hive
    client jars; ``warehouse_dir`` points both the warehouse and the
    embedded-Derby metastore at a writable location. Hive support
    must be chosen at JVM startup — it cannot be toggled on an
    existing session.
    """
    from flink_efo_spark.catalog import force_utc_process_tz

    force_utc_process_tz()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    merged = dict(_DEFAULT_CONFS)
    if not os.environ.get("SPARK_MASTER") and not os.environ.get("MASTER"):
        builder = builder.master(f"local[{cpus}]")
        # local mode: the driver JVM IS the whole cluster (all N task
        # slots share its heap), yet Spark's default driver memory is
        # 1g — 32 concurrent tasks starve and OOM on join-heavy
        # workloads long before the machine is full. Size the heap to
        # the slot count; applies only at JVM start (getOrCreate on a
        # live session ignores it), and only in local mode — on a real
        # cluster the submitter owns driver/executor sizing.
        merged.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
        )
    if hive:
        wh = warehouse_dir or os.path.join(os.getcwd(), "spark-warehouse")
        merged["spark.sql.warehouse.dir"] = wh
        merged["spark.sql.catalogImplementation"] = "hive"
        merged["javax.jdo.option.ConnectionURL"] = (
            f"jdbc:derby:;databaseName={wh}/metastore_db;create=true"
        )
        builder = builder.enableHiveSupport()
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
        from flink_efo_spark.catalog import ensure_session_confs
        from flink_efo_spark.functions.registry import register_all

        ensure_session_confs(self.spark)
        register_all(self.spark)
        self._specs: dict[str, object] = {}
        # view name -> (rowtime col, [version tiebreak cols]) for
        # FOR SYSTEM_TIME AS OF resolution on temp views
        self._rowtimes: dict[str, tuple[str, list[str]]] = {}
        # view name -> PRIMARY KEY columns (versioned temporal joins)
        self._pks: dict[str, list[str]] = {}
        # names created via CREATE VIEW SQL (SqlCreateView.java)
        self._views: set[str] = set()

    def register_dir(self, data_dir: str, tables: list[str] | None = None) -> None:
        from flink_efo_spark.catalog import register_tables

        register_tables(self.spark, data_dir, tables)

    # -- SQL (TableEnvironmentImpl.sqlQuery:626 / executeSql:646) ------
    def sql(self, query: str):
        """Execute SQL. Accepts both Spark SQL and the reference's
        group-window dialect (GROUP BY TUMBLE/HOP/SESSION +
        *_START/_END/_ROWTIME auxiliaries, PROCTIME(), temporal joins
        via FOR SYSTEM_TIME AS OF) — the dialect shim (dialect.py)
        rewrites those lexically and is the identity on plain Spark
        SQL. SYSTEM_TIME rewriting runs FIRST: it must see the
        literal PROCTIME() token before translate() replaces it."""
        from flink_efo_spark.dialect import (
            rewrite_lateral_table,
            rewrite_system_time,
            translate,
        )

        from flink_efo_spark import ddl_sql

        like_src = ddl_sql.create_table_like_source(query)
        if like_src is not None and like_src in self._specs:
            # CREATE TABLE ... LIKE <engine table> (SqlTableLike.java);
            # LIKE over plain Spark catalog tables passes through below
            ddl_sql.execute_create_table_like(self, query)
            return self.spark.sql("SELECT 'OK' AS result")
        if like_src is not None and ddl_sql._WITH_RE.search(query):
            # Flink-style DDL (WITH options) whose LIKE source is not
            # an engine table: the plain CREATE TABLE parser would
            # silently drop the LIKE clause — refuse instead. Plain
            # Spark LIKE DDL has no WITH (...) clause and passes
            # through to spark.sql untouched.
            raise ValueError(
                f"CREATE TABLE ... LIKE source {like_src!r} is not an "
                "engine table (register it with CREATE TABLE ... WITH "
                "(...) or EfoSession.create_table first)"
            )
        if ddl_sql.is_flink_create_table(query):
            # Flink DDL (WITH-options CREATE TABLE incl. WATERMARK /
            # computed columns / PRIMARY KEY) → the engine catalog;
            # plain Spark DDL falls through to spark.sql untouched
            ddl_sql.execute_create_table(self, query)
            return self.spark.sql("SELECT 'OK' AS result")
        if (
            ddl_sql.is_drop_table(query.rstrip().rstrip(";"))
            and query.rstrip().rstrip(";").split()[-1] in self._specs
        ):
            # drops of engine-spec tables clean the spec + temp view;
            # everything else stays native Spark DDL
            ddl_sql.execute_drop_table(self, query.rstrip().rstrip(";"))
            return self.spark.sql("SELECT 'OK' AS result")
        if ddl_sql.is_statement_set(query):
            ddl_sql.execute_statement_set(self, query)
            return self.spark.sql("SELECT 'OK' AS result")
        if ddl_sql.is_create_view(query):
            # CREATE VIEW (SqlCreateView.java): body runs through this
            # same sql() so dialect constructs work inside views
            ddl_sql.execute_create_view(self, query)
            return self.spark.sql("SELECT 'OK' AS result")
        if (
            ddl_sql.is_drop_view(query.rstrip().rstrip(";"))
            and query.rstrip().rstrip(";").split()[-1] in self._views
        ):
            # drops of engine-created views; other DROP VIEW text
            # stays native Spark DDL
            ddl_sql.execute_drop_view(self, query.rstrip().rstrip(";"))
            return self.spark.sql("SELECT 'OK' AS result")
        if ddl_sql.is_alter_table(query.rstrip().rstrip(";")):
            ddl_sql.execute_alter_table(self, query.rstrip().rstrip(";"))
            return self.spark.sql("SELECT 'OK' AS result")
        if ddl_sql.is_insert_into(query) and (
            re.match(
                r"^\s*INSERT\s+(?:INTO|OVERWRITE)\s+([A-Za-z_][\w.]*)",
                query,
                re.IGNORECASE,
            ).group(1)
            in self._specs
        ):
            # INSERT into engine-spec tables writes the spec's files;
            # inserts into real Spark tables stay native
            ddl_sql.execute_insert(self, query)
            return self.spark.sql("SELECT 'OK' AS result")
        # Flink's EXPLAIN PLAN FOR <stmt> (SqlRichExplain) -> Spark's
        # EXPLAIN <stmt>; the inner statement still gets the dialect
        # rewrites below
        em = re.match(r"^\s*EXPLAIN\s+PLAN\s+FOR\s+", query, re.IGNORECASE)
        if em:
            query = "EXPLAIN " + query[em.end():]
        query = rewrite_system_time(query, self._rowtime_of, self._pk_of)
        # LATERAL TABLE(tf(...)) correlates -> LATERAL VIEW
        query = rewrite_lateral_table(query)
        if "MATCH_RECOGNIZE" in query.upper():
            from flink_efo_spark.match_sql import execute_match_recognize

            return execute_match_recognize(self.spark, query, translate)
        return self.spark.sql(translate(query))

    def _rowtime_of(self, name: str):
        """Versioned-table rowtime for FOR SYSTEM_TIME AS OF: the
        WATERMARK column of a create_table spec, or the watermark
        registered on a temp view."""
        spec = self._specs.get(name)
        if spec is not None and getattr(spec, "watermark", None):
            return spec.watermark[0]
        return self._rowtimes.get(name)

    def _pk_of(self, name: str) -> list[str]:
        """Declared PRIMARY KEY of a versioned table, for PK-based
        version chains in FOR SYSTEM_TIME AS OF (the reference's
        TemporalJoinRewriteWithUniqueKeyRule consults the table's
        unique key, not the ON clause)."""
        spec = self._specs.get(name)
        if spec is not None:
            pk = getattr(spec, "options", {}).get("primary_key")
            if pk:
                return [c.strip() for c in pk.split(",") if c.strip()]
        return self._pks.get(name, [])

    execute_sql = sql

    def table(self, name: str):
        return self.spark.table(name)

    # -- fluent Table API (SURVEY §2.13; pyflink table_environment) ----
    def from_path(self, name: str):
        """PyFlink ``from_path``: a registered table as a fluent Table."""
        from flink_efo_spark.table import Table

        return Table(self.spark.table(name))

    def from_elements(self, rows, schema=None):
        """PyFlink ``from_elements`` / SQL VALUES
        (StreamExecValues.scala:39): literal rows as a Table."""
        from flink_efo_spark.table import Table

        return Table(self.spark.createDataFrame(rows, schema))

    def create_temporary_view(
        self,
        name: str,
        table,
        watermark: str | tuple[str, str] | None = None,
        version_tiebreak: list[str] | None = None,
        primary_key: str | list[str] | None = None,
    ) -> None:
        """Register a temp view. ``watermark`` (column, or (column,
        delay) like create_table) marks the view's event-time
        attribute, making it usable as the versioned side of a
        ``FOR SYSTEM_TIME AS OF`` join; ``version_tiebreak`` orders
        equal-rowtime versions (highest wins); ``primary_key``
        declares the version key — temporal joins then partition
        version chains by it instead of the ON-clause equalities."""
        df = table.to_df() if hasattr(table, "to_df") else table
        df.createOrReplaceTempView(name)
        if watermark is not None:
            col = watermark[0] if isinstance(watermark, tuple) else watermark
            self._rowtimes[name] = (col, list(version_tiebreak or []))
        if primary_key:
            self._pks[name] = (
                [primary_key]
                if isinstance(primary_key, str)
                else list(primary_key)
            )

    # -- DDL / catalog statements (SURVEY §2.14) -----------------------
    def create_table(
        self,
        name: str,
        path: str,
        format: str = "parquet",
        watermark: tuple[str, str] | None = None,
        computed_columns: dict[str, str] | None = None,
        **options,
    ):
        """CREATE TABLE with WATERMARK / computed-column specs
        (SqlCreateTable.java:56 + WatermarkSpec.java:36 semantics Spark
        DDL can't express). Registers a batch temp view immediately;
        ``stream(name)`` opens the streaming scan with the watermark."""
        from flink_efo_spark.catalog import TableSpec

        spec = TableSpec(name, path, format, watermark, computed_columns, options)
        self._specs[name] = spec
        try:
            spec.scan(self.spark).createOrReplaceTempView(name)
        except Exception:
            # a SINK table's path may not exist yet (the reference
            # registers such specs too — files appear on first INSERT,
            # and execute_insert re-registers the view); anything else
            # is a real error
            if os.path.exists(path) or "://" in path:
                raise
        return spec

    def stream(self, name: str):
        """Streaming scan of a created table, watermark applied."""
        return self._specs[name].scan(self.spark, streaming=True)

    def create_table_like(
        self,
        name: str,
        source: str,
        path: str | None = None,
        including_watermark: bool = True,
        including_computed_columns: bool = True,
        **option_overrides,
    ):
        """CREATE TABLE ... LIKE (SqlTableLike.java in the reference's
        flink-sql-parser/ddl): clone an existing engine table's spec —
        format, watermark, computed columns, connector options — into
        a new table, with INCLUDING/EXCLUDING toggles and option
        overrides (the LIKE clause's merge strategies)."""
        src = self._specs.get(source)
        if src is None:
            raise ValueError(f"unknown source table: {source!r}")
        merged = dict(src.options)
        merged.update(option_overrides)
        return self.create_table(
            name,
            path or src.path,
            format=src.format,
            watermark=src.watermark if including_watermark else None,
            computed_columns=(
                dict(src.computed_columns)
                if including_computed_columns
                else None
            ),
            **merged,
        )

    def alter_table(
        self,
        name: str,
        rename_to: str | None = None,
        set_options: dict | None = None,
        add_computed_columns: dict[str, str] | None = None,
        drop_columns: list[str] | None = None,
        set_watermark: tuple[str, str] | None = None,
    ):
        """ALTER TABLE (SqlAlterTable.java family: RENAME TO, SET
        options, ADD/DROP columns, watermark changes): mutate the
        engine spec and re-register the batch view so subsequent reads
        see the new shape."""
        spec = self._specs.get(name)
        if spec is None:
            raise ValueError(f"unknown table: {name!r}")
        if set_options:
            spec.options.update(set_options)
        if add_computed_columns:
            spec.computed_columns.update(add_computed_columns)
        if drop_columns:
            for c in drop_columns:
                spec.computed_columns.pop(c, None)
        if set_watermark is not None:
            spec.watermark = set_watermark
        if rename_to:
            self.spark.catalog.dropTempView(name)
            del self._specs[name]
            spec.name = rename_to
            self._specs[rename_to] = spec
            name = rename_to
        df = spec.scan(self.spark)
        if drop_columns:
            df = df.drop(*[c for c in drop_columns if c in df.columns])
        df.createOrReplaceTempView(name)
        return spec

    # -- partition DDL (SqlAddPartitions.java / SqlDropPartitions.java /
    #    SqlShowPartitions.java residue) -------------------------------
    def show_partitions(self, name: str):
        """SHOW PARTITIONS for a file-backed engine table: Hive-style
        ``k=v`` directories under the table path."""
        import os

        spec = self._specs.get(name)
        if spec is None:
            raise ValueError(f"unknown table: {name!r}")
        parts = sorted(
            d
            for d in os.listdir(spec.path)
            if "=" in d and os.path.isdir(os.path.join(spec.path, d))
        )
        return self.spark.createDataFrame(
            [(p,) for p in parts], "partition string"
        )

    def add_partition(self, name: str, spec_kv: dict, data=None) -> None:
        """ALTER TABLE ADD PARTITION: materialize the ``k=v`` directory
        (optionally writing ``data`` into it) and refresh the view.
        Partition columns come from directory names — Spark's
        partition discovery picks them up on rescan."""
        import os

        spec = self._specs.get(name)
        if spec is None:
            raise ValueError(f"unknown table: {name!r}")
        sub = os.path.join(
            spec.path, *[f"{k}={v}" for k, v in spec_kv.items()]
        )
        if data is not None:
            df = data.to_df() if hasattr(data, "to_df") else data
            df.write.mode("overwrite").format(spec.format).save(sub)
        else:
            os.makedirs(sub, exist_ok=True)
        spec.scan(self.spark).createOrReplaceTempView(name)

    def drop_partition(self, name: str, spec_kv: dict) -> None:
        """ALTER TABLE DROP PARTITION: remove the ``k=v`` directory
        (destructive, like the reference's DROP PARTITION) and
        refresh the view."""
        import os
        import shutil

        spec = self._specs.get(name)
        if spec is None:
            raise ValueError(f"unknown table: {name!r}")
        sub = os.path.join(
            spec.path, *[f"{k}={v}" for k, v in spec_kv.items()]
        )
        if os.path.isdir(sub):
            shutil.rmtree(sub)
        spec.scan(self.spark).createOrReplaceTempView(name)

    def show_tables(self):
        return self.spark.sql("SHOW TABLES")

    def show_views(self):
        """SHOW VIEWS (SqlShowViews.java)."""
        return self.spark.sql("SHOW VIEWS")

    def show_functions(self, pattern: str | None = None):
        """SHOW FUNCTIONS (SqlShowFunctions.java): every SQL-callable
        name — Spark builtins plus the engine's registered Flink
        residue (SPLIT_INDEX, HASH_CODE, ...)."""
        q = "SHOW FUNCTIONS"
        if pattern is not None:
            q += f" LIKE '{pattern}'"
        return self.spark.sql(q)

    def describe_table(self, name: str):
        return self.spark.sql(f"DESCRIBE TABLE {name}")

    def create_statement_set(self) -> "StatementSet":
        """Multi-sink execution (StatementSet.java:32 /
        CommonSubGraphBasedOptimizer.scala:56): one query feeding
        several sinks. Spark analog: persist the shared sub-plan,
        run all writers (SURVEY §2.13b)."""
        return StatementSet()

    # -- UDF surface (SURVEY §2.12; TableEnvironmentImpl.java:345) -----
    def register_function(self, name: str, fn, return_type=None) -> None:
        """ScalarFunction registration → ``spark.udf.register``.
        Prefer SQL-expression functions (registry) or pandas_udf for
        hot paths; row-at-a-time Python UDFs are the slow path."""
        self.spark.udf.register(name, fn, return_type)

    def register_table_function(self, name: str, udtf_class) -> None:
        """TableFunction (UDTF) registration → Python UDTF
        (Spark 3.5+): a class with an ``eval`` yielding rows."""
        self.spark.udtf.register(name, udtf_class)


class StatementSet:
    """Collect several sink statements, execute together with the
    shared upstream persisted once (the reference's common-subgraph
    optimizer shares the sub-plan across sinks; Spark's unit of reuse
    is an explicit persist)."""

    def __init__(self):
        self._inserts: list[tuple[object, str, str, str]] = []
        self._shared: list = []

    def share(self, df):
        """Mark a DataFrame as feeding multiple sinks — persisted for
        the duration of execute() (IntermediateTableScan analog)."""
        self._shared.append(df)
        return df.persist()

    def add_insert(self, path: str, df, format: str = "parquet",
                   mode: str = "overwrite") -> "StatementSet":
        self._inserts.append((df, path, format, mode))
        return self

    def execute(self) -> None:
        try:
            for df, path, format, mode in self._inserts:
                df.write.format(format).mode(mode).save(path)
        finally:
            for df in self._shared:
                df.unpersist()
            self._inserts.clear()
            self._shared.clear()
