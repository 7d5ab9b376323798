r"""Sources, sinks and formats (SURVEY §2.1).

The reference's connector/format surface maps almost 1:1 onto Spark's
built-in DataSource V2 names; this module is the engine's thin,
uniform entry so a reference user finds the same capabilities:

| reference | cite (/root/reference) | here |
|---|---|---|
| filesystem connector, partitioned dir | flink-table-runtime-blink/.../filesystem/FileSystemTableFactory.java | ``read_table`` / ``write_table`` (partition_by) |
| csv / json / avro / orc / parquet formats | flink-formats/flink-{csv,json,avro,parquet,orc}/.../\*FormatFactory.java | same format names via ``format=`` |
| Kafka source/sink | flink-connector-kafka/.../KafkaDynamicTableFactory.java:37 | ``kafka_source`` / ``kafka_sink`` (needs the spark-sql-kafka package on the cluster) |
| datagen utility source | DataGenTableSourceFactory.java | ``datagen`` (rate source) |
| print sink | PrintTableSinkFactory.java | ``print_sink`` (console) |
| blackhole sink | BlackHoleTableSinkFactory.java | ``blackhole_sink`` (noop) |

Scale notes: ``write_table`` defaults to snappy parquet with
partitionBy for partition-pruned downstream scans; avro needs the
spark-avro package (gated, like Kafka).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUILTIN_FORMATS = {"parquet", "csv", "json", "orc", "text"}
PACKAGED_FORMATS = {"avro", "kafka"}  # need extra jars on the cluster


def read_table(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Batch read in any supported format. CSV defaults mirror the
    reference csv format's header/infer behavior."""
    reader = spark.read.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    if format == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", schema is None)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Batch sink (BatchExecSink / FileSystemTableSink semantics):
    write a directory table, optionally hive-partitioned."""
    writer = df.write.format(format).mode(mode)
    if format == "parquet":
        options.setdefault("compression", "snappy")
    if format == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def datagen(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 1
) -> DataFrame:
    """`datagen` utility source analog: monotonically increasing
    (timestamp, value) stream at a fixed rate."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )


def datagen_sequence(
    spark: SparkSession,
    start: int,
    end: int,
    col: str = "id",
    n_files: int = 4,
) -> DataFrame:
    """`datagen` SEQUENCE mode ('fields.<f>.kind' = 'sequence' in the
    reference's datagen connector — DataGeneratorSource with a
    SequenceGenerator): a BOUNDED deterministic stream producing
    ``start..end`` exactly once. Realized as a one-time range write
    replayed as a file stream (``n_files`` micro-batches), because
    Spark's rate sources are wall-clock-driven and therefore
    nondeterministic. The write is cached per (start, end, n_files)
    in the session temp space."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(f"{start}:{end}:{col}:{n_files}".encode()).hexdigest()[
        :12
    ]
    out = os.path.join(tempfile.gettempdir(), f"efo-datagen-{tag}")
    marker = os.path.join(out, "_EFO_DONE")
    if not os.path.exists(marker):
        n = end - start + 1
        per = max(1, (n + n_files - 1) // n_files)
        for k in range(n_files):
            lo = start + k * per
            hi = min(end + 1, lo + per)
            if lo >= hi:
                break
            spark.range(lo, hi).withColumnRenamed("id", col).coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(out, f"b={k}"))
        with open(marker, "w") as fh:
            fh.write("ok")
    schema = (
        spark.read.option("recursiveFileLookup", "true").parquet(out).schema
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(out)
    )


def print_sink(df: DataFrame, **options):
    """`print` sink analog. Streaming frame → console writeStream
    (returns the started query); batch frame → show()."""
    if df.isStreaming:
        return df.writeStream.format("console").options(**options).start()
    df.show(truncate=False)
    return None


def blackhole_sink(df: DataFrame, **options):
    """`blackhole` sink analog: full evaluation, no output. The
    batch path is a noop-format write (runs the whole plan through
    the sink exec, same as the reference's BlackHoleTableSink)."""
    if df.isStreaming:
        return df.writeStream.format("noop").options(**options).start()
    df.write.format("noop").mode("overwrite").save()
    return None


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """JDBC source (reference flink-connectors/flink-connector-jdbc,
    JdbcDynamicTableFactory's scan side) as a thin ``format("jdbc")``
    pass-through with the reference's option names mapped:

    * ``table`` ↔ Flink ``table-name`` (→ Spark ``dbtable``);
      ``query`` pushes a full SQL statement down to the database.
    * ``partition_column``/``lower_bound``/``upper_bound``/
      ``num_partitions`` ↔ Flink ``scan.partition.column`` /
      ``scan.partition.lower-bound`` / ``scan.partition.upper-bound``
      / ``scan.partition.num`` — WITHOUT these, the whole table reads
      through ONE task; at scale always set them so Spark issues
      range-predicate queries in parallel.

    Catalyst pushes filters/projections into the generated SQL
    (JDBCScan PushedFilters), same as the reference's
    JdbcFilterPushdownPreparedStatementVisitor. Requires the database's
    JDBC driver jar on the classpath — raises the driver's
    ClassNotFound error otherwise (env-gated like kafka)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    reader = spark.read.format("jdbc").option("url", url)
    if table is not None:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column needs lower_bound, upper_bound and "
                "num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int | None = None,
    **options,
) -> None:
    """JDBC sink (JdbcDynamicTableFactory's sink side; Flink
    ``sink.buffer-flush.max-rows`` ↔ Spark ``batchsize``). Plain
    INSERT semantics — upsert requires a database-specific MERGE via
    foreachBatch, same caveat as the reference's dialect-specific
    upsert statements."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if batch_size is not None:
        writer = writer.option("batchsize", str(batch_size))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    streaming: bool = True,
) -> DataFrame:
    """Kafka source (KafkaDynamicTableFactory analog). Requires the
    spark-sql-kafka package on the cluster — raises a clear error
    locally where the connector jar is absent."""
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    return (
        reader.option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """Kafka sink: df must carry ``key``/``value`` binary columns
    (the connector contract, same as the reference's key/value format
    split)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _upsert_statement(
    table: str, cols: list[str], key_cols: list[str], dialect: str
) -> str:
    """Dialect-specific upsert statement, mirroring the reference's
    JdbcDialect.getUpsertStatement (flink-connectors/flink-connector-jdbc
    .../dialect/{Postgres,MySQL}Dialect.java): postgres/sqlite use
    INSERT .. ON CONFLICT DO UPDATE, mysql uses ON DUPLICATE KEY."""
    collist = ", ".join(cols)
    qs = ", ".join(["?"] * len(cols))
    non_keys = [c for c in cols if c not in key_cols]
    if dialect in ("sqlite", "postgres"):
        conflict = ", ".join(key_cols)
        if non_keys:
            sets = ", ".join(f"{c} = excluded.{c}" for c in non_keys)
            action = f"DO UPDATE SET {sets}"
        else:
            action = "DO NOTHING"
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({qs}) "
            f"ON CONFLICT ({conflict}) {action}"
        )
    if dialect == "mysql":
        sets = ", ".join(f"{c} = VALUES({c})" for c in (non_keys or key_cols))
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({qs.replace('?', '%s')}) "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    raise ValueError(f"unsupported upsert dialect: {dialect!r}")


def jdbc_upsert_sink(
    df: DataFrame,
    table: str,
    key_cols: list[str],
    connect,
    dialect: str = "sqlite",
    batch_size: int = 500,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Keyed upsert sink (reference JdbcUpsertTableSink,
    flink-connectors/flink-connector-jdbc/.../JdbcUpsertTableSink.java +
    TableJdbcUpsertOutputFormat buffered-statement flush).

    ``connect`` is a zero-arg callable returning a DB-API connection —
    it executes ON THE EXECUTORS (must be picklable; e.g.
    ``lambda: sqlite3.connect(path)`` or a psycopg2 partial). Rows are
    written with executemany in ``batch_size`` chunks — the same
    statement-batched row path the reference uses
    (``sink.buffer-flush.max-rows``); a sink edge is I/O-bound, so
    per-row Python here is the connector contract, not a data-path UDF.

    Batch df → one foreachPartition pass. Streaming df → foreachBatch
    wrapping the same writer; with update-mode aggregates upstream,
    re-emitted rows overwrite by key, so the table converges to the
    latest state exactly like the reference's upsert sink
    materialization.

    At scale each partition opens one connection; size partitions
    (repartition before the sink) to the database's connection budget,
    same operational guidance as the reference connector.
    """
    stmt = _upsert_statement(table, list(df.schema.names), list(key_cols), dialect)

    def _write_partition(rows):
        conn = connect()
        try:
            cur = conn.cursor()
            buf = []
            for row in rows:
                buf.append(tuple(row))
                if len(buf) >= batch_size:
                    cur.executemany(stmt, buf)
                    conn.commit()
                    buf = []
            if buf:
                cur.executemany(stmt, buf)
                conn.commit()
        finally:
            conn.close()

    if not df.isStreaming:
        df.foreachPartition(_write_partition)
        return None

    def _write_batch(batch_df: DataFrame, _epoch: int) -> None:
        batch_df.foreachPartition(_write_partition)

    writer = df.writeStream.outputMode("update").foreachBatch(_write_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Elasticsearch / HBase connectors (reference:
# flink-connectors/flink-connector-elasticsearch{6,7},
# flink-connectors/flink-connector-hbase-{1.4,2.2}) — thin option-mapping
# wrappers over the public Spark connector formats. Jar-gated like kafka:
# the es-hadoop / hbase-spark connector jars ship on real clusters; locally
# load() raises the connector's ClassNotFound error.
# ---------------------------------------------------------------------------


def es_options(
    hosts: str,
    index: str,
    *,
    username: str | None = None,
    password: str | None = None,
    id_field: str | None = None,
    **extra: str,
) -> dict[str, str]:
    """Map the reference's Elasticsearch connector options
    (ElasticsearchConnectorOptions: ``hosts``, ``index``,
    ``username``/``password``, ``document-id.key-delimiter`` /
    key-extraction) to es-hadoop (``org.elasticsearch.spark.sql``)
    options. ``id_field`` ↔ the reference's primary-key-driven
    document id (UPSERT mode when set, APPEND otherwise — the same
    semantic split as the reference sink)."""
    opts = {"es.nodes": hosts, "es.resource": index}
    if username is not None:
        opts["es.net.http.auth.user"] = username
    if password is not None:
        opts["es.net.http.auth.pass"] = password
    if id_field is not None:
        opts["es.mapping.id"] = id_field
        opts["es.write.operation"] = "upsert"
    opts.update(extra)
    return opts


def es_source(spark: SparkSession, hosts: str, index: str, **opts) -> DataFrame:
    """Elasticsearch scan (Elasticsearch{6,7}DynamicSource analog).
    es-hadoop parallelizes one Spark partition per ES shard and pushes
    filters down as ES query DSL — the same pushdown the reference
    applies through its lookup/scan split."""
    reader = spark.read.format("org.elasticsearch.spark.sql")
    for k, v in es_options(hosts, index, **opts).items():
        reader = reader.option(k, v)
    return reader.load()


def es_sink(
    df: DataFrame,
    hosts: str,
    index: str,
    checkpoint_dir: str | None = None,
    **opts,
):
    """Elasticsearch sink (Elasticsearch7DynamicSink analog). Batch
    frames write directly; streaming frames write per micro-batch
    (the reference's bulk-flush buffering maps to es-hadoop's
    ``es.batch.size.*`` options passed via ``**opts``)."""
    mapped = es_options(hosts, index, **opts)
    if not df.isStreaming:
        writer = df.write.format("org.elasticsearch.spark.sql")
        for k, v in mapped.items():
            writer = writer.option(k, v)
        return writer.mode("append").save()
    writer = df.writeStream.format("org.elasticsearch.spark.sql")
    for k, v in mapped.items():
        writer = writer.option(k, v)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def hbase_catalog(
    table: str,
    row_key_col: str,
    columns: dict[str, tuple[str, str, str]],
    namespace: str = "default",
) -> str:
    """Build the hbase-spark catalog JSON from the reference's HBase
    schema model (HBaseTableSchema.java: a row key + column families
    of qualified columns). ``columns`` maps dataframe column →
    (family, qualifier, type)."""
    import json

    cols = {
        row_key_col: {"cf": "rowkey", "col": "key", "type": "string"},
    }
    for name, (cf, qualifier, typ) in columns.items():
        cols[name] = {"cf": cf, "col": qualifier, "type": typ}
    return json.dumps(
        {
            "table": {"namespace": namespace, "name": table},
            "rowkey": "key",
            "columns": cols,
        }
    )


def hbase_source(spark: SparkSession, catalog: str, **opts) -> DataFrame:
    """HBase scan (HBaseDynamicTableSource analog) via the public
    hbase-spark connector format. Row-key range predicates prune HBase
    regions server-side — the reference's lookup-by-rowkey fast path
    becomes a pushed filter here."""
    reader = (
        spark.read.format("org.apache.hadoop.hbase.spark")
        .option("catalog", catalog)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def hbase_sink(df: DataFrame, catalog: str, **opts) -> None:
    """HBase sink (HBaseDynamicTableSink analog): HBase puts are
    idempotent per (rowkey, column, version), giving the same
    effectively-exactly-once upsert semantics the reference documents
    for its HBase sink."""
    writer = (
        df.write.format("org.apache.hadoop.hbase.spark")
        .option("catalog", catalog)
        .option("hbase.spark.use.hbasecontext", "false")
    )
    for k, v in opts.items():
        writer = writer.option(k, v)
    writer.save()


# ---------------------------------------------------------------------------
# connector tail — thin option-mapped wrappers, ES/HBase pattern:
# the reference's builder/config surface maps 1:1 onto the PUBLIC
# Spark connector for each system; all jar-gated (the connector jar
# is not in this environment — wrappers fail with the connector's
# own class-not-found, never silently).
# ---------------------------------------------------------------------------


def cassandra_options(
    host: str,
    keyspace: str,
    table: str,
    *,
    port: int = 9042,
    username: str | None = None,
    password: str | None = None,
    consistency: str | None = None,
    **extra: str,
) -> dict[str, str]:
    """Map the reference's Cassandra connector surface
    (flink-connector-cassandra CassandraSink.java builder: setHost
    (default port 9042, CassandraSink.java:283-294),
    setDefaultKeyspace:272, ClusterBuilder credentials,
    MapperOptions consistency) to the public spark-cassandra-connector
    (``org.apache.spark.sql.cassandra``) options."""
    opts = {
        "spark.cassandra.connection.host": host,
        "spark.cassandra.connection.port": str(port),
        "keyspace": keyspace,
        "table": table,
    }
    if username is not None:
        opts["spark.cassandra.auth.username"] = username
    if password is not None:
        opts["spark.cassandra.auth.password"] = password
    if consistency is not None:
        opts["spark.cassandra.output.consistency.level"] = consistency
    opts.update(extra)
    return opts


def cassandra_source(
    spark: SparkSession, host: str, keyspace: str, table: str, **opts
) -> DataFrame:
    """Cassandra scan (CassandraInputFormat / CassandraSink analog's
    read side). The public connector partitions by token range and
    pushes partition-key predicates down server-side."""
    reader = spark.read.format("org.apache.spark.sql.cassandra")
    for k, v in cassandra_options(host, keyspace, table, **opts).items():
        reader = reader.option(k, v)
    return reader.load()


def cassandra_sink(
    df: DataFrame, host: str, keyspace: str, table: str, **opts
) -> None:
    """Cassandra sink (CassandraSink.java). Cassandra writes are
    last-write-wins upserts per primary key — the same
    effectively-exactly-once semantics the reference documents."""
    writer = df.write.format("org.apache.spark.sql.cassandra")
    for k, v in cassandra_options(host, keyspace, table, **opts).items():
        writer = writer.option(k, v)
    writer.mode("append").save()


def rmq_options(
    host: str,
    queue: str,
    *,
    port: int = 5672,
    virtual_host: str = "/",
    username: str | None = None,
    password: str | None = None,
    uri: str | None = None,
    **extra: str,
) -> dict[str, str]:
    """Map the reference's RabbitMQ connection surface
    (flink-connector-rabbitmq RMQConnectionConfig.Builder:
    setHost:320, setPort:312, setVirtualHost:330, setUserName:340,
    setPassword:350, setUri:363) to the community Spark RabbitMQ
    receiver's options; ``uri`` short-circuits the field form exactly
    like the reference's ``setUri``."""
    if uri is None:
        auth = (
            f"{username}:{password}@" if username is not None else ""
        )
        vh = virtual_host if virtual_host != "/" else "%2f"
        uri = f"amqp://{auth}{host}:{port}/{vh}"
    opts = {
        "hosts": host,
        "virtualHost": virtual_host,
        "queueName": queue,
        "amqp.uri": uri,
    }
    if username is not None:
        opts["userName"] = username
    if password is not None:
        opts["password"] = password
    opts.update(extra)
    return opts


def rmq_source(spark: SparkSession, host: str, queue: str, **opts) -> DataFrame:
    """RabbitMQ stream (RMQSource.java analog) via the community
    Spark receiver format — jar-gated; without the jar this raises
    the connector's class-not-found. Production deployments commonly
    bridge RMQ through Kafka instead (kafka_source above) — the
    option mapping here is the migration surface either way."""
    reader = spark.readStream.format("rabbitmq")
    for k, v in rmq_options(host, queue, **opts).items():
        reader = reader.option(k, v)
    return reader.load()


def pubsub_options(
    project: str,
    subscription: str | None = None,
    topic: str | None = None,
    **extra: str,
) -> dict[str, str]:
    """Map the reference's GCP Pub/Sub surface
    (flink-connector-gcp-pubsub PubSubSource.java
    withProjectName:246 / withSubscriptionName:253, PubSubSink's
    topic) to the public Google Pub/Sub Lite Spark connector's
    fully-qualified resource paths. Exactly one of
    ``subscription``/``topic`` (source reads a subscription, sink
    writes a topic — the reference splits the same way)."""
    if (subscription is None) == (topic is None):
        raise ValueError("exactly one of subscription/topic required")
    opts = dict(extra)
    if subscription is not None:
        opts["pubsublite.subscription"] = (
            f"projects/{project}/locations/{opts.pop('location', '-')}"
            f"/subscriptions/{subscription}"
        )
    else:
        opts["pubsublite.topic"] = (
            f"projects/{project}/locations/{opts.pop('location', '-')}"
            f"/topics/{topic}"
        )
    return opts


def pubsub_source(
    spark: SparkSession, project: str, subscription: str, **opts
) -> DataFrame:
    """GCP Pub/Sub stream (PubSubSource.java analog) via the public
    ``pubsublite`` Spark connector — jar-gated."""
    reader = spark.readStream.format("pubsublite")
    for k, v in pubsub_options(project, subscription=subscription, **opts).items():
        reader = reader.option(k, v)
    return reader.load()


def pubsub_sink(
    df: DataFrame, project: str, topic: str, checkpoint_dir: str, **opts
):
    """GCP Pub/Sub sink (PubSubSink.java analog) — jar-gated."""
    writer = df.writeStream.format("pubsublite").option(
        "checkpointLocation", checkpoint_dir
    )
    for k, v in pubsub_options(project, topic=topic, **opts).items():
        writer = writer.option(k, v)
    return writer.start()


def nifi_options(
    url: str,
    port_name: str,
    *,
    request_batch_count: int = 1000,
    **extra: str,
) -> dict[str, str]:
    """Map the reference's NiFi Site-to-Site surface
    (flink-connector-nifi NiFiSource.java:52 SiteToSiteClientConfig —
    target URL, output port name, request batch count) to the Apache
    NiFi Spark receiver's option names."""
    opts = {
        "nifi.url": url,
        "nifi.port.name": port_name,
        "nifi.request.batch.count": str(request_batch_count),
    }
    opts.update(extra)
    return opts


def nifi_source(spark: SparkSession, url: str, port_name: str, **opts) -> DataFrame:
    """NiFi Site-to-Site stream (NiFiSource.java analog) — jar-gated
    via the Apache NiFi Spark receiver format."""
    reader = spark.readStream.format("nifi")
    for k, v in nifi_options(url, port_name, **opts).items():
        reader = reader.option(k, v)
    return reader.load()


# ---------------------------------------------------------------------------
# CDC JSON formats (reference flink-formats/flink-json:
# debezium/DebeziumJsonDeserializationSchema.java — op r/c/u/d with
# before/after images, optional schema+payload envelope;
# canal/CanalJsonDeserializationSchema.java — data/old arrays with
# INSERT/UPDATE/DELETE type). Decoded into the engine's explicit
# row_kind changelog rows (+I/-U/+U/-D — RowKind.java:27-58), the same
# surface read_changelog/apply_changelog speak.
# ---------------------------------------------------------------------------


def debezium_json_decode(
    df: DataFrame,
    value_col: str,
    row_schema: str,
    schema_include: bool = False,
    ignore_parse_errors: bool = False,
) -> DataFrame:
    """Decode a Debezium JSON value column into changelog rows.

    ``row_schema`` is the payload row's DDL ("id BIGINT, v DOUBLE").
    Per the reference's op mapping: ``r``/``c`` → +I(after);
    ``u`` → -U(before) then +U(after); ``d`` → -D(before). With
    ``schema_include`` the envelope is ``{"schema":…,"payload":{…}}``
    and only payload is read (the reference ignores schema too).

    One ``from_json`` + two projections + a union — all narrow; a
    100 TB CDC topic decodes embarrassingly parallel with no shuffle.
    """
    from pyspark.sql.types import StructField, StructType, StringType

    row_t = StructType.fromDDL(row_schema)
    payload_t = StructType(
        [
            StructField("before", row_t),
            StructField("after", row_t),
            StructField("op", StringType()),
        ]
    )
    schema = (
        StructType([StructField("payload", payload_t)])
        if schema_include
        else payload_t
    )
    opts = {} if ignore_parse_errors else {"mode": "FAILFAST"}
    parsed = df.withColumn("__dbz", F.from_json(F.col(value_col), schema, opts))
    p = "__dbz.payload" if schema_include else "__dbz"
    if ignore_parse_errors:
        parsed = parsed.where(F.col(p).isNotNull())
    op = F.col(f"{p}.op")
    if not ignore_parse_errors:
        # strict contract (DebeziumJsonDeserializationSchema.java
        # throws IOException on an unrecognized op unless
        # ignoreParseErrors): FAILFAST only covers malformed JSON, so
        # a well-formed message with op outside r/c/u/d would silently
        # vanish — wrap op so every branch filter trips raise_error
        op = F.when(op.isin("r", "c", "u", "d"), op).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("debezium_json_decode: unknown op '"),
                    F.coalesce(op, F.lit("null")),
                    F.lit("' (set ignore_parse_errors=True to drop)"),
                )
            )
        )
    before_ok = F.col(f"{p}.before").isNotNull()
    after_ok = F.col(f"{p}.after").isNotNull()
    # null images produce no row (a "u" without a before-image — the
    # upsert-style encoders — contributes only its after half)
    inserts = parsed.where(op.isin("r", "c") & after_ok).select(
        F.col(f"{p}.after.*"), F.lit("+I").alias("row_kind")
    )
    upd_before = parsed.where((op == "u") & before_ok).select(
        F.col(f"{p}.before.*"), F.lit("-U").alias("row_kind")
    )
    upd_after = parsed.where((op == "u") & after_ok).select(
        F.col(f"{p}.after.*"), F.lit("+U").alias("row_kind")
    )
    deletes = parsed.where((op == "d") & before_ok).select(
        F.col(f"{p}.before.*"), F.lit("-D").alias("row_kind")
    )
    return (
        inserts.unionByName(upd_before)
        .unionByName(upd_after)
        .unionByName(deletes)
    )


def canal_json_decode(
    df: DataFrame,
    value_col: str,
    row_schema: str,
    ignore_parse_errors: bool = False,
) -> DataFrame:
    """Decode a Canal JSON value column into changelog rows
    (CanalJsonDeserializationSchema.java): ``{"data":[rows],
    "old":[changed-fields], "type":"INSERT|UPDATE|DELETE"}``.

    Canal's ``old[i]`` holds ONLY the changed fields of ``data[i]``
    (unchanged fields are absent/null) — the before-image is
    field-wise ``coalesce(old, data)``, the reference's own merge.
    """
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    row_t = StructType.fromDDL(row_schema)
    schema = StructType(
        [
            StructField("data", ArrayType(row_t)),
            StructField("old", ArrayType(row_t)),
            StructField("type", StringType()),
        ]
    )
    opts = {} if ignore_parse_errors else {"mode": "FAILFAST"}
    parsed = df.withColumn("__c", F.from_json(F.col(value_col), schema, opts))
    if ignore_parse_errors:
        parsed = parsed.where(F.col("__c").isNotNull())
    typ = F.col("__c.type")
    if not ignore_parse_errors:
        # strict contract (CanalJsonDeserializationSchema.java throws
        # on an unknown type unless ignoreParseErrors) — see the
        # matching guard in debezium_json_decode
        typ = F.when(typ.isin("INSERT", "UPDATE", "DELETE"), typ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("canal_json_decode: unknown type '"),
                    F.coalesce(typ, F.lit("null")),
                    F.lit("' (set ignore_parse_errors=True to drop)"),
                )
            )
        )
    # posexplode_OUTER so a message with a null/empty data array still
    # yields one row — otherwise an unknown type with no data would
    # dodge the strict check above; branches re-filter on a real row
    ex = parsed.select(
        typ.alias("__type"),
        F.posexplode_outer("__c.data").alias("__pos", "__row"),
        F.col("__c.old").alias("__old"),
    ).withColumn("__before_raw", F.element_at("__old", F.col("__pos") + 1))
    fields = row_t.fieldNames()
    has_row = F.col("__row").isNotNull()
    before = F.struct(
        *[
            F.coalesce(F.col(f"__before_raw.{f}"), F.col(f"__row.{f}")).alias(f)
            for f in fields
        ]
    )
    inserts = ex.where((F.col("__type") == "INSERT") & has_row).select(
        F.col("__row.*"), F.lit("+I").alias("row_kind")
    )
    upd_b = ex.where((F.col("__type") == "UPDATE") & has_row).select(
        before.alias("__b"), F.lit("-U").alias("row_kind")
    ).select("__b.*", "row_kind")
    upd_a = ex.where((F.col("__type") == "UPDATE") & has_row).select(
        F.col("__row.*"), F.lit("+U").alias("row_kind")
    )
    deletes = ex.where((F.col("__type") == "DELETE") & has_row).select(
        F.col("__row.*"), F.lit("-D").alias("row_kind")
    )
    return inserts.unionByName(upd_b).unionByName(upd_a).unionByName(deletes)


def debezium_json_encode(
    changelog: DataFrame,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Serialize the engine's changelog rows back to Debezium JSON —
    the sink side of the CDC format
    (JsonRowDataSerializationSchema.java + the Debezium format's
    serializer in the reference).

    With ``key_cols`` (the standard mode), each -U/+U retract pair is
    folded into ONE ``op:"u"`` message carrying BOTH images — what
    real Debezium consumers (including the reference's strict
    decoder, which fails on a null before for op "u") expect:
    +I → {"before":null,"after":row,"op":"c"}
    -U/+U pair → {"before":old,"after":new,"op":"u"}
    unpaired +U → {"before":null,"after":row,"op":"u"} (upsert style)
    -D → {"before":row,"after":null,"op":"d"}
    Pairs match on key equality plus per-key arrival rank ordered by
    ``change_seq`` when the column exists — exact for any log with a
    change_seq, and for at most one update per key per frame without.

    Without ``key_cols`` the encoder is ENGINE-INTERNAL, not
    Debezium-consumer compatible: it maps each changelog row
    independently, so a -U becomes op "u" with a null after and its
    +U a second "u" with a null before. A round trip through this
    repo's (lenient-on-null-images) :func:`debezium_json_decode`
    still preserves the (row, kind) multiset.

    Paired mode costs one shuffle over the update rows only (ranking
    window + pair join on key+rank); inserts/deletes stay narrow.
    """
    value_cols = [
        c
        for c in changelog.columns
        if c not in {"row_kind", "change_seq", "kind_order"}
    ]
    row_struct = "named_struct(" + ", ".join(
        f"'{c}', {c}" for c in value_cols
    ) + ")"
    null_struct = f"if(false, {row_struct}, null)"
    if not key_cols:
        return changelog.select(
            F.expr(
                "to_json(named_struct("
                f"'before', case when row_kind in ('-U', '-D') then {row_struct} "
                f"else {null_struct} end, "
                f"'after', case when row_kind in ('+I', '+U') then {row_struct} "
                f"else {null_struct} end, "
                "'op', case row_kind when '+I' then 'c' when '+U' then 'u' "
                "when '-U' then 'u' else 'd' end))"
            ).alias("value")
        )

    from pyspark.sql import Window

    order_cols = [c for c in ("change_seq", "kind_order") if c in changelog.columns]
    w = Window.partitionBy(*key_cols, "row_kind").orderBy(
        *(order_cols or [F.lit(1)])
    )
    ups = changelog.where(F.col("row_kind").isin("-U", "+U")).withColumn(
        "__r", F.row_number().over(w)
    )
    minus = ups.where(F.col("row_kind") == "-U").select(
        *key_cols, "__r", F.expr(row_struct).alias("__before")
    )
    plus = ups.where(F.col("row_kind") == "+U").select(
        *key_cols, "__r", F.expr(row_struct).alias("__after")
    )
    cond = minus["__r"] == plus["__r"]
    for k in key_cols:
        cond = cond & minus[k].eqNullSafe(plus[k])
    # explicit "before":null / "after":null (real Debezium emits the
    # null images; to_json would otherwise omit the field)
    u_msgs = minus.join(plus, cond, "full_outer").select(
        F.to_json(
            F.struct(
                minus["__before"].alias("before"),
                plus["__after"].alias("after"),
                F.lit("u").alias("op"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("value")
    )
    rest = changelog.where(F.col("row_kind").isin("+I", "-D")).select(
        F.expr(
            "to_json(named_struct("
            f"'before', case when row_kind = '-D' then {row_struct} "
            f"else {null_struct} end, "
            f"'after', case when row_kind = '+I' then {row_struct} "
            f"else {null_struct} end, "
            "'op', if(row_kind = '+I', 'c', 'd')), "
            "map('ignoreNullFields', 'false'))"
        ).alias("value")
    )
    return rest.unionByName(u_msgs)
