"""Kinesis-EFO consumer analog — the reference fork's delta.

The reference replaces Flink's polling Kinesis consumer with an
Enhanced-Fan-Out (push) consumer (/root/reference
flink-connectors/flink-connector-kinesis-v2/): per-shard subscribe
loops (ShardConsumer.java:269 calling KinesisProxy.subscribeToShard,
KinesisProxy.java:439-464), checkpointed sequence numbers
(FlinkKinesisConsumer.java:103 snapshot/restore), shard
discovery/assignment across parallel subtasks
(KinesisDataFetcher.java), and cross-subtask watermark alignment
(util/WatermarkTracker.java, JobManagerWatermarkTracker.java).

This module reproduces those SEMANTICS on Structured Streaming with
no AWS dependency (actual Kinesis would be a third-party Spark
connector drop-in):

| EFO consumer concept | Spark realization here |
|---|---|
| shard | source partition: ``shard_of`` hash of the partition key (Kinesis shards ARE partition-key hash ranges) |
| per-shard subscribe loop, parallel subtasks | one file-stream source whose tasks read splits in parallel; ``shard`` column keys all downstream state |
| checkpointed sequence numbers | ``checkpointLocation`` offset log (exactly-once replay of file offsets) |
| rate limiting / push-pacing | ``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` trigger pacing |
| per-shard watermarks + alignment (WatermarkTracker) | ``withWatermark`` computes the global watermark as min over partitions — Spark aligns by construction; per-shard idleness has no knob (SURVEY §2.11 gap) |
| stream position LATEST/TRIM_HORIZON/AT_TIMESTAMP | bounded replay starts at TRIM_HORIZON; ``starting_ts`` filter approximates AT_TIMESTAMP |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_efo_spark.streaming import stream_table


def shard_of(key_col: str | Column, num_shards: int) -> Column:
    """Deterministic shard assignment — the Kinesis partition-key →
    shard hash-range mapping (md5-based like Kinesis's own MD5 ring,
    portable to any engine)."""
    c = key_col if isinstance(key_col, Column) else F.col(key_col)
    return F.pmod(
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint"),
        F.lit(num_shards),
    ).cast("int")


def efo_event_stream(
    spark: SparkSession,
    data_dir: str,
    num_shards: int = 4,
    partition_key: str = "user_id",
    watermark_delay: str = "10 minutes",
    starting_ts=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open the ``events`` table as an EFO-style sharded stream:
    events carry a ``shard`` column (stable partition-key hash),
    an event-time watermark, and replay is checkpointed by the sink's
    ``checkpointLocation`` (sequence-number semantics).

    Downstream stateful operators keyed by ``shard`` (or by
    ``partition_key`` itself) get the same data-partitioning the EFO
    consumer's parallel subtasks provide.
    """
    df = stream_table(
        spark,
        data_dir,
        "events",
        watermark=("ts", watermark_delay),
        max_files_per_trigger=max_files_per_trigger,
    )
    if starting_ts is not None:
        df = df.where(F.col("ts") >= F.lit(starting_ts))
    return df.withColumn("shard", shard_of(partition_key, num_shards))


def shard_stats(stream: DataFrame) -> DataFrame:
    """Per-shard throughput/watermark accounting — the observability
    surface the EFO consumer exposes per shard (records consumed,
    latest sequence position)."""
    return stream.groupBy("shard").agg(
        F.count("*").alias("n_records"),
        F.max("ts").alias("max_ts"),
        F.min("ts").alias("min_ts"),
        F.approx_count_distinct("user_id").alias("n_users"),
    )


def shard_watermarks(stats: DataFrame, delay_us: int) -> DataFrame:
    """Cross-shard watermark alignment — the reference fork's
    WatermarkTracker / JobManagerWatermarkTracker
    (flink-connectors/flink-connector-kinesis-v2/.../util/
    WatermarkTracker.java, JobManagerWatermarkTracker.java): each
    subtask reports its local (per-shard) watermark and the tracker
    aggregates the GLOBAL watermark as the minimum, letting fast
    shards see how far they run ahead (the emit-queue pacing signal).

    Input: per-shard stats carrying ``max_ts_us`` (from
    :func:`shard_stats` or equivalent). Output: shard, local_wm_us,
    global_wm_us (min over shards), lag_us (head start of this shard
    over the slowest). The global-min window runs over one row per
    shard — thousands at most, so the unpartitioned window is fine at
    any scale."""
    from pyspark.sql import Window

    local = (F.col("max_ts_us") - F.lit(delay_us)).alias("local_wm_us")
    g = Window.partitionBy()
    return (
        stats.select("shard", local)
        .withColumn("global_wm_us", F.min("local_wm_us").over(g))
        .withColumn(
            "lag_us", F.col("local_wm_us") - F.col("global_wm_us")
        )
    )
