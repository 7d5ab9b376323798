"""Micro-batch machinery probe: run one streaming replay query and dump
the per-trigger durationMs / stateOperators breakdown so the per-batch
floor (planning vs state commit vs addBatch) is measured, not guessed.

Usage: python tools/stream_probe.py <query> [conf=k:v ...]
  query in {coprocess, cep, over_rows, match_nested}
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_efo_spark.session import get_spark  # noqa: E402
from flink_efo_spark.catalog import load_table  # noqa: E402


def build(name, spark, sf_dir):
    from flink_efo_spark.streaming import stream_table_split

    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    if name == "coprocess":
        from flink_efo_spark.streaming import stream_keyed_coprocess

        src = stream_table_split(
            spark, sf_dir, "events", 4, "ts", watermark=("ts", "10 minutes"),
            sentinel_rows=[
                {"event_id": -1, "user_id": -1, "event_type": "click",
                 "ts": max_ts + datetime.timedelta(hours=2), "value": 0.0},
                {"event_id": -2, "user_id": -1, "event_type": "signup",
                 "ts": max_ts + datetime.timedelta(hours=2), "value": 0.0},
            ],
        )
        return stream_keyed_coprocess(
            src.where(F.col("event_type") == "click").select(
                "user_id", "event_id", "ts", "value"),
            src.where(F.col("event_type") == "signup").select(
                "user_id", "ts", "value"),
            ["user_id"], "ts", "ts",
            rule_cols=["value"], data_cols=["event_id"],
            tiebreak="event_id", flush_on_timeout=True,
        )
    if name == "cep":
        from flink_efo_spark.operators.cep_pattern import (
            CepPattern, stream_cep_pattern_select)

        src = stream_table_split(
            spark, sf_dir, "events", 4, "ts", watermark=("ts", "10 minutes"),
            sentinel_rows=[
                {"event_id": -1, "user_id": -1, "event_type": "__wm__",
                 "ts": max_ts + datetime.timedelta(hours=2), "value": 0.0}
            ],
        )
        pat = (CepPattern.begin("a").where("event_type = 'view'")
               .followed_by("b").where("event_type = 'purchase'")
               .within(900))
        return stream_cep_pattern_select(
            src.select("user_id", "event_id", "event_type", "ts"), pat,
            ["user_id"], "ts",
            {"view_id": ("a", "first", "event_id"),
             "purchase_id": ("b", "first", "event_id")},
            tiebreak="event_id", emit_timeouts=True, flush_on_timeout=True,
            end_of_input_ts=max_ts + datetime.timedelta(minutes=1),
        )
    raise SystemExit(f"unknown query {name}")


def main():
    name = sys.argv[1]
    confs = {}
    for a in sys.argv[2:]:
        if a.startswith("conf="):
            k, v = a[5:].split(":", 1)
            confs[k] = v
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream-probe", **confs)
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile
    out = build(name, spark, sf_dir)
    t0 = time.perf_counter()
    ckpt = tempfile.mkdtemp(prefix="efo-probe-ckpt-")
    q = (out.writeStream.format("memory").queryName("probe")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.perf_counter() - t0
    n = spark.table("probe").count()
    print(f"== {name} wall={wall:.2f}s rows={n} confs={confs}")
    for p in q.recentProgress:
        d = p["durationMs"]
        so = p.get("stateOperators") or []
        s0 = so[0] if so else {}
        print(json.dumps({
            "batchId": p["batchId"], "rows": p["numInputRows"],
            "durationMs": d,
            "state": {k: s0.get(k) for k in (
                "commitTimeMs", "allUpdatesTimeMs", "allRemovalsTimeMs",
                "numStateStoreInstances", "numRowsTotal")},
        }))


if __name__ == "__main__":
    main()
