"""10x scale experiment for the relational/TPC-DS corpus: replicate
the sf0.1 lineitem+orders facts 10 times with disjoint order keys
into /tmp and time selected queries at 1x vs 10x.

The replication preserves the star shape honestly: order keys get
per-copy offsets (join fan-in per key unchanged, fact-fact joins see
10x distinct keys), while part/supp/cust keys are untouched (the
dimensions stay dimension-sized, group-by cardinality is constant and
per-group row counts grow 10x — exactly what a bigger corpus does to
a star query). Dimension tables and the non-relational tables are
copied once.

Usage: python tools/tenx_tpch.py [query ...]
Defaults to the TPC-DS star/bench set. Corpus cached in
/tmp/efo_tenx_tpch; reruns skip the build.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_efo_spark.catalog import load_table  # noqa: E402
from flink_efo_spark.queries import QUERIES  # noqa: E402
from flink_efo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TENX_DIR = "/tmp/efo_tenx_tpch"
COPIES = 10
ORDER_OFF = 1_000_000_000

DEFAULT_QUERIES = ["tpcds_q3", "tpcds_q25", "tpcds_q51", "tpcds_q75",
                   "tpch_q1_pricing", "tpch_q18_large_orders"]


def build_corpus(spark) -> None:
    done = os.path.join(TENX_DIR, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(TENX_DIR, exist_ok=True)
    # facts: replicate with disjoint order keys
    for tbl, key in [("lineitem", "l_orderkey"), ("orders", "o_orderkey")]:
        df = load_table(spark, SF_DIR, tbl)
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * ORDER_OFF))
            for i in range(COPIES)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(
            os.path.join(TENX_DIR, f"{tbl}.parquet")
        )
    # everything else: copy once
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "events", "documents", "embeddings"]:
        src = os.path.join(SF_DIR, f"{tbl}.parquet")
        dst = os.path.join(TENX_DIR, f"{tbl}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    open(done, "w").write("ok\n")


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("tenx-tpch")
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark)
    for name in names:
        fn = QUERIES[name]
        for label, d in [("1x", SF_DIR), ("10x", TENX_DIR)]:
            best = None
            for _ in range(2):  # min-of-2: codegen-warm walls
                t0 = time.monotonic()
                n = fn(spark, d).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            print(f"{name} {label}: {best:.2f}s ({n} rows)", flush=True)


if __name__ == "__main__":
    main()
