"""10x scale experiment: replicate the sf0.1 events table 10 times
with disjoint user_id/event_id offsets into /tmp and time selected
operators at 1x vs 10x — the sandbox's stand-in for a cluster
scale-up (more data AND more distinct keys; file count grows so scan
parallelism grows with it, like adding input splits on a cluster).

Usage: python tools/tenx_experiment.py [query ...]
Writes one line per (query, scale) to stdout; the corpus is cached in
/tmp/efo_tenx so reruns skip the build.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_efo_spark.catalog import load_table  # noqa: E402
from flink_efo_spark.queries import QUERIES  # noqa: E402
from flink_efo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TENX_DIR = "/tmp/efo_tenx"
COPIES = 10
# offsets keep replicas' keys disjoint: state size and group counts
# scale with the data, the honest cluster analogy
USER_OFF = 10_000_000
EVENT_OFF = 1_000_000_000


def build_corpus(spark) -> None:
    def replicate(name, id_shifts, salt_col=None):
        out = os.path.join(TENX_DIR, f"{name}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            return
        base = load_table(spark, SF_DIR, name)
        parts = []
        for i in range(COPIES):
            p = base
            for col, off in id_shifts.items():
                p = p.withColumn(col, F.col(col) + F.lit(i * off))
            if salt_col is not None and i > 0:
                # replica text must not near-collide with replica 0's:
                # a per-replica token prefix changes every shingle
                p = p.withColumn(
                    salt_col, F.concat(F.lit(f"r{i}x "), F.col(salt_col))
                )
            parts.append(p)
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.unionByName(p)
        allp.repartition(32).write.mode("overwrite").parquet(out)

    replicate("events", {"user_id": USER_OFF, "event_id": EVENT_OFF})
    # text/ANN corpora replicate too (disjoint ids; salted text so the
    # dedup families see 10x distinct documents, not 10 exact copies)
    replicate("documents", {"doc_id": 10_000_000}, salt_col="text")
    replicate("embeddings", {"vec_id": 10_000_000})
    # the relational tables are read by some queries' setup; symlink 1x
    for t in "region nation customer supplier part orders lineitem".split():
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(TENX_DIR, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def run(spark, name: str, sf_dir: str) -> float:
    best = None
    for _ in range(2):  # min-of-2, codegen-warm (bench.py convention)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    names = sys.argv[1:] or [
        "dialect_asof",
        "delta_trigger_window",
        "stream_match_nested",
    ]
    spark = get_spark("efo-tenx")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(TENX_DIR, exist_ok=True)
    build_corpus(spark)
    for name in names:
        t1 = run(spark, name, SF_DIR)
        t10 = run(spark, name, TENX_DIR)
        print(
            f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={t10 / t1:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
