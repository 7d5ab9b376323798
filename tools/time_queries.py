"""Time named queries at $SPARK_GRAFT_SF_DIR (bench methodology:
df.count(), N runs, report each + min). Usage:

    python tools/time_queries.py [-n RUNS] <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_efo_spark.queries import QUERIES  # noqa: E402
from flink_efo_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        QUERIES["join_inner_agg"](spark, sf_dir).collect()  # warmup
    except Exception as exc:
        print(f"warmup failed: {exc!r}", file=sys.stderr)
    for name in args:
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            walls.append(round(time.perf_counter() - t0, 3))
        load1 = round(os.getloadavg()[0], 1)
        print(f"{name}: min={min(walls):.3f} runs={walls} rows={n} load1={load1}")


if __name__ == "__main__":
    main()
