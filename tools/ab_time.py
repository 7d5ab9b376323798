"""Paired A/B wall timing for named queries in ONE warm process.

Usage: python tools/ab_time.py <n_runs> <query> [query ...]

Runs each query n_runs times (count() action, the bench methodology)
after one untimed warm run, prints per-run walls and the min. Use by
alternating two checkouts (stash/unstash) under the same box state —
see OPTIMIZATION_r11.md measurement-hygiene notes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_efo_spark.queries import QUERIES  # noqa: E402
from flink_efo_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["join_inner_agg"](spark, sf_dir).collect()  # codegen warmup
    print(f"load1={os.getloadavg()[0]:.1f}")
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # per-plan codegen warm (discarded)
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(walls):.3f} "
            + " ".join(f"{w:.2f}" for w in walls)
        )
    print(f"load1_after={os.getloadavg()[0]:.1f}")


if __name__ == "__main__":
    main()
