"""Dump .explain('formatted') for named queries to plans/<outdir>/.

Usage: python tools/dump_plan.py <outdir-suffix> <query> [query ...]

Writes plans/r11/<query>_<suffix>.txt (driver-side only: builds the
DataFrame and explains the INITIAL plan; no job runs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_efo_spark.queries import QUERIES  # noqa: E402
from flink_efo_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r11")
    os.makedirs(outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_scan = plan.count("Scan parquet")
        print(f"{name}: {n_ex} Exchange, {n_scan} scans -> {path}")


if __name__ == "__main__":
    main()
