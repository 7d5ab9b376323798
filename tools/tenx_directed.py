"""10x measurement for the directed Gelly family (VERDICT r8 ask #3):
times triadic_census_directed, local_clustering_coefficient_directed
and vertex_metrics_directed on the mixed directed co-occurrence graph
at sf0.01 vs sf0.1 (min-of-2 walls, idle box). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_efo_spark.graph_queries import _mixed_edges  # noqa: E402
from flink_efo_spark.operators.iterate import (  # noqa: E402
    local_clustering_coefficient_directed,
    triadic_census_directed,
    vertex_metrics_directed,
)
from flink_efo_spark.session import get_spark  # noqa: E402

OPS = {
    "triadic_census_directed": triadic_census_directed,
    "local_clustering_coefficient_directed": (
        local_clustering_coefficient_directed
    ),
    "vertex_metrics_directed": vertex_metrics_directed,
}


def main() -> None:
    spark = get_spark("tenx-directed")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"load1": round(os.getloadavg()[0], 1)}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        e = _mixed_edges(spark, sf_dir)
        n_edges = e.count()  # also warms the scan
        sf = os.path.basename(sf_dir)
        out[sf] = {"edges": n_edges}
        for name, fn in OPS.items():
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(e).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[sf][name] = round(best, 2)
    for name in OPS:
        a, b = out["sf0.01"][name], out["sf0.1"][name]
        out[f"ratio_{name}"] = round(b / a, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
