"""Plan audit: scan every query's physical plan for scale red flags.

Checks (per SURVEY §4 / the 100 TB design goals):
* CartesianProduct / BroadcastNestedLoopJoin where not intentional
* BatchEvalPython (row-at-a-time Python UDF) anywhere
* parquet scans with empty PushedFilters under a Filter
* missing broadcast on the dimension side of known dim joins

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from flink_efo_spark.session import get_spark  # noqa: E402

# queries where a nested-loop/cross shape is the intended plan
# intentional broadcast nested-loop joins: the exact all-pairs
# ground-truth scans (lsh_recall embeds cosine_topk as its truth side;
# embedding_near_dup runs its exhaustive verify path on this
# near-random corpus — the LSH path is the scale path, pytest-proven)
INTENTIONAL_NLJ = {
    "cosine_topk",
    "lsh_recall",
    "embedding_near_dup",
    # scalar-subquery thresholds: join(broadcast(<1-row agg>)) — the
    # single build row makes the BNLJ a constant-size broadcast, the
    # correct plan at any scale (Catalyst plans uncorrelated scalar
    # subqueries the same way)
    "tpch_q11_important_value",
    "tpch_q22_global_sales",
    # corpus constants (N, avgdl) — a 1-row aggregate broadcast into
    # the scoring join; same constant-size-build reasoning
    "bm25_scores",
    # the single query vector broadcast against the embedding table
    # (crossJoin of a 1-row relation) — constant-size build
    "hybrid_rrf_search",
    # scalar max-spend threshold: join(broadcast(<1-row max agg>))
    # gating the best-customer semi-join side — constant-size build
    "tpcds_q23",
    "tpcds_q23b",
    # corpus-average 5% threshold: join(broadcast(<1-row avg agg>))
    # over the grouped ssales relation — constant-size build
    "tpcds_q24",
    "tpcds_q24b",
    # corpus-average sale threshold: the same 1-row avg broadcast
    "tpcds_q14b",
    # graph metric rows: crossJoins of 1-ROW aggregate relations
    # (global/average coefficient, census class counts, vertex
    # metrics) — every build side is a single row by construction,
    # the constant-size-build reasoning above
    "clustering_metrics",
    "triadic_census_undirected",
    "directed_census_row",
    "directed_clustering_row",
    # DSIR ratio-table totals: crossJoin(broadcast(<1-row sum agg>))
    # over the num_buckets-row checkpointed counts — constant-size
    # build (arXiv:2302.03169 fit step)
    "dsir_topn",
    "curation_pipeline_v2",
    # tercile cuts: crossJoin(broadcast(<1-row 2-percentile agg>)) —
    # constant-size build (the CCNet head/middle/tail split)
    "ccnet_lm_buckets",
    # idf denominator: crossJoin(broadcast(<1-row countDistinct agg>))
    # — constant-size build
    "tfidf_top_terms",
}


def _all_queries() -> dict:
    """Registered corpus + staged-for-next-round modules, so staged
    pairs meet the same plan bar BEFORE registration."""
    qs = dict(entrymod.queries())
    for mod in (
        "graph_queries_r10",
        "curation_queries_r10",
        "curation_queries_r11",
    ):
        try:
            m = __import__(f"flink_efo_spark.{mod}", fromlist=["*"])
        except ImportError:
            continue
        qs.update(m.STAGED_QUERIES)
    return qs


# streaming queries execute eagerly; plan text is the batch result's
STREAMING = {q for q in _all_queries() if q.startswith(("stream_", "efo_"))}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flags = 0
    for name, fn in sorted(_all_queries().items()):
        if name in STREAMING:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"ERROR {name}: {e}")
            flags += 1
            continue
        issues = []
        if "CartesianProduct" in plan and name not in INTENTIONAL_NLJ:
            issues.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in INTENTIONAL_NLJ:
            issues.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            issues.append("row-at-a-time PythonUDF")
        if issues:
            flags += 1
            print(f"FLAG {name}: {', '.join(issues)}")
        else:
            print(f"ok   {name}")
    print(f"\n{flags} flagged")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
