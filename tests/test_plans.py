"""Plan-shape pins for the scale-critical queries.

tools/plan_audit.py sweeps every query as a tool; these tests pin the
HANDFUL of plan properties the 100 TB design depends on, so a
regression (a lost broadcast, a surprise cartesian product, a
Python-UDF slipping into a hot path) fails CI with a named assertion
instead of surfacing as a slow round. Assertions are deliberately
loose — presence/absence of node kinds, not full plan text — to stay
stable across Spark versions.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

_QUERIES = entrymod.queries()


def _plan(spark, name: str) -> str:
    df = _QUERIES[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize(
    "name",
    ["tpcds_q3", "tpcds_q19", "tpcds_q42", "broadcast_dim_join", "tpch_q3_shipping"],
)
def test_star_queries_broadcast_their_dims(spark, name):
    """Star joins must broadcast the dimension side — a star query
    whose dims shuffle is the canonical 100 TB regression."""
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["tpcds_q25", "tpcds_q93", "calc", "tpch_q1_pricing"]
)
def test_no_python_row_udf_in_relational_paths(spark, name):
    """Relational queries stay JVM-side: no row-at-a-time Python eval
    (BatchEvalPython) and no arrow fallback in the plan."""
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_scan_filters_push_down(spark):
    """The calc query's shipdate/discount/quantity filters must reach
    the parquet scan (PushedFilters non-empty)."""
    plan = _plan(spark, "calc")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "calc: empty PushedFilters on the lineitem scan"


def test_dedup_exact_uses_partial_aggregate(spark):
    """dedup_exact must keep the min_by aggregate form (map-side
    partial combine), not a row_number window over the full shuffle."""
    plan = _plan(spark, "dedup_exact")
    assert "min_by" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
    assert "RunningWindowFunction" not in plan


def test_q88_is_single_pass(spark):
    """tpcds_q88's Spark plan must stay the one-scan conditional
    aggregate — if it ever regresses to the literal 4-scan cross-join
    grid, the scan count shows it."""
    import re

    plan = _plan(spark, "tpcds_q88")
    # formatted explain lists each scan in the tree AND the detail
    # section — count the numbered detail nodes (one per real scan)
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert scans <= 2, f"q88: {scans} fact scans (single-pass regressed)"
    assert "CartesianProduct" not in plan


def test_q4_is_single_pivot_pass(spark):
    """tpcds_q4's Spark plan must stay the pivoted conditional
    aggregation — one shuffle on customer_sk — not the oracle's 6-way
    self-join (which would show 6+ SortMergeJoin/ShuffledHashJoin
    nodes on customer_sk)."""
    plan = _plan(spark, "tpcds_q4")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "q4 regressed to self-joins"
    )


def test_q27_q67_broadcast_and_expand(spark):
    """The rollup grids broadcast every dim and plan the rollup as a
    single Expand + aggregate (no join shuffle)."""
    for name in ("tpcds_q27", "tpcds_q67"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, f"{name}: dims must broadcast"
        assert "Expand" in plan, f"{name}: rollup must plan as Expand"
        assert "CartesianProduct" not in plan


def test_q97_fused_single_pass(spark):
    """q97 is fused onto ONE lineitem pass with per-channel presence
    flags (no FULL OUTER join of two distinct pair-sets): a single
    pair-key aggregate over lineitem broadcast-joined to orders, and
    never a nested-loop/cartesian shape."""
    import re

    plan = _plan(spark, "tpcds_q97")
    assert "FullOuter" not in plan, "q97 regressed to the two-pass full outer"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert scans <= 2, f"q97: {scans} scans (single lineitem pass regressed)"
    assert "BroadcastHashJoin" in plan, "q97: orders side must broadcast"


@pytest.mark.parametrize("name", ["tpcds_q17", "tpcds_q29", "tpcds_q72"])
def test_fact_chain_joins_ride_natural_keys(spark, name):
    """The multi-fact chains (sale->return->repurchase; week-aligned
    catalog-web) must hash/sort-merge on their natural keys with dims
    broadcast — never a cartesian/nested-loop shape."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ"
    assert "BroadcastHashJoin" in plan, f"{name}: dims not broadcast"


@pytest.mark.parametrize("name", ["tpcds_q70", "tpcds_q86"])
def test_ranked_rollups_expand_once(spark, name):
    """The grouping()-ranked rollups plan ONE Expand feeding one
    aggregate; the rank window rides the aggregated relation."""
    plan = _plan(spark, name)
    assert plan.count("Expand") >= 1, f"{name}: no Expand (rollup lost)"
    assert "Window" in plan, f"{name}: rank window missing"
    assert "CartesianProduct" not in plan


def test_q77_unions_preaggregated_pnl(spark):
    """q77's six per-location P&L aggregates must each reduce their
    fact BEFORE the union/rollup (partial aggregation below the
    union), and the channel combine joins stay broadcast/hash."""
    plan = _plan(spark, "tpcds_q77")
    assert "Union" in plan
    assert "CartesianProduct" not in plan
    # six fact scans -> six aggregates before the final rollup's
    assert plan.count("HashAggregate") >= 6


def test_kmeans_assignment_is_narrow(spark):
    """kmeans_train's final output is driver-built from k*d rows, but
    the per-iteration assignment must never plan a join: centroids
    ride as literals. Pin by checking the assignment stage the
    operator builds internally."""
    from flink_efo_spark.catalog import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    vq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1_000_000)).cast("long"),
    )
    base = emb.select(F.col("vec_id").alias("__id"), vq.alias("__vq"))
    cents = [list(r["__vq"]) for r in base.orderBy("__id").limit(2).collect()]
    dist_structs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("__vq"),
                        F.array(*[F.lit(v).cast("long") for v in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(ci).cast("long").alias("cid"),
            )
            for ci, c in enumerate(cents)
        ]
    )
    assigned = base.select("__id", F.array_min(dist_structs)["cid"].alias("c"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = assigned._jdf.queryExecution().explainString(mode)
    for node in ("Join", "Exchange", "BatchEvalPython"):
        assert node not in plan, f"kmeans assignment plans a {node}"
