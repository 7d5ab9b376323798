"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q3-shaped join + agg
+ top-n) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
operator corpus from ``flink_efo_spark.queries`` — one entry per
implemented SURVEY.md §2 operator family, each with a DuckDB oracle
where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_efo_spark.queries import ORACLES, QUERIES, flagship  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF_SMOKE_DIR)


def _driver_order() -> list[str]:
    """Order queries so the driver's 50-query sample maximizes new
    information each round: (0) red on their latest driver check —
    re-verify fixes first, (1) never driver-checked, (2) green,
    least-recently-checked first (rotation, so every query
    eventually re-earns a row). Derived from the CORRECTNESS_r*.json
    history the driver itself writes into the repo."""
    import glob
    import json
    import re

    green: dict[str, bool] = {}  # name -> latest row was green
    round_of: dict[str, int] = {}  # name -> latest round with a row
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        for name, row in rows.items():
            # green requires value-hash and schema agreement too: a
            # rows-match/hash-mismatch row (e.g. an oracle dtype
            # artifact) must sort into the re-verify-first group, not
            # the green rotation (round-5 verdict: q12 would otherwise
            # sit at position 163/181 and never re-earn its row).
            # hash/schema keys are absent for rows-only (no-oracle)
            # checks — treat absent as passing.
            green[name] = (
                bool(row.get("rows_match"))
                and row.get("err") is None
                and row.get("hash_match") is not False
                and row.get("schema_match") is not False
            )
            round_of[name] = rnd

    idx = {n: i for i, n in enumerate(QUERIES)}
    # named by the round-3 verdict as must-get-a-row, plus this
    # round's new operator queries: front of the never-checked group
    # so a 50-query sample covers them all
    named = {
        "stream_asof_join",
        "stream_group_agg",
        "match_recognize_funnel",
        "over_range_frame",
        "count_window_agg",
        "dup_clusters",
        "stream_changelog",
        "json_predicates",
        "cep_skip_to_next",
        "stream_early_fire",
        "cep_nested_pairs",
        "repetition_stats",
        "python_udf_calc",
        "partitioned_sink",
        "ddl_catalog",
        "stream_prev_vpattern",
        "stream_late_capture",
        "dialect_tumble",
        "dialect_hop",
        "dialect_session",
        "pack_shards",
        "shard_manifest",
        "sha_timestamp_fns",
        "window_cumulate",
        "stream_cumulate",
        "dialect_tvf_tumble",
        "dialect_tvf_cumulate",
        "hll_distinct_rollup",
        "efo_watermark_alignment",
        "bm25_scores",
        "quantize_embeddings",
        "cep_permute_triples",
        "debezium_decode",
        "ivf_index_topk",
        "salted_distinct_users",
        "constraint_audit",
        "incremental_agg",
        "canal_decode",
        "window_dedup",
        "timer_sessions",
        "chunk_documents",
        # round-5 new operators
        "dialect_asof",
        "stream_match_nested",
        "delta_trigger_window",
        "sql_match_recognize",
        "ddl_sql",
        "hybrid_rrf_search",
        "stream_match_overlap",
        # round-5 TPC-DS corpus: a structurally diverse slice gets
        # priority rows now; the rest are never-checked and outrank
        # green rotation, so they earn rows in the following rounds
        "tpcds_q3",
        "tpcds_q6",
        "tpcds_q23",
        "tpcds_q36",
        "tpcds_q59",
        "tpcds_q74",
        "tpcds_q88",
        "tpcds_q95",
        # round-5b: the iterations upgrade (partial -> full per the
        # r4 coverage table) earns its driver row immediately
        "delta_iteration_bfs",
        "incremental_dedup",
        "stream_incremental_dedup",
        # round-6 new operators (budget <= 13 so the 36-query backlog
        # plus these all fit in the 50-row sample; q12's red re-verify
        # takes slot 1)
        "stream_over_rows_bounded",
        "stream_over_range_bounded",
        "sql_match_first_last",
        "ddl_view",
        "tpcds_q2",
        "tpcds_q4",
        "tpcds_q10",
        "tpcds_q11",
        "tpcds_q16",
        "tpcds_q27",
        "tpcds_q35",
        "tpcds_q67",
        "tpcds_q97",
        # round-6d: the k-means trainer. 14th named slot: with the
        # q12 red re-verify at position 0 this pushes exactly one
        # backlog query (tpcds_q75, pytest-green) to the r7 sample —
        # a new operator's first driver row is worth more than the
        # 36th backlog row arriving one round later.
        "kmeans_embeddings",
        # round-7: the four new queries (LIKE DDL + the Gelly tail).
        # The round otherwise adds nothing, so the 50-row sample still
        # drains 46 of the 100-query never-checked backlog; these four
        # earn their first row immediately per the kmeans precedent.
        "ddl_like",
        "label_propagation",
        "sssp_distances",
        "triangle_enum",
        # round-9: the Gelly graph corpus (staged r8, registered r9).
        # They are the only never-checked entries, so they drain in
        # one 50-row sample with or without naming; named for the
        # same first-row-now precedent as kmeans/ddl_like.
        "jaccard_pairs",
        "adamic_adar_pairs",
        "hits_scores",
        "community_labels",
        "clustering_metrics",
        "edge_metrics_row",
        "summary_graph_edges",
        "triadic_census_undirected",
        "bipartite_projection_top",
        "lcc_topn",
        "directed_census_row",
        "directed_clustering_row",
    }

    def key(n: str):
        if n in green and not green[n]:
            return (0, 0, idx[n])
        if n not in green:
            # never driver-checked: named (this round's new operators)
            # first, then the TPC-H backlog, then OPERATOR queries,
            # then never-checked TPC-DS LAST — a new operator family's
            # first row is worth more than another star-schema variant
            # whose plan family is already green (r6 verdict ranks the
            # round-6 operator surface above the 71 TPC-DS shapes).
            # Queries that already earned a green row fall through to
            # the rotation group so the sample spends its slots on new
            # information (round-4 verdict: the old `or n in named`
            # kept 40 greens ahead of the 47 never-checked)
            sub = (
                0 if n in named
                else (1 if n.startswith("tpch_")
                      else (3 if n.startswith("tpcds_") else 2))
            )
            return (1, sub, idx[n])
        return (2, round_of[n], idx[n])

    return sorted(QUERIES, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    previously-red first, then never-driver-checked, then stale-green."""
    return {n: QUERIES[n] for n in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return dict(ORACLES)
