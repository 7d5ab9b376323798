"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is materialized via a count-ish action (``collect`` on
already-small results, ``count`` otherwise is wrong for bench purposes
— we want full result production, so we use ``df.collect()`` when the
result is bounded and ``df.count()`` only to force full evaluation of
unbounded outputs; both execute the complete plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_efo_spark.queries import QUERIES  # noqa: E402
from flink_efo_spark.session import get_spark  # noqa: E402

# headline subset: one per major operator family, heaviest shapes first
BENCH_QUERIES = [
    "hash_agg",
    "join_inner_agg",
    "join_left_outer",
    "broadcast_dim_join",
    "rollup_agg",
    "over_window",
    "top_n",
    "dedup_exact",
    "interval_join",
    "asof_join",
    "window_tumble",
    "minhash_pairs",
    "simhash_signatures",
    "cosine_topk",
    "lsh_cosine_topk",
    "token_stats",
    "match_recognize_funnel",
    "stream_tumble",
    # round 3 additions: multi-join TPC-H shapes + stateful streaming
    "tpch_q1_pricing",
    "tpch_q5_local_supplier",
    "tpch_q10_returns",
    "tpch_q18_large_orders",
    "stream_asof_join",
    "count_window_agg",
    # round 3b: iterative duplicate clustering + a 5-way join shape
    "dup_clusters",
    "tpch_q7_volume",
    # round 5: the FULL TPC-H sweep — the relational core is the piece
    # most exposed to plan regressions, so every shape gets a
    # per-round timing row (r4 verdict item 5)
    "tpch_q2_min_cost",
    "tpch_q3_shipping",
    "tpch_q4_priority",
    "tpch_q6_forecast",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q11_important_value",
    "tpch_q12_shipmode",
    "tpch_q13_custdist",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting",
    "tpch_q22_global_sales",
    # round 4: nested CEP groups + repetition quality filter (the
    # changelog / early-fire queries stay correctness-only: their
    # wall is ~fixed multi-trigger replay harness cost, not data-path
    # work, so timing them adds noise rather than signal)
    "cep_nested_pairs",
    "repetition_stats",
    # round 4b: sliced cumulate windows, BM25 postings scoring, HLL
    # sketch rollup — each a distinct plan family worth a perf row
    "window_cumulate",
    "bm25_scores",
    "hll_distinct_rollup",
    # round 4c: event-time-timer sessions (the stateful-timer family)
    "timer_sessions",
    # round 5: temporal-join SQL shim, delta-triggered window,
    # streaming nested-group CEP — new plan families, each with a 10×
    # experiment in SCALE.md
    "dialect_asof",
    "delta_trigger_window",
    "stream_match_nested",
    # round 5b: TPC-DS slice over the derived star schema — one query
    # per distinct plan family (star topn, correlated-subquery
    # decorrelation, multi-fact chain, rollup+rank, CTE 4-way
    # self-join, single-pass bucket grid, self-join + semi/anti)
    "tpcds_q3",
    "tpcds_q6",
    "tpcds_q25",
    "tpcds_q36",
    "tpcds_q74",
    "tpcds_q88",
    "tpcds_q95",
    # round 5c: delta-iteration BFS (frontier-driven workset) and
    # incremental dedup (signature-store anti-join) — new iterative /
    # ingest plan families
    "delta_iteration_bfs",
    "incremental_dedup",
    # round 6: the heavy TPC-DS tail that landed after the r5 list
    # froze (q49 per-channel return ratios, q64 the corpus's biggest
    # join tree, q87 EXCEPT chain) + the full remaining TPC-DS corpus
    # so every registered shape has a perf row
    "tpcds_q1",
    "tpcds_q7",
    "tpcds_q14",
    "tpcds_q15",
    "tpcds_q19",
    "tpcds_q23",
    "tpcds_q31",
    "tpcds_q42",
    "tpcds_q47",
    "tpcds_q49",
    "tpcds_q51",
    "tpcds_q56",
    "tpcds_q59",
    "tpcds_q64",
    "tpcds_q65",
    "tpcds_q73",
    "tpcds_q75",
    "tpcds_q76",
    "tpcds_q87",
    "tpcds_q90",
    "tpcds_q93",
    # round 6b: the new LTV/EXISTS-grid/rollup-grid/full-outer shapes
    "tpcds_q2",
    "tpcds_q4",
    "tpcds_q10",
    "tpcds_q11",
    "tpcds_q16",
    "tpcds_q27",
    "tpcds_q35",
    "tpcds_q67",
    "tpcds_q97",
    # round 6c: streaming bounded-preceding OVER (rolling-metric
    # shape) + DEFINE-navigation MATCH_RECOGNIZE
    "stream_over_rows_bounded",
    "stream_over_range_bounded",
    "sql_match_first_last",
    # round 6d: the corpus-completing batch — one row per NEW plan
    # family (the q52/q55/q12/q20-style star variants share plans
    # with already-benched families and would add noise, not signal)
    "tpcds_q17",   # 3-fact natural-key chain + closed-form stddev
    "tpcds_q22",   # 4-level item rollup (Expand) over a year slice
    "tpcds_q38",   # tri-channel INTERSECT of (customer, day) pairs
    "tpcds_q39",   # per-warehouse volatility cov + month self-join
    "tpcds_q53",   # manufacturer deviation-vs-window-average family
    "tpcds_q57",   # lag/lead + yearly-avg windows on catalog
    "tpcds_q70",   # grouping()-ranked geography rollup + top-5 semi
    "tpcds_q72",   # week-aligned catalog-web fact-fact join
    "tpcds_q77",   # cross-channel P&L: 6 pre-aggs + rollup
    "tpcds_q80",   # cross-channel P&L: line-level returns netting
    "tpcds_q94",   # multi-warehouse semi + never-returned anti join
    "tpcds_q14b",  # hierarchy-level INTERSECT + 1-row avg threshold
    "tpcds_q23b",  # best-customer semi gates + channel union
    "tpcds_q24",   # returned-purchase agg + 5%-of-average threshold
    # round 6e: the two new operator families
    "kmeans_embeddings",   # 2 Lloyd iterations, literal-centroid maps
    "cms_heavy_hitters",   # one-pass bounded-shuffle sketch + lookup
    # round 6f: the sketch-family completions
    "hist_quantiles",      # one-pass histogram + on-sketch read-back
    "hist_group_quantiles",  # per-group sketches, partitioned read-back
    "bloom_prefilter_join",  # broadcast bit probes below fact shuffle
    # round 6g: data-layout operators (write + pruned/co-located read)
    "zorder_range_scan",   # Morton layout write + partition-pruned box scan
    "bucketed_join",       # bucketed tables + exchange-free SMJ
    # round 6h: product-quantization ANN (train + encode + ADC top-k)
    "pq_adc_topk",
    # round 6h: bulk-iteration PageRank (3 rounds, co-purchase graph)
    "pagerank_topn",
    # round 6i: the composed normalize->dedup->chunk->pack pipeline
    "corpus_pipeline",
    # round 6j: flink-cep Pattern API (negative pattern + timeout path)
    "cep_pattern_notfollowed",
    "cep_pattern_timeout",
    # round 6k: iterative condition + the streaming frontier path
    "cep_pattern_iterative",
    "stream_cep_pattern",
    # round 6k: connected-streams co-process (shared keyed state)
    "stream_coprocess_rules",
    # round 6k: GroupPattern + incremental near-dup store
    "cep_pattern_group",
    "incremental_near_dedup",
    # round 6k: deterministic mixture samplers
    "mixture_sample",
    "token_budget_sample",
    # round 7: the Gelly library tail — label propagation (bulk
    # community detection), weighted SSSP (min-merge delta iteration),
    # and degree-oriented triangle enumeration (bounded 2-path join)
    "label_propagation",
    "sssp_distances",
    "triangle_enum",
    # round 9: the Gelly graph corpus registered this round — one row
    # per NEW plan family (lcc_topn/edge_metrics/summary/undirected
    # census share the triangle/metrics plans already timed here)
    "jaccard_pairs",        # 2-path neighborhood fan-out + degree join
    "hits_scores",          # per-round co-keyed joins + broadcast norms
    "community_labels",     # scored scatter-gather label propagation
    "clustering_metrics",   # triangles + triplets + metrics, one row
    "directed_census_row",  # closed-form census + 6-bit triangle masks
    "bipartite_projection_top",  # shared-counterpart projection join
    # round 10: the 12 rows registered this round — one per NEW plan
    # family (gen_grid_edges is pure range arithmetic and shares
    # gen_circulant's generator plan; semantic_dedup_diverse/
    # incremental and duplicate_spans share plans with the rows below)
    "gen_circulant_components",  # generator arithmetic + Pregel CC
    "triangle_listing_masks",    # directed triangle enumeration + masks
    "vertex_centric_components", # vertex-centric harness fixpoint
    "stream_evolving_pagerank",  # epoch-store warm-started PR replay
    "semantic_dedup_central",    # cluster assign + within-cluster prune
    "dsir_topn",                 # n-gram fit + broadcast score + top-n
    "span_dup_stats",            # positional fingerprints + join-back
    "curation_pipeline_v2",      # fused span-filter -> DSIR selection
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("flink-efo-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so per-query timings measure the engine, not
    # first-job class loading: run the FLAGSHIP query (join + agg +
    # top-n exercises scan, shuffle, broadcast and window codegen —
    # a bare table count warms almost nothing). Not counted in the
    # reported walls.
    try:
        QUERIES["join_inner_agg"](spark, sf_dir).collect()
    except Exception as exc:
        print(f"# warmup join_inner_agg failed: {exc!r}", file=sys.stderr)
    # streaming machinery warmup (state store provider, streaming
    # query planner, Python worker pool for applyInPandasWithState)
    # at the smallest SF — otherwise the FIRST timed stream query
    # absorbs one-time init and reads 2-3x its steady-state wall
    try:
        QUERIES["stream_dedup_first"](spark, "/root/testdata/sf0.001").collect()
    except Exception as exc:
        print(f"# warmup stream_dedup_first failed: {exc!r}", file=sys.stderr)

    # Per-query fault isolation: one broken query must not zero the
    # round's whole perf signal — record its error and keep timing the
    # rest; the JSON line is emitted no matter what.
    #
    # Two runs per query, report the MIN: the documented ±25%
    # machine-load variance is larger than most per-query deltas, and
    # run 1 additionally pays ~1.5-2 s one-time codegen compile per
    # unique plan. The min of two back-to-back runs is the
    # reproducible codegen-warm wall (r4 verdict item 6).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    # self-label the run for machine load: two rounds of verdicts were
    # burned re-adjudicating 3-10x "regressions" that were co-located
    # load (r6: six queries, r7: three) — a loadavg pair in the
    # summary line settles that class of finding at a glance
    try:
        load_before = round(os.getloadavg()[0], 1)
    except OSError:
        load_before = None
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        best, n = None, 0
        try:
            # the >= 5 s tail (multi-batch streaming replays, the big
            # TPC-DS trees) dominates the total AND is exactly where
            # co-located load shows up as a 3-10x phantom regression
            # (r6/r7/r8 verdicts each re-adjudicated a batch). One
            # extra run on that tail is bounded (few queries) and
            # kills the worst case: three samples make a single loaded
            # window very unlikely to own the min.
            n_runs = max(1, runs)
            done, bonus_used = 0, False
            while done < n_runs:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                done += 1
                if (done == n_runs and n_runs > 1 and best >= 5.0
                        and not bonus_used):
                    n_runs += 1  # one bonus sample, once
                    bonus_used = True
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {type(exc).__name__}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    # The driver captures only the LAST 2000 chars of stdout, so the
    # full per-query dict (127 queries ≈ 4.4 kB in round 6) cannot ride
    # the stdout line — it overflowed and left round 6 with
    # `parsed: null` (r6 verdict defect #1). Emission contract since
    # round 7: the COMPLETE per-query timings go to a repo file
    # (BENCH_DETAIL_r<N>.json, round inferred from existing BENCH_r*
    # artifacts, overridable via $SPARK_GRAFT_ROUND), and stdout gets
    # ONE compact summary line — metric/value/unit/sf/n_queries +
    # the 5 slowest queries + error count — bounded well under 1.5 kB.
    try:
        load_after = round(os.getloadavg()[0], 1)
    except OSError:
        load_after = None
    load1 = (
        [load_before, load_after]
        if load_before is not None and load_after is not None
        else None
    )
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    detail = {
        "metric": "total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if load1 is not None:
        detail["load1"] = load1
    if load_before is not None and load_before > 2.0:
        detail["load_warning"] = f"pre-run load1={load_before}: machine busy"
    if errors:
        detail["errors"] = errors
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    try:
        rnd = int(rnd) if rnd is not None else None
    except ValueError:
        print(f"# ignoring non-numeric SPARK_GRAFT_ROUND={rnd!r}",
              file=sys.stderr)
        rnd = None
    if rnd is None:
        import glob as _glob
        import re as _re

        # infer from the DRIVER-written BENCH_r*.json summaries ONLY
        # (not BENCH_DETAIL_r*): a locally-committed detail file for
        # the CURRENT round must not push the driver's own run to
        # round+1, and a re-run within one round keeps its number
        # (it just overwrites its detail file)
        seen = [0]
        for p in _glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
            m = _re.search(r"BENCH_r(\d+)\.json$", os.path.basename(p))
            if m:
                seen.append(int(m.group(1)))
        rnd = max(seen) + 1
    detail_path = os.path.join(repo_dir, f"BENCH_DETAIL_r{rnd:02d}.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:  # read-only checkout: summary line still flows
        print(f"# detail write failed: {exc!r}", file=sys.stderr)
        detail_path = None

    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    n_slow = 5
    while True:
        slowest = dict(ranked[:n_slow])
        out = {
            "metric": "total_wall",
            "value": round(total, 3),
            "unit": "sec",
            "sf": detail["sf"],
            "n_queries": len(timings),
            "n_errors": len(errors),
            "slowest": slowest,
            # "queries" stays (the driver's documented line contract)
            # but carries only the slowest subset — flagged explicitly
            # so no consumer can mistake it for the full per-query
            # dict, which lives in the detail file
            "queries": slowest,
            "queries_truncated": len(timings) > len(slowest),
            "load1": load1,
            "detail": os.path.basename(detail_path) if detail_path else None,
        }
        # a busy box inflates absolute walls up to ~7x on the heavy
        # streaming replays (r6/r7/r8 each re-adjudicated such rows);
        # say so IN the line the driver copies, not just via the raw
        # loadavg pair
        if load_before is not None and load_before > 2.0:
            out["load_warning"] = (
                f"pre-run load1={load_before}: machine busy, absolute "
                "walls inflated; compare plans/detail mins, not totals"
            )
        line = json.dumps(out)
        if len(line) < 1500 or n_slow == 0:
            break
        n_slow -= 1
    print(line)


if __name__ == "__main__":
    main()
